package graft

import graft.catalog.Lake
import graft.operators.Linkage
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LinkageSpec extends AnyFunSuite {
  import TestSpark._
  private lazy val lake = Lake(spark, sfDir)

  test("tfidf cosine linkage: exact-twin labels link at cosine 1.0") {
    val out = Linkage.txt17TfidfCosineLinkage(lake)
    // Probes whose exact (lowercased) name also appears on the
    // candidate side must link at cosine 1.0 — TF-IDF cosine of
    // identical strings is 1 by construction.
    val probeNames = lake.part
      .filter(col("p_partkey") % 2 === 0)
      .select(col("p_partkey").as("probe_id"), lower(col("p_name")).as("nm"))
    val candNames = lake.part
      .filter(col("p_partkey") % 2 === 1)
      .select(lower(col("p_name")).as("nm"))
      .distinct()
    val twins = probeNames.join(candNames, "nm").select("probe_id")
    val nTwins = twins.count()
    assert(nTwins > 0, "test needs at least one exact twin in the data")
    val perfect = out
      .join(twins, "probe_id")
      .filter(col("cosine") === 1.0)
      .count()
    assert(perfect == nTwins, s"expected all $nTwins twins at cosine 1.0, got $perfect")
  }

  test("tfidf cosine linkage: one row per probe, cosine within (0, 1]") {
    val rows = Linkage.txt17TfidfCosineLinkage(lake).collect()
    val probes = rows.map(_.getAs[Long]("probe_id"))
    assert(probes.distinct.length == probes.length)
    assert(rows.forall { r =>
      val c = r.getAs[Double]("cosine"); c > 0.0 && c <= 1.0
    })
    assert(rows.forall(r => r.getAs[Long]("cand_id") % 2 == 1))
  }
}
