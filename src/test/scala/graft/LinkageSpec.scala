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

  test("blocking quality: length-band candidates match brute force; metrics well-formed") {
    val rows = graft.operators.Linkage.xref09BlockingQuality(lake).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
      .toMap
    assert(rows.keySet == Set("content_shingle", "length_band"))
    // independent brute-force count of the length-band pair space
    val lens = lake.documents.select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val brute = (for {
      (a, la) <- lens; (b, lb) <- lens
      if a < b && math.abs(la - lb) <= 40
    } yield 1).size.toLong
    assert(rows("length_band")._1 == brute,
      s"band join ${rows("length_band")._1} != brute $brute")
    rows.values.foreach { case (nc, rr, gt, gc, comp) =>
      assert(nc > 0 && gt > 0 && gc >= 0 && gc <= gt)
      assert(rr >= 0.0 && rr <= 1.0 && comp >= 0.0 && comp <= 1.0)
      assert(math.abs(comp - math.rint(gc.toDouble / gt * 10000) / 10000) < 1e-12)
    }
    // the blocking trade: content blocking prunes far harder
    assert(rows("content_shingle")._2 > rows("length_band")._2)
    // ANALYTIC pin (VERDICT r6 #3): the length-band count must never
    // build doc-level pairs — every join in its plan runs over the
    // length histogram, so no join node may reference doc_id.
    val bandPlan = graft.operators.Linkage
      .lengthBandPairCount(lake.documents.select("doc_id", "n_chars"), 40)
      .queryExecution.executedPlan.toString
    bandPlan.linesIterator.filter(_.contains("Join")).foreach { l =>
      assert(!l.contains("doc_id"), s"doc-level pair join in band plan: $l")
    }
    // independent reference for completeness: gold = same word SET
    // (bag fingerprint), so shuffled variants are gold WITHOUT sharing
    // trigrams — content completeness is legitimately < 1 on this
    // corpus and must match the Scala-side recomputation exactly.
    val docs = lake.documents.select("doc_id", "n_chars", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getString(2).trim.split("\\s+").toSeq))
    val bag = docs.map { case (id, _, ws) => id -> ws.distinct.sorted }.toMap
    val goldPairs = (for {
      (a, _, _) <- docs; (b, _, _) <- docs
      if a < b && bag(a) == bag(b)
    } yield (a, b)).toSet
    assert(rows("length_band")._3 == goldPairs.size.toLong, "gold_total off")
    val lensBy = docs.map(d => d._1 -> d._2).toMap
    val shingles = docs.map { case (id, _, ws) =>
      id -> ws.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
    }.toMap
    val contentCovered = goldPairs.count { case (a, b) =>
      math.abs(lensBy(a) - lensBy(b)) <= 40 &&
        (shingles(a) & shingles(b)).nonEmpty
    }
    val lengthCovered = goldPairs.count { case (a, b) =>
      math.abs(lensBy(a) - lensBy(b)) <= 40
    }
    assert(rows("content_shingle")._4 == contentCovered.toLong,
      s"content covered ${rows("content_shingle")._4} != $contentCovered")
    assert(rows("length_band")._4 == lengthCovered.toLong,
      s"length covered ${rows("length_band")._4} != $lengthCovered")
  }

  test("xref10: CUBE markers are consistent and every stratum sums to the grand total") {
    val rows = Linkage.xref10UpsetOverlap(lake).collect().map { r =>
      (Option(r.get(0)).map(_.asInstanceOf[Boolean]),
        Option(r.get(1)).map(_.asInstanceOf[Boolean]),
        Option(r.get(2)).map(_.asInstanceOf[Boolean]),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))
    }
    // marker ⟺ null: g_X = 1 exactly when the flag is aggregated away
    rows.foreach { case (p, o, e, gp, go, ge, _) =>
      assert((gp == 1L) == p.isEmpty && (go == 1L) == o.isEmpty &&
        (ge == 1L) == e.isEmpty)
    }
    val nEntities = Linkage.xref02UnifiedEntities(lake).count()
    // the grand-total cell counts every entity once...
    val grand = rows.filter(r => r._4 == 1L && r._5 == 1L && r._6 == 1L)
    assert(grand.length == 1 && grand.head._7 == nEntities)
    // ...and each marker stratum partitions the same universe
    for (level <- Seq((0L, 0L, 0L), (1L, 0L, 0L), (0L, 1L, 1L))) {
      val stratum = rows.filter(r => (r._4, r._5, r._6) == level)
      assert(stratum.map(_._7).sum == nEntities, s"stratum $level incomplete")
    }
    // the full-combination cells are exactly xref03's coverage rows
    val combos = rows.filter(r => r._4 == 0L && r._5 == 0L && r._6 == 0L)
      .map(r => (r._1.get, r._2.get, r._3.get) -> r._7).toMap
    val x03 = Linkage.xref03CoverageStats(lake).collect()
      .map(r => (r.getBoolean(0), r.getBoolean(1), r.getBoolean(2)) -> r.getLong(3))
      .toMap
    assert(combos == x03)
  }

  test("xref11: reach matrix composes xref07's linkage with the modal-domain map") {
    val rows = Linkage.xref11OntologyReach(lake).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, cv, lx, tot) => assert(cv + lx == tot) }
    // ordered by total reach, descending (fig5's ordering)
    assert(rows.map(_._4).toSeq == rows.map(_._4).sortBy(-_).toSeq)
    // column sums equal the thresholded linkage joined to ANY domain:
    // every linked topic with a domain lands in exactly one row
    val linked = Linkage.xref07TieredLinkage(lake)
      .filter(org.apache.spark.sql.functions.col("similarity") >= 0.65)
      .collect().map(r => r.getString(0) -> r.getString(1))
    val topicsWithDomain = lake.part.collect()
      .flatMap(r => r.getString(1).split(" ")).toSet
    val expected = linked.count { case (t, _) => topicsWithDomain.contains(t) }
    assert(rows.map(_._4).sum == expected.toLong)
  }

  test("xref12: per-year coverage counts are internally consistent and cover exactly the dated entities") {
    import org.apache.spark.sql.functions.col
    val rows = Linkage.xref12CoverageByYear(lake).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    // years ascending, each source count bounded by the year total,
    // the intersection bounded by every source count
    assert(rows.map(_._1).toSeq == rows.map(_._1).sorted.toSeq)
    rows.foreach { case (y, n, np, ne, nall) =>
      assert(np <= n && ne <= n, s"year $y source count exceeds total")
      assert(nall <= np && nall <= ne, s"year $y intersection exceeds a source")
    }
    // the year partition covers exactly the entities with orders:
    // every unified entity with has_orders lands in exactly one year
    val dated = Linkage.xref02UnifiedEntities(lake)
      .filter(col("has_orders")).count()
    assert(rows.map(_._2).sum == dated,
      s"per-year totals ${rows.map(_._2).sum} != dated entities $dated")
  }
}
