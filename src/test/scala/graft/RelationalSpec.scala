package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Shared local session for all specs. */
object TestSpark {
  lazy val spark: SparkSession = GraftSession.local(cores = 4, shufflePartitions = 4)
  val sfDir = "/root/testdata/sf0.001"
}

class RelationalSpec extends AnyFunSuite with BeforeAndAfterAll {
  import TestSpark._

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every declared query runs and is non-empty on sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sfDir).count()
      assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("every query has matching oracle or is declared rows-only") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // rows-only entries are allowed but must be flagged in SURVEY.md §2
    val surveyText = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get("SURVEY.md")),
      java.nio.charset.StandardCharsets.UTF_8
    )
    missing.foreach { name =>
      assert(surveyText.contains(name), s"$name missing from SURVEY.md")
    }
  }

  test("q01 pricing summary has expected shape") {
    val df = SparkEntry.queries("q01_pricing_summary")(spark, sfDir)
    assert(df.columns.toSet.contains("sum_qty"))
    assert(df.count() >= 4) // returnflag x linestatus combos
  }
}
