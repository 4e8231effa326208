package graft

import org.scalatest.funsuite.AnyFunSuite

/** The SQL surface of the native expressions: every custom Catalyst
  * expression must be reachable from spark.sql via GraftExtensions,
  * so SQL-only users get the same kernels as the Scala API. */
class ExtensionsSpec extends AnyFunSuite {
  import TestSpark._

  test("every native expression is callable from SQL") {
    graft.plans.GraftExtensions.register(spark)
    val r = spark
      .sql(
        """SELECT
          |  vector_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS vd,
          |  jaro_winkler('martha', 'marhta') AS jw,
          |  simhash64('hello world hello') AS sh,
          |  sorted_intersect_count(array(1L, 2L, 3L), array(2L, 3L, 4L)) AS ic,
          |  size(shingle_hashes('a b c d', 3)) AS nsh,
          |  top_bigram_count(array('a', 'b', 'a', 'b', 'c')) AS tbc""".stripMargin
      )
      .head()
    assert(r.getDouble(0) == 11.0)
    assert(math.abs(r.getDouble(1) - 0.9611) < 0.001)
    assert(r.getLong(2) != 0L) // simhash of non-empty text is non-trivial
    assert(r.getLong(3) == 2L) // {2,3} intersect
    assert(r.getInt(4) == 2)   // 4 tokens -> 2 word trigrams
    assert(r.getLong(5) == 2L) // "a b" occurs twice; "b a"/"b c" once
  }

  test("native scalar expressions propagate NULL inputs instead of throwing") {
    graft.plans.GraftExtensions.register(spark)
    // a production corpus has null text / null vectors; every scalar
    // kernel must null-propagate like a built-in (the aggregates —
    // sketch/topk/gram — skip nulls per aggregate semantics)
    val r = spark
      .sql(
        """SELECT
          |  vector_dot(CAST(NULL AS ARRAY<DOUBLE>), array(1.0d)) AS vd,
          |  jaro_winkler(CAST(NULL AS STRING), 'x') AS jw,
          |  simhash64(CAST(NULL AS STRING)) AS sh,
          |  sorted_intersect_count(CAST(NULL AS ARRAY<BIGINT>), array(1L)) AS ic,
          |  shingle_hashes(CAST(NULL AS STRING), 3) AS nsh,
          |  top_bigram_count(CAST(NULL AS ARRAY<STRING>)) AS tbc""".stripMargin
      )
      .head()
    (0 until r.length).foreach(i => assert(r.isNullAt(i), s"field $i not null"))
  }

  test("shingle_hashes rejects a non-constant order argument") {
    graft.plans.GraftExtensions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT shingle_hashes('a b c', cast(rand() * 3 AS INT))").head()
    }
    assert(e.getMessage.toLowerCase.contains("constant"))
  }
}
