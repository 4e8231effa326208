package graft

import graft.catalog.Lake
import graft.functions.text
import graft.operators.Relational
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SketchSpec extends AnyFunSuite {
  import TestSpark._
  private lazy val lake = Lake(spark, sfDir)

  private lazy val exact: Map[String, Long] = lake.documents
    .select(explode(text.tokens(col("text"))).as("w"))
    .groupBy("w")
    .count()
    .collect()
    .map(r => r.getString(0) -> r.getLong(1))
    .toMap

  test("frequent-items sketch: bounds contain the true count; guaranteed items survive") {
    val n = exact.values.sum
    val capacity = 64
    val rows = Relational
      .rel14HeavyHitters(lake, capacity = capacity, k = 50)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (item, lb, ub) = (r.getString(1), r.getLong(2), r.getLong(3))
      val truth = exact(item)
      assert(lb <= truth && truth <= ub, s"$item: true $truth outside [$lb,$ub]")
    }
    // Misra-Gries survival guarantee: anything with true frequency
    // above n/(capacity+1) cannot be evicted, so with k = capacity the
    // returned set must include every such item.
    val all = Relational
      .rel14HeavyHitters(lake, capacity = capacity, k = capacity)
      .collect()
      .map(_.getString(1))
      .toSet
    val guaranteed = exact.filter(_._2 > n / (capacity + 1)).keySet
    assert(
      guaranteed.subsetOf(all),
      s"guaranteed heavy hitters missing: ${guaranteed -- all}"
    )
  }

  test("frequent-items sketch degenerates to exact top-k when capacity covers the vocabulary") {
    val rows = Relational
      .rel14HeavyHitters(lake, capacity = exact.size + 10, k = 10)
      .collect()
    val expected = exact.toSeq
      .sortBy { case (w, c) => (-c, w) }
      .take(10)
    rows.zip(expected).foreach { case (r, (w, c)) =>
      assert(r.getString(1) == w, s"rank ${r.getLong(0)}: ${r.getString(1)} != $w")
      assert(r.getLong(2) == c && r.getLong(3) == c, s"$w bounds not exact")
    }
  }

  test("frequent_items_sketch is callable from SQL") {
    graft.plans.GraftExtensions.register(spark)
    lake.registerViews()
    val out = spark
      .sql(
        """SELECT frequent_items_sketch(w, 1024, 5) AS top
          |FROM (SELECT explode(split(trim(regexp_replace(text, '\\s+', ' ')), ' ')) AS w
          |      FROM documents)""".stripMargin
      )
      .collect()
    assert(out.length == 1)
    assert(out.head.getSeq[Any](0).size == 5)
  }
}
