package graft

import graft.catalog.Lake
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe for the bucketed-layout kill on q04's probe-stream
  * exchange (VERDICT r13 #3): writes orders/lineitem as bucketed
  * tables on the order key (Ingest.writeBucketed — the exchange-free
  * join layout IngestSpec pins), then measures q04/q10/q18 over the
  * bucketed lake vs the plain parquet lake in one JVM. The bucketing
  * write cost is reported too — the layout is an investment a real
  * lake amortizes over every orderkey join, and hiding it would be
  * the cache-flattering mistake again.
  *
  * usage: graft.ProbeBucketed
  * env:   SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_SWEEPS,
  *        SPARK_GRAFT_BUCKETS (default 32)
  */
object ProbeBucketed {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sweeps = sys.env.getOrElse("SPARK_GRAFT_SWEEPS", "3").toInt
    val nb = sys.env.getOrElse("SPARK_GRAFT_BUCKETS", "32").toInt
    val spark = GraftSession
      .configure(SparkSession.builder().master(s"local[$cpus]"), cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val lake = Lake(spark, sfDir)
    lake.tableNames.foreach { n =>
      lake.resolve(n).write.mode("overwrite").format("noop").save()
    }
    def t[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    val (_, wOrders) = t {
      graft.sources.Ingest
        .writeBucketed(lake.orders, "orders_b", Seq("o_orderkey"), nb)
    }
    val (_, wLine) = t {
      graft.sources.Ingest
        .writeBucketed(lake.lineitem, "lineitem_b", Seq("l_orderkey"), nb)
    }
    println(f"bucketed write: orders=$wOrders%.1fs lineitem=$wLine%.1fs nb=$nb")
    def ordersB = spark.table("orders_b")
    def lineitemB = spark.table("lineitem_b")

    def q04Over(orders: DataFrame, lineitem: DataFrame, hint: Boolean) = {
      val o = orders.filter(
        col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp")
      )
      (if (hint) o.hint("shuffle_hash") else o)
        .join(
          lineitem.select(col("l_orderkey")),
          col("o_orderkey") === col("l_orderkey")
        )
        .groupBy("o_orderpriority")
        .agg(countDistinct(col("o_orderkey")).as("order_count"))
        .orderBy("o_orderpriority")
    }
    def q10Over(orders: DataFrame, lineitem: DataFrame, hint: Boolean) = {
      val o = orders.select("o_orderkey", "o_custkey")
      lineitem
        .filter(col("l_returnflag") === "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
        .join(
          if (hint) o.hint("shuffle_hash") else o,
          col("l_orderkey") === col("o_orderkey")
        )
        .groupBy("o_custkey")
        .agg(
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4)
            .as("revenue")
        )
        .join(
          lake.customer.hint("shuffle_hash"),
          col("o_custkey") === col("c_custkey")
        )
        .join(broadcast(lake.nation), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("c_name"), col("n_name"), col("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    }
    def q18Over(
        orders: DataFrame,
        lineitem: DataFrame,
        repart: Boolean
    ) = {
      val li = lineitem.select(col("l_orderkey"), col("l_quantity"))
      val big = (if (repart) li.repartition(col("l_orderkey")) else li)
        .groupBy("l_orderkey")
        .agg(round(sum("l_quantity"), 4).as("total_qty"))
        .filter(col("total_qty") > 300.0)
      big
        .join(orders, col("l_orderkey") === col("o_orderkey"))
        .join(lake.customer, col("o_custkey") === col("c_custkey"))
        .select(
          col("c_custkey"), col("c_name"), col("o_orderkey"),
          col("o_orderdate"), col("o_totalprice"), col("total_qty")
        )
        .orderBy(col("total_qty").desc, col("o_orderkey"))
        .limit(20)
    }
    // round-15 countDistinct-free candidates (VERDICT r14 #3): the
    // named residual of the kept form is the countDistinct's internal
    // (priority, orderkey) exchange of the joined stream. Over the
    // BUCKETED layout both distinct forms should plan exchange-free:
    //  - prededup: dropDuplicates on lineitem_b's key BEFORE the join
    //    — the scan is hash-clustered on l_orderkey, so the distinct
    //    is a partial agg with no exchange, the join stays
    //    co-partitioned, and the final count is a plain count(*) per
    //    priority (5-key exchange)
    //  - postdedup: join first (exchange-free), dropDuplicates on
    //    (o_orderkey, o_orderpriority) AFTER — HashPartitioning on
    //    the orderkey satisfies ClusteredDistribution of the superset
    //    keys, so this distinct should also plan exchange-free
    def q04PreDedup(orders: DataFrame, lineitem: DataFrame) = {
      val o = orders.filter(
        col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp")
      )
      o.hint("shuffle_hash")
        .join(
          lineitem.select(col("l_orderkey")).dropDuplicates("l_orderkey"),
          col("o_orderkey") === col("l_orderkey")
        )
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    }
    def q04PostDedup(orders: DataFrame, lineitem: DataFrame) = {
      val o = orders.filter(
        col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp")
      )
      o.hint("shuffle_hash")
        .join(
          lineitem.select(col("l_orderkey")),
          col("o_orderkey") === col("l_orderkey")
        )
        .dropDuplicates("o_orderkey", "o_orderpriority")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    }
    val variants: Seq[(String, () => DataFrame)] = Seq(
      "q04_base" -> (() => q04Over(lake.orders, lake.lineitem, hint = true)),
      "q04_bucketed" -> (() => q04Over(ordersB, lineitemB, hint = false)),
      "q04_bucketed_shj" -> (() => q04Over(ordersB, lineitemB, hint = true)),
      "q04_b_prededup" -> (() => q04PreDedup(ordersB, lineitemB)),
      "q04_b_postdedup" -> (() => q04PostDedup(ordersB, lineitemB)),
      // SMJ left-semi over the SORTED buckets: r13 refuted semi joins
      // on the plain layout because the 180M-key probe stream had to
      // SORT; bucketBy+sortBy removes both the exchange and the sort,
      // leaving a pure streaming merge semi — DuckDB's mark-join
      // shape without the countDistinct de-multiply
      "q04_b_semi" -> (() => {
        ordersB
          .filter(
            col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("1998-01-01").cast("timestamp")
          )
          .join(
            lineitemB.select(col("l_orderkey")),
            col("o_orderkey") === col("l_orderkey"),
            "left_semi"
          )
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("order_count"))
          .orderBy("o_orderpriority")
      }),
      "q10_base" -> (() => q10Over(lake.orders, lake.lineitem, hint = true)),
      "q10_bucketed" -> (() => q10Over(ordersB, lineitemB, hint = false)),
      "q18_base" -> (() => q18Over(lake.orders, lake.lineitem, repart = true)),
      "q18_bucketed" -> (() => q18Over(ordersB, lineitemB, repart = false))
    )
    val expected = collection.mutable.Map[String, Seq[String]]()
    if (sys.env.get("SPARK_GRAFT_EXPLAIN").contains("1")) {
      for ((name, mk) <- variants) {
        println(s"===== $name"); mk().explain("formatted")
      }
    }
    for ((name, mk) <- variants) {
      val times = (1 to sweeps).map { _ =>
        spark.sharedState.cacheManager.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
        val (rows, sec) = t(mk().collect().map(_.toString).toSeq)
        val key = name.takeWhile(_ != '_')
        expected.get(key) match {
          case Some(e) =>
            require(rows == e, s"$name diverges from ${key}_base")
          case None => expected(key) = rows
        }
        sec
      }
      println(
        f"$name%-18s min=${times.min}%.2f all=${times.map(x => f"$x%.2f").mkString(",")}"
      )
    }
    spark.stop()
  }
}
