package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-13 probe: q04/q10 micro-join kernel shapes at scale (judge
  * round-12 #4). Interleaves every variant inside ONE JVM with
  * alternating sweep order so the box's multi-second noise windows
  * can't bias a variant, and reports per-variant min — the same
  * discipline as BenchOne but for plan-shape A/Bs of a single query.
  *
  * usage: graft.ProbeMicro [sweeps]
  * env:   SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS
  */
object ProbeMicro {
  def main(args: Array[String]): Unit = {
    val sweeps = args.headOption.map(_.toInt).getOrElse(3)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession
      .configure(SparkSession.builder().master(s"local[$cpus]"), cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val lake = graft.catalog.Lake(spark, sfDir)
    // warmup: page in the two fact tables
    Seq("orders", "lineitem", "customer", "nation").foreach { n =>
      lake.resolve(n).write.mode("overwrite").format("noop").save()
    }

    def ordersF: DataFrame = lake.orders.filter(
      col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp")
    )
    def lateD: DataFrame = lake.lineitem.select(col("l_orderkey")).distinct()
    def aggQ04(j: DataFrame): DataFrame = j
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")

    val q04Variants: Seq[(String, () => DataFrame)] = Seq(
      "q04_smj_distinct" -> (() =>
        aggQ04(ordersF.join(lateD,
          col("o_orderkey") === col("l_orderkey"), "left_semi"))),
      "q04_shj_right_distinct" -> (() =>
        aggQ04(ordersF.join(lateD.hint("shuffle_hash"),
          col("o_orderkey") === col("l_orderkey"), "left_semi"))),
      "q04_shj_right_raw" -> (() =>
        aggQ04(ordersF.join(
          lake.lineitem.select(col("l_orderkey")).hint("shuffle_hash"),
          col("o_orderkey") === col("l_orderkey"), "left_semi"))),
      "q04_inner_shj_left" -> (() =>
        aggQ04(ordersF.hint("shuffle_hash").join(lateD,
          col("o_orderkey") === col("l_orderkey")))),
      "q04_smj_raw" -> (() =>
        aggQ04(ordersF.join(lake.lineitem.select(col("l_orderkey")),
          col("o_orderkey") === col("l_orderkey"), "left_semi"))),
      // stage cost floor: the distinct alone
      "q04_distinct_only" -> (() => lateD),
      // DuckDB's own shape: build the SMALL filtered-orders side,
      // probe the raw key stream (inner SHJ buildLeft — LeftSemi
      // buildLeft doesn't exist in Spark 4.1), then de-multiply with
      // countDistinct per priority (clustered keys partial-dedup
      // map-side before the tiny exchange)
      "q04_inner_countd" -> (() =>
        ordersF.hint("shuffle_hash")
          .join(lake.lineitem.select(col("l_orderkey")),
            col("o_orderkey") === col("l_orderkey"))
          .groupBy("o_orderpriority")
          .agg(countDistinct(col("o_orderkey")).as("order_count"))
          .orderBy("o_orderpriority"))
    )

    def q10Base: DataFrame = lake.lineitem
      .filter(col("l_returnflag") === "R")
      .select("l_orderkey", "l_extendedprice", "l_discount")
    def aggQ10(j: DataFrame): DataFrame = j
      .groupBy("c_custkey", "c_name", "n_name")
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4)
        .as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)

    val q10Variants: Seq[(String, () => DataFrame)] = Seq(
      "q10_smj" -> (() =>
        aggQ10(q10Base
          .join(lake.orders, col("l_orderkey") === col("o_orderkey"))
          .join(lake.customer, col("o_custkey") === col("c_custkey"))
          .join(broadcast(lake.nation), col("c_nationkey") === col("n_nationkey")))),
      "q10_shj" -> (() =>
        aggQ10(q10Base
          .join(lake.orders.select("o_orderkey", "o_custkey").hint("shuffle_hash"),
            col("l_orderkey") === col("o_orderkey"))
          .join(lake.customer.hint("shuffle_hash"),
            col("o_custkey") === col("c_custkey"))
          .join(broadcast(lake.nation), col("c_nationkey") === col("n_nationkey")))),
      // pre-aggregate lineitem per order BEFORE the orders join: the
      // R-filtered stream carries ~4 rows per order, so the join's
      // probe side shrinks 4x and the final customer-level aggregate
      // sums partials
      "q10_preagg" -> (() =>
        aggQ10(q10Base
          .groupBy("l_orderkey")
          .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))
            .as("rev_o"))
          .join(lake.orders.select("o_orderkey", "o_custkey"),
            col("l_orderkey") === col("o_orderkey"))
          .join(lake.customer, col("o_custkey") === col("c_custkey"))
          .join(broadcast(lake.nation), col("c_nationkey") === col("n_nationkey"))
          .withColumn("l_extendedprice", col("rev_o"))
          .withColumn("l_discount", lit(0.0)))),
      // aggregate by the LONG custkey right after the orders join,
      // BEFORE customer/nation attach: the customer-level aggregate
      // then shuffles <=|customers| narrow rows instead of 45M rows
      // keyed by (custkey, name-string, nation-string), and the name
      // columns join onto the aggregated frame
      "q10_aggfirst" -> (() =>
        q10Base
          .join(lake.orders.select("o_orderkey", "o_custkey"),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy("o_custkey")
          .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4)
            .as("revenue"))
          .join(lake.customer, col("o_custkey") === col("c_custkey"))
          .join(broadcast(lake.nation), col("c_nationkey") === col("n_nationkey"))
          .select(col("c_custkey"), col("c_name"), col("n_name"), col("revenue"))
          .orderBy(col("revenue").desc, col("c_custkey"))
          .limit(20)),
      // aggfirst + sort-free joins: SHJ the orders attach (build =
      // narrow orders projection), aggregate by long custkey, then
      // SHJ the customer attach onto the <=|customers| frame
      "q10_aggfirst_shj" -> (() =>
        q10Base
          .join(lake.orders.select("o_orderkey", "o_custkey").hint("shuffle_hash"),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy("o_custkey")
          .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4)
            .as("revenue"))
          .join(lake.customer.hint("shuffle_hash"),
            col("o_custkey") === col("c_custkey"))
          .join(broadcast(lake.nation), col("c_nationkey") === col("n_nationkey"))
          .select(col("c_custkey"), col("c_name"), col("n_name"), col("revenue"))
          .orderBy(col("revenue").desc, col("c_custkey"))
          .limit(20))
    )

    val variants = q04Variants ++ q10Variants
    val best = collection.mutable.Map[String, Double]()
    val runs = collection.mutable.Map[String, List[Double]]().withDefaultValue(Nil)
    for (s <- 1 to sweeps; (name, fn) <-
           (if (s % 2 == 0) variants.reverse else variants)) {
      val t0 = System.nanoTime()
      fn().write.mode("overwrite").format("noop").save()
      val dt = (System.nanoTime() - t0) / 1e9
      if (!best.contains(name) || dt < best(name)) best(name) = dt
      runs(name) = runs(name) :+ dt
    }
    variants.foreach { case (n, _) =>
      println(f"$n%-28s min=${best(n)}%.3f  all=${runs(n).map(d => f"$d%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
