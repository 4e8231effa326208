package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.vectors

/** Round-15 probe: PQ subspace-argmin plan shapes (guide §2.3/§2.4 —
  * shuffle fewer bytes / remove the sort). Three candidate kernels for
  * the pqTrainCore assign+encode step, interleaved in ONE JVM with
  * alternating sweep order (the ProbeMicro discipline), results
  * REQUIRED IDENTICAL every sweep:
  *
  *   window : the round-14 form — join ks codebook rows per
  *            subvector, row_number() over (vec_id, sub_id) ordered
  *            by (d2, cluster), keep r=1. Exchanges + globally sorts
  *            all n·m·ks scored rows per Lloyd iteration and once
  *            more to encode.
  *   min_by : same broadcast join (dist2 stays codegen), but the
  *            winner is min_by over struct(d2, cluster) — partial
  *            SortAggregate folds each subvector's ks consecutive
  *            rows to 1 map-side, the exchange shrinks ks× and
  *            carries no ordering.
  *   fold   : argmaxCell's transform() fold — map-only, no exchange,
  *            but the HOF lambda evaluates dist2 INTERPRETED and the
  *            codebook fold adds a shuffle job inside every broadcast
  *            build.
  *
  * usage: graft.ProbePqAssign [sweeps]
  * env:   SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS
  */
object ProbePqAssign {
  def main(args: Array[String]): Unit = {
    val sweeps = args.headOption.map(_.toInt).getOrElse(3)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession
      .configure(SparkSession.builder().master(s"local[$cpus]"), cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val lake = graft.catalog.Lake(spark, sfDir)
    lake.resolve("embeddings").write.mode("overwrite").format("noop").save()

    val m = 8
    val ks = 16
    val iters = 2

    def subvOf(all: DataFrame, sd: Int): DataFrame = all
      .withColumn("sub_id", explode(sequence(lit(0), lit(m - 1))))
      .select(
        col("vec_id"),
        col("sub_id"),
        slice(col("v"), col("sub_id") * sd + 1, lit(sd)).as("sv")
      )
      .localCheckpoint()

    def seeds(subv: DataFrame): DataFrame = subv
      .withColumn(
        "cluster",
        row_number().over(Window.partitionBy("sub_id").orderBy("vec_id")) - 1
      )
      .filter(col("cluster") < ks)
      .select(col("sub_id"), col("cluster"), col("sv").as("centroid"))
      .localCheckpoint()

    def update(assigned: DataFrame): DataFrame = assigned
      .select(col("sub_id"), col("cluster"), posexplode(col("sv")).as(Seq("pos", "x")))
      .groupBy("sub_id", "cluster", "pos")
      .agg(avg("x").as("c"))
      .groupBy("sub_id", "cluster")
      .agg(
        transform(
          array_sort(collect_list(struct(col("pos"), col("c")))),
          s => s.getField("c")
        ).as("centroid")
      )
      .localCheckpoint()

    // ---- variant kernels: (subv, cents) => argmin frame ----
    val assignW = Window
      .partitionBy("vec_id", "sub_id")
      .orderBy(col("d2").asc, col("cluster"))
    def windowAssign(subv: DataFrame, cents: DataFrame): DataFrame = subv
      .join(broadcast(cents), Seq("sub_id"))
      .withColumn("d2", vectors.dist2(col("sv"), col("centroid")))
      .withColumn("r", row_number().over(assignW))
      .filter(col("r") === 1)
      .select(col("vec_id"), col("sub_id"), col("cluster"), col("sv"))

    def minbyAssign(subv: DataFrame, cents: DataFrame): DataFrame = subv
      .join(broadcast(cents), Seq("sub_id"))
      .withColumn("d2", vectors.dist2(col("sv"), col("centroid")))
      .groupBy("vec_id", "sub_id")
      .agg(min_by(struct(col("cluster"), col("sv")),
        struct(col("d2"), col("cluster"))).as("w"))
      .select(col("vec_id"), col("sub_id"),
        col("w.cluster").as("cluster"), col("w.sv").as("sv"))

    def foldAssign(subv: DataFrame, cents: DataFrame): DataFrame = {
      val folded = cents
        .groupBy("sub_id")
        .agg(collect_list(struct(col("cluster"), col("centroid"))).as("cs"))
      subv
        .join(broadcast(folded), Seq("sub_id"))
        .withColumn(
          "w",
          array_min(
            transform(
              col("cs"),
              c =>
                struct(
                  vectors.dist2(col("sv"), c.getField("centroid")).as("d2"),
                  c.getField("cluster").as("cluster")
                )
            )
          )
        )
        .select(col("vec_id"), col("sub_id"), col("w.cluster").as("cluster"), col("sv"))
    }

    // full train+encode pipeline on a variant's assign kernel
    def trainEncode(assign: (DataFrame, DataFrame) => DataFrame): DataFrame = {
      val all = graft.operators.Similarity
        .vecs(lake)
        .select(col("vec_id"), vectors.l2Normalize(col("v")).as("v"))
        .localCheckpoint()
      val sd = all.select(size(col("v"))).head().getInt(0) / m
      val subv = subvOf(all, sd)
      var cents = seeds(subv)
      var i = 0
      while (i < iters) {
        cents = update(assign(subv, cents).select("sub_id", "cluster", "sv"))
        i += 1
      }
      assign(subv, cents).select("vec_id", "sub_id", "cluster")
    }

    val variants: Seq[(String, (DataFrame, DataFrame) => DataFrame)] = Seq(
      "window" -> windowAssign _,
      "min_by" -> minbyAssign _,
      "fold" -> foldAssign _
    )

    def clear(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
    }

    // identical-results gate (once, before timing): checksum codes
    def checksum(df: DataFrame): (Long, Long) = {
      val r = df
        .agg(count(lit(1)), expr("bit_xor(xxhash64(vec_id, sub_id, cluster))"))
        .head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    val sums = variants.map { case (n, f) =>
      val s = checksum(trainEncode(f)); clear(); n -> s
    }
    require(sums.map(_._2).distinct.size == 1,
      s"variant results differ: $sums")
    println(s"results identical across variants: ${sums.head._2}")

    val best = collection.mutable.Map[String, Double]()
    for (sweep <- 1 to sweeps) {
      val order = if (sweep % 2 == 0) variants.reverse else variants
      for ((name, f) <- order) {
        val t0 = System.nanoTime()
        trainEncode(f).write.mode("overwrite").format("noop").save()
        val dt = (System.nanoTime() - t0) / 1e9
        if (!best.contains(name) || dt < best(name)) best(name) = dt
        clear()
        println(f"sweep $sweep $name%-7s $dt%.3f")
      }
    }
    println(best.toSeq.sortBy(_._2).map { case (n, t) => f"$n=$t%.3f" }
      .mkString("MIN: ", "  ", ""))
    spark.stop()
  }
}
