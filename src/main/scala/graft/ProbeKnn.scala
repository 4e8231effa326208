package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev probe (disposable): decompose sim08's sf1 cost into
  * (a) join+dot kernel alone, (b) kernel + top-k window, (c) full
  * query — to locate the bottleneck before optimizing. */
object ProbeKnn {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/testdata/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession
      .configure(SparkSession.builder().master(s"local[$cpus]"), cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val lake = graft.catalog.Lake(spark, sfDir)
    val chunks = 32
    val all = lake.embeddings
      .select(col("vec_id"), col("label"),
        graft.functions.vectors.toDouble(col("embedding")).as("v"))
      .withColumn("nrm", graft.functions.vectors.norm(col("v")))
      .localCheckpoint()
    println(s"n = ${all.count()}")
    val srcs = all
      .select(col("vec_id").as("src"), col("v").as("av"), col("nrm").as("anrm"))
      .withColumn("chunk", pmod(col("src"), lit(chunks)).cast("int"))
    val dsts = all
      .select(col("vec_id").as("dst"), col("v").as("bv"), col("nrm").as("bnrm"))
      .withColumn("chunk", explode(sequence(lit(0), lit(chunks - 1))))
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$tag%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val joined = srcs
      .join(dsts.hint("shuffle_hash"), Seq("chunk"))
      .filter(col("src") =!= col("dst"))
      .withColumn("cos_raw",
        graft.functions.vectors.dot(col("av"), col("bv")) / (col("anrm") * col("bnrm")))
      .select("src", "dst", "cos_raw")
    time("kernel+sum (no window)") {
      joined.agg(sum("cos_raw")).collect()
    }
    val w = Window.partitionBy("src").orderBy(col("cos_raw").desc, col("dst"))
    time("kernel+window topk") {
      joined.withColumn("rank", row_number().over(w)).filter(col("rank") <= 5)
        .write.mode("overwrite").format("noop").save()
    }
    time("full sim08") {
      graft.operators.Similarity.sim08KnnGraph(lake)
        .write.mode("overwrite").format("noop").save()
    }
    spark.stop()
  }
}
