package graft
import org.apache.spark.sql.SparkSession

/** Measured pair for samp14's two forms (landing discipline, round
  * 12): the full-audit window ranking vs the keptOnly TopKByScore
  * heap path, BenchOne's methodology (noop sink, untimed warmup, min
  * of N sweeps, optional cleared caches).
  *
  * usage: graft.ProbeSamp14
  * env:   SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_SWEEPS,
  *        SPARK_GRAFT_CLEAR
  */
object ProbeSamp14 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sweeps = sys.env.getOrElse("SPARK_GRAFT_SWEEPS", "3").toInt
    val spark = GraftSession
      .configure(SparkSession.builder().master(s"local[$cpus]"), cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val lake = graft.catalog.Lake(spark, sfDir)
    lake.tableNames.foreach { n =>
      lake.resolve(n).write.mode("overwrite").format("noop").save()
    }
    val clearPerSweep = sys.env.get("SPARK_GRAFT_CLEAR").contains("1")
    for ((label, kept) <- Seq("full_audit" -> false, "kept_only" -> true)) {
      val times = (1 to sweeps).map { _ =>
        val t0 = System.nanoTime()
        graft.operators.Similarity
          .samp14ClusterBalance(lake, keptOnly = kept)
          .write.mode("overwrite").format("noop").save()
        val dt = (System.nanoTime() - t0) / 1e9
        if (clearPerSweep) {
          spark.sharedState.cacheManager.clearCache()
          spark.sparkContext.getPersistentRDDs.values
            .foreach(_.unpersist(blocking = false))
        }
        dt
      }
      val name = s"samp14[$label]"
      println(f"$name%-20s min=${times.min}%.3f  all=${times.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
