package graft
import org.apache.spark.sql.SparkSession

/** Decade probe for cat03_column_stats' two NDV paths — dev tooling
  * (BenchOne's discipline: untimed warmup, min of N sweeps, optional
  * cleared caches). The exact path plans an Expand that replicates
  * scan rows once per DISTINCT column; the `approx = true` HLL path
  * stays fully map-side partial — this probe measures where the two
  * diverge with scale, the evidence behind cat03's documented scale
  * default (BASELINE.md round 12).
  *
  * usage: graft.ProbeCat03
  * env:   SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_SWEEPS,
  *        SPARK_GRAFT_CLEAR
  */
object ProbeCat03 {
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
    for ((label, approx) <- Seq("exact" -> false, "approx" -> true)) {
      val times = (1 to sweeps).map { _ =>
        val t0 = System.nanoTime()
        graft.operators.CatalogOps
          .cat03ColumnStats(lake, approx = approx)
          .write.mode("overwrite").format("noop").save()
        val dt = (System.nanoTime() - t0) / 1e9
        if (clearPerSweep) {
          spark.sharedState.cacheManager.clearCache()
          spark.sparkContext.getPersistentRDDs.values
            .foreach(_.unpersist(blocking = false))
        }
        dt
      }
      val name = s"cat03[$label]"
      println(f"$name%-14s min=${times.min}%.3f  all=${times.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
