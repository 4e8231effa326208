package graft
import org.apache.spark.sql.SparkSession

/** Local perf iteration: time a handful of queries by name without
  * paying for the whole 105-query sweep. Same measurement discipline
  * as Bench (noop sink, untimed warmup, min of N sweeps).
  *
  * usage: graft.BenchOne <query> [query ...]
  * env:   SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_SWEEPS
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: graft.BenchOne <query> [query ...]")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sweeps = sys.env.getOrElse("SPARK_GRAFT_SWEEPS", "3").toInt
    // SPARK_GRAFT_MASTER overrides the in-process master — the
    // multi-executor validation knob: `local-cluster[4,8,8192]` runs
    // REAL worker JVMs (serialized shuffle blocks, broadcast over the
    // block manager, per-executor memory), the closest this sandbox
    // gets to cluster execution. local[N] shares one heap and one
    // block manager, so serde-sensitive plan behavior is invisible to
    // it. Requires SPARK_HOME (worker launch scripts) AND
    // SPARK_SCALA_VERSION=2.13 (without it the executor launcher
    // dies with "Cannot find any build directories" — it probes
    // $SPARK_HOME/launcher/target, a source-tree layout the binary
    // distro lacks); application classes reach the executors via
    // extraClassPath (same box).
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]")
    val builder = SparkSession.builder().master(master)
    if (master.startsWith("local-cluster")) {
      val classes = new java.io.File("target/scala-2.13/classes").getAbsolutePath
      builder
        .config("spark.executor.extraClassPath", classes)
        .config("spark.executor.memory",
          sys.env.getOrElse("SPARK_GRAFT_EXEC_MEM", "8g"))
    }
    val spark = GraftSession
      .configure(builder, cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val lake = graft.catalog.Lake(spark, sfDir)
    lake.tableNames.foreach { n =>
      lake.resolve(n).write.mode("overwrite").format("noop").save()
    }
    // Caches are released after each sweep's clock stops — DEFAULT ON
    // since round 13, matching graft.Bench: an operator that persists
    // internally (dedup13's repartitioned stream) would otherwise
    // serve sweep N+1 from sweep N's cache and min-of-sweeps records
    // a cache hit, not the query; accumulated storage also evicts
    // later sweeps' blocks at scale (observed 48 s -> 271 s ASCENDING
    // sweeps on dedup10 at sf10). SPARK_GRAFT_CLEAR=0 opts out for
    // warm-cache experiments.
    val clearPerSweep = !sys.env.get("SPARK_GRAFT_CLEAR").contains("0")
    for (name <- args) {
      val fn = SparkEntry.queries(name)
      val times = (1 to sweeps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        val dt = (System.nanoTime() - t0) / 1e9
        if (clearPerSweep) {
          // blocking: async block removal would land inside the next
          // sweep's timed window (measured +23% on the sf0.1 suite
          // when Bench cleared async — same lesson)
          spark.sharedState.cacheManager.clearCache()
          spark.sparkContext.getPersistentRDDs.values
            .foreach(_.unpersist(blocking = true))
        }
        dt
      }
      println(f"$name%-30s min=${times.min}%.3f  all=${times.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
