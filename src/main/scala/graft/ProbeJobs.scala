package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Round-15 probe: JOB and STAGE counts per query — the structural
  * counterpart to BenchOne's wall clock. On this box every Spark job
  * pays a ~0.1-0.3 s scheduling floor, so for the iterative operators
  * (star-CC, Lloyd loops) the job count IS the cost model, and unlike
  * wall clock it is immune to the box's multi-second noise windows —
  * the honest way to A/B a driver-loop restructuring across two
  * builds (an interleaved same-JVM pair is impossible when the two
  * forms are two versions of the same method).
  *
  * usage: graft.ProbeJobs <query> [query ...]
  * env:   SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS
  */
object ProbeJobs {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: graft.ProbeJobs <query> [query ...]")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession
      .configure(SparkSession.builder().master(s"local[$cpus]"), cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val lake = graft.catalog.Lake(spark, sfDir)
    lake.tableNames.foreach { n =>
      lake.resolve(n).write.mode("overwrite").format("noop").save()
    }
    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
    })
    for (name <- args) {
      jobs.set(0); stages.set(0)
      SparkEntry.queries(name)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      // listener events are queued; give the bus a beat to drain
      // before reading the counters (listenerBus is private[spark])
      Thread.sleep(300)
      println(f"$name%-30s jobs=${jobs.get}%3d stages=${stages.get}%3d")
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
    }
    spark.stop()
  }
}
