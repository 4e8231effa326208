package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev probe for the BFS-family job-floor audit (VERDICT r13 #2):
  * runs one query, reports wall time vs number of jobs, stages, and
  * the sum of task times — if wall >> task-sum the cost is stage/job
  * scheduling floors, not data.
  *
  * usage: graft.ProbeGraphFloor <query> [query ...]
  * env:   SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_SWEEPS
  */
object ProbeGraphFloor {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: graft.ProbeGraphFloor <query> [...]")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sweeps = sys.env.getOrElse("SPARK_GRAFT_SWEEPS", "2").toInt
    val spark = GraftSession
      .configure(SparkSession.builder().master(s"local[$cpus]"), cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var taskMs = 0L
    @volatile var tasks = 0
    val stageLog =
      new java.util.concurrent.ConcurrentLinkedQueue[(String, Long, Int, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages += 1
        tasks += s.stageInfo.numTasks
        taskMs += s.stageInfo.taskMetrics.executorRunTime
        val dur = (for {
          a <- s.stageInfo.completionTime; b <- s.stageInfo.submissionTime
        } yield a - b).getOrElse(0L)
        stageLog.add(
          (
            s.stageInfo.name.takeWhile(_ != '\n').take(60),
            dur,
            s.stageInfo.numTasks,
            s.stageInfo.taskMetrics.executorRunTime
          )
        )
      }
    })
    // warmup
    spark.range(1000).selectExpr("sum(id)").collect()
    for (name <- args; sweep <- 1 to sweeps) {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      jobs = 0; stages = 0; taskMs = 0L; tasks = 0
      stageLog.clear()
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).collect().length
      val sec = (System.nanoTime() - t0) / 1e9
      println(
        f"$name%-28s sweep=$sweep wall=$sec%.2fs jobs=$jobs stages=$stages tasks=$tasks taskTime=${taskMs / 1000.0}%.2fs rows=$n"
      )
      if (sweep == sweeps) {
        import scala.jdk.CollectionConverters._
        val top = stageLog.asScala.toSeq.sortBy(-_._2).take(10)
        top.foreach { case (nm, dur, nt, rt) =>
          println(f"    ${dur / 1000.0}%6.2fs tasks=$nt%-4d run=${rt / 1000.0}%6.2fs  $nm")
        }
      }
    }
    spark.stop()
  }
}
