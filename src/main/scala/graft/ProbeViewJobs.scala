package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Round-16 probe: how many Spark jobs does the catalog surface cost a
  * FRESH session? Counts jobs for (a) registerViews() itself — every
  * CREATE VIEW body is analyzed at registration, and a `parquet.`path``
  * relation in the text runs a footer-inference job per analysis,
  * cascading through derived views — and (b) the first spark.sql
  * analysis of each derived view afterwards. The schema cache (c4)
  * never reaches these: the SQL path does not resolve through
  * Lake.table.
  *
  * usage: graft.ProbeViewJobs   env: SPARK_GRAFT_SF_DIR
  */
object ProbeViewJobs {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession
      .configure(SparkSession.builder().master("local[8]"), 8)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    })
    def drain(): Int = { Thread.sleep(400); jobs.get }
    val lake = graft.catalog.Lake(spark, sfDir)
    jobs.set(0)
    lake.registerViews()
    println(s"registerViews (fresh session): jobs=${drain()}")
    for (qn <- lake.derivedQualified) {
      jobs.set(0)
      spark.sql(s"SELECT * FROM $qn").schema // analysis only, no action
      println(s"analyze $qn: jobs=${drain()}")
    }
    jobs.set(0)
    spark.sql("SELECT count(*) FROM trade.orders").collect()
    println(s"count trade.orders (analysis + action): jobs=${drain()}")
    jobs.set(0)
    lake.registerViews(force = true)
    println(s"registerViews(force) again: jobs=${drain()}")
    spark.stop()
  }
}
