package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Round-15 micro-probe: does a bare `spark.read.parquet` (Lake.table)
  * cost a Spark job before any action? Counts jobs for repeated table
  * resolutions vs one resolution reused.
  */
object ProbeLakeJobs {
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
    def drain(): Int = { Thread.sleep(300); jobs.get }
    val lake = graft.catalog.Lake(spark, sfDir)
    jobs.set(0)
    val d1 = lake.documents
    println(s"first resolve of documents: jobs=${drain()}")
    jobs.set(0)
    val d2 = lake.documents
    val d3 = lake.documents
    println(s"two more resolves: jobs=${drain()}")
    jobs.set(0)
    d1.write.mode("overwrite").format("noop").save()
    println(s"noop over first handle: jobs=${drain()}")
    jobs.set(0)
    val l2 = graft.catalog.Lake(spark, sfDir)
    val d4 = l2.documents
    println(s"resolve via NEW Lake instance: jobs=${drain()}")
    spark.stop()
  }
}
