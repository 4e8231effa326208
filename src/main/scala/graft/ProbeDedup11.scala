package graft

import org.apache.spark.sql.SparkSession

/** Dev probe validating dedup11's pair-kernel cutover at scale
  * (VERDICT r13 #7: the 1e8 expected-pair constant was measured at
  * sf10 only): times the row-level self-join vs the fused block
  * kernel, both forced, in one JVM at the given SF, and asserts the
  * two modes return identical rows (the mode-identity contract).
  *
  * usage: graft.ProbeDedup11
  * env:   SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_SWEEPS
  */
object ProbeDedup11 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sweeps = sys.env.getOrElse("SPARK_GRAFT_SWEEPS", "3").toInt
    val spark = GraftSession
      .configure(SparkSession.builder().master(s"local[$cpus]"), cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val lake = graft.catalog.Lake(spark, sfDir)
    lake.resolve("embeddings").write.mode("overwrite").format("noop").save()
    var expected: Seq[String] = null
    val all = Seq("row" -> Double.MaxValue, "blocked" -> 0.0)
    val modes =
      if (args.nonEmpty) all.filter(m => args.contains(m._1)) else all
    for ((label, cutover) <- modes) {
      val times = (1 to sweeps).map { _ =>
        spark.sharedState.cacheManager.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
        val t0 = System.nanoTime()
        val rows = graft.operators.Dedup
          .semanticDedup(
            graft.operators.Similarity.vecs(lake),
            k = 10, iters = 2, tau = 0.4, blockedCutover = cutover
          )
          .collect()
          .map(_.toString)
          .sorted
          .toSeq
        val sec = (System.nanoTime() - t0) / 1e9
        if (expected == null) expected = rows
        else require(rows == expected, s"$label diverges")
        sec
      }
      println(
        f"dedup11-$label%-10s min=${times.min}%.2f all=${times.map(x => f"$x%.2f").mkString(",")}"
      )
    }
    spark.stop()
  }
}
