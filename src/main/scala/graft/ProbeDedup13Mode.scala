package graft
import org.apache.spark.sql.SparkSession

/** The dedup13 sketch-vs-set default decision probe (VERDICT r14 #4):
  * the round-14 lead ("sketch 38.9 vs set 47.1") came from ONE JVM in
  * single-pass order — the exact ordering confound ProbeMicro exists
  * to kill. This runs both pre-filter modes INTERLEAVED in one JVM
  * with alternating sweep order and blocking cache clears between
  * runs (Bench's discipline), reporting per-mode min — the clean pair
  * the default flip (or the lead's closure) cites.
  *
  * usage: graft.ProbeDedup13Mode [sweeps]
  * env:   SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS
  *        (sf30 needs SPARK_DRIVER_MEM=16g: 32 concurrent sketch
  *        build tasks x 128 MB partials in one local JVM)
  */
object ProbeDedup13Mode {
  def main(args: Array[String]): Unit = {
    val sweeps = args.headOption.map(_.toInt).getOrElse(4)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession
      .configure(SparkSession.builder().master(s"local[$cpus]"), cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val lake = graft.catalog.Lake(spark, sfDir)
    lake.documents.write.mode("overwrite").format("noop").save()
    val modes = Seq("set", "sketch")
    val best = collection.mutable.Map[String, Double]()
    val runs =
      collection.mutable.Map[String, List[Double]]().withDefaultValue(Nil)
    for (s <- 1 to sweeps; m <- if (s % 2 == 0) modes.reverse else modes) {
      val t0 = System.nanoTime()
      graft.operators.Dedup
        .dedup13ExactSubstring(lake, preFilter = m)
        .write.mode("overwrite").format("noop").save()
      val dt = (System.nanoTime() - t0) / 1e9
      if (!best.contains(m) || dt < best(m)) best(m) = dt
      runs(m) = runs(m) :+ dt
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
    }
    modes.foreach { m =>
      println(
        f"dedup13_$m%-10s min=${best(m)}%.2f  all=${runs(m).map(d => f"$d%.2f").mkString(",")}"
      )
    }
    spark.stop()
  }
}
