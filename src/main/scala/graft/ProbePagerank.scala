package graft

import org.apache.spark.sql.SparkSession

/** graph06 DataFrame-loop vs primitive-kernel pair (round 15): the
  * suite's single most expensive query at sf10 (165 s in-suite at 8g
  * this draw; standalone needed 24g) against the bfsKernel pattern
  * applied to the rank recurrence. ProbeMicro discipline: both forms
  * interleaved in ONE JVM, alternating order per sweep, blocking
  * cache clears between runs; result sets required IDENTICAL (the
  * integer-mass argument says bit-for-bit, this enforces it).
  *
  * usage: graft.ProbePagerank [sweeps]
  * env:   SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS
  */
object ProbePagerank {
  def main(args: Array[String]): Unit = {
    val sweeps = args.headOption.map(_.toInt).getOrElse(3)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession
      .configure(SparkSession.builder().master(s"local[$cpus]"), cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val lake = graft.catalog.Lake(spark, sfDir)
    // warm the page cache off the clock, like Bench
    lake.lineitem.write.mode("overwrite").format("noop").save()
    lake.orders.write.mode("overwrite").format("noop").save()
    val variants: Seq[(String, () => Seq[String])] = Seq(
      "g06_dataframe" ->
        (() => graft.operators.Graph.graph06Pagerank(lake)
          .collect().map(_.toString).toSeq),
      "g06_kernel" ->
        (() => graft.operators.Graph.graph06PagerankKernel(lake)
          .collect().map(_.toString).toSeq)
    )
    var expected: Seq[String] = null
    val best = collection.mutable.Map[String, Double]()
    val runs =
      collection.mutable.Map[String, List[Double]]().withDefaultValue(Nil)
    for (s <- 1 to sweeps; (name, mk) <- if (s % 2 == 0) variants.reverse else variants) {
      val t0 = System.nanoTime()
      val rows = mk()
      val dt = (System.nanoTime() - t0) / 1e9
      if (expected == null) expected = rows
      else require(rows == expected, s"$name diverges from the first run")
      if (!best.contains(name) || dt < best(name)) best(name) = dt
      runs(name) = runs(name) :+ dt
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
    }
    variants.foreach { case (name, _) =>
      println(
        f"$name%-14s min=${best(name)}%.2f  all=${runs(name).map(d => f"$d%.2f").mkString(",")}"
      )
    }
    spark.stop()
  }
}
