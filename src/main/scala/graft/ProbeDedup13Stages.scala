package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage breakdown for dedup13's pre-filtered shape — dev tooling.
  * Times, in isolation: (a) the sizing scan, (b) a pure
  * scan+hash+count pass (the kernel floor), (c) the sketch build,
  * (d) the filtered end-to-end operator, (e) the unfiltered operator.
  * env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS
  */
object ProbeDedup13Stages {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession
      .configure(SparkSession.builder().master(s"local[$cpus]"), cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val lake = graft.catalog.Lake(spark, sfDir)
    lake.documents.write.mode("overwrite").format("noop").save()
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val k = 8
    val prefix =
      "shared prefix banner alpha beta gamma delta epsilon zeta eta "
    val footer =
      " common footer block one two three four five six seven eight nine"
    val planted = when(
      col("doc_id") % 7 === 0,
      concat(col("t1"), lit(footer))
    ).otherwise(col("t1"))
    def gramsRaw = lake.documents
      .select(
        col("doc_id"),
        when(col("doc_id") % 5 === 0, concat(lit(prefix), col("text")))
          .otherwise(col("text"))
          .as("t1")
      )
      .select(
        col("doc_id"),
        posexplode(graft.plans.ShingleHashSeq(planted, k)).as(Seq("pos", "gh"))
      )
    val totalChars = time("a_sizing_scan") {
      lake.documents
        .agg(coalesce(sum(length(col("text"))), lit(0L)))
        .as[Long]
        .collect()(0)
    }
    time("b_scan_hash_count") {
      gramsRaw.select("gh").write.mode("overwrite").format("noop").save()
    }
    val expected = math.max(64L, totalChars / 5)
    val sketch = time("c_sketch_build") {
      // executor-side merge to ONE partition (round 14 — the old
      // treeReduce here fetched ~sqrt(P) partial bitmaps to the
      // driver at once and DIED under the default 1g maxResultSize
      // at sf30, which is exactly why the operator's path changed)
      val partials = gramsRaw
        .select("gh")
        .queryExecution
        .toRdd
        .mapPartitions { it =>
          val s = graft.functions.TwiceSketch.create(expected, 4)
          it.foreach(r => s.add(r.getLong(0)))
          Iterator.single(s)
        }
      def mergeLevel(
          r: org.apache.spark.rdd.RDD[graft.functions.TwiceSketch],
          n: Int) =
        r.coalesce(n, shuffle = true)
          .mapPartitions(it =>
            if (it.hasNext) Iterator.single(it.reduce(_.merge(_)))
            else Iterator.empty)
      val p = partials.getNumPartitions
      val level1 =
        if (p > 8) mergeLevel(partials, math.ceil(math.sqrt(p)).toInt)
        else partials
      mergeLevel(level1, 1).collect()(0)
    }
    val bcast = spark.sparkContext.broadcast(sketch)
    time("c2_filter_pass_only") {
      gramsRaw
        .filter(graft.plans.SketchMightTwice(col("gh"), bcast))
        .write.mode("overwrite").format("noop").save()
    }
    val cand = time("f_cand_build") {
      gramsRaw
        .select("gh")
        .repartition(col("gh"))
        .groupBy("gh")
        .agg(count(lit(1)).as("occ"))
        .filter(col("occ") >= 2)
        .select("gh")
        .localCheckpoint()
    }
    println(s"   cand count = ${cand.count()}")
    val kept = time("g_semi_filter_pass") {
      val k2 = gramsRaw.join(broadcast(cand), Seq("gh"), "left_semi")
      k2.write.mode("overwrite").format("noop").save()
      k2
    }
    time("h_downstream_from_kept") {
      val grams2 = kept.repartition(col("gh"))
      val dup = grams2
        .groupBy("gh")
        .agg(countDistinct("doc_id").as("df"))
        .filter(col("df") >= 2)
        .select("gh")
      val hits = grams2.join(dup, Seq("gh"), "left_semi")
      hits
        .groupBy("doc_id")
        .agg(sort_array(collect_list("pos")).as("ps"))
        .write.mode("overwrite").format("noop").save()
    }
    time("d_full_filtered") {
      graft.operators.Dedup
        .dedup13ExactSubstring(lake)
        .write.mode("overwrite").format("noop").save()
    }
    time("e_full_unfiltered") {
      graft.operators.Dedup
        .dedup13ExactSubstring(lake, preFilter = "off")
        .write.mode("overwrite").format("noop").save()
    }
    // end-to-end sketch mode under the DEFAULT driver.maxResultSize
    // (round 14: the partial bitmaps now merge executor-side and the
    // driver fetches exactly one sketch — this run is the proof the
    // 4g global override could go)
    time("e2_full_sketch_mode") {
      graft.operators.Dedup
        .dedup13ExactSubstring(lake, preFilter = "sketch")
        .write.mode("overwrite").format("noop").save()
    }
    spark.stop()
  }
}
