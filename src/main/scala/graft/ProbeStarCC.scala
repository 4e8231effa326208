package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-16 probe: star-CC round structure (VERDICT r15 item 3 —
  * "probe a fused large-star+small-star pass behind an interleaved
  * A/B before committing"). Two implementations of the SAME Kiveris
  * alternation, interleaved in ONE JVM with alternating sweep order,
  * label checksums REQUIRED IDENTICAL every run:
  *
  *   base  : the committed connectedComponentsStar — per round:
  *           groupBy(u) min over sym, sym join m1, distinct(u,v)
  *           [large]; groupBy(u) min, join, union, distinct [small].
  *           Each groupBy/join/distinct plans its own Exchange
  *           (~4-6 per round; the join side may reuse).
  *   fused : one explicit repartition(u) per star, every aggregate /
  *           join / dedup downstream of it exchange-free because
  *           HashPartitioning(u) satisfies ClusteredDistribution for
  *           groupBy(u), groupBy(u,v)-dedup, and the u-keyed
  *           shuffle_hash join — 3 Exchanges per round total (sym
  *           repart, large repart, final distinct), and the
  *           large-star's standalone distinct disappears (its dedup
  *           rides small-star's partition-local dropDuplicates).
  *
  * usage: graft.ProbeStarCC [sweeps]
  * env:   SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS
  */
object ProbeStarCC {
  def main(args: Array[String]): Unit = {
    val sweeps = args.headOption.flatMap(_.toIntOption).getOrElse(3)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession
      .configure(SparkSession.builder().master(s"local[$cpus]"), cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val lake = graft.catalog.Lake(spark, sfDir)
    val jobs = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    })

    // dedup08's real pair list, materialized once outside the timed region
    val pairs = graft.operators.Dedup
      .minhashPairs(lake.documents, 0.5)
      .select(col("doc_a"), col("doc_b"))
      .localCheckpoint()

    def checksum(e: DataFrame): (Long, Long) = {
      val r = e.agg(count(lit(1)), expr("bit_xor(xxhash64(u, v))")).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }

    def release(ids: Set[Int]): Unit = {
      val sc = spark.sparkContext
      ids.foreach(id =>
        sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false)))
    }
    def ckptIds(df: DataFrame): Set[Int] =
      org.apache.spark.sql.graftbridge.Bridge.checkpointRddIds(df)

    def labelsOf(edges: DataFrame): DataFrame = {
      val nodes = pairs
        .select(col("doc_a").as("u"))
        .unionAll(pairs.select(col("doc_b").as("u")))
        .distinct()
      nodes
        .join(edges.select(col("u"), col("v").as("lbl")), Seq("u"), "left")
        .select(col("u"), coalesce(col("lbl"), col("u")).as("lbl"))
    }

    // ---- base: the committed round structure ----
    def ccBase(maxIters: Int): DataFrame = {
      var edges = pairs
        .select(
          greatest(col("doc_a"), col("doc_b")).as("u"),
          least(col("doc_a"), col("doc_b")).as("v"))
        .filter(col("u") =!= col("v"))
        .distinct()
        .localCheckpoint(false)
      var prev = (-1L, -1L)
      var cur = checksum(edges)
      var iter = 0
      var prevCkpt = ckptIds(edges)
      while (cur != prev && iter < maxIters) {
        val sym =
          edges.unionAll(edges.select(col("v").as("u"), col("u").as("v")))
        val m1 = sym.groupBy("u").agg(min("v").as("mn"))
        val large = sym
          .join(m1, "u")
          .withColumn("m", least(col("u"), col("mn")))
          .filter(col("v") > col("u"))
          .select(col("v").as("u"), col("m").as("v"))
          .filter(col("u") =!= col("v"))
          .distinct()
        val oriented = large.select(
          greatest(col("u"), col("v")).as("u"),
          least(col("u"), col("v")).as("v"))
        val m2 = oriented.groupBy("u").agg(min("v").as("m"))
        val small = oriented
          .join(m2, "u")
          .select(col("v").as("u"), col("m").as("v"))
          .unionAll(m2.select(col("u"), col("m").as("v")))
          .filter(col("u") =!= col("v"))
          .distinct()
        edges = small.localCheckpoint(false)
        val added = ckptIds(edges)
        prev = cur
        cur = checksum(edges)
        release(prevCkpt)
        prevCkpt = added
        iter += 1
      }
      println(s"    base: rounds=$iter")
      val out = labelsOf(edges)
      out
    }

    // ---- fused: one exchange per star ----
    def ccFused(maxIters: Int): DataFrame = {
      var edges = pairs
        .select(
          greatest(col("doc_a"), col("doc_b")).as("u"),
          least(col("doc_a"), col("doc_b")).as("v"))
        .filter(col("u") =!= col("v"))
        .distinct()
        .localCheckpoint(false)
      var prev = (-1L, -1L)
      var cur = checksum(edges)
      var iter = 0
      var prevCkpt = ckptIds(edges)
      while (cur != prev && iter < maxIters) {
        val sym = edges
          .unionAll(edges.select(col("v").as("u"), col("u").as("v")))
          .repartition(col("u"))
        val m1 = sym.groupBy("u").agg(min("v").as("mn"))
        // m = min(N(u) ∪ {u}); emission (v, m) for v > u has v > u >= m,
        // so the output is already oriented large->small and self-loop
        // free — no distinct here: small-star's partition-local dedup
        // subsumes it.
        val large = sym
          .join(m1.hint("shuffle_hash"), "u")
          .withColumn("m", least(col("u"), col("mn")))
          .filter(col("v") > col("u"))
          .select(col("v").as("u"), col("m").as("v"))
          .repartition(col("u"))
        val dis = large.dropDuplicates("u", "v")
        val m2 = dis.groupBy("u").agg(min("v").as("m"))
        val small = dis
          .join(m2.hint("shuffle_hash"), "u")
          .select(col("v").as("u"), col("m").as("v"))
          .unionAll(m2.select(col("u"), col("m").as("v")))
          .filter(col("u") =!= col("v"))
          .distinct()
        edges = small.localCheckpoint(false)
        val added = ckptIds(edges)
        prev = cur
        cur = checksum(edges)
        release(prevCkpt)
        prevCkpt = added
        iter += 1
      }
      println(s"    fused: rounds=$iter")
      labelsOf(edges)
    }

    def labelChecksum(l: DataFrame): (Long, Long) = {
      val r = l.agg(count(lit(1)), expr("bit_xor(xxhash64(u, lbl))")).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }

    // `explain` mode: print ONE round's physical plan for each variant
    // (the committed query dumps can't show the loop — the checkpoint
    // truncates lineage above them), then exit.
    if (args.contains("explain")) {
      val edges0 = pairs
        .select(
          greatest(col("doc_a"), col("doc_b")).as("u"),
          least(col("doc_a"), col("doc_b")).as("v"))
        .filter(col("u") =!= col("v"))
        .distinct()
        .localCheckpoint()
      def baseRound(edges: DataFrame): DataFrame = {
        val sym =
          edges.unionAll(edges.select(col("v").as("u"), col("u").as("v")))
        val m1 = sym.groupBy("u").agg(min("v").as("mn"))
        val large = sym
          .join(m1, "u")
          .withColumn("m", least(col("u"), col("mn")))
          .filter(col("v") > col("u"))
          .select(col("v").as("u"), col("m").as("v"))
          .filter(col("u") =!= col("v"))
          .distinct()
        val oriented = large.select(
          greatest(col("u"), col("v")).as("u"),
          least(col("u"), col("v")).as("v"))
        val m2 = oriented.groupBy("u").agg(min("v").as("m"))
        oriented
          .join(m2, "u")
          .select(col("v").as("u"), col("m").as("v"))
          .unionAll(m2.select(col("u"), col("m").as("v")))
          .filter(col("u") =!= col("v"))
          .distinct()
      }
      def fusedRound(edges: DataFrame): DataFrame = {
        val sym = edges
          .unionAll(edges.select(col("v").as("u"), col("u").as("v")))
          .repartition(col("u"))
        val m1 = sym.groupBy("u").agg(min("v").as("mn"))
        val large = sym
          .join(m1.hint("shuffle_hash"), "u")
          .withColumn("m", least(col("u"), col("mn")))
          .filter(col("v") > col("u"))
          .select(col("v").as("u"), col("m").as("v"))
          .repartition(col("u"))
        val dis = large.dropDuplicates("u", "v")
        val m2 = dis.groupBy("u").agg(min("v").as("m"))
        dis
          .join(m2.hint("shuffle_hash"), "u")
          .select(col("v").as("u"), col("m").as("v"))
          .unionAll(m2.select(col("u"), col("m").as("v")))
          .filter(col("u") =!= col("v"))
          .distinct()
      }
      println("===== starcc round: base")
      baseRound(edges0).explain("formatted")
      println("===== starcc round: fused")
      fusedRound(edges0).explain("formatted")
      spark.stop()
      return
    }

    val variants: Seq[(String, () => DataFrame)] = Seq(
      "base" -> (() => ccBase(30)),
      "fused" -> (() => ccFused(30))
    )
    var golden: Option[(Long, Long)] = None
    for (s <- 1 to sweeps) {
      val order = if (s % 2 == 1) variants else variants.reverse
      for ((name, f) <- order) {
        jobs.set(0)
        val t0 = System.nanoTime()
        val cs = labelChecksum(f())
        val sec = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300)
        golden match {
          case None => golden = Some(cs)
          case Some(g) =>
            require(g == cs, s"$name checksum $cs != golden $g")
        }
        println(f"  sweep $s $name%-6s ${sec}%7.3f s  jobs=${jobs.get}%3d  cs=$cs")
        // release everything EXCEPT the shared pairs checkpoint (its
        // lineage is truncated — unpersisting it would kill later runs)
        val keep = ckptIds(pairs)
        spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
          if (!keep.contains(id)) rdd.unpersist(blocking = true)
        }
      }
    }
    spark.stop()
  }
}
