package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Scale validation for the streaming sinks (VERDICT r13 #6): the
  * batch operators have sf30 evidence, but the streaming twins were
  * spec-verified on MemoryStream fixtures only. This replays the sf1
  * documents table through a real FILE source in >= 10 batches
  * (maxFilesPerTrigger=1 over pre-staged chunk files), driving
  *   - minhashPairsBatchSink (batch-keyed store, cross-batch probe),
  *   - pretrainPrefixBatchSink (survivor store + Bloom),
  *   - dedupProbe (stream vs a static band index),
  * then measures store compaction and — the batch-vs-stream
  * equivalence check at scale — compares the union of the sink's
  * per-batch pairs against the single-batch dedup04 pair set on the
  * same corpus (they must be EQUAL: LSH banding is order-independent
  * and the store probes every prior batch).
  *
  * usage: graft.ProbeStreamReplay [nBatches]
  * env:   SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS
  */
object ProbeStreamReplay {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/sfgen/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val nBatches = args.headOption.map(_.toInt).getOrElse(12)
    val spark = GraftSession
      .configure(SparkSession.builder().master(s"local[$cpus]"), cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val lake = graft.catalog.Lake(spark, sfDir)
    val work = java.nio.file.Files.createTempDirectory("streamreplay").toFile
    val inbox = new java.io.File(work, "inbox").getAbsolutePath
    // doc_id + text feed the LSH sinks; source is
    // pretrainPrefixBatchSink's mixture column
    val docs = lake.documents.select("doc_id", "source", "text")
    val total = docs.count()
    // stage one parquet file per batch: mod-split so every chunk has
    // the full range of planted dup groups (worst case for the store)
    (0 until nBatches).foreach { b =>
      docs
        .filter(col("doc_id") % nBatches === b)
        .coalesce(1)
        .write
        .mode("overwrite")
        .parquet(f"$inbox/chunk=$b%03d")
    }
    // flatten chunk files into the inbox root (file source reads a
    // flat dir; chunk= subdirs would be partition columns)
    val inboxDir = new java.io.File(inbox)
    val flat = new java.io.File(work, "flat"); flat.mkdirs()
    var i = 0
    inboxDir.listFiles().sortBy(_.getName).foreach { d =>
      d.listFiles()
        .filter(f => f.getName.endsWith(".parquet"))
        .foreach { f =>
          val tgt = new java.io.File(flat, f"part-$i%03d.parquet")
          java.nio.file.Files.move(f.toPath, tgt.toPath)
          i += 1
        }
    }
    println(s"[replay] $total docs staged as $i files, ${nBatches} batches")
    val schema = docs.schema

    def runSink(
        label: String,
        sink: (DataFrame, Long) => Unit
    ): Unit = {
      val batchSecs = collection.mutable.ArrayBuffer[Double]()
      val timed: (DataFrame, Long) => Unit = { (df, id) =>
        val t0 = System.nanoTime()
        sink(df, id)
        batchSecs += (System.nanoTime() - t0) / 1e9
      }
      val q = spark.readStream
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(flat.getAbsolutePath)
        .writeStream
        .option(
          "checkpointLocation",
          new java.io.File(work, s"ckpt-$label").getAbsolutePath
        )
        .foreachBatch(timed)
        .trigger(Trigger.AvailableNow())
        .start()
      val t0 = System.nanoTime()
      q.awaitTermination()
      val wall = (System.nanoTime() - t0) / 1e9
      println(
        f"[$label] batches=${batchSecs.size} wall=$wall%.1fs " +
          f"docs/s=${total / wall}%.0f per-batch=" +
          batchSecs.map(s => f"$s%.1f").mkString(",")
      )
    }

    // 1) minhash pairs sink
    val mhState = new java.io.File(work, "mhstate").getAbsolutePath
    runSink("minhashPairsBatchSink",
      graft.operators.Dedup.minhashPairsBatchSink(mhState))
    // batch-vs-stream equivalence: union of per-batch pair outputs ==
    // the single-batch LSH pair set on the same corpus + threshold
    val streamed = spark.read
      .parquet(s"$mhState/pairs/batch=*")
      .select("doc_a", "doc_b")
      .distinct()
    // maxBucket uncapped: the sink has no bucket cap (deliberately —
    // the knob lives at index-build time), so the batch side must run
    // uncapped too or the comparison diffs on cap semantics
    val batchPairs = graft.operators.Dedup
      .dedup04MinhashLsh(lake, maxBucket = Int.MaxValue)
      .select("doc_a", "doc_b")
    val onlyStream = streamed.exceptAll(batchPairs).count()
    val onlyBatch = batchPairs.exceptAll(streamed).count()
    println(
      s"[equivalence] streamed=${streamed.count()} batch=${batchPairs.count()} " +
        s"onlyStream=$onlyStream onlyBatch=$onlyBatch"
    )
    // 2) compaction: merge the per-batch stores, then verify the
    // store still probes (one more synthetic batch against it)
    locally {
      val t0 = System.nanoTime()
      graft.operators.Dedup
        .compactBandStore(spark, mhState, upTo = (nBatches - 1).toLong)
      println(f"[compaction] ${(System.nanoTime() - t0) / 1e9}%.1fs")
      val extra = docs.limit(100)
      graft.operators.Dedup
        .minhashPairsBatchSink(mhState)(extra, nBatches.toLong)
      println("[compaction] post-compaction probe batch ok")
    }
    // 3) pretrain prefix sink
    val ppState = new java.io.File(work, "ppstate").getAbsolutePath
    runSink("pretrainPrefixBatchSink",
      graft.operators.Pipeline.pretrainPrefixBatchSink(ppState))
    // 4) dedupProbe as a stream transform against a static index of
    // the EVEN half; the ODD half streams through the probe
    locally {
      val idxDir = new java.io.File(work, "bandindex").getAbsolutePath
      // writeBandIndex indexes a lake's documents table: stage the
      // even half as a one-table lake dir (the "already accepted
      // corpus" side of the production shape)
      val evenLakeDir = new java.io.File(work, "evenlake").getAbsolutePath
      docs
        .filter(col("doc_id") % 2 === 0)
        .write
        .mode("overwrite")
        .parquet(s"$evenLakeDir/documents.parquet")
      graft.operators.Dedup
        .writeBandIndex(graft.catalog.Lake(spark, evenLakeDir), idxDir)
      val index = spark.read.parquet(s"$idxDir/bands")
      val shingles = spark.read.parquet(s"$idxDir/shingles")
      val t0 = System.nanoTime()
      val q = spark.readStream
        .schema(schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(flat.getAbsolutePath)
        .where(col("doc_id") % 2 === 1)
        .transform(df =>
          graft.operators.Dedup.dedupProbe(df, index, shingles))
        .writeStream
        .option(
          "checkpointLocation",
          new java.io.File(work, "ckpt-probe").getAbsolutePath
        )
        .format("noop")
        .outputMode("complete") // dedupProbe aggregates per-doc verdicts
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      println(f"[dedupProbe] wall=${(System.nanoTime() - t0) / 1e9}%.1fs")
    }
    println(s"[replay] state dirs under $work")
    spark.stop()
  }
}
