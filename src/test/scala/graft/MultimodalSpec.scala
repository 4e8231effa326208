package graft

import graft.catalog.Lake
import graft.multimodal.Multimodal
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  import TestSpark._
  private lazy val lake = Lake(spark, sfDir)

  test("media rows carry payload bytes and consistent metadata") {
    val rows = Multimodal.asMedia(lake).take(5)
    rows.foreach { r =>
      assert(r.payload.length.toLong == r.n_bytes)
      assert(r.format == "text/plain")
    }
  }

  test("image payloads decode through ImageIO to real pixel features") {
    import java.awt.image.BufferedImage
    import Multimodal.MediaRow
    val sess = spark
    import sess.implicits._
    // Synthesize PNGs with known dimensions and a solid color.
    def png(w: Int, h: Int, rgb: Int): Array[Byte] = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val red = png(8, 6, 0xff0000)
    val gray = png(4, 4, 0x808080)
    val media = Seq(
      MediaRow(1L, red, "image/png", red.length.toLong),
      MediaRow(2L, gray, "image/png", gray.length.toLong),
      MediaRow(3L, "not an image".getBytes("UTF-8"), "image/png", 12L),
      MediaRow(4L, "plain text".getBytes("UTF-8"), "text/plain", 10L)
    ).toDS()
    val feats = Multimodal.extractFeatures(media)
      .collect().map(f => f.doc_id -> f.features).toMap
    // red 8x6: dims + aspect + pure-red channel means
    assert(feats(1L).take(3).sameElements(Array(8.0, 6.0, 1.3333)))
    assert(feats(1L)(3) == 1.0 && feats(1L)(4) == 0.0 && feats(1L)(5) == 0.0)
    // gray 4x4: all channels 128/255
    assert(feats(2L).take(3).sameElements(Array(4.0, 4.0, 1.0)))
    assert(feats(2L)(3) == 0.502 && feats(2L)(6) == 0.502)
    // undecodable image payload falls back to the byte histogram
    assert(math.abs(feats(3L).sum - 1.0) < 0.01)
    // non-image formats keep the histogram path
    assert(math.abs(feats(4L).sum - 1.0) < 0.01)
    feats.values.foreach(f => assert(f.length == Multimodal.FeatureWidth))
  }

  test("thumbnail resize box-averages pixels into the target grid") {
    import java.awt.image.BufferedImage
    // 8x8 image: left half pure red, right half pure blue
    val img = new BufferedImage(8, 8, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 8)
      img.setRGB(x, y, if (x < 4) 0xff0000 else 0x0000ff)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val thumb = Multimodal.thumbnail(bos.toByteArray, tw = 2, th = 2).get
    // left cells = red luma (0.299), right cells = blue luma (0.114)
    assert(thumb.length == 4)
    assert(thumb(0) == 0.299 && thumb(2) == 0.299)
    assert(thumb(1) == 0.114 && thumb(3) == 0.114)
    // undecodable payload yields None, not an exception
    assert(Multimodal.thumbnail("junk".getBytes("UTF-8")).isEmpty)
  }

  test("frame sampling: decodeFrames matches mm02's sampling contract exactly") {
    import Multimodal.MediaRow
    val sess = spark
    import sess.implicits._
    // synthetic 200-byte payload = frames [0..63][64..127][128..191][192..199];
    // every=2 samples frames 0 and 2
    val payload = Array.tabulate[Byte](200)(i => (i % 256).toByte)
    val media = Seq(MediaRow(7L, payload, "video/raw", 200L)).toDS()
    val frames = Multimodal
      .decodeFrames(media, frameBytes = 64, every = 2)
      .collect()
      .sortBy(_.frame_idx)
    assert(frames.map(_.frame_idx).toSeq == Seq(0L, 2L))
    // frame 0 = bytes 0..63: values 0..63 all fall in histogram
    // buckets 0 (0..31) and 1 (32..63), half each
    assert(frames(0).features.toSeq == Seq(0.5, 0.5, 0, 0, 0, 0, 0, 0))
    // frame 2 = bytes 128..191 -> buckets 4 and 5
    assert(frames(1).features.toSeq == Seq(0, 0, 0, 0, 0.5, 0.5, 0, 0))
    // sampled (doc_id, frame_idx) sets agree between the expression
    // path (mm02, oracle-gated) and the decode path on the corpus
    val exprIdx = Multimodal
      .mm02FrameSample(lake)
      .select("doc_id", "frame_idx")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    val decodeIdx = Multimodal
      .decodeFrames(Multimodal.asMedia(lake))
      .collect()
      .map(f => (f.doc_id, f.frame_idx))
      .toSet
    assert(exprIdx == decodeIdx)
  }

  test("audio features match a plain-Scala reference computation") {
    import graft.multimodal.Multimodal
    val out = Multimodal.mm03AudioFeatures(lake, windowSamples = 32)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getDouble(3), r.getLong(4), r.getLong(5))))
      .toMap
    assert(out.nonEmpty)
    // recompute every window of the first 20 docs byte-for-byte
    val docs = lake.documents.select("doc_id", "text")
      .orderBy("doc_id").limit(20).collect()
    docs.foreach { row =>
      val id = row.getLong(0)
      val bytes = row.getString(1).getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val nWin = math.max(1, (bytes.length + 31) / 32)
      (0 until nWin).foreach { w =>
        val win = bytes.slice(w * 32, math.min((w + 1) * 32, bytes.length))
          .map(b => (b & 0xff) - 128)
        val n = win.length.toLong
        val rms = math.rint(math.sqrt(
          win.map(x => x.toDouble * x).sum / math.max(n, 1L)) * 1e4) / 1e4
        val zc = win.sliding(2).count {
          case Array(a, b) => (a >= 0) != (b >= 0)
          case _           => false
        }.toLong
        val peak = if (win.isEmpty) 0L else win.map(math.abs).max.toLong
        assert(out((id, w.toLong)) == ((n, rms, zc, peak)), s"doc $id win $w")
      }
    }
    // global invariants over the full output
    out.values.foreach { case (n, rms, zc, peak) =>
      assert(rms >= 0 && rms <= 128 && peak <= 128 && zc <= math.max(0L, n - 1))
    }
  }

  test("scene cuts: segments consistent, threshold extremes degenerate correctly") {
    val lake = graft.catalog.Lake(TestSpark.spark, TestSpark.sfDir)
    val rows = Multimodal.mm04SceneCuts(lake).collect()
    rows.foreach { r =>
      val (frames, cuts, segs) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(cuts <= frames - 1 || frames == 1, s"too many cuts: $r")
      assert(segs == cuts + 1, s"segments != cuts+1: $r")
      assert(math.abs(r.getDouble(4) - frames.toDouble / segs) < 1e-3)
    }
    // an unreachable threshold yields one segment per doc...
    val none = Multimodal.mm04SceneCuts(lake, threshold = 1e9).collect()
    assert(none.forall(r => r.getLong(2) == 0L && r.getLong(3) == 1L))
    // ...and threshold 0 marks every frame transition a cut
    val all = Multimodal.mm04SceneCuts(lake, threshold = 0.0).collect()
    assert(all.forall(r => r.getLong(2) == r.getLong(1) - 1))
  }

  test("phash near-dup: canonical pairs, exact dups at hamming 0, tighter budget nests") {
    import org.apache.spark.sql.functions._
    val pairs = Multimodal.mm05PhashNeardup(lake).collect()
    assert(pairs.nonEmpty)
    // canonical orientation, no duplicate pairs
    val keys = pairs.map(r => (r.getLong(0), r.getLong(1)))
    assert(keys.forall { case (a, b) => a < b })
    assert(keys.distinct.length == keys.length)
    pairs.foreach(r => assert(r.getLong(2) >= 0L && r.getLong(2) <= 3L))
    val zeros = pairs.filter(_.getLong(2) == 0L).map(r => (r.getLong(0), r.getLong(1))).toSet
    // a tighter Hamming budget is exactly the filtered superset
    val tight = Multimodal.mm05PhashNeardup(lake, maxHamming = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(tight == zeros)
    // plant an exact payload duplicate in a copy of the lake: the
    // pair MUST surface at hamming 0 (identical bytes hash
    // identically, and the band join cannot miss an equal hash)
    val dir = java.nio.file.Files.createTempDirectory("mm05_lake").toString
    val src = lake.documents
    val dupId = 999999L
    src
      .union(
        src.orderBy("doc_id").limit(1).withColumn("doc_id", lit(dupId))
      )
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "embeddings").foreach { t =>
      lake.table(t).limit(0).write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    val planted = graft.catalog.Lake(TestSpark.spark, dir)
    val origId = src.orderBy("doc_id").limit(1).collect()(0).getLong(0)
    val got = Multimodal.mm05PhashNeardup(planted)
      .filter(col("doc_b") === dupId && col("doc_a") === origId)
      .collect()
    assert(got.length == 1 && got(0).getLong(2) == 0L,
      s"planted dup pair ($origId,$dupId) missing or nonzero")
  }

  test("phash near-dup: degenerate payloads (tiny or constant) produce no pairs") {
    import org.apache.spark.sql.functions._
    // 60 docs, all hashing to the degenerate h = 0: half too short to
    // fill two feature windows, half constant-byte (every window has
    // identical rms, so no cyclic increase sets a bit). Without the
    // h <> 0 exclusion these would emit C(60,2) = 1770 false
    // hamming-0 "near-dups" out of one skewed band bucket.
    val dir = java.nio.file.Files.createTempDirectory("mm05_degen").toString
    lake.documents
      .orderBy("doc_id").limit(60)
      .withColumn(
        "text",
        when(pmod(col("doc_id"), lit(2)) === 0, lit("ab"))
          .otherwise(lit("a" * 640))
      )
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "embeddings").foreach { t =>
      lake.table(t).limit(0).write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    val degen = graft.catalog.Lake(TestSpark.spark, dir)
    assert(Multimodal.mm05PhashNeardup(degen).count() == 0L)
  }

  test("phash samples STRIDED across long payloads, not just the first 64 windows") {
    import org.apache.spark.sql.functions._
    // 128 windows (step = 128 div 64 = 2): the first 65 windows are
    // constant-rms 'a' runs, all signal lives in the back half. The
    // first-64-windows hash would see only equal-rms comparisons,
    // yield h = 0, and silently exclude both docs from near-dup
    // detection despite their carrying identical real signal; the
    // strided hash spans the whole stream, hashes nonzero, and the
    // planted identical pair MUST surface at hamming 0.
    val dir = java.nio.file.Files.createTempDirectory("mm05_stride").toString
    val payload = "a" * (32 * 65) + " " * (32 * 63)
    lake.documents
      .orderBy("doc_id").limit(2)
      .withColumn("text", lit(payload))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "embeddings").foreach { t =>
      lake.table(t).limit(0).write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    val planted = graft.catalog.Lake(TestSpark.spark, dir)
    val got = Multimodal.mm05PhashNeardup(planted).collect()
    assert(got.length == 1 && got(0).getLong(2) == 0L,
      s"strided hash should pair the identical long payloads, got ${got.mkString(",")}")
  }

  test("feature extraction is deterministic and fixed-width") {
    val a = Multimodal.extractFeatures(Multimodal.asMedia(lake))
      .collect().sortBy(_.doc_id)
    val b = Multimodal.extractFeatures(Multimodal.asMedia(lake))
      .collect().sortBy(_.doc_id)
    assert(a.length == b.length && a.length == 500)
    a.zip(b).foreach { case (x, y) =>
      assert(x.features.length == 8)
      assert(x.features.sameElements(y.features))
      // histogram is normalized: buckets sum to ~1
      assert(math.abs(x.features.sum - 1.0) < 0.01)
    }
  }
}
