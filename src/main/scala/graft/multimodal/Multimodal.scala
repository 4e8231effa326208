package graft.multimodal

import graft.catalog.Lake
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: opaque binary payloads + typed
  * metadata, with batch-shaped feature extraction.
  *
  * The Spark-side contract is real — schema (binary + metadata
  * struct), partition-parallel batch decode via mapPartitions with
  * typed Encoders, fixed-width feature output. The decode step is
  * format-dispatched: image payloads go through a REAL pure-JVM
  * decoder (javax.imageio reads PNG/JPEG/BMP/GIF into pixels,
  * features = dimensions + mean channel intensities); everything else
  * (audio/video would need codec libs this container lacks) falls
  * back to `decodeStub`, a deterministic byte histogram with the same
  * fixed-width signature. Swapping in an FFmpeg/JNI decoder touches
  * only `decode`, never the plumbing.
  */
object Multimodal {

  case class MediaRow(
      doc_id: Long,
      payload: Array[Byte],
      format: String,
      n_bytes: Long
  )

  case class FeatureRow(
      doc_id: Long,
      format: String,
      n_bytes: Long,
      features: Array[Double]
  )

  /** Wrap a text corpus as binary media rows (payload + metadata) —
    * the shape an image/audio table has at rest in parquet. */
  def asMedia(lake: Lake): Dataset[MediaRow] = {
    val spark = lake.spark
    import spark.implicits._
    lake.documents
      .select(
        col("doc_id"),
        col("text").cast("binary").as("payload"),
        lit("text/plain").as("format"),
        length(col("text")).cast("long").as("n_bytes")
      )
      .as[MediaRow]
  }

  /** Feature width shared by every decoder so downstream columns are
    * schema-stable regardless of format. */
  val FeatureWidth = 8

  /** Real image decode: javax.imageio (pure JVM, in every JRE) parses
    * the payload; features = [width, height, aspect, meanR, meanG,
    * meanB, meanLuma, 1.0], channel means normalized to [0,1].
    * Returns None when ImageIO cannot parse the bytes (corrupt or
    * unsupported payload) so callers can fall back instead of
    * failing the partition. */
  def decodeImage(payload: Array[Byte]): Option[Array[Double]] = {
    // NonFatal, not just IOException: ImageIO throws RuntimeExceptions
    // on corrupt payloads (CMMException for bad ICC profiles,
    // IndexOutOfBounds on truncated GIF/PNG) — at corpus scale one
    // adversarial image must degrade to the fallback, not kill the job.
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      catch { case scala.util.control.NonFatal(_) => null }
    Option(img).map { im =>
      val w = im.getWidth
      val h = im.getHeight
      var r, g, b = 0.0
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val p = im.getRGB(x, y)
          r += (p >>> 16) & 0xff
          g += (p >>> 8) & 0xff
          b += p & 0xff
          x += 1
        }
        y += 1
      }
      val n = (w.toLong * h).toDouble * 255.0
      def r4(d: Double) = math.rint(d * 10000) / 10000
      Array(
        w.toDouble,
        h.toDouble,
        r4(w.toDouble / h),
        r4(r / n),
        r4(g / n),
        r4(b / n),
        r4((0.299 * r + 0.587 * g + 0.114 * b) / n),
        1.0
      )
    }
  }

  /** Fixed-size grayscale thumbnail via box-average resize — the
    * "resize" step of an image pipeline, pure JVM: every source pixel
    * contributes to exactly one cell of the tw x th grid, cells
    * average their pixels' luma in [0,1] (row-major output). Returns
    * None when the payload doesn't decode. */
  def thumbnail(
      payload: Array[Byte],
      tw: Int = 4,
      th: Int = 4
  ): Option[Array[Double]] = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      catch { case scala.util.control.NonFatal(_) => null }
    Option(img).map { im =>
      val w = im.getWidth
      val h = im.getHeight
      val sums = new Array[Double](tw * th)
      val ns = new Array[Long](tw * th)
      var y = 0
      while (y < h) {
        val cy = math.min(y * th / h, th - 1)
        var x = 0
        while (x < w) {
          val cx = math.min(x * tw / w, tw - 1)
          val p = im.getRGB(x, y)
          val luma = (0.299 * ((p >>> 16) & 0xff) +
            0.587 * ((p >>> 8) & 0xff) +
            0.114 * (p & 0xff)) / 255.0
          val cell = cy * tw + cx
          sums(cell) += luma
          ns(cell) += 1
          x += 1
        }
        y += 1
      }
      Array.tabulate(tw * th) { i =>
        if (ns(i) == 0) 0.0
        else math.rint(sums(i) / ns(i) * 10000) / 10000
      }
    }
  }

  /** Format-dispatched decode: real image path for "image/..."
    * formats, byte histogram otherwise (and for undecodable image
    * payloads). */
  def decode(format: String, payload: Array[Byte]): Array[Double] =
    if (format.startsWith("image/"))
      decodeImage(payload).getOrElse(decodeStub(payload))
    else decodeStub(payload)

  /** Fallback decoder: deterministic 8-bucket byte histogram,
    * normalized — the stand-in for formats whose codecs (audio,
    * video) aren't available as pure JVM. */
  def decodeStub(payload: Array[Byte]): Array[Double] = {
    val hist = new Array[Double](8)
    var i = 0
    while (i < payload.length) {
      hist((payload(i) & 0xff) >>> 5) += 1.0
      i += 1
    }
    val n = math.max(1, payload.length).toDouble
    hist.map(h => math.rint(h / n * 10000) / 10000)
  }

  /** Batch feature extraction: one decoder call per row, executed
    * partition-parallel (the mapPartitions boundary is where a real
    * decoder would amortize model/codec init per partition). */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[FeatureRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition init for a heavier decoder (codec contexts,
      // model weights) would go here
      rows.map { r =>
        FeatureRow(r.doc_id, r.format, r.n_bytes, decode(r.format, r.payload))
      }
    }
  }

  /** mm02: deterministic frame sampling over a binary payload — the
    * "frame-sample" step of a video pipeline. The payload is treated
    * as a container of fixed-size frames (frameBytes each); every
    * `every`-th frame is sampled and fingerprinted. Pure expressions
    * (sequence + explode + substring-on-binary + md5): the slicing
    * never leaves Tungsten, rows out = sampled frames, and — unlike
    * the decode step — the whole operator IS oracle-expressible, so
    * the sampling arithmetic and slice boundaries are exactness-gated.
    * Per-frame codec decode composes on top via `decodeFrames`.
    *
    * Scale: map-only (explode is per-row); a multi-GB video row would
    * make one task decode all its frames — at real scale payloads
    * arrive pre-chunked (the schema's n_bytes/metadata supports
    * that), and sampled-frame rows re-balance across the cluster at
    * the first shuffle. */
  def mm02FrameSample(
      lake: Lake,
      frameBytes: Int = 64,
      every: Int = 4
  ): DataFrame =
    lake.documents
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .withColumn(
        "n_frames",
        ceil(length(col("payload")).cast("double") / frameBytes).cast("long")
      )
      .withColumn(
        "frame_idx",
        // greatest(n_frames, 1): an empty payload still yields frame 0
        // (empty slice) instead of an illegal sequence(0, -1) bound —
        // mirrored by decodeFrames' .max(1) and the oracle's GREATEST.
        explode(
          sequence(
            lit(0L),
            greatest(col("n_frames"), lit(1L)) - 1,
            lit(every.toLong)
          )
        )
      )
      .select(
        col("doc_id"),
        col("frame_idx"),
        col("n_frames"),
        expr(s"substring(payload, frame_idx * $frameBytes + 1, $frameBytes)")
          .as("frame")
      )
      .select(
        col("doc_id"),
        col("frame_idx"),
        col("n_frames"),
        length(col("frame")).cast("long").as("frame_len"),
        // Fingerprint the HEX of the frame, not the raw bytes: DuckDB's
        // md5/substring only accept VARCHAR, so the byte-exact oracle
        // slices hex(encode(text)) — md5 over the (identical, uppercase
        // both engines) hex string keeps the gate byte-based instead of
        // silently assuming an all-ASCII corpus.
        md5(hex(col("frame"))).as("frame_fp")
      )
      .orderBy("doc_id", "frame_idx")

  case class FrameFeatureRow(
      doc_id: Long,
      frame_idx: Long,
      features: Array[Double]
  )

  /** Per-sampled-frame decode — same sampling contract as
    * mm02FrameSample (asserted in MultimodalSpec), with the
    * format-blind byte-histogram decoder standing in for a codec.
    * mapPartitions so a real codec context initializes once per
    * partition, not once per frame. */
  def decodeFrames(
      media: Dataset[MediaRow],
      frameBytes: Int = 64,
      every: Int = 4
  ): Dataset[FrameFeatureRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val n =
          ((r.payload.length + frameBytes - 1) / frameBytes).max(1)
        (0 until n by every).iterator.map { i =>
          val end = math.min((i + 1) * frameBytes, r.payload.length)
          FrameFeatureRow(
            r.doc_id,
            i.toLong,
            decodeStub(
              java.util.Arrays.copyOfRange(r.payload, i * frameBytes, end)
            )
          )
        }
      }
    }
  }

  /** mm03: audio feature extraction — the third modality of the
    * mandate's image/audio/video triple. The payload is treated as
    * unsigned-8-bit PCM mono (a real WAV encoding); per non-overlapping
    * window of `windowSamples` samples, the classic low-level audio
    * features: RMS energy, zero-crossing count, and peak amplitude
    * (all about the centered signal, sample - 128).
    *
    * Like mm02, rows out = windows, not samples — one explode over
    * the per-window feature array. The decode itself is the native
    * `AudioWindowFeatures` Catalyst expression: one pass over the
    * payload BYTES ((b & 0xFF) - 128, no hex string, no per-sample
    * allocation) emitting (win_idx, n_samples, rms, n_zero_cross,
    * peak) structs. The previous declarative chain (substring → hex →
    * regex-split → conv per sample) was measured 3.2× DuckDB on pure
    * eval overhead — the allocation storm, not data volume. Still
    * fully oracle-expressible: DuckDB replays the same windowing over
    * hex(payload) with list_transform + ('0x'||h)::INTEGER, so the
    * decode arithmetic, window boundaries, and feature math are all
    * exactness-gated — not a rows-only stub.
    *
    * Scale: map-only; a long recording is one row, windows re-balance
    * at the first shuffle (same pre-chunked-payload note as mm02). */
  def mm03AudioFeatures(lake: Lake, windowSamples: Int = 32): DataFrame = {
    lake.documents
      .select(
        col("doc_id"),
        explode(
          graft.plans.AudioWindowFeatures(
            col("text").cast("binary"),
            windowSamples
          )
        ).as("w")
      )
      .select(
        col("doc_id"),
        col("w.win_idx").as("win_idx"),
        col("w.n_samples").as("n_samples"),
        col("w.rms").as("rms"),
        col("w.n_zero_cross").as("n_zero_cross"),
        col("w.peak").as("peak")
      )
      .orderBy("doc_id", "win_idx")
  }

  /** mm04: SCENE-CUT segmentation over a frame stream — the shot-
    * boundary detection a video curation pipeline runs before
    * sampling clips (cut where consecutive frames' features jump):
    * per-frame features come from the same native
    * [[graft.plans.AudioWindowFeatures]] byte kernel mm03 uses (the
    * deterministic stand-in for a real frame-feature extractor —
    * the Spark-side plumbing is the real contract, the mm01 rule),
    * a per-doc LAG window marks frames whose rms jumps >= threshold
    * from the previous frame, and one aggregation folds each doc to
    * its segmentation summary. The frame features are 4dp-rounded
    * identically in both engines (mm03's oracle-proven property),
    * so the threshold comparison cannot diverge.
    *
    * Scale shape: map-only feature extraction, ONE window keyed by
    * doc_id (data-parallel — never the global frame), one partial-
    * aggregating fold to |docs| rows. */
  def mm04SceneCuts(
      lake: Lake,
      windowSamples: Int = 32,
      threshold: Double = 8.0
  ): DataFrame = {
    val byDoc = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id")
      .orderBy("frame_idx")
    lake.documents
      .select(
        col("doc_id"),
        explode(
          graft.plans.AudioWindowFeatures(col("text").cast("binary"), windowSamples)
        ).as("w")
      )
      .select(col("doc_id"), col("w.win_idx").as("frame_idx"), col("w.rms").as("rms"))
      .withColumn("prev", lag("rms", 1).over(byDoc))
      .withColumn(
        "is_cut",
        when(
          col("prev").isNotNull && abs(col("rms") - col("prev")) >= threshold,
          1L
        ).otherwise(0L)
      )
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_frames"),
        sum("is_cut").as("n_cuts"),
        (sum("is_cut") + 1).as("n_segments"),
        round(
          count(lit(1)) / (sum("is_cut") + 1).cast("double"),
          4
        ).as("avg_segment_frames")
      )
      .orderBy("doc_id")
  }

  /** mm05: PERCEPTUAL-HASH near-duplicate detection over media
    * payloads — the image-dedup pass a multimodal curation pipeline
    * runs (pHash/dHash near-dup is how near-identical images — crops,
    * re-encodes, watermarks — are caught without pixel-exact
    * equality; the text/embedding analogs are dedup03-06).
    *
    * Hash: dHash over the deterministic frame-feature stream — the
    * same native [[graft.plans.AudioWindowFeatures]] byte kernel
    * mm03/mm04 use as the codec stand-in (the mm01 rule: the
    * plumbing is the contract; swap in a real thumbnail-gradient
    * extractor by replacing the feature array only). Bit i of the
    * 63-bit hash is rms[(i+1) mod n] > rms[i mod n] — CYCLIC
    * indexing so every payload fills all 63 bits: without it, every
    * doc shorter than 64 windows would share identical zero high
    * bands and the band join would re-quadratify on that one bucket
    * (the skew trap). 63 bits, not 64, keeps the hash non-negative
    * in both engines' signed BIGINT.
    *
    * Near-dup: 4-band LSH on the hash (16/16/16/15 bits) → candidate
    * pairs via band equi-join → exact Hamming verify
    * bit_count(h_a XOR h_b) <= maxHamming. With 4 bands and
    * maxHamming = 3 the pigeonhole guarantee is exact: <= 3 flipped
    * bits cannot touch all 4 bands, so every qualifying pair shares
    * a band — the oracle replays the EXHAUSTIVE pairwise form and
    * the results match (dedup04's banding discipline, applied to
    * media). Scale shape: hashing is map-only (the window array
    * never explodes), candidates are linear in docs per band bucket,
    * the corpus never meets itself outside the band equi-join. */
  def mm05PhashNeardup(
      lake: Lake,
      windowSamples: Int = 32,
      maxHamming: Int = 3
  ): DataFrame = {
    val hashes = lake.documents
      .select(
        col("doc_id"),
        transform(
          graft.plans.AudioWindowFeatures(
            col("text").cast("binary"),
            windowSamples
          ),
          w => w.getField("rms")
        ).as("rms")
      )
      .select(
        col("doc_id"),
        // 63 cyclic comparisons STRIDED across the whole window
        // array (step = max(1, n div 64)): for n <= 64 windows the
        // stride is 1 and the bits are plain adjacent comparisons;
        // for longer payloads the sample positions span the full
        // stream instead of freezing on the first 64 windows — a
        // long payload whose opening minute is non-increasing still
        // hashes its later structure (advisor round-9).
        when(
          size(col("rms")) >= 2,
          expr(
            """aggregate(
              |  transform(sequence(0, 62),
              |    i -> IF(rms[CAST(((i + 1) * GREATEST(1, size(rms) DIV 64))
              |                    % size(rms) AS INT)] >
              |            rms[CAST((i * GREATEST(1, size(rms) DIV 64))
              |                    % size(rms) AS INT)],
              |         shiftleft(CAST(1 AS BIGINT), i), CAST(0 AS BIGINT))),
              |  CAST(0 AS BIGINT), (a, x) -> a + x)""".stripMargin
          )
        ).otherwise(lit(0L)).as("h")
      )
      // two consumers (both sides of the band join) — materialize the
      // corpus scan + hash once
      .localCheckpoint()
      // degenerate hashes carry no perceptual signal AND are the skew
      // trap: h = 0 ⟺ the SAMPLED stream (63 strided cyclic
      // positions) has no strict increase — for n <= 64 that is the
      // full cyclic adjacency, where it means the stream is constant;
      // for longer payloads it is the strided subsequence, or the
      // payload is too short to window. A corpus of tiny / constant
      // payloads would otherwise pile into the single h = 0
      // band bucket (quadratic candidate blowup in one task) and
      // emit hamming-0 "near-dups" between semantically unrelated
      // docs — so they are excluded, as a pHash pipeline skips flat
      // images. Oracle replays the same h <> 0 rule. The filter sits
      // ABOVE the checkpoint: below it, it collapses into the hash
      // projection and the per-row decode chain evaluates twice
      // (once in the predicate, once in the output — measured 10×).
      .filter(col("h") =!= 0L)
    val bands = hashes.select(
      col("doc_id"),
      col("h"),
      posexplode(
        array(
          col("h").bitwiseAND(lit(0xffffL)),
          shiftright(col("h"), 16).bitwiseAND(lit(0xffffL)),
          shiftright(col("h"), 32).bitwiseAND(lit(0xffffL)),
          shiftright(col("h"), 48).bitwiseAND(lit(0x7fffL))
        )
      ).as(Seq("band_idx", "band_val"))
    )
    bands
      .as("a")
      .join(
        bands.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_val") === col("b.band_val") &&
          col("a.doc_id") < col("b.doc_id")
      )
      .select(
        col("a.doc_id").as("doc_a"),
        col("b.doc_id").as("doc_b"),
        col("a.h").as("ha"),
        col("b.h").as("hb")
      )
      .distinct()
      .withColumn(
        "hamming",
        bit_count(col("ha").bitwiseXOR(col("hb"))).cast("long")
      )
      .filter(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
      .orderBy("doc_a", "doc_b")
  }

  /** mm01: media metadata + decoded features, flattened for the
    * driver dump. [rows-only — the decode step (ImageIO pixels /
    * byte histogram) is not oracle-expressible] */
  def mm01BinaryMeta(lake: Lake): DataFrame =
    extractFeatures(asMedia(lake))
      .toDF()
      .select(
        col("doc_id"),
        col("format"),
        col("n_bytes"),
        round(element_at(col("features"), 1), 4).as("f0"),
        round(element_at(col("features"), 2), 4).as("f1"),
        round(element_at(col("features"), 3), 4).as("f2"),
        round(element_at(col("features"), 4), 4).as("f3")
      )
      .orderBy("doc_id")
}
