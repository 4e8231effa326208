package graft.multimodal

import graft.catalog.Lake
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: opaque binary payloads + typed
  * metadata, with batch-shaped feature extraction.
  *
  * The Spark-side contract is real — schema (binary + metadata
  * struct), partition-parallel batch decode via mapPartitions with
  * typed Encoders, fixed-width feature output — while the actual
  * media decode is STUBBED (no image/audio libs in this container):
  * `decodeStub` computes a deterministic byte histogram standing in
  * for a pixel/spectrogram decoder. Swap `decodeStub` for a real
  * decoder (JNI/FFmpeg/ImageIO) without touching the plumbing.
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

  /** STUB decoder: deterministic 8-bucket byte histogram, normalized.
    * Replace with a real media decoder; the signature (bytes ->
    * fixed-width double vector) is what a resize/frame-sample/embed
    * step produces. */
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
      // per-partition init for a real decoder would go here
      rows.map { r =>
        FeatureRow(r.doc_id, r.format, r.n_bytes, decodeStub(r.payload))
      }
    }
  }

  /** mm01: media metadata + stub features, flattened for the driver
    * dump. [rows-only — stub decode is not oracle-expressible] */
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
