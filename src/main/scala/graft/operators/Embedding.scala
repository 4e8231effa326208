package graft.operators

import graft.catalog.Lake
import graft.functions.vectors
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** In-pipeline text-embedding generation — the reference computes its
  * embeddings INSIDE the pipeline (reference:
  * scripts/build_embedding_linkage.py:223 `embed_texts`:
  * sentence-transformers batch encode over title+abstract), while
  * graft previously consumed a pre-computed `embeddings` table only.
  *
  * The Spark shape is the contract here: `mapPartitions` with the
  * model initialized ONCE per partition (a transformer encoder costs
  * seconds to load and must never be constructed per row — the same
  * per-partition-init pattern Multimodal.decodeFrames documents for
  * codecs), batched row iteration, L2-normalized float vectors out,
  * schema-identical to the `embeddings` table so every downstream
  * consumer (sim01-07, dedup06/11, eval02) runs on generated vectors
  * unchanged.
  *
  * The model itself is a deterministic hash-projection STUB standing
  * in for the transformer (this container has no model weights, and
  * the public-knowledge rule forbids pointing at any hosted one):
  * each token hashes to a splitmix64 stream that assigns it a ±1
  * sign per dimension, accumulated and L2-normalized — the classic
  * feature-hashing embedding. Deterministic across partitionings and
  * runs (spec-pinned), so linkage results built on it are
  * reproducible end to end. */
object Embedding {

  /** The per-partition "model". Construction is the expensive step
    * being amortized (a real encoder loads weights here); encode is
    * pure. */
  final class HashProjectionModel(val dim: Int) extends Serializable {
    private def mix(z0: Long): Long = {
      var z = z0 * 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }

    /** Feature-hash a token stream into dim signed buckets, then
      * L2-normalize. Empty/non-tokenizable text embeds to the zero
      * vector (norm left 0 — callers treat it like the reference
      * treats an un-embeddable row: it matches nothing). */
    def encode(text: String): Array[Float] = {
      val v = new Array[Double](dim)
      var i = 0
      val n = text.length
      while (i < n) {
        while (i < n && !Character.isLetterOrDigit(text.charAt(i))) i += 1
        val start = i
        var h = 1125899906842597L
        while (i < n && Character.isLetterOrDigit(text.charAt(i))) {
          h = h * 31 + Character.toLowerCase(text.charAt(i))
          i += 1
        }
        if (i > start) {
          var d = 0
          while (d < dim) {
            // one mixed bit per (token, dimension): ±1 projection
            v(d) += (if ((mix(h + d) & 1L) == 0L) 1.0 else -1.0)
            d += 1
          }
        }
      }
      var ss = 0.0
      var d = 0
      while (d < dim) { ss += v(d) * v(d); d += 1 }
      val inv = if (ss > 0) 1.0 / math.sqrt(ss) else 0.0
      val out = new Array[Float](dim)
      d = 0
      while (d < dim) { out(d) = (v(d) * inv).toFloat; d += 1 }
      out
    }
  }

  /** (doc_id, text) → (vec_id, embedding) with the embeddings-table
    * schema. mapPartitions so the model constructs once per partition;
    * map-only, no shuffle — embedding generation at 100 TB is a pure
    * scan stage that parallelizes with the input splits. */
  def embedDocuments(docs: DataFrame, dim: Int = 64): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val model = new HashProjectionModel(dim) // once per partition
        it.map { case (id, text) => (id, model.encode(text)) }
      }
      .toDF("vec_id", "embedding")
  }

  /** emb01: embed the documents table and report per-vector summary
    * scalars (no array columns — the driver's canonicalizer cannot
    * hash an array cell, the txt18 lesson). norm must be 1.0 for
    * every non-empty doc; checksum pins the component values without
    * shipping the vector. [rows-only]: the hash projection is not
    * SQL-expressible; determinism + normalization + downstream
    * compatibility are spec-pinned instead (EmbeddingSpec). */
  def emb01HashEmbeddings(lake: Lake, dim: Int = 64): DataFrame = {
    val emb = embedDocuments(lake.documents, dim)
    emb
      .select(
        col("vec_id"),
        vectors.toDouble(col("embedding")).as("v")
      )
      .select(
        col("vec_id"),
        size(col("v")).cast("long").as("dim"),
        round(vectors.norm(col("v")), 4).as("l2_norm"),
        round(aggregate(col("v"), lit(0.0), (acc, x) => acc + x), 4)
          .as("checksum")
      )
      .orderBy("vec_id")
  }
}
