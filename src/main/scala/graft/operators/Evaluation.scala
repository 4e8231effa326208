package graft.operators

import graft.catalog.Lake
import graft.functions.text
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Linkage-quality evaluation — the reference's alignment scoring
  * (evaluate_ontology_alignment.py:49-69: `generate_sample` draws a
  * BOUNDED stratified sample of predicted pairs by similarity band
  * before any scoring; :216 compute_metrics: precision/recall/F1
  * against a gold set per stratum).
  *
  * Scale notes: the predicted pair set comes from the dedup03 shingle
  * inverted index WITH its length blocking intact (finite lenWindow —
  * the r2 escape hatch that disabled blocking is gone from the
  * default path), the per-stratum sample is bounded at `perStratum`
  * rows regardless of corpus size, the TP check is a narrow
  * (doc_a, doc_b) left join, and the metric aggregation reduces to
  * |strata| rows with map-side partial aggregation. The only
  * corpus-sized work is the blocked candidate join itself — the same
  * shape dedup03 runs — so the evaluation costs what one blocked
  * near-dup pass costs, not sum(df^2) over an unblocked index.
  */
object Evaluation {

  /** Precision / recall / F1 of a near-dup linkage (word-trigram
    * Jaccard >= threshold, the dedup03 machinery) against a gold set
    * (exact bag-of-words duplicate pairs, the dedup01 fingerprint),
    * stratified by predicted-similarity band and evaluated over a
    * deterministic bounded sample per stratum.
    *
    * Sampling: pairs are ordered inside each stratum by a
    * multiplicative hash of (doc_a, doc_b) — a seedless deterministic
    * shuffle both engines compute identically — and the first
    * `perStratum` kept (the reference's bounded annotation set,
    * evaluate_ontology_alignment.py:69). Precision is the unbiased
    * sample estimate; recall is reported against the full gold count
    * (the fraction of gold pairs the *sampled* predictions recover —
    * at the default bound it equals full recall whenever a stratum
    * holds fewer than `perStratum` pairs, and degrades gracefully,
    * never explosively, past it).
    *
    * `fullCorpus = true` restores the unbounded r2 behavior (no
    * length blocking, no sampling) for small-corpus exact audits. */
  def eval01LinkageMetrics(
      lake: Lake,
      threshold: Double = 0.05,
      lenWindow: Int = 40,
      perStratum: Int = 200,
      fullCorpus: Boolean = false
  ): DataFrame = {
    val pred = Dedup
      .dedup03NgramJaccard(
        lake,
        threshold = threshold,
        lenWindow = if (fullCorpus) 1000000 else lenWindow
      )
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
    val stratum = when(col("jaccard") < 0.5, "j_005_050")
      .when(col("jaccard") < 0.8, "j_050_080")
      .otherwise("j_080_100")
    // Pre-sample pair count per stratum, carried through the sample so
    // the consumer can tell truncated recall (n_pred < n_pred_total)
    // from true recall. Same window shuffle as the sampler — no second
    // pass over the candidate join.
    val strat = pred
      .withColumn("stratum", stratum)
      .withColumn(
        "n_pred_total",
        count(lit(1)).over(Window.partitionBy("stratum"))
      )
    val sampled =
      if (fullCorpus) strat
      else {
        // Knuth-style multiplicative hash, reduced mod a prime — small
        // enough that neither engine overflows 64-bit signed math.
        val h =
          ((col("doc_a") % 1000003L) * 2654435761L + col("doc_b") % 1000003L) % 1000003L
        strat
          .withColumn("h", h)
          .withColumn(
            "rn",
            row_number().over(
              Window
                .partitionBy("stratum")
                .orderBy(col("h"), col("doc_a"), col("doc_b"))
            )
          )
          .filter(col("rn") <= perStratum)
          .drop("h", "rn")
      }
    val d = lake.documents
      .select(col("doc_id"), text.bagFingerprint(col("text")).as("fp"))
    val gold = d
      .as("x")
      .join(
        d.as("y"),
        col("x.fp") === col("y.fp") && col("x.doc_id") < col("y.doc_id")
      )
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
    val goldTotal = gold.agg(count(lit(1)).as("n_gold"))
    val tp = count(when(col("is_gold"), 1))
    val p = col("n_tp").cast("double") / col("n_pred")
    val r = col("n_tp").cast("double") / col("n_gold")
    sampled
      .join(gold.withColumn("is_gold", lit(true)), Seq("doc_a", "doc_b"), "left")
      .groupBy("stratum")
      .agg(
        count(lit(1)).as("n_pred"),
        max("n_pred_total").as("n_pred_total"),
        tp.as("n_tp")
      )
      .crossJoin(broadcast(goldTotal))
      .select(
        col("stratum"),
        col("n_pred"),
        col("n_pred_total"),
        col("n_tp"),
        col("n_gold"),
        round(p, 4).as("precision"),
        round(r, 4).as("recall"),
        when(p + r > 0, round(lit(2) * p * r / (p + r), 4))
          .otherwise(0.0)
          .as("f1")
      )
      .orderBy("stratum")
  }
}
