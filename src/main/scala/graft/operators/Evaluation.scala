package graft.operators

import graft.catalog.Lake
import graft.functions.text
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Linkage-quality evaluation — the reference's alignment scoring
  * (evaluate_ontology_alignment.py:49-69: stratified sample by
  * similarity band; :216 compute_metrics: precision/recall against a
  * gold set per stratum).
  *
  * Scale notes: the predicted and gold pair sets are both equi-join
  * products (shingle inverted index / fingerprint groups), the
  * TP check is a narrow (doc_a, doc_b) left join, and the metric
  * aggregation reduces to |strata| rows with map-side partial
  * aggregation — nothing here is quadratic in the corpus.
  */
object Evaluation {

  /** Precision / recall of a near-dup linkage (word-trigram Jaccard >=
    * threshold, the dedup03 machinery) against a gold set (exact
    * bag-of-words duplicate pairs, the dedup01 fingerprint),
    * stratified by predicted-similarity band. The default threshold is
    * deliberately low so the low band carries the linkage's false
    * positives and the high band its true dups — giving the
    * per-stratum precision contrast the reference's alignment
    * evaluation reports. */
  def eval01LinkageMetrics(lake: Lake, threshold: Double = 0.05): DataFrame = {
    val pred = Dedup
      .dedup03NgramJaccard(lake, threshold = threshold, lenWindow = 1000000)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
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
    val stratum = when(col("jaccard") < 0.5, "j_005_050")
      .when(col("jaccard") < 0.8, "j_050_080")
      .otherwise("j_080_100")
    val tp = count(when(col("is_gold"), 1))
    pred
      .join(gold.withColumn("is_gold", lit(true)), Seq("doc_a", "doc_b"), "left")
      .withColumn("stratum", stratum)
      .groupBy("stratum")
      .agg(count(lit(1)).as("n_pred"), tp.as("n_tp"))
      .crossJoin(broadcast(goldTotal))
      .select(
        col("stratum"),
        col("n_pred"),
        col("n_tp"),
        round(col("n_tp").cast("double") / col("n_pred"), 4).as("precision"),
        round(col("n_tp").cast("double") / col("n_gold"), 4).as("recall")
      )
      .orderBy("stratum")
  }
}
