package graft.operators

import graft.catalog.Lake
import graft.functions.text
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** End-to-end pretraining corpus pipeline — the composition a real
  * training-data run executes as ONE dataflow, not five separate
  * queries: clean (convert_fulltext.py clean_text) → rule-based
  * quality filter (Gopher) → exact bag-of-words dedup keeping the
  * canonical doc (materialize_fulltext.py:87-118's per-key survivor)
  * → overlapping chunking → per-source sequence packing. Each stage
  * is the already-verified operator's transform; composing them here
  * proves the stages agree on schemas and that the whole funnel is
  * expressible as one Catalyst plan (single action, no intermediate
  * materialization except the shared cleaned frame).
  *
  * Scale: clean/filter/fingerprint are map-only; dedup is one
  * hash-shuffle on the fingerprint; chunk+pack shuffle once per
  * source shard (txt16's parallel-packing discipline). Nothing in the
  * funnel is quadratic; peak state is the per-source packing window.
  *
  * The cleaning stage strips the SAME deterministic planted markers
  * as txt19 (the corpus itself carries none), so the stage does real
  * work the oracle can mirror; the leftover planted words (see, fig.,
  * tail, end) flow through tokenization identically in both engines.
  */
object Pipeline {

  /** Cleaned documents: (doc_id, source, text) with markers stripped
    * and whitespace normalized — txt19's transform, keeping the text. */
  private[graft] def cleanedDocs(lake: Lake): DataFrame = {
    val raw = concat(
      col("text"),
      lit(" {{cite:c"), col("doc_id"),
      lit("}}  see  fig. {{figure:f"), col("doc_id"),
      lit("}}\n\n\n\ntail {{formula:eq"), col("doc_id"),
      lit("}} end  ")
    )
    val stripped = regexp_replace(
      col("raw"),
      "\\{\\{(cite|formula|figure|table):[^}]*\\}\\}",
      ""
    )
    val spaces = regexp_replace(stripped, "[ \\t]+", " ")
    val clean = trim(regexp_replace(spaces, "\\n{3,}", "\n\n"))
    lake.documents
      .select(col("doc_id"), col("source"), raw.as("raw"))
      .select(col("doc_id"), col("source"), clean.as("text"))
  }

  def pipe01PretrainCorpus(
      lake: Lake,
      chunkSize: Int = 50,
      stride: Int = 40,
      capacity: Int = 512,
      shardSize: Int = 200
  ): DataFrame = {
    // The cleaned frame feeds the verdict, the fingerprint and the
    // chunker — materialize the three-regex chain once.
    val cleaned = cleanedDocs(lake).localCheckpoint()
    val passing = TextAnalysis
      .gopherVerdict(cleaned)
      .filter(col("passes"))
      .select("doc_id")
    val survivors = cleaned
      .join(passing, "doc_id")
      .withColumn("fp", text.bagFingerprint(col("text")))
      .withColumn(
        "rn",
        row_number().over(Window.partitionBy("fp").orderBy("doc_id"))
      )
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("source"), text.tokens(col("text")).as("toks"))
    // (source, shard) packing key, like txt16: a per-source-only
    // window serializes a 10-TB source through one task at scale;
    // sharding caps the window partition at shardSize docs for one
    // partial bin per shard boundary (bounds pinned in PipelineSpec).
    val chunks = survivors
      .withColumn("n_tokens", size(col("toks")))
      .withColumn(
        "start",
        explode(
          sequence(lit(0), greatest(col("n_tokens") - 1, lit(0)), lit(stride))
        )
      )
      .select(
        col("source"),
        (col("doc_id") / shardSize).cast("long").as("shard"),
        col("doc_id"),
        (col("start") / stride).cast("long").as("chunk_id"),
        size(slice(col("toks"), col("start") + 1, lit(chunkSize)))
          .cast("long")
          .as("chunk_len")
      )
    val w = Window
      .partitionBy("source", "shard")
      .orderBy("doc_id", "chunk_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    chunks
      .withColumn("cum", sum("chunk_len").over(w))
      .withColumn(
        "bin_id",
        floor((col("cum") - col("chunk_len")) / lit(capacity))
      )
      .groupBy("source", "shard", "bin_id")
      .agg(
        count(lit(1)).as("n_chunks"),
        sum("chunk_len").as("bin_tokens")
      )
      .orderBy("source", "shard", "bin_id")
  }
}
