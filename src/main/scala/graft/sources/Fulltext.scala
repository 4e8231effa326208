package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Full-text corpus conversion — the lake's single biggest converter
  * re-expressed Spark-first (reference: scripts/convert_fulltext.py —
  * the unified row schema at :11, clean_text at :67, DOI_CLEAN_SQL at
  * :53, the per-source chunk loops; scripts/materialize_fulltext.py —
  * SOURCE_PRIORITY at :38 and the keep-best ROW_NUMBER dedup at :93).
  *
  * Every full-text source (s2orc/pes2o/pmc/arxiv/...) lands in ONE
  * schema: (doi, source, title, abstract, text, license, year,
  * source_id, text_length, language, has_full_text); the unified
  * dataset keeps, per cleaned DOI, the best-priority source's row
  * (tie-break: longer text).
  *
  * Scale shape: normalization is map-only (regex cleans + casts); the
  * keep-best dedup is one row_number window keyed on the DOI — a
  * high-cardinality key, so the shuffle partitions evenly at any
  * corpus size (the xref04 shape, never a global window).
  */
object Fulltext {

  /** Lower number = higher priority (materialize_fulltext.py:38). */
  val SourcePriority: Seq[String] =
    Seq("pmc", "s2orc", "pes2o", "arxiv", "biorxiv", "core")

  /** DOI normalization (convert_fulltext.py:53 DOI_CLEAN_SQL):
    * lowercase; a DOI with an embedded doi.org URL keeps only the
    * path after it (malformed entries like
    * "10.1002/https://doi.org/10.6028/..." resolve to the real DOI). */
  def cleanDoi(c: Column): Column =
    when(
      c.contains("doi.org/"),
      lower(regexp_extract(c, "doi\\.org/(.+)$", 1))
    ).otherwise(lower(c))

  /** Text normalization (convert_fulltext.py:67 clean_text): collapse
    * runs of non-newline whitespace to one space, collapse 3+
    * newlines to 2, trim. Null-safe (null → ""). */
  def cleanText(c: Column): Column =
    trim(
      regexp_replace(
        regexp_replace(coalesce(c, lit("")), "[^\\S\\n]+", " "),
        "\\n{3,}",
        "\n\n"
      )
    )

  /** Normalize one raw chunk (any subset of the unified columns, the
    * drifting-JSONL reality) into the unified fulltext schema.
    * Missing columns land null (year) / "" (abstract) / null (rest);
    * text_length and has_full_text derive from the CLEANED text. */
  def normalize(df: DataFrame, defaultSource: String = "unknown"): DataFrame = {
    val present = df.columns.toSet
    def c(n: String): Column =
      if (present(n)) col(n).cast("string") else lit(null).cast("string")
    val base = df.select(
      cleanDoi(c("doi")).as("doi"),
      coalesce(c("source"), lit(defaultSource)).as("source"),
      c("title").as("title"),
      cleanText(c("abstract")).as("abstract"),
      cleanText(c("text")).as("text"),
      c("license").as("license"),
      (if (present("year")) col("year").cast("int")
       else lit(null).cast("int")).as("year"),
      c("source_id").as("source_id"),
      c("language").as("language")
    )
    // staged select: `text` is referenced three times below — keeping
    // it a named column stops CollapseProject from re-inlining (and
    // re-running) the regex chain per use (the txt19 rule)
    base.select(
      col("doi"),
      col("source"),
      col("title"),
      col("abstract"),
      col("text"),
      col("license"),
      col("year"),
      col("source_id"),
      length(col("text")).cast("int").as("text_length"),
      col("language"),
      (length(col("text")) > 0).as("has_full_text")
    )
  }

  /** Keep-best-source dedup per cleaned DOI
    * (materialize_fulltext.py:93): drop invalid DOIs (null / empty /
    * shorter than 5 chars), rank rows per DOI by source priority then
    * text_length DESC (source_id as a deterministic final tie-break —
    * the reference leaves ties engine-ordered), keep rank 1. */
  def unify(df: DataFrame): DataFrame = {
    val priority = SourcePriority.zipWithIndex
      .foldLeft(when(lit(false), lit(0))) { case (acc, (s, i)) =>
        acc.when(col("source") === s, lit(i + 1))
      }
      .otherwise(lit(99))
    val w = Window
      .partitionBy("doi")
      .orderBy(
        col("priority"),
        col("text_length").desc,
        col("source_id")
      )
    df.filter(
      col("doi").isNotNull && col("doi") =!= "" && length(col("doi")) >= 5
    ).withColumn("priority", priority)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn", "priority")
  }
}
