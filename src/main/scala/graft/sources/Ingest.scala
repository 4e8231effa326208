package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Ingestion + layout utilities — the Spark-native analog of the
  * reference's convert pipeline (convert_s2ag.py, convert_openalex.py,
  * convert_fulltext.py: JSONL/CSV -> partitioned Parquet with explicit
  * schemas and chunked writes).
  *
  * Layout rules for the 100 TB design point:
  *  - always write Parquet with an explicit partition scheme chosen by
  *    the dominant filter column (partition pruning beats any runtime
  *    filter);
  *  - target file sizes via repartition before write so downstream
  *    scans get splittable, evenly-sized files (no small-file storms);
  *  - schemas are explicit on read: schema inference at scale means a
  *    full extra pass over the data.
  */
object Ingest {

  /** Read JSON-lines with an explicit schema (no inference pass). */
  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** Read CSV with an explicit schema and header. */
  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("header", "true").csv(path)

  /** Write partitioned parquet with a bounded file count per
    * partition. `targetPartitions` sizes the shuffle so files are
    * splittable-but-not-tiny at the expected volume. */
  def writePartitioned(
      df: DataFrame,
      path: String,
      partitionBy: Seq[String],
      targetPartitions: Int,
      mode: SaveMode = SaveMode.Overwrite
  ): Unit =
    df.repartition(targetPartitions, partitionBy.map(df.col): _*)
      .write
      .mode(mode)
      .partitionBy(partitionBy: _*)
      .parquet(path)

  /** Plain parquet write with a target file count. */
  def writeParquet(
      df: DataFrame,
      path: String,
      targetPartitions: Int,
      mode: SaveMode = SaveMode.Overwrite
  ): Unit =
    df.repartition(targetPartitions).write.mode(mode).parquet(path)
}
