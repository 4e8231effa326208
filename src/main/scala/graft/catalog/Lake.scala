package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{expr, timestamp_micros}

/** Catalog over a directory of parquet tables — the Spark-native analog
  * of the reference's view-only DuckDB file (reference:
  * scripts/create_unified_db.py — 159 views over parquet globs; the db
  * stores definitions, never data).
  *
  * `table(name)` is a lazy logical scan: Catalyst sees the parquet
  * relation directly, so column pruning and predicate pushdown reach
  * the file scan. `registerViews()` additionally exposes every table to
  * `spark.sql(...)` by name, mirroring the reference's
  * schema-namespaced SQL surface.
  */
final case class Lake(spark: SparkSession, dir: String) {

  def table(name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  // The driver-generated star schema (TESTDATA.md).
  def region: DataFrame = table("region")
  def nation: DataFrame = table("nation")
  def customer: DataFrame = table("customer")
  def supplier: DataFrame = table("supplier")
  def part: DataFrame = table("part")
  def orders: DataFrame = table("orders")
  def lineitem: DataFrame = table("lineitem")

  /** events.ts is written as parquet TIMESTAMP(NANOS), which Spark's
    * schema converter rejects outright. Read it as raw nanos
    * (legacy.parquet.nanosAsLong) and truncate to microseconds — the
    * same truncation DuckDB applies when it loads ns timestamps. */
  def events: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // `ts div 1000`, NOT `ts / 1000`: Column./ is double division and
    // 19-digit nano values exceed double's 2^53 mantissa — the float
    // round-trip shifts timestamps by up to a microsecond.
    table("events").withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents: DataFrame = table("documents")
  def embeddings: DataFrame = table("embeddings")

  val tableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings"
  )

  /** Name-based accessor that routes through the type-converting
    * reader where one exists — the ONE place that knows events needs
    * the nanos conversion. Generic table iterators must use this, not
    * `table(name)`, or they crash on the TIMESTAMP(NANOS) schema. */
  def resolve(name: String): DataFrame =
    if (name == "events") events else table(name)

  /** Register every table as a temp view so `spark.sql` works by name. */
  def registerViews(): Unit =
    tableNames.foreach(n => resolve(n).createOrReplaceTempView(n))
}
