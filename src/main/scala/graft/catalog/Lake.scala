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

  /** Two-level namespace, the reference's defining catalog idiom
    * (reference: scripts/create_unified_db.py:513-577 — 159 views
    * across 20+ schemas like `xref.doi_map`, `openalex.works`). Each
    * table lives in a domain schema; `schema.table` resolves in
    * spark.sql after registerViews(). */
  val schemaOf: Map[String, String] = Map(
    "region" -> "trade", "nation" -> "trade", "customer" -> "trade",
    "supplier" -> "trade", "part" -> "trade", "orders" -> "trade",
    "lineitem" -> "trade", "events" -> "activity",
    "documents" -> "corpus", "embeddings" -> "corpus"
  )

  def qualified(name: String): String = s"${schemaOf(name)}.$name"

  /** Name-based accessor that routes through the type-converting
    * reader where one exists — the ONE place that knows events needs
    * the nanos conversion. Generic table iterators must use this, not
    * `table(name)`, or they crash on the TIMESTAMP(NANOS) schema.
    * Accepts flat ("orders") or qualified ("trade.orders") names. */
  def resolve(name: String): DataFrame = {
    val flat = name.split('.').last
    if (flat == "events") events else table(flat)
  }

  /** Register every table for `spark.sql`: flat temp views (the
    * historical surface) PLUS real `schema.table` databases + views
    * mirroring the reference's two-level namespace. The databases use
    * an explicit tmpdir LOCATION so a plain unconfigured session never
    * drops a spark-warehouse directory into the caller's cwd; views
    * inline the parquet path (a permanent view may not reference a
    * temp view), with events' nanos->micros conversion baked into the
    * view text. */
  def registerViews(): Unit = {
    // Session-sticky: view expansion happens at query time, so the
    // nanos conf must hold for any later spark.sql over activity.events.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    tableNames.foreach(n => resolve(n).createOrReplaceTempView(n))
    val whBase = Lake.warehouseBase
    schemaOf.values.toSeq.distinct.sorted.foreach { db =>
      spark.sql(s"CREATE DATABASE IF NOT EXISTS `$db` LOCATION '$whBase/$db.db'")
    }
    tableNames.foreach { n =>
      val path = s"$dir/$n.parquet"
      val sel =
        if (n == "events") {
          val cols = table("events").schema.fieldNames
            .map {
              case "ts" => "timestamp_micros(ts div 1000) AS ts"
              case c    => s"`$c`"
            }
            .mkString(", ")
          s"SELECT $cols FROM parquet.`$path`"
        } else s"SELECT * FROM parquet.`$path`"
      spark.sql(s"CREATE OR REPLACE VIEW ${qualified(n)} AS $sel")
    }
  }
}

object Lake {
  /** Per-process warehouse root for the schema databases. A fixed
    * world-shared `${java.io.tmpdir}/graft-warehouse` path lets
    * concurrent sessions collide (and a pre-existing path owned by
    * another user on a multi-user host is a hijack risk) — so each JVM
    * creates its own private directory once and every Lake in the
    * process shares it (advisor round-5 note). The databases hold only
    * view definitions, so the directory stays tiny and mode-0700. */
  private[catalog] lazy val warehouseBase: String =
    java.nio.file.Files.createTempDirectory("graft-warehouse-").toString
}
