package graft.operators

import graft.catalog.Lake
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Catalog-level operations — the datalake_cli.py surface (status /
  * row counts / table info) as queryable DataFrames. */
object CatalogOps {

  /** Row count per table (datalake_cli.py `status` analog).
    *
    * One action, one shuffle: the per-table `agg(count)`-then-union
    * formulation compiled to ~10 independent aggregate stages that
    * AQE materialized as sequential job submissions — a pure
    * scheduling-floor cost (1.5-7 s for a trivial query). Instead,
    * union zero-column scans tagged with a table-name literal and run
    * ONE groupBy: each parquet scan reads no columns (row counts come
    * from row-group metadata, no data pages decoded), and the single
    * aggregate shuffles 10 partial-count rows.
    *
    * An EMPTY table contributes no scan rows and hence no group, so the
    * grouped counts are left-joined back onto the full catalog name
    * list — a status listing must show `(table, 0)` for an empty table,
    * not omit it. */
  def cat01Status(lake: Lake): DataFrame = {
    val spark = lake.spark
    import spark.implicits._
    val counted = lake.tableNames
      .map(name => lake.resolve(name).select(lit(name).as("table_name")))
      .reduce(_.unionAll(_))
      .groupBy("table_name")
      .agg(count(lit(1)).as("n_rows"))
    lake.tableNames
      .toDF("table_name")
      .join(broadcast(counted), Seq("table_name"), "left")
      .select(col("table_name"), coalesce(col("n_rows"), lit(0L)).as("n_rows"))
      .orderBy("table_name")
  }

  /** On-disk bytes for a table (file or directory of part files) —
    * the `status` disk-usage figure, computed from filesystem
    * metadata only. */
  private def diskBytes(path: String): Long = {
    def walk(f: java.io.File): Long =
      if (f.isDirectory) Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0L)
      else f.length()
    walk(new java.io.File(path))
  }

  /** Catalog search (datalake_cli.py `search` analog): tables and
    * columns whose name matches the pattern, case-insensitive. Pure
    * schema metadata — no data read, result built driver-side. */
  def searchCatalog(lake: Lake, pattern: String): DataFrame = {
    val p = pattern.toLowerCase
    val spark = lake.spark
    import spark.implicits._
    lake.tableNames.sorted
      .flatMap { t =>
        val df = lake.resolve(t)
        val tableHit =
          if (t.toLowerCase.contains(p))
            Seq((t, "(table)", ""))
          else Seq.empty
        tableHit ++ df.schema.fields.collect {
          case f if f.name.toLowerCase.contains(p) =>
            (t, f.name, f.dataType.simpleString)
        }
      }
      .toDF("table_name", "column_name", "data_type")
  }

  /** LLM-friendly dataset description: per-table row counts, on-disk
    * bytes + column schema as one JSON document (datalake_cli.py:
    * 124-230 `info`, the datalake.json/SCHEMA.md analog). Counts are
    * parquet-footer metadata scans; the schema comes from the file
    * footers, never a data read. */
  def infoJson(lake: Lake): String = {
    def esc(s: String): String =
      s.flatMap {
        case '"'          => "\\\""
        case '\\'         => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c            => c.toString
      }
    val tables = lake.tableNames.sorted.map { name =>
      val df = lake.resolve(name)
      val fields = df.schema.fields
        .map(f =>
          s"""{"name":"${esc(f.name)}","type":"${esc(f.dataType.simpleString)}","nullable":${f.nullable}}"""
        )
        .mkString("[", ",", "]")
      val rows = df.count()
      val bytes = diskBytes(s"${lake.dir}/$name.parquet")
      s"""{"table":"${esc(name)}","n_rows":$rows,"n_bytes":$bytes,"n_columns":${df.schema.size},"columns":$fields}"""
    }
    s"""{"dir":"${esc(lake.dir)}","n_tables":${tables.size},"tables":${tables
        .mkString("[", ",", "]")}}"""
  }
}
