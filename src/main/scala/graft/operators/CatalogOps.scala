package graft.operators

import graft.catalog.Lake
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Catalog-level operations — the datalake_cli.py surface (status /
  * row counts / table info) as queryable DataFrames. */
object CatalogOps {

  /** Row count per table (datalake_cli.py `status` analog). Parquet
    * row counts come from footer metadata — each count is a
    * metadata-only scan, no data read. */
  def cat01Status(lake: Lake): DataFrame =
    lake.tableNames
      .map { name =>
        val df = if (name == "events") lake.events else lake.table(name)
        df.agg(count(lit(1)).as("n_rows"))
          .select(lit(name).as("table_name"), col("n_rows"))
      }
      .reduce(_.unionAll(_))
      .orderBy("table_name")
}
