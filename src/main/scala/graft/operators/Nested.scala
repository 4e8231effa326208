package graft.operators

import graft.catalog.Lake
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Nested-struct construction, positional UNNEST, dotted-path field
  * extraction, and tolerant casting — the reference's core view-layer
  * idioms (create_unified_db.py:102-117: `LATERAL UNNEST(authors)`
  * with a positional `author_position`, struct-field extraction for
  * fieldsofstudy; :76: `TRY_CAST` over drifting raw types).
  *
  * The driver testdata is flat, so these operators first BUILD the
  * nested shape from the relational tables (collect_list(struct),
  * nested struct literals, split) and then exercise the extraction
  * path — round-tripping both directions of the reference's nesting
  * surface in one oracle-checkable query.
  *
  * Scale notes: every collect_list here is keyed by a high-cardinality
  * column with bounded group size (orders per customer, words per
  * type string), so the aggregation is partial-agg friendly and no
  * group materializes more than tens of elements; posexplode is
  * map-side (no shuffle); dotted-path extraction is pure projection
  * that Catalyst collapses into the scan.
  */
object Nested {

  /** Build per-customer order history as array<struct>, then unnest
    * positionally — the authors/author_position idiom
    * (create_unified_db.py:102-104). array_sort on the struct array
    * orders by the leading field (o_orderkey), making list order — and
    * therefore the emitted position — deterministic. */
  def nst01OrderHistoryUnnest(lake: Lake, maxPos: Int = 3): DataFrame =
    lake.orders
      .groupBy(col("o_custkey"))
      .agg(
        array_sort(
          collect_list(
            struct(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
          )
        ).as("history")
      )
      .select(col("o_custkey"), posexplode(col("history")).as(Seq("pos0", "rec")))
      .withColumn("pos", (col("pos0") + 1).cast("long"))
      .filter(col("pos") <= maxPos)
      .select(
        col("o_custkey"),
        col("pos"),
        col("rec.o_orderkey").as("o_orderkey"),
        col("rec.o_totalprice").as("o_totalprice"),
        col("rec.o_orderpriority").as("o_orderpriority")
      )
      .orderBy("o_custkey", "pos")

  /** Two-level struct construction + dotted-path projection + TRY_CAST
    * tolerant parsing (create_unified_db.py:76). The id_str column is
    * deterministically corrupted on every third key, so try_cast
    * exercises both the parse and the null path. */
  def nst02StructPathsTryCast(lake: Lake): DataFrame =
    lake.customer
      .join(broadcast(lake.nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(lake.region), col("n_regionkey") === col("r_regionkey"))
      .withColumn(
        "rec",
        struct(
          struct(
            col("c_name").as("name"),
            col("c_acctbal").as("acctbal"),
            col("c_mktsegment").as("segment")
          ).as("cust"),
          struct(col("n_name").as("nation"), col("r_name").as("region")).as("geo")
        )
      )
      .withColumn(
        "id_str",
        when(col("c_custkey") % 3 === 0, concat(lit("X"), col("c_custkey")))
          .otherwise(col("c_custkey").cast("string"))
      )
      .select(
        col("c_custkey"),
        col("rec.cust.name").as("cust_name"),
        col("rec.cust.acctbal").as("acctbal"),
        col("rec.geo.region").as("region_name"),
        col("id_str"),
        expr("try_cast(id_str AS BIGINT)").as("parsed_id")
      )
      .orderBy("c_custkey")

  /** String-list unnest with ordinality — the fieldsofstudy idiom
    * (create_unified_db.py:117): split a delimited attribute, explode
    * with position, aggregate per (position, token). */
  def nst03TypeWordsUnnest(lake: Lake): DataFrame =
    lake.part
      .select(
        col("p_partkey"),
        posexplode(split(col("p_type"), " ")).as(Seq("pos0", "word"))
      )
      .withColumn("pos", (col("pos0") + 1).cast("long"))
      .groupBy("pos", "word")
      .agg(count(lit(1)).as("n_parts"))
      .orderBy("pos", "word")
}
