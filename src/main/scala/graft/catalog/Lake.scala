package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

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

  /** Resolve with an EXPLICIT schema from the process-wide cache:
    * a bare `spark.read.parquet` runs a footer-reading Spark job per
    * call to infer the schema (measured: 1 job per resolve, even for
    * the same path seconds apart in one session), and the suite
    * resolves each table once per query invocation — hundreds of
    * pure-overhead jobs per bench sweep (guide §6: metadata work is
    * real I/O). The cache is STALENESS-GUARDED by the same per-entry
    * (name, mtime, length) fingerprint discipline registerViews uses:
    * a rewritten table re-infers, an unchanged one resolves with zero
    * jobs. Data is never cached — only the StructType. */
  def table(name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    spark.read.schema(Lake.schemaFor(spark, path)).parquet(path)
  }

  // The driver-generated star schema (TESTDATA.md).
  def region: DataFrame = table("region")
  def nation: DataFrame = table("nation")
  def customer: DataFrame = table("customer")
  def supplier: DataFrame = table("supplier")
  def part: DataFrame = table("part")
  def orders: DataFrame = table("orders")
  def lineitem: DataFrame = table("lineitem")

  /** events.ts normalizer — the generated file has shipped with two
    * physical layouts across testdata generations, and every operator
    * downstream expects one logical type (TIMESTAMP, UTC session):
    *   - TIMESTAMP(NANOS): Spark's schema converter rejects it, so read
    *     raw nanos (legacy.parquet.nanosAsLong) and truncate to micros —
    *     the same truncation DuckDB applies when it loads ns timestamps.
    *   - TIMESTAMP(MICROS, isAdjustedToUTC=false): Spark reads it as
    *     TIMESTAMP_NTZ; cast to TIMESTAMP — value-identical under the
    *     UTC session zone GraftSession/Verify pin.
    * Branch on the observed schema so either layout works. */
  def events: DataFrame = {
    // Harmless when ts is already micros; required before the scan can
    // even resolve a nanos schema.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table("events")
    raw.schema("ts").dataType match {
      case LongType =>
        // `ts div 1000`, NOT `ts / 1000`: Column./ is double division and
        // 19-digit nano values exceed double's 2^53 mantissa — the float
        // round-trip shifts timestamps by up to a microsecond.
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _                => raw
    }
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

  /** Derived cross-reference views — the reference's DEFINING catalog
    * idiom is that the linkage outputs are themselves views a shell
    * user queries BY NAME (`xref.doi_map`, `xref.unified_papers` —
    * create_unified_db.py:513-577), not just programmatic queries.
    * Each entry is (view name in the `xref` schema, standalone SQL
    * over the base schema views) mirroring a Linkage operator:
    *   id_map           = xref01IdMap (doi_map analog)
    *   unified_entities = xref02UnifiedEntities (unified_papers analog)
    *   priority_dedup   = xref04PriorityDedup (materialize_fulltext analog)
    * The SQL is VIEW TEXT, so the catalog stays definitions-only (the
    * reference's view-only-db property) — nothing materializes until
    * queried. Row-for-row equality with the operator frames is
    * spec-pinned (CliSpec) so the two formulations cannot drift. */
  val derivedSchema: String = "xref"

  val derivedViews: Seq[(String, String)] = Seq(
    // normalizeId: lower + strip the source's display prefix (no regex
    // metacharacters in either prefix, so the bare anchor is exact).
    "id_map" ->
      """SELECT 'customer' AS source,
        |  lower(regexp_replace(c_name, '^Customer#', '')) AS key,
        |  CAST(c_custkey AS STRING) AS source_id FROM trade.customer
        |UNION ALL
        |SELECT 'supplier',
        |  lower(regexp_replace(s_name, '^Supplier#', '')),
        |  CAST(s_suppkey AS STRING) FROM trade.supplier
        |UNION ALL
        |SELECT 'part', lower(p_name), CAST(p_partkey AS STRING)
        |FROM trade.part""".stripMargin,
    "unified_entities" ->
      """WITH spine AS (
        |  SELECT DISTINCT entity_id FROM (
        |    SELECT CAST(c_custkey AS BIGINT) AS entity_id FROM trade.customer
        |    UNION ALL SELECT CAST(o_custkey AS BIGINT) FROM trade.orders
        |    UNION ALL SELECT CAST(user_id AS BIGINT) FROM activity.events)),
        |profile AS (SELECT CAST(c_custkey AS BIGINT) AS p_id, c_name, c_acctbal
        |  FROM trade.customer),
        |orderagg AS (SELECT CAST(o_custkey AS BIGINT) AS o_id,
        |    COUNT(1) AS n_orders, ROUND(SUM(o_totalprice), 4) AS total_spent
        |  FROM trade.orders GROUP BY 1),
        |eventagg AS (SELECT CAST(user_id AS BIGINT) AS e_id,
        |    COUNT(1) AS n_events
        |  FROM activity.events GROUP BY 1)
        |SELECT s.entity_id,
        |  COALESCE(p.c_name, 'unknown') AS entity_name,
        |  p.p_id IS NOT NULL AS has_profile,
        |  o.o_id IS NOT NULL AS has_orders,
        |  e.e_id IS NOT NULL AS has_events,
        |  COALESCE(o.n_orders, CAST(0 AS BIGINT)) AS n_orders,
        |  COALESCE(o.total_spent, CAST(0.0 AS DOUBLE)) AS total_spent,
        |  COALESCE(e.n_events, CAST(0 AS BIGINT)) AS n_events
        |FROM spine s
        |LEFT JOIN profile p ON s.entity_id = p.p_id
        |LEFT JOIN orderagg o ON s.entity_id = o.o_id
        |LEFT JOIN eventagg e ON s.entity_id = e.e_id""".stripMargin,
    // bagFingerprint = md5 over the sorted distinct whitespace tokens;
    // priority = the numeric source suffix (src3 beats src17).
    "priority_dedup" ->
      """WITH scored AS (
        |  SELECT doc_id,
        |    md5(concat_ws(' ', array_sort(array_distinct(
        |      split(trim(regexp_replace(text, '\\s+', ' ')), ' '))))) AS fp,
        |    source,
        |    CAST(regexp_extract(source, '(\\d+)$', 1) AS BIGINT) AS priority,
        |    n_chars
        |  FROM corpus.documents)
        |SELECT doc_id, fp, source, priority, n_chars FROM (
        |  SELECT *, row_number() OVER (
        |      PARTITION BY fp ORDER BY priority, n_chars DESC, doc_id) AS rn
        |  FROM scored)
        |WHERE rn = 1""".stripMargin,
    // per-year cross-source coverage over unified_entities (the
    // coverage_by_year figure stat; year = first order year, undated
    // entities drop) — composes the sibling view, which the
    // registration order (this Seq) makes legal.
    "coverage_by_year" ->
      """WITH fy AS (
        |  SELECT CAST(o_custkey AS BIGINT) AS entity_id,
        |    MIN(CAST(year(o_orderdate) AS BIGINT)) AS year
        |  FROM trade.orders GROUP BY 1)
        |SELECT fy.year, COUNT(1) AS n_entities,
        |  COUNT(IF(u.has_profile, 1, NULL)) AS n_profile,
        |  COUNT(IF(u.has_events, 1, NULL)) AS n_events_src,
        |  COUNT(IF(u.has_profile AND u.has_orders AND u.has_events, 1, NULL))
        |    AS n_all_sources,
        |  ROUND(SUM(u.total_spent), 4) AS total_value
        |FROM xref.unified_entities u
        |JOIN fy ON u.entity_id = fy.entity_id
        |GROUP BY fy.year""".stripMargin,
    // per-entity temporal data-quality flags (the reference's
    // xref.paper_temporal_flags, create_unified_db.py:645-656);
    // LEFT JOIN keeps undated entities so year_missing is definite,
    // and the flag booleans keep the reference view's three-valued
    // logic (NULL year + has_x=true -> NULL flag). Mirrors
    // Linkage.xref13TemporalFlags (CliSpec-pinned).
    "temporal_flags" ->
      """WITH fy AS (
        |  SELECT CAST(o_custkey AS BIGINT) AS entity_id,
        |    MIN(CAST(year(o_orderdate) AS BIGINT)) AS year
        |  FROM trade.orders GROUP BY 1)
        |SELECT u.entity_id, fy.year,
        |  (fy.year > 1996 AND u.has_events) AS events_metrics_stale,
        |  (fy.year > 1997 AND u.has_orders) AS orders_coverage_incomplete,
        |  (fy.year IS NULL) AS year_missing
        |FROM xref.unified_entities u
        |LEFT JOIN fy ON u.entity_id = fy.entity_id""".stripMargin
  )

  def derivedQualified: Seq[String] =
    derivedViews.map { case (n, _) => s"$derivedSchema.$n" }

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
  def registerViews(): Unit = registerViews(force = false)

  /** Registration is SKIPPED when this session's catalog already
    * points at this dir: operators that defensively call
    * registerViews() per invocation (rel09/rel12's SQL surface,
    * searchCatalog, xref10) were re-parsing ~17 CREATE VIEW
    * statements each call — measured +0.7 s per query after the xref
    * views joined the catalog. The guard is LAST-registered-dir per
    * session, not a seen-set: an intervening registration of a
    * different dir replaces the (identically-named) views, so only
    * the most recent dir is actually live. The guard value also
    * carries a cheap CONTENT fingerprint of the dir (per-entry name +
    * mtime + length via the Hadoop FileSystem, so it works on any
    * store, not just local disk): a table ingested into — or dropped
    * from — the same dir between calls changes the fingerprint and a
    * non-forced registerViews() re-registers instead of serving a
    * stale catalog (advisor round-10). `force` re-registers
    * unconditionally (the `update` verb's refresh semantics). */
  def registerViews(force: Boolean): Unit = {
    val fp = Lake.dirFingerprint(spark, dir)
    if (!force && Lake.lastRegistered.get(spark) == (dir, fp)) return
    // Session-sticky: view expansion happens at query time, so the
    // nanos conf must hold for any later spark.sql over activity.events.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    tableNames.foreach(n => resolve(n).createOrReplaceTempView(n))
    val whBase = Lake.warehouseBase
    (schemaOf.values.toSeq.distinct :+ derivedSchema).sorted.foreach { db =>
      spark.sql(s"CREATE DATABASE IF NOT EXISTS `$db` LOCATION '$whBase/$db.db'")
    }
    // Base tables register as EXTERNAL TABLES with the cached explicit
    // schema, not `parquet.`path`` views (round 16, guide §6 metadata):
    // a path relation in a view body re-ran a footer-inference Spark
    // job EVERY time the view text was analyzed — at registration
    // (each derived view's analysis cascades through the base views it
    // references) and again per spark.sql query — ~58 pure-metadata
    // jobs on a fresh session (ProbeViewJobs). A catalog table stores
    // the StructType, so analysis is a catalog lookup: zero jobs. The
    // schema comes from [[Lake.schemaFor]] (fingerprint-guarded, so a
    // rewritten table re-infers); `LOCATION` makes the table EXTERNAL —
    // DROP never touches the parquet files (CatalogSpec pins this).
    // Trade-off, documented: Spark caches a catalog table's resolved
    // relation (file listing included) per session, so an EXTERNAL
    // rewrite is visible to `spark.sql` only after the next
    // registerViews() (whose dir fingerprint trips and re-registers,
    // invalidating the cache) — exactly the update verb's
    // force-re-register contract; the previous view form re-listed per
    // query and hid that requirement.
    def registerTable(qn: String, path: String,
        schema: org.apache.spark.sql.types.StructType): Unit = {
      // CREATE TABLE has no OR REPLACE in the v1 path, and the name
      // may be held by an old-style view (pre-table registration in
      // the same session) — drop whichever object type holds it.
      try spark.sql(s"DROP VIEW IF EXISTS $qn")
      catch { case scala.util.control.NonFatal(_) => () }
      try spark.sql(s"DROP TABLE IF EXISTS $qn")
      catch { case scala.util.control.NonFatal(_) => () }
      spark.sql(
        s"CREATE TABLE $qn (${schema.toDDL}) USING parquet LOCATION '$path'")
    }
    tableNames.foreach { n =>
      val path = s"$dir/$n.parquet"
      if (n == "events") {
        // events needs the per-layout ts normalization, which a table
        // cannot express: register the RAW file as a sibling table and
        // keep `activity.events` a thin view over it (a permanent view
        // may reference a permanent table — analysis is still
        // job-free). The raw schema rides the same schemaFor cache.
        val raw = Lake.schemaFor(spark, path)
        registerTable(s"`${schemaOf(n)}`.`events_src`", path, raw)
        val tsExpr = raw("ts").dataType match {
          case LongType         => "timestamp_micros(ts div 1000) AS ts"
          case TimestampNTZType => "CAST(ts AS TIMESTAMP) AS ts"
          case _                => "ts"
        }
        val cols = raw.fieldNames
          .map { case "ts" => tsExpr; case c => s"`$c`" }
          .mkString(", ")
        try spark.sql(s"DROP TABLE IF EXISTS ${qualified(n)}")
        catch { case scala.util.control.NonFatal(_) => () }
        spark.sql(
          s"CREATE OR REPLACE VIEW ${qualified(n)} AS SELECT $cols " +
            s"FROM `${schemaOf(n)}`.`events_src`")
      } else registerTable(qualified(n), path, Lake.schemaFor(spark, path))
    }
    // Derived xref views LAST: their SQL references the base schema
    // views just created. Still definitions-only — a permanent view
    // over permanent views, nothing materialized.
    derivedViews.foreach { case (n, sql) =>
      spark.sql(s"CREATE OR REPLACE VIEW `$derivedSchema`.`$n` AS $sql")
    }
    // Backward-compat UNSCHEMA'D aliases (create_unified_db.py:660
    // create_backward_compat_views — "for backward compatibility with
    // existing notebooks"): every derived view is also reachable by
    // its bare name in the default namespace, so a reference-notebook
    // query saying `FROM unified_entities` runs unmodified. Skipped
    // on a name conflict with a base table, exactly the reference's
    // try/except-pass rule (none conflict today; the guard keeps a
    // future table from being shadowed by an alias).
    derivedViews.foreach { case (n, _) =>
      if (!tableNames.contains(n))
        spark.sql(
          s"CREATE OR REPLACE TEMP VIEW `$n` AS SELECT * FROM `$derivedSchema`.`$n`"
        )
    }
    Lake.lastRegistered.put(spark, (dir, fp))
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

  /** Last (dir, content-fingerprint) registered per session — the
    * skip guard's key (see registerViews). WEAK-keyed on the session:
    * a strong key would pin stopped SparkSession object graphs for
    * the process lifetime in a long-lived server embedding this
    * library (advisor round-10). Synchronized wrapper because
    * WeakHashMap is not thread-safe; the critical sections are
    * two-instruction get/put. */
  private val lastRegistered: java.util.Map[SparkSession, (String, String)] =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, (String, String)]()
    )

  /** Process-wide parquet schema cache for [[Lake.table]]: path ->
    * (content fingerprint, schema). Values are METADATA only (a
    * StructType) — never data, listings, or results — so a cache hit
    * changes no query plan semantics, it only skips the
    * footer-reading inference job. The fingerprint (one driver-side
    * listStatus of the table dir, same shape as [[dirFingerprint]])
    * guards the tests'/update-verb's write-then-reread pattern: any
    * file added, removed, or rewritten re-infers. An unreadable path
    * fingerprints as "" and always re-infers, surfacing the real
    * error through the normal reader. */
  private val schemaCache = scala.collection.concurrent.TrieMap
    .empty[String, (String, org.apache.spark.sql.types.StructType)]

  private[catalog] def schemaFor(
      spark: SparkSession,
      path: String
  ): org.apache.spark.sql.types.StructType = {
    val fp = tableFingerprint(spark, path)
    schemaCache.get(path) match {
      case Some((seen, s)) if fp.nonEmpty && seen == fp => s
      case _ =>
        val s = spark.read.parquet(path).schema
        if (fp.nonEmpty) schemaCache.put(path, (fp, s))
        s
    }
  }

  /** Same two-level walk discipline as [[dirFingerprint]] (ADVICE
    * round 15): a table that is a DIRECTORY of part files may nest one
    * level (e.g. a partitioned layout), and object-store synthetic
    * directory entries carry no meaningful mtime/length — a flat
    * listing would serve a stale cached schema after an in-place
    * rewrite of nested part files. Layouts deeper than two levels are
    * NOT walked (dirFingerprint's documented caveat applies here too:
    * such a rewrite needs an explicit re-infer, e.g. the update verb's
    * force path). */
  private def tableFingerprint(spark: SparkSession, path: String): String =
    try {
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(p)
        .flatMap { st =>
          val self =
            s"${st.getPath.getName}:${st.getModificationTime}:${st.getLen}"
          if (!st.isDirectory) Seq(self)
          else
            self +: fs
              .listStatus(st.getPath)
              .map(c =>
                s"${st.getPath.getName}/${c.getPath.getName}:" +
                  s"${c.getModificationTime}:${c.getLen}"
              )
              .toSeq
        }
        .sorted
        .mkString("|")
    } catch { case scala.util.control.NonFatal(_) => "" }

  /** Cheap content fingerprint of a lake dir: listStatus through the
    * dir's own FileSystem (local, HDFS, S3A alike), folding each
    * direct child's name + mtime + length, AND — for children that
    * are directories — each grandchild's. The second level matters on
    * object stores (advisor round 11): S3A-style "directory" entries
    * are synthetic and carry no meaningful mtime/length, so an
    * in-place rewrite of part files inside a table prefix would not
    * move a top-level-only fingerprint and a non-forced
    * registerViews() would serve a stale catalog. Listing one level
    * deeper reads the part files' real (name, mtime, len) on every
    * store. Cost: one RPC per table entry instead of one total —
    * still a ~dozen listings per registration. Deeper layouts
    * (partitioned subdirs) are NOT walked; a rewrite that touches
    * only depth >= 3 needs registerViews(force = true), documented at
    * the call site. Unreadable dirs fingerprint as "" and fall
    * through to registration (which surfaces the real error) —
    * NonFatal, not just IOException, so an object-store client's
    * unchecked failures also land in the registration path rather
    * than escaping the guard. */
  private[catalog] def dirFingerprint(
      spark: SparkSession,
      dir: String
  ): String =
    try {
      val p = new org.apache.hadoop.fs.Path(dir)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(p)
        .flatMap { st =>
          val self =
            s"${st.getPath.getName}:${st.getModificationTime}:${st.getLen}"
          if (!st.isDirectory) Seq(self)
          else
            self +: fs
              .listStatus(st.getPath)
              .map(c =>
                s"${st.getPath.getName}/${c.getPath.getName}:" +
                  s"${c.getModificationTime}:${c.getLen}"
              )
              .toSeq
        }
        .sorted
        .mkString("|")
    } catch { case scala.util.control.NonFatal(_) => "" }
}
