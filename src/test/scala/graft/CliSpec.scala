package graft

import org.scalatest.funsuite.AnyFunSuite

class CliSpec extends AnyFunSuite {

  test("SQL gate accepts single SELECT/WITH statements") {
    assert(Cli.validateReadOnly("SELECT 1").isRight)
    assert(Cli.validateReadOnly("  select * from trade.orders  ").isRight)
    assert(Cli.validateReadOnly("WITH x AS (SELECT 1) SELECT * FROM x").isRight)
    assert(Cli.validateReadOnly("SELECT 1;").isRight) // one trailing ; ok
    assert(Cli.validateReadOnly("(SELECT 1)").isRight)
    assert(
      Cli.validateReadOnly("-- a comment\n/* more */ SELECT 1").isRight,
      "leading comments must not defeat keyword detection"
    )
  }

  test("SQL gate rejects DDL, DML, session mutation, and multi-statement input") {
    assert(Cli.validateReadOnly("DROP TABLE orders").isLeft)
    assert(Cli.validateReadOnly("INSERT INTO orders VALUES (1)").isLeft)
    assert(Cli.validateReadOnly("CREATE VIEW v AS SELECT 1").isLeft)
    assert(Cli.validateReadOnly("UPDATE orders SET o_totalprice = 0").isLeft)
    assert(Cli.validateReadOnly("DELETE FROM orders").isLeft)
    assert(Cli.validateReadOnly("SET spark.sql.shuffle.partitions=1").isLeft)
    assert(Cli.validateReadOnly("SELECT 1; DROP TABLE orders").isLeft)
    assert(Cli.validateReadOnly("SELECT 1;;").isLeft)
    assert(Cli.validateReadOnly("").isLeft)
    assert(Cli.validateReadOnly("-- only a comment").isLeft)
    assert(
      Cli.validateReadOnly("/* hidden */ DROP TABLE orders").isLeft,
      "comment prefixes must not smuggle DDL through"
    )
  }

  test("SQL gate rejects CTE-prefixed DML (Spark grammar: ctes? dmlStatementNoWith)") {
    assert(
      Cli.validateReadOnly(
        "WITH t AS (SELECT 1) INSERT OVERWRITE DIRECTORY '/tmp/x' USING parquet SELECT * FROM t").isLeft,
      "WITH ... INSERT must not pass the head-keyword check"
    )
    assert(Cli.validateReadOnly("WITH t AS (SELECT 1) INSERT INTO orders SELECT * FROM t").isLeft)
    assert(Cli.validateReadOnly("WITH t AS (SELECT 1) DELETE FROM orders").isLeft)
    assert(Cli.validateReadOnly("WITH t AS (SELECT 1) MERGE INTO orders USING t ON true WHEN MATCHED THEN DELETE").isLeft)
  }

  test("SQL gate keyword scan ignores literals, identifiers, and comments") {
    // Blocked words inside strings/quoted identifiers are data, not SQL.
    assert(Cli.validateReadOnly("SELECT 'insert into x' AS s").isRight)
    assert(Cli.validateReadOnly("SELECT `drop` FROM orders").isRight)
    assert(Cli.validateReadOnly("SELECT 1 -- drop table orders").isRight)
    // A ';' inside a literal is one statement (advisor round-5 note).
    assert(Cli.validateReadOnly("SELECT 'a;b' AS s").isRight)
    // Underscored names that CONTAIN a blocked word are distinct tokens.
    assert(Cli.validateReadOnly("SELECT date_add(date '2024-01-01', 1)").isRight)
    assert(Cli.validateReadOnly("SELECT regexp_replace(c, 'a', 'b') FROM orders").isRight)
    // But the bare keyword outside any literal is still caught anywhere.
    assert(Cli.validateReadOnly("SELECT * FROM orders WHERE 1=1 UNION SELECT 1; DROP TABLE x").isLeft)
  }

  test("shell: scripted session runs reads, rejects writes, lists tables, exits") {
    import TestSpark._
    val lake = graft.catalog.Lake(spark, sfDir)
    lake.registerViews()
    val script =
      """SELECT 123456 AS shell_probe
        |WITH t AS (SELECT 1) INSERT INTO orders SELECT * FROM t
        |.tables
        |
        |SELECT bogus_col FROM trade.orders
        |exit
        |""".stripMargin
    val in = new java.io.BufferedReader(new java.io.StringReader(script))
    val buf = new java.io.ByteArrayOutputStream()
    val out = new java.io.PrintStream(buf, true, "UTF-8")
    Cli.runShell(spark, lake, in, out)
    val output = buf.toString("UTF-8")
    assert(output.contains("123456"), output)
    assert(output.contains("rejected"), output)
    assert(output.contains("trade.orders") && output.contains("corpus.documents"), output)
    assert(output.contains("query error"), output)
    // blank line must not produce a prompt-less hang or an error
    assert(!output.contains("Exception"), output)
  }

  test("shell: the console example-query set replays over the lake's views") {
    // The interactive console ships a dropdown of canned example
    // queries (reference: app.py:41-152 EXAMPLE_QUERIES — row-count
    // overview, top-N by metric, per-year aggregates, cross-source
    // comparison, coverage flags, join+topic distribution, term
    // lookup). Each example's SHAPE replayed here over graft's
    // schema-qualified views, through the same read-only gate the
    // console enforces (app.py:204-216 ≙ validateReadOnly) — any
    // example the view layer can't serve is a named gap, not a skip.
    import TestSpark._
    val lake = graft.catalog.Lake(spark, sfDir)
    lake.registerViews()
    val script =
      // 1. Quick overview: row counts per dataset (UNION ALL counts)
      """SELECT 'documents' AS dataset, COUNT(*) AS n_rows FROM corpus.documents UNION ALL SELECT 'orders', COUNT(*) FROM trade.orders UNION ALL SELECT 'events', COUNT(*) FROM activity.events ORDER BY n_rows DESC
        |SELECT doc_id, n_chars, lang FROM corpus.documents WHERE n_chars IS NOT NULL ORDER BY n_chars DESC, doc_id LIMIT 10
        |SELECT YEAR(o_orderdate) AS yr, COUNT(*) AS n, ROUND(AVG(o_totalprice), 4) AS avg_price FROM trade.orders WHERE o_orderstatus = 'F' GROUP BY YEAR(o_orderdate) ORDER BY yr
        |SELECT d.source, COUNT(*) AS n_docs, ROUND(AVG(d.n_chars), 1) AS avg_chars, ABS(COUNT(*) - 25) AS diff_from_uniform FROM corpus.documents d GROUP BY d.source ORDER BY diff_from_uniform DESC, d.source LIMIT 20
        |SELECT lang = 'en' AS is_en, n_chars > 300 AS is_long, COUNT(*) AS papers FROM corpus.documents GROUP BY lang = 'en', n_chars > 300 ORDER BY papers DESC
        |SELECT n.n_name AS topic, r.r_name AS domain, COUNT(*) AS paper_count FROM trade.customer c JOIN trade.nation n ON c.c_nationkey = n.n_nationkey JOIN trade.region r ON n.n_regionkey = r.r_regionkey GROUP BY n.n_name, r.r_name ORDER BY paper_count DESC, topic LIMIT 20
        |SELECT DISTINCT event_type AS label FROM activity.events ORDER BY label LIMIT 20
        |exit
        |""".stripMargin
    val in = new java.io.BufferedReader(new java.io.StringReader(script))
    val buf = new java.io.ByteArrayOutputStream()
    val out = new java.io.PrintStream(buf, true, "UTF-8")
    Cli.runShell(spark, lake, in, out)
    val output = buf.toString("UTF-8")
    assert(!output.contains("rejected") && !output.contains("query error"), output)
    // overview counts: every dataset row materialized
    assert(output.contains("documents") && output.contains("500"), output)
    assert(output.contains("orders") && output.contains("1500"), output)
    // 7 timed result sets (one per example), each through the gate
    assert("\\(\\d+\\.\\d\\d s\\)".r.findAllIn(output).length == 7, output)
  }

  test("catalog: markdown derives schemas, tables, columns, and counts from the lake") {
    import TestSpark._
    val lake = graft.catalog.Lake(spark, sfDir)
    val md = graft.operators.CatalogOps.catalogMarkdown(lake)
    // every schema section and every qualified table must appear
    assert(md.contains("## Schema `trade`"), md.take(400))
    assert(md.contains("## Schema `activity`"))
    assert(md.contains("## Schema `corpus`"))
    lake.tableNames.foreach(n => assert(md.contains(s"`${lake.qualified(n)}`"), n))
    // column rows carry real schema facts (spot-check a known column)
    assert(md.contains("| `o_orderkey` | bigint |"))
    // counts are real: the nation table has 25 rows at every SF
    assert(md.contains("`trade.nation` — 25 rows"))
  }

  test("convert: unknown dataset is rejected by name, listing what is available") {
    import TestSpark._
    val out = Cli.convertDataset(spark, "nosuch", "/tmp/in", "/tmp/out")
    assert(out.isLeft)
    assert(out.left.exists(_.contains("no converter for: nosuch")))
    assert(out.left.exists(_.contains("openalex")), "must list available datasets")
    // a known dataset with an empty input dir fails on the INPUT, not
    // the name
    val tmp = java.nio.file.Files.createTempDirectory("cli_empty").toString
    val miss = Cli.convertDataset(spark, "openalex", tmp, "/tmp/out2")
    assert(miss.isLeft && miss.left.exists(_.contains("no JSONL chunks")))
  }

  test("convert: chunked JSONL with schema drift lands as one union-schema parquet") {
    import TestSpark._
    val in = java.nio.file.Files.createTempDirectory("cli_jsonl")
    // chunk 2 adds a field chunk 1 lacks — the dump-over-dump reality
    java.nio.file.Files.write(in.resolve("chunk_000.jsonl"),
      "{\"id\":1,\"t\":\"a\"}\n{\"id\":2,\"t\":\"b\"}\n".getBytes("UTF-8"))
    java.nio.file.Files.write(in.resolve("chunk_001.jsonl"),
      "{\"id\":3,\"t\":\"c\",\"extra\":9}\n".getBytes("UTF-8"))
    val out = java.nio.file.Files.createTempDirectory("cli_pq").toString + "/openalex"
    val res = Cli.convertDataset(spark, "openalex", in.toString, out)
    assert(res.isRight, res)
    assert(res.exists(_.contains("2 chunk(s)")))
    val back = graft.sources.Ingest.readMerged(spark, out)
    assert(back.count() == 3)
    // union schema: the drifted column exists, null-filled for chunk 1
    assert(back.columns.contains("extra"))
    assert(back.filter(back.col("extra").isNull).count() == 2)
  }

  test("convert: fulltext chunks unify, clean, and priority-dedup per DOI") {
    import TestSpark._
    val in = java.nio.file.Files.createTempDirectory("cli_ft")
    // chunk 1: s2orc rows — one malformed DOI with an embedded
    // doi.org URL, messy whitespace in the text
    java.nio.file.Files.write(in.resolve("chunk_000.jsonl"),
      ("{\"doi\":\"10.1/ABC\",\"source\":\"s2orc\",\"title\":\"T1\"," +
        "\"text\":\"body  with   runs\\n\\n\\n\\nand gaps \",\"year\":2020,\"source_id\":\"s1\"}\n" +
        "{\"doi\":\"10.1002/https://doi.org/10.6028/nist.ir.7942\"," +
        "\"source\":\"s2orc\",\"title\":\"T2\",\"text\":\"x\",\"source_id\":\"s2\"}\n" +
        "{\"doi\":\"bad\",\"source\":\"s2orc\",\"title\":\"dropped\",\"text\":\"y\",\"source_id\":\"s3\"}\n")
        .getBytes("UTF-8"))
    // chunk 2: pmc beats s2orc on the shared DOI despite SHORTER text;
    // schema drift: no year column, adds license
    java.nio.file.Files.write(in.resolve("chunk_001.jsonl"),
      ("{\"doi\":\"10.1/abc\",\"source\":\"pmc\",\"title\":\"T1-pmc\"," +
        "\"text\":\"pmc body\",\"license\":\"cc-by\",\"source_id\":\"p1\"}\n")
        .getBytes("UTF-8"))
    val out = java.nio.file.Files.createTempDirectory("cli_ftpq").toString + "/fulltext"
    val res = Cli.convertDataset(spark, "fulltext", in.toString, out)
    assert(res.isRight, res)
    val back = spark.read.parquet(out).collect()
      .map(r => r.getAs[String]("doi") -> r).toMap
    // "bad" (len<5) dropped; the two valid DOIs remain
    assert(back.keySet == Set("10.1/abc", "10.6028/nist.ir.7942"))
    val best = back("10.1/abc")
    // pmc outranks s2orc regardless of text_length
    assert(best.getAs[String]("source") == "pmc")
    assert(best.getAs[String]("title") == "T1-pmc")
    assert(best.getAs[String]("license") == "cc-by")
    assert(best.getAs[Boolean]("has_full_text"))
    // the embedded-URL DOI was extracted and lowercased
    val fixed = back("10.6028/nist.ir.7942")
    assert(fixed.getAs[String]("title") == "T2")
    // unified schema is complete even where chunks drifted
    assert(spark.read.parquet(out).columns.toSeq.sorted == Seq(
      "abstract", "doi", "has_full_text", "language", "license",
      "source", "source_id", "text", "text_length", "title", "year"))
  }

  test("fulltext clean_text collapses runs and newlines like the reference") {
    import TestSpark._
    import spark.implicits._
    val df = Seq("a  b\tc\n\n\n\nd  ", "  x ", "").toDF("t")
      .select(graft.sources.Fulltext.cleanText(org.apache.spark.sql.functions.col("t")).as("c"))
    assert(df.collect().map(_.getString(0)).toSeq ==
      Seq("a b c\n\nd", "x", ""))
  }

  test("convert: CSV tables land as parquet with inferred schema") {
    import TestSpark._
    val in = java.nio.file.Files.createTempDirectory("cli_csv")
    java.nio.file.Files.write(in.resolve("t.csv"),
      "id,name,score\n1,alpha,0.5\n2,beta,1.5\n".getBytes("UTF-8"))
    val out = java.nio.file.Files.createTempDirectory("cli_csvpq").toString + "/sciscinet"
    val res = Cli.convertDataset(spark, "sciscinet", in.toString, out)
    assert(res.isRight, res)
    val back = spark.read.parquet(out)
    assert(back.count() == 2)
    // header + inferSchema: typed columns, not all-strings
    assert(back.schema("id").dataType.typeName == "integer")
    assert(back.schema("score").dataType.typeName == "double")
  }

  test("convert: ontology files land as a named-graph quad store") {
    import TestSpark._
    val in = java.nio.file.Files.createTempDirectory("cli_onto")
    java.nio.file.Files.write(in.resolve("a.nt"),
      "<s1> <p> <o1> .\n<s2> <p> <o2> .\n".getBytes("UTF-8"))
    java.nio.file.Files.write(in.resolve("b.nt"),
      "<s3> <p> <o3> .\n".getBytes("UTF-8"))
    val out = java.nio.file.Files.createTempDirectory("cli_store").toString + "/onto"
    val res = Cli.convertDataset(spark, "ontologies", in.toString, out)
    assert(res.isRight, res)
    val store = spark.read.parquet(out)
    assert(store.columns.toSeq.sorted == Seq("g", "is_literal", "o", "p", "s"))
    assert(store.count() == 3)
    // one graph per file, so SPARQL's dataset surface works over it
    assert(store.select("g").distinct().count() == 2)
  }

  test("xref derived views resolve by name and equal their Linkage operators") {
    // The reference's defining catalog idiom: the linkage OUTPUTS are
    // views a shell user queries by name (xref.doi_map /
    // xref.unified_papers, create_unified_db.py:513-577). The view
    // SQL and the DataFrame operators are separate formulations of
    // the same semantics — this pin is what keeps them from drifting.
    import TestSpark._
    val lake = graft.catalog.Lake(spark, sfDir)
    lake.registerViews()
    def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).sorted.toSeq
    assert(
      rows(spark.sql("SELECT * FROM xref.id_map")) ==
        rows(graft.operators.Linkage.xref01IdMap(lake)))
    assert(
      rows(spark.sql("SELECT * FROM xref.unified_entities")) ==
        rows(graft.operators.Linkage.xref02UnifiedEntities(lake)))
    assert(
      rows(spark.sql("SELECT * FROM xref.priority_dedup")) ==
        rows(graft.operators.Linkage.xref04PriorityDedup(lake)))
    assert(
      rows(spark.sql("SELECT * FROM xref.coverage_by_year")) ==
        rows(graft.operators.Linkage.xref12CoverageByYear(lake)))
    assert(
      rows(spark.sql("SELECT * FROM xref.temporal_flags")) ==
        rows(graft.operators.Linkage.xref13TemporalFlags(lake)))
    // and the shell surfaces them: .tables lists the xref schema, a
    // by-name query over xref.id_map answers through the same gate
    val script =
      """.tables
        |SELECT source, COUNT(*) AS n FROM xref.id_map GROUP BY source ORDER BY source
        |SELECT COUNT(*) AS n_unified FROM xref.unified_entities
        |exit
        |""".stripMargin
    val in = new java.io.BufferedReader(new java.io.StringReader(script))
    val buf = new java.io.ByteArrayOutputStream()
    Cli.runShell(spark, lake, in, new java.io.PrintStream(buf, true, "UTF-8"))
    val output = buf.toString("UTF-8")
    assert(output.contains("xref.id_map") && output.contains("xref.priority_dedup"),
      output)
    assert(!output.contains("rejected") && !output.contains("query error"), output)
    assert(output.contains("customer") && output.contains("supplier"), output)
  }

  test("backward-compat aliases: derived views resolve by BARE name (reference notebooks)") {
    // create_unified_db.py:660 create_backward_compat_views registers
    // unschema'd aliases "for backward compatibility with existing
    // notebooks" — a reference-notebook query shape (`FROM papers
    // LIMIT 5`) must run unmodified. Graft analog: the xref derived
    // views by bare name.
    import TestSpark._
    val lake = graft.catalog.Lake(spark, sfDir)
    lake.registerViews(force = true)
    def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).sorted.toSeq
    assert(
      rows(spark.sql("SELECT * FROM unified_entities")) ==
        rows(spark.sql("SELECT * FROM xref.unified_entities")))
    assert(spark.sql("SELECT * FROM id_map LIMIT 5").count() == 5)
    // and through the shell's gate, the notebook shape verbatim
    val script =
      """SELECT entity_id, entity_name FROM unified_entities LIMIT 5
        |SELECT COUNT(*) AS n FROM coverage_by_year
        |exit
        |""".stripMargin
    val in = new java.io.BufferedReader(new java.io.StringReader(script))
    val buf = new java.io.ByteArrayOutputStream()
    Cli.runShell(spark, lake, in, new java.io.PrintStream(buf, true, "UTF-8"))
    val output = buf.toString("UTF-8")
    assert(!output.contains("rejected") && !output.contains("query error"), output)
    assert(output.contains("entity_name"), output)
  }

  test("shell: an unlimited SELECT gets an auto-LIMIT and a truncation line (app.py parity)") {
    import TestSpark._
    val lake = graft.catalog.Lake(spark, sfDir)
    lake.registerViews()
    // documents has 500 rows: the injected LIMIT 100 fills up -> the
    // status line; an explicit LIMIT suppresses injection; a 'limit'
    // inside a string literal does NOT count as a LIMIT clause
    val script =
      """SELECT doc_id FROM corpus.documents
        |SELECT doc_id FROM corpus.documents LIMIT 3
        |exit
        |""".stripMargin
    val in = new java.io.BufferedReader(new java.io.StringReader(script))
    val buf = new java.io.ByteArrayOutputStream()
    Cli.runShell(spark, lake, in, new java.io.PrintStream(buf, true, "UTF-8"))
    val output = buf.toString("UTF-8")
    assert(output.contains("showing first 100 rows"), output)
    assert("showing first".r.findAllIn(output).length == 1, output)
    // the scrubbed-token check: a literal cannot satisfy the LIMIT test
    val (sql1, injected1) = Cli.withAutoLimit("SELECT 'no limit here' AS s")
    assert(injected1 && sql1.endsWith("LIMIT 100"), sql1)
    val (_, injected2) = Cli.withAutoLimit("SELECT 1 LIMIT 7")
    assert(!injected2)
  }

  test("shell: EOF without exit terminates cleanly") {
    import TestSpark._
    val lake = graft.catalog.Lake(spark, sfDir)
    lake.registerViews()
    val in = new java.io.BufferedReader(new java.io.StringReader("SELECT 1 AS x\n"))
    val buf = new java.io.ByteArrayOutputStream()
    Cli.runShell(spark, lake, in, new java.io.PrintStream(buf, true, "UTF-8"))
    assert(buf.toString("UTF-8").contains("x"))
  }
}
