package graft

import graft.catalog.Lake
import graft.sources.{Ingest, Rdf}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class IngestSpec extends AnyFunSuite {
  import TestSpark._
  private val tmp = "target/tmp/ingest-spec"

  test("jsonl -> partitioned parquet round trip preserves rows and prunes partitions") {
    val lake = Lake(spark, sfDir)
    val events = lake.events.withColumn("ts", col("ts").cast("string"))
    events.write.mode("overwrite").json(s"$tmp/events_jsonl")

    val back = Ingest.readJsonl(spark, s"$tmp/events_jsonl", events.schema)
    assert(back.count() == events.count())

    Ingest.writePartitioned(back, s"$tmp/events_parquet", Seq("event_type"), 4)
    val scanned = spark.read.parquet(s"$tmp/events_parquet")
    assert(scanned.count() == events.count())

    // partition pruning: a filter on the partition column must reduce
    // the files read to the single matching directory
    val pruned = scanned.filter(col("event_type") === "purchase")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(pruned.count() == events.filter(col("event_type") === "purchase").count())
    assert(!plan.contains("event_type=click") || plan.contains("PartitionFilters"))
  }

  test("chunked jsonl with drifted schemas merges to the union schema") {
    import org.apache.spark.sql.types._
    import spark.implicits._
    val s1 = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType)))
    val s2 = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("score", DoubleType)))
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "name")
      .write.mode("overwrite").json(s"$tmp/chunk1")
    Seq((4L, "d", 0.4), (5L, "e", 0.5), (6L, "f", 0.6))
      .toDF("id", "name", "score")
      .write.mode("overwrite").json(s"$tmp/chunk2")
    Ingest.convertChunked(
      spark,
      Seq(s"$tmp/chunk1" -> s1, s"$tmp/chunk2" -> s2),
      s"$tmp/merged_parquet"
    )
    val merged = Ingest.readMerged(spark, s"$tmp/merged_parquet")
    assert(merged.columns.toSet == Set("id", "name", "score"))
    assert(merged.count() == 6)
    // rows from the older chunk surface with the missing column null
    assert(merged.filter(col("score").isNull).count() == 3)
    assert(merged.filter(col("score").isNotNull).count() == 3)
  }

  test("identically bucketed tables join with no shuffle exchange") {
    val lake = Lake(spark, sfDir)
    // orphan warehouse locations from earlier sessions are cleaned by
    // writeBucketed itself — no manual rm needed here
    Ingest.writeBucketed(lake.orders, "orders_bkt", Seq("o_custkey"), 4)
    Ingest.writeBucketed(
      lake.customer.withColumnRenamed("c_custkey", "o_custkey"),
      "customer_bkt", Seq("o_custkey"), 4)
    // Force a non-broadcast join so the bucket co-location is what
    // eliminates the shuffle, not a broadcast.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("orders_bkt")
        .join(spark.table("customer_bkt"), "o_custkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan)
      assert(joined.count() == lake.orders.count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("exportLayout writes {schema}/{table} parquet plus an accurate manifest") {
    val lake = Lake(spark, sfDir)
    val out = s"$tmp/export"
    val mPath = Ingest.exportLayout(
      Seq(
        ("core", "region", lake.region),
        ("core", "nation", lake.nation),
        ("text", "documents", lake.documents)
      ),
      out
    )
    // Round trip: every exported table reads back with original rows.
    assert(spark.read.parquet(s"$out/core/region").count() == lake.region.count())
    assert(
      spark.read.parquet(s"$out/text/documents").count() == lake.documents.count()
    )
    // Manifest describes what landed.
    val manifest = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(mPath)),
      java.nio.charset.StandardCharsets.UTF_8
    )
    assert(manifest.contains("\"n_tables\":3"))
    assert(manifest.contains(s""""path":"core/nation","n_rows":${lake.nation.count()}"""))
    assert(manifest.contains(""""name":"doc_id""""))
    assert(manifest.contains(""""table":"documents""""))
  }

  test("csv round trip with explicit schema") {
    val lake = Lake(spark, sfDir)
    val nation = lake.nation
    nation.write.mode("overwrite").option("header", "true").csv(s"$tmp/nation_csv")
    val back = Ingest.readCsv(spark, s"$tmp/nation_csv", nation.schema)
    assert(back.count() == 25)
    assert(back.schema == nation.schema)
  }

  test("N-Triples: parses IRIs, blank nodes, typed/lang literals, escapes; skips noise") {
    val nt =
      """# a comment line
        |<http://ex.org/a> <http://ex.org/p> <http://ex.org/b> .
        |_:b0 <http://ex.org/p> "plain" .
        |<http://ex.org/a> <http://ex.org/label> "hello \"quoted\" \\ world"@en .
        |
        |<http://ex.org/a> <http://ex.org/n> "42"^^<http://www.w3.org/2001/XMLSchema#integer> .
        |<http://ex.org/a> <http://ex.org/esc> "tab\there\nnewline é" .
        |this line is malformed and must be dropped
        |""".stripMargin
    val dir = java.nio.file.Paths.get(s"$tmp/nt")
    java.nio.file.Files.createDirectories(dir)
    java.nio.file.Files.write(
      dir.resolve("f.nt"),
      nt.getBytes(java.nio.charset.StandardCharsets.UTF_8))

    val rows = Rdf.readNTriples(spark, dir.toString)
      .orderBy("p", "o")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        Option(r.getString(3)), Option(r.getString(4)), r.getBoolean(5)))
    assert(rows.length == 5)
    assert(rows.contains(
      ("http://ex.org/a", "http://ex.org/p", "http://ex.org/b", None, None, false)))
    assert(rows.contains(
      ("_:b0", "http://ex.org/p", "plain", None, None, true)))
    assert(rows.contains(
      ("http://ex.org/a", "http://ex.org/label", "hello \"quoted\" \\ world",
        Some("en"), None, true)))
    assert(rows.contains(
      ("http://ex.org/a", "http://ex.org/n", "42",
        None, Some("http://www.w3.org/2001/XMLSchema#integer"), true)))
    assert(rows.contains(
      ("http://ex.org/a", "http://ex.org/esc", "tab\there\nnewline é",
        None, None, true)))
  }

  test("N-Triples: serialize -> parse round trip is the identity, escapes included") {
    import spark.implicits._
    val src = Seq(
      ("a:1", "p", "b:2", false),
      ("_:blank", "p", "with \"quotes\" and \\ backslash", true),
      ("a:1", "q", "line1\nline2\ttabbed", true)
    ).toDF("s", "p", "o", "is_literal")
    val dir = s"$tmp/nt_rt"
    Rdf.toNTriples(src).write.mode("overwrite").text(dir)
    val back = Rdf.readNTriples(spark, dir)
      .select("s", "p", "o", "is_literal")
      .as[(String, String, String, Boolean)]
      .collect()
      .toSet
    assert(back == Set(
      ("a:1", "p", "b:2", false),
      ("_:blank", "p", "with \"quotes\" and \\ backslash", true),
      ("a:1", "q", "line1\nline2\ttabbed", true)))
  }

  test("SKOS: concept export prefers @en, falls back deterministically, gates on typing") {
    val dir = java.nio.file.Paths.get(s"$tmp/skos")
    java.nio.file.Files.createDirectories(dir)
    java.nio.file.Files.write(
      dir.resolve("fixture.nt"),
      Rdf.SkosFixture.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val triples = Rdf.readNTriples(spark, dir.toString)
    val (terms, hierarchy, xrefs) = Rdf.skosTerms(triples)

    val t = terms.orderBy("id").collect()
    assert(t.map(_.getString(0)).toSeq ==
      Seq("http://ex.org/c1", "http://ex.org/c2", "http://ex.org/c3"),
      "non-concept subjects must be excluded; owl:Class counts as a concept")
    assert(t(0).getString(1) == "Physics", "@en prefLabel must beat @de")
    assert(t(0).getString(2) == "The study of matter.")
    assert(t(0).getSeq[String](3) == Seq("physical sciences"),
      "only en-or-untagged altLabels are synonyms")
    assert(t(1).getString(2) == "About light.",
      "scopeNote must back-fill a missing skos:definition")
    assert(t(2).getString(1) == "Chimie",
      "no-en concepts fall back to the lexically-least label")

    val h = hierarchy.collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(h == Set(
      ("http://ex.org/c1", "http://ex.org/c2", "broader"),
      ("http://ex.org/c1", "http://ex.org/c3", "narrower")),
      "narrower edges must invert to parent->child")

    val x = xrefs.collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(x == Set(("http://ex.org/c2", "exactMatch", "http://other.org/opt")))
  }

  test("Turtle: abbreviations expand to the same triples as longhand") {
    import graft.sources.Turtle
    val rows = Turtle.parseTurtle(
      """@prefix ex: <http://ex.org/> .
        |PREFIX x: <urn:x:>
        |# both decl styles; 'a', ';', ',' abbreviations; typed+lang literals
        |ex:s a x:T ;
        |  ex:p ex:o1, "lit"@en, "42"^^<http://www.w3.org/2001/XMLSchema#int> ;
        |  ex:q 7, 2.5, true ;
        |  ex:r "say \"hi\"" .
        |_:b0 ex:p ex:s .
        |""".stripMargin)
    val t = rows.map(r => (r._1, r._2, r._3, r._4, r._5, r._6)).toSet
    val rdfType = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    assert(t.contains(("http://ex.org/s", rdfType, "urn:x:T", None, None, false)))
    assert(t.contains(("http://ex.org/s", "http://ex.org/p", "http://ex.org/o1", None, None, false)))
    assert(t.contains(("http://ex.org/s", "http://ex.org/p", "lit", Some("en"), None, true)))
    assert(t.contains(("http://ex.org/s", "http://ex.org/p", "42", None,
      Some("http://www.w3.org/2001/XMLSchema#int"), true)))
    assert(t.contains(("http://ex.org/s", "http://ex.org/q", "7", None,
      Some("http://www.w3.org/2001/XMLSchema#integer"), true)))
    assert(t.contains(("http://ex.org/s", "http://ex.org/q", "2.5", None,
      Some("http://www.w3.org/2001/XMLSchema#decimal"), true)))
    assert(t.contains(("http://ex.org/s", "http://ex.org/q", "true", None,
      Some("http://www.w3.org/2001/XMLSchema#boolean"), true)))
    assert(t.contains(("http://ex.org/s", "http://ex.org/r", "say \"hi\"", None, None, true)))
    assert(t.contains(("_:b0", "http://ex.org/p", "http://ex.org/s", None, None, false)))
    assert(rows.size == 9)
  }

  test("Turtle: unsupported constructs reject with a named message") {
    import graft.sources.Turtle
    def rejects(ttl: String, frag: String): Unit = {
      val e = intercept[Turtle.TurtleParseError](Turtle.parseTurtle(ttl))
      assert(e.getMessage.contains(frag), e.getMessage)
    }
    rejects("""<urn:s> <urn:p> [ <urn:q> 1 ] .""", "anonymous blank nodes")
    rejects("""<urn:s> <urn:p> (1 2 3) .""", "collections")
    rejects("@base <http://ex.org/> . <s> <p> <o> .", "@base")
    rejects("<urn:s> <urn:p> \"\"\"long\"\"\" .", "long literals")
    rejects("""ex:s <urn:p> <urn:o> .""", "unknown prefix")
  }

  test("Turtle: readTurtle through Spark equals the pure parse") {
    import graft.sources.{Rdf, Turtle}
    val dir = java.nio.file.Paths.get(s"$tmp/ttl")
    java.nio.file.Files.createDirectories(dir)
    java.nio.file.Files.write(
      dir.resolve("f.ttl"),
      Rdf.TurtleFixture.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val viaSpark = Turtle.readTurtle(spark, dir.toString)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        Option(r.getString(3)), Option(r.getString(4)), r.getBoolean(5)))
      .toSet
    assert(viaSpark == Turtle.parseTurtle(Rdf.TurtleFixture).toSet)
    assert(viaSpark.nonEmpty)
  }

  test("RDF/XML: striping parses to triples (typed nodes, nesting, lang, datatype)") {
    import graft.sources.RdfXml
    val rows = RdfXml.parseRdfXml(
      """<?xml version="1.0"?>
        |<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
        |         xmlns:ex="http://ex.org/">
        |  <ex:T rdf:about="urn:s">
        |    <ex:p rdf:resource="urn:o"/>
        |    <ex:q xml:lang="en">hello</ex:q>
        |    <ex:r rdf:datatype="http://www.w3.org/2001/XMLSchema#int">42</ex:r>
        |    <ex:s rdf:datatype="http://www.w3.org/2001/XMLSchema#string">plain</ex:s>
        |    <ex:nest>
        |      <ex:U rdf:nodeID="b1">
        |        <ex:p2>inner</ex:p2>
        |      </ex:U>
        |    </ex:nest>
        |  </ex:T>
        |</rdf:RDF>
        |""".stripMargin).toSet
    val rdfType = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    assert(rows == Set(
      ("urn:s", rdfType, "http://ex.org/T", None, None, false),
      ("urn:s", "http://ex.org/p", "urn:o", None, None, false),
      ("urn:s", "http://ex.org/q", "hello", Some("en"), None, true),
      ("urn:s", "http://ex.org/r", "42", None,
        Some("http://www.w3.org/2001/XMLSchema#int"), true),
      // xsd:string normalizes off, like the N-Triples/Turtle readers
      ("urn:s", "http://ex.org/s", "plain", None, None, true),
      ("urn:s", "http://ex.org/nest", "_:b1", None, None, false),
      ("_:b1", rdfType, "http://ex.org/U", None, None, false),
      ("_:b1", "http://ex.org/p2", "inner", None, None, true)
    ))
  }

  test("RDF/XML: unsupported constructs reject with a named message") {
    import graft.sources.RdfXml
    val rdfDecl = """xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#""""
    def rejects(xml: String, frag: String): Unit = {
      val e = intercept[RdfXml.RdfXmlParseError](RdfXml.parseRdfXml(xml))
      assert(e.getMessage.contains(frag), e.getMessage)
    }
    rejects(s"""<rdf:RDF $rdfDecl>
               |  <rdf:Description rdf:ID="x"/>
               |</rdf:RDF>""".stripMargin, "rdf:ID")
    rejects(s"""<rdf:RDF $rdfDecl xmlns:ex="urn:e:">
               |  <rdf:Description rdf:about="urn:s">
               |    <ex:p rdf:parseType="Resource"/>
               |  </rdf:Description>
               |</rdf:RDF>""".stripMargin, "rdf:parseType")
    rejects(s"""<rdf:RDF $rdfDecl>
               |  <rdf:Description rdf:about="urn:s">
               |    <rdf:li>x</rdf:li>
               |  </rdf:Description>
               |</rdf:RDF>""".stripMargin, "rdf:li")
    rejects("<notrdf/>", "root must be rdf:RDF")
    rejects("<rdf:RDF xmlns:rdf='http://www.w3.org/1999/02/22-rdf-syntax-ns#'>",
      "not well-formed")
    // entity hardening: DOCTYPE must be refused outright
    rejects(s"""<!DOCTYPE rdf:RDF [<!ENTITY x "boom">]>
               |<rdf:RDF $rdfDecl/>""".stripMargin, "not well-formed")
  }

  test("RDF/XML: fixture triples equal the Turtle fixture's (3-syntax equivalence)") {
    import graft.sources.{Rdf, RdfXml, Turtle}
    // The SAME concept scheme is spelled in N-Triples (ing05), Turtle
    // (ing06), and RDF/XML (ing08); Turtle is a superset of N-Triples,
    // so one pure parser pins NT==TTL and this pins TTL==RDF/XML.
    val viaTurtle = Turtle.parseTurtle(Rdf.TurtleFixture).toSet
    val viaXml = RdfXml.parseRdfXml(Rdf.RdfXmlFixture).toSet
    assert(viaXml == viaTurtle)
    // and through Spark, same rows as the pure parse
    val dir = java.nio.file.Paths.get(s"$tmp/rdfxml")
    java.nio.file.Files.createDirectories(dir)
    java.nio.file.Files.write(
      dir.resolve("f.rdf"),
      Rdf.RdfXmlFixture.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val viaSpark = RdfXml.readRdfXml(spark, dir.toString)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        Option(r.getString(3)), Option(r.getString(4)), r.getBoolean(5)))
      .toSet
    assert(viaSpark == viaXml)
  }

  test("readOntology dispatches on extension; all formats land in one triple frame") {
    import graft.sources.{Rdf, Turtle}
    val dir = java.nio.file.Paths.get(s"$tmp/anyfmt")
    java.nio.file.Files.createDirectories(dir)
    def write(name: String, body: String): String = {
      val p = dir.resolve(name)
      java.nio.file.Files.write(p, body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      p.toString
    }
    val expected = Turtle.parseTurtle(Rdf.TurtleFixture).toSet
    def spo(path: String) =
      Rdf.readOntology(spark, path).select("s", "p", "o").collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    // the same concept scheme through three dispatch routes
    assert(spo(write("f.ttl", Rdf.TurtleFixture)) == expected.map(t => (t._1, t._2, t._3)))
    assert(spo(write("f.nt", Rdf.SkosFixture)) == expected.map(t => (t._1, t._2, t._3)))
    assert(spo(write("f.rdf", Rdf.RdfXmlFixture)) == expected.map(t => (t._1, t._2, t._3)))
    // OBO lifts terms+hierarchy into the frame with literal labels
    val obo = Rdf.readOntology(spark, write("f.obo", Rdf.OboFixture))
    assert(obo.columns.toSeq ==
      Seq("s", "p", "o", "o_lang", "o_datatype", "is_literal"))
    val oboRows = obo.collect()
    assert(oboRows.exists(r => r.getString(0) == "GT:0003" && r.getString(1) == "part_of"))
    assert(oboRows.filter(_.getBoolean(5)).forall(_.getString(1) == "label"))
    // unknown extensions reject by name
    val e = intercept[IllegalArgumentException](
      Rdf.readOntology(spark, write("f.json", "{}")))
    assert(e.getMessage.contains(".json"))
  }

  test("readOntologies tags each file's triples with its own named graph") {
    import graft.sources.{Rdf, Turtle}
    val dir = java.nio.file.Paths.get(s"$tmp/multigraph")
    java.nio.file.Files.createDirectories(dir)
    def write(name: String, body: String): String = {
      val p = dir.resolve(name)
      java.nio.file.Files.write(p, body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      p.toString
    }
    val quads = Rdf.readOntologies(
      spark,
      Seq(write("a.ttl", Rdf.TurtleFixture), write("b.obo", Rdf.OboFixture)))
    assert(quads.columns.toSeq == Seq("s", "p", "o", "is_literal", "g"))
    val byGraph = quads.collect().groupBy(_.getString(4))
    assert(byGraph.keySet == Set("a.ttl", "b.obo"))
    // per-graph content is exactly the single-file read
    assert(byGraph("a.ttl").length ==
      Turtle.parseTurtle(Rdf.TurtleFixture).length)
    assert(byGraph("b.obo").map(r => (r.getString(0), r.getString(1))).toSet ==
      Rdf.readOntology(spark, dir.resolve("b.obo").toString)
        .collect().map(r => (r.getString(0), r.getString(1))).toSet)
    // and the SPARQL dataset surface addresses one file's graph
    val labels = graft.sparql.Sparql.run(
      quads,
      """SELECT ?s ?o WHERE { GRAPH <b.obo> { ?s <label> ?o } } ORDER BY ?s""")
      .collect()
    assert(labels.length == 4, "4 OBO term labels expected")
    assert(labels.forall(_.getString(0).startsWith("GT:")))
  }

  test("OBO: stanza fold produces the reference's three tables") {
    val dir = java.nio.file.Paths.get(s"$tmp/obo")
    java.nio.file.Files.createDirectories(dir)
    java.nio.file.Files.write(
      dir.resolve("fixture.obo"),
      Rdf.OboFixture.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val (terms, hierarchy, xrefs) = Rdf.readObo(spark, dir.toString)

    val t = terms.orderBy("id").collect()
    assert(t.map(_.getString(0)).toSeq ==
      Seq("GT:0001", "GT:0002", "GT:0003", "GT:0004"),
      "Typedef stanza must be skipped, all four Term stanzas kept")
    val root = t(0)
    assert(root.getString(1) == "root concept")
    assert(root.getString(2) == "The root \"concept\" of the fixture.",
      "def must be the unescaped first quoted string")
    val mid = t(1)
    assert(mid.getSeq[String](3) == Seq("central concept", "mid concept"),
      "synonyms are the quoted strings in canonical (sorted) order")
    assert(t(3).getBoolean(5), "is_obsolete: true must set the flag")
    assert(!root.getBoolean(5))

    val h = hierarchy.orderBy("child_id", "relation").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(h.toSeq == Seq(
      ("GT:0001", "GT:0002", "is_a"),
      ("GT:0002", "GT:0003", "is_a"),
      ("GT:0001", "GT:0003", "part_of")),
      "is_a comments stripped; relationship rows typed")

    val x = xrefs.orderBy("term_id").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(x.toSeq == Seq(
      ("GT:0002", "WIKI", "Middle_concept"),
      ("GT:0003", "DOI", "10.1000/182")),
      "xref splits on the FIRST colon only")
  }

  test("jsonl quarantine: splits are exact — parsed rows intact, corrupt lines preserved raw") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val spark = TestSpark.spark
    val dir = java.nio.file.Files.createTempDirectory("ing10spec").toString
    val goodLines = Seq(
      """{"id": 1, "name": "alpha"}""",
      """{"id": 2, "name": "beta"}""",
      """{"id": 4, "name": "delta"}"""
    )
    val badLines = Seq(
      """{"id": 3, "name": "gam""",   // truncated
      """not json at all"""
    )
    import spark.implicits._
    (goodLines ++ badLines).toDF("value")
      .repartition(2).write.mode("overwrite").text(dir)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType)))
    val qr = graft.sources.Ingest.readJsonlQuarantined(spark, dir, schema)
    val g = qr.good.orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(g.toSeq == Seq((1L, "alpha"), (2L, "beta"), (4L, "delta")))
    assert(!qr.good.columns.contains("_corrupt_record"))
    // every quarantined row preserves its raw input byte-for-byte
    val b = qr.bad.collect().map(_.getString(0)).sorted
    assert(b.toSeq == badLines.sorted)
    qr.unpersist()
  }

  test("ing10 audit: good payload sums match the clean subset; quarantine counts the corrupted one") {
    val lake = graft.catalog.Lake(TestSpark.spark, TestSpark.sfDir)
    val rows = graft.sources.Ingest.ing10JsonlQuarantine(lake).collect()
    assert(rows.length == 2)
    val expectBad = lake.documents.filter("doc_id % 7 = 3").count()
    val expectChars = lake.documents.filter("doc_id % 7 != 3")
      .agg(org.apache.spark.sql.functions.sum("n_chars")).head().getLong(0)
    assert(rows(0).getString(0) == "good" &&
      rows(0).getLong(1) == lake.documents.count() - expectBad &&
      rows(0).getLong(2) == expectChars)
    assert(rows(1).getString(0) == "quarantined" &&
      rows(1).getLong(1) == expectBad && rows(1).isNullAt(2))
  }
}
