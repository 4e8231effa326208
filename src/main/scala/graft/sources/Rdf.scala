package graft.sources

import graft.catalog.Lake
import graft.plans.NtUnescape
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** RDF / ontology-format ingestion — the input side of the reference's
  * graph story (reference: scripts/convert_ontologies.py — 13
  * ontologies from OBO/SKOS/RDF-XML/Turtle into parquet triple and
  * term tables; `_convert_to_ntriples` at :155, `export_parquet_obo`
  * at :254, `export_parquet_skos` at :327). Two line-oriented formats
  * cover the pipeline without any external RDF library:
  *
  *  - '''N-Triples''' (`<s> <p> <o> .` / `<s> <p> "lit"@lang .`): the
  *    normal form every other RDF syntax converts to (the reference
  *    converts OBO/CSV to exactly this for oxigraph ingestion). Each
  *    line is independent, so the reader is embarrassingly parallel —
  *    a plain splittable text scan + regex projection; a 100 TB triple
  *    dump distributes like any other flat file.
  *  - '''OBO''' (stanza format: `[Term]` blocks of `key: value`
  *    lines): stanzas span lines, so folding needs file order. Files
  *    are read `wholetext` and split with posexplode — exact line
  *    numbering regardless of how the scan would otherwise split
  *    files. Ontologies are reference data (the reference's 13 total
  *    well under a GB), so per-file memory is bounded and parallelism
  *    comes from the file count; corpus-scale data never flows
  *    through this reader.
  *
  * Both feed the existing (s, p, o) triple schema, so bgpMatch /
  * property paths / the SPARQL text front-end run over ingested
  * ontology files unchanged.
  */
object Rdf {

  // ------------------------------------------------------------ N-Triples

  /** `<subj>` or `_:blank`, `<pred>`, then the object run up to the
    * final `.` — object sub-parse happens in a second regex because
    * literals may contain escaped quotes and a trailing `@lang` or
    * `^^<datatype>`. */
  private val LineRe = """^\s*(<[^>]*>|_:\S+)\s+(<[^>]*>)\s+(.*?)\s*\.\s*$"""
  private val LitRe = """^"((?:[^"\\]|\\.)*)"(?:@([A-Za-z][A-Za-z0-9-]*)|\^\^<([^>]*)>)?$"""

  /** Parse an N-Triples file (or directory/glob of them) into
    * (s, p, o, o_lang, o_datatype, is_literal). IRIs are returned
    * without their angle brackets; blank nodes keep their `_:` prefix;
    * literal objects are unescaped. Comment (`#`) and blank lines are
    * skipped; lines that match neither are dropped (count them by
    * diffing against the raw line count — rdflib, the reference's
    * parser, hard-errors instead; a distributed reader reports rather
    * than dies at line 10^12). */
  def readNTriples(spark: SparkSession, path: String): DataFrame = {
    val lines = spark.read.text(path)
      .select(trim(col("value")).as("line"))
      .filter(col("line") =!= "" && !col("line").startsWith("#"))
    val parts = lines.select(
      regexp_extract(col("line"), LineRe, 1).as("s_raw"),
      regexp_extract(col("line"), LineRe, 2).as("p_raw"),
      regexp_extract(col("line"), LineRe, 3).as("o_raw")
    ).filter(col("s_raw") =!= "" && col("p_raw") =!= "" && col("o_raw") =!= "")
    parts.select(
      when(col("s_raw").startsWith("<"),
        col("s_raw").substr(lit(2), length(col("s_raw")) - 2))
        .otherwise(col("s_raw")).as("s"),
      col("p_raw").substr(lit(2), length(col("p_raw")) - 2).as("p"),
      when(col("o_raw").startsWith("<"),
        col("o_raw").substr(lit(2), length(col("o_raw")) - 2))
        .when(col("o_raw").startsWith("\""),
          NtUnescape(regexp_extract(col("o_raw"), LitRe, 1)))
        .otherwise(col("o_raw")).as("o"),
      when(col("o_raw").startsWith("\""),
        nullif(regexp_extract(col("o_raw"), LitRe, 2), lit("")))
        .otherwise(lit(null)).as("o_lang"),
      when(col("o_raw").startsWith("\""),
        nullif(regexp_extract(col("o_raw"), LitRe, 3), lit("")))
        .otherwise(lit(null)).as("o_datatype"),
      col("o_raw").startsWith("\"").as("is_literal")
    )
  }

  /** Serialize (s, p, o, is_literal) rows to N-Triples lines — the
    * writer half of the round-trip. Escape direction is safe as a
    * replace chain (backslash FIRST, then the chars that become
    * backslash-escapes — the inverse direction is what needs the
    * scalar kernel). Subjects starting `_:` stay blank nodes. */
  def toNTriples(df: DataFrame): DataFrame = {
    val esc = (c: org.apache.spark.sql.Column) =>
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(c, "\\\\", "\\\\\\\\"),
            "\"", "\\\\\""),
          "\n", "\\\\n"),
        "\r", "\\\\r")
    val iri = (c: org.apache.spark.sql.Column) =>
      when(c.startsWith("_:"), c).otherwise(concat(lit("<"), c, lit(">")))
    df.select(
      concat(
        iri(col("s")), lit(" "),
        concat(lit("<"), col("p"), lit(">")), lit(" "),
        when(col("is_literal"), concat(lit("\""), esc(col("o")), lit("\"")))
          .otherwise(iri(col("o"))),
        lit(" .")
      ).as("value")
    )
  }

  // ----------------------------------------------------------------- OBO

  private val QuotedRe = """"((?:[^"\\]|\\.)*)""""

  /** Per-line (file, line-number, stanza-number, stanza-type, key,
    * value) view of OBO files: wholetext + posexplode pins exact line
    * order, a cumulative count of `[Header]` lines numbers the
    * stanzas, and the stanza's own header row labels every line in
    * it. Lines before the first stanza (the format-version preamble)
    * get stanza 0 / type null. */
  private def oboLines(spark: SparkSession, path: String): DataFrame = {
    val files = spark.read.option("wholetext", "true").text(path)
      .select(input_file_name().as("file"), col("value"))
    val lines = files.select(
      col("file"),
      posexplode(split(col("value"), "\r?\n")).as(Seq("lid", "line"))
    )
    val byFile = Window.partitionBy("file").orderBy("lid")
    val tagged = lines
      .withColumn("hdr", regexp_extract(col("line"), """^\[(\w+)\]\s*$""", 1))
      .withColumn("stanza",
        sum(when(col("hdr") =!= "", 1).otherwise(0)).over(byFile))
      .withColumn("stype",
        last(when(col("hdr") =!= "", col("hdr")), ignoreNulls = true).over(byFile))
    tagged
      .filter(col("hdr") === "" && col("line").rlike("""^[A-Za-z_]+:"""))
      .select(
        col("file"), col("stanza"), col("stype"),
        regexp_extract(col("line"), """^([A-Za-z_]+):\s*(.*)$""", 1).as("k"),
        regexp_extract(col("line"), """^([A-Za-z_]+):\s*(.*)$""", 2).as("v")
      )
  }

  /** OBO `[Term]` stanzas → the reference's three parquet tables
    * (reference: convert_ontologies.py:254 `export_parquet_obo`):
    *
    *  - terms(id, label, definition, synonyms, namespace, obsolete)
    *  - hierarchy(parent_id, child_id, relation) — `is_a` edges plus
    *    typed `relationship: rel TARGET` edges
    *  - xrefs(term_id, xref_db, xref_id) — xref split on the first ':'
    *
    * `[Typedef]`/`[Instance]` stanzas and the header preamble are
    * skipped, like the reference's term-only export. Synonyms are
    * sort_array'd: collect order off a shuffle is not deterministic,
    * and the reference's row order (pronto's) is not reproducible
    * either — a canonical order is the only stable contract. */
  def readObo(spark: SparkSession, path: String): (DataFrame, DataFrame, DataFrame) = {
    val kv = oboLines(spark, path).filter(col("stype") === "Term")
    val keyed = kv
      .withColumn("sid",
        max(when(col("k") === "id", col("v"))).over(
          Window.partitionBy("file", "stanza")))
      .filter(col("sid").isNotNull)

    val terms = keyed
      .groupBy(col("file"), col("stanza"), col("sid").as("id"))
      .agg(
        coalesce(max(when(col("k") === "name", col("v"))), lit("")).as("label"),
        coalesce(
          max(when(col("k") === "def",
            NtUnescape(regexp_extract(col("v"), QuotedRe, 1)))),
          lit("")).as("definition"),
        sort_array(collect_list(when(col("k") === "synonym",
          NtUnescape(regexp_extract(col("v"), QuotedRe, 1))))).as("synonyms"),
        coalesce(max(when(col("k") === "namespace", col("v"))), lit("")).as("namespace"),
        coalesce(max(when(col("k") === "is_obsolete", col("v") === "true")),
          lit(false)).as("obsolete")
      )
      .drop("file", "stanza")

    // `is_a: TGT:id ! resolved name` — the comment after '!' is noise.
    val isA = keyed.filter(col("k") === "is_a").select(
      regexp_extract(col("v"), """^(\S+)""", 1).as("parent_id"),
      col("sid").as("child_id"),
      lit("is_a").as("relation")
    )
    val rel = keyed.filter(col("k") === "relationship").select(
      regexp_extract(col("v"), """^\S+\s+(\S+)""", 1).as("parent_id"),
      col("sid").as("child_id"),
      regexp_extract(col("v"), """^(\S+)""", 1).as("relation")
    )
    val hierarchy = isA.unionAll(rel)

    val xrefs = keyed.filter(col("k") === "xref").select(
      col("sid").as("term_id"),
      when(regexp_extract(col("v"), """^(\S+)""", 1).contains(":"),
        split(regexp_extract(col("v"), """^(\S+)""", 1), ":", 2)(0))
        .otherwise(lit("")).as("xref_db"),
      when(regexp_extract(col("v"), """^(\S+)""", 1).contains(":"),
        split(regexp_extract(col("v"), """^(\S+)""", 1), ":", 2)(1))
        .otherwise(regexp_extract(col("v"), """^(\S+)""", 1)).as("xref_id")
    )

    (terms, hierarchy, xrefs)
  }

  /** OBO tables → the engine's (s, p, o) triple frame: hierarchy rows
    * as (child, relation, parent) edges plus term labels — the shape
    * bgpMatch / Sparql.run consume, mirroring the reference's
    * OBO→N-Triples→oxigraph path (convert_ontologies.py:155). */
  def oboTriples(terms: DataFrame, hierarchy: DataFrame): DataFrame =
    hierarchy.select(
      col("child_id").as("s"), col("relation").as("p"), col("parent_id").as("o"))
      .unionAll(terms.select(col("id").as("s"), lit("label").as("p"), col("label").as("o")))

  // ----------------------------------------------------------------- SKOS

  private val Rdf_type = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
  private val Skos = "http://www.w3.org/2004/02/skos/core#"
  private val OwlClass = "http://www.w3.org/2002/07/owl#Class"

  /** SKOS/RDF concept scheme → the same three term tables as readObo
    * (reference: convert_ontologies.py:327 `export_parquet_skos`),
    * over a parsed triple frame (readNTriples output — the reference
    * also normalizes every RDF syntax to triples first):
    *
    *  - concepts: subjects typed skos:Concept or owl:Class
    *  - label: skos:prefLabel preferring @en; definition:
    *    skos:definition over skos:scopeNote, each preferring @en;
    *    synonyms: en-or-untagged skos:altLabel, sorted
    *  - hierarchy: broader/broaderTransitive as (o, s) edges plus
    *    narrower INVERTED ((s, o) parent→child), relation = the SKOS
    *    local name
    *  - xrefs: exactMatch/closeMatch/relatedMatch, xref_db = relation
    *
    * One deliberate difference: where the reference's "else first"
    * label fallback inherits rdflib's nondeterministic iteration
    * order, ties here break lexicographically (min_by on the value) —
    * a distributed pipeline cannot ship an output that changes between
    * runs. Every pick is a partial-aggregating min_by/max_by, so the
    * whole export is scans + one groupBy per table. */
  def skosTerms(triples: DataFrame): (DataFrame, DataFrame, DataFrame) = {
    val concepts = triples
      .filter(
        col("p") === Rdf_type &&
          (col("o") === s"${Skos}Concept" || col("o") === OwlClass)
      )
      .select(col("s").as("id"))
      .distinct()
    // Annotation rows restricted to concept subjects once, up front.
    val ann = triples.join(concepts, triples("s") === concepts("id")).drop("id")

    val langPri = when(col("o_lang") === "en", 0).otherwise(1)
    val terms = concepts
      .join(
        ann
          .filter(col("p").isin(
            s"${Skos}prefLabel", s"${Skos}definition",
            s"${Skos}scopeNote", s"${Skos}altLabel"))
          .groupBy(col("s").as("id"))
          .agg(
            min_by(
              when(col("p") === s"${Skos}prefLabel", col("o")),
              when(col("p") === s"${Skos}prefLabel",
                struct(langPri, col("o")))
            ).as("label"),
            // definition beats scopeNote, en beats other langs, then
            // lexicographic — one 3-level priority struct
            min_by(
              when(col("p").isin(s"${Skos}definition", s"${Skos}scopeNote"), col("o")),
              when(col("p").isin(s"${Skos}definition", s"${Skos}scopeNote"),
                struct(
                  when(col("p") === s"${Skos}definition", 0).otherwise(1),
                  langPri,
                  col("o")))
            ).as("definition"),
            sort_array(collect_list(
              when(col("p") === s"${Skos}altLabel" &&
                (col("o_lang").isNull || col("o_lang") === "en"), col("o"))
            )).as("synonyms")
          ),
        Seq("id"),
        "left"
      )
      .select(
        col("id"),
        coalesce(col("label"), lit("")).as("label"),
        coalesce(col("definition"), lit("")).as("definition"),
        coalesce(col("synonyms"), array().cast("array<string>")).as("synonyms"),
        lit("").as("namespace"),
        lit(false).as("obsolete")
      )

    val broader = ann
      .filter(col("p").isin(s"${Skos}broader", s"${Skos}broaderTransitive"))
      .select(
        col("o").as("parent_id"),
        col("s").as("child_id"),
        substring_index(col("p"), "#", -1).as("relation")
      )
    val narrower = ann
      .filter(col("p") === s"${Skos}narrower")
      .select(
        col("s").as("parent_id"),
        col("o").as("child_id"),
        lit("narrower").as("relation")
      )
    val hierarchy = broader.unionAll(narrower)

    val xrefs = ann
      .filter(col("p").isin(
        s"${Skos}exactMatch", s"${Skos}closeMatch", s"${Skos}relatedMatch"))
      .select(
        col("s").as("term_id"),
        substring_index(col("p"), "#", -1).as("xref_db"),
        col("o").as("xref_id")
      )

    (terms, hierarchy, xrefs)
  }

  /** A constant SKOS N-Triples fixture: en/de labels (en must win),
    * a scopeNote-fallback definition, a no-en-label concept (lexical
    * fallback), owl:Class typing, an inverted narrower edge, an
    * exactMatch xref, and a non-concept subject that must be
    * excluded. */
  private[graft] val SkosFixture: String = {
    val c1 = "<http://ex.org/c1>"
    val c2 = "<http://ex.org/c2>"
    val c3 = "<http://ex.org/c3>"
    val t = s"<$Rdf_type>"
    def sk(n: String) = s"<$Skos$n>"
    Seq(
      s"$c1 $t <${Skos}Concept> .",
      s"""$c1 ${sk("prefLabel")} "Physik"@de .""",
      s"""$c1 ${sk("prefLabel")} "Physics"@en .""",
      s"""$c1 ${sk("definition")} "The study of matter."@en .""",
      s"""$c1 ${sk("altLabel")} "physical sciences"@en .""",
      s"""$c1 ${sk("altLabel")} "Naturlehre"@de .""",
      s"$c2 $t <${Skos}Concept> .",
      s"""$c2 ${sk("prefLabel")} "Optics"@en .""",
      s"""$c2 ${sk("scopeNote")} "About light."@en .""",
      s"""$c2 ${sk("broader")} $c1 .""",
      s"""$c2 ${sk("exactMatch")} <http://other.org/opt> .""",
      s"$c3 $t <http://www.w3.org/2002/07/owl#Class> .",
      s"""$c3 ${sk("prefLabel")} "Chimie"@fr .""",
      s"""$c1 ${sk("narrower")} $c3 .""",
      s"""<http://ex.org/noise> <http://ex.org/p> "not a concept" ."""
    ).mkString("", "\n", "\n")
  }

  // ----------------------------------------------------------------- MeSH

  private val Meshv = "http://id.nlm.nih.gov/mesh/vocab#"
  private val RdfsLabel = "http://www.w3.org/2000/01/rdf-schema#label"

  /** MeSH N-Triples → the same three term tables (reference:
    * convert_ontologies.py:442 `export_parquet_mesh`) — the third of
    * the reference's three export paths (OBO / SKOS / MeSH), with
    * MeSH's vocabulary-specific rules:
    *
    *  - entities: meshv:Descriptor, SCR_Chemical/Disease/Protocol,
    *    Qualifier (namespace "descriptor") plus meshv:Concept
    *    (namespace "concept"); descriptor typing wins when both
    *  - label: rdfs:label preferred over meshv:prefLabel
    *  - definition: meshv:scopeNote over skos:scopeNote
    *  - synonyms: meshv:altLabel, sorted
    *  - obsolete = NOT meshv:active (default active)
    *  - hierarchy: meshv:broaderDescriptor + skos:broader
    *  - xrefs: skos:exactMatch / closeMatch
    *
    * Same determinism note as skosTerms: the reference's "first
    * match" picks inherit rdflib iteration order; ties here break
    * lexicographically via min_by. */
  def meshTerms(triples: DataFrame): (DataFrame, DataFrame, DataFrame) = {
    val descriptorTypes = Seq(
      "Descriptor", "SCR_Chemical", "SCR_Disease", "SCR_Protocol", "Qualifier"
    ).map(Meshv + _)
    val typed = triples
      .filter(col("p") === Rdf_type &&
        (col("o").isin(descriptorTypes: _*) || col("o") === s"${Meshv}Concept"))
      .groupBy(col("s").as("id"))
      .agg(
        max(when(col("o").isin(descriptorTypes: _*), lit(1)).otherwise(lit(0)))
          .as("is_descriptor"))
    val ann = triples.join(typed.select("id"), triples("s") === typed("id")).drop("id")

    val labelPri = when(col("p") === RdfsLabel, 0).otherwise(1)
    val defPri = when(col("p") === s"${Meshv}scopeNote", 0).otherwise(1)
    val terms = typed
      .join(
        ann
          .filter(col("p").isin(
            RdfsLabel, s"${Meshv}prefLabel", s"${Meshv}scopeNote",
            s"${Skos}scopeNote", s"${Meshv}altLabel", s"${Meshv}active"))
          .groupBy(col("s").as("id"))
          .agg(
            min_by(
              when(col("p").isin(RdfsLabel, s"${Meshv}prefLabel"), col("o")),
              when(col("p").isin(RdfsLabel, s"${Meshv}prefLabel"),
                struct(labelPri, col("o")))
            ).as("label"),
            min_by(
              when(col("p").isin(s"${Meshv}scopeNote", s"${Skos}scopeNote"), col("o")),
              when(col("p").isin(s"${Meshv}scopeNote", s"${Skos}scopeNote"),
                struct(defPri, col("o")))
            ).as("definition"),
            sort_array(collect_list(
              when(col("p") === s"${Meshv}altLabel", col("o")))).as("synonyms"),
            // active defaults true; any explicit false flips obsolete
            min(when(col("p") === s"${Meshv}active",
              lower(col("o")).isin("true", "1"))).as("active")
          ),
        Seq("id"),
        "left"
      )
      .select(
        col("id"),
        coalesce(col("label"), lit("")).as("label"),
        coalesce(col("definition"), lit("")).as("definition"),
        coalesce(col("synonyms"), array().cast("array<string>")).as("synonyms"),
        when(col("is_descriptor") === 1, "descriptor").otherwise("concept")
          .as("namespace"),
        (!coalesce(col("active"), lit(true))).as("obsolete")
      )

    val hierarchy = ann
      .filter(col("p").isin(s"${Meshv}broaderDescriptor", s"${Skos}broader"))
      .select(
        col("o").as("parent_id"),
        col("s").as("child_id"),
        substring_index(col("p"), "#", -1).as("relation")
      )
    val xrefs = ann
      .filter(col("p").isin(s"${Skos}exactMatch", s"${Skos}closeMatch"))
      .select(
        col("s").as("term_id"),
        substring_index(col("p"), "#", -1).as("xref_db"),
        col("o").as("xref_id")
      )
    (terms, hierarchy, xrefs)
  }

  /** Flat one-row-per-concept report over the skosTerms tables
    * (synonyms pipe-joined, hierarchy/xref degree counts — no array
    * cells for the driver hasher). */
  private def skosReport(triples: DataFrame): DataFrame = {
    val (terms, hierarchy, xrefs) = skosTerms(triples)
    val parents = hierarchy
      .groupBy(col("child_id").as("id"))
      .agg(count(lit(1)).as("n_parents"))
    val nx = xrefs
      .groupBy(col("term_id").as("id"))
      .agg(count(lit(1)).as("n_xrefs"))
    terms
      .join(parents, Seq("id"), "left")
      .join(nx, Seq("id"), "left")
      .select(
        col("id"),
        col("label"),
        col("definition"),
        array_join(col("synonyms"), "|").as("synonyms"),
        coalesce(col("n_parents"), lit(0L)).as("n_parents"),
        coalesce(col("n_xrefs"), lit(0L)).as("n_xrefs")
      )
      .orderBy("id")
  }

  /** ing05: SKOS ingestion end to end — fixture N-Triples → triple
    * frame → term tables, reported flat. Oracle = the expected export
    * written out as VALUES. */
  def ing05SkosTerms(lake: Lake): DataFrame = {
    val spark = lake.spark
    val dir = fixtureDir.resolve("ing05")
    java.nio.file.Files.createDirectories(dir)
    java.nio.file.Files.write(
      dir.resolve("fixture.nt"),
      SkosFixture.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    skosReport(readNTriples(spark, dir.toString))
  }

  /** The SAME concept scheme as SkosFixture, written in Turtle with
    * every supported abbreviation: @prefix, `a`, `;` predicate lists,
    * `,` object lists, prefixed names, lang tags. */
  private[graft] val TurtleFixture: String =
    """@prefix skos: <http://www.w3.org/2004/02/skos/core#> .
      |@prefix owl:  <http://www.w3.org/2002/07/owl#> .
      |@prefix ex:   <http://ex.org/> .
      |
      |# concept with multilingual labels and two synonyms
      |ex:c1 a skos:Concept ;
      |  skos:prefLabel "Physik"@de, "Physics"@en ;
      |  skos:definition "The study of matter."@en ;
      |  skos:altLabel "physical sciences"@en, "Naturlehre"@de ;
      |  skos:narrower ex:c3 .
      |
      |ex:c2 a skos:Concept ;
      |  skos:prefLabel "Optics"@en ;
      |  skos:scopeNote "About light."@en ;
      |  skos:broader ex:c1 ;
      |  skos:exactMatch <http://other.org/opt> .
      |
      |ex:c3 a owl:Class ;
      |  skos:prefLabel "Chimie"@fr .
      |
      |ex:noise <http://ex.org/p> "not a concept" .
      |""".stripMargin

  /** ing06: the identical concept scheme ingested from TURTLE — same
    * VALUES oracle as ing05, so the two formats are proven to produce
    * the same export through the same downstream machinery. */
  def ing06TurtleSkos(lake: Lake): DataFrame = {
    val spark = lake.spark
    val dir = fixtureDir.resolve("ing06")
    java.nio.file.Files.createDirectories(dir)
    java.nio.file.Files.write(
      dir.resolve("fixture.ttl"),
      TurtleFixture.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    skosReport(Turtle.readTurtle(spark, dir.toString))
  }

  /** The SAME concept scheme again, written in RDF/XML — the
    * reference's fourth syntax (convert_ontologies.py:343 maps "rdf"/
    * "owl" to rdflib's format="xml"). Exercises typed node elements
    * (skos:Concept ⇒ rdf:type), rdf:Description with an explicit
    * rdf:type property element, rdf:resource objects, xml:lang
    * (including inheritance from the node element), text literals,
    * and XML comments. */
  private[graft] val RdfXmlFixture: String =
    """<?xml version="1.0" encoding="UTF-8"?>
      |<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
      |         xmlns:skos="http://www.w3.org/2004/02/skos/core#"
      |         xmlns:ex="http://ex.org/">
      |  <!-- concept with multilingual labels and two synonyms -->
      |  <skos:Concept rdf:about="http://ex.org/c1">
      |    <skos:prefLabel xml:lang="de">Physik</skos:prefLabel>
      |    <skos:prefLabel xml:lang="en">Physics</skos:prefLabel>
      |    <skos:definition xml:lang="en">The study of matter.</skos:definition>
      |    <skos:altLabel xml:lang="en">physical sciences</skos:altLabel>
      |    <skos:altLabel xml:lang="de">Naturlehre</skos:altLabel>
      |    <skos:narrower rdf:resource="http://ex.org/c3"/>
      |  </skos:Concept>
      |  <skos:Concept rdf:about="http://ex.org/c2">
      |    <skos:prefLabel xml:lang="en">Optics</skos:prefLabel>
      |    <skos:scopeNote xml:lang="en">About light.</skos:scopeNote>
      |    <skos:broader rdf:resource="http://ex.org/c1"/>
      |    <skos:exactMatch rdf:resource="http://other.org/opt"/>
      |  </skos:Concept>
      |  <!-- untyped description + explicit rdf:type; xml:lang on the
      |       node element inherits down to the label -->
      |  <rdf:Description rdf:about="http://ex.org/c3" xml:lang="fr">
      |    <rdf:type rdf:resource="http://www.w3.org/2002/07/owl#Class"/>
      |    <skos:prefLabel>Chimie</skos:prefLabel>
      |  </rdf:Description>
      |  <rdf:Description rdf:about="http://ex.org/noise">
      |    <ex:p>not a concept</ex:p>
      |  </rdf:Description>
      |</rdf:RDF>
      |""".stripMargin

  /** ing08: the identical concept scheme ingested from RDF/XML — the
    * shared ing05/ing06 VALUES oracle now pins THREE syntaxes
    * (N-Triples, Turtle, RDF/XML) to the same export through the same
    * downstream machinery, which with ing04's OBO path covers all
    * four formats the reference converts. */
  def ing08RdfXmlSkos(lake: Lake): DataFrame = {
    val spark = lake.spark
    val dir = fixtureDir.resolve("ing08")
    java.nio.file.Files.createDirectories(dir)
    java.nio.file.Files.write(
      dir.resolve("fixture.rdf"),
      RdfXmlFixture.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    skosReport(RdfXml.readRdfXml(spark, dir.toString))
  }

  /** MeSH fixture: descriptor with rdfs:label + meshv annotations, an
    * inactive descriptor falling back to meshv:prefLabel with a
    * broaderDescriptor edge and an exactMatch, a meshv:Concept with a
    * skos:scopeNote/broader fallback path, and a non-entity subject
    * to be excluded. */
  private[graft] val MeshFixture: String = {
    val d1 = "<http://id.nlm.nih.gov/mesh/D000001>"
    val d2 = "<http://id.nlm.nih.gov/mesh/D000002>"
    val c1 = "<http://id.nlm.nih.gov/mesh/M0000001>"
    val t = s"<$Rdf_type>"
    def mv(n: String) = s"<$Meshv$n>"
    def sk(n: String) = s"<$Skos$n>"
    Seq(
      s"$d1 $t ${mv("Descriptor")} .",
      s"""$d1 <$RdfsLabel> "Anatomy"@en .""",
      s"""$d1 ${mv("scopeNote")} "Structure of organisms." .""",
      s"""$d1 ${mv("altLabel")} "Body structure" .""",
      s"$d2 $t ${mv("Descriptor")} .",
      s"""$d2 ${mv("prefLabel")} "Histology" .""",
      s"$d2 ${mv("broaderDescriptor")} $d1 .",
      s"""$d2 ${mv("active")} "false" .""",
      s"$d2 ${sk("exactMatch")} <http://other.org/hist> .",
      s"$c1 $t ${mv("Concept")} .",
      s"""$c1 <$RdfsLabel> "Anatomy Concept" .""",
      s"""$c1 ${sk("scopeNote")} "Concept note." .""",
      s"$c1 ${sk("broader")} $d1 .",
      s"""<http://ex.org/noise> <http://ex.org/p> "x" ."""
    ).mkString("", "\n", "\n")
  }

  /** ing07: MeSH ingestion end to end — the reference's third export
    * path. Flat per-entity report including MeSH's namespace and
    * obsolete (NOT active) columns; oracle = expected VALUES. */
  def ing07MeshTerms(lake: Lake): DataFrame = {
    val spark = lake.spark
    val dir = fixtureDir.resolve("ing07")
    java.nio.file.Files.createDirectories(dir)
    java.nio.file.Files.write(
      dir.resolve("fixture.nt"),
      MeshFixture.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val (terms, hierarchy, xrefs) = meshTerms(readNTriples(spark, dir.toString))
    val parents = hierarchy
      .groupBy(col("child_id").as("id"))
      .agg(count(lit(1)).as("n_parents"))
    val nx = xrefs
      .groupBy(col("term_id").as("id"))
      .agg(count(lit(1)).as("n_xrefs"))
    terms
      .join(parents, Seq("id"), "left")
      .join(nx, Seq("id"), "left")
      .select(
        col("id"),
        col("label"),
        col("definition"),
        array_join(col("synonyms"), "|").as("synonyms"),
        col("namespace"),
        col("obsolete"),
        coalesce(col("n_parents"), lit(0L)).as("n_parents"),
        coalesce(col("n_xrefs"), lit(0L)).as("n_xrefs")
      )
      .orderBy("id")
  }

  /** Format-sniffing ontology reader — the analog of the reference's
    * RDF_FORMATS dispatch (convert_ontologies.py:343 `fmt_map = {"nt":
    * "nt", "ttl": "turtle", "rdf": "xml", "owl": "xml"}` plus the
    * pronto OBO path at :254): route a file to its parser by
    * extension, every format landing in the SAME triple frame so
    * bgpMatch / the SPARQL text front-end / skosTerms run over any of
    * them unchanged. OBO's term/hierarchy tables lift through
    * oboTriples (labels are the literal rows, like the lake store's).
    * Unknown extensions reject by name rather than misparse. */
  def readOntology(spark: SparkSession, path: String): DataFrame = {
    val ext = path.substring(path.lastIndexOf('.') + 1).toLowerCase(java.util.Locale.ROOT)
    ext match {
      case "nt"                  => readNTriples(spark, path)
      case "ttl"                 => Turtle.readTurtle(spark, path)
      case "rdf" | "owl" | "xml" => RdfXml.readRdfXml(spark, path)
      case "obo" =>
        val (terms, hierarchy, _) = readObo(spark, path)
        oboTriples(terms, hierarchy)
          .withColumn("o_lang", lit(null).cast("string"))
          .withColumn("o_datatype", lit(null).cast("string"))
          .withColumn("is_literal", col("p") === "label")
      case other =>
        throw new IllegalArgumentException(
          s"unsupported ontology format '.$other' (expected .nt/.ttl/.rdf/.owl/.xml/.obo)")
    }
  }

  /** Load several ontology files into ONE named-graph QUAD store —
    * the reference's dataset model: each of its 13 ontologies lands in
    * its own named graph and queries address them with GRAPH clauses
    * (convert_ontologies.py populates the store, sparql_query.py:52,
    * :60 wraps queries per graph). Graph name = the file's last path
    * segment; format per file is sniffed from the extension exactly as
    * in readOntology. The result feeds the SPARQL front-end's dataset
    * surface (FROM / GRAPH) unchanged — and on a real deployment the
    * per-file tag is the partition column, so a ground GRAPH clause is
    * partition pruning. */
  def readOntologies(spark: SparkSession, paths: Seq[String]): DataFrame = {
    require(paths.nonEmpty, "readOntologies needs at least one file")
    paths
      .map { p =>
        val name = p.substring(p.lastIndexOf('/') + 1)
        readOntology(spark, p)
          .select(col("s"), col("p"), col("o"), col("is_literal"))
          .withColumn("g", lit(name))
      }
      .reduce(_.unionByName(_))
  }

  // ------------------------------------------------------- query entries

  /** Per-process fixture dir (same rationale as Lake.warehouseBase). */
  private lazy val fixtureDir: java.nio.file.Path =
    java.nio.file.Files.createTempDirectory("graft-rdf-")

  /** ing03: N-Triples ROUND-TRIP over the lake's own triple store —
    * serialize the full star-schema triple frame to N-Triples text,
    * write it, parse it back with the distributed reader, and return
    * the parsed triples. The oracle rebuilds the same triple set in
    * SQL, so any serializer or parser defect (bracket stripping,
    * literal flagging, escaping) changes rows. */
  def ing03Ntriples(lake: Lake): DataFrame = {
    val spark = lake.spark
    val src = graft.operators.Graph.triples(lake)
      .withColumn("is_literal", col("p").isin("label", "flagged"))
    val dir = fixtureDir.resolve("ing03_" + lake.dir.hashCode.toHexString).toString
    toNTriples(src).write.mode("overwrite").text(dir)
    readNTriples(spark, dir)
      .select(col("s"), col("p"), col("o"), col("is_literal"))
      .orderBy("s", "p", "o")
  }

  /** A constant OBO fixture exercising the stanza grammar: multi-level
    * `is_a`, a typed `relationship`, synonyms, an escaped `def`,
    * xrefs, an obsolete term, and a `[Typedef]` stanza that must be
    * skipped. */
  private[graft] val OboFixture: String =
    """format-version: 1.2
      |ontology: graft-test
      |
      |[Term]
      |id: GT:0001
      |name: root concept
      |namespace: test
      |def: "The root \"concept\" of the fixture." [GT:curator]
      |
      |[Term]
      |id: GT:0002
      |name: middle concept
      |namespace: test
      |is_a: GT:0001 ! root concept
      |synonym: "mid concept" EXACT []
      |synonym: "central concept" BROAD []
      |xref: WIKI:Middle_concept
      |
      |[Term]
      |id: GT:0003
      |name: leaf concept
      |namespace: test
      |is_a: GT:0002 ! middle concept
      |relationship: part_of GT:0001 ! root concept
      |xref: DOI:10.1000/182
      |
      |[Term]
      |id: GT:0004
      |name: obsolete concept
      |is_obsolete: true
      |
      |[Typedef]
      |id: part_of
      |name: part of
      |""".stripMargin

  /** ing04: OBO → triples → SPARQL TEXT, end to end — the reference's
    * whole ontology path (ingest at convert_ontologies.py:254, query
    * at sparql_query.py:89) in one dataflow: parse the OBO fixture,
    * lift terms+hierarchy into the triple frame, and answer an
    * ancestor query over `(is_a|part_of)+` through the text front-end.
    * The oracle replays the closure over the same edges in SQL. */
  def ing04OboClosure(lake: Lake): DataFrame = {
    val spark = lake.spark
    val dir = fixtureDir.resolve("ing04")
    val f = dir.resolve("fixture.obo")
    java.nio.file.Files.createDirectories(dir)
    java.nio.file.Files.write(
      f, OboFixture.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val (terms, hierarchy, _) = readObo(spark, f.toString)
    graft.sparql.Sparql.run(
      oboTriples(terms, hierarchy),
      """SELECT ?t ?anc ?l
        |WHERE { ?t (<is_a>|<part_of>)+ ?anc . ?anc <label> ?l }
        |ORDER BY ?t ?anc""".stripMargin,
      // fixture hierarchy is 2 deep; bound 3 leaves one hop of margin
      // (identical rows for any bound >= depth). Measured: trimming
      // 4 -> 3 does NOT move the 2.7-2.8 s wall time — the cost is the
      // wholetext parse + window stanza fold + per-query session
      // floor, not the empty closure stage.
      maxPathHops = 3
    )
  }

  /** ing09: MULTI-ONTOLOGY named-graph ingestion — two fixture files
    * in two different syntaxes (the OBO stanza grammar and the Turtle
    * concept scheme) loaded into one quad store by readOntologies,
    * then inventoried through the SPARQL dataset surface: `GRAPH ?g`
    * binds each triple's source ontology, and the aggregate reports
    * per-graph triple count and lexicographic first subject. This is
    * the reference's day-one shape — 13 ontologies, one named graph
    * each, queried per graph — end to end from raw files to SPARQL
    * text. */
  def ing09GraphStore(lake: Lake): DataFrame = {
    val spark = lake.spark
    val dir = fixtureDir.resolve("ing09")
    java.nio.file.Files.createDirectories(dir)
    val obo = dir.resolve("onto.obo")
    val ttl = dir.resolve("skos.ttl")
    java.nio.file.Files.write(
      obo, OboFixture.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.nio.file.Files.write(
      ttl, TurtleFixture.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val store = readOntologies(spark, Seq(obo.toString, ttl.toString))
    graft.sparql.Sparql.run(
      store,
      """SELECT ?g (COUNT(*) AS ?n_triples) (MIN(?s) AS ?first_subject)
        |WHERE { GRAPH ?g { ?s ?p ?o } }
        |GROUP BY ?g ORDER BY ?g""".stripMargin
    )
  }
}
