package graft

import graft.sparql.Sparql
import graft.sparql.Sparql.SparqlParseError
import org.scalatest.funsuite.AnyFunSuite

class SparqlSpec extends AnyFunSuite {

  // -------------------------------------------------------- parse-only

  test("parses PREFIX declarations and expands prefixed names") {
    val p = Sparql.parse(
      """PREFIX n: <nat:>
        |PREFIX pr: <in_>
        |SELECT ?c WHERE { ?c pr:nation n:4 }""".stripMargin)
    assert(p.patterns == Seq(("?c", "in_nation", "nat:4")))
    assert(p.selectVars == Seq("c"))
  }

  test("parses <iri> terms, string-literal objects, and triple terminators") {
    val p = Sparql.parse(
      """SELECT ?r WHERE { ?r <label> "ASIA" . ?x <in_region> ?r . }""")
    assert(p.patterns == Seq(("?r", "label", "ASIA"), ("?x", "in_region", "?r")))
  }

  test("parses OPTIONAL as a left-joined pattern index") {
    val p = Sparql.parse(
      """SELECT ?n ?fl WHERE {
        |  ?n <in_region> ?r .
        |  OPTIONAL { ?n <flagged> ?fl }
        |}""".stripMargin)
    assert(p.patterns.length == 2)
    assert(p.optionalIdx == Set(1))
  }

  test("parses property paths: <p>+ and (p1|p2)+ with prefixed alternatives") {
    val p1 = Sparql.parse("SELECT ?a WHERE { ?x <in_nation>+ ?a }")
    assert(p1.patterns == Seq(("?x", "in_nation+", "?a")))
    val p2 = Sparql.parse(
      "PREFIX p: <in_> SELECT ?a WHERE { ?x (p:nation|p:region)+ ?a }")
    assert(p2.patterns == Seq(("?x", "(in_nation|in_region)+", "?a")))
  }

  test("translates FILTER bodies to Spark SQL (vars, literals, &&/||/!, builtins)") {
    assert(Sparql.translateFilter("""?l != "ASIA"""") == "l != 'ASIA'")
    assert(
      Sparql.translateFilter("""?a = "x" && ?b != "y"""") ==
        "a = 'x'  AND  b != 'y'")
    assert(Sparql.translateFilter("""BOUND(?fl)""") == "(fl IS NOT NULL)")
    assert(Sparql.translateFilter("""!BOUND(?fl)""") == " NOT (fl IS NOT NULL)")
    assert(
      Sparql.translateFilter("""REGEX(?l, "^A")""") == "regexp_like(l, '^A')")
    assert(
      Sparql.translateFilter("""STRSTARTS(?l, "A") || CONTAINS(?l, "!")""") ==
        "startswith(l, 'A')  OR  contains(l, '!')")
    // '!' and '&&' INSIDE a literal are data, not operators.
    assert(Sparql.translateFilter("""?l != "a!b&&c"""") == "l != 'a!b&&c'")
  }

  test("common prefixes inject only when the query declares none") {
    val p = Sparql.parse(
      "SELECT ?t ?l WHERE { ?t skos:prefLabel ?l }")
    assert(p.patterns ==
      Seq(("?t", "http://www.w3.org/2004/02/skos/core#prefLabel", "?l")),
      "skos: must resolve from the injected common set")
    // An explicit PREFIX switches injection off — skos: is then unknown.
    val e = intercept[SparqlParseError](Sparql.parse(
      "PREFIX my: <urn:my:> SELECT ?t WHERE { ?t skos:prefLabel ?l }"))
    assert(e.getMessage.contains("unknown prefix"))
  }

  test("variable predicates bind like any other term (the reference's first example)") {
    val p = Sparql.parse("SELECT ?s ?p ?o WHERE { ?s ?p ?o } LIMIT 10")
    assert(p.patterns == Seq(("?s", "?p", "?o")))
    assert(p.limit == Some(10))
  }

  test("parses aggregates: (COUNT(DISTINCT ?v) AS ?alias) + GROUP BY") {
    val p = Sparql.parse(
      """SELECT ?nl (COUNT(DISTINCT ?c) AS ?n) WHERE { ?c <in_nation> ?nl }
        |GROUP BY ?nl ORDER BY ?nl""".stripMargin)
    assert(p.aggregates == Seq(Sparql.Aggregate("COUNT", isDistinct = true, Some("c"), "n")))
    assert(p.groupBy == Seq("nl"))
    assert(p.projection == Seq("nl", "n"))
    val global = Sparql.parse("SELECT (COUNT(*) AS ?total) WHERE { ?s ?p ?o }")
    assert(global.aggregates == Seq(Sparql.Aggregate("COUNT", isDistinct = false, None, "total")))
    assert(global.groupBy.isEmpty)
  }

  test("aggregate misuse rejects by name") {
    def rejects(q: String, frag: String): Unit = {
      val e = intercept[SparqlParseError](Sparql.parse(q))
      assert(e.getMessage.contains(frag), e.getMessage)
    }
    rejects("SELECT (MEDIAN(?v) AS ?s) WHERE { ?a <p> ?v }", "MEDIAN is not supported")
    rejects("SELECT (COUNT(?v)) WHERE { ?a <p> ?v }", "AS ?alias")
    rejects("SELECT ?a (COUNT(?v) AS ?n) WHERE { ?a <p> ?v }", "must appear in GROUP BY")
    rejects("SELECT ?a WHERE { ?a <p> ?v } GROUP BY ?a", "without an aggregate")
    rejects("SELECT (MIN(*) AS ?m) WHERE { ?a <p> ?v }", "not valid SPARQL")
  }

  test("aggregate execution: grouped count-distinct and a global count") {
    val spark = TestSpark.spark
    import spark.implicits._
    val triples = Seq(
      ("c1", "in", "n1"), ("c2", "in", "n1"), ("c2", "in", "n1"),
      ("c3", "in", "n2")
    ).toDF("s", "p", "o")
    val grouped = Sparql.run(
      triples,
      "SELECT ?n (COUNT(DISTINCT ?c) AS ?k) WHERE { ?c <in> ?n } GROUP BY ?n ORDER BY ?n"
    ).collect().map(r => (r.getString(0), r.getLong(1)))
    assert(grouped.toSeq == Seq(("n1", 2L), ("n2", 1L)))
    val total = Sparql.run(
      triples, "SELECT (COUNT(*) AS ?t) WHERE { ?c <in> ?n }"
    ).collect().head.getLong(0)
    assert(total == 4L)
  }

  test("parses SELECT DISTINCT; REDUCED no-ops") {
    assert(Sparql.parse("SELECT DISTINCT ?r WHERE { ?n <in_region> ?r }").distinct)
    assert(!Sparql.parse("SELECT REDUCED ?r WHERE { ?n <in_region> ?r }").distinct)
    assert(!Sparql.parse("SELECT ?r WHERE { ?n <in_region> ?r }").distinct)
  }

  test("parses ORDER BY and LIMIT; '#' comments are stripped") {
    val p = Sparql.parse(
      """SELECT ?n ?r WHERE {   # bindings
        |  ?n <in_region> ?r    # one pattern
        |} ORDER BY ?r ?n LIMIT 7""".stripMargin)
    assert(p.orderBy == Seq(("r", false), ("n", false)))
    assert(p.limit == Some(7))
    val d = Sparql.parse(
      "SELECT ?n ?r WHERE { ?n <in_region> ?r } ORDER BY DESC(?r) ASC(?n)")
    assert(d.orderBy == Seq(("r", true), ("n", false)))
    // OFFSET pairs with LIMIT in either order
    val o1 = Sparql.parse(
      "SELECT ?n WHERE { ?n <in_region> ?r } ORDER BY ?n LIMIT 7 OFFSET 3")
    assert(o1.limit == Some(7) && o1.offset == Some(3))
    val o2 = Sparql.parse(
      "SELECT ?n WHERE { ?n <in_region> ?r } ORDER BY ?n OFFSET 3 LIMIT 7")
    assert(o2.limit == Some(7) && o2.offset == Some(3))
    val e = intercept[SparqlParseError](Sparql.parse(
      "SELECT ?n WHERE { ?n <in_region> ?r } OFFSET x"))
    assert(e.getMessage.contains("OFFSET expects an integer"))
  }

  test("rejects unsupported syntax with a named construct") {
    def rejects(q: String, fragment: String): Unit = {
      val e = intercept[SparqlParseError](Sparql.parse(q))
      assert(e.getMessage.contains(fragment), s"message was: ${e.getMessage}")
    }
    rejects("LOAD <urn:x>", "only SELECT, ASK, CONSTRUCT, and DESCRIBE")
    rejects("SELECT ?s WHERE { ?s <p> ?o UNION { ?s <q> ?o } }", "braced group")
    rejects("SELECT ?s WHERE { { ?s <p> ?o } UNION { ?s <q> ?o } ?x <r> ?y }",
      "closing WHERE")
    rejects("SELECT ?s WHERE { { ?s <p> ?o } UNION { ?s <q> ?o } MINUS { ?s <r> ?o } }",
      "don't mix")
    rejects("SELECT ?s WHERE { { ?s <p> ?o } MINUS { ?s <q> ?o } MINUS { ?s <r> ?o } }",
      "only one MINUS")
    // nested OPTIONAL is supported now, but a group whose body STARTS
    // with a nested OPTIONAL (including the only-nested case) is the
    // position-sensitive LeftJoin ordering the plan can't express
    rejects(
      "SELECT ?s WHERE { ?s <p> ?o . OPTIONAL { OPTIONAL { ?s <q> ?a } } }",
      "OPTIONAL precedes")
    rejects("SELECT ?s WHERE { ?s <p> ?o . OPTIONAL { } }",
      "no required triple patterns")
    rejects("SELECT ?s WHERE { ?s (<p>|<q>) ?o }", "bare alternation")
    rejects("SELECT ?s WHERE { ?s (<p>/<q>)+ ?o }",
      "sequence paths inside a closure group")
    rejects("SELECT ?s WHERE { ?s ?p+ ?o }", "paths over a ?variable")
    rejects("SELECT ?s WHERE { ?s unknown:p ?o }", "unknown prefix")
    rejects("SELECT ?s WHERE { ?s <p> ?o } ORDER BY name", "at least one ?var")
    rejects("SELECT ?s WHERE { ?s <p> ?o } ORDER BY DESC(name)", "expects a ?var")
    rejects("SELECT ?s WHERE { }", "no triple patterns")
    rejects("SELECT ?s WHERE { ?s <p> ?o } LIMIT x", "integer")
    rejects("SELECT ?s WHERE { ?s <p> ?o } GARBAGE", "trailing")
  }

  test("desugars sequence and inverse paths; supports the 'a' keyword") {
    // seg1/seg2/seg3 => chained patterns through fresh internal vars
    val p = Sparql.parse(
      "SELECT ?c ?l WHERE { ?c <in_nation>/<in_region>/<label> ?l }")
    assert(p.patterns.length == 3)
    assert(p.patterns.head._1 == "?c" && p.patterns.last._3 == "?l")
    assert(p.patterns(0)._3 == p.patterns(1)._1) // hop 1 chains
    assert(p.patterns(1)._3 == p.patterns(2)._1) // hop 2 chains
    assert(p.internalVars.length == 2)
    assert(p.internalVars.forall(_.startsWith("__path")))
    // ^p swaps endpoints; ^p+ inverts the closure segment
    val inv = Sparql.parse("SELECT ?n WHERE { ?n ^<in_nation> ?c }")
    assert(inv.patterns == Seq(("?c", "in_nation", "?n")))
    val invPlus = Sparql.parse("SELECT ?n WHERE { ?n ^<broader>+ ?c }")
    assert(invPlus.patterns == Seq(("?c", "broader+", "?n")))
    // sequence composes with closures and alternation segments
    val mix = Sparql.parse(
      "PREFIX s: <skos:> SELECT ?l WHERE { ?x (s:broader|s:narrower)+/s:prefLabel ?l }")
    assert(mix.patterns.length == 2)
    assert(mix.patterns(0)._2 == "(skos:broader|skos:narrower)+")
    assert(mix.patterns(1)._2 == "skos:prefLabel")
    // 'a' is rdf:type in the predicate position
    val a = Sparql.parse("SELECT ?x WHERE { ?x a <skos:Concept> }")
    assert(a.patterns ==
      Seq(("?x", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type", "skos:Concept")))
    // * and ? parse as path modifiers (lone tokens, never a ?var)
    assert(Sparql.parse("SELECT ?x WHERE { ?x <p>* ?y }").patterns ==
      Seq(("?x", "p*", "?y")))
    assert(Sparql.parse("SELECT ?x WHERE { ?x <p> ? ?y }").patterns ==
      Seq(("?x", "p?", "?y")))
    assert(Sparql.parse("SELECT ?x WHERE { ?x (<p>|<q>)* ?y }").patterns ==
      Seq(("?x", "(p|q)*", "?y")))
    // a sequence path inside OPTIONAL desugars into a multi-triple
    // optional group (left-joined as a unit)
    val seqOpt = Sparql.parse(
      "SELECT ?x WHERE { ?x <p> ?y . OPTIONAL { ?x <q>/<r> ?z } }")
    assert(seqOpt.optionalGroups.length == 1)
    assert(seqOpt.optionalGroups.head.patterns.length == 2)
  }

  test("nested OPTIONAL executes as the recursive leftjoin") {
    val spark = TestSpark.spark
    import spark.implicits._
    // base: three subjects; p1 binds for a,b; inside it p2 binds for a
    val t = Seq(
      ("a", "base", "1"),
      ("b", "base", "1"),
      ("c", "base", "1"),
      ("a", "p1", "A1"),
      ("a", "px", "AX"),
      ("b", "p1", "B1"),
      ("b", "px", "BX"),
      ("a", "p2", "A2")
    ).toDF("s", "p", "o")
    val out = Sparql.run(t,
      """SELECT ?s ?v ?w WHERE { ?s <base> "1" .
        |  OPTIONAL { ?s <p1> ?v . ?s <px> ?x . OPTIONAL { ?s <p2> ?w } } }
        |""".stripMargin)
      .collect()
      .map(r => (r.getString(0), Option(r.getString(1)), Option(r.getString(2))))
      .sortBy(_._1)
    // a: both levels bind; b: outer binds, inner misses (null w);
    // c: outer misses entirely (null v AND null w — both-or-nothing)
    assert(out.toSeq == Seq(
      ("a", Some("A1"), Some("A2")),
      ("b", Some("B1"), None),
      ("c", None, None)
    ), out.toSeq.toString)
    // the leftjoin NESTS: inner bindings may only ride on outer
    // matches, never rescue an outer miss
    val deep = Sparql.run(t,
      """SELECT ?s ?v ?w WHERE { ?s <base> "1" .
        |  OPTIONAL { ?s <p1> ?v . OPTIONAL { ?s <p2> ?w . ?s <px> ?x } } }
        |""".stripMargin)
      .collect()
      .map(r => (r.getString(0), Option(r.getString(1)), Option(r.getString(2))))
      .sortBy(_._1)
    assert(deep.toSeq == Seq(
      ("a", Some("A1"), Some("A2")),
      ("b", Some("B1"), None),
      ("c", None, None)
    ), deep.toSeq.toString)
  }

  test("VALUES with UNDEF: unbound cells constrain nothing, mapping compatibility holds") {
    val spark = TestSpark.spark
    import spark.implicits._
    val t = Seq(
      ("a", "p", "x"),
      ("b", "p", "y"),
      ("c", "p", "z")
    ).toDF("s", "p", "o")
    // row 1 pins (?s=a, ?o=x); row 2 pins only ?o=y (any ?s);
    // row 3 pins only ?s=c (any ?o)
    val out = Sparql.run(t,
      """SELECT ?s ?o WHERE { ?s <p> ?o .
        |  VALUES (?s ?o) { (<a> "x") (UNDEF "y") (<c> UNDEF) } }""".stripMargin)
      .collect().map(r => (r.getString(0), r.getString(1))).sorted
    assert(out.toSeq == Seq(("a", "x"), ("b", "y"), ("c", "z")))
    // an all-UNDEF row keeps every solution (no constraint at all)
    val all = Sparql.run(t,
      "SELECT ?s WHERE { ?s <p> ?o . VALUES ?o { UNDEF } }")
    assert(all.count() == 3)
  }

  test("zero-or-more and zero-or-one path execution") {
    val spark = TestSpark.spark
    import spark.implicits._
    // chain a -in-> b -in-> c, with one labeled node
    val t = Seq(
      ("a", "in", "b"),
      ("b", "in", "c"),
      ("b", "label", "B")
    ).toDF("s", "p", "o")

    // ground start: zero-length self + descendants
    val star = Sparql.run(t, "SELECT ?o WHERE { <a> <in>* ?o } ORDER BY ?o")
      .collect().map(_.getString(0))
    assert(star.toSeq == Seq("a", "b", "c"))

    // zero-or-one: self + one hop only
    val opt = Sparql.run(t, "SELECT ?o WHERE { <a> <in>? ?o } ORDER BY ?o")
      .collect().map(_.getString(0))
    assert(opt.toSeq == Seq("a", "b"))

    // ground OBJECT: itself + everything that reaches it
    val into = Sparql.run(t, "SELECT ?s WHERE { ?s <in>* <c> } ORDER BY ?s")
      .collect().map(_.getString(0))
    assert(into.toSeq == Seq("a", "b", "c"))

    // two variables: nodes {a,b,c,B} self-pair + closure (a,b),(a,c),(b,c)
    assert(Sparql.run(t, "SELECT ?s ?o WHERE { ?s <in>* ?o }").count() == 7)

    // composes in a sequence path: reach* then label
    val seq = Sparql.run(t,
      "SELECT ?s ?l WHERE { ?s <in>*/<label> ?l } ORDER BY ?s")
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(seq.toSeq == Seq(("a", "B"), ("b", "B")))
  }

  test("parses UNION branches; a single braced group degrades to plain") {
    val p = Sparql.parse(
      """SELECT ?x WHERE {
        |  { ?x <p> ?a . OPTIONAL { ?x <q> ?b } }
        |  UNION
        |  { ?x <r> ?c }
        |  UNION
        |  { ?x <s> ?d }
        |}""".stripMargin)
    assert(p.patterns == Seq(("?x", "p", "?a"), ("?x", "q", "?b")))
    assert(p.optionalIdx == Set(1))
    assert(p.moreBranches == Seq(
      (Seq(("?x", "r", "?c")), Set.empty[Int]),
      (Seq(("?x", "s", "?d")), Set.empty[Int])))
    // one braced group == the same group unbraced
    val single = Sparql.parse("SELECT ?x WHERE { { ?x <p> ?a } }")
    assert(single.patterns == Seq(("?x", "p", "?a")))
    assert(single.moreBranches.isEmpty)
  }

  test("parses ASK queries; rejects solution modifiers on them") {
    val p = Sparql.parse("ASK { ?n <flagged> \"true\" }") // WHERE optional
    assert(p.isAsk && p.selectVars.isEmpty && p.patterns.length == 1)
    val pw = Sparql.parse("ASK WHERE { ?n <flagged> ?f . FILTER(?f = \"true\") }")
    assert(pw.isAsk && pw.filterSql.isDefined)
    val e = intercept[SparqlParseError](
      Sparql.parse("ASK { ?n <p> ?o } LIMIT 5"))
    assert(e.getMessage.contains("ASK takes no LIMIT"))
  }

  test("parses CONSTRUCT templates; rejects paths and modifiers in them") {
    val p = Sparql.parse(
      """CONSTRUCT { ?c <in_region> ?r . ?r <has_member> ?c }
        |WHERE { ?c <in_nation> ?n . ?n <in_region> ?r }""".stripMargin)
    assert(p.isConstruct && !p.isAsk)
    assert(p.template ==
      Seq(("?c", "in_region", "?r"), ("?r", "has_member", "?c")))
    assert(p.patterns.length == 2 && p.selectVars.isEmpty)
    // ground terms and `a` resolve in templates like in patterns
    val g = Sparql.parse(
      """PREFIX x: <ex:>
        |CONSTRUCT { ?s a x:Thing } WHERE { ?s x:p ?o }""".stripMargin)
    assert(g.template == Seq(
      ("?s", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type", "ex:Thing")))
    def rejects(q: String, fragment: String): Unit = {
      val e = intercept[SparqlParseError](Sparql.parse(q))
      assert(e.getMessage.contains(fragment), s"message was: ${e.getMessage}")
    }
    rejects("CONSTRUCT { ?s <p>+ ?o } WHERE { ?s <p> ?o }",
      "not allowed in a CONSTRUCT template")
    rejects("CONSTRUCT { ?s <p> ?o } WHERE { ?s <p> ?o } ORDER BY ?s",
      "CONSTRUCT takes no ORDER")
    rejects("CONSTRUCT { } WHERE { ?s <p> ?o }", "no triples")
    rejects("CONSTRUCT { ?s <p> ?o } { ?s <p> ?o }", "expected WHERE")
  }

  test("CONSTRUCT execution: set semantics, unbound OPTIONAL vars emit nothing") {
    val spark = TestSpark.spark
    import spark.implicits._
    val triples = Seq(
      ("cust:1", "in_nation", "nat:1"),
      ("cust:2", "in_nation", "nat:1"),
      ("nat:1", "in_region", "reg:1"),
      ("nat:1", "flagged", "true")
    ).toDF("s", "p", "o")
    // both customers map to reg:1 — the nat-level edge emits ONCE (set)
    val out = Sparql.run(
      triples,
      """CONSTRUCT { ?c <in_region> ?r . ?n <region_of> ?r }
        |WHERE { ?c <in_nation> ?n . ?n <in_region> ?r }""".stripMargin)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(out.toSet == Set(
      ("cust:1", "in_region", "reg:1"),
      ("cust:2", "in_region", "reg:1"),
      ("nat:1", "region_of", "reg:1")))
    assert(out.length == 3, "duplicate triples survived the set dedup")
    // an OPTIONAL-unbound template var drops just those instantiations
    val opt = Sparql.run(
      triples,
      """CONSTRUCT { ?c <flag_of> ?f }
        |WHERE { ?c <in_nation> ?n . OPTIONAL { ?c <flagged> ?f } }""".stripMargin)
      .collect()
    assert(opt.isEmpty, "unbound template var must emit no triple")
    // a template var never bound anywhere is a contract error
    val e = intercept[SparqlParseError](Sparql.run(
      triples, "CONSTRUCT { ?c <p> ?zzz } WHERE { ?c <in_nation> ?n }"))
    assert(e.getMessage.contains("?zzz"))
  }

  test("parses DESCRIBE with ground IRIs; rejects vars, WHERE, FILTER") {
    val p = Sparql.parse("PREFIX n: <nat:> DESCRIBE n:4 <reg:1>")
    assert(p.describeIris == Seq("nat:4", "reg:1"))
    assert(p.selectVars.isEmpty && p.patterns.isEmpty)
    def rejects(q: String, fragment: String): Unit = {
      val e = intercept[SparqlParseError](Sparql.parse(q))
      assert(e.getMessage.contains(fragment), s"message was: ${e.getMessage}")
    }
    rejects("DESCRIBE ?x", "ground IRIs only")
    rejects("DESCRIBE <nat:4> WHERE { ?s <p> ?o }", "no WHERE group")
    rejects("DESCRIBE", "at least one IRI")
    rejects("DESCRIBE <nat:4> FILTER(?x = \"1\")", "no FILTER")
  }

  test("DESCRIBE execution: both-side triples, set semantics") {
    val spark = TestSpark.spark
    import spark.implicits._
    val triples = Seq(
      ("cust:1", "in_nation", "nat:1"),
      ("cust:2", "in_nation", "nat:1"),
      ("nat:1", "in_region", "reg:1"),
      ("nat:1", "label", "FRANCE"),
      ("nat:2", "label", "CHINA")
    ).toDF("s", "p", "o")
    val out = Sparql.run(triples, "DESCRIBE <nat:1>")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(out.toSet == Set(
      ("cust:1", "in_nation", "nat:1"),
      ("cust:2", "in_nation", "nat:1"),
      ("nat:1", "in_region", "reg:1"),
      ("nat:1", "label", "FRANCE")))
    assert(out.length == 4)
  }

  test("parses a MINUS pair into the anti-joined branch") {
    val p = Sparql.parse(
      "SELECT ?x WHERE { { ?x <p> ?a } MINUS { ?x <q> ?b } }")
    assert(p.patterns == Seq(("?x", "p", "?a")))
    assert(p.minusBranch == Some((Seq(("?x", "q", "?b")), Set.empty[Int])))
    assert(p.moreBranches.isEmpty)
  }

  test("parses VALUES blocks and BIND bindings") {
    val v1 = Sparql.parse(
      """SELECT ?n ?l WHERE { ?n <label> ?l . VALUES ?l { "CHINA" "PERU" } }""")
    assert(v1.values == Seq((Seq("l"), Seq(Seq("CHINA"), Seq("PERU")))))
    val v2 = Sparql.parse(
      """SELECT ?a ?b WHERE { ?a <p> ?b . VALUES (?a ?b) { (<x:1> "u") (<x:2> "v") } }""")
    assert(v2.values == Seq((Seq("a", "b"), Seq(Seq("x:1", "u"), Seq("x:2", "v")))))
    val b = Sparql.parse(
      """SELECT ?n ?ll WHERE { ?n <label> ?l . BIND(LCASE(?l) AS ?ll) }""")
    assert(b.binds == Seq(("ll", "lower(l)")))
    def rejects(q: String, fragment: String): Unit = {
      val e = intercept[SparqlParseError](Sparql.parse(q))
      assert(e.getMessage.contains(fragment), s"message was: ${e.getMessage}")
    }
    // UNDEF = an unbound cell (parsed as null, no constraint)
    val vu = Sparql.parse(
      """SELECT ?l WHERE { ?n <label> ?l . VALUES ?l { UNDEF "x" } }""")
    assert(vu.values == Seq((Seq("l"), Seq(Seq(null), Seq("x")))))
    rejects("""SELECT ?l WHERE { ?n <label> ?l . VALUES ?l { ?m } }""", "constants")
    rejects("""SELECT ?l WHERE { ?n <label> ?l . VALUES (?a ?b) { ("x") } }""",
      "1 terms for 2 vars")
    rejects("""SELECT ?l WHERE { ?n <label> ?l . BIND(LCASE(?l)) }""",
      "AS ?var")
  }

  // ---------------------------------------------------------- execution

  test("end-to-end: text query equals the hand-built bgpMatch plan") {
    // Use the SHARED session: builder.getOrCreate() would return the
    // same underlying context and a stop() here would kill every
    // suite scheduled after this one.
    val spark = TestSpark.spark
    import spark.implicits._
    locally {
      val triples = Seq(
        ("cust:1", "in_nation", "nat:1"),
        ("cust:2", "in_nation", "nat:2"),
        ("nat:1", "in_region", "reg:1"),
        ("nat:2", "in_region", "reg:2"),
        ("nat:1", "label", "FRANCE"),
        ("nat:2", "label", "CHINA"),
        ("reg:1", "label", "EUROPE"),
        ("reg:2", "label", "ASIA"),
        ("nat:2", "flagged", "true")
      ).toDF("s", "p", "o")

      val text = Sparql.run(
        triples,
        """SELECT ?c ?anc ?l ?fl
          |WHERE {
          |  ?c (<in_nation>|<in_region>)+ ?anc .
          |  ?anc <label> ?l .
          |  OPTIONAL { ?anc <flagged> ?fl } .
          |  FILTER(?l != "ASIA")
          |}
          |ORDER BY ?c ?anc""".stripMargin
      ).collect().map(r => (r.getString(0), r.getString(1), r.getString(2), Option(r.getString(3))))

      // Hand-derived: closure pairs, ASIA ancestors pruned, flag sparse.
      assert(text.toSeq == Seq(
        ("cust:1", "nat:1", "FRANCE", None),
        ("cust:1", "reg:1", "EUROPE", None),
        ("cust:2", "nat:2", "CHINA", Some("true")),
        ("nat:1", "reg:1", "EUROPE", None)
      ))

      // SELECT *, LIMIT, and a BOUND filter through the text surface.
      val bound = Sparql.run(
        triples,
        """SELECT ?n WHERE { ?n <in_region> ?r . OPTIONAL { ?n <flagged> ?fl }
          |  FILTER(BOUND(?fl)) } ORDER BY ?n""".stripMargin
      ).collect().map(_.getString(0))
      assert(bound.toSeq == Seq("nat:2"))

      val limited = Sparql.run(
        triples,
        "SELECT ?s WHERE { ?s <label> ?l } ORDER BY ?s LIMIT 2"
      ).count()
      assert(limited == 2)

      // VALUES constrains shared vars; BIND computes a new column;
      // FILTER stays group-level and can read the BIND output.
      val vb = Sparql.run(
        triples,
        """SELECT ?n ?ll WHERE {
          |  ?n <label> ?l .
          |  VALUES ?l { "CHINA" "EUROPE" "ASIA" } .
          |  BIND(LCASE(?l) AS ?ll) .
          |  FILTER(STRSTARTS(?ll, "c") || ?ll = "asia")
          |} ORDER BY ?ll""".stripMargin
      ).collect().map(r => (r.getString(0), r.getString(1)))
      assert(vb.toSeq == Seq(("reg:2", "asia"), ("nat:2", "china")))

      // a VALUES var new to the patterns cross-joins in as a binding
      val cross = Sparql.run(
        triples,
        """SELECT ?r ?tag WHERE {
          |  ?n <in_region> ?r . VALUES ?tag { "A" "B" }
          |} ORDER BY ?r ?tag""".stripMargin
      ).collect().map(r => (r.getString(0), r.getString(1)))
      assert(cross.length == 4 && cross.distinct.length == 4)

      // ASK returns one boolean row, true and false cases
      val askT = Sparql.run(triples, """ASK { ?n <flagged> "true" }""")
      assert(askT.columns.toSeq == Seq("ask") && askT.collect()(0).getBoolean(0))
      val askF = Sparql.run(triples, """ASK { ?n <flagged> "false" }""")
      assert(!askF.collect()(0).getBoolean(0))

      // MINUS drops solutions the right group also binds: labelled
      // subjects minus the flagged ones. Disjoint branches reject.
      val minus = Sparql.run(
        triples,
        """SELECT ?s ?l WHERE {
          |  { ?s <label> ?l } MINUS { ?s <flagged> "true" }
          |} ORDER BY ?s""".stripMargin
      ).collect().map(_.getString(0))
      assert(minus.toSeq == Seq("nat:1", "reg:1", "reg:2")) // nat:2 flagged
      val eMinus = intercept[SparqlParseError](Sparql.run(
        triples,
        "SELECT ?s WHERE { { ?s <label> ?l } MINUS { ?x <flagged> ?f } }"))
      assert(eMinus.getMessage.contains("share no variable"))

      // OFFSET skips ordered solutions before LIMIT caps them
      val page = Sparql.run(
        triples,
        "SELECT ?s WHERE { ?s <label> ?l } ORDER BY ?s OFFSET 1 LIMIT 2"
      ).collect().map(_.getString(0))
      assert(page.toSeq == Seq("nat:2", "reg:1"))

      // DISTINCT collapses the projected bindings: two customers map
      // into two nations/regions, but region labels dedup to one row
      // per region.
      val regions = Sparql.run(
        triples,
        "SELECT DISTINCT ?r WHERE { ?n <in_region> ?r . ?c <in_nation> ?n }"
      ).collect().map(_.getString(0)).sorted
      assert(regions.toSeq == Seq("reg:1", "reg:2"))

      // Unbound SELECT var is a parse-level error, not a Catalyst one.
      val e = intercept[SparqlParseError](
        Sparql.run(triples, "SELECT ?zzz WHERE { ?s <label> ?l }"))
      assert(e.getMessage.contains("not bound"))

      // UNION: bag semantics (nat:2 is in ASIA AND flagged => twice),
      // branch-local ?r null-pads in the flagged branch, and the
      // group-level FILTER applies over the combined bindings.
      val union = Sparql.run(
        triples,
        """SELECT ?n ?r WHERE {
          |  { ?n <in_region> ?r . ?r <label> "ASIA" }
          |  UNION
          |  { ?n <flagged> "true" }
          |} ORDER BY ?n ?r""".stripMargin
      ).collect().map(r => (r.getString(0), Option(r.getString(1))))
      assert(union.toSeq.sorted == Seq(
        ("nat:2", Some("reg:2")),
        ("nat:2", None)).sorted)

      // a var bound in EITHER branch satisfies the SELECT check, and
      // FILTER prunes union rows where it is null (error-is-false)
      val unionFiltered = Sparql.run(
        triples,
        """SELECT ?n ?l WHERE {
          |  { ?n <flagged> "true" . ?n <label> ?l }
          |  UNION
          |  { ?n <in_region> <reg:1> }
          |  FILTER(STRLEN(?l) > 4)
          |}""".stripMargin
      ).collect().map(r => (r.getString(0), r.getString(1)))
      assert(unionFiltered.toSeq == Seq(("nat:2", "CHINA")))
    }
  }

  test("named graphs: FROM scopes the default graph, GRAPH prunes/binds, quads dedupe") {
    val spark = TestSpark.spark
    import spark.implicits._
    val quads = Seq(
      ("n1", "label", "ALPHA", "g:labels"),
      ("n2", "label", "BETA", "g:labels"),
      ("n1", "in", "r1", "g:topo"),
      ("n2", "in", "r1", "g:topo"),
      ("n1", "flag", "true", "g:flags"),
      // the same triple in TWO graphs: the default graph is a SET
      ("n2", "in", "r1", "g:extra")
    ).toDF("s", "p", "o", "g")

    // no FROM: union default graph, set semantics (dup collapses)
    val all = Sparql.run(quads,
      "SELECT ?s WHERE { ?s <in> \"r1\" }").collect()
    assert(all.length == 2, "union default graph must dedupe")

    // FROM restricts the default graph
    val fromTopo = Sparql.run(quads,
      "SELECT ?s FROM <g:labels> WHERE { ?s <in> \"r1\" }").collect()
    assert(fromTopo.isEmpty, "FROM <g:labels> must hide topology triples")
    val merged = Sparql.run(quads,
      "SELECT ?s FROM <g:topo> FROM <g:extra> WHERE { ?s <in> \"r1\" }")
      .collect()
    assert(merged.length == 2, "FROM merge is a set union")

    // ground GRAPH joins with the default-graph patterns; OPTIONAL
    // works inside a ground GRAPH group
    val ground = Sparql.run(quads,
      """SELECT ?s ?l ?f WHERE {
        |  ?s <in> "r1" .
        |  GRAPH <g:labels> { ?s <label> ?l } .
        |  GRAPH <g:flags> { ?s <flag> "true" . OPTIONAL { ?s <flag> ?f } }
        |}""".stripMargin).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(ground.toSeq == Seq(("n1", "ALPHA", "true")))

    // GRAPH ?g binds the graph name per solution
    val bound = Sparql.run(quads,
      """SELECT ?s ?g WHERE { GRAPH ?g { ?s <label> ?l } } ORDER BY ?s""")
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(bound.toSeq == Seq(("n1", "g:labels"), ("n2", "g:labels")))

    // rejects, each naming the construct
    def rejects(q: String, frag: String): Unit = {
      val e = intercept[SparqlParseError](Sparql.run(quads, q))
      assert(e.getMessage.contains(frag), s"'${e.getMessage}' missing '$frag'")
    }
    // FROM NAMED is supported now: alone it empties the default graph
    assert(Sparql.run(quads,
      "SELECT ?s FROM NAMED <g:x> WHERE { ?s <in> ?o }").collect().isEmpty)
    rejects(
      "SELECT ?s WHERE { GRAPH ?g { GRAPH <g:x> { ?s <in> ?o } } }",
      "nested GRAPH")
    rejects(
      "SELECT ?s WHERE { GRAPH ?g { OPTIONAL { ?s <flag> ?f } . ?s <in> ?o } }",
      "OPTIONAL inside GRAPH ?var")
    rejects(
      "SELECT ?s WHERE { GRAPH ?g { ?s <in>+ ?o } }",
      "property paths inside GRAPH ?var")
    rejects(
      """SELECT ?s WHERE { { GRAPH <g:x> { ?s <in> ?o } } UNION { ?s <in> ?o } }""",
      "GRAPH doesn't mix")
    // a plain 3-column frame has no dataset surface
    val triples = quads.select("s", "p", "o")
    val e1 = intercept[SparqlParseError](Sparql.run(triples,
      "SELECT ?s FROM <g:x> WHERE { ?s <in> ?o }"))
    assert(e1.getMessage.contains("quad frame"))
    val e2 = intercept[SparqlParseError](Sparql.run(triples,
      "SELECT ?s WHERE { GRAPH <g:x> { ?s <in> ?o } }"))
    assert(e2.getMessage.contains("quad frame"))
  }

  test("FILTER EXISTS semi-joins, NOT EXISTS anti-joins; disjoint groups gate") {
    val spark = TestSpark.spark
    import spark.implicits._
    val triples = Seq(
      ("cust:1", "in_nation", "nat:1"),
      ("nat:1", "in_region", "reg:1"),
      ("nat:2", "in_region", "reg:1"),
      ("nat:1", "label", "FRANCE"),
      ("nat:2", "label", "GERMANY"),
      ("nat:2", "flagged", "true")
    ).toDF("s", "p", "o")

    // EXISTS keeps only nations with at least one customer.
    val ex = Sparql.run(triples,
      "SELECT ?n WHERE { ?n <in_region> ?r . FILTER EXISTS { ?c <in_nation> ?n } } ORDER BY ?n"
    ).collect().map(_.getString(0))
    assert(ex.toSeq == Seq("nat:1"))

    // NOT EXISTS drops the flagged nation.
    val nex = Sparql.run(triples,
      """SELECT ?n WHERE { ?n <in_region> ?r .
        |  FILTER NOT EXISTS { ?n <flagged> "true" } } ORDER BY ?n""".stripMargin
    ).collect().map(_.getString(0))
    assert(nex.toSeq == Seq("nat:1"))

    // Disjoint groups (no shared variable) gate on any-solution-at-all.
    assert(Sparql.run(triples,
      """SELECT ?n WHERE { ?n <in_region> ?r .
        |  FILTER EXISTS { ?x <label> "FRANCE" } }""".stripMargin).count() == 2)
    assert(Sparql.run(triples,
      """SELECT ?n WHERE { ?n <in_region> ?r .
        |  FILTER EXISTS { ?x <label> "ATLANTIS" } }""".stripMargin).count() == 0)
    assert(Sparql.run(triples,
      """SELECT ?n WHERE { ?n <in_region> ?r .
        |  FILTER NOT EXISTS { ?x <label> "ATLANTIS" } }""".stripMargin).count() == 2)

    // The full fragment works inside: an inner FILTER…
    val inner = Sparql.run(triples,
      """SELECT ?n WHERE {
        |  ?n <in_region> ?r .
        |  FILTER EXISTS { ?n <label> ?l . FILTER(STRSTARTS(?l, "G")) }
        |} ORDER BY ?n""".stripMargin).collect().map(_.getString(0))
    assert(inner.toSeq == Seq("nat:2"))

    // …and a nested NOT EXISTS inside an EXISTS.
    val nested = Sparql.run(triples,
      """SELECT ?n WHERE {
        |  ?n <in_region> ?r .
        |  FILTER EXISTS { ?n <label> ?l .
        |    FILTER NOT EXISTS { ?n <flagged> "true" } }
        |} ORDER BY ?n""".stripMargin).collect().map(_.getString(0))
    assert(nested.toSeq == Seq("nat:1"))

    // Rejections, each naming the construct.
    def rejects(q: String, frag: String): Unit = {
      val e = intercept[SparqlParseError](Sparql.parse(q))
      assert(e.getMessage.contains(frag), s"'${e.getMessage}' missing '$frag'")
    }
    rejects("SELECT ?s WHERE { ?s <p> ?o . FILTER EXISTS ?s <q> ?o }",
      "braced group")
    rejects("SELECT ?s WHERE { ?s <p> ?o . FILTER (EXISTS { ?s <q> ?o }) }",
      "parenthesized FILTER")
    rejects("SELECT ?s WHERE { ?s <p> ?o . FILTER EXISTS { } }",
      "no triple patterns")
  }

  test("subqueries: aggregate-in-pattern, sole-group forms, nesting, rejections") {
    val spark = TestSpark.spark
    import spark.implicits._
    val t = Seq(
      ("c1", "in", "n1"),
      ("c2", "in", "n1"),
      ("c3", "in", "n2"),
      ("n1", "label", "A"),
      ("n2", "label", "B")
    ).toDF("s", "p", "o")

    // Aggregate subquery joins on the shared var; the outer FILTER
    // reads the aggregate alias (the HAVING idiom without HAVING).
    val agg = Sparql.run(t,
      """SELECT ?l ?cnt WHERE {
        |  { SELECT ?n (COUNT(?c) AS ?cnt) WHERE { ?c <in> ?n } GROUP BY ?n }
        |  ?n <label> ?l .
        |  FILTER(?cnt >= 2)
        |} ORDER BY ?l""".stripMargin
    ).collect().map(r => (r.getString(0), r.getLong(1)))
    assert(agg.toSeq == Seq(("A", 2L)))

    // WHERE { SELECT … } — the group's braces wrap the SubSelect
    // directly (legal grammar), and the doubly-braced spelling too.
    val sole = Sparql.run(t,
      "SELECT ?n WHERE { SELECT DISTINCT ?n WHERE { ?c <in> ?n } } ORDER BY ?n"
    ).collect().map(_.getString(0))
    assert(sole.toSeq == Seq("n1", "n2"))
    assert(Sparql.run(t,
      "SELECT ?n WHERE { { SELECT DISTINCT ?n WHERE { ?c <in> ?n } } } ORDER BY ?n"
    ).count() == 2)

    // Only the subquery's projected variables are visible outside.
    val hidden = intercept[SparqlParseError](Sparql.run(t,
      "SELECT ?c WHERE { { SELECT DISTINCT ?n WHERE { ?c <in> ?n } } }"))
    assert(hidden.getMessage.contains("not bound"))

    // EXISTS inside a subquery (travels with the subquery splice).
    val exIn = Sparql.run(t,
      """SELECT ?n WHERE { { SELECT ?n WHERE { ?c <in> ?n .
        |  FILTER NOT EXISTS { ?n <label> "B" } } } } ORDER BY ?n""".stripMargin
    ).collect().map(_.getString(0))
    assert(exIn.toSeq == Seq("n1", "n1")) // bag semantics, two customers

    // Subquery inside an EXISTS body (travels with the EXISTS splice).
    val subInEx = Sparql.run(t,
      """SELECT ?l WHERE { ?n <label> ?l .
        |  FILTER EXISTS { { SELECT ?n (COUNT(?c) AS ?k)
        |    WHERE { ?c <in> ?n } GROUP BY ?n } FILTER(?k >= 2) }
        |} ORDER BY ?l""".stripMargin
    ).collect().map(_.getString(0))
    assert(subInEx.toSeq == Seq("A"))

    // UNION/MINUS don't mix with a spliced subquery.
    val mix = intercept[SparqlParseError](Sparql.parse(
      "SELECT ?x WHERE { { ?x <p> ?y } UNION { { SELECT ?x WHERE { ?x <q> ?z } } } }"))
    assert(mix.getMessage.contains("don't mix"))
  }

  test("multi-triple OPTIONAL groups left-join as a unit") {
    val spark = TestSpark.spark
    import spark.implicits._
    val t = Seq(
      ("c1", "in", "n1"),
      ("c2", "in", "n2"),
      ("n1", "flag", "true"),
      ("n1", "label", "A"),
      ("n2", "label", "B") // label but NO flag
    ).toDF("s", "p", "o")

    // both-or-nothing: n2 has a label but no flag, so BOTH stay null —
    // the semantic two separate single-triple OPTIONALs would not give
    val grp = Sparql.run(t,
      """SELECT ?c ?f ?l WHERE {
        |  ?c <in> ?n .
        |  OPTIONAL { ?n <flag> ?f . ?n <label> ?l }
        |} ORDER BY ?c""".stripMargin
    ).collect().map(r =>
      (r.getString(0), Option(r.getString(1)), Option(r.getString(2))))
    assert(grp.toSeq == Seq(
      ("c1", Some("true"), Some("A")),
      ("c2", None, None)
    ))

    // contrast: two single-triple OPTIONALs bind independently
    val indep = Sparql.run(t,
      """SELECT ?c ?f ?l WHERE {
        |  ?c <in> ?n .
        |  OPTIONAL { ?n <flag> ?f } .
        |  OPTIONAL { ?n <label> ?l }
        |} ORDER BY ?c""".stripMargin
    ).collect().map(r =>
      (r.getString(0), Option(r.getString(1)), Option(r.getString(2))))
    assert(indep.toSeq == Seq(
      ("c1", Some("true"), Some("A")),
      ("c2", None, Some("B"))
    ))

    // group-level FILTER can read optional-group bindings
    val filt = Sparql.run(t,
      """SELECT ?c WHERE {
        |  ?c <in> ?n .
        |  OPTIONAL { ?n <flag> ?f . ?n <label> ?l }
        |  FILTER(BOUND(?f))
        |} ORDER BY ?c""".stripMargin
    ).collect().map(_.getString(0))
    assert(filt.toSeq == Seq("c1"))

    // mix rejection with UNION
    val e = intercept[SparqlParseError](Sparql.parse(
      """SELECT ?c WHERE { { ?c <in> ?n . OPTIONAL { ?n <flag> ?f . ?n <label> ?l } }
        |UNION { ?c <in> ?n } }""".stripMargin))
    assert(e.getMessage.contains("multi-triple OPTIONAL doesn't mix"))
  }

  test("negated property sets and the SAMPLE aggregate") {
    val spark = TestSpark.spark
    import spark.implicits._
    val t = Seq(
      ("n1", "in", "r1"),
      ("n1", "label", "A"),
      ("n1", "flag", "true"),
      ("n2", "in", "r1"),
      ("r1", "label", "R")
    ).toDF("s", "p", "o")

    // !(p1|p2) matches every OTHER predicate's triples.
    assert(Sparql.parse("SELECT ?s WHERE { ?s !(<label>|<flag>) ?o }").patterns ==
      Seq(("?s", "!(label|flag)", "?o")))
    val neg = Sparql.run(t,
      "SELECT ?s ?o WHERE { ?s !(<label>|<flag>) ?o } ORDER BY ?s")
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(neg.toSeq == Seq(("n1", "r1"), ("n2", "r1")))

    // single-member form, and the combined !prefix:local token shape
    val single = Sparql.run(t,
      """PREFIX x: <la> SELECT ?s ?o WHERE { ?s !x:bel ?o . ?s !<flag> ?o }
        |ORDER BY ?s ?o""".stripMargin).collect()
      .map(r => (r.getString(0), r.getString(1)))
    // (s,o) pairs in BOTH complements: only the `in` edges survive
    assert(single.toSeq == Seq(("n1", "r1"), ("n2", "r1")))

    // SAMPLE picks the deterministic minimum per group.
    val samp = Sparql.run(t,
      """SELECT ?o (SAMPLE(?s) AS ?rep) WHERE { ?s <in> ?o } GROUP BY ?o""")
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(samp.toSeq == Seq(("r1", "n1")))

    // rejections: ?var members, modifiers on a negated set
    def rejects(q: String, frag: String): Unit = {
      val e = intercept[SparqlParseError](Sparql.parse(q))
      assert(e.getMessage.contains(frag), s"'${e.getMessage}' missing '$frag'")
    }
    rejects("SELECT ?s WHERE { ?s !?p ?o }", "ground predicates")
    rejects("SELECT ?s WHERE { ?s !(<p>|<q>)+ ?o }",
      "modifiers on a negated property set")
    rejects("SELECT ?s WHERE { GRAPH ?g { ?s !<p> ?o } }",
      "property paths inside GRAPH ?var")
  }

  test("FROM NAMED pins the dataset: GRAPH scope, empty default graph, all combinations") {
    val spark = TestSpark.spark
    import spark.implicits._
    val quads = Seq(
      ("a", "p", "1", "g1"),
      ("b", "p", "2", "g2"),
      ("c", "p", "3", "g3")
    ).toDF("s", "p", "o", "g")
    def gs(q: String): Seq[(String, String)] =
      Sparql.run(quads, q).collect().map(r => (r.getString(0), r.getString(1))).toSeq

    // no dataset clause: GRAPH ?g ranges over every graph
    assert(gs("SELECT ?g ?s WHERE { GRAPH ?g { ?s <p> ?o } } ORDER BY ?g") ==
      Seq(("g1", "a"), ("g2", "b"), ("g3", "c")))
    // FROM NAMED restricts GRAPH ?g to the named list
    assert(gs("""SELECT ?g ?s FROM NAMED <g1> FROM NAMED <g3>
      |WHERE { GRAPH ?g { ?s <p> ?o } } ORDER BY ?g""".stripMargin) ==
      Seq(("g1", "a"), ("g3", "c")))
    // a ground GRAPH outside the named list matches nothing
    assert(gs("""SELECT ?s ?o FROM NAMED <g1>
      |WHERE { GRAPH <g2> { ?s <p> ?o } }""".stripMargin).isEmpty)
    // FROM NAMED alone leaves the default graph EMPTY (spec §13.2)
    assert(gs("""SELECT ?s ?o FROM NAMED <g1>
      |WHERE { ?s <p> ?o }""".stripMargin).isEmpty)
    // FROM alone leaves GRAPH nothing to range over
    assert(gs("""SELECT ?g ?s FROM <g1>
      |WHERE { GRAPH ?g { ?s <p> ?o } }""".stripMargin).isEmpty)
    // both kinds compose: default graph from FROM, GRAPH from NAMED
    assert(gs("""SELECT ?s ?s2 FROM <g1> FROM NAMED <g2>
      |WHERE { ?s <p> "1" . GRAPH ?g { ?s2 <p> ?o } }""".stripMargin) ==
      Seq(("a", "b")))
    // a triple frame still rejects any dataset clause by name
    val e = intercept[SparqlParseError](
      Sparql.run(Seq(("a", "p", "1")).toDF("s", "p", "o"),
        "SELECT ?s FROM NAMED <g1> WHERE { ?s <p> ?o }"))
    assert(e.getMessage.contains("quad frame"))
  }

  test("HAVING and GROUP_CONCAT: execution, determinism, rejections") {
    val spark = TestSpark.spark
    import spark.implicits._
    val t = Seq(
      ("c1", "in", "n1"), ("c2", "in", "n1"), ("c3", "in", "n1"),
      ("c4", "in", "n2"),
      ("n1", "label", "B"), ("n1", "label", "A"), ("n2", "label", "Z")
    ).toDF("s", "p", "o")

    // HAVING's aggregate computes in the same groupBy and is dropped
    // from the projection.
    val h = Sparql.run(t,
      """SELECT ?n (COUNT(?c) AS ?k) WHERE { ?c <in> ?n }
        |GROUP BY ?n HAVING(COUNT(?c) > 1) ORDER BY ?n""".stripMargin)
    assert(h.columns.toSeq == Seq("n", "k"))
    assert(h.collect().map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("n1", 3L)))

    // HAVING over a var with no SELECT aggregate (legal SPARQL).
    val hv = Sparql.run(t,
      """SELECT ?n WHERE { ?c <in> ?n } GROUP BY ?n
        |HAVING(COUNT(DISTINCT ?c) = 1)""".stripMargin)
      .collect().map(_.getString(0))
    assert(hv.toSeq == Seq("n2"))

    // GROUP_CONCAT sorts the group's values (deterministic under any
    // partitioning); DISTINCT + SEPARATOR compose.
    val gc = Sparql.run(t,
      """SELECT ?n (GROUP_CONCAT(?l; SEPARATOR="|") AS ?labels)
        |WHERE { ?n <label> ?l } GROUP BY ?n ORDER BY ?n""".stripMargin)
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(gc.toSeq == Seq(("n1", "A|B"), ("n2", "Z")))
    val gcd = Sparql.run(t,
      """SELECT (GROUP_CONCAT(DISTINCT ?p) AS ?preds)
        |WHERE { ?s ?p ?o }""".stripMargin)
      .collect().head.getString(0)
    assert(gcd == "in label")

    def rejects(q: String, frag: String): Unit = {
      val e = intercept[SparqlParseError](Sparql.parse(q))
      assert(e.getMessage.contains(frag), s"'${e.getMessage}' missing '$frag'")
    }
    rejects("SELECT ?n WHERE { ?c <in> ?n } GROUP BY ?n HAVING(GROUP_CONCAT(?c) > 1)",
      "GROUP_CONCAT in HAVING is not supported")
    rejects("ASK { ?c <in> ?n } HAVING(COUNT(?c) > 1)",
      "takes no HAVING")
    rejects("""SELECT (GROUP_CONCAT(?p; SEP="x") AS ?z) WHERE { ?s ?p ?o }""",
      "expected SEPARATOR")
    rejects("""SELECT (COUNT(?p; SEPARATOR="x") AS ?z) WHERE { ?s ?p ?o }""",
      "only GROUP_CONCAT takes a ';' argument")
    rejects("SELECT (GROUP_CONCAT(*) AS ?z) WHERE { ?s ?p ?o }",
      "GROUP_CONCAT(*) is not valid SPARQL")

    // GROUP BY + HAVING with NO aggregate anywhere (legal SPARQL):
    // must group (distinct keys) and apply the HAVING filter, not
    // silently return ungrouped unfiltered rows.
    val nk = Sparql.run(t,
      """SELECT ?n WHERE { ?c <in> ?n } GROUP BY ?n
        |HAVING(?n != "n1") ORDER BY ?n""".stripMargin)
      .collect().map(_.getString(0))
    assert(nk.toSeq == Seq("n2"))

    // Aggregate-looking text inside a HAVING string literal is data:
    // the rewrite must not corrupt it or register a spurious aggregate.
    val lit = Sparql.run(t,
      """SELECT ?n WHERE { ?c <in> ?n } GROUP BY ?n
        |HAVING(?n != "COUNT(?x)") ORDER BY ?n""".stripMargin)
      .collect().map(_.getString(0))
    assert(lit.toSeq == Seq("n1", "n2"))

    // HAVING with no GROUP BY and no aggregate: no group to filter.
    rejects("""SELECT ?n WHERE { ?c <in> ?n } HAVING(?n != "a")""",
      "HAVING without GROUP BY needs an aggregate")
  }

  test("SUM/AVG aggregate typed numeric literals; non-numeric groups go unbound") {
    val spark = TestSpark.spark
    import spark.implicits._
    val t = Seq(
      ("a", "score", "\"2\"^^<http://www.w3.org/2001/XMLSchema#integer>"),
      ("a", "score", "\"3.5\"^^<http://www.w3.org/2001/XMLSchema#decimal>"),
      ("a", "score", "\"2\"^^<http://www.w3.org/2001/XMLSchema#integer>"),
      ("b", "score", "4"),             // bare lexical form
      ("b", "score", "\"1.5\""),       // plain literal
      ("c", "score", "\"oops\"@en"),   // non-numeric → group unbound
      ("c", "score", "\"9\"^^<http://www.w3.org/2001/XMLSchema#integer>")
    ).toDF("s", "p", "o")
    val rows = Sparql.run(t,
      """SELECT ?s (SUM(?v) AS ?total) (AVG(?v) AS ?mean)
        |WHERE { ?s <score> ?v } GROUP BY ?s ORDER BY ?s""".stripMargin)
      .collect()
      .map(r => (r.getString(0),
        Option(r.get(1)).map(_.asInstanceOf[Double]),
        Option(r.get(2)).map(_.asInstanceOf[Double])))
    assert(rows.toSeq == Seq(
      ("a", Some(7.5), Some(2.5)),
      ("b", Some(5.5), Some(2.75)),
      // spec error propagation: any non-numeric binding in the group
      // makes the aggregate UNBOUND, not silently skipped
      ("c", None, None)))
    // DISTINCT collapses the duplicated "2" before summing
    val d = Sparql.run(t,
      """SELECT ?s (SUM(DISTINCT ?v) AS ?total)
        |WHERE { ?s <score> ?v } GROUP BY ?s ORDER BY ?s""".stripMargin)
      .collect().map(r => (r.getString(0), Option(r.get(1))))
    assert(d.head == ("a", Some(5.5)))
    // SUM works in HAVING too (same machinery)
    val h = Sparql.run(t,
      """SELECT ?s WHERE { ?s <score> ?v } GROUP BY ?s
        |HAVING(SUM(?v) > 6) ORDER BY ?s""".stripMargin)
      .collect().map(_.getString(0))
    assert(h.toSeq == Seq("a"))
  }

  test("aggregate edge semantics: term-level DISTINCT, empty SUM = 0, escaped quotes") {
    val spark = TestSpark.spark
    import spark.implicits._
    val t = Seq(
      // same numeric VALUE (2.0) under two distinct RDF terms: both
      // must contribute to SUM(DISTINCT) — value-level dedup would
      // collapse them to one 2.0
      ("a", "score", "\"2\"^^<http://www.w3.org/2001/XMLSchema#integer>"),
      ("a", "score", "\"2.00\"^^<http://www.w3.org/2001/XMLSchema#decimal>"),
      ("b", "score", "\"5\"^^<http://www.w3.org/2001/XMLSchema#integer>"),
      ("a\"b", "score", "\"7\"^^<http://www.w3.org/2001/XMLSchema#integer>")
    ).toDF("s", "p", "o")
    val d = Sparql.run(t,
      """SELECT ?s (SUM(DISTINCT ?v) AS ?total) (AVG(DISTINCT ?v) AS ?mean)
        |WHERE { ?s <score> ?v } GROUP BY ?s ORDER BY ?s""".stripMargin)
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    assert(d.toSeq == Seq(("a", 4.0, 2.0), ("a\"b", 7.0, 7.0), ("b", 5.0, 5.0)))
    // SPARQL 18.5.1.5: Sum of the empty solution multiset is 0, not
    // unbound (a global SUM with zero matches must still bind).
    val empty = Sparql.run(t,
      """SELECT (SUM(?v) AS ?total) WHERE { ?s <missing> ?v }""")
      .collect()
    assert(empty.length == 1 && empty.head.getDouble(0) == 0.0)
    // A HAVING string literal with an escaped quote is ONE literal:
    // the escape must not flip the code/data segmentation (and the
    // comparison must see the unescaped value).
    val h = Sparql.run(t,
      """SELECT ?s (SUM(?v) AS ?total) WHERE { ?s <score> ?v }
        |GROUP BY ?s HAVING(?s != "a\"b") ORDER BY ?s""".stripMargin)
      .collect().map(_.getString(0))
    assert(h.toSeq == Seq("a", "b"))
  }

  test("FROM NAMED-only dataset clause on a triple frame is rejected by name") {
    val spark = TestSpark.spark
    import spark.implicits._
    val t = Seq(("a", "p", "1")).toDF("s", "p", "o")
    val e = intercept[SparqlParseError](
      Sparql.run(t, "SELECT ?s FROM NAMED <g1> WHERE { ?s <p> ?o }"))
    assert(e.getMessage.contains("FROM NAMED needs"))
    val e2 = intercept[SparqlParseError](
      Sparql.run(t, "SELECT ?s FROM <g1> WHERE { ?s <p> ?o }"))
    assert(e2.getMessage.contains("FROM needs"))
  }

  test("position-sensitive LeftJoin orderings inside a group are rejected by name") {
    // SPARQL's algebra folds a group left to right, so an OPTIONAL
    // that precedes the group's required triples (or a required
    // triple that follows a nested OPTIONAL) means LeftJoin against a
    // partial group — which the inner-join-required-first plan would
    // silently reorder. Both orderings must be named rejections, not
    // reorderings (advisor round-9).
    val e1 = intercept[SparqlParseError](Sparql.parse(
      """SELECT ?c WHERE {
        |  ?c <in> ?n .
        |  OPTIONAL { OPTIONAL { ?n <flag> ?f } ?n <label> ?l . ?n <kind> ?k }
        |}""".stripMargin))
    assert(e1.getMessage.contains("OPTIONAL precedes"))
    val e2 = intercept[SparqlParseError](Sparql.parse(
      """SELECT ?c WHERE {
        |  ?c <in> ?n .
        |  OPTIONAL { ?n <label> ?l . OPTIONAL { ?n <flag> ?f . ?n <kind> ?k }
        |             ?n <size> ?z }
        |}""".stripMargin))
    assert(e2.getMessage.contains("follows a nested OPTIONAL"))
  }

  test("VALUES keeps SPARQL 18.5 multiset multiplicity: one row per compatible pair") {
    val spark = TestSpark.spark
    import spark.implicits._
    val t = Seq(
      ("a", "label", "X"),
      ("b", "label", "Y")
    ).toDF("s", "p", "o")
    // solution (a, X) is compatible with BOTH rows — (<a> UNDEF) and
    // (UNDEF "X") — so it must appear twice; (b, Y) matches neither.
    val rows = Sparql.run(t,
      """SELECT ?n ?l WHERE {
        |  ?n <label> ?l .
        |  VALUES (?n ?l) { (<a> UNDEF) (UNDEF "X") }
        |} ORDER BY ?n ?l""".stripMargin
    ).collect().map(r => (r.getString(0), r.getString(1)))
    assert(rows.toSeq == Seq(("a", "X"), ("a", "X")))
  }
}
