package graft

import graft.sparql.Sparql
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the SPARQL parser: RENDER a random query from
  * the supported grammar, parse it, and check the structure survives
  * the round trip. The renderer injects random whitespace, comments,
  * and '.' terminators — the parser must be insensitive to all of
  * them. This guards the fragment's biggest risk: a silent misparse
  * (wrong pattern, dropped OPTIONAL, swapped path endpoint) that a
  * fixed example suite wouldn't hit.
  *
  * Sampling is by FIXED seeds (no scalatestplus bridge in the offline
  * cache, and deterministic cases are what CI wants anyway): 200
  * seeds per property.
  */
class SparqlPropertySpec extends AnyFunSuite {

  private def samples[A](g: Gen[A], n: Int = 200): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val genVar: Gen[String] =
    Gen.oneOf("a", "b", "c", "x", "y", "z").map("?" + _)
  private val genIri: Gen[String] =
    Gen.oneOf("urn:p", "urn:q", "http://ex.org/r", "label", "in_nation")
  private val genLiteral: Gen[String] =
    Gen.oneOf("ASIA", "true", "some text", "x;y")

  // (rendered term, expected parsed term)
  private val genSubject: Gen[(String, String)] =
    Gen.oneOf(
      genVar.map(v => (v, v)),
      genIri.map(i => (s"<$i>", i))
    )
  private val genObject: Gen[(String, String)] =
    Gen.oneOf(
      genVar.map(v => (v, v)),
      genIri.map(i => (s"<$i>", i)),
      genLiteral.map(l => (s""""$l"""", l))
    )

  // predicate: plain IRI, closure, alternation-closure, or inverse
  private val genPredicate: Gen[(String, String, Boolean)] =
    Gen.oneOf(
      genIri.map(i => (s"<$i>", i, false)),
      genIri.map(i => (s"<$i>+", i + "+", false)),
      Gen.zip(genIri, genIri).map { case (i1, i2) =>
        (s"(<$i1>|<$i2>)+", s"($i1|$i2)+", false)
      },
      genIri.map(i => (s"^<$i>", i, true))
    )

  private case class TriplePat(
      s: (String, String),
      p: (String, String, Boolean),
      o: (String, String)
  ) {
    def rendered: String = s"${s._1} ${p._1} ${o._1}"
    def expected: (String, String, String) =
      if (p._3) (o._2, p._2, s._2) else (s._2, p._2, o._2)
  }

  private val genTriple: Gen[TriplePat] =
    for {
      s <- genSubject
      p <- genPredicate
      o <- genObject
    } yield TriplePat(s, p, o)

  private val genTriples: Gen[List[TriplePat]] =
    Gen.choose(1, 5).flatMap(n => Gen.listOfN(n, genTriple))

  private val genWs: Gen[String] =
    Gen.oneOf(" ", "  ", "\n", "\n  ", " # noise comment\n")

  test("round trip: rendered BGPs parse to the same patterns") {
    samples(Gen.zip(genTriples, genWs, genWs)).foreach {
      case (pats, ws1, ws2) =>
        val vars = pats
          .flatMap(t => Seq(t.s._1, t.o._1))
          .filter(_.startsWith("?"))
          .distinct
        val sel = if (vars.isEmpty) "*" else vars.mkString(" ")
        val body = pats.map(_.rendered).mkString(s" .$ws1")
        val q = s"SELECT $sel${ws2}WHERE {$ws1$body$ws2}"
        val parsed =
          try Sparql.parse(q)
          catch {
            case e: Sparql.SparqlParseError =>
              fail(s"parse failed on:\n$q\n${e.getMessage}")
          }
        assert(parsed.patterns == pats.map(_.expected), q)
        assert(parsed.optionalIdx.isEmpty, q)
        assert(parsed.selectVars == vars.map(_.drop(1)), q)
    }
  }

  test("round trip: OPTIONAL index and FILTER body survive") {
    samples(Gen.zip(genTriple, genTriple, genVar)).foreach {
      case (t1, t2, fv) =>
        val q =
          s"""SELECT * WHERE {
             |  ${t1.rendered} .
             |  OPTIONAL { ${t2.rendered} }
             |  FILTER($fv != "Z")
             |}""".stripMargin
        val parsed = Sparql.parse(q)
        assert(parsed.patterns == Seq(t1.expected, t2.expected), q)
        assert(parsed.optionalIdx == Set(1), q)
        assert(parsed.filterSql.contains(s"(${fv.drop(1)} != 'Z')"), q)
    }
  }

  test("round trip: UNION branch structures survive") {
    samples(Gen.zip(genTriples, genTriples), 100).foreach {
      case (b1, b2) =>
        val q =
          s"""SELECT * WHERE {
             |  { ${b1.map(_.rendered).mkString(" . ")} }
             |  UNION
             |  { ${b2.map(_.rendered).mkString(" . ")} }
             |}""".stripMargin
        val parsed = Sparql.parse(q)
        assert(parsed.patterns == b1.map(_.expected), q)
        assert(parsed.moreBranches ==
          Seq((b2.map(_.expected), Set.empty[Int])), q)
    }
  }

  test("literals containing keywords or punctuation never derail the lexer") {
    // 'FILTER', 'UNION', ';', '#', '/' inside a quoted literal are data
    val tricky = Seq("FILTER(x)", "UNION", "a;b", "a#b", "p/q", "BIND one")
    tricky.foreach { s =>
      val parsed = Sparql.parse(s"""SELECT ?x WHERE { ?x <p> "$s" }""")
      assert(parsed.patterns == Seq(("?x", "p", s)), s)
    }
  }

  test("SUM/AVG over random typed literals match a Scala reference on every seed") {
    val spark = TestSpark.spark
    import spark.implicits._
    // value pool mixes the three literal spellings plus a non-numeric
    val genVal: Gen[(String, Option[Double])] = Gen.oneOf(
      Gen.chooseNum(-99, 99).map(n =>
        (s""""$n"^^<http://www.w3.org/2001/XMLSchema#integer>""", Some(n.toDouble))),
      Gen.chooseNum(-999, 999).map(n =>
        (s""""${n / 10.0}"^^<http://www.w3.org/2001/XMLSchema#decimal>""",
          Some(n / 10.0))),
      Gen.chooseNum(0, 50).map(n => (n.toString, Some(n.toDouble))),
      Gen.const(("\"oops\"@en", None))
    )
    val genGroup: Gen[(String, List[(String, Option[Double])])] = for {
      key <- Gen.oneOf("a", "b", "c", "d")
      vs <- Gen.nonEmptyListOf(genVal)
    } yield (key, vs.take(6))
    val cases = samples(Gen.nonEmptyListOf(genGroup).map(_.take(5)), n = 40)
    cases.zipWithIndex.foreach { case (groups, i) =>
      val rows = groups.flatMap { case (k, vs) => vs.map(v => (k, "score", v._1)) }
      val df = rows.toDF("s", "p", "o")
      val got = Sparql.run(df,
        """SELECT ?s (SUM(?v) AS ?total) (AVG(?v) AS ?mean)
          |WHERE { ?s <score> ?v } GROUP BY ?s ORDER BY ?s""".stripMargin)
        .collect()
        .map(r => r.getString(0) ->
          (Option(r.get(1)).map(_.asInstanceOf[Double]),
            Option(r.get(2)).map(_.asInstanceOf[Double])))
        .toMap
      // Scala reference with the spec's error propagation: any
      // non-numeric binding in a group makes both aggregates unbound
      val want = groups.groupBy(_._1).map { case (k, gs) =>
        val vs = gs.flatMap(_._2)
        k -> (if (vs.exists(_._2.isEmpty)) (None, None)
              else {
                val nums = vs.flatMap(_._2)
                (Some(nums.sum), Some(nums.sum / nums.length))
              })
      }
      assert(got.keySet == want.keySet, s"seed $i: group keys")
      want.foreach { case (k, (ws, wm)) =>
        val (gs2, gm) = got(k)
        (ws, gs2) match {
          case (Some(a), Some(b)) => assert(math.abs(a - b) < 1e-9, s"seed $i sum($k)")
          case (a, b)             => assert(a.isEmpty == b.isEmpty, s"seed $i sum($k): $a vs $b")
        }
        (wm, gm) match {
          case (Some(a), Some(b)) => assert(math.abs(a - b) < 1e-9, s"seed $i avg($k)")
          case (a, b)             => assert(a.isEmpty == b.isEmpty, s"seed $i avg($k): $a vs $b")
        }
      }
    }
  }
}
