package graft

import graft.operators.Graph
import org.scalatest.funsuite.AnyFunSuite

class GraphSpec extends AnyFunSuite {
  import TestSpark._

  private def t3(rows: (String, String, String)*) = {
    import spark.implicits._
    rows.toDF("s", "p", "o")
  }

  test("bgpMatch binds variables across patterns and filters constants") {
    val triples = t3(
      ("a", "knows", "b"),
      ("b", "knows", "c"),
      ("a", "type", "person"),
      ("b", "type", "person"),
      ("c", "type", "robot")
    )
    val out = Graph
      .bgpMatch(triples, Seq(("?x", "knows", "?y"), ("?y", "type", "person")))
      .collect()
      .map(r => (r.getAs[String]("x"), r.getAs[String]("y")))
      .toSet
    // (b knows c) drops out: c is not a person.
    assert(out == Set(("a", "b")))
  }

  test("bgpMatch repeated variable within a pattern means equality") {
    val triples = t3(
      ("n1", "links", "n1"),
      ("n1", "links", "n2"),
      ("n2", "links", "n2")
    )
    val selfLinked = Graph
      .bgpMatch(triples, Seq(("?x", "links", "?x")))
      .collect()
      .map(_.getAs[String]("x"))
      .toSet
    assert(selfLinked == Set("n1", "n2"))
  }

  test("bgpMatch with no shared variable is the cartesian of bindings") {
    val triples = t3(
      ("a", "p1", "x"),
      ("b", "p1", "y"),
      ("c", "p2", "z")
    )
    val n = Graph
      .bgpMatch(triples, Seq(("?u", "p1", "?v"), ("?w", "p2", "z")))
      .count()
    assert(n == 2)
  }
}
