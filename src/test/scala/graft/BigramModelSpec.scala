package graft

import org.apache.spark.sql.functions.{col, explode}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the bigram-LM kernels (BigramCounts /
  * BigramModelScore) against straight-line Scala references, over
  * fuzzed whitespace-messy text — the same seeded-Gen discipline as
  * SparqlPropertySpec. The kernels' tokenizer must match text.tokens
  * byte for byte, the pair fold must count every adjacent pair
  * exactly once (position 0 as a null-prev pair), and the scoring
  * fold must reproduce inner-join-then-average semantics including
  * the dropped-tail rule for out-of-model pairs. */
class BigramModelSpec extends AnyFunSuite {
  import TestSpark._

  // whitespace-adversarial text: tabs, newlines, runs, edge spaces,
  // repeated words (so per-doc pair counts exceed 1), empty-ish docs
  private val wordGen = Gen.oneOf("a", "bb", "ccc", "dd", "a", "€x", "z9")
  private val sepGen = Gen.oneOf(" ", "  ", "\t", "\n", " \t ")
  private val textGen: Gen[String] = for {
    n <- Gen.choose(0, 12)
    ws <- Gen.listOfN(n, wordGen)
    seps <- Gen.listOfN(n + 1, sepGen)
    lead <- Gen.oneOf("", " ", "\n")
    tail <- Gen.oneOf("", " ", "\t")
  } yield lead + ws.zip(seps).map { case (w, s) => w + s }.mkString + tail

  private def sample(n: Int): Seq[String] =
    (0 until n).flatMap(i => textGen.apply(Gen.Parameters.default, Seed(i.toLong)))

  // the reference tokenizer: text.tokens = split(trim(\s+ -> ' '), ' ')
  private def refTokens(s: String): Array[String] = {
    val t = s.replaceAll("\\s+", " ").stripPrefix(" ").stripSuffix(" ")
    t.split(" ", -1)
  }

  test("BigramCounts: per-doc pair counts equal the straight-line reference on fuzzed text") {
    import spark.implicits._
    val docs = sample(300)
    val got = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
      .select(col("doc_id"), explode(graft.plans.BigramCounts(col("text"))).as("pw"))
      .select(col("doc_id"), col("pw.prev"), col("pw.w"), col("pw.n"))
      .collect()
      .map(r => (r.getLong(0), Option(r.getString(1)), r.getString(2), r.getLong(3)))
      .groupBy(_._1)
      .view.mapValues(_.map(t => (t._2, t._3) -> t._4).toMap).toMap
    docs.zipWithIndex.foreach { case (t, i) =>
      val ws = refTokens(t)
      val expect = ws.indices
        .map(j => (if (j == 0) None else Some(ws(j - 1)), ws(j)))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      assert(got.getOrElse(i.toLong, Map.empty) == expect, s"doc $i: '$t'")
    }
  }

  test("BigramModelScore: the fold equals join-then-average semantics, dropped tail included") {
    import spark.implicits._
    val docs = sample(300)
    // a deliberately PARTIAL model: only pairs whose w is short score
    val model: Map[String, Map[String, Double]] = docs
      .flatMap { t =>
        val ws = refTokens(t)
        (1 until ws.length).map(j => (ws(j - 1), ws(j)))
      }
      .distinct
      .filter(_._2.length <= 2)
      .groupBy(_._1)
      .view.mapValues(_.map { case (p, w) => w -> (p.length + w.length) * 0.5 }.toMap)
      .toMap
    val b = spark.sparkContext.broadcast(model)
    val got = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
      .select(col("doc_id"), graft.plans.BigramModelScore(col("text"), b).as("u"))
      .select(col("doc_id"), col("u.n_bigrams"), col("u.s"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    docs.zipWithIndex.foreach { case (t, i) =>
      val ws = refTokens(t)
      val scored = (1 until ws.length).flatMap { j =>
        model.get(ws(j - 1)).flatMap(_.get(ws(j)))
      }
      val expect = (scored.length.toLong, scored.sum)
      assert(got(i.toLong)._1 == expect._1, s"doc $i n: '$t'")
      assert(math.abs(got(i.toLong)._2 - expect._2) < 1e-12, s"doc $i s: '$t'")
    }
    // the planted partial model actually exercised the dropped tail
    val total = docs.map(t => math.max(0, refTokens(t).length - 1)).sum
    assert(got.values.map(_._1).sum < total, "no pair was ever dropped")
  }
}
