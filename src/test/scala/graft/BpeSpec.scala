package graft

import graft.catalog.Lake
import graft.functions.Bpe
import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BpeSpec extends AnyFunSuite {
  import TestSpark._
  private lazy val lake = Lake(spark, sfDir)

  // The classic Sennrich fixture: merge order is fully hand-checkable.
  private val fixture =
    Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))

  test("merge learning reproduces the hand-computed order on the fixture") {
    val merges = Bpe.learnMerges(fixture, 5)
    // (e,s) and (s,t) and (t,</w>) all count 9 -> lexicographic ties;
    // then es+t, est+</w>; then (l,o) and (o,w) at 7.
    assert(
      merges == Vector(
        ("e", "s"),
        ("es", "t"),
        ("est", "</w>"),
        ("l", "o"),
        ("lo", "w")
      )
    )
  }

  test("encode applies lowest-rank merges greedily; ids are exact") {
    val merges = Bpe.learnMerges(fixture, 5)
    val ranks = merges.zipWithIndex.toMap
    assert(Bpe.encodeWord("lowest", ranks) == Vector("low", "est</w>"))
    // vocab: "</w>" sorts before letters, then d e i l n o r s t w
    // (ids 0..10), then merge outputs es=11 est=12 est</w>=13 lo=14
    // low=15.
    val voc = Bpe.vocab(fixture, merges)
    assert(voc("</w>") == 0 && voc("d") == 1 && voc("w") == 10)
    assert(voc("es") == 11 && voc("est</w>") == 13 && voc("low") == 15)
    val ids = Bpe.encodeWord("lowest", ranks).map(voc)
    assert(ids == Vector(15, 13))
  }

  test("decode round-trips encode for every fixture word and unseen words") {
    val ranks = Bpe.learnMerges(fixture, 5).zipWithIndex.toMap
    Seq("low", "lower", "newest", "widest", "lowest", "zzz").foreach { w =>
      assert(Bpe.decode(Bpe.encodeWord(w, ranks)) == w)
    }
  }

  test("txt18 ids decode back to the normalized document text") {
    val (ranks, voc) = TextAnalysis.learnBpe(lake)
    val inv = voc.map(_.swap)
    val rows = TextAnalysis
      .txt18BpeEncode(lake)
      .filter(col("doc_id") < 5)
      .collect()
    assert(rows.nonEmpty)
    val texts = lake.documents
      .filter(col("doc_id") < 5)
      .select(col("doc_id"), lower(col("text")).as("t"))
      .collect()
      .map(r => r.getLong(0) -> r.getString(1))
      .toMap
    rows.foreach { r =>
      val ids = r.getAs[collection.Seq[Int]]("token_ids").toSeq
      assert(r.getAs[Long]("n_unk") == 0, "sample docs must be fully in-vocab")
      val decoded = Bpe.decode(ids.map(inv))
      val expected = texts(r.getAs[Long]("doc_id")).trim.replaceAll("\\s+", " ")
      assert(decoded == expected)
    }
    // And the encode path matches a direct driver-side encode.
    val doc0 = texts(0L).trim.replaceAll("\\s+", " ").split(" ")
    val direct = doc0.flatMap(w => Bpe.encodeWord(w, ranks).map(voc))
    assert(
      rows.find(_.getLong(0) == 0L).get
        .getAs[collection.Seq[Int]]("token_ids").toSeq == direct.toSeq
    )
  }
}
