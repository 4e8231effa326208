package graft

import graft.catalog.Lake
import graft.operators.Pipeline
import org.scalatest.funsuite.AnyFunSuite

class PipelineSpec extends AnyFunSuite {
  import TestSpark._
  private lazy val lake = Lake(spark, sfDir)

  test("pretrain pipeline: bins are contiguous per (source, shard); packing bounds hold") {
    val capacity = 512
    val chunkSize = 50
    val rows = Pipeline
      .pipe01PretrainCorpus(lake, chunkSize = chunkSize, capacity = capacity)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.groupBy(r => (r._1, r._2)).foreach { case ((source, shard), bins) =>
      val ids = bins.map(_._3).sorted
      // cumulative-sum binning can skip no ids: 0..max contiguous
      assert(ids.toSeq == (0L to ids.max).toSeq, s"$source/$shard bins not contiguous")
      bins.foreach { case (_, _, bin, nChunks, tokens) =>
        assert(nChunks >= 1)
        // streaming-packer bound: a bin closes once cum >= capacity, so
        // it can overshoot by at most one chunk's tokens
        assert(
          tokens <= capacity + chunkSize - 1,
          s"$source/$shard bin $bin holds $tokens tokens (cap $capacity + $chunkSize - 1)"
        )
      }
      // the (source, shard) re-key trade: only the FINAL bin of each
      // shard may be partial — every other bin is within one chunk of
      // capacity, so shard boundaries cost at most one partial bin each
      bins.sortBy(_._3).dropRight(1).foreach { case (_, _, bin, _, tokens) =>
        assert(
          tokens >= capacity - chunkSize + 1,
          s"$source/$shard non-final bin $bin underfilled at $tokens tokens"
        )
      }
    }
  }

  test("pretrain pipeline: packed chunk total equals an independent recount of the survivor set") {
    import graft.functions.text
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    // Recompute the funnel front (filter -> dedup) with the standalone
    // operators and the chunk count analytically: each survivor of n
    // tokens yields floor((n-1)/stride)+1 chunks. The pipeline's total
    // must match exactly — catches a broken stage join or a dedup that
    // keeps the wrong cardinality.
    val cleaned = Pipeline.cleanedDocs(lake)
    val passing = graft.operators.TextAnalysis
      .gopherVerdict(cleaned)
      .filter(col("passes"))
      .select("doc_id")
    val expected = cleaned
      .join(passing, "doc_id")
      .withColumn("fp", text.bagFingerprint(col("text")))
      .withColumn(
        "rn",
        row_number().over(Window.partitionBy("fp").orderBy("doc_id"))
      )
      .filter(col("rn") === 1)
      .select(size(text.tokens(col("text"))).as("n"))
      .agg(sum(floor((col("n") - 1) / 40) + 1))
      .head()
      .getAs[Long](0)
    val actual = Pipeline
      .pipe01PretrainCorpus(lake)
      .agg(sum("n_chunks"))
      .head()
      .getAs[Long](0)
    assert(actual == expected, s"pipeline packed $actual chunks, survivor recount says $expected")
  }

  test("weighted corpus: tail dropped, effective mass bounded, coverage consistent") {
    import graft.operators.{Pipeline, TextAnalysis}
    val rows = Pipeline.pipe02WeightedCorpus(lake).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    assert(rows.forall(r => Set("head", "middle")(r._2)), "tail leaked through")
    rows.foreach { case (src, b, n, eff, _) =>
      assert(n > 0, s"$src/$b empty")
      // weights are 1/|cluster| <= 1, so effective mass never exceeds
      // raw count and never hits zero
      assert(eff > 0.0 && eff <= n + 1e-9, s"$src/$b eff $eff vs n $n")
    }
    // the funnel keeps exactly the head+middle two-thirds of the
    // line-deduped corpus: per-lang terciles of 500 docs keep ~333
    val total = rows.map(_._3).sum
    val corpus = lake.documents.count()
    assert(total > corpus / 2 && total < corpus * 3 / 4, s"kept $total of $corpus")
    // every source that survives appears at most once per bucket
    assert(rows.groupBy(r => (r._1, r._2)).forall(_._2.length == 1))
  }

  test("eval suite: no contamination, no benchmark docs, split-consistent, quota-capped") {
    import org.apache.spark.sql.functions._
    val manifest = Pipeline.pipe03EvalSuite(lake).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(manifest.nonEmpty)
    // quotas: at most 20 per (split, lang), contiguous ranks from 1
    manifest.groupBy(t => (t._1, t._2)).foreach { case (k, rs) =>
      assert(rs.length <= 20, s"$k over quota")
      assert(rs.map(_._3).sorted.toSeq == (1L to rs.length).toSeq, s"$k ranks")
    }
    val selected = manifest.map(_._4).toSet
    // benchmark docs (doc_id < 10) never selected
    assert(selected.forall(_ >= 10L), "benchmark doc selected")
    // contaminated docs never selected
    val contam = graft.operators.Dedup.dedup07Decontaminate(lake)
      .collect().map(_.getLong(0)).toSet
    assert((selected & contam).isEmpty, "contaminated doc selected")
    // the manifest's split for each doc is exactly samp05's assignment
    // — and therefore near-dup cluster mates can never straddle splits
    val splits = graft.operators.Dedup.samp05LeakageSafeSplit(lake)
      .select(col("doc_id"), col("split")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    manifest.foreach { case (split, _, _, id) =>
      assert(splits(id) == split, s"doc $id split $split vs ${splits(id)}")
    }
  }
}
