package graft

import graft.catalog.Lake
import graft.operators.TextAnalysis
import org.apache.spark.sql.functions.{avg, col}
import org.scalatest.funsuite.AnyFunSuite

class TextSelectionSpec extends AnyFunSuite {
  import TestSpark._
  private lazy val lake = Lake(spark, sfDir)

  test("DSIR importance: target-domain docs outscore the rest on average") {
    // The importance weight is built to rank target-looking text above
    // the raw mix: docs actually drawn from the target source carry
    // tokens whose target-model probability is inflated relative to
    // the corpus model, so their mean log-likelihood-ratio must exceed
    // the non-target mean. (A flat score here would mean the weight
    // carries no signal and selection degenerates to uniform.)
    val scored = TextAnalysis
      .txt21DsirImportance(lake)
      .join(lake.documents.select(col("doc_id"), col("source")), "doc_id")
    val Seq(tgtAvg, restAvg) = Seq("source = 'src0'", "source <> 'src0'")
      .map(p => scored.filter(p).agg(avg("avg_llr")).head().getDouble(0))
    assert(
      tgtAvg > restAvg,
      s"target mean LLR $tgtAvg not above non-target mean $restAvg"
    )
    // Weights are finite everywhere (smoothing covers unseen-in-target
    // words): no nulls/NaN in the scored output.
    assert(scored.filter(col("avg_llr").isNull || col("avg_llr").isNaN).count() == 0)
  }
}
