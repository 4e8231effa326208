package graft

import graft.catalog.Lake
import graft.multimodal.Multimodal
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  import TestSpark._
  private lazy val lake = Lake(spark, sfDir)

  test("media rows carry payload bytes and consistent metadata") {
    val rows = Multimodal.asMedia(lake).take(5)
    rows.foreach { r =>
      assert(r.payload.length.toLong == r.n_bytes)
      assert(r.format == "text/plain")
    }
  }

  test("feature extraction is deterministic and fixed-width") {
    val a = Multimodal.extractFeatures(Multimodal.asMedia(lake))
      .collect().sortBy(_.doc_id)
    val b = Multimodal.extractFeatures(Multimodal.asMedia(lake))
      .collect().sortBy(_.doc_id)
    assert(a.length == b.length && a.length == 500)
    a.zip(b).foreach { case (x, y) =>
      assert(x.features.length == 8)
      assert(x.features.sameElements(y.features))
      // histogram is normalized: buckets sum to ~1
      assert(math.abs(x.features.sum - 1.0) < 0.01)
    }
  }
}
