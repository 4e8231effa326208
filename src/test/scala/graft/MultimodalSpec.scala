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

  test("image payloads decode through ImageIO to real pixel features") {
    import java.awt.image.BufferedImage
    import Multimodal.MediaRow
    val sess = spark
    import sess.implicits._
    // Synthesize PNGs with known dimensions and a solid color.
    def png(w: Int, h: Int, rgb: Int): Array[Byte] = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val red = png(8, 6, 0xff0000)
    val gray = png(4, 4, 0x808080)
    val media = Seq(
      MediaRow(1L, red, "image/png", red.length.toLong),
      MediaRow(2L, gray, "image/png", gray.length.toLong),
      MediaRow(3L, "not an image".getBytes("UTF-8"), "image/png", 12L),
      MediaRow(4L, "plain text".getBytes("UTF-8"), "text/plain", 10L)
    ).toDS()
    val feats = Multimodal.extractFeatures(media)
      .collect().map(f => f.doc_id -> f.features).toMap
    // red 8x6: dims + aspect + pure-red channel means
    assert(feats(1L).take(3).sameElements(Array(8.0, 6.0, 1.3333)))
    assert(feats(1L)(3) == 1.0 && feats(1L)(4) == 0.0 && feats(1L)(5) == 0.0)
    // gray 4x4: all channels 128/255
    assert(feats(2L).take(3).sameElements(Array(4.0, 4.0, 1.0)))
    assert(feats(2L)(3) == 0.502 && feats(2L)(6) == 0.502)
    // undecodable image payload falls back to the byte histogram
    assert(math.abs(feats(3L).sum - 1.0) < 0.01)
    // non-image formats keep the histogram path
    assert(math.abs(feats(4L).sum - 1.0) < 0.01)
    feats.values.foreach(f => assert(f.length == Multimodal.FeatureWidth))
  }

  test("thumbnail resize box-averages pixels into the target grid") {
    import java.awt.image.BufferedImage
    // 8x8 image: left half pure red, right half pure blue
    val img = new BufferedImage(8, 8, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 8)
      img.setRGB(x, y, if (x < 4) 0xff0000 else 0x0000ff)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val thumb = Multimodal.thumbnail(bos.toByteArray, tw = 2, th = 2).get
    // left cells = red luma (0.299), right cells = blue luma (0.114)
    assert(thumb.length == 4)
    assert(thumb(0) == 0.299 && thumb(2) == 0.299)
    assert(thumb(1) == 0.114 && thumb(3) == 0.114)
    // undecodable payload yields None, not an exception
    assert(Multimodal.thumbnail("junk".getBytes("UTF-8")).isEmpty)
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
