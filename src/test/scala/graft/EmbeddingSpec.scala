package graft

import graft.catalog.Lake
import graft.operators.{Dedup, Embedding}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class EmbeddingSpec extends AnyFunSuite {
  import TestSpark._
  private lazy val lake = Lake(spark, sfDir)

  test("embeddings are deterministic across runs and partitionings") {
    def collectMap(parts: Int) =
      Embedding
        .embedDocuments(lake.documents.repartition(parts))
        .collect()
        .map(r => r.getLong(0) -> r.getSeq[Float](1).toVector)
        .toMap
    val a = collectMap(2)
    val b = collectMap(7)
    assert(a == b, "embedding must not depend on partitioning or row order")
    assert(a.nonEmpty)
  }

  test("every non-empty document embeds to an L2-normalized vector of the requested dim") {
    val rows = Embedding
      .embedDocuments(lake.documents, dim = 32)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, v) =>
      assert(v.length == 32, s"doc $id: dim ${v.length}")
      val nrm = math.sqrt(v.map(x => x.toDouble * x).sum)
      assert(math.abs(nrm - 1.0) < 1e-5, s"doc $id: norm $nrm")
    }
  }

  test("known token algebra: same text same vector; disjoint token sets differ") {
    val m = new Embedding.HashProjectionModel(64)
    val a1 = m.encode("alpha beta gamma")
    val a2 = m.encode("  ALPHA, beta; GAMMA!  ") // case/punct-insensitive tokens
    assert(a1.toSeq == a2.toSeq)
    val b = m.encode("delta epsilon zeta")
    assert(a1.toSeq != b.toSeq)
    assert(m.encode("").forall(_ == 0.0f), "empty text embeds to the zero vector")
  }

  test("generated embeddings feed the similarity machinery unchanged") {
    // Same (vec_id, v, nrm) contract as Similarity.vecs — run SemDeDup
    // over GENERATED vectors end to end.
    val frame = Embedding
      .embedDocuments(lake.documents)
      .select(
        col("vec_id"),
        graft.functions.vectors.toDouble(col("embedding")).as("v")
      )
      .withColumn("nrm", graft.functions.vectors.norm(col("v")))
      .filter(col("nrm") > 0)
    val n = frame.count()
    val out = Dedup.semanticDedup(frame, k = 4, iters = 1, tau = 0.95)
    assert(out.count() == n, "one row per input vector")
    // near-identical docs (if any) group; everyone else survives alone
    assert(out.filter(col("survivor")).count() <= n)
    assert(out.select("group_id").distinct().count() <= n)
  }

  test("semanticDedup auto-k keeps cell sizes bounded at larger N") {
    import spark.implicits._
    // 2500 synthetic unit vectors in near-uniform hash directions:
    // auto-k must pick ceil(sqrt(2500)) = 50 cells, bounding the
    // quadratic pair check to ~N/k-sized cells instead of one
    // 2500^2 block.
    val m = new Embedding.HashProjectionModel(64)
    val frame = spark
      .range(2500)
      .as[Long]
      .map(i => (i, m.encode(s"synthetic document number $i with token ${i % 97}")))
      .toDF("vec_id", "embedding")
      .select(
        col("vec_id"),
        graft.functions.vectors.toDouble(col("embedding")).as("v")
      )
      .withColumn("nrm", graft.functions.vectors.norm(col("v")))
    val out = Dedup.semanticDedup(frame, k = 0, iters = 1, tau = 0.99)
    assert(out.count() == 2500)
    val cellSizes = out.groupBy("cluster").count().collect().map(_.getLong(1))
    assert(cellSizes.length <= 50, s"auto-k must cap cells at ceil(sqrt(N)) = 50, got ${cellSizes.length}")
    // bounded-cell contract: no cell degenerates toward O(N) (which
    // would re-quadratify the pair join); deterministic inputs make
    // this stable run to run
    assert(cellSizes.max <= 500,
      s"largest cell ${cellSizes.max} of 2500 — cell bound failed")
  }

  test("emb01 reports unit norms and stable checksums") {
    val rows = Embedding.emb01HashEmbeddings(lake).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) == 64)
      val nrm = r.getDouble(2)
      assert(nrm == 1.0 || nrm == 0.0, s"doc ${r.getLong(0)}: norm $nrm")
    }
  }
}
