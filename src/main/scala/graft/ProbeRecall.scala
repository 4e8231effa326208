package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (disposable, ProbeKnn's discipline): the ANN
  * recall-vs-nprobe curve at a given SF — does retrieval QUALITY
  * hold as the corpus grows, and what does each extra probed cell
  * buy? Ground truth = sim01 brute force; predictions = sim05 (the
  * oracle-checkable label-cell IVF) across nprobe, plus sim06 (the
  * trained quantizer) at its default.
  *
  * usage: graft.ProbeRecall    env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS
  */
object ProbeRecall {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession
      .configure(SparkSession.builder().master(s"local[$cpus]"), cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val lake = graft.catalog.Lake(spark, sfDir)
    val k = 10
    val nQ = 10
    val truth = graft.operators.Similarity
      .sim01TopKBruteForce(lake, k, nQ)
      .select(col("query_id"), col("neighbor_id"))
      .localCheckpoint()
    def recall(pred: org.apache.spark.sql.DataFrame): Double = {
      val hits = truth
        .join(pred.select(col("query_id"), col("neighbor_id")),
          Seq("query_id", "neighbor_id"), "left_semi")
        .count()
      hits.toDouble / (k * nQ)
    }
    for (np <- Seq(1, 3, 5, 8, 10)) {
      val r = recall(graft.operators.Similarity.sim05IvfAnn(lake, k, nQ, np))
      println(f"sim05 nprobe=$np%-2d  recall@$k = $r%.3f")
    }
    for (np <- Seq(3, 5)) {
      val r = recall(graft.operators.Similarity.sim06IvfTrained(lake, nprobe = np))
      println(f"sim06 nprobe=$np%-2d  recall@$k = $r%.3f (trained cells)")
    }
    // nlist sweep (VERDICT r13 #5: auto-sqrt(N) nlist measured WORSE
    // on uniform data — quantify nlist's effect on clustered vs
    // uniform corpora; SPARK_GRAFT_NLIST=8,64,141 overrides)
    sys.env.get("SPARK_GRAFT_NLIST").foreach { csv =>
      for (nl <- csv.split(",").map(_.trim.toInt)) {
        val t0 = System.nanoTime()
        val r6 = recall(
          graft.operators.Similarity
            .sim06IvfTrained(lake, nlist = nl, nprobe = math.max(2, nl / 8)))
        val d6 = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        val r14 = recall(
          graft.operators.Similarity
            .sim14IvfPq(lake, nlist = nl, nprobe = math.max(2, nl / 8),
              trainEvery = 16))
        val d14 = (System.nanoTime() - t1) / 1e9
        val t2 = System.nanoTime()
        val r15 = recall(
          graft.operators.Similarity.sim15IvfPqRefine(
            lake, refine = 32, nlist = nl, nprobe = math.max(2, nl / 8),
            trainEvery = 16))
        val d15 = (System.nanoTime() - t2) / 1e9
        println(
          f"nlist=$nl%-4d nprobe=${math.max(2, nl / 8)}%-3d sim06=$r6%.3f (${d6}%.0fs) " +
            f"sim14=$r14%.3f (${d14}%.0fs) sim15r32=$r15%.3f (${d15}%.0fs)"
        )
      }
    }
    for (te <- Seq(1, 16)) {
      val t0 = System.nanoTime()
      val r = recall(graft.operators.Similarity.sim14IvfPq(lake, trainEvery = te))
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"sim14 trainEvery=$te%-3d recall@$k = $r%.3f  build+search = $dt%.1f s")
    }
    for (
      // default shape (the oracle form), then the measured >=0.9
      // serving config at sf10: 8-bit codebooks, refine=64, wide
      // probe (BASELINE round 13 — on this uniform-random corpus,
      // PQ's documented worst case, high recall needs a wide ring
      // AND a wide probe; sampled training matched full training)
      (m, ks, refine, np, nl) <- Seq(
        (8, 16, 4, 3, 10),
        (8, 256, 64, 8, 10),
        (8, 256, 64, 10, 10)
      )
    ) {
      val t0 = System.nanoTime()
      val r = recall(
        graft.operators.Similarity.sim15IvfPqRefine(
          lake, refine = refine, nprobe = np, nlist = nl, m = m, ks = ks,
          trainEvery = 16)
      )
      val dt = (System.nanoTime() - t0) / 1e9
      println(
        f"sim15 m=$m%-3d ks=$ks%-4d refine=$refine%-3d nprobe=$np%-2d nlist=$nl%-4d recall@$k = $r%.3f  build+search = $dt%.1f s"
      )
    }
    spark.stop()
  }
}
