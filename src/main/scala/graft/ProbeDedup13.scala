package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Decade probe for dedup13's shuffle composition — dev tooling.
  * Measures, at a given SF, how much of the window-hash stream a
  * "seen-at-least-twice" pre-filter would actually keep: total window
  * occurrences, distinct hashes, hashes occurring >= 2 times, hashes
  * in >= 2 distinct docs, and the occurrence fraction covered by the
  * >= 2-occurrence set. The rare-window pre-filter (VERDICT r12 #1)
  * only pays if that fraction is small.
  *
  * usage: graft.ProbeDedup13
  * env:   SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS
  */
object ProbeDedup13 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession
      .configure(SparkSession.builder().master(s"local[$cpus]"), cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val lake = graft.catalog.Lake(spark, sfDir)
    val k = 8
    val prefix =
      "shared prefix banner alpha beta gamma delta epsilon zeta eta "
    val footer =
      " common footer block one two three four five six seven eight nine"
    val planted = when(
      col("doc_id") % 7 === 0,
      concat(col("t1"), lit(footer))
    ).otherwise(col("t1"))
    val grams = lake.documents
      .select(
        col("doc_id"),
        when(col("doc_id") % 5 === 0, concat(lit(prefix), col("text")))
          .otherwise(col("text"))
          .as("t1")
      )
      .select(
        col("doc_id"),
        posexplode(graft.plans.ShingleHashSeq(planted, k)).as(Seq("pos", "gh"))
      )
    val byHash = grams
      .groupBy("gh")
      .agg(count(lit(1)).as("occ"), countDistinct("doc_id").as("df"))
      .localCheckpoint()
    val row = byHash
      .agg(
        sum("occ").as("total_occ"),
        count(lit(1)).as("distinct_hashes"),
        sum(when(col("occ") >= 2, 1L).otherwise(0L)).as("hashes_occ2"),
        sum(when(col("df") >= 2, 1L).otherwise(0L)).as("hashes_df2"),
        sum(when(col("occ") >= 2, col("occ")).otherwise(0L)).as("occ_covered"),
        sum(when(col("df") >= 2, col("occ")).otherwise(0L)).as("occ_df2")
      )
      .collect()(0)
    val total = row.getAs[Long]("total_occ").toDouble
    println(
      s"""{"sf":"$sfDir","total_occ":${row.getAs[Long]("total_occ")},""" +
        s""""distinct_hashes":${row.getAs[Long]("distinct_hashes")},""" +
        s""""hashes_occ2":${row.getAs[Long]("hashes_occ2")},""" +
        s""""hashes_df2":${row.getAs[Long]("hashes_df2")},""" +
        s""""frac_occ_kept_occ2":${row.getAs[Long]("occ_covered") / total},""" +
        s""""frac_occ_kept_df2":${row.getAs[Long]("occ_df2") / total}}"""
    )
    spark.stop()
  }
}
