package graft
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
class EntrySmokeSpec extends AnyFunSuite {
  test("entry works on a plain unconfigured session") {
    // driver-t1-like: a session without graft confs
    val spark = TestSpark.spark.newSession()
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query; rows-only queries are the documented set") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((o -- q).isEmpty, s"oracles without queries: ${o -- q}")
    // queries with no oracle get only the weaker rows-only gate — keep
    // that set explicit so a forgotten oracle entry fails loudly here
    val rowsOnly = Set(
      "dedup05_simhash", "mm01_binary_meta",
      "rel11_approx_stats", "rel14_heavy_hitters",
      "txt18_bpe_encode", "emb01_hash_embeddings",
      // Bloom filter bit layout is engine-private — no SQL oracle can
      // replay might_contain; spec-pinned against exact dedup07
      "dedup14_bloom_decontaminate"
    )
    assert(q -- o == rowsOnly, s"unexpected rows-only set: ${q -- o}")
  }
}
