package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution is heavy-tailed —
  * the hand-rolled fallback for engines/paths where AQE's runtime
  * skew-join splitting can't see the skew (e.g. a join feeding an
  * immediate aggregation, or a key whose hot rows exceed what AQE's
  * partition-splitting handles).
  *
  * Mechanics: the fact side gets a uniform random-ish salt in
  * [0, salts) derived deterministically from a stable column (so
  * retries stay deterministic — no Math.random in distributed code);
  * the dimension side is replicated once per salt value. The join key
  * becomes (key, salt): a key carrying 10x the average volume now
  * spreads over `salts` partitions instead of hot-spotting one task.
  * Cost: dimension shuffle volume x salts — use for joins where the
  * dimension is far smaller than the skewed fact (the usual case).
  */
object Skew {

  /** Inner equi-join `fact ⋈ dim` on `key`, with the fact side salted
    * into `salts` sub-partitions per key. `saltSource` must be a
    * stable fact column (row id, primary key) so the salt is
    * deterministic under task retry. Result equals the plain join. */
  private val SaltCol = "__graft_salt"

  def saltedJoin(
      fact: DataFrame,
      dim: DataFrame,
      key: String,
      saltSource: String,
      salts: Int = 16
  ): DataFrame = {
    require(salts > 0, s"salts must be positive, got $salts")
    // The internal salt column must not collide with (and silently
    // clobber) a caller's column of the same name.
    require(
      !fact.columns.contains(SaltCol) && !dim.columns.contains(SaltCol),
      s"inputs must not already carry a '$SaltCol' column"
    )
    // XxHash64 extends HashExpression, which is declared non-nullable:
    // a null input is skipped and the seed (42) is returned, so a null
    // saltSource never drops the fact row from the inner (key, salt)
    // join. The mild caveat is spread, not loss — all-null saltSource
    // rows share the single salt pmod(42, salts).
    val saltedFact =
      fact.withColumn(
        SaltCol,
        pmod(xxhash64(col(saltSource)), lit(salts)).cast("int")
      )
    val repDim =
      dim.withColumn(SaltCol, explode(sequence(lit(0), lit(salts - 1))))
    saltedFact.join(repDim, Seq(key, SaltCol)).drop(SaltCol)
  }
}
