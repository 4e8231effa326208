package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass 64-bit SimHash of a document: whitespace tokens,
  * 64-bit hash per token, per-bit frequency-weighted sign votes,
  * sign -> bit.
  *
  * The per-token hash is splitmix64(java31(token)) — the Java
  * polynomial string hash widened to 64 bits (seed 1125899906842597,
  * h = h*31 + char) finalized by the splitmix64 mixer (Steele et al.,
  * "Fast Splittable Pseudorandom Number Generators", OOPSLA'14; the
  * same mixer sim03's plane generator uses). Chosen over xxhash64
  * deliberately: every step is mod-2^64 integer arithmetic, so the
  * DuckDB oracle replays fingerprints bit-for-bit in SQL (UBIGINT
  * split-multiply; see SparkEntry's dedup05 oracle) — this moved
  * dedup05 from [rows-only] to full hash-checked. Replay scope: BMP
  * text without control-char edges (java31 folds UTF-16 units and
  * Java trim strips all chars <= ' '; the oracle folds code points
  * and trims the \s set) — the lake's text contract. Mixing quality is
  * equivalent for sign-vote purposes: splitmix64 passes the same
  * avalanche tests the xxh64 finalizer does.
  *
  * Replaces the explode(tokens) + groupBy(64 sum-CASE aggregates)
  * formulation — that shape shuffles EVERY token of the corpus; this
  * is map-only, so at 100 TB simhash costs one scan, and only the
  * (doc_id, simhash) pairs ever move. Values are identical: same
  * token hash, same vote rule (tie votes -> bit 0).
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any =
    SimHash64.hash(input.asInstanceOf[UTF8String])

  // Real codegen (a static call, not CodegenFallback): a fallback
  // expression collapses the WHOLE enclosing whole-stage-codegen
  // span to interpreted mode — measured 8.5x on dedup13's probe
  // stage (BASELINE round-13 #1) — and dedup05's fingerprint stage
  // is exactly such a scan-side map.
  override protected def doGenCode(
      ctx: CodegenContext,
      ev: ExprCode
  ): ExprCode =
    defineCodeGen(
      ctx,
      ev,
      c => s"graft.plans.SimHash64$$.MODULE$$.hash($c)"
    )

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash64 {
  def apply(text: Column): Column =
    Bridge.column(SimHash64(Bridge.expression(text)))

  /** splitmix64 finalizer — identical constants to sim03's plane
    * generator and the dedup05 oracle's split-multiply SQL. */
  @inline private def mix(z0: Long): Long = {
    var z = z0 * 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Whitespace-token sign-vote simhash; called from both the
    * interpreted eval and the generated code. Token boundaries are
    * Java-regex `\s` on the trimmed string (space \t \n \x0B \f \r),
    * matching the documented `trim.split("\\s+")` semantics without
    * the regex or the per-token String allocations. NOTE: RE2's `\s`
    * is [\t\n\f\r ] WITHOUT \x0B, so the dedup05 DuckDB oracle splits
    * on `[\s\x0B]+` to replay this set exactly (round-14 review —
    * an earlier comment here wrongly claimed the two sets matched). */
  def hash(input: UTF8String): Long = {
    val s = input.toString
    val n = s.length
    // trim bounds (Java String.trim: chars <= ' ')
    var lo = 0
    while (lo < n && s.charAt(lo) <= ' ') lo += 1
    var hi = n
    while (hi > lo && s.charAt(hi - 1) <= ' ') hi -= 1
    val votes = new Array[Int](64)
    var i = lo
    while (i < hi) {
      // trim strips every char <= ' ' (a superset of the separators),
      // so the trimmed string starts and ends on token chars and every
      // token here is non-empty
      var h = 1125899906842597L
      while (i < hi && !isSep(s.charAt(i))) {
        h = h * 31 + s.charAt(i)
        i += 1
      }
      val m = mix(h)
      var j = 0
      while (j < 64) {
        if (((m >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      while (i < hi && isSep(s.charAt(i))) i += 1
    }
    if (lo == hi) {
      // "".split("\\s+") parity: empty trimmed text yields ONE empty
      // token, whose hash is the mixed seed
      val m = mix(1125899906842597L)
      var j = 0
      while (j < 64) {
        if (((m >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
    }
    var fp = 0L
    var j = 0
    while (j < 64) {
      if (votes(j) > 0) fp |= (1L << j)
      j += 1
    }
    fp
  }

  @inline private def isSep(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'
}
