package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass 64-bit SimHash of a document: whitespace tokens,
  * xxhash64 per token (seed 42, matching Spark's xxhash64 function),
  * per-bit frequency-weighted sign votes, sign -> bit.
  *
  * Replaces the explode(tokens) + groupBy(64 sum-CASE aggregates)
  * formulation — that shape shuffles EVERY token of the corpus; this
  * is map-only, so at 100 TB simhash costs one scan, and only the
  * (doc_id, simhash) pairs ever move. Values are identical: same
  * token hash, same vote rule (tie votes -> bit 0).
  */
case class SimHash64(child: Expression)
    extends UnaryExpression
    with CodegenFallback {

  override def dataType: DataType = LongType

  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val toks = s.trim.split("\\s+")
    val votes = new Array[Int](64)
    var i = 0
    while (i < toks.length) {
      val t = UTF8String.fromString(toks(i))
      val h = XXH64.hashUnsafeBytes(
        t.getBaseObject, t.getBaseOffset, t.numBytes(), 42L
      )
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      i += 1
    }
    var fp = 0L
    var j = 0
    while (j < 64) {
      if (votes(j) > 0) fp |= (1L << j)
      j += 1
    }
    fp
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash64 {
  def apply(text: Column): Column =
    Bridge.column(SimHash64(Bridge.expression(text)))
}
