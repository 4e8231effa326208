package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused shingle pipeline: text -> whitespace tokens -> word n-gram
  * shingles -> xxhash64 -> sorted distinct long array, in ONE pass
  * per document.
  *
  * The composable formulation (tokens -> wordShingles -> transform
  * (xxhash64) -> array_distinct -> array_sort) walks the document
  * several times and allocates an array per step; this expression is
  * the hot-path kernel for the dedup operators, where shingling every
  * document is the map-side cost at corpus scale. Hash values match
  * xxhash64(shingle_string) (same XXH64 seed 42), so results are
  * interchangeable with the composed form.
  */
case class ShingleHashes(child: Expression, n: Int)
    extends UnaryExpression
    with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "shingle_hashes"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val toks = s.trim.split("\\s+")
    if (toks.length < n) return new GenericArrayData(Array.emptyLongArray)
    val m = toks.length - (n - 1)
    val out = new Array[Long](m)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < m) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(toks(i + k))
        k += 1
      }
      val bytes = UTF8String.fromString(sb.toString)
      // same seed Spark's xxhash64 function uses (42)
      out(i) = XXH64.hashUnsafeBytes(
        bytes.getBaseObject, bytes.getBaseOffset, bytes.numBytes(), 42L
      )
      i += 1
    }
    java.util.Arrays.sort(out)
    // dedupe in place on the sorted array
    var w = 0
    var r = 1
    while (r < m) {
      if (out(r) != out(w)) { w += 1; out(w) = out(r) }
      r += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, w + 1))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleHashes {
  def apply(text: Column, n: Int): Column =
    Bridge.column(ShingleHashes(Bridge.expression(text), n))
}

/** ShingleHashes' POSITIONAL sibling: the i-th element is the
  * xxhash64 of the word n-gram STARTING at token i — in token order,
  * duplicates kept, so `posexplode` recovers (position, gram-hash)
  * pairs. This is the sliding-window kernel for span-level operators
  * (dedup13), where WHERE a window sits matters as much as what it
  * hashes; the set-semantics ShingleHashes loses exactly that. Same
  * tokenization and seed-42 XXH64 as ShingleHashes, so hashes are
  * interchangeable across both kernels. */
case class ShingleHashSeq(child: Expression, n: Int)
    extends UnaryExpression
    with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "shingle_hash_seq"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val toks = s.trim.split("\\s+")
    if (toks.length < n) return new GenericArrayData(Array.emptyLongArray)
    val m = toks.length - (n - 1)
    val out = new Array[Long](m)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < m) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(toks(i + k))
        k += 1
      }
      val bytes = UTF8String.fromString(sb.toString)
      out(i) = XXH64.hashUnsafeBytes(
        bytes.getBaseObject, bytes.getBaseOffset, bytes.numBytes(), 42L
      )
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleHashSeq {
  def apply(text: Column, n: Int): Column =
    Bridge.column(ShingleHashSeq(Bridge.expression(text), n))
}
