package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Highest bigram occurrence count in a token array — the repetition
  * kernel of the quality panel. The declarative formulation
  * (`array_max(transform(array_distinct(bgs), d -> size(filter(bgs,
  * x = d))))`) is O(L²) string comparisons per row because each
  * distinct bigram rescans the array; this is one O(L) pass over the
  * tokens with an open-addressing count map keyed by the bigram's
  * boundary hash. Bigram identity uses both parts' bytes (no string
  * concatenation is materialized). CodegenFallback: the hash loop is
  * the work, one virtual call per row is noise.
  */
case class TopBigramCount(child: Expression)
    extends UnaryExpression
    with CodegenFallback {

  override def dataType: DataType = LongType

  override def prettyName: String = "top_bigram_count"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n < 2) return 0L
    // open HashMap on (prev, cur) token pairs; L-1 entries max
    val counts = new java.util.HashMap[(UTF8String, UTF8String), Long](n * 2)
    var best = 0L
    var i = 1
    var prev = arr.getUTF8String(0)
    while (i < n) {
      val cur = arr.getUTF8String(i)
      val key = (prev, cur)
      val c = counts.merge(key, 1L, (a, b) => a + b)
      if (c > best) best = c
      prev = cur
      i += 1
    }
    best
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TopBigramCount {
  def apply(tokens: Column): Column =
    Bridge.column(TopBigramCount(Bridge.expression(tokens)))
}
