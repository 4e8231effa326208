package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass per-string character statistics: code-point count,
  * distinct code points, and Shannon entropy (bits/char) over the
  * code-point frequency distribution — the information-density
  * quality signal (low entropy = keyboard mash / repeated filler,
  * used alongside the Gopher rules when filtering web text).
  *
  * The declarative formulation (explode per character, groupBy
  * (doc, char), two more aggregations) shuffles one row PER
  * CORPUS CHARACTER — at 100 TB that is the whole corpus through the
  * exchange, for a per-row scalar. This computes all three values in
  * a single map-side pass with an open count map (alphabet-sized, not
  * text-sized), so the stage stays embarrassingly parallel.
  *
  * Iteration is by CODE POINT (not UTF-16 unit) to match engines that
  * count supplementary-plane characters once. CodegenFallback: the
  * count loop is the work, one virtual call per row is noise (the
  * TopBigramCount argument).
  */
case class CharInfo(child: Expression)
    extends UnaryExpression
    with CodegenFallback {

  override def dataType: DataType = StructType(
    Seq(
      StructField("n_cp", LongType, nullable = false),
      StructField("n_uniq", LongType, nullable = false),
      StructField("entropy", DoubleType, nullable = false)
    )
  )

  override def prettyName: String = "char_info"

  private val LOG2 = math.log(2.0)

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val counts = new java.util.HashMap[Integer, Long](64)
    var i = 0
    var n = 0L
    while (i < s.length) {
      val cp = s.codePointAt(i)
      counts.merge(cp, 1L, (a, b) => a + b)
      n += 1
      i += Character.charCount(cp)
    }
    var ent = 0.0
    if (n > 0L) {
      val it = counts.values().iterator()
      while (it.hasNext) {
        val p = it.next().toDouble / n
        ent -= p * (math.log(p) / LOG2)
      }
    }
    InternalRow(n, counts.size().toLong, ent)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharInfo {
  def apply(text: Column): Column =
    Bridge.column(CharInfo(Bridge.expression(text)))
}
