package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler string similarity as a native Catalyst expression —
  * Spark has no built-in; the reference uses it as a linkage baseline
  * (reference: scripts/run_baseline_comparisons.py:297-359, DuckDB
  * jaro_winkler_similarity).
  *
  * Standard algorithm, verified value-identical to DuckDB's: match
  * window floor(max/2)-1, half-transpositions, Winkler prefix bonus
  * (scale 0.1, prefix capped at 4) applied only when Jaro > 0.7.
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression
    with CodegenFallback {

  override def dataType: DataType = DoubleType

  override def prettyName: String = "jaro_winkler"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val s1 = a.asInstanceOf[UTF8String].toString
    val s2 = b.asInstanceOf[UTF8String].toString
    JaroWinkler.similarity(s1, s2)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression
  ): Expression = copy(left = newLeft, right = newRight)
}

object JaroWinkler {

  def apply(a: Column, b: Column): Column =
    Bridge.column(JaroWinkler(Bridge.expression(a), Bridge.expression(b)))

  def similarity(s1: String, s2: String): Double = {
    val n1 = s1.length
    val n2 = s2.length
    if (n1 == 0 && n2 == 0) return 1.0
    if (n1 == 0 || n2 == 0) return 0.0
    val window = math.max(math.max(n1, n2) / 2 - 1, 0)
    val m1 = new Array[Boolean](n1)
    val m2 = new Array[Boolean](n2)
    var matches = 0
    var i = 0
    while (i < n1) {
      val lo = math.max(0, i - window)
      val hi = math.min(n2 - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!m2(j) && s1.charAt(i) == s2.charAt(j)) {
          m1(i) = true; m2(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < n1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val m = matches.toDouble
    val jaro = (m / n1 + m / n2 + (m - t / 2) / m) / 3.0
    if (jaro <= 0.7) return jaro
    var prefix = 0
    while (prefix < math.min(4, math.min(n1, n2)) &&
      s1.charAt(prefix) == s2.charAt(prefix)) prefix += 1
    jaro + prefix * 0.1 * (1.0 - jaro)
  }
}
