package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}

/** Native Catalyst expressions for the embedding hot path.
  *
  * `zip_with(a, b, _*_)` + `aggregate` materializes an intermediate
  * array per row and walks it twice; at 10^5-10^9 comparisons (the
  * similarity-join inner loop) that allocation dominates. VectorDot
  * generates a single fused loop in whole-stage codegen — same
  * sequential double accumulation order, so results are bit-identical
  * to the higher-order-function formulation (and to the DuckDB
  * oracle).
  */
case class VectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  // Inputs must be array<double>; graft.functions.vectors guarantees
  // this (toDouble), so no ExpectsInputTypes coercion is needed.
  override def dataType: DataType = DoubleType

  override def prettyName: String = "vector_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression
  ): Expression = copy(left = newLeft, right = newRight)
}

object VectorDot {
  /** Column-API entry point. */
  def apply(a: Column, b: Column): Column =
    Bridge.column(VectorDot(Bridge.expression(a), Bridge.expression(b)))
}

/** SparkSessionExtensions hook: makes `vector_dot` available to SQL
  * users (`spark.sql("SELECT vector_dot(a, b) ...")`) when the
  * session is built with
  * `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.plans.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectFunction(GraftExtensions.vectorDotDescriptor)
}

object GraftExtensions {
  val vectorDotDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("vector_dot"),
    new ExpressionInfo(classOf[VectorDot].getName, "vector_dot"),
    (args: Seq[Expression]) => VectorDot(args(0), args(1))
  )

  /** Idempotent runtime registration for sessions built without the
    * extensions conf (e.g. the driver's Verify/Bench sessions). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      vectorDotDescriptor._1,
      vectorDotDescriptor._2,
      vectorDotDescriptor._3
    )
}
