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

/** Block kernel for the EXACT cosine-threshold similarity join
  * (sim02): both relations arrive packed as per-block
  * `array<struct<id bigint, v array<double>, nrm double>>` rows, and
  * one eval computes every cross-block pair in a fused primitive
  * loop, emitting only the pairs whose 4-dp-rounded cosine clears the
  * threshold.
  *
  * Why a block expression and not a row-level join: the declarative
  * pair join materializes |A|·|B| joined rows each COPYING two
  * 64-double arrays before the dot product ever runs — at sf1 that is
  * 75M pairs × 1 KB ≈ 75 GB of UnsafeRow traffic for a 10-GFLOP
  * kernel (measured 7.7 s; this shape runs the same pairs in the
  * arithmetic, not the copies). The blocks are unpacked ONCE per eval
  * into flat primitive arrays, so the inner loop is a pure
  * multiply-add walk — the FAISS IndexFlatIP inner kernel
  * (reference: scripts/build_embedding_linkage.py:246-273)
  * re-expressed over Spark's 2-D blocked join.
  *
  * Determinism: dot folds sequentially ascending (VectorDot's order,
  * = the DuckDB oracle's list_dot_product), cos = dot/(nrmA*nrmB).
  * The threshold test replays Spark's `round(cos,4) >= t` exactly:
  * HALF_UP decimal rounding of the double's shortest decimal form
  * (BigDecimal.valueOf), with a raw prefilter at t - 1e-4 so the
  * BigDecimal allocation runs only on the boundary band, not on all
  * |A|·|B| pairs. Emitted cos_raw is unrounded — the caller applies
  * Spark's own `round` so gate values come from one code path. */
case class BlockThresholdDots(
    left: Expression,
    right: Expression,
    threshold: Double
) extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
  import org.apache.spark.sql.catalyst.util.GenericArrayData
  import org.apache.spark.sql.types.{ArrayType, LongType, StructField, StructType}

  override def dataType: DataType = BlockThresholdDots.resultType
  override def prettyName: String = "block_threshold_dots"

  /** (ids, flat row-major vectors, norms, dim) unpacked from a packed
    * block; dim 0 for an empty block. */
  private def unpack(a: ArrayData): (Array[Long], Array[Double], Array[Double], Int) = {
    val n = a.numElements()
    val ids = new Array[Long](n)
    val nrms = new Array[Double](n)
    var d = 0
    var i = 0
    // first pass to learn the dimension (blocks are homogeneous)
    if (n > 0) d = a.getStruct(0, 3).getArray(1).numElements()
    val flat = new Array[Double](n * d)
    while (i < n) {
      val row = a.getStruct(i, 3)
      ids(i) = row.getLong(0)
      nrms(i) = row.getDouble(2)
      val v = row.getArray(1)
      val m = math.min(d, v.numElements())
      var j = 0
      while (j < m) { flat(i * d + j) = v.getDouble(j); j += 1 }
      i += 1
    }
    (ids, flat, nrms, d)
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val (aIds, aFlat, aNrm, dA) = unpack(l.asInstanceOf[ArrayData])
    val (bIds, bFlat, bNrm, dB) = unpack(r.asInstanceOf[ArrayData])
    val d = math.min(dA, dB)
    val pre = threshold - 1e-4
    val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    var i = 0
    while (i < aIds.length) {
      val ao = i * dA
      val an = aNrm(i)
      var k = 0
      while (k < bIds.length) {
        val bo = k * dB
        var s = 0.0
        var j = 0
        while (j < d) { s += aFlat(ao + j) * bFlat(bo + j); j += 1 }
        val cos = s / (an * bNrm(k))
        if (cos > pre) {
          val rounded = java.math.BigDecimal
            .valueOf(cos)
            .setScale(4, java.math.RoundingMode.HALF_UP)
            .doubleValue()
          if (rounded >= threshold) {
            out += new GenericInternalRow(
              Array[Any](aIds(i), bIds(k), cos)
            )
          }
        }
        k += 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray[Any])
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression
  ): Expression = copy(left = newLeft, right = newRight)
}

object BlockThresholdDots {
  import org.apache.spark.sql.types.{ArrayType, LongType, StructField, StructType}

  val resultType: DataType = ArrayType(
    StructType(
      Seq(
        StructField("a_id", LongType, nullable = false),
        StructField("b_id", LongType, nullable = false),
        StructField("cos_raw", DoubleType, nullable = false)
      )
    ),
    containsNull = false
  )

  def apply(a: Column, b: Column, threshold: Double): Column =
    Bridge.column(
      BlockThresholdDots(Bridge.expression(a), Bridge.expression(b), threshold)
    )
}

/** SparkSessionExtensions hook: exposes every graft native expression
  * to SQL users (`spark.sql("SELECT vector_dot(a, b) ...")`) when the
  * session is built with `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.plans.GraftExtensions`.
  *
  * Registered: vector_dot(arr, arr), jaro_winkler(str, str),
  * simhash64(str), sorted_intersect_count(arr, arr),
  * shingle_hashes(str, n) — n must be a constant (it shapes the
  * kernel, like the width argument of substring). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.descriptors.foreach(ext.injectFunction)
}

object GraftExtensions {
  private type Descriptor =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  private def d(
      name: String,
      clazz: Class[_],
      arity: Int,
      build: Seq[Expression] => Expression
  ): Descriptor = {
    val checked: Seq[Expression] => Expression = { args =>
      if (args.length != arity)
        throw new IllegalArgumentException(
          s"$name expects $arity argument(s), got ${args.length}"
        )
      build(args)
    }
    (FunctionIdentifier(name), new ExpressionInfo(clazz.getName, name), checked)
  }

  private def constInt(e: Expression, arg: String): Int = e match {
    case lit if lit.foldable => lit.eval() match {
      case i: Int => i
      case other =>
        throw new IllegalArgumentException(s"$arg must be an int literal, got $other")
    }
    case _ =>
      throw new IllegalArgumentException(s"$arg must be a constant")
  }

  val descriptors: Seq[Descriptor] = Seq(
    d("vector_dot", classOf[VectorDot], 2, args => VectorDot(args(0), args(1))),
    d("jaro_winkler", classOf[JaroWinkler], 2, args => JaroWinkler(args(0), args(1))),
    d("simhash64", classOf[SimHash64], 1, args => SimHash64(args(0))),
    d(
      "sorted_intersect_count",
      classOf[SortedIntersectCount],
      2,
      args => SortedIntersectCount(args(0), args(1))
    ),
    d(
      "shingle_hashes",
      classOf[ShingleHashes],
      2,
      args => ShingleHashes(args(0), constInt(args(1), "shingle order"))
    ),
    d(
      "top_bigram_count",
      classOf[TopBigramCount],
      1,
      args => TopBigramCount(args(0))
    ),
    // Aggregate: the analyzer wraps a bare AggregateFunction in
    // AggregateExpression during resolution, so the builder returns
    // the function itself.
    d(
      "frequent_items_sketch",
      classOf[FrequentItemsSketch],
      3,
      args =>
        FrequentItemsSketch(
          args(0),
          constInt(args(1), "capacity"),
          constInt(args(2), "k")
        )
    ),
    d(
      "topk_by_score",
      classOf[TopKByScore],
      3,
      args => TopKByScore(args(0), args(1), constInt(args(2), "k"))
    ),
    d(
      "gram_moments",
      classOf[GramMoments],
      1,
      args => GramMoments(args(0))
    )
  )

  /** Idempotent runtime registration for sessions built without the
    * extensions conf (e.g. the driver's Verify/Bench sessions). */
  def register(spark: SparkSession): Unit =
    descriptors.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}
