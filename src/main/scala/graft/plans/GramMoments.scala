package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** First and second moments of a vector column in ONE aggregation
  * pass: n, Σv, and the d×d Gram matrix Σ v·vᵀ — everything PCA's
  * covariance needs (cov = Σvvᵀ/n − μμᵀ).
  *
  * The scale shape this replaces (emb02's round-7 form): a DOUBLE
  * posexplode of every vector against itself — d² = 4096 rows per
  * embedding through a (i, j) hash aggregate, a 4096× row
  * amplification that holds at d = 64 but becomes ~590k rows per
  * vector at a real encoder's d = 768. Here each map task folds its
  * vectors into one flat d² accumulator (the classic partial-Gram
  * decomposition of X·Xᵀ), partials merge elementwise, and the
  * exchange carries ONE buffer per task instead of n·d² rows. The
  * output is a single struct row — bounded output, so per-row cost
  * only amortizes better as partitions grow.
  *
  * Trades exact fp association for shape (sums fold in partition
  * order, then merge order), like every distributive SUM; consumers
  * round at 4 dp where cross-engine equality is gated.
  *
  * Dimension is learned from the first non-null vector; subsequent
  * vectors must match (require) — heterogeneous dims are a data bug
  * worth failing loudly on, not averaging over.
  */
case class GramMoments(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[GramBuffer] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = GramMoments.resultType
  override def prettyName: String = "gram_moments"

  override def createAggregationBuffer(): GramBuffer = new GramBuffer

  override def update(buf: GramBuffer, input: InternalRow): GramBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      buf.add(arr.toDoubleArray())
    }
    buf
  }

  override def merge(buf: GramBuffer, other: GramBuffer): GramBuffer = {
    buf.mergeFrom(other)
    buf
  }

  override def eval(buf: GramBuffer): Any = {
    val d = buf.dim
    InternalRow(
      buf.n,
      new GenericArrayData(if (d == 0) Array.empty[Double] else buf.s),
      new GenericArrayData(if (d == 0) Array.empty[Double] else buf.m)
    )
  }

  override def serialize(buf: GramBuffer): Array[Byte] = buf.toBytes

  override def deserialize(bytes: Array[Byte]): GramBuffer =
    GramBuffer.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(n: Int): GramMoments =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): GramMoments =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]
  ): Expression = copy(child = newChildren(0))
}

object GramMoments {
  /** n, flat Σv (length d), flat row-major Σ v·vᵀ (length d²). */
  val resultType: DataType = StructType(
    Seq(
      StructField("n", LongType, nullable = false),
      StructField("s", ArrayType(DoubleType, containsNull = false)),
      StructField("m", ArrayType(DoubleType, containsNull = false))
    )
  )

  def apply(vec: Column): Column =
    Bridge.column(
      GramMoments(Bridge.expression(vec)).toAggregateExpression()
    )
}

/** Flat-array accumulator: lazily sized on the first vector. */
final class GramBuffer {
  var dim: Int = 0
  var n: Long = 0L
  var s: Array[Double] = null
  var m: Array[Double] = null

  def add(v: Array[Double]): Unit = {
    if (dim == 0) {
      dim = v.length
      s = new Array[Double](dim)
      m = new Array[Double](dim * dim)
    }
    require(
      v.length == dim,
      s"gram_moments: dimension mismatch (${v.length} vs $dim)"
    )
    n += 1
    var i = 0
    while (i < dim) {
      val vi = v(i)
      s(i) += vi
      val off = i * dim
      var j = 0
      while (j < dim) { m(off + j) += vi * v(j); j += 1 }
      i += 1
    }
  }

  def mergeFrom(o: GramBuffer): Unit = {
    if (o.dim == 0) return
    if (dim == 0) {
      dim = o.dim
      s = new Array[Double](dim)
      m = new Array[Double](dim * dim)
    }
    require(o.dim == dim, s"gram_moments: dimension mismatch (${o.dim} vs $dim)")
    n += o.n
    var i = 0
    while (i < dim) { s(i) += o.s(i); i += 1 }
    var k = 0
    while (k < dim * dim) { m(k) += o.m(k); k += 1 }
  }

  def toBytes: Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 + dim * 8 + dim * dim * 8)
    bb.putInt(dim); bb.putLong(n)
    var i = 0
    while (i < dim) { bb.putDouble(s(i)); i += 1 }
    var k = 0
    while (k < dim * dim) { bb.putDouble(m(k)); k += 1 }
    bb.array()
  }
}

object GramBuffer {
  def fromBytes(bytes: Array[Byte]): GramBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val b = new GramBuffer
    b.dim = bb.getInt()
    b.n = bb.getLong()
    if (b.dim > 0) {
      b.s = new Array[Double](b.dim)
      b.m = new Array[Double](b.dim * b.dim)
      var i = 0
      while (i < b.dim) { b.s(i) = bb.getDouble(); i += 1 }
      var k = 0
      while (k < b.dim * b.dim) { b.m(k) = bb.getDouble(); k += 1 }
    }
    b
  }
}
