package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Bounded top-k as a NATIVE AGGREGATE — the scale-correct shape for
  * "k best candidates per group" over a candidate stream many times
  * larger than its group count (the kNN inner loop).
  *
  * The alternative every sim*\/dedup* query used before round 8 — a
  * `row_number() OVER (PARTITION BY g ORDER BY score DESC)` window +
  * `rank <= k` filter — SORTS the full candidate stream: even with
  * the partial WindowGroupLimit, each map task must order its whole
  * slice before discarding rows beyond k. The round-8 sf1 probe
  * measured exactly that on sim08's 4·10^8-row candidate stream:
  * kernel+sum 23 s, kernel+window-top-k 275 s — the sort IS the
  * query.
  *
  * As an aggregate, top-k needs no sort at all: each map task feeds
  * candidates into a k-bounded binary heap per group (O(log k) per
  * row, k·16 bytes per group), partial heaps merge on the reduce
  * side, and the exchange carries n_groups·k pairs instead of a
  * sorted candidate stream. This is the standard scale formulation
  * (Spark's own ApproximatePercentile / collect_list precedent for
  * TypedImperativeAggregate; ObjectHashAggregateExec provides the
  * map-side partial pass — see GraftSession's fallback-threshold
  * note).
  *
  * Determinism contract (matches the window formulation verbatim, so
  * swapping one for the other cannot change results): candidate a
  * beats b iff score_a > score_b, ties to the SMALLER id. Output is
  * array<struct<score double, id long>> sorted best-first —
  * `posexplode` yields (rank - 1, neighbor) exactly as the old
  * `rank <= k` filter did. Null score or id: the candidate is
  * skipped (SQL aggregate convention).
  */
case class TopKByScore(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[TopKHeap] {
  require(k > 0, s"topk_by_score: k must be positive, got $k")

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = TopKByScore.resultType
  override def prettyName: String = "topk_by_score"

  override def createAggregationBuffer(): TopKHeap = new TopKHeap(k)

  override def update(buf: TopKHeap, input: InternalRow): TopKHeap = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      buf.insert(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKHeap, other: TopKHeap): TopKHeap = {
    other.foreach((s, i) => buf.insert(s, i))
    buf
  }

  override def eval(buf: TopKHeap): Any = {
    val sorted = buf.sortedBestFirst
    new GenericArrayData(sorted.map { case (s, i) =>
      InternalRow(s, i)
    })
  }

  override def serialize(buf: TopKHeap): Array[Byte] = buf.toBytes

  override def deserialize(bytes: Array[Byte]): TopKHeap =
    TopKHeap.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(n: Int): TopKByScore =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): TopKByScore =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]
  ): Expression = copy(score = newChildren(0), id = newChildren(1))
}

object TopKByScore {
  val resultType: DataType = ArrayType(
    StructType(
      Seq(StructField("score", DoubleType), StructField("id", LongType))
    ),
    containsNull = false
  )

  /** Column-API entry point; casts keep call sites honest. */
  def apply(score: Column, id: Column, k: Int): Column =
    Bridge.column(
      TopKByScore(
        Bridge.expression(score.cast("double")),
        Bridge.expression(id.cast("long")),
        k
      ).toAggregateExpression()
    )
}

/** k-bounded binary MIN-heap on (score, id): the root is the WORST
  * retained candidate (lowest score, ties to the larger id), so a
  * better incoming candidate replaces the root in O(log k). Plain
  * parallel primitive arrays — no boxing on the 10^8-row update
  * path. */
final class TopKHeap(val k: Int) {
  private val scores = new Array[Double](k)
  private val ids = new Array[Long](k)
  private var size = 0

  /** true iff (s1, i1) is WORSE than (s2, i2): lower score, ties to
    * the larger id (so the heap evicts larger ids first and the
    * retained set matches ORDER BY score DESC, id ASC). */
  @inline private def worse(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
    s1 < s2 || (s1 == s2 && i1 > i2)

  def insert(s: Double, i: Long): Unit = {
    if (size < k) {
      scores(size) = s; ids(size) = i; size += 1
      var c = size - 1
      while (c > 0 && worse(scores(c), ids(c), scores((c - 1) / 2), ids((c - 1) / 2))) {
        swap(c, (c - 1) / 2); c = (c - 1) / 2
      }
    } else if (worse(scores(0), ids(0), s, i)) {
      scores(0) = s; ids(0) = i
      var p = 0
      var done = false
      while (!done) {
        val l = 2 * p + 1; val r = l + 1
        var m = p
        if (l < size && worse(scores(l), ids(l), scores(m), ids(m))) m = l
        if (r < size && worse(scores(r), ids(r), scores(m), ids(m))) m = r
        if (m == p) done = true
        else { swap(p, m); p = m }
      }
    }
  }

  @inline private def swap(a: Int, b: Int): Unit = {
    val ts = scores(a); scores(a) = scores(b); scores(b) = ts
    val ti = ids(a); ids(a) = ids(b); ids(b) = ti
  }

  def foreach(f: (Double, Long) => Unit): Unit = {
    var i = 0
    while (i < size) { f(scores(i), ids(i)); i += 1 }
  }

  /** Retained candidates ordered (score DESC, id ASC). */
  def sortedBestFirst: Array[(Double, Long)] = {
    val out = new Array[(Double, Long)](size)
    var i = 0
    while (i < size) { out(i) = (scores(i), ids(i)); i += 1 }
    scala.util.Sorting.stableSort(
      out,
      (a: (Double, Long), b: (Double, Long)) =>
        a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)
    )
    out
  }

  def toBytes: Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + size * 16)
    bb.putInt(k); bb.putInt(size)
    var i = 0
    while (i < size) { bb.putDouble(scores(i)); bb.putLong(ids(i)); i += 1 }
    bb.array()
  }
}

object TopKHeap {
  def fromBytes(bytes: Array[Byte]): TopKHeap = {
    val bb = ByteBuffer.wrap(bytes)
    val h = new TopKHeap(bb.getInt())
    val n = bb.getInt()
    var i = 0
    // re-inserting preserves the heap invariant regardless of the
    // serialized order
    while (i < n) { h.insert(bb.getDouble(), bb.getLong()); i += 1 }
    h
  }
}
