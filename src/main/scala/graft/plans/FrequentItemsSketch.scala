package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable heavy-hitters buffer: Misra-Gries counters plus the
  * error mass removed so far. `decr` bounds the undercount of every
  * estimate: true count ∈ [est, est + decr]. */
private[plans] final class MgBuffer(
    val counts: mutable.HashMap[UTF8String, Long],
    var decr: Long,
    var n: Long
)

/** Heavy-hitters (frequent items) sketch aggregate — Misra-Gries
  * summaries with the mergeability result of Agarwal et al. 2013
  * ("Mergeable Summaries", PODS'12): partial buffers of `capacity`
  * counters combine pointwise then re-trim, and the total decrement
  * mass `decr` still bounds every estimate's undercount, so the final
  * answer carries per-item deterministic bounds
  * [count_lb, count_lb + decr] regardless of how Spark partitioned or
  * merge-ordered the stream. Any item with true frequency
  * > n/(capacity+1) is guaranteed to survive.
  *
  * This is the 100 TB form of "top words": exact top-k needs a full
  * groupBy shuffle of every distinct token; this aggregate is one
  * pass, map-side partials of bounded size (capacity entries), and a
  * single tiny merge — the same trade rel11 makes for distinct counts
  * with HLL. The JVM hash-map inner loop is the work; a codegen'd
  * version would still call into it (same reason ApproximatePercentile
  * is imperative).
  *
  * eval emits the top `k` surviving entries as
  * array<struct<item, count_lb, count_ub>> ordered by estimate desc
  * (ties: item asc). Exact when `capacity` >= distinct items
  * (decr = 0, lb = ub = true count) — spec-pinned.
  */
case class FrequentItemsSketch(
    child: Expression,
    capacity: Int,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[MgBuffer] {

  require(capacity > 0 && k > 0, "capacity and k must be positive")

  override def prettyName: String = "frequent_items_sketch"
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(
      Seq(
        StructField("item", StringType, nullable = false),
        StructField("count_lb", LongType, nullable = false),
        StructField("count_ub", LongType, nullable = false)
      )
    ),
    containsNull = false
  )

  override def createAggregationBuffer(): MgBuffer =
    new MgBuffer(mutable.HashMap.empty, 0L, 0L)

  /** Classic MG step: hit increments; miss inserts while below
    * capacity; at capacity every counter decrements by one (zeros
    * evicted) — O(capacity) only on overflow, amortized O(1)/element
    * because each decrement pass removes mass added by prior steps. */
  override def update(buf: MgBuffer, input: InternalRow): MgBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.asInstanceOf[UTF8String]
      buf.n += 1
      buf.counts.get(item) match {
        case Some(c) => buf.counts.update(item, c + 1)
        case None if buf.counts.size < capacity =>
          // clone: UTF8String from a scan row may wrap reused memory
          buf.counts.update(item.clone(), 1L)
        case None =>
          buf.decr += 1
          val dead = mutable.ArrayBuffer.empty[UTF8String]
          buf.counts.foreach { case (key, c) =>
            if (c == 1L) dead += key else buf.counts.update(key, c - 1)
          }
          dead.foreach(buf.counts.remove)
      }
    }
    buf
  }

  /** Pointwise add, then trim back to `capacity` by subtracting the
    * (capacity+1)-largest combined count from every entry (Agarwal et
    * al.'s MG merge — the subtracted value joins the error mass). */
  override def merge(a: MgBuffer, b: MgBuffer): MgBuffer = {
    b.counts.foreach { case (key, c) =>
      a.counts.update(key, a.counts.getOrElse(key, 0L) + c)
    }
    a.n += b.n
    a.decr += b.decr
    if (a.counts.size > capacity) {
      val sorted = a.counts.values.toArray
      java.util.Arrays.sort(sorted)
      // (capacity+1)-th largest = index size-capacity-1 ascending
      val cut = sorted(a.counts.size - capacity - 1)
      a.decr += cut
      val dead = mutable.ArrayBuffer.empty[UTF8String]
      a.counts.foreach { case (key, c) =>
        if (c <= cut) dead += key else a.counts.update(key, c - cut)
      }
      dead.foreach(a.counts.remove)
    }
    a
  }

  override def eval(buf: MgBuffer): Any = {
    val top = buf.counts.toArray
      .sortBy { case (item, c) => (-c, item) }
      .take(k)
      .map { case (item, c) =>
        InternalRow(item, c, c + buf.decr)
      }
    new GenericArrayData(top.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: MgBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(buf.n)
    out.writeLong(buf.decr)
    out.writeInt(buf.counts.size)
    buf.counts.foreach { case (key, c) =>
      val bytes = key.getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MgBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readLong()
    val decr = in.readLong()
    val size = in.readInt()
    val m = mutable.HashMap.empty[UTF8String, Long]
    var i = 0
    while (i < size) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      m.update(UTF8String.fromBytes(b), in.readLong())
      i += 1
    }
    new MgBuffer(m, decr, n)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FrequentItemsSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FrequentItemsSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]
  ): Expression = copy(child = newChildren.head)
}

object FrequentItemsSketch {
  def apply(c: Column, capacity: Int, k: Int): Column =
    Bridge.column(
      FrequentItemsSketch(Bridge.expression(c), capacity, k)
        .toAggregateExpression()
    )
}
