package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.types._

/** Bounded earliest-N (t, si) multiset for [[EarliestEventsAgg]]: a
  * size-capped max-heap ordered lexicographically on (t, si) — the
  * heap top is the LATEST kept pair, evicted whenever a smaller pair
  * arrives with the buffer full. Memory is O(min(group size, cap))
  * per group, at 12 bytes a pair. */
final class EarliestAcc(val cap: Int) {
  // parallel arrays as a binary max-heap (no boxing, compact serialize)
  var ts: Array[Long] = new Array[Long](math.min(cap, 16))
  var sis: Array[Int] = new Array[Int](math.min(cap, 16))
  var size: Int = 0

  private def lessAt(i: Int, j: Int): Boolean =
    ts(i) < ts(j) || (ts(i) == ts(j) && sis(i) < sis(j))

  private def swap(i: Int, j: Int): Unit = {
    val t = ts(i); ts(i) = ts(j); ts(j) = t
    val s = sis(i); sis(i) = sis(j); sis(j) = s
  }

  private def siftUp(i0: Int): Unit = {
    var i = i0
    while (i > 0 && lessAt((i - 1) / 2, i)) { swap(i, (i - 1) / 2); i = (i - 1) / 2 }
  }

  private def siftDown(): Unit = {
    var i = 0
    var done = false
    while (!done) {
      val l = 2 * i + 1; val r = 2 * i + 2
      var m = i
      if (l < size && lessAt(m, l)) m = l
      if (r < size && lessAt(m, r)) m = r
      if (m == i) done = true else { swap(i, m); i = m }
    }
  }

  def add(t: Long, si: Int): Unit = {
    if (size < cap) {
      if (size == ts.length) {
        val n = math.min(cap, ts.length * 2)
        ts = java.util.Arrays.copyOf(ts, n)
        sis = java.util.Arrays.copyOf(sis, n)
      }
      ts(size) = t; sis(size) = si; size += 1
      siftUp(size - 1)
    } else if (t < ts(0) || (t == ts(0) && si < sis(0))) {
      ts(0) = t; sis(0) = si
      siftDown()
    }
  }

  def mergeIn(other: EarliestAcc): Unit = {
    var i = 0
    while (i < other.size) { add(other.ts(i), other.sis(i)); i += 1 }
  }

  def serialize(): Array[Byte] = {
    val buf = ByteBuffer.allocate(8 + 12 * size)
    buf.putInt(cap); buf.putInt(size)
    var i = 0
    while (i < size) { buf.putLong(ts(i)); buf.putInt(sis(i)); i += 1 }
    buf.array()
  }
}

/** `earliest_events(t, si, cap)` — the earliest `cap` (t, si) pairs of
  * the group as an `array<struct<t, si>>` sorted ascending on (t, si).
  *
  * For any group with at most `cap` rows this is element-for-element
  * identical to `sort_array(collect_list(struct(t, si)))` (the law is
  * pinned in BehaviorSpec); the difference is the bound: collect_list
  * buffers are open-ended, so ONE pathological key (a bot user with
  * millions of in-funnel events) grows a single non-spillable
  * hash-agg buffer without limit — the residual risk the r12 funnel
  * scale probe documented. This aggregate caps every buffer at
  * 12·cap bytes, and because eviction runs in the map-side PARTIAL
  * aggregate too, the hot key's shuffle volume collapses from its raw
  * event count to ≤ cap per map partition before the exchange.
  *
  * Over-cap groups keep their EARLIEST cap pairs — for leftmost-greedy
  * funnel semantics (chains anchor at the first step-0 event and march
  * strictly forward in time) that is the prefix of the timeline the
  * chain scan reads first, so truncation only matters to a key whose
  * matched chain would span beyond its first `cap` in-funnel events.
  *
  * Null handling: a null `t` or `si` input row is SKIPPED (callers pin
  * non-null timelines; `collect_list` would instead keep a
  * null-fielded struct whose ordering is engine-specific — a
  * cross-engine oracle hazard this aggregate refuses to inherit). */
case class EarliestEventsAgg(left: Expression, right: Expression,
    cap: Int, mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[EarliestAcc]
    with BinaryLike[Expression] {

  require(cap > 0, "earliest_events: cap must be positive")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("t", LongType, nullable = false),
    StructField("si", IntegerType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "earliest_events"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"earliest_events requires (bigint, int), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override def createAggregationBuffer(): EarliestAcc = new EarliestAcc(cap)

  override def update(buffer: EarliestAcc, input: InternalRow): EarliestAcc = {
    val t = left.eval(input)
    val si = right.eval(input)
    if (t != null && si != null)
      buffer.add(t.asInstanceOf[Long], si.asInstanceOf[Int])
    buffer
  }

  override def merge(buffer: EarliestAcc, other: EarliestAcc): EarliestAcc = {
    buffer.mergeIn(other); buffer
  }

  override def eval(buffer: EarliestAcc): Any = {
    val n = buffer.size
    val idx = Array.range(0, n).sortWith { (i, j) =>
      buffer.ts(i) < buffer.ts(j) ||
        (buffer.ts(i) == buffer.ts(j) && buffer.sis(i) < buffer.sis(j))
    }
    val out = new Array[Any](n)
    var k = 0
    while (k < n) {
      out(k) = new GenericInternalRow(
        Array[Any](buffer.ts(idx(k)), buffer.sis(idx(k))))
      k += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override def serialize(buffer: EarliestAcc): Array[Byte] =
    buffer.serialize()

  override def deserialize(bytes: Array[Byte]): EarliestAcc = {
    val buf = ByteBuffer.wrap(bytes)
    val c = buf.getInt
    val n = buf.getInt
    val acc = new EarliestAcc(c)
    var i = 0
    while (i < n) {
      val t = buf.getLong; val s = buf.getInt
      acc.add(t, s)
      i += 1
    }
    acc
  }

  override def withNewMutableAggBufferOffset(o: Int): EarliestEventsAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): EarliestEventsAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): EarliestEventsAgg = copy(left = l, right = r)
}

object EarliestEventsAgg {
  private def bridge(c: Column): Expression =
    org.apache.spark.sql.graft.Bridge.expression(c)

  def earliestEvents(t: Column, si: Column, cap: Int): Column =
    org.apache.spark.sql.graft.Bridge.column(
      EarliestEventsAgg(bridge(t), bridge(si), cap).toAggregateExpression())
}
