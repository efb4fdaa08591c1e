package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Size-bounded distinct-longs accumulator for [[CappedDistinctLongs]]:
  * stops ADMITTING new values once `cap + 1` are held (the +1 lets the
  * consumer distinguish "exactly cap" from "overflowed"). */
final class CappedLongSet(val cap: Int) {
  val values = new java.util.HashSet[java.lang.Long]()
  def add(v: Long): Unit =
    if (values.size() <= cap) { values.add(v); () }
  def mergeIn(other: CappedLongSet): Unit = {
    val it = other.values.iterator()
    while (it.hasNext && values.size() <= cap) { values.add(it.next()); () }
  }
}

/** `capped_distinct_longs(x, cap)` — the distinct values of a long
  * column, capped at `cap + 1` entries, sorted ascending.
  *
  * This exists for OBSERVED-METRIC probes ([[org.apache.spark.sql
  * .Observation]]): `collect_set` inside an observe accumulates the
  * UNBOUNDED full set in each task's (unspillable) metric accumulator
  * before any slice can trim it, so a pathological input (millions of
  * distinct values) OOMs exactly where the probe's cap was supposed to
  * fail loudly-but-safely. This buffer refuses to grow past cap + 1 —
  * per-task and post-merge memory is O(cap), always.
  *
  * Contract: a result of length <= cap is the EXACT sorted distinct
  * set; length cap + 1 means "more than cap distinct values exist" and
  * the surviving sample is partition-order dependent — consumers must
  * treat an overflowed result as a boolean, never as data (the degree
  * histogram falls back to a dedicated bounded job then). Declared
  * deterministic on that basis: the only nondeterministic content is
  * behind the overflow signal the consumers are required to honor. */
case class CappedDistinctLongs(child: Expression, cap: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[CappedLongSet]
    with UnaryLike[Expression] {

  require(cap >= 1, "capped_distinct_longs: cap must be >= 1")

  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "capped_distinct_longs"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType | ShortType | ByteType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"capped_distinct_longs requires an integral column, got " +
        other.catalogString)
  }

  override def createAggregationBuffer(): CappedLongSet =
    new CappedLongSet(cap)

  override def update(buffer: CappedLongSet,
      input: InternalRow): CappedLongSet = {
    val v = child.eval(input)
    if (v != null) buffer.add(v match {
      case l: java.lang.Long => l.longValue()
      case i: java.lang.Integer => i.longValue()
      case s: java.lang.Short => s.longValue()
      case b: java.lang.Byte => b.longValue()
      case other => other.asInstanceOf[Long]
    })
    buffer
  }

  override def merge(buffer: CappedLongSet,
      other: CappedLongSet): CappedLongSet = {
    buffer.mergeIn(other); buffer
  }

  override def eval(buffer: CappedLongSet): Any = {
    val arr = new Array[Long](buffer.values.size())
    val it = buffer.values.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    java.util.Arrays.sort(arr)
    new GenericArrayData(arr)
  }

  override def serialize(buffer: CappedLongSet): Array[Byte] = {
    val buf = ByteBuffer.allocate(8 + 8 * buffer.values.size())
    buf.putInt(buffer.cap)
    buf.putInt(buffer.values.size())
    val it = buffer.values.iterator()
    while (it.hasNext) buf.putLong(it.next())
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): CappedLongSet = {
    val buf = ByteBuffer.wrap(bytes)
    val acc = new CappedLongSet(buf.getInt)
    val n = buf.getInt
    var i = 0
    while (i < n) { acc.values.add(buf.getLong); i += 1 }
    acc
  }

  override def withNewMutableAggBufferOffset(o: Int): CappedDistinctLongs =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CappedDistinctLongs =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(
      c: Expression): CappedDistinctLongs = copy(child = c)
}

object CappedDistinctLongs {
  /** Column-level API (classic-session bridge Expression <-> Column). */
  def cappedDistinctLongs(x: Column, cap: Int): Column =
    org.apache.spark.sql.graft.Bridge.column(
      CappedDistinctLongs(
        org.apache.spark.sql.graft.Bridge.expression(x), cap)
        .toAggregateExpression())
}
