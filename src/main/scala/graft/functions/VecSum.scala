package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Mutable (Σ vector, row count) accumulator for [[VecSumCountAgg]]. */
final class VecAcc(val dim: Int) {
  val sums = new Array[Double](dim)
  var n: Long = 0L

  def add(v: ArrayData, isFloat: Boolean): Unit = {
    // mirror the driver-local Lloyd loop's skip rule exactly
    // (Similarity.localKmeans): wrong-dim, null-element, or
    // NaN-carrying vectors are ignored, never partially summed.
    // (Without the isNullAt check a null slot reads as the zeroed
    // backing value — the row would count with a silent 0.0.)
    if (v.numElements() != dim) return
    var i = 0
    while (i < dim) {
      if (v.isNullAt(i)) return
      val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      if (x != x) return
      i += 1
    }
    i = 0
    while (i < dim) {
      sums(i) += (if (isFloat) v.getFloat(i).toDouble else v.getDouble(i))
      i += 1
    }
    n += 1
  }

  def mergeIn(other: VecAcc): Unit = {
    var i = 0
    while (i < dim) { sums(i) += other.sums(i); i += 1 }
    n += other.n
  }

  def serialize(): Array[Byte] = {
    val buf = ByteBuffer.allocate(4 + 8 * dim + 8)
    buf.putInt(dim)
    var i = 0
    while (i < dim) { buf.putDouble(sums(i)); i += 1 }
    buf.putLong(n)
    buf.array()
  }
}

/** `vec_sum_count(v, dim)` — per-group element-wise vector sum + row
  * count, as one TypedImperativeAggregate with map-side partial
  * combine. This is the k-means mean-update primitive: the previous
  * formulation (`posexplode(nv)` then `groupBy(bucket, pos).avg`)
  * shuffled n×dim ROWS per Lloyd iteration and collected k×dim Row
  * objects to the driver (~4.2 M at the documented k=65 536, dim 64
  * ceiling); this one shuffles one (dim-doubles + count) buffer per
  * (bucket × partition) and collects k rows. The mean is sums/n,
  * divided on the driver.
  *
  * Vectors whose length differs from `dim` or that contain NaN are
  * skipped — the same rule as the driver-local Lloyd path, so both
  * k-means paths see identical semantics. A group whose every vector
  * was skipped reports n = 0 (callers drop such buckets).
  */
case class VecSumCountAgg(child: Expression, dim: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[VecAcc] with UnaryLike[Expression] {

  require(dim > 0, "vec_sum_count: dim must be positive")

  override def dataType: DataType = StructType(Seq(
    StructField("sums", ArrayType(DoubleType, containsNull = false),
      nullable = false),
    StructField("n", LongType, nullable = false)))
  override def nullable: Boolean = false
  override def prettyName: String = "vec_sum_count"

  @transient private lazy val isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) | ArrayType(FloatType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vec_sum_count requires array<double|float>, got ${other.catalogString}")
  }

  override def createAggregationBuffer(): VecAcc = new VecAcc(dim)

  override def update(buffer: VecAcc, input: InternalRow): VecAcc = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[ArrayData], isFloat)
    buffer
  }

  override def merge(buffer: VecAcc, other: VecAcc): VecAcc = {
    buffer.mergeIn(other); buffer
  }

  override def eval(buffer: VecAcc): Any =
    new GenericInternalRow(Array[Any](
      new GenericArrayData(buffer.sums.clone()), buffer.n))

  override def serialize(buffer: VecAcc): Array[Byte] = buffer.serialize()

  override def deserialize(bytes: Array[Byte]): VecAcc = {
    val buf = ByteBuffer.wrap(bytes)
    val d = buf.getInt
    val acc = new VecAcc(d)
    var i = 0
    while (i < d) { acc.sums(i) = buf.getDouble; i += 1 }
    acc.n = buf.getLong
    acc
  }

  override def withNewMutableAggBufferOffset(o: Int): VecSumCountAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): VecSumCountAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): VecSumCountAgg =
    copy(child = c)
}

object VecSumCountAgg {
  private def bridge(c: Column): Expression =
    org.apache.spark.sql.graft.Bridge.expression(c)

  def vecSumCount(v: Column, dim: Int): Column =
    org.apache.spark.sql.graft.Bridge.column(
      VecSumCountAgg(bridge(v), dim).toAggregateExpression())
}
