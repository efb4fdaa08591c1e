package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** `might_contain` over a Bloom sketch carried as a BROADCAST handle
  * instead of a plan `Literal`. A multi-MB sketch embedded as a
  * `Literal` is serialized into the plan itself — it bloats every
  * stage's task binary and every `explain` string; a broadcast ships
  * the bytes to each executor exactly once via the torrent protocol
  * and the plan stays a few bytes (the handle). Child must be the
  * 64-bit hash of the probe key (same `xxhash64(seed)` used to build
  * the sketch).
  */
case class BloomBroadcastMightContain(
    bc: Broadcast[Array[Byte]], child: Expression)
    extends UnaryExpression with InputTypeCheck {

  override protected def expectedInputType: String = "bigint"
  override protected def acceptsInputType(dt: DataType): Boolean =
    dt == LongType

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_broadcast_might_contain"

  @transient private lazy val filter: BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bc.value))

  /** Executor-side entry for both eval paths; deserializes once per
    * executor/expression instance. */
  def mightContain(hash: Long): Boolean = filter.mightContainLong(hash)

  override def nullSafeEval(input: Any): Any =
    mightContain(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomMightContain", this,
      classOf[BloomBroadcastMightContain].getName)
    defineCodeGen(ctx, ev, c => s"$ref.mightContain($c)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): BloomBroadcastMightContain =
    copy(child = newChild)
}
