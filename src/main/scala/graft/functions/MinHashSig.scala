package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** MinHash signature (Broder 1997, "On the resemblance and containment
  * of documents") of a string-array shingle set as a native Catalyst
  * expression: `numHashes` seeded 32-bit min-hashes, one pass over the
  * tokens (each token hashed once, then remixed per seed with a
  * splitmix64 finalizer).
  *
  * A native Expression rather than nested `transform`/`array_min`
  * lambdas for two reasons that matter at 100 TB:
  *  - the lambda form re-evaluates the (computed) shingle-array child
  *    inside EVERY seed branch once CollapseProject inlines it —
  *    O(numHashes × shingling) per row, observed as a 70s+ stall on a
  *    5k-doc corpus;
  *  - the kernel is allocation-free per token and stays inside
  *    whole-stage codegen.
  */
case class MinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression with InputTypeCheck {
  require(numHashes > 0)

  override protected def expectedInputType: String = "array<string>"
  override protected def acceptsInputType(dt: DataType): Boolean = dt match {
    case ArrayType(org.apache.spark.sql.types.StringType, _) => true
    case _ => false
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      MinHashSig.signature(input.asInstanceOf[ArrayData], numHashes))

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.MinHashSig$$.MODULE$$.signature($c, $numHashes))")

  override protected def withNewChildInternal(
      newChild: Expression): MinHashSig = copy(child = newChild)
}

object MinHashSig {

  /** splitmix64 finalizer — full-avalanche mix of a 64-bit value. */
  private def mix64(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** One pass: hash each token once (FNV-1a 64), then derive the k-th
    * hash family member by remixing with a seed constant. */
  def signature(tokens: ArrayData, numHashes: Int): Array[Int] = {
    val mins = Array.fill(numHashes)(Int.MaxValue)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val tok: UTF8String = tokens.getUTF8String(i)
        val h = SimHash64.fnv1a64(tok.getBytes)
        var k = 0
        while (k < numHashes) {
          val v = mix64(h ^ (k * 0x9e3779b97f4a7c15L)).toInt
          if (v < mins(k)) mins(k) = v
          k += 1
        }
      }
      i += 1
    }
    mins
  }

  /** Column-level API (classic-session bridge Expression <-> Column). */
  def minhashSig(tokens: Column, numHashes: Int): Column =
    org.apache.spark.sql.graft.Bridge.column(
      MinHashSig(org.apache.spark.sql.graft.Bridge.expression(tokens),
        numHashes))
}
