package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash of a token array (Charikar 2002, "Similarity estimation
  * techniques from rounding algorithms") as a native Catalyst expression:
  * per token, a 64-bit hash votes ±1 on each bit; the sign of each bit's
  * vote sum forms the fingerprint. Near-duplicate documents land within a
  * small Hamming distance.
  *
  * A native Expression (not a UDF) keeps the projection inside
  * whole-stage codegen's pipeline — at 100 TB this runs as a pure
  * map-side scan with no serialization boundary.
  */
case class SimHash64(child: Expression) extends UnaryExpression
    with InputTypeCheck {
  override protected def expectedInputType: String = "array<string>"
  override protected def acceptsInputType(dt: DataType): Boolean = dt match {
    case org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.StringType, _) => true
    case _ => false
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(SimHash64.simhash(input.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SimHash64$$.MODULE$$.simhash($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {

  /** FNV-1a 64-bit over UTF-8 bytes — stable across JVMs/runs. */
  def fnv1a64(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** Static kernel shared by interpreted eval and generated code. */
  def simhash(tokens: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val tok: UTF8String = tokens.getUTF8String(i)
        val h = fnv1a64(tok.getBytes)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Column-level API (classic-session bridge Expression <-> Column). */
  def simhash64(tokens: Column): Column =
    org.apache.spark.sql.graft.Bridge.column(
      SimHash64(org.apache.spark.sql.graft.Bridge.expression(tokens)))
}
