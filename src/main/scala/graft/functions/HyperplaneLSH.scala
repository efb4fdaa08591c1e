package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Random-hyperplane LSH signature (Charikar 2002, "Similarity estimation
  * techniques from rounding algorithms") as a native Catalyst expression:
  * bit p of the result is the sign of the dot product between the input
  * vector and the p-th seeded pseudo-random Gaussian hyperplane.
  *
  * The plane matrix lives as ONE reference object on the expression (a
  * `planes*dim` double array, regenerated deterministically from the seed
  * wherever the expression deserializes) instead of `planes*dim` unrolled
  * `element_at * lit` terms. That keeps generated code size O(1) in the
  * embedding dimension — at dim=1024 the old expression tree blew past
  * codegen method limits and shipped multi-MiB task binaries; this is a
  * single virtual call, stays inside whole-stage codegen, and the task
  * binary carries only the (tiny) matrix.
  */
case class HyperplaneLSH(child: Expression, dim: Int, planes: Int,
    seed: Long) extends UnaryExpression with InputTypeCheck {
  require(planes > 0 && planes <= 64, "planes must fit a 64-bit signature")

  override protected def expectedInputType: String =
    "array<float> or array<double>"
  override protected def acceptsInputType(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) => true
    case ArrayType(org.apache.spark.sql.types.DoubleType, _) => true
    case _ => false
  }

  override def dataType: DataType = LongType

  @transient private lazy val mat: Array[Double] =
    HyperplaneLSH.planeMatrix(dim, planes, seed)

  @transient private lazy val isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(HyperplaneLSH.signature(
      input.asInstanceOf[ArrayData], mat, planes, isFloat))

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val matRef = ctx.addReferenceObj("hyperplanes", mat, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HyperplaneLSH$$.MODULE$$.signature(" +
        s"$c, $matRef, $planes, $isFloat)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): HyperplaneLSH = copy(child = newChild)
}

object HyperplaneLSH {

  /** Deterministic seeded Gaussian plane matrix, plane-major
    * (`mat(p*dim + j)` = component j of plane p). Every executor
    * regenerates the identical matrix from the seed. */
  def planeMatrix(dim: Int, planes: Int, seed: Long): Array[Double] = {
    val rng = new scala.util.Random(seed)
    Array.fill(planes * dim)(rng.nextGaussian())
  }

  /** Static kernel shared by interpreted eval and generated code. */
  def signature(vec: ArrayData, mat: Array[Double], planes: Int,
      isFloat: Boolean): Long = {
    val dim = mat.length / planes
    val n = math.min(vec.numElements(), dim)
    var out = 0L
    var p = 0
    while (p < planes) {
      val off = p * dim
      var dot = 0.0
      var j = 0
      while (j < n) {
        val x = if (isFloat) vec.getFloat(j).toDouble else vec.getDouble(j)
        dot += x * mat(off + j)
        j += 1
      }
      if (dot >= 0) out |= (1L << p)
      p += 1
    }
    out
  }

  /** Column-level API (classic-session bridge Expression <-> Column). */
  def hyperplaneLsh(vec: Column, dim: Int, planes: Int,
      seed: Long = 42L): Column =
    org.apache.spark.sql.graft.Bridge.column(
      HyperplaneLSH(org.apache.spark.sql.graft.Bridge.expression(vec),
        dim, planes, seed))
}
