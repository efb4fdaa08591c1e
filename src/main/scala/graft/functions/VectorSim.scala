package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** One-pass vector similarity kernels as a native Catalyst expression.
  *
  * The column-function forms (`aggregate`/`zip_with` lambdas) cost three
  * separate array traversals per cosine — and `ArrayAggregate` is a
  * CodegenFallback, so every element bounces through interpreted lambda
  * eval with boxed doubles. This expression computes dot product and
  * both norms in ONE fused loop inside whole-stage codegen; on the
  * brute-force ANN scan that is roughly an order of magnitude per-row.
  *
  * Modes:
  *  - `Dot`: plain double dot product (sequential fold, deterministic).
  *  - `Cos`: cosine similarity; 0.0 when either norm is 0.
  *  - `QCos`: cosine over ×1000 HALF_UP-quantized integer views of both
  *    vectors, with EXACT long accumulation — bitwise-reproducible on
  *    any partitioning/engine, mirroring [[graft.functions.quantize]]
  *    (which mirrors Spark's `round`: `BigDecimal.valueOf(x).setScale(0,
  *    HALF_UP)`) so oracle queries keep hashing identically.
  *
  * Null semantics match the lambda forms they replace: a null array, a
  * null element, or a length mismatch yields NULL (zip_with pads the
  * short side with nulls, which poisons the fold — embeddings are
  * fixed-dimension, so a mismatch is corrupt input, not a case to
  * silently score).
  */
case class VectorSim(left: Expression, right: Expression, mode: Int)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def elemCode(dt: DataType): Int = dt match {
    case ArrayType(FloatType, _) => 0
    case ArrayType(DoubleType, _) => 1
    case ArrayType(LongType, _) => 2
    case ArrayType(IntegerType, _) => 3
    case _ => -1
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemCode(left.dataType) >= 0 && elemCode(right.dataType) >= 0)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires numeric array inputs, got " +
        s"${left.dataType.catalogString} / ${right.dataType.catalogString}")

  @transient private lazy val tcL = elemCode(left.dataType)
  @transient private lazy val tcR = elemCode(right.dataType)

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorSim.kernel(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      mode, tcL, tcR)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |java.lang.Double ${ev.value}_r =
         |  graft.functions.VectorSim$$.MODULE$$.kernel(
         |    $a, $b, $mode, $tcL, $tcR);
         |if (${ev.value}_r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ${ev.value}_r.doubleValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): VectorSim = copy(left = newLeft, right = newRight)
}

object VectorSim {
  val Dot = 0
  val Cos = 1
  val QCos = 2

  private def get(v: ArrayData, i: Int, tc: Int): Double = tc match {
    case 0 => v.getFloat(i).toDouble
    case 1 => v.getDouble(i)
    case 2 => v.getLong(i).toDouble
    case _ => v.getInt(i).toDouble
  }

  /** Spark-`round`-compatible ×1000 quantization (HALF_UP on the
    * decimal string form, then the double→long truncating cast). */
  def q1000(x: Double): Long =
    java.math.BigDecimal.valueOf(x * 1000.0)
      .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue().toLong

  /** Shared by interpreted eval and generated code. Boxed so NULL can
    * signal a length mismatch / null element, like the lambda forms. */
  def kernel(a: ArrayData, b: ArrayData, mode: Int, tcA: Int,
      tcB: Int): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var i = 0
    if (mode == QCos) {
      var dot = 0L; var na = 0L; var nb = 0L
      while (i < n) {
        if (a.isNullAt(i) || b.isNullAt(i)) return null
        val x = q1000(get(a, i, tcA)); val y = q1000(get(b, i, tcB))
        dot += x * y; na += x * x; nb += y * y
        i += 1
      }
      val denom = math.sqrt(na.toDouble) * math.sqrt(nb.toDouble)
      java.lang.Double.valueOf(if (denom == 0.0) 0.0 else dot.toDouble / denom)
    } else {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      while (i < n) {
        if (a.isNullAt(i) || b.isNullAt(i)) return null
        val x = get(a, i, tcA); val y = get(b, i, tcB)
        dot += x * y; na += x * x; nb += y * y
        i += 1
      }
      if (mode == Dot) java.lang.Double.valueOf(dot)
      else {
        val denom = math.sqrt(na) * math.sqrt(nb)
        java.lang.Double.valueOf(
          if (denom == 0.0) 0.0 else dot / denom)
      }
    }
  }

  private def mk(a: Column, b: Column, mode: Int): Column =
    org.apache.spark.sql.graft.Bridge.column(
      VectorSim(org.apache.spark.sql.graft.Bridge.expression(a),
        org.apache.spark.sql.graft.Bridge.expression(b), mode))

  def dot(a: Column, b: Column): Column = mk(a, b, Dot)
  def cosine(a: Column, b: Column): Column = mk(a, b, Cos)
  def quantizedCosine(a: Column, b: Column): Column = mk(a, b, QCos)
}
