package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Unit-L2-normalized double view of a numeric vector as a native
  * Catalyst expression (zero vectors pass through unscaled, cast to
  * double).
  *
  * The `transform(vec, x => x / sqrt(normSq(vec)))` lambda form
  * re-evaluates the computed norm child PER ELEMENT once
  * CollapseProject inlines it — O(dim²) interpreted work per row (and
  * `normSq` itself is a CodegenFallback ArrayAggregate). This is two
  * sequential passes (norm, then scale) in one codegen call.
  */
case class UnitNorm(child: Expression)
    extends UnaryExpression with InputTypeCheck {

  override protected def expectedInputType: String =
    "array<float> or array<double>"
  override protected def acceptsInputType(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  @transient private lazy val isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any =
    UnitNorm.kernel(input.asInstanceOf[ArrayData], isFloat)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.UnitNorm$$.MODULE$$.kernel($c, $isFloat)")

  override protected def withNewChildInternal(
      newChild: Expression): UnitNorm = copy(child = newChild)
}

object UnitNorm {

  def kernel(vec: ArrayData, isFloat: Boolean): ArrayData = {
    val n = vec.numElements()
    val out = new Array[Any](n)
    var norm = 0.0
    var i = 0
    while (i < n) {
      val x = if (isFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
      out(i) = x; norm += x * x; i += 1
    }
    val s = math.sqrt(norm)
    if (s != 0.0) {
      i = 0
      while (i < n) {
        out(i) = out(i).asInstanceOf[Double] / s; i += 1
      }
    }
    new GenericArrayData(out)
  }

  /** Column-level API (classic-session bridge Expression <-> Column). */
  def unitNorm(vec: Column): Column =
    org.apache.spark.sql.graft.Bridge.column(
      UnitNorm(org.apache.spark.sql.graft.Bridge.expression(vec)))
}
