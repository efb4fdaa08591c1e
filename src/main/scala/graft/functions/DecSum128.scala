package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Add, And, AttributeReference, BitwiseAnd, BitwiseNot, BitwiseOr, EvalMode, Expression, If, IsNull, Literal, NumericEvalContext, ShiftRight, ShiftRightUnsigned, UnscaledValue}
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** Exact decimal SUM with a two-long (128-bit) accumulator — a
  * result-identical fast path for Spark's `Sum` over `DECIMAL(p<=18, s)`.
  *
  * Why: `Sum` over a decimal input widens its buffer to
  * `DECIMAL(p+10, s)`, which for p > 8 exceeds the 18-digit compact
  * range, so EVERY per-row accumulate leaves the long fast path and
  * allocates `java.math.BigDecimal`s (measured: a 5-sum group-by over
  * 600k rows spends ~2s in the sum buffers alone — 3x the rest of the
  * query). A `DECIMAL(18, s)` input is long-backed, so the exact sum is
  * plain 128-bit integer addition of unscaled values: two longs per
  * buffer, carry via one bitwise expression, whole-stage-codegen
  * friendly, zero allocation per row.
  *
  * Result parity with `Sum` (legacy/non-ANSI mode), which the
  * [[graft.plans.DecimalSum128Rewrite]] rule and DecSum128Spec pin:
  *  - dataType is the same `DecimalType.bounded(p+10, s)`;
  *  - empty group / all-null input evaluates to NULL (`isEmpty` flag);
  *  - a sum whose magnitude exceeds `10^(p+10) - 1` evaluates to NULL,
  *    exactly like `Sum`'s final `CheckOverflow(nullOnOverflow=true)`;
  *  - the exact integer sum is converted to the output decimal once per
  *    GROUP via the same `BigDecimal` path Spark's cast uses, so any
  *    downstream `CAST(... AS DOUBLE)` sees a bitwise-identical value.
  *
  * Bound: the 128-bit accumulator is exact while the running sum stays
  * below 2^127 ≈ 1.7e38. Reaching that needs >= 10^20 rows of
  * max-magnitude DECIMAL(18) values in ONE group — eight orders of
  * magnitude beyond a 100 TB table — and the overflow-null envelope
  * (10^28 for p=18) is crossed, and reported as NULL, long before.
  */
case class DecimalSum128(child: Expression, precision: Int, scale: Int)
    extends DeclarativeAggregate with UnaryLike[Expression] {

  override def prettyName: String = "decimal_sum128"
  override def nullable: Boolean = true
  // Sum's resultType for DECIMAL(p, s) input: DecimalType.bounded
  // (p+10, s); p <= 18 here, so p+10 <= 28 needs no 38-cap
  override def dataType: DataType = DecimalType(precision + 10, scale)

  // The child is the UNSCALED LONG of the original decimal input (the
  // rewrite rule projects `UnscaledValue(cast)` below the Aggregate):
  // the update expressions below reference the child several times
  // (lo-add, carry detection, sign extension, null guards), and
  // codegen's subexpression elimination does not dedupe inside If
  // branches — with the raw decimal cast as the child, each reference
  // re-paid the double→BigDecimal cast per row (measured: q_tpch_q1
  // 1.95s → 3.14s, WORSE than builtin Sum). As a projected long
  // column, each reference is one column read.
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType
        if precision <= 18 && scale >= 0 && scale <= precision =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"decimal_sum128 takes the unscaled LONG of a DECIMAL(p<=18, " +
        s"0<=s<=p) input, got $other (p=$precision, s=$scale)")
  }

  private lazy val hi = AttributeReference("hi", LongType, nullable = false)()
  private lazy val lo = AttributeReference("lo", LongType, nullable = false)()
  private lazy val isEmpty =
    AttributeReference("isEmpty", BooleanType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] =
    Seq(hi, lo, isEmpty)

  override lazy val initialValues: Seq[Expression] =
    Seq(Literal(0L), Literal(0L), Literal(true))

  // long arithmetic that WRAPS (java semantics) regardless of the
  // session's ANSI flag at execution time
  private def legacy = NumericEvalContext(EvalMode.LEGACY, true)
  private def wadd(a: Expression, b: Expression) = Add(a, b, legacy)

  /** Carry-out (0 or 1) of the unsigned 64-bit addition a + b = sum:
    * `((a & b) | ((a | b) & ~sum)) >>> 63`. */
  private def carryOut(a: Expression, b: Expression, sum: Expression) =
    ShiftRightUnsigned(
      BitwiseOr(BitwiseAnd(a, b),
        BitwiseAnd(BitwiseOr(a, b), BitwiseNot(sum))),
      Literal(63))

  /** 128-bit signed add of (aHi, aLo) + (bHi, bLo) → (hi', lo'). */
  private def add128(aHi: Expression, aLo: Expression,
      bHi: Expression, bLo: Expression): (Expression, Expression) = {
    val newLo = wadd(aLo, bLo)
    val newHi = wadd(wadd(aHi, bHi), carryOut(aLo, bLo, newLo))
    (newHi, newLo)
  }

  override lazy val updateExpressions: Seq[Expression] = {
    val x = child // unscaled long; null iff the decimal input was null
    val xHi = ShiftRight(x, Literal(63)) // sign extension
    val (newHi, newLo) = add128(hi, lo, xHi, x)
    Seq(
      If(IsNull(x), hi, newHi),
      If(IsNull(x), lo, newLo),
      And(isEmpty, IsNull(x)))
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    val (newHi, newLo) = add128(hi.left, lo.left, hi.right, lo.right)
    Seq(newHi, newLo, And(isEmpty.left, isEmpty.right))
  }

  override lazy val evaluateExpression: Expression =
    If(isEmpty, Literal.create(null, dataType),
      I128ToDecimal(hi, lo, precision + 10, scale))

  override protected def withNewChildInternal(
      newChild: Expression): DecimalSum128 = copy(child = newChild)
}

/** Finisher for [[DecimalSum128]]: the exact 128-bit integer sum of
  * unscaled values → `DECIMAL(precision, scale)`, NULL when the
  * magnitude exceeds the precision (Sum's legacy overflow contract).
  * Evaluated once per group, never per row. */
case class I128ToDecimal(hiE: Expression, loE: Expression,
    precision: Int, scale: Int) extends Expression {

  override def children: Seq[Expression] = Seq(hiE, loE)
  override def dataType: DataType = DecimalType(precision, scale)
  override def nullable: Boolean = true
  override def foldable: Boolean = false

  override def eval(input: InternalRow): Any = {
    // buffer attributes are non-nullable by construction
    DecSum128.toDecimal(
      hiE.eval(input).asInstanceOf[Long],
      loE.eval(input).asInstanceOf[Long], precision, scale)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val h = hiE.genCode(ctx)
    val l = loE.genCode(ctx)
    ev.copy(code = code"""
      ${h.code}
      ${l.code}
      org.apache.spark.sql.types.Decimal ${ev.value} =
        graft.functions.DecSum128.toDecimal(
          ${h.value}, ${l.value}, $precision, $scale);
      boolean ${ev.isNull} = ${ev.value} == null;""")
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): I128ToDecimal =
    copy(hiE = newChildren(0), loE = newChildren(1))
}

object DecSum128 {

  private val POW10 = Array.tabulate(39)(java.math.BigInteger.TEN.pow)
  // 10^0 .. 10^18 as longs, for the long-fits fast path
  private val POW10L = Array.iterate(1L, 19)(_ * 10L)

  /** (hi, lo) two's-complement 128-bit integer → Decimal(precision,
    * scale), or null when |v| >= 10^precision (precision overflow —
    * matches Sum's CheckOverflow(nullOnOverflow=true)). */
  def toDecimal(hi: Long, lo: Long, precision: Int, scale: Int): Decimal = {
    // fast path: the sum fits one long (hi is lo's sign extension)
    if (hi == (lo >> 63)) {
      if (precision <= 18 &&
          (lo >= POW10L(precision) || lo <= -POW10L(precision))) return null
      // compact long-backed Decimal; toBigDecimal/toDouble round
      // identically to the BigDecimal path
      return Decimal(lo, precision, scale)
    }
    val bytes = new Array[Byte](16)
    var i = 0
    while (i < 8) {
      bytes(i) = (hi >>> (56 - 8 * i)).toByte
      bytes(8 + i) = (lo >>> (56 - 8 * i)).toByte
      i += 1
    }
    val bi = new java.math.BigInteger(bytes)
    if (bi.abs.compareTo(POW10(precision)) >= 0) null
    else Decimal(new java.math.BigDecimal(bi, scale), precision, scale)
  }
}
