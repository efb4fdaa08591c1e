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

/** The wide twin of [[DecimalSum128]] for `DECIMAL(18 < p <= 38, s)`
  * inputs (whose unscaled values exceed one long): a THREE-long
  * (192-bit) accumulator over (hi, mid, lo) word columns projected by
  * the rewrite rule via [[Unscaled192]]. Spark's Sum for these types
  * not only adds BigDecimals per row — it also serializes the
  * `DECIMAL(p+10 > 28)` buffer through a byte-array round trip on
  * EVERY buffer read/write in the hash map. Three wrapping long adds
  * with two carry bits replace all of that.
  *
  * Exactness bound: 192 bits hold |sum| < 2^191 ≈ 3.1e57, and the
  * overflow-null envelope is at most 10^38 — a group needs >= 10^19
  * max-magnitude rows before the accumulator could wrap, seven orders
  * beyond a 100 TB table. The same parity contract as DecimalSum128
  * applies (dataType, NULL-on-empty, NULL-on-precision-overflow,
  * BigDecimal→double rounding), pinned by DecSum128Spec. */
case class DecimalSum192(hiE: Expression, midE: Expression,
    loE: Expression, precision: Int, scale: Int)
    extends DeclarativeAggregate
    with org.apache.spark.sql.catalyst.trees.TernaryLike[Expression] {

  override def prettyName: String = "decimal_sum192"
  override def nullable: Boolean = true
  override def dataType: DataType =
    DecimalType(math.min(38, precision + 10), scale)

  override def first: Expression = hiE
  override def second: Expression = midE
  override def third: Expression = loE

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(hiE, midE, loE).forall(_.dataType == LongType) &&
        precision > 18 && precision <= 38 &&
        scale >= 0 && scale <= precision)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"decimal_sum192 takes the three 64-bit words of a " +
        s"DECIMAL(18<p<=38, 0<=s<=p) unscaled value (p=$precision, " +
        s"s=$scale)")

  private lazy val hi = AttributeReference("hi", LongType, nullable = false)()
  private lazy val mid = AttributeReference("mid", LongType, nullable = false)()
  private lazy val lo = AttributeReference("lo", LongType, nullable = false)()
  private lazy val isEmpty =
    AttributeReference("isEmpty", BooleanType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] =
    Seq(hi, mid, lo, isEmpty)
  override lazy val initialValues: Seq[Expression] =
    Seq(Literal(0L), Literal(0L), Literal(0L), Literal(true))

  private def legacy = NumericEvalContext(EvalMode.LEGACY, true)
  private def wadd(a: Expression, b: Expression) = Add(a, b, legacy)
  private def carryOut(a: Expression, b: Expression, sum: Expression) =
    ShiftRightUnsigned(
      BitwiseOr(BitwiseAnd(a, b),
        BitwiseAnd(BitwiseOr(a, b), BitwiseNot(sum))),
      Literal(63))

  /** 192-bit signed add: (aHi,aMid,aLo) + (bHi,bMid,bLo). The mid word
    * adds two full words plus a carry bit; its carries out cannot both
    * be 1, so OR combines them. */
  private def add192(aHi: Expression, aMid: Expression, aLo: Expression,
      bHi: Expression, bMid: Expression, bLo: Expression)
      : (Expression, Expression, Expression) = {
    val newLo = wadd(aLo, bLo)
    val c0 = carryOut(aLo, bLo, newLo)
    val t = wadd(aMid, bMid)
    val c1a = carryOut(aMid, bMid, t)
    val newMid = wadd(t, c0)
    val c1b = carryOut(t, c0, newMid)
    val newHi = wadd(wadd(aHi, bHi), BitwiseOr(c1a, c1b))
    (newHi, newMid, newLo)
  }

  override lazy val updateExpressions: Seq[Expression] = {
    val (nHi, nMid, nLo) = add192(hi, mid, lo, hiE, midE, loE)
    Seq(
      If(IsNull(loE), hi, nHi),
      If(IsNull(loE), mid, nMid),
      If(IsNull(loE), lo, nLo),
      And(isEmpty, IsNull(loE)))
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    val (nHi, nMid, nLo) = add192(hi.left, mid.left, lo.left,
      hi.right, mid.right, lo.right)
    Seq(nHi, nMid, nLo, And(isEmpty.left, isEmpty.right))
  }

  override lazy val evaluateExpression: Expression =
    If(isEmpty, Literal.create(null, dataType),
      I192ToDecimal(hi, mid, lo, math.min(38, precision + 10), scale))

  override protected def withNewChildrenInternal(h: Expression,
      m: Expression, l: Expression): DecimalSum192 =
    copy(hiE = h, midE = m, loE = l)
}

/** One 64-bit word (0 = lo, 1 = mid, 2 = hi) of a decimal's unscaled
  * value in two's complement — the per-row extraction the
  * [[DecimalSum192]] rewrite projects below the Aggregate. Null in,
  * null out. */
case class Unscaled192(child: Expression, word: Int)
    extends Expression with UnaryLike[Expression] {

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def foldable: Boolean = child.foldable

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[DecimalType] && word >= 0 && word <= 2)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"unscaled192 takes a decimal and a word index 0..2, got " +
        s"${child.dataType} / $word")

  override def eval(input: InternalRow): Any = {
    val d = child.eval(input)
    if (d == null) null
    else DecSum128.word192(d.asInstanceOf[Decimal], word)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = code"""
      ${c.code}
      boolean ${ev.isNull} = ${c.isNull};
      long ${ev.value} = ${ev.isNull} ? 0L :
        graft.functions.DecSum128.word192(${c.value}, $word);""")
  }

  override protected def withNewChildInternal(
      newChild: Expression): Unscaled192 = copy(child = newChild)
}

/** Finisher for [[DecimalSum192]] — the 192-bit analogue of
  * [[I128ToDecimal]]. */
case class I192ToDecimal(hiE: Expression, midE: Expression,
    loE: Expression, precision: Int, scale: Int) extends Expression {

  override def children: Seq[Expression] = Seq(hiE, midE, loE)
  override def dataType: DataType = DecimalType(precision, scale)
  override def nullable: Boolean = true
  override def foldable: Boolean = false

  override def eval(input: InternalRow): Any =
    DecSum128.toDecimal192(
      hiE.eval(input).asInstanceOf[Long],
      midE.eval(input).asInstanceOf[Long],
      loE.eval(input).asInstanceOf[Long], precision, scale)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val h = hiE.genCode(ctx)
    val m = midE.genCode(ctx)
    val l = loE.genCode(ctx)
    ev.copy(code = code"""
      ${h.code}
      ${m.code}
      ${l.code}
      org.apache.spark.sql.types.Decimal ${ev.value} =
        graft.functions.DecSum128.toDecimal192(
          ${h.value}, ${m.value}, ${l.value}, $precision, $scale);
      boolean ${ev.isNull} = ${ev.value} == null;""")
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): I192ToDecimal =
    copy(hiE = newChildren(0), midE = newChildren(1), loE = newChildren(2))
}

object DecSum128 {

  private val POW10 = Array.tabulate(39)(java.math.BigInteger.TEN.pow)
  // 10^0 .. 10^18 as longs, for the long-fits fast path
  private val POW10L = Array.iterate(1L, 19)(_ * 10L)

  /** Word `w` (0 = lo, 1 = mid, 2 = hi) of the decimal's unscaled
    * value, two's complement. Fast path: an unscaled value that fits
    * one long (every DECIMAL(<=18) and most real wide-decimal VALUES)
    * never touches BigInteger shifting. */
  def word192(d: Decimal, w: Int): Long = {
    val bd = d.toJavaBigDecimal
    if (bd.precision <= 18) {
      // intCompact-backed: unscaled fits a long
      val lo = bd.unscaledValue().longValue()
      if (w == 0) lo else lo >> 63 // sign extension words
    } else {
      val u = bd.unscaledValue()
      w match {
        case 0 => u.longValue()
        case 1 => u.shiftRight(64).longValue()
        case _ => u.shiftRight(128).longValue()
      }
    }
  }

  /** (hi, mid, lo) two's-complement 192-bit integer →
    * Decimal(precision, scale), or null on precision overflow. */
  def toDecimal192(hi: Long, mid: Long, lo: Long, precision: Int,
      scale: Int): Decimal = {
    if (hi == (mid >> 63) && mid == (lo >> 63)) // fits one long
      return toDecimal(mid, lo, precision, scale)
    val bytes = new Array[Byte](24)
    var i = 0
    while (i < 8) {
      bytes(i) = (hi >>> (56 - 8 * i)).toByte
      bytes(8 + i) = (mid >>> (56 - 8 * i)).toByte
      bytes(16 + i) = (lo >>> (56 - 8 * i)).toByte
      i += 1
    }
    val bi = new java.math.BigInteger(bytes)
    if (bi.abs.compareTo(POW10(precision)) >= 0) null
    else Decimal(new java.math.BigDecimal(bi, scale), precision, scale)
  }

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
