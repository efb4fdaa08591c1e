package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Space-join a token array, skipping a SORTED set of removed indices,
  * in one fused two-pointer pass — the reassembly kernel of the
  * substring/span dedup family.
  *
  * The column form it replaces — `array_join(filter(arr, (_, i) =>
  * !array_contains(rm, i)), " ")` — probes the removal array PER
  * TOKEN: O(n·|rm|) per document, through interpreted lambda eval.
  * A mostly-duplicate long document (the operator's target input) has
  * |rm| ~ n, making that map-side pass quadratic. The removal arrays
  * are built with `array_sort(collect_set(...))`, so sortedness is an
  * upstream invariant; this kernel merges the two sorted sequences
  * (positions ascending, removals ascending) in O(n + |rm|) inside
  * whole-stage codegen.
  *
  * Semantics match the replaced form exactly: null ELEMENTS are
  * skipped (as `array_join` does), a null tokens array or null removal
  * array yields NULL (callers guard the no-removals case explicitly),
  * out-of-range or duplicate removal indices are harmless (merge just
  * passes them), and unsorted removal input would silently under-drop
  * — hence the sortedness contract in the name. */
case class DropByIndexJoin(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<string>, array<int>), got " +
          s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
    }

  override def nullSafeEval(arr: Any, rm: Any): Any =
    DropByIndexJoin.joinKept(arr.asInstanceOf[ArrayData],
      rm.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, r) =>
      s"graft.functions.DropByIndexJoin$$.MODULE$$.joinKept($a, $r)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): DropByIndexJoin =
    copy(left = newLeft, right = newRight)
}

object DropByIndexJoin {

  def joinKept(arr: ArrayData, rm: ArrayData): UTF8String = {
    val n = arr.numElements()
    val rn = rm.numElements()
    val sb = new java.lang.StringBuilder
    var p = 0
    var kept = 0
    var i = 0
    while (i < n) {
      while (p < rn && rm.getInt(p) < i) p += 1
      val dropped = p < rn && rm.getInt(p) == i
      if (!dropped && !arr.isNullAt(i)) {
        if (kept > 0) sb.append(' ')
        sb.append(arr.getUTF8String(i).toString)
        kept += 1
      }
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  /** Column-level API (classic-session bridge Expression <-> Column).
    * `rm` MUST be sorted ascending (array_sort upstream). */
  def dropByIndexJoin(tokens: Column, rm: Column): Column =
    org.apache.spark.sql.graft.Bridge.column(
      DropByIndexJoin(org.apache.spark.sql.graft.Bridge.expression(tokens),
        org.apache.spark.sql.graft.Bridge.expression(rm)))
}
