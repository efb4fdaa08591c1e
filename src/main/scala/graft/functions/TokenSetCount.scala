package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Count of token OCCURRENCES that fall in a fixed token set, as one
  * native map pass. The set is bounded (a top-N vocabulary), so it
  * rides the expression as a reference object; the membership probe is
  * a hash-set hit per token.
  *
  * Why native: the declarative form is explode(tokens) → broadcast
  * join vocab → re-aggregate by doc — a per-OCCURRENCE shuffle keyed
  * by doc id that at corpus scale moves every token once. The count is
  * document-local given the (tiny) vocabulary, so no row ever needs to
  * leave its partition. (A `filter(w, t -> array_contains(...))`
  * lambda would re-evaluate the computed tokenizer child per element
  * after projection collapse — the repo-wide HOF pitfall.)
  *
  * The set is a `Seq` (value equality), NOT an `Array`: case-class
  * equality over an Array field is reference equality, which would
  * make two structurally identical expressions never canonicalize the
  * same — defeating common-subexpression elimination and exchange
  * reuse. Shipping cost is fine without an explicit broadcast: the
  * expression rides the stage's task binary, which Spark itself
  * broadcasts once per stage (it is not re-serialized per task). */
case class TokenSetCount(child: Expression, tokens: Seq[String])
    extends UnaryExpression with InputTypeCheck {

  override protected def expectedInputType: String = "array<string>"
  override protected def acceptsInputType(dt: DataType): Boolean = dt match {
    case ArrayType(StringType, _) => true
    case _ => false
  }

  override def dataType: DataType = LongType

  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](tokens.size * 2)
    tokens.foreach(t => s.add(UTF8String.fromString(t)))
    s
  }

  def countIn(arr: ArrayData): Long = {
    var n = 0L
    var i = 0
    val len = arr.numElements()
    while (i < len) {
      if (!arr.isNullAt(i) && set.contains(arr.getUTF8String(i))) n += 1L
      i += 1
    }
    n
  }

  override def nullSafeEval(input: Any): Any =
    countIn(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("tokenSetCount", this,
      classOf[TokenSetCount].getName)
    defineCodeGen(ctx, ev, c => s"$ref.countIn($c)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): TokenSetCount = copy(child = newChild)
}

object TokenSetCount {
  /** Column-level API (classic-session bridge Expression <-> Column). */
  def tokenSetCount(tokens: Column, set: Seq[String]): Column =
    org.apache.spark.sql.graft.Bridge.column(
      TokenSetCount(org.apache.spark.sql.graft.Bridge.expression(tokens),
        set))
}
