package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word k-shingles of a token array as a native Catalyst
  * expression: token i..i+k-1 joined by a single space, first-occurrence
  * order, exact duplicates dropped.
  *
  * Semantics mirror the SQL form the DuckDB oracle uses
  * (`concat_ws` over a clamped index range — trailing shingles shorter
  * than k when the document runs out of tokens, a single token yielding
  * itself), but in one pass: the lambda form re-evaluates its
  * (computed) token-array child per element once CollapseProject
  * inlines it, turning shingling O(tokens²) per row. */
case class WordShingles(child: Expression, k: Int)
    extends UnaryExpression with InputTypeCheck {
  require(k >= 1)

  override protected def expectedInputType: String = "array<string>"
  override protected def acceptsInputType(dt: DataType): Boolean = dt match {
    case ArrayType(StringType, _) => true
    case _ => false
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    WordShingles.shingle(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WordShingles$$.MODULE$$.shingle($c, $k)")

  override protected def withNewChildInternal(
      newChild: Expression): WordShingles = copy(child = newChild)
}

object WordShingles {

  def shingle(tokens: ArrayData, k: Int): ArrayData = {
    val n = tokens.numElements()
    val m = math.max(n - (k - 1), 1)
    val seen = new java.util.LinkedHashSet[UTF8String]()
    val sb = new StringBuilder
    var i = 0
    while (i < m && i < n) {
      sb.setLength(0)
      var j = 0
      while (j < k && i + j < n) {
        if (!tokens.isNullAt(i + j)) {
          if (sb.nonEmpty) sb.append(' ')
          sb.append(tokens.getUTF8String(i + j).toString)
        }
        j += 1
      }
      seen.add(UTF8String.fromString(sb.toString))
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[Any]])
  }

  /** Column-level API (classic-session bridge Expression <-> Column). */
  def wordShingles(tokens: Column, k: Int): Column =
    org.apache.spark.sql.graft.Bridge.column(
      WordShingles(org.apache.spark.sql.graft.Bridge.expression(tokens), k))
}
