package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Strided token-window chunks of a token array as a native Catalyst
  * expression: chunk i covers tokens [i*stride, i*stride + chunkTokens),
  * space-joined, duplicates KEPT in order. Chunk count is the minimum
  * covering the array (`1 + ceil(max(0, n - chunkTokens) / stride)`,
  * always >= 1 — an empty token array still yields one empty chunk so
  * no row silently vanishes downstream).
  *
  * Why native (same story as [[WordShingles]]): the
  * `transform(sequence(...), i => array_join(slice(tokens, ...)))`
  * lambda form re-evaluates its computed token-array child (a `split`
  * or regex extraction) per chunk once CollapseProject inlines it —
  * O(chunks × tokens) per row. Here the child evaluates once and one
  * pass builds every chunk.
  *
  * With `chunkTokens = 2, stride = 1` this is exactly the word-bigram
  * MULTISET (for n >= 2 the count is n-1 full-width windows), which is
  * what the repetition-statistics operator aggregates — unlike
  * [[WordShingles]], which deduplicates.
  */
case class TokenChunks(child: Expression, chunkTokens: Int, stride: Int)
    extends UnaryExpression with InputTypeCheck {
  require(chunkTokens >= 1 && stride >= 1 && stride <= chunkTokens,
    s"need 1 <= stride <= chunkTokens, got stride=$stride/chunk=$chunkTokens")

  override protected def expectedInputType: String = "array<string>"
  override protected def acceptsInputType(dt: DataType): Boolean = dt match {
    case ArrayType(StringType, _) => true
    case _ => false
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    TokenChunks.chunk(input.asInstanceOf[ArrayData], chunkTokens, stride)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TokenChunks$$.MODULE$$.chunk($c, $chunkTokens, $stride)")

  override protected def withNewChildInternal(
      newChild: Expression): TokenChunks = copy(child = newChild)
}

object TokenChunks {

  def chunk(tokens: ArrayData, chunkTokens: Int, stride: Int): ArrayData = {
    val n = tokens.numElements()
    val over = math.max(n - chunkTokens, 0)
    val nChunks = 1 + (over + stride - 1) / stride
    val out = new Array[Any](nChunks)
    val sb = new StringBuilder
    var c = 0
    while (c < nChunks) {
      sb.setLength(0)
      val start = c * stride
      var j = 0
      while (j < chunkTokens && start + j < n) {
        if (j > 0) sb.append(' ')
        if (!tokens.isNullAt(start + j))
          sb.append(tokens.getUTF8String(start + j).toString)
        j += 1
      }
      out(c) = UTF8String.fromString(sb.toString)
      c += 1
    }
    new GenericArrayData(out)
  }

  /** Column-level API (classic-session bridge Expression <-> Column). */
  def tokenChunks(tokens: Column, chunkTokens: Int, stride: Int): Column =
    org.apache.spark.sql.graft.Bridge.column(
      TokenChunks(org.apache.spark.sql.graft.Bridge.expression(tokens),
        chunkTokens, stride))
}
