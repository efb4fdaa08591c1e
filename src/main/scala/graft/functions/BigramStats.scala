package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-document word-bigram multiset statistics as one native Catalyst
  * expression: `struct(n_bigrams, top_cnt, dup_cnt)` over a token
  * array, where `n_bigrams = max(n_tokens - 1, 0)` (full bigram
  * multiset size), `top_cnt` = the count of the most frequent bigram,
  * and `dup_cnt` = total mass of bigrams occurring more than once.
  * These are the Gopher repetition-filter signals (Rae 2021 §A1.1).
  *
  * Why native: the declarative form is `explode(bigrams)` → two
  * chained aggregates — per-OCCURRENCE shuffle rows keyed by
  * (doc_id, bigram). The statistics are document-local, so a single
  * map-side pass with a local count map computes them with ZERO
  * shuffle; at corpus scale that removes the dominant shuffle of the
  * repetition-stats pipeline entirely. One local HashMap per row,
  * bounded by the document's distinct-bigram count.
  */
case class BigramStats(child: Expression)
    extends UnaryExpression with InputTypeCheck {

  override protected def expectedInputType: String = "array<string>"
  override protected def acceptsInputType(dt: DataType): Boolean = dt match {
    case ArrayType(StringType, _) => true
    case _ => false
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n_bigrams", LongType, nullable = false),
    StructField("top_cnt", LongType, nullable = false),
    StructField("dup_cnt", LongType, nullable = false)))

  override def nullSafeEval(input: Any): Any =
    BigramStats.stats(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.BigramStats$$.MODULE$$.stats($c)")

  override protected def withNewChildInternal(
      newChild: Expression): BigramStats = copy(child = newChild)
}

object BigramStats {

  def stats(tokens: ArrayData): InternalRow = {
    val n = tokens.numElements()
    if (n < 2) return new GenericInternalRow(Array[Any](0L, 0L, 0L))
    // key bigrams by (tok_i, tok_{i+1}) pairs without building joined
    // strings: a map over the adjacent UTF8String pair
    val counts = new java.util.HashMap[(UTF8String, UTF8String), Long](n)
    var i = 0
    while (i < n - 1) {
      val a = if (tokens.isNullAt(i)) UTF8String.EMPTY_UTF8
        else tokens.getUTF8String(i)
      val b = if (tokens.isNullAt(i + 1)) UTF8String.EMPTY_UTF8
        else tokens.getUTF8String(i + 1)
      counts.merge((a, b), 1L, (x, y) => x + y)
      i += 1
    }
    var top = 0L
    var dup = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next()
      if (c > top) top = c
      if (c > 1L) dup += c
    }
    new GenericInternalRow(Array[Any]((n - 1).toLong, top, dup))
  }

  /** Column-level API (classic-session bridge Expression <-> Column). */
  def bigramStats(tokens: Column): Column =
    org.apache.spark.sql.graft.Bridge.column(
      BigramStats(org.apache.spark.sql.graft.Bridge.expression(tokens)))
}
