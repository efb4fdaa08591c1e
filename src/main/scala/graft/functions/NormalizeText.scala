package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Canonical text normalization as ONE map-side projection — the first
  * pass of every text pipeline: Unicode NFC (composed form, so "é" ==
  * "e"+combining-acute — without it every downstream hash/dedup/join
  * treats visually identical strings as distinct), locale-independent
  * lowercase (Locale.ROOT — a tr_TR default locale would fold I→ı and
  * silently change fingerprints between JVMs), and ASCII-whitespace
  * run collapse + trim.
  *
  * Mirrors `trim(regexp_replace(lower(nfc_normalize(text)), '\s+', ' ',
  * 'g'))` in DuckDB, which is what lets the oracle check it exactly.
  * Native expression: stays inside whole-stage codegen, no UDF
  * serialization on the corpus-wide hot path. */
case class NormalizeText(child: Expression)
    extends UnaryExpression with InputTypeCheck {

  override protected def expectedInputType: String = "string"
  override protected def acceptsInputType(dt: DataType): Boolean =
    dt == StringType

  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    NormalizeText.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.NormalizeText$$.MODULE$$.normalize($c)")

  override protected def withNewChildInternal(
      newChild: Expression): NormalizeText = copy(child = newChild)
}

object NormalizeText {

  def normalize(s: UTF8String): UTF8String = {
    val nfc = java.text.Normalizer.normalize(
      s.toString, java.text.Normalizer.Form.NFC)
      .toLowerCase(java.util.Locale.ROOT)
    val sb = new java.lang.StringBuilder(nfc.length)
    var i = 0
    var pendingSpace = false
    while (i < nfc.length) {
      val c = nfc.charAt(i)
      // ASCII \s of both Java and RE2: [ \t\n\x0B\f\r]
      val isWs = c == ' ' || c == '\t' || c == '\n' || c == 0x0b ||
        c == '\f' || c == '\r'
      if (isWs) pendingSpace = sb.length() > 0
      else {
        if (pendingSpace) { sb.append(' '); pendingSpace = false }
        sb.append(c)
      }
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  /** Column-level API (classic-session bridge Expression <-> Column). */
  def normText(text: Column): Column =
    org.apache.spark.sql.graft.Bridge.column(
      NormalizeText(org.apache.spark.sql.graft.Bridge.expression(text)))
}
