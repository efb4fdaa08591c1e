package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Winnowed rolling-hash document fingerprints (Schleimer, Wilkerson,
  * Aiken, SIGMOD 2003 "Winnowing: Local Algorithms for Document
  * Fingerprinting"): polynomial rolling hashes of character k-grams,
  * keeping the minimum hash of every window of `w` consecutive k-grams
  * (rightmost minimum on ties), deduplicated.
  *
  * Shared fingerprints localize PARTIAL overlap — two documents sharing
  * any run of at least w+k-1 characters share at least one fingerprint
  * (the winnowing guarantee) — which exact-hash (md5) and global
  * near-dup sketches (MinHash/SimHash) can't do. Map-only projection,
  * native kernel, O(len) per row. */
case class Winnow(child: Expression, k: Int, w: Int)
    extends UnaryExpression with InputTypeCheck {
  require(k >= 2 && w >= 1)

  override protected def expectedInputType: String = "string"
  override protected def acceptsInputType(dt: DataType): Boolean =
    dt == org.apache.spark.sql.types.StringType

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    Winnow.fingerprints(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.Winnow$$.MODULE$$.fingerprints($c, $k, $w)")

  override protected def withNewChildInternal(
      newChild: Expression): Winnow = copy(child = newChild)
}

object Winnow {

  private val B = 1000003L // polynomial base (odd, large)

  /** Rolling k-gram hashes over UTF-8 bytes, then winnowing. */
  def fingerprints(text: org.apache.spark.unsafe.types.UTF8String,
      k: Int, w: Int): ArrayData = {
    val bytes = text.getBytes
    val n = bytes.length
    if (n < k) return new GenericArrayData(Array.empty[Any])
    // rolling polynomial hash: h_i = sum b[i+j] * B^(k-1-j)
    var pow = 1L
    var j = 1
    while (j < k) { pow *= B; j += 1 }
    val m = n - k + 1
    val hs = new Array[Long](m)
    var h = 0L
    var i = 0
    while (i < k) { h = h * B + (bytes(i) & 0xff); i += 1 }
    hs(0) = mix(h)
    i = 1
    while (i < m) {
      h = (h - (bytes(i - 1) & 0xff) * pow) * B + (bytes(i + k - 1) & 0xff)
      hs(i) = mix(h)
      i += 1
    }
    // winnow: rightmost minimum of each w-window, record on change
    val out = new java.util.LinkedHashSet[java.lang.Long]()
    if (m <= w) {
      var min = hs(0); i = 1
      while (i < m) { if (hs(i) <= min) min = hs(i); i += 1 }
      out.add(min)
    } else {
      // slide one step at a time, recording the (rightmost) minimum of
      // each window whenever its position changes — the standard
      // algorithm, so identical substrings in different documents
      // select identical fingerprints
      var prevIdx = -1
      var start = 0
      while (start + w <= m) {
        var min = hs(start)
        var idx = start
        i = start + 1
        while (i < start + w) {
          if (hs(i) <= min) { min = hs(i); idx = i }
          i += 1
        }
        if (idx != prevIdx) { out.add(min); prevIdx = idx }
        start += 1
      }
    }
    new GenericArrayData(out.toArray.asInstanceOf[Array[Any]])
  }

  /** splitmix64-style finalizer so raw polynomial structure (common
    * prefixes/suffixes) doesn't bias the minimum selection. */
  private def mix(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Column-level API (classic-session bridge Expression <-> Column). */
  def winnow(text: Column, k: Int = 8, w: Int = 4): Column =
    org.apache.spark.sql.graft.Bridge.column(
      Winnow(org.apache.spark.sql.graft.Bridge.expression(text), k, w))
}
