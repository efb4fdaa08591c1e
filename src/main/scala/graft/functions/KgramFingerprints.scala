package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, StringType}

/** Rolling-hash fingerprints of every SLIDING k-token window of a token
  * array, as a native Catalyst expression — the fingerprint pass of the
  * ExactSubstr dedup family (Lee et al. 2022).
  *
  * The HOF form it replaces — `transform(sequence(0, n-k), i =>
  * md5(concat_ws(" ", slice(tokens, i+1, k))))` — re-reads k tokens,
  * builds a joined string, and runs a full md5 PER WINDOW: O(n·k)
  * token reads and O(n·k) hashed bytes per document, all through
  * interpreted lambda eval (ArrayTransform is a CodegenFallback).
  * Worse, a mostly-duplicate long document (the exact input this
  * operator exists for) pays that tax on every window. This kernel is
  * the textbook Rabin-Karp form: each token is hashed ONCE (one pass
  * over the document's bytes), then every window fingerprint rolls
  * from its predecessor in O(1) — O(total bytes + n) per document,
  * inside whole-stage codegen.
  *
  * Fingerprint width: TWO independent 64-bit polynomial lanes
  * (distinct odd bases over splitmix-finalized per-token hashes, each
  * lane finalized again), packed big-endian into the same 16-byte
  * BINARY shape as the md5 it replaces — downstream key size, plan
  * shape, and store schema are unchanged. Fingerprints never surface
  * in results (only their equality classes drive dedup), so any
  * collision-free 128-bit scheme preserves output hashes; at ~10^13
  * windows (100 TB) the expected 128-bit birthday collision count is
  * ~1e-13. Wraparound mod-2^64 arithmetic is exact ring algebra (the
  * bases are odd, hence invertible), and per-token hashes are already
  * finalizer-mixed, so the adversarial-input weakness of raw
  * polynomial-over-bytes hashing does not apply.
  *
  * Window boundaries hash the token SEQUENCE, not the joined text, so
  * ["ab","c"] and ["a","bc"] stay distinct — same discrimination as
  * md5-of-concat_ws (which kept the space separator for the same
  * reason). Null tokens (impossible from `split`, defensive) hash as
  * empty. n < k yields an empty array. */
case class KgramFingerprints(child: Expression, k: Int)
    extends UnaryExpression with InputTypeCheck {
  require(k >= 1, s"window width k must be >= 1, got $k")

  override protected def expectedInputType: String = "array<string>"
  override protected def acceptsInputType(dt: DataType): Boolean = dt match {
    case ArrayType(StringType, _) => true
    case _ => false
  }

  override def dataType: DataType = ArrayType(BinaryType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    KgramFingerprints.kgrams(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.KgramFingerprints$$.MODULE$$.kgrams($c, $k)")

  override protected def withNewChildInternal(
      newChild: Expression): KgramFingerprints = copy(child = newChild)
}

object KgramFingerprints {

  // distinct odd polynomial bases per lane (invertible mod 2^64)
  private val B1 = 1000003L
  private val B2 = 998244353L
  private val SEED1 = 0x9e3779b97f4a7c15L
  private val SEED2 = 0xc2b2ae3d27d4eb4fL

  /** splitmix64 finalizer (public domain, Steele et al.). */
  private def mix(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def kgrams(tokens: ArrayData, k: Int): ArrayData = {
    val n = tokens.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    // per-token hashes, both lanes in one byte pass per token
    val h1 = new Array[Long](n)
    val h2 = new Array[Long](n)
    var i = 0
    while (i < n) {
      var a = SEED1
      var c = SEED2
      if (!tokens.isNullAt(i)) {
        val b = tokens.getUTF8String(i).getBytes
        var j = 0
        while (j < b.length) {
          val v = b(j) & 0xffL
          a = a * B1 + v
          c = c * B2 + v
          j += 1
        }
      }
      h1(i) = mix(a)
      h2(i) = mix(c)
      i += 1
    }
    // B^(k-1) per lane, then the standard Rabin-Karp roll
    var powK1 = 1L
    var powK2 = 1L
    var j = 1
    while (j < k) { powK1 *= B1; powK2 *= B2; j += 1 }
    val m = n - k + 1
    val out = new Array[Any](m)
    var a = 0L
    var c = 0L
    i = 0
    while (i < k) { a = a * B1 + h1(i); c = c * B2 + h2(i); i += 1 }
    out(0) = pack(mix(a), mix(c))
    i = 1
    while (i < m) {
      a = (a - h1(i - 1) * powK1) * B1 + h1(i + k - 1)
      c = (c - h2(i - 1) * powK2) * B2 + h2(i + k - 1)
      out(i) = pack(mix(a), mix(c))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** 16-byte big-endian packing of the two lanes — the md5-shaped key. */
  private def pack(x: Long, y: Long): Array[Byte] = {
    val b = new Array[Byte](16)
    var i = 0
    while (i < 8) {
      b(i) = (x >>> (56 - 8 * i)).toByte
      b(8 + i) = (y >>> (56 - 8 * i)).toByte
      i += 1
    }
    b
  }

  /** Column-level API (classic-session bridge Expression <-> Column). */
  def kgramFingerprints(tokens: Column, k: Int): Column =
    org.apache.spark.sql.graft.Bridge.column(
      KgramFingerprints(org.apache.spark.sql.graft.Bridge.expression(tokens), k))
}
