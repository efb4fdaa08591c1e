package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Product-quantization kernels (Jégou, Douze, Schmid 2011, "Product
  * Quantization for Nearest Neighbor Search", IEEE TPAMI) as native
  * Catalyst expressions.
  *
  * PQ splits a `dim`-dimensional unit vector into `m` subspaces of
  * `dim/m` dimensions, snaps each subvector to its nearest of `ksub`
  * per-subspace centroids, and stores only the `m` centroid indexes —
  * one byte each. A 64-dim float embedding (256 B) becomes an 8-byte
  * code: a 100 TB embedding column scans as ~3 TB of codes, and
  * query-time scoring never touches the original vectors.
  *
  * Query-time ADC (asymmetric distance computation): the query builds
  * an `m × ksub` lookup table of per-subspace dot products ONCE; each
  * stored code is scored by summing `m` table entries — no multiplies
  * per row. Both the codebook (encode) and the LUT (score) ride along
  * as single reference objects, so generated code stays O(1) in
  * `dim`/`ksub` like [[HyperplaneLSH]].
  */
object ProductQuant {

  /** Per-subspace centroid codebook over UNIT-normalized vectors.
    * `cells(((s * ksub) + c) * dsub + j)` = component `j` of centroid
    * `c` of subspace `s`; dot products against unit vectors then rank
    * by cosine. */
  case class Codebook(dim: Int, m: Int, ksub: Int, cells: Array[Double]) {
    require(dim % m == 0, s"dim=$dim must divide into m=$m subspaces")
    require(ksub >= 2 && ksub <= 256, "ksub must fit one byte")
    val dsub: Int = dim / m
  }

  /** Train a codebook with per-subspace Lloyd iterations on a
    * DETERMINISTIC driver-side sample (the `sampleN` vectors with the
    * smallest id hash — both runs of the same corpus agree). Sampled
    * training is the standard PQ construction (a few thousand vectors
    * saturate ksub<=256 centroids); the full corpus is only touched by
    * the distributed encode pass, so training cost is independent of
    * corpus size. */
  def train(embeddings: org.apache.spark.sql.DataFrame, dim: Int,
      m: Int = 8, ksub: Int = 16, iters: Int = 10, sampleN: Int = 2048,
      vecCol: String = "embedding", idCol: String = "vec_id"): Codebook = {
    import org.apache.spark.sql.functions._
    val dsub = dim / m
    // null / null-element vectors are excluded BEFORE the limit (same
    // rule and ordering as the k-means trainers): filtering after the
    // limit would silently shrink the sample whenever a dirty vector
    // hashed into the first sampleN
    val sample = embeddings
      .filter(col(vecCol).isNotNull && !exists(col(vecCol), _.isNull))
      .orderBy(xxhash64(col(idCol)), col(idCol)).limit(sampleN)
      .select(transform(col(vecCol), _.cast("double")).as("v"))
      .collect().map(_.getSeq[Double](0).toArray)
      .map(normalize)
    val cells = new Array[Double](m * ksub * dsub)
    // an all-dirty (or empty) corpus trains nothing: a zero codebook
    // ADC-scores everything 0.0 — probes degrade, never throw
    if (sample.isEmpty) return Codebook(dim, m, ksub, cells)
    for (s <- 0 until m) {
      val subs = sample.map(_.slice(s * dsub, (s + 1) * dsub))
      val cents = lloyd(subs, ksub, iters)
      for (c <- 0 until ksub; j <- 0 until dsub)
        cells(((s * ksub) + c) * dsub + j) = cents(c)(j)
    }
    Codebook(dim, m, ksub, cells)
  }

  private def normalize(v: Array[Double]): Array[Double] = {
    var n = 0.0; var i = 0
    while (i < v.length) { n += v(i) * v(i); i += 1 }
    val s = math.sqrt(n)
    if (s == 0.0) v else v.map(_ / s)
  }

  /** Plain Lloyd on the driver sample: deterministic init (first k
    * points in sample order), argmin-L2 assign, mean update; empty
    * clusters keep their previous centroid. */
  private def lloyd(points: Array[Array[Double]], k: Int,
      iters: Int): Array[Array[Double]] = {
    val d = points.headOption.map(_.length).getOrElse(0)
    val init = points.take(k)
    val cents = Array.tabulate(k)(i =>
      if (i < init.length) init(i).clone() else new Array[Double](d))
    for (_ <- 1 to iters) {
      val sums = Array.fill(k)(new Array[Double](d))
      val cnts = new Array[Int](k)
      points.foreach { p =>
        val c = nearest(p, cents)
        cnts(c) += 1
        var j = 0
        while (j < d) { sums(c)(j) += p(j); j += 1 }
      }
      for (c <- 0 until k if cnts(c) > 0; j <- 0 until d)
        cents(c)(j) = sums(c)(j) / cnts(c)
    }
    cents
  }

  private def nearest(p: Array[Double],
      cents: Array[Array[Double]]): Int = {
    var best = 0; var bestD = Double.MaxValue; var c = 0
    while (c < cents.length) {
      var dist = 0.0; var j = 0
      while (j < p.length) {
        val diff = p(j) - cents(c)(j); dist += diff * diff; j += 1
      }
      if (dist < bestD) { bestD = dist; best = c }
      c += 1
    }
    best
  }

  /** Encode kernel: unit-normalize, then per-subspace argmin-L2 against
    * the codebook (ties → lowest index). Returns `m` bytes. */
  def encodeKernel(vec: ArrayData, dim: Int, m: Int, ksub: Int,
      cells: Array[Double], isFloat: Boolean): Array[Byte] = {
    val dsub = dim / m
    val n = math.min(vec.numElements(), dim)
    val v = new Array[Double](dim)
    var i = 0
    var norm = 0.0
    while (i < n) {
      val x = if (isFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
      v(i) = x; norm += x * x; i += 1
    }
    val s0 = math.sqrt(norm)
    if (s0 != 0.0) { i = 0; while (i < dim) { v(i) /= s0; i += 1 } }
    val out = new Array[Byte](m)
    var s = 0
    while (s < m) {
      var best = 0; var bestD = Double.MaxValue; var c = 0
      while (c < ksub) {
        val off = ((s * ksub) + c) * dsub
        var dist = 0.0; var j = 0
        while (j < dsub) {
          val diff = v(s * dsub + j) - cells(off + j)
          dist += diff * diff; j += 1
        }
        if (dist < bestD) { bestD = dist; best = c }
        c += 1
      }
      out(s) = best.toByte
      s += 1
    }
    out
  }

  /** ADC kernel: sum of `m` LUT entries selected by the code bytes. */
  def adcKernel(code: Array[Byte], lut: Array[Double], ksub: Int): Double = {
    var acc = 0.0; var s = 0
    while (s < code.length) {
      acc += lut(s * ksub + (code(s) & 0xFF)); s += 1
    }
    acc
  }

  /** Query-side LUT: `lut(s*ksub + c)` = dot(query subvector s,
    * codebook cell (s,c)); query unit-normalized so the ADC sum
    * approximates cosine. */
  def buildLut(query: Seq[Double], cb: Codebook): Array[Double] = {
    val q = normalize(query.toArray.take(cb.dim).padTo(cb.dim, 0.0))
    val lut = new Array[Double](cb.m * cb.ksub)
    for (s <- 0 until cb.m; c <- 0 until cb.ksub) {
      val off = ((s * cb.ksub) + c) * cb.dsub
      var acc = 0.0; var j = 0
      while (j < cb.dsub) { acc += q(s * cb.dsub + j) * cb.cells(off + j); j += 1 }
      lut(s * cb.ksub + c) = acc
    }
    lut
  }

  def pqEncode(vec: Column, cb: Codebook): Column =
    org.apache.spark.sql.graft.Bridge.column(
      PQEncode(org.apache.spark.sql.graft.Bridge.expression(vec), cb))

  def pqAdc(code: Column, lut: Array[Double], ksub: Int): Column =
    org.apache.spark.sql.graft.Bridge.column(
      PQAdc(org.apache.spark.sql.graft.Bridge.expression(code), lut, ksub))
}

/** Vector → `m`-byte PQ code (see [[ProductQuant]]). */
case class PQEncode(child: Expression, cb: ProductQuant.Codebook)
    extends UnaryExpression with InputTypeCheck {

  override protected def expectedInputType: String =
    "array<float> or array<double>"
  override protected def acceptsInputType(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def dataType: DataType = BinaryType

  @transient private lazy val isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any =
    ProductQuant.encodeKernel(input.asInstanceOf[ArrayData],
      cb.dim, cb.m, cb.ksub, cb.cells, isFloat)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val cellsRef = ctx.addReferenceObj("pqCells", cb.cells, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ProductQuant$$.MODULE$$.encodeKernel(" +
        s"$c, ${cb.dim}, ${cb.m}, ${cb.ksub}, $cellsRef, $isFloat)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): PQEncode = copy(child = newChild)
}

/** PQ code → ADC score against one query's LUT (see [[ProductQuant]]). */
case class PQAdc(child: Expression, lut: Array[Double], ksub: Int)
    extends UnaryExpression with InputTypeCheck {

  override protected def expectedInputType: String = "binary"
  override protected def acceptsInputType(dt: DataType): Boolean =
    dt == BinaryType

  override def dataType: DataType = DoubleType

  override def nullSafeEval(input: Any): Any =
    ProductQuant.adcKernel(input.asInstanceOf[Array[Byte]], lut, ksub)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val lutRef = ctx.addReferenceObj("pqLut", lut, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ProductQuant$$.MODULE$$.adcKernel($c, $lutRef, $ksub)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): PQAdc = copy(child = newChild)
}
