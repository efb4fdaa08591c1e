package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Top-`k` nearest centroids (by dot product) as ONE native kernel over
  * a BROADCAST centroid matrix.
  *
  * The alternatives both collapse at large k:
  *  - a `greatest()` over k `(dot(vec, lit(centroid)), bucket)` structs
  *    inlines every centroid as a plan `Literal` — O(k·dim) plan bytes
  *    and codegen terms; at semanticDedup's derived k (up to 65,536,
  *    dim 64) that is a multi-hundred-MB plan and a codegen bomb;
  *  - a crossJoin against the centroid table expands every input row
  *    k-fold before the per-group top-k can reduce it — row volume
  *    |vecs|·k through the join even though only `k'` survive.
  * This expression ships the matrix to each executor ONCE via the
  * torrent broadcast (the plan carries only the handle — same pattern
  * as [[BloomBroadcastMightContain]]) and loops the argmax in a single
  * fused pass inside whole-stage codegen: O(nCentroids·dim) arithmetic
  * per row, O(1) plan size, zero row expansion, no shuffle.
  *
  * Output: the `min(k, nCentroids)` bucket ids ordered by descending
  * dot product; exact dot ties keep the LOWER bucket id (centroids are
  * scanned in ascending bucket order with strict improvement) —
  * deterministic, and measure-zero on real-valued data. Inputs are
  * expected unit-normalized so dot == cosine, but the kernel is just a
  * dot-product argmax either way. A null vector yields null; a
  * dimension mismatch yields null (corrupt input, mirroring
  * [[VectorSim]]'s contract).
  */
case class CentroidTopK(bc: Broadcast[CentroidTopK.Centroids],
    child: Expression, k: Int)
    extends UnaryExpression with InputTypeCheck {
  require(k >= 1, s"k must be >= 1: $k")

  override protected def expectedInputType: String =
    "array<float> or array<double>"
  override protected def acceptsInputType(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "centroid_topk"

  @transient private lazy val isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  /** Executor-side entry shared by both eval paths. */
  def topk(vec: ArrayData): ArrayData =
    CentroidTopK.kernel(vec, bc.value, k, isFloat)

  override def nullSafeEval(input: Any): Any =
    topk(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroidTopK", this,
      classOf[CentroidTopK].getName)
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value}_r =
         |  $ref.topk($c);
         |if (${ev.value}_r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ${ev.value}_r;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): CentroidTopK = copy(child = newChild)
}

object CentroidTopK {

  /** Broadcast payload: bucket ids ASCENDING + the matching centroid
    * matrix, centroid-major (`flat(c*dim + j)` = component j of
    * centroid c). k=65,536 centroids at dim 64 is 32 MiB of doubles —
    * one torrent broadcast, not 32 MiB of plan. */
  final class Centroids(val buckets: Array[Long], val flat: Array[Double],
      val dim: Int) extends Serializable {
    require(buckets.nonEmpty, "empty centroid table")
    require(flat.length == buckets.length * dim,
      s"centroid matrix shape: ${flat.length} != ${buckets.length} * $dim")
  }

  /** Build the broadcast payload from collected (bucket, centroid)
    * rows; sorts by bucket so the kernel's tie rule is well-defined. */
  def centroids(rows: Array[(Long, Array[Double])]): Centroids = {
    val sorted = rows.sortBy(_._1)
    val dim = sorted.head._2.length
    val flat = new Array[Double](sorted.length * dim)
    var c = 0
    while (c < sorted.length) {
      System.arraycopy(sorted(c)._2, 0, flat, c * dim, dim)
      c += 1
    }
    new Centroids(sorted.map(_._1), flat, dim)
  }

  /** Static kernel shared by interpreted eval and generated code.
    * Returns null on dimension mismatch. Selection is an insertion
    * scan (k is small — assignment probes / nprobe, not a result
    * top-k); strict `>` + ascending scan order keeps the lower bucket
    * on exact ties. */
  def kernel(vec: ArrayData, cents: Centroids, k: Int,
      isFloat: Boolean): ArrayData = {
    val dim = cents.dim
    if (vec.numElements() != dim) return null
    val v = new Array[Double](dim)
    var j = 0
    while (j < dim) {
      if (vec.isNullAt(j)) return null
      v(j) = if (isFloat) vec.getFloat(j).toDouble else vec.getDouble(j)
      // a NaN component makes every dot NaN — no slot would ever fill
      // and the zero-initialized buckets would be fabricated; null on
      // corrupt input, same contract as dim mismatch / null elements
      if (v(j) != v(j)) return null
      j += 1
    }
    val n = cents.buckets.length
    val kk = math.min(k, n)
    val topSim = Array.fill(kk)(Double.NegativeInfinity)
    val topB = new Array[Long](kk)
    val flat = cents.flat
    var c = 0
    while (c < n) {
      val off = c * dim
      var dot = 0.0
      var i = 0
      while (i < dim) { dot += v(i) * flat(off + i); i += 1 }
      if (dot > topSim(kk - 1)) {
        var p = kk - 1
        while (p > 0 && dot > topSim(p - 1)) {
          topSim(p) = topSim(p - 1); topB(p) = topB(p - 1); p -= 1
        }
        topSim(p) = dot
        topB(p) = cents.buckets(c)
      }
      c += 1
    }
    new GenericArrayData(topB)
  }

  /** Column-level API (classic-session bridge Expression <-> Column). */
  def centroidTopK(bc: Broadcast[Centroids], vec: Column, k: Int): Column =
    org.apache.spark.sql.graft.Bridge.column(
      CentroidTopK(bc, org.apache.spark.sql.graft.Bridge.expression(vec), k))
}
