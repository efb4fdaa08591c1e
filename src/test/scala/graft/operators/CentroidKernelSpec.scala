package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Contract of the broadcast-centroid argmax kernel
  * ([[graft.functions.CentroidTopK]]) behind
  * [[Similarity.assignNearest]]/[[Similarity.assignNearestK]]: the
  * plan stays O(1) in the centroid count (the matrix rides a broadcast
  * handle, not plan Literals) and the assignment is the exact
  * brute-force argmax. This is the kernel that keeps semanticDedup's
  * derived k (up to 65,536 at 100 TB) from becoming a codegen bomb. */
class CentroidKernelSpec extends SparkSuite {

  private val dim = 16

  private def randDF(n: Int, seed: Int, idName: String, vecName: String) = {
    import spark.implicits._
    val rng = new scala.util.Random(seed)
    (0 until n).map { i =>
      val v = Array.fill(dim)(rng.nextGaussian())
      val norm = math.sqrt(v.map(x => x * x).sum)
      (i.toLong, v.map(_ / norm))
    }.toDF(idName, vecName)
  }

  test("assignNearest at k=4096: bounded plan size, exact argmax") {
    val cents = randDF(4096, 31, "bucket", "centroid")
    val vecs = randDF(300, 77, "id", "nv")
    val assigned = Similarity.assignNearest(vecs, cents)

    // the old greatest()-over-struct-literals form inlined 4096 * 16
    // doubles into the plan (hundreds of KB here, hundreds of MB at
    // derived k); the kernel plan carries only a broadcast handle
    val planChars = assigned.queryExecution.executedPlan.toString.length
    assert(planChars < 20000, s"plan size exploded: $planChars chars")

    val cmat = cents.collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val got = assigned.select("id", "nv", "bucket").collect()
    assert(got.length == 300)
    got.foreach { r =>
      val v = r.getSeq[Double](1).toArray
      val want = cmat.toSeq.map { case (b, c) =>
        (c.zip(v).map { case (x, y) => x * y }.sum, b)
      }.maxBy { case (s, b) => (s, -b) }._2 // ties -> lower bucket
      assert(r.getLong(2) == want, s"id=${r.getLong(0)}")
    }
  }

  test("assignNearestK: top-k buckets match brute force, k rows per id") {
    val cents = randDF(512, 5, "bucket", "centroid")
    val vecs = randDF(100, 99, "id", "nv")
    val k = 3
    val got = Similarity.assignNearestK(vecs, cents, k).collect()
      .groupBy(_.getLong(0))
      .map { case (id, rows) => id -> rows.map(_.getLong(2)).toSet }
    assert(got.size == 100)
    val cmat = cents.collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    val vmat = vecs.collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    vmat.foreach { case (id, v) =>
      val want = cmat.map { case (b, c) =>
        (c.zip(v).map { case (x, y) => x * y }.sum, b)
      }.sortBy { case (s, b) => (-s, b) }.take(k).map(_._2).toSet
      assert(got(id) == want, s"id=$id: ${got(id)} vs $want")
    }
  }

  test("kernel corrupt-input contract: NaN components, dim mismatch, " +
      "and null elements all yield null, never fabricated buckets") {
    import spark.implicits._
    val cents = randDF(32, 3, "bucket", "centroid")
    val bad = Seq(
      (1L, Array.fill(dim)(0.1)),                       // clean
      (2L, Array.fill(dim)(Double.NaN)),                // NaN: pre-fix
                                                        // returned bucket
                                                        // 0 for all slots
      (3L, Array.fill(dim - 2)(0.1)))                   // dim mismatch
      .toDF("id", "nv")
    val out = Similarity.assignNearestK(bad, cents, 2)
      .groupBy("id").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // assignNearestK explodes the kernel's array: null arrays produce
    // ZERO rows for that id — the corrupt vectors must vanish, not be
    // assigned to bucket 0
    assert(out == Map(1L -> 2L), s"corrupt vectors leaked: $out")
  }

  test("semanticDedup at nClusters=4096 completes with a bounded plan " +
      "and still drops planted near-dups") {
    import spark.implicits._
    val rng = new scala.util.Random(17)
    val base = (0 until 5000).map { i =>
      (i.toLong, Array.fill(dim)(rng.nextGaussian().toFloat), 0)
    }.toDF("vec_id", "embedding", "label")
    val planted = base.filter(col("vec_id") < 20)
      .select((col("vec_id") + 100000).as("vec_id"),
        transform(col("embedding"), x => x + lit(0.0005f)).as("embedding"),
        col("label"))
    val kept = Dedup.semanticDedup(base.unionByName(planted),
        nClusters = 4096, threshold = 0.999, dim = dim)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert((0L until 5000L).forall(kept.contains), "an original was dropped")
    assert(!kept.exists(_ >= 100000L), "a planted near-dup survived")
  }
}
