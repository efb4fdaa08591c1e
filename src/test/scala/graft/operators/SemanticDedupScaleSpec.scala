package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Scale-hardening contract of [[Dedup.semanticDedup]]: a deliberately
  * HOT cluster (every vector in one k-means cell) must be re-split so
  * the per-bucket pair count stays bounded, without losing the planted
  * near-dups; exact-identical vectors (unsplittable by any
  * similarity signature) must collapse before pairing. */
class SemanticDedupScaleSpec extends SparkSuite {

  /** One dominant direction + moderate noise: k-means with nClusters=1
    * puts everything in a single cluster, while the noise still flips
    * LSH sign bits so the sub-signature re-split can spread it. */
  private lazy val hot = {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    val center = Array.fill(64)(rng.nextGaussian())
    (0 until 800).map { i =>
      val v = center.map(x => (x + rng.nextGaussian() * 0.5).toFloat)
      (i.toLong, v, 0)
    }.toDF("vec_id", "embedding", "label")
  }

  test("resplitOversized bounds the hot cluster's bucket sizes") {
    val vecs = hot.select(col("vec_id").as("id"),
      Similarity.normalized(col("embedding")).as("nv"))
      .withColumn("bucket", lit(0L)) // everything in one hot cluster
    val resplit = Dedup.resplitOversized(vecs, maxClusterSize = 100,
      dim = 64)
    val sizes = resplit.groupBy("bucket").agg(count(lit(1)).as("n"))
      .collect().map(_.getLong(1))
    assert(sizes.sum == 800, "re-split must not drop or duplicate rows")
    assert(sizes.length > 1, "oversized cluster was not split")
    // the split is probabilistic (LSH bits), so assert a loose factor
    // of the cap rather than the cap itself
    assert(sizes.max <= 400,
      s"hot cluster not bounded: max bucket ${sizes.max} of 800")
  }

  test("semanticDedup on a hot cluster: planted dups still dropped, " +
      "originals kept, identical vectors collapsed") {
    import spark.implicits._
    // 20 planted near-dups (cosine ~0.99999 to their original) + 5
    // EXACT duplicates of vector 3 (the unsplittable case)
    val planted = hot.filter(col("vec_id") < 20)
      .select((col("vec_id") + 1000).as("vec_id"),
        transform(col("embedding"), x => x + lit(0.002f)).as("embedding"),
        col("label"))
    val identical = hot.filter(col("vec_id") === 3)
      .crossJoin(spark.range(1, 6).select(col("id").as("c")))
      .select((col("c") + 2000).as("vec_id"), col("embedding"),
        col("label"))
    val kept = Dedup.semanticDedup(
        hot.unionByName(planted).unionByName(identical),
        nClusters = 1, threshold = 0.9995, maxClusterSize = 100)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert((0L until 800L).forall(kept.contains), "an original was dropped")
    val survivors = kept.filter(_ >= 1000L)
    assert(survivors.isEmpty,
      s"planted/identical dups survived the re-split: " +
        s"${survivors.toSeq.sorted.take(8)}")
  }
}
