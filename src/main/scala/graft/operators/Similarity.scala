package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions._

/** Approximate-nearest-neighbor search over embedding columns
  * (SURVEY.md §7E).
  *
  * Scale design: brute-force top-k against a single query is a pure
  * map + TakeOrdered — it parallelizes perfectly but reads the whole
  * table. The LSH path prunes the scan to matching buckets; the IVF path
  * (k-means-ish coarse quantizer via label or bucket centroids) prunes
  * to the nearest partitions. For a full knn-join (every row to its
  * top-k), the bucket self-join keeps the pair space near-linear.
  */
object Similarity {

  /** Random-hyperplane LSH signature (Charikar 2002): sign bits of the
    * dot product with `planes` deterministic pseudo-random hyperplanes.
    * The planes derive from a seeded splitmix-style generator so every
    * executor evaluates the identical expression — no driver-broadcast
    * state needed. */
  def hyperplaneSignature(vec: Column, dim: Int, planes: Int,
      seed: Long = 42L): Column = {
    val rng = new scala.util.Random(seed)
    val hyper: Array[Array[Double]] =
      Array.fill(planes, dim)(rng.nextGaussian())
    val bits = (0 until planes).map { p =>
      val dot = (0 until dim).map { j =>
        element_at(vec, j + 1).cast("double") * lit(hyper(p)(j))
      }.reduce(_ + _)
      when(dot >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce(_.bitwiseOR(_))
  }

  /** Brute-force cosine top-k against one query vector: map + global
    * top-k (TakeOrderedAndProject — no full sort, no shuffle of data,
    * only k rows per partition reach the driver). */
  def bruteForceTopK(embeddings: DataFrame, query: Seq[Double], k: Int,
      vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    val q = lit(query.toArray)
    embeddings.select(col(idCol),
        cosineSimilarity(col(vecCol), q).as("cos"))
      .orderBy(desc("cos"), asc(idCol))
      .limit(k)
  }

  /** Self kNN-join via LSH buckets: every vector gets its top-k most
    * similar bucket-mates. Multi-probe = OR of `probes` signatures with
    * different seeds raises recall. */
  def lshKnnJoin(embeddings: DataFrame, k: Int, dim: Int = 64,
      planes: Int = 10, probes: Int = 2,
      vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    val probed = (0 until probes).map { p =>
      embeddings.select(col(idCol).as("id"), col(vecCol).as("v"),
        hyperplaneSignature(col(vecCol), dim, planes, seed = 42L + p)
          .as("bucket"))
        .withColumn("probe", lit(p))
    }.reduce(_ unionByName _)
    val a = probed.select(col("probe"), col("bucket"),
      col("id").as("id_a"), col("v").as("v_a"))
    val b = probed.select(col("probe"), col("bucket"),
      col("id").as("id_b"), col("v").as("v_b"))
    val pairs = a.join(b, Seq("probe", "bucket"))
      .filter(col("id_a") =!= col("id_b"))
      .select(col("id_a"), col("id_b"),
        cosineSimilarity(col("v_a"), col("v_b")).as("cos"))
      .groupBy("id_a", "id_b").agg(max("cos").as("cos"))
    val w = Window.partitionBy("id_a").orderBy(desc("cos"), asc("id_b"))
    pairs.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k).drop("rn")
  }

  /** IVF-style search: coarse-partition vectors by LSH bucket, compute
    * bucket centroids once, then search only the `nprobe` centroids
    * closest to the query. At 100 TB the centroid table is tiny
    * (broadcast) and the scan prunes to nprobe/nbuckets of the data —
    * this is the scale path, with brute-force as the exact baseline. */
  def ivfTopK(embeddings: DataFrame, query: Seq[Double], k: Int,
      dim: Int = 64, planes: Int = 8, nprobe: Int = 8,
      vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    val q = lit(query.toArray)
    val bucketed = embeddings.select(col(idCol), col(vecCol),
      hyperplaneSignature(col(vecCol), dim, planes).as("bucket"))
    val dimAggs = (1 to dim).map(i =>
      avg(element_at(col("vd"), i)).as(s"c$i"))
    val centroids = bucketed
      .select(col("bucket"),
        transform(col(vecCol), x => x.cast("double")).as("vd"))
      .groupBy("bucket")
      .agg(dimAggs.head, dimAggs.tail: _*)
      .select(col("bucket"),
        array((1 to dim).map(i => col(s"c$i")): _*).as("centroid"))
    // nearest nprobe buckets to the query
    val near = centroids
      .select(col("bucket"), cosineSimilarity(col("centroid"), q).as("c"))
      .orderBy(desc("c")).limit(nprobe).select("bucket")
    bucketed.join(broadcast(near), Seq("bucket"))
      .select(col(idCol), cosineSimilarity(col(vecCol), q).as("cos"))
      .orderBy(desc("cos"), asc(idCol))
      .limit(k)
  }
}
