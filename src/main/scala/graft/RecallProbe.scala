package graft
/** Dev tool (like [[ScaleProbe]]): measures the kmeans-IVF
  * recall@10-vs-nprobe curve against brute force on the real
  * embeddings corpus. Round-11 measurement at sf0.01 (50 queries,
  * 32 centroids): nprobe 8 -> 0.690, 16 -> 0.860, 24 -> 0.946,
  * 32 (exhaustive) -> 1.000 exactly. The synthetic corpus is
  * near-uniform (no cluster structure), which is the WORST case for
  * IVF — recorded in SCALE.md; SimilaritySpec pins the curve's laws
  * (monotone in nprobe, exhaustive == brute). */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session("local[8]", 8)
    import org.apache.spark.sql.functions._
    val emb = Engine.table(spark, "/root/testdata/sf0.01", "embeddings")
    val dir = java.nio.file.Files.createTempDirectory("recall").toString
    graft.operators.Similarity.ivfBuildIndexKMeans(emb, dir)
    val queries = emb.filter(col("vec_id") < 50)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val brute = graft.plans.TopKPerGroup.topKPerGroup(
      queries.crossJoin(emb.select(col("vec_id"),
          col("embedding").as("cv")))
        .select(col("qid"), col("vec_id"),
          graft.functions.VectorSim.cosine(col("cv"),
            col("qvec")).as("cos")),
      keys = Seq(col("qid")), order = Seq(desc("cos"), asc("vec_id")),
      k = 10).collect().groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    for (np <- Seq(8, 16, 24, 32)) {
      val ivf = graft.operators.Similarity.ivfProbeBatch(spark, dir,
          queries, k = 10, nprobe = np)
        .select(col("qid"), col("vec_id")).collect()
        .groupBy(_.getLong(0))
        .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
      val rec = ivf.map { case (q, s) => s.intersect(brute(q)).size / 10.0 }
      println(f"RECALL nprobe=$np avg=${rec.sum / rec.size}%.3f min=${rec.min}%.2f")
    }
    spark.stop()
  }
}
