package graft

import org.apache.spark.sql.functions._

/** Dev-only: the AUTO shingle-escalation decision inputs of
  * [[graft.operators.Dedup.ngramJaccardPairs]] at each scale — total
  * predicted prefix-bucket pairs (sum of C(bucket, 2) over (blk, tok)
  * 2-shingle prefix buckets), document count, and the per-doc
  * intensity — so the escalation threshold is calibrated from
  * measured operating points, never guessed.
  * Usage: runMain graft.NgramAutoProbe <sfDir> [<sfDir> ...] */
object NgramAutoProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Engine.configure(spark)
    args.foreach { d =>
      val docs = Engine.table(spark, d, "documents")
      val base = docs.select(col("source").as("blk"),
        col("doc_id").as("id"),
        graft.operators.Dedup.wordShingles(col("text"), 2).as("sh"))
      val pfx = graft.operators.Dedup.ngramPrefix(base, 0.5)
        .localCheckpoint()
      val r = pfx.groupBy("blk", "th").agg(count(lit(1)).as("c"))
        .agg(sum((col("c") * (col("c") - 1) / 2).cast("long")).as("p"),
          max(col("c")).as("maxc"), count(lit(1)).as("buckets")).head()
      val nDocs = pfx.select("id").distinct().count()
      // cheap pre-prefix bound: same sum over ALL shingle occurrences
      // (df profile only — no window, no join, no checkpoint)
      val all = base.select(col("blk"), explode(col("sh")).as("tok"))
        .groupBy("blk", "tok").agg(count(lit(1)).as("c"))
        .agg(sum((col("c") * (col("c") - 1) / 2).cast("long"))).head()
      println(s"NGRAMPROBE dir=$d docs=$nDocs buckets=${r.getLong(2)} " +
        s"maxBucket=${r.getLong(1)} totalPairs=${r.getLong(0)} " +
        s"pairsPerDoc=${if (nDocs == 0) 0 else r.getLong(0) / nDocs} " +
        s"allDfPairs=${if (all.isNullAt(0)) 0L else all.getLong(0)}")
    }
    spark.stop()
  }
}
