package graft

import org.apache.spark.sql.functions._

/** Dev-only plan evidence for the hashed-shingle-key prefix pipeline
  * (the candidate pairing checkpoints the prefix rows, which hides
  * their plan from the query's final explain). Prints the prefix
  * derivation's physical plan: the df aggregate and join-back key on
  * xxhash64(tok), and the output row carries `th`, never the shingle
  * string. Usage: runMain graft.NgramPlanProbe [sfDir]
  */
object NgramPlanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Engine.configure(spark)
    val docs = Engine.table(spark, sfDir, "documents")
    val base = docs.select(col("source").as("blk"),
      col("doc_id").as("id"),
      graft.operators.Dedup.wordShingles(col("text"), 2).as("sh"))
    graft.operators.Dedup.ngramPrefix(base, 0.5).explain("formatted")
    spark.stop()
  }
}
