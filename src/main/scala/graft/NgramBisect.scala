package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only bisect for the dd_ngram_block shared-JVM inflation
  * (round-13 verdict item 7): times the query FRESH (right after
  * warmup), then AFTER a full catalog pass in the same JVM — with the
  * bench's own hygiene (unpersist sweep + System.gc) before each
  * timing — and again after each candidate mitigation, to name the
  * residual pollution source. */
object NgramBisect {
  private def force(df: DataFrame): Unit = {
    df.agg(sum(xxhash64(struct(df.columns.map(col): _*)))).collect()
    ()
  }
  private def sweep(spark: SparkSession): Unit = {
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
    System.gc()
  }
  private def best3(spark: SparkSession, name: String,
      sfDir: String): Double = {
    (1 to 3).map { _ =>
      sweep(spark)
      val t0 = System.nanoTime()
      force(SparkEntry.queries(name)(spark, sfDir))
      (System.nanoTime() - t0) / 1e9
    }.min
  }
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val q = "q_dedup_ngram_block"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ui.retainedExecutions", "8")
      .config("spark.ui.retainedJobs", "100")
      .config("spark.ui.retainedStages", "200")
      .config("spark.ui.retainedTasks", "1000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Engine.configure(spark)
    val names = SparkEntry.queries.keys.toSeq.sorted
    // warmup exactly like Bench
    val warmDir = "/root/testdata/sf0.001"
    names.foreach { n =>
      try force(SparkEntry.queries(n)(spark, warmDir))
      catch { case _: Throwable => () }
    }
    try RefConformance.ensure(spark, sfDir) catch { case _: Throwable => () }
    println(f"NGRAM fresh       ${best3(spark, q, sfDir)}%.2fs")
    // full catalog pass at bench SF (what precedes it in the real bench)
    names.filterNot(_ == q).foreach { n =>
      try { sweep(spark); force(SparkEntry.queries(n)(spark, sfDir)) }
      catch { case _: Throwable => () }
    }
    println(f"NGRAM post-catalog ${best3(spark, q, sfDir)}%.2fs")
    spark.catalog.clearCache()
    println(f"NGRAM post-clearCache ${best3(spark, q, sfDir)}%.2fs")
    // give the async ContextCleaner a window to drain broadcasts
    System.gc(); Thread.sleep(5000); System.gc()
    println(f"NGRAM post-cleaner-drain ${best3(spark, q, sfDir)}%.2fs")
    val rt = Runtime.getRuntime
    println(f"NGRAM heap-used ${(rt.totalMemory - rt.freeMemory) / 1e9}%.2f GB")
    spark.stop()
  }
}
