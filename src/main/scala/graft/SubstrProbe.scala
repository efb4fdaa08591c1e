package graft

import org.apache.spark.sql.functions._

/** Dev-only stage attribution for dedupSubstrings at the 100× replica
  * (round-13 OOM diagnosis). */
object SubstrProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption
      .getOrElse("target/scalebench/sf100x")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Engine.configure(spark)
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"SUBSTR $name%-16s ${(System.nanoTime() - t0) / 1e9}%.1fs  $r")
      r
    }
    val k = 8
    val docs = spark.read.parquet(s"$d/documents.parquet")
    val toks = docs.select(col("doc_id"), split(col("text"), " ").as("__w"))
    val grams = toks.select(col("doc_id"),
      when(size(col("__w")) >= k,
        transform(sequence(lit(0), size(col("__w")) - k),
          i => md5(concat_ws(" ", slice(col("__w"), i + 1, lit(k))))))
        .otherwise(array().cast("array<string>")).as("__gs"))
    val windows = grams.select(col("doc_id"),
      posexplode(col("__gs")).as(Seq("start", "__g"))).localCheckpoint()
    t("windows")(windows.count())
    val firsts = windows.groupBy(col("__g"))
      .agg(min(struct(col("doc_id"), col("start"))).as("__f"))
      .select(col("__g"), col("__f")("doc_id").as("doc_id"),
        col("__f")("start").as("start"))
    t("firsts")(firsts.count())
    val removedWins = windows.join(firsts,
      Seq("__g", "doc_id", "start"), "left_anti").localCheckpoint()
    t("removedWins")(removedWins.count())
    val removedPos = removedWins
      .select(col("doc_id"),
        explode(sequence(col("start"), col("start") + (k - 1))).as("pos"))
      .distinct().localCheckpoint()
    t("removedPos")(removedPos.count())
    val positions = toks.select(col("doc_id"),
      posexplode(col("__w")).as(Seq("pos", "__t")))
    val kept = positions.join(removedPos, Seq("doc_id", "pos"), "left_anti")
    val keptAgg = kept.groupBy(col("doc_id")).agg(
      count(lit(1)).as("__nk"),
      array_join(
        transform(
          array_sort(collect_list(struct(col("pos"), col("__t")))),
          x => x.getField("__t")),
        " ").as("clean_text"))
    t("reassemble")(keptAgg.agg(sum(length(col("clean_text")))).head())
    spark.stop()
  }
}
