package graft

import org.apache.spark.sql.functions._
import graft.operators.TextOps

/** Dev-only stage attribution for q_bm25_index_maint (round-13
  * drift adjudication). Times each lifecycle phase separately. */
object Bm25Probe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Engine.configure(spark)
    import spark.implicits._
    val terms = Seq("join", "scan", "filter")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"BM25PROBE $name%-12s ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    (1 to 3).foreach { round =>
      println(s"--- round $round")
      val docs = Engine.table(spark, d, "documents")
      val dir = java.nio.file.Files
        .createTempDirectory("graft_invprobe").toString
      t("build") { TextOps.buildInvertedIndex(
        docs.filter(col("doc_id") % 10 =!= 0), dir, shards = 8) }
      val inserts = docs.filter(col("doc_id") % 10 === 0)
        .select(col("doc_id"), col("text")).withColumn("change", lit("insert"))
      val deletes = docs.filter(col("doc_id") % 10 =!= 0 && col("doc_id") % 7 === 1)
        .select(col("doc_id"), col("text")).withColumn("change", lit("delete"))
      val upd = docs.filter(col("doc_id") === 3)
        .select(col("doc_id"), col("text")).withColumn("change", lit("delete"))
        .unionByName(Seq((3L, "join join scan filter join")).toDF("doc_id", "text")
          .withColumn("change", lit("insert")))
      t("upsert") { TextOps.invertedIndexUpsert(spark, dir,
        inserts.unionByName(deletes).unionByName(upd), shards = 8) }
      t("probe1") { TextOps.bm25TopKIndexed(spark, dir, terms,
        k = 10, k1 = 1.2, b = 0.75, shards = 8).collect() }
      t("compact") { TextOps.invertedIndexCompact(spark, dir) }
      t("probe2") { TextOps.bm25TopKIndexed(spark, dir, terms,
        k = 10, k1 = 1.2, b = 0.75, shards = 8).collect() }
      def rmrf(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rmrf)
        f.delete(); ()
      }
      rmrf(new java.io.File(dir))
    }
    spark.stop()
  }
}
