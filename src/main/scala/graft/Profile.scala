package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Dev-only: time named queries at a given sf dir with the same
  * full-materialization hash as [[Bench]]; `-explain` also dumps the
  * formatted physical plan. Usage:
  *   runMain graft.Profile <sfDir> [-explain] q_a q_b ...
  */
object Profile {
  private def force(df: DataFrame): Unit = {
    df.agg(sum(xxhash64(struct(df.columns.map(col): _*)))).collect()
    ()
  }
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val explain = args.contains("-explain")
    val names = args.drop(1).filterNot(_ == "-explain")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Engine.configure(spark)
    try RefConformance.ensure(spark, sfDir) catch { case _: Throwable => () }
    names.foreach { n =>
      // warm once at tiny scale for JIT parity with Bench
      try force(SparkEntry.queries(n)(spark, "/root/testdata/sf0.001"))
      catch { case _: Throwable => () }
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        force(SparkEntry.queries(n)(spark, sfDir))
        (System.nanoTime() - t0) / 1e9
      }
      println(f"PROFILE $n%-28s best=${times.min}%.2fs runs=${times.map(t => f"$t%.2f").mkString(",")}")
      if (explain) SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
