package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Dev-only: time named queries at a given sf dir with the same
  * full-materialization hash as [[Bench]]; `-explain` also dumps the
  * formatted physical plan. Usage:
  *   runMain graft.Profile <sfDir> [-explain] q_a q_b ...
  * Honors SPARK_GRAFT_CPUS like Bench so timings reproduce the bench
  * environment (default 32 = the driver's setting).
  */
object Profile {
  private def force(df: DataFrame): Unit = {
    df.agg(sum(xxhash64(struct(df.columns.map(col): _*)))).collect()
    ()
  }
  def main(args: Array[String]): Unit = {
    val explain = args.contains("-explain")
    val positional = args.filterNot(_.startsWith("-"))
    require(positional.nonEmpty && new java.io.File(positional.head).isDirectory,
      s"first positional arg must be an sf data dir, got: ${positional.headOption.getOrElse("<none>")}")
    val sfDir = positional.head
    val names = positional.tail
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Engine.configure(spark)
    try RefConformance.ensure(spark, sfDir) catch { case _: Throwable => () }
    names.foreach { n =>
      if (!SparkEntry.queries.contains(n))
        println(s"PROFILE $n SKIPPED (unknown query name)")
      else {
        // warm once at tiny scale for JIT parity with Bench, then once
        // untimed at sfDir so one-time artifact builds (IVF index, CTAS
        // fixtures) don't skew the first printed run
        try force(SparkEntry.queries(n)(spark, "/root/testdata/sf0.001"))
        catch { case _: Throwable => () }
        try force(SparkEntry.queries(n)(spark, sfDir))
        catch { case _: Throwable => () }
        try {
          val times = (1 to 3).map { _ =>
            val t0 = System.nanoTime()
            force(SparkEntry.queries(n)(spark, sfDir))
            (System.nanoTime() - t0) / 1e9
          }
          println(f"PROFILE $n%-28s best=${times.min}%.2fs runs=${times.map(t => f"$t%.2f").mkString(",")}")
          if (explain) SparkEntry.queries(n)(spark, sfDir).explain("formatted")
        } catch { case e: Throwable =>
          println(s"PROFILE $n FAILED ${e.getClass.getSimpleName}: ${e.getMessage.take(200)}")
        }
      }
    }
    spark.stop()
  }
}
