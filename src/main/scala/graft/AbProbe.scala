package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev-only one-JVM A/B: time queries alternating a session conf
  * between two values, best-of-N per leg — box weather cancels out
  * (the r18 measurement discipline). Usage:
  *   runMain graft.AbProbe <sfDir> <confKey> <valA> <valB> q_x q_y ...
  * Honors SPARK_GRAFT_CPUS like Bench. The conf is restored to valA
  * after each query.
  */
object AbProbe {
  private def force(df: DataFrame): Unit = {
    df.agg(sum(xxhash64(struct(df.columns.map(col): _*)))).collect()
    ()
  }
  def main(args: Array[String]): Unit = {
    val Array(sfDir, key, valA, valB, rest @ _*) = args.toSeq.toArray
    val names = rest.toSeq
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
      try force(SparkEntry.queries(n)(spark, "/root/testdata/sf0.001"))
      catch { case _: Throwable => () }
      try force(SparkEntry.queries(n)(spark, sfDir))
      catch { case _: Throwable => () }
      try {
        val legs = (1 to 6).map { i =>
          val v = if (i % 2 == 1) valA else valB
          spark.conf.set(key, v)
          System.gc()
          val t0 = System.nanoTime()
          force(SparkEntry.queries(n)(spark, sfDir))
          (v, (System.nanoTime() - t0) / 1e9)
        }
        spark.conf.set(key, valA)
        def best(v: String) = legs.filter(_._1 == v).map(_._2).min
        println(f"AB $n%-26s $key $valA=${best(valA)}%.2fs " +
          f"$valB=${best(valB)}%.2fs " +
          f"runs=${legs.map(l => f"${l._2}%.2f").mkString(",")}")
      } catch { case e: Throwable =>
        spark.conf.set(key, valA)
        println(s"AB $n FAILED ${e.getClass.getSimpleName}: " +
          String.valueOf(e.getMessage).take(160))
      }
    }
    spark.stop()
  }
}
