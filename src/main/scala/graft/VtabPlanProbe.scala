package graft

import org.apache.spark.sql.functions._

/** Dev-only plan evidence for the CDC diff rewrite: builds a two-
  * version vtab, prints the SHIPPED changesBetween plan (one
  * signed-count aggregate) and, for comparison, the textbook
  * exceptAll-pair form it replaced (two aggregates over the union).
  * Usage: runMain graft.VtabPlanProbe <sfDir>
  */
object VtabPlanProbe {
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
    import graft.operators.VersionedTable
    val o = Engine.table(spark, sfDir, "orders")
      .select(col("o_orderkey").cast("long").as("k"),
        col("o_custkey").cast("long").as("v"))
    val root = java.nio.file.Files
      .createTempDirectory("graft_vtab_plan").toString
    VersionedTable.commit(spark, root, o.filter(col("k") % 10 <= 4))
    spark.sql(s"UPDATE vtab.`$root` SET v = v + 1000 WHERE k % 10 = 2")
    println("=== SHIPPED changesBetween(1, 2): one signed-count " +
      "aggregate over the union of changed dirs ===")
    VersionedTable.changesBetween(spark, root, 1L, 2L)
      .explain("formatted")
    println("=== REPLACED form (a.exceptAll(r) UNION r.exceptAll(a)): " +
      "two aggregates, both sides shuffled twice ===")
    val v1 = VersionedTable.read(spark, root, Some(1L))
    val v2 = VersionedTable.read(spark, root, Some(2L))
    v2.exceptAll(v1).withColumn("change", lit("insert"))
      .unionByName(v1.exceptAll(v2).withColumn("change", lit("delete")))
      .explain("formatted")
    spark.stop()
  }
}
