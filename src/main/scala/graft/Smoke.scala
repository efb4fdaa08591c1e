package graft

/** Dev-only smoke entry: prints schemas + a row from each testdata table. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = Engine.session()
    Engine.registerAll(spark, sfDir)
    Engine.tableNames.foreach { t =>
      try {
        val df = spark.table(t)
        println(s"== $t: ${df.count()} rows; schema=${df.schema.simpleString}")
        df.show(2, truncate = 60)
      } catch {
        case e: Throwable => println(s"== $t FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
