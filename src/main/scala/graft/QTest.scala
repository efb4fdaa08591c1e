package graft

/** Dev-only: run one named query at a given sf dir and show it. */
object QTest {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = Engine.session()
    val df = Queries.byName(name).run(spark, sfDir)
    df.explain("formatted")
    df.show(30, truncate = 40)
    println(s"rows=${df.count()}")
    spark.stop()
  }
}
