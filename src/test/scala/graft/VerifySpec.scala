package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The correctness artifact must be CLOSED over the declared query set:
  * one parquet dump per query, with thrown queries surfacing as an
  * `__error` sentinel dump rather than vanishing (round 9 lost 71
  * broken queries to exactly that — the driver's artifact silently
  * shrank and read as all-green). */
class VerifySpec extends SparkSuite {

  test("dumpAll writes one dump per declared query, sentinel on throw") {
    val out = tmpDir("verifyspec")
    val queries = Map[String, (SparkSession, String) => DataFrame](
      "q_good" -> ((s, _) => s.range(3).toDF("n")),
      "q_bad" -> ((_, _) => throw new RuntimeException("planted failure")),
      "q_bad_null_msg" -> ((_, _) => throw new RuntimeException()))
    val errors = Verify.dumpAll(spark, sf, out, queries)

    // every declared query has a dump directory
    val dumped = new java.io.File(out).listFiles.filter(_.isDirectory)
      .map(_.getName).toSet
    assert(dumped == queries.keySet,
      s"dump dirs $dumped != declared ${queries.keySet}")

    // the clean query's dump is its result
    assert(spark.read.parquet(s"$out/q_good").count() == 3)

    // thrown queries leave the __error sentinel with the message
    val bad = spark.read.parquet(s"$out/q_bad")
    assert(bad.columns.toSeq == Seq("__error"))
    assert(bad.collect().map(_.getString(0)).toSeq ==
      Seq("planted failure"))
    assert(errors == Map(
      "q_bad" -> "planted failure",
      "q_bad_null_msg" -> "java.lang.RuntimeException"))
  }

  test("dumpAll over the full declared set stays aligned with oracleSql") {
    // Closure guard at the declaration level: every oracle refers to a
    // declared query (a stale oracle key would make the driver compare
    // a dump that never exists).
    val undeclared = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(undeclared.isEmpty,
      s"oracleSql keys without a queries entry: $undeclared")
  }
}
