package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the driver contract for Bench's ONE stdout JSON line: the
  * driver keeps only the last ~2000 chars of stdout and parses the
  * line out of that tail, so the line must fit ~1915 chars at any
  * suite size — including the 225-query size the suite is growing
  * toward (r17 verdict task 7). No SparkSession needed: the line
  * renderer is pure. */
class BenchSpec extends AnyFunSuite {

  /** Real suite names plus realistic synthetic growth up to `n`. */
  private def syntheticResults(n: Int): Seq[(String, Double)] = {
    val real = SparkEntry.queries.keys.toSeq.sorted
    val extra = (real.size until n).map(i =>
      f"q_tpcds_future_shape_${i}%03d")
    (real ++ extra).zipWithIndex.map { case (name, i) =>
      // realistic spread: most sub-second, a slow tail up to ~9s
      name -> (0.11 + (i % 7) * 0.37 + (if (i % 23 == 0) 6.3 else 0.0))
    }
  }

  test("stdout line fits the driver tail at the CURRENT suite size") {
    val line = Bench.stdoutLine(syntheticResults(
      SparkEntry.queries.size), Seq.empty, "", "/root/testdata/sf0.1")
    assert(line.length <= 1915, s"line is ${line.length} chars")
    assert(line.startsWith("""{"metric":"total","value":"""))
  }

  test("stdout line fits at 225 queries, gate bits and total survive") {
    val results = syntheticResults(225)
    val gate = ""","rechecked":3,"regr":1,"drift":2"""
    val line = Bench.stdoutLine(results, Seq("q_failed_one"), gate,
      "/root/testdata/sf0.1")
    assert(line.length <= 1915, s"line is ${line.length} chars")
    assert(line.contains("\"metric\":\"total\""))
    // the gate verdicts must survive whatever degradation was applied
    assert(line.contains("\"regr\":1"), line.take(200))
    assert(line.contains("\"drift\":2"), line.take(200))
    // valid JSON object shape: balanced braces (regex-free driver
    // parses the {...} span)
    assert(line.count(_ == '{') == line.count(_ == '}'))
  }

  test("stdout line survives pathological 400-query growth by packing " +
      "the slowest queries") {
    val results = syntheticResults(400)
    val line = Bench.stdoutLine(results, Seq.empty, ""","regr":1""",
      "/root/testdata/sf0.1")
    assert(line.length <= 1915, s"line is ${line.length} chars")
    // degraded format still carries the suite-wide accounting
    assert(line.contains("\"n_queries\":400"))
    assert(line.contains("\"regr\":1"))
    // the slowest entries (the 6.x-second tail) must be present
    assert(line.contains("\"slowest\":{"))
    assert("""[0-9]\":6\.""".r.findFirstIn(line).isDefined ||
      line.contains(":6."), "slow tail missing from packed map")
  }
}
