package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode

/** Golden tests over the `explain("formatted")` surface — the
  * reference's plan-reading workflow (docs/explain.md:12-113 walks a
  * filter+LIKE+group-count plan through scan → pushed filter →
  * map-side partial aggregate → shuffle → final aggregate). Each test
  * pins the formatted-plan fragments that make the plan scale-safe,
  * so a regression that un-pushes a filter, drops partition pruning,
  * or de-broadcasts a dim join fails HERE even while results stay
  * correct. */
class ExplainGoldenSpec extends SparkSuite {

  private def formatted(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("reference worked example (docs/explain.md:17): filter + LIKE " +
      "push to the scan; aggregate is partial then final") {
    // same shape as the reference's dim_app_game_dict example:
    // numeric compare + LIKE '%…%' + GROUP BY count(1)
    val df = spark.sql(
      s"""SELECT p_brand, count(1) AS num
          FROM parquet.`$sf/part.parquet`
          WHERE p_partkey > 100 AND p_name LIKE '%green%'
          GROUP BY p_brand""")
    val plan = formatted(df)
    assert(plan.contains("PushedFilters:"), plan)
    assert(plan.contains("GreaterThan(p_partkey,100)"),
      s"numeric filter not pushed:\n$plan")
    assert(plan.contains("StringContains(p_name,green)"),
      s"LIKE '%…%' not pushed as StringContains:\n$plan")
    // partial (map-side) + final aggregate around one hash exchange —
    // the Hive plan's GroupBy(hash) → shuffle → GroupBy(mergepartial)
    assert("HashAggregate".r.findAllIn(plan).size >= 2,
      s"expected partial+final HashAggregate:\n$plan")
    assert(plan.contains("Exchange") && plan.contains("hashpartitioning"), plan)
  }

  test("case-1 rollup verbatim: grouped count-distinct rollup plans as " +
      "partial/final aggregates over one hash exchange") {
    RefConformance.ensure(spark, sf)
    val df = Queries.byName("q_ref_rollup_verbatim").run(spark, sf)
    val plan = formatted(df)
    // count(distinct CASE …) expands to the two-level distinct
    // aggregate; every level must keep a map-side partial
    assert("HashAggregate".r.findAllIn(plan).size >= 2,
      s"expected partial+final HashAggregate:\n$plan")
    assert(plan.contains("Exchange") && plan.contains("hashpartitioning"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("case-2 window verbatim: partition pruning + single window " +
      "exchange, no join") {
    RefConformance.ensure(spark, sf)
    val df = Queries.byName("q_ref_window_verbatim").run(spark, sf)
    val plan = formatted(df)
    assert(plan.contains("PartitionFilters:"), plan)
    assert(plan.contains("Window"), plan)
    assert(!plan.contains("Join"),
      s"window query must not plan a join:\n$plan")
  }

  test("case-2 decomposition: the three CTAS subsets read pruned " +
      "partitions and the recombination broadcasts") {
    RefConformance.ensure(spark, sf)
    val df = Queries.byName("q_ref_decomposed_verbatim").run(spark, sf)
    val plan = formatted(df)
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastExchange") ||
      plan.contains("SortMergeJoin"),
      s"decomposed recombination join missing:\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
