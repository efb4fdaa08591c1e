package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** TPC-DS-SHAPE stretch conformance (SURVEY.md §5.3: the reference
  * names TPC-DS alongside TPC-H as the ROLAP yardstick,
  * docs/olap.md:58) — the query SHAPES TPC-H doesn't exercise, adapted
  * onto the driver's star schema (TESTDATA.md) and run as SQL TEXT
  * with the IDENTICAL text as the DuckDB oracle:
  *
  *  - Q36/Q86: ROLLUP report with `lochierarchy` (grouping-function
  *    arithmetic) and RANK within the rollup parent;
  *  - Q77/Q5: per-channel totals + grand total via GROUPING SETS —
  *    ONE fact scan (Expand), never a rescan per union branch
  *    (plan-pinned in PlanShapeSpec);
  *  - Q44: best/worst window-over-aggregate ranking, self-joined;
  *  - Q75: year-over-year comparison via LAG over an aggregate;
  *  - Q5 multi-CTE: channel CTEs unioned, dim-joined, rolled up —
  *    DECIMAL carried through BOTH aggregation levels so the
  *    re-aggregation stays order-independent;
  *  - Q9: scalar-subquery bucket CASE report;
  *  - Q38/Q87: channel-membership INTERSECT/EXCEPT;
  *  - Q6 (TPC-DS): correlated aggregate threshold — expressed with
  *    exact sum×count arithmetic because DuckDB's AVG is always
  *    DOUBLE (a float boundary could flip membership between engines);
  *  - Q98/Q12: ratio-to-parent via a window SUM over the aggregate.
  *
  * Determinism rules (same as TpchQueries): DECIMAL accumulation for
  * every double measure — including through SECOND-level
  * re-aggregations — doubles only materialized at the outermost
  * select, and a total-order ORDER BY everywhere. */
object TpcdsQueries {

  private def both(name: String, ops: Seq[String], text: String) =
    QuerySpec(name, ops,
      (s: SparkSession, d: String) => {
        Engine.registerAll(s, d); s.sql(text): DataFrame
      },
      Some(text))

  /** Q36/Q86 shape: rollup report with lochierarchy + rank-in-parent.
    * lochierarchy 0 = (nation, segment) leaf, 1 = nation subtotal,
    * 2 = grand total; leaves rank within their nation, subtotals rank
    * against each other. */
  val q_tpcds_rollup_report = both("q_tpcds_rollup_report",
    Seq("A10", "W6", "J1", "A4"), """
    WITH agg AS (
      SELECT CAST(GROUPING(n_name) + GROUPING(c_mktsegment) AS INT)
               AS lochierarchy,
             CASE WHEN GROUPING(c_mktsegment) = 0 THEN n_name END
               AS parent,
             COALESCE(n_name, 'ALL') AS nation,
             COALESCE(c_mktsegment, 'ALL') AS segment,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS gross
      FROM orders JOIN customer ON o_custkey = c_custkey
                  JOIN nation ON c_nationkey = n_nationkey
      GROUP BY ROLLUP(n_name, c_mktsegment))
    SELECT lochierarchy, nation, segment, gross,
           CAST(RANK() OVER (PARTITION BY lochierarchy, parent
                             ORDER BY gross DESC, segment) AS BIGINT)
             AS rank_in_parent
    FROM agg
    ORDER BY lochierarchy DESC, nation, segment""")

  /** Q77/Q5 shape: per-channel, per-year, per-channel-total, and
    * grand-total report from ONE scan via GROUPING SETS (the union of
    * rollups that must NOT rescan the fact per branch). */
  val q_tpcds_channel_union = both("q_tpcds_channel_union",
    Seq("A10", "A4", "F9"), """
    WITH fact AS (
      SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 'express'
                  WHEN o_orderpriority = '3-MEDIUM' THEN 'standard'
                  ELSE 'economy' END AS channel,
             CAST(YEAR(CAST(o_orderdate AS DATE)) AS BIGINT) AS yr,
             CAST(o_totalprice AS DECIMAL(18,2)) AS price
      FROM orders)
    SELECT CAST(GROUPING(channel) + GROUPING(yr) AS INT) AS lvl,
           COALESCE(channel, 'ALL') AS channel,
           CAST(COALESCE(yr, -1) AS BIGINT) AS yr,
           COUNT(*) AS n_orders,
           CAST(SUM(price) AS DOUBLE) AS revenue
    FROM fact
    GROUP BY GROUPING SETS ((channel, yr), (channel), ())
    ORDER BY lvl, channel, yr""")

  /** Q44 shape: best/worst performers — rank a window over an
    * AGGREGATE both directions, self-join rank positions, decorate
    * with the dim. */
  val q_tpcds_window_over_agg = both("q_tpcds_window_over_agg",
    Seq("W6", "A1", "J1", "O5"), """
    WITH perf AS (
      SELECT l_partkey,
             CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
               AS DECIMAL(18,4))) AS DOUBLE) AS rev
      FROM lineitem GROUP BY l_partkey),
    ranked AS (
      SELECT l_partkey, rev,
             RANK() OVER (ORDER BY rev DESC, l_partkey) AS best,
             RANK() OVER (ORDER BY rev ASC, l_partkey) AS worst
      FROM perf)
    SELECT CAST(r1.best AS BIGINT) AS rnk, b.p_name AS best_name,
           w.p_name AS worst_name
    FROM ranked r1 JOIN ranked r2 ON r1.best = r2.worst
         JOIN part b ON r1.l_partkey = b.p_partkey
         JOIN part w ON r2.l_partkey = w.p_partkey
    WHERE r1.best <= 10
    ORDER BY rnk""")

  /** Q75 shape: year-over-year comparison — LAG over a yearly
    * aggregate per segment; the delta of two exact-decimal-derived
    * doubles is deterministic. */
  val q_tpcds_yoy = both("q_tpcds_yoy",
    Seq("W6", "A1", "F9", "J1"), """
    WITH yearly AS (
      SELECT c_mktsegment AS segment,
             CAST(YEAR(CAST(o_orderdate AS DATE)) AS BIGINT) AS yr,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS revenue
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment, YEAR(CAST(o_orderdate AS DATE)))
    SELECT segment, yr, revenue,
           LAG(revenue) OVER (PARTITION BY segment ORDER BY yr)
             AS prev_revenue,
           CAST(revenue - LAG(revenue)
             OVER (PARTITION BY segment ORDER BY yr) AS DOUBLE)
             AS yoy_delta
    FROM yearly
    ORDER BY segment, yr""")

  /** Q5 multi-CTE shape: one CTE per channel (each its own fact
    * slice), UNION ALL with a channel tag, dim join, ROLLUP report.
    * The channel measures stay DECIMAL through the outer
    * re-aggregation — only the final select casts to double, so the
    * two-level sum is order-independent on both engines. */
  val q_tpcds_multi_cte = both("q_tpcds_multi_cte",
    Seq("U1", "A10", "J1", "A4"), """
    WITH express AS (
      SELECT c_nationkey AS nk,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS sales,
             COUNT(*) AS cnt
      FROM orders JOIN customer ON o_custkey = c_custkey
      WHERE o_orderpriority = '1-URGENT' GROUP BY c_nationkey),
    standard AS (
      SELECT c_nationkey AS nk,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS sales,
             COUNT(*) AS cnt
      FROM orders JOIN customer ON o_custkey = c_custkey
      WHERE o_orderpriority = '3-MEDIUM' GROUP BY c_nationkey),
    channels AS (
      SELECT 'express' AS channel, nk, sales, cnt FROM express
      UNION ALL
      SELECT 'standard' AS channel, nk, sales, cnt FROM standard)
    SELECT COALESCE(channel, 'ALL') AS channel,
           COALESCE(n_name, 'ALL') AS nation,
           CAST(SUM(sales) AS DOUBLE) AS sales,
           CAST(SUM(cnt) AS BIGINT) AS orders
    FROM channels JOIN nation ON nk = n_nationkey
    GROUP BY ROLLUP(channel, n_name)
    ORDER BY channel, nation""")

  /** Q9 shape: bucketed scalar-subquery CASE report — five quantity
    * bands, each picking between two aggregates by a count threshold,
    * all as uncorrelated scalar subqueries in one row. */
  val q_tpcds_bucket_counts = both("q_tpcds_bucket_counts",
    Seq("P11", "A6", "P9"), """
    SELECT
      CASE WHEN (SELECT COUNT(*) FROM lineitem
                 WHERE l_quantity BETWEEN 1 AND 10) > 1000
           THEN (SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
                   AS DOUBLE) FROM lineitem
                 WHERE l_quantity BETWEEN 1 AND 10)
           ELSE (SELECT CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)))
                   AS DOUBLE) FROM lineitem
                 WHERE l_quantity BETWEEN 1 AND 10) END AS bucket1,
      CASE WHEN (SELECT COUNT(*) FROM lineitem
                 WHERE l_quantity BETWEEN 11 AND 20) > 1000
           THEN (SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
                   AS DOUBLE) FROM lineitem
                 WHERE l_quantity BETWEEN 11 AND 20)
           ELSE (SELECT CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)))
                   AS DOUBLE) FROM lineitem
                 WHERE l_quantity BETWEEN 11 AND 20) END AS bucket2,
      CASE WHEN (SELECT COUNT(*) FROM lineitem
                 WHERE l_quantity BETWEEN 21 AND 30) > 1000
           THEN (SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
                   AS DOUBLE) FROM lineitem
                 WHERE l_quantity BETWEEN 21 AND 30)
           ELSE (SELECT CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)))
                   AS DOUBLE) FROM lineitem
                 WHERE l_quantity BETWEEN 21 AND 30) END AS bucket3,
      CASE WHEN (SELECT COUNT(*) FROM lineitem
                 WHERE l_quantity BETWEEN 31 AND 40) > 1000
           THEN (SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
                   AS DOUBLE) FROM lineitem
                 WHERE l_quantity BETWEEN 31 AND 40)
           ELSE (SELECT CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)))
                   AS DOUBLE) FROM lineitem
                 WHERE l_quantity BETWEEN 31 AND 40) END AS bucket4,
      CASE WHEN (SELECT COUNT(*) FROM lineitem
                 WHERE l_quantity BETWEEN 41 AND 50) > 1000
           THEN (SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
                   AS DOUBLE) FROM lineitem
                 WHERE l_quantity BETWEEN 41 AND 50)
           ELSE (SELECT CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)))
                   AS DOUBLE) FROM lineitem
                 WHERE l_quantity BETWEEN 41 AND 50) END AS bucket5""")

  /** Q38/Q87 shape: channel-membership set algebra — customers
    * ordering through every channel (INTERSECT chain) and through
    * exactly one (EXCEPT), as counted key sets. */
  val q_tpcds_cross_channel = both("q_tpcds_cross_channel",
    Seq("U3", "P11", "F9"), """
    SELECT
      (SELECT COUNT(*) FROM (
         SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
         INTERSECT
         SELECT o_custkey FROM orders WHERE o_orderpriority = '2-HIGH'
         INTERSECT
         SELECT o_custkey FROM orders
         WHERE YEAR(CAST(o_orderdate AS DATE)) = 1996) t1) AS all_channels,
      (SELECT COUNT(*) FROM (
         SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
         EXCEPT
         SELECT o_custkey FROM orders WHERE o_orderpriority = '2-HIGH')
       t2) AS urgent_only,
      (SELECT COUNT(*) FROM (
         SELECT o_custkey FROM orders WHERE o_orderpriority = '2-HIGH'
         EXCEPT
         SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
       t3) AS high_only""")

  /** TPC-DS Q6 shape: rows above 1.03x their category's average
    * (the synthetic retailprice spread is only ~900-1000, so TPC-DS's
    * 1.2x would select nothing) — expressed as exact
    * `price * count >= 1.03 * sum` DECIMAL arithmetic (DuckDB's AVG
    * returns DOUBLE, and a float boundary must not decide membership
    * differently per engine). */
  val q_tpcds_avg_correlated = both("q_tpcds_avg_correlated",
    Seq("P11", "A6", "A1"), """
    SELECT p_brand, COUNT(*) AS n_premium,
           CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE)
             AS premium_value
    FROM part p1
    WHERE CAST(p_retailprice AS DECIMAL(18,2)) *
            (SELECT COUNT(*) FROM part p2 WHERE p2.p_type = p1.p_type)
          >= 1.03 * (SELECT SUM(CAST(p_retailprice AS DECIMAL(18,2)))
                    FROM part p3 WHERE p3.p_type = p1.p_type)
    GROUP BY p_brand
    ORDER BY p_brand""")

  /** Q98/Q12 shape: ratio-to-parent — per-(type, brand) revenue and
    * its share of the type's total via a window SUM over the
    * aggregate; division happens on exact-decimal-derived doubles. */
  val q_tpcds_class_ratio = both("q_tpcds_class_ratio",
    Seq("W4", "A1", "J1"), """
    WITH rev AS (
      SELECT p_type, p_brand,
             SUM(CAST(l_extendedprice * (1 - l_discount)
               AS DECIMAL(18,4))) AS r
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY p_type, p_brand)
    SELECT p_type, p_brand, CAST(r AS DOUBLE) AS revenue,
           CAST(r AS DOUBLE) /
             CAST(SUM(r) OVER (PARTITION BY p_type) AS DOUBLE)
             AS revenueratio
    FROM rev
    ORDER BY p_type, p_brand""")

  /** Q34/Q73 shape: frequent-buyer HAVING band — per-customer order
    * counts in a period filtered to a count RANGE (the between-N-and-M
    * basket shape), then rolled up by segment over the qualifying
    * set. */
  val q_tpcds_count_having = both("q_tpcds_count_having",
    Seq("A8", "A1", "J1", "F9"), """
    WITH freq AS (
      SELECT o_custkey, COUNT(*) AS cnt
      FROM orders
      WHERE YEAR(CAST(o_orderdate AS DATE)) IN (1996, 1997)
      GROUP BY o_custkey
      HAVING COUNT(*) BETWEEN 2 AND 5)
    SELECT c_mktsegment, COUNT(*) AS n_customers,
           CAST(SUM(cnt) AS BIGINT) AS n_orders
    FROM freq JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment""")

  val all: Seq[QuerySpec] = Seq(
    q_tpcds_rollup_report, q_tpcds_channel_union,
    q_tpcds_window_over_agg, q_tpcds_yoy, q_tpcds_multi_cte,
    q_tpcds_bucket_counts, q_tpcds_cross_channel,
    q_tpcds_avg_correlated, q_tpcds_class_ratio,
    q_tpcds_count_having)
}
