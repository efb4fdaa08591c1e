package graft

import org.apache.spark.sql.functions._
import graft.functions._
import graft.operators.Snapshot

/** Dimensional-model fact-grain conformance (reference
  * docs/数据模型.md:13-25): the reference's modeling catalog names
  * three fact grains — transaction, periodic snapshot, accumulating
  * snapshot. Transaction facts are what every relational query here
  * already scans; these queries prove the two snapshot grains as
  * first-class, oracle-checked builders ([[graft.operators.Snapshot]]).
  */
object ModelQueries {

  private val funnel =
    Seq("first_signup", "first_view", "first_click", "first_purchase")

  private def funnelEvents(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame =
    Engine.table(s, d, "events")
      .filter(col("event_type")
        .isin("signup", "view", "click", "purchase"))
      .select(col("user_id"),
        concat(lit("first_"), col("event_type")).as("milestone"),
        col("ts").cast("date").as("evt"))

  /** Accumulating-snapshot fact table (docs/数据模型.md:21-25): one row
    * per user lifecycle, funnel milestones as date columns (first
    * signup/view/click/purchase), surrogate date key 9999-12-31 for
    * milestones not reached by the as-of date, last_updated audit
    * column. One conditional-min hash agg on the lifecycle key. */
  val q_accum_snapshot = QuerySpec(
    "q_accum_snapshot", Seq("A1", "A4", "P9"),
    (s, d) => {
      val asOf = lit("2024-01-05").cast("date")
      val snap = Snapshot.accumulating(
        funnelEvents(s, d).filter(col("evt") <= asOf),
        Seq("user_id"), "milestone", "evt", funnel)
      Snapshot.withUnknownDateKey(snap, funnel,
          lit("9999-12-31").cast("date"))
        .orderBy("user_id")
    },
    Some("""
      WITH ev AS (
        SELECT user_id, 'first_' || event_type AS m, CAST(ts AS DATE) AS evt
        FROM events
        WHERE CAST(ts AS DATE) <= DATE '2024-01-05'
          AND event_type IN ('signup','view','click','purchase'))
      SELECT user_id,
        COALESCE(MIN(CASE WHEN m='first_signup' THEN evt END),
                 DATE '9999-12-31') AS first_signup,
        COALESCE(MIN(CASE WHEN m='first_view' THEN evt END),
                 DATE '9999-12-31') AS first_view,
        COALESCE(MIN(CASE WHEN m='first_click' THEN evt END),
                 DATE '9999-12-31') AS first_click,
        COALESCE(MIN(CASE WHEN m='first_purchase' THEN evt END),
                 DATE '9999-12-31') AS first_purchase,
        MAX(evt) AS last_updated
      FROM ev GROUP BY user_id ORDER BY user_id"""))

  /** The UPDATABLE half of the accumulating snapshot
    * (docs/数据模型.md:25 — the table "可以对它进行更新" after load):
    * build the snapshot as of Jan 3, merge the Jan 4-10 delta via
    * [[Snapshot.mergeAccumulating]] (one full-outer-join shuffle;
    * least() fills unknown milestones, new lifecycles insert), and the
    * oracle recomputes the FULL snapshot from raw events — hash
    * equality proves merged == rebuilt exactly. */
  val q_accum_snapshot_incremental = QuerySpec(
    "q_accum_snapshot_incremental", Seq("A1", "A4", "J1"),
    (s, d) => {
      val t1 = lit("2024-01-03").cast("date")
      val t2 = lit("2024-01-10").cast("date")
      val ev = funnelEvents(s, d)
      val existing = Snapshot.accumulating(
        ev.filter(col("evt") <= t1),
        Seq("user_id"), "milestone", "evt", funnel)
      val delta = Snapshot.accumulating(
        ev.filter(col("evt") > t1 && col("evt") <= t2),
        Seq("user_id"), "milestone", "evt", funnel)
      val merged = Snapshot.mergeAccumulating(
        existing, delta, Seq("user_id"), funnel)
      Snapshot.withUnknownDateKey(merged, funnel,
          lit("9999-12-31").cast("date"))
        .orderBy("user_id")
    },
    Some("""
      WITH ev AS (
        SELECT user_id, 'first_' || event_type AS m, CAST(ts AS DATE) AS evt
        FROM events
        WHERE CAST(ts AS DATE) <= DATE '2024-01-10'
          AND event_type IN ('signup','view','click','purchase'))
      SELECT user_id,
        COALESCE(MIN(CASE WHEN m='first_signup' THEN evt END),
                 DATE '9999-12-31') AS first_signup,
        COALESCE(MIN(CASE WHEN m='first_view' THEN evt END),
                 DATE '9999-12-31') AS first_view,
        COALESCE(MIN(CASE WHEN m='first_click' THEN evt END),
                 DATE '9999-12-31') AS first_click,
        COALESCE(MIN(CASE WHEN m='first_purchase' THEN evt END),
                 DATE '9999-12-31') AS first_purchase,
        MAX(evt) AS last_updated
      FROM ev GROUP BY user_id ORDER BY user_id"""))

  /** Periodic-snapshot fact table (docs/数据模型.md:17-19 — the doc's
    * monthly account-balance example): monthly 1995 snapshot of
    * cumulative order spend per nation-7 customer, DENSE over the
    * 12-month spine with the balance carried forward through inactive
    * months and pre-1995 activity folded into the opening balance. */
  val q_periodic_snapshot = QuerySpec(
    "q_periodic_snapshot", Seq("A1", "A6", "J3", "W4"),
    (s, d) => {
      val cust = Engine.table(s, d, "customer")
        .filter(col("c_nationkey") === 7).select("c_custkey")
      val deltas = Engine.table(s, d, "orders")
        .join(cust, col("o_custkey") === col("c_custkey"))
        .select(col("o_custkey").as("ck"),
          date_trunc("month", col("o_orderdate")).cast("date").as("p"),
          dec2(col("o_totalprice")).as("amt"))
      Snapshot.periodic(deltas, Seq("ck"), "p", "amt",
          lit("1995-01-01").cast("date"), lit("1995-12-01").cast("date"))
        .select(col("ck"), col("period"),
          col("period_delta").cast("double").as("period_delta"),
          col("balance").cast("double").as("balance"))
        .orderBy("ck", "period")
    },
    Some("""
      WITH cust AS (SELECT c_custkey FROM customer WHERE c_nationkey = 7),
      d AS (SELECT o_custkey AS ck,
              GREATEST(CAST(date_trunc('month', o_orderdate) AS DATE),
                       DATE '1995-01-01') AS p,
              CAST(o_totalprice AS DECIMAL(18,2)) AS amt
            FROM orders JOIN cust ON o_custkey = c_custkey
            WHERE CAST(date_trunc('month', o_orderdate) AS DATE)
                    <= DATE '1995-12-01'),
      sums AS (SELECT ck, p, SUM(amt) AS dlt FROM d GROUP BY ck, p),
      spine AS (SELECT e.ck, CAST(gs.generate_series AS DATE) AS period
                FROM (SELECT DISTINCT ck FROM sums) e
                CROSS JOIN generate_series(TIMESTAMP '1995-01-01',
                  TIMESTAMP '1995-12-01', INTERVAL '1 month') gs)
      SELECT s.ck, s.period,
        CAST(COALESCE(m.dlt, 0) AS DOUBLE) AS period_delta,
        CAST(SUM(COALESCE(m.dlt, 0))
               OVER (PARTITION BY s.ck ORDER BY s.period) AS DOUBLE)
          AS balance
      FROM spine s LEFT JOIN sums m ON s.ck = m.ck AND s.period = m.p
      ORDER BY s.ck, s.period"""))

  val all: Seq[QuerySpec] = Seq(
    q_accum_snapshot, q_accum_snapshot_incremental, q_periodic_snapshot)
}
