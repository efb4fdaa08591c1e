package graft

import org.apache.spark.sql.functions._
import graft.operators.Behavior

/** Behavioral-analytics conformance queries over the `events` stream
  * table — the user-behavior tag dimension of the reference's profile
  * platform (用户行为, reference docs/画像开发方案.md:4; rule tags from
  * behavior, docs/画像简介.md:16; churn warning from recent login
  * frequency, docs/画像简介.md:23). Funnel semantics are the
  * deterministic leftmost-greedy chain (see [[operators.Behavior]]),
  * which both engines can express exactly — the DuckDB oracle computes
  * the same chain as a cascade of conditional mins.
  */
object BehaviorQueries {

  private val funnelSteps = Seq("view", "click", "purchase")
  private val winUs = 86400L * 1000000L // 1 day, as epoch-micros

  /** Greedy window funnel depth histogram, 1-day window. The Spark
    * side is ONE user-keyed hash agg + a codegen'd array scan; the
    * oracle proves it equals the k-aggregation cascade. */
  val q_funnel_counts = QuerySpec(
    "q_funnel_counts", Seq("A1", "A4", "F9", "X3"),
    (s, d) => Behavior.funnelCounts(
      Engine.table(s, d, "events"), "user_id", "event_type", "ts",
      funnelSteps, 86400L),
    Some(s"""
      WITH e AS (SELECT user_id AS u, epoch_us(CAST(ts AS TIMESTAMP)) AS t,
                        event_type AS s FROM events),
      s1 AS (SELECT u, MIN(t) AS t1 FROM e WHERE s='view' GROUP BY u),
      s2 AS (SELECT e.u AS u, MIN(e.t) AS t2, MIN(s1.t1) AS t1
             FROM e JOIN s1 ON e.u=s1.u
             WHERE e.s='click' AND e.t > s1.t1 AND e.t <= s1.t1 + $winUs
             GROUP BY e.u),
      s3 AS (SELECT e.u AS u, MIN(e.t) AS t3 FROM e JOIN s2 ON e.u=s2.u
             WHERE e.s='purchase' AND e.t > s2.t2 AND e.t <= s2.t1 + $winUs
             GROUP BY e.u)
      SELECT CASE WHEN s3.u IS NOT NULL THEN 3
                  WHEN s2.u IS NOT NULL THEN 2 ELSE 1 END AS depth,
             COUNT(*) AS users
      FROM s1 LEFT JOIN s2 ON s1.u=s2.u LEFT JOIN s3 ON s1.u=s3.u
      GROUP BY 1 ORDER BY 1"""))

  /** Day-N retention matrix: first-active-date cohorts x day offset. */
  val q_retention_cohort = QuerySpec(
    "q_retention_cohort", Seq("A1", "A6", "F9", "J1"),
    (s, d) => Behavior.retentionCohort(
      Engine.table(s, d, "events"), "user_id", "ts", 14),
    Some("""
      WITH act AS (SELECT DISTINCT user_id AS u, CAST(ts AS DATE) AS d
                   FROM events),
      first AS (SELECT u, MIN(d) AS d0 FROM act GROUP BY u)
      SELECT first.d0 AS d0,
             CAST(datediff('day', first.d0, act.d) AS INTEGER) AS offset,
             COUNT(*) AS users
      FROM act JOIN first ON act.u = first.u
      WHERE datediff('day', first.d0, act.d) <= 14
      GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** Event-to-next-event transition counts within a 30-minute gap
    * (path / sankey analysis), tie-broken on event_id. */
  val q_path_transitions = QuerySpec(
    "q_path_transitions", Seq("W6", "A1", "F9"),
    (s, d) => Behavior.pathTransitions(
      Engine.table(s, d, "events"), "user_id", "event_type", "ts",
      "event_id", 1800L),
    Some("""
      WITH o AS (SELECT user_id, event_type AS src,
        epoch_us(CAST(ts AS TIMESTAMP)) AS t,
        lead(event_type) OVER w AS dst,
        lead(epoch_us(CAST(ts AS TIMESTAMP))) OVER w AS nt
        FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
      SELECT src, dst, COUNT(*) AS n FROM o
      WHERE dst IS NOT NULL AND nt - t <= 1800000000
      GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** Churn-risk rule tag (docs/画像简介.md:23): last_seen, days
    * silent as of 2024-01-30, trailing-7-day activity, rule tag. */
  val q_churn_tags = QuerySpec(
    "q_churn_tags", Seq("A4", "A6", "P9", "F9"),
    (s, d) => Behavior.churnRisk(
      Engine.table(s, d, "events"), "user_id", "ts",
      "2024-01-30", 7, 14),
    Some("""
      WITH e AS (SELECT user_id AS u, CAST(ts AS DATE) AS d FROM events
                 WHERE CAST(ts AS DATE) <= DATE '2024-01-30')
      SELECT u, MAX(d) AS last_seen,
        CAST(datediff('day', MAX(d), DATE '2024-01-30') AS INTEGER)
          AS days_silent,
        COUNT(CASE WHEN d > DATE '2024-01-30' - 7 THEN 1 END)
          AS recent_events,
        CASE WHEN datediff('day', MAX(d), DATE '2024-01-30') >= 14
               THEN 'churned'
             WHEN COUNT(CASE WHEN d > DATE '2024-01-30' - 7 THEN 1 END) = 0
               THEN 'at_risk'
             ELSE 'active' END AS churn_tag
      FROM e GROUP BY u ORDER BY u"""))

  /** Daily gap-fill of a sparse metric series (rare high-value events
    * per type): dense spine + LOCF + linear interpolation
    * ([[operators.TimeSeries.gapFillDaily]]). MAX is the day-level
    * aggregate (order-independent — plain double SUM/AVG would be
    * partition-order dependent and break the hash compare). */
  val q_gap_fill = QuerySpec(
    "q_gap_fill", Seq("W1", "W2", "F9", "X3", "J3"),
    (s, d) => {
      val obs = Engine.table(s, d, "events")
        .filter(col("value") > 300.0)
        .groupBy(col("event_type").as("k"),
          col("ts").cast("date").as("dd"))
        .agg(max("value").as("v"))
      operators.TimeSeries.gapFillDaily(obs, Seq("k"), "dd", "v",
          "2024-01-01", "2024-01-30")
        .orderBy("k", "d")
    },
    Some("""
      WITH obs AS (
        SELECT event_type AS k, CAST(ts AS DATE) AS d, MAX(value) AS v
        FROM events WHERE value > 300.0 GROUP BY 1, 2),
      spine AS (
        SELECT t.k AS k, CAST(gs.g AS DATE) AS d
        FROM (SELECT DISTINCT k FROM obs) t
        CROSS JOIN (SELECT unnest(generate_series(DATE '2024-01-01',
                    DATE '2024-01-30', INTERVAL 1 DAY)) AS g) gs),
      j AS (
        SELECT spine.k AS k, spine.d AS d, obs.v AS v_obs FROM spine
        LEFT JOIN obs ON spine.k = obs.k AND spine.d = obs.d),
      w AS (
        SELECT k, d, v_obs,
          last_value(v_obs IGNORE NULLS) OVER
            (PARTITION BY k ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING
             AND CURRENT ROW) AS pv,
          last_value(CASE WHEN v_obs IS NOT NULL THEN d END IGNORE NULLS)
            OVER (PARTITION BY k ORDER BY d ROWS BETWEEN UNBOUNDED
             PRECEDING AND CURRENT ROW) AS pd,
          first_value(v_obs IGNORE NULLS) OVER
            (PARTITION BY k ORDER BY d ROWS BETWEEN CURRENT ROW
             AND UNBOUNDED FOLLOWING) AS nv,
          first_value(CASE WHEN v_obs IS NOT NULL THEN d END IGNORE NULLS)
            OVER (PARTITION BY k ORDER BY d ROWS BETWEEN CURRENT ROW
             AND UNBOUNDED FOLLOWING) AS nd
        FROM j)
      SELECT k, d, v_obs, pv AS v_locf,
        CASE WHEN v_obs IS NOT NULL THEN v_obs
             WHEN pv IS NULL THEN nv
             WHEN nv IS NULL THEN pv
             ELSE pv + (nv - pv) *
                  (CAST(datediff('day', pd, d) AS DOUBLE)
                 / CAST(datediff('day', pd, nd) AS DOUBLE))
        END AS v_interp
      FROM w ORDER BY k, d"""))

  /** Last-touch attribution: purchases credited to the campaign
    * (`props.k`) of the user's most recent click within 1 hour, else
    * "direct" — the backward as-of join re-expressed as a marketing
    * report. DuckDB's native ASOF JOIN is the oracle. */
  val q_attribution = QuerySpec(
    "q_attribution", Seq("J1", "F11", "A6", "W1"),
    (s, d) => Behavior.lastTouchAttribution(
      Engine.table(s, d, "events"), "user_id", "ts",
      convType = "purchase", touchType = "click",
      campaignExpr = get_json_object(col("props"), "$.k"),
      valueCol = "value", tieCol = "event_id", horizonSec = 3600L),
    Some("""
      WITH p AS (SELECT user_id AS u, epoch_us(CAST(ts AS TIMESTAMP)) AS tp,
                        value AS v FROM events WHERE event_type='purchase'),
      c0 AS (SELECT user_id AS u, epoch_us(CAST(ts AS TIMESTAMP)) AS tc,
                    json_extract_string(props, '$.k') AS camp, event_id
             FROM events WHERE event_type='click'),
      c AS (SELECT u, tc, arg_max(camp, event_id) AS camp
            FROM c0 GROUP BY u, tc),
      m AS (SELECT p.v AS v,
              CASE WHEN c.tc IS NOT NULL AND p.tp - c.tc <= 3600000000
                   THEN c.camp ELSE 'direct' END AS campaign
            FROM p ASOF LEFT JOIN c ON p.u = c.u AND p.tp >= c.tc)
      SELECT campaign, COUNT(*) AS n_conv,
             CAST(SUM(CAST(v AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      FROM m GROUP BY campaign ORDER BY campaign"""))

  /** Per-(event_type, day) time-weighted average level: each reading
    * holds until the next same-type reading that day, the last until
    * midnight — exact micro-second weights, decimal accumulation. */
  val q_twap = QuerySpec(
    "q_twap", Seq("W6", "A6", "F9"),
    (s, d) => Behavior.timeWeightedAvg(
      Engine.table(s, d, "events"), "event_type", "ts", "value",
      "event_id"),
    Some("""
      WITH e AS (SELECT event_type AS k, CAST(ts AS DATE) AS d,
                   epoch_us(CAST(ts AS TIMESTAMP)) AS t, value AS v,
                   event_id
                 FROM events),
      o AS (SELECT k, d, t, v,
              COALESCE(lead(t) OVER (PARTITION BY k, d
                                     ORDER BY t, event_id),
                epoch_us(CAST(d AS TIMESTAMP) + INTERVAL 1 DAY)) - t
                AS w_us
            FROM e)
      SELECT k, d,
        CAST(SUM(CAST(v AS DECIMAL(18,2)) * w_us) AS DOUBLE)
          / CAST(SUM(w_us) AS DOUBLE) AS twap,
        COUNT(*) AS n_obs
      FROM o GROUP BY k, d ORDER BY k, d"""))

  /** 7-day moving average of daily revenue per priority — a
    * time-RANGE window frame (`RANGE BETWEEN INTERVAL ... PRECEDING`),
    * the calendar-aware frame a ROWS frame cannot express when days
    * are missing. One SQL text runs verbatim on BOTH engines; the
    * daily sums and the frame sum stay in exact decimal, the division
    * is the only float op. */
  private lazy val movingAvgSql = """
    WITH daily AS (
      SELECT o_orderpriority AS pri, CAST(o_orderdate AS DATE) AS d,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      FROM orders GROUP BY 1, 2)
    SELECT pri, d,
      CAST(SUM(rev) OVER w AS DOUBLE) / (COUNT(*) OVER w) AS ma7
    FROM daily
    WINDOW w AS (PARTITION BY pri ORDER BY d
                 RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW)
    ORDER BY pri, d"""

  val q_moving_avg = QuerySpec(
    "q_moving_avg", Seq("W6", "A6", "F9"),
    (s, d) => { Engine.registerAll(s, d); s.sql(movingAvgSql) },
    Some(movingAvgSql))

  /** Z-score anomaly flags on the daily level series — exact decimal
    * daily sums and sums-of-squares, one double formula at the end
    * (identical text both engines; the per-key stats join broadcasts).
    * The monitoring-side complement of the quality rules. */
  private lazy val anomalySql = """
    WITH daily AS (
      SELECT event_type AS k, CAST(ts AS DATE) AS d,
             SUM(CAST(value AS DECIMAL(18,2))) AS v
      FROM events GROUP BY 1, 2),
    st AS (
      SELECT k, COUNT(*) AS n, CAST(SUM(v) AS DOUBLE) AS s,
             CAST(SUM(v*v) AS DOUBLE) AS ss
      FROM daily GROUP BY 1)
    SELECT daily.k AS k, d, CAST(v AS DOUBLE) AS v,
      (CAST(v AS DOUBLE) - s/n) / sqrt(ss/n - (s/n)*(s/n)) AS z
    FROM daily JOIN st ON daily.k = st.k
    WHERE abs((CAST(v AS DOUBLE) - s/n) / sqrt(ss/n - (s/n)*(s/n))) > 2.0
    ORDER BY k, d"""

  val q_anomaly_zscore = QuerySpec(
    "q_anomaly_zscore", Seq("A6", "J4", "F6"),
    (s, d) => { Engine.registerAll(s, d); s.sql(anomalySql) },
    Some(anomalySql))

  /** RFM segmentation ([[operators.Behavior.rfmSegments]], reference
    * docs/画像简介.md:9-14): purchase recency/frequency/monetary cut
    * into quintiles, segment sizes out. Deterministic ntile via the
    * user-key tie-break. */
  val q_rfm_segments = QuerySpec(
    "q_rfm_segments", Seq("A6", "W6", "A13"),
    (s, d) => Behavior.rfmSegments(
      Engine.table(s, d, "events"), "user_id", "ts",
      convType = "purchase", valueCol = "value", asOf = "2024-01-31",
      buckets = 5),
    Some("""
      WITH p AS (
        SELECT user_id AS u, MAX(CAST(ts AS DATE)) AS last_d,
               COUNT(*) AS f, SUM(CAST(value AS DECIMAL(18,2))) AS m
        FROM events WHERE event_type = 'purchase' GROUP BY 1),
      s AS (
        SELECT u,
          ntile(5) OVER (ORDER BY datediff('day', last_d,
                           DATE '2024-01-31') DESC, u) AS rq,
          ntile(5) OVER (ORDER BY f, u) AS fq,
          ntile(5) OVER (ORDER BY CAST(m AS DOUBLE), u) AS mq
        FROM p)
      SELECT CAST(rq AS BIGINT) AS r_quintile,
             CAST(fq AS BIGINT) AS f_quintile,
             CAST(mq AS BIGINT) AS m_quintile, COUNT(*) AS users
      FROM s GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"""))

  val all: Seq[QuerySpec] = Seq(
    q_funnel_counts, q_retention_cohort, q_path_transitions, q_churn_tags,
    q_gap_fill, q_attribution, q_twap, q_moving_avg, q_anomaly_zscore,
    q_rfm_segments)
}
