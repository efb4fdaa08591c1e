package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Behavioral analytics over event streams — the query family behind
  * the reference's user-profile behavior tags (用户行为 tag dimension,
  * reference docs/画像开发方案.md:4; rule tags derived from behavior,
  * docs/画像简介.md:16) and its churn-warning example ("针对用户最近的
  * 登陆频率以及相关行为预测用户流失预警", docs/画像简介.md:23).
  *
  * Scale notes (100 TB):
  *  - Every operator here shuffles ONCE on the user key (hash agg or
  *    user-keyed window) and then once more on the tiny result grain
  *    (cohort day, funnel depth, step pair). No content-keyed windows,
  *    no cross joins, no driver-side data.
  *  - [[windowFunnel]] deliberately collects each user's in-funnel
  *    events into one sorted array. Per-user event counts are bounded
  *    in behavioral data (and the collect happens AFTER filtering to
  *    funnel steps only); this is the same per-group-array contract
  *    ClickHouse's windowFunnel/sequenceMatch use. The scan itself is
  *    a codegen'd higher-order `aggregate`, so the whole funnel is one
  *    partial/final hash agg + a map — k-step funnels do NOT pay k
  *    shuffles. The collect is a BOUNDED earliest-N typed aggregate
  *    ([[graft.functions.EarliestEventsAgg]]), so one pathological
  *    bot key can't grow a task buffer without limit.
  */
object Behavior {

  /** Epoch microseconds of a (possibly NTZ) timestamp column — the
    * session is pinned UTC, so this matches DuckDB's
    * `epoch_us(CAST(ts AS TIMESTAMP))` exactly (integer micros). */
  private def epochUs(ts: Column): Column = unix_micros(ts.cast("timestamp"))

  /** Leftmost-greedy window funnel: for each user, the chain starts at
    * the FIRST occurrence of `steps.head`; each later step is matched
    * by the first event of that type strictly after the previous
    * match and within `windowSec` of the chain start. Returns one row
    * per user that entered the funnel: (user, depth, t0_us).
    *
    * Deterministic and SQL-expressible (a cascade of conditional mins),
    * which is what makes it oracle-checkable cross-engine — unlike
    * backtracking "does any chain exist" variants. One hash agg on the
    * user key; the in-array scan is a Catalyst higher-order function.
    *
    * `maxEventsPerUser` bounds the per-user collected timeline (the
    * one open-ended buffer in this shape — the r12 scale probe
    * measured real per-user arrays flat at ~65 as users scale with
    * events, leaving a single pathological bot key as the residual
    * task-memory risk): [[graft.functions.EarliestEventsAgg]] keeps
    * the EARLIEST cap pairs with map-side eviction, so a bot's raw
    * event count never reaches the shuffle. For any user at or under
    * the cap the result is bit-identical to the unbounded collect;
    * an over-cap user is evaluated on the earliest `cap` in-funnel
    * events — the exact prefix the leftmost-greedy chain reads first.
    */
  def windowFunnel(events: DataFrame, userCol: String, stepCol: String,
      tsCol: String, steps: Seq[String], windowSec: Long,
      maxEventsPerUser: Int = 1 << 20): DataFrame = {
    require(steps.nonEmpty)
    val win = windowSec * 1000000L
    val stepIdx = steps.zipWithIndex
      .foldLeft(lit(-1)) { case (acc, (s, i)) =>
        when(col(stepCol) === s, lit(i)).otherwise(acc)
      }
    val k = steps.length
    events
      .select(col(userCol).as("u"), epochUs(col(tsCol)).as("t"),
        stepIdx.as("si"))
      .filter(col("si") >= 0)
      .groupBy("u")
      .agg(graft.functions.EarliestEventsAgg
        .earliestEvents(col("t"), col("si"), maxEventsPerUser).as("ev"))
      .select(col("u"),
        aggregate(col("ev"),
          struct(lit(0L).as("t0"), lit(0).as("depth"), lit(0L).as("last")),
          (acc, e) => {
            val t = e.getField("t"); val si = e.getField("si")
            val entered = acc.getField("depth") > 0
            val start = when(!entered && si === 0,
              struct(t.as("t0"), lit(1).as("depth"), t.as("last")))
            val advance = when(entered &&
                acc.getField("depth") < k &&
                si === acc.getField("depth") &&
                t > acc.getField("last") &&
                t <= acc.getField("t0") + win,
              struct(acc.getField("t0").as("t0"),
                (acc.getField("depth") + 1).as("depth"),
                t.as("last")))
            coalesce(start, advance, acc)
          }).as("f"))
      .filter(col("f.depth") > 0)
      .select(col("u"), col("f.depth").as("depth"), col("f.t0").as("t0_us"))
  }

  /** ALL funnel episodes per user — the batch twin of
    * [[graft.streaming.StreamOps.streamingFunnelEpisodes]]: the greedy
    * chain emits and resets on completion (depth = k) or when an
    * event beyond the open window closes it, and the next step-1
    * event anchors a fresh episode. Returns (user, episode depth, t0,
    * complete); an open trailing chain is reported incomplete (in
    * streaming it is still pending — the differential law compares
    * closed episodes plus final state). Same single-shuffle shape as
    * [[windowFunnel]]; the scan carries the episode list through the
    * fold, bounded by the user's episode count. `maxEventsPerUser`
    * bounds the per-user timeline exactly as in [[windowFunnel]]. */
  def funnelEpisodes(events: DataFrame, userCol: String, stepCol: String,
      tsCol: String, steps: Seq[String], windowSec: Long,
      maxEventsPerUser: Int = 1 << 20): DataFrame = {
    require(steps.nonEmpty)
    val win = windowSec * 1000000L
    val stepIdx = steps.zipWithIndex
      .foldLeft(lit(-1)) { case (acc, (s, i)) =>
        when(col(stepCol) === s, lit(i)).otherwise(acc)
      }
    val k = steps.length
    val emptyEp = array().cast("array<struct<t0:bigint,depth:int>>")
    events
      .select(col(userCol).as("u"), epochUs(col(tsCol)).as("t"),
        stepIdx.as("si"))
      .filter(col("si") >= 0)
      .groupBy("u")
      .agg(graft.functions.EarliestEventsAgg
        .earliestEvents(col("t"), col("si"), maxEventsPerUser).as("ev"))
      .select(col("u"),
        aggregate(col("ev"),
          struct(lit(0L).as("t0"), lit(0).as("depth"), lit(0L).as("last"),
            emptyEp.as("eps")),
          (acc, e) => {
            val t = e.getField("t"); val si = e.getField("si")
            val open = acc.getField("depth") > 0
            // close an expired chain, then run the per-event greedy step
            val closed = when(open && t > acc.getField("t0") + win,
              struct(lit(0L).as("t0"), lit(0).as("depth"),
                lit(0L).as("last"),
                concat(acc.getField("eps"),
                  array(struct(acc.getField("t0").as("t0"),
                    acc.getField("depth").as("depth")))).as("eps")))
            val cur = coalesce(closed, acc)
            val curOpen = cur.getField("depth") > 0
            val start = when(!curOpen && si === 0,
              struct(t.as("t0"), lit(1).as("depth"), t.as("last"),
                cur.getField("eps").as("eps")))
            val advanced = when(curOpen &&
                si === cur.getField("depth") &&
                t > cur.getField("last") &&
                t <= cur.getField("t0") + win,
              when(cur.getField("depth") + 1 === k,
                // complete: emit the episode, free the slot
                struct(lit(0L).as("t0"), lit(0).as("depth"),
                  lit(0L).as("last"),
                  concat(cur.getField("eps"),
                    array(struct(cur.getField("t0").as("t0"),
                      lit(k).as("depth")))).as("eps")))
                .otherwise(struct(cur.getField("t0").as("t0"),
                  (cur.getField("depth") + 1).as("depth"),
                  t.as("last"), cur.getField("eps").as("eps"))))
            coalesce(start, advanced, cur)
          }).as("f"))
      .select(col("u"),
        posexplode(when(col("f.depth") > 0,
            concat(col("f.eps"), array(struct(col("f.t0").as("t0"),
              col("f.depth").as("depth")))))
          .otherwise(col("f.eps"))),
        size(col("f.eps")).as("__nClosed"))
      .select(col("u"), col("col.depth").as("depth"),
        col("col.t0").as("t0_us"),
        (col("col.depth") === k).as("complete"),
        (col("pos") < col("__nClosed") || col("col.depth") === k)
          .as("closed"))
  }

  /** Funnel depth histogram: users whose greedy chain reached EXACTLY
    * depth d, for d in 1..k. The standard funnel report row. */
  def funnelCounts(events: DataFrame, userCol: String, stepCol: String,
      tsCol: String, steps: Seq[String], windowSec: Long): DataFrame =
    windowFunnel(events, userCol, stepCol, tsCol, steps, windowSec)
      .groupBy("depth").agg(count(lit(1)).as("users"))
      .orderBy("depth")

  /** Classic day-N retention matrix: cohort = each user's first active
    * date; for every (cohort_day, day offset) the number of cohort
    * users active on that offset. Two user-keyed hash aggs (first-day,
    * distinct user-day) joined on the SAME key — co-partitioned, no
    * extra exchange — then one tiny agg on the (cohort, offset) grain. */
  def retentionCohort(events: DataFrame, userCol: String, tsCol: String,
      maxOffsetDays: Int): DataFrame = {
    val act = events
      .select(col(userCol).as("u"), col(tsCol).cast("date").as("d"))
      .distinct()
    val first = act.groupBy("u").agg(min(col("d")).as("d0"))
    act.join(first, "u")
      .select(col("d0"), datediff(col("d"), col("d0")).as("offset"))
      .filter(col("offset") <= maxOffsetDays)
      .groupBy("d0", "offset").agg(count(lit(1)).as("users"))
      .orderBy("d0", "offset")
  }

  /** Event-to-next-event transition counts (path / sankey analysis):
    * consecutive event pairs per user with gap <= `gapSec`, counted by
    * (src, dst). The lead() window is keyed on the user — a real key,
    * not content — so partitions sort locally and never skew beyond a
    * single user's history. */
  def pathTransitions(events: DataFrame, userCol: String, stepCol: String,
      tsCol: String, orderTieCol: String, gapSec: Long): DataFrame = {
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(orderTieCol))
    events
      .select(col(userCol), col(stepCol).as("src"),
        epochUs(col(tsCol)).as("t"), col(orderTieCol),
        lead(col(stepCol), 1).over(w).as("dst"),
        lead(epochUs(col(tsCol)), 1).over(w).as("nt"))
      .filter(col("dst").isNotNull &&
        col("nt") - col("t") <= gapSec * 1000000L)
      .groupBy("src", "dst").agg(count(lit(1)).as("n"))
      .orderBy("src", "dst")
  }

  /** Last-touch attribution: each conversion event is credited to the
    * most recent touch event of the same user at-or-before it and
    * within `horizonSec`; conversions with no in-horizon touch credit
    * `"direct"`. The core is the existing backward as-of join
    * ([[Relational.asofJoinBackward]] — user-keyed, segmented-scan
    * scalable); touches are first deduped to one per (user, instant)
    * with a deterministic arg-max so ties cannot introduce
    * partition-order nondeterminism. Returns per-campaign conversion
    * count + revenue (exact decimal accumulation). */
  def lastTouchAttribution(events: DataFrame, userCol: String,
      tsCol: String, convType: String, touchType: String,
      campaignExpr: Column, valueCol: String, tieCol: String,
      horizonSec: Long): DataFrame = {
    val conv = events.filter(col("event_type") === convType)
      .select(col(userCol).as("u"), epochUs(col(tsCol)).as("tp"),
        col(valueCol).as("v"))
    val touches = events.filter(col("event_type") === touchType)
      .select(col(userCol).as("u"), epochUs(col(tsCol)).as("tc"),
        campaignExpr.as("camp"), col(tieCol).as("__tie"))
      .groupBy("u", "tc")
      .agg(max_by(col("camp"), col("__tie")).as("camp"))
    Relational.asofJoinBackward(conv, touches,
        key = "u", leftTs = "tp", rightTs = "tc",
        payload = Seq("tc", "camp"))
      .select(col("v"),
        when(col("tc").isNotNull &&
            col("tp") - col("tc") <= horizonSec * 1000000L, col("camp"))
          .otherwise(lit("direct")).as("campaign"))
      .groupBy("campaign")
      .agg(count(lit(1)).as("n_conv"),
        graft.functions.dsum2(col("v")).as("revenue"))
      .orderBy("campaign")
  }

  /** Per-(key, day) time-weighted average of a level reading: each
    * event's value holds until the next event of that key that day,
    * the last until midnight. Weights are exact epoch-micros deltas;
    * the weighted sum accumulates in exact decimal, so the result is
    * deterministic under any partitioning. One user-keyed window +
    * one hash agg. */
  def timeWeightedAvg(events: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(col("k"), col("d"))
      .orderBy(col("t"), col("__tie"))
    events
      .select(col(keyCol).as("k"), col(tsCol).cast("date").as("d"),
        epochUs(col(tsCol)).as("t"), col(valueCol).as("v"),
        col(tieCol).as("__tie"))
      .withColumn("t_next", coalesce(lead(col("t"), 1).over(w),
        unix_micros(col("d").cast("timestamp") + expr("interval 1 day"))))
      .withColumn("w_us", col("t_next") - col("t"))
      .groupBy("k", "d")
      // the measure is a 2-dp quantity and the weight an integer, so
      // the weighted sum is EXACT decimal end to end — the only float
      // op is the final division (cross-engine deterministic); a
      // double product would hit engine-specific decimal-cast rounding
      .agg((sum(graft.functions.dec2(col("v")) * col("w_us"))
          .cast("double") / sum(col("w_us"))).as("twap"),
        count(lit(1)).as("n_obs"))
      .orderBy("k", "d")
  }

  /** A single-task global ntile is acceptable up to this many rows:
    * ≤ 2^20 user-grain summary rows at ~32 B each is one ~32 MiB sort
    * in a lone window task — the same memory class as the
    * broadcast/driver bounds documented across the operators. Above
    * it, [[rfmSegments]] switches to [[ntileExact]] so no single task
    * ever holds the whole frame. */
  private[graft] val ntileWindowMax: Long = 1L << 20

  /** Exact `ntile(buckets)` over a TOTAL order WITHOUT the
    * single-partition window Spark plans for a global ntile (which
    * serializes the whole frame through one task — a wall once the
    * frame outgrows one executor). Two-phase distributed rank — the
    * same move as [[TextOps.packSequences]]' prefix sum, generalized
    * from the id domain to an arbitrary unique sort key:
    *   1. `repartitionByRange` on the sort key, pinned with ONE
    *      localCheckpoint so the counts job and the rank job below
    *      see the SAME physical partitioning (range boundaries come
    *      from a sample; a re-planned exchange could move rows);
    *   2. per-partition row counts — one row per partition, the
    *      packSequences/IVF-centroid driver bound — prefix-summed on
    *      the driver into partition offsets;
    *   3. per-partition row_number + the partition's offset = exact
    *      global position, then ntile's fill rule (the first
    *      n mod buckets tiles take one extra row) applied
    *      arithmetically.
    * The sort key must be UNIQUE (callers append a tie-break column,
    * as any deterministic ntile already must): uniqueness is what
    * makes the result independent of where the sampled range
    * boundaries happen to land, and is why no key can hot-spot one
    * range partition. */
  private[graft] def ntileExact(df: DataFrame, n: Long,
      order: Seq[Column], buckets: Int, outCol: String): DataFrame = {
    require(buckets > 0, s"ntileExact: buckets must be positive, got $buckets")
    val spark = df.sparkSession
    val parts = spark.sparkContext.defaultParallelism
    val parted = df.repartitionByRange(parts, order: _*).localCheckpoint()
    val withP = parted.withColumn("__p", spark_partition_id())
    val counts = withP.groupBy("__p").count().collect()
      .map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offs = counts.map { case (p, c) => val o = acc; acc += c; (p, o) }
    require(acc == n,
      s"ntileExact: counted $acc rows but caller passed n=$n")
    import spark.implicits._
    val offDf = offs.toSeq.toDF("__p", "__off")
    val win = Window.partitionBy("__p").orderBy(order: _*)
    val q = n / buckets
    val r = n % buckets
    val qq = math.max(q, 1L) // the otherwise-branch is unreachable at q=0
    withP.join(broadcast(offDf), Seq("__p"))
      .withColumn("__pos", col("__off") + row_number().over(win))
      .withColumn(outCol,
        when(col("__pos") <= lit(r * (q + 1)),
            expr(s"(__pos + $q) div ${q + 1}")) // ceil(pos / (q+1))
          .otherwise(lit(r) +
            expr(s"(__pos - ${r * (q + 1)} + $qq - 1) div $qq"))
          .cast("long"))
      .drop("__p", "__off", "__pos")
  }

  /** RFM segmentation — the canonical statistical profile tag
    * (统计类标签, reference docs/画像简介.md:9-14: recency 最近一次
    * 消费, frequency 消费频率, monetary 消费金额): per-user recency /
    * frequency / monetary from conversion events, each cut into
    * `buckets` quantiles by ntile (ties broken on the user key, so
    * the cut is deterministic), reported as segment sizes. Shape: one
    * user-keyed conditional agg, three rank cuts over the (already
    * user-grain) summary — never over raw events — and a tiny final
    * agg on the segment grain. Up to [[ntileWindowMax]] users the
    * cuts are plain global-ntile windows (one bounded sort task);
    * above it they switch to the distributed [[ntileExact]] — same
    * tags bit-for-bit (the switch is pinned by a differencing test),
    * no task ever holds the full user summary. `windowMax` is a test
    * hook to force the distributed path on a small fixture;
    * production callers never pass it. */
  def rfmSegments(events: DataFrame, userCol: String, tsCol: String,
      convType: String, valueCol: String, asOf: String,
      buckets: Int, windowMax: Long = ntileWindowMax): DataFrame = {
    val asOfD = to_date(lit(asOf))
    val p0 = events.filter(col("event_type") === convType)
      .groupBy(col(userCol).as("u"))
      .agg(max(col(tsCol).cast("date")).as("last_d"),
        count(lit(1)).as("f"),
        sum(graft.functions.dec2(col(valueCol))).as("m0"))
      .select(col("u"), datediff(asOfD, col("last_d")).as("r"),
        col("f"), col("m0").cast("double").as("m"))
    // pin the user summary once: both paths consume it more than once
    // (the size probe here, then three cuts)
    val p = p0.localCheckpoint()
    val n = p.count()
    val rOrd = Seq(col("r").desc, col("u"))
    val fOrd = Seq(col("f"), col("u"))
    val mOrd = Seq(col("m"), col("u"))
    val tagged =
      if (n <= windowMax) {
        def q(order: Seq[Column]) =
          ntile(buckets).over(Window.orderBy(order: _*)).cast("long")
        p.select(
          q(rOrd).as("r_quintile"),
          q(fOrd).as("f_quintile"),
          q(mOrd).as("m_quintile"))
      } else {
        val t = ntileExact(ntileExact(ntileExact(
          p, n, rOrd, buckets, "r_quintile"),
          n, fOrd, buckets, "f_quintile"),
          n, mOrd, buckets, "m_quintile")
        t.select("r_quintile", "f_quintile", "m_quintile")
      }
    tagged
      .groupBy("r_quintile", "f_quintile", "m_quintile")
      .agg(count(lit(1)).as("users"))
      .orderBy("r_quintile", "f_quintile", "m_quintile")
  }

  /** Churn-risk behavior tag (reference docs/画像简介.md:23 — churn
    * warning from recent login frequency + behavior): per user, last
    * active date, days silent as of `asOf`, activity count in the
    * trailing `recentDays` window, and the rule tag. One conditional
    * hash agg on the user key. */
  def churnRisk(events: DataFrame, userCol: String, tsCol: String,
      asOf: String, recentDays: Int, silentDays: Int): DataFrame = {
    val asOfD = to_date(lit(asOf))
    val d = col(tsCol).cast("date")
    events
      .filter(d <= asOfD)
      .groupBy(col(userCol).as("u"))
      .agg(
        max(d).as("last_seen"),
        sum(when(d > date_sub(asOfD, recentDays), 1L).otherwise(0L))
          .as("recent_events"))
      .select(col("u"), col("last_seen"),
        datediff(asOfD, col("last_seen")).as("days_silent"),
        col("recent_events"),
        when(datediff(asOfD, col("last_seen")) >= silentDays, lit("churned"))
          .when(col("recent_events") === 0, lit("at_risk"))
          .otherwise(lit("active")).as("churn_tag"))
      .orderBy("u")
  }
}
