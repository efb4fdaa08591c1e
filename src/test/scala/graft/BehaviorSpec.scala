package graft

import org.apache.spark.sql.functions._
import graft.operators.Behavior

/** [[graft.operators.Behavior]] — closed-form fixtures pinning the
  * greedy-funnel edge semantics (window boundary inclusive, strict
  * after-previous-match, chain anchored at the FIRST step-1 event),
  * retention offsets, gap-bounded transitions, and the churn tag
  * rules. */
class BehaviorSpec extends SparkSuite {

  private def ev(rows: (Long, String, String, Long)*) = {
    import spark.implicits._
    rows.toSeq.toDF("user_id", "event_type", "tss", "event_id")
      .select(col("user_id"), col("event_type"),
        to_timestamp(col("tss")).as("ts"), col("event_id"))
  }

  private val steps = Seq("a", "b", "c")

  private def depths(df: org.apache.spark.sql.DataFrame): Map[Long, Int] =
    Behavior.windowFunnel(df, "user_id", "event_type", "ts", steps, 100L)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

  test("windowFunnel: full chain inside window") {
    val d = depths(ev(
      (1L, "a", "2024-01-01 00:00:00", 1),
      (1L, "b", "2024-01-01 00:00:10", 2),
      (1L, "c", "2024-01-01 00:00:20", 3)))
    assert(d == Map(1L -> 3))
  }

  test("windowFunnel: window boundary is inclusive, beyond is out") {
    // b exactly at t0+100s counts; c at t0+101s does not
    val d = depths(ev(
      (1L, "a", "2024-01-01 00:00:00", 1),
      (1L, "b", "2024-01-01 00:01:40", 2),
      (1L, "c", "2024-01-01 00:01:41", 3)))
    assert(d == Map(1L -> 2))
  }

  test("windowFunnel: same-timestamp next step does not advance") {
    // b simultaneous with a fails the strictly-after rule
    val d = depths(ev(
      (1L, "a", "2024-01-01 00:00:00", 1),
      (1L, "b", "2024-01-01 00:00:00", 2),
      (1L, "b", "2024-01-01 00:00:05", 3)))
    assert(d == Map(1L -> 2))
  }

  test("windowFunnel: chain anchors at FIRST step-1 event (greedy)") {
    // first 'a' at 00:00; its window closes before the only 'b';
    // a later 'a' would have matched, but greedy does not re-anchor
    val d = depths(ev(
      (1L, "a", "2024-01-01 00:00:00", 1),
      (1L, "a", "2024-01-01 00:10:00", 2),
      (1L, "b", "2024-01-01 00:10:30", 3)))
    assert(d == Map(1L -> 1))
  }

  test("windowFunnel: out-of-order steps don't count; no step1 = no row") {
    val d = depths(ev(
      (1L, "b", "2024-01-01 00:00:00", 1), // before chain start: ignored
      (1L, "a", "2024-01-01 00:00:10", 2),
      (1L, "c", "2024-01-01 00:00:20", 3), // c before b: ignored
      (1L, "b", "2024-01-01 00:00:30", 4),
      (2L, "b", "2024-01-01 00:00:00", 5), // user 2 never does 'a'
      (2L, "c", "2024-01-01 00:00:01", 6)))
    assert(d == Map(1L -> 2))
  }

  test("funnelCounts matches the cascade on real events (sf0.001)") {
    // cross-check the one-agg HOF scan against a literal k-phase
    // cascade built from plain DataFrame ops
    val e = Engine.table(spark, sf, "events")
      .select(col("user_id").as("u"),
        unix_micros(col("ts").cast("timestamp")).as("t"),
        col("event_type").as("s"))
    val w = 86400L * 1000000L
    val s1 = e.filter(col("s") === "view").groupBy("u")
      .agg(min("t").as("t1"))
    val s2 = e.filter(col("s") === "click").join(s1, "u")
      .filter(col("t") > col("t1") && col("t") <= col("t1") + w)
      .groupBy("u").agg(min("t").as("t2"), min("t1").as("t1b"))
    val s3 = e.filter(col("s") === "purchase")
      .join(s2, "u")
      .filter(col("t") > col("t2") && col("t") <= col("t1b") + w)
      .groupBy("u").agg(min("t").as("t3"))
    val cascade = s1.join(s2.select(col("u"), lit(1).as("d2")), Seq("u"), "left")
      .join(s3.select(col("u"), lit(1).as("d3")), Seq("u"), "left")
      .select(when(col("d3").isNotNull, 3)
        .when(col("d2").isNotNull, 2).otherwise(1).as("depth"))
      .groupBy("depth").agg(count(lit(1)).as("users"))
    val got = Behavior.funnelCounts(Engine.table(spark, sf, "events"),
      "user_id", "event_type", "ts", Seq("view", "click", "purchase"),
      86400L)
    assertSameRows(got, cascade)
  }

  test("windowFunnel is invariant to input partitioning and row order") {
    val base = Engine.table(spark, sf, "events")
    val shuffled = base.repartition(7)
      .sortWithinPartitions(col("ts").desc, col("event_id").desc)
    val a = Behavior.windowFunnel(base, "user_id", "event_type", "ts",
      Seq("view", "click", "purchase"), 86400L)
    val b = Behavior.windowFunnel(shuffled, "user_id", "event_type", "ts",
      Seq("view", "click", "purchase"), 86400L)
    assertSameRows(a, b)
  }

  test("earliest_events equals sort_array(collect_list) for every " +
      "under-cap group on real events") {
    val e = Engine.table(spark, sf, "events")
      .select(col("user_id").as("u"),
        unix_micros(col("ts").cast("timestamp")).as("t"),
        when(col("event_type") === "view", 0)
          .when(col("event_type") === "click", 1)
          .otherwise(2).as("si"))
    val bounded = e.groupBy("u")
      .agg(graft.functions.EarliestEventsAgg
        .earliestEvents(col("t"), col("si"), 1 << 20).as("ev"))
    val unbounded = e.groupBy("u")
      .agg(sort_array(collect_list(struct(col("t"), col("si"))))
        .as("ev"))
    assertSameRows(bounded, unbounded)
  }

  test("a pathological bot key is capped map-side; other users' " +
      "funnels are untouched") {
    import spark.implicits._
    // bot: 50k step-0 events (well over the cap of 1000); normal user:
    // a clean 3-step chain
    val bot = (0 until 50000).map(i =>
      (99L, "a", s"2024-01-01 ${"%02d".format(i % 24)}:00:00", i.toLong))
    val normal = Seq(
      (1L, "a", "2024-01-01 00:00:00", 100000L),
      (1L, "b", "2024-01-01 00:00:10", 100001L),
      (1L, "c", "2024-01-01 00:00:20", 100002L))
    val e = ev((bot ++ normal): _*)
    val d = Behavior.windowFunnel(e, "user_id", "event_type", "ts",
        steps, 100L, maxEventsPerUser = 1000)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // normal user bit-identical; the bot is evaluated on its earliest
    // 1000 step-0 events — chain enters (depth 1) and never advances
    assert(d == Map(1L -> 3, 99L -> 1))
    // and the bounded result is the same no matter how the bot's
    // events are partitioned (map-side eviction must be order-safe)
    val d2 = Behavior.windowFunnel(e.repartition(13), "user_id",
        "event_type", "ts", steps, 100L, maxEventsPerUser = 1000)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(d2 == d)
  }

  test("retentionCohort: offsets and cohort sizes") {
    val e = ev(
      (1L, "x", "2024-01-01 10:00:00", 1),
      (1L, "x", "2024-01-01 23:00:00", 2), // same day, distinct-collapsed
      (1L, "x", "2024-01-03 10:00:00", 3),
      (2L, "x", "2024-01-01 09:00:00", 4),
      (2L, "x", "2024-01-02 09:00:00", 5),
      (3L, "x", "2024-01-02 09:00:00", 6))
    val got = Behavior.retentionCohort(e, "user_id", "ts", 14)
      .collect().map(r => (r.getDate(0).toString, r.getInt(1), r.getLong(2)))
    assert(got.toSeq == Seq(
      ("2024-01-01", 0, 2L), ("2024-01-01", 1, 1L), ("2024-01-01", 2, 1L),
      ("2024-01-02", 0, 1L)))
  }

  test("pathTransitions: gap bound and tie-break") {
    val e = ev(
      (1L, "a", "2024-01-01 00:00:00", 1),
      (1L, "b", "2024-01-01 00:10:00", 2), // a->b within 30min
      (1L, "c", "2024-01-01 01:10:00", 3), // b->c gap 1h: dropped
      (1L, "d", "2024-01-01 01:20:00", 4), // c->d within
      (2L, "a", "2024-01-01 00:00:00", 5),
      (2L, "b", "2024-01-01 00:00:00", 6)) // tie: event_id orders a->b
    val got = Behavior.pathTransitions(e, "user_id", "event_type", "ts",
        "event_id", 1800L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == Seq(("a", "b", 2L), ("c", "d", 1L)))
  }

  test("funnelEpisodes: completion frees the slot, expiry splits, " +
      "trailing chain reported open") {
    val e = ev(
      // u1: complete chain, then a second chain that expires, then an
      // open trailing chain
      (1L, "a", "2024-01-01 00:00:00", 1),
      (1L, "b", "2024-01-01 00:00:10", 2),
      (1L, "c", "2024-01-01 00:00:20", 3), // episode 1: complete
      (1L, "a", "2024-01-01 00:01:00", 4),
      (1L, "b", "2024-01-01 00:01:30", 5), // episode 2: depth 2...
      (1L, "a", "2024-01-01 00:10:00", 6), // ...expired by this event
      (2L, "b", "2024-01-01 00:00:00", 7)) // no step-1: no episodes
    val got = graft.operators.Behavior.funnelEpisodes(
        e, "user_id", "event_type", "ts", Seq("a", "b", "c"), 100L)
      .orderBy("u", "t0_us")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getBoolean(3),
        r.getBoolean(4)))
    assert(got.toSeq == Seq(
      (1L, 3, true, true), // complete, closed
      (1L, 2, false, true), // expired at depth 2, closed
      (1L, 1, false, false))) // trailing open chain
  }

  test("lastTouchAttribution: horizon, ties, latest-touch-wins") {
    import spark.implicits._
    val e = Seq(
      // u1: click at 10:00 (camp A), click 10:30 (camp B), buy 10:40
      //     -> latest in-horizon click is B
      (1L, "click", "2024-01-01 10:00:00", 1L, 0.0, """{"k":"A"}"""),
      (1L, "click", "2024-01-01 10:30:00", 2L, 0.0, """{"k":"B"}"""),
      (1L, "purchase", "2024-01-01 10:40:00", 3L, 10.0, "{}"),
      // u2: click 2h before the buy -> out of horizon -> direct
      (2L, "click", "2024-01-01 08:00:00", 4L, 0.0, """{"k":"A"}"""),
      (2L, "purchase", "2024-01-01 10:00:00", 5L, 5.0, "{}"),
      // u3: click at the exact purchase instant attaches; two ties ->
      //     larger event_id wins deterministically
      (3L, "click", "2024-01-01 09:00:00", 6L, 0.0, """{"k":"C"}"""),
      (3L, "click", "2024-01-01 09:00:00", 7L, 0.0, """{"k":"D"}"""),
      (3L, "purchase", "2024-01-01 09:00:00", 8L, 2.5, "{}"))
      .toDF("user_id", "event_type", "tss", "event_id", "value", "props")
      .select(col("user_id"), col("event_type"),
        to_timestamp(col("tss")).as("ts"), col("event_id"), col("value"),
        col("props"))
    val got = Behavior.lastTouchAttribution(e, "user_id", "ts",
        "purchase", "click", get_json_object(col("props"), "$.k"),
        "value", "event_id", 3600L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq(
      ("B", 1L, 10.0), ("D", 1L, 2.5), ("direct", 1L, 5.0)))
  }

  test("timeWeightedAvg: holds values to next reading then midnight") {
    import spark.implicits._
    // value 10 holds 06:00->18:00 (12h), value 30 holds 18:00->24:00
    // (6h): twap = (10*12 + 30*6) / 18 = 300/18
    val e = Seq(
      (1L, "m", "2024-01-01 06:00:00", 1L, 10.0),
      (1L, "m", "2024-01-01 18:00:00", 2L, 30.0))
      .toDF("user_id", "event_type", "tss", "event_id", "value")
      .select(col("event_type"), to_timestamp(col("tss")).as("ts"),
        col("event_id"), col("value"))
    val got = Behavior.timeWeightedAvg(e, "event_type", "ts", "value",
      "event_id").collect()
    assert(got.length == 1)
    assert(got(0).getDouble(2) == 300.0 / 18.0 && got(0).getLong(3) == 2)
  }

  test("churnRisk: tag rules") {
    val e = ev(
      (1L, "x", "2024-01-29 00:00:00", 1), // active (recent)
      (2L, "x", "2024-01-10 00:00:00", 2), // churned (20d silent)
      (3L, "x", "2024-01-20 00:00:00", 3), // at_risk (10d silent, 0 recent)
      (4L, "x", "2024-02-05 00:00:00", 4)) // beyond asOf: excluded entirely
    val got = Behavior.churnRisk(e, "user_id", "ts", "2024-01-30", 7, 14)
      .collect().map(r => (r.getLong(0), r.getString(4))).toMap
    assert(got == Map(1L -> "active", 2L -> "churned", 3L -> "at_risk"))
  }

  /** Heavy-tie purchase fixture for the ntile paths: most users buy
    * once (f=1 dominates — the real-data shape that would hot-spot a
    * value-only range cut), counts not divisible by the bucket count,
    * some users sharing a purchase date and amount. */
  private def rfmEvents(nUsers: Int) = {
    import spark.implicits._
    (1 to nUsers).flatMap { u =>
      val buys = if (u % 17 == 0) 4 else if (u % 5 == 0) 2 else 1
      (1 to buys).map { i =>
        (u.toLong, "purchase",
          f"2024-01-${(u % 27) + 1}%02d 00:00:00",
          (u * 10 + i).toLong, s"${(u % 7) * 25 + i}.50")
      }
    }.toDF("user_id", "event_type", "tss", "event_id", "value")
      .select(col("user_id"), col("event_type"),
        to_timestamp(col("tss")).as("ts"), col("event_id"), col("value"))
  }

  test("rfmSegments: distributed ntileExact path equals the window path") {
    for (nUsers <- Seq(97, 500); buckets <- Seq(5, 7)) {
      val e = rfmEvents(nUsers)
      def run(windowMax: Long) = Behavior.rfmSegments(e, "user_id", "ts",
          "purchase", "value", "2024-01-31", buckets, windowMax)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSeq
      val win = run(Long.MaxValue) // force the global-window path
      val dist = run(0L)           // force the distributed rank path
      assert(dist == win,
        s"nUsers=$nUsers buckets=$buckets: distributed != window")
    }
  }

  test("ntileExact matches the ntile window on n not divisible by b") {
    import spark.implicits._
    // unique compound key (v, id) with heavy ties in v
    val df = (1 to 103).map(i => (i.toLong, (i % 4).toLong))
      .toDF("id", "v")
    val got = Behavior.ntileExact(df, 103L,
        Seq(col("v"), col("id")), 5, "t")
      .select("id", "t").collect().map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    val want = df.select(col("id"),
        ntile(5).over(org.apache.spark.sql.expressions.Window
          .orderBy(col("v"), col("id"))).cast("long").as("t"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
  }
}
