package graft

import org.apache.spark.sql.functions._
import graft.functions._
import graft.operators.Relational

/** §5.2 rewrite-equivalence tests: each documented manual rewrite
  * (reference docs/sql调优.md, docs/HiveSQL.md:111-157) must be
  * result-identical to its naive form. */
class RewriteEquivalenceSpec extends SparkSuite {

  test("salted aggregation == plain group-by (docs/sql调优.md:173-186)") {
    val li = Engine.table(spark, sf, "lineitem")
    val salted = Relational.saltedSumAgg(li, Seq("l_returnflag"),
        dec2(col("l_quantity")), buckets = 8)
      .select(col("l_returnflag"), col("agg_val").cast("double"))
    val plain = li.groupBy("l_returnflag")
      .agg(sum(dec2(col("l_quantity"))).cast("double"))
    assertSameRows(salted, plain)
  }

  test("skew-split join == plain join (docs/sql调优.md:202-250)") {
    val li = Engine.table(spark, sf, "lineitem")
      .select("l_partkey", "l_quantity")
    val p = Engine.table(spark, sf, "part").select("p_partkey", "p_brand")
    val split = Relational.skewSplitJoin(li, "l_partkey", p, "p_partkey",
        hotThreshold = 10, saltBuckets = 3)
      .groupBy("p_brand").agg(count(lit(1)).as("n"))
    val plain = li.join(p, col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand").agg(count(lit(1)).as("n"))
    assertSameRows(split, plain)
  }

  test("sortedPercentiles == built-in percentile (bitwise)") {
    val li = Engine.table(spark, sf, "lineitem")
    val sorted = Relational.sortedPercentiles(li, Seq("l_returnflag"),
      "l_extendedprice",
      Seq(0.0 -> "p0", 0.25 -> "p25", 0.5 -> "p50", 0.9 -> "p90", 1.0 -> "p100"))
    val builtin = li.groupBy("l_returnflag").agg(
      expr("percentile(cast(l_extendedprice as double), 0.0)").as("p0"),
      expr("percentile(cast(l_extendedprice as double), 0.25)").as("p25"),
      expr("percentile(cast(l_extendedprice as double), 0.5)").as("p50"),
      expr("percentile(cast(l_extendedprice as double), 0.9)").as("p90"),
      expr("percentile(cast(l_extendedprice as double), 1.0)").as("p100"))
    assertSameRows(sorted, builtin)
  }

  test("sortedPercentiles huge-group rank path == window path (bitwise)") {
    val li = Engine.table(spark, sf, "lineitem")
    val ps = Seq(0.0 -> "p0", 0.25 -> "p25", 0.5 -> "p50",
      0.9 -> "p90", 1.0 -> "p100")
    val window = Relational.sortedPercentiles(li, Seq("l_returnflag"),
      "l_extendedprice", ps) // all groups under the default threshold
    // force EVERY group through the huge path, and pin that the
    // SELECTION (filtering) strategy actually served it — a silent
    // fall back to the full rank would hide a broken guard
    val allHuge = Relational.sortedPercentiles(li, Seq("l_returnflag"),
      "l_extendedprice", ps, hugeGroupMin = 0L)
    assertSameRows(allHuge, window)
    assert(Relational.lastPercentilePath == "selection",
      s"huge groups should use selection, took: " +
        Relational.lastPercentilePath)
    // mixed routing: group 'A' (the largest) over the threshold, the
    // others under it — both paths' outputs union into one result
    val mid = li.filter(col("l_returnflag") === "A").count() - 1
    val mixed = Relational.sortedPercentiles(li, Seq("l_returnflag"),
      "l_extendedprice", ps, hugeGroupMin = mid)
    assertSameRows(mixed, window)
    // the rank fallback stays correct too (it is the guard's safety
    // net): force it by making every candidate window "too big"
    val viaRank = Relational.sortedPercentilesForceRank(li,
      Seq("l_returnflag"), "l_extendedprice", ps)
    assertSameRows(viaRank, window)
    assert(Relational.lastPercentilePath == "rank-fallback")
  }

  test("sortedPercentiles keeps null group keys when every group is huge") {
    // SQL GROUP BY retains the null group; the all-huge shortcut must
    // not lose it to the null-unsafe re-joins inside the selection/rank
    // paths (it routes null-key rows through the window branch instead)
    import spark.implicits._
    val df = Seq(
      (Option.empty[String], 1.0), (None, 2.0), (None, 3.0),
      (Some("a"), 10.0), (Some("a"), 20.0), (Some("a"), 30.0))
      .toDF("k", "v")
    val ps = Seq(0.5 -> "p50")
    val forced = Relational.sortedPercentiles(df, Seq("k"), "v", ps,
      hugeGroupMin = 0L)
    val builtin = df.groupBy("k")
      .agg(expr("percentile(v, 0.5)").as("p50"))
    assertSameRows(forced, builtin)
    assert(forced.count() == 2, "null-key group must be emitted")
  }

  test("q_percentile_huge is served by the selection strategy") {
    val out = ExtQueries.q_percentile_huge.run(spark, sf)
    assert(out.count() == 4) // R, N, A + the null group
    assert(Relational.lastPercentilePath == "selection",
      s"huge-group query should route to selection, took: " +
        Relational.lastPercentilePath)
  }

  test("union-fused join == two joins unioned (docs/sql调优.md:59-71)") {
    val li = Engine.table(spark, sf, "lineitem")
    val p = Engine.table(spark, sf, "part").select("p_partkey", "p_brand")
    val fused = Relational.unionFusedJoin(li, "l_partkey", "l_suppkey",
        p, "p_partkey")
      .groupBy("p_brand").agg(count(lit(1)).as("n"))
    val twoJoins = li.join(p, col("l_partkey") === col("p_partkey"))
      .select("p_brand")
      .unionByName(
        li.join(p, col("l_suppkey") === col("p_partkey")).select("p_brand"))
      .groupBy("p_brand").agg(count(lit(1)).as("n"))
    assertSameRows(fused, twoJoins)
  }

  test("null-salted left join == plain left join (docs/sql调优.md:42-51)") {
    val e = Engine.table(spark, sf, "events")
      .select(col("event_type"), nullif(col("user_id"), lit(0)).as("uid"))
    val c = Engine.table(spark, sf, "customer")
      .select(col("c_custkey"), col("c_name"))
    val salted = Relational.nullSaltedLeftJoin(e, c,
        col("uid"), col("c_custkey"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), count(col("c_name")).as("m"))
    val plain = e.join(c, col("uid") === col("c_custkey"), "left")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), count(col("c_name")).as("m"))
    assertSameRows(salted, plain)
  }

  test("window query == group-by+join decomposition (docs/HiveSQL.md:111-157)") {
    val a = Queries.q_window_count_sum.run(spark, sf)
      .select("event_id", "n_day", "v_day")
    val b = Queries.q_window_decomposed.run(spark, sf)
    assertSameRows(a, b)
  }

  test("dedup-keep-first keeps exactly min-order row per key (docs/sql规范.md:20-24)") {
    val e = Engine.table(spark, sf, "events")
    val got = Relational.dedupKeepFirst(e, Seq("user_id", "event_type"),
      Seq(col("ts"), col("event_id")))
    val perKey = got.groupBy("user_id", "event_type").count()
      .filter(col("count") > 1)
    assert(perKey.isEmpty, "a key kept more than one row")
    val expectFirst = e.groupBy("user_id", "event_type")
      .agg(min(struct(col("ts"), col("event_id"))).as("s"))
      .select(col("user_id"), col("event_type"), col("s.event_id"))
    assertSameRows(got.select("user_id", "event_type", "event_id"),
      expectFirst)
  }

  test("asofJoinBackward: latest right at-or-before each left row, null before first") {
    import spark.implicits._
    import java.sql.Timestamp
    def t(s: String) = Timestamp.valueOf(s)
    val left = Seq(
      (1L, "u1", t("2024-01-01 09:00:00")), // before any snapshot -> null
      (2L, "u1", t("2024-01-01 10:00:00")), // exact tie -> that snapshot
      (3L, "u1", t("2024-01-01 11:30:00")), // between -> 10:00 snapshot
      (4L, "u1", t("2024-01-01 13:00:00")), // after last -> 12:00 snapshot
      (5L, "u2", t("2024-01-01 12:00:00"))) // other key, no snapshots
      .toDF("event_id", "uid", "ts")
    val right = Seq(
      ("u1", t("2024-01-01 10:00:00"), 100.0),
      ("u1", t("2024-01-01 12:00:00"), 200.0))
      .toDF("uid", "ts", "snap")
    val got = graft.operators.Relational.asofJoinBackward(
        left, right, "uid", "ts", "ts", Seq("snap"))
      .select("event_id", "snap").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    assert(got == Map(1L -> null, 2L -> 100.0, 3L -> 100.0,
      4L -> 200.0, 5L -> null))
  }

  test("lag-based batch sessionization agrees with session_window per-user " +
      "session counts") {
    import org.apache.spark.sql.expressions.Window
    val e = Engine.table(spark, sf, "events")
      .select("user_id", "ts", "event_id")
    // session_window's end bound is EXCLUSIVE (an event exactly at
    // last+gap starts a new session), so the lag flag uses >= here
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val viaLag = e
      .withColumn("new_sess",
        when(lag(col("ts"), 1).over(w).isNull ||
          col("ts") >= lag(col("ts"), 1).over(w) + expr("INTERVAL 30 MINUTE"),
          1).otherwise(0))
      .groupBy("user_id").agg(sum("new_sess").as("n_sessions"))
    val viaSessionWindow = e
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .count()
      .groupBy("user_id").agg(count(lit(1)).as("n_sessions"))
    assertSameRows(
      viaLag.select(col("user_id"), col("n_sessions").cast("long")),
      viaSessionWindow.select(col("user_id"), col("n_sessions").cast("long")))
  }

  test("asofJoinBackward: a matched right row with NULL payload wins " +
      "(not resurrected from an older row)") {
    import spark.implicits._
    import java.sql.Timestamp
    def t(s: String) = Timestamp.valueOf(s)
    val left = Seq((1L, "u1", t("2024-01-01 13:00:00")))
      .toDF("event_id", "uid", "ts")
    val right = Seq(
      ("u1", t("2024-01-01 10:00:00"), Some(100.0)),
      ("u1", t("2024-01-01 12:00:00"), None)) // latest match, null value
      .toDF("uid", "ts", "snap")
    val got = graft.operators.Relational.asofJoinBackward(
        left, right, "uid", "ts", "ts", Seq("snap")).collect()
    assert(got.length == 1)
    assert(got(0).isNullAt(got(0).fieldIndex("snap")),
      "native ASOF semantics: the matched row's NULL, not the older 100.0")
  }

  test("asofJoinBackward segmented == single-pass on a skewed fixture " +
      "(hot key, empty segments, null payloads, exact-ts ties)") {
    import spark.implicits._
    // one hot key with a long timeline, one key whose right rows all
    // precede its left rows by several segments (exercises the carry
    // across segments with no right rows), nulls, and exact ties
    val rng = new scala.util.Random(3)
    val left = ((0 until 500).map(i =>
        ("hot", i.toLong * 10 + rng.nextInt(9), i.toLong)) ++
      Seq(("sparse", 4000L, 9001L), ("sparse", 4500L, 9002L),
        ("nobody", 100L, 9003L)))
      .toDF("k", "ts", "event_id")
    val right = ((0 until 200).map(i =>
        ("hot", i.toLong * 25, if (i % 7 == 0) None else Some(i * 1.0))) ++
      Seq(("sparse", 5L, Some(77.0)), ("sparse", 4500L, Some(88.0))))
      .toDF("k", "ts", "snap")
    val plain = graft.operators.Relational.asofJoinBackward(
      left, right, "k", "ts", "ts", Seq("snap"))
    val seg = graft.operators.Relational.asofJoinBackward(
      left, right, "k", "ts", "ts", Seq("snap"), segments = 7)
    assertSameRows(
      plain.select("event_id", "snap"), seg.select("event_id", "snap"))
    // spot-pin the cross-empty-segment carry and the exact-ts tie
    val m = seg.filter(col("k") === "sparse")
      .select("event_id", "snap").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(m == Map(9001L -> 77.0, 9002L -> 88.0))
  }

  test("bloomPrefilterJoin == plain inner join (runtime-filter rewrite)") {
    val li = Engine.table(spark, sf, "lineitem")
      .select("l_orderkey", "l_quantity")
    val ord = Engine.table(spark, sf, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select("o_orderkey", "o_orderpriority")
    val pre = Relational.bloomPrefilterJoin(li, ord,
        "l_orderkey", "o_orderkey", expectedKeys = 1000L)
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
    val plain = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
    assertSameRows(pre, plain)
  }

  test("bloomPrefilterJoin: empty build side yields empty result, no NPE") {
    val li = Engine.table(spark, sf, "lineitem").select("l_orderkey")
    val none = Engine.table(spark, sf, "orders")
      .filter(lit(false)).select("o_orderkey")
    assert(Relational.bloomPrefilterJoin(li, none,
      "l_orderkey", "o_orderkey").count() === 0L)
  }
}
