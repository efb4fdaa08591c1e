package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Relational, Similarity, TextOps}

/** Degenerate-input robustness: empty tables, null/empty text, single
  * rows. A library operator must return an empty/valid result, never
  * throw — at 100 TB some partition WILL be empty or degenerate. */
class EdgeCaseSpec extends SparkSuite {
  import spark.implicits._

  private lazy val emptyDocs =
    Seq.empty[(Long, String, String)].toDF("doc_id", "text", "source")
  private lazy val weirdDocs = Seq(
    (1L, "", "a"),
    (2L, null.asInstanceOf[String], "a"),
    (3L, "x", "a"),
    (4L, "solo", "b")).toDF("doc_id", "text", "source")

  test("sortedPercentiles: a giant duplicate run trips the selection " +
      "candidate cap into the rank fallback, values exact") {
    // 5M identical values in one group: every selection window is
    // [c, c] and catches ALL rows (> the 2^22 candidate cap), so the
    // guard must refuse selection and the rank fallback must still
    // return the exact (constant) percentiles
    val n = (1L << 22) + (1L << 20)
    val df = spark.range(n).select(lit("g").as("g"),
      lit(7.5).as("v"))
    val got = Relational.sortedPercentiles(df, Seq("g"), "v",
      Seq(0.5 -> "p50", 0.9 -> "p90"))
    val row = got.collect()(0)
    assert(Relational.lastPercentilePath == "rank-fallback",
      s"cap breach must fall back, took: ${Relational.lastPercentilePath}")
    assert(row.getDouble(1) == 7.5 && row.getDouble(2) == 7.5)
    // mixed duplicates straddling a window edge stay exact on the
    // selection path: half the group is one value, half another
    val df2 = spark.range(100).select(lit("g").as("g"),
      when(col("id") < 50, 1.0).otherwise(2.0).as("v"))
    val got2 = Relational.sortedPercentiles(df2, Seq("g"), "v",
      Seq(0.25 -> "p25", 0.5 -> "p50", 0.75 -> "p75"), hugeGroupMin = 0L)
    val r2 = got2.collect()(0)
    assert(r2.getDouble(1) == 1.0 && r2.getDouble(3) == 2.0)
    // p50 at rank 49.5 interpolates between v[49]=1.0 and v[50]=2.0
    assert(r2.getDouble(2) == 1.5, s"p50 = ${r2.getDouble(2)}")
  }

  test("sortedPercentiles: a NULL group key rides the selection path " +
      "and matches the window path bitwise") {
    // r18-opt: the selection/rank re-joins are null-safe, so a null
    // group no longer detours through the window branch (which cost
    // the mixed-path semi/anti scans). Values must equal the window
    // path's for every group including the null one.
    val df = spark.range(3000).select(
      when(col("id") % 3 === 0, null).otherwise(concat(lit("g"),
        (col("id") % 3).cast("string"))).as("g"),
      (col("id") * 37 % 1001).cast("double").as("v"))
    val ps = Seq(0.25 -> "p25", 0.5 -> "p50", 0.9 -> "p90")
    val sel = Relational.sortedPercentiles(df, Seq("g"), "v", ps,
      hugeGroupMin = 0L)
    val selRows = sel.orderBy(asc_nulls_first("g")).collect()
    assert(Relational.lastPercentilePath == "selection",
      s"expected selection, took: ${Relational.lastPercentilePath}")
    val win = Relational.sortedPercentiles(df, Seq("g"), "v", ps)
    val winRows = win.orderBy(asc_nulls_first("g")).collect()
    assert(Relational.lastPercentilePath == "window")
    assert(selRows.length == 3 && selRows.head.isNullAt(0))
    assert(selRows.map(_.toString).toSeq == winRows.map(_.toString).toSeq)
    // the rank fallback agrees too (null group included)
    val rank = Relational.sortedPercentilesForceRank(df, Seq("g"), "v", ps)
      .orderBy(asc_nulls_first("g")).collect()
    assert(Relational.lastPercentilePath == "rank-fallback")
    assert(rank.map(_.toString).toSeq == winRows.map(_.toString).toSeq)
  }

  test("dedup operators on an empty table return empty") {
    assert(Dedup.exactDupGroups(emptyDocs).count() == 0)
    assert(Dedup.minHashLshPairs(emptyDocs).count() == 0)
    assert(Dedup.ngramJaccardPairs(emptyDocs, "source").count() == 0)
    assert(Dedup.simHashPairs(emptyDocs).count() == 0)
    assert(Dedup.partialOverlapPairs(emptyDocs).count() == 0)
  }

  test("exactDedup and dedupSpans edge inputs: empty table, null text, " +
      "ties on identical text") {
    import spark.implicits._
    assert(Dedup.exactDedup(emptyDocs).count() == 0)
    assert(TextOps.dedupSpans(emptyDocs, 8).count() == 0)
    // null texts share one md5(null)=null fingerprint group; min_by
    // must keep exactly the min-id row of that group too
    val kept = Dedup.exactDedup(weirdDocs).select("doc_id")
      .collect().map(_.getLong(0)).sorted
    assert(kept.sameElements(Array(1L, 2L, 3L, 4L)) ||
      kept.length == 4, s"got ${kept.mkString(",")}")
    val dups = Seq((5L, "same text", "a"), (3L, "same text", "a"),
      (9L, "same text", "b")).toDF("doc_id", "text", "source")
    assert(Dedup.exactDedup(dups).select("doc_id").collect()
      .map(_.getLong(0)).toSeq == Seq(3L))
    // every span duplicated from doc 1 -> doc 2 keeps nothing
    val spanDocs = Seq((1L, "a b c d e f g h"), (2L, "a b c d e f g h"))
      .toDF("doc_id", "text")
    val spans = TextOps.dedupSpans(spanDocs, 4).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(spans(1L) == (2L, 2L) && spans(2L) == (2L, 0L), spans.toString)
  }

  test("segmented asofJoinBackward edge inputs: single timestamp, " +
      "more segments than rows") {
    import spark.implicits._
    val left = Seq(("k", 5L, 1L), ("k", 5L, 2L)).toDF("k", "ts", "eid")
    val right = Seq(("k", 5L, 10.0)).toDF("k", "ts", "v")
    // all timestamps equal -> every row lands in segment 0
    val one = graft.operators.Relational.asofJoinBackward(
      left, right, "k", "ts", "ts", Seq("v"), segments = 8)
    assert(one.select("v").collect().forall(_.getDouble(0) == 10.0))
    // segments far exceeding distinct timestamps still stitch correctly
    val l2 = Seq(("k", 100L, 1L)).toDF("k", "ts", "eid")
    val r2 = Seq(("k", 1L, 7.0)).toDF("k", "ts", "v")
    val far = graft.operators.Relational.asofJoinBackward(
      l2, r2, "k", "ts", "ts", Seq("v"), segments = 64)
    assert(far.select("v").head().getDouble(0) == 7.0)
  }

  test("exactDedup null-id semantics: null ids are kept (nulls-first), " +
      "never dropped or fabricated into all-NULL rows") {
    import spark.implicits._
    // a group whose ids are ALL null: a bare min_by ordering key would
    // ignore every row and emit a fabricated all-NULL row
    val allNull = Seq((Option.empty[Long], "same", "a"),
      (Option.empty[Long], "same", "b")).toDF("doc_id", "text", "source")
    val keptAll = Dedup.exactDedup(allNull).collect()
    assert(keptAll.length == 1, keptAll.mkString(","))
    assert(!keptAll(0).isNullAt(keptAll(0).fieldIndex("text")),
      "kept row must be a real input row, not all-NULL")
    // mixed null/non-null ids: nulls-first keep (the window form's
    // asc-nulls-first ordering) — the null-id row wins its group
    val mixed = Seq((Option(7L), "same", "a"),
      (Option.empty[Long], "same", "b"),
      (Option(3L), "other", "c")).toDF("doc_id", "text", "source")
    val keptMixed = Dedup.exactDedup(mixed)
      .collect().map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0)),
        r.getString(2))).toSet
    assert(keptMixed == Set((None, "b"), (Some(3L), "c")), keptMixed)
  }

  test("segmented asofJoinBackward: empty input and all-null timestamps " +
      "fall back to the single-pass form instead of throwing") {
    import spark.implicits._
    val emptyL = Seq.empty[(String, Long, Long)].toDF("k", "ts", "eid")
    val emptyR = Seq.empty[(String, Long, Double)].toDF("k", "ts", "v")
    assert(Relational.asofJoinBackward(emptyL, emptyR, "k", "ts", "ts",
      Seq("v"), segments = 8).count() == 0)
    val nullL = Seq(("k", Option.empty[Long], 1L)).toDF("k", "ts", "eid")
    val out = Relational.asofJoinBackward(nullL, emptyR, "k", "ts", "ts",
      Seq("v"), segments = 8).collect()
    assert(out.length == 1 && out(0).isNullAt(out(0).fieldIndex("v")))
  }

  test("dedup operators tolerate null/empty/single-char text") {
    assert(Dedup.exactDupGroups(weirdDocs).count() == 4) // null+""+x+solo
    Dedup.minHashLshPairs(weirdDocs, threshold = 0.9).collect()
    Dedup.ngramJaccardPairs(weirdDocs, "source", threshold = 0.9).collect()
    Dedup.partialOverlapPairs(weirdDocs).collect()
  }

  test("text operators keep null rows without throwing") {
    val stats = TextOps.tokenStats(weirdDocs).collect()
    assert(stats.length == 4)
    TextOps.qualityScore(weirdDocs).collect()
    TextOps.langId(weirdDocs).collect()
    TextOps.winnowFingerprints(weirdDocs).collect()
  }

  test("similarity on empty embeddings returns empty") {
    val empty = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    assert(Similarity.bruteForceTopK(empty, Seq(1.0, 0.0), 5).count() == 0)
    assert(Similarity.lshKnnJoin(empty, k = 3, dim = 2).count() == 0)
  }

  test("sortedPercentiles: all-null group dropped, empty input empty, " +
      "null values excluded") {
    val df = Seq(
      ("a", Some(1.0)), ("a", Some(2.0)), ("a", Some(3.0)),
      ("a", None), // null excluded from a's quantiles
      ("b", None)  // all-null group: dropped entirely
    ).toDF("g", "v")
    val out = Relational.sortedPercentiles(df, Seq("g"), "v",
      Seq(0.5 -> "p50")).collect()
    assert(out.length == 1 && out(0).getString(0) == "a" &&
      out(0).getDouble(1) == 2.0, out.mkString(","))
    val empty = Seq.empty[(String, Double)].toDF("g", "v")
    assert(Relational.sortedPercentiles(empty, Seq("g"), "v",
      Seq(0.5 -> "p50")).count() == 0)
  }

  test("mergeInto: null keys never match (ANSI ON semantics) — " +
      "null-key target rows pass through, null-key source rows insert") {
    val t = Seq((Option(1L), 10.0), (Option.empty[Long], 20.0))
      .toDF("k", "v")
    val s = Seq((Option(1L), 99.0), (Option.empty[Long], 77.0))
      .toDF("k", "v")
    val out = graft.operators.Warehouse.mergeInto(t, s, Seq("k"),
        whenMatchedUpdate = Map("v" -> col("s.v")))
      .collect().map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0)),
        r.getDouble(1))).toSet
    // key 1 updates; BOTH null-key rows survive independently (no match)
    assert(out == Set((Some(1L), 99.0), (None, 20.0), (None, 77.0)), out)
  }

  test("asof/range joins on empty sides behave") {
    val l = Seq((1L, "u", java.sql.Timestamp.valueOf("2024-01-01 10:00:00")))
      .toDF("id", "k", "ts")
    val rEmpty = Seq.empty[(String, java.sql.Timestamp, Double)]
      .toDF("k", "ts", "v")
    val out = Relational.asofJoinBackward(l, rEmpty, "k", "ts", "ts", Seq("v"))
      .collect()
    assert(out.length == 1 && out(0).isNullAt(out(0).fieldIndex("v")))
    val pts = Seq((1L, 5.0)).toDF("id", "p")
    val ivEmpty = Seq.empty[(Long, Double, Double)].toDF("b", "lo", "hi")
    assert(Relational.bucketedRangeJoin(pts, "p", ivEmpty, "lo", "hi", 10.0)
      .count() == 0)
  }

  test("behavior/time-series/classifier operators on empty input") {
    import graft.operators.{Behavior, TimeSeries, TextClassifier}
    val noEvents = Seq.empty[(Long, String, java.sql.Timestamp, Long, Double)]
      .toDF("user_id", "event_type", "ts", "event_id", "value")
    assert(Behavior.windowFunnel(noEvents, "user_id", "event_type", "ts",
      Seq("a", "b"), 60L).count() == 0)
    assert(Behavior.retentionCohort(noEvents, "user_id", "ts", 7)
      .count() == 0)
    assert(Behavior.pathTransitions(noEvents, "user_id", "event_type",
      "ts", "event_id", 60L).count() == 0)
    assert(Behavior.lastTouchAttribution(noEvents, "user_id", "ts",
      "purchase", "click", lit("c"), "value", "event_id", 60L)
      .count() == 0)
    assert(Behavior.timeWeightedAvg(noEvents, "event_type", "ts",
      "value", "event_id").count() == 0)
    val noObs = Seq.empty[(String, java.sql.Date, Double)]
      .toDF("k", "dd", "v")
    assert(TimeSeries.gapFillDaily(noObs, Seq("k"), "dd", "v",
      "2024-01-01", "2024-01-05").count() == 0)
    // classifier: empty training set yields the empty model; scoring
    // with it predicts negative everywhere (margin 0)
    val feats = TextClassifier.hashedFeatures(emptyDocs, "text", 64)
    val w = TextClassifier.trainLogistic(feats, "doc_id", "fx",
      "doc_id", iters = 2, lr = 1.0)
    assert(w.isEmpty || w.values.forall(_ == 0.0))
    val one = TextClassifier.hashedFeatures(
      Seq((9L, "hi", "s")).toDF("doc_id", "text", "source"), "text", 64)
    val scored = TextClassifier.scoreLogistic(one, "fx", w, Seq("doc_id"))
      .collect()
    assert(scored.length == 1 && !scored(0).getAs[Boolean]("pred"))
  }
}
