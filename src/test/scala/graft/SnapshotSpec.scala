package graft

import org.apache.spark.sql.functions._
import graft.operators.Snapshot

/** Fact-grain builders (reference docs/数据模型.md:13-25): accumulating
  * snapshot milestone semantics + merge updatability, periodic snapshot
  * dense spine + carry-forward. The oracle queries (ModelQueries) prove
  * the testdata-scale results; these pin the edge semantics on
  * hand-built lifecycles. */
class SnapshotSpec extends SparkSuite {
  import spark.implicits._

  private val ms = Seq("placed", "shipped")

  private def ev(rows: (Long, String, String)*) =
    rows.toDF("k", "m", "d").select(col("k"), col("m"),
      col("d").cast("date").as("d"))

  test("accumulating: milestone pivot, unknown stays null, last_updated") {
    val snap = Snapshot.accumulating(
      ev((1L, "placed", "2024-01-01"), (1L, "shipped", "2024-01-05"),
        (2L, "placed", "2024-01-02"),
        (2L, "other", "2024-01-09")), // outside the milestone set: ignored
      Seq("k"), "m", "d", ms)
    val out = snap.orderBy("k").collect().map(r =>
      (r.getLong(0), Option(r.getDate(1)).map(_.toString),
        Option(r.getDate(2)).map(_.toString), r.getDate(3).toString))
    assert(out.toSeq == Seq(
      (1L, Some("2024-01-01"), Some("2024-01-05"), "2024-01-05"),
      (2L, Some("2024-01-02"), None, "2024-01-02")))
  }

  test("accumulating: earliest=false records the latest event per milestone") {
    val snap = Snapshot.accumulating(
      ev((1L, "shipped", "2024-01-03"), (1L, "shipped", "2024-01-07")),
      Seq("k"), "m", "d", ms, earliest = false)
    assert(snap.collect().head.getDate(2).toString == "2024-01-07")
  }

  test("mergeAccumulating: delta fills unknowns, keeps knowns, inserts new") {
    val existing = Snapshot.accumulating(
      ev((1L, "placed", "2024-01-01"), (2L, "placed", "2024-01-02")),
      Seq("k"), "m", "d", ms)
    val delta = Snapshot.accumulating(
      ev((1L, "shipped", "2024-01-06"), // fills 1's unknown milestone
        (2L, "placed", "2024-01-04"), // later than known → known kept (min)
        (3L, "placed", "2024-01-05")), // new lifecycle → insert
      Seq("k"), "m", "d", ms)
    val out = Snapshot.mergeAccumulating(existing, delta, Seq("k"), ms)
      .orderBy("k").collect().map(r =>
        (r.getLong(0), Option(r.getDate(1)).map(_.toString),
          Option(r.getDate(2)).map(_.toString), r.getDate(3).toString))
    assert(out.toSeq == Seq(
      (1L, Some("2024-01-01"), Some("2024-01-06"), "2024-01-06"),
      (2L, Some("2024-01-02"), None, "2024-01-04"),
      (3L, Some("2024-01-05"), None, "2024-01-05")))
  }

  test("mergeAccumulating: late-arriving earlier event corrects a milestone") {
    val existing = Snapshot.accumulating(
      ev((1L, "placed", "2024-01-08")), Seq("k"), "m", "d", ms)
    val late = Snapshot.accumulating(
      ev((1L, "placed", "2024-01-02")), Seq("k"), "m", "d", ms)
    val r = Snapshot.mergeAccumulating(existing, late, Seq("k"), ms)
      .collect().head
    assert(r.getDate(1).toString == "2024-01-02") // corrected backward
    assert(r.getDate(3).toString == "2024-01-08") // audit stays greatest
  }

  test("withUnknownDateKey fills only unknown milestones") {
    val snap = Snapshot.accumulating(
      ev((1L, "placed", "2024-01-01")), Seq("k"), "m", "d", ms)
    val r = Snapshot.withUnknownDateKey(snap, ms,
      lit("9999-12-31").cast("date")).collect().head
    assert(r.getDate(1).toString == "2024-01-01")
    assert(r.getDate(2).toString == "9999-12-31")
  }

  test("periodic: dense spine, carry-forward, opening-balance clamp") {
    val deltas = Seq(
      ("a", "2023-11-15", 10.0), // before start → clamps into Jan opening
      ("a", "2024-02-03", 5.0),
      ("b", "2024-01-20", 7.0),
      ("b", "2024-05-09", 1.0)) // after end → excluded
      .toDF("e", "d", "amt")
      .select(col("e"), date_trunc("month", col("d")).cast("date").as("p"),
        col("amt").cast("decimal(18,2)").as("amt"))
    val out = Snapshot.periodic(deltas, Seq("e"), "p", "amt",
        lit("2024-01-01").cast("date"), lit("2024-03-01").cast("date"))
      .orderBy("e", "period").collect().map(r =>
        (r.getString(0), r.getDate(1).toString,
          r.getDecimal(2).doubleValue, r.getDecimal(3).doubleValue))
    assert(out.toSeq == Seq(
      ("a", "2024-01-01", 10.0, 10.0), // opening balance from Nov
      ("a", "2024-02-01", 5.0, 15.0),
      ("a", "2024-03-01", 0.0, 15.0), // inactive month carries forward
      ("b", "2024-01-01", 7.0, 7.0),
      ("b", "2024-02-01", 0.0, 7.0),
      ("b", "2024-03-01", 0.0, 7.0)))
  }

  test("periodic: RAW event-dated deltas snap to their containing " +
      "period instead of silently vanishing between spine points") {
    val deltas = Seq(
      ("a", "2024-01-15", 3.0),  // mid-January: counts in Jan
      ("a", "2024-02-28", 4.0),  // end of February: counts in Feb
      ("a", "2024-03-20", 2.0),  // mid-LAST-period: still counts
      ("a", "2024-04-02", 9.0),  // past the last period's extent: out
      ("b", "2023-12-25", 6.0))  // before start: opening balance
      .toDF("e", "d", "amt")
      .select(col("e"), col("d").cast("date").as("p"),
        col("amt").cast("decimal(18,2)").as("amt"))
    val out = Snapshot.periodic(deltas, Seq("e"), "p", "amt",
        lit("2024-01-01").cast("date"), lit("2024-03-01").cast("date"))
      .orderBy("e", "period").collect().map(r =>
        (r.getString(0), r.getDate(1).toString,
          r.getDecimal(2).doubleValue, r.getDecimal(3).doubleValue))
    assert(out.toSeq == Seq(
      ("a", "2024-01-01", 3.0, 3.0),
      ("a", "2024-02-01", 4.0, 7.0),
      ("a", "2024-03-01", 2.0, 9.0),
      ("b", "2024-01-01", 6.0, 6.0),
      ("b", "2024-02-01", 0.0, 6.0),
      ("b", "2024-03-01", 0.0, 6.0)), out.toSeq.toString)
  }
}
