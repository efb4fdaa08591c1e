package graft

import org.apache.spark.sql.functions._
import graft.operators.TimeSeries

/** [[graft.operators.TimeSeries.gapFillDaily]] — closed-form fixture
  * covering leading gaps (no prior observation), bracketed gaps
  * (interpolated), trailing gaps (carried forward), and pass-through
  * of observed days. */
class TimeSeriesSpec extends SparkSuite {

  test("gapFillDaily: locf and linear interpolation edge semantics") {
    import spark.implicits._
    val obs = Seq(
      ("a", "2024-01-03", 10.0), // leading gap 01..02
      ("a", "2024-01-06", 40.0), // bracketed gap 04..05
      ("b", "2024-01-01", 5.0)) // trailing gap 02..07
      .toDF("k", "ds", "v")
      .select(col("k"), to_date(col("ds")).as("dd"), col("v"))
    val got = TimeSeries.gapFillDaily(obs, Seq("k"), "dd", "v",
        "2024-01-01", "2024-01-07")
      .orderBy("k", "d")
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString,
        Option(r.get(2)).map(_.asInstanceOf[Double]),
        Option(r.get(3)).map(_.asInstanceOf[Double]),
        Option(r.get(4)).map(_.asInstanceOf[Double])))
    assert(got.length == 14) // 2 keys x 7 days
    val a = got.filter(_._1 == "a").map(r => (r._2, r._4, r._5))
    assert(a.toSeq == Seq(
      ("2024-01-01", None, Some(10.0)), // leading: backfilled by interp
      ("2024-01-02", None, Some(10.0)),
      ("2024-01-03", Some(10.0), Some(10.0)),
      ("2024-01-04", Some(10.0), Some(20.0)), // 10 + 30 * 1/3
      ("2024-01-05", Some(10.0), Some(30.0)), // 10 + 30 * 2/3
      ("2024-01-06", Some(40.0), Some(40.0)),
      ("2024-01-07", Some(40.0), Some(40.0)))) // trailing: locf
    val b = got.filter(_._1 == "b").map(r => (r._2, r._4, r._5))
    assert(b.forall { case (_, locf, interp) =>
      locf == Some(5.0) && interp == Some(5.0) })
  }

  test("gapFillDaily: observed days pass through exactly") {
    import spark.implicits._
    val obs = Seq(("x", "2024-01-02", 7.25))
      .toDF("k", "ds", "v")
      .select(col("k"), to_date(col("ds")).as("dd"), col("v"))
    val got = TimeSeries.gapFillDaily(obs, Seq("k"), "dd", "v",
        "2024-01-01", "2024-01-03").orderBy("d").collect()
    assert(got.length == 3)
    assert(got(1).getDouble(2) == 7.25 && got(1).getDouble(3) == 7.25 &&
      got(1).getDouble(4) == 7.25)
  }
}
