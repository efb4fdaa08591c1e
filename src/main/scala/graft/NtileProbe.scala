package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.Behavior

/** Dev-only probe for the distributed exact ntile
  * ([[graft.operators.Behavior.ntileExact]]): times the
  * single-partition global-window ntile against the two-phase
  * distributed rank on synthetic user summaries ABOVE the
  * [[graft.operators.Behavior.ntileWindowMax]] switch point — the
  * regime the per-round bench (whose sf0.1 user counts sit far below
  * the switch) never reaches — and asserts the two paths agree
  * bucket-for-bucket. Ties are heavy by construction (v = id mod 4),
  * the shape that would hot-spot any value-only range cut.
  *
  * Usage: runMain graft.NtileProbe [n ...]   (defaults: 2^21, 2^23)
  * Prints one JSON line per n with both wall times. Results land in
  * SCALE.md by hand.
  */
object NtileProbe {

  private def timed[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val ns = if (args.nonEmpty) args.map(_.toLong).toSeq
             else Seq(1L << 21, 1L << 23)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .appName("graft-ntile-probe")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    for (n <- ns) {
      // heavy-tie sort values over a unique id tie-break — the
      // rfmSegments key shape
      val df = spark.range(n).select(col("id"),
        (col("id") % 4).as("v")).localCheckpoint()
      val order = Seq(col("v"), col("id"))

      def segCounts(tagged: org.apache.spark.sql.DataFrame) =
        tagged.groupBy("t").count().orderBy("t")
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

      val (winSeg, tWin) = timed {
        segCounts(df.select(
          ntile(5).over(Window.orderBy(order: _*)).cast("long").as("t")))
      }
      val (distSeg, tDist) = timed {
        segCounts(Behavior.ntileExact(df, n, order, 5, "t").select("t"))
      }
      require(winSeg == distSeg,
        s"n=$n: distributed ntile != window ntile: $distSeg vs $winSeg")
      println(s"""NTILEPROBE {"n":$n,"window_sec":${f"$tWin%.2f"},""" +
        s""""distributed_sec":${f"$tDist%.2f"},"equal":true}""")

      // same frame, exact percentiles: 3 groups of n/3 rows each (all
      // above the 2^22 huge-group threshold at the default probe
      // sizes), near-unique values — the shape whose window form is
      // one sort task per group
      val pdf = spark.range(n).select((col("id") % 3).as("g"),
        (col("id") * 2654435761L % 1000003).cast("double").as("v"))
        .localCheckpoint()
      val ps = Seq(0.25 -> "p25", 0.5 -> "p50", 0.75 -> "p75")
      def rows(d: org.apache.spark.sql.DataFrame) =
        d.orderBy("g").collect().map(_.toSeq).toSeq
      val (winP, tWinP) = timed {
        rows(graft.operators.Relational.sortedPercentiles(
          pdf, Seq("g"), "v", ps, hugeGroupMin = Long.MaxValue))
      }
      val (distP, tDistP) = timed {
        rows(graft.operators.Relational.sortedPercentiles(
          pdf, Seq("g"), "v", ps, hugeGroupMin = 0L))
      }
      require(winP == distP,
        s"n=$n: huge-group percentile != window percentile")
      println(s"""PCTPROBE {"n":$n,"window_sec":${f"$tWinP%.2f"},""" +
        s""""distributed_sec":${f"$tDistP%.2f"},"equal":true}""")
    }
    spark.stop()
  }
}
