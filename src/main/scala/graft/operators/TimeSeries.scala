package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization over sparse observations — the missing
  * complement of [[Snapshot.periodic]]: where the periodic snapshot
  * carries a CUMULATIVE balance forward, gap-fill reconstructs a dense
  * daily series of a MEASURED level (sensor readings, prices, daily
  * quality metrics) from whatever days happen to have data. The
  * reference's warehouse stores day-partitioned series and queries
  * them as dense ranges (dt-between scans, reference
  * docs/HiveSQL.md:107); gap-fill is what makes a sparse metric table
  * answer those queries without NULL holes.
  *
  * Scale shape: the spine is |keys| x |days| rows generated per key
  * via sequence()+explode (no shuffle to build); the join back to
  * observations is key+date equi-join; both fill windows partition on
  * the series key — a real key, never content — so nothing global
  * sorts, nothing collects, skew is bounded by one key's day count
  * (the spine is dense: EXACTLY the date range per key). */
object TimeSeries {

  /** Dense daily series per key over `[start, end]` with two fills:
    * `v_locf` (last observation carried forward; NULL before the first
    * observation) and `v_interp` (linear interpolation between the
    * bracketing observations; nearest observation at the edges).
    * Output: key cols, `d`, `v_obs`, `v_locf`, `v_interp` — one row
    * per key per day, observed days pass through untouched.
    *
    * Interpolation is evaluated in a fixed operation order
    * (`prev + (next - prev) * (gap_elapsed / gap_total)`, both ratios
    * cast to double first), so results are bit-exact across engines —
    * the DuckDB oracle runs the same formula. */
  def gapFillDaily(obs: DataFrame, keyCols: Seq[String], dateCol: String,
      valueCol: String, start: String, end: String): DataFrame = {
    val ks = keyCols.map(col)
    val startD = to_date(lit(start)); val endD = to_date(lit(end))
    val spine = obs.select(ks: _*).distinct()
      .withColumn("d", explode(sequence(startD, endD)))
    val j = spine.join(
      obs.select(ks :+ col(dateCol).as("d") :+ col(valueCol).as("v_obs"): _*),
      keyCols :+ "d", "left")
    val wPrev = Window.partitionBy(ks: _*).orderBy(col("d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.partitionBy(ks: _*).orderBy(col("d"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val obsD = when(col("v_obs").isNotNull, col("d"))
    j.withColumn("__pv", last(col("v_obs"), ignoreNulls = true).over(wPrev))
      .withColumn("__pd", last(obsD, ignoreNulls = true).over(wPrev))
      .withColumn("__nv", first(col("v_obs"), ignoreNulls = true).over(wNext))
      .withColumn("__nd", first(obsD, ignoreNulls = true).over(wNext))
      .withColumn("v_locf", col("__pv"))
      .withColumn("v_interp",
        when(col("v_obs").isNotNull, col("v_obs"))
          .when(col("__pv").isNull, col("__nv"))
          .when(col("__nv").isNull, col("__pv"))
          .otherwise(col("__pv") + (col("__nv") - col("__pv")) *
            (datediff(col("d"), col("__pd")).cast("double") /
             datediff(col("__nd"), col("__pd")).cast("double"))))
      .drop("__pv", "__pd", "__nv", "__nd")
  }
}
