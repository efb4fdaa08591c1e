package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fact-table grain builders from the reference's dimensional-model
  * catalog (reference docs/数据模型.md:13-25). The catalog names three
  * fact grains: transaction facts (plain scans — every relational query
  * here already covers them), PERIODIC snapshot facts (:17-19, the
  * monthly-account-balance example), and ACCUMULATING snapshot facts
  * (:21-25 — one row per lifecycle, multiple milestone date columns,
  * surrogate keys for dates not yet known, and — uniquely among fact
  * grains — UPDATABLE after load as later lifecycle events arrive).
  * The latter two have genuine operator content beyond a groupBy, so
  * they live here as first-class builders.
  */
object Snapshot {

  /** Accumulating-snapshot fact table (reference docs/数据模型.md:21-25):
    * one row per lifecycle (`keys`), one DATE column per entry of
    * `milestones` holding the date that milestone was reached, plus a
    * `last_updated` audit column (the doc's 最后更新日期 field). A
    * milestone not yet reached is null — fill the doc's surrogate key
    * for undefined dates (代理关键字) with [[withUnknownDateKey]] at
    * presentation time; merges must run on the null form so
    * least/greatest can tell "unknown" from a real date.
    *
    * `earliest=true` records the FIRST event date per milestone (funnel
    * semantics: signup → first purchase); `false` records the latest
    * (fulfilment semantics: an order's ship milestone advances as more
    * lines ship).
    *
    * Scale shape: ONE hash aggregation on the lifecycle key — a
    * conditional min/max per milestone, partial+final, no window and no
    * pivot-by-value shuffle — so 100 TB of raw events reduces map-side
    * to one row per lifecycle before the exchange.
    */
  def accumulating(events: DataFrame, keys: Seq[String],
      milestoneCol: String, dateCol: String, milestones: Seq[String],
      earliest: Boolean = true): DataFrame = {
    val pick = (m: String) => {
      val d = when(col(milestoneCol) === m, col(dateCol))
      (if (earliest) min(d) else max(d)).as(m)
    }
    val aggs = milestones.map(pick) :+
      max(when(col(milestoneCol).isin(milestones: _*), col(dateCol)))
        .as("last_updated")
    events.filter(col(milestoneCol).isin(milestones: _*))
      .groupBy(keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Merge a later accumulating-snapshot delta into an existing
    * snapshot — the updatability half of docs/数据模型.md:25 ("在数据
    * 加载完后，是可以对它进行更新的"). Both frames must be in
    * [[accumulating]]'s null form with identical schemas. Per
    * milestone the merged value is the earliest (or latest) KNOWN
    * date: Spark's least/greatest skip nulls, so an unknown milestone
    * is filled by whichever side knows it, and two known dates resolve
    * by lifecycle semantics. `last_updated` always takes the greatest.
    * New lifecycles insert. Runs on [[Warehouse.mergeInto]]'s single
    * full-outer-join shuffle — the delta-sized merge a 100 TB snapshot
    * needs (persist partition-level with
    * [[Warehouse.mergeIntoPartitioned]]).
    */
  def mergeAccumulating(existing: DataFrame, delta: DataFrame,
      keys: Seq[String], milestones: Seq[String],
      earliest: Boolean = true): DataFrame = {
    val resolve: (Column, Column) => Column =
      if (earliest) least(_, _) else greatest(_, _)
    val updates = milestones.map(m =>
      m -> resolve(col(s"t.$m"), col(s"s.$m"))).toMap +
      ("last_updated" -> greatest(col("t.last_updated"),
        col("s.last_updated")))
    Warehouse.mergeInto(existing, delta, keys, updates)
  }

  /** Presentation form: replace null (not-yet-reached) milestone dates
    * with the surrogate date key the reference mandates for undefined
    * dates (docs/数据模型.md:25) so downstream date-dimension joins
    * never see null keys. */
  def withUnknownDateKey(snapshot: DataFrame, milestones: Seq[String],
      unknown: Column): DataFrame =
    milestones.foldLeft(snapshot)((df, m) =>
      df.withColumn(m, coalesce(col(m), unknown)))

  /** Periodic-snapshot fact table (reference docs/数据模型.md:17-19 —
    * 账户的月平均余额 is the doc's example): one row per (entity,
    * period) over a DENSE period spine `[start, end]`, with the
    * running `balance` carried forward through periods with no
    * activity. Every delta is SNAPPED DOWN to its containing spine
    * period (a raw event-dated delta mid-period counts in that
    * period — it must not silently vanish because its date is not a
    * period start; pre-truncated callers see identical behavior).
    * Deltas BEFORE `start` fold into the opening balance (clamped to
    * the first period); deltas at or past `last_period + step` (beyond
    * the last spine period's extent) are excluded. When `end` is not
    * aligned to the step grid the last spine period is BELOW `end`
    * (e.g. start=Jan 1, end=Mar 15, monthly → last period Mar 1,
    * extent ends Apr 1), so the exact bound is the last element of
    * `sequence(start, end, step)` plus one step — NOT `end + step`,
    * which would over-include Apr 1–Apr 14 deltas into Mar 1.
    *
    * Output: entity cols, `period`, `period_delta` (that period's
    * activity, 0 when none), `balance` (cumulative through the
    * period).
    *
    * Scale shape: deltas reduce to (entity, period) grain FIRST
    * (partial+final hash agg — the spine join and window then see one
    * row per entity-period, not raw facts); the dense spine is
    * generated per entity via sequence()+explode (no shuffle, |E|×|P|
    * rows exactly — the size a periodic snapshot table has by
    * definition); the carry-forward is one window partitioned by
    * entity. Every exchange is entity-keyed; nothing driver-side.
    */
  def periodic(deltas: DataFrame, entityCols: Seq[String],
      periodCol: String, deltaCol: String, start: Column, end: Column,
      step: Column = expr("interval '1' month")): DataFrame = {
    val ek = entityCols.map(col)
    // snapping uses higher-order array functions, which Spark
    // evaluates INTERPRETED (no codegen) — so it must not run per raw
    // fact row. Reduce to (entity, raw date) grain first (partial+
    // final hash agg, codegen'd, map-side combine), then snap the
    // grain rows — at 100 TB the HOF touches |entities|×|dates| rows,
    // not the fact table. The period array itself is built once and
    // broadcast as a one-row frame.
    val periods = deltas.sparkSession.range(1)
      .select(sequence(start, end, step).as("__periods"))
    val dayGrain = deltas
      // cheap over-approximate bound on the RAW fact rows (scalar
      // compare, codegen'd); the exact grid-aligned bound needs the
      // periods array, so it is applied below at day grain instead
      .filter(col(periodCol) < end + step)
      .groupBy(ek :+ col(periodCol).as("__pd"): _*)
      .agg(sum(col(deltaCol)).as("__d0"))
    val sums = dayGrain
      .crossJoin(broadcast(periods))
      // exact bound: past the LAST SPINE PERIOD's extent. When `end`
      // is off the step grid, end + step over-includes (last period +
      // step is the true extent end); day grain is small enough for
      // the array_max HOF.
      .filter(col("__pd") < array_max(col("__periods")) + step)
      // snap to the greatest spine period <= the (start-clamped) date
      .withColumn("__p", array_max(filter(col("__periods"),
        p => p <= greatest(col("__pd"), start))))
      .drop("__periods")
      .groupBy(ek :+ col("__p"): _*)
      .agg(sum(col("__d0")).as("__d"))
    val spine = sums.select(ek: _*).distinct()
      .withColumn("period", explode(sequence(start, end, step)))
    val joinKeys = entityCols :+ "period"
    spine.join(sums.withColumnRenamed("__p", "period"), joinKeys, "left")
      .withColumn("period_delta",
        coalesce(col("__d"), lit(0).cast(sums.schema("__d").dataType)))
      .withColumn("balance", sum(col("period_delta")).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(ek: _*).orderBy(col("period"))))
      .drop("__d")
  }
}
