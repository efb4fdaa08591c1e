package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational helpers that encode the reference's documented manual
  * rewrites as reusable library operators (SURVEY.md §2.3/§2.4/§2.7).
  *
  * On a real cluster AQE subsumes most of the skew machinery
  * (reference docs/sql调优.md:173-250) — these helpers exist because the
  * reference documents them as user-level patterns and because AQE does
  * not cover null-key flooding (J7) or deliberate pre-aggregation (A9)
  * in every shape.
  */
object Relational {

  /** J7 (reference docs/sql调优.md:42-51): null-safe skew-salted left
    * join. Rows whose key is null would all hash to one reducer in a
    * plain shuffle join; salting them with a random key that cannot
    * exist on the build side spreads them across partitions while
    * preserving left-join semantics (null keys never match anyway).
    */
  def nullSaltedLeftJoin(
      left: DataFrame, right: DataFrame,
      leftKey: Column, rightKey: Column): DataFrame = {
    val salted = when(leftKey.isNull,
      concat(lit("graft_null_"), (rand(42) * 1e9).cast("long").cast("string"))
    ).otherwise(leftKey.cast("string"))
    left.withColumn("__salt_key", salted)
      .join(right.withColumn("__rk", rightKey.cast("string")),
        col("__salt_key") === col("__rk"), "left")
      .drop("__salt_key", "__rk")
  }

  /** A9 (reference docs/sql调优.md:173-186): two-phase salted
    * aggregation — local agg on (randPrefix, key), then strip the prefix
    * and agg again. Spark's partial aggregation already does this
    * map-side; the helper exists for hot single keys where even the
    * partial-agg hash map on one partition is the bottleneck.
    * `aggs` must be re-aggregable (sum/count/min/max).
    */
  def saltedSumAgg(
      df: DataFrame, keys: Seq[String], sumCol: Column,
      buckets: Int = 16): DataFrame = {
    val salted = df.withColumn("__salt", (rand(42) * buckets).cast("int"))
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(sum(sumCol).as("__partial"))
    salted.groupBy(keys.map(col): _*)
      .agg(sum(col("__partial")).as("agg_val"))
  }

  /** J9 (reference docs/sql调优.md:59-71): one-column-matches-two-columns
    * join fused into a single shuffle — UNION ALL the two key projections
    * (tagged), then one join, instead of two joins + union.
    */
  def unionFusedJoin(
      fact: DataFrame, keyA: String, keyB: String,
      dim: DataFrame, dimKey: String): DataFrame = {
    val a = fact.withColumn("__k", col(keyA)).withColumn("__side", lit(keyA))
    val b = fact.withColumn("__k", col(keyB)).withColumn("__side", lit(keyB))
    a.unionByName(b).join(dim, col("__k") === col(dimKey))
  }

  /** J10/J11 (reference docs/sql调优.md:202-250): skew split join.
    * Hot keys (above `hotThreshold` rows) are salted 0..n-1 with the dim
    * side exploded ×n; the long tail joins normally; results unioned.
    * On Spark this is usually AQE's job — kept as the documented manual
    * recipe, result-equivalent to a plain inner join.
    */
  def skewSplitJoin(
      fact: DataFrame, factKey: String,
      dim: DataFrame, dimKey: String,
      hotThreshold: Long = 100000, saltBuckets: Int = 16): DataFrame = {
    val hotKeys = fact.groupBy(factKey).count()
      .filter(col("count") >= hotThreshold).select(factKey)
    val hotSet = broadcast(hotKeys)
    val hotFact = fact.join(hotSet, Seq(factKey), "left_semi")
      .withColumn("__salt", (rand(42) * saltBuckets).cast("int"))
    val coldFact = fact.join(hotSet, Seq(factKey), "left_anti")
    val explodedDim = dim.join(hotSet.withColumnRenamed(factKey, dimKey),
        Seq(dimKey), "left_semi")
      .withColumn("__salt", explode(sequence(lit(0), lit(saltBuckets - 1))))
    val hotJoined = hotFact.join(explodedDim,
      hotFact(factKey) === explodedDim(dimKey) &&
        hotFact("__salt") === explodedDim("__salt"))
      .drop("__salt")
    val coldJoined = coldFact.join(dim, col(factKey) === col(dimKey))
    hotJoined.unionByName(coldJoined)
  }

  /** U5 (reference docs/sql规范.md:20-24): dedup keeping the first row
    * per key under `order` — the warehouse "delete duplicates keeping
    * min ROWID" idiom. Runs on the heap-based
    * [[graft.plans.TopKPerGroup]] operator with k=1 rather than a
    * row_number window: the window form sorts every key's rows in one
    * task (a straggler when one key is hot), while the heap keeps one
    * candidate row per key per map partition before the exchange —
    * same output under a total `order`, arbitrary SortOrder supported
    * (which is why this isn't a min_by). */
  def dedupKeepFirst(df: DataFrame, keys: Seq[String],
      order: Seq[Column]): DataFrame =
    graft.plans.TopKPerGroup.topKPerGroup(df, keys.map(col), order, 1)

  /** O5/A12: top-k per group without a global sort — rank inside each
    * group partition, filter, then a tiny final sort. (See also the
    * whole-operator form [[graft.plans.TopKPerGroup]], which replaces
    * the window sort with bounded heaps.)*/
  def topKPerGroup(df: DataFrame, keys: Seq[String], order: Seq[Column],
      k: Int): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
  }

  /** As-of join (backward): each left row picks the latest right row
    * with `rightTs <= leftTs` for the same key — the point-in-time
    * lookup of feature stores and market data. Composed from existing
    * operators (brief preference (a)): tag both sides, UNION, one
    * window pass carrying the last right payload forward in time order,
    * keep left rows. ONE shuffle on (key), no join node, no per-row
    * range probe — at 100 TB this is a single sorted pass per key,
    * versus a range join's quadratic bucket risk. A hot key's whole
    * timeline lands in one window task; `segments > 1` switches to a
    * segmented prefix-scan (within-(key, time-range) carry + a tiny
    * per-segment summary stitched across segments) that bounds any
    * task at ~1/segments of a key's rows with identical output.
    *
    * `payload` = right columns to carry (null when no right row is at
    * or before the left timestamp). Ties on ts: the right row at the
    * exact timestamp wins (sorted before the left row via the tag).
    *
    * The carried value is a single struct wrapping ALL payload columns,
    * not per-column `last(ignoreNulls)`: the struct is non-null whenever
    * a right ROW exists, so the latest matched row wins even when its
    * payload value is genuinely NULL (native ASOF JOIN semantics — a
    * per-column carry would skip the null and resurrect an older row's
    * value). One window agg instead of |payload|, too. */
  def asofJoinBackward(left: DataFrame, right: DataFrame,
      key: String, leftTs: String, rightTs: String,
      payload: Seq[String], segments: Int = 0): DataFrame = {
    val pvType = org.apache.spark.sql.types.StructType(
      payload.map(p => right.schema(p).copy(name = p)))
    val lTag = left.select(
      (col(key).as("__k") +: col(leftTs).as("__ts") +: lit(1).as("__side") +:
        left.columns.map(c => col(c)) ++:
        Seq(lit(null).cast(pvType).as("__pv"))): _*)
    val rTag = right.select(
      (col(key).as("__k") +: col(rightTs).as("__ts") +: lit(0).as("__side") +:
        left.columns.map(c => lit(null).cast(
          left.schema(c).dataType).as(c)) ++:
        Seq(struct(payload.map(p => col(p).as(p)): _*).as("__pv"))): _*)
    val tagged = lTag.unionByName(rTag)
    def singlePass = {
      // single pass per key: one sorted window carry. A key whose
      // whole timeline is huge runs in ONE task — use segments > 1
      // when any key's row count exceeds what one task should sort.
      val w = Window.partitionBy("__k")
        .orderBy(col("__ts"), col("__side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      tagged.withColumn("__last",
        last(col("__pv"), ignoreNulls = true).over(w))
    }
    // segmented prefix-scan (the scalable path for hot keys): cut
    // time into `segments` global ranges, carry WITHIN each
    // (key, segment) — bounded ~1/segments of a hot key's timeline
    // per task — and stitch across segments with a per-(key,
    // segment) summary table (<= keys x segments rows, the only
    // cross-segment state; its own carry window is over <= segments
    // rows per key). Output is identical to the single-pass form.
    def segmented(mn: Double, mx: Double) = {
      val span = math.max((mx - mn) / segments,
        java.lang.Double.MIN_NORMAL)
      val seg = least(floor((col("__ts").cast("double") - mn) / span),
        lit(segments - 1L)).cast("long")
      val segged = tagged.withColumn("__seg", seg)
      val wIn = Window.partitionBy("__k", "__seg")
        .orderBy(col("__ts"), col("__side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // last right row of each populated (key, segment): max_by is a
      // partial aggregate, so a hot (key, segment) collapses map-side
      val segLast = segged.filter(col("__side") === 0)
        .groupBy("__k", "__seg")
        .agg(max_by(col("__pv"), struct(col("__ts"), col("__side")))
          .as("__segpv"))
      // carry INTO each (key, segment) = last right row of any
      // EARLIER segment (populated or not — the distinct covers
      // segments that have no right rows)
      val wPrev = Window.partitionBy("__k").orderBy("__seg")
        .rowsBetween(Window.unboundedPreceding, -1)
      val carryIn = segged.select("__k", "__seg").distinct()
        .join(segLast, Seq("__k", "__seg"), "left")
        .withColumn("__in",
          last(col("__segpv"), ignoreNulls = true).over(wPrev))
        .select("__k", "__seg", "__in")
      segged
        .withColumn("__within",
          last(col("__pv"), ignoreNulls = true).over(wIn))
        .join(carryIn, Seq("__k", "__seg"), "left")
        .withColumn("__last", coalesce(col("__within"), col("__in")))
    }
    val carried =
      if (segments <= 1) singlePass
      else {
        // the global ts range is computed eagerly (one 1-row agg job at
        // operator-construction time, same class as the IVF index
        // build); needs a numeric- or timestamp-typed ts
        val r = tagged.agg(min(col("__ts").cast("double")),
          max(col("__ts").cast("double"))).head()
        // empty input / all-null timestamps: nothing to segment on —
        // the single-pass form handles both (trivially, since no task
        // can be hot) instead of throwing on a possibly-empty batch
        if (r.isNullAt(0)) singlePass
        else segmented(r.getDouble(0), r.getDouble(1))
      }
    carried
      .select((col("__side") +: left.columns.map(col) ++:
        payload.map(p => col(s"__last.$p").as(p))): _*)
      .filter(col("__side") === 1).drop("__side")
  }

  /** Range (interval-containment) join: pair each point with every
    * interval containing it. Spark plans a plain
    * `p BETWEEN lo AND hi` join as BroadcastNestedLoop/cartesian —
    * quadratic at scale. Bucketizing turns it into an EQUI-join: each
    * interval explodes to the fixed-width buckets it covers, points
    * hash to their bucket, the join key is the bucket, and the exact
    * predicate filters within the bucket. Each (point, interval) pair
    * meets exactly once (the point's bucket), so no dedup is needed.
    * Pick `bucketWidth` near the typical interval span: explode factor
    * ≈ span/width + 1, join fan-in per bucket ≈ intervals overlapping
    * that width. */
  def bucketedRangeJoin(points: DataFrame, pointCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      bucketWidth: Double): DataFrame = {
    val p = points.withColumn("__bucket",
      floor(col(pointCol) / bucketWidth).cast("long"))
    val iv = intervals.withColumn("__bucket",
      explode(sequence(
        floor(col(loCol) / bucketWidth).cast("long"),
        floor(col(hiCol) / bucketWidth).cast("long"))))
    p.join(iv, Seq("__bucket"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bucket")
  }

  /** Groups at or below this many rows sort in one window task: 2^22
    * narrow (group, value) rows is a ~100 MB spill-managed per-task
    * sort — fine. Groups ABOVE it leave the window path for the
    * distributed rank in [[sortedPercentiles]], which removes the
    * per-group parallelism floor (one task per group) that would
    * otherwise make an exact percentile over a 2-billion-row group a
    * single multi-hour task at 100 TB. */
  private[graft] val percentileHugeGroupMin: Long = 1L << 22

  /** Exact interpolated percentiles — Spark `percentile` / DuckDB
    * `quantile_cont` semantics: linear interpolation
    * `v_lo + (v_hi - v_lo) * frac` at position `p * (n - 1)` — computed
    * by DISTRIBUTED SORT (window row_number per group) instead of
    * Spark's built-in per-group value→count map.
    *
    * Why: the built-in `percentile` materializes an OpenHashMap of
    * every distinct value per group per partition and merges them —
    * on a near-unique column (prices) that is GBs of boxed map entries
    * and GC thrash at scale, and it cannot spill. The sort shape
    * shuffles narrow (group, value) rows once and sorts via Spark's
    * spill-capable external sorter, then keeps only the 1-2 rows per
    * group that bracket each requested rank.
    *
    * Groups larger than `hugeGroupMin` additionally leave the window
    * shape (whose per-group sort is one task) for SELECTION BY
    * FILTERING ([[selectionBrackets]]) — the classic distributed exact
    * quantile: a percentile_approx pass brackets each target's VALUE
    * window (sketch rank error <= n/accuracy, so a 3x-margin window
    * provably contains the target ranks), one counting scan anchors
    * each window's global rank offset and proves the guard, and one
    * collect scan sorts only the tiny candidate set — three linear
    * map-side-combined scans, no checkpoint, no full shuffle, no
    * full sort, and no single-task group. If the runtime guard ever
    * fails (sketch bound violated, or a giant duplicate run makes a
    * window exceed [[selectionCandCap]]), the huge groups fall back
    * to the full distributed rank ([[rankHugeGroups]]) — range-
    * repartitioned sub-sorts + driver-side prefix offsets, the same
    * two-phase move as [[graft.operators.Behavior.ntileExact]].
    * Routing is by an exact group count (one narrow aggregate over
    * the input); by pigeonhole at most n / hugeGroupMin groups can be
    * huge, which is what bounds the driver-side window/offset state.
    * All paths produce identical bracket values, so results are
    * bitwise those of the single-path form (pinned against the
    * built-in `percentile` in RewriteEquivalenceSpec/PropertySpec).
    * `hugeGroupMin` is a test hook; production callers keep the
    * default.
    *
    * Nulls are excluded per SQL percentile semantics; a group whose
    * values are ALL null is dropped (built-in would emit a null row).
    * `ps` = (fraction, output column name) pairs; one sort serves all
    * fractions over the same value column. */
  def sortedPercentiles(df: DataFrame, groupCols: Seq[String],
      valueCol: String, ps: Seq[(Double, String)],
      hugeGroupMin: Long = percentileHugeGroupMin): DataFrame = {
    require(ps.nonEmpty && ps.forall { case (p, _) => p >= 0 && p <= 1 },
      s"fractions must be in [0,1]: $ps")
    val gs = groupCols.map(col)
    val base = df.filter(col(valueCol).isNotNull)
      .select((gs :+ col(valueCol).cast("double").as("__v")): _*)

    def windowRanked(in: DataFrame): DataFrame = {
      val wOrd = Window.partitionBy(gs: _*).orderBy(col("__v"))
      val wAll = Window.partitionBy(gs: _*)
      in.withColumn("__rn", (row_number().over(wOrd) - 1).cast("long"))
        .withColumn("__n", count(lit(1)).over(wAll))
    }

    def target(i: Int): Column =
      lit(ps(i)._1) * (col("__n") - 1).cast("double")

    // (group, __lo_i, __hi_i, __n) from a fully ranked frame
    def bracketsFromRanked(ranked: DataFrame): DataFrame = {
      val needed = ps.indices.map(i =>
        col("__rn") === floor(target(i)).cast("long") ||
          col("__rn") === ceil(target(i)).cast("long")).reduce(_ || _)
      val aggs = ps.indices.flatMap(i => Seq(
        min(when(col("__rn") === floor(target(i)).cast("long"), col("__v")))
          .as(s"__lo_$i"),
        min(when(col("__rn") === ceil(target(i)).cast("long"), col("__v")))
          .as(s"__hi_$i"))) :+ first(col("__n")).as("__n")
      ranked.filter(needed).groupBy(gs: _*).agg(aggs.head, aggs.tail: _*)
    }

    // route by exact group size: one narrow (group, count) aggregate;
    // one row back carries max group size + total/huge group counts
    // (maxN is null on empty input). Knowing the huge count up front
    // lets the all-huge case skip the provably-empty small branch —
    // two whole input scans (the anti-join + its window) at exactly
    // the scale where scans are the cost. Null group keys route by
    // SIZE like any other group: every group re-join on this path
    // (the semi/anti split, the selection windows, the rank-fallback
    // offsets) is NULL-SAFE (<=>), so SQL's null-group semantics hold
    // on all three strategies. (Until r18-opt a null-key huge group
    // was detoured through the window branch, costing the mixed-path
    // semi/anti scans plus a one-task window sort exactly when a
    // forced-huge probe planted a null group.)
    val nByG = base.groupBy(gs: _*).agg(count(lit(1)).as("__n"))
    val stats = nByG.agg(max(col("__n")), count(lit(1)),
      sum(when(col("__n") > hugeGroupMin, 1L).otherwise(0L))).head()
    val bracketed =
      if (stats.isNullAt(0) || stats.getLong(0) <= hugeGroupMin) {
        lastPercentilePath = "window"
        bracketsFromRanked(windowRanked(base))
      } else {
        val allHuge = stats.getLong(1) == stats.getLong(2)
        val huge = nByG.filter(col("__n") > hugeGroupMin)
        val hugeKeys = huge.select(gs: _*) // ≤ n / hugeGroupMin rows
        val big =
          if (allHuge) base
          else nullSafeEquiJoin(base, broadcast(hugeKeys), groupCols,
            "left_semi")
        val hugeBrackets = selectionBrackets(big, groupCols, huge, ps) match {
          case Some(b) => lastPercentilePath = "selection"; b
          case None =>
            lastPercentilePath = "rank-fallback"
            bracketsFromRanked(rankHugeGroups(big, groupCols, huge))
        }
        if (allHuge) hugeBrackets
        else {
          val small = nullSafeEquiJoin(base, broadcast(hugeKeys),
            groupCols, "left_anti")
          bracketsFromRanked(windowRanked(small)).unionByName(hugeBrackets)
        }
      }
    val outs = gs ++ ps.zipWithIndex.map { case ((_, name), i) =>
      // Hive/Spark `percentile` interpolation form, bitwise:
      // (ceil(t) - t) * v_lo + (t - floor(t)) * v_hi, no interpolation
      // when t is integral (ceil == floor)
      val t = target(i)
      when(ceil(t) === floor(t), col(s"__lo_$i"))
        .otherwise((ceil(t).cast("double") - t) * col(s"__lo_$i") +
          (t - floor(t).cast("double")) * col(s"__hi_$i")).as(name)
    }
    bracketed.select(outs: _*)
  }

  /** Equi-join with NULL-SAFE key equality (`<=>`) — SQL group
    * identity, where a null key matches itself. The right side's key
    * columns are renamed before the join (fresh exprIds), so a right
    * frame derived from the left (hugeKeys from base) can never trip
    * ambiguous-self-join resolution. Output columns: the left frame's
    * for semi/anti; left ++ renamed-right for inner. */
  private def nullSafeEquiJoin(left: DataFrame, right: DataFrame,
      cols: Seq[String], how: String): DataFrame = {
    val rn = cols.map(c => c -> s"__r_$c")
    val r2 = rn.foldLeft(right)((df, p) =>
      df.withColumnRenamed(p._1, p._2))
    val cond = rn.map { case (c, rc) => col(c) <=> col(rc) }
      .reduceOption(_ && _).getOrElse(lit(true))
    val joined = left.join(r2, cond, how)
    how match {
      case "left_semi" | "left_anti" => joined // left columns only
      case _ => joined.drop(rn.map(_._2): _*) // shed the key copies
    }
  }

  /** Per-target candidate-window cap for [[selectionBrackets]]: a
    * window that catches more rows than this (a giant duplicate run
    * straddling the window edge) would make the per-group collected
    * array the memory hazard the selection path exists to avoid, so
    * the whole huge-group batch falls back to the full distributed
    * rank instead. 2^22 doubles = 32 MB per group per target, one
    * group per reduce task — the same budget as the window path's
    * per-task sort. */
  private val selectionCandCap: Long = 1L << 22

  /** Test/probe diagnostic only — which huge-group strategy the last
    * [[sortedPercentiles]] call ON THIS THREAD used ("window",
    * "selection", or "rank-fallback"); never a correctness input.
    * Thread-local so concurrent callers (e.g. the JDBC serve endpoint)
    * don't interleave each other's diagnostics. */
  private val lastPercentilePathTL = new scala.util.DynamicVariable[String]("")
  private[graft] def lastPercentilePath: String = lastPercentilePathTL.value
  private def lastPercentilePath_=(v: String): Unit =
    lastPercentilePathTL.value = v

  /** Thread-confined strategy override: `selectionDisabled.withValue`
    * in [[sortedPercentilesForceRank]] affects only the calling
    * thread, so a concurrent production [[sortedPercentiles]] on
    * another thread can never be silently re-routed to the rank
    * fallback by an in-flight force-rank test call. */
  private val selectionDisabled = new scala.util.DynamicVariable[Boolean](false)

  /** Test hook: [[sortedPercentiles]] with the selection strategy
    * disabled, so the rank fallback's correctness (the guard's safety
    * net) stays independently pinned. */
  private[graft] def sortedPercentilesForceRank(df: DataFrame,
      groupCols: Seq[String], valueCol: String,
      ps: Seq[(Double, String)]): DataFrame =
    selectionDisabled.withValue(true) {
      sortedPercentiles(df, groupCols, valueCol, ps, hugeGroupMin = 0L)
    }

  /** Exact percentile brackets for the HUGE groups of
    * [[sortedPercentiles]] by SELECTION (filtering), the distributed
    * exact-quantile shape that avoids ranking every row:
    *
    *  1. `percentile_approx` at fractions p ± 3/accuracy brackets each
    *     target's VALUE window; the sketch's rank error is
    *     <= n/accuracy, so the window provably contains every rank in
    *     [floor(p(n-1)), ceil(p(n-1))].
    *  2. One counting scan per group: rows strictly below each window
    *     (the window's global rank anchor) and rows inside it. The
    *     driver VERIFIES the containment guard and the
    *     [[selectionCandCap]] bound from these exact counts — the
    *     sketch guarantee is checked, never trusted.
    *  3. One collect scan: `sort_array(collect_list(...))` of just the
    *     in-window values per group; the value at global rank r is
    *     element r - below + 1 of that sorted array (duplicate-safe:
    *     equal values make rank order irrelevant to the VALUE at a
    *     position).
    *
    * Three linear, map-side-combined scans; per-group driver state is
    * bounded by the pigeonhole bound on huge-group count. Returns None
    * when the guard fails (caller falls back to [[rankHugeGroups]]),
    * so a sketch-bound violation can only cost time, never
    * correctness. */
  private def selectionBrackets(in: DataFrame, groupCols: Seq[String],
      hugeN: DataFrame, ps: Seq[(Double, String)]): Option[DataFrame] = {
    if (selectionDisabled.value) return None
    val gs = groupCols.map(col)
    val accuracy = 10000
    val nOf = hugeN.collect().map(r =>
      groupCols.indices.map(r.get) -> r.getLong(groupCols.length)).toMap
    if (nOf.isEmpty) return None
    // margin: 3x the sketch's rank-error bound, but never under ~4
    // RANKS of the smallest huge group — at small n (test-forced huge
    // routing) a pure fractional margin is less than one rank and the
    // window can exclude the target; at production sizes
    // (n > 2^22) the fractional bound dominates and this is 3e-4
    val margin = math.max(3.0 / accuracy, 4.0 / nOf.values.min)
    val wfr = ps.flatMap { case (p, _) =>
      Seq(math.max(0.0, p - margin), math.min(1.0, p + margin)) }
    // PIN the windows: the sketch's merge order (and so the exact
    // window values) is not deterministic across recomputations, and
    // the guard below is only a proof about the windows it counted —
    // collect once (tiny: one row per huge group) and rebuild a
    // literal frame, so the guard pass and the collect pass see
    // byte-identical windows
    val approxWin = in.groupBy(gs: _*)
      .agg(percentile_approx(col("__v"),
        array(wfr.map(lit): _*), lit(accuracy)).as("__w"))
    val spark = in.sparkSession
    val winDF = broadcast(spark.createDataFrame(
      spark.sparkContext.parallelize(approxWin.collect().toSeq, 1),
      approxWin.schema))
    def wLo(i: Int) = element_at(col("__w"), 2 * i + 1)
    def wHi(i: Int) = element_at(col("__w"), 2 * i + 2)
    def inWin(i: Int) = col("__v") >= wLo(i) && col("__v") <= wHi(i)
    // null-safe attach: a NULL group key is a group like any other
    val joined = nullSafeEquiJoin(in, winDF, groupCols, "inner")
    val countAggs = ps.indices.flatMap(i => Seq(
      sum(when(col("__v") < wLo(i), 1L).otherwise(0L)).as(s"__below_$i"),
      sum(when(inWin(i), 1L).otherwise(0L)).as(s"__nc_$i")))
    val counts = joined.groupBy(gs: _*)
      .agg(countAggs.head, countAggs.tail: _*).collect()
    val ok = counts.forall { r =>
      val k = groupCols.indices.map(r.get)
      nOf.get(k) match {
        case None => false // group outside hugeN: fall back, never guess
        case Some(n) => ps.indices.forall { i =>
          val below = r.getLong(groupCols.length + 2 * i)
          val nc = r.getLong(groupCols.length + 2 * i + 1)
          val rLo = math.floor(ps(i)._1 * (n - 1)).toLong
          val rHi = math.ceil(ps(i)._1 * (n - 1)).toLong
          below <= rLo && rHi < below + nc && nc <= selectionCandCap
        }
      }
    }
    if (!ok) return None
    val candAggs = ps.indices.flatMap(i => Seq(
      sum(when(col("__v") < wLo(i), 1L).otherwise(0L)).as(s"__below_$i"),
      sort_array(collect_list(when(inWin(i), col("__v"))))
        .as(s"__cand_$i"))) :+ count(lit(1)).as("__n")
    def t(i: Int) = lit(ps(i)._1) * (col("__n") - 1).cast("double")
    val outs = gs ++ ps.indices.flatMap(i => Seq(
      element_at(col(s"__cand_$i"), (floor(t(i)).cast("long") -
        col(s"__below_$i") + 1).cast("int")).as(s"__lo_$i"),
      element_at(col(s"__cand_$i"), (ceil(t(i)).cast("long") -
        col(s"__below_$i") + 1).cast("int")).as(s"__hi_$i"))) :+
      col("__n")
    Some(joined.groupBy(gs: _*).agg(candAggs.head, candAggs.tail: _*)
      .select(outs: _*))
  }

  /** Per-group 0-based value rank for the HUGE groups of
    * [[sortedPercentiles]], with no per-group parallelism floor:
    * range-repartition on (group, value, salt) — the salt (a unique
    * per-row id) spreads a single hot VALUE across partitions, which
    * a (group, value) range key alone cannot — pin the partitioning
    * with one localCheckpoint, count rows per (partition, group)
    * (bounded: a group spans contiguous range partitions, so the
    * collect is ≤ #partitions + #huge-groups rows), prefix-sum those
    * into per-(partition, group) offsets on the driver, then local
    * row_number + offset = exact global rank within the group. Rows
    * with equal values may take their block of ranks in any order —
    * contiguous by construction — which is invisible to percentile
    * bracketing (the bracketed values are equal). Returns the same
    * (group..., __v, __rn, __n) shape as the window path;
    * `hugeN` = (group..., __n) for exactly these groups. */
  private def rankHugeGroups(in: DataFrame, groupCols: Seq[String],
      hugeN: DataFrame): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}
    val spark = in.sparkSession
    val gs = groupCols.map(col)
    val parts = spark.sparkContext.defaultParallelism
    val parted = in.withColumn("__salt", monotonically_increasing_id())
      .repartitionByRange(parts, (gs :+ col("__v") :+ col("__salt")): _*)
      .localCheckpoint() // the counts job and the rank job below must
                         // see the SAME physical partitioning
    val withP = parted.withColumn("__p", spark_partition_id())
    val counts = withP.groupBy((col("__p") +: gs): _*)
      .agg(count(lit(1)).as("__c")).collect()
    val acc = scala.collection.mutable.Map.empty[Seq[Any], Long]
    val offRows = counts.sortBy(_.getInt(0)).map { r =>
      val k = groupCols.indices.map(i => r.get(i + 1))
      val o = acc.getOrElse(k, 0L)
      acc(k) = o + r.getLong(groupCols.length + 1)
      Row.fromSeq((r.getInt(0) +: k) :+ o)
    }
    val offSchema = StructType(
      StructField("__p", IntegerType, nullable = false) +:
        groupCols.map(c => in.schema(c)) :+
        StructField("__off", LongType, nullable = false))
    val offDf = spark.createDataFrame(
      spark.sparkContext.parallelize(offRows.toSeq, 1), offSchema)
    val win = Window.partitionBy((col("__p") +: gs): _*)
      .orderBy(col("__v"), col("__salt"))
    // both attaches NULL-SAFE on the group key (a null group is a
    // group); hugeN is materialized to a literal frame first — its
    // lineage shares attribute ids with `in`, which an explicit join
    // condition would otherwise resolve ambiguously
    val hugeLocal = broadcast(spark.createDataFrame(
      spark.sparkContext.parallelize(hugeN.collect().toSeq, 1),
      hugeN.schema))
    val ranked = nullSafeEquiJoin(
      withP, broadcast(offDf), "__p" +: groupCols, "inner")
      .withColumn("__rn",
        (col("__off") + row_number().over(win) - 1).cast("long"))
    nullSafeEquiJoin(ranked, hugeLocal, groupCols, "inner")
      .select((gs :+ col("__v") :+ col("__rn") :+ col("__n")): _*)
  }

  /** Runtime-filter (Bloom-prefiltered) shuffle join: build a Bloom
    * filter over the build side's join keys with a distributed
    * aggregate, then cut the probe side with `might_contain` BEFORE its
    * shuffle, then run the exact equi-join. Same trick as Spark's AQE
    * runtime bloom filter (SPARK-32268) but explicit, for when the
    * build side is too big to broadcast yet selective on the probe
    * side: at 100 TB the probe shuffle shrinks by the key-miss rate
    * (false positives only cost shuffle bytes — the exact join keeps
    * the result identical to a plain join).
    *
    * The sketch itself is constant-size (`numBits/8` bytes, default
    * ~1 MiB): the single-row collect is a broadcast-sized transfer,
    * never data-proportional. */
  def bloomPrefilterJoin(probe: DataFrame, build: DataFrame,
      probeKey: String, buildKey: String,
      expectedKeys: Long = 4000000L): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.XxHash64
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.graft.Bridge
    val agg = new BloomFilterAggregate(
      XxHash64(Seq(Bridge.expression(build(buildKey))), 42L), expectedKeys)
      .toAggregateExpression()
    // NOTE: the build side is scanned twice by design — once here to
    // assemble the sketch, once in the join below. That is the normal
    // cost profile of a runtime filter; it pays off when the probe side
    // is far larger than the build side (the only time to use this op).
    val sketch = build.select(Bridge.column(agg)).head.getAs[Array[Byte]](0)
    val pruned =
      if (sketch == null) probe.filter(lit(false)) // empty/all-null build side
      else {
        // broadcast the sketch (multi-MB at the default expectedKeys):
        // embedded as a Literal it would be re-serialized into every
        // stage's task binary and every explain string
        val bc = probe.sparkSession.sparkContext.broadcast(sketch)
        probe.filter(Bridge.column(
          graft.functions.BloomBroadcastMightContain(bc,
            XxHash64(Seq(Bridge.expression(probe(probeKey))), 42L))))
      }
    pruned.join(build, pruned(probeKey) === build(buildKey))
  }
}
