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
    * shape (whose per-group sort is one task) for a per-group
    * distributed rank ([[rankHugeGroups]]) — range-repartitioned
    * sub-sorts + driver-side prefix offsets, the same two-phase move
    * as [[graft.operators.Behavior.ntileExact]] — so ONE giant group
    * no longer means one giant task. Routing is by an exact group
    * count (one narrow aggregate over the input); by pigeonhole at
    * most n / hugeGroupMin groups can be huge, which is what bounds
    * the driver-side offset state. Both paths produce identical
    * (group, value, rank, n) rows, so results are bitwise those of
    * the single-path form (pinned against the built-in `percentile`
    * in RewriteEquivalenceSpec/PropertySpec). `hugeGroupMin` is a
    * test hook; production callers keep the default.
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

    // route by exact group size: one narrow (group, count) aggregate;
    // its max is one row back. maxN is null on empty input.
    val nByG = base.groupBy(gs: _*).agg(count(lit(1)).as("__n"))
    val maxN = nByG.agg(max(col("__n"))).head()
    val ranked =
      if (maxN.isNullAt(0) || maxN.getLong(0) <= hugeGroupMin)
        windowRanked(base)
      else {
        val huge = nByG.filter(col("__n") > hugeGroupMin)
        val hugeKeys = huge.select(gs: _*) // ≤ n / hugeGroupMin rows
        val small = base.join(broadcast(hugeKeys), groupCols, "left_anti")
        val big = base.join(broadcast(hugeKeys), groupCols, "left_semi")
        windowRanked(small)
          .unionByName(rankHugeGroups(big, groupCols, huge))
      }
    def target(i: Int): Column =
      lit(ps(i)._1) * (col("__n") - 1).cast("double")
    val needed = ps.indices.map(i =>
      col("__rn") === floor(target(i)).cast("long") ||
        col("__rn") === ceil(target(i)).cast("long")).reduce(_ || _)
    val aggs = ps.indices.flatMap(i => Seq(
      min(when(col("__rn") === floor(target(i)).cast("long"), col("__v")))
        .as(s"__lo_$i"),
      min(when(col("__rn") === ceil(target(i)).cast("long"), col("__v")))
        .as(s"__hi_$i"))) :+ first(col("__n")).as("__n")
    val bracketed = ranked.filter(needed)
      .groupBy(gs: _*).agg(aggs.head, aggs.tail: _*)
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
    withP.join(broadcast(offDf), "__p" +: groupCols)
      .withColumn("__rn",
        (col("__off") + row_number().over(win) - 1).cast("long"))
      .join(broadcast(hugeN), groupCols)
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
