package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import graft.operators.Cube

/** The cube lattice's two contracts: built-from-parent (fact scanned
  * once) and routed-to-smallest-cuboid. */
class CubeSpec extends SparkSuite {

  private lazy val manifest = CubeQueries.ensureCube(spark, sf)

  test("mangle is collision-proof on underscore-ambiguous dim lists") {
    // each pair collided under the old strip-non-alnum mangle
    val ambiguous = Seq(
      Seq("a_b") -> Seq("ab"),
      Seq("x_y", "z") -> Seq("x", "y_z"),
      Seq("x", "y_z") -> Seq("x", "y", "z"),
      Seq("a-b") -> Seq("ab"))
    ambiguous.foreach { case (l, r) =>
      assert(Cube.mangle(l) != Cube.mangle(r),
        s"$l and $r mangle to the same name ${Cube.mangle(l)}")
    }
    // output stays a plain identifier (table-name and path safe)
    ambiguous.flatMap(p => Seq(p._1, p._2)).foreach { dims =>
      assert(Cube.mangle(dims).matches("[A-Za-z0-9_]+"), Cube.mangle(dims))
    }
  }

  test("build rejects duplicate cuboid dim lists instead of overwriting") {
    val fact = Engine.table(spark, sf, "lineitem").limit(10)
    val ex = intercept[IllegalArgumentException] {
      Cube.build(fact, Seq(Cube.MeasureDef("n", Cube.MCountAll)),
        Seq(Seq("l_returnflag"), Seq("l_returnflag")), "dws.cube_dup_t_",
        register = false)
    }
    assert(ex.getMessage.contains("duplicate cuboid"))
  }

  test("build refuses a non-reducing base grain (reduction contract)") {
    // adversarial shape from the 300x probe: a near-row-unique base
    // dim tuple makes every summary fact-sized and maintenance
    // rebuild-equivalent (measured exponent 0.93) — the guard must
    // refuse before materializing anything
    val fact = spark.range(Cube.BaseRatioGuardMinRows + 1).select(
      col("id").as("k"), (col("id") % 97).as("d"),
      lit(1L).as("v"))
    val m = Seq(Cube.MeasureDef("n", Cube.MCountAll))
    val ex = intercept[IllegalArgumentException] {
      Cube.build(fact, m, Seq(Seq("k", "d"), Seq("d")),
        "cube_guard_t_", register = false)
    }
    assert(ex.getMessage.contains("would not reduce the fact"),
      ex.getMessage)
    // tiny fixtures skip the guard even with row-unique dims — the
    // contract polices 100 TB mistakes, not unit-test facts
    val tiny = spark.range(1000).select(col("id").as("k"), lit(1L).as("v"))
    val built = Cube.build(tiny, m, Seq(Seq("k")),
      "cube_guard_tiny_t_", register = false)
    assert(built.nonEmpty && built.head.rows == 1000)
  }

  test("reduction guard sketches the union grain: two same-length " +
      "disjoint cuboids where only the union is non-reducing") {
    // each single-dim cuboid reduces fine on its own (~1k groups over
    // 1M rows), but their UNION grain (a, b) is row-unique — both are
    // fact-scanning bases, so the lattice as requested would still
    // materialize fact-sized work. The earlier maxBy(_.length) guard
    // sketched one arbitrary winner and let this shape through.
    val n = graft.operators.Cube.BaseRatioGuardMinRows + 1
    val fact = spark.range(n).select(
      (col("id") % 1024).as("a"), (col("id") / 1024).as("b"),
      lit(1L).as("v"))
    val m = Seq(Cube.MeasureDef("n", Cube.MCountAll))
    val ex = intercept[IllegalArgumentException] {
      Cube.build(fact, m, Seq(Seq("a"), Seq("b")),
        "cube_guard_union_t_", register = false)
    }
    assert(ex.getMessage.contains("union of all requested cuboid dims"),
      ex.getMessage)
    // the same disjoint pair over a REDUCING union grain still builds
    val ok = spark.range(n).select(
      (col("id") % 64).as("a"), (col("id") % 97).as("b"),
      lit(1L).as("v"))
    val built = Cube.build(ok, m, Seq(Seq("a"), Seq("b")),
      "cube_guard_union_ok_t_", register = false)
    assert(built.size == 2)
  }

  test("only the base cuboid reads the fact; parents shrink monotonically") {
    val base = manifest.head
    assert(base.parentDims.isEmpty, "widest cuboid must scan the fact")
    manifest.tail.foreach { b =>
      assert(b.parentDims.nonEmpty,
        s"cuboid ${b.dims} re-scanned the fact")
      val parent = manifest.find(_.dims == b.parentDims.get).get
      assert(b.dims.forall(parent.dims.contains))
      assert(parent.rows >= b.rows,
        s"parent ${parent.dims} (${parent.rows}) smaller than child " +
          s"${b.dims} (${b.rows})")
    }
  }

  test("selectCuboids: HRU greedy under a row budget — base always in, " +
      "budget respected, the highest-benefit candidate picked first") {
    import spark.implicits._
    // controlled cardinalities: a∈{0,1}, b∈{0..9}, c∈{0..99}; 2000 rows
    val fact = spark.range(2000).select(
      (col("id") % 2).as("a"), (col("id") % 10).as("b"),
      (col("id") % 100).as("c")).toDF()
    val base = Seq("a", "b", "c") // ~200 distinct (a,b,c) combos (c determines b? no: 2000 rows, (a,b,c) has lcm structure)
    val cands = Seq(Seq("a", "b"), Seq("b", "c"), Seq("a"), Seq("b"), Seq("c"))
    // generous budget: everything helpful fits
    val allIn = Cube.selectCuboids(fact, base, cands, maxRows = 1000000L)
    assert(allIn.head.dims == base, "base cuboid must be selected first")
    assert(allIn.map(_.rows).sum <= 1000000L)
    // every candidate that strictly improves over the base should be in
    assert(allIn.map(_.dims).toSet.size == allIn.size)
    // tight budget: base (~200) + room for ~one small cuboid. The
    // greedy must pick a candidate whose TOTAL benefit over remaining
    // queries is maximal, and never overshoot the budget.
    val baseRows = allIn.find(_.dims == base).get.rows
    val tight = Cube.selectCuboids(fact, base, cands,
      maxRows = baseRows + 25)
    assert(tight.head.dims == base)
    assert(tight.map(_.rows).sum <= baseRows + 25,
      s"budget overshoot: $tight")
    // with ≤25 rows of headroom only {a} (2 rows) and {b} (10 rows)
    // and {a,b} (20 rows) fit individually; {a,b} answers three of the
    // five candidate grains ({a,b},{a},{b}) at ≤20 rows — the greedy's
    // first pick must be {a,b}, the max-benefit choice.
    assert(tight.map(_.dims).contains(Seq("a", "b")),
      s"expected the max-benefit {a,b} cuboid, got: ${tight.map(_.dims)}")
    // base alone over budget fails loudly
    val ex = intercept[IllegalArgumentException] {
      Cube.selectCuboids(fact, base, cands, maxRows = 1L)
    }
    assert(ex.getMessage.contains("exceeds the budget"))
    // order-permuted duplicates are ONE candidate: (a,b) and (b,a) must
    // not both be selected (identical cuboids double-charging the budget)
    val permuted = Cube.selectCuboids(fact, base,
      Seq(Seq("a", "b"), Seq("b", "a"), Seq("c")), maxRows = 1000000L)
    assert(permuted.map(_.dims.sorted).distinct.size == permuted.size,
      s"permuted duplicate selected twice: ${permuted.map(_.dims)}")
  }

  test("buildBudgeted: routing still answers every candidate grain, " +
      "results equal the naive fact aggregate") {
    val fact = Engine.table(spark, sf, "lineitem")
    val measures = Seq(Cube.MeasureDef("n", Cube.MCountAll),
      Cube.MeasureDef("s_qty", Cube.MSum,
        col("l_quantity").cast("decimal(18,2)")))
    val base = Seq("l_returnflag", "l_linestatus", "l_suppkey")
    val cands = Seq(Seq("l_returnflag", "l_linestatus"),
      Seq("l_suppkey"), Seq("l_returnflag"))
    // budget chosen so SOME but not necessarily all candidates fit:
    // 2x the base estimate leaves room for the small dim cuboids
    val est = fact.agg(approx_count_distinct(
      struct(base.map(col): _*))).head().getLong(0)
    val built = Cube.buildBudgeted(fact, measures, base, cands,
      maxRows = est * 2, tablePrefix = "dws.cube_bgt_t_")
    assert(built.head.dims == base)
    // a grain NOT materialized still answers through an ancestor:
    // compare the routed result for every candidate grain to the
    // naive aggregate
    cands.foreach { dims =>
      val routed = ExtQueries.withAggRouting(spark) {
        fact.groupBy(dims.map(col): _*)
          .agg(count(lit(1)).as("n"))
          .orderBy(dims.map(col): _*)
      }.collect().toSeq
      val naive = fact.groupBy(dims.map(col): _*)
        .agg(count(lit(1)).as("n"))
        .orderBy(dims.map(col): _*).collect().toSeq
      assert(routed == naive, s"grain $dims diverged under routing")
    }
  }

  test("the {returnflag} cuboid sits on a depth-3 derivation chain") {
    def depth(dims: Seq[String]): Int =
      manifest.find(_.dims == dims).get.parentDims
        .map(p => 1 + depth(p)).getOrElse(0)
    assert(depth(Seq("l_returnflag")) == 3,
      "expected fact -> base -> {rf,ls,sd} -> {rf,ls} -> {rf}")
  }

  test("measure types are identical across every cuboid") {
    val schemas = manifest.map(b => spark.table(b.table).schema
      .filter(f => Set("n", "cnt_qty", "s_qty", "s_disc", "mn_qty",
        "mx_qty").contains(f.name))
      .map(f => f.name -> f.dataType).toMap)
    assert(schemas.distinct.size == 1,
      s"cuboid measure types diverge: ${schemas.distinct}")
  }

  private def scannedPaths = {
    val df = CubeQueries.q_cube_route.run(spark, sf)
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    plan.collect { case s: FileSourceScanExec =>
      s.relation.location.rootPaths.map(_.toString) }.flatten
  }

  test("q_cube_route scans the smallest subsuming cuboid, not the fact") {
    val suf = sf.replaceAll("[^A-Za-z0-9]", "_")
    val paths = scannedPaths
    assert(paths.nonEmpty)
    val want = s"cube_${suf}_" + graft.operators.Cube.mangle(Seq("l_suppkey"))
    assert(paths.forall(_.contains(want)),
      s"expected the {l_suppkey} cuboid scan ($want), got $paths")
  }

  test("routing and the decimal-sum kernel COEXIST in one plan: the " +
      "routed query scans the cuboid AND re-aggregates via decimal_sum") {
    // pins the optimizer-batch ordering contract (AggRouteRewrite
    // before DecimalSum128Rewrite in the same fixed-point batch): if a
    // future rule reorders them — or delays the Aggregate's final
    // shape to a later iteration, where the 128-bit rewrite has
    // already replaced builtin Sum and routing's canonicals can no
    // longer semanticEquals — one of the two features silently drops.
    // The routed re-aggregation sums the cuboid's DECIMAL(28,2)
    // measure, so the eligible plan carries the 192-bit kernel.
    manifest
    val df = CubeQueries.q_cube_route.run(spark, sf)
    val planStr = df.queryExecution.executedPlan.toString
    assert(scannedPaths.forall(_.contains("cube_")),
      "routed summary scan missing")
    assert(planStr.contains("decimal_sum192") ||
      planStr.contains("decimal_sum128"),
      s"decimal-sum kernel missing from the routed plan:\n$planStr")
  }

  test("q_cube_budget routes onto the budget-selected lattice: zero " +
      "fact scans") {
    val df = CubeQueries.q_cube_budget.run(spark, sf)
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val paths = plan.collect { case s: FileSourceScanExec =>
      s.relation.location.rootPaths.map(_.toString) }.flatten
    assert(paths.nonEmpty)
    // when the full-lattice suite has ALSO registered its cuboids in
    // this session, routing may legitimately pick an equally small one
    // of those — the query's contract is zero FACT scans, not which
    // registered lattice answered
    assert(paths.forall(p => !p.contains("lineitem")),
      s"expected only cuboid scans (no fact), got $paths")
    assert(paths.exists(p => p.contains("cubebgt_") || p.contains("cube_")),
      s"expected a cuboid-table scan, got $paths")
  }

  test("grouping subsumed by two cuboids picks the fewer-row one") {
    // group by (rf, ls): subsumed by base, {rf,ls,sd} and {rf,ls};
    // the 6-row {rf,ls} cuboid must win
    manifest // force build+registration
    val exp = spark.experimental
    val prior = exp.extraOptimizations
    if (!prior.contains(graft.plans.AggRouteRewrite))
      exp.extraOptimizations = prior :+ graft.plans.AggRouteRewrite
    try withSQLConf("spark.graft.aggRouting.enabled" -> "true") {
      val df = Engine.table(spark, sf, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"))
      val plan = df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      val paths = plan.collect { case s: FileSourceScanExec =>
        s.relation.location.rootPaths.map(_.toString) }.flatten
      val suf = sf.replaceAll("[^A-Za-z0-9]", "_")
      val want = s"cube_${suf}_" +
        graft.operators.Cube.mangle(Seq("l_returnflag", "l_linestatus"))
      assert(paths.nonEmpty && paths.forall(_.contains(want)),
        s"expected the 6-row {rf,ls} cuboid ($want), got $paths")
    } finally exp.extraOptimizations = prior
  }

  test("route answers equal the naive fact aggregate exactly") {
    val routed = CubeQueries.q_cube_route.run(spark, sf)
    val naive = Engine.table(spark, sf, "lineitem")
      .groupBy("l_suppkey")
      .agg(count(lit(1)).as("n"),
        graft.functions.dsum2(col("l_quantity")).as("sum_qty"),
        min(col("l_quantity")).as("min_qty"),
        max(col("l_quantity")).as("max_qty"))
      .orderBy("l_suppkey")
    assertSameRows(routed, naive)
  }

  test("maintained lattice equals rebuilt lattice for every cuboid") {
    val fact = Engine.table(spark, sf, "lineitem")
    val cutoff = lit("1996-01-01").cast("timestamp_ntz")
    val baseDims = Seq("l_returnflag", "l_linestatus", "l_shipdate",
      "l_suppkey")
    val ms = Seq(
      Cube.MeasureDef("n", Cube.MCountAll),
      Cube.MeasureDef("s_qty", Cube.MSum,
        graft.functions.dec2(col("l_quantity"))),
      Cube.MeasureDef("mn_qty", Cube.MMin, col("l_quantity")),
      Cube.MeasureDef("mx_qty", Cube.MMax, col("l_quantity")))
    val baseAggs = ms.map(_.base)
    val oldBase = fact.filter(col("l_shipdate") < cutoff)
      .groupBy(baseDims.map(col): _*).agg(baseAggs.head, baseAggs.tail: _*)
    val delta = fact.filter(col("l_shipdate") >= cutoff)
    val children = Seq(Seq("l_returnflag", "l_linestatus"),
      Seq("l_suppkey"))
    val maintained = Cube.maintainLattice(baseDims, oldBase, delta, ms,
      children)
    (children :+ baseDims).foreach { dims =>
      val rebuilt = fact.groupBy(dims.map(col): _*)
        .agg(baseAggs.head, baseAggs.tail: _*)
        .select(maintained(dims).columns.map(c =>
          col(c).cast(maintained(dims).schema(c).dataType)): _*)
      assertSameRows(maintained(dims), rebuilt)
    }
  }

  test("HLL sketch measure: estimates survive lattice derivation and " +
      "maintenance unchanged") {
    val fact = Engine.table(spark, sf, "lineitem")
    val baseDims = Seq("l_returnflag", "l_linestatus")
    val ms = Seq(
      Cube.MeasureDef("n", Cube.MCountAll),
      Cube.MeasureDef("hll_supp", Cube.MHllSketch, col("l_suppkey")))
    val baseAggs = ms.map(_.base)
    val base = fact.groupBy(baseDims.map(col): _*)
      .agg(baseAggs.head, baseAggs.tail: _*)
    // derive {rf} from the base by sketch union; compare estimates to
    // a sketch built directly from the fact at {rf} grain
    def est(df: org.apache.spark.sql.DataFrame) = df
      .select(col("l_returnflag"),
        hll_sketch_estimate(col("hll_supp")).as("u"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val derived = est(Cube.derive(base, Seq("l_returnflag"), ms))
    val direct = est(fact.groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        hll_sketch_agg(col("l_suppkey")).as("hll_supp")))
    assert(derived == direct,
      s"union-derived sketch estimates drifted: $derived vs $direct")
    // maintenance: delta fold-in then re-derivation gives the same
    // estimates as a full rebuild
    val cutoff = lit("1996-01-01").cast("timestamp_ntz")
    val oldBase = fact.filter(col("l_shipdate") < cutoff)
      .groupBy(baseDims.map(col): _*).agg(baseAggs.head, baseAggs.tail: _*)
    val delta = fact.filter(col("l_shipdate") >= cutoff)
    val maintained = Cube.maintainLattice(baseDims, oldBase, delta, ms,
      Seq(Seq("l_returnflag")))
    assert(est(maintained(Seq("l_returnflag"))) == direct)
  }

  test("q_cube_rollup: every grouping set answered from a cuboid, " +
      "zero fact scans") {
    val df = CubeQueries.q_cube_rollup.run(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    val suf = sf.replaceAll("[^A-Za-z0-9]", "_")
    assert(!plan.contains("lineitem"),
      s"rollup must not touch the fact:\n$plan")
    assert(plan.contains(s"cube_${suf}_"),
      "rollup members must scan cuboid tables")
  }

  test("MeasureDef rejects nothing it cannot combine exactly") {
    // every MKind has a combine; the compile-time sealed trait is the
    // guard — this pins the decomposition table stays total
    val kinds: Seq[Cube.MKind] = Seq(Cube.MSum, Cube.MCountAll,
      Cube.MCountCol, Cube.MMin, Cube.MMax, Cube.MHllSketch)
    kinds.foreach { k =>
      val m = Cube.MeasureDef("x", k, col("l_quantity"))
      assert(m.combine != null && m.base != null)
    }
  }
}
