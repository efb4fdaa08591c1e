package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cuboid-lattice materialization — the Kylin cube BUILD, to pair
  * with [[graft.plans.AggRouting]]'s cube ANSWERING (reference
  * docs/olap.md:24: the MOLAP layer precomputes group-bys and
  * answers queries from them).
  *
  * The scale property this module exists for: the fact table is
  * scanned ONCE, for the base cuboid only. Every coarser cuboid is
  * computed from its smallest already-materialized ancestor by exact
  * re-aggregation (sum of sums, sum of counts, min of mins, max of
  * maxes) — Kylin's by-layer build. At 100 TB the base cuboid is one
  * full-scan aggregation; the rest of the lattice costs aggregations
  * over progressively tiny summaries (a 6-row cuboid is derived from
  * a 15 000-row parent, not from 600 M fact rows). Parent selection
  * uses MEASURED row counts of the cuboids built so far, not dim
  * arity — a high-cardinality two-dim cuboid can be a worse parent
  * than a low-cardinality three-dim one.
  *
  * Every materialized cuboid is registered as a routing summary
  * (with its row count, so [[graft.plans.AggRouteRewrite]] answers
  * each query from the SMALLEST subsuming cuboid), making the pair
  * build-once / route-everything: the user keeps writing aggregates
  * against the fact table.
  *
  * Measure kinds are exactly the decomposable set routing accepts;
  * measure columns of every cuboid are cast to the base cuboid's
  * declared types so re-aggregation up the lattice can't widen
  * decimals round by round.
  */
object Cube {

  sealed trait MKind
  case object MSum extends MKind
  case object MCountAll extends MKind
  case object MCountCol extends MKind
  case object MMin extends MKind
  case object MMax extends MKind
  /** Mergeable approximate-distinct sketch (Datasketches HLL — the
    * Druid/Kylin sketch measure): the base cuboid stores a serialized
    * sketch per group; coarser cuboids union the sketches (register
    * max-merge — associative and lossless over the register state, so
    * a sketch derived through ANY lattice path estimates identically
    * to one built from the fact). Routing never uses these — sketch
    * estimates are approximate, and routing promises exactness — but
    * any cuboid can answer approx-distinct at its grain by
    * `hll_sketch_estimate` without rescanning anything. */
  case object MHllSketch extends MKind

  /** One cube measure: `name` is the cuboid column; `input` the fact
    * expression (ignored for MCountAll). */
  final case class MeasureDef(name: String, kind: MKind,
      input: Column = lit(1)) {
    /** Aggregate from raw fact rows. */
    def base: Column = (kind match {
      case MSum => sum(input)
      case MCountAll => count(lit(1))
      case MCountCol => count(input)
      case MMin => min(input)
      case MMax => max(input)
      case MHllSketch => hll_sketch_agg(input)
    }).as(name)
    /** Exact re-aggregate from a parent cuboid's column. */
    def combine: Column = (kind match {
      case MSum | MCountAll | MCountCol => sum(col(name))
      case MMin => min(col(name))
      case MMax => max(col(name))
      case MHllSketch => hll_union_agg(col(name))
    }).as(name)
    /** Canonical fact-side aggregate (route registration + delta
      * maintenance both compare against this). */
    def canonical: Column = kind match {
      case MSum => sum(input)
      case MCountAll => count(lit(1))
      case MCountCol => count(input)
      case MMin => min(input)
      case MMax => max(input)
      case MHllSketch => hll_sketch_agg(input)
    }
    /** Sketches are approximate; routing promises exactness. */
    def routable: Boolean = kind != MHllSketch
  }

  /** Build manifest entry: `parentDims` is None iff the cuboid was
    * aggregated from the fact table itself. */
  final case class Built(dims: Seq[String], table: String, rows: Long,
      parentDims: Option[Seq[String]])

  /** Collision-proof table/path suffix for a dim list. INJECTIVE by
    * construction — ASCII alphanumerics pass through, '_' escapes to
    * "_u", any other char to "_x<hex>_", and dims join on "_d" — so
    * Seq("a_b") vs Seq("ab"), or Seq("x_y","z") vs Seq("x","y_z"),
    * mangle to distinct names (the previous strip-non-alnum mangle
    * silently collided those onto one table and overwrote it). The
    * escape char '_' never occurs bare, so the encoding parses back
    * unambiguously; output is a valid [A-Za-z0-9_]* identifier. */
  private[graft] def mangle(dims: Seq[String]): String =
    dims.map(_.flatMap {
      case c if (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
        (c >= '0' && c <= '9') => c.toString
      case '_' => "_u"
      case c => "_x%04x_".format(c.toInt)
    }).mkString("_d")

  /** Base-dim reduction contract for [[build]]: a lattice only earns
    * its keep when the BASE cuboid is much smaller than the fact —
    * every routing win and every incremental-maintenance win is
    * proportional to that reduction. When the base grain is nearly
    * row-unique (the 300x probe measured growth exponent 0.93 for
    * maintenance exactly in that regime — the "summary" IS the fact,
    * so every derive rescans fact-sized data), materializing the
    * lattice burns storage and shuffle for nothing. [[build]] refuses
    * above this sketched base-groups/fact-rows fraction; pass
    * `maxBaseRatio = 1.0` to opt out (and accept fact-sized
    * summaries), or pick lower-cardinality base dims. */
  val DefaultMaxBaseRatio: Double = 0.5

  /** Facts below this row count skip the reduction guard: a tiny
    * fixture legitimately has near-unique dim tuples, and the guard
    * exists to stop 100 TB mistakes, not unit tests. */
  val BaseRatioGuardMinRows: Long = 1L << 20

  /** Materialize `cuboids` (each a subset of fact columns) as managed
    * tables `<tablePrefix><dims joined by _>`, building each from its
    * smallest materialized ancestor, and register every one as a
    * routing summary. Existing tables are overwritten. Returns the
    * build manifest in build order (descending dim count).
    *
    * Refuses (see [[DefaultMaxBaseRatio]]) when one sketch pass over
    * the fact (count + HLL of the UNION of all requested cuboid dims
    * — the true base grain — map-side partial, no shuffle growth)
    * shows the base would not reduce the fact by at least
    * `1 - maxBaseRatio`. */
  def build(fact: DataFrame, measures: Seq[MeasureDef],
      cuboids: Seq[Seq[String]], tablePrefix: String,
      register: Boolean = true,
      maxBaseRatio: Double = DefaultMaxBaseRatio): Seq[Built] = {
    require(cuboids.nonEmpty, "no cuboids requested")
    require(measures.nonEmpty, "no measures declared")
    if (maxBaseRatio < 1.0) {
      // sketch the TRUE base grain: the union of every requested
      // cuboid's dims, not an arbitrary widest cuboid — with two
      // same-length disjoint cuboids, maxBy picked one winner and a
      // non-reducing co-base slipped through unexamined. The union's
      // distinct count upper-bounds every cuboid's (each cuboid is a
      // projection of it), so one sketch pass still guards them all,
      // and it is exactly the grain an incremental-maintenance base
      // would carry.
      val unionDims = cuboids.flatten.distinct
      val r = fact.agg(count(lit(1)),
        approx_count_distinct(struct(unionDims.map(col): _*))).head()
      val (n, g) = (r.getLong(0), r.getLong(1))
      require(n < BaseRatioGuardMinRows || g <= maxBaseRatio * n,
        s"base grain (${unionDims.mkString(",")} — the union of all " +
          s"requested cuboid dims) sketches ~$g groups over " +
          s"$n fact rows (${String.format(java.util.Locale.ROOT,
            "%.2f", Double.box(g.toDouble / n))} > " +
          s"$maxBaseRatio): the lattice would not reduce the fact — " +
          "pick lower-cardinality base dims, or pass maxBaseRatio = 1.0 " +
          "to build fact-sized summaries anyway")
    }
    // mangle is injective, so mangled-name uniqueness == dim-list
    // uniqueness; a duplicated dim list would silently overwrite its
    // twin's table mid-build
    require(cuboids.map(mangle).distinct.size == cuboids.size,
      s"duplicate cuboid dim lists: ${cuboids.mkString("; ")}")
    val spark = fact.sparkSession
    val ordered = cuboids.sortBy(-_.length)
    // the widest requested cuboid decides the declared measure types
    // (sum of DECIMAL(18,2) -> DECIMAL(28,2) etc.); every cuboid is
    // cast to these so lattice depth never widens a type
    val declared = fact.groupBy(ordered.head.map(col): _*)
      .agg(measures.head.base, measures.tail.map(_.base): _*)
      .schema.fields.map(f => f.name -> f.dataType).toMap
    val built = scala.collection.mutable.ArrayBuffer.empty[Built]
    for (dims <- ordered) {
      require(dims.nonEmpty, "empty cuboid (grand total) not supported")
      val parent = built.filter(b => dims.forall(b.dims.contains))
        .sortBy(_.rows).headOption
      val (src, aggs) = parent match {
        case Some(p) =>
          (spark.table(p.table), measures.map(_.combine))
        case None => (fact, measures.map(_.base))
      }
      val out = src.groupBy(dims.map(col): _*)
        .agg(aggs.head, aggs.tail: _*)
        .select(dims.map(col) ++ measures.map(m =>
          col(m.name).cast(declared(m.name)).as(m.name)): _*)
      val tbl = tablePrefix + mangle(dims)
      Warehouse.dropManaged(spark, tbl)
      out.write.format("parquet").saveAsTable(tbl)
      // one count per cuboid, over the just-written summary (never the
      // fact): sizes drive both parent selection above and smallest-
      // cuboid routing below
      val rows = spark.table(tbl).count()
      val routable = measures.filter(_.routable)
        .map(m => m.canonical -> m.name)
      if (register && routable.nonEmpty)
        graft.plans.AggRouting.register(fact, spark.table(tbl), dims,
          routable.toMap, rows)
      built += Built(dims, tbl, rows, parent.map(_.dims))
    }
    built.toSeq
  }

  /** Benefit-ranked cuboid selection under a ROW BUDGET — the classic
    * greedy of Harinarayan/Rajaraman/Ullman, "Implementing Data Cubes
    * Efficiently" (SIGMOD '96), over MEASURED (sketched) cuboid sizes.
    * Kylin's practical capability is not "materialize the requested
    * lattice" but "choose which cuboids to materialize under a
    * budget": a 12-dim fact must not imply 2^12 tables.
    *
    * Sizes: one chunked pass over the fact computes
    * `approx_count_distinct` of every candidate's dim tuple (64
    * sketches per aggregate job — k candidates cost ceil(k/64) fact
    * scans, each a map-side-partial HLL agg, no shuffle growth; at
    * 100 TB you run this once per cube design, not per query). The
    * base cuboid (widest, covering every candidate) is always
    * selected — it is the fallback ancestor that keeps every query
    * answerable off the fact.
    *
    * Greedy: per round, pick the unselected candidate with the
    * largest total benefit, where benefit = Σ over candidate queries
    * q ⊆ c of (rows of q's current cheapest selected ancestor − rows
    * of c), counting only improvements; stop when the budget is
    * exhausted or no candidate both fits and helps. The greedy is
    * (1 − 1/e)-optimal for this objective — the known guarantee.
    *
    * Returns the selected dim lists (base first, then selection
    * order) with their estimated rows — feed to [[build]]. */
  def selectCuboids(fact: DataFrame, baseDims: Seq[String],
      candidates: Seq[Seq[String]], maxRows: Long): Seq[Built] =
    selectCuboidsBy(fact, baseDims, candidates, _ => maxRows)

  /** [[selectCuboids]] with the budget given as a FUNCTION of the
    * base cuboid's sketched row count (`budgetOf`), so callers that
    * budget relative to the base ("2× the base") don't pay a second
    * full-fact sketch pass just to learn the base size first. */
  def selectCuboidsBy(fact: DataFrame, baseDims: Seq[String],
      candidates: Seq[Seq[String]],
      budgetOf: Long => Long): Seq[Built] = {
    require(baseDims.nonEmpty, "baseDims must be non-empty")
    // candidate identity is the dim SET: dedupe on the sorted dims so
    // order-permuted duplicates like (a,b)/(b,a) can't both be selected
    // and materialized as identical cuboids double-charging the budget
    val cands = candidates.map(_.distinct).filter(_.nonEmpty)
      .filterNot(_.sorted == baseDims.sorted)
      .distinctBy(_.sorted)
    require(cands.forall(_.forall(baseDims.contains)),
      "every candidate must be a subset of baseDims")
    val all = baseDims +: cands
    // sketched sizes, 64 candidates per aggregate pass
    val est: Map[Seq[String], Long] = all.grouped(64).flatMap { chunk =>
      val aggs = chunk.zipWithIndex.map { case (dims, i) =>
        approx_count_distinct(struct(dims.map(col): _*)).as(s"c$i")
      }
      val row = fact.agg(aggs.head, aggs.tail: _*).head()
      chunk.zipWithIndex.map { case (dims, i) => dims -> row.getLong(i) }
    }.toMap
    val baseRows = est(baseDims)
    val maxRows = budgetOf(baseRows)
    require(baseRows <= maxRows,
      s"base cuboid alone (~$baseRows rows) exceeds the budget $maxRows")
    val selected = scala.collection.mutable.LinkedHashMap[Seq[String], Long](
      baseDims -> baseRows)
    var budget = maxRows - baseRows
    // cheapest selected ancestor a query grain can be answered from
    def coverCost(q: Seq[String]): Long =
      selected.collect { case (d, r) if q.forall(d.contains) => r }.min
    var done = false
    while (!done) {
      val scored = cands
        .filterNot(selected.contains)
        .filter(est(_) <= budget)
        .map { c =>
          val rows = est(c)
          val benefit = cands.iterator
            .filter(q => q.forall(c.contains))
            .map(q => math.max(0L, coverCost(q) - rows)).sum
          (c, benefit)
        }
        .filter(_._2 > 0)
      scored.sortBy { case (c, b) => (-b, est(c), mangle(c)) }
        .headOption match {
        case Some((c, _)) =>
          selected += c -> est(c)
          budget -= est(c)
        case None => done = true
      }
    }
    selected.map { case (d, r) => Built(d, "", r, None) }.toSeq
  }

  /** [[selectCuboids]] then [[build]]: materialize the budget-selected
    * sub-lattice and register it for routing. */
  def buildBudgeted(fact: DataFrame, measures: Seq[MeasureDef],
      baseDims: Seq[String], candidates: Seq[Seq[String]],
      maxRows: Long, tablePrefix: String,
      register: Boolean = true): Seq[Built] =
    build(fact, measures,
      selectCuboids(fact, baseDims, candidates, maxRows).map(_.dims),
      tablePrefix, register)

  /** [[buildBudgeted]] with the budget relative to the base cuboid's
    * sketched size (one sketch pass total). */
  def buildBudgetedBy(fact: DataFrame, measures: Seq[MeasureDef],
      baseDims: Seq[String], candidates: Seq[Seq[String]],
      budgetOf: Long => Long, tablePrefix: String,
      register: Boolean = true): Seq[Built] =
    build(fact, measures,
      selectCuboidsBy(fact, baseDims, candidates, budgetOf).map(_.dims),
      tablePrefix, register)

  /** A GROUPING-SETS aggregate phrased so EVERY member can route onto
    * the lattice: one aggregate per grouping set (each individually
    * eligible for [[graft.plans.AggRouteRewrite]]'s smallest-cuboid
    * rewrite — Spark's native grouping-sets plan goes through Expand,
    * which routing cannot see through), absent dims null-filled, plus
    * a `grouping_set` tag column. With routing enabled and a lattice
    * registered, a k-set dashboard rollup over a 100 TB fact becomes
    * k aggregations over cuboid-sized summaries and zero fact scans.
    * Dim columns must be string-typed or explicitly castable to
    * string (the null-fill type). */
  def groupingSets(fact: DataFrame, allDims: Seq[String],
      sets: Seq[Seq[String]], measures: Seq[MeasureDef]): DataFrame = {
    require(sets.nonEmpty && sets.forall(_.nonEmpty),
      "each grouping set must name at least one dim")
    val aggs = measures.map(_.base)
    sets.map { set =>
      val tagged = fact.groupBy(set.map(col): _*)
        .agg(aggs.head, aggs.tail: _*)
      tagged.select(
        lit(set.mkString("+")).as("grouping_set") +:
          allDims.map(d =>
            (if (set.contains(d)) col(d) else lit(null))
              .cast("string").as(d)) ++:
          measures.map(m => col(m.name)): _*)
    }.reduce(_.unionByName(_))
  }

  /** Derive a coarser cuboid's contents from a parent cuboid's
    * contents by exact re-aggregation (the same combine the lattice
    * build uses). `parent` must contain `dims` plus every measure
    * column. */
  def derive(parent: DataFrame, dims: Seq[String],
      measures: Seq[MeasureDef]): DataFrame =
    parent.groupBy(dims.map(col): _*)
      .agg(measures.head.combine, measures.tail.map(_.combine): _*)

  /** Incremental maintenance of a whole lattice — the Kylin segment
    * build generalized to every cuboid: fold the delta into the BASE
    * cuboid only ([[graft.plans.AggRouting.maintainSummary]]: one
    * aggregation of the delta, one summary-sized combine — the fact
    * is never rescanned), then re-derive each coarser cuboid from its
    * smallest maintained ancestor. Descendant maintenance therefore
    * costs aggregations over summaries, exactly like the build; and
    * because every measure combines exactly, maintained lattice ==
    * lattice rebuilt from the full fact, row for row.
    *
    * Cost model inherits [[build]]'s reduction contract: maintenance
    * is summary-sized ONLY when the base cuboid reduces the fact
    * (guarded at build time by [[DefaultMaxBaseRatio]]); against a
    * near-row-unique base grain each derive is fact-sized and the
    * maintenance growth exponent was measured at 0.93 per fact growth
    * (300x probe) — rebuild-equivalent cost, no incremental win.
    *
    * @param baseDims    the base cuboid's dims (must cover every
    *                    requested cuboid)
    * @param baseSummary the base cuboid's current contents
    *                    (`baseDims ++ measure names` columns)
    * @param delta       new fact rows to fold in
    * @param cuboids     descendant cuboids to re-derive
    * @return dims -> maintained contents, including the base
    */
  def maintainLattice(baseDims: Seq[String], baseSummary: DataFrame,
      delta: DataFrame, measures: Seq[MeasureDef],
      cuboids: Seq[Seq[String]]): Map[Seq[String], DataFrame] = {
    require(cuboids.forall(_.forall(baseDims.contains)),
      "every cuboid must be a subset of the base dims")
    val canonical = measures.map(m => m.canonical -> m.name).toMap
    // the maintained base feeds EVERY derived cuboid's plan: left lazy,
    // a k-cuboid maintenance re-runs the whole base maintenance (delta
    // agg + summary combine — at 100 TB the delta scan) k times, once
    // per output branch (measured: q_cube_maintain spent 3× the base
    // agg's task time across its 3 derives). One eager localCheckpoint
    // materializes the summary-sized base once; every derive then
    // re-aggregates stored summary rows. Base-only maintenance (no
    // cuboids) keeps the lazy frame — nothing re-derives it here.
    val base0 = graft.plans.AggRouting.maintainSummary(
      baseSummary, delta, baseDims, canonical)
    val base = if (cuboids.nonEmpty) base0.localCheckpoint() else base0
    val done = scala.collection.mutable.LinkedHashMap[Seq[String],
      DataFrame](baseDims -> base)
    // derive small-from-small: among the maintained frames, pick the
    // ancestor with the fewest dims beyond the child's (the in-memory
    // stand-in for the build's measured-rows rule)
    for (dims <- cuboids.sortBy(-_.length)) {
      val parent = done.filter { case (d, _) => dims.forall(d.contains) }
        .toSeq.sortBy(_._1.length).headOption
        .getOrElse(baseDims -> base)
      done += dims -> derive(parent._2, dims, measures)
    }
    done.toMap
  }
}
