package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions._
import graft.operators.Cube

/** Cuboid-lattice conformance: the Kylin BUILD+ROUTE pair (reference
  * docs/olap.md:24) over lineitem.
  *
  * Lattice (dims -> measured rows at sf0.1, parent it derives from):
  *
  *   {rf,ls,sd,sk}  ~588k   <- fact (the ONLY fact scan)
  *   {rf,ls,sd}     ~15k    <- base
  *   {rf,sd}        ~7.5k   <- {rf,ls,sd}
  *   {ls,sk}        ~2k     <- base
  *   {rf,ls}        6       <- {rf,ls,sd}
  *   {sk}           1000    <- {ls,sk}
  *   {rf}           3       <- {rf,ls}        (depth-3 re-agg chain)
  *
  * q_cube_build hash-compares five cuboids' contents against DuckDB
  * aggregating the raw fact directly — exactness of the whole
  * parent-derived lattice, including the depth-3 chain. q_cube_route
  * answers a fact-table aggregate with routing enabled; the rewrite
  * must pick the SMALLEST subsuming cuboid ({sk}, 1000 rows —
  * CubeSpec pins the scan), and the oracle is the naive SQL on the
  * raw fact.
  */
object CubeQueries {

  private val RF = "l_returnflag"
  private val LS = "l_linestatus"
  private val SD = "l_shipdate"
  private val SK = "l_suppkey"

  private def measures = Seq(
    Cube.MeasureDef("n", Cube.MCountAll),
    Cube.MeasureDef("cnt_qty", Cube.MCountCol, col("l_quantity")),
    Cube.MeasureDef("s_qty", Cube.MSum, dec2(col("l_quantity"))),
    Cube.MeasureDef("s_disc", Cube.MSum,
      dec4(col("l_extendedprice") * (lit(1) - col("l_discount")))),
    Cube.MeasureDef("mn_qty", Cube.MMin, col("l_quantity")),
    Cube.MeasureDef("mx_qty", Cube.MMax, col("l_quantity")))

  private val lattice = Seq(
    Seq(RF, LS, SD, SK), Seq(RF, LS, SD), Seq(RF, SD), Seq(LS, SK),
    Seq(RF, LS), Seq(SK), Seq(RF))

  // computeIfAbsent (not a separate ready-set + map) so a concurrent
  // caller losing the insert race BLOCKS until the winner's build
  // publishes the manifest, instead of reading a not-yet-present key
  private val cubes = new java.util.concurrent.ConcurrentHashMap[
    String, Seq[Cube.Built]]()

  /** Build the lattice once per JVM per scale dir; cuboids register
    * themselves as routing summaries with measured row counts. */
  private[graft] def ensureCube(s: SparkSession, d: String)
      : Seq[Cube.Built] = {
    val suf = d.replaceAll("[^A-Za-z0-9]", "_")
    val prefix = s"dws.cube_${suf}_"
    cubes.computeIfAbsent(prefix, _ => {
      s.sql("CREATE DATABASE IF NOT EXISTS dws")
      Cube.build(Engine.table(s, d, "lineitem"), measures,
        lattice, prefix)
    })
  }

  /** Normalized projection of one cuboid for the union output. */
  private def shapedDf(dims: Seq[String], t: DataFrame): DataFrame = {
    def dim(name: String, tpe: String) =
      (if (dims.contains(name)) col(name) else lit(null))
        .cast(tpe).as(name)
    t.select(lit(dims.map(_.stripPrefix("l_")).mkString("+")).as("cuboid"),
      dim(RF, "string"), dim(LS, "string"), dim(SD, "date"),
      dim(SK, "bigint"),
      col("n"), col("cnt_qty"), col("s_qty").cast("double").as("s_qty"),
      col("s_disc").cast("double").as("s_disc"),
      col("mn_qty"), col("mx_qty"))
  }

  private def shaped(s: SparkSession, b: Cube.Built): DataFrame =
    shapedDf(b.dims, s.table(b.table))

  /** Five cuboids' full contents vs direct aggregation of the fact. */
  val q_cube_build = QuerySpec(
    "q_cube_build", Seq("A1", "A2", "A6", "A7", "S4"),
    (s, d) => {
      val manifest = ensureCube(s, d)
      val byDims = manifest.map(b => b.dims -> b).toMap
      Seq(Seq(RF, SD), Seq(LS, SK), Seq(RF, LS), Seq(SK), Seq(RF))
        .map(dims => shaped(s, byDims(dims)))
        .reduce(_.unionByName(_))
        .orderBy("cuboid", RF, LS, SD, SK)
    },
    Some {
      def one(tag: String, rf: Boolean, ls: Boolean, sd: Boolean,
          sk: Boolean): String = {
        def d(on: Boolean, c: String, t: String) =
          if (on) s"CAST($c AS $t)" else s"CAST(NULL AS $t)"
        val dims = Seq(rf -> RF, ls -> LS, sd -> SD, sk -> SK)
          .filter(_._1).map(_._2)
        s"""SELECT '$tag' AS cuboid,
              ${d(rf, RF, "VARCHAR")} AS $RF, ${d(ls, LS, "VARCHAR")} AS $LS,
              ${d(sd, SD, "DATE")} AS $SD, ${d(sk, SK, "BIGINT")} AS $SK,
              COUNT(*) AS n, COUNT(l_quantity) AS cnt_qty,
              CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS s_qty,
              CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4)))
                AS DOUBLE) AS s_disc,
              MIN(l_quantity) AS mn_qty, MAX(l_quantity) AS mx_qty
            FROM lineitem GROUP BY ${dims.mkString(", ")}"""
      }
      Seq(one("returnflag+shipdate", rf = true, ls = false, sd = true, sk = false),
        one("linestatus+suppkey", rf = false, ls = true, sd = false, sk = true),
        one("returnflag+linestatus", rf = true, ls = true, sd = false, sk = false),
        one("suppkey", rf = false, ls = false, sd = false, sk = true),
        one("returnflag", rf = true, ls = false, sd = false, sk = false))
        .mkString("", " UNION ALL ",
          s" ORDER BY cuboid, $RF, $LS, $SD, $SK")
    })

  /** A naive fact-table aggregate answered from the lattice: routing
    * rewrites it onto the 1000-row {suppkey} cuboid (CubeSpec pins
    * the scan). The oracle is the same naive SQL on raw lineitem. */
  val q_cube_route = QuerySpec(
    "q_cube_route", Seq("A1", "A6", "S4"),
    (s, d) => {
      ensureCube(s, d)
      ExtQueries.withAggRouting(s) {
        Engine.table(s, d, "lineitem")
          .groupBy(SK)
          .agg(count(lit(1)).as("n"),
            dsum2(col("l_quantity")).as("sum_qty"),
            min(col("l_quantity")).as("min_qty"),
            max(col("l_quantity")).as("max_qty"))
          .orderBy(SK)
      }
    },
    Some(s"""SELECT $SK, COUNT(*) AS n,
              CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                AS sum_qty,
              MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty
            FROM lineitem GROUP BY $SK ORDER BY $SK"""))

  /** Whole-lattice incremental maintenance: the base cuboid is built
    * from the PRE-cutoff fact only, the post-cutoff rows arrive as a
    * delta folded in by [[graft.plans.AggRouting.maintainSummary]]
    * (the fact is never rescanned), and the coarser cuboids are
    * re-derived from the maintained base — summaries feeding
    * summaries, as in the build. The oracle aggregates the FULL raw
    * fact directly in DuckDB: hash equality proves maintained ==
    * rebuilt for every cuboid in the output. */
  val q_cube_maintain = QuerySpec(
    "q_cube_maintain", Seq("A1", "A2", "A6", "A7", "S4"),
    (s, d) => {
      val fact = Engine.table(s, d, "lineitem")
      val cutoff = lit("1996-01-01").cast("timestamp_ntz")
      val baseDims = Seq(RF, LS, SD, SK)
      val ms = measures
      val baseAggs = ms.map(_.base)
      val oldBase = fact.filter(col(SD) < cutoff)
        .groupBy(baseDims.map(col): _*)
        .agg(baseAggs.head, baseAggs.tail: _*)
      val delta = fact.filter(col(SD) >= cutoff)
      val maintained = Cube.maintainLattice(baseDims, oldBase, delta,
        ms, Seq(Seq(RF, SD), Seq(RF, LS), Seq(SK)))
      Seq(Seq(RF, SD), Seq(RF, LS), Seq(SK))
        .map(dims => shapedDf(dims, maintained(dims)))
        .reduce(_.unionByName(_))
        .orderBy("cuboid", RF, LS, SD, SK)
    },
    Some {
      def one(tag: String, rf: Boolean, ls: Boolean, sd: Boolean,
          sk: Boolean): String = {
        def d(on: Boolean, c: String, t: String) =
          if (on) s"CAST($c AS $t)" else s"CAST(NULL AS $t)"
        val dims = Seq(rf -> RF, ls -> LS, sd -> SD, sk -> SK)
          .filter(_._1).map(_._2)
        s"""SELECT '$tag' AS cuboid,
              ${d(rf, RF, "VARCHAR")} AS $RF, ${d(ls, LS, "VARCHAR")} AS $LS,
              ${d(sd, SD, "DATE")} AS $SD, ${d(sk, SK, "BIGINT")} AS $SK,
              COUNT(*) AS n, COUNT(l_quantity) AS cnt_qty,
              CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS s_qty,
              CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4)))
                AS DOUBLE) AS s_disc,
              MIN(l_quantity) AS mn_qty, MAX(l_quantity) AS mx_qty
            FROM lineitem GROUP BY ${dims.mkString(", ")}"""
      }
      Seq(one("returnflag+shipdate", rf = true, ls = false, sd = true, sk = false),
        one("returnflag+linestatus", rf = true, ls = true, sd = false, sk = false),
        one("suppkey", rf = false, ls = false, sd = false, sk = true))
        .mkString("", " UNION ALL ",
          s" ORDER BY cuboid, $RF, $LS, $SD, $SK")
    })

  /** A three-set dashboard rollup answered ENTIRELY from the lattice:
    * every member of [[Cube.groupingSets]] individually routes to its
    * smallest subsuming cuboid ({rf,ls} -> the 6-row cuboid, {rf} ->
    * the 3-row one, {ls} -> the 2000-row {ls,sk} cuboid) — zero fact
    * scans, pinned in CubeSpec. The oracle computes the same three
    * group-bys from raw lineitem. */
  val q_cube_rollup = QuerySpec(
    "q_cube_rollup", Seq("A1", "A6", "A10", "S4"),
    (s, d) => {
      ensureCube(s, d)
      ExtQueries.withAggRouting(s) {
        Cube.groupingSets(Engine.table(s, d, "lineitem"), Seq(RF, LS),
          Seq(Seq(RF, LS), Seq(RF), Seq(LS)),
          Seq(Cube.MeasureDef("n", Cube.MCountAll),
            Cube.MeasureDef("s_qty", Cube.MSum, dec2(col("l_quantity")))))
          .select(col("grouping_set"), col(RF), col(LS), col("n"),
            col("s_qty").cast("double").as("s_qty"))
          .orderBy("grouping_set", RF, LS)
      }
    },
    Some(s"""SELECT grouping_set, $RF, $LS, n, s_qty FROM (
        SELECT '$RF+$LS' AS grouping_set, CAST($RF AS VARCHAR) AS $RF,
               CAST($LS AS VARCHAR) AS $LS, COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS s_qty
        FROM lineitem GROUP BY $RF, $LS
        UNION ALL
        SELECT '$RF', CAST($RF AS VARCHAR), CAST(NULL AS VARCHAR),
               COUNT(*), CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        FROM lineitem GROUP BY $RF
        UNION ALL
        SELECT '$LS', CAST(NULL AS VARCHAR), CAST($LS AS VARCHAR),
               COUNT(*), CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        FROM lineitem GROUP BY $LS)
      ORDER BY grouping_set, $RF, $LS"""))

  private val budgetCubes = new java.util.concurrent.ConcurrentHashMap[
    String, Seq[Cube.Built]]()

  /** Budget-selected lattice (HRU greedy, [[Cube.selectCuboids]]):
    * base {rf,ls,sd,sk} + whatever candidates fit 2× the base's
    * sketched row count. Built once per JVM per scale dir under its
    * own prefix so the full-lattice queries stay isolated. */
  private[graft] def ensureBudgetCube(s: SparkSession, d: String)
      : Seq[Cube.Built] = {
    val suf = d.replaceAll("[^A-Za-z0-9]", "_")
    val prefix = s"dws.cubebgt_${suf}_"
    budgetCubes.computeIfAbsent(prefix, _ => {
      s.sql("CREATE DATABASE IF NOT EXISTS dws")
      val fact = Engine.table(s, d, "lineitem")
      val base = Seq(RF, LS, SD, SK)
      // budget = 2x the base's sketched size, resolved INSIDE the
      // selection's own sizing pass (one fact sketch total)
      Cube.buildBudgetedBy(fact, measures, base,
        Seq(Seq(RF, SD), Seq(LS, SK), Seq(RF, LS), Seq(SK), Seq(RF)),
        budgetOf = _ * 2, tablePrefix = prefix)
    })
  }

  /** A dashboard aggregate answered from the BUDGET-SELECTED lattice
    * ([[Cube.buildBudgeted]]): Kylin's practical capability is not
    * "materialize the requested lattice" but "choose what to
    * materialize under a budget" (HRU greedy over sketched cuboid
    * sizes; reference docs/olap.md:24). The query's grain routes onto
    * the selected sub-lattice — any grain whose exact cuboid was cut
    * by the budget still answers through a selected ancestor — and
    * the oracle is the naive SQL on raw lineitem. */
  val q_cube_budget = QuerySpec(
    "q_cube_budget", Seq("A1", "A6", "A10", "S4"),
    (s, d) => {
      ensureBudgetCube(s, d)
      ExtQueries.withAggRouting(s) {
        Engine.table(s, d, "lineitem")
          .groupBy(RF, LS)
          .agg(count(lit(1)).as("n"),
            dsum2(col("l_quantity")).as("sum_qty"),
            min(col("l_quantity")).as("min_qty"),
            max(col("l_quantity")).as("max_qty"))
          .orderBy(RF, LS)
      }
    },
    Some(s"""SELECT $RF, $LS, COUNT(*) AS n,
              CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                AS sum_qty,
              MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty
            FROM lineitem GROUP BY $RF, $LS ORDER BY $RF, $LS"""))

  def all: Seq[QuerySpec] =
    Seq(q_cube_build, q_cube_route, q_cube_maintain, q_cube_rollup,
      q_cube_budget)
}
