package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions._
import graft.operators.Relational

/** One conformance query: Spark implementation + DuckDB oracle SQL.
  *
  * Conventions that make the driver's hash-compare deterministic:
  *  - every aggregate over a double goes through exact DECIMAL
  *    accumulation (see [[graft.functions]]) so values are bitwise
  *    reproducible on any partitioning AND match the oracle;
  *  - every result carries an unambiguous ORDER BY;
  *  - computed columns are aliased identically on both sides;
  *  - timestamps are cast to DATE before output (ns vs µs precision).
  *
  * `ops` lists the SURVEY.md §2 operator ids the query covers.
  */
final case class QuerySpec(
    name: String,
    ops: Seq[String],
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Queries {

  private def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    Engine.table(spark, sfDir, name)

  // ---------------------------------------------------------------- scans

  /** S1/P1/P2/O1: table scan with projection + aliasing. */
  val q_scan_project = QuerySpec(
    "q_scan_project", Seq("S1", "P1", "P2", "O1"),
    (s, d) => t(s, d, "region")
      .select(col("r_regionkey").as("rk"), lower(col("r_name")).as("rname"))
      .orderBy("rk"),
    Some("""SELECT r_regionkey AS rk, lower(r_name) AS rname
            FROM region ORDER BY rk"""))

  /** S2/P3/P4: date-range scan — predicate pushed to the parquet reader
    * (partition-pruning analogue on the unpartitioned testdata). */
  val q_filter_range = QuerySpec(
    "q_filter_range", Seq("S2", "P3", "P4"),
    (s, d) => t(s, d, "lineitem")
      .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp_ntz") &&
        col("l_shipdate") < lit("1996-01-01").cast("timestamp_ntz") &&
        col("l_quantity") > 45)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_quantity"), col("l_shipdate").cast("date").as("ship_date"))
      .orderBy("l_orderkey", "l_linenumber"),
    Some("""SELECT l_orderkey, l_linenumber, l_quantity,
                   CAST(l_shipdate AS DATE) AS ship_date
            FROM lineitem
            WHERE l_shipdate >= '1995-01-01' AND l_shipdate < '1996-01-01'
              AND l_quantity > 45
            ORDER BY l_orderkey, l_linenumber"""))

  // -------------------------------------------------- filters / predicates

  /** P5/P6/P7: LIKE / NOT LIKE / IN / boolean logic. */
  val q_like_in = QuerySpec(
    "q_like_in", Seq("P5", "P6", "P7"),
    (s, d) => t(s, d, "part")
      .filter((col("p_type").like("%ECONOMY%") ||
        col("p_brand").isin("Brand#1", "Brand#2", "Brand#3")) &&
        !col("p_name").like("%green%"))
      .select("p_partkey", "p_name", "p_brand", "p_type")
      .orderBy("p_partkey"),
    Some("""SELECT p_partkey, p_name, p_brand, p_type FROM part
            WHERE (p_type LIKE '%ECONOMY%'
                   OR p_brand IN ('Brand#1','Brand#2','Brand#3'))
              AND p_name NOT LIKE '%green%'
            ORDER BY p_partkey"""))

  /** P8/P9: IS NULL handling + CASE WHEN conditional projection. */
  val q_case_null = QuerySpec(
    "q_case_null", Seq("P8", "P9"),
    (s, d) => t(s, d, "orders")
      .select(when(col("o_orderstatus") === "O", lit(null))
        .otherwise(col("o_orderstatus")).as("st"),
        col("o_totalprice"))
      .groupBy("st")
      .agg(count(lit(1)).as("n"),
        count(when(col("st").isNull, 1)).as("n_null_marker"),
        dsum2(col("o_totalprice")).as("amt"))
      .orderBy(asc_nulls_first("st")),
    Some("""SELECT st, COUNT(*) AS n,
                   COUNT(CASE WHEN st IS NULL THEN 1 END) AS n_null_marker,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS amt
            FROM (SELECT CASE WHEN o_orderstatus='O' THEN NULL
                              ELSE o_orderstatus END AS st, o_totalprice
                  FROM orders) x
            GROUP BY st ORDER BY st NULLS FIRST"""))

  /** P10/J5: EXISTS → left-semi join. */
  val q_semi_join = QuerySpec(
    "q_semi_join", Seq("P10", "J5"),
    (s, d) => {
      val c = t(s, d, "customer")
      val o = t(s, d, "orders").filter(col("o_totalprice") > 200000)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select("c_custkey", "c_name").orderBy("c_custkey")
    },
    Some("""SELECT c_custkey, c_name FROM customer
            WHERE EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey=c_custkey AND o_totalprice>200000)
            ORDER BY c_custkey"""))

  /** J6: NOT EXISTS → left-anti join. */
  val q_anti_join = QuerySpec(
    "q_anti_join", Seq("J6"),
    (s, d) => {
      val c = t(s, d, "customer")
      val o = t(s, d, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select("c_custkey", "c_name").orderBy("c_custkey")
    },
    Some("""SELECT c_custkey, c_name FROM customer
            WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey=c_custkey)
            ORDER BY c_custkey"""))

  // ---------------------------------------------------------------- joins

  /** J1/J2/A1/A6: 3-table shuffle join + group-by (TPC-H Q3 shape).
    * orders/customer are small relative to lineitem → Catalyst broadcasts
    * them; at 100 TB the same plan degrades gracefully to sort-merge. */
  val q_join3_agg = QuerySpec(
    "q_join3_agg", Seq("J1", "J2", "A1", "A6"),
    (s, d) => {
      val li = t(s, d, "lineitem")
      val o = t(s, d, "orders")
      val c = t(s, d, "customer")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(
          dsum4(col("l_extendedprice") * (lit(1) - col("l_discount")))
            .as("revenue"),
          count(lit(1)).as("n"))
        .orderBy("c_mktsegment")
    },
    Some("""SELECT c_mktsegment,
                   CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
                   COUNT(*) AS n
            FROM lineitem JOIN orders ON l_orderkey=o_orderkey
                 JOIN customer ON o_custkey=c_custkey
            GROUP BY c_mktsegment ORDER BY c_mktsegment"""))

  /** J4: explicit broadcast join of the small dim side
    * (reference docs/sql调优.md:188-199 map-join recipe). */
  val q_broadcast_join = QuerySpec(
    "q_broadcast_join", Seq("J4"),
    (s, d) => {
      val li = t(s, d, "lineitem")
      val p = t(s, d, "part")
      li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n"), dsum2(col("l_quantity")).as("qty"))
        .orderBy("p_brand")
    },
    Some("""SELECT p_brand, COUNT(*) AS n,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
            FROM lineitem JOIN part ON l_partkey=p_partkey
            GROUP BY p_brand ORDER BY p_brand"""))

  /** J3: left outer join enrichment + null-aware counting. */
  val q_left_join = QuerySpec(
    "q_left_join", Seq("J3"),
    (s, d) => {
      val c = t(s, d, "customer")
      val o = t(s, d, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left")
        .groupBy("c_nationkey")
        .agg(count(col("o_orderkey")).as("n_orders"),
          count(lit(1)).as("n_rows"))
        .orderBy("c_nationkey")
    },
    Some("""SELECT c_nationkey, COUNT(o_orderkey) AS n_orders,
                   COUNT(*) AS n_rows
            FROM customer LEFT JOIN orders ON c_custkey=o_custkey
            GROUP BY c_nationkey ORDER BY c_nationkey"""))

  /** J12: theta join via cross + where (comma-list FROM idiom). */
  val q_theta_join = QuerySpec(
    "q_theta_join", Seq("J12"),
    (s, d) => {
      val r = t(s, d, "region")
      val n = t(s, d, "nation")
      r.crossJoin(n).filter(col("r_regionkey") =!= col("n_regionkey"))
        .select("r_name", "n_name").orderBy("r_name", "n_name")
    },
    Some("""SELECT r_name, n_name FROM region, nation
            WHERE r_regionkey <> n_regionkey
            ORDER BY r_name, n_name"""))

  /** J7: null-salted left join — result-equivalent to plain left join. */
  val q_salted_null_join = QuerySpec(
    "q_salted_null_join", Seq("J7"),
    (s, d) => {
      val e = t(s, d, "events")
        .select(col("event_type"), nullif(col("user_id"), lit(0)).as("uid"))
      val c = t(s, d, "customer").select(col("c_custkey"), col("c_name"))
      Relational.nullSaltedLeftJoin(e, c, col("uid"), col("c_custkey"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_rows"), count(col("c_name")).as("n_matched"))
        .orderBy("event_type")
    },
    Some("""SELECT event_type, COUNT(*) AS n_rows,
                   COUNT(c_name) AS n_matched
            FROM (SELECT event_type, NULLIF(user_id,0) AS uid FROM events) e
            LEFT JOIN customer ON uid=c_custkey
            GROUP BY event_type ORDER BY event_type"""))

  /** J8: type-normalized join (cast key before hashing,
    * reference docs/sql调优.md:53-57). */
  val q_cast_join = QuerySpec(
    "q_cast_join", Seq("J8", "F4"),
    (s, d) => {
      val n = t(s, d, "nation")
        .select(col("n_nationkey").cast("string").as("nk_str"), col("n_name"))
      val c = t(s, d, "customer")
      c.join(n, c("c_nationkey").cast("long") === n("nk_str").cast("long"))
        .groupBy("n_name").agg(count(lit(1)).as("n"))
        .orderBy("n_name")
    },
    Some("""SELECT n_name, COUNT(*) AS n
            FROM customer JOIN
                 (SELECT CAST(n_nationkey AS VARCHAR) AS nk_str, n_name
                  FROM nation) x
            ON CAST(c_nationkey AS BIGINT) = CAST(nk_str AS BIGINT)
            GROUP BY n_name ORDER BY n_name"""))

  /** J9: one-column-to-two-columns union-fused join
    * (reference docs/sql调优.md:59-71). */
  val q_union_fused_join = QuerySpec(
    "q_union_fused_join", Seq("J9", "U1"),
    (s, d) => {
      val li = t(s, d, "lineitem")
      val p = t(s, d, "part").select("p_partkey", "p_brand")
      Relational.unionFusedJoin(li, "l_partkey", "l_suppkey", p, "p_partkey")
        .groupBy("p_brand").agg(count(lit(1)).as("n"))
        .orderBy("p_brand")
    },
    Some("""SELECT p_brand, COUNT(*) AS n
            FROM (SELECT l_partkey AS k FROM lineitem
                  UNION ALL SELECT l_suppkey FROM lineitem) j
            JOIN part ON k=p_partkey
            GROUP BY p_brand ORDER BY p_brand"""))

  /** J10: manual skew-split join, result-equivalent to plain join. */
  val q_skew_split_join = QuerySpec(
    "q_skew_split_join", Seq("J10", "J11"),
    (s, d) => {
      val li = t(s, d, "lineitem").select("l_partkey", "l_quantity")
      val p = t(s, d, "part").select("p_partkey", "p_brand")
      Relational.skewSplitJoin(li, "l_partkey", p, "p_partkey",
          hotThreshold = 20, saltBuckets = 4)
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n"), dsum2(col("l_quantity")).as("qty"))
        .orderBy("p_brand")
    },
    Some("""SELECT p_brand, COUNT(*) AS n,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
            FROM lineitem JOIN part ON l_partkey=p_partkey
            GROUP BY p_brand ORDER BY p_brand"""))

  // ----------------------------------------------------------- aggregates

  /** A1/A2/A6/A7/O1: TPC-H Q1 pricing summary — partial+final hash agg. */
  val q_pricing_summary = QuerySpec(
    "q_pricing_summary", Seq("A1", "A2", "A6", "A7"),
    (s, d) => t(s, d, "lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        dsum2(col("l_quantity")).as("sum_qty"),
        dsum2(col("l_extendedprice")).as("sum_base_price"),
        dsum4(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("sum_disc_price"),
        davg2(col("l_quantity")).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus"),
    Some("""SELECT l_returnflag, l_linestatus,
              CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
              CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
              CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
              CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)/COUNT(l_quantity) AS avg_qty,
              COUNT(*) AS count_order
            FROM lineitem GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus"""))

  /** A3: exact count(distinct) per group. */
  val q_count_distinct = QuerySpec(
    "q_count_distinct", Seq("A3"),
    (s, d) => t(s, d, "events")
      .groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("uu"), count(lit(1)).as("cnt"))
      .orderBy("event_type"),
    Some("""SELECT event_type, COUNT(DISTINCT user_id) AS uu,
                   COUNT(*) AS cnt
            FROM events GROUP BY event_type ORDER BY event_type"""))

  /** A4/A5/P9/F9: the reference's signature conditional-aggregate rollup
    * (reference docs/HiveSQL.md:6-22) — one pass, many metrics. */
  val q_conditional_rollup = QuerySpec(
    "q_conditional_rollup", Seq("A4", "A5", "P9", "F9"),
    (s, d) => t(s, d, "events")
      .groupBy(col("ts").cast("date").as("dt"))
      .agg(
        countDistinct(col("user_id")).as("dau"),
        countDistinct(when(col("event_type") === "purchase", col("user_id")))
          .as("purchase_uu"),
        count(when(col("event_type") === "view", 1)).as("views"),
        dsum2(when(col("event_type") === "purchase", col("value"))
          .otherwise(lit(0.0))).as("purchase_amt"),
        sum(when(col("event_type") === "click", 1).otherwise(0))
          .cast("long").as("clicks"))
      .orderBy("dt"),
    Some("""SELECT CAST(ts AS DATE) AS dt,
              COUNT(DISTINCT user_id) AS dau,
              COUNT(DISTINCT CASE WHEN event_type='purchase' THEN user_id END) AS purchase_uu,
              COUNT(CASE WHEN event_type='view' THEN 1 END) AS views,
              CAST(SUM(CASE WHEN event_type='purchase' THEN CAST(value AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS purchase_amt,
              CAST(SUM(CASE WHEN event_type='click' THEN 1 ELSE 0 END) AS BIGINT) AS clicks
            FROM events GROUP BY 1 ORDER BY 1"""))

  /** A8: HAVING — post-aggregation filter. */
  val q_having = QuerySpec(
    "q_having", Seq("A8"),
    (s, d) => t(s, d, "events")
      .groupBy("user_id").agg(count(lit(1)).as("n"))
      .filter(col("n") > 20)
      .orderBy("user_id"),
    Some("""SELECT user_id, COUNT(*) AS n FROM events
            GROUP BY user_id HAVING COUNT(*) > 20 ORDER BY user_id"""))

  /** A9: two-phase salted aggregation, equivalent to plain group-by. */
  val q_salted_agg = QuerySpec(
    "q_salted_agg", Seq("A9"),
    (s, d) => Relational.saltedSumAgg(
        t(s, d, "lineitem"), Seq("l_returnflag"), dec2(col("l_quantity")))
      .select(col("l_returnflag"), col("agg_val").cast("double").as("qty"))
      .orderBy("l_returnflag"),
    Some("""SELECT l_returnflag,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** A10: ROLLUP cube materialization (MOLAP semantics). */
  val q_rollup = QuerySpec(
    "q_rollup", Seq("A10"),
    (s, d) => {
      // SQL text (not DSL): the DSL rollup-after-join duplicates the
      // grouping attributes in Expand and false-positives the
      // ambiguous-self-join guard; going through the parser takes the
      // identical Expand+Aggregate physical path while the guard stays
      // ENABLED engine-wide (it catches real bugs)
      Engine.registerAll(s, d)
      s.sql("""SELECT r_name AS rname, n_name AS nname,
                      COUNT(*) AS n_cust,
                      CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS bal
               FROM customer JOIN nation ON c_nationkey = n_nationkey
                    JOIN region ON n_regionkey = r_regionkey
               GROUP BY ROLLUP(r_name, n_name)
               ORDER BY rname NULLS FIRST, nname NULLS FIRST""")
    },
    Some("""SELECT r_name AS rname, n_name AS nname, COUNT(*) AS n_cust,
                   CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS bal
            FROM customer JOIN nation ON c_nationkey=n_nationkey
                 JOIN region ON n_regionkey=r_regionkey
            GROUP BY ROLLUP(r_name, n_name)
            ORDER BY r_name NULLS FIRST, n_name NULLS FIRST"""))

  /** A10b: GROUPING SETS (cube slice). */
  val q_grouping_sets = QuerySpec(
    "q_grouping_sets", Seq("A10"),
    (s, d) => {
      Engine.registerAll(s, d)
      s.sql("""SELECT l_returnflag, l_linestatus, COUNT(*) AS n
               FROM lineitem
               GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
               ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""")
    },
    Some("""SELECT l_returnflag, l_linestatus, COUNT(*) AS n
            FROM lineitem
            GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
            ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST"""))

  /** A12/O5: top-k by aggregate (TakeOrderedAndProject, no global sort). */
  val q_topk = QuerySpec(
    "q_topk", Seq("A12", "O5", "O4"),
    (s, d) => t(s, d, "events")
      .filter(col("event_type") === "purchase")
      .groupBy("user_id")
      .agg(dsum2(col("value")).as("amt"))
      .orderBy(desc("amt"), asc("user_id"))
      .limit(10),
    Some("""SELECT user_id,
                   CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS amt
            FROM events WHERE event_type='purchase'
            GROUP BY user_id ORDER BY amt DESC, user_id LIMIT 10"""))

  // -------------------------------------------------------------- windows

  /** W1/W2: first_value / last_value with pinned frames (the reference's
    * last_value default-frame trap, docs/HiveSQL.md:102 vs :117-118). */
  val q_window_first_last = QuerySpec(
    "q_window_first_last", Seq("W1", "W2"),
    (s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val wFull = w.rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing)
      t(s, d, "events")
        .select(col("event_id"), col("user_id"),
          first(col("event_type")).over(w).as("first_et"),
          last(col("event_type")).over(wFull).as("last_et"))
        .orderBy("event_id")
    },
    Some("""SELECT event_id, user_id,
              first_value(event_type) OVER w AS first_et,
              last_value(event_type) OVER
                (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_et
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ORDER BY event_id"""))

  /** W3/W4: unordered-frame count/sum over a partition. */
  val q_window_count_sum = QuerySpec(
    "q_window_count_sum", Seq("W3", "W4"),
    (s, d) => {
      val w = Window.partitionBy(col("user_id"), col("ts").cast("date"))
      t(s, d, "events")
        .select(col("event_id"),
          count(lit(1)).over(w).as("n_day"),
          sum(dec2(col("value"))).over(w).cast("double").as("v_day"))
        .orderBy("event_id")
    },
    Some("""SELECT event_id,
              COUNT(*) OVER w AS n_day,
              CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS v_day
            FROM events
            WINDOW w AS (PARTITION BY user_id, CAST(ts AS DATE))
            ORDER BY event_id"""))

  /** W6: ranking + analytic functions (row_number, rank, lag). */
  val q_window_rank = QuerySpec(
    "q_window_rank", Seq("W6"),
    (s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      t(s, d, "events")
        .select(col("event_id"), col("user_id"),
          row_number().over(w).cast("long").as("rn"),
          lag(col("event_type"), 1).over(w).as("prev_et"))
        .orderBy("event_id")
    },
    Some("""SELECT event_id, user_id,
              row_number() OVER w AS rn,
              lag(event_type, 1) OVER w AS prev_et
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ORDER BY event_id"""))

  /** W5: window-as-join decomposition (reference docs/HiveSQL.md:111-157)
    * — group-bys + join reassembly, result-identical to q_window_count_sum
    * built from windows. */
  val q_window_decomposed = QuerySpec(
    "q_window_decomposed", Seq("W5"),
    (s, d) => {
      val e = t(s, d, "events").withColumn("dt", col("ts").cast("date"))
      val day = e.groupBy("user_id", "dt")
        .agg(count(lit(1)).as("n_day"),
          sum(dec2(col("value"))).cast("double").as("v_day"))
      e.select("event_id", "user_id", "dt")
        .join(day, Seq("user_id", "dt"))
        .select("event_id", "n_day", "v_day")
        .orderBy("event_id")
    },
    Some("""SELECT event_id,
              COUNT(*) OVER w AS n_day,
              CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS v_day
            FROM events
            WINDOW w AS (PARTITION BY user_id, CAST(ts AS DATE))
            ORDER BY event_id"""))

  // ------------------------------------------------------------- set ops

  /** U1/U2: UNION ALL vs UNION DISTINCT. */
  val q_union = QuerySpec(
    "q_union", Seq("U1", "U2"),
    (s, d) => {
      val c = t(s, d, "customer").select(col("c_nationkey").as("nk"))
      val sup = t(s, d, "supplier").select(col("s_nationkey").as("nk"))
      val all = c.union(sup).groupBy("nk").agg(count(lit(1)).as("n_all"))
      val dis = c.union(sup).distinct()
        .groupBy("nk").agg(count(lit(1)).as("n_dis"))
      all.join(dis, Seq("nk")).orderBy("nk")
    },
    Some("""WITH u AS (SELECT c_nationkey AS nk FROM customer
                       UNION ALL SELECT s_nationkey FROM supplier),
                 ud AS (SELECT c_nationkey AS nk FROM customer
                        UNION SELECT s_nationkey FROM supplier)
            SELECT a.nk, a.n_all, b.n_dis
            FROM (SELECT nk, COUNT(*) AS n_all FROM u GROUP BY nk) a
            JOIN (SELECT nk, COUNT(*) AS n_dis FROM ud GROUP BY nk) b
              ON a.nk=b.nk
            ORDER BY a.nk"""))

  /** U3: INTERSECT / EXCEPT. */
  val q_intersect_except = QuerySpec(
    "q_intersect_except", Seq("U3"),
    (s, d) => {
      val c = t(s, d, "customer").select(col("c_nationkey").as("nk"))
      val sup = t(s, d, "supplier").select(col("s_nationkey").as("nk"))
      c.intersect(sup).withColumn("op", lit("intersect"))
        .unionByName(c.except(sup).withColumn("op", lit("except")))
        .orderBy("op", "nk")
    },
    Some("""SELECT nk, 'intersect' AS op FROM
              (SELECT c_nationkey AS nk FROM customer
               INTERSECT SELECT s_nationkey FROM supplier)
            UNION ALL
            SELECT nk, 'except' AS op FROM
              (SELECT c_nationkey AS nk FROM customer
               EXCEPT SELECT s_nationkey FROM supplier)
            ORDER BY op, nk"""))

  /** U4: DISTINCT projection. */
  val q_distinct = QuerySpec(
    "q_distinct", Seq("U4"),
    (s, d) => t(s, d, "events")
      .select("user_id", "event_type").distinct()
      .orderBy("user_id", "event_type"),
    Some("""SELECT DISTINCT user_id, event_type FROM events
            ORDER BY user_id, event_type"""))

  /** U5: dedup-keep-first via row_number (min-ROWID idiom). */
  val q_dedup_keep_first = QuerySpec(
    "q_dedup_keep_first", Seq("U5"),
    (s, d) => Relational.dedupKeepFirst(
        t(s, d, "events"), Seq("user_id", "event_type"),
        Seq(col("ts"), col("event_id")))
      .select("user_id", "event_type", "event_id")
      .orderBy("user_id", "event_type"),
    Some("""SELECT user_id, event_type, event_id FROM
              (SELECT user_id, event_type, event_id,
                      row_number() OVER (PARTITION BY user_id, event_type
                                         ORDER BY ts, event_id) AS rn
               FROM events) x
            WHERE rn=1 ORDER BY user_id, event_type"""))

  // ------------------------------------------------------ scalar functions

  /** F1-F8: scalar function surface (lower/concat/mod/arith/decode). */
  val q_scalar_funcs = QuerySpec(
    "q_scalar_funcs", Seq("F1", "F2", "F4", "F5", "F6", "F7", "F8"),
    (s, d) => t(s, d, "part")
      .select(
        col("p_partkey"),
        lower(col("p_type")).as("lt"),
        concat(col("p_brand"), lit("_"), col("p_name")).as("bn"),
        pmod(col("p_partkey"), lit(7)).as("m7"),
        dec4(col("p_retailprice") * 1.1).cast("double").as("px"),
        when(col("p_size") < 10, "S").when(col("p_size") < 30, "M")
          .otherwise("L").as("sz"))
      .orderBy("p_partkey"),
    Some("""SELECT p_partkey, lower(p_type) AS lt,
                   concat(p_brand, '_', p_name) AS bn,
                   mod(p_partkey, 7) AS m7,
                   CAST(CAST(p_retailprice*1.1 AS DECIMAL(18,4)) AS DOUBLE) AS px,
                   CASE WHEN p_size < 10 THEN 'S'
                        WHEN p_size < 30 THEN 'M' ELSE 'L' END AS sz
            FROM part ORDER BY p_partkey"""))

  /** F9: date handling — day buckets, date_trunc month, date arithmetic. */
  val q_date_funcs = QuerySpec(
    "q_date_funcs", Seq("F9"),
    (s, d) => t(s, d, "orders")
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("ym"))
      .agg(count(lit(1)).as("n"), dsum2(col("o_totalprice")).as("amt"))
      .orderBy("ym"),
    Some("""SELECT strftime(o_orderdate, '%Y-%m') AS ym, COUNT(*) AS n,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS amt
            FROM orders GROUP BY 1 ORDER BY ym"""))

  /** F11: JSON extraction from the semi-structured props column. */
  val q_json = QuerySpec(
    "q_json", Seq("F11"),
    (s, d) => t(s, d, "events")
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
      .groupBy("k").agg(count(lit(1)).as("n"))
      .orderBy("k"),
    Some("""SELECT CAST(json_extract_string(props, '$.k') AS INT) AS k,
                   COUNT(*) AS n
            FROM events GROUP BY 1 ORDER BY k"""))

  /** F12: UTF-8 (non-ASCII) LIKE — the reference filters on Chinese
    * substrings (docs/explain.md:17); prove multibyte-safe matching. */
  val q_utf8_like = QuerySpec(
    "q_utf8_like", Seq("F12"),
    (s, d) => t(s, d, "part")
      .select(col("p_partkey"),
        concat(lit("品牌_"), col("p_brand")).as("zh_brand"))
      .filter(col("zh_brand").like("%品牌%") &&
        substring(col("zh_brand"), 1, 2) === "品牌")
      .groupBy("zh_brand").agg(count(lit(1)).as("n"))
      .orderBy("zh_brand"),
    Some("""SELECT zh_brand, COUNT(*) AS n FROM
              (SELECT p_partkey, concat('品牌_', p_brand) AS zh_brand
               FROM part) x
            WHERE zh_brand LIKE '%品牌%' AND substr(zh_brand, 1, 2) = '品牌'
            GROUP BY zh_brand ORDER BY zh_brand"""))

  // -------------------------------------------------------------- profile

  /** A13: statistical profile tags over trailing day windows. */
  val q_profile_stats = QuerySpec(
    "q_profile_stats", Seq("A13"),
    (s, d) => {
      val e = t(s, d, "events").withColumn("dt", col("ts").cast("date"))
      val maxDt = e.agg(max(col("dt")).as("max_dt"))
      e.crossJoin(broadcast(maxDt))
        .filter(col("dt") >= date_sub(col("max_dt"), 6))
        .groupBy("user_id")
        .agg(count(lit(1)).as("events_7d"),
          count(when(col("event_type") === "purchase", 1)).as("purchases_7d"),
          dsum2(when(col("event_type") === "purchase", col("value"))
            .otherwise(lit(0.0))).as("amt_7d"))
        .orderBy("user_id")
    },
    Some("""SELECT user_id, COUNT(*) AS events_7d,
              COUNT(CASE WHEN event_type='purchase' THEN 1 END) AS purchases_7d,
              CAST(SUM(CASE WHEN event_type='purchase' THEN CAST(value AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS amt_7d
            FROM events
            WHERE CAST(ts AS DATE) >=
              (SELECT MAX(CAST(ts AS DATE)) - 6 FROM events)
            GROUP BY user_id ORDER BY user_id"""))

  /** A14: rule tags — boolean predicates over aggregates (大R rule,
    * reference docs/画像简介.md:18). */
  val q_profile_rule_tags = QuerySpec(
    "q_profile_rule_tags", Seq("A14"),
    (s, d) => t(s, d, "events")
      .groupBy("user_id")
      .agg(count(when(col("event_type") === "purchase", 1)).as("n_buy"),
        dsum2(when(col("event_type") === "purchase", col("value"))
          .otherwise(lit(0.0))).as("amt"))
      .withColumn("is_big_spender",
        col("n_buy") > 10 && col("amt") > lit(1000.0))
      .orderBy("user_id"),
    Some("""SELECT user_id, n_buy, amt,
                   (n_buy > 10 AND amt > 1000.0) AS is_big_spender
            FROM (SELECT user_id,
                    COUNT(CASE WHEN event_type='purchase' THEN 1 END) AS n_buy,
                    CAST(SUM(CASE WHEN event_type='purchase' THEN CAST(value AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS amt
                  FROM events GROUP BY user_id) x
            ORDER BY user_id"""))

  /** Wide tag table via pivot (narrow→wide,
    * reference docs/画像开发方案.md:28). */
  val q_profile_pivot = QuerySpec(
    "q_profile_pivot", Seq("A13", "A14"),
    (s, d) => t(s, d, "events")
      .groupBy("user_id")
      .pivot("event_type",
        Seq("click", "view", "purchase", "signup", "error"))
      .agg(count(lit(1)))
      .na.fill(0)
      .orderBy("user_id"),
    Some("""SELECT user_id,
              COUNT(CASE WHEN event_type='click' THEN 1 END) AS click,
              COUNT(CASE WHEN event_type='view' THEN 1 END) AS view,
              COUNT(CASE WHEN event_type='purchase' THEN 1 END) AS purchase,
              COUNT(CASE WHEN event_type='signup' THEN 1 END) AS signup,
              COUNT(CASE WHEN event_type='error' THEN 1 END) AS error
            FROM events GROUP BY user_id ORDER BY user_id"""))

  // ------------------------------------------------------------ sampling

  /** P12: sampling diagnostics — deterministic variant via hash-mod so
    * the oracle can reproduce it (rand-based sample is seed-dependent). */
  val q_sample_hot_keys = QuerySpec(
    "q_sample_hot_keys", Seq("P12"),
    (s, d) => t(s, d, "events")
      .filter(pmod(col("event_id"), lit(10)) === 0)
      .groupBy("user_id").agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("user_id")).limit(5),
    Some("""SELECT user_id, COUNT(*) AS n FROM events
            WHERE mod(event_id, 10) = 0
            GROUP BY user_id ORDER BY n DESC, user_id LIMIT 5"""))

  // ----------------------------------------------------------- inventory

  val relational: Seq[QuerySpec] = Seq(
    q_scan_project, q_filter_range, q_like_in, q_case_null, q_semi_join,
    q_anti_join, q_join3_agg, q_broadcast_join, q_left_join, q_theta_join,
    q_salted_null_join, q_cast_join, q_union_fused_join, q_skew_split_join,
    q_pricing_summary, q_count_distinct, q_conditional_rollup, q_having,
    q_salted_agg, q_rollup, q_grouping_sets, q_topk,
    q_window_first_last, q_window_count_sum, q_window_rank,
    q_window_decomposed, q_union, q_intersect_except, q_distinct,
    q_dedup_keep_first, q_scalar_funcs, q_date_funcs, q_json, q_utf8_like,
    q_profile_stats, q_profile_rule_tags, q_profile_pivot,
    q_sample_hot_keys)

  def all: Seq[QuerySpec] =
    relational ++ RefConformance.all ++ ExtQueries.all ++
      TpchQueries.all ++ TpcdsQueries.all ++ TextQueries.all ++
      PipelineQueries.all ++
      CurationQueries.all ++ ModelQueries.all ++ BehaviorQueries.all ++
      GraphQueries.all ++ CubeQueries.all

  def byName: Map[String, QuerySpec] = all.map(q => q.name -> q).toMap
}
