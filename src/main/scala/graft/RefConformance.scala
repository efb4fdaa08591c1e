package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's verbatim HiveQL worked examples, run through
  * `spark.sql` on reference-faithful fixtures (SURVEY.md §0: "each
  * reference query runs verbatim (or with trivial dialect normalization)
  * through our SparkSession").
  *
  * Fixtures (FIXTURES.md §1) are derived deterministically from the
  * driver's `events` testdata so the DuckDB oracle can rebuild them from
  * the same parquet with identical expressions:
  *
  *  - `dwb.fact_log_detail` — the signature-rollup input (reference
  *    docs/HiveSQL.md:42-55): ALL columns string-typed, including the
  *    summed measures `duration`/`play_cnts`, pinning Hive's lax
  *    string→number coercion (docs/HiveSQL.md:14,16; ansi=false).
  *  - `dwb.fact_log_detail_tmp` — case-1 restaging: a real
  *    `CREATE EXTERNAL TABLE … PARTITIONED BY (dt,source,strategy,
  *    group_id)` (docs/HiveSQL.md:42-55) filled by a verbatim dynamic
  *    partition INSERT (docs/HiveSQL.md:60-63).
  *  - `dwb.fact_event_info` — the case-2 window-query input
  *    (docs/HiveSQL.md:100-107), a dt-PARTITIONED table so the query's
  *    `dt >= … and dt <= …` range is answered by real partition
  *    pruning (docs/HiveSQL.md:25-27,107).
  *
  * Dialect normalizations applied to the verbatim texts, each trivial:
  * `USING parquet` + `LOCATION` on the external-table DDL (Spark's
  * non-Hive-metastore syntax), and a deterministic trailing ORDER BY so
  * the driver's hash compare is order-stable.
  */
object RefConformance {

  // ---------------------------------------------------------- fixtures

  private val built = scala.collection.mutable.Set[(Int, String)]()

  /** 8-event vocabulary of the rollup input (docs/HiveSQL.md:7-20). */
  private val logEvents = Seq("client_show", "video_play",
    "effective_play", "video_over", "push_video_clk", "app_start",
    "post_comment", "corner_mark_show")

  /** 9-event IN-list of the window query (docs/HiveSQL.md:106) plus one
    * value the IN-list must filter out. */
  private val infoEvents = Seq("app_start", "app_exit", "effective_play",
    "share_succ", "like", "unlike", "like_comment", "unlike_comment",
    "comment_success", "corner_mark_show")

  private val sources = Seq("ios", "android", "web")
  private val bodySources = Seq("push", "feed", "search")

  private def pick(values: Seq[String], idx: Column): Column =
    element_at(array(values.map(lit): _*), idx.cast("int") + 1)

  private def tmpLoc(sfDir: String, name: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_ref_${name}_" +
      sfDir.replaceAll("[^A-Za-z0-9]", "_")

  private def dropManaged(spark: SparkSession, table: String): Unit =
    operators.Warehouse.dropManaged(spark, table)

  /** Build the dwb fixtures once per (session, sfDir). */
  def ensure(spark: SparkSession, sfDir: String): Unit = synchronized {
    val key = (System.identityHashCode(spark), sfDir)
    if (built(key)) return
    Engine.configure(spark)
    spark.sql("CREATE DATABASE IF NOT EXISTS dwb")
    val e = Engine.table(spark, sfDir, "events")

    val fld = e.select(
      pick(logEvents, pmod(col("event_id"), lit(8))).as("event"),
      concat(lit("u"), col("user_id").cast("string")).as("udid"),
      concat(lit("v"), pmod(col("event_id"), lit(50)).cast("string"))
        .as("vid"),
      floor(col("value") * 10).cast("string").as("duration"),
      pick(bodySources, pmod(col("event_id"), lit(3))).as("body_source"),
      pmod(col("event_id"), lit(7)).cast("string").as("play_cnts"),
      col("ts").cast("date").cast("string").as("dt"),
      pick(sources, pmod(col("user_id"), lit(3))).as("source"),
      concat(lit("s"), pmod(col("user_id"), lit(2)).cast("string"))
        .as("strategy"),
      concat(lit("g"), pmod(col("event_id"), lit(2)).cast("string"))
        .as("group_id"))
    dropManaged(spark, "dwb.fact_log_detail")
    fld.write.mode("overwrite").saveAsTable("dwb.fact_log_detail")

    // case-1 restaging (docs/HiveSQL.md:42-63): external partitioned
    // table + verbatim dynamic-partition INSERT
    val loc = tmpLoc(sfDir, "fld_tmp")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(loc))
    spark.sql("DROP TABLE IF EXISTS dwb.fact_log_detail_tmp")
    spark.sql(s"""
      CREATE EXTERNAL TABLE `dwb`.`fact_log_detail_tmp`(
        event string,
        udid string,
        vid string,
        duration string,
        body_source string,
        play_cnts string,
        dt string,
        source string,
        strategy string,
        group_id string)
      USING parquet
      PARTITIONED BY (dt, source, strategy, group_id)
      LOCATION '$loc'""")
    spark.sql("""
      insert into `dwb`.`fact_log_detail_tmp` partition(dt,source,strategy,group_id)
      select event,udid,vid,duration,body_source,play_cnts,dt,source,strategy,group_id
      from `dwb`.`fact_log_detail`""")

    val fei = e.select(
      col("event_id").cast("string").as("aid"),
      concat(lit("i"), col("user_id").cast("string")).as("imei"),
      concat(lit("f"), pmod(col("event_id"), lit(100)).cast("string"))
        .as("idfa"),
      concat(lit("u"), col("user_id").cast("string")).as("udid"),
      pick(infoEvents, pmod(col("event_id"), lit(10))).as("event"),
      floor(col("value") * 10).as("duration"),
      date_trunc("second", col("ts")).as("time_local"),
      hour(col("ts")).as("hour"),
      pick(sources, pmod(col("user_id"), lit(3))).as("source"),
      date_add(lit("2019-03-01").cast("date"),
        pmod(col("event_id"), lit(5)).cast("int")).cast("string").as("dt"))
    dropManaged(spark, "dwb.fact_event_info")
    fei.write.mode("overwrite").partitionBy("dt")
      .saveAsTable("dwb.fact_event_info")
    built += key
  }

  /** DuckDB mirror of the `fact_log_detail` fixture (same expressions
    * over the same events parquet). */
  private val duckFld = """
    SELECT (['client_show','video_play','effective_play','video_over',
             'push_video_clk','app_start','post_comment','corner_mark_show'])
             [CAST(mod(event_id, 8) AS INT) + 1] AS event,
           'u' || CAST(user_id AS VARCHAR) AS udid,
           'v' || CAST(mod(event_id, 50) AS VARCHAR) AS vid,
           CAST(CAST(floor(value * 10) AS BIGINT) AS VARCHAR) AS duration,
           (['push','feed','search'])[CAST(mod(event_id, 3) AS INT) + 1]
             AS body_source,
           CAST(mod(event_id, 7) AS VARCHAR) AS play_cnts,
           CAST(CAST(ts AS DATE) AS VARCHAR) AS dt,
           (['ios','android','web'])[CAST(mod(user_id, 3) AS INT) + 1]
             AS source,
           's' || CAST(mod(user_id, 2) AS VARCHAR) AS strategy,
           'g' || CAST(mod(event_id, 2) AS VARCHAR) AS group_id
    FROM events"""

  /** DuckDB mirror of the `fact_event_info` fixture. */
  private val duckFei = """
    SELECT CAST(event_id AS VARCHAR) AS aid,
           'i' || CAST(user_id AS VARCHAR) AS imei,
           'f' || CAST(mod(event_id, 100) AS VARCHAR) AS idfa,
           'u' || CAST(user_id AS VARCHAR) AS udid,
           (['app_start','app_exit','effective_play','share_succ','like',
             'unlike','like_comment','unlike_comment','comment_success',
             'corner_mark_show'])[CAST(mod(event_id, 10) AS INT) + 1]
             AS event,
           CAST(floor(value * 10) AS BIGINT) AS duration,
           date_trunc('second', CAST(ts AS TIMESTAMP)) AS time_local,
           CAST(hour(CAST(ts AS TIMESTAMP)) AS INT) AS hour,
           (['ios','android','web'])[CAST(mod(user_id, 3) AS INT) + 1]
             AS source,
           CAST(DATE '2019-03-01' + CAST(mod(event_id, 5) AS INT)
                AS VARCHAR) AS dt
    FROM events"""

  // ------------------------------------------- case 1: signature rollup

  /** The 14-metric rollup body (docs/HiveSQL.md:74-90), verbatim. The
    * string measures `duration`/`play_cnts` are summed AS STRINGS —
    * lax coercion (ansi=false) turns them into double sums, exactly
    * Hive's behavior the reference relies on. */
  private def rollupSql(table: String) = s"""
    SELECT dt as DATA_DATE,source,strategy,group_id,
        count(distinct case when lower(event) not like '%push%' and event!='corner_mark_show' then udid else null end) as DAU,
        count(case when event='client_show' then 1 else null end) as TOTAL_VSHOW,
        count(distinct case when event='client_show' then vid else null end) as TOTAL_VIDEO_VSHOW,
        count(case when event='video_play' then 1 else null end) as TOTAL_VV_VP,
        count(distinct case when event='video_play' then udid else null end) as TOTAL_USERS_VP,
        count(case when event='effective_play' then 1 else null end) as TOTAL_VV_EP,
        count(distinct case when event='effective_play' then udid else null end) as TOTAL_USERS_EP,
        sum(case when event='video_over' then duration else 0 end) as TOTAL_DURATION,
        count(case when event='video_over' then 1 else null end) as TOTAL_VOVER,
        sum(case when event='video_over' then play_cnts else 0 end) as TOTAL_VOVER_PCNTS,
        count(case when event='push_video_clk' then 1 else null end) as TOTAL_PUSH_VC,
        count(distinct case when event='app_start' and body_source = 'push' then udid else null end) as TOTAL_PUSH_START,
        count(case when event='post_comment' then 1 else null end) as TOTAL_REPLY,
        count(distinct case when event='post_comment' then udid else null end) as TOTAL_USERS_REPLY
        FROM $table
    group by dt,source,strategy,group_id
    order by DATA_DATE,source,strategy,group_id"""

  /** Same rollup for DuckDB: fixture CTE + explicit casts on the string
    * measures (DuckDB has no lax string sum — the cast IS the point of
    * the Spark-side test). */
  private def duckRollup(src: String) = s"""
    WITH fact_log_detail AS ($duckFld)
    SELECT dt as DATA_DATE,source,strategy,group_id,
        count(distinct case when lower(event) not like '%push%' and event!='corner_mark_show' then udid else null end) as DAU,
        count(case when event='client_show' then 1 else null end) as TOTAL_VSHOW,
        count(distinct case when event='client_show' then vid else null end) as TOTAL_VIDEO_VSHOW,
        count(case when event='video_play' then 1 else null end) as TOTAL_VV_VP,
        count(distinct case when event='video_play' then udid else null end) as TOTAL_USERS_VP,
        count(case when event='effective_play' then 1 else null end) as TOTAL_VV_EP,
        count(distinct case when event='effective_play' then udid else null end) as TOTAL_USERS_EP,
        sum(case when event='video_over' then CAST(duration AS DOUBLE) else 0 end) as TOTAL_DURATION,
        count(case when event='video_over' then 1 else null end) as TOTAL_VOVER,
        sum(case when event='video_over' then CAST(play_cnts AS DOUBLE) else 0 end) as TOTAL_VOVER_PCNTS,
        count(case when event='push_video_clk' then 1 else null end) as TOTAL_PUSH_VC,
        count(distinct case when event='app_start' and body_source = 'push' then udid else null end) as TOTAL_PUSH_START,
        count(case when event='post_comment' then 1 else null end) as TOTAL_REPLY,
        count(distinct case when event='post_comment' then udid else null end) as TOTAL_USERS_REPLY
        FROM $src
    group by dt,source,strategy,group_id
    order by DATA_DATE,source,strategy,group_id"""

  /** Case-1 final query (docs/HiveSQL.md:74-90) on the restaged
    * partitioned table — dynamic insert + external DDL run in `ensure`. */
  val q_ref_rollup_verbatim = QuerySpec(
    "q_ref_rollup_verbatim",
    Seq("S3", "S5", "A4", "A5", "P5", "P9", "F1"),
    (s, d) => { ensure(s, d); s.sql(rollupSql("dwb.fact_log_detail_tmp")) },
    Some(duckRollup("fact_log_detail")))

  /** Case-1 step 3 (docs/HiveSQL.md:65-70): row-count parity between the
    * original and restaged tables, as scalar subqueries. */
  val q_ref_count_parity = QuerySpec(
    "q_ref_count_parity", Seq("P11", "A2"),
    (s, d) => { ensure(s, d)
      s.sql("""select (select count(*) from dwb.fact_log_detail) as n_orig,
                      (select count(*) from dwb.fact_log_detail_tmp) as n_tmp""") },
    Some("""SELECT (SELECT COUNT(*) FROM events) AS n_orig,
                   (SELECT COUNT(*) FROM events) AS n_tmp"""))

  // ------------------------------------------- case 2: window query

  /** The case-2 window query (docs/HiveSQL.md:99-107), verbatim: four
    * window specs incl. the `last_value` default-frame trap, a 9-value
    * IN list, and a dt range the partitioned table answers with
    * partition pruning. */
  private val windowSql = """
    select aid, imei, idfa, udid, event, duration, dt, time_local, hour, source,
          first_value(time_local) over(partition by udid, event order by time_local) as first_time,
          last_value(time_local) over(partition by udid, event order by time_local) as last_time,
          count(time_local) over(partition by udid, event, dt) as event_count_per_day,
          sum(duration) over(partition by udid, event, dt) as event_duration_each_day
    from dwb.fact_event_info
    where event in ('app_start', 'app_exit', 'effective_play', 'share_succ', 'like', 'unlike', 'like_comment', 'unlike_comment', 'comment_success')
    and dt >= '2019-03-01' and dt <= '2019-03-03'
    order by aid"""

  val q_ref_window_verbatim = QuerySpec(
    "q_ref_window_verbatim", Seq("S2", "W1", "W2", "W3", "W4", "P6"),
    (s, d) => { ensure(s, d); s.sql(windowSql) },
    Some(s"""WITH fact_event_info AS ($duckFei)
      select aid, imei, idfa, udid, event, duration, dt, time_local, hour, source,
            first_value(time_local) over(partition by udid, event order by time_local) as first_time,
            last_value(time_local) over(partition by udid, event order by time_local) as last_time,
            count(time_local) over(partition by udid, event, dt) as event_count_per_day,
            CAST(sum(duration) over(partition by udid, event, dt) AS BIGINT) as event_duration_each_day
      from fact_event_info
      where event in ('app_start', 'app_exit', 'effective_play', 'share_succ', 'like', 'unlike', 'like_comment', 'unlike_comment', 'comment_success')
      and dt >= '2019-03-01' and dt <= '2019-03-03'
      order by aid"""))

  // -------------------------- case 2: decomposition (docs/HiveSQL.md:111-157)

  private val inList = """('app_start', 'app_exit', 'effective_play', 'share_succ', 'like', 'unlike', 'like_comment', 'unlike_comment', 'comment_success')"""

  private val decomposedBuilt = scala.collection.mutable.Set[(Int, String)]()

  /** The three partitioned CTAS subsets (docs/HiveSQL.md:114-143),
    * verbatim modulo `USING parquet` (Spark's datasource-CTAS syntax
    * puts PARTITIONED BY after USING). */
  private def ensureDecomposed(spark: SparkSession, sfDir: String): Unit =
    synchronized {
      val key = (System.identityHashCode(spark), sfDir)
      if (decomposedBuilt(key)) return
      ensure(spark, sfDir)
      spark.sql("CREATE DATABASE IF NOT EXISTS tmp")
      Seq("event_tmp1", "event_tmp2", "event_tmp3").foreach(t =>
        dropManaged(spark, s"tmp.$t"))
      spark.sql(s"""
        create table tmp.event_tmp1 using parquet partitioned by(event)
        as
        select udid,
               min(time_local) as first_time,
               max(time_local) as last_time,
               event
        from dwb.fact_event_info
        where event in $inList
        and dt >= '2019-03-01' and dt <= '2019-03-03'
        group by udid, event""")
      spark.sql(s"""
        create table tmp.event_tmp2 using parquet partitioned by(dt,event)
        as
        select udid,
               count(time_local) as event_count_per_day,
               sum(duration) as event_duration_each_day,
               dt,
               event
        from dwb.fact_event_info
        where event in $inList
        and dt >= '2019-03-01' and dt <= '2019-03-03'
        group by udid, dt, event""")
      spark.sql(s"""
        create table tmp.event_tmp3 using parquet partitioned by(dt,event)
        as select aid, imei, idfa, udid, duration, time_local, hour, source, dt, event
        from dwb.fact_event_info t3
        where event in $inList
        and dt >= '2019-03-01' and dt <= '2019-03-03'""")
      decomposedBuilt += key
    }

  /** Reassembly join (docs/HiveSQL.md:149-157). Note the reference's
    * decomposition intentionally replaces the window first/last_value
    * with partition-wide min/max — the W2 frame trap its own text calls
    * out — so this is a distinct result from q_ref_window_verbatim. */
  val q_ref_decomposed_verbatim = QuerySpec(
    "q_ref_decomposed_verbatim", Seq("S4", "W5", "J2", "A6"),
    (s, d) => { ensureDecomposed(s, d)
      s.sql("""
        select t3.aid, t3.imei, t3.idfa, t3.udid, t3.event, t3.duration, t3.dt, t3.time_local, t3.hour, t3.source,
            t1.first_time,
            t1.last_time,
            t2.event_count_per_day,
            t2.event_duration_each_day
        from tmp.event_tmp1 t1
        join tmp.event_tmp2 t2 on t1.event=t2.event and t1.udid=t2.udid
        join tmp.event_tmp3 t3 on t2.dt=t3.dt and t2.event= t3.event and t2.udid=t3.udid
        order by t3.aid""") },
    Some(s"""WITH fact_event_info AS ($duckFei),
      filt AS (SELECT * FROM fact_event_info
               WHERE event IN $inList
                 AND dt >= '2019-03-01' AND dt <= '2019-03-03'),
      t1 AS (SELECT udid, min(time_local) AS first_time,
                    max(time_local) AS last_time, event
             FROM filt GROUP BY udid, event),
      t2 AS (SELECT udid, count(time_local) AS event_count_per_day,
                    CAST(sum(duration) AS BIGINT) AS event_duration_each_day,
                    dt, event
             FROM filt GROUP BY udid, dt, event),
      t3 AS (SELECT aid, imei, idfa, udid, duration, time_local, hour,
                    source, dt, event FROM filt)
      select t3.aid, t3.imei, t3.idfa, t3.udid, t3.event, t3.duration, t3.dt, t3.time_local, t3.hour, t3.source,
          t1.first_time,
          t1.last_time,
          t2.event_count_per_day,
          t2.event_duration_each_day
      from t1
      join t2 on t1.event=t2.event and t1.udid=t2.udid
      join t3 on t2.dt=t3.dt and t2.event=t3.event and t2.udid=t3.udid
      order by t3.aid"""))

  // --------------- skew expansion join (docs/sql调优.md:215-224)

  /** The `num`-table expansion join, verbatim modulo a projected column
    * list (a bare `select *` emits duplicate `uid` columns, which the
    * driver's name-sorted hash compare cannot disambiguate) and the
    * trailing ORDER BY. The users side is inflated ×30 by the
    * condition-free join with `num`, and `mod(login_time,30)+1` routes
    * each log row to exactly one replica — the documented manual
    * skew-spread (J10/J11). */
  val q_ref_expansion_join = QuerySpec(
    "q_ref_expansion_join", Seq("J10", "J11", "F5", "J3"),
    (s, d) => {
      Engine.configure(s)
      val e = Engine.table(s, d, "events")
      // Engine.table yields `ts` as a TIMESTAMP (NTZ in current testdata
      // generations); a direct cast("long") fails analysis on NTZ, so
      // derive epoch seconds the timezone-safe way (session is UTC —
      // matches the oracle's epoch(CAST(ts AS TIMESTAMP))).
      e.select(col("user_id").as("uid"),
        unix_timestamp(col("ts").cast("timestamp")).as("login_time"),
        col("event_id"))
        .createOrReplaceTempView("log")
      Engine.table(s, d, "customer")
        .filter(col("c_custkey") < 100)
        .select(col("c_custkey").as("uid"))
        .createOrReplaceTempView("users")
      s.range(1, 31).toDF("number").createOrReplaceTempView("num")
      s.sql("""
        select a.uid, a.login_time, a.event_id, b.number from log a
        left join
        (
            select uid, number from users d
            join num e
        ) b
        on a.uid = b.uid
        and mod(a.login_time, 30)+1 = b.number
        order by a.event_id""")
    },
    Some("""WITH log AS (SELECT user_id AS uid,
                 CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS login_time,
                 event_id FROM events),
              users AS (SELECT c_custkey AS uid FROM customer
                        WHERE c_custkey < 100),
              num AS (SELECT CAST(range AS BIGINT) AS number
                      FROM range(1, 31))
        select a.uid, a.login_time, a.event_id, b.number from log a
        left join (select uid, number from users d, num e) b
        on a.uid = b.uid and mod(a.login_time, 30)+1 = b.number
        order by a.event_id"""))

  // ------------- union-fused one-column-to-two join (docs/sql调优.md:63-70)

  /** "一个字段关联两列值": both candidate key columns UNION ALL'd into
    * one keyed relation so the fact is read once and joined once —
    * verbatim modulo an explicit projection (bare `select *` emits two
    * `price_id` columns) and the trailing ORDER BY. */
  val q_ref_union_fused = QuerySpec(
    "q_ref_union_fused", Seq("J9", "U1"),
    (s, d) => {
      Engine.configure(s)
      // subsetted fixtures: the fused join fans out ~|part|/20 rows per
      // log row, so cap both sides to keep the result bounded at any SF
      Engine.table(s, d, "events")
        .filter(pmod(col("event_id"), lit(100)) === 0)
        .select(col("event_id"),
          concat(lit("p"), pmod(col("event_id"), lit(40)).cast("string"))
            .as("price_id"))
        .createOrReplaceTempView("log")
      Engine.table(s, d, "part")
        .filter(col("p_partkey") < 400)
        .select(
          concat(lit("p"), pmod(col("p_partkey"), lit(40)).cast("string"))
            .as("price_id"),
          concat(lit("p"), pmod(col("p_partkey") + 7, lit(40)).cast("string"))
            .as("money_id"))
        .createOrReplaceTempView("fact_produce_sale_detail")
      s.sql("""
        select a.event_id, a.price_id from log a
        inner join
        (
           select price_id as price_id from fact_produce_sale_detail
           union all
           select money_id as price_id from fact_produce_sale_detail
        ) b
        on a.price_id = b.price_id
        order by a.event_id, a.price_id""")
    },
    Some("""WITH log AS (SELECT event_id,
                 'p' || CAST(mod(event_id, 40) AS VARCHAR) AS price_id
               FROM events WHERE mod(event_id, 100) = 0),
              fact_produce_sale_detail AS (SELECT
                 'p' || CAST(mod(p_partkey, 40) AS VARCHAR) AS price_id,
                 'p' || CAST(mod(p_partkey + 7, 40) AS VARCHAR) AS money_id
               FROM part WHERE p_partkey < 400)
        select a.event_id, a.price_id from log a
        inner join
        (
           select price_id as price_id from fact_produce_sale_detail
           union all
           select money_id as price_id from fact_produce_sale_detail
        ) b
        on a.price_id = b.price_id
        order by a.event_id, a.price_id"""))

  val all: Seq[QuerySpec] = Seq(
    q_ref_rollup_verbatim, q_ref_count_parity, q_ref_window_verbatim,
    q_ref_decomposed_verbatim, q_ref_expansion_join, q_ref_union_fused)
}
