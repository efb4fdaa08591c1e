package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session factory + catalog bootstrap for the engine.
  *
  * Mirrors the reference's execution defaults (SURVEY.md §1.2/§4):
  *  - Hive-style lax coercions (`spark.sql.ansi.enabled=false`) — the
  *    reference sums string-typed measures (reference docs/HiveSQL.md:14).
  *  - AQE on: runtime coalesce, skew-join handling replace the manual
  *    skew recipes of reference docs/sql调优.md:173-250.
  *  - UTC session timezone for oracle parity.
  *  - shuffle partitions sized for the local[32] harness, NOT the 200
  *    default the reference itself calls "too small" for big jobs and
  *    which is far too big for local mode (reference docs/sql调优.md:161).
  */
object Engine {

  /** All driver-generated testdata tables (TESTDATA.md). */
  val tableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def session(
      master: String = s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]",
      shufflePartitions: Int = 32): SparkSession = {
    val spark = SparkSession.builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Apply engine-required confs to an externally created session (the
    * driver's Verify/Bench sessions) without rebuilding it. */
  def configure(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    // events.parquet carries TIMESTAMP(NANOS) which the vectorized reader
    // rejects; read as Long and convert in `table` below.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // rollup/cube after a join trips the ambiguous-self-join guard (the
    // Expand node duplicates grouping attributes); our self-joins all
    // rename columns first, so the guard only produces false positives.
    // (failAmbiguousSelfJoin left at default: rollup queries alias their
    // grouping columns, so the guard no longer false-positives)
    spark
  }

  // Per-session caches for testdata resolution. The testdata dirs are
  // STATIC and read-only (TESTDATA.md), so a DataFrame's file listing/
  // schema snapshot never goes stale — which makes re-running parquet
  // schema inference per query call pure waste: a registerAll pass
  // over the 10 tables costs ~1.1s at sf0.1, and the bench/verify
  // harnesses invoke queries hundreds of times. This is also what a
  // real warehouse session does: tables resolve through a metastore
  // that caches schemas, not by re-reading footers per query.
  // WeakHashMap so a stopped session's entries can be collected.
  private val registeredDir =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, String]())
  private val tableCache =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession,
        scala.collection.concurrent.TrieMap[String, DataFrame]]())

  /** Read one testdata table, normalizing types the raw files can't
    * express in Spark (ns-precision timestamps → microsecond TIMESTAMP,
    * truncating like DuckDB's TIMESTAMP_NS→TIMESTAMP cast does).
    * Cached per (session, dir, table) — see the cache note above. */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    configure(spark)
    val per = tableCache.synchronized {
      var m = tableCache.get(spark)
      if (m == null) {
        m = scala.collection.concurrent.TrieMap.empty[String, DataFrame]
        tableCache.put(spark, m)
      }
      m
    }
    per.getOrElseUpdate(s"$sfDir/$name", {
      val df = spark.read.parquet(s"$sfDir/$name.parquet")
      // Older testdata generations wrote events.ts as TIMESTAMP(NANOS),
      // which (with nanosAsLong=true) surfaces as a Long of epoch-nanos;
      // newer generations write timestamp[us], which resolves directly as
      // TIMESTAMP. Convert only when the column actually read back as a
      // Long — applying `ts div 1000` to a TIMESTAMP fails analysis.
      if (name == "events" &&
          df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
        df.withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
      else df
    })
  }

  /** Register every testdata table under `sfDir` as a temp view so both
    * the DataFrame DSL and `spark.sql` surfaces see the same catalog.
    * Idempotent, and a no-op when this session already registered this
    * dir (the views are session-scoped and nothing in the repo reuses
    * the testdata view names — re-registering per query call only
    * re-pays schema inference). */
  def registerAll(spark: SparkSession, sfDir: String): SparkSession = {
    configure(spark)
    if (registeredDir.get(spark) != sfDir) {
      tableNames.foreach { t =>
        val p = new java.io.File(s"$sfDir/$t.parquet")
        if (p.exists) table(spark, sfDir, t).createOrReplaceTempView(t)
      }
      registeredDir.put(spark, sfDir)
    }
    spark
  }
}
