package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** §5.2 plan-shape tests (the reference's EXPLAIN-review practice,
  * docs/explain.md): assert that pushdown / pruning / broadcast /
  * codegen decisions actually happen — these are the properties that
  * make the plans survive a 100 TB scale-up. */
class PlanShapeSpec extends SparkSuite {

  private def executedPlan(df: DataFrame): String = {
    df.collect() // materialize so AQE finalizes the plan
    df.queryExecution.executedPlan.toString
  }

  test("TPC-DS-shape rollup unions scan the fact ONCE (A10): grouping " +
      "sets Expand, no per-branch rescans") {
    // Q77/Q5 shape: the per-channel/per-year/total report must come
    // from one orders scan expanded per grouping set — a UNION-of-
    // rollups formulation would rescan the fact per branch, which is
    // the difference between 1x and Nx the IO at 100 TB
    val plan = executedPlan(
      TpcdsQueries.q_tpcds_channel_union.run(spark, sf))
      .split("== Initial Plan ==")(0) // AQE echoes the pre-plan too
    val ordersScans = "orders\\.parquet".r.findAllIn(plan).size
    assert(ordersScans == 1,
      s"expected ONE orders scan, saw $ordersScans:\n${plan.take(800)}")
    assert(plan.contains("Expand"),
      "grouping sets should plan as Expand over the single scan")
    // same property for the lochierarchy rollup report
    val plan2 = executedPlan(
      TpcdsQueries.q_tpcds_rollup_report.run(spark, sf))
      .split("== Initial Plan ==")(0)
    assert("orders\\.parquet".r.findAllIn(plan2).size == 1,
      "rollup report must scan orders once")
  }

  test("filters are pushed to the parquet scan (P3/S2)") {
    val plan = Queries.q_filter_range.run(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: ["), plan)
    assert(plan.contains("IsNotNull(l_quantity)") ||
      plan.contains("GreaterThan(l_quantity"), s"quantity filter not pushed:\n$plan")
  }

  test("vtab SQL time travel keeps pushdown: the substituted snapshot " +
      "is a plain pruned parquet scan") {
    import spark.implicits._
    import graft.operators.VersionedTable
    val root = java.nio.file.Files
      .createTempDirectory("graft_vtab_plan").toString
    VersionedTable.commit(spark, root,
      (1L to 100L).map(i => (i, s"s$i", i * 2.0)).toDF("id", "s", "v"))
    VersionedTable.commit(spark, root,
      (101L to 200L).map(i => (i, s"s$i", i * 2.0)).toDF("id", "s", "v"))
    val df = spark.sql(
      s"SELECT id, v FROM vtab.`$root` VERSION AS OF 1 WHERE id = 7")
    val plan = df.queryExecution.executedPlan.toString
    // the WHERE reaches the parquet scan as a pushed filter, and the
    // 2-column projection prunes the read schema — SQL-text time
    // travel costs nothing over the Scala read path
    assert(plan.contains("PushedFilters: ["), plan)
    assert(plan.contains("EqualTo(id,7)"), s"id filter not pushed:\n$plan")
    assert(plan.contains("ReadSchema: struct<id:bigint,v:double>"),
      s"projection not pruned:\n$plan")
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(7L))
    // the bounded-CDC TVF substitutes the same analyzed dir-diff plan,
    // so a filtered projection over table_changes keeps pushdown too
    // (only the v2-only dir is diffed; the WHERE reaches its scan)
    val cdc = spark.sql(s"""SELECT id, v FROM table_changes('$root', 1, 2)
                            WHERE id = 150""")
    val cdcPlan = cdc.queryExecution.executedPlan.toString
    assert(cdcPlan.contains("PushedFilters: ["), cdcPlan)
    assert(cdcPlan.contains("EqualTo(id,150)"),
      s"id filter not pushed through table_changes:\n$cdcPlan")
    assert(cdc.collect().map(_.getLong(0)).toSeq == Seq(150L))
  }

  test("column pruning reaches the scan: 2-col projection reads 2 cols (P1)") {
    val df = Engine.table(spark, sf, "lineitem")
      .select("l_orderkey", "l_quantity")
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"),
      s"scan reads more than the projection:\n$scan")
  }

  test("small dim side broadcasts (J4), fact side does not shuffle") {
    val plan = executedPlan(Queries.q_broadcast_join.run(spark, sf))
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("catalyst auto-broadcasts small dims without a hint (J1)") {
    val li = Engine.table(spark, sf, "lineitem")
    val p = Engine.table(spark, sf, "part")
    val plan = executedPlan(
      li.join(p, col("l_partkey") === col("p_partkey")).groupBy("p_brand")
        .agg(count(lit(1))))
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("aggregation is partial+final (A1) inside whole-stage codegen") {
    // pre-AQE sparkPlan shows both aggregates (AQE's final rendering
    // elides materialized query-stage subtrees)
    val plan = Queries.q_pricing_summary.run(spark, sf)
      .queryExecution.sparkPlan.toString
    assert("HashAggregate".r.findAllIn(plan).size >= 2,
      s"expected partial+final agg:\n$plan")
    // "*(n)" is the compact render of WholeStageCodegen stage n
    val exec = executedPlan(Queries.q_pricing_summary.run(spark, sf))
    assert(exec.contains("*(1)"), exec)
  }

  test("typed aggregates plan as ObjectHashAggregate with the raised " +
      "sort-fallback threshold (the r12 q_agg_route_incremental fix)") {
    // the default threshold of 128 groups silently degraded every
    // bitmap/HLL/vector typed aggregate past toy cardinality into a
    // full partition sort; Engine.configure must keep it raised
    Engine.configure(spark)
    assert(spark.conf.get(
      "spark.sql.objectHashAggregate.sortBased.fallbackThreshold")
      == "1000000")
    // and a typed aggregate over thousands of groups really takes the
    // ObjectHashAggregate path
    val li = Engine.table(spark, sf, "lineitem")
    val plan = executedPlan(li.groupBy("l_suppkey")
      .agg(graft.functions.Bitmap64.bitmapBuild(col("l_orderkey"))
        .as("bm")))
    assert(plan.contains("ObjectHashAggregate"), plan)
  }

  test("top-k compiles to TakeOrderedAndProject, not a global sort (O5)") {
    val plan = Queries.q_topk.run(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("semi/anti joins plan as LeftSemi/LeftAnti (J5/J6)") {
    val semi = executedPlan(Queries.q_semi_join.run(spark, sf))
    val anti = executedPlan(Queries.q_anti_join.run(spark, sf))
    assert(semi.contains("LeftSemi"), semi)
    assert(anti.contains("LeftAnti"), anti)
  }

  test("dt range on a partitioned table prunes partitions (S2)") {
    RefConformance.ensure(spark, sf)
    val df = spark.sql("""SELECT count(*) AS n FROM dwb.fact_event_info
                          WHERE dt >= '2019-03-01' AND dt <= '2019-03-03'""")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: ["), plan)
    // the scan must touch only the 3 selected dt partitions (of 5)
    val scanned = spark.sql("""SELECT * FROM dwb.fact_event_info
                               WHERE dt >= '2019-03-01' AND dt <= '2019-03-03'""")
      .inputFiles
    assert(scanned.nonEmpty)
    assert(scanned.forall(f => f.contains("dt=2019-03-01") ||
      f.contains("dt=2019-03-02") || f.contains("dt=2019-03-03")),
      s"unpruned files: ${scanned.filterNot(_.contains("dt=2019-03-0")).take(3).mkString(",")}")
  }

  test("verbatim window query's dt range uses PartitionFilters (S2/W1-W4)") {
    RefConformance.ensure(spark, sf)
    val df = Queries.byName("q_ref_window_verbatim").run(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: ["), plan)
    assert(df.inputFiles.forall(f => !f.contains("dt=2019-03-04") &&
      !f.contains("dt=2019-03-05")), "partitions outside range scanned")
  }

  test("dynamic partition pruning fires on a star join's dt dimension") {
    RefConformance.ensure(spark, sf)
    import spark.implicits._
    // dim carries dt values; the filter on the dim prunes fact
    // partitions at RUNTIME via a DPP subquery in the scan. The dim
    // must be a real scan (a literal frame constant-folds to a
    // LocalRelation and the DPP rule sees no selective filter).
    val dimDir = tmpDir("dpp_dim")
    Seq(("2019-03-02", "keep"), ("2019-03-04", "keep2"))
      .toDF("dt", "tag").write.mode("overwrite").parquet(dimDir)
    spark.read.parquet(dimDir).createOrReplaceTempView("dpp_dim")
    withSQLConf(
      "spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly" -> "false",
      "spark.sql.optimizer.dynamicPartitionPruning.useStats" -> "false",
      "spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio" -> "100000") {
      val df = spark.sql("""
        SELECT count(*) AS n FROM dwb.fact_event_info f
        JOIN dpp_dim d ON f.dt = d.dt
        WHERE d.tag = 'keep'""")
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("dynamicpruning") ||
        plan.contains("DynamicPruning") ||
        plan.contains("SubqueryBroadcast"),
        s"expected a dynamic partition pruning filter in the scan:\n$plan")
      df.collect()
    }
  }

  test("DISTRIBUTE BY hash-partitions on the named column (O3)") {
    Engine.registerAll(spark, sf)
    val df = spark.sql("SELECT user_id FROM events DISTRIBUTE BY user_id")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(user_id"),
      s"expected a hash exchange on user_id:\n$plan")
  }

  test("SORT BY stays partition-local: hash exchange + NON-global sort, " +
      "no range partitioning (O3/O1)") {
    Engine.registerAll(spark, sf)
    // the inner block of q_sort_by, without the outer ORDER BY that
    // would legitimately add a global sort
    val df = spark.sql(
      """SELECT user_id, event_type, count(*) AS n FROM events
         GROUP BY user_id, event_type
         DISTRIBUTE BY user_id SORT BY user_id, event_type""")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(user_id"),
      s"expected a hash exchange on user_id:\n$plan")
    assert("Sort \\[".r.findAllIn(plan).nonEmpty &&
      plan.contains("false, 0"),
      s"expected a partition-local (global=false) sort:\n$plan")
    assert(!plan.contains("rangepartitioning"),
      s"SORT BY must not range-partition (that is ORDER BY's job):\n$plan")
    // CLUSTER BY x == DISTRIBUTE BY x SORT BY x: same plan discipline
    val cb = spark.sql(
      """SELECT user_id, count(*) AS n FROM events
         GROUP BY user_id CLUSTER BY user_id""")
    cb.collect()
    val cbPlan = cb.queryExecution.executedPlan.toString
    assert(cbPlan.contains("hashpartitioning(user_id") &&
      !cbPlan.contains("rangepartitioning"),
      s"CLUSTER BY must hash-partition, never range-partition:\n$cbPlan")
  }

  test("AQE coalesces shuffle partitions (docs/sql调优.md:157-163)") {
    val df = Engine.table(spark, sf, "lineitem")
      .groupBy("l_returnflag").agg(count(lit(1)))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AQEShuffleRead") || plan.contains("coalesced"),
      s"AQE did not optimize the exchange:\n$plan")
  }

  test("bucketed tables join with NO exchange on either side") {
    import graft.operators.Warehouse
    Warehouse.createLayers(spark)
    Warehouse.writeBucketed(
      Engine.table(spark, sf, "lineitem").select("l_orderkey", "l_quantity"),
      "dws.li_bucketed", "l_orderkey", 4)
    Warehouse.writeBucketed(
      Engine.table(spark, sf, "orders").select("o_orderkey", "o_totalprice")
        .withColumnRenamed("o_orderkey", "l_orderkey"),
      "dws.ord_bucketed", "l_orderkey", 4)
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val joined = spark.table("dws.li_bucketed")
        .join(spark.table("dws.ord_bucketed"), Seq("l_orderkey"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n$plan")
    }
  }

  test("decontamination broadcasts the benchmark shingles; corpus text " +
      "never shuffles") {
    val all = Engine.table(spark, sf, "documents")
    val df = graft.operators.TextOps.contaminationFlags(
      all.filter(col("doc_id") % 97 =!= 0),
      all.filter(col("doc_id") % 97 === 0))
    val plan = executedPlan(df).split("== Initial Plan ==")(0)
    assert(plan.contains("BroadcastHashJoin"),
      s"benchmark side must broadcast:\n$plan")
    // exactly two exchanges: the (tiny) benchmark side's distinct and
    // the final (doc_id) count — the corpus side reaches the join
    // map-side, below any exchange
    val shuffles = "Exchange hashpartitioning".r
      .findAllMatchIn(plan).length
    assert(shuffles == 2,
      s"expected 2 shuffles (bench distinct + final agg), got $shuffles")
    assert(plan.contains("Generate"), "corpus shingles explode map-side")
  }

  test("cleanCorpus costs exactly one shuffle (the dedup fingerprint " +
      "exchange) - gates fuse into the scan") {
    val df = graft.operators.TextOps.cleanCorpus(
      Engine.table(spark, sf, "documents"))
    // the AQE plan string repeats nodes under "== Initial Plan ==" —
    // count only the finalized section
    val plan = executedPlan(df).split("== Initial Plan ==")(0)
    val shuffles = "Exchange hashpartitioning".r
      .findAllMatchIn(plan).length
    assert(shuffles == 1, s"expected 1 shuffle, got $shuffles:\n$plan")
    assert(!plan.contains("Join"),
      s"quality/lang gates must be filters, not joins:\n$plan")
  }

  test("CBO + table stats reorder a join chain to the selective dim first " +
      "(docs/sql规范.md:5-6)") {
    import graft.operators.Warehouse
    // fact(6k) syntactically joins mid(6k, 1:1 on k) BEFORE tiny
    // (5 rows, selective on k2). With stats + CBO the optimizer must
    // reorder to fact⋈tiny first — the reference states join order
    // matters; CBO is the engine-side automation of that advice.
    Seq("cbo_fact", "cbo_mid", "cbo_tiny").foreach(t =>
      Warehouse.dropManaged(spark, s"dws.$t"))
    Warehouse.createLayers(spark)
    import spark.implicits._
    spark.range(6000).select($"id".as("f_k"), ($"id" % 100).as("f_k2"))
      .write.saveAsTable("dws.cbo_fact")
    spark.range(6000).select($"id".as("m_k"), lit("m").as("m_v"))
      .write.saveAsTable("dws.cbo_mid")
    spark.range(5).select($"id".as("t_k2"), lit("t").as("t_v"))
      .write.saveAsTable("dws.cbo_tiny")
    Seq("cbo_fact", "cbo_mid", "cbo_tiny").foreach(t => spark.sql(
      s"ANALYZE TABLE dws.$t COMPUTE STATISTICS FOR ALL COLUMNS"))
    val sql = """SELECT * FROM dws.cbo_fact f
                 JOIN dws.cbo_mid m ON f.f_k = m.m_k
                 JOIN dws.cbo_tiny t ON f.f_k2 = t.t_k2"""
    def bottomJoinLeafCols(): String = {
      val joins = spark.sql(sql).queryExecution.optimizedPlan.collect {
        case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
      }
      joins.last.collectLeaves()
        .flatMap(_.output.map(_.name)).mkString(",")
    }
    withSQLConf("spark.sql.cbo.enabled" -> "true",
        "spark.sql.cbo.joinReorder.enabled" -> "true") {
      val leaves = bottomJoinLeafCols()
      assert(leaves.contains("t_k2") && !leaves.contains("m_k"),
        s"CBO should join the tiny selective dim first, got: $leaves")
    }
    // negative control: without CBO the syntactic order stands, proving
    // the reorder above came from the stats-based optimizer
    withSQLConf("spark.sql.cbo.enabled" -> "false") {
      val leaves = bottomJoinLeafCols()
      assert(leaves.contains("m_k") && !leaves.contains("t_k2"),
        s"without CBO the syntactic join order should stand, got: $leaves")
    }
  }

  test("AQE splits a skewed join partition (docs/sql调优.md:202-250)") {
    import spark.implicits._
    // one hot key carrying ~all rows; thresholds lowered so the skew
    // machinery triggers at test scale
    withSQLConf(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val skewed = spark.range(200000)
        .select(when($"id" % 100 === 0, $"id").otherwise(lit(7L)).as("k"),
          concat(lit("payload_payload_payload_"), $"id").as("pay"))
      val dim = spark.range(2000).select($"id".as("k"), lit("d").as("dv"))
      val joined = skewed.join(dim, Seq("k"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not mark the skewed join:\n${plan.take(2000)}")
    }
  }

  test("IVF probe scans only the probed bucket partitions") {
    val emb = Engine.table(spark, sf, "embeddings")
    val dir = tmpDir("ivf_plan")
    graft.operators.Similarity.ivfBuildIndex(emb, dir)
    val row = emb.filter(col("vec_id") === 0).head()
    val q = row.getSeq[Float](row.fieldIndex("embedding"))
      .map(_.toDouble).toSeq
    val probe = graft.operators.Similarity.ivfProbe(spark, dir, q,
      k = 10, nprobe = 4)
    probe.collect()
    val allParts = spark.read.parquet(s"$dir/vectors")
      .select("bucket").distinct().count()
    // runtime scan metrics: only the probed buckets' partitions read
    // (inputFiles reflects the pre-pruning index for path reads)
    val scans = probe.queryExecution.executedPlan.collectLeaves().collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
          if f.metadata("Location").contains("vectors") => f
    }
    assert(scans.nonEmpty)
    val scannedParts = scans.map(_.metrics("numPartitions").value).sum
    assert(scannedParts <= 4 && scannedParts < allParts,
      s"probe scanned $scannedParts of $allParts bucket partitions")
  }

  test("runtime bloom filter reduces the probe side of a selective join") {
    // Spark 4's runtime-filter injection: the filtered build side
    // broadcasts a bloom filter that pre-prunes the probe scan — the
    // engine-level version of the reference's 'filter before join'
    // pushdown guidance; thresholds lowered to fire at test scale
    withSQLConf(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val li = Engine.table(spark, sf, "lineitem")
      val o = Engine.table(spark, sf, "orders")
        .filter(col("o_totalprice") > 400000)
      val j = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus").agg(count(lit(1)))
      val plan = j.queryExecution.optimizedPlan.toString
      assert(plan.contains("bloom_filter_agg") ||
        plan.contains("might_contain"),
        s"runtime bloom filter not injected:\n${plan.take(1500)}")
    }
  }

  test("redundant inner group-by is eliminated (docs/sql调优.md:73-91)") {
    Engine.registerAll(spark, sf)
    // the reference's case 4: a subquery group-by under an identical
    // outer group-by is dropped by the optimizer (one aggregation, not
    // two) — unless the subquery aggregates (count distinct etc.)
    val df = spark.sql("""
      SELECT l_returnflag, l_linestatus FROM (
        SELECT l_returnflag, l_linestatus FROM lineitem
        GROUP BY l_returnflag, l_linestatus)
      GROUP BY l_returnflag, l_linestatus""")
    val aggs = "Aggregate".r
      .findAllIn(df.queryExecution.optimizedPlan.toString).size
    assert(aggs == 1, s"expected one Aggregate after elimination, got $aggs")
  }

  test("scalar text pipeline stays in one codegen stage (no exchanges)") {
    val df = graft.operators.TextOps.qualityScore(
      Engine.table(spark, sf, "documents"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"pure projection must not shuffle:\n$plan")
  }

  test("norm_text and bpe encode are exchange-free codegen projections") {
    val docs = Engine.table(spark, sf, "documents")
    val norm = docs.select(
      graft.functions.NormalizeText.normText(col("text")))
    val nPlan = norm.queryExecution.executedPlan.toString
    assert(!nPlan.contains("Exchange"), s"norm_text must not shuffle:\n$nPlan")
    assert(nPlan.contains("WholeStageCodegen") || nPlan.contains("*("),
      s"norm_text must stay in codegen:\n$nPlan")
    val enc = graft.operators.Bpe.encode(docs, Seq(("e", "s"), ("es", "t")))
    val ePlan = enc.queryExecution.executedPlan.toString
    assert(!ePlan.contains("Exchange"), s"bpe encode must not shuffle:\n$ePlan")
  }

  test("weighted sample: global form plans as TakeOrdered, no full sort") {
    val df = graft.operators.Sampling.weightedSample(
      Engine.table(spark, sf, "documents"), k = 10,
      weightCol = col("n_chars"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrdered"),
      s"global top-k must be TakeOrdered (per-partition heaps):\n$plan")
    // per-stratum form rides the bounded-heap custom operator
    val strat = graft.operators.Sampling.weightedSample(
      Engine.table(spark, sf, "documents"), k = 10,
      weightCol = col("n_chars"), strataCols = Seq("source"))
    val sPlan = strat.queryExecution.executedPlan.toString
    assert(sPlan.contains("TopKPerGroup"),
      s"stratified form must use the heap operator:\n$sPlan")
    assert(!sPlan.contains("Window"), s"never a window sort:\n$sPlan")
  }

  test("multimodal feature extraction has no exchange (map-only at scale)") {
    val media = Multimodal.asMediaTable(
      Engine.table(spark, sf, "documents"), "doc_id", "text")
    val plan = Multimodal.extractFeatures(media)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"decode must be map-only:\n$plan")
  }

  test("mixture sampling is a pure filter: zero exchanges at any scale") {
    val df = graft.operators.Sampling.mixtureSample(
      Engine.table(spark, sf, "documents"), "source",
      Map("src0" -> 0.5), defaultFrac = 0.1)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"per-stratum hash sampling must not shuffle:\n$plan")
  }

  test("repetition stats: map-only — zero shuffles, zero joins") {
    val plan = executedPlan(graft.operators.TextOps.repetitionStats(
      Engine.table(spark, sf, "documents"))).split("== Initial Plan ==")(0)
    assert(!plan.contains("Join"), s"repetitionStats must not join:\n$plan")
    assert(!plan.contains("Exchange"),
      s"per-doc bigram stats are document-local (native BigramStats " +
        s"kernel) — no shuffle expected:\n$plan")
  }

  test("common-token scoring pass is map-only (vocab rides the kernel)") {
    val plan = executedPlan(graft.operators.TextOps.commonTokenRatio(
      Engine.table(spark, sf, "documents"), topN = 100))
    // the vocab agg runs as its own bounded job at operator-build time;
    // the returned per-doc plan must be a pure scan+project — no join,
    // no exchange, nothing per-occurrence
    assert(!plan.contains("Join"), s"scoring pass must not join:\n$plan")
    assert(!plan.contains("Exchange"),
      s"scoring pass must not shuffle:\n$plan")
  }

  test("sequence packing never serializes through one partition") {
    val plan = executedPlan(graft.operators.TextOps.packSequences(
      Engine.table(spark, sf, "documents"), seqLen = 64))
    assert(!plan.contains("SinglePartition"),
      s"two-phase prefix sum must not use a global window:\n$plan")
    assert(plan.contains("hashpartitioning(__b"),
      s"local cumsum must be per-bucket:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"bucket offsets (constant-size) must broadcast:\n$plan")
  }

  test("bloomPrefilterJoin: might_contain filter sits on the probe side " +
      "BEFORE the join (runtime-filter shape)") {
    val li = Engine.table(spark, sf, "lineitem")
      .select("l_orderkey", "l_quantity")
    val ord = Engine.table(spark, sf, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select("o_orderkey")
    val plan = executedPlan(graft.operators.Relational.bloomPrefilterJoin(
      li, ord, "l_orderkey", "o_orderkey"))
    assert(plan.contains("bloom_broadcast_might_contain"),
      s"probe side must be bloom-prefiltered:\n$plan")
    assert(plan.contains("Join") || plan.contains("HashJoin"), plan)
    // the sketch rides a broadcast HANDLE, not a plan Literal: a
    // multi-MB sketch embedded as a Literal would bloat every task
    // binary and blow the plan string into megabytes
    assert(plan.length < 100000,
      s"plan string is ${plan.length} chars — sketch leaked into the plan?")
  }

  test("mergeInto: all three MERGE branches ride ONE join (target " +
      "shuffles once)") {
    val t = Engine.table(spark, sf, "orders")
      .select(col("o_orderkey").as("k"), col("o_totalprice").as("tp"))
    val s = t.filter(col("k") % 10 === 0)
      .select(col("k"), (col("tp") * 2).as("tp"))
    val plan = executedPlan(graft.operators.Warehouse.mergeInto(
      t, s, Seq("k"), whenMatchedUpdate = Map("tp" -> col("s.tp"))))
      .split("== Initial Plan ==")(0)
    assert("Join".r.findAllIn(plan).size == 1,
      s"expected exactly one join (full-outer carries all branches):\n$plan")
  }

  test("ngramJaccardPairs: document frequency is a partial-aggregated " +
      "groupBy, not a (blk, tok) window over the exploded tokens") {
    // the prefix derivation (inspected pre-checkpoint — the candidate
    // pairing checkpoints it, which hides its plan from the final frame)
    val docs = Engine.table(spark, sf, "documents")
    val base = docs.select(col("source").as("blk"),
      col("doc_id").as("id"),
      graft.operators.Dedup.wordShingles(col("text"), 2).as("sh"))
    val prefixPlan = graft.operators.Dedup.ngramPrefix(base, 0.5)
      .queryExecution.sparkPlan.toString
    // a count-over-Window partitioned on (blk, tok) funnels every
    // occurrence of a Zipfian hot token into one task with no map-side
    // combine — the straggler/OOM shape at corpus scale
    assert(!"windowspecdefinition\\(blk#\\d+, tok#\\d+".r
        .findFirstIn(prefixPlan).isDefined,
      s"df must not be a (blk, tok) window:\n${prefixPlan.take(3000)}")
    // the only window is the per-document prefix rank (bounded
    // partitions: one document's tokens)
    assert("windowspecdefinition\\(blk#\\d+, id#\\d+".r
        .findFirstIn(prefixPlan).isDefined,
      s"per-document prefix rank window expected:\n${prefixPlan.take(3000)}")
    // and the df aggregate is partial+final (map-side combine)
    assert("partial_count".r.findFirstIn(prefixPlan).isDefined,
      s"df groupBy must partial-aggregate:\n${prefixPlan.take(3000)}")
    // the candidate pairing must be a spill-safe JOIN over the
    // checkpointed prefix, never a collect_list bucket aggregation
    // whose per-bucket arrays all live in one task's hash-agg buffers
    // (measured OOM at the 100x probe)
    val candPlan = graft.operators.Dedup.ngramCandidates(base, 0.5)
      .queryExecution.sparkPlan.toString
    assert(!candPlan.contains("collect_list"),
      s"pairing must not collect buckets:\n${candPlan.take(3000)}")
    assert(candPlan.contains("Join"),
      s"pairing must be a join:\n${candPlan.take(3000)}")
  }

  test("hot-key dedup stages are partial aggregates, not windows: " +
      "exactDedup, partialOverlapPairs, dedupSpans") {
    // a window partitioned on a content fingerprint funnels every copy
    // of one viral text / boilerplate span into a single task; the
    // partial-aggregated forms collapse hot keys map-side. Pin that no
    // plan re-introduces a Window anywhere in these operators.
    val docs = Engine.table(spark, sf, "documents")
    val exact = graft.operators.Dedup.exactDedup(docs)
      .queryExecution.sparkPlan.toString
    assert(!exact.contains("windowspecdefinition"),
      s"exactDedup must not window over the fingerprint:\n${exact.take(2000)}")
    assert("partial_min_by".r.findFirstIn(exact).isDefined,
      s"exactDedup keeper must partial-aggregate:\n${exact.take(2000)}")

    val winnow = graft.operators.Dedup.partialOverlapPairs(docs)
      .queryExecution.sparkPlan.toString
    assert(!winnow.contains("windowspecdefinition"),
      s"winnow df cap must not window over fp:\n${winnow.take(2000)}")
    assert("partial_count".r.findFirstIn(winnow).isDefined,
      s"winnow df cap must partial-aggregate:\n${winnow.take(2000)}")

    val spans = graft.operators.TextOps.dedupSpans(docs, spanTokens = 32)
      .queryExecution.sparkPlan.toString
    assert(!spans.contains("windowspecdefinition"),
      s"dedupSpans must not window over the span hash:\n${spans.take(2000)}")
    assert("partial_min".r.findFirstIn(spans).isDefined,
      s"dedupSpans first-occurrence must partial-aggregate:\n${spans.take(2000)}")
  }

  test("dedupSubstrings stays on the native kernels: no interpreted " +
      "HOF fingerprints, no array_contains reassembly, no window") {
    val docs = Engine.table(spark, sf, "documents")
    // the O(n·k) md5-of-slice transform and the O(n·|rm|) per-token
    // probe were the two pre-r14 interpreted hot loops — pin their
    // replacements (KgramFingerprints / DropByIndexJoin kernels). The
    // fingerprint pass hides behind dedupSubstrings' localCheckpoint,
    // so it is pinned on substringGrams (same code path, no
    // checkpoint); the reassembly is pinned on the full operator.
    val fpPlan = graft.operators.TextOps.substringGrams(docs, k = 8)
      .queryExecution.sparkPlan.toString.toLowerCase
    assert(fpPlan.contains("kgramfingerprints"),
      s"kgram kernel missing from the plan:\n${fpPlan.take(2000)}")
    assert(!fpPlan.contains("md5("),
      s"fingerprints must be the rolling-hash kernel:\n${fpPlan.take(2000)}")
    val plan = graft.operators.TextOps.dedupSubstrings(docs, k = 8)
      .queryExecution.sparkPlan.toString.toLowerCase
    assert(!plan.contains("array_contains"),
      s"reassembly must be the sorted-merge kernel:\n${plan.take(2000)}")
    assert(plan.contains("dropbyindexjoin"),
      s"drop-by-index kernel missing from the plan:\n${plan.take(2000)}")
    assert(!plan.contains("windowspecdefinition"),
      s"dedupSubstrings must not window:\n${plan.take(2000)}")
  }

  test("BM25 keeps df/corpus stats broadcast; no cartesian product") {
    val plan = executedPlan(graft.operators.TextOps.bm25TopK(
      Engine.table(spark, sf, "documents"),
      Seq("join", "scan", "filter"), k = 10))
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CartesianProduct"),
      s"1-row stats frame must broadcast, not cartesian:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k must avoid a global sort:\n$plan")
  }

  test("window funnel is ONE user-keyed hash agg — no window, no join") {
    val plan = executedPlan(graft.operators.Behavior.windowFunnel(
      Engine.table(spark, sf, "events"), "user_id", "event_type", "ts",
      Seq("view", "click", "purchase"), 86400L))
      .split("== Initial Plan ==").head // count the AQE final plan only
    val shuffles = "Exchange hashpartitioning".r
      .findAllIn(plan).length
    assert(shuffles == 1, s"k-step funnel must not pay k shuffles:\n$plan")
    assert(!plan.contains("Window"), s"funnel must not sort-window:\n$plan")
    assert(!plan.contains("Join"), s"funnel must not join:\n$plan")
  }

  test("classifier scoring is a shuffle-free scan (broadcastable model)") {
    val feats = graft.operators.TextClassifier.hashedFeatures(
      Engine.table(spark, sf, "documents"), "text", 4096)
    val plan = executedPlan(graft.operators.TextClassifier.scoreLogistic(
      feats, "fx", Map(-1 -> 0.5, 3 -> 1.0), Seq("doc_id")))
    assert(!plan.contains("Exchange"),
      s"scoring a 100 TB corpus must be map-only:\n$plan")
  }

  test("inverted-index BM25 prunes to the query terms' shards and " +
      "matches the scan path exactly") {
    val dir = tmpDir("invidx")
    graft.operators.TextOps.buildInvertedIndex(
      Engine.table(spark, sf, "documents"), dir)
    val terms = Seq("join", "scan", "filter")
    val indexed = graft.operators.TextOps.bm25TopKIndexed(
      spark, dir, terms, k = 10)
    val plan = executedPlan(indexed)
    assert(plan.contains("PartitionFilters: [shard"),
      s"term lookup must prune shard partitions:\n$plan")
    assertSameRows(indexed, graft.operators.TextOps.bm25TopK(
      Engine.table(spark, sf, "documents"), terms, k = 10))
  }

  test("nullable NOT IN plans as a null-aware anti join (sql规范 #12)") {
    Engine.registerAll(spark, sf)
    val plan = executedPlan(spark.sql("""
      SELECT c_custkey FROM customer
      WHERE c_custkey NOT IN (
        SELECT CASE WHEN o_orderkey % 1000 = 0 THEN NULL
                    ELSE o_custkey END FROM orders)"""))
    assert(plan.contains("LeftAnti"), plan)
    // the NAAJ special case: single-column null-aware form stays a
    // hash join, not a nested-loop scan per probe row
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("perceptual image dedup costs exactly one exchange (E-mm/E-dedup)") {
    import spark.implicits._
    import graft.operators.{MediaCodec, Multimodal}
    val rows = (0L to 40L).map { i =>
      (i, MediaCodec.encodeBmp24(10, 9, (x, y) =>
        (((i % 5) * 37 + x * 11 + y).toInt % 200, x * 7 % 200, y * 13 % 200)))
    }.toDF("media_id", "payload")
    // AQE's toString prints the Initial Plan after the Final Plan —
    // count exchanges in the FINAL plan only
    val plan = executedPlan(Multimodal.imageDedup(rows))
      .split("== Initial Plan ==").head
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1,
      s"imageDedup must cost ONE hash exchange (the 8-byte-hash " +
        s"dedup), found $exchanges:\n$plan")
    assert(!plan.contains("Exchange rangepartitioning"), plan)
  }

  test("gap-fill windows partition on the series key, never globally") {
    import spark.implicits._
    val obs = Engine.table(spark, sf, "events")
      .groupBy(col("event_type").as("k"), col("ts").cast("date").as("dd"))
      .agg(max("value").as("v"))
    val plan = executedPlan(graft.operators.TimeSeries.gapFillDaily(
      obs, Seq("k"), "dd", "v", "2024-01-01", "2024-01-30"))
    assert(!plan.contains("Exchange rangepartitioning"),
      s"gap-fill must not globally sort:\n$plan")
    assert(plan.contains("Window"), plan)
  }

  test("LM scoring: count tables broadcast, corpus scans bounded") {
    val plan = executedPlan(CurationQueries.q_lm_score.run(spark, sf))
    // the c12/c1 count frames must reach the doc-side joins as
    // broadcasts (they are vocabulary-sized dimensions), and the only
    // nested-loop join is the intended 1-row V broadcast cross —
    // nothing corpus-sized ever goes all-pairs
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    // corpus reads stay bounded: train counts (2: bigrams + vocab) +
    // doc scoring (2: bigram tf + the keep-empty-docs left join) — the
    // AQE string repeats every node under "== Initial Plan ==", so
    // count only the final section
    val finalPlan = plan.split("== Initial Plan ==").head
    val scans = "Scan parquet".r.findAllIn(finalPlan).length
    assert(scans <= 5,
      s"LM scoring re-reads the corpus ($scans scans):\n$finalPlan")
  }

  test("fuzzy linkage: candidate join is a block-key equi-join, " +
      "never a cross product") {
    val plan = executedPlan(TextQueries.q_dedup_fuzzy.run(spark, sf))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"fuzzy linkage must never go all-pairs:\n$plan")
  }

  test("hybrid RRF: both legs stay TakeOrdered, fusion never sorts " +
      "the corpus") {
    val plan = executedPlan(CurationQueries.q_hybrid_rrf.run(spark, sf))
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("Exchange rangepartitioning"),
      s"RRF fused a corpus-wide sort:\n$plan")
  }
}
