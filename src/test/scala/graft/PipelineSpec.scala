package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Layout, Sampling, TextOps}

/** Round-4 pipeline operators: connected-components dedup clustering,
  * deterministic sampling/splits, document chunking, PII scrubbing,
  * vocabulary building. */
class PipelineSpec extends SparkSuite {
  import spark.implicits._

  // ------------------------------------------------- connected components

  test("connectedComponents: a chain closes transitively into one cluster") {
    // 1-2, 2-3, 3-4 — 1~4 never observed directly
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("id_a", "id_b")
    val cc = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
  }

  test("connectedComponents: separate components keep separate min labels") {
    val pairs = Seq((5L, 9L), (9L, 7L), (20L, 21L), (30L, 30L))
      .toDF("id_a", "id_b")
    val cc = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc == Map(5L -> 5L, 7L -> 5L, 9L -> 5L,
      20L -> 20L, 21L -> 20L, 30L -> 30L))
  }

  test("connectedComponents: empty pair set yields an empty result") {
    val pairs = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Dedup.connectedComponents(pairs).count() == 0)
  }

  test("connectedComponents: long path converges within the iteration bound") {
    // path 0-1-2-...-12: worst-case diameter for min-label propagation
    val pairs = (0L until 12L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val cc = Dedup.connectedComponents(pairs).collect()
    assert(cc.length == 13 && cc.forall(_.getLong(1) == 0L))
  }

  test("keepCanonicalPerCluster keeps min-id per cluster + unpaired docs") {
    val docs = Seq((1L, "a"), (2L, "a"), (3L, "a"), (9L, "z"))
      .toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val kept = Dedup.keepCanonicalPerCluster(docs, pairs)
      .select("doc_id").as[Long].collect().sorted
    assert(kept.sameElements(Array(1L, 9L)))
  }

  // ----------------------------------------------------------- sampling

  test("assignSplit is disjoint, exhaustive, deterministic, ~fractional") {
    val docs = spark.range(0, 10000).toDF("doc_id")
    val s1 = Sampling.assignSplit(docs, 0.8, 0.1)
    val counts = s1.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == 10000, "exhaustive")
    assert(math.abs(counts("train") - 8000) < 200, counts.toString)
    assert(math.abs(counts("val") - 1000) < 120, counts.toString)
    assert(math.abs(counts("test") - 1000) < 120, counts.toString)
    // deterministic under any partitioning
    val s2 = Sampling.assignSplit(docs.repartition(17), 0.8, 0.1)
    assertSameRows(s1, s2)
    // a different salt draws a genuinely different split
    val s3 = Sampling.assignSplit(docs, 0.8, 0.1, salt = "other")
    val moved = s1.withColumnRenamed("split", "a")
      .join(s3.withColumnRenamed("split", "b"), "doc_id")
      .filter(col("a") =!= col("b")).count()
    assert(moved > 1000, s"salts should decorrelate, moved=$moved")
  }

  test("hashSample keeps ~fraction deterministically, no shuffle") {
    val docs = spark.range(0, 10000).toDF("doc_id")
    val s = Sampling.hashSample(docs, 0.25)
    val n = s.count()
    assert(math.abs(n - 2500) < 150, s"got $n")
    assert(s.queryExecution.executedPlan.toString
      .indexOf("Exchange") < 0, "pure filter must not shuffle")
    assert(Sampling.hashSample(docs.repartition(13), 0.25).count() == n)
  }

  test("stratifiedSample: exactly k per stratum, stable across runs") {
    val docs = Engine.table(spark, sf, "documents")
    val a = Sampling.stratifiedSample(docs, Seq("source"), k = 3)
      .select("source", "doc_id")
    val perStratum = a.groupBy("source").count().collect()
    assert(perStratum.forall(_.getLong(1) == 3), perStratum.mkString(","))
    val b = Sampling.stratifiedSample(docs.repartition(11),
      Seq("source"), k = 3).select("source", "doc_id")
    assertSameRows(a, b)
  }

  test("weightedSample: proportional-ish, weight-guarded, stable") {
    // heavy rows (w=1000) vs light rows (w=1): the heavy group must
    // dominate the sample overwhelmingly
    val rows = (1L to 200L).map(i =>
      (i, if (i <= 100) 1000L else 1L)).toDF("doc_id", "w")
    val got = Sampling.weightedSample(rows, k = 50, weightCol = col("w"))
      .collect().map(_.getLong(0))
    assert(got.length == 50)
    assert(got.count(_ <= 100) >= 45,
      s"heavy-weight rows should dominate, got ${got.count(_ <= 100)}/50")
    // null/zero/negative weights never selected
    val guarded = (1L to 10L).map(i => (i, i % 3 match {
      case 0 => null.asInstanceOf[java.lang.Long]
      case 1 => java.lang.Long.valueOf(0L)
      case _ => java.lang.Long.valueOf(5L)
    })).toDF("doc_id", "w")
    val g = Sampling.weightedSample(guarded, k = 10, weightCol = col("w"))
      .collect().map(_.getLong(0)).toSet
    assert(g == (1L to 10L).filter(_ % 3 == 2).toSet)
    // deterministic under repartitioning
    val a = Sampling.weightedSample(rows, 20, col("w"))
      .select("doc_id")
    val b = Sampling.weightedSample(rows.repartition(13), 20, col("w"))
      .select("doc_id")
    assertSameRows(a, b)
  }

  // ----------------------------------------------------------- chunking

  test("chunkDocuments covers every token and respects the overlap") {
    val n = 64; val ov = 16; val stride = n - ov
    val docs = Seq(
      (1L, (1 to 150).map(i => s"w$i").mkString(" ")), // 150 tokens
      (2L, (1 to 64).map(i => s"x$i").mkString(" ")),  // exactly one chunk
      (3L, "short doc"),
      (4L, "")).toDF("doc_id", "text")
    val chunks = TextOps.chunkDocuments(docs, n, ov)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    val byDoc = chunks.groupBy(_._1)
    // doc 1: chunks at 0,48,96 → 3 chunks; last covers tokens 97..150
    assert(byDoc(1L).length == 3)
    val c1 = byDoc(1L).sortBy(_._2).map(_._3.split(" ").toSeq)
    assert(c1(0).head == "w1" && c1(0).length == 64)
    assert(c1(1).head == "w49", "stride 48 → second chunk starts at 49")
    assert(c1(2).last == "w150", "last chunk reaches the end")
    // consecutive chunks share exactly `ov` tokens
    assert(c1(0).takeRight(ov) == c1(1).take(ov))
    // every token appears in some chunk
    assert(c1.flatten.toSet == (1 to 150).map(i => s"w$i").toSet)
    assert(byDoc(2L).length == 1 && byDoc(2L).head._3.split(" ").length == 64)
    assert(byDoc(3L).length == 1 && byDoc(3L).head._3 == "short doc")
    assert(byDoc(4L).length == 1, "empty doc still yields one row")
  }

  test("chunkDocuments is map-only (no shuffle)") {
    val df = TextOps.chunkDocuments(
      Engine.table(spark, sf, "documents"), 64, 16)
    df.collect()
    assert(!df.queryExecution.executedPlan.toString.contains("Exchange"),
      "chunking must be a pure row expansion")
  }

  // ---------------------------------------------------------- pii scrub

  test("scrubPii replaces urls/emails/long numbers and counts them") {
    val docs = Seq(
      (1L, "mail bob.smith+x@corp.co.uk and https://a.io/p?q=1 ref 123456789"),
      (2L, "clean text with 123 short number"),
      (3L, "u@v.com u@v.com")).toDF("doc_id", "text")
    val out = TextOps.scrubPii(docs).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))).toMap
    assert(out(1L) == ((1L, 1L, 1L,
      "mail <EMAIL> and <URL> ref <NUM>")))
    assert(out(2L) == ((0L, 0L, 0L, "clean text with 123 short number")))
    assert(out(3L) == ((0L, 2L, 0L, "<EMAIL> <EMAIL>")))
  }

  // ------------------------------------------------------------ layout

  test("writeZOrdered: a 2-D box intersects few files; hash layout all") {
    import graft.operators.Layout
    val n = 200000
    val df = spark.range(0, n).select(
      (col("id") * 2654435761L % 1024).as("x"),
      (col("id") * 40503L % 1024).as("y"),
      col("id").as("payload"))
    val zDir = tmpDir("zorder")
    val hDir = tmpDir("hashlay")
    Layout.writeZOrdered(df, zDir, "x", "y", nFiles = 16, bits = 10)
    df.repartition(16).write.mode("overwrite").parquet(hDir)

    // per-FILE min/max envelope of both dims — the exact stats a
    // parquet footer exposes for row-group skipping
    def intersecting(dir: String): (Int, Int) = {
      val files = new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.toString)
      val hit = files.count { f =>
        val r = spark.read.parquet(f)
          .agg(min("x"), max("x"), min("y"), max("y")).head()
        val (x0, x1, y0, y1) =
          (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
        // query box: x in [96,160), y in [256,320)
        x1 >= 96 && x0 < 160 && y1 >= 256 && y0 < 320
      }
      (hit, files.length)
    }
    val (zHit, zAll) = intersecting(zDir)
    val (hHit, hAll) = intersecting(hDir)
    assert(hHit == hAll,
      s"hash layout: every file spans the full range ($hHit/$hAll)")
    assert(zHit <= zAll / 4,
      s"z-order: a small box must touch few files, got $zHit/$zAll")
    // and the box answer is layout-independent
    val box = (d: String) => spark.read.parquet(d)
      .filter(col("x").between(96, 159) && col("y").between(256, 319))
      .agg(count(lit(1)), sum("payload")).head()
    assert(box(zDir) == box(hDir))
  }

  test("buildFileIndex + indexedScan: point lookup reads only the files " +
      "carrying the value; hot value falls back to the full scan") {
    import graft.operators.Layout
    val n = 100000
    // k is range-clustered across 16 files; "hot" is in every row of
    // half the key space so its file list exceeds the fallback fraction
    val df = spark.range(0, n).select(
      (col("id") % 1000).as("k"),
      when(col("id") % 1000 < 500, lit(7L)).otherwise(col("id") % 13)
        .as("hot"),
      col("id").as("payload"))
      .repartitionByRange(16, col("k"))
    val dir = tmpDir("fileidx")
    df.write.mode("overwrite").parquet(s"$dir/data")
    Layout.buildFileIndex(spark, s"$dir/data", "k", s"$dir/idx_k")
    Layout.buildFileIndex(spark, s"$dir/data", "hot", s"$dir/idx_hot")

    val full = spark.read.parquet(s"$dir/data")
    val totalFiles = full.inputFiles.length
    assert(totalFiles >= 8, s"fixture must be multi-file: $totalFiles")

    // selective point scan: correct rows, pruned file set
    val scan = Layout.indexedScan(spark, s"$dir/data", s"$dir/idx_k",
      "k", Seq(3L, 700L))
    val want = full.filter(col("k").isin(3L, 700L))
      .agg(count(lit(1)), sum("payload")).head()
    assert(scan.agg(count(lit(1)), sum("payload")).head() == want)
    assert(scan.inputFiles.length < totalFiles / 2,
      s"index must prune: ${scan.inputFiles.length}/$totalFiles files")

    // absent value: zero rows, schema intact
    val none = Layout.indexedScan(spark, s"$dir/data", s"$dir/idx_k",
      "k", Seq(999999L))
    assert(none.count() == 0 && none.columns.sameElements(full.columns))

    // hot value present in >50% of files: falls back to the plain scan
    // (same answer, no pruning attempted)
    val hot = Layout.indexedScan(spark, s"$dir/data", s"$dir/idx_hot",
      "hot", Seq(7L))
    assert(hot.inputFiles.length == totalFiles,
      "hot value must fall back to the full-path scan")
    assert(hot.count() == full.filter(col("hot") === 7L).count())
  }

  test("indexedScan / statsRangeScan staleness guard: files appended " +
      "after the build void the snapshot and fall back to the full scan") {
    import graft.operators.Layout
    val df = spark.range(0, 10000).select(
      (col("id") % 100).as("k"), col("id").as("payload"))
      .repartitionByRange(8, col("k"))
    val dir = tmpDir("fileidx_stale")
    df.write.mode("overwrite").parquet(s"$dir/data")
    Layout.buildFileIndex(spark, s"$dir/data", "k", s"$dir/idx")
    Layout.buildFileStats(spark, s"$dir/data", "k", s"$dir/stats")
    // append rows for an indexed value AFTER the build — a pruned scan
    // over the stale snapshot would silently drop them
    spark.range(0, 10).select(lit(3L).as("k"),
        (col("id") + 1000000L).as("payload"))
      .write.mode("append").parquet(s"$dir/data")
    val full = spark.read.parquet(s"$dir/data")
    val scan = Layout.indexedScan(spark, s"$dir/data", s"$dir/idx",
      "k", Seq(3L))
    assert(scan.count() == full.filter(col("k") === 3L).count(),
      "stale index must not lose appended rows")
    assert(scan.inputFiles.length == full.inputFiles.length,
      "stale snapshot must fall back to the full-path scan")
    val range = Layout.statsRangeScan(spark, s"$dir/data", s"$dir/stats",
      "k", 3L, 3L)
    assert(range.count() == full.filter(col("k") === 3L).count(),
      "stale stats must not lose appended rows")
    // rebuilding restores pruning
    Layout.buildFileIndex(spark, s"$dir/data", "k", s"$dir/idx")
    val rebuilt = Layout.indexedScan(spark, s"$dir/data", s"$dir/idx",
      "k", Seq(3L))
    assert(rebuilt.count() == full.filter(col("k") === 3L).count())
    assert(rebuilt.inputFiles.length < full.inputFiles.length,
      "rebuilt index must prune again")
  }

  test("buildFileStats + statsRangeScan: range reads only intersecting " +
      "files; disjoint range reads none; wide range falls back") {
    import graft.operators.Layout
    val df = spark.range(0, 100000).select(
      (col("id") % 1000).as("k"), col("id").as("payload"))
      .repartitionByRange(16, col("k"))
    val dir = tmpDir("filestats")
    df.write.mode("overwrite").parquet(s"$dir/data")
    Layout.buildFileStats(spark, s"$dir/data", "k", s"$dir/stats")

    val full = spark.read.parquet(s"$dir/data")
    val totalFiles = full.inputFiles.length
    assert(totalFiles >= 8, s"fixture must be multi-file: $totalFiles")

    // selective range: correct rows, pruned file set
    val scan = Layout.statsRangeScan(spark, s"$dir/data", s"$dir/stats",
      "k", 100L, 160L)
    val want = full.filter(col("k").between(100L, 160L))
      .agg(count(lit(1)), sum("payload")).head()
    assert(scan.agg(count(lit(1)), sum("payload")).head() == want)
    assert(scan.inputFiles.length < totalFiles / 2,
      s"stats must prune: ${scan.inputFiles.length}/$totalFiles files")

    // disjoint range: zero rows, schema intact
    val none = Layout.statsRangeScan(spark, s"$dir/data", s"$dir/stats",
      "k", 5000L, 6000L)
    assert(none.count() == 0 && none.columns.sameElements(full.columns))

    // unselective range: falls back to the plain pushed-filter scan
    val wide = Layout.statsRangeScan(spark, s"$dir/data", s"$dir/stats",
      "k", 0L, 999L)
    assert(wide.inputFiles.length == totalFiles,
      "wide range must fall back to the full-path scan")
    assert(wide.count() == full.count())
  }

  test("indexedScan / statsRangeScan on a Hive-partitioned table keep " +
      "partition-column values intact in the pruned read") {
    import graft.operators.Layout
    // dt lives in the directory names, not the leaf files — the pruned
    // read must recover it via basePath or every row comes back with a
    // NULL partition column (and an indexed partition predicate then
    // filters out ALL rows)
    val df = spark.range(0, 20000).select(
      (col("id") % 4).as("dt"), (col("id") % 100).as("k"),
      col("id").as("payload"))
    val dir = tmpDir("partidx")
    df.write.mode("overwrite").partitionBy("dt").parquet(s"$dir/data")
    Layout.buildFileIndex(spark, s"$dir/data", "dt", s"$dir/idx_dt")
    Layout.buildFileIndex(spark, s"$dir/data", "k", s"$dir/idx_k")
    Layout.buildFileStats(spark, s"$dir/data", "k", s"$dir/stats_k")
    val full = spark.read.parquet(s"$dir/data")

    // index ON the partition column: pruned scan must return its rows
    val byDt = Layout.indexedScan(spark, s"$dir/data", s"$dir/idx_dt",
      "dt", Seq(2))
    val wantDt = full.filter(col("dt") === 2)
      .agg(count(lit(1)), sum("payload")).head()
    assert(byDt.agg(count(lit(1)), sum("payload")).head() == wantDt)

    // index on a data column: partition column must survive un-NULLed
    val byK = Layout.indexedScan(spark, s"$dir/data", s"$dir/idx_k",
      "k", Seq(7L))
    assert(byK.filter(col("dt").isNull).count() == 0,
      "partition column must not be NULL in the pruned read")
    assert(byK.groupBy("dt").count().count() ==
      full.filter(col("k") === 7L).select("dt").distinct().count())

    val byRange = Layout.statsRangeScan(spark, s"$dir/data",
      s"$dir/stats_k", "k", 10L, 20L)
    assert(byRange.filter(col("dt").isNull).count() == 0)
    assert(byRange.count() == full.filter(col("k").between(10L, 20L)).count())
  }

  test("zValueN: exact 3-D bit interleave; 2-col form equals zValue") {
    def morton3(x: Long, y: Long, z: Long, bits: Int): Long =
      (0 until bits).foldLeft(0L) { (acc, b) =>
        acc |
          (((x >>> b) & 1L) << (b * 3)) |
          (((y >>> b) & 1L) << (b * 3 + 1)) |
          (((z >>> b) & 1L) << (b * 3 + 2))
      }
    val rows = Seq((5L, 3L, 6L), (0L, 0L, 0L), (7L, 7L, 7L),
      (1L, 2L, 4L)).toDF("x", "y", "z")
    val got = rows.select(col("x"), col("y"), col("z"),
      Layout.zValueN(Seq(col("x"), col("y"), col("z")), 3).as("zv"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(3) ==
        morton3(r.getLong(0), r.getLong(1), r.getLong(2), 3))
    }
    // 2-column zValueN is bit-identical to the original zValue
    val both = rows.select(
      Layout.zValue(col("x"), col("y"), 20).as("a"),
      Layout.zValueN(Seq(col("x"), col("y")), 20).as("b")).collect()
    assert(both.forall(r => r.getLong(0) == r.getLong(1)))
  }

  // --------------------------------------------------------- vocabulary

  test("vocabulary counts tf and df with deterministic tie-break") {
    val docs = Seq((1L, "a b a"), (2L, "b c"), (3L, "b a"))
      .toDF("doc_id", "text")
    val v = TextOps.vocabulary(docs, topN = 3).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(v.toSeq == Seq(("a", 3L, 2L), ("b", 3L, 3L), ("c", 1L, 1L)))
  }
}
