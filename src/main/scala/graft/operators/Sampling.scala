package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling and dataset-split operators for training-data
  * pipelines (SURVEY.md §7E adjunct; reference sampling diagnostics
  * P12 generalized to corpus curation).
  *
  * Everything here keys off a SALTED CONTENT-INDEPENDENT HASH of the
  * row id (md5 of `id || salt`), not `rand()`:
  *  - reproducible across runs, engines, partitionings and cluster
  *    sizes (Spark's `rand(seed)` is partition-index dependent — adding
  *    one executor reshuffles the sample);
  *  - a new salt draws a fresh independent sample, so repeated
  *    experiments don't reuse the same "random" rows;
  *  - split assignment is a pure projection: the 100 TB corpus maps
  *    through with ZERO shuffles, and train/val/test are guaranteed
  *    disjoint because assignment is a function of the id alone.
  */
object Sampling {

  /** The portable ranking key: lowercase-hex md5 of (id, salt).
    * Uniform over [0,16^32), identical in any engine with md5 —
    * which is what lets the DuckDB oracle check these operators
    * bit-for-bit. */
  def hashRank(id: Column, salt: String): Column =
    md5(concat(id.cast("string"), lit(salt)))

  /** Deterministic stratified sample: the `k` rows with the smallest
    * salted hash per stratum — the distributed equivalent of per-group
    * reservoir sampling, but reproducible. Runs on the bounded-heap
    * [[graft.plans.TopKPerGroup]] operator: one shuffle on the strata
    * key, no per-group sort, state per group is O(k) however large the
    * stratum. */
  def stratifiedSample(df: DataFrame, strataCols: Seq[String],
      k: Int, idCol: String = "doc_id",
      salt: String = "graft"): DataFrame = {
    val ranked = df.withColumn("__rank", hashRank(col(idCol), salt))
    graft.plans.TopKPerGroup.topKPerGroup(ranked,
        strataCols.map(col), Seq(col("__rank").asc), k)
      .drop("__rank")
  }

  /** Deterministic fractional sample: keep a row iff its salted hash
    * falls below the fraction's threshold. Pure filter — pushes to the
    * scan, no shuffle, no state; `fraction` is honored in expectation
    * (hash-uniform), exactly reproducible. */
  def hashSample(df: DataFrame, fraction: Double,
      idCol: String = "doc_id", salt: String = "graft"): DataFrame =
    df.filter(hashRank(col(idCol), salt) < lit(hexThreshold(fraction)))

  /** Train/val/test split assignment as a pure projection. Fractions
    * are quantized to 1/65536 resolution on the first 4 hex chars of
    * the salted hash; buckets `[0, t1) -> train, [t1, t2) -> val,
    * rest -> test`. Disjoint and exhaustive by construction. */
  def assignSplit(df: DataFrame, trainFrac: Double, valFrac: Double,
      idCol: String = "doc_id", salt: String = "graft"): DataFrame = {
    require(trainFrac >= 0 && valFrac >= 0 && trainFrac + valFrac <= 1,
      s"bad fractions: train=$trainFrac val=$valFrac")
    val b = substring(hashRank(col(idCol), salt), 1, 4)
    df.withColumn("split",
      when(b < lit(hex4(trainFrac)), "train")
        .when(b < lit(hex4(trainFrac + valFrac)), "val")
        .otherwise("test"))
  }

  /** Domain-mixture resampling: per-stratum deterministic downsampling
    * to target weights — the step that turns a raw crawl into a
    * training mixture ("keep all of wiki, 25% of crawl, 10% of the
    * rest"). A row survives iff its salted hash prefix falls below its
    * stratum's threshold, so the sample is a pure filter (pushes to the
    * scan, zero shuffles at any corpus size), reproducible on any
    * cluster, and strata are sampled INDEPENDENTLY — changing one
    * source's weight never disturbs another's sample. */
  def mixtureSample(df: DataFrame, strataCol: String,
      weights: Map[String, Double], defaultFrac: Double = 0.0,
      idCol: String = "doc_id", salt: String = "graft"): DataFrame = {
    val pref = substring(hashRank(col(idCol), salt), 1, 8)
    val thr = weights.toSeq.sortBy(_._1).foldLeft(
      lit(hexThreshold(defaultFrac)): Column) { case (acc, (s, f)) =>
        when(col(strataCol) === s, lit(hexThreshold(f))).otherwise(acc)
      }
    df.filter(pref < thr)
  }

  /** Per-stratum quota cap (the anti-over-representation pass of web
    * corpus curation: no single domain may contribute more than `k`
    * documents, keeping its "best" by `order`). Deterministic, and
    * scale-safe through [[graft.plans.TopKPerGroup]]: a bounded heap
    * per stratum — never a window sort of the stratum's full row set,
    * which at 100 TB would funnel a hot domain into one sorting task. */
  def sourceCap(df: DataFrame, strataCol: String, k: Int,
      order: Seq[Column]): DataFrame =
    graft.plans.TopKPerGroup.topKPerGroup(df, Seq(col(strataCol)),
      order, k)

  /** Temperature-flattened mixture at alpha = 0.5 (the multilingual
    * sampling rule: resulting stratum shares ∝ n_s^alpha, so dominant
    * sources are damped and small sources surface). With alpha = 1/2
    * the keep-count has an EXACT closed form in integer arithmetic —
    * m_s = floor(sqrt(n_s * n_min)) — because IEEE-754 sqrt is
    * correctly rounded: any engine computes the identical m_s, which
    * is what lets the DuckDB oracle check this operator bit-for-bit
    * (a general-alpha pow() has no such cross-engine guarantee).
    * The smallest stratum is kept whole (m_min = n_min: flattening
    * only ever downsamples — no upsampling/duplication), and each
    * stratum keeps its m_s smallest-salted-hash rows, so the survivor
    * set is reproducible and changing one stratum's size never
    * disturbs another's sample.
    *
    * Shape at 100 TB: the stratum counts are one tiny partial-agg
    * groupBy (rows = #strata), broadcast-joined back; survivor
    * selection is [[graft.plans.TopKPerGroup.quotaPerGroup]]'s bounded
    * heap — one shuffle on the stratum key, no window sort. */
  def temperatureMixture(df: DataFrame, strataCol: String,
      idCol: String = "doc_id", salt: String = "graft"): DataFrame = {
    val counts = df.groupBy(col(strataCol)).agg(count(lit(1)).as("__n"))
    val nMin = counts.agg(min(col("__n"))).withColumnRenamed("min(__n)",
      "__nmin")
    val quotas = counts.crossJoin(broadcast(nMin))
      .select(col(strataCol),
        floor(sqrt(col("__n").cast("double") *
          col("__nmin").cast("double"))).cast("long").as("__quota"))
    df.join(broadcast(quotas), Seq(strataCol))
      .withColumn("__rank", hashRank(col(idCol), salt))
      .transform(j => graft.plans.TopKPerGroup.quotaPerGroup(j,
        Seq(col(strataCol)), Seq(col("__rank").asc, col(idCol).asc),
        col("__quota")))
      .drop("__rank", "__quota")
  }

  /** Deterministic weighted sampling WITHOUT replacement (Efraimidis &
    * Spirakis 2006's exponential-race formulation — public algorithm):
    * each row draws a uniform u from its salted content hash and races
    * with key `-ln(u) / w`; the k SMALLEST keys win, which selects
    * each row with probability proportional to its weight among the
    * not-yet-chosen — the quality-weighted corpus subsample step
    * ("sample 1M docs ∝ quality score").
    *
    * Determinism: u comes from the first 13 hex chars of the salted
    * md5 (52 bits — exactly a double mantissa, so the u derivation is
    * exact in any engine); ln and the division are correctly-rounded-
    * to-~1-ulp in practice, and the k-th/(k+1)-th key gap is ~1/n
    * relative, so selection is engine-stable (the DuckDB oracle
    * recomputes it bit-for-bit on the same formula). Rows with
    * non-positive or null weight never win (they get key +inf).
    *
    * Scale shape: the key is a pure projection; global top-k runs as
    * TakeOrdered (per-partition heaps, driver merges k rows) and the
    * per-stratum variant as [[graft.plans.TopKPerGroup]]'s bounded
    * heap — no full sort, no window, one (or zero) shuffle. */
  def weightedSample(df: DataFrame, k: Int, weightCol: Column,
      strataCols: Seq[String] = Seq.empty, idCol: String = "doc_id",
      salt: String = "graft"): DataFrame = {
    val key = weightedKey(col(idCol), weightCol, salt)
    // ineligible rows are excluded outright (not just ranked +inf):
    // they must not surface even when fewer than k rows are eligible
    val keyed = df.filter(weightCol.isNotNull && weightCol > 0)
      .withColumn("__wkey", key)
    val picked =
      if (strataCols.isEmpty) keyed.orderBy(col("__wkey").asc).limit(k)
      else graft.plans.TopKPerGroup.topKPerGroup(keyed,
        strataCols.map(col), Seq(col("__wkey").asc), k)
    picked.drop("__wkey")
  }

  /** The exponential race key: `-ln((h52 + 1) / 2^52) / w`, h52 = the
    * 52-bit salted hash prefix. Exposed for oracle-mirroring tests. */
  private[graft] def weightedKey(id: Column, w: Column,
      salt: String): Column = {
    val h52 = conv(substring(hashRank(id, salt), 1, 13), 16, 10)
      .cast("long")
    when(w.isNull || w <= 0, lit(Double.PositiveInfinity))
      .otherwise(-log((h52.cast("double") + 1d) / 4503599627370496d) /
        w.cast("double"))
  }

  /** Deterministic global shuffle for training export: every row gets a
    * salted-hash shuffle key and the frame is globally ordered by it —
    * a reproducible pseudo-random permutation of the corpus (what an
    * exporter runs so training sequences don't arrive in crawl order).
    * Spark executes the global sort as a range-partitioned sort (sample
    * → range exchange → per-partition sort): every partition sorts in
    * parallel and output files are globally ordered, so the 100 TB path
    * is the same plan, wider. A fresh salt draws a fresh permutation. */
  def shuffledOrder(df: DataFrame, idCol: String = "doc_id",
      salt: String = "graft"): DataFrame =
    df.withColumn("shuffle_rank", hashRank(col(idCol), salt))
      .orderBy("shuffle_rank")

  /** First-4-hex-chars threshold for a fraction: the bucket prefix is
    * uniform over 0x0000..0xffff, so `prefix < hex4(f)` selects
    * floor(f * 65536) / 65536 of the rows. frac >= 1 returns "g",
    * which every hex string sorts below (select-all). */
  private[graft] def hex4(frac: Double): String = {
    val t = (math.max(0.0, frac) * 65536).toLong
    if (t >= 65536L) "g" else f"$t%04x"
  }

  /** 8-hex-char threshold for [[hashSample]] (2^-32 resolution),
    * compared against the hash prefix by string order. */
  private[graft] def hexThreshold(frac: Double): String = {
    val t = (math.max(0.0, frac) * 4294967296L).toLong
    if (t >= 4294967296L) "g" else f"$t%08x"
  }
}
