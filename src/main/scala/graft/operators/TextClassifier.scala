package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.dsum12

/** Model-scored document filtering — the "quality classifier" stage of
  * an LLM curation pipeline (CCNet/GPT-3-style: train a linear
  * classifier on weak labels, score the whole corpus, filter by the
  * score; the reference's profile platform calls the same move 挖掘类
  * 标签 — model-predicted user tags, docs/画像简介.md:21-23). Features
  * are hashed bag-of-words presence (the classic hashing trick), the
  * model is logistic regression trained by full-batch gradient
  * descent — all as DataFrame aggregations.
  *
  * Scale shape (100 TB): training state on the driver is ONE dense
  * weight vector (`dim` doubles — bounded, independent of corpus
  * size). Each GD iteration is a single distributed job: margins via
  * broadcast-join of the weight table + per-doc sum, residuals, then
  * per-bucket gradient partial-aggregated and collected (<= dim rows).
  * Scoring is map-side only (broadcast weights, no shuffle except the
  * per-doc sum's hash agg). Gradient and margin accumulation run in
  * exact DECIMAL ([[graft.functions.dsum12]]) so training is
  * bit-deterministic under ANY partitioning — the same corpus trains
  * to the same model on one executor or a thousand.
  */
object TextClassifier {

  /** Sentinel feature present in every document — its weight IS the
    * bias term, so one gradient aggregation covers weights and bias. */
  val BiasBucket: Int = -1

  /** Whitespace-token presence features, hashed into `dim` buckets:
    * sorted distinct bucket ids per document (plus the bias bucket). */
  def hashedFeatures(docs: DataFrame, textCol: String, dim: Int,
      out: String = "fx"): DataFrame =
    docs.withColumn(out,
      array_union(
        array_sort(array_distinct(transform(
          filter(split(col(textCol), "\\s+"), t => t =!= ""),
          t => pmod(xxhash64(t), lit(dim.toLong)).cast("int")))),
        array(lit(BiasBucket))))

  /** Full-batch logistic regression over presence features, optimized
    * with Adagrad (per-coordinate step sizes — plain fixed-step GD
    * oscillates badly here because presence features are heavily
    * shared across documents, so the Hessian is ill-conditioned).
    * `idCol` must be a unique document key; `labelCol` is 0/1.
    * Returns the learned weights as a bucket->weight map (driver-side,
    * <= dim+1 entries, [[BiasBucket]] carrying the bias).
    *
    * Determinism: gradients aggregate in exact DECIMAL, the Adagrad
    * state is a driver-side dense vector updated in a fixed bucket
    * order — the same corpus trains to the bit-identical model under
    * any partitioning. The training set is cached across iterations
    * (each iteration is one job over it). */
  /** Margin of each row under the model `w`: a sequential fold over
    * the (sorted, fixed-order) feature array against a LITERAL weight
    * map — map-side only, no join, no shuffle; deterministic because
    * the fold order is the array order. The active weight set is tiny
    * (bounded by vocabulary, never corpus), so the literal stays small
    * even at dim 4096. */
  private def marginCol(w: Map[Int, Double], featCol: String): Column =
    if (w.isEmpty) lit(0.0)
    else {
      val ks = w.keys.toArray.sorted
      val wm = map_from_arrays(lit(ks), lit(ks.map(w)))
      aggregate(col(featCol), lit(0.0),
        (acc, f) => acc + coalesce(element_at(wm, f), lit(0.0)))
    }

  def trainLogistic(docs: DataFrame, idCol: String, featCol: String,
      labelCol: String, iters: Int, lr: Double): Map[Int, Double] = {
    val data0 = docs.select(col(idCol).as("id"), col(featCol).as("fx"),
      col(labelCol).cast("double").as("y")).cache()
    val n = data0.count().toDouble
    // iters sequential jobs run over this set: right-size the task
    // count to the data (a 5k-doc training set split over 32 cached
    // partitions pays 32x the task overhead per iteration for nothing;
    // a 100 TB-scale set keeps its parallelism — ~20k docs per task)
    val parts = math.max(1, math.min(
      data0.rdd.getNumPartitions, (n / 20000).toInt + 1))
    val data =
      if (parts < data0.rdd.getNumPartitions)
        data0.coalesce(parts).cache()
      else data0
    var w = Map.empty[Int, Double].withDefaultValue(0.0)
    val gsq = scala.collection.mutable.Map.empty[Int, Double]
      .withDefaultValue(0.0)
    var zeroStreak = 0
    try {
      var it = 0
      while (it < iters && zeroStreak < 2) {
        it += 1
        // one job per iteration, ONE shuffle: margins and residuals
        // are map-side ([[marginCol]]), only the per-bucket gradient
        // partials exchange (<= dim rows after map-side combine). The
        // train-set error rides along as an observed metric (no extra
        // job) and drives early stopping — two consecutive error-free
        // iterations end training, so the iteration count adapts to
        // the corpus instead of being a hand-tuned constant.
        val watch = org.apache.spark.sql.Observation()
        val grads = data
          .withColumn("m", marginCol(w, "fx"))
          .withColumn("r", lit(1.0) / (lit(1.0) + exp(-col("m"))) - col("y"))
          .observe(watch, sum(((col("m") > 0.0) =!= (col("y") === 1.0))
            .cast("long")).as("wrong"))
          .select(explode(col("fx")).as("f"), col("r"))
          .groupBy("f").agg(dsum12(col("r")).as("g"))
          .collect()
        val upd = grads
          .map(r => r.getInt(0) -> r.getDouble(1) / n)
          .sortBy(_._1)
          .map { case (f, g) =>
            gsq(f) += g * g
            f -> (w(f) - lr * g / math.sqrt(gsq(f) + 1e-8))
          }
        w = (w ++ upd).withDefaultValue(0.0)
        // empty training set: the observed-metrics map has no entry
        // (and a 0-row sum would be null) — trivially converged
        val wrong = watch.get.getOrElse("wrong", null) match {
          case l: java.lang.Long => l.longValue
          case _ => 0L
        }
        zeroStreak = if (wrong == 0L) zeroStreak + 1 else 0
      }
    } finally { data.unpersist(); data0.unpersist() }
    w
  }

  /** Sentinel "pair partner" collecting gradient terms in the same
    * aggregation as the Hessian pairs. */
  private val GradSentinel = -2

  /** Ridge-regularized Newton (IRLS) training — the fast path when the
    * ACTIVE feature set is small (bounded vocabulary): one job per
    * iteration emits gradient AND Hessian partials through a single
    * (f1, f2)-keyed exact-decimal aggregation (the gradient rides the
    * [[GradSentinel]] partner), the driver solves the dense
    * (p+ridge I) system by deterministic Gaussian elimination, and the
    * observed train-set error early-stops. Converges in ~3 iterations
    * where first-order methods need tens — but materializes
    * |actives|^2 pairs per document, so callers gate on `maxActive`
    * (default 512 -> <=262k Hessian cells) and fall back to
    * [[trainLogistic]] beyond it. Pick by the measured rule
    * iters_1st x n vs iters_newton x n x |actives|^2: on the
    * 5k-doc/32-feature conformance corpus Adagrad's ~25 cheap jobs
    * beat Newton's ~3 heavy ones (4.4s vs 7.0s isolated), so Newton's
    * niche is fewer documents with richer per-document features, or
    * per-job fixed overhead (a busy shared cluster) dominating row
    * throughput. Ridge keeps the step finite on
    * separable data (plain Newton diverges there: the MLE is at
    * infinity). Bit-deterministic end to end: decimal partials, fixed
    * elimination order. */
  def trainLogisticNewton(docs: DataFrame, idCol: String, featCol: String,
      labelCol: String, iters: Int = 8, ridge: Double = 1e-3,
      maxActive: Int = 512): Map[Int, Double] = {
    val data = docs.select(col(idCol).as("id"), col(featCol).as("fx"),
      col(labelCol).cast("double").as("y")).cache()
    try {
      val actives = data.select(explode(col("fx")).as("f"))
        .distinct().collect().map(_.getInt(0)).sorted
      require(actives.length <= maxActive,
        s"${actives.length} active features > $maxActive: " +
          "use trainLogistic (Adagrad) for wide feature spaces")
      val p = actives.length
      val pos = actives.zipWithIndex.toMap
      var w = Map.empty[Int, Double].withDefaultValue(0.0)
      var zeroStreak = 0
      var it = 0
      while (it < iters && zeroStreak < 2) {
        it += 1
        val watch = org.apache.spark.sql.Observation()
        // materialize residual/curvature BEFORE the pair explosion —
        // projection collapse would otherwise re-evaluate the HOF
        // margin fold once per pair row (the verify-guide trap)
        val residuals = data
          .withColumn("m", marginCol(w, "fx"))
          .withColumn("pr", lit(1.0) / (lit(1.0) + exp(-col("m"))))
          .withColumn("r", col("pr") - col("y"))
          .withColumn("d", col("pr") * (lit(1.0) - col("pr")))
          .observe(watch, sum(((col("m") > 0.0) =!= (col("y") === 1.0))
            .cast("long")).as("wrong"))
          .select(col("fx"), col("r"), col("d"))
          .cache()
        val cells =
          try residuals
            .select(explode(col("fx")).as("f1"), col("fx"), col("r"),
              col("d"))
            .select(col("f1"),
              explode(concat(col("fx"), array(lit(GradSentinel))))
                .as("f2"),
              col("r"), col("d"))
            .select(col("f1"), col("f2"),
              when(col("f2") === GradSentinel, col("r"))
                .otherwise(col("d")).as("v"))
            .groupBy("f1", "f2").agg(dsum12(col("v")).as("s"))
            .collect()
          finally residuals.unpersist()
        val h = Array.ofDim[Double](p, p)
        val g = new Array[Double](p)
        cells.foreach { row =>
          val i = pos(row.getInt(0))
          val f2 = row.getInt(1)
          if (f2 == GradSentinel) g(i) += row.getDouble(2)
          else h(i)(pos(f2)) += row.getDouble(2)
        }
        var i = 0
        while (i < p) {
          h(i)(i) += ridge
          g(i) += ridge * w(actives(i))
          i += 1
        }
        val step = solveDense(h, g)
        w = actives.zipWithIndex.map { case (f, j) =>
          f -> (w(f) - step(j))
        }.toMap.withDefaultValue(0.0)
        val wrong = watch.get.getOrElse("wrong", null) match {
          case l: java.lang.Long => l.longValue
          case _ => 0L
        }
        zeroStreak = if (wrong == 0L) zeroStreak + 1 else 0
      }
      w
    } finally { data.unpersist(); () }
  }

  /** In-place Gaussian elimination with partial pivoting — fixed
    * operation order, so the solve is bit-deterministic. Mutates its
    * inputs; returns the solution. */
  private def solveDense(a: Array[Array[Double]], b: Array[Double])
      : Array[Double] = {
    val n = b.length
    var col0 = 0
    while (col0 < n) {
      var piv = col0
      var r = col0 + 1
      while (r < n) {
        if (math.abs(a(r)(col0)) > math.abs(a(piv)(col0))) piv = r
        r += 1
      }
      if (piv != col0) {
        val t = a(piv); a(piv) = a(col0); a(col0) = t
        val tb = b(piv); b(piv) = b(col0); b(col0) = tb
      }
      val d = a(col0)(col0)
      r = col0 + 1
      while (r < n) {
        val factor = a(r)(col0) / d
        if (factor != 0.0) {
          var c = col0
          while (c < n) { a(r)(c) -= factor * a(col0)(c); c += 1 }
          b(r) -= factor * b(col0)
        }
        r += 1
      }
      col0 += 1
    }
    val x = new Array[Double](n)
    var i = n - 1
    while (i >= 0) {
      var s = b(i)
      var c = i + 1
      while (c < n) { s -= a(i)(c) * x(c); c += 1 }
      x(i) = s / a(i)(i)
      i -= 1
    }
    x
  }

  /** Score documents with a trained model: adds `margin`, `prob`, and
    * `pred` (margin > 0). Entirely map-side ([[marginCol]]) — scoring
    * a 100 TB corpus is one shuffle-free scan. */
  def scoreLogistic(docs: DataFrame, featCol: String,
      weights: Map[Int, Double], keep: Seq[String]): DataFrame =
    docs
      .select(keep.map(col) :+ marginCol(weights, featCol).as("margin"): _*)
      .withColumn("prob", lit(1.0) / (lit(1.0) + exp(-col("margin"))))
      .withColumn("pred", col("margin") > 0.0)
}
