package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Observation, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Threshold-gated data-quality rules — the reference's 数据质量验证
  * practice: compute per-model metrics, compare against configured
  * thresholds, alert on breach (reference docs/实时数仓.md:118-124;
  * quality management as a first-class lake concern, docs/数据湖.md:114;
  * "数仓是基础，一定要保证数据质量", docs/画像总结.md:28). The
  * batch-vs-stream differential validator (T9) covers model drift;
  * these rules cover per-table invariants: completeness, uniqueness,
  * bounds, format, row volume, referential integrity.
  *
  * Scale shape: every non-join rule folds into ONE aggregation over
  * one scan of the table (count/conditional-count/count_distinct are
  * all partial-aggregated); each foreign-key rule adds one key-join
  * agg against its dimension. [[observedChecks]] goes further: it
  * attaches the single-pass rules to an EXISTING job via observed
  * metrics, so a production write validates itself with zero extra
  * scans — at 100 TB the check is free.
  */
object QualityChecks {

  sealed trait Rule { def name: String; def minRatio: Double }
  /** Non-null fraction of `column` >= minRatio. */
  final case class Completeness(name: String, column: String,
      minRatio: Double) extends Rule
  /** Distinct fraction of `columns` >= minRatio (1.0 = unique key). */
  final case class Uniqueness(name: String, columns: Seq[String],
      minRatio: Double) extends Rule
  /** Fraction of non-null values inside [lo, hi] >= minRatio. */
  final case class Bounds(name: String, column: String, lo: Double,
      hi: Double, minRatio: Double) extends Rule
  /** Fraction of non-null values matching `regex` >= minRatio. */
  final case class Pattern(name: String, column: String, regex: String,
      minRatio: Double) extends Rule
  /** Fraction of rows whose `column` exists in `dimCol` of `dim` —
    * referential integrity (checked as its own key join). */
  final case class ForeignKey(name: String, column: String,
      dim: DataFrame, dimCol: String, minRatio: Double) extends Rule

  private def ratio(num: Column, den: Column): Column =
    when(den === 0L, lit(1.0)) // vacuous pass on an empty slice
      .otherwise(num.cast("double") / den.cast("double"))

  /** The single-pass rules' metric columns (over one agg). */
  private def metricCols(rules: Seq[Rule]): Seq[Column] =
    count(lit(1)).as("__n") +: rules.collect {
      case Completeness(n, c, _) =>
        ratio(count(col(c)), count(lit(1))).as(n)
      case Uniqueness(n, cs, _) =>
        ratio(count_distinct(struct(cs.map(col): _*)),
          count(lit(1))).as(n)
      case Bounds(n, c, lo, hi, _) =>
        ratio(count(when(col(c).between(lo, hi), 1)),
          count(col(c))).as(n)
      case Pattern(n, c, re, _) =>
        ratio(count(when(col(c).rlike(re), 1)), count(col(c))).as(n)
    }

  /** Evaluate all rules: returns (rule, metric, threshold, pass), one
    * row per rule, ordered by rule name. */
  def run(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    val spark = df.sparkSession
    val single = rules.filter(!_.isInstanceOf[ForeignKey])
    val agg = df.agg(metricCols(single).head, metricCols(single).tail: _*)
      .head()
    val singleRows = single.map { r =>
      (r.name, agg.getAs[Double](r.name), r.minRatio)
    }
    val fkRows = rules.collect { case ForeignKey(n, c, dim, dc, t) =>
      val m = df.select(col(c).as("__k"))
        .join(dim.select(col(dc).as("__k"))
          .distinct().withColumn("__hit", lit(1)), Seq("__k"), "left")
        .agg(ratio(count(col("__hit")), count(lit(1))).as("m"))
        .head().getDouble(0)
      (n, m, t)
    }
    import spark.implicits._
    (singleRows ++ fkRows).toDF("rule", "metric", "threshold")
      .withColumn("pass", col("metric") >= col("threshold"))
      .orderBy("rule")
  }

  /** Attach the single-pass rules to a DataFrame as an [[Observation]]
    * so they ride whatever job consumes it (typically the production
    * write) — zero extra scans. After the action completes, pass the
    * observation to [[evaluate]]. ForeignKey rules are not observable
    * (they need their own join) — use [[run]] for those. */
  def observedChecks(df: DataFrame, rules: Seq[Rule])
      : (DataFrame, Observation) = {
    require(rules.forall(r => !r.isInstanceOf[ForeignKey] &&
        !r.isInstanceOf[Uniqueness]),
      "ForeignKey needs its own join and Uniqueness a distinct " +
        "aggregate (disallowed in observed metrics): use run()")
    val obs = Observation()
    val cols = metricCols(rules)
    (df.observe(obs, cols.head, cols.tail: _*), obs)
  }

  /** Resolve an [[observedChecks]] observation into the same
    * (rule, metric, threshold, pass) frame as [[run]]. */
  def evaluate(spark: SparkSession, obs: Observation,
      rules: Seq[Rule]): DataFrame = {
    val m = obs.get
    import spark.implicits._
    rules.map(r => (r.name,
        m.getOrElse(r.name, 1.0).asInstanceOf[Double], r.minRatio))
      .toDF("rule", "metric", "threshold")
      .withColumn("pass", col("metric") >= col("threshold"))
      .orderBy("rule")
  }
}
