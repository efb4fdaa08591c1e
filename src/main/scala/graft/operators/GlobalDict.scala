package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Kylin-style GLOBAL DICTIONARY: a stable, dense `string → long`
  * encoding that lets exact count-distinct over strings run on id
  * bitmaps (reference docs/olap.md:24 — Kylin's precise count-distinct
  * needs a global dict because bitmaps index integers, not strings;
  * the public design is Kylin's AppendTrie global dictionary).
  *
  * Contract the bitmap math depends on:
  *  - DENSE: ids are exactly 0..n-1 (small bitmaps, no holes);
  *  - STABLE: [[extend]] NEVER changes an existing id — segments
  *    encoded yesterday stay valid when today's load appends values;
  *  - DETERMINISTIC: [[build]] on the same value set yields the same
  *    ids on any partitioning (first build sorts; appends sort within
  *    the appended batch).
  *
  * Scale shape: one distinct shuffle + a range-partitioned sort, then
  * the classic two-phase dense-rank — `zipWithIndex` collects one long
  * PER PARTITION to the driver (never data) and assigns offsets
  * per-partition. The anti-join in [[extend]] is the only other
  * exchange. Nothing driver-side is data-proportional; the dict itself
  * stays a DataFrame, joinable/broadcastable like any dimension.
  */
object GlobalDict {

  /** Build a dictionary `(value: string, dict_id: long)` over the
    * distinct non-null values of `valueCol`, ids dense 0..n-1 in
    * lexicographic value order. */
  def build(values: DataFrame, valueCol: String): DataFrame =
    fromOffset(values, valueCol, 0L)

  /** Append new values to an existing dictionary: ids of existing
    * values are untouched (the Kylin append-dict stability property),
    * unseen values get the next dense ids in lexicographic order
    * within the appended batch. */
  def extend(dict: DataFrame, newValues: DataFrame,
      valueCol: String): DataFrame = {
    val fresh = newValues
      .select(col(valueCol).cast("string").as("value"))
      .filter(col("value").isNotNull).distinct()
      .join(dict.select("value"), Seq("value"), "left_anti")
    // one scalar to the driver (the high-water mark), not data
    val next = Option(dict.agg(max("dict_id")).first().get(0))
      .map(_.asInstanceOf[Long] + 1L).getOrElse(0L)
    dict.select("value", "dict_id")
      .unionByName(fromOffset(fresh, "value", next))
  }

  /** Join `dict_id` onto `df.valueCol` (inner: rows with values absent
    * from the dict drop — extend first for full coverage). */
  def encode(df: DataFrame, dict: DataFrame, valueCol: String): DataFrame =
    df.join(dict.withColumnRenamed("value", "__dict_value"),
        df(valueCol) === col("__dict_value"))
      .drop("__dict_value")

  private def fromOffset(values: DataFrame, valueCol: String,
      offset: Long): DataFrame = {
    val spark = values.sparkSession
    import spark.implicits._
    val sorted = values
      .select(col(valueCol).cast("string").as("value"))
      .filter(col("value").isNotNull).distinct()
      // range partitioning: partition i holds values < partition i+1,
      // so per-partition offsets produce the GLOBAL sort rank. Sample-
      // based boundaries vary run to run; ranks do not.
      .repartitionByRange(col("value"))
      .sortWithinPartitions("value")
    sorted.as[String].rdd.zipWithIndex()
      .map { case (v, i) => (v, i + offset) }
      .toDF("value", "dict_id")
  }
}
