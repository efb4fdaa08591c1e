package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Structured-Streaming operators for the real-time warehouse
  * (SURVEY.md §2.9, reference docs/实时数仓.md).
  *
  * The reference's model is exactly Structured Streaming's: continuous
  * micro-batch jobs (T1), SQL+UDF transforms on stream tables (T2),
  * tumbling windows closed a few seconds late (T3), Kafka-partition
  * local order + watermarks for disorder (T4), and Kappa replay for
  * recompute (T8). Operators below are source-agnostic: they take any
  * streaming DataFrame (Kafka in production, MemoryStream/file in tests
  * — same IncrementalExecution either way).
  */
object StreamOps {

  /** T3: tumbling-window aggregation with allowed lateness. The
    * reference closes the 10:00 window at 10:00:05-10:00:10
    * (docs/实时数仓.md:69-71) — `lateness` is that grace period,
    * expressed as a watermark so state is bounded (T10). */
  def tumblingWindowAgg(events: DataFrame, tsCol: String,
      windowLen: String, lateness: String,
      keyCols: Seq[String]): DataFrame = {
    val keys = window(col(tsCol), windowLen) +: keyCols.map(col)
    events
      .withWatermark(tsCol, lateness)
      .groupBy(keys: _*)
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total"))
  }

  /** J13: stream-dim lookup join — enrich streaming facts from a small
    * static dimension (the reference keeps dims in an HBase KV store,
    * docs/实时数仓.md:79; Spark's native equivalent is a stream-static
    * BROADCAST join, re-resolved per micro-batch so dim updates are
    * picked up without restarting the query). */
  def dimEnrich(stream: DataFrame, dim: DataFrame,
      streamKey: String, dimKey: String): DataFrame =
    stream.join(broadcast(dim), col(streamKey) === col(dimKey), "left")

  /** T5: late-data drift filter. The streaming compactor can land
    * midnight-straddling rows in the wrong dt partition; DWD re-reads a
    * widened partition range and re-filters on BUSINESS time
    * (docs/实时数仓.md:114-116). Works identically on batch re-reads. */
  def driftFilter(df: DataFrame, partitionCol: String, tsCol: String,
      targetDate: String): DataFrame = {
    val target = to_date(lit(targetDate))
    df.filter(col(partitionCol).cast("date")
        .between(date_sub(target, 1), date_add(target, 1)))
      .filter(col(tsCol).cast("date") === target)
  }

  /** T7: real-time per-key feature/tag computation — watermarked
    * running aggregates per user (流式标签, docs/画像简介.md:11). */
  def streamingUserTags(events: DataFrame, tsCol: String = "ts"): DataFrame =
    events
      .withWatermark(tsCol, "10 seconds")
      .groupBy(col("user_id"), window(col(tsCol), "1 hour"))
      .agg(count(lit(1)).as("events_1h"),
        count(when(col("event_type") === "purchase", 1)).as("buys_1h"),
        sum(when(col("event_type") === "purchase",
          col("value").cast("decimal(18,2)"))).cast("double").as("amt_1h"))

  /** T1/T6: run a streaming DataFrame into a parquet sink dir with a
    * checkpoint, micro-batch trigger. foreachBatch hosts multi-sink
    * fan-out (S8): every micro-batch lands in the main sink and any
    * side sinks (the reference fans out to Kudu/Kafka/HBase/MySQL). */
  def startParquetSink(out: DataFrame, path: String, checkpoint: String,
      sideSinks: Seq[DataFrame => Unit] = Nil,
      intervalMs: Long = 500): StreamingQuery =
    out.writeStream
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(intervalMs))
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.persist()
        try {
          batch.write.mode("append").parquet(path)
          sideSinks.foreach(sink => sink(batch))
        } finally batch.unpersist()
        ()
      }
      .start()

  /** T8: Kappa replay — recompute a result table by re-consuming the
    * source from the beginning into a FRESH checkpoint + staging dir,
    * then atomically swap. `transform` is the shared batch/stream logic
    * (the reference mandates identical logic for both paths,
    * docs/实时数仓.md:93). */
  def kappaReplay(spark: SparkSession, sourceDf: DataFrame,
      transform: DataFrame => DataFrame,
      finalDir: String, stagingDir: String, checkpoint: String): Unit = {
    val q = transform(sourceDf).writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .format("parquet")
      .option("path", stagingDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val fs = new org.apache.hadoop.fs.Path(finalDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(finalDir), true)
    fs.rename(new org.apache.hadoop.fs.Path(stagingDir),
      new org.apache.hadoop.fs.Path(finalDir))
    // drop the FileStreamSink transaction log: its absolute paths point
    // at the staging dir; after the swap the table is a plain parquet dir
    fs.delete(new org.apache.hadoop.fs.Path(finalDir, "_spark_metadata"), true)
  }

  /** T9: batch↔stream differential validation (docs/实时数仓.md:118-124):
    * same aggregation over both paths, full-outer-joined on keys,
    * returning rows outside tolerance (empty = consistent). */
  def differentialValidate(batch: DataFrame, streamed: DataFrame,
      keys: Seq[String], metricCol: String,
      tolerance: Double = 0.0): DataFrame = {
    val b = batch.select((keys.map(col) :+ col(metricCol).as("batch_v")): _*)
    val st = streamed.select(
      (keys.map(col) :+ col(metricCol).as("stream_v")): _*)
    b.join(st, keys, "full_outer")
      .withColumn("abs_diff",
        abs(coalesce(col("batch_v"), lit(0.0)) -
          coalesce(col("stream_v"), lit(0.0))))
      .filter(col("abs_diff") > tolerance ||
        col("batch_v").isNull || col("stream_v").isNull)
  }
}
