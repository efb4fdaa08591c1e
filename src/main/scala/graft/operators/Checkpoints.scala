package graft.operators

import org.apache.spark.sql.DataFrame

/** localCheckpoint storage hygiene.
  *
  * `Dataset.localCheckpoint` persists an INTERNAL RDD (the one wrapped
  * by the resulting plan's LogicalRDD); `df.rdd` returns a fresh
  * row-conversion wrapper over it, so `df.rdd.unpersist(...)` silently
  * frees NOTHING (verified empirically: the persistent-RDD registry
  * keeps the blocks). Any code that wants to release checkpoint blocks
  * must unpersist the LogicalRDD's own RDD — this helper is the one
  * place that knows that. */
private[graft] object Checkpoints {

  /** The RDD actually persisted by a localCheckpoint'd frame, if the
    * frame is one. */
  def underlying(df: DataFrame): Option[org.apache.spark.rdd.RDD[_]] =
    df.queryExecution.analyzed match {
      case l: org.apache.spark.sql.execution.LogicalRDD => Some(l.rdd)
      case _ => None
    }

  /** Release a localCheckpoint'd frame's storage (no-op for other
    * plans). Safe while OTHER frames still reference the plan lazily —
    * they would recompute — so call only when the frame is done. */
  def release(df: DataFrame, blocking: Boolean = false): Unit =
    underlying(df).foreach(_.unpersist(blocking))

  /** Read an observed metric with a BOUNDED wait. `Observation.get`
    * blocks FOREVER if the listener bus drops the action's completion
    * event (the shared queue has finite capacity under driver load) —
    * a probe fused into a checkpoint must degrade to an explicit job,
    * never hang. Returns None on timeout or a missing key; the caller
    * runs its explicit fallback then. The observed dataset's action
    * has ALREADY RETURNED at every call site (localCheckpoint is
    * eager), so a healthy listener delivers within the first poll. */
  def metric(obs: org.apache.spark.sql.Observation, key: String,
      timeoutMs: Long = 10000L): Option[Any] = {
    import scala.concurrent.Await
    import scala.concurrent.duration._
    // Observation.future is the Promise's own Future (public in Spark
    // 4.x): a timed Await on it blocks ONLY the calling thread and
    // releases it on timeout — no worker thread is ever parked on a
    // lost completion event, so repeated timeouts stay thread-bounded.
    try {
      val row = Await.result(obs.future, timeoutMs.millis)
      row.schema.fieldNames.zip(row.toSeq).toMap.get(key)
    } catch { case _: java.util.concurrent.TimeoutException => None }
  }
}
