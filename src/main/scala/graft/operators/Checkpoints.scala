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
}
