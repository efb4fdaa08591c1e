package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{RelationTimeTravel, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.Cast
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.TimestampType

/** SQL-text time travel for [[graft.operators.VersionedTable]] —
  * the reference's surface is SQL-first (reference docs/数仓.md), so
  * `VERSION AS OF` / `TIMESTAMP AS OF` must work as SQL text, not
  * only through the Scala API:
  *
  * {{{
  *   SELECT * FROM vtab.`/path/to/table` VERSION AS OF 2
  *   SELECT * FROM vtab.`/path/to/table` TIMESTAMP AS OF '2026-08-16 12:00:00'
  *   SELECT * FROM vtab.`/path/to/table`            -- latest snapshot
  * }}}
  *
  * Spark's OWN parser already produces [[RelationTimeTravel]] for the
  * `AS OF` clauses (SPARK-37219) — no parser injection needed; this
  * resolution rule gives the `vtab.`-prefixed path identifiers a
  * meaning (the same path-as-identifier convention as
  * `delta.`/path``). Version resolution goes through
  * [[graft.operators.VersionedTable.read]], timestamp resolution
  * through the effective-commit-time rules of
  * [[graft.operators.VersionedTable.versionAsOf]] (mtime-bounded
  * fallback + monotonization), so SQL and Scala answers agree by
  * construction. The rule substitutes the analyzed snapshot plan —
  * a plain pruned parquet scan of the manifest's live dirs — so
  * pushdown/pruning behave exactly as the Scala path. */
case class VTabTimeTravelRule(spark: SparkSession) extends Rule[LogicalPlan] {

  private def rootOf(u: UnresolvedRelation): Option[String] = {
    val parts = u.multipartIdentifier
    if (parts.length == 2 && parts.head.equalsIgnoreCase("vtab"))
      Some(parts(1))
    else None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    plan.resolveOperatorsUp {
      case RelationTimeTravel(u: UnresolvedRelation, ts, version)
          if rootOf(u).isDefined =>
        val root = rootOf(u).get
        val df = version match {
          case Some(v) =>
            graft.operators.VersionedTable.read(spark, root,
              Some(java.lang.Long.parseLong(v.trim)))
          case None =>
            val e = ts.getOrElse(throw new IllegalArgumentException(
              s"vtab.`$root`: AS OF needs a version or timestamp"))
            require(e.foldable,
              s"vtab.`$root`: TIMESTAMP AS OF must be a literal, got $e")
            val micros = Cast(e, TimestampType,
              Some(conf.sessionLocalTimeZone)).eval()
            require(micros != null,
              s"vtab.`$root`: TIMESTAMP AS OF value does not parse: $e")
            graft.operators.VersionedTable.readAsOfTimestamp(spark, root,
              micros.asInstanceOf[Long] / 1000L)
        }
        df.queryExecution.analyzed
      case u: UnresolvedRelation if rootOf(u).isDefined =>
        graft.operators.VersionedTable.read(spark, rootOf(u).get)
          .queryExecution.analyzed
    }
  }
}
