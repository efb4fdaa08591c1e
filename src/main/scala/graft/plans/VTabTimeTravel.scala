package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{RelationTimeTravel, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.TimestampType

/** SQL-text surface for [[graft.operators.VersionedTable]] — the
  * reference's surface is SQL-first (reference docs/数仓.md), so time
  * travel, history, and CDC must work as SQL text, not only through
  * the Scala API:
  *
  * {{{
  *   SELECT * FROM vtab.`/path` VERSION AS OF 2          -- snapshot
  *   SELECT * FROM vtab.`/path` TIMESTAMP AS OF '2026-08-16 12:00:00'
  *   SELECT * FROM vtab.`/path`                          -- latest
  *   SELECT * FROM vtab_history.`/path`                  -- DESCRIBE HISTORY
  *   SELECT * FROM vtab_changes.`/path` VERSION AS OF 1  -- CDC since v1
  *   SELECT * FROM vtab_changes.`/path` TIMESTAMP AS OF '…'
  * }}}
  *
  * Spark's OWN parser already produces [[RelationTimeTravel]] for the
  * `AS OF` clauses (SPARK-37219) — no parser injection needed; this
  * resolution rule gives the `vtab*.`-prefixed path identifiers a
  * meaning (the same path-as-identifier convention as
  * `delta.`/path``). Version resolution goes through
  * [[graft.operators.VersionedTable.read]], timestamp resolution
  * through the effective-commit-time rules of
  * [[graft.operators.VersionedTable.versionAsOf]] (mtime-bounded
  * fallback + monotonization), `vtab_changes` through
  * [[graft.operators.VersionedTable.changesBetween]] (AS OF = the
  * CHANGES-SINCE anchor, Delta's table_changes semantics), and
  * `vtab_history` through
  * [[graft.operators.VersionedTable.describeHistory]] — so SQL and
  * Scala answers agree by construction. The rule substitutes the
  * analyzed snapshot plan — a plain pruned parquet scan of the
  * manifest's live dirs — so pushdown/pruning behave exactly as the
  * Scala path. All three forms are READ-ONLY: no side effects, so
  * repeated analysis (EXPLAIN, retries) is safe. */
case class VTabTimeTravelRule(spark: SparkSession) extends Rule[LogicalPlan] {

  private val kinds = Set("vtab", "vtab_history", "vtab_changes")

  private def idOf(u: UnresolvedRelation): Option[(String, String)] = {
    val parts = u.multipartIdentifier
    if (parts.length == 2 && kinds.contains(parts.head.toLowerCase))
      Some((parts.head.toLowerCase, parts(1)))
    else None
  }

  private def tsToMillis(root: String, e: Expression): Long = {
    require(e.foldable,
      s"vtab.`$root`: TIMESTAMP AS OF must be a literal, got $e")
    val micros = Cast(e, TimestampType,
      Some(conf.sessionLocalTimeZone)).eval()
    require(micros != null,
      s"vtab.`$root`: TIMESTAMP AS OF value does not parse: $e")
    micros.asInstanceOf[Long] / 1000L
  }

  private def asOfVersion(root: String, ts: Option[Expression],
      version: Option[String]): Long = version match {
    case Some(v) => java.lang.Long.parseLong(v.trim)
    case None =>
      val e = ts.getOrElse(throw new IllegalArgumentException(
        s"vtab.`$root`: AS OF needs a version or timestamp"))
      graft.operators.VersionedTable
        .versionAsOf(spark, root, tsToMillis(root, e))
        .getOrElse(throw new IllegalArgumentException(
          s"vtab.`$root`: no version committed at or before $e"))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    import graft.operators.VersionedTable
    // WRITE statements are refused BEFORE the bottom-up substitution
    // below can resolve their target relation: an INSERT that resolved
    // to the snapshot's parquet relation could append files straight
    // past the manifest — data invisible to every versioned read, or
    // worse. Writes go through commit/merge/updateWhere/deleteWhere
    // (or their streaming sinks), which is what makes them versions.
    // the target may sit under alias/wrapper nodes (MERGE INTO t ...,
    // DELETE FROM tbl alias) — scan the whole target subtree
    def refuseWrite(target: LogicalPlan, verb: String): Unit =
      target.collectFirst {
        case u: UnresolvedRelation if idOf(u).isDefined => u
      }.foreach { u =>
        throw new IllegalArgumentException(
          s"${u.multipartIdentifier.mkString(".")}: SQL $verb would " +
            "bypass the version manifest — write through " +
            "VersionedTable.commit/merge/updateWhere/deleteWhere " +
            "(or the streaming sinks), which is what makes a write " +
            "a version")
      }
    plan.foreach {
      case i: org.apache.spark.sql.catalyst.plans.logical.InsertIntoStatement =>
        refuseWrite(i.table, "INSERT")
      case d: org.apache.spark.sql.catalyst.plans.logical.DeleteFromTable =>
        refuseWrite(d.table, "DELETE")
      case u: org.apache.spark.sql.catalyst.plans.logical.UpdateTable =>
        refuseWrite(u.table, "UPDATE")
      case m: org.apache.spark.sql.catalyst.plans.logical.MergeIntoTable =>
        refuseWrite(m.targetTable, "MERGE")
      case _ =>
    }
    plan.resolveOperatorsUp {
      case RelationTimeTravel(u: UnresolvedRelation, ts, version)
          if idOf(u).isDefined =>
        val (kind, root) = idOf(u).get
        val df = kind match {
          case "vtab" =>
            VersionedTable.read(spark, root,
              Some(asOfVersion(root, ts, version)))
          case "vtab_changes" =>
            // AS OF anchors the diff: all changes SINCE that version
            // (exclusive) up to the latest commit — Delta's
            // table_changes(tbl, from) as identifier + AS OF clause
            val from = asOfVersion(root, ts, version)
            val latest = VersionedTable.versions(spark, root).lastOption
              .getOrElse(throw new IllegalArgumentException(
                s"vtab_changes.`$root`: table has no committed versions"))
            VersionedTable.changesBetween(spark, root, from, latest)
          case _ => throw new IllegalArgumentException(
            s"vtab_history.`$root` does not take AS OF — it already " +
              "returns one row per version")
        }
        df.queryExecution.analyzed
      case u: UnresolvedRelation if idOf(u).isDefined =>
        val (kind, root) = idOf(u).get
        val df = kind match {
          case "vtab" => VersionedTable.read(spark, root)
          case "vtab_history" => VersionedTable.describeHistory(spark, root)
          case _ => throw new IllegalArgumentException(
            s"vtab_changes.`$root` needs an anchor: add VERSION AS OF " +
              "<v> or TIMESTAMP AS OF '<ts>' (changes since that point)")
        }
        df.queryExecution.analyzed
    }
  }
}
