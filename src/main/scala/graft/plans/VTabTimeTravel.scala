package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{RelationTimeTravel, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression}
import org.apache.spark.sql.catalyst.plans.QueryPlan
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.TimestampType

/** SQL-text surface for [[graft.operators.VersionedTable]] — the
  * reference's surface is SQL-first (reference docs/数仓.md), so time
  * travel, history, CDC, and append writes must work as SQL text, not
  * only through the Scala API:
  *
  * {{{
  *   SELECT * FROM vtab.`/path` VERSION AS OF 2          -- snapshot
  *   SELECT * FROM vtab.`/path` TIMESTAMP AS OF '2026-08-16 12:00:00'
  *   SELECT * FROM vtab.`/path`                          -- latest
  *   SELECT * FROM vtab_history.`/path`                  -- DESCRIBE HISTORY
  *   SELECT * FROM vtab_changes.`/path` VERSION AS OF 1  -- CDC after v1
  *   SELECT * FROM vtab_changes.`/path` TIMESTAMP AS OF '…'
  *   SELECT * FROM table_changes('/path', 1, 3)          -- bounded CDC
  *   INSERT INTO vtab.`/path` SELECT …                   -- append = new version
  *   INSERT OVERWRITE vtab.`/path` SELECT …              -- replace = new version
  * }}}
  *
  * Spark's OWN parser already produces [[RelationTimeTravel]] for the
  * `AS OF` clauses (SPARK-37219) — no parser injection needed; this
  * resolution rule gives `vtab*.`-prefixed PATH identifiers a meaning
  * (the same path-as-identifier convention as `delta.`/path``).
  * The rule only claims a 2-part identifier whose second part is
  * path-shaped (contains '/'): a real catalog database that happens
  * to be named `vtab` keeps resolving through the catalog, and a
  * relative name like `vtab.t` falls through to the catalog's own
  * not-found error instead of being hijacked.
  *
  * Version resolution goes through
  * [[graft.operators.VersionedTable.read]], timestamp resolution
  * through the effective-commit-time rules of
  * [[graft.operators.VersionedTable.versionAsOf]] (mtime-bounded
  * fallback + monotonization), `vtab_changes` through
  * [[graft.operators.VersionedTable.changesBetween]], and
  * `vtab_history` through
  * [[graft.operators.VersionedTable.describeHistory]] — so SQL and
  * Scala answers agree by construction. The rule substitutes the
  * analyzed snapshot plan — a plain pruned parquet scan of the
  * manifest's live dirs — so pushdown/pruning behave exactly as the
  * Scala path.
  *
  * CDC anchor semantics (stated prominently, because it is a
  * migration hazard): `vtab_changes.`/p` VERSION AS OF n` returns the
  * changes STRICTLY AFTER version n — exclusive of n itself, through
  * the latest commit — i.e. exactly
  * `changesBetween(n, latest)`. This is NOT Delta Lake's
  * `startingVersion`, which is inclusive of the anchor version's own
  * changes; a user migrating from Delta who wants version n's changes
  * included should anchor at `n - 1`. The bounded TVF
  * `table_changes('/p', from[, to])` (registered by
  * [[GraftExtensions]]) uses the same exclusive-from/inclusive-to
  * contract as the Scala `changesBetween(from, to)`.
  *
  * Reads are READ-ONLY at analysis: no side effects, so repeated
  * analysis (EXPLAIN, retries) is safe. SQL INSERT is ROUTED, not
  * resolved: the statement becomes a [[VTabInsertCommand]] that calls
  * `VersionedTable.commit` at EXECUTION time (EXPLAIN shows the
  * command without committing). UPDATE/DELETE/MERGE remain refused
  * until each is deliberately routed through
  * updateWhere/deleteWhere/merge — a resolved write against the
  * snapshot's parquet relation would bypass the manifest. */
case class VTabTimeTravelRule(spark: SparkSession) extends Rule[LogicalPlan] {

  private val kinds = Set("vtab", "vtab_history", "vtab_changes")

  private def idOf(u: UnresolvedRelation): Option[(String, String)] = {
    val parts = u.multipartIdentifier
    // path-shaped second part only: `vtab.`/p`` is ours; a catalog
    // database named vtab (or `vtab.relative`) is the catalog's
    if (parts.length == 2 && kinds.contains(parts.head.toLowerCase) &&
        parts(1).contains("/"))
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
    import org.apache.spark.sql.catalyst.plans.logical.InsertIntoStatement
    import graft.operators.VersionedTable
    // Write-target scan BEFORE the bottom-up substitution below can
    // resolve a write's target relation: an UPDATE/DELETE/MERGE (or an
    // unroutable INSERT shape) that resolved to the snapshot's parquet
    // relation could mutate files straight past the manifest — data
    // invisible to every versioned read, or worse. Routable INSERT
    // targets are collected BY IDENTITY so the read-substitution cases
    // skip them and the whole statement reaches the routing case
    // intact. The target may sit under alias/wrapper nodes (MERGE INTO
    // t ..., DELETE FROM tbl alias) — scan the whole target subtree.
    def vtabIn(target: LogicalPlan): Option[UnresolvedRelation] =
      target.collectFirst {
        case u: UnresolvedRelation if idOf(u).isDefined => u
      }
    def refuseWrite(target: LogicalPlan, verb: String): Unit =
      vtabIn(target).foreach { u =>
        throw new IllegalArgumentException(
          s"${u.multipartIdentifier.mkString(".")}: SQL $verb would " +
            "bypass the version manifest — write through " +
            "VersionedTable.merge/updateWhere/deleteWhere " +
            "(or the streaming sinks), which is what makes a write " +
            "a version")
      }
    val insertTargets = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[UnresolvedRelation, java.lang.Boolean]())
    plan.foreach {
      case i: InsertIntoStatement =>
        vtabIn(i.table).foreach { u =>
          val (kind, root) = idOf(u).get
          if (kind != "vtab")
            throw new IllegalArgumentException(
              s"$kind.`$root` is a derived read-only view — INSERT " +
                "would bypass the version manifest; write the base " +
                s"table: INSERT INTO vtab.`$root`")
          if (i.partitionSpec.nonEmpty || i.userSpecifiedCols.nonEmpty ||
              i.ifPartitionNotExists)
            throw new IllegalArgumentException(
              s"vtab.`$root`: INSERT routes whole snapshots through " +
                "VersionedTable.commit — PARTITION specs, column " +
                "lists, and IF NOT EXISTS are not supported; " +
                "INSERT INTO/OVERWRITE vtab.`<path>` SELECT … only")
          insertTargets.add(u)
        }
      case d: org.apache.spark.sql.catalyst.plans.logical.DeleteFromTable =>
        refuseWrite(d.table, "DELETE")
      case u: org.apache.spark.sql.catalyst.plans.logical.UpdateTable =>
        refuseWrite(u.table, "UPDATE")
      case m: org.apache.spark.sql.catalyst.plans.logical.MergeIntoTable =>
        refuseWrite(m.targetTable, "MERGE")
      case _ =>
    }
    plan.resolveOperatorsUp {
      // routed append/replace: becomes a command that commits at
      // execution time (the query child — which may itself read other
      // vtab tables — was already substituted by the cases below,
      // children first; the TARGET relation was skipped by identity)
      case i: InsertIntoStatement if i.query.resolved &&
          vtabIn(i.table).exists(insertTargets.contains) =>
        val root = idOf(vtabIn(i.table).get).get._2
        VTabInsertCommand(root, i.query, i.overwrite, i.byName)
      case RelationTimeTravel(u: UnresolvedRelation, ts, version)
          if idOf(u).isDefined && !insertTargets.contains(u) =>
        val (kind, root) = idOf(u).get
        val df = kind match {
          case "vtab" =>
            VersionedTable.read(spark, root,
              Some(asOfVersion(root, ts, version)))
          case "vtab_changes" =>
            // AS OF anchors the diff: all changes STRICTLY AFTER that
            // version (exclusive of the anchor — see the scaladoc
            // hazard note) up to the latest commit; for a bounded or
            // anchor-inclusive read use table_changes('/p', from, to)
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
      case u: UnresolvedRelation
          if idOf(u).isDefined && !insertTargets.contains(u) =>
        val (kind, root) = idOf(u).get
        val df = kind match {
          case "vtab" => VersionedTable.read(spark, root)
          case "vtab_history" => VersionedTable.describeHistory(spark, root)
          case _ => throw new IllegalArgumentException(
            s"vtab_changes.`$root` needs an anchor: add VERSION AS OF " +
              "<v> or TIMESTAMP AS OF '<ts>' (changes strictly after " +
              "that point), or use table_changes('<path>', from, to)")
        }
        df.queryExecution.analyzed
    }
  }
}

/** Routed SQL write for [[graft.operators.VersionedTable]]:
  * `INSERT INTO vtab.`/path`` appends the query result as the next
  * committed version, `INSERT OVERWRITE` replaces the snapshot — both
  * through `VersionedTable.commit`, which is what makes the write a
  * version (manifest CAS, schema gate, CHECK constraints). A
  * RunnableCommand so the commit happens at EXECUTION time:
  * EXPLAIN/dry analysis never writes.
  *
  * Column semantics: positional, like SQL INSERT — the query's
  * columns are cast and renamed to the target's current schema by
  * position (arity must match); `INSERT INTO … BY NAME` maps by name
  * instead. The first INSERT into an empty root keeps the query's own
  * schema (it creates version 1). */
case class VTabInsertCommand(root: String, query: LogicalPlan,
    overwrite: Boolean, byName: Boolean) extends LeafRunnableCommand {

  override def innerChildren: Seq[QueryPlan[_]] = Seq(query)

  override def run(spark: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.functions.col
    import graft.operators.VersionedTable
    val src = org.apache.spark.sql.graft.Bridge.ofRows(spark, query)
    val df =
      if (VersionedTable.versions(spark, root).isEmpty) src
      else {
        val tgt = VersionedTable.read(spark, root).schema
        if (byName) {
          val missing = tgt.fieldNames.filterNot(src.columns.contains)
          require(missing.isEmpty,
            s"INSERT INTO vtab.`$root` BY NAME: query is missing " +
              s"column(s) ${missing.mkString(", ")}")
          src.select(tgt.fields.toSeq.map(f =>
            col(f.name).cast(f.dataType).as(f.name)): _*)
        } else {
          require(src.columns.length == tgt.fields.length,
            s"INSERT INTO vtab.`$root`: target has " +
              s"${tgt.fields.length} column(s), query produces " +
              s"${src.columns.length}")
          src.select(src.columns.toSeq.zip(tgt.fields.toSeq).map {
            case (c, f) => col(c).cast(f.dataType).as(f.name)
          }: _*)
        }
      }
    VersionedTable.commit(spark, root, df, overwrite = overwrite)
    Seq.empty
  }
}
