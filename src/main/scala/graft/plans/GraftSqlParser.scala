package graft.plans

import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{DataType, StructType}

/** Delegating SQL parser adding the versioned-table MAINTENANCE verbs
  * Spark's grammar lacks — the last Scala-only lifecycle operations on
  * the SQL-first surface (reference docs/数据湖.md's managed-lake
  * maintenance: retention + compaction):
  *
  * {{{
  *   VACUUM vtab.`/p`                      -- keep last 2 versions
  *   VACUUM vtab.`/p` RETAIN 5 VERSIONS    -- explicit retention
  *   OPTIMIZE vtab.`/p`                    -- compact to one data dir
  *   OPTIMIZE vtab.`/p` INTO 8 FILES       -- compact + file-count target
  *   OPTIMIZE vtab.`/p` ZORDER BY (a, b)   -- Z-order rewrite
  *   DESCRIBE HISTORY vtab.`/p`            -- one row per version
  *   RESTORE vtab.`/p` TO VERSION AS OF 3  -- rollback as a NEW version
  *   ALTER TABLE dws.inv ADD CONSTRAINT c CHECK (v >= 0)
  *   ALTER TABLE dws.inv DROP CONSTRAINT c
  *   CREATE TABLE dws.inv USING vtab LOCATION '/p'  -- bind a name
  *   EXPLAIN VACUUM vtab.`/p`              -- shows the command, no-op
  * }}}
  *
  * The target is a `vtab.`/path`` identifier or a registered name
  * ([[graft.operators.VTabCatalog]]). Everything else — including the
  * first token not being VACUUM/OPTIMIZE — delegates to Spark's own
  * parser untouched, so this parser adds grammar without shadowing
  * any. The verbs become [[VTabVacuumCommand]]/[[VTabOptimizeCommand]]
  * (LeafRunnableCommands, same pattern as the routed DML): work
  * happens at EXECUTION time, so EXPLAIN — claimed here and wrapped in
  * Spark's own ExplainCommand — never deletes or rewrites anything.
  * Retention safety lives in [[graft.operators.VersionedTable.vacuum]]
  * (keepVersions >= 1, the in-flight-commit orphan grace, and
  * dropped-manifest-first reclamation), which these verbs call
  * unchanged. */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {

  private val identP = "(vtab\\.`[^`]+`|[A-Za-z_][A-Za-z0-9_.]*)"
  private val vacuumRe = ("(?is)^\\s*VACUUM\\s+" + identP +
    "(?:\\s+RETAIN\\s+(\\d+)\\s+VERSIONS)?\\s*;?\\s*$").r
  private val optimizeRe = ("(?is)^\\s*OPTIMIZE\\s+" + identP +
    "(?:\\s+ZORDER\\s+BY\\s*\\(([^)]*)\\))?" +
    "(?:\\s+INTO\\s+(\\d+)\\s+FILES)?\\s*;?\\s*$").r
  // CREATE TABLE <name> USING vtab [LOCATION '<path>'] — claimed here
  // because Spark's ResolveSessionCatalog validates the provider
  // against the DataSource registry (and rejects `vtab`) before any
  // injected resolution rule can route the statement. Group 2 captures
  // whatever sits between the name and USING (a column list — refused
  // with a real message: the manifest records the schema per commit).
  private val createVtabRe = ("(?is)^\\s*CREATE\\s+TABLE\\s+" +
    "(IF\\s+NOT\\s+EXISTS\\s+)?([A-Za-z_][A-Za-z0-9_.]*)\\s*" +
    "(\\([^)]*\\))?\\s*USING\\s+vtab\\b([\\s\\S]*?);?\\s*$").r
  private val locationRe = "(?is)^\\s*LOCATION\\s+'([^']+)'\\s*$".r
  // DESCRIBE HISTORY <target> — Delta's verb. Claimed ONLY for
  // vtab-resolvable targets: `DESC history <col>` is VALID Spark
  // syntax (describe a column of a table literally named `history`),
  // so an unconditional claim would hijack it.
  private val historyRe = ("(?is)^\\s*DESC(?:RIBE)?\\s+HISTORY\\s+" +
    identP + "\\s*;?\\s*$").r
  // RESTORE [TABLE] <target> [TO] VERSION AS OF n — Delta's verb,
  // absent from Spark's grammar (any unclaimed target would be a
  // parse error either way, like VACUUM)
  private val restoreRe = ("(?is)^\\s*RESTORE\\s+(?:TABLE\\s+)?" +
    identP + "\\s+(?:TO\\s+)?VERSION\\s+AS\\s+OF\\s+(\\d+)\\s*;?\\s*$").r
  // ALTER TABLE <target> ADD CONSTRAINT n CHECK (e) / DROP CONSTRAINT
  // n — claimed ONLY when the target is vtab-resolvable (a path form
  // or a registered name): every other ALTER TABLE belongs to Spark's
  // own grammar and delegates untouched.
  private val alterAddRe = ("(?is)^\\s*ALTER\\s+TABLE\\s+" + identP +
    "\\s+ADD\\s+CONSTRAINT\\s+([A-Za-z0-9_]+)\\s+CHECK\\s*" +
    "\\(([\\s\\S]+)\\)\\s*;?\\s*$").r
  private val alterDropRe = ("(?is)^\\s*ALTER\\s+TABLE\\s+" + identP +
    "\\s+DROP\\s+CONSTRAINT\\s+([A-Za-z0-9_]+)\\s*;?\\s*$").r
  private val explainRe = ("(?is)^\\s*EXPLAIN\\s+" +
    "((?:VACUUM|OPTIMIZE|CREATE|RESTORE|ALTER|" +
    "DESC(?:RIBE)?\\s+HISTORY)\\b[\\s\\S]*)$").r

  private def vtabTarget(ident: String): Boolean =
    ident.startsWith("vtab.`") ||
      graft.operators.VTabCatalog.resolve(ident).isDefined

  private def rootOf(ident: String): String =
    if (ident.startsWith("vtab.`"))
      ident.stripPrefix("vtab.`").stripSuffix("`")
    else graft.operators.VTabCatalog.resolve(ident).getOrElse(
      throw new IllegalArgumentException(
        s"'$ident' is neither a vtab.`/path` " +
          "identifier nor a registered vtab name (vtab_register first)"))

  private def claimed(sqlText: String): Option[LogicalPlan] =
    explainRe.findFirstMatchIn(sqlText) match {
      case Some(m) =>
        claimed(m.group(1)).map(inner =>
          org.apache.spark.sql.execution.command.ExplainCommand(
            inner, org.apache.spark.sql.execution.SimpleMode))
      case None =>
        vacuumRe.findFirstMatchIn(sqlText).map { m =>
          VTabVacuumCommand(rootOf(m.group(1)),
            Option(m.group(2)).map(_.toInt).getOrElse(2))
        }.orElse(optimizeRe.findFirstMatchIn(sqlText).map { m =>
          val cols = Option(m.group(2)).toSeq
            .flatMap(_.split(',').iterator)
            .map(_.trim.stripPrefix("`").stripSuffix("`"))
            .filter(_.nonEmpty)
          VTabOptimizeCommand(rootOf(m.group(1)), cols,
            Option(m.group(3)).map(_.toInt).getOrElse(0))
        }).orElse(historyRe.findFirstMatchIn(sqlText)
          .filter(m => vtabTarget(m.group(1))).map { m =>
            VTabHistoryCommand(rootOf(m.group(1)))
        }).orElse(restoreRe.findFirstMatchIn(sqlText).map { m =>
          VTabRestoreCommand(rootOf(m.group(1)), m.group(2).toLong)
        }).orElse(alterAddRe.findFirstMatchIn(sqlText)
          .filter(m => vtabTarget(m.group(1))).map { m =>
            VTabConstraintCommand(rootOf(m.group(1)), m.group(2),
              Some(m.group(3).trim))
        }).orElse(alterDropRe.findFirstMatchIn(sqlText)
          .filter(m => vtabTarget(m.group(1))).map { m =>
            VTabConstraintCommand(rootOf(m.group(1)), m.group(2), None)
        }).orElse(createVtabRe.findFirstMatchIn(sqlText).map { m =>
          val ifNotExists = m.group(1) != null
          val name = m.group(2)
          require(m.group(3) == null,
            s"CREATE TABLE $name USING vtab: column lists are not " +
              "supported — the versioned manifest records the schema " +
              "per commit (the first INSERT defines it)")
          // the tail must be EXACTLY a LOCATION clause: anything else
          // (AS SELECT, PARTITIONED BY, TBLPROPERTIES) must be a loud
          // refusal, never a silently-dropped clause
          val loc = locationRe.findFirstMatchIn(m.group(4))
            .map(_.group(1)).getOrElse(
              throw new IllegalArgumentException(
                s"CREATE TABLE $name USING vtab supports exactly one " +
                  "clause: LOCATION '<path>' (the versioned-table " +
                  "root) — got: USING vtab" + m.group(4).trim.take(80) +
                  ". CTAS/PARTITIONED BY/TBLPROPERTIES are not " +
                  "supported; INSERT INTO the table after binding it"))
          VTabRegisterCommand(name, loc, ifNotExists)
        })
    }

  override def parsePlan(sqlText: String): LogicalPlan =
    claimed(sqlText).getOrElse(delegate.parsePlan(sqlText))

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(
      sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
}
