package graft.operators

/** Name binding for versioned tables: maps a catalog-style name
  * (`dws.inventory`) to a [[VersionedTable]] root path, so the SQL
  * surface stops embedding filesystem paths — the reference's worked
  * examples all address NAMED tables in layered databases (reference
  * docs/HiveSQL.md:21,42-55), and a BI dashboard (reference
  * docs/bi.md:5) cannot paste temp paths into every query.
  *
  * Once registered, the whole vtab SQL surface resolves the name
  * through the same code paths as the path form:
  * {{{
  *   SELECT vtab_register('dws.inventory', '/warehouse/inv');
  *   SELECT * FROM dws.inventory VERSION AS OF 2;
  *   INSERT INTO dws.inventory SELECT …;
  *   MERGE INTO dws.inventory t USING src s ON t.k = s.k …;
  *   SELECT * FROM table_changes('dws.inventory', 1, 3);
  *   SELECT * FROM vtab_history.`dws.inventory`;
  *   DROP TABLE dws.inventory;       -- unregisters; data stays
  * }}}
  *
  * Semantics:
  *  - names are 1–3 dot-separated SQL identifiers, matched
  *    case-insensitively (Spark's default resolution); paths are never
  *    names (a '/' anywhere disqualifies) and names whose first part
  *    is a reserved vtab namespace kind are refused, so the two
  *    addressing forms cannot collide;
  *  - an UNREGISTERED name is simply not claimed — the identifier
  *    falls through to the session catalog untouched (a real table or
  *    view with that name keeps resolving; a missing one gets the
  *    catalog's own not-found error);
  *  - registration is JVM-wide metadata, like the manifest cache —
  *    one engine process serves one warehouse namespace; it holds a
  *    name→path binding only, so re-registering repoints the name and
  *    [[unregister]]/DROP never touches table data;
  *  - durability: bindings live for the JVM (the driver process). A
  *    deployment wanting durable bindings re-registers at session
  *    startup — same contract as temp views and the reference's
  *    client-side table registry.
  */
object VTabCatalog {

  /** Reserved first-parts of the PATH-addressed namespace. */
  private[graft] val reservedKinds =
    Set("vtab", "vtab_history", "vtab_changes")

  private val namePart = "[A-Za-z_][A-Za-z0-9_]*"

  private val bindings =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def norm(name: String): String =
    name.toLowerCase(java.util.Locale.ROOT)

  /** Bind `name` to a versioned-table root. Re-registering repoints
    * the name (idempotent for the same root). The root need not have
    * committed versions yet — the first INSERT creates v1. */
  def register(name: String, root: String): Unit = {
    require(name.split('.').length <= 3 &&
        name.split('.').forall(_.matches(namePart)),
      s"vtab name '$name' must be 1-3 dot-separated SQL identifiers")
    require(!reservedKinds.contains(
        norm(name).takeWhile(_ != '.')),
      s"vtab name '$name' collides with the reserved path namespace " +
        s"(${reservedKinds.mkString(", ")}) — pick another first part")
    require(root.contains("/"),
      s"vtab root '$root' must be a path (the name/path split is what " +
        "keeps catalog identifiers out of the path namespace)")
    bindings.put(norm(name), root)
    ()
  }

  /** Drop the binding; table data is NEVER touched. Returns whether
    * the name was registered. */
  def unregister(name: String): Boolean =
    bindings.remove(norm(name)) != null

  /** The root bound to `name`, if any (case-insensitive). */
  def resolve(name: String): Option[String] =
    Option(bindings.get(norm(name)))

  /** Current bindings, for introspection/tests. */
  def registered: Map[String, String] = {
    import scala.jdk.CollectionConverters._
    bindings.asScala.toMap
  }
}
