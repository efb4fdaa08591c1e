package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.hadoop.fs.{FileSystem, Path}

/** Minimal versioned table format: append/overwrite commits as numbered
  * manifests over immutable data directories — the lakehouse commit
  * protocol (Delta/Iceberg's log-of-snapshots idea, reference
  * docs/数据湖.md's managed-data-lake requirements) re-expressed with
  * nothing but a filesystem and Spark's parquet reader.
  *
  * Layout under a table root:
  * {{{
  *   <root>/data/<commit-uuid>/part-*.parquet   — immutable once committed
  *   <root>/_vlog/v00001.manifest               — one data dir per line,
  *                                                `#END:<n>` terminator
  * }}}
  *
  * Semantics:
  *  - a manifest version is COMMITTED iff its `#END:<n>` terminator
  *    matches its line count — a torn write is ignored by readers and
  *    its number is simply skipped by the next writer;
  *  - readers resolve the highest committed version (or an explicit
  *    `asOf`) and read exactly the data dirs it lists → snapshot
  *    isolation: a reader planned at version v never sees later
  *    commits, and concurrent commits never disturb running reads
  *    (data dirs are immutable, never rewritten in place);
  *  - writers claim the next version number with an atomic
  *    create-if-absent — optimistic concurrency, losers retry with the
  *    next number; data lands fully under `data/` BEFORE the manifest
  *    install, so a crash at any point leaves either an invisible
  *    orphan dir or a complete commit;
  *  - rollback is a NEW version that re-lists an old version's dirs
  *    (roll-forward history, nothing deleted) — time travel stays
  *    available for every version until [[vacuum]] reclaims dirs no
  *    retained manifest references.
  *
  * 100 TB shape: the driver touches only manifests (O(commits) lines)
  * and directory names; all data movement is `df.write.parquet` /
  * `spark.read.parquet(dirs)` — fully distributed, and the reader's
  * file listing prunes to exactly the snapshot's directories. */
object VersionedTable {

  private val logDir = "_vlog"
  private val endMark = "#END:"

  private def fs(spark: SparkSession, root: String): FileSystem =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestPath(root: String, v: Long): Path =
    new Path(root, f"$logDir/v$v%05d.manifest")

  private def parseVersion(name: String): Option[Long] =
    if (name.startsWith("v") && name.endsWith(".manifest"))
      name.stripPrefix("v").stripSuffix(".manifest").toLongOption
    else None

  /** Data dirs of a committed manifest; None if absent or torn. */
  private def readManifest(f: FileSystem, root: String,
      v: Long): Option[Seq[String]] = {
    val p = manifestPath(root, v)
    if (!f.exists(p)) return None
    val in = f.open(p)
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    val lines = text.split("\n").filter(_.nonEmpty).toSeq
    if (lines.isEmpty || !lines.last.startsWith(endMark)) return None
    val dirs = lines.dropRight(1)
    if (lines.last.stripPrefix(endMark).toIntOption.contains(dirs.size))
      Some(dirs)
    else None
  }

  /** All committed version numbers, ascending. */
  def versions(spark: SparkSession, root: String): Seq[Long] = {
    val f = fs(spark, root)
    val dir = new Path(root, logDir)
    if (!f.exists(dir)) return Seq.empty
    f.listStatus(dir).toSeq
      .flatMap(s => parseVersion(s.getPath.getName))
      .filter(v => readManifest(f, root, v).isDefined)
      .sorted
  }

  /** Highest manifest NUMBER present, committed or torn — the next
    * claimable slot is one past this (a torn writer's number is burned,
    * never reused, so its eventual content can't resurrect). */
  private def highestManifestNumber(f: FileSystem, root: String): Long = {
    val dir = new Path(root, logDir)
    if (!f.exists(dir)) return 0L
    f.listStatus(dir).toSeq
      .flatMap(s => parseVersion(s.getPath.getName))
      .maxOption.getOrElse(0L)
  }

  /** Claim the next version number and install a manifest whose dir
    * list is `dirsFor(latestCommittedVersion)`. The create-if-absent is
    * the CAS; crucially the dir list is RECOMPUTED on every retry, so a
    * writer that loses the race rebases onto the winner's snapshot
    * instead of silently dropping it (the lost-update a log-of-
    * snapshots protocol must rule out). */
  private def commitManifest(spark: SparkSession, root: String,
      dirsFor: Option[Long] => Seq[String]): Long = {
    val f = fs(spark, root)
    f.mkdirs(new Path(root, logDir))
    var committed = -1L
    while (committed < 0) {
      val latest = versions(spark, root).lastOption
      val dirs = dirsFor(latest)
      val body = (if (dirs.isEmpty) s"${endMark}0\n"
        else dirs.mkString("\n") + s"\n$endMark${dirs.size}\n")
        .getBytes("UTF-8")
      val v = math.max(latest.getOrElse(0L),
        highestManifestNumber(f, root)) + 1
      if (publishManifest(f, root, v, body)) committed = v
      // else: lost the race (or found a torn writer) — rebase, retry
    }
    committed
  }

  /** Publish a version slot ATOMICALLY WITH ITS CONTENT — the property
    * the whole protocol rests on: a slot must never be visible without
    * its body (a claim-then-write gap lets a competing writer rebase
    * onto the old snapshot while the claimed slot is still empty, then
    * win with a later number — a lost update).
    *
    *  - On HDFS-like stores, `create(path, overwrite=false)` is an
    *    atomic namespace operation carrying the stream, so writing the
    *    body into it directly is safe: a torn body (writer died) has no
    *    `#END` terminator and the slot's number is burned.
    *  - On the LOCAL filesystem that create is check-then-act, so two
    *    racers can both pass the exists check and one body silently
    *    replaces the other. There the body is written to a private tmp
    *    file and published with a HARD LINK — `link(2)` fails with
    *    EEXIST atomically at the syscall level.
    *
    * Returns false when the slot was already taken (caller rebases). */
  private def publishManifest(f: FileSystem, root: String, v: Long,
      body: Array[Byte]): Boolean = {
    val slot = manifestPath(root, v)
    val isLocal = f.getUri.getScheme == "file"
    if (isLocal) {
      val slotNio = java.nio.file.Paths.get(slot.toUri.getPath)
      val tmp = slotNio.resolveSibling(
        s".${slot.getName}.${java.util.UUID.randomUUID()}.tmp")
      java.nio.file.Files.write(tmp, body)
      try {
        java.nio.file.Files.createLink(slotNio, tmp)
        true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => false
      } finally java.nio.file.Files.delete(tmp)
    } else {
      try {
        val out = f.create(slot, false)
        try out.write(body) finally out.close()
        true
      } catch {
        case _: java.io.IOException if f.exists(slot) => false
      }
    }
  }

  /** Commit `df` as the next version. `overwrite = false` appends to
    * the latest committed snapshot's dir list; `true` replaces it.
    * Returns the committed version number.
    *
    * `idempotencyKey` makes RE-DELIVERY of the same logical commit a
    * no-op returning the original version (the exactly-once contract a
    * streaming micro-batch sink needs: foreachBatch is at-least-once,
    * so a restarted query re-offers committed batch ids). A keyed data
    * dir left by a writer that died BEFORE its manifest landed is
    * unreferenced, so the retry safely rewrites it. Keyed commits are
    * for sequential re-delivery, not concurrent writers sharing a key. */
  def commit(spark: SparkSession, root: String, df: DataFrame,
      overwrite: Boolean = false,
      idempotencyKey: Option[String] = None): Long = {
    val f = fs(spark, root)
    val dataDir = "data/" + idempotencyKey.map(k => s"k-$k")
      .getOrElse(java.util.UUID.randomUUID().toString)
    if (idempotencyKey.isDefined) {
      val already = versions(spark, root).find(v =>
        readManifest(f, root, v).exists(_.contains(dataDir)))
      already.foreach(v => return v)
      // crash orphan from a previous attempt: unreferenced, rewrite
      f.delete(new Path(root, dataDir), true)
    }
    // data first, fully, into an immutable dir nobody references yet
    df.write.mode(SaveMode.ErrorIfExists)
      .parquet(new Path(root, dataDir).toString)
    commitManifest(spark, root, latest => {
      val base =
        if (overwrite) Seq.empty
        else latest.flatMap(readManifest(f, root, _)).getOrElse(Seq.empty)
      base :+ dataDir
    })
  }

  /** Read the table at `asOf` (a committed version) or, by default,
    * the latest committed snapshot. The returned frame is pinned to
    * that snapshot's immutable dirs — later commits never leak in. */
  def read(spark: SparkSession, root: String,
      asOf: Option[Long] = None): DataFrame = {
    val f = fs(spark, root)
    val v = asOf.getOrElse(versions(spark, root).lastOption.getOrElse(
      throw new IllegalStateException(s"no committed version under $root")))
    val dirs = readManifest(f, root, v).getOrElse(
      throw new IllegalArgumentException(s"version $v not committed"))
    spark.read.parquet(
      dirs.map(d => new Path(root, d).toString): _*)
  }

  /** Roll the table back to `v`'s content by committing a NEW version
    * with `v`'s dir list — history is append-only, so the "undone"
    * versions stay readable. Returns the new version number. */
  def rollback(spark: SparkSession, root: String, v: Long): Long = {
    val f = fs(spark, root)
    val dirs = readManifest(f, root, v).getOrElse(
      throw new IllegalArgumentException(s"version $v not committed"))
    commitManifest(spark, root, _ => dirs)
  }

  /** Reclaim data dirs referenced by NO retained manifest, keeping the
    * last `keepVersions` manifests (older manifests are dropped first,
    * which is what bounds time travel). Returns deleted dir count. */
  def vacuum(spark: SparkSession, root: String,
      keepVersions: Int = 2): Int = {
    require(keepVersions >= 1, "must retain at least the latest version")
    val f = fs(spark, root)
    val all = versions(spark, root)
    val (drop, keep) = all.splitAt(math.max(0, all.size - keepVersions))
    drop.foreach(v => f.delete(manifestPath(root, v), false))
    val live = keep.flatMap(readManifest(f, root, _)).flatten.toSet
    val dataRoot = new Path(root, "data")
    if (!f.exists(dataRoot)) return 0
    val orphans = f.listStatus(dataRoot).toSeq
      .map(_.getPath)
      .filterNot(p => live.contains(s"data/${p.getName}"))
    orphans.foreach(p => f.delete(p, true))
    orphans.size
  }
}
