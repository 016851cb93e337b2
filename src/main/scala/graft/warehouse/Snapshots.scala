package graft.warehouse

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Minimal snapshot-isolation commit protocol over plain parquet — the
  * upgrade path the README's concurrency section describes, implemented
  * with nothing but filesystem primitives (the same recipe the
  * transactional table formats build on: an ordered manifest log +
  * atomic manifest creation).
  *
  * Layout:
  * {{{
  *   table/
  *     data/part-<uuid>.parquet        immutable data files
  *     _manifests/v00000001.manifest   newline-separated data-file names
  *     _manifests/v00000002.manifest
  * }}}
  *
  * Invariants:
  *   - data files are written FIRST, under unique names, and never
  *     mutated or referenced until a manifest commits them;
  *   - a commit is `fs.create(vN+1, overwrite = false)` — atomic
  *     create-if-absent, so of two racing writers exactly ONE wins vN+1;
  *     the loser re-reads the new state and retries on vN+2 (optimistic
  *     concurrency, like Delta's log protocol);
  *   - readers resolve the highest manifest once and then read ONLY the
  *     files it lists — writers never disturb a running read (snapshot
  *     isolation), and any earlier version stays readable (time travel)
  *     until a vacuum removes unreferenced files.
  *
  * This is deliberately the smallest correct core: no column stats, no
  * compaction of the manifest log, single-table scope. It exists to make
  * the concurrent-writer story REAL — two appenders cannot lose or
  * double-commit data — while the sink API stays plain parquet.
  */
object Snapshots {

  private def fs(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestDir(table: String) = new Path(table, "_manifests")
  private def dataDir(table: String) = new Path(table, "data")

  private def versionOf(name: String): Long =
    name.stripPrefix("v").stripSuffix(".manifest").toLong

  private def manifestPath(table: String, v: Long) =
    new Path(manifestDir(table), f"v$v%08d.manifest")

  /** Highest committed version, 0 if the table is empty. */
  def currentVersion(spark: SparkSession, table: String): Long = {
    val dir = manifestDir(table)
    val f = fs(spark, dir)
    if (!f.exists(dir)) 0L
    else f.listStatus(dir).map(_.getPath.getName)
      .filter(_.endsWith(".manifest")).map(versionOf)
      .maxOption.getOrElse(0L)
  }

  /** Data files of a version (empty for v0). */
  def filesAt(spark: SparkSession, table: String, version: Long): Seq[String] = {
    if (version == 0) return Nil
    val p = manifestPath(table, version)
    val f = fs(spark, p)
    val in = f.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
    finally in.close()
  }

  /** Append `batch` as a new snapshot version. Data lands before the
    * commit; the commit itself is an atomic create-if-absent of the next
    * manifest. On a lost race the commit retries against the new head —
    * data files are never rewritten, only re-referenced.
    * Returns the committed version.
    */
  def commitAppend(spark: SparkSession, batch: DataFrame, table: String,
      maxRetries: Int = 10): Long =
    commit(spark, batch, table, replace = false, maxRetries)

  /** Replace the table's contents with `batch` (snapshot-level CTAS /
    * truncate-reload): the new manifest references only the new files.
    * Prior versions stay readable until vacuumed.
    */
  def commitOverwrite(spark: SparkSession, batch: DataFrame, table: String,
      maxRetries: Int = 10): Long =
    commit(spark, batch, table, replace = true, maxRetries)

  /** Write `batch`'s files into the table's data dir under unique names
    * (no manifest references them yet — invisible to readers).
    */
  private def stageData(spark: SparkSession, batch: DataFrame,
      table: String): Seq[String] = {
    val dd = dataDir(table)
    val f = fs(spark, dd)
    val staging = new Path(table, s"_staging-${java.util.UUID.randomUUID}")
    batch.write.parquet(staging.toString)
    f.mkdirs(dd)
    val newFiles = f.listStatus(staging)
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map { s =>
        val target = new Path(dd, s"${java.util.UUID.randomUUID}.parquet")
        require(f.rename(s.getPath, target), s"failed to stage ${s.getPath}")
        target.getName
      }.toSeq
    f.delete(staging, true)
    newFiles
  }

  /** Atomically PUBLISH manifest `version` with `content`. The manifest
    * is fully written to a temp name first, then claimed atomically —
    * readers can never observe a half-written manifest, and of two racing
    * writers exactly one claims vN+1:
    *   - file://  → hard link (atomic create-if-absent WITH content;
    *                a plain create(overwrite=false) on LocalFileSystem
    *                is check-then-create and loses commits under race)
    *   - hdfs://  → rename (atomic, fails when the target exists)
    * Returns false when another writer already owns `version`.
    */
  private def claimManifest(spark: SparkSession, table: String,
      version: Long, content: String): Boolean = {
    val f = fs(spark, manifestDir(table))
    f.mkdirs(manifestDir(table))
    val tmp = new Path(manifestDir(table), s".tmp-${java.util.UUID.randomUUID}")
    val out = f.create(tmp, true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
    val target = manifestPath(table, version)
    val claimed =
      if ("file" == f.getScheme) {
        try {
          java.nio.file.Files.createLink(
            java.nio.file.Paths.get(target.toUri.getPath),
            java.nio.file.Paths.get(tmp.toUri.getPath))
          true
        } catch { case _: java.nio.file.FileAlreadyExistsException => false }
      } else !f.exists(target) && f.rename(tmp, target)
    f.delete(tmp, false)
    claimed
  }

  private def commit(spark: SparkSession, batch: DataFrame, table: String,
      replace: Boolean, maxRetries: Int): Long = {
    // append/overwrite: data files never depend on the head, so stage
    // once and only the manifest content is recomputed per attempt
    val newFiles = stageData(spark, batch, table)
    var attempt = 0
    while (attempt < maxRetries) {
      val head = currentVersion(spark, table)
      val base = if (replace) Nil else filesAt(spark, table, head)
      if (claimManifest(spark, table, head + 1,
          (base ++ newFiles).mkString("\n"))) return head + 1
      attempt += 1 // lost the race; re-read the new head and retry
    }
    throw new IllegalStateException(
      s"commit to $table failed after $maxRetries attempts")
  }

  /** MERGE with an update branch, under snapshot isolation: the new table
    * state is `Merge.upsert(head state, batch, keys)` — every batch row
    * lands (matched keys updated, unmatched inserted), untouched target
    * rows survive. UNLIKE append, the result DEPENDS on the head it was
    * computed against, so a lost claim cannot simply retry the manifest:
    * the loser deletes its orphaned files, RE-READS the new head,
    * RECOMPUTES the merge and tries again — full optimistic concurrency
    * (Delta-style), serializing concurrent merges instead of losing one.
    * Returns the committed version.
    */
  def commitMerge(spark: SparkSession, batch: DataFrame, table: String,
      keys: Seq[String], maxRetries: Int = 10): Long = {
    val f = fs(spark, dataDir(table))
    var attempt = 0
    while (attempt < maxRetries) {
      val head = currentVersion(spark, table)
      val merged =
        if (head == 0) batch
        else graft.operators.Merge.upsert(read(spark, table, Some(head)), batch, keys)
      val newFiles = stageData(spark, merged, table)
      if (claimManifest(spark, table, head + 1, newFiles.mkString("\n")))
        return head + 1
      // lost the race: this merge was computed against a stale head —
      // its files are unreachable (no manifest references them); drop
      // them and recompute against the new head
      newFiles.foreach(n => f.delete(new Path(dataDir(table), n), false))
      attempt += 1
    }
    throw new IllegalStateException(
      s"merge commit to $table failed after $maxRetries attempts")
  }

  /** Snapshot-isolated targeted DELETE — copy-on-write at FILE
    * granularity: only the data files physically containing a doomed key
    * are rewritten (found via one input_file_name probe of the pinned
    * head); every other file is carried into the new manifest BY NAME,
    * zero bytes moved. Like [[commitMerge]], the result depends on the
    * head it was computed against, so a lost claim deletes its orphaned
    * files, re-reads the new head, and recomputes — concurrent deletes /
    * appends / merges serialize instead of losing rows.
    *
    * Retention semantics (the GDPR fine print): the delete is LOGICAL at
    * commit — prior versions still reference the old files (that is what
    * time travel means), so PHYSICAL erasure is `commitDelete` followed
    * by [[vacuum]] with a retention window of 0/1; until the vacuum, the
    * rows are readable via time travel by design.
    *
    * Returns (committed version, rows deleted) — (head, 0) when no file
    * contains any of the keys (no-op: no rewrite, no new version).
    */
  def commitDelete(spark: SparkSession, table: String, keys: Seq[Long],
      keyCol: String, maxRetries: Int = 10): (Long, Long) = {
    import org.apache.spark.sql.functions._
    val f = fs(spark, dataDir(table))
    var attempt = 0
    while (attempt < maxRetries) {
      val head = currentVersion(spark, table)
      if (head == 0 || keys.isEmpty) return (head, 0L)
      val files = filesAt(spark, table, head)
      def pathsOf(ns: Seq[String]) =
        ns.map(n => new Path(dataDir(table), n).toString)
      val affected = spark.read.parquet(pathsOf(files): _*)
        .filter(col(keyCol).isInCollection(keys))
        .select(input_file_name().as("file")).distinct()
        .collect().map(r => new Path(r.getString(0)).getName).toSet
      if (affected.isEmpty) return (head, 0L)
      val aff = spark.read.parquet(pathsOf(files.filter(affected)): _*)
      val deleted = aff.filter(col(keyCol).isInCollection(keys)).count()
      // NULL-safe keep: NOT(NULL IN ...) is NULL and would silently drop
      // NULL-key rows from the rewritten files
      val kept = aff.filter(
        !col(keyCol).isInCollection(keys) || col(keyCol).isNull)
      val newFiles = stageData(spark, kept, table)
      val manifest = (files.filterNot(affected) ++ newFiles).mkString("\n")
      if (claimManifest(spark, table, head + 1, manifest))
        return (head + 1, deleted)
      // lost the race: computed against a stale head — drop the orphans
      // (no manifest references them) and recompute
      newFiles.foreach(n => f.delete(new Path(dataDir(table), n), false))
      attempt += 1
    }
    throw new IllegalStateException(
      s"delete commit to $table failed after $maxRetries attempts")
  }

  /** OPTIMIZE under the commit protocol: rewrite the head's accreted
    * small files into ~`targetFiles`, committed as a NEW version by the
    * same optimistic claim as merge/delete — readers pinned to earlier
    * versions keep their files (vacuum reclaims them later), a racing
    * append serializes before or after, never lost. Data is
    * bit-identical; only layout changes. No-op (None) below `minFiles` —
    * compaction that rewrites a healthy table is pure write
    * amplification. Returns the committed version.
    */
  def compactData(spark: SparkSession, table: String, targetFiles: Int = 8,
      minFiles: Int = 16, maxRetries: Int = 10): Option[Long] = {
    require(targetFiles > 0)
    val f = fs(spark, dataDir(table))
    var attempt = 0
    while (attempt < maxRetries) {
      val head = currentVersion(spark, table)
      if (head == 0 || filesAt(spark, table, head).size < minFiles) return None
      val rewritten = read(spark, table, Some(head)).repartition(targetFiles)
      val newFiles = stageData(spark, rewritten, table)
      if (claimManifest(spark, table, head + 1, newFiles.mkString("\n")))
        return Some(head + 1)
      // lost the race (an append/merge landed first): this rewrite no
      // longer represents the head — drop the orphans and recompute
      newFiles.foreach(n => f.delete(new Path(dataDir(table), n), false))
      attempt += 1
    }
    throw new IllegalStateException(
      s"compaction commit to $table failed after $maxRetries attempts")
  }

  /** Read the table at `version` (default: latest). A resolved reader is
    * pinned: later commits never change the files it reads.
    */
  def read(spark: SparkSession, table: String,
      version: Option[Long] = None): DataFrame = {
    val v = version.getOrElse(currentVersion(spark, table))
    val files = filesAt(spark, table, v)
      .map(n => new Path(dataDir(table), n).toString)
    if (files.isEmpty) spark.emptyDataFrame
    else spark.read.parquet(files: _*)
  }

  /** Delete data files referenced by NO manifest ≤ the current head and
    * manifests older than `keepVersions` (retention). Returns deleted
    * file names.
    */
  def vacuum(spark: SparkSession, table: String,
      keepVersions: Int = 2): Seq[String] = {
    val head = currentVersion(spark, table)
    val keepFrom = math.max(1L, head - keepVersions + 1)
    val referenced = (keepFrom to head)
      .flatMap(v => filesAt(spark, table, v)).toSet
    val dd = dataDir(table)
    val f = fs(spark, dd)
    if (!f.exists(dd)) return Nil
    val deleted = f.listStatus(dd).filter(_.isFile)
      .map(_.getPath).filterNot(p => referenced.contains(p.getName))
      .map { p => f.delete(p, false); p.getName }.toSeq
    (1L until keepFrom).foreach(v => f.delete(manifestPath(table, v), false))
    deleted
  }
}
