package graft.warehouse

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.types

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
  *     data/_graft_stats/              optional per-file min/max manifest
  *     _manifests/v00000001.manifest   optional #-headers, then file names
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
  *     until a vacuum removes unreferenced files;
  *   - everything a reader needs beyond the file list rides in
  *     `#`-prefixed manifest header lines: the version's declared schema
  *     (`#schema:` — schema evolution with no footer-merge reads) and
  *     the stream-commit watermarks (`#stream:` — exactly-once streaming
  *     appends), so state and data always commit in one atomic claim;
  *     every commit carries the head's stream marks forward, making each
  *     manifest self-contained (watermark lookup = one head read, immune
  *     to manifest vacuuming).
  *
  * On top of the core commit protocol the object provides MERGE,
  * copy-on-write DELETE, OPTIMIZE, vacuum retention, per-file-stats
  * pruned reads ([[readPruned]]), and incremental consumption
  * ([[incrementalRead]] / [[rowDiff]] — IO proportional to the delta /
  * churn, never the table). Single-table scope; no manifest-log
  * compaction (at one manifest per commit the log grows by bytes, and
  * vacuum bounds it).
  */
object Snapshots {

  /** Test-only race-injection seam: runs between a commit's staging step
    * and its claim loop, where a concurrent writer's commit can land.
    * Specs use it to interleave a lazy delete / ADD CONSTRAINT
    * deterministically and prove the claim loop re-validates against the
    * moved head. A no-op in production.
    */
  private[graft] var raceHookForTests: () => Unit = () => ()

  private def fs(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Recursive file walk via `listStatus` — deliberately NOT
    * `FileSystem.listFiles`: that API wraps every entry in a
    * `LocatedFileStatus`, whose constructor EAGERLY loads permissions,
    * and on a local FS without native Hadoop IO each load forks an
    * `ls -ld` subprocess PER FILE (jstack'd as the dominant driver cost
    * of every commit's staging walk — seconds per multi-file commit).
    * `listStatus` keeps permissions lazy and never forks; block
    * locations are irrelevant driver-side.
    */
  private def walkFiles(f: org.apache.hadoop.fs.FileSystem,
      dir: Path): Seq[org.apache.hadoop.fs.FileStatus] = {
    val buf = scala.collection.mutable.ArrayBuffer
      .empty[org.apache.hadoop.fs.FileStatus]
    def go(d: Path): Unit = f.listStatus(d).foreach { st =>
      if (st.isDirectory) go(st.getPath) else buf += st
    }
    go(dir)
    buf.toSeq
  }

  private def manifestDir(table: String) = new Path(table, "_manifests")
  private def dataDir(table: String) = new Path(table, "data")

  private def versionOf(name: String): Long =
    name.stripPrefix("v").stripSuffix(".manifest").toLong

  private def manifestPath(table: String, v: Long) =
    new Path(manifestDir(table), f"v$v%08d.manifest")

  /** True when `version`'s manifest is still retained (v0 always is —
    * the empty table needs no manifest). A change-feed window whose
    * from-version fails this check was vacuumed away; the consumer must
    * fall back to a full re-read (see Incremental.syncMart).
    */
  def hasVersion(spark: SparkSession, table: String, version: Long): Boolean =
    version == 0 || {
      val p = manifestPath(table, version)
      fs(spark, p).exists(p)
    }

  /** Highest committed version, 0 if the table is empty. */
  def currentVersion(spark: SparkSession, table: String): Long = {
    val dir = manifestDir(table)
    val f = fs(spark, dir)
    if (!f.exists(dir)) 0L
    else f.listStatus(dir).map(_.getPath.getName)
      .filter(_.endsWith(".manifest")).map(versionOf)
      .maxOption.getOrElse(0L)
  }

  /** CANONICAL manifest lines of a version — `#`-prefixed header lines
    * followed by the version's COMPLETE data-file list. Empty for v0.
    *
    * The physical manifest may be DELTA-ENCODED (`#base:<v-1>` +
    * `#add:`/`#remove:` lines instead of the file list — see
    * [[claimManifest]], which keeps steady-state commit bytes O(delta)
    * instead of O(table files)): this resolver walks the base chain,
    * applying each step's adds/removes, and returns the same canonical
    * full form either way — every downstream view (filesOf/schemaOf/...)
    * is delta-blind. Chain walks stop at a FULL manifest or a CHECKPOINT
    * file (written every [[CheckpointInterval]] commits and backfilled
    * by vacuum), so resolution is O(interval) manifest reads worst-case;
    * resolved versions are immutable and cached, so repeat reads —
    * commit retry loops, history(), feeds — cost zero extra IO.
    */
  private def manifestLines(spark: SparkSession, table: String,
      version: Long): Seq[String] = {
    if (version == 0) return Nil
    val key = (new Path(table).toString, version)
    resolvedManifests.get(key) match {
      case Some(l) => return l
      case None =>
    }
    def readAll(p: Path): List[String] = {
      val in = fs(spark, p).open(p)
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
      finally in.close()
    }
    val raw = readAll(manifestPath(table, version))
    val lines = raw.find(_.startsWith(BaseHeader)) match {
      case None => raw // full manifest — already canonical
      case Some(bh) =>
        val cp = checkpointPath(table, version)
        if (fs(spark, cp).exists(cp)) readAll(cp)
        else {
          val base = bh.stripPrefix(BaseHeader).toLong
          val baseLines = manifestLines(spark, table, base)
          val baseFiles = filesOf(baseLines)
          val adds = raw.filter(_.startsWith(AddHeader))
            .map(_.stripPrefix(AddHeader))
          val removes = raw.filter(_.startsWith(RemoveHeader))
            .map(_.stripPrefix(RemoveHeader)).toSet
          val kept = baseFiles.filterNot(removes) ++ adds
          // the size ledger is delta-encoded like the file list (#fsz
          // for adds only — O(table) size lines per delta would defeat
          // the O(batch) commit-bytes contract): canonical form carries
          // base sizes for surviving files plus the delta's own
          val sizes = fileSizesOf(baseLines) ++ fileSizesOf(raw)
          val fsz = kept.flatMap(n =>
            sizes.get(n).map(l => s"$FszHeader$l:$n"))
          // every delta carries ALL other non-file headers in full
          // (they are small and bounded) — only the file list and its
          // size ledger are delta-encoded
          raw.filter(l => l.startsWith("#") && !l.startsWith(BaseHeader) &&
            !l.startsWith(AddHeader) && !l.startsWith(RemoveHeader) &&
            !l.startsWith(FszHeader)) ++ fsz ++ kept
        }
    }
    // seed the probe-free read path: resolved sizes are as authoritative
    // as claim-time ones (the ledger travels with the manifest, so a
    // table written by ANOTHER process reads probe-free too)
    val dd = dataDir(table)
    fileSizesOf(lines).foreach { case (n, l) =>
      ManifestFileIndex.recordSize(new Path(dd, n), l)
    }
    if (resolvedManifests.size > 4096) resolvedManifests.clear()
    resolvedManifests.put(key, lines)
    lines
  }

  // claimed manifests are immutable, so resolved lines cache safely
  // across commit retries, history walks, and feed reads (bounded;
  // cleared wholesale past the cap — correctness never depends on it)
  private val resolvedManifests =
    scala.collection.concurrent.TrieMap.empty[(String, Long), Seq[String]]

  /** Drop EVERY cached manifest resolution of `table` — the table-level
    * destructor's companion (SnapshotCatalog.dropTable): "immutable once
    * claimed" stops holding when the whole table tree is deleted and a
    * NEW table is later created at the same path, so without this purge
    * a same-JVM recreate would serve the DROPPED table's file lists and
    * schemas for any version number the new table hasn't reached yet
    * (a raw FileNotFound instead of a clean missing-version refusal).
    * Vacuum keeps removing only its own expired keys.
    */
  private[graft] def invalidateTable(table: String): Unit = {
    val key = new Path(table).toString
    resolvedManifests.keys.filter(_._1 == key)
      .foreach(resolvedManifests.remove)
  }

  // pure views over one set of manifest lines — commit loops read the
  // head manifest ONCE per attempt and derive all three (each fs.open is
  // a round trip on an object store; 3× read amplification per commit
  // attempt is pure waste)
  private def filesOf(lines: Seq[String]): Seq[String] =
    lines.filterNot(_.startsWith("#"))
  private def schemaOf(lines: Seq[String]): Option[types.StructType] =
    lines.find(_.startsWith(SchemaHeader))
      .map(h => types.DataType.fromJson(h.stripPrefix(SchemaHeader))
        .asInstanceOf[types.StructType])
  private def marksOf(lines: Seq[String]): Map[String, Long] =
    lines.filter(_.startsWith(StreamHeader)).map { h =>
      val rest = h.stripPrefix(StreamHeader)
      val cut = rest.indexOf(':')
      rest.substring(cut + 1) -> rest.substring(0, cut).toLong
    }.toMap
  private def checksOf(lines: Seq[String]): Map[String, String] =
    lines.filter(_.startsWith(CheckHeader)).map { h =>
      val rest = h.stripPrefix(CheckHeader)
      val cut = rest.indexOf(':')
      rest.substring(0, cut) -> rest.substring(cut + 1)
    }.toMap
  private def tombstonesOf(lines: Seq[String]): Seq[String] =
    lines.filter(_.startsWith(TombstoneHeader))
      .map(_.stripPrefix(TombstoneHeader))
  private def tombstoneColOf(lines: Seq[String]): Option[String] =
    lines.find(_.startsWith(TombstoneColHeader))
      .map(_.stripPrefix(TombstoneColHeader))
  private def tsOf(lines: Seq[String]): Option[Long] =
    lines.find(_.startsWith(TsHeader))
      .map(_.stripPrefix(TsHeader).toLong)
  private def droppedOf(lines: Seq[String]): Seq[String] =
    lines.filter(_.startsWith(DroppedHeader))
      .map(_.stripPrefix(DroppedHeader))

  // ------------------------------------------------------------------
  // Column mapping (RENAME COLUMN — logical name serves, physical stays)
  // ------------------------------------------------------------------

  /** logical → PHYSICAL column names of a version (`#colmap:` headers,
    * written by [[commitRenameColumn]]): the physical name is what landed
    * files hold forever (renames are metadata-only — Delta's
    * column-mapping idea restricted to names), the logical name is what
    * every API serves. Empty for never-renamed tables, so the whole
    * mapping machinery is a no-op on the common path.
    */
  private def colmapOf(lines: Seq[String]): Map[String, String] =
    lines.filter(_.startsWith(ColmapHeader)).map { h =>
      val rest = h.stripPrefix(ColmapHeader)
      val cut = rest.indexOf(':')
      rest.substring(0, cut) -> rest.substring(cut + 1)
    }.toMap

  /** Colmap of a version — the public face ([[colmapOf]]) for the DSv2
    * catalog, which must read files under PHYSICAL names and serve the
    * LOGICAL schema.
    */
  def colmapAt(spark: SparkSession, table: String,
      version: Long): Map[String, String] =
    colmapOf(manifestLines(spark, table, version))

  // ------------------------------------------------------------------
  // Declared partition transforms (directory-level file skipping)
  // ------------------------------------------------------------------

  /** The version's declared partition transform (`#partition:` header):
    * (column, kind) with kind ∈ identity | date | month | bucket<N>
    * (murmur3 pmod N hash clustering — the storage-partitioned-join
    * layout). Data files of
    * partitioned commits land under `data/__gp=<transform(col)>/...`
    * and their manifest entries carry the dir prefix — the DIRECTORY is
    * a pruning hint and a retention unit; the column itself stays IN
    * every file (unlike Hive layout), so no read path ever needs to
    * re-derive values from paths: pre-transform flat files, partitioned
    * files, and foreign refs all read identically. Carried forward by
    * every commit, like the colmap.
    */
  /** ALL declared partition transforms of a manifest, outermost dir
    * level first. The header is `#partition:c1:k1[;c2:k2...]` — one pair
    * per nesting level (`__gp=`, `__gp2=`, ...), ';'-joined so a
    * single-transform header reads exactly as it always has.
    */
  private def partitionsOf(lines: Seq[String]): Seq[(String, String)] =
    lines.find(_.startsWith(PartitionHeader)).toSeq.flatMap { h =>
      h.stripPrefix(PartitionHeader).split(";", -1).toSeq.map { pair =>
        val cut = pair.lastIndexOf(':')
        (pair.substring(0, cut), pair.substring(cut + 1))
      }
    }

  /** The PRIMARY (outermost) transform — the single-transform view most
    * call sites need; composite-aware code uses [[partitionsOf]].
    */
  private def partitionOf(lines: Seq[String]): Option[(String, String)] =
    partitionsOf(lines).headOption

  private def partRawOf(lines: Seq[String]): Option[String] =
    lines.find(_.startsWith(PartitionHeader))
      .map(_.stripPrefix(PartitionHeader))

  /** [[partitionOf]] of a version — the primary transform. */
  def partitionAt(spark: SparkSession, table: String,
      version: Long): Option[(String, String)] =
    partitionsAt(spark, table, version).headOption

  /** [[partitionsOf]] of a version — the DSv2 catalog's pruning face. */
  def partitionsAt(spark: SparkSession, table: String,
      version: Long): Seq[(String, String)] =
    partitionsOf(manifestLines(spark, table, version))

  private val PartitionKinds = Set("identity", "date", "month")

  /** `bucket<N>` kinds carry their modulus in the kind string (the
    * `#partition:` header stays a flat `col:kind` pair); None for the
    * fixed kinds.
    */
  private[graft] def bucketModulus(kind: String): Option[Int] =
    if (kind.matches("bucket[1-9]\\d{0,5}")) Some(kind.drop(6).toInt)
    else None

  private def validPartitionKind(kind: String): Boolean =
    PartitionKinds(kind) || bucketModulus(kind).isDefined

  private[warehouse] val PartPrefix = "__gp="

  /** The dynamic-partition writer's null sentinel: a row whose transform
    * rendered NULL (null column value, or a failed date cast) lands
    * here. Its age and order are UNDEFINED — every pruner keeps it and
    * partition expiry never drops it.
    */
  private[graft] val NullPartition = "__HIVE_DEFAULT_PARTITION__"

  /** [[partValueOf]] for the DSv2 catalog's key-grouped reporting face
    * (sources/SnapshotCatalog.scala): the UNESCAPED `__gp=` dir value of
    * a manifest entry, None for flat/pre-transform/foreign entries
    * (whose partition value is unknown — a scan holding any such entry
    * must not report a partitioning).
    */
  private[graft] def partitionDirValue(entry: String): Option[String] =
    partValueOf(entry)

  /** Date/month transforms need a column whose ordering IS the
    * truncation's. A string column orders lexicographically, not by
    * parse (" 2021-06-15" casts to a 2021 partition yet sorts before
    * "2020-01-01"), so a dir-value comparison against it would prune
    * files that hold matching rows; only date/timestamp columns
    * qualify. Identity takes any type.
    */
  private def requirePartitionable(schema: types.StructType,
      column: String, kind: String): Unit = {
    require(schema.fieldNames.contains(column), s"no column $column")
    if (bucketModulus(kind).isDefined) {
      // bucket dirs are murmur3 hashes of the column's INTERNAL value:
      // the probe renderer and the V2 bucket function must reproduce
      // the writer's hash from a driver-side value, so only the types
      // with an unambiguous external→internal mapping qualify
      val dt = schema(column).dataType
      require(dt == types.IntegerType || dt == types.LongType ||
          dt == types.StringType || dt == types.DateType,
        s"$kind($column) needs an int/bigint/string/date column, not " +
          s"${dt.simpleString}")
    } else if (kind != "identity") {
      val dt = schema(column).dataType
      require(dt == types.DateType || dt == types.TimestampType ||
          dt == types.TimestampNTZType,
        s"$kind($column) needs a date/timestamp column, not " +
          s"${dt.simpleString} — string order is not the truncation " +
          "order the pruner assumes; use identity, or cast at ingest")
    }
  }

  /** The partition-transform Column of a logical frame. */
  private def partitionExpr(c: String, kind: String)
      : org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{col, date_format, hash, lit,
      pmod}
    kind match {
      case "identity" => col(c).cast("string")
      case "date" => col(c).cast("date").cast("string")
      case "month" => date_format(col(c).cast("date"), "yyyy-MM")
      case b => // bucket<N>: murmur3 (seed 42, Spark's own hash()) mod N
        val n = bucketModulus(b).getOrElse(
          throw new IllegalArgumentException(s"unknown partition kind $b"))
        pmod(hash(col(c)), lit(n)).cast("string")
    }
  }

  /** Dir-column name of nesting level `i` (what the staging writer
    * partitions by) and its dir-fragment prefix: `__gp=` for the
    * primary, `__gp2=`/`__gp3=`... beneath it.
    */
  private def partLevelCol(i: Int): String =
    if (i == 0) "__gp" else s"__gp${i + 1}"
  private def partLevelPrefix(i: Int): String = partLevelCol(i) + "="

  /** Partition value of a manifest entry at nesting level `level`:
    * Some(v) when the entry lands under that level's `__gpN=` dir, None
    * for flat/pre-transform/foreign entries (which every pruner must
    * ALWAYS read — the stats staleness rule). Component-wise parse, so
    * a shallow clone's qualified foreign URIs resolve too.
    */
  private def partValueAt(entry: String, level: Int): Option[String] = {
    val prefix = partLevelPrefix(level)
    entry.split('/').dropRight(1).find(_.startsWith(prefix))
      // dir fragments land ESCAPED (the dynamic-partition writer turns
      // ':','%','=',… into %XX) while probes render RAW values — the
      // comparison space is the unescaped one, or an identity partition
      // holding any escapable char would be wrongly pruned
      .map(c => org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
        .unescapePathName(c.substring(prefix.length)))
  }

  /** [[partValueAt]] of the primary level. */
  private def partValueOf(entry: String): Option[String] =
    partValueAt(entry, 0)

  /** Declare the table's partition transform as a METADATA-ONLY commit
    * (op `setPartition`): from the NEXT commit on, staged files land
    * under `data/__gp=<kind(col)>/` and their manifest entries carry
    * the prefix — directory-level file skipping for predicates on the
    * partition column, and O(entries) whole-partition retention expiry
    * ([[commitExpirePartitions]]). Files landed BEFORE the declaration
    * stay flat and are simply always read (the stats staleness rule);
    * an OPTIMIZE full rewrite re-stages everything under the transform.
    *
    * Refuses when a DIFFERENT transform already governs prefixed
    * entries (their dir values would be misinterpreted): drop the
    * transform is not supported — OPTIMIZE after declaring a fresh one
    * on a flat table is the migration path. The column must exist and
    * must be identity/date/month-transformable.
    */
  def commitSetPartition(spark: SparkSession, table: String, column: String,
      kind: String, maxRetries: Int = 10): Long =
    commitSetPartitions(spark, table, Seq((column, kind)), maxRetries)

  /** [[commitSetPartition]] for COMPOSITE transforms: up to three
    * nesting levels, outermost first — rows land under
    * `data/__gp=<k1(c1)>/__gp2=<k2(c2)>/...`, every pruning leg
    * intersects across levels, and partition expiry keys on the first
    * date/month level. Same declaration rules per level (identity any
    * type, date/month only on date/timestamp columns) and the same
    * change-refusal while prefixed entries are referenced.
    */
  def commitSetPartitions(spark: SparkSession, table: String,
      transforms: Seq[(String, String)], maxRetries: Int = 10): Long = {
    require(transforms.nonEmpty && transforms.size <= 3,
      s"1..3 partition transforms, got ${transforms.size}")
    require(transforms.map(_._1).distinct.size == transforms.size,
      "partition columns must be distinct")
    transforms.foreach { case (c, k) =>
      require(validPartitionKind(k),
        s"partition kind $k not in " +
          s"${PartitionKinds.mkString("/")}/bucket<N>")
      require(!c.contains(":") && !c.contains(";") && !c.contains("\n"),
        s"partition column '$c' must be colon/semicolon/newline-free " +
          "(the transform header is ':'/';' delimited)")
    }
    var attempt = 0
    while (attempt < maxRetries) {
      val head = currentVersion(spark, table)
      require(head > 0, s"no snapshot table at $table to partition")
      val lines = manifestLines(spark, table, head)
      val prior = schemaOf(lines)
        .getOrElse(read(spark, table, Some(head)).schema)
      transforms.foreach { case (c, k) => requirePartitionable(prior, c, k) }
      partitionsOf(lines) match {
        case declared if declared == transforms => return head // no-op
        case declared if declared.nonEmpty =>
          require(!filesOf(lines).exists(_.contains(PartPrefix)),
            s"$table already has prefixed entries under " +
              s"${declared.map { case (c, k) => s"$k($c)" }.mkString("/")}" +
              " — their dir values would be misinterpreted under " +
              s"${transforms.map { case (c, k) => s"$k($c)" }.mkString("/")}" +
              "; change is refused while prefixed entries are referenced")
        case _ => ()
      }
      if (claimManifest(spark, table, head + 1,
          contentOf(schemaOf(lines), marksOf(lines), filesOf(lines),
            "setPartition", checksOf(lines), tombstonesOf(lines),
            tombstoneColOf(lines), droppedOf(lines), colmapOf(lines),
            Some(transforms.map { case (c, k) => s"$c:$k" }.mkString(";")))))
        return head + 1
      attempt += 1
    }
    throw new IllegalStateException(
      s"setPartition on $table failed after $maxRetries attempts")
  }

  /** Create v1 of a NEW snapshot table as ONE atomic claim carrying the
    * declared schema AND (optionally) the partition transform — the DDL
    * face's `CREATE TABLE ... PARTITIONED BY` must not be two commits,
    * or a crash (or a racing flat append) between them leaves the table
    * live without its declared layout. Exactly one of two racing
    * creators claims v1; the loser gets a loud refusal, never a merge.
    */
  def commitCreate(spark: SparkSession, table: String,
      schema: types.StructType,
      partition: Seq[(String, String)] = Nil): Long = {
    require(partition.size <= 3, "at most three partition transforms")
    require(partition.map(_._1).distinct.size == partition.size,
      "partition columns must be distinct")
    partition.foreach { case (c, k) =>
      require(validPartitionKind(k),
        s"partition kind $k not in " +
          s"${PartitionKinds.mkString("/")}/bucket<N>")
      require(!c.contains(":") && !c.contains(";") && !c.contains("\n"),
        s"partition column '$c' must be colon/semicolon/newline-free")
      requirePartitionable(schema, c, k)
    }
    require(currentVersion(spark, table) == 0,
      s"table already exists at $table")
    val claimed = claimManifest(spark, table, 1L,
      contentOf(Some(schema), Map.empty, Nil, "createTable",
        partition = if (partition.isEmpty) None
          else Some(partition.map { case (c, k) => s"$c:$k" }
            .mkString(";"))))
    require(claimed,
      s"create of $table lost the claim race — the table now exists")
    1L
  }

  /** Drop every WHOLE PARTITION older than `cutoff` as ONE metadata
    * commit (op `expirePartitions`) — the retention path a partitioned
    * 100 TB table runs: entries whose `__gp=` value sorts strictly
    * below the cutoff's transform rendering leave the manifest, no data
    * byte is read or rewritten (vacuum reclaims them after retention),
    * and un-prefixed entries are KEPT (they can't prove their age —
    * never silently over-delete). Cutoff takes the COLUMN's domain
    * (a date/timestamp/ISO string for date/month transforms). Returns
    * (version, entries dropped) — the unchanged head with 0 when
    * nothing is old enough.
    */
  def commitExpirePartitions(spark: SparkSession, table: String,
      cutoff: Any, maxRetries: Int = 10): (Long, Int) = {
    var attempt = 0
    while (attempt < maxRetries) {
      val head = currentVersion(spark, table)
      require(head > 0, s"no snapshot table at $table")
      val lines = manifestLines(spark, table, head)
      val declared = partitionsOf(lines)
      require(declared.nonEmpty, s"$table declares no partition " +
        "transform — nothing to expire")
      // "older than" needs an AGE order: date/month truncations have
      // one (ISO string order); identity values don't ('10' < '9'
      // lexicographically — expiry would drop the wrong partitions).
      // Composite layouts expire on their FIRST date/month level.
      val ((pc, kind), level) = declared.zipWithIndex
        .find(p => p._1._2 == "date" || p._1._2 == "month").getOrElse(
          throw new IllegalArgumentException(
            s"EXPIRE PARTITIONS on ${declared.map { case (c, k) =>
              s"$k($c)" }.mkString("/")}: identity values carry no " +
              "age order — only date/month transforms expire"))
      val cut = partProbeValue(kind, cutoff).getOrElse(
        throw new IllegalArgumentException(
          s"cutoff $cutoff does not render under $kind($pc)"))
      val files = filesOf(lines)
      // the null partition can't prove its age — never expire it
      val (doomed, kept) = files.partition(e =>
        partValueAt(e, level).exists(v => v != NullPartition && v < cut))
      if (doomed.isEmpty) return (head, 0)
      // a pending tombstone key may live in a doomed partition — the
      // tombstones CARRY (anti-join of a gone row is a no-op, never a
      // resurrection)
      if (claimManifest(spark, table, head + 1,
          contentOf(schemaOf(lines), marksOf(lines), kept,
            "expirePartitions", checksOf(lines), tombstonesOf(lines),
            tombstoneColOf(lines), droppedOf(lines), colmapOf(lines),
            partRawOf(lines))))
        return (head + 1, doomed.size)
      attempt += 1
    }
    throw new IllegalStateException(
      s"expirePartitions on $table failed after $maxRetries attempts")
  }

  /** Data-relative retention for PARTITIONED snapshot tables — the
    * maintenance policy's expiry leg rebased onto the declared
    * transform: expire whole partitions older than (newest partition
    * value − (retainDays−1)), measured from the table's OWN newest
    * partition (deterministic and replayable, the same discipline as
    * the Hive-layout policy). Only date/month transforms carry an age;
    * identity transforms and flat tables return None. Metadata-only
    * ([[commitExpirePartitions]]); vacuum reclaims the bytes later.
    */
  def expireRetainedDays(spark: SparkSession, table: String,
      retainDays: Int): Option[(Long, Int)] = {
    require(retainDays > 0, "retainDays must be positive")
    val head = currentVersion(spark, table)
    if (head == 0) return None
    val lines = manifestLines(spark, table, head)
    partitionsOf(lines).zipWithIndex
      .find(p => p._1._2 == "date" || p._1._2 == "month")
      .flatMap { case ((_, kind), level) =>
        // only values in the transform's ISO shape carry an age: the
        // null-partition sentinel sorts ABOVE every date ('_' > '9')
        // and would wedge the parse below on one null row
        val shape =
          if (kind == "month") """\d{4}-\d{2}""" else """\d{4}-\d{2}-\d{2}"""
        val newest = filesOf(lines).flatMap(partValueAt(_, level))
          .filter(_.matches(shape)).maxOption
        newest.flatMap { nv =>
          val newestDay = java.time.LocalDate.parse(
            if (kind == "month") nv + "-01" else nv)
          val cutoff = newestDay.minusDays(retainDays - 1L).toString
          val (v, n) = commitExpirePartitions(spark, table, cutoff)
          if (n == 0) None else Some((v, n))
        }
      }
  }

  /** Partition census of a version: one row per partition value —
    * (partition, num_files, size_bytes) — plus a `<flat>` row for
    * un-prefixed (pre-transform) entries. Metadata-only: one manifest
    * read and a getFileStatus per entry, never a data read — the audit
    * an operator consults before `EXPIRE PARTITIONS OLDER THAN`.
    */
  def partitionCensus(spark: SparkSession, table: String,
      version: Option[Long] = None): DataFrame = {
    import spark.implicits._
    val v = version.getOrElse(currentVersion(spark, table))
    require(v > 0, s"no snapshot table at $table")
    val lines = manifestLines(spark, table, v)
    val dd = dataDir(table)
    val f = fs(spark, dd)
    val ledger = fileSizesOf(lines) // probe-free for size-manifested tables
    filesOf(lines).map { n =>
      val bytes = ledger.getOrElse(n,
        try f.getFileStatus(new Path(dd, n)).getLen
        catch { case _: Exception => 0L })
      // composite layouts census one row per LEAF partition — all
      // levels' unescaped values joined ("2024-06/eu"), exactly the
      // retention/audit granularity the nested dirs give
      val levels = n.split('/').dropRight(1)
        .filter(_.matches("""__gp\d*=.*"""))
        .map(c => org.apache.spark.sql.catalyst.catalog
          .ExternalCatalogUtils.unescapePathName(
            c.substring(c.indexOf('=') + 1)))
      (if (levels.isEmpty) "<flat>" else levels.mkString("/"), bytes)
    }.groupBy(_._1).toSeq
      .map { case (pv, xs) => (pv, xs.size.toLong, xs.map(_._2).sum) }
      .sortBy(_._1)
      .toDF("partition", "num_files", "size_bytes")
  }

  /** Subset of `entries` the declared partition transform cannot rule
    * out for conjunctive per-column bounds: only bounds on the
    * partition COLUMN prune, un-prefixed entries always survive, and a
    * probe value whose transform rendering is inexact prunes nothing.
    * Date/month truncation is monotone, so `col >= lo` implies
    * `trunc(col) >= trunc(lo)` — the dir-value comparison is sound in
    * ISO string order.
    */
  /** An external probe value's class hashes IDENTICALLY to the bucket
    * column's internal encoding — the guard that keeps bucket rendering
    * type-strict: an Integer probe murmur3s through hashInt while a
    * LongType column's dirs hashed hashLong, so the same NUMBER lands a
    * different bucket and an unchecked prune would drop matching rows.
    * No declared type (legacy header-less table) → never prune.
    * DateType accepts Date/LocalDate (both render through the epoch-day
    * hashInt the writer used).
    */
  private def bucketProbeTypeOk(dt: Option[types.DataType],
      v: Any): Boolean = dt match {
    case Some(types.IntegerType) => v.isInstanceOf[java.lang.Integer]
    case Some(types.LongType) => v.isInstanceOf[java.lang.Long]
    case Some(types.StringType) => v.isInstanceOf[String]
    case Some(types.DateType) => v.isInstanceOf[java.sql.Date] ||
      v.isInstanceOf[java.time.LocalDate]
    case _ => false
  }

  private def pruneEntriesByPartition(
      partitions: Seq[(String, String)],
      bounds: Seq[(String, Option[Any], Option[Any])],
      entries: Seq[String],
      schema: Option[types.StructType] = None): Seq[String] =
    // composite layouts INTERSECT the levels' verdicts: each level
    // prunes independently on its own column's bounds, and an entry
    // survives only if no level can rule it out
    partitions.zipWithIndex.foldLeft(entries) {
      case (live, ((pc, kind), level)) =>
        val relevant = bounds.filter(_._1 == pc)
        if (relevant.isEmpty || live.isEmpty) live
        else live.filter { e =>
          partValueAt(e, level) match {
            case None => true // flat/foreign/pre-transform: always read
            case Some(NullPartition) => true // null rendering has no order
            case Some(v) =>
              // bucket dirs carry NO range order (hash ids): only an
              // exact equality bound (lo == hi) whose value class
              // matches the column's declared type may prune — the
              // probed value's bucket either is this dir or isn't
              if (bucketModulus(kind).isDefined) {
                val dt = schema.flatMap(_.fields.find(_.name == pc))
                  .map(_.dataType)
                relevant.forall {
                  case (_, Some(l), Some(h))
                      if l == h && bucketProbeTypeOk(dt, l) =>
                    partProbeValue(kind, l).forall(b => v == b)
                  case _ => true
                }
              }
              else relevant.forall { case (_, lo, hi) =>
                lo.flatMap(partProbeValue(kind, _)).forall(l => v >= l) &&
                  hi.flatMap(partProbeValue(kind, _)).forall(h => v <= h)
              }
          }
        }
    }

  /** The transform's rendering of a driver-side probe value, in the
    * same form [[partitionExpr]] writes into dir names — None when the
    * value's rendering is not exact (prune nothing, never wrongly).
    */
  private def partProbeValue(kind: String, v: Any): Option[String] = {
    val dateStr: Option[String] = v match {
      case d: java.sql.Date => Some(d.toString)
      case t: java.sql.Timestamp =>
        Some(t.toLocalDateTime.toLocalDate.toString)
      // java8 / NTZ external forms (TIMESTAMP_NTZ filters arrive as
      // LocalDateTime; the java8API conf serves LocalDate/Instant)
      case ld: java.time.LocalDate => Some(ld.toString)
      case ldt: java.time.LocalDateTime => Some(ldt.toLocalDate.toString)
      case ins: java.time.Instant => // the engine's clock discipline
        Some(ins.atZone(java.time.ZoneOffset.UTC).toLocalDate.toString)
      case s: String if s.length >= 10 &&
        s.matches("""\d{4}-\d{2}-\d{2}.*""") => Some(s.take(10))
      case _ => None
    }
    kind match {
      case "identity" => v match {
        // strings only: a numeric rendering would compare
        // lexicographically ("10" < "9") — prune nothing instead
        case str: String => Some(str)
        case _ => None
      }
      case "date" => dateStr
      case "month" => dateStr.map(_.take(7))
      case b if bucketModulus(b).isDefined =>
        // EQUALITY-ONLY semantics: the rendering is the probed value's
        // bucket id — meaningful for = / IN membership, never for
        // ranges (pruneEntriesByPartition guards). The hash must
        // reproduce the writer's `pmod(hash(col), N)` from the
        // EXTERNAL value, so only the classes with one internal form
        // render; a mismatch (e.g. Integer probe on a LongType column)
        // cannot happen for pushed filters — Spark casts literals to
        // the column type before translation.
        bucketModulus(b).flatMap { n =>
          import org.apache.spark.sql.catalyst.expressions.Murmur3HashFunction
          import org.apache.spark.sql.{types => T}
          val h: Option[Int] = v match {
            case i: java.lang.Integer => Some(Murmur3HashFunction
              .hash(i.intValue(), T.IntegerType, 42L).toInt)
            case l: java.lang.Long => Some(Murmur3HashFunction
              .hash(l.longValue(), T.LongType, 42L).toInt)
            case s: String => Some(Murmur3HashFunction.hash(
              org.apache.spark.unsafe.types.UTF8String.fromString(s),
              T.StringType, 42L).toInt)
            case d: java.sql.Date => Some(Murmur3HashFunction.hash(
              org.apache.spark.sql.catalyst.util.DateTimeUtils
                .fromJavaDate(d), T.DateType, 42L).toInt)
            case ld: java.time.LocalDate => Some(Murmur3HashFunction
              .hash(ld.toEpochDay.toInt, T.DateType, 42L).toInt)
            case _ => None
          }
          h.map(x => (((x % n) + n) % n).toString)
        }
    }
  }

  private def physName(colmap: Map[String, String], c: String): String =
    colmap.getOrElse(c, c)

  /** The declared (logical) schema with renamed fields mapped back to
    * their physical on-file names — what parquet reads resolve against.
    */
  private def physSchema(schema: types.StructType,
      colmap: Map[String, String]): types.StructType =
    if (colmap.isEmpty) schema
    else types.StructType(schema.fields.map(f =>
      f.copy(name = physName(colmap, f.name))))

  /** Rename a LOGICAL frame's columns to their physical names before
    * staging (the write half of the column-mapping boundary). Only
    * columns present in the frame rename; everything else is identity.
    */
  private def toPhysical(df: DataFrame,
      colmap: Map[String, String]): DataFrame =
    if (colmap.isEmpty) df
    else df.withColumnsRenamed(
      colmap.filter { case (l, p) => l != p && df.columns.contains(l) })

  /** Data files of a version (empty for v0). Header lines (`#...`) are
    * protocol metadata, never file names.
    */
  def filesAt(spark: SparkSession, table: String, version: Long): Seq[String] =
    filesOf(manifestLines(spark, table, version))

  /** Spec hook: the version's `#fsz:` size ledger (entry → bytes). */
  private[graft] def fileSizesAt(spark: SparkSession, table: String,
      version: Long): Map[String, Long] =
    fileSizesOf(manifestLines(spark, table, version))

  // ------------------------------------------------------------------
  // Schema evolution (manifest-recorded)
  // ------------------------------------------------------------------

  private val SchemaHeader = "#schema:"
  private val StreamHeader = "#stream:"
  private val OpHeader = "#op:"
  private val TsHeader = "#ts:"
  private val CheckHeader = "#check:"
  private val TombstoneHeader = "#tombstone:"
  private val TombstoneColHeader = "#tombstonecol:"
  private val DroppedHeader = "#dropped:"
  private val ColmapHeader = "#colmap:"
  private val PartitionHeader = "#partition:"
  // delta-encoding headers (see claimManifest / manifestLines)
  private val BaseHeader = "#base:"
  private val AddHeader = "#add:"
  private val RemoveHeader = "#remove:"
  // per-file byte length, `#fsz:<len>:<entry>` — recorded at claim time
  // (Iceberg-manifest-entry style) so readers build FileStatuses with
  // ZERO per-file getFileStatus probes (ManifestFiles.statusesOf). Like
  // the file list itself, delta manifests carry #fsz for ADDS only;
  // resolution re-derives the rest from the base chain.
  private val FszHeader = "#fsz:"

  /** entry → byte length recorded in the lines' `#fsz:` ledger. */
  private def fileSizesOf(lines: Seq[String]): Map[String, Long] =
    lines.iterator.filter(_.startsWith(FszHeader)).map { h =>
      val rest = h.stripPrefix(FszHeader)
      val cut = rest.indexOf(':')
      rest.substring(cut + 1) -> rest.substring(0, cut).toLong
    }.toMap

  /** A full checkpoint rides alongside every Nth claimed manifest (and
    * vacuum backfills one at the new retention floor), bounding delta-
    * chain resolution to O(N) manifest reads.
    */
  private val CheckpointInterval = 16L

  private def checkpointPath(table: String, v: Long) =
    new Path(manifestDir(table), f"v$v%08d.checkpoint")

  /** Declared schema of a version, recorded at commit time in the
    * manifest (`#schema:` header). This is what makes schema evolution
    * scale: readers apply the DECLARED schema instead of merging footers
    * (`mergeSchema` reads every footer — at millions of files that's a
    * planning-time full-metadata scan), and parquet's name-based column
    * resolution serves files from before an added column as NULLs.
    * None for v0 and for legacy manifests written before this header.
    */
  def schemaAt(spark: SparkSession, table: String,
      version: Long): Option[types.StructType] =
    schemaOf(manifestLines(spark, table, version))

  /** True when reading parquet files written as `from` under a declared
    * schema of `to` is a SAFE UPCAST the reader performs natively
    * (Spark's vectorized parquet reader promotes these — the same set
    * Delta's type widening allows): int→long, float→double, and decimal
    * precision growth at the same scale. Everything else is a narrowing
    * or a re-interpretation and refuses.
    */
  private def widens(from: types.DataType, to: types.DataType): Boolean =
    (from, to) match {
      case (types.IntegerType, types.LongType) => true
      case (types.FloatType, types.DoubleType) => true
      case (f: types.DecimalType, t: types.DecimalType) =>
        t.scale == f.scale && t.precision > f.precision
      case _ => false
    }

  /** Union-evolve: fields shared with the prior schema keep their exact
    * type OR WIDEN (int→long, float→double, decimal precision growth —
    * the declared type takes the batch's wider form and parquet's
    * name-based resolution upcasts the already-landed narrower files at
    * read, so a 100 TB type migration is one append instead of a full
    * overwrite); any other type change is silent drift and refuses at
    * commit time, the only place it can be refused cheaply. Genuinely
    * new fields append; prior-only fields survive, so an append missing
    * a column never narrows the table.
    */
  private def evolveSchema(prior: Option[types.StructType],
      batch: types.StructType): types.StructType = prior match {
    case None => batch
    case Some(p) =>
      val shared = p.fields.map { pf =>
        batch.fields.find(_.name == pf.name) match {
          case Some(bf) if bf.dataType == pf.dataType => pf
          case Some(bf) if widens(pf.dataType, bf.dataType) =>
            pf.copy(dataType = bf.dataType)
          case Some(bf) =>
            throw new IllegalArgumentException(
              s"schema evolution cannot change column ${bf.name}: " +
                s"${pf.dataType.simpleString} -> " +
                s"${bf.dataType.simpleString} (only widening — int->" +
                "long, float->double, decimal precision growth — is a " +
                "safe in-place migration)")
          case None => pf
        }
      }
      types.StructType(shared ++
        batch.fields.filterNot(f => p.fieldNames.contains(f.name)))
  }

  // ------------------------------------------------------------------
  // Column DEFAULT values (schema-metadata-recorded)
  // ------------------------------------------------------------------

  // Spark's own default-column convention: CURRENT_DEFAULT is the SQL
  // text future writes materialize for a missing column;
  // EXISTS_DEFAULT is its constant-folded literal the PARQUET READER
  // ITSELF serves for files that physically lack the column — so
  // ADD COLUMNS ... DEFAULT is metadata-only at any table size and
  // every read path (Scala API, catalog SQL, feeds) fills the default
  // with zero extra code. Both ride the `#schema:` header (StructField
  // metadata round-trips through schema JSON).
  private val CurrentDefaultKey = org.apache.spark.sql.catalyst.util
    .ResolveDefaultColumns.CURRENT_DEFAULT_COLUMN_METADATA_KEY
  private val ExistsDefaultKey = org.apache.spark.sql.catalyst.util
    .ResolveDefaultColumns.EXISTS_DEFAULT_COLUMN_METADATA_KEY

  /** Declared column defaults of a version: column → CURRENT_DEFAULT
    * SQL text (what a write missing the column materializes).
    */
  def columnDefaults(spark: SparkSession, table: String,
      version: Option[Long] = None): Map[String, String] = {
    val lines = manifestLines(spark, table,
      version.getOrElse(currentVersion(spark, table)))
    schemaOf(lines).map(_.fields.toSeq
      .filter(_.metadata.contains(CurrentDefaultKey))
      .map(f => f.name -> f.metadata.getString(CurrentDefaultKey)).toMap)
      .getOrElse(Map.empty)
  }

  /** Materialize CURRENT_DEFAULT values into a batch's MISSING columns
    * (SQL write semantics: an append omitting a defaulted column lands
    * the DEFAULT, not NULL — and CHECK constraints evaluate against the
    * defaulted values). Columns the batch carries are untouched:
    * an explicit NULL stays NULL.
    */
  private def fillWriteDefaults(batch: DataFrame,
      head: Option[types.StructType]): DataFrame = head match {
    case None => batch
    case Some(s) =>
      s.fields.filter(f => !batch.columns.contains(f.name) &&
          (f.metadata.contains(CurrentDefaultKey) ||
            f.metadata.contains(ExistsDefaultKey)))
        .foldLeft(batch) { (b, f) =>
          // a missing column with a live default materializes it; one
          // whose default was DROPPED (EXISTS_DEFAULT only) materializes
          // an EXPLICIT NULL — a file physically missing the column
          // would otherwise serve the reader-level back-fill meant
          // strictly for files predating the column
          val v =
            if (f.metadata.contains(CurrentDefaultKey))
              org.apache.spark.sql.functions
                .expr(f.metadata.getString(CurrentDefaultKey))
            else org.apache.spark.sql.functions.lit(null)
          b.withColumn(f.name, v.cast(f.dataType))
        }
  }

  /** Pad and column-order `df` to `schema` (for merge inputs that
    * predate an added column): a missing column takes its declared
    * CURRENT_DEFAULT when one exists (write semantics), NULL otherwise.
    * A shared column whose type differs casts to the declared one — the
    * widening path reads old files through a NARROWER in-flight frame
    * (a rewrite slice read before the widening evolved), and re-landing
    * it must stage the declared type.
    */
  private def conform(df: DataFrame, schema: types.StructType): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, lit}
    df.select(schema.fields.toIndexedSeq.map { fld =>
      if (!df.columns.contains(fld.name)) {
        val base =
          if (fld.metadata.contains(CurrentDefaultKey))
            expr(fld.metadata.getString(CurrentDefaultKey))
          else lit(null)
        base.cast(fld.dataType).as(fld.name)
      }
      else if (df.schema(fld.name).dataType == fld.dataType) col(fld.name)
      else col(fld.name).cast(fld.dataType).as(fld.name)
    }: _*)
  }

  /** Manifest body: schema header (when the table tracks one), the
    * stream-watermark headers (one per stream, sorted for determinism),
    * then the data-file names. Stream marks are CARRIED FORWARD by every
    * commit (see [[lastCommittedBatch]]): each manifest is self-contained,
    * so the watermark lookup is one head-manifest read and survives any
    * vacuum of older manifests.
    */
  private def contentOf(schema: Option[types.StructType],
      marks: Map[String, Long], files: Seq[String],
      op: String, checks: Map[String, String] = Map.empty,
      tombstones: Seq[String] = Nil,
      tombstoneCol: Option[String] = None,
      dropped: Seq[String] = Nil,
      colmap: Map[String, String] = Map.empty,
      partition: Option[String] = None): String =
    // the commit instant rides IN the manifest (`#ts:`): file mtimes are
    // not durable across a table copy, an object-store migration, or
    // writer clock skew — the header is what history() and TIMESTAMP AS
    // OF resolve against (mtime stays the fallback for legacy manifests)
    (Seq(OpHeader + op, TsHeader + System.currentTimeMillis()) ++
      schema.map(s => SchemaHeader + s.json).toSeq ++
      marks.toSeq.sortBy(_._1)
        .map { case (sid, bid) => s"$StreamHeader$bid:$sid" } ++
      checks.toSeq.sortBy(_._1)
        .map { case (n, ex) => s"$CheckHeader$n:$ex" } ++
      (if (tombstones.isEmpty) Nil
       else tombstoneCol.map(TombstoneColHeader + _).toSeq ++
         tombstones.sorted.map(TombstoneHeader + _)) ++
      // DROP COLUMN ledger: names whose data still physically exists in
      // carried files — re-adding one would RESURRECT pre-drop values
      // through parquet's name-based resolution, so the names stay
      // refused until a full rewrite physically purges them (the only
      // commit that clears this list)
      dropped.sorted.map(DroppedHeader + _) ++
      // column-mapping entries (logical:physical) — carried by every
      // commit whose files may still hold the physical name, like the
      // dropped ledger; full rewrites/overwrites normalize and clear
      colmap.toSeq.sortBy(_._1)
        .map { case (l, p) => s"$ColmapHeader$l:$p" } ++
      partition.map(PartitionHeader + _).toSeq ++
      files).mkString("\n")

  /** Read `names` under the version's declared schema when one exists —
    * the READ half of the column-mapping boundary: files resolve under
    * PHYSICAL names (renamed columns would otherwise read all-NULL
    * through parquet's name-based resolution), the returned frame serves
    * LOGICAL names, so every caller above this line — probes, merges,
    * constraints, tombstone joins, feeds — lives purely in logical space.
    */
  private def readWithSchema(spark: SparkSession, table: String,
      names: Seq[String], schema: Option[types.StructType],
      colmap: Map[String, String]): DataFrame = {
    schema match {
      case Some(s) =>
        val df = readFileList(spark, table, names, physSchema(s, colmap))
        if (colmap.isEmpty) df else df.toDF(s.fieldNames.toIndexedSeq: _*)
      case None => // legacy manifests without a declared schema: parquet
        // footer inference is the only source of truth — keep Spark's own
        // discovery path for them
        spark.read.parquet(
          names.map(n => new Path(dataDir(table), n).toString): _*)
    }
  }

  /** Scan exactly `names` under the given PHYSICAL schema through a
    * manifest-backed [[ManifestFileIndex]]: no file-listing job, no
    * footer schema inference — the manifest is the index (guide §6).
    * Same FileSourceScanExec, pushdown and pruning as a plain
    * `spark.read.schema(...).parquet(paths)`.
    */
  private def readFileList(spark: SparkSession, table: String,
      names: Seq[String], phys: types.StructType): DataFrame = {
    val dd = dataDir(table)
    val index = new ManifestFileIndex(dd,
      ManifestFileIndex.statusesOf(
        spark.sparkContext.hadoopConfiguration, dd, names))
    // force-nullable mirrors DataFrameReader.schema(...)'s asNullable:
    // schema-evolved files missing a later column must serve NULL, not
    // refuse the read
    def asNullable(dt: types.DataType): types.DataType = dt match {
      case s: types.StructType => types.StructType(s.fields.map(fd =>
        fd.copy(dataType = asNullable(fd.dataType), nullable = true)))
      case a: types.ArrayType =>
        a.copy(elementType = asNullable(a.elementType), containsNull = true)
      case m: types.MapType =>
        m.copy(valueType = asNullable(m.valueType), valueContainsNull = true)
      case x => x
    }
    val rel = org.apache.spark.sql.execution.datasources.HadoopFsRelation(
      index, types.StructType(Nil),
      asNullable(phys).asInstanceOf[types.StructType], None,
      new org.apache.spark.sql.execution.datasources.parquet
        .ParquetFileFormat, Map.empty[String, String])(spark)
    org.apache.spark.sql.graft.ColumnBridge.ofRows(spark,
      org.apache.spark.sql.execution.datasources.LogicalRelation(
        rel, isStreaming = false))
  }

  // ------------------------------------------------------------------
  // CHECK constraints (manifest-recorded, enforced at ingest)
  // ------------------------------------------------------------------

  /** Constraints declared on a version (`#check:` headers): name →
    * boolean SQL expression. Carried forward by every commit, like
    * stream marks.
    */
  def checkConstraints(spark: SparkSession, table: String,
      version: Option[Long] = None): Map[String, String] =
    checksOf(manifestLines(spark, table,
      version.getOrElse(currentVersion(spark, table))))

  /** Fail the commit when any batch row VIOLATES any declared CHECK
    * (SQL semantics: NULL passes, only FALSE violates). ONE aggregation
    * pass computes every constraint's violation count — enforcement
    * costs one scan of the BATCH regardless of how many constraints the
    * table declares, and never touches landed data.
    *
    * The batch is CONFORMED to the union of the declared head schema and
    * its own before the constraints evaluate: a legal schema-subset
    * append (evolveSchema allows batches omitting columns, which readers
    * serve as NULL) must see the omitted column as NULL — which PASSES
    * under SQL CHECK semantics — instead of failing column resolution.
    * A constraint referencing a column in neither schema (possible after
    * an overwrite narrowed the table) still refuses, with a clear
    * message instead of a raw AnalysisException.
    */
  private def enforceChecks(batch: DataFrame, checks: Map[String, String],
      table: String,
      headSchema: Option[types.StructType] = None): Unit = {
    if (checks.isEmpty) return
    import org.apache.spark.sql.functions._
    val b = conform(batch, evolveSchema(headSchema, batch.schema))
    val aggs = checks.toSeq.sortBy(_._1).map { case (n, ex) =>
      sum(when(!coalesce(expr(ex), lit(true)), 1L).otherwise(0L)).as(n) }
    val r =
      try b.agg(aggs.head, aggs.tail: _*).head
      catch {
        case e: org.apache.spark.sql.AnalysisException =>
          throw new IllegalArgumentException(
            s"CHECK constraint on $table references a column absent from " +
              s"both the batch and the declared schema: ${e.getMessage}")
      }
    val bad = checks.toSeq.sortBy(_._1).zipWithIndex.collect {
      case ((n, ex), i) if !r.isNullAt(i) && r.getLong(i) > 0 =>
        s"$n ($ex): ${r.getLong(i)} row(s)"
    }
    if (bad.nonEmpty) throw new IllegalArgumentException(
      s"CHECK constraint violation on $table — batch refused: " +
        bad.mkString("; "))
  }

  /** ADD COLUMNS as a METADATA-ONLY commit (op `addColumn`): the new
    * manifest carries the same files under a declared schema extended
    * with the new (forced-nullable) fields — zero data moves at any
    * table size, and every reader serves the new columns as NULL for
    * all landed rows (parquet name-based resolution). Later appends may
    * then populate them. Refuses columns that already exist; the table
    * must have at least one committed version (schema-only tables
    * included — CREATE TABLE commits v1).
    */
  def commitAddColumns(spark: SparkSession, table: String,
      fields0: Seq[types.StructField], maxRetries: Int = 10,
      defaults: Map[String, String] = Map.empty): Long = {
    require(fields0.nonEmpty, "ADD COLUMNS needs at least one column")
    defaults.keys.foreach(c => require(fields0.exists(_.name == c),
      s"DEFAULT declared for $c, which is not among the added columns"))
    // attach CURRENT_DEFAULT and constant-fold EXISTS_DEFAULT (Spark's
    // own machinery — validates the expression and refuses non-foldable
    // defaults): landed files lacking the column serve the folded
    // literal straight from the parquet reader, zero data movement
    val fields =
      if (defaults.isEmpty) fields0
      else org.apache.spark.sql.catalyst.util.ResolveDefaultColumns
        .constantFoldCurrentDefaultsToExistDefaults(
          types.StructType(fields0.map { f =>
            defaults.get(f.name) match {
              case Some(d) => f.copy(metadata =
                new types.MetadataBuilder().withMetadata(f.metadata)
                  .putString(CurrentDefaultKey, d).build())
              case None => f
            }
          }), "ALTER TABLE ADD COLUMNS").fields.toSeq
    var attempt = 0
    while (attempt < maxRetries) {
      val head = currentVersion(spark, table)
      require(head > 0, s"no snapshot table at $table to add columns to")
      val lines = manifestLines(spark, table, head)
      // legacy tables without a #schema header derive the prior from a
      // footer read once — every commit after this records the header
      val prior = schemaOf(lines)
        .getOrElse(read(spark, table, Some(head)).schema)
      fields.foreach(f => require(!prior.fieldNames.contains(f.name),
        s"column ${f.name} already exists on $table"))
      // a DROPPED name is not reusable while carried files still hold
      // its pre-drop values (name-based parquet resolution would
      // resurrect them); OPTIMIZE's full rewrite clears the ledger
      fields.foreach(f => require(!droppedOf(lines).contains(f.name),
        s"column ${f.name} was DROPPED from $table and its data still " +
          "exists in carried files — OPTIMIZE (full rewrite) before " +
          "reusing the name"))
      // forced nullable: landed rows HAVE no value for the new column,
      // so a non-null declaration would lie to every reader
      val schema = types.StructType(prior.fields ++
        fields.map(_.copy(nullable = true)))
      if (claimManifest(spark, table, head + 1,
          contentOf(Some(schema), marksOf(lines), filesOf(lines),
            "addColumn", checksOf(lines), tombstonesOf(lines),
            tombstoneColOf(lines), droppedOf(lines), colmapOf(lines),
            partRawOf(lines))))
        return head + 1
      attempt += 1
    }
    throw new IllegalStateException(
      s"addColumns on $table failed after $maxRetries attempts")
  }

  /** WIDEN a column's declared type as a METADATA-ONLY commit (op
    * `widenColumn`): int→long, float→double, decimal precision growth —
    * the same safe set [[evolveSchema]] accepts from appends, but
    * driven explicitly (the migration statement a 100 TB table runs
    * INSTEAD of an overwrite: zero data moves, old narrower files
    * upcast at read, and appends in the wide type are legal from the
    * next commit on). Any non-widening change refuses.
    */
  def commitWidenColumn(spark: SparkSession, table: String, column: String,
      to: types.DataType, maxRetries: Int = 10): Long = {
    var attempt = 0
    while (attempt < maxRetries) {
      val head = currentVersion(spark, table)
      require(head > 0, s"no snapshot table at $table to widen")
      val lines = manifestLines(spark, table, head)
      val prior = schemaOf(lines)
        .getOrElse(read(spark, table, Some(head)).schema)
      val field = prior.fields.find(_.name == column).getOrElse(
        throw new IllegalArgumentException(
          s"no column $column on $table"))
      require(widens(field.dataType, to),
        s"ALTER COLUMN $column ${field.dataType.simpleString} -> " +
          s"${to.simpleString} is not a safe widening (int->long, " +
          "float->double, decimal precision growth)")
      val schema = types.StructType(prior.fields.map(f =>
        if (f.name == column) f.copy(dataType = to) else f))
      if (claimManifest(spark, table, head + 1,
          contentOf(Some(schema), marksOf(lines), filesOf(lines),
            "widenColumn", checksOf(lines), tombstonesOf(lines),
            tombstoneColOf(lines), droppedOf(lines), colmapOf(lines),
            partRawOf(lines))))
        return head + 1
      attempt += 1
    }
    throw new IllegalStateException(
      s"widenColumn on $table failed after $maxRetries attempts")
  }

  /** DROP a column as a METADATA-ONLY commit (op `dropColumn`): the new
    * manifest re-references the same files under the declared schema
    * MINUS the column — zero data moves at any table size, readers stop
    * projecting it immediately (explicit-schema parquet reads ignore
    * extra physical columns), and time travel keeps the column visible
    * in pre-drop versions.
    *
    * The dropped NAME enters the manifest's `#dropped:` ledger, carried
    * forward by every commit that still references pre-drop files:
    * re-adding the name (ADD COLUMNS, or an append/merge whose batch
    * carries it) is REFUSED until a full-rewrite OPTIMIZE physically
    * purges the old values — Delta needs column-mapping mode for DROP
    * COLUMN precisely because name-based resolution would otherwise
    * resurrect them; the ledger is this protocol's name-based answer.
    * Refuses to drop the last column, the pending-tombstone key column
    * (the read-side anti-join would lose its key), or a column a CHECK
    * constraint mentions (DROP CONSTRAINT first).
    */
  def commitDropColumn(spark: SparkSession, table: String, column: String,
      maxRetries: Int = 10): Long = {
    var attempt = 0
    while (attempt < maxRetries) {
      val head = currentVersion(spark, table)
      require(head > 0, s"no snapshot table at $table to drop a column from")
      val lines = manifestLines(spark, table, head)
      val prior = schemaOf(lines)
        .getOrElse(read(spark, table, Some(head)).schema)
      require(prior.fieldNames.contains(column),
        s"no column $column on $table")
      require(prior.fields.length > 1,
        s"cannot drop the last column of $table")
      require(!partitionsOf(lines).exists(_._1 == column),
        s"column $column is $table's declared partition column")
      require(!(tombstonesOf(lines).nonEmpty &&
          tombstoneColOf(lines).contains(column)),
        s"column $column keys ${tombstonesOf(lines).size} pending " +
          s"lazy-delete tombstone file(s) on $table — OPTIMIZE to " +
          "materialize them first")
      val mention = ("(?i)\\b" +
        java.util.regex.Pattern.quote(column) + "\\b").r
      checksOf(lines).foreach { case (n, ex) =>
        require(mention.findFirstIn(ex).isEmpty,
          s"constraint $n CHECK ($ex) mentions column $column — " +
            "DROP CONSTRAINT first")
      }
      val schema = types.StructType(prior.fields.filterNot(_.name == column))
      // the ledger holds the PHYSICAL name — that is what lingers in
      // carried files and what a later add must not collide with; a
      // renamed column's original logical name was ledgered by the
      // rename itself
      val colmap = colmapOf(lines)
      if (claimManifest(spark, table, head + 1,
          contentOf(Some(schema), marksOf(lines), filesOf(lines),
            "dropColumn", checksOf(lines), tombstonesOf(lines),
            tombstoneColOf(lines),
            (droppedOf(lines) :+ physName(colmap, column)).distinct,
            colmap - column, partRawOf(lines))))
        return head + 1
      attempt += 1
    }
    throw new IllegalStateException(
      s"dropColumn on $table failed after $maxRetries attempts")
  }

  /** Declare (or replace) a column's DEFAULT as a METADATA-ONLY
    * commit (op `setDefault`): future writes missing the column
    * materialize the expression ([[fillWriteDefaults]]); already-landed
    * rows are NOT rewritten and keep serving what they hold (standard
    * `ALTER COLUMN ... SET DEFAULT` semantics — only `ADD COLUMNS ...
    * DEFAULT` back-fills landed rows, via the folded EXISTS_DEFAULT).
    * The expression must parse and cast to the column's declared type;
    * it is validated here, the only cheap place.
    */
  def commitSetColumnDefault(spark: SparkSession, table: String,
      column: String, defaultSql: String, maxRetries: Int = 10): Long = {
    require(!defaultSql.contains("\n"), "DEFAULT must be one line")
    var attempt = 0
    while (attempt < maxRetries) {
      val head = currentVersion(spark, table)
      require(head > 0, s"no snapshot table at $table")
      val lines = manifestLines(spark, table, head)
      val prior = schemaOf(lines)
        .getOrElse(read(spark, table, Some(head)).schema)
      val field = prior.fields.find(_.name == column).getOrElse(
        throw new IllegalArgumentException(s"no column $column on $table"))
      // validate: must analyze as a constant of the column's type
      org.apache.spark.sql.catalyst.util.ResolveDefaultColumns.analyze(
        field.copy(metadata = new types.MetadataBuilder()
          .withMetadata(field.metadata)
          .putString(CurrentDefaultKey, defaultSql).build()),
        "ALTER TABLE ALTER COLUMN", CurrentDefaultKey)
      val schema = types.StructType(prior.fields.map(f =>
        if (f.name == column) f.copy(metadata =
          new types.MetadataBuilder().withMetadata(f.metadata)
            .putString(CurrentDefaultKey, defaultSql).build())
        else f))
      if (claimManifest(spark, table, head + 1,
          contentOf(Some(schema), marksOf(lines), filesOf(lines),
            "setDefault", checksOf(lines), tombstonesOf(lines),
            tombstoneColOf(lines), droppedOf(lines), colmapOf(lines),
            partRawOf(lines))))
        return head + 1
      attempt += 1
    }
    throw new IllegalStateException(
      s"setDefault on $table failed after $maxRetries attempts")
  }

  /** Remove a column's CURRENT_DEFAULT (op `dropDefault`, metadata-only):
    * future writes missing the column land NULL again. A folded
    * EXISTS_DEFAULT from `ADD COLUMNS ... DEFAULT` stays — the
    * landed-rows contract is immutable (Iceberg's initial-default).
    */
  def commitDropColumnDefault(spark: SparkSession, table: String,
      column: String, maxRetries: Int = 10): Long = {
    var attempt = 0
    while (attempt < maxRetries) {
      val head = currentVersion(spark, table)
      require(head > 0, s"no snapshot table at $table")
      val lines = manifestLines(spark, table, head)
      val prior = schemaOf(lines)
        .getOrElse(read(spark, table, Some(head)).schema)
      val field = prior.fields.find(_.name == column).getOrElse(
        throw new IllegalArgumentException(s"no column $column on $table"))
      require(field.metadata.contains(CurrentDefaultKey),
        s"column $column of $table has no DEFAULT to drop")
      val schema = types.StructType(prior.fields.map(f =>
        if (f.name == column) {
          val mb = new types.MetadataBuilder().withMetadata(f.metadata)
          mb.remove(CurrentDefaultKey)
          f.copy(metadata = mb.build())
        } else f))
      if (claimManifest(spark, table, head + 1,
          contentOf(Some(schema), marksOf(lines), filesOf(lines),
            "dropDefault", checksOf(lines), tombstonesOf(lines),
            tombstoneColOf(lines), droppedOf(lines), colmapOf(lines),
            partRawOf(lines))))
        return head + 1
      attempt += 1
    }
    throw new IllegalStateException(
      s"dropDefault on $table failed after $maxRetries attempts")
  }

  /** RENAME a column as a METADATA-ONLY commit (op `renameColumn`) —
    * the column-mapping idea (Delta's column mapping restricted to
    * names): landed files keep the column's PHYSICAL name forever, the
    * new LOGICAL name serves every read and write from this version on
    * (a `#colmap:logical:physical` header, carried by every commit
    * whose files still hold the physical name), and time travel serves
    * each version under ITS OWN names. Zero data moves at any size.
    *
    * Hazard bookkeeping composes with the DROP ledger: the OLD logical
    * name enters `#dropped:` — its physical data is still LIVE under
    * the new name, so re-introducing it (ADD COLUMNS or a batch
    * carrying it) must refuse until a full-rewrite OPTIMIZE normalizes
    * physical names (which clears colmap and ledger together); renaming
    * ONTO a dropped name refuses for the same reason in reverse.
    * Refuses while pending lazy-delete tombstones key on the column
    * (their sidecar holds the old name) and when a CHECK constraint
    * mentions it (expression strings do not rewrite — DROP CONSTRAINT
    * first, re-declare under the new name).
    */
  def commitRenameColumn(spark: SparkSession, table: String, from: String,
      to: String, maxRetries: Int = 10): Long = {
    require(from != to, s"RENAME COLUMN $from TO $to: names are equal")
    require(!to.contains(":") && !to.contains("\n") && to.nonEmpty,
      s"column name '$to' must be non-empty and colon/newline-free")
    var attempt = 0
    while (attempt < maxRetries) {
      val head = currentVersion(spark, table)
      require(head > 0, s"no snapshot table at $table to rename a column on")
      val lines = manifestLines(spark, table, head)
      val prior = schemaOf(lines)
        .getOrElse(read(spark, table, Some(head)).schema)
      require(prior.fieldNames.contains(from), s"no column $from on $table")
      require(!prior.fieldNames.contains(to),
        s"column $to already exists on $table")
      val colmap = colmapOf(lines)
      val physical = physName(colmap, from)
      // renaming BACK to the physical name is always safe (the "dropped"
      // entry is this very column's own live data) and un-ledgers it;
      // renaming onto any OTHER ledgered name would resurrect dead data
      val renameBack = physical == to
      require(renameBack || !droppedOf(lines).contains(to),
        s"column $to was DROPPED from $table and its data still exists " +
          "in carried files — renaming onto it would resurrect them; " +
          "OPTIMIZE (full rewrite) first")
      require(!(tombstonesOf(lines).nonEmpty &&
          tombstoneColOf(lines).contains(from)),
        s"column $from keys ${tombstonesOf(lines).size} pending " +
          s"lazy-delete tombstone file(s) on $table — OPTIMIZE to " +
          "materialize them first")
      require(!partitionsOf(lines).exists(_._1 == from),
        s"column $from is $table's declared partition column — the " +
          "transform header does not rewrite")
      val mention = ("(?i)\\b" +
        java.util.regex.Pattern.quote(from) + "\\b").r
      checksOf(lines).foreach { case (n, ex) =>
        require(mention.findFirstIn(ex).isEmpty,
          s"constraint $n CHECK ($ex) mentions column $from — " +
            "DROP CONSTRAINT first and re-declare under the new name")
      }
      val schema = types.StructType(prior.fields.map(f =>
        if (f.name == from) f.copy(name = to) else f))
      // ledger ONLY names whose physical data lingers: the first rename
      // of a column ledgers it (physical == from); renaming an
      // already-mapped column retires a purely-logical name (its
      // physical never existed — nothing to refuse); renaming BACK
      // un-ledgers the physical name (it is live again)
      val ledger = (if (physical == from) (droppedOf(lines) :+ from).distinct
        else droppedOf(lines)).filterNot(n => renameBack && n == to)
      val newColmap =
        if (renameBack) colmap - from
        else (colmap - from) + (to -> physical)
      if (claimManifest(spark, table, head + 1,
          contentOf(Some(schema), marksOf(lines), filesOf(lines),
            "renameColumn", checksOf(lines), tombstonesOf(lines),
            tombstoneColOf(lines), ledger, newColmap, partRawOf(lines))))
        return head + 1
      attempt += 1
    }
    throw new IllegalStateException(
      s"renameColumn on $table failed after $maxRetries attempts")
  }

  /** Refuse a batch that re-introduces a DROPPED column name: its
    * pre-drop values still physically exist in the version's carried
    * files, and the union-evolve would re-expose them (see
    * [[commitDropColumn]]).
    */
  private def refuseDroppedColumns(batch: DataFrame, table: String,
      lines: Seq[String]): Unit = {
    val dropped = droppedOf(lines).toSet
    if (dropped.nonEmpty) {
      val hit = batch.schema.fieldNames.filter(dropped)
      require(hit.isEmpty,
        s"column(s) ${hit.mkString(", ")} were DROPPED from $table and " +
          "their pre-drop data still exists in carried files — OPTIMIZE " +
          "(full rewrite) before reusing the name(s)")
    }
  }

  /** Declare a CHECK constraint as a new commit (op `addConstraint`,
    * files carried — metadata-only). By default the CURRENT head data is
    * validated first (one scan; a constraint the data already violates
    * is refused, Delta's ADD CONSTRAINT semantics); every later
    * append/merge/stream commit enforces it on the batch. The name must
    * be colon- and newline-free (it keys a manifest header line).
    */
  def addCheckConstraint(spark: SparkSession, table: String, name: String,
      sqlExpr: String, validate: Boolean = true,
      maxRetries: Int = 10): Long = {
    require(!name.contains(":") && !name.contains("\n") && name.nonEmpty,
      s"constraint name '$name' must be non-empty and colon/newline-free")
    require(!sqlExpr.contains("\n"), "constraint expression must be one line")
    if (validate && currentVersion(spark, table) > 0)
      enforceChecks(read(spark, table), Map(name -> sqlExpr), table)
    var attempt = 0
    while (attempt < maxRetries) {
      val head = currentVersion(spark, table)
      val lines = manifestLines(spark, table, head)
      // tombstones CARRY: a metadata commit that dropped the headers
      // would resurrect every lazily-deleted row
      if (claimManifest(spark, table, head + 1,
          contentOf(schemaOf(lines), marksOf(lines), filesOf(lines),
            "addConstraint", checksOf(lines) + (name -> sqlExpr),
            tombstonesOf(lines), tombstoneColOf(lines), droppedOf(lines),
            colmapOf(lines), partRawOf(lines))))
        return head + 1
      attempt += 1
    }
    throw new IllegalStateException(
      s"addCheckConstraint $name on $table failed after $maxRetries attempts")
  }

  /** Drop a declared constraint (op `dropConstraint`, metadata-only). */
  def dropCheckConstraint(spark: SparkSession, table: String, name: String,
      maxRetries: Int = 10): Long = {
    var attempt = 0
    while (attempt < maxRetries) {
      val head = currentVersion(spark, table)
      val lines = manifestLines(spark, table, head)
      require(checksOf(lines).contains(name),
        s"no CHECK constraint named $name on $table")
      if (claimManifest(spark, table, head + 1,
          contentOf(schemaOf(lines), marksOf(lines), filesOf(lines),
            "dropConstraint", checksOf(lines) - name,
            tombstonesOf(lines), tombstoneColOf(lines), droppedOf(lines),
            colmapOf(lines), partRawOf(lines))))
        return head + 1
      attempt += 1
    }
    throw new IllegalStateException(
      s"dropCheckConstraint $name on $table failed after $maxRetries attempts")
  }

  // ------------------------------------------------------------------
  // Merge-on-read lazy deletes (key tombstones)
  // ------------------------------------------------------------------

  /** Pending lazy-delete state of a version: (key column, tombstone
    * sidecar file names). Empty when all deletes are materialized.
    */
  def pendingTombstones(spark: SparkSession, table: String,
      version: Option[Long] = None): (Option[String], Seq[String]) = {
    val lines = manifestLines(spark, table,
      version.getOrElse(currentVersion(spark, table)))
    (tombstoneColOf(lines), tombstonesOf(lines))
  }

  /** Tombstone sidecars live OUTSIDE `data/` (like `_manifests`): data
    * readers, per-file stats and the compaction file census must never
    * see them as table files.
    */
  private def tombstoneDir(table: String) = new Path(table, "_tombstones")

  /** The distinct tombstoned keys of a version (bounded: deletion-request
    * batches, never the table) — None when the version has none.
    */
  private def tombstoneKeys(spark: SparkSession, table: String,
      lines: Seq[String]): Option[(String, DataFrame)] = {
    val ts = tombstonesOf(lines)
    tombstoneColOf(lines).filter(_ => ts.nonEmpty).map { kc =>
      kc -> spark.read
        .parquet(ts.map(n => new Path(tombstoneDir(table), n).toString): _*)
        .select(kc).distinct()
    }
  }

  /** Anti-filter `df` by the version's tombstones (merge-on-read): the
    * tombstone side is bounded and broadcast, NULL-key rows always
    * survive (anti join on equality), and a version with no tombstones
    * costs nothing.
    */
  private def applyTombstones(spark: SparkSession, table: String,
      lines: Seq[String], df: DataFrame): DataFrame =
    tombstoneKeys(spark, table, lines) match {
      case None => df
      case Some((kc, keys)) =>
        df.join(org.apache.spark.sql.functions.broadcast(keys),
          Seq(kc), "left_anti")
    }

  /** MERGE-ON-READ delete ("deletion vectors" at KEY granularity): the
    * doomed keys land as a tiny tombstone sidecar referenced from the
    * new manifest — ZERO data files are read or rewritten, so a delete
    * request on a 100 TB table commits in O(keys) regardless of table
    * size (the instant-logical-erasure half of the GDPR contract).
    * Every read of the table anti-joins the (bounded, broadcast)
    * tombstone keys; the next OPTIMIZE / merge / overwrite MATERIALIZES
    * them — rewrites without the doomed rows and clears the headers —
    * and a `commitDelete`-then-`vacuum` remains the immediate
    * physical-erasure path.
    *
    * Key semantics, not positions: a tombstoned key means "this key is
    * deleted", so APPENDING a tombstoned key is refused (the read-side
    * filter would silently swallow the new row — resurrect via
    * `commitMerge`, which materializes tombstones, or OPTIMIZE first).
    * `keyCol` must stay consistent while tombstones are pending.
    * Returns (new version, distinct keys tombstoned).
    */
  /** Write a one-column key frame into `_tombstones/` under unique names
    * (the same write-first-claim-later discipline as data files).
    * Returns the staged sidecar names — unreferenced until a manifest
    * claims them.
    */
  private def stageTombstoneSidecar(spark: SparkSession, table: String,
      keys: DataFrame): Seq[String] = {
    val td = tombstoneDir(table)
    val f = fs(spark, td)
    val staging = new Path(table, s"_staging-ts-${java.util.UUID.randomUUID}")
    keys.coalesce(1).write.parquet(staging.toString)
    f.mkdirs(td)
    val names = f.listStatus(staging)
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map { s =>
        val target = new Path(td, s"${java.util.UUID.randomUUID}.parquet")
        require(f.rename(s.getPath, target), s"failed to stage ${s.getPath}")
        target.getName
      }.toSeq
    f.delete(staging, true)
    names
  }

  def commitDeleteLazy(spark: SparkSession, table: String, keys: Seq[Long],
      keyCol: String, maxRetries: Int = 10): (Long, Int) = {
    import spark.implicits._
    if (keys.isEmpty) return (currentVersion(spark, table), 0)
    commitDeleteLazyKeys(spark, table, keys.distinct.toDF(keyCol), maxRetries)
  }

  /** One-column-DataFrame variant of [[commitDeleteLazy]] — any key type
    * (string user ids, dates), and the key list never lands on the
    * driver: the frame stages straight into the tombstone sidecar, so an
    * erasure job can tombstone the OUTPUT OF A QUERY
    * (`read(t).filter(pred).select(k)`) at 100 TB. The frame's single
    * column names the key column. NULL keys are dropped (a NULL key
    * matches no row in the read-side anti-join). Returns (new version,
    * distinct keys tombstoned).
    */
  def commitDeleteLazyKeys(spark: SparkSession, table: String,
      keys: DataFrame, maxRetries: Int = 10): (Long, Int) = {
    require(keys.columns.length == 1,
      s"tombstone keys must be a one-column frame, got " +
        keys.columns.mkString("(", ", ", ")"))
    val keyCol = keys.columns.head
    val distinctKeys = keys.na.drop().distinct().localCheckpoint(true)
    val n = distinctKeys.count()
    if (n == 0) return (currentVersion(spark, table), 0)
    val newFiles = stageTombstoneSidecar(spark, table, distinctKeys)
    var attempt = 0
    while (attempt < maxRetries) {
      val head = currentVersion(spark, table)
      require(head > 0, s"no table at $table to delete from")
      val lines = manifestLines(spark, table, head)
      tombstoneColOf(lines).foreach(existing => require(existing == keyCol,
        s"pending tombstones of $table are keyed on $existing, not $keyCol" +
          " — materialize (OPTIMIZE) before switching key columns"))
      if (claimManifest(spark, table, head + 1,
          contentOf(schemaOf(lines), marksOf(lines), filesOf(lines),
            "deleteLazy", checksOf(lines),
            tombstonesOf(lines) ++ newFiles, Some(keyCol),
            droppedOf(lines), colmapOf(lines), partRawOf(lines))))
        return (head + 1, n.toInt)
      attempt += 1
    }
    throw new IllegalStateException(
      s"lazy delete on $table failed after $maxRetries attempts")
  }

  /** Refuse a batch that re-uses a pending tombstoned key (see
    * [[commitDeleteLazy]] — the read filter would swallow the new row).
    * One bounded broadcast semi-join; free when no tombstones exist.
    */
  private def refuseTombstonedKeys(spark: SparkSession, table: String,
      lines: Seq[String], batch: DataFrame): Unit =
    tombstoneKeys(spark, table, lines).foreach { case (kc, keys) =>
      if (batch.columns.contains(kc)) {
        val clash = batch
          .join(org.apache.spark.sql.functions.broadcast(keys), Seq(kc),
            "left_semi").count()
        require(clash == 0,
          s"append to $table re-uses $clash pending-tombstoned $kc key(s)" +
            " — the merge-on-read filter would swallow the new rows;" +
            " OPTIMIZE to materialize the deletes first, or commitMerge")
      }
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
    * (no manifest references them yet — invisible to readers). The
    * WRITE half of the column-mapping boundary: the logical frame's
    * renamed columns stage under their PHYSICAL names, so data files
    * stay uniformly physical whatever commit staged them.
    */
  private def stageData(spark: SparkSession, batch0: DataFrame,
      table: String, colmap: Map[String, String],
      partition: Seq[(String, String)] = Nil): Seq[String] = {
    val dd = dataDir(table)
    val f = fs(spark, dd)
    val staging = new Path(table, s"_staging-${java.util.UUID.randomUUID}")
    // the declared transforms route rows into nested __gp=/__gp2=/...
    // dirs — the DIRECTORY is a pruning hint and a retention unit; the
    // columns themselves STAY in every file (no read path ever
    // re-derives values from paths). A batch missing ANY transform
    // column stages flat (its entries carry no prefix, so every pruner
    // always reads them — sound).
    val routed = partition
      .filter(_ => partition.forall(p => batch0.columns.contains(p._1)))
    if (routed.nonEmpty) {
      val withDirs = routed.zipWithIndex.foldLeft(batch0) {
        case (df, ((c, kind), i)) =>
          df.withColumn(partLevelCol(i), partitionExpr(c, kind))
      }
      // OPTIMIZED WRITES (spark.graft.optimizeWrite=true): shuffle rows
      // to their partition dirs before staging, so a commit lands ONE
      // file per live dir instead of (tasks × dirs) small files — the
      // Delta optimized-write idea. Off by default: the extra shuffle
      // is the wrong trade for small batches, and OPTIMIZE compacts
      // after the fact either way. A hot dir still lands one task's
      // file; skewed ingest belongs to OPTIMIZE/ZORDER, not the stager.
      val shaped =
        if (spark.conf.getOption("spark.graft.optimizeWrite")
            .contains("true"))
          withDirs.repartition(
            routed.indices.map(i => org.apache.spark.sql.functions
              .col(partLevelCol(i))): _*)
        else withDirs
      toPhysical(shaped, colmap).write
        .partitionBy(routed.indices.map(partLevelCol): _*)
        .parquet(staging.toString)
    } else toPhysical(batch0, colmap).write.parquet(staging.toString)
    f.mkdirs(dd)
    // collect staged files RECURSIVELY, keeping the partition dirs in
    // the manifest entry (relative paths resolve through two-arg Path
    // like bare names do)
    val staged = walkFiles(f, staging)
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .map(st => (st.getPath, st.getLen))
    val newFiles = staged.map { case (p, len) =>
      // walk up every __gpN= ancestor (nested composite dirs)
      val dirs = Iterator.iterate(p.getParent)(_.getParent)
        .takeWhile(d => d != null && d.getName.matches("""__gp\d*=.*"""))
        .map(_.getName).toSeq.reverse
      val rel = if (dirs.isEmpty) "" else dirs.mkString("/") + "/"
      if (rel.nonEmpty) f.mkdirs(new Path(dd, dirs.mkString("/")))
      val target = new Path(dd, s"$rel${java.util.UUID.randomUUID}.parquet")
      require(f.rename(p, target), s"failed to stage $p")
      // the stager held this file's status anyway — feed the size
      // ledger so the claim never re-probes it (rename keeps length)
      ManifestFileIndex.recordSize(target, len)
      rel + target.getName
    }
    f.delete(staging, true)
    newFiles
  }

  /** Atomically PUBLISH manifest `version` with CANONICAL `content`
    * (headers + complete file list). The manifest is fully written to a
    * temp name first, then claimed atomically — readers can never
    * observe a half-written manifest, and of two racing writers exactly
    * one claims vN+1:
    *   - file://  → hard link (atomic create-if-absent WITH content;
    *                a plain create(overwrite=false) on LocalFileSystem
    *                is check-then-create and loses commits under race)
    *   - hdfs://  → rename (atomic, fails when the target exists)
    * Returns false when another writer already owns `version`.
    *
    * PHYSICAL encoding is chosen here, invisibly to every commit path:
    * when the file-list delta vs the parent version (`#add:`/`#remove:`
    * under a `#base:` header) is smaller than the full list, the delta
    * is what hits disk — a streaming table accreting 1M files pays
    * O(batch) manifest bytes per commit, not a 50 MB rewrite of the
    * whole list ([[manifestLines]] resolves either form to the same
    * canonical lines). Overwrites/OPTIMIZE naturally fall back to full
    * form (their delta IS the table). Every `CheckpointInterval`-th
    * claim also drops a full checkpoint file next to the manifest
    * (best-effort, idempotent content — a crash before it lands just
    * means resolution walks a longer chain until the next one).
    */
  private def claimManifest(spark: SparkSession, table: String,
      version: Long, content: String): Boolean = {
    val f = fs(spark, manifestDir(table))
    f.mkdirs(manifestDir(table))
    // enrich the claim with the per-file size ledger (#fsz): staged
    // files were recorded by stageData, carried files by the parent's
    // resolution — steady state costs ZERO filesystem probes here, and
    // every read of this version then builds its FileStatuses without
    // per-file getFileStatus round-trips (ManifestFiles.statusesOf).
    // Best-effort per file: an unknowable size (foreign ref the probe
    // can't reach) just means that file keeps the probing fallback.
    val (canonical, canonicalLines) = {
      val lines0 = content.split("\n", -1).toSeq
        .filterNot(_.startsWith(FszHeader)) // normalize re-published lines
      val files = filesOf(lines0)
      val dd = dataDir(table)
      val fsz = files.flatMap { n =>
        val p = new Path(dd, n)
        ManifestFileIndex.knownSize(p).orElse {
          try {
            val st = p.getFileSystem(
              spark.sparkContext.hadoopConfiguration).getFileStatus(p)
            ManifestFileIndex.recordSize(p, st.getLen)
            Some(st.getLen)
          } catch { case scala.util.control.NonFatal(_) => None }
        }.map(l => s"$FszHeader$l:$n")
      }
      val all = lines0.filter(_.startsWith("#")) ++ fsz ++ files
      (all.mkString("\n"), all)
    }
    val physical = {
      val files = filesOf(canonicalLines)
      val baseFiles =
        if (version <= 1) Nil
        else filesOf(manifestLines(spark, table, version - 1))
      val baseSet = baseFiles.toSet
      val fileSet = files.toSet
      val adds = files.filterNot(baseSet)
      val removes = baseFiles.filterNot(fileSet)
      if (version <= 1 || adds.size + removes.size + 1 >= files.size)
        canonical
      else {
        val sizes = fileSizesOf(canonicalLines)
        (canonicalLines.filter(l =>
          l.startsWith("#") && !l.startsWith(FszHeader)) ++
          Seq(BaseHeader + (version - 1)) ++
          adds.flatMap(n => sizes.get(n).map(l => s"$FszHeader$l:$n")) ++
          adds.map(AddHeader + _) ++ removes.map(RemoveHeader + _))
          .mkString("\n")
      }
    }
    def writeAtomic(target: Path, body: String): Boolean = {
      val tmp = new Path(manifestDir(table),
        s".tmp-${java.util.UUID.randomUUID}")
      val out = f.create(tmp, true)
      try out.write(body.getBytes("UTF-8")) finally out.close()
      val ok =
        if ("file" == f.getScheme) {
          try {
            java.nio.file.Files.createLink(
              java.nio.file.Paths.get(target.toUri.getPath),
              java.nio.file.Paths.get(tmp.toUri.getPath))
            true
          } catch { case _: java.nio.file.FileAlreadyExistsException => false }
        } else !f.exists(target) && f.rename(tmp, target)
      f.delete(tmp, false)
      ok
    }
    val claimed = writeAtomic(manifestPath(table, version), physical)
    if (claimed) {
      // the canonical lines are known exactly — seed the resolver cache
      resolvedManifests.put((new Path(table).toString, version),
        canonicalLines)
      if (version % CheckpointInterval == 0)
        writeAtomic(checkpointPath(table, version), canonical)
    }
    claimed
  }

  private def commit(spark: SparkSession, batch0: DataFrame, table: String,
      replace: Boolean, maxRetries: Int): Long = {
    // fail-fast schema + constraint + tombstone checks BEFORE staging (a
    // refusal would otherwise strand orphaned data files until a vacuum)
    var validated = manifestLines(spark, table, currentVersion(spark, table))
    // a batch omitting a defaulted column lands the DEFAULT, not NULL
    // (and the CHECK enforcement below sees the defaulted values)
    val batch = if (replace) batch0
      else fillWriteDefaults(batch0, schemaOf(validated))
    if (!replace) {
      evolveSchema(schemaOf(validated), batch.schema)
      refuseTombstonedKeys(spark, table, validated, batch)
      refuseDroppedColumns(batch, table, validated)
    }
    // overwrite RESETS the declared schema, so the head schema must not
    // conform the batch here: a legitimate column-type-changing overwrite
    // of a CHECK-constrained table would otherwise refuse on the very
    // type-change the overwrite exists to perform
    enforceChecks(batch, checksOf(validated), table,
      if (replace) None else schemaOf(validated))
    // append/overwrite: data files never depend on the head, so stage
    // once and only the manifest content is recomputed per attempt.
    // Appends stage under the head's PHYSICAL names (column mapping);
    // an overwrite REPLACES every file, so its physical names normalize
    // to the batch's own logical ones and the claim carries no colmap.
    val stagedColmap = if (replace) Map.empty[String, String]
      else colmapOf(validated)
    // the partition transform is LAYOUT POLICY and survives overwrite
    val stagedPart = partRawOf(validated)
    val newFiles = stageData(spark, batch, table, stagedColmap,
      partitionsOf(validated))
    raceHookForTests()
    val f = fs(spark, dataDir(table))
    def dropStaged(): Unit =
      newFiles.foreach(n => f.delete(new Path(dataDir(table), n), false))
    var attempt = 0
    while (attempt < maxRetries) {
      val head = currentVersion(spark, table)
      val lines = manifestLines(spark, table, head)
      // close the validation race: the pre-staging checks ran against an
      // older head, but this claim CARRIES the new head's tombstones and
      // constraints — a lazy delete or ADD CONSTRAINT landing while we
      // staged must re-validate here, or the append could resurrect a
      // freshly-tombstoned key (the read-side anti-join would silently
      // swallow the new rows) or land a violating batch under a manifest
      // that claims the constraint holds. A refusal reclaims the staged
      // files (they are unreferenced — no manifest names them).
      // the schema re-evolution below is ALSO a guarded re-validation: a
      // widen/evolution landing while we staged can make this batch's
      // types illegal against the new head — the refusal must reclaim
      // the staged files like the tombstone/constraint refusals do
      val schema =
        try {
          if (!replace && (tombstonesOf(lines) != tombstonesOf(validated) ||
              tombstoneColOf(lines) != tombstoneColOf(validated)))
            refuseTombstonedKeys(spark, table, lines, batch)
          if (checksOf(lines) != checksOf(validated))
            enforceChecks(batch, checksOf(lines), table,
              if (replace) None else schemaOf(lines))
          // an append re-introducing a DROPPED column name would expose
          // pre-drop values from carried files; overwrite replaces every
          // file, so the name becomes legitimately reusable
          if (!replace) refuseDroppedColumns(batch, table, lines)
          // a RENAME landing while we staged means the staged files hold
          // stale physical names — refuse loudly and reclaim (rare race;
          // the caller re-runs against the renamed head)
          if (!replace && colmapOf(lines) != stagedColmap)
            throw new IllegalStateException(
              s"append to $table raced a concurrent RENAME COLUMN — " +
                "the staged files carry stale physical names; re-run")
          // a transform change mid-stage would leave entries whose
          // prefixes LIE under the new transform — refuse and reclaim
          if (partRawOf(lines) != stagedPart)
            throw new IllegalStateException(
              s"commit to $table raced a concurrent partition-transform " +
                "change — staged entries carry stale prefixes; re-run")
          // overwrite resets the schema to the batch's; append
          // union-evolves; stream watermarks survive either way
          evolveSchema(if (replace) None else schemaOf(lines), batch.schema)
        } catch { case e: Throwable => dropStaged(); throw e }
      validated = lines
      val base = if (replace) Nil else filesOf(lines)
      // overwrite REPLACES the data state, pending tombstones included;
      // append carries them (the refusal above keeps reads correct) —
      // same split for the dropped-name ledger (no pre-drop file survives
      // an overwrite)
      if (claimManifest(spark, table, head + 1,
          contentOf(Some(schema), marksOf(lines), base ++ newFiles,
            if (replace) "overwrite" else "append", checksOf(lines),
            if (replace) Nil else tombstonesOf(lines),
            tombstoneColOf(lines),
            if (replace) Nil else droppedOf(lines),
            if (replace) Map.empty else colmapOf(lines),
            partRawOf(lines)))) return head + 1
      attempt += 1 // lost the race; re-read the new head and retry
    }
    throw new IllegalStateException(
      s"commit to $table failed after $maxRetries attempts")
  }

  /** Spec hooks: (candidate files actually probed/read, total candidate
    * files) of the last stats-pruned copy-on-write probe ([[cowApply]])
    * and the last lazy-delete feed leg ([[rowDiff]]). None until either
    * path runs.
    */
  @volatile private[graft] var lastCowProbePruned: Option[(Int, Int)] = None
  @volatile private[graft] var lastTombLegPruned: Option[(Int, Int)] = None

  /** Spec hook: (candidate files probed, total files) of the last
    * predicate-driven DELETE/UPDATE probe (stats-pruned when the
    * predicate constrains a stats-manifested column). None until one
    * runs.
    */
  @volatile private[graft] var lastWherePruned: Option[(Int, Int)] = None

  /** Beyond this many distinct probe keys, point-set pruning falls back
    * to one coarse [min, max] envelope (the driver should not hold an
    * unbounded key list; the envelope is still sound, just looser).
    */
  private val MaxPruneKeys = 4096

  /** Driver-side file skipping for KEY-LIST probes: the subset of
    * `candidates` (bare data-file names of `table`) whose `_graft_stats`
    * [min, max] range for `kc` can hold at least one key of the
    * one-column `keyFrame` — how a tombstone feed or a merge probe over
    * a z-ordered, stats-manifested table opens a handful of files
    * instead of every carried file. Sound by construction: files the
    * stats don't cover (or whose stats are NULL) are always kept, and
    * with no manifest — or a key type the manifest's typed encoding
    * can't compare exactly (dates/timestamps render differently driver-
    * side) — the candidate list returns unchanged (prune nothing, never
    * prune wrongly).
    */
  private def pruneByKeyStats(spark: SparkSession, table: String,
      kc0: String, keyFrame: DataFrame,
      candidates: Seq[String]): Seq[String] = {
    import org.apache.spark.sql.functions.{col, max, min}
    if (candidates.isEmpty) return candidates
    val dd = dataDir(table).toString
    // the stats manifest keys PHYSICAL column names (it reads footers)
    val kc = physName(colmapOf(manifestLines(spark, table,
      currentVersion(spark, table))), kc0)
    if (!graft.operators.Layout.statsManifestCols(spark, dd)
        .exists(_.contains(kc))) return candidates
    val prunable = keyFrame.schema.head.dataType match {
      case _: types.NumericType => true
      case types.StringType => true
      case _ => false
    }
    if (!prunable) return candidates
    val kcol = col(keyFrame.columns.head)
    val vals = keyFrame.na.drop().distinct()
      .limit(MaxPruneKeys + 1).collect().map(_.get(0)).toSeq
    if (vals.isEmpty) return candidates
    if (vals.size > MaxPruneKeys) {
      // the collected sample is TRUNCATED — the envelope must come from
      // the full frame, never the sample, or pruning would be unsound
      val (canon, byCanon) = canonCandidates(spark, table, candidates)
      val mm = keyFrame.agg(min(kcol), max(kcol)).head()
      graft.operators.Layout.selectByStats(spark, dd,
        Seq((kc, mm.get(0), mm.get(1))), canon).map(byCanon)
    } else pruneByKeyVals(spark, table, kc, vals, candidates)
  }

  /** Driver-side value-list variant of [[pruneByKeyStats]] (key lists
    * already on the driver — the id-list erasure API). Same soundness
    * rules; non-uniform or non-comparable value types prune nothing.
    */
  private def pruneByKeyVals(spark: SparkSession, table: String,
      kc0: String, vals0: Seq[Any], candidates0: Seq[String]): Seq[String] = {
    if (candidates0.isEmpty) return candidates0
    val dd = dataDir(table).toString
    val headLines = manifestLines(spark, table,
      currentVersion(spark, table))
    // DIRECTORY leg: a key-list probe on a partition column keeps only
    // partitions that can hold at least one key (one unrenderable key
    // keeps everything — sound); composite layouts probe the LEVEL the
    // key column governs
    val candidates = partitionsOf(headLines).zipWithIndex
      .find(_._1._1 == kc0) match {
      case Some(((_, kind), level)) =>
        val nn = vals0.filter(_ != null)
        // bucket rendering is type-strict (hashInt vs hashLong): a key
        // class mismatching the declared column type keeps everything
        val dt = schemaOf(headLines)
          .flatMap(_.fields.find(_.name == kc0)).map(_.dataType)
        if (bucketModulus(kind).isDefined &&
            !nn.forall(bucketProbeTypeOk(dt, _))) candidates0
        else {
          val rendered = nn.map(partProbeValue(kind, _))
          if (rendered.nonEmpty && rendered.forall(_.isDefined)) {
            val set = rendered.flatten.toSet
            candidates0.filter(e => partValueAt(e, level).forall(v =>
              v == NullPartition || set.contains(v)))
          } else candidates0
        }
      case _ => candidates0
    }
    if (candidates.isEmpty) return candidates
    val kc = physName(colmapOf(headLines), kc0)
    if (!graft.operators.Layout.statsManifestCols(spark, dd)
        .exists(_.contains(kc))) return candidates
    val vals = vals0.filter(_ != null).distinct
    if (vals.isEmpty) return candidates
    val numeric = vals.forall(_.isInstanceOf[Number])
    if (!numeric && !vals.forall(_.isInstanceOf[String])) return candidates
    val (canon, byCanon) = canonCandidates(spark, table, candidates)
    val chosen =
      if (vals.size > MaxPruneKeys) {
        val (lo, hi) =
          if (numeric) {
            val ds = vals.map(_.asInstanceOf[Number].doubleValue)
            (ds.min: Any, ds.max: Any)
          } else {
            val ss = vals.map(_.asInstanceOf[String])
            (ss.min: Any, ss.max: Any)
          }
        graft.operators.Layout.selectByStats(spark, dd,
          Seq((kc, lo, hi)), canon)
      } else graft.operators.Layout.selectByStatsAnyOf(
        spark, dd, kc, vals, canon)
    chosen.map(byCanon)
  }

  /** Conjunctive per-column bounds a predicate implies, in the stats
    * manifest's TYPED ENCODING (numerics as double, string/date/
    * timestamp as their cast-to-string form) — what lets a predicate
    * DELETE/UPDATE probe skip files driver-side like the key-list paths
    * do. Each element is (column, lower?, upper?), one per usable
    * conjunct: =, <, <=, >, >=, IN and BETWEEN on a bare column vs
    * literals. Sound by construction: ONLY top-level conjuncts
    * contribute (an OR / NOT / complex term adds nothing — the other
    * conjuncts still bound the matching rows), a column whose DECLARED
    * type's encoding category differs from the literal's is skipped
    * (a sloppy cross-type comparison must never mis-prune), and strict
    * bounds relax to inclusive (looser, never wrong).
    */
  private def predicateBounds(spark: SparkSession, predicate: Column,
      schema: types.StructType): Seq[(String, Option[Any], Option[Any])] = {
    import org.apache.spark.sql.catalyst.expressions._
    val tz = spark.sessionState.conf.sessionLocalTimeZone
    def attrOf(e: Expression): Option[String] = e match {
      case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
          if a.nameParts.size == 1 => Some(a.nameParts.head)
      case a: AttributeReference => Some(a.name)
      case _ => None
    }
    // literal → the manifest's encoded form, ONLY when the literal's
    // type category matches the declared column's (numeric↔numeric,
    // string↔string, date↔date, timestamp↔timestamp): the stats encode
    // numerics as double and the rest as cast-to-string, so a matching
    // category is exactly what makes the comparison meaningful
    def enc(c: String, e: Expression): Option[Any] = e match {
      case Literal(v, dt) if v != null =>
        schema.fields.find(_.name == c).map(_.dataType).flatMap { ct =>
          (ct, dt) match {
            case (_: types.NumericType, _: types.NumericType) => v match {
              case n: Number => Some(n.doubleValue)
              case d: org.apache.spark.sql.types.Decimal => Some(d.toDouble)
              case _ => None
            }
            case (types.StringType, types.StringType) => Some(v.toString)
            case (types.DateType, types.DateType) =>
              Some(java.time.LocalDate.ofEpochDay(
                v.asInstanceOf[Int].toLong).toString)
            case (types.TimestampType, types.TimestampType) =>
              Option(Cast(Literal(v, dt), types.StringType, Some(tz)).eval())
                .map(_.toString)
            case _ => None
          }
        }
      case _ => None
    }
    def inBounds(a: Expression,
        vs: Seq[Expression]): Seq[(String, Option[Any], Option[Any])] =
      (for {
        c <- attrOf(a)
        encoded = vs.flatMap(enc(c, _))
        if encoded.size == vs.size // every member encodable, or skip
      } yield {
        if (encoded.forall(_.isInstanceOf[Double])) {
          val dd = encoded.map(_.asInstanceOf[Double])
          Seq((c, Some(dd.min: Any), Some(dd.max: Any)))
        } else {
          val ss = encoded.map(_.toString)
          Seq((c, Some(ss.min: Any), Some(ss.max: Any)))
        }
      }).getOrElse(Nil)
    // two spellings of the same comparisons reach here: SQL-parsed
    // predicates (expr("...")) are the catalyst And/LessThan/... tree,
    // while Column-DSL predicates (col("ts") < lit(x)) convert to
    // UnresolvedFunction nodes named "<", "and", "in", ... — the DSv2
    // DELETE face builds the latter, so both must prune
    def walk(e: Expression): Seq[(String, Option[Any], Option[Any])] =
      e match {
        case And(l, r) => walk(l) ++ walk(r)
        case EqualTo(a, v) => point(a, v) ++ point(v, a)
        case EqualNullSafe(a, v) => point(a, v) ++ point(v, a)
        case GreaterThan(a, v) => lower(a, v) ++ upper(v, a)
        case GreaterThanOrEqual(a, v) => lower(a, v) ++ upper(v, a)
        case LessThan(a, v) => upper(a, v) ++ lower(v, a)
        case LessThanOrEqual(a, v) => upper(a, v) ++ lower(v, a)
        case In(a, vs) if vs.nonEmpty => inBounds(a, vs)
        case f: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
            if f.nameParts.size == 1 =>
          (f.nameParts.head.toLowerCase(java.util.Locale.ROOT),
            f.arguments) match {
            case ("and", Seq(l, r)) => walk(l) ++ walk(r)
            case ("=" | "==" | "<=>", Seq(a, v)) =>
              point(a, v) ++ point(v, a)
            case (">" | ">=", Seq(a, v)) => lower(a, v) ++ upper(v, a)
            case ("<" | "<=", Seq(a, v)) => upper(a, v) ++ lower(v, a)
            case ("in", a +: vs) if vs.nonEmpty => inBounds(a, vs)
            case _ => Nil
          }
        case _ => Nil
      }
    def point(a: Expression,
        v: Expression): Seq[(String, Option[Any], Option[Any])] =
      (for { c <- attrOf(a); ev <- enc(c, v) }
        yield Seq((c, Some(ev), Some(ev)))).getOrElse(Nil)
    def lower(a: Expression,
        v: Expression): Seq[(String, Option[Any], Option[Any])] =
      (for { c <- attrOf(a); ev <- enc(c, v) }
        yield Seq((c, Some(ev), None: Option[Any]))).getOrElse(Nil)
    def upper(a: Expression,
        v: Expression): Seq[(String, Option[Any], Option[Any])] =
      (for { c <- attrOf(a); ev <- enc(c, v) }
        yield Seq((c, None: Option[Any], Some(ev)))).getOrElse(Nil)
    walk(org.apache.spark.sql.graft.ColumnBridge
      .catalystExpression(predicate))
  }

  /** Driver-side file skipping for PREDICATE probes (`UPDATE ... WHERE`,
    * `DELETE FROM ... WHERE`): every usable conjunct of the predicate
    * ([[predicateBounds]]) on a stats-manifested column shrinks the
    * candidate file list BEFORE the probe scan opens a single footer —
    * a retention delete (`ts < cutoff`) on a z-ordered table probes the
    * curve-adjacent files only, like the key-list paths already do.
    * No manifest, no usable conjunct, or a schema-less version → the
    * candidates return unchanged (prune nothing, never prune wrongly).
    */
  private def pruneByPredicateStats(spark: SparkSession, table: String,
      predicate: Column, schema: Option[types.StructType],
      candidates: Seq[String]): Seq[String] = {
    if (candidates.isEmpty) return candidates
    val s = schema.getOrElse(return candidates)
    val headLines = manifestLines(spark, table,
      currentVersion(spark, table))
    val bounds0 = predicateBounds(spark, predicate, s)
    // DIRECTORY leg first: the declared partition transform prunes on
    // the predicate's own bounds with zero sidecar reads (the bounds'
    // typed encodings — ISO strings for dates — are exactly the dir
    // rendering)
    var cand = pruneEntriesByPartition(partitionsOf(headLines), bounds0,
      candidates, Some(s))
    val dd = dataDir(table).toString
    val statsCols = graft.operators.Layout.statsManifestCols(spark, dd)
      .getOrElse(return cand).toSet
    val colmap = colmapOf(headLines)
    val boxes = bounds0
      .map { case (c, lo, hi) => (physName(colmap, c), lo, hi) }
      .filter(b => statsCols.contains(b._1))
    if (boxes.isEmpty) return cand
    val (canon, byCanon) = canonCandidates(spark, table, cand)
    boxes.foldLeft(canon) { case (live, (c, lo, hi)) =>
      graft.operators.Layout.selectByStatsBounds(spark, dd, c, lo, hi, live)
    }.map(byCanon)
  }

  /** Spec/assert hook: number of aggregate expressions the last catalog
    * scan answered ENTIRELY from the stats sidecar (zero data files
    * opened); None when the metadata-only path did not serve.
    */
  @volatile var lastAggAnswered: Option[Int] = None

  /** The stats-sidecar rows for a VERSION's entry list, aligned —
    * None when any entry is uncovered (the metadata-only aggregate
    * path must refuse, not approximate). One driver-side read of the
    * (tiny) manifest; zero data files are touched.
    */
  private[graft] def statsAggRows(spark: SparkSession, table: String,
      entries: Seq[String])
      : Option[(types.StructType, Seq[org.apache.spark.sql.Row])] = {
    val (canon, _) = canonCandidates(spark, table, entries)
    graft.operators.Layout.statsRowsFor(spark, dataDir(table).toString,
      canon)
  }

  /** (qualified canonical URIs, URI -> bare name) of a candidate list —
    * the stats manifest keys files by `input_file_name()` URI while
    * manifests carry bare names.
    */
  private def canonCandidates(spark: SparkSession, table: String,
      candidates: Seq[String]): (Seq[String], Map[String, String]) = {
    val f = fs(spark, dataDir(table))
    val canon = candidates.map(n => graft.operators.Layout.canonFile(
      f.makeQualified(new Path(dataDir(table), n)).toString) -> n)
    (canon.map(_._1), canon.toMap)
  }

  /** Map probed physical URIs (`input_file_name()` output) back to the
    * MANIFEST ENTRIES that reference them: bare names for the table's
    * own files, qualified URIs for FOREIGN refs (shallow clones,
    * in-place conversions). Collapsing to `getName` here would be a
    * correctness bug, not a cosmetic one: a foreign entry never equals
    * a bare name, so the copy-on-write carry logic would keep the
    * affected file AND stage its rewrite — silent row duplication.
    */
  private def probedEntries(spark: SparkSession, table: String,
      candidates: Seq[String], probedUris: Iterable[String]): Set[String] = {
    val canonMap = canonCandidates(spark, table, candidates)._2
    probedUris.map(u => canonMap.getOrElse(
      graft.operators.Layout.canonUri(u), new Path(u).getName)).toSet
  }

  /** The staged outcome of one file-granular copy-on-write pass (see
    * [[cowApply]]): the staged rewrite+insert files, the untouched files
    * carried by name, the tombstone state the claim should record, and
    * which of those sidecars THIS pass staged (reclaimed on a lost
    * claim; carried-forward sidecars are never touched).
    */
  private final case class CowResult(newFiles: Seq[String],
      carried: Seq[String], tombstones: Seq[String],
      tombstoneCol: Option[String], stagedTombstones: Seq[String])

  /** File-granular copy-on-write apply — the shared engine of
    * [[commitMerge]] and [[syncReplica]]'s feed transport: stage only
    * the files that PHYSICALLY hold a key the change set touches,
    * carry every other file into the new manifest by name.
    *
    *   1. probe: ONE scan of the version's files, semi-joined against
    *      the (bounded, broadcast) touched keys, projecting
    *      `input_file_name()` — the same recipe [[commitDelete]] uses.
    *      Only the key columns are read (column pruning), and when the
    *      table carries a `_graft_stats` manifest covering the probe
    *      key, the scanned candidate set is itself stats-pruned
    *      driver-side first ([[pruneByKeyStats]]) — on a z-ordered
    *      table the probe opens a handful of files, not the table;
    *   2. rewrite: the affected slice, tombstone-filtered and conformed
    *      to the evolved schema, merged with the changes (upserts
    *      replace, `deleteCol`-flagged keys drop) — staged bytes are
    *      O(churned files + batch), never O(table);
    *   3. tombstones: pending tombstone headers CARRY forward, except
    *      keys the change set re-asserts — those files are forced into
    *      the affected set (their dead rows materialize in the rewrite)
    *      and the keys leave the tombstone set, so a re-inserted key is
    *      never swallowed by the read-side anti-join. When the change
    *      set lacks the tombstone key column entirely, conforming
    *      null-pads it and NULLs re-assert nothing.
    *
    * `changes` must already be conformed to `schema` (plus the optional
    * delete-flag column); `keys` must be unique within `changes`.
    */
  private def cowApply(spark: SparkSession, table: String,
      lines: Seq[String], schema: types.StructType, changes0: DataFrame,
      keys: Seq[String], deleteCol: Option[String]): CowResult = {
    import org.apache.spark.sql.functions.{broadcast, col, input_file_name}
    val files = filesOf(lines)
    // ONE materialization of the (bounded-by-contract) change set: the
    // pass consumes it several times — key collect/probe, the merge, the
    // tombstone re-assert legs — and in feed mode the lazy plan is a
    // whole rowDiff join that must not re-execute per consumer. The
    // checkpoint also cuts lineage to an in-memory RDD, which the
    // input_file_name() probes require (they refuse plans carrying a
    // second file source).
    val changes = changes0.localCheckpoint(true)
    val upserts = deleteCol match {
      case None => changes
      case Some(dc) => changes.filter(!col(dc)).drop(dc)
    }
    val colmap = colmapOf(lines)
    if (files.isEmpty)
      return CowResult(
        stageData(spark, upserts, table, colmap, partitionsOf(lines)),
        Nil, Nil, None, Nil)
    // single-column keys (the common case) probe via a literal IN-list
    // when the touch-set is bounded: the predicate pushes into the
    // parquet scan (row-group min/max skipping applies) and no second
    // frame ever joins the probe — fastVals is None past the cap or for
    // composite keys, falling back to the broadcast semi-join.
    val fastVals: Option[Seq[Any]] =
      if (keys.size == 1)
        Some(changes.select(col(keys.head)).na.drop().distinct()
            .limit(MaxPruneKeys + 1).collect().map(_.get(0)).toSeq)
          .filter(_.size <= MaxPruneKeys)
      else None
    lazy val touched = changes.select(keys.map(col): _*).distinct()
    // pending-tombstone keys the change set re-asserts (bounded × bounded)
    val tk = tombstoneKeys(spark, table, lines)
    val reasserted = tk.map { case (kc, tkeys) =>
      kc -> tkeys.join(broadcast(
          changes.select(col(kc)).filter(col(kc).isNotNull).distinct()),
        Seq(kc), "left_semi").localCheckpoint(true)
    }.filter(_._2.limit(1).count() > 0)
    // stats-pruned probe: when `_graft_stats` covers a probe key column,
    // the candidate file set shrinks DRIVER-SIDE before the scan — on a
    // z-ordered table a small touch-set probes a handful of files, so
    // the probe itself costs O(candidate files), not O(table). Each leg
    // prunes on ITS join column (the merge keys vs the tombstone
    // column), never one leg's candidates standing in for the other's.
    val candT = fastVals match {
      case Some(vals) => pruneByKeyVals(spark, table, keys.head, vals, files)
      case None => pruneByKeyStats(spark, table, keys.head,
        touched.select(col(keys.head)).filter(col(keys.head).isNotNull),
        files)
    }
    def probeOf(cand: Seq[String], frame: DataFrame,
        on: Seq[String]): Option[DataFrame] =
      if (cand.isEmpty) None
      else Some(readWithSchema(spark, table, cand, schemaOf(lines), colmap)
        .join(broadcast(frame), on, "left_semi")
        .select(input_file_name().as("file")))
    val probeT = fastVals match {
      case Some(vals) =>
        if (candT.isEmpty || vals.isEmpty) None
        else Some(readWithSchema(spark, table, candT, schemaOf(lines),
            colmap)
          .filter(col(keys.head).isInCollection(vals))
          .select(input_file_name().as("file")))
      case None => probeOf(candT, touched, keys)
    }
    val (candR, probeR) = reasserted match {
      case Some((kc, r)) =>
        val c = pruneByKeyStats(spark, table, kc, r, files)
        (c, probeOf(c, r, Seq(kc)))
      case None => (Nil, None)
    }
    lastCowProbePruned = Some(((candT ++ candR).distinct.size, files.size))
    val affected = (probeT.toSeq ++ probeR.toSeq)
      .reduceOption(_ unionByName _)
      .map(p => probedEntries(spark, table, files,
        p.distinct().collect().map(_.getString(0))))
      .getOrElse(Set.empty[String])
    val carried = files.filterNot(affected)
    val merged =
      if (affected.isEmpty) upserts
      else {
        val affState = conform(applyTombstones(spark, table, lines,
          readWithSchema(spark, table, files.filter(affected),
            schemaOf(lines), colmap)), schema)
        deleteCol match {
          case None =>
            graft.operators.Merge.upsert(affState, changes, keys)
          case Some(dc) =>
            graft.operators.Merge.applyChanges(affState, changes, keys, dc)
        }
      }
    val newFiles = stageData(spark, merged, table, colmap,
      partitionsOf(lines))
    val (tombs, tombCol, stagedTombs) = (tk, reasserted) match {
      case (None, _) => (Nil, None, Nil)
      case (Some(_), None) => // untouched pending state carries verbatim
        (tombstonesOf(lines), tombstoneColOf(lines), Nil)
      case (Some((kc, tkeys)), Some(_)) =>
        // drop the re-asserted keys; keys whose rows just materialized
        // in the rewrite MAY stay listed (their anti-join is a no-op)
        val remaining = tkeys.join(broadcast(
            changes.select(col(kc)).filter(col(kc).isNotNull).distinct()),
          Seq(kc), "left_anti")
        if (remaining.limit(1).count() == 0) (Nil, None, Nil)
        else {
          val staged = stageTombstoneSidecar(spark, table, remaining)
          (staged, Some(kc), staged)
        }
    }
    CowResult(newFiles, carried, tombs, tombCol, stagedTombs)
  }

  /** MERGE with an update branch, under snapshot isolation — COPY-ON-
    * WRITE AT FILE GRANULARITY: one `input_file_name()` probe finds the
    * files physically holding a batch key ([[cowApply]]); ONLY those are
    * rewritten (matched keys updated, already-tombstoned rows
    * materialized out), batch keys no file holds land as inserts, and
    * every untouched file carries into the new manifest BY NAME — a
    * 10-row CDC tick against a 100 TB table stages a few files, never
    * the table. Pending lazy-delete tombstones carry forward, minus any
    * key the batch re-inserts (the legitimate resurrection path: its
    * files rewrite without the dead rows and the key leaves the set).
    *
    * UNLIKE append, the result DEPENDS on the head it was computed
    * against, so a lost claim cannot simply retry the manifest: the
    * loser deletes its orphaned files (and any sidecar it staged),
    * RE-READS the new head, RECOMPUTES the merge and tries again — full
    * optimistic concurrency (Delta-style), serializing concurrent merges
    * instead of losing one. Returns the committed version.
    */
  def commitMerge(spark: SparkSession, batch: DataFrame, table: String,
      keys: Seq[String], maxRetries: Int = 10): Long = {
    val f = fs(spark, dataDir(table))
    // every post-merge row is either an untouched (already-valid) target
    // row or a batch row taken wholesale — enforcing on the batch covers
    // the new state without scanning the table
    val headLines0 = manifestLines(spark, table, currentVersion(spark, table))
    enforceChecks(batch, checksOf(headLines0), table, schemaOf(headLines0))
    var validatedChecks = checksOf(headLines0)
    var attempt = 0
    while (attempt < maxRetries) {
      val head = currentVersion(spark, table)
      val lines = manifestLines(spark, table, head)
      // TOCTOU guard (see commit): constraints landing mid-merge apply
      if (checksOf(lines) != validatedChecks) {
        enforceChecks(batch, checksOf(lines), table, schemaOf(lines))
        validatedChecks = checksOf(lines)
      }
      // evolve first, then conform BOTH sides: a merge may introduce a
      // new column (target rows null-pad) or omit one (batch null-pads)
      // — but never a DROPPED name while pre-drop files are carried
      refuseDroppedColumns(batch, table, lines)
      val schema = evolveSchema(schemaOf(lines), batch.schema)
      val cow = cowApply(spark, table, lines, schema,
        conform(batch, schema), keys, deleteCol = None)
      if (claimManifest(spark, table, head + 1,
          contentOf(Some(schema), marksOf(lines),
            cow.carried ++ cow.newFiles, "merge", checksOf(lines),
            cow.tombstones, cow.tombstoneCol, droppedOf(lines),
            colmapOf(lines), partRawOf(lines))))
        return head + 1
      // lost the race: this merge was computed against a stale head —
      // its files are unreachable (no manifest references them); drop
      // them and recompute against the new head
      cow.newFiles.foreach(n => f.delete(new Path(dataDir(table), n), false))
      cow.stagedTombstones.foreach(n =>
        f.delete(new Path(tombstoneDir(table), n), false))
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
  def commitDelete(spark: SparkSession, table: String, keys: Seq[Any],
      keyCol: String, maxRetries: Int = 10): (Long, Long) = {
    import org.apache.spark.sql.functions.col
    if (keys.isEmpty) return (currentVersion(spark, table), 0L)
    val distinctKeys = keys.distinct
    deleteWhereImpl(spark, table, col(keyCol).isInCollection(distinctKeys),
      maxRetries,
      (cand, _) => pruneByKeyVals(spark, table, keyCol, distinctKeys, cand))
  }

  /** Predicate DELETE — `DELETE FROM t WHERE <predicate>` for the
    * retention / erasure jobs that CANNOT enumerate keys on the driver
    * at 100 TB (`ts < '2024-01-01'`, `user_id = 'x'`): the same
    * file-granular copy-on-write as [[commitDelete]], with the probe
    * filtering on the arbitrary predicate instead of a key list — the
    * predicate pushes down into the probe's parquet scan, so row-group
    * min/max skipping bounds even the probe's IO. Rows where the
    * predicate is NULL are KEPT (SQL DELETE semantics). Returns
    * (committed version, rows deleted); (head, 0) when no file holds a
    * matching row.
    */
  def commitDeleteWhere(spark: SparkSession, table: String,
      predicate: Column, maxRetries: Int = 10): (Long, Long) =
    deleteWhereImpl(spark, table, predicate, maxRetries,
      (cand, schema) =>
        pruneByPredicateStats(spark, table, predicate, schema, cand))

  /** Predicate UPDATE — `UPDATE t SET c = expr, ... WHERE pred` as a
    * file-granular copy-on-write commit: ONE probe (predicate pushed
    * into the parquet scan) finds the files physically holding a
    * matching row, only those rewrite (matching rows take the SET
    * expressions, their neighbors re-land verbatim), every other file
    * carries by name. Rows where the predicate is NULL are NOT updated
    * (SQL semantics); SET columns must already exist (UPDATE never
    * evolves schema — that's what appends and MERGE are for); declared
    * CHECK constraints are enforced on the rewritten slice (the only
    * rows that changed) before any claim. Returns (committed version,
    * rows updated); (head, 0) when nothing matches.
    */
  def commitUpdateWhere(spark: SparkSession, table: String,
      predicate: Column, sets: Seq[(String, Column)],
      maxRetries: Int = 10): (Long, Long) = {
    import org.apache.spark.sql.functions._
    require(sets.nonEmpty, "UPDATE needs at least one SET assignment")
    val f = fs(spark, dataDir(table))
    var attempt = 0
    while (attempt < maxRetries) {
      val head = currentVersion(spark, table)
      if (head == 0) return (head, 0L)
      val lines = manifestLines(spark, table, head)
      val files = filesOf(lines)
      val schema = schemaOf(lines)
      sets.foreach { case (c, _) =>
        require(schema.forall(_.fieldNames.contains(c)),
          s"UPDATE SET column $c does not exist in $table — UPDATE " +
            "never evolves schema (append or MERGE a new column)")
      }
      // the probe's candidate set stats-prunes driver-side on the
      // predicate's conjunctive bounds, like the key-list paths — a
      // range UPDATE on a z-ordered stats column opens the
      // curve-adjacent files, not the table
      val cand = pruneByPredicateStats(spark, table, predicate, schema,
        files)
      lastWherePruned = Some((cand.size, files.size))
      val affected =
        if (cand.isEmpty) Set.empty[String]
        else probedEntries(spark, table, files,
          readWithSchema(spark, table, cand, schema, colmapOf(lines))
            .filter(predicate)
            .select(input_file_name().as("file")).distinct()
            .collect().map(_.getString(0)))
      if (affected.isEmpty) return (head, 0L)
      // ONE materialization of the affected slice: the updated-count,
      // the CHECK aggregation and the staged write below all consume it
      // — a lazy plan would re-read the affected files per consumer
      // (the cowApply recipe; bounded by affected files, never the
      // table, but 3× read amplification is pure waste)
      val aff = applyTombstones(spark, table, lines,
        readWithSchema(spark, table, files.filter(affected), schema,
          colmapOf(lines)))
        .localCheckpoint(true)
      val updated = aff.filter(predicate).count()
      val setMap = sets.toMap
      // when(pred, new).otherwise(old): FALSE and NULL predicates both
      // keep the old value — exactly SQL UPDATE's row selection
      val rewritten = aff.select(aff.columns.toIndexedSeq.map { c =>
        setMap.get(c) match {
          case Some(e) => // cast pins the column's DECLARED type — a SET
            // expression must never silently widen the stored schema
            when(predicate, e).otherwise(col(c))
              .cast(aff.schema(c).dataType).as(c)
          case None => col(c)
        }
      }: _*)
      // updated rows are the only new data — they must still satisfy
      // every declared CHECK before a manifest claims them
      enforceChecks(rewritten, checksOf(lines), table, schema)
      val newFiles = stageData(spark, rewritten, table, colmapOf(lines),
        partitionsOf(lines))
      if (claimManifest(spark, table, head + 1,
          contentOf(schema, marksOf(lines),
            files.filterNot(affected) ++ newFiles, "update",
            checksOf(lines), tombstonesOf(lines), tombstoneColOf(lines),
            droppedOf(lines), colmapOf(lines), partRawOf(lines))))
        return (head + 1, updated)
      newFiles.foreach(n => f.delete(new Path(dataDir(table), n), false))
      attempt += 1
    }
    throw new IllegalStateException(
      s"update commit to $table failed after $maxRetries attempts")
  }

  private def deleteWhereImpl(spark: SparkSession, table: String,
      predicate: Column, maxRetries: Int,
      prune: (Seq[String], Option[types.StructType]) => Seq[String])
      : (Long, Long) = {
    import org.apache.spark.sql.functions._
    val f = fs(spark, dataDir(table))
    var attempt = 0
    while (attempt < maxRetries) {
      val head = currentVersion(spark, table)
      if (head == 0) return (head, 0L)
      val lines = manifestLines(spark, table, head)
      val files = filesOf(lines)
      // reads run under the DECLARED schema: after an evolution, a
      // rewritten pre-evolution file must re-land with the new columns
      // (as NULLs), not silently narrow the table to its oldest file
      val schema = schemaOf(lines)
      // key-list deletes stats-prune the probe candidates driver-side
      // (pruneByKeyVals); predicate deletes prune on the predicate's own
      // conjunctive bounds (pruneByPredicateStats) — scan-level pushdown
      // still applies to whatever survives
      val cand = prune(files, schema)
      lastWherePruned = Some((cand.size, files.size))
      val affected =
        if (cand.isEmpty) Set.empty[String]
        else probedEntries(spark, table, files,
          readWithSchema(spark, table, cand, schema, colmapOf(lines))
            .filter(predicate)
            .select(input_file_name().as("file")).distinct()
            .collect().map(_.getString(0)))
      if (affected.isEmpty) return (head, 0L)
      // rewrite from the APPLIED view: already-tombstoned rows in the
      // affected files neither count as freshly deleted nor re-land
      // (partial materialization); untouched files keep relying on the
      // carried tombstone headers. ONE materialization — the deleted
      // count and the staged keep-rewrite both consume the slice
      val aff = applyTombstones(spark, table, lines,
        readWithSchema(spark, table, files.filter(affected), schema,
          colmapOf(lines)))
        .localCheckpoint(true)
      val deleted = aff.filter(predicate).count()
      // NULL-safe keep: NOT(NULL) is NULL and would silently drop rows
      // whose predicate is undecided — SQL DELETE keeps them
      val kept = aff.filter(!coalesce(predicate, lit(false)))
      val newFiles = stageData(spark, kept, table, colmapOf(lines),
        partitionsOf(lines))
      val manifest = contentOf(schema, marksOf(lines),
        files.filterNot(affected) ++ newFiles, "delete", checksOf(lines),
        tombstonesOf(lines), tombstoneColOf(lines), droppedOf(lines),
        colmapOf(lines), partRawOf(lines))
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
    *
    * `zorderBy` (2..6 numeric columns) clusters the rewrite along the
    * Morton curve instead of hash-scattering it — `OPTIMIZE ZORDER BY`:
    * the rewrite is the one moment the table's rows move anyway, so
    * clustering rides along for free, and with a stats manifest
    * ([[extendStats]] after the compaction) box predicates on those
    * columns prune to the few curve-adjacent files instead of hitting a
    * random slice of all of them. Accreted appends degrade locality;
    * the maintenance policy's periodic OPTIMIZE restores it.
    */
  def compactData(spark: SparkSession, table: String, targetFiles: Int = 8,
      minFiles: Int = 16, maxRetries: Int = 10,
      zorderBy: Seq[String] = Nil,
      targetFileBytes: Long = 128L << 20): Option[Long] = {
    require(targetFiles >= 0, "targetFiles must be >= 0 (0 = size-derived)")
    val f = fs(spark, dataDir(table))
    var attempt = 0
    while (attempt < maxRetries) {
      val head = currentVersion(spark, table)
      val lines =
        if (head == 0) Nil else manifestLines(spark, table, head)
      // pending tombstones always compact (materializing merge-on-read
      // deletes is the point, whatever the file count); otherwise the
      // minFiles floor refuses pure write amplification
      if (head == 0 ||
        (filesOf(lines).size < minFiles && tombstonesOf(lines).isEmpty))
        return None
      // targetFiles == 0 → SIZE-DERIVED: aim for ~targetFileBytes per
      // output file from the live byte census of the version's file list
      // (driver-side listStatus, O(files) metadata). A constant target
      // is pathological in both directions at 100 TB — 8 means one
      // full rewrite into enormous files, a large constant shreds a
      // small table — so the unparameterized SQL face compacts to a
      // byte budget instead.
      val nOut =
        if (targetFiles > 0) targetFiles
        else {
          val ledger = fileSizesOf(lines) // probe-free when manifested
          val bytes = filesOf(lines).map(n => ledger.getOrElse(n,
            f.getFileStatus(new Path(dataDir(table), n)).getLen)).sum
          math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
        }
      // the rewrite is the APPLIED state and the claim carries no
      // tombstone headers — OPTIMIZE is the materialization point
      val current = applyTombstones(spark, table, lines,
        readWithSchema(spark, table, filesOf(lines), schemaOf(lines),
          colmapOf(lines)))
      val rewritten =
        if (zorderBy.nonEmpty)
          graft.operators.Layout.zorderFrameN(current, zorderBy, nOut)
        else current.repartition(nOut)
      // the full rewrite NORMALIZES physical names (stage the logical
      // frame verbatim) — the colmap clears with the ledger below; the
      // partition transform is layout policy and the restage honors it
      val newFiles = stageData(spark, rewritten, table, Map.empty,
        partitionsOf(lines))
      // the full rewrite is the materialization point: no tombstones,
      // and the dropped-name ledger CLEARS (every surviving file was
      // re-staged under the declared schema — pre-drop values are gone)
      if (claimManifest(spark, table, head + 1,
          contentOf(schemaOf(lines), marksOf(lines), newFiles, "optimize",
            checksOf(lines), partition = partRawOf(lines))))
        return Some(head + 1)
      // lost the race (an append/merge landed first): this rewrite no
      // longer represents the head — drop the orphans and recompute
      newFiles.foreach(n => f.delete(new Path(dataDir(table), n), false))
      attempt += 1
    }
    throw new IllegalStateException(
      s"compaction commit to $table failed after $maxRetries attempts")
  }

  /** Bin-packed PARTIAL compaction — the steady-state OPTIMIZE a 100 TB
    * table actually runs (the Delta/Iceberg bin-packing semantics):
    * rewrite ONLY the files under `smallBytes`, packed into
    * ~`targetFileBytes` outputs, and carry every already-compact file
    * into the new manifest BY NAME — IO is proportional to the accreted
    * small-file debt, never the table, so it can run after every
    * streaming burst where [[compactData]]'s full rewrite could not.
    * Byte census is one driver-side `listStatus` of the data dir
    * (O(files) metadata, zero data reads for the decision).
    *
    * Pending lazy-delete tombstones CARRY FORWARD: the rewritten slice
    * materializes its share (rows filtered out of the packed output),
    * carried files keep the read-side anti-join via the carried headers
    * — full [[compactData]] remains the total materialization point.
    * No-op (None) below `minSmall` small files — packing two files is
    * pure write amplification. Returns the committed version.
    */
  def compactSmallFiles(spark: SparkSession, table: String,
      smallBytes: Long = 32L << 20, targetFileBytes: Long = 128L << 20,
      minSmall: Int = 8, maxRetries: Int = 10): Option[Long] = {
    require(smallBytes > 0 && targetFileBytes > 0)
    val f = fs(spark, dataDir(table))
    var attempt = 0
    while (attempt < maxRetries) {
      val head = currentVersion(spark, table)
      if (head == 0) return None
      val lines = manifestLines(spark, table, head)
      val files = filesOf(lines)
      // recursive census keyed by data-dir-RELATIVE path: partitioned
      // entries (`__gp=.../f.parquet`) size like flat ones; sidecar
      // dirs (underscore) and foreign refs (absent) stay out
      val ddQ = f.makeQualified(dataDir(table)).toString + "/"
      val sizes = walkFiles(f, dataDir(table)).flatMap { st =>
        val rel = f.makeQualified(st.getPath).toString.stripPrefix(ddQ)
        if (st.isFile && !rel.split('/').exists(c =>
            (c.startsWith("_") && !c.startsWith(PartPrefix)) ||
              c.startsWith(".")))
          Some(rel -> st.getLen)
        else None
      }.toMap
      val small = files.filter(n => sizes.get(n).exists(_ < smallBytes))
      if (small.isEmpty || small.size < minSmall) return None
      val carried = files.filterNot(small.toSet)
      val smallTotal = small.map(sizes).sum
      val nOut = math.max(1,
        math.ceil(smallTotal.toDouble / targetFileBytes).toInt)
      // the packed slice is read APPLIED (its tombstoned rows leave
      // physically); carried files keep relying on the carried headers
      val packed = applyTombstones(spark, table, lines,
        readWithSchema(spark, table, small, schemaOf(lines),
          colmapOf(lines)))
        .repartition(nOut)
      val newFiles = stageData(spark, packed, table, colmapOf(lines),
        partitionsOf(lines))
      // PARTIAL pack: carried files may still hold pre-drop values, so
      // the dropped-name ledger carries (unlike the full rewrite above)
      if (claimManifest(spark, table, head + 1,
          contentOf(schemaOf(lines), marksOf(lines), carried ++ newFiles,
            "optimize", checksOf(lines),
            tombstonesOf(lines), tombstoneColOf(lines), droppedOf(lines),
            colmapOf(lines), partRawOf(lines))))
        return Some(head + 1)
      // lost the race — drop the orphans and recompute against the head
      newFiles.foreach(n => f.delete(new Path(dataDir(table), n), false))
      attempt += 1
    }
    throw new IllegalStateException(
      s"small-file compaction of $table failed after $maxRetries attempts")
  }

  /** Read the table at `version` (default: latest). A resolved reader is
    * pinned: later commits never change the files it reads.
    */
  def read(spark: SparkSession, table: String,
      version: Option[Long] = None): DataFrame = {
    val v = version.getOrElse(currentVersion(spark, table))
    val lines = manifestLines(spark, table, v)
    val files = filesOf(lines)
    if (files.isEmpty) spark.emptyDataFrame
    else applyTombstones(spark, table, lines,
      readWithSchema(spark, table, files, schemaOf(lines), colmapOf(lines)))
  }

  /** The table's commit log as a DataFrame — the audit surface a
    * versioned warehouse exposes (Delta's DESCRIBE HISTORY): one row per
    * RETAINED version (newest first) with the commit's operation (the
    * `#op:` manifest header; "unknown" for manifests predating it), the
    * commit instant (the `#ts:` header recorded at claim time — durable
    * across table copies and store migrations; the claim file's mtime is
    * the fallback for legacy manifests), and the physical step shape
    * (file counts; added/removed are NULL for the oldest retained
    * version when its predecessor was vacuumed). Metadata-only: reads
    * manifests, never data files — O(retained versions), which vacuum
    * bounds.
    */
  def history(spark: SparkSession, table: String): DataFrame = {
    import spark.implicits._
    val dir = manifestDir(table)
    val f = fs(spark, dir)
    val empty = Seq.empty[(Long, java.sql.Timestamp, String, Int,
      Option[Int], Option[Int])]
    if (!f.exists(dir))
      return empty.toDF("version", "committed_at", "op", "num_files",
        "added_files", "removed_files")
    val byVersion = f.listStatus(dir)
      .filter(_.getPath.getName.endsWith(".manifest"))
      .map(s => versionOf(s.getPath.getName) -> s.getModificationTime)
      .sortBy(_._1)
    var prior: Option[Set[String]] = None // unknown until a version reads
    val rows = byVersion.map { case (v, mtime) =>
      val lines = manifestLines(spark, table, v)
      val files = filesOf(lines).toSet
      val op = lines.find(_.startsWith(OpHeader))
        .map(_.stripPrefix(OpHeader)).getOrElse("unknown")
      // contiguity: vacuum retains a suffix, so only the OLDEST retained
      // version can lack its predecessor (unless it is v1)
      val base = if (v == 1) Some(Set.empty[String]) else prior
      val row = (v, new java.sql.Timestamp(tsOf(lines).getOrElse(mtime)),
        op, files.size,
        base.map(b => files.diff(b).size), base.map(b => b.diff(files).size))
      prior = Some(files)
      row
    }.reverse.toSeq
    rows.toDF("version", "committed_at", "op", "num_files",
      "added_files", "removed_files")
  }

  /** (version, commit instant epochMs) of every RETAINED manifest,
    * ascending — the `#ts:` header when present (durable), the manifest
    * file's mtime for legacy manifests. What `TIMESTAMP AS OF` resolves
    * against; O(retained versions) manifest reads, bounded by vacuum.
    */
  def commitInstants(spark: SparkSession, table: String): Seq[(Long, Long)] = {
    val dir = manifestDir(table)
    val f = fs(spark, dir)
    if (!f.exists(dir)) return Nil
    f.listStatus(dir)
      .filter(_.getPath.getName.endsWith(".manifest"))
      .map { s =>
        val v = versionOf(s.getPath.getName)
        v -> tsOf(manifestLines(spark, table, v))
          .getOrElse(s.getModificationTime)
      }.sortBy(_._1).toSeq
  }

  /** The newest retained version committed at or before `cutoffMs` —
    * what `TIMESTAMP AS OF` / `snapshot_at(t, ts)` resolve. BINARY
    * SEARCH over the retained version range: commit instants are
    * monotone in version order by claim construction (each `#ts:` is
    * stamped as its claim wins, and claims are ordered), so the lookup
    * reads O(log retained) manifests instead of every one —
    * [[commitInstants]] stays the exhaustive audit surface. A writer
    * with a skewed clock degrades this to the same approximation every
    * timestamp-ordered log accepts (Delta's commit-timestamp lookup has
    * the identical caveat). None when every retained commit is after
    * the cutoff.
    */
  def versionAtInstant(spark: SparkSession, table: String,
      cutoffMs: Long): Option[Long] = {
    val dir = manifestDir(table)
    val f = fs(spark, dir)
    if (!f.exists(dir)) return None
    val statuses = f.listStatus(dir)
      .filter(_.getPath.getName.endsWith(".manifest"))
    if (statuses.isEmpty) return None
    val mtimes = statuses
      .map(s => versionOf(s.getPath.getName) -> s.getModificationTime).toMap
    val versions = mtimes.keys.toIndexedSeq.sorted
    def instant(v: Long): Long =
      tsOf(manifestLines(spark, table, v)).getOrElse(mtimes(v))
    // largest index whose instant <= cutoff
    var lo = 0
    var hi = versions.size - 1
    if (instant(versions(lo)) > cutoffMs) return None
    while (lo < hi) {
      val mid = (lo + hi + 1) / 2
      if (instant(versions(mid)) <= cutoffMs) lo = mid else hi = mid - 1
    }
    Some(versions(lo))
  }

  // ------------------------------------------------------------------
  // Incremental consumption (change feed)
  // ------------------------------------------------------------------

  /** File names present in `toV` but not `fromV` — metadata-only (two
    * manifest reads, no data IO). The physical growth of the step.
    */
  def addedFiles(spark: SparkSession, table: String, fromV: Long,
      toV: Long): Seq[String] = {
    val before = filesAt(spark, table, fromV).toSet
    filesAt(spark, table, toV).filterNot(before)
  }

  /** File names present in `fromV` but not `toV` — files a delete/merge/
    * compaction rewrote away during the step. Metadata-only.
    */
  def removedFiles(spark: SparkSession, table: String, fromV: Long,
      toV: Long): Seq[String] = {
    val after = filesAt(spark, table, toV).toSet
    filesAt(spark, table, fromV).filterNot(after)
  }

  /** True when the two versions carry identical pending-tombstone state
    * — the other half of the append-only test an incremental consumer
    * runs before choosing the added-files transport (a lazy delete
    * touches no files but is NOT append-only: its window must flow
    * through [[rowDiff]]). Metadata-only: two manifest reads.
    */
  def sameTombstones(spark: SparkSession, table: String, fromV: Long,
      toV: Long): Boolean =
    tombstonesOf(manifestLines(spark, table, fromV)) ==
      tombstonesOf(manifestLines(spark, table, toV))

  private def readDataFiles(spark: SparkSession, table: String,
      names: Seq[String], schema: Option[types.StructType],
      colmap: Map[String, String]): Option[DataFrame] =
    if (names.isEmpty) None
    else Some(readWithSchema(spark, table, names, schema, colmap))

  /** Rows appended between two versions of an APPEND-ONLY step, served by
    * reading ONLY the step's added files — IO is proportional to the new
    * data, never the table (the contract an incremental consumer needs at
    * 100 TB: tailing a snapshot table costs O(delta) per poll, like
    * Delta's CDF on append commits). Throws when the step rewrote any
    * file (delete/merge/compaction landed in the window) — added files
    * then also carry rows that merely MOVED, so a file-level read would
    * over-report; use [[rowDiff]] for those steps.
    */
  def incrementalRead(spark: SparkSession, table: String, fromV: Long,
      toV: Long): DataFrame = {
    require(fromV <= toV, s"fromV $fromV > toV $toV")
    val removed = removedFiles(spark, table, fromV, toV)
    require(removed.isEmpty,
      s"step v$fromV->v$toV rewrote ${removed.size} file(s) — not " +
        "append-only; use rowDiff(keys) for a row-exact change feed")
    require(tombstonesOf(manifestLines(spark, table, fromV)) ==
        tombstonesOf(manifestLines(spark, table, toV)),
      s"step v$fromV->v$toV changed the table's lazy-delete tombstones — " +
        "not append-only; use rowDiff(keys) for a row-exact change feed")
    // the TO-version's declared schema: an evolution step's feed carries
    // the new columns, and pre-evolution consumers see a superset schema
    readDataFiles(spark, table, addedFiles(spark, table, fromV, toV),
        schemaAt(spark, table, toV), colmapAt(spark, table, toV))
      .getOrElse(read(spark, table, Some(toV)).limit(0))
  }

  /** Row-exact change feed between two versions, with IO proportional to
    * the CHURNED files, not the table: rows can only differ inside files
    * the step removed (pre-images) or added (post-images) — every carried
    * file is byte-identical on both sides and is never opened. A
    * full-outer join of just those two slices on `keys` classifies each
    * key as insert / delete / update; keys whose payload is unchanged
    * (rows that merely moved in a compaction or a copy-on-write rewrite)
    * cancel out. OPTIMIZE therefore yields an EMPTY feed at full-table
    * rewrite cost of zero extra reads beyond the rewritten files
    * themselves.
    *
    * Output: the table's columns plus `change_type`. Inserts carry the
    * post-image, deletes the pre-image, and each update emits TWO rows —
    * `update_preimage` and `update_postimage` (the Delta CDF convention):
    * a consumer applying the feed takes post-images; a consumer
    * invalidating derived state keyed by a changed column (a mart
    * partition whose date moved) needs the pre-image row too, or the old
    * key's state goes permanently stale. Images are side-pure — an update
    * that sets a column to NULL has NULL in its post-image, never a value
    * resurrected from the pre-image. Requires `keys` to be unique within
    * each version (the usual CDF contract); both versions must still be
    * within vacuum retention.
    */
  def rowDiff(spark: SparkSession, table: String, fromV: Long, toV: Long,
      keys: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions._
    require(fromV <= toV, s"fromV $fromV > toV $toV")
    require(keys.nonEmpty, "rowDiff needs at least one key column")
    val fromLines = manifestLines(spark, table, fromV)
    val toLines = manifestLines(spark, table, toV)
    // BOTH sides read under the to-version's declared schema: files from
    // before an added column serve it as NULL, so a backfill rewrite
    // classifies as `update` instead of failing the column resolution.
    // Each side is read at ITS version's APPLIED state (tombstones
    // filtered): a row dead at fromV must not feed a pre-image, and a
    // row dead at toV must not feed a post-image — e.g. a window that
    // only MATERIALIZES pending tombstones (OPTIMIZE) nets to an empty
    // feed instead of re-reporting the deletes.
    val toSchema = schemaOf(toLines)
    val toColmap = colmapOf(toLines)
    val pre = readDataFiles(spark, table,
      removedFiles(spark, table, fromV, toV), toSchema, toColmap)
      .map(applyTombstones(spark, table, fromLines, _))
    val post = readDataFiles(spark, table,
      addedFiles(spark, table, fromV, toV), toSchema, toColmap)
      .map(applyTombstones(spark, table, toLines, _))
    // lazy deletes COMMITTED in the window touch no files, so the file
    // legs can't see them: rows of CARRIED files matching the window's
    // NEW tombstone keys are emitted as `delete` pre-images. Restricted
    // to carried files — removed-file rows are already classified above.
    val tombLeg: Option[DataFrame] = tombstoneKeys(spark, table, toLines)
      .flatMap { case (kc, toKeys) =>
        val carried = filesAt(spark, table, fromV)
          .toSet.intersect(filesAt(spark, table, toV).toSet).toSeq
        if (carried.isEmpty) None
        else {
          // same key column at both ends → subtract the old set; a
          // differing column means fromV's tombstones were materialized
          // in-window (their rows left via file rewrites) — all of toV's
          // keys are new
          val newKeys = tombstoneKeys(spark, table, fromLines) match {
            case Some((fkc, fromKeys)) if fkc == kc =>
              toKeys.exceptAll(fromKeys)
            case _ => toKeys
          }
          // the feed of an O(keys) lazy-delete commit must not cost
          // O(table): when `_graft_stats` covers the tombstone column,
          // the carried set prunes driver-side to files whose [min,max]
          // can hold a deleted key — on a z-ordered table the pre-images
          // come from a handful of files, not every carried one
          val cand = pruneByKeyStats(spark, table, kc, newKeys, carried)
          lastTombLegPruned = Some((cand.size, carried.size))
          if (cand.isEmpty) None
          else Some(readDataFiles(spark, table, cand, toSchema, toColmap).get
            .join(broadcast(newKeys), Seq(kc), "left_semi")
            .withColumn("change_type", lit("delete")))
        }
      }
    def withTombLeg(base: DataFrame): DataFrame = tombLeg match {
      case None => base
      case Some(t) =>
        base.unionByName(t.select(base.columns.map(col).toIndexedSeq: _*))
    }
    withTombLeg((pre, post) match {
      case (None, None) =>
        read(spark, table, Some(toV)).limit(0)
          .withColumn("change_type", lit(""))
      case (None, Some(a)) => a.withColumn("change_type", lit("insert"))
      case (Some(r), None) => r.withColumn("change_type", lit("delete"))
      case (Some(r), Some(a)) =>
        val nonKeys = a.columns.filterNot(keys.contains).toSeq
        val lhs = r.select(keys.map(col) ++
          nonKeys.map(c => col(c).as(s"__pre_$c")) :+
          lit(true).as("__in_pre"): _*)
        val rhs = a.select(keys.map(col) ++
          nonKeys.map(c => col(c).as(s"__post_$c")) :+
          lit(true).as("__in_post"): _*)
        val unchanged = nonKeys
          .map(c => col(s"__pre_$c") <=> col(s"__post_$c"))
          .reduceOption(_ && _).getOrElse(lit(true))
        val joined = lhs.join(rhs, keys, "full_outer")
          .withColumn("change_type",
            when(!coalesce(col("__in_pre"), lit(false)), "insert")
              .when(!coalesce(col("__in_post"), lit(false)), "delete")
              .when(unchanged, "carried")
              .otherwise("update"))
          .filter(col("change_type") =!= "carried")
        if (nonKeys.isEmpty)
          // key-only table: payloads can't differ, so updates are
          // impossible — only insert/delete rows survive the carry filter
          joined.select(keys.map(col) :+ col("change_type"): _*)
        else {
          // one pass over the join: each row explodes into its image
          // rows (1 for insert/delete, pre+post for update) — never a
          // second join execution, and each image is taken wholly from
          // ITS side (a coalesce would resurrect pre-image values into
          // post-images wherever the new value is NULL)
          val preImg = struct(nonKeys.map(c => col(s"__pre_$c").as(c)): _*)
          val postImg = struct(nonKeys.map(c => col(s"__post_$c").as(c)): _*)
          def img(i: org.apache.spark.sql.Column, ct: String) =
            struct(i.as("img"), lit(ct).as("ct"))
          joined.select(keys.map(col) :+ explode(
              when(col("change_type") === "insert",
                array(img(postImg, "insert")))
              .when(col("change_type") === "delete",
                array(img(preImg, "delete")))
              .otherwise(array(img(preImg, "update_preimage"),
                img(postImg, "update_postimage")))).as("__e"): _*)
            .select(keys.map(col) ++ nonKeys.map(c =>
              col("__e").getField("img").getField(c).as(c)) :+
              col("__e").getField("ct").as("change_type"): _*)
        }
    })
  }

  // ------------------------------------------------------------------
  // Per-file stats: manifest-level file skipping on versioned tables
  // ------------------------------------------------------------------

  /** Maintain per-file min/max stats for a snapshot table (the Layout
    * `_graft_stats` sidecar, living inside `data/` where the underscore
    * keeps it invisible to data readers). First call scans the data dir
    * once to build the manifest; every later call is INCREMENTAL — only
    * files not yet covered are read, so the steady-state cost after each
    * commit is O(new files). Stats rows for vacuumed files are dropped
    * for free. Returns the number of files newly covered.
    *
    * Run it after commits (or from the maintenance policy); [[readPruned]]
    * stays correct either way because uncovered files are never skipped.
    */
  def extendStats(spark: SparkSession, table: String,
      statsCols: Seq[String]): Int = {
    val dd = dataDir(table).toString
    // the HEAD VERSION's file list drives the stats pass, never a
    // directory listing: concurrent writers' staged orphans stay out,
    // and a shallow clone's / in-place convert's FOREIGN references
    // (qualified URIs outside the data dir) stat in — so z-order box
    // pruning works on a zero-copy fork exactly like on the source
    val f = fs(spark, dataDir(table))
    val head = currentVersion(spark, table)
    require(head > 0, s"no snapshot table at $table to stat")
    val headLines = manifestLines(spark, table, head)
    val files = filesOf(headLines)
      .map(n => f.makeQualified(new Path(dataDir(table), n)).toString)
    require(files.nonEmpty, s"$table@v$head has no data files to stat")
    // the sidecar reads footers, so it tracks PHYSICAL column names;
    // callers speak logical — map before touching the manifest
    val physCols = statsCols.map(physName(colmapOf(headLines), _))
    graft.operators.Layout.statsManifestCols(spark, dd) match {
      case None =>
        graft.operators.Layout.writeStatsManifest(spark, dd, physCols,
          Some(files))
        spark.read.parquet(s"$dd/${graft.operators.Layout.statsDir}")
          .count().toInt
      case Some(cols) =>
        require(cols.toSet == physCols.toSet,
          s"stats manifest already tracks $cols; asked for $physCols")
        graft.operators.Layout.pruneStatsManifestEntries(spark, dd,
          Some(files))
        graft.operators.Layout.appendStatsManifest(spark, dd, Some(files))
    }
  }

  /** Read a version of the table with the file list pre-pruned by the
    * stats manifest: only files whose [min, max] range intersects every
    * `(col, lo, hi)` box side are opened — `readPruned(...).filter(box)`
    * ≡ `read(...).filter(box)`, with the file skip decided driver-side
    * from the (tiny) manifest before a single footer is touched. Pruning
    * composes with snapshot semantics: the candidate set is the VERSION's
    * file list (never a directory listing, so orphans and other
    * versions' files can't leak in), files the stats don't cover yet are
    * always read, and a pinned version stays prunable after later
    * commits. Falls back to the plain versioned read when no manifest
    * exists.
    */
  def readPruned(spark: SparkSession, table: String,
      ranges: Seq[(String, Any, Any)],
      version: Option[Long] = None): DataFrame = {
    val v = version.getOrElse(currentVersion(spark, table))
    val f = fs(spark, dataDir(table))
    val lines = manifestLines(spark, table, v)
    // fully-qualified canonical URIs: the stats manifest keys files by
    // input_file_name() (scheme-qualified), so the version's file list
    // must compare in the same form
    val files = filesOf(lines)
      .map(n => f.makeQualified(new Path(dataDir(table), n)).toString)
    if (files.isEmpty) return spark.emptyDataFrame
    // every read path honors the version's DECLARED schema — the
    // no-manifest fallback included, or a schema-evolved table would
    // resolve its columns from whichever file's footer Spark samples —
    // and the version's pending tombstones (merge-on-read deletes filter
    // the pruned read exactly like the plain one)
    val schema = schemaOf(lines)
    val colmap = colmapOf(lines)
    def rd(paths: Seq[String]) = applyTombstones(spark, table, lines,
      readWithSchema(spark, table, paths, schema, colmap))
    val dd = dataDir(table).toString
    if (graft.operators.Layout.statsManifestCols(spark, dd).isEmpty) {
      graft.operators.Layout.lastStatsPruned = None
      return rd(files)
    }
    val live = files.map(graft.operators.Layout.canonFile)
    val chosen = graft.operators.Layout.selectByStats(spark, dd,
      ranges.map { case (c, lo, hi) => (physName(colmap, c), lo, hi) }, live)
    graft.operators.Layout.lastStatsPruned =
      Some((chosen.length, live.length))
    if (chosen.isEmpty) rd(files).limit(0) else rd(chosen)
  }

  // ------------------------------------------------------------------
  // Per-file Bloom file-skipping index (point lookups)
  // ------------------------------------------------------------------

  private def bloomDir(table: String, column: String) =
    new Path(dataDir(table), s"_graft_bloom_$column")

  /** Spec hook: (files read, files total) of the last Bloom-pruned
    * read; None when no index covered the read (full scan).
    */
  @volatile var lastBloomPruned: Option[(Int, Int)] = None

  /** Columns with a per-file Bloom sidecar (one `listStatus` of the
    * data dir) — the maintenance policy's discovery hook.
    */
  def bloomIndexedColumns(spark: SparkSession, table: String): Seq[String] = {
    val dd = dataDir(table)
    val f = fs(spark, dd)
    if (!f.exists(dd)) Nil
    else f.listStatus(dd).filter(_.isDirectory)
      .map(_.getPath.getName)
      .filter(_.startsWith("_graft_bloom_"))
      .map(_.stripPrefix("_graft_bloom_")).toSeq.sorted
  }

  /** Incrementally extend the table's per-FILE Bloom index on `column`
    * — the Delta bloom-filter-index idea: min/max stats prune RANGE
    * reads but are useless for point lookups on a high-cardinality,
    * unclustered column (every file's [min,max] spans the key space);
    * a per-file Bloom of the column's hashed values lets the driver
    * skip files that certainly lack a probed key before a single
    * footer opens. One underscore-prefixed parquet sidecar per indexed
    * column (`data/_graft_bloom_<col>`), invisible to every data read.
    *
    * Incremental like [[extendStats]]: driven by the HEAD VERSION's
    * file list (never a directory listing — staged orphans stay out,
    * and a shallow clone's / in-place convert's FOREIGN refs index in),
    * scanning ONLY the column of the not-yet-covered files. Values
    * hash through `xxhash64` of the column's native type; the build is
    * ONE distributed aggregation (Spark's own BloomFilterAggregate,
    * map-side partial like any agg), ~1.2 KB/file per 1k expected
    * items at fpp 0.01. Returns files newly indexed.
    */
  def extendBloom(spark: SparkSession, table: String, column: String,
      fpp: Double = 0.01, expectedItemsPerFile: Long = 100000L): Int = {
    import org.apache.spark.sql.functions.{col, count, input_file_name,
      lit, xxhash64}
    require(fpp > 0 && fpp < 1, s"fpp $fpp out of (0, 1)")
    val head = currentVersion(spark, table)
    require(head > 0, s"no snapshot table at $table to index")
    val f = fs(spark, dataDir(table))
    val lines = manifestLines(spark, table, head)
    val files = filesOf(lines)
      .map(n => f.makeQualified(new Path(dataDir(table), n)).toString)
    require(files.nonEmpty, s"$table@v$head has no data files to index")
    // the sidecar reads footers: it keys the PHYSICAL column name
    val pc = physName(colmapOf(lines), column)
    val bd = bloomDir(table, pc)
    val existing =
      if (f.exists(bd))
        Some(spark.read.parquet(bd.toString).localCheckpoint(true))
      else None
    val rawKnown = existing
      .map(_.select("file").collect().map(_.getString(0)).toSeq)
      .getOrElse(Nil)
    val known = rawKnown.map(graft.operators.Layout.canonUri).toSet
    val liveCanon = files.map(graft.operators.Layout.canonFile).toSet
    // expire entries for files the head no longer references (a rewrite
    // replaced them) — the sidecar twin of pruneStatsManifestEntries;
    // pinned-version reads of those files simply fall back to "always
    // read", the same staleness contract as stats
    val dead = rawKnown
      .filterNot(r => liveCanon(graft.operators.Layout.canonUri(r)))
    val missing = files.map(graft.operators.Layout.canonFile)
      .filterNot(known)
    if (missing.isEmpty && dead.isEmpty) return 0
    val base = existing.map { e =>
      if (dead.isEmpty) e
      else e.filter(!org.apache.spark.sql.functions.col("file")
        .isInCollection(dead))
    }
    if (missing.isEmpty) {
      base.get.coalesce(1).write.mode("overwrite").parquet(bd.toString)
      return 0
    }
    // optimal bit count for the target fpp (standard Bloom sizing)
    val numBits = math.max(64L, math.ceil(
      -expectedItemsPerFile.toDouble * math.log(fpp) /
        (math.log(2) * math.log(2))).toLong)
    val rd = schemaOf(lines) match {
      case Some(s) => readFileList(spark, table,
        missing.toIndexedSeq,
        physSchema(
          types.StructType(s.fields.filter(_.name == column)),
          colmapOf(lines)))
      case None => spark.read.parquet(missing.toIndexedSeq: _*)
        .select(col(pc))
    }
    val bloomAgg = org.apache.spark.sql.graft.ColumnBridge.column(
      new org.apache.spark.sql.catalyst.expressions.aggregate
        .BloomFilterAggregate(
          org.apache.spark.sql.graft.ColumnBridge.expression(
            xxhash64(col(pc))),
          org.apache.spark.sql.catalyst.expressions.Literal(
            expectedItemsPerFile),
          org.apache.spark.sql.catalyst.expressions.Literal(numBits))
        .toAggregateExpression())
    val fresh = rd.groupBy(input_file_name().as("file"))
      .agg(bloomAgg.as("bloom"), count(lit(1)).as("rows"))
    base match {
      case Some(e) => e.unionByName(fresh).coalesce(1)
        .write.mode("overwrite").parquet(bd.toString)
      case None => fresh.coalesce(1)
        .write.mode("overwrite").parquet(bd.toString)
    }
    missing.size
  }

  /** Point-lookup read with the file list pre-pruned by the per-file
    * Bloom index: only files that MIGHT hold one of `keys` (plus files
    * the index does not cover yet) are opened —
    * `readPrunedByKeys(...).filter(col(c).isin(keys))` ≡
    * `read(...).filter(...)`, with the skip decided driver-side from
    * the sidecar (no false negatives by the Bloom contract; false
    * positives only cost an extra file read). Composes with snapshot
    * semantics exactly like [[readPruned]]: the candidate set is the
    * VERSION's file list, the declared schema applies, pending
    * tombstones filter, pinned versions stay prunable. Keys compare
    * after a cast to the column's declared type (hash equality needs
    * type equality), so pass keys whose string form round-trips.
    */
  def readPrunedByKeys(spark: SparkSession, table: String, column: String,
      keys: Seq[Any], version: Option[Long] = None): DataFrame = {
    val v = version.getOrElse(currentVersion(spark, table))
    val f = fs(spark, dataDir(table))
    val lines = manifestLines(spark, table, v)
    val files = filesOf(lines)
      .map(n => f.makeQualified(new Path(dataDir(table), n)).toString)
    if (files.isEmpty) return spark.emptyDataFrame
    val schema = schemaOf(lines)
    val colmap = colmapOf(lines)
    def rd(paths: Seq[String]) = applyTombstones(spark, table, lines,
      readWithSchema(spark, table, paths, schema, colmap))
    val pc = physName(colmap, column)
    val bd = bloomDir(table, pc)
    if (!f.exists(bd) || keys.isEmpty) {
      lastBloomPruned = None
      return rd(files)
    }
    // hash the probe keys EXACTLY like the build: xxhash64 over the
    // column's native type (one metadata-sized job)
    val colType = schema.flatMap(_.fields.find(_.name == column))
      .map(_.dataType)
      .getOrElse(rd(files.take(1)).schema(column).dataType)
    val canon = files.map(p => graft.operators.Layout.canonFile(p) -> p)
    val keep = bloomSurvivors(spark, table, pc, colType, keys,
      canon.map(_._1)).toSet
    val chosen = canon.collect { case (c, orig) if keep(c) => orig }
    lastBloomPruned = Some((chosen.size, files.size))
    if (chosen.isEmpty) rd(files).limit(0) else rd(chosen)
  }

  /** Canonical-URI subset of `live` that MIGHT hold at least one of
    * `keys` per the column's per-file Bloom sidecar. Files the sidecar
    * does not cover always survive (same staleness contract as stats);
    * no false negatives by the Bloom contract. `colType` is the
    * column's DECLARED type — probe keys hash through
    * `xxhash64(cast(key AS colType))`, exactly like the index build.
    */
  private def bloomSurvivors(spark: SparkSession, table: String,
      column: String, colType: types.DataType, keys: Seq[Any],
      live: Seq[String]): Seq[String] = {
    import org.apache.spark.sql.functions.{col, xxhash64}
    import spark.implicits._
    val bd = bloomDir(table, column)
    if (!fs(spark, dataDir(table)).exists(bd) || keys.isEmpty) return live
    val hashes = keys.map(_.toString).toDF("k")
      .select(xxhash64(col("k").cast(colType))).collect().map(_.getLong(0))
    val blooms = spark.read.parquet(bd.toString)
      .select("file", "bloom").collect()
      .map(r => graft.operators.Layout.canonUri(r.getString(0)) ->
        r.getAs[Array[Byte]]("bloom")).toMap
    live.filter { c =>
      blooms.get(c) match {
        case None => true // uncovered: always read (same as stats)
        case Some(bytes) =>
          val bf = org.apache.spark.util.sketch.BloomFilter.readFrom(
            new java.io.ByteArrayInputStream(bytes))
          hashes.exists(bf.mightContainLong)
      }
    }
  }

  /** Spec hook: (files chosen, files total) of the last DSv2 catalog
    * scan that consulted the sidecar indexes during filter pushdown
    * (sources/SnapshotCatalog.scala); None when the last catalog scan
    * planned without pushed filters.
    */
  @volatile var lastCatalogPruned: Option[(Int, Int)] = None

  /** Spec hook: (files kept, files candidate) of the last RUNTIME
    * re-prune — a broadcast-side join-key set pushed into a catalog
    * scan at execution time (SupportsRuntimeV2Filtering). None until
    * one fires.
    */
  @volatile var lastRuntimePruned: Option[(Int, Int)] = None

  /** Spec hook: (files kept, files candidate) of the last catalog scan
    * whose file list was TRUNCATED by a pushed LIMIT — the stats
    * sidecar's per-file row counts prove a prefix of files already
    * holds `limit` rows, so the rest are never opened. None until one
    * fires.
    */
  @volatile var lastLimitPruned: Option[(Int, Int)] = None

  /** Spec hook: (files kept, files candidate) of the last catalog scan
    * pruned by a pushed ORDER BY ... LIMIT (TopN): files provably
    * outranked by `limit` rows from better-bounded files are skipped.
    * None until one fires.
    */
  @volatile var lastTopNPruned: Option[(Int, Int)] = None

  /** Logical columns on which driver-side file skipping can act for
    * `table`: the declared partition column plus every stats-manifested
    * and Bloom-indexed column (sidecars key PHYSICAL names; the names
    * returned are logical). What the DSv2 catalog scan advertises as
    * its runtime-filter attributes — a join keyed on any of these can
    * push its broadcast-side key set back into the file list.
    */
  def prunableColumns(spark: SparkSession, table: String,
      colmap: Map[String, String],
      partition: Seq[(String, String)]): Seq[String] = {
    val physToLogical = colmap.map(_.swap)
    val stats = graft.operators.Layout
      .statsManifestCols(spark, dataDir(table).toString).getOrElse(Nil)
    val bloom = bloomIndexedColumns(spark, table)
    (partition.map(_._1) ++
      (stats ++ bloom).map(p => physToLogical.getOrElse(p, p))).distinct
  }

  /** Inclusive upper bound for the `LIKE 'p%'` range: the prefix with
    * its last bumpable char incremented and the tail dropped — every
    * string starting with `p` sorts strictly below it. None (unbounded)
    * when any char sits at or above the surrogate range, where a UTF-16
    * unit bump is not the code-point successor.
    */
  private def prefixUpperBound(p: String): Option[String] = {
    if (p.exists(_ >= 0xD800.toChar)) return None
    val i = p.lastIndexWhere(_ < 0xD7FF.toChar)
    if (i < 0) None
    else Some(p.substring(0, i) + (p.charAt(i) + 1).toChar)
  }

  /** Driver-side file skipping from PUSHED-DOWN source filters — the
    * same prune [[readPruned]] / [[readPrunedByKeys]] perform, but
    * triggered by plain catalog SQL (`SELECT ... FROM snap.t WHERE k =
    * 42`, sources/SnapshotCatalog.scala) with zero new syntax: the
    * ScanBuilder hands the pushed conjuncts here before Spark's parquet
    * scan is constructed. `names` are the scanned VERSION's manifest
    * entries; returns the surviving subset, order preserved.
    *
    * Sound by construction — the selection can only FALSE-POSITIVE
    * (open an extra file), never drop a matching row: range conjuncts
    * (=, <, <=, >, >=) prune via the `_graft_stats` manifest with
    * NULL-stats/uncovered files always kept, equality/IN probes on a
    * Bloom-indexed column prune via the per-file sidecar (no false
    * negatives by contract), `LIKE 'p%'` prunes as the
    * range [p, bumped-prefix) on string stats, and every other shape —
    * OR, NOT, other string ops, unindexed columns, types whose
    * driver-side rendering differs from the stats encoding
    * (timestamps) — keeps its files. Spark
    * re-applies every pushed filter post-scan regardless.
    */
  def pruneFilesByFilters(spark: SparkSession, table: String,
      names: Seq[String], schema: Option[types.StructType],
      filters: Seq[org.apache.spark.sql.sources.Filter],
      colmap: Map[String, String] = Map.empty,
      partition: Seq[(String, String)] = Nil): Seq[String] = {
    import org.apache.spark.sql.sources._
    if (names.isEmpty || filters.isEmpty) return names
    val dd = dataDir(table).toString
    // sidecars key PHYSICAL names; filters speak logical
    val statsCols0 = graft.operators.Layout.statsManifestCols(spark, dd)
      .getOrElse(Nil).toSet
    val bloomCols0 = bloomIndexedColumns(spark, table).toSet
    def statsCols(c: String) = statsCols0(physName(colmap, c))
    def bloomCols(c: String) = bloomCols0(physName(colmap, c))
    if (statsCols0.isEmpty && bloomCols0.isEmpty && partition.isEmpty)
      return names
    val (canon, byCanon) = canonCandidates(spark, table, names)
    // point-set probes compare only where the stats manifest's typed
    // encoding is exact driver-side (numerics as double, strings and
    // ISO dates as strings); timestamps render differently → no prune
    def statsComparable(vs: Seq[Any]): Option[Seq[Any]] = {
      val v = vs.filter(_ != null)
      if (v.nonEmpty && v.forall(x => x.isInstanceOf[Number] ||
          x.isInstanceOf[String] || x.isInstanceOf[java.sql.Date]))
        Some(v)
      else None
    }
    var live = canon
    // DIRECTORY leg: the declared partition transform prunes canonical
    // URIs too (the `__gp=` component survives qualification)
    def partBounds(c: String, lo: Option[Any], hi: Option[Any]): Unit =
      if (partition.exists(_._1 == c) && live.nonEmpty)
        live = pruneEntriesByPartition(partition, Seq((c, lo, hi)), live,
          schema)
    def partAnyOf(c: String, vs: Seq[Any]): Unit =
      partition.zipWithIndex
        .find(p => p._1._1 == c && live.nonEmpty)
        .foreach { case ((_, kind), level) =>
          val nn = vs.filter(_ != null)
          // bucket rendering is type-strict (hashInt vs hashLong) — a
          // probe class mismatching the declared column type must keep
          // everything, never hash into the wrong bucket
          val dt = schema.flatMap(_.fields.find(_.name == c))
            .map(_.dataType)
          if (bucketModulus(kind).isEmpty ||
              nn.forall(bucketProbeTypeOk(dt, _))) {
            val rendered = nn.map(partProbeValue(kind, _))
            // one unrenderable member means any entry might hold it
            if (rendered.nonEmpty && rendered.forall(_.isDefined)) {
              val set = rendered.flatten.toSet
              live = live.filter(e => partValueAt(e, level).forall(v =>
                v == NullPartition || set.contains(v)))
            }
          }
        }
    def statsBounds(c: String, lo: Option[Any], hi: Option[Any]): Unit = {
      partBounds(c, lo, hi)
      if (statsCols(c) && live.nonEmpty)
        live = graft.operators.Layout.selectByStatsBounds(spark, dd,
          physName(colmap, c), lo, hi, live)
    }
    def bloomProbe(c: String, vs: Seq[Any]): Unit =
      if (bloomCols(c) && live.nonEmpty) {
        val keys = vs.filter(_ != null)
        val colType = schema.flatMap(_.fields.find(_.name == c))
          .map(_.dataType)
        if (keys.nonEmpty && colType.isDefined)
          live = bloomSurvivors(spark, table, physName(colmap, c),
            colType.get, keys, live)
      }
    def walk(f: Filter): Unit = f match {
      case EqualTo(a, v) if v != null =>
        statsBounds(a, Some(v), Some(v)); bloomProbe(a, Seq(v))
      case EqualNullSafe(a, v) if v != null =>
        statsBounds(a, Some(v), Some(v)); bloomProbe(a, Seq(v))
      case In(a, vs) =>
        partAnyOf(a, vs.toSeq)
        if (statsCols(a) && live.nonEmpty)
          statsComparable(vs.toSeq).foreach { v =>
            live = graft.operators.Layout.selectByStatsAnyOf(spark, dd,
              physName(colmap, a), v, live)
          }
        bloomProbe(a, vs.toSeq)
      case GreaterThan(a, v) => statsBounds(a, Some(v), None)
      case GreaterThanOrEqual(a, v) => statsBounds(a, Some(v), None)
      case LessThan(a, v) => statsBounds(a, None, Some(v))
      case LessThanOrEqual(a, v) => statsBounds(a, None, Some(v))
      case StringStartsWith(a, p) if p.nonEmpty =>
        // LIKE 'p%' is the range [p, nextPrefix(p)): every match is
        // ≥ p and < the prefix with its last char bumped, so the stats
        // sidecar's string min/max prune prefix probes file-level.
        // Restricted to strings below the surrogate range — bumping a
        // UTF-16 unit into (or past) a surrogate would not be the
        // code-point successor UTF8String's byte order assumes.
        statsBounds(a, Some(p), prefixUpperBound(p))
      case And(l, r) => walk(l); walk(r)
      case _ => () // OR / NOT / string ops / unknown: keep (sound)
    }
    filters.foreach(walk)
    live.map(byCanon)
  }

  // ------------------------------------------------------------------
  // Exactly-once streaming commits
  // ------------------------------------------------------------------

  /** Stream watermarks recorded in a version's manifest:
    * streamId → highest committed batch id. Every commit carries the
    * head's marks forward (plus its own, for stream commits), so the
    * HEAD manifest always holds every stream's latest watermark.
    */
  private def streamMarksAt(spark: SparkSession, table: String,
      version: Long): Map[String, Long] =
    marksOf(manifestLines(spark, table, version))

  /** Highest batch id this stream has committed — ONE head-manifest read
    * (marks are carried forward by every commit), so the lookup is O(1)
    * and immune to manifest vacuuming. Falls back to a downward scan of
    * the still-retained manifests for tables whose history predates the
    * carry-forward (legacy marks live only in the claiming commit's
    * manifest). None when the stream never committed within retention.
    */
  def lastCommittedBatch(spark: SparkSession, table: String,
      streamId: String): Option[Long] = {
    val head = currentVersion(spark, table)
    if (head == 0) return None
    streamMarksAt(spark, table, head).get(streamId).orElse {
      val dir = manifestDir(table)
      fs(spark, dir).listStatus(dir).map(_.getPath.getName)
        .filter(_.endsWith(".manifest")).map(versionOf)
        .filter(_ < head).sorted(Ordering[Long].reverse).iterator
        .map(v => streamMarksAt(spark, table, v).get(streamId))
        .collectFirst { case Some(bid) => bid }
    }
  }

  /** EXACTLY-ONCE streaming append: the foreachBatch sink body for a
    * snapshot table. Structured Streaming replays a micro-batch (same
    * `batchId`) after any restart whose checkpoint predates the sink's
    * side effect; this commit is idempotent under that replay because the
    * (streamId, batchId) watermark rides IN the manifest it claims —
    * state and data commit atomically, the classic transactional-sink
    * recipe. A replayed or raced batch (a zombie executor of the same
    * stream finishing late) detects `batchId <= lastCommittedBatch`,
    * deletes its orphaned staged files, and returns without committing.
    * `batchId` must be monotonic per stream (Structured Streaming's
    * contract). Returns (head version, whether THIS call committed).
    */
  def commitStreamAppend(spark: SparkSession, batch0: DataFrame,
      table: String, streamId: String, batchId: Long,
      maxRetries: Int = 10): (Long, Boolean) = {
    require(!streamId.contains("\n"), "streamId must be single-line")
    if (lastCommittedBatch(spark, table, streamId).exists(_ >= batchId))
      return (currentVersion(spark, table), false)
    // fail-fast schema + constraint + tombstone checks before staging
    // (see commit)
    var validated = manifestLines(spark, table, currentVersion(spark, table))
    val batch = fillWriteDefaults(batch0, schemaOf(validated))
    evolveSchema(schemaOf(validated), batch.schema)
    refuseTombstonedKeys(spark, table, validated, batch)
    refuseDroppedColumns(batch, table, validated)
    enforceChecks(batch, checksOf(validated), table, schemaOf(validated))
    val stagedColmap = colmapOf(validated)
    val stagedPart = partRawOf(validated)
    val newFiles = stageData(spark, batch, table, stagedColmap,
      partitionsOf(validated))
    raceHookForTests()
    val f = fs(spark, dataDir(table))
    var attempt = 0
    while (attempt < maxRetries) {
      val head = currentVersion(spark, table)
      val lines = manifestLines(spark, table, head)
      // TOCTOU guard (see commit): re-validate against tombstones,
      // constraints, or a schema evolution that landed after the
      // pre-staging checks ran — any refusal reclaims the staged files
      val evolved =
        try {
          if (tombstonesOf(lines) != tombstonesOf(validated) ||
              tombstoneColOf(lines) != tombstoneColOf(validated))
            refuseTombstonedKeys(spark, table, lines, batch)
          if (checksOf(lines) != checksOf(validated))
            enforceChecks(batch, checksOf(lines), table, schemaOf(lines))
          refuseDroppedColumns(batch, table, lines)
          if (colmapOf(lines) != stagedColmap)
            throw new IllegalStateException(
              s"stream append to $table raced a concurrent RENAME " +
                "COLUMN — the staged files carry stale physical names")
          if (partRawOf(lines) != stagedPart)
            throw new IllegalStateException(
              s"stream append to $table raced a partition-transform " +
                "change — staged entries carry stale prefixes")
          evolveSchema(schemaOf(lines), batch.schema)
        } catch { case e: Throwable =>
          newFiles.foreach(n => f.delete(new Path(dataDir(table), n), false))
          throw e
        }
      validated = lines
      val marks = marksOf(lines)
      // head-mark fast path; the lastCommittedBatch fallback covers
      // legacy tables whose mark predates the carry-forward
      if (marks.get(streamId)
          .orElse(lastCommittedBatch(spark, table, streamId))
          .exists(_ >= batchId)) {
        // a twin of this very batch won the race while we staged: our
        // rows are already in the table once — never land them twice
        newFiles.foreach(n => f.delete(new Path(dataDir(table), n), false))
        return (head, false)
      }
      val content = contentOf(
        Some(evolved),
        marks + (streamId -> batchId), filesOf(lines) ++ newFiles,
        "streamAppend", checksOf(lines),
        tombstonesOf(lines), tombstoneColOf(lines), droppedOf(lines),
        colmapOf(lines), partRawOf(lines))
      if (claimManifest(spark, table, head + 1, content))
        return (head + 1, true)
      attempt += 1 // lost to an unrelated writer: re-read head and retry
    }
    throw new IllegalStateException(
      s"stream commit $streamId/$batchId to $table failed after " +
        s"$maxRetries attempts")
  }

  /** The claim half of the NATIVE streaming sink
    * (`writeStream.toTable("snap.t")`, sources/SnapshotStreamingWrite
    * .scala): executors already wrote `staged` parquet files (unique
    * names under `data/`, unreferenced — invisible to readers), and the
    * driver's epoch commit publishes them under the same
    * (streamId, batchId) watermark semantics as [[commitStreamAppend]]
    * — state and data in ONE atomic manifest claim, idempotent under
    * Structured Streaming's restart replay. Validation (schema
    * evolution, CHECK constraints, tombstone refusal, dropped-name
    * ledger) runs by READING THE STAGED FILES BACK — a distributed scan
    * of only the new batch, O(batch) at any table size; any refusal
    * deletes the staged files before surfacing.
    *
    * `stagedColmap` is the column mapping the WRITERS staged under
    * (fetched when the write was built): a rename that lands between
    * build and commit refuses — the staged files carry stale physical
    * names. Likewise `stagedPartition` (the raw `#partition:` header at
    * build): prefixed entries staged under a transform that changed in
    * between would have their dir values misinterpreted by every
    * pruner, so they refuse; FLAT entries are sound under any declared
    * transform (every pruner always reads them) and commit regardless.
    * DEFAULTed columns must be present in the staged schema — the data
    * is already on disk, so the sink cannot materialize defaults; a
    * missing defaulted column refuses loudly at commit.
    */
  def commitStagedStreamAppend(spark: SparkSession, table: String,
      staged: Seq[String], stagedColmap: Map[String, String],
      streamId: String, batchId: Long,
      stagedPartition: Option[String] = None,
      maxRetries: Int = 10): (Long, Boolean) = {
    require(!streamId.contains("\n"), "streamId must be single-line")
    if (staged.isEmpty) return (currentVersion(spark, table), false)
    val f = fs(spark, dataDir(table))
    def dropStaged(): Unit =
      staged.foreach(n => f.delete(new Path(dataDir(table), n), false))
    if (lastCommittedBatch(spark, table, streamId).exists(_ >= batchId)) {
      dropStaged(); return (currentVersion(spark, table), false)
    }
    val paths = staged.map(n => new Path(dataDir(table), n).toString)
    // the staged files hold PHYSICAL names; validation (and schema
    // evolution) speak logical — read back through the writers' colmap
    val physToLogical = stagedColmap.map(_.swap)
    val read0 = spark.read.parquet(paths: _*)
    val batch =
      if (physToLogical.isEmpty) read0
      else read0.withColumnsRenamed(physToLogical.filter {
        case (p, l) => p != l && read0.columns.contains(p)
      })
    def validate(lines: Seq[String]): types.StructType =
      try {
        schemaOf(lines).foreach { s =>
          val missing = s.fields
            .filter(fl => fl.metadata.contains(CurrentDefaultKey) &&
              !batch.columns.contains(fl.name)).map(_.name)
          require(missing.isEmpty,
            s"stream batch omits DEFAULTed column(s) " +
              s"${missing.mkString(", ")} of $table — the native sink " +
              "cannot materialize defaults into already-written files; " +
              "select them explicitly (or sink via foreachBatch + " +
              "commitStreamAppend)")
        }
        refuseTombstonedKeys(spark, table, lines, batch)
        refuseDroppedColumns(batch, table, lines)
        enforceChecks(batch, checksOf(lines), table, schemaOf(lines))
        if (colmapOf(lines) != stagedColmap)
          throw new IllegalStateException(
            s"stream append to $table raced a concurrent RENAME COLUMN " +
              "— the staged files carry stale physical names")
        if (staged.exists(_.contains(PartPrefix)) &&
            partRawOf(lines) != stagedPartition)
          throw new IllegalStateException(
            s"stream append to $table raced a partition-transform " +
              "change — the staged entries carry stale dir prefixes")
        evolveSchema(schemaOf(lines), batch.schema)
      } catch { case e: Throwable => dropStaged(); throw e }
    var attempt = 0
    while (attempt < maxRetries) {
      val head = currentVersion(spark, table)
      val lines = manifestLines(spark, table, head)
      val evolved = validate(lines)
      val marks = marksOf(lines)
      if (marks.get(streamId)
          .orElse(lastCommittedBatch(spark, table, streamId))
          .exists(_ >= batchId)) {
        dropStaged(); return (head, false) // a twin won while we validated
      }
      if (claimManifest(spark, table, head + 1, contentOf(
          Some(evolved), marks + (streamId -> batchId),
          filesOf(lines) ++ staged, "streamAppend", checksOf(lines),
          tombstonesOf(lines), tombstoneColOf(lines), droppedOf(lines),
          colmapOf(lines), partRawOf(lines))))
        return (head + 1, true)
      attempt += 1
    }
    dropStaged()
    throw new IllegalStateException(
      s"stream commit $streamId/$batchId to $table failed after " +
        s"$maxRetries attempts")
  }

  /** GROUP-REPLACE commit — the protocol seat for STOCK Spark row-level
    * SQL (`UPDATE` / `MERGE INTO` / copy-on-write `DELETE` through the
    * catalog's SupportsRowLevelOperations face, sources/
    * SnapshotRowLevel.scala): the already-staged files REPLACE exactly
    * `replaced` (the files the operation's scan read — Spark rewrote
    * their surviving rows), every other file carries by name, one
    * atomic claim publishes. Validation mirrors the staged stream
    * commit: checks/tombstoned-keys/dropped-columns enforced on the
    * staged rows read back through the writers' colmap; a racing
    * RENAME or partition-transform change refuses (stale physical
    * names / dir values).
    *
    * CONFLICTS refuse, never merge: if any replaced file is no longer
    * referenced at claim time (a concurrent rewrite/delete/OPTIMIZE
    * churned it) or pending tombstones appeared since the scan, the
    * staged files are reclaimed and a ConcurrentModificationException
    * surfaces — the Delta/Iceberg write-conflict discipline. Racing
    * APPENDS are fine (their files are not replaced; the operation ran
    * on its snapshot — ordinary snapshot isolation).
    */
  def commitReplaceEntries(spark: SparkSession, table: String,
      replaced: Seq[String], staged: Seq[String],
      stagedColmap: Map[String, String],
      stagedPartition: Option[String] = None,
      maxRetries: Int = 10): Long = {
    val f = fs(spark, dataDir(table))
    def dropStaged(): Unit =
      staged.foreach(n => f.delete(new Path(dataDir(table), n), false))
    if (replaced.isEmpty && staged.isEmpty)
      return currentVersion(spark, table) // nothing scanned, nothing written
    val replacedSet = replaced.toSet
    def validate(lines: Seq[String]): Option[types.StructType] =
      try {
        if (colmapOf(lines) != stagedColmap)
          throw new IllegalStateException(
            s"row-level write to $table raced a concurrent RENAME " +
              "COLUMN — the staged files carry stale physical names")
        if (staged.exists(_.contains(PartPrefix)) &&
            partRawOf(lines) != stagedPartition)
          throw new IllegalStateException(
            s"row-level write to $table raced a partition-transform " +
              "change — the staged entries carry stale dir prefixes")
        if (tombstonesOf(lines).nonEmpty)
          throw new java.util.ConcurrentModificationException(
            s"row-level write to $table raced a lazy DELETE — pending " +
              "tombstones landed after the operation's scan")
        if (staged.isEmpty) schemaOf(lines) // all scanned rows deleted
        else {
          val paths = staged.map(n => new Path(dataDir(table), n).toString)
          val physToLogical = stagedColmap.map(_.swap)
          val read0 = spark.read.parquet(paths: _*)
          val batch =
            if (physToLogical.isEmpty) read0
            else read0.withColumnsRenamed(physToLogical.filter {
              case (p, l) => p != l && read0.columns.contains(p)
            })
          refuseDroppedColumns(batch, table, lines)
          enforceChecks(batch, checksOf(lines), table, schemaOf(lines))
          Some(evolveSchema(schemaOf(lines), batch.schema))
        }
      } catch { case e: Throwable => dropStaged(); throw e }
    var attempt = 0
    while (attempt < maxRetries) {
      val head = currentVersion(spark, table)
      val lines = manifestLines(spark, table, head)
      val files = filesOf(lines)
      val gone = replaced.filterNot(files.toSet)
      if (gone.nonEmpty) {
        dropStaged()
        throw new java.util.ConcurrentModificationException(
          s"row-level write to $table conflicts with a concurrent " +
            s"commit: ${gone.size} of the ${replaced.size} scanned " +
            "file(s) are no longer referenced at the head — re-run the " +
            "statement against the new snapshot")
      }
      val evolved = validate(lines)
      if (claimManifest(spark, table, head + 1, contentOf(
          evolved, marksOf(lines),
          files.filterNot(replacedSet) ++ staged, "replaceData",
          checksOf(lines), tombstonesOf(lines), tombstoneColOf(lines),
          droppedOf(lines), colmapOf(lines), partRawOf(lines))))
        return head + 1
      attempt += 1
    }
    dropStaged()
    throw new IllegalStateException(
      s"row-level replace on $table failed after $maxRetries attempts")
  }

  /** RESTORE: roll the table back to `toVersion`'s state as a NEW commit
    * — the time-travel undo (Delta's RESTORE TABLE). ZERO-COPY: the new
    * manifest re-references `toVersion`'s still-retained data files by
    * name; no bytes move, and a later vacuum keeps them because the head
    * references them. History is preserved (the bad commits stay
    * readable via time travel until vacuumed); the restore itself is one
    * more optimistic manifest claim, so racing writers serialize.
    *
    * Stream watermarks are CARRIED FROM THE HEAD, not rewound: a
    * restored table must not re-land stream batches it already
    * committed (exactly-once survives the undo); re-ingesting rolled-back
    * stream data is a new stream id's job. Throws when `toVersion` was
    * vacuumed away. Returns the new head version.
    */
  def commitRestore(spark: SparkSession, table: String, toVersion: Long,
      maxRetries: Int = 10): Long = {
    require(toVersion >= 1, s"cannot restore to v$toVersion")
    require(hasVersion(spark, table, toVersion),
      s"version $toVersion of $table is not retained (vacuumed)")
    val target = manifestLines(spark, table, toVersion)
    var attempt = 0
    while (attempt < maxRetries) {
      val head = currentVersion(spark, table)
      if (head == toVersion) return head // already that state
      val headLines = manifestLines(spark, table, head)
      // marks AND constraints carry from the pre-restore head: the undo
      // rewinds DATA, not ingestion state or declared policy (restored
      // rows predating a constraint are an operator decision — commits
      // after the restore enforce as usual)
      // the target's tombstones are DATA state — restored with its files
      // (a rollback past a lazy delete resurrects; a rollback INTO a
      // pending-tombstone state keeps those rows logically deleted)
      // the dropped-name ledger is DATA state like tombstones: restored
      // with the target's files (a pre-drop target legitimately has the
      // column back; a post-drop target keeps its names refused)
      if (claimManifest(spark, table, head + 1,
          contentOf(schemaOf(target), marksOf(headLines), filesOf(target),
            "restore", checksOf(headLines),
            tombstonesOf(target), tombstoneColOf(target),
            droppedOf(target), colmapOf(target), partRawOf(target))))
        return head + 1
      attempt += 1
    }
    throw new IllegalStateException(
      s"restore of $table to v$toVersion failed after $maxRetries attempts")
  }

  /** SHALLOW CLONE: create `dst` as a ZERO-COPY snapshot of `src` at
    * `version` (default: head) — Delta's `CREATE TABLE ... SHALLOW
    * CLONE` semantics. The clone's v1 manifest references the source's
    * data files by FULLY-QUALIFIED URI; no data bytes move, so cloning
    * a 100 TB table is O(manifest) metadata work — the instant
    * dev/test/experiment fork a warehouse runs dozens of times a day
    * where a deep copy would be an hours-long job.
    *
    * Foreign references live as first-class file entries (any entry
    * containing `/` resolves as its own URI; bare names stay relative to
    * the table's `data/` dir — Hadoop's `Path(parent, child)` resolution
    * makes every existing read/probe/census site handle both forms).
    * Divergence is natural copy-on-write: the clone's DML rewrites ONLY
    * the foreign files physically holding touched keys into the clone's
    * own `data/` dir (the [[cowApply]] carry logic treats foreign names
    * like any other), appends land locally, and OPTIMIZE localizes
    * everything it rewrites. The clone's VACUUM can never delete source
    * bytes (it reconciles only its OWN `data/` listing), and a
    * clone-of-a-clone carries grandparent references verbatim.
    *
    * Carried state: declared schema, CHECK constraints, stream marks
    * (a stream switching its sink to the clone must not re-land batches
    * the source already committed — same rationale as [[commitRestore]]),
    * and pending lazy-delete tombstones — their tiny key-list sidecars
    * are COPIED (not referenced) so the source's OPTIMIZE/VACUUM
    * materializing its own tombstones can't strand the clone's
    * merge-on-read anti-join. The documented shallow-clone hazard is the
    * same as Delta's: a VACUUM on the SOURCE that expires the cloned
    * version's files breaks the clone — deep-copy (CTAS) when the source
    * retention isn't under your control.
    */
  def cloneTable(spark: SparkSession, src: String, dst: String,
      version: Option[Long] = None): Long = {
    val srcV = version.getOrElse(currentVersion(spark, src))
    require(srcV >= 1, s"cannot clone $src: no committed version")
    require(hasVersion(spark, src, srcV),
      s"version $srcV of $src is not retained (vacuumed)")
    require(currentVersion(spark, dst) == 0,
      s"clone target $dst already exists (head v${currentVersion(spark, dst)})")
    require(new Path(src).toString != new Path(dst).toString,
      s"clone target equals source: $src")
    val lines = manifestLines(spark, src, srcV)
    val f = fs(spark, dataDir(src))
    val refs = filesOf(lines).map { n =>
      // foreign = qualified URI or absolute path; a PARTITIONED relative
      // entry (`__gp=.../f.parquet`) is local and must qualify like a
      // bare name (two-arg Path resolves the subdir)
      if (n.contains(":/") || n.startsWith("/")) n
      else f.makeQualified(new Path(dataDir(src), n)).toString
    }
    val tombs = tombstonesOf(lines)
    if (tombs.nonEmpty) {
      val td = tombstoneDir(dst)
      val fd = fs(spark, td)
      fd.mkdirs(td)
      tombs.foreach { n =>
        org.apache.hadoop.fs.FileUtil.copy(f, new Path(tombstoneDir(src), n),
          fd, new Path(td, n), false, true,
          spark.sparkContext.hadoopConfiguration)
      }
    }
    require(claimManifest(spark, dst, 1L,
      contentOf(schemaOf(lines), marksOf(lines), refs, "clone",
        checksOf(lines), tombs, tombstoneColOf(lines), droppedOf(lines),
        colmapOf(lines), partRawOf(lines))),
      s"clone target $dst already has a v1 manifest")
    1L
  }

  /** IN-PLACE conversion of an existing parquet directory into a
    * snapshot table — Delta's `CONVERT TO DELTA` verb, zero-copy: the
    * claimed v1 manifest references the directory's own files by
    * qualified URI (the same foreign-reference machinery as
    * [[cloneTable]]), so converting a 100 TB landing area is O(files)
    * driver-side metadata — one listing, one manifest write, no data
    * reads beyond a footer sample for the declared schema.
    *
    * The table root IS the directory: manifests land in
    * `<dir>/_manifests`, later appends/rewrites stage into
    * `<dir>/data/`, and the protocol surface (time travel, DML,
    * OPTIMIZE, streaming, catalog reads) applies from the first commit.
    * The imported files stay under the CALLER's ownership: VACUUM
    * reconciles only the table's own `data/` dir, so it never deletes
    * them even after an OPTIMIZE stops referencing them — reclaiming
    * the originals after a full rewrite is the operator's explicit
    * decision, exactly like the shallow-clone contract. Refuses when
    * the directory already has a manifest log (idempotence belongs to
    * the caller: a re-run must not silently fork history). Returns
    * (version 1, files referenced).
    */
  def convertToSnapshot(spark: SparkSession, dir: String): (Long, Int) = {
    val d = new Path(dir)
    val f = fs(spark, d)
    require(f.exists(d), s"CONVERT TO SNAPSHOT: $dir does not exist")
    require(currentVersion(spark, dir) == 0,
      s"$dir is already a snapshot table " +
        s"(head v${currentVersion(spark, dir)})")
    val files = f.listStatus(d).filter(_.isFile)
      .map(s => f.makeQualified(s.getPath).toString)
      .filter(_.endsWith(".parquet")).sorted.toSeq
    require(files.nonEmpty, s"CONVERT TO SNAPSHOT: no .parquet files in $dir")
    val schema = spark.read.parquet(dir).schema
    require(claimManifest(spark, dir, 1L,
      contentOf(Some(schema), Map.empty, files, "convert")),
      s"$dir claimed a v1 manifest concurrently")
    (1L, files.size)
  }

  /** Idempotent bulk file loading — `COPY INTO` (the Delta/Snowflake
    * ingest verb): load every data file under `srcDir` that this table
    * has NOT already loaded, as ONE commit. Idempotence state is a
    * LOAD MARK per source file (`copy:<qualified-uri>` in the manifest's
    * mark ledger, the same atomically-carried channel as stream
    * watermarks — state and data commit in one claim, so a crashed or
    * re-run COPY INTO never double-loads). Re-running against an
    * unchanged directory is a metadata-only no-op; dropping new files in
    * and re-running loads ONLY the new files — the poor-man's ingest
    * loop (`cron` + object-store landing dir) a warehouse runs where a
    * full streaming pipeline is overkill. `force=true` reloads every
    * listed file regardless of marks (Delta's `FORCE = true`).
    *
    * The listing is one driver-side `listStatus` (O(landing-dir files),
    * no data reads for the decision); loaded bytes are read through the
    * normal staging path so schema evolution, CHECK constraints, and
    * tombstone refusal apply exactly as for any append. Returns
    * (committed version, files loaded, rows loaded) — version is the
    * unchanged head when nothing was new.
    */
  def commitCopyInto(spark: SparkSession, table: String, srcDir: String,
      format: String = "parquet", force: Boolean = false,
      maxRetries: Int = 10): (Long, Int, Long) = {
    val fmt = format.toLowerCase(java.util.Locale.ROOT)
    require(fmt == "parquet" || fmt == "csv",
      s"COPY INTO supports FILEFORMAT parquet|csv, got $format")
    val sd = new Path(srcDir)
    val sf = fs(spark, sd)
    require(sf.exists(sd), s"COPY INTO source $srcDir does not exist")
    val ext = "." + fmt
    val listed = sf.listStatus(sd).filter(_.isFile)
      .map(s => sf.makeQualified(s.getPath).toString)
      .filter(_.endsWith(ext)).sorted.toSeq
    def markOf(uri: String) = s"copy:$uri"
    def pending(marks: Map[String, Long]): Seq[String] =
      if (force) listed else listed.filterNot(u => marks.contains(markOf(u)))
    val head0 = currentVersion(spark, table)
    val lines0 = if (head0 == 0) Nil else manifestLines(spark, table, head0)
    val todo0 = pending(marksOf(lines0))
    if (todo0.isEmpty) return (head0, 0, 0L)
    def readSrc(uris: Seq[String]): DataFrame = {
      val base = fmt match {
        case "parquet" => spark.read.parquet(uris: _*)
        case _ => spark.read.option("header", "true")
          .option("inferSchema", "true").csv(uris: _*)
      }
      // up-cast shared columns whose LANDED type is narrower than the
      // declared one (CSV inference reads 20 as int into a long column;
      // a narrow parquet drop is the same case) — the batch lands in the
      // declared type, and every OTHER mismatch still refuses in the
      // commit loop's evolveSchema (COPY INTO is an append, not a
      // schema-change side door). New columns pass through and evolve.
      schemaOf(lines0) match {
        case Some(s) =>
          base.select(base.columns.toIndexedSeq.map { c =>
            s.fields.find(_.name == c) match {
              case Some(fld) if base.schema(c).dataType != fld.dataType &&
                  widens(base.schema(c).dataType, fld.dataType) =>
                org.apache.spark.sql.functions.col(c)
                  .cast(fld.dataType).as(c)
              case _ => org.apache.spark.sql.functions.col(c)
            }
          }: _*)
        case _ => base
      }
    }
    var validated = lines0
    val batch = fillWriteDefaults(readSrc(todo0), schemaOf(validated))
    evolveSchema(schemaOf(validated), batch.schema)
    refuseTombstonedKeys(spark, table, validated, batch)
    refuseDroppedColumns(batch, table, validated)
    enforceChecks(batch, checksOf(validated), table, schemaOf(validated))
    val rows = batch.count()
    val stagedColmap = colmapOf(validated)
    val stagedPart = partRawOf(validated)
    val newFiles = stageData(spark, batch, table, stagedColmap,
      partitionsOf(validated))
    raceHookForTests()
    val f = fs(spark, dataDir(table))
    def dropStaged(): Unit =
      newFiles.foreach(n => f.delete(new Path(dataDir(table), n), false))
    var attempt = 0
    while (attempt < maxRetries) {
      val head = currentVersion(spark, table)
      val lines = manifestLines(spark, table, head)
      val marks = marksOf(lines)
      // a racing COPY INTO of the same landing dir won while we staged:
      // if it loaded ANY of our files, re-landing this batch would
      // double-load those — drop the staged files and let the caller
      // re-run (the next run loads only what is still unmarked)
      if (!force && pending(marks) != todo0) {
        dropStaged()
        require(pending(marks).isEmpty,
          s"COPY INTO $table raced a concurrent load of $srcDir — " +
            "re-run to load the remaining files")
        return (head, 0, 0L)
      }
      val evolved =
        try {
          if (tombstonesOf(lines) != tombstonesOf(validated) ||
              tombstoneColOf(lines) != tombstoneColOf(validated))
            refuseTombstonedKeys(spark, table, lines, batch)
          if (checksOf(lines) != checksOf(validated))
            enforceChecks(batch, checksOf(lines), table, schemaOf(lines))
          refuseDroppedColumns(batch, table, lines)
          if (colmapOf(lines) != stagedColmap)
            throw new IllegalStateException(
              s"COPY INTO $table raced a concurrent RENAME COLUMN — " +
                "the staged files carry stale physical names; re-run")
          if (partRawOf(lines) != stagedPart)
            throw new IllegalStateException(
              s"COPY INTO $table raced a partition-transform change — " +
                "staged entries carry stale prefixes; re-run")
          evolveSchema(schemaOf(lines), batch.schema)
        } catch { case e: Throwable => dropStaged(); throw e }
      validated = lines
      val loadMarks = todo0.map(u => markOf(u) ->
        sf.getFileStatus(new Path(u)).getLen).toMap
      if (claimManifest(spark, table, head + 1,
          contentOf(Some(evolved), marks ++ loadMarks,
            filesOf(lines) ++ newFiles, "copyInto", checksOf(lines),
            tombstonesOf(lines), tombstoneColOf(lines), droppedOf(lines),
            colmapOf(lines), partRawOf(lines))))
        return (head + 1, todo0.size, rows)
      attempt += 1 // lost to an unrelated writer: re-read head and retry
    }
    throw new IllegalStateException(
      s"COPY INTO $table from $srcDir failed after $maxRetries attempts")
  }

  /** EXACTLY-ONCE replica maintenance: catch snapshot table `dst` up to
    * `src`'s current head in ONE sync, choosing the cheapest correct
    * transport per window — the cross-region / dev-mirror loop a 100 TB
    * warehouse runs on its change feed instead of re-copying tables:
    *
    *   - `append`  — the window added files and rewrote none: ship ONLY
    *     the added files' rows ([[incrementalRead]], IO ∝ delta) as a
    *     stream append;
    *   - `feed`    — the window rewrote files (delete/merge/OPTIMIZE
    *     landed): apply the row-exact change feed ([[rowDiff]], IO ∝
    *     churn on the source side) to the replica's own head via the
    *     file-granular CDC merge ([[cowApply]]) — only the REPLICA
    *     files physically holding changed keys rewrite, every other
    *     replica file carries by name, so destination IO tracks churn
    *     too (never replica size), and the replica's own pending
    *     lazy-delete tombstones survive the sync (minus keys the feed
    *     itself re-asserts);
    *   - `rebuild` — the replica lagged past the source's vacuum
    *     retention (its cursor's manifest is gone): one full re-mirror
    *     of the source head, then incremental syncs resume;
    *   - `noop`    — already caught up.
    *
    * The cursor is the source-head version, persisted as a STREAM MARK in
    * the replica's own manifest (streamId `replica:<src>`) — state and
    * data commit in one atomic claim, so a crashed or replayed sync
    * detects `srcHead <= mark` and returns without committing
    * (exactly-once, the same contract as [[commitStreamAppend]]). Feed
    * and rebuild syncs are computed against the replica's head and
    * recompute on a lost claim, like [[commitMerge]]. `keys` must be
    * unique per version (the rowDiff contract). Returns
    * (fromVersion, syncedThroughVersion, mode).
    */
  def syncReplica(spark: SparkSession, src: String, dst: String,
      keys: Seq[String], maxRetries: Int = 10): (Long, Long, String) = {
    import org.apache.spark.sql.functions._
    val sid = s"replica:${new Path(src).toString}"
    val srcHead = currentVersion(spark, src)
    val from = lastCommittedBatch(spark, dst, sid).getOrElse(0L)
    if (srcHead <= from) return (from, srcHead, "noop")
    val precise = hasVersion(spark, src, from)
    if (precise && removedFiles(spark, src, from, srcHead).isEmpty &&
        tombstonesOf(manifestLines(spark, src, from)) ==
          tombstonesOf(manifestLines(spark, src, srcHead))) {
      commitStreamAppend(spark, incrementalRead(spark, src, from, srcHead),
        dst, sid, srcHead, maxRetries)
      return (from, srcHead, "append")
    }
    val mode = if (precise) "feed" else "rebuild"
    val f = fs(spark, dataDir(dst))
    var attempt = 0
    while (attempt < maxRetries) {
      val head = currentVersion(spark, dst)
      val lines = manifestLines(spark, dst, head)
      val marks = marksOf(lines)
      if (marks.get(sid).orElse(lastCommittedBatch(spark, dst, sid))
          .exists(_ >= srcHead)) return (from, srcHead, "noop")
      val srcSchema = read(spark, src, Some(srcHead)).schema
      if (!precise || head == 0 || filesOf(lines).isEmpty) {
        // rebuild: one full re-mirror of the source head (the replica
        // lagged past retention, or is empty) — O(src) by definition
        val state = read(spark, src, Some(srcHead))
        val newFiles = stageData(spark, state, dst, Map.empty,
          partitionsOf(lines))
        if (claimManifest(spark, dst, head + 1,
            contentOf(Some(state.schema), marks + (sid -> srcHead),
              newFiles, "replicaSync", checksOf(lines),
              partition = partRawOf(lines))))
          return (from, srcHead, mode)
        // lost the race: computed against a stale replica head — drop
        // the orphans and recompute (single-writer replicas never hit
        // this)
        newFiles.foreach(n => f.delete(new Path(dataDir(dst), n), false))
      } else {
        // replica state evolves to the union of its own schema and the
        // source's (an evolution step's feed carries the new columns);
        // the feed applies as a file-granular CDC merge against the
        // replica's OWN files — staged bytes ∝ churn, not replica size
        val schema = evolveSchema(schemaOf(lines), srcSchema)
        val changes = rowDiff(spark, src, from, srcHead, keys)
          .filter(col("change_type") =!= "update_preimage")
          .withColumn("_deleted", col("change_type") === "delete")
          .drop("change_type")
        val cow = cowApply(spark, dst, lines, schema,
          conform(changes, types.StructType(schema.fields :+
            types.StructField("_deleted", types.BooleanType, false))),
          keys, deleteCol = Some("_deleted"))
        if (claimManifest(spark, dst, head + 1,
            contentOf(Some(schema), marks + (sid -> srcHead),
              cow.carried ++ cow.newFiles, "replicaSync", checksOf(lines),
              cow.tombstones, cow.tombstoneCol, droppedOf(lines),
              colmapOf(lines), partRawOf(lines))))
          return (from, srcHead, mode)
        cow.newFiles.foreach(n =>
          f.delete(new Path(dataDir(dst), n), false))
        cow.stagedTombstones.foreach(n =>
          f.delete(new Path(tombstoneDir(dst), n), false))
      }
      attempt += 1
    }
    throw new IllegalStateException(
      s"replica sync $src -> $dst failed after $maxRetries attempts")
  }

  /** Delete data files referenced by NO manifest ≤ the current head and
    * manifests older than `keepVersions` (retention). Returns deleted
    * file names.
    *
    * `minAgeMs` guards the staging race: a concurrent committer's files
    * sit in `data/` unreferenced between [[stageData]] and its manifest
    * claim, so an automated vacuum must skip young files (the same
    * reason Delta's VACUUM has a retention-hours floor). 0 (the default)
    * reclaims immediately — correct only when no commit is in flight.
    */
  def vacuum(spark: SparkSession, table: String,
      keepVersions: Int = 2, minAgeMs: Long = 0L): Seq[String] =
    vacuumImpl(spark, table, keepVersions, minAgeMs, dryRun = false)

  /** `VACUUM ... DRY RUN`: the exact file names [[vacuum]] would delete
    * under the same retention arguments, with NOTHING touched — no data
    * deletes, no manifest expiry, no checkpoint backfill, no cache
    * eviction. The audit step an operator runs before an irreversible
    * physical erasure. Metadata-only (directory listings + retained
    * manifest reads).
    */
  def vacuumDryRun(spark: SparkSession, table: String,
      keepVersions: Int = 2, minAgeMs: Long = 0L): Seq[String] =
    vacuumImpl(spark, table, keepVersions, minAgeMs, dryRun = true)

  private def vacuumImpl(spark: SparkSession, table: String,
      keepVersions: Int, minAgeMs: Long, dryRun: Boolean): Seq[String] = {
    val head = currentVersion(spark, table)
    val keepFrom = math.max(1L, head - keepVersions + 1)
    val referenced = (keepFrom to head)
      .flatMap(v => filesAt(spark, table, v)).toSet
    val dd = dataDir(table)
    val f = fs(spark, dd)
    if (!f.exists(dd)) return Nil
    val now = System.currentTimeMillis()
    // RECURSIVE census keyed by data-dir-relative path: partitioned
    // entries (`__gp=.../f.parquet`) reconcile exactly like flat ones;
    // sidecar trees (underscore/dot components) are never touched
    val ddQ = f.makeQualified(dd).toString + "/"
    val deleted = walkFiles(f, dd).flatMap { st =>
        val rel = f.makeQualified(st.getPath).toString.stripPrefix(ddQ)
        if (st.isFile && !rel.split('/').exists(c =>
            (c.startsWith("_") && !c.startsWith(PartPrefix)) ||
              c.startsWith(".")) &&
          now - st.getModificationTime >= minAgeMs)
          Some((st.getPath, rel))
        else None
      }.filterNot { case (_, rel) => referenced.contains(rel) }
      .map { case (p, rel) => if (!dryRun) f.delete(p, false); rel }
    // tombstone sidecars age out exactly like data files: unreferenced by
    // any retained manifest (materialized, or their version expired)
    val td = tombstoneDir(table)
    val tombsDeleted =
      if (!f.exists(td)) Nil
      else {
        val referencedTombs = (keepFrom to head)
          .flatMap(v => tombstonesOf(manifestLines(spark, table, v))).toSet
        f.listStatus(td).filter(_.isFile)
          .filter(s => now - s.getModificationTime >= minAgeMs)
          .map(_.getPath).filterNot(p => referencedTombs.contains(p.getName))
          .map { p => if (!dryRun) f.delete(p, false); p.getName }.toSeq
      }
    if (dryRun) return deleted ++ tombsDeleted
    // the new retention floor must stay resolvable after its delta-chain
    // bases vanish: when keepFrom's physical manifest is delta-encoded
    // and no checkpoint exists yet, write one (idempotent content — the
    // resolved canonical lines) BEFORE deleting anything below it
    if (keepFrom > 1 && head >= keepFrom) {
      val cp = checkpointPath(table, keepFrom)
      val mf = fs(spark, cp)
      if (!mf.exists(cp)) {
        val canonical = manifestLines(spark, table, keepFrom)
        val raw = {
          val in = mf.open(manifestPath(table, keepFrom))
          try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
          finally in.close()
        }
        if (raw.exists(_.startsWith(BaseHeader))) {
          val tmp = new Path(manifestDir(table),
            s".tmp-${java.util.UUID.randomUUID}")
          val out = mf.create(tmp, true)
          try out.write(canonical.mkString("\n").getBytes("UTF-8"))
          finally out.close()
          if (!mf.rename(tmp, cp)) mf.delete(tmp, false)
        }
      }
    }
    val tableKey = new Path(table).toString
    (1L until keepFrom).foreach { v =>
      f.delete(manifestPath(table, v), false)
      f.delete(checkpointPath(table, v), false)
      // expired versions must READ as expired: drop their cached
      // resolutions, or filesAt/time-travel would serve vacuumed state
      resolvedManifests.remove((tableKey, v))
    }
    deleted ++ tombsDeleted
  }
}
