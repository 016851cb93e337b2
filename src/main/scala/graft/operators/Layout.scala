package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout control — at 100 TB the dominant query cost is how much
  * data a scan must touch, and layout is the lever: files carry min/max
  * column statistics (parquet footers, table-format manifests), so
  * co-locating rows that filters select together lets engines skip
  * whole files/row-groups.
  *
  *   - linear sort: perfect skipping on ONE leading column, none on the
  *     others (the classic clustered-index limitation);
  *   - Z-ORDER (Morton curve): interleaves the bits of several columns'
  *     normalized ranks, so value-space proximity in EVERY dimension maps
  *     to key proximity — multi-dimensional predicates touch a small,
  *     contiguous band of files.
  *
  * The curve math follows the classic Morton construction; the same
  * layout idea ships in Delta/Iceberg `OPTIMIZE ZORDER BY`.
  */
object Layout {

  /** 32-bit Morton key: interleaves the low 16 bits of `x` and `y`
    * (x in even positions, y in odd). Pure codegen'd bit arithmetic.
    */
  def mortonKey(x: Column, y: Column): Column =
    mortonKeyN(Seq(x, y))

  /** k-dimensional Morton key (2 ≤ k ≤ 6): dimension `i`'s bit `j` lands
    * at interleaved position `j*k + i`. Bits per dimension shrink as k
    * grows (min(16, 62/k)) so the key stays a positive Long — rank
    * resolution per dimension falls, which is the real Z-ORDER trade-off
    * at high k (each extra clustered column dilutes the others' locality;
    * the same reason Delta docs advise few ZORDER columns).
    */
  def mortonKeyN(ranks: Seq[Column]): Column = {
    val k = ranks.size
    require(k >= 2 && k <= 6, s"z-order needs 2..6 columns, got $k")
    val bits = math.min(16, 62 / k)
    val drop = 16 - bits // ranks are 16-bit; keep the HIGH bits
    ranks.zipWithIndex.flatMap { case (r, i) =>
      (0 until bits).map { j =>
        shiftright(r, j + drop).bitwiseAND(1).cast("long") *
          (1L << (j * k + i))
      }
    }.reduce(_ + _)
  }

  /** Normalize a numeric column to a 16-bit rank bucket given its
    * [min, max] range (driver-computed, 2 values per column).
    */
  private def to16bit(c: Column, lo: Double, hi: Double): Column =
    if (hi <= lo) lit(0)
    else least(lit(65535),
      floor((c.cast("double") - lo) / (hi - lo) * 65536).cast("int"))

  /** Write `df` z-ordered on two numeric columns into `numFiles` files:
    * rows close in BOTH dimensions land in the same or adjacent files,
    * so box predicates touch few files (see LayoutSpec for the measured
    * locality win vs a linear sort). Range-partitioned on the Morton key
    * → files tile the curve contiguously.
    */
  def zorderWrite(df: DataFrame, colX: String, colY: String,
      path: String, numFiles: Int): Unit =
    zorderFrame(df, colX, colY, numFiles)
      .write.mode("overwrite").parquet(path)

  /** The z-ordered frame itself (range-partitioned on the Morton key,
    * curve-sorted within partitions, one output file per partition) —
    * for writers that own their commit path, e.g. the snapshot
    * protocol's OPTIMIZE staging its rewrite before claiming a manifest.
    */
  def zorderFrame(df: DataFrame, colX: String, colY: String,
      numFiles: Int): DataFrame =
    zorderFrameN(df, Seq(colX, colY), numFiles)

  /** k-column z-order (1..6 columns, ANY orderable type): numeric
    * columns rank by exact [min, max] normalization (ONE driver-side agg,
    * 2k values); string/date/timestamp columns rank by sampled range
    * boundaries ([[boundaryRank]] — the range-partition-id idea Delta's
    * ZORDER uses, here as a deterministic hash-sample + an `aggregate`
    * HOF counting boundaries ≤ value). The interleaved Morton key drives
    * the same range-partition + in-partition sort; ONE column degenerates
    * to a plain range-cluster (a 1-d Morton curve IS a sort).
    */
  def zorderFrameN(df: DataFrame, cols: Seq[String],
      numFiles: Int): DataFrame = {
    // ONE combined agg serves every numeric column's [min, max] (2k
    // values in one driver action): on a manifest-pinned or
    // tombstone-filtered input, per-column aggs would re-execute the
    // whole upstream read k times
    val numeric = cols.filter(c =>
      df.schema(c).dataType.isInstanceOf[org.apache.spark.sql.types.NumericType])
    val ranges: Map[String, (Double, Double)] =
      if (numeric.isEmpty) Map.empty
      else {
        val aggs = numeric.flatMap(c => Seq(
          min(col(c)).cast("double"), max(col(c)).cast("double")))
        val r = df.agg(aggs.head, aggs.tail: _*).head
        numeric.zipWithIndex.map { case (c, i) =>
          c -> (if (r.isNullAt(2 * i)) (0.0, 0.0) // all-NULL column
                else (r.getDouble(2 * i), r.getDouble(2 * i + 1)))
        }.toMap
      }
    // 16-bit rank: exact-range normalization for numerics, sampled
    // boundaries for everything else; NULLs rank 0 (curve origin)
    def rank(c: String): Column = ranges.get(c) match {
      case Some((lo, hi)) => to16bit(col(c), lo, hi)
      case None => boundaryRank(df, c)
    }
    val key =
      if (cols.size == 1) rank(cols.head)
      else mortonKeyN(cols.map(rank))
    df.withColumn("__z", key)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }

  /** Max boundaries per non-numeric z-order column: rank resolution 256
    * per dimension — plenty for FILE-level clustering (a table has far
    * fewer files than 256 per dimension), and it bounds the per-row
    * rank cost (one `aggregate` pass over ≤255 literals).
    */
  private val boundaryCap = 255

  /** Unsigned-byte lexicographic order of the UTF-8 encoding — how Spark
    * compares strings internally (UTF8String binary order). JVM String
    * ordering compares UTF-16 code units and disagrees above the BMP.
    */
  private object Utf8Ordering extends Ordering[String] {
    def compare(a: String, b: String): Int = {
      val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      var i = 0
      val n = math.min(x.length, y.length)
      while (i < n) {
        val d = (x(i) & 0xff) - (y(i) & 0xff)
        if (d != 0) return d
        i += 1
      }
      x.length - y.length
    }
  }

  /** Sampled-boundary rank for non-numeric orderable columns: collect a
    * bounded, DETERMINISTIC sample of the column's distinct domain —
    * the distinct values ordered by (xxhash64, value) with the first
    * `cap·8` taken, one TakeOrdered pass (a per-partition heap of ~2k
    * entries, no RNG, no LIMIT nondeterminism, same survivors on every
    * run at any cardinality) — keep ≤ [[boundaryCap]] evenly-spaced
    * sorted boundaries, and rank each row by how many boundaries it is ≥
    * (an `aggregate` HOF — pure Catalyst, no UDF). Domain-weighted
    * rather than frequency-weighted: heavy skew concentrates rows in one
    * rank bucket, which costs locality, never correctness. Boundaries
    * sort under UTF-8 BINARY order — the order Spark's own string
    * comparison uses — so `>=` in the rank expression agrees with the
    * boundary order even for supplementary characters, where JVM UTF-16
    * string order diverges.
    */
  private[graft] def boundaryRank(df: DataFrame, c: String): Column = {
    val probeCap = boundaryCap * 8 + 1
    val sample = df.select(col(c)).na.drop().distinct()
      .orderBy(xxhash64(col(c)), col(c)).limit(probeCap).collect()
    val bounds = sample.map(_.get(0)).sortBy(_.toString)(Utf8Ordering)
    val kept =
      if (bounds.length <= boundaryCap) bounds.toSeq
      else (1 to boundaryCap).map(i => bounds((i * bounds.length) / (boundaryCap + 1)))
    if (kept.isEmpty) lit(0)
    else {
      val scale = 65536.0 / (kept.length + 1)
      val arr = array(kept.map(lit): _*)
      val rank = aggregate(arr, lit(0),
        (acc, b) => acc + when(col(c) >= b, 1).otherwise(0))
      when(col(c).isNull, 0)
        .otherwise(least(lit(65535), floor(rank * scale).cast("int")))
    }
  }

  /** Linear-sorted comparison layout (single-dimension clustering). */
  def linearWrite(df: DataFrame, sortCol: String, path: String,
      numFiles: Int): Unit =
    df.repartitionByRange(numFiles, col(sortCol))
      .sortWithinPartitions(sortCol)
      .write.mode("overwrite").parquet(path)

  /** Distinct data files containing rows matching `predicate` — the
    * locality metric (at scale, with column stats, untouched files are
    * skipped outright).
    */
  def filesTouched(spark: org.apache.spark.sql.SparkSession, path: String,
      predicate: Column): Long =
    spark.read.parquet(path).filter(predicate)
      .select(input_file_name()).distinct().count()

  // ------------------------------------------------------- stats skipping

  val statsDir = "_graft_stats"

  /** Canonical URI spelling of a RAW path string — input_file_name() and
    * DataFrame.inputFiles render the same file differently (file:/// vs
    * file:/). For raw spellings (manifest entries qualified through
    * Path) this is the identity up to scheme normalization.
    */
  private[graft] def canonFile(s: String): String =
    new org.apache.hadoop.fs.Path(s).toString

  /** Canonical spelling of a URI-ENCODED file string. input_file_name(),
    * DataFrame.inputFiles and the sidecar manifests' persisted `file`
    * columns all render percent-ENCODED URIs — a literal '%' in a path
    * (e.g. an escaped partition dir `__gp=t%3A1`) arrives as "%25".
    * One strict decode lands on the spelling [[canonFile]] gives the
    * raw path; the two only diverge on URI-special chars, which is
    * exactly when mixing them up mis-keys a sidecar row or maps a
    * probed file back to no manifest entry (a delete/merge would
    * silently no-op). Strings that don't parse as URIs fall back raw.
    */
  private[graft] def canonUri(s: String): String =
    try new org.apache.hadoop.fs.Path(new java.net.URI(s)).toString
    catch { case _: Exception => canonFile(s) }

  /** The per-file min/max aggregate columns of a manifest (one builder,
    * shared by write and incremental append so the encodings can never
    * diverge). Encoding is TYPED per column: numerics as double,
    * string/date/timestamp as strings (ISO date/timestamp strings sort
    * chronologically, so lexicographic range checks are correct) —
    * corpus tables key on `source`/`lang`/dates as often as on numbers.
    */
  private def statsAggs(schema: org.apache.spark.sql.types.StructType,
      cols: Seq[String]): Seq[Column] =
    // per-file row count first: COUNT(*) (and AVG reconstruction)
    // answer from the manifest alone — the metadata-only aggregate path
    count(lit(1L)).cast("long").as("__count") +:
    cols.flatMap { c =>
      // per-column NULL count alongside min/max: COUNT(col) answers
      // from the manifest, and the ORDER BY file pruner needs exact
      // non-null cardinalities (nulls sort to one end — a bound-only
      // prune that miscounted them would drop top-k rows, not just IO).
      // Older manifests lack the column; incremental appends leave
      // their rows NULL (unionByName) and every consumer refuses then.
      val nulls =
        (count(lit(1L)) - count(col(c))).cast("long").as(s"${c}__nulls")
      schema(c).dataType match {
        case _: org.apache.spark.sql.types.NumericType => Seq(
          min(col(c)).cast("double").as(s"${c}__min"),
          max(col(c)).cast("double").as(s"${c}__max"), nulls)
        case _ => Seq(
          min(col(c)).cast("string").as(s"${c}__min"),
          max(col(c)).cast("string").as(s"${c}__max"), nulls)
      }
    }

  private def statsSupported(t: org.apache.spark.sql.types.DataType): Boolean =
    t match {
      case _: org.apache.spark.sql.types.NumericType => true
      case org.apache.spark.sql.types.StringType => true
      case org.apache.spark.sql.types.DateType => true
      case org.apache.spark.sql.types.TimestampType => true
      case _ => false
    }

  /** Stats columns a manifest at `path` declares (parsed from its
    * `<col>__min` schema), None when the table has no manifest — how
    * maintenance rebuilds a manifest without being told the columns.
    */
  def statsManifestCols(spark: org.apache.spark.sql.SparkSession,
      path: String): Option[Seq[String]] = {
    val p = new org.apache.hadoop.fs.Path(path, statsDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else Some(spark.read.parquet(p.toString).schema.fieldNames.toSeq
      .collect { case n if n.endsWith("__min") => n.stripSuffix("__min") })
  }

  /** Per-FILE column min/max manifest — the table-format stats idea
    * (Delta add-file stats, Iceberg manifest ranges) without adopting
    * the format: one scan collects (file, min, max) per stats column
    * into a `_graft_stats` sidecar (underscore → invisible to data
    * readers), so a range query prunes the FILE LIST driver-side before
    * Spark opens a single footer. Parquet row-group skipping still needs
    * every footer read and a task per file; at 100 TB with millions of
    * files, manifest-level pruning is what keeps listing + planning
    * cost proportional to the data actually selected. Z-order writes
    * ([[zorderWrite]]) make the per-file ranges tight in BOTH
    * dimensions, which is exactly what makes this pruning bite.
    */
  def writeStatsManifest(spark: org.apache.spark.sql.SparkSession,
      path: String, statsCols: Seq[String],
      files: Option[Seq[String]] = None): Unit = {
    require(statsCols.nonEmpty)
    require(files.forall(_.nonEmpty), "explicit file list must be non-empty")
    // an explicit file list (a snapshot VERSION's files — which may be
    // foreign qualified URIs on a shallow clone or an in-place convert)
    // beats the directory listing: orphans stay out, references stat in
    val df = files match {
      case Some(fs) => spark.read.parquet(fs: _*)
      case None => spark.read.parquet(path)
    }
    // orderable types only: a boolean/binary/array column has no useful
    // file range, and an all-NULL or meaningless manifest row would mean
    // "prunes nothing" at best — reject loudly at write time instead
    statsCols.foreach { c =>
      val t = df.schema(c).dataType
      require(statsSupported(t),
        s"stats column $c is ${t.simpleString}; per-file min/max stats " +
          "require a numeric, string, date or timestamp column")
    }
    val aggs = statsAggs(df.schema, statsCols)
    df.groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$path/$statsDir")
  }

  /** Incrementally extend the stats manifest to the data files it does
    * not cover yet — the steady-state maintenance of a table under
    * streaming accretion: appended files are readable immediately (the
    * pruned reader always includes unmanifested files) but unprunable
    * until this runs, and it scans ONLY the missing files, never the
    * table. Returns how many files were added.
    */
  def appendStatsManifest(spark: org.apache.spark.sql.SparkSession,
      path: String, files: Option[Seq[String]] = None): Int =
    statsManifestCols(spark, path) match {
      case None => 0
      case Some(cols) =>
        val mPath = s"$path/$statsDir"
        // materialize the current manifest BEFORE overwriting the dir a
        // lazy plan would still be reading from
        val existing = spark.read.parquet(mPath).localCheckpoint(true)
        val known = existing.select("file").collect()
          .map(r => canonUri(r.getString(0))).toSet
        val candidates = files.map(_.map(canonFile))
          .getOrElse(spark.read.parquet(path).inputFiles
            .map(canonUri).toSeq)
        val missing = candidates.filterNot(known)
        if (missing.isEmpty) 0
        else {
          // no basePath for explicit lists: a clone's foreign refs share
          // no base with the table's own data dir
          val freshRead = files match {
            case Some(_) => spark.read.parquet(missing.toIndexedSeq: _*)
            case None => spark.read.option("basePath", path)
              .parquet(missing.toIndexedSeq: _*)
          }
          val aggs = statsAggs(freshRead.schema, cols)
          val fresh = freshRead
            .groupBy(input_file_name().as("file"))
            .agg(aggs.head, aggs.tail: _*)
          // pre-__count manifests lack the count column: their rows
          // keep a NULL count (pruning unaffected; the metadata-only
          // aggregate path requires full nonnull coverage and refuses)
          existing.unionByName(fresh, allowMissingColumns = true)
            .coalesce(1)
            .write.mode("overwrite").parquet(mPath)
          missing.length
        }
    }

  // (statsDir fingerprint → (schema, uri → stats row)): ONE collect of
  // the manifest serves every planning consumer of a scan — limit
  // truncation, topN prune, metadata aggregates and row-count stats
  // each probe the same rows; re-collecting per probe would quadruple
  // driver planning IO. Fingerprint = the sidecar files' (name, len,
  // mtime), so any rewrite/append invalidates; bounded, cleared
  // wholesale past the cap (correctness never depends on a hit).
  private val statsRowsCache = scala.collection.concurrent.TrieMap
    .empty[String, (String, org.apache.spark.sql.types.StructType,
      Map[String, org.apache.spark.sql.Row])]

  /** The stats-manifest rows covering EXACTLY the given canonical file
    * URIs — the metadata-only aggregate path's input: None when the
    * manifest is missing or ANY file is uncovered (an answer from
    * partial coverage would be silently wrong, never just slow).
    * Returns (schema, row per file) with rows keyed like
    * [[selectByStatsBounds]] (canonical `input_file_name()` URIs).
    */
  private[graft] def statsRowsFor(
      spark: org.apache.spark.sql.SparkSession, path: String,
      canonFiles: Seq[String])
      : Option[(org.apache.spark.sql.types.StructType,
        Seq[org.apache.spark.sql.Row])] = {
    val p = new org.apache.hadoop.fs.Path(path, statsDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return None
    val fp = fs.listStatus(p).filter(_.isFile)
      .map(st => s"${st.getPath.getName}:${st.getLen}:" +
        s"${st.getModificationTime}")
      .sorted.mkString(";")
    val key = p.toString
    val (schema, byFile) = statsRowsCache.get(key) match {
      case Some((cachedFp, s, m)) if cachedFp == fp => (s, m)
      case _ =>
        val manifest = spark.read.parquet(p.toString)
        val m = manifest.collect()
          .map(r => canonUri(
            r.getString(manifest.schema.fieldIndex("file"))) -> r).toMap
        if (statsRowsCache.size > 256) statsRowsCache.clear()
        statsRowsCache.put(key, (fp, manifest.schema, m))
        (manifest.schema, m)
    }
    val rows = canonFiles.map(byFile.get)
    if (rows.exists(_.isEmpty)) None
    else Some((schema, rows.flatten))
  }

  /** Drop manifest entries whose data file no longer exists — the cheap
    * maintenance after a pure directory drop (partition expiry):
    * surviving files were not rewritten, so their stats are still valid
    * and filtering the (tiny) manifest replaces a full-table stats
    * rescan. Zero data files are read. Returns the number of dead
    * entries dropped.
    */
  def pruneStatsManifestEntries(spark: org.apache.spark.sql.SparkSession,
      path: String, files: Option[Seq[String]] = None): Int = {
    val mPath = new org.apache.hadoop.fs.Path(path, statsDir)
    val fs = mPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(mPath)) return 0
    val existing = spark.read.parquet(mPath.toString)
    val rows = existing.collect()
    val fileIdx = existing.schema.fieldIndex("file")
    // explicit live set (a snapshot version's files) keeps a clone's
    // FOREIGN entries alive — a directory listing would wrongly expire
    // every reference outside the table's own data dir
    val live = files.map(_.map(canonFile).toSet)
      .getOrElse(spark.read.parquet(path).inputFiles.map(canonUri).toSet)
    val kept = rows.filter(r => live(canonUri(r.getString(fileIdx))))
    if (kept.length == rows.length) return 0
    spark.createDataFrame(
        java.util.Arrays.asList(kept: _*), existing.schema)
      .coalesce(1).write.mode("overwrite").parquet(mPath.toString)
    rows.length - kept.length
  }

  /** Spec hook: (files read, files total) of the last stats-pruned read;
    * None when no manifest was found (full scan).
    */
  @volatile var lastStatsPruned: Option[(Int, Int)] = None

  /** Read `path` pruned by the stats manifest to files whose [min, max]
    * ranges intersect EVERY `(col, lo, hi)` box side (inclusive). Rows
    * outside the selected files cannot satisfy the box, so
    * `statsPrunedRead(...).filter(box)` ≡ full-scan filter — the caller
    * still applies the row-level predicate. Safety under drift:
    *   - data files NOT in the manifest (appended after the manifest was
    *     written) are always included — no stats, no skipping;
    *   - manifest entries whose file is gone (compacted away) are
    *     dropped — never a read of a dead path.
    * Falls back to the plain read when no manifest exists.
    */
  /** Subset of `live` canonical file URIs a stats manifest at `path`
    * cannot rule out for `ranges` — the driver-side file-skip shared by
    * [[statsPrunedRead]] (flat tables) and
    * [[graft.warehouse.Snapshots.readPruned]] (versioned tables, whose
    * live set is a manifest's file list, not a directory listing).
    * Files the stats manifest does not cover are always kept.
    */
  private[graft] def selectByStats(spark: org.apache.spark.sql.SparkSession,
      path: String, ranges: Seq[(String, Any, Any)],
      live: Seq[String]): Seq[String] = {
    // a NULL min/max (all-null values in that file, or a manifest from
    // before the numeric-column guard) must mean "cannot prune", never
    // "skip the file"
    val keep = ranges.map { case (c, lo, hi) =>
      (col(s"${c}__max") >= lo && col(s"${c}__min") <= hi) ||
        col(s"${c}__max").isNull || col(s"${c}__min").isNull }
      .reduce(_ && _)
    val manifest = spark.read.parquet(s"$path/$statsDir")
    val known = manifest.select("file").collect()
      .map(r => canonUri(r.getString(0))).toSet
    val selected = manifest.filter(keep)
      .select("file").collect().map(r => canonUri(r.getString(0))).toSet
    live.filter(f => selected(f) || !known(f))
  }

  /** Subset of `live` canonical file URIs the stats manifest cannot rule
    * out for an OPEN-ENDED range on `c` — the one-sided variant of
    * [[selectByStats]] that predicate probes need (`ts < cutoff` has no
    * lower bound; a closed-box API would have to invent one, and there
    * is no greatest string). A missing side simply drops that conjunct;
    * both sides missing keeps everything. NULL stats and unmanifested
    * files always keep, like every other selector here.
    */
  private[graft] def selectByStatsBounds(
      spark: org.apache.spark.sql.SparkSession, path: String, c: String,
      lo: Option[Any], hi: Option[Any], live: Seq[String]): Seq[String] = {
    val sides = lo.map(v => col(s"${c}__max") >= lit(v)).toSeq ++
      hi.map(v => col(s"${c}__min") <= lit(v)).toSeq
    if (sides.isEmpty) return live
    val keep = sides.reduce(_ && _) ||
      col(s"${c}__min").isNull || col(s"${c}__max").isNull
    val manifest = spark.read.parquet(s"$path/$statsDir")
    val known = manifest.select("file").collect()
      .map(r => canonUri(r.getString(0))).toSet
    val selected = manifest.filter(keep)
      .select("file").collect().map(r => canonUri(r.getString(0))).toSet
    live.filter(f => selected(f) || !known(f))
  }

  /** Subset of `live` canonical file URIs whose [min, max] range for `c`
    * can contain AT LEAST ONE of `values` — the point-set variant of
    * [[selectByStats]], for key-list probes (tombstone feeds, merge
    * touch-sets) where the keys are sparse points rather than one box:
    * on a z-ordered table a 50-key list prunes to a handful of files
    * where the coarse [min(values), max(values)] envelope would keep
    * most of them. The membership test runs as ONE array-literal
    * `exists` per manifest row (never a 4096-term OR chain). NULL stats
    * keep the file (cannot prune), as do files the manifest doesn't
    * cover.
    */
  private[graft] def selectByStatsAnyOf(
      spark: org.apache.spark.sql.SparkSession, path: String, c: String,
      values: Seq[Any], live: Seq[String]): Seq[String] = {
    val minC = col(s"${c}__min")
    val maxC = col(s"${c}__max")
    // typed to the manifest's encoding (numerics as double, everything
    // else as string) so comparisons never hit a cast surprise
    val arr =
      if (values.forall(_.isInstanceOf[Number]))
        lit(values.map(_.asInstanceOf[Number].doubleValue).toArray)
      else lit(values.map(String.valueOf).toArray)
    val keep = exists(arr, v => minC <= v && maxC >= v) ||
      minC.isNull || maxC.isNull
    val manifest = spark.read.parquet(s"$path/$statsDir")
    val known = manifest.select("file").collect()
      .map(r => canonUri(r.getString(0))).toSet
    val selected = manifest.filter(keep)
      .select("file").collect().map(r => canonUri(r.getString(0))).toSet
    live.filter(f => selected(f) || !known(f))
  }

  def statsPrunedRead(spark: org.apache.spark.sql.SparkSession, path: String,
      ranges: Seq[(String, Any, Any)]): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(path, statsDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) { lastStatsPruned = None; return spark.read.parquet(path) }
    val live = spark.read.parquet(path).inputFiles.map(canonUri).toSeq
    val chosen = selectByStats(spark, path, ranges, live)
    lastStatsPruned = Some((chosen.length, live.length))
    if (chosen.isEmpty)
      // preserve schema on an empty selection
      spark.read.parquet(path).limit(0)
    else
      // basePath keeps Hive partition columns (p_date=...) in the
      // schema — leaf-file reads would silently drop them
      spark.read.option("basePath", path).parquet(chosen.toIndexedSeq: _*)
  }
}
