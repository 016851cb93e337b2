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
    val values = oversized.map(_.split("=", 2)(1))
    val slice = spark.read.parquet(tablePath)
      .filter(col(partitionCol).cast("string").isInCollection(values))
    val counts = slice.groupBy(col(partitionCol).cast("string").as("__p"))
      .count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val maxRows = counts.values.maxOption.getOrElse(0L)
    val filesPerPartition = math.max(1L, (maxRows + targetRowsPerFile - 1) / targetRowsPerFile).toInt
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    // repartition by (partition, deterministic row salt): hashing the
    // partition column alone would funnel each date into ONE task/file
    // regardless of targetRowsPerFile
    val salted = slice.withColumn("__salt",
      pmod(xxhash64(slice.columns.map(col).toIndexedSeq: _*), lit(filesPerPartition)))
    try salted
      .repartition(filesPerPartition * values.length, col(partitionCol), col("__salt"))
      .drop("__salt")
      .write.mode("overwrite").partitionBy(partitionCol).parquet(tablePath)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
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
    val p = new Path(indexPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    recoverGramIndex(spark, indexPath)
    require(fs.exists(p), s"no gram index at $indexPath")
    val tmp = new Path(indexPath + ".__compact_tmp")
    if (fs.exists(tmp)) fs.delete(tmp, true)
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
    // carry the layout-independent sidecars, then declare the bucketing
    val bloom = new Path(p, "_graft_gram_bloom")
    if (fs.exists(bloom))
      org.apache.hadoop.fs.FileUtil.copy(fs, bloom, fs,
        new Path(tmp, "_graft_gram_bloom"), false,
        spark.sparkContext.hadoopConfiguration)
    val bf = fs.create(new Path(tmp, "_graft_buckets"), true)
    try bf.write(buckets.toString.getBytes("UTF-8")) finally bf.close()
    val old = new Path(indexPath + ".__compact_old")
    if (fs.exists(old)) fs.delete(old, true)
    if (!fs.rename(p, old)) throw new java.io.IOException(s"rename $p -> $old failed")
    if (!fs.rename(tmp, p)) throw new java.io.IOException(s"rename $tmp -> $p failed")
    fs.delete(old, true)
  }

  /** Restore a gram index stranded by a crash mid-swap (live dir absent,
    * `.__compact_old` present). No-op otherwise.
    */
  def recoverGramIndex(spark: SparkSession, indexPath: String): Unit = {
    val p = new Path(indexPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val old = new Path(indexPath + ".__compact_old")
    if (!fs.exists(p) && fs.exists(old)) fs.rename(old, p)
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
    val p = new Path(tablePath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    recoverGramIndex(spark, tablePath)
    require(fs.exists(p), s"no table at $tablePath")
    val tmp = new Path(tablePath + ".__compact_tmp")
    if (fs.exists(tmp)) fs.delete(tmp, true)
    // mergeSchema: a table widened by evolveAppend has files with and
    // without the new columns — a footer-pick read here would silently
    // DROP the widened columns from the rewrite (and the swap makes
    // that permanent); union the schemas like readEvolved does
    spark.read.option("mergeSchema", "true").parquet(tablePath).drop("db")
      .withColumn("db", pmod(col(keyCol), lit(buckets)).cast("int"))
      .repartition(buckets, col("db"))
      .sortWithinPartitions("db", keyCol)
      .write.partitionBy("db").parquet(tmp.toString)
    // carry every root sidecar (hwm, blooms) across the swap, then
    // declare the bucketing
    fs.listStatus(p).filter(f => f.isFile && f.getPath.getName.startsWith("_graft_"))
      .foreach { f =>
        org.apache.hadoop.fs.FileUtil.copy(fs, f.getPath, fs,
          new Path(tmp, f.getPath.getName), false,
          spark.sparkContext.hadoopConfiguration)
      }
    val bf = fs.create(new Path(tmp, "_graft_buckets"), true)
    try bf.write(buckets.toString.getBytes("UTF-8")) finally bf.close()
    val old = new Path(tablePath + ".__compact_old")
    if (fs.exists(old)) fs.delete(old, true)
    if (!fs.rename(p, old)) throw new java.io.IOException(s"rename $p -> $old failed")
    if (!fs.rename(tmp, p)) throw new java.io.IOException(s"rename $tmp -> $p failed")
    fs.delete(old, true)
  }

  /** Append to a possibly-compacted table, honoring its declared bucket
    * layout: when the `_graft_buckets` sidecar is present the rows land
    * inside their `pmod(key, buckets)` partition directory; otherwise a
    * plain append. THE one append shape every streaming sink uses for
    * its bucketed tables — the pmod formula lives here, next to
    * [[compactGramIndex]]/[[compactDocTable]]/[[prunedByKey]], so a
    * write site can neither skip the dispatch nor bucket differently
    * from the layout/pruning side.
    */
  def bucketedAppend(spark: SparkSession, df: DataFrame, tablePath: String,
      keyCol: String, partCol: String): Unit =
    gramIndexBuckets(spark, tablePath) match {
      case Some(b) =>
        df.withColumn(partCol, pmod(col(keyCol), lit(b)).cast("int"))
          .write.mode("append").partitionBy(partCol).parquet(tablePath)
      case None =>
        df.write.mode("append").parquet(tablePath)
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
  def gramIndexBuckets(spark: SparkSession, indexPath: String): Option[Int] = {
    val f = new Path(new Path(indexPath), "_graft_buckets")
    val fs = f.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(f)) None
    else {
      val in = fs.open(f)
      try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toInt)
      finally in.close()
    }
  }

  /** Bucket-pruned read of a compacted gram index for a BOUNDED probe
    * set: the probe's bucket ids (≤ `buckets` values, one bounded
    * driver-side collect) become a partition filter, so the scan lists
    * and reads only the matching `hb=` directories. Falls back to the
    * full read on a flat (pre-compaction) index. This is the
    * spot-audit/targeted-lookup path; a full micro-batch probe touches
    * ~every bucket of a uniform hash family and goes through the bloom +
    * equi-join instead.
    */
  def prunedGramIndex(
      spark: SparkSession, indexPath: String, probeHs: DataFrame): DataFrame =
    gramIndexBuckets(spark, indexPath) match {
      case None => spark.read.parquet(indexPath).select("h")
      case Some(b) =>
        val hbs = probeHs
          .select(pmod(col("h"), lit(b)).cast("int").as("hb"))
          .distinct().collect().map(_.getInt(0)).toSeq
        spark.read.parquet(indexPath)
          .filter(col("hb").isInCollection(hbs))
          .select("h")
    }
}
