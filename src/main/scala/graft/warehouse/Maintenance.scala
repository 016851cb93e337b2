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
}
