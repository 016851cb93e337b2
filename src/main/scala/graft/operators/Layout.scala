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
    (0 until 16).map { i =>
      (shiftright(x, i).bitwiseAND(1).cast("long") * (1L << (2 * i))) +
        (shiftright(y, i).bitwiseAND(1).cast("long") * (1L << (2 * i + 1)))
    }.reduce(_ + _)

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
      path: String, numFiles: Int): Unit = {
    val r = df.agg(
      min(col(colX)).cast("double"), max(col(colX)).cast("double"),
      min(col(colY)).cast("double"), max(col(colY)).cast("double")).head
    val keyed = df.withColumn("__z", mortonKey(
      to16bit(col(colX), r.getDouble(0), r.getDouble(1)),
      to16bit(col(colY), r.getDouble(2), r.getDouble(3))))
    keyed
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
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
}
