package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SCD Type-2 snapshotting — the dbt snapshot semantics (SURVEY.md §2.9
  * T7): timestamp strategy (new version when the source row's updated-at
  * advances; snapshots/snp_weather_observations.sql:13-21, with
  * `invalidate_hard_deletes`) and check strategy (new version when any
  * tracked column changes; snp_daily_metrics.sql:13-27).
  *
  * Snapshot table columns added: `scd_id` (surrogate of key+valid_from),
  * `valid_from`, `valid_to` (null = open version).
  *
  * Invariants (property-tested in Scd2Spec):
  *   - per key, validity intervals are non-overlapping and ordered;
  *   - at most one open version per key;
  *   - a hard-deleted key has no open version after the run.
  *
  * Scale: one shuffle on the natural key (full-outer join of the open
  * slice vs source); closed history never rejoins — at 100 TB partition
  * the snapshot by `valid_to IS NULL` (open slice small and hot, closed
  * slice append-only cold storage).
  */
object Scd2 {

  private def scdId(keyCols: Seq[String], validFrom: Column): Column =
    md5(concat_ws("-",
      keyCols.map(k => coalesce(col(k).cast("string"), lit(""))) :+
        validFrom.cast("string"): _*))

  /** Empty snapshot with the right shape for a first run. */
  def emptySnapshot(source: DataFrame, updatedAt: String): DataFrame =
    source.limit(0)
      .withColumn("valid_from", col(updatedAt))
      .withColumn("valid_to", col(updatedAt))
      .withColumn("scd_id", lit(""))

  /** Timestamp strategy. `source` must be unique per key (latest state).
    * `asOf` closes hard-deleted keys' open versions (invalidate_hard_deletes).
    */
  def applyTimestamp(
      snapshot: DataFrame,
      source: DataFrame,
      keyCols: Seq[String],
      updatedAt: String,
      asOf: Column,
      invalidateHardDeletes: Boolean = true): DataFrame = {

    val closed = snapshot.filter(col("valid_to").isNotNull)
    val open = snapshot.filter(col("valid_to").isNull)

    val payloadCols = source.columns.toSeq
    val src = source.select(payloadCols.map(c => col(c).as(s"src_$c")): _*)
    val joinCond = keyCols.map(k => col(k) <=> col(s"src_$k")).reduce(_ && _)
    val j = open.join(src, joinCond, "full_outer")

    val inBoth = col(s"src_${keyCols.head}").isNotNull && col(keyCols.head).isNotNull
    val onlySrc = col(keyCols.head).isNull
    val onlyOpen = col(s"src_${keyCols.head}").isNull
    // null-safe: a source row with a null updated-at can't prove it
    // advanced — treat it as unchanged so the key's open version survives
    // (a bare `>` yields NULL there, and the row would silently vanish
    // from every branch below)
    val changed = coalesce(col(s"src_$updatedAt") > col(updatedAt), lit(false))

    // 1. open rows that stay open (unchanged)
    val stillOpen = j.filter(inBoth && !changed)
      .select(payloadCols.map(col) :+ col("valid_from") :+ col("valid_to") :+ col("scd_id"): _*)

    // 2. open rows closed by a newer source version or a hard delete
    val closedNow = j.filter((inBoth && changed) ||
        (if (invalidateHardDeletes) onlyOpen else lit(false)))
      .select(payloadCols.map(col) :+
        col("valid_from") :+
        when(col(s"src_$updatedAt").isNotNull, col(s"src_$updatedAt"))
          .otherwise(asOf).as("valid_to") :+
        col("scd_id"): _*)

    // 3. new open versions (changed rows + brand-new keys)
    val newOpen = j.filter((inBoth && changed) || onlySrc)
      .select(payloadCols.map(c => col(s"src_$c").as(c)): _*)
      .withColumn("valid_from", col(updatedAt))
      .withColumn("valid_to", lit(null).cast(newOpenValidToType(snapshot)))
      .withColumn("scd_id", scdId(keyCols, col(updatedAt)))

    closed.unionByName(stillOpen).unionByName(closedNow).unionByName(newOpen)
  }

  private def newOpenValidToType(snapshot: DataFrame) =
    snapshot.schema("valid_to").dataType

  /** Check strategy: a new version whenever any tracked column differs
    * from the open version (null-safe); `asOf` stamps validity boundaries.
    */
  def applyCheck(
      snapshot: DataFrame,
      source: DataFrame,
      keyCols: Seq[String],
      checkCols: Seq[String],
      asOf: Column,
      invalidateHardDeletes: Boolean = true): DataFrame = {

    val closed = snapshot.filter(col("valid_to").isNotNull)
    val open = snapshot.filter(col("valid_to").isNull)

    val payloadCols = source.columns.toSeq
    val src = source.select(payloadCols.map(c => col(c).as(s"src_$c")): _*)
    val joinCond = keyCols.map(k => col(k) <=> col(s"src_$k")).reduce(_ && _)
    val j = open.join(src, joinCond, "full_outer")

    val inBoth = col(s"src_${keyCols.head}").isNotNull && col(keyCols.head).isNotNull
    val onlySrc = col(keyCols.head).isNull
    val onlyOpen = col(s"src_${keyCols.head}").isNull
    val changed = checkCols.map(c => !(col(c) <=> col(s"src_$c"))).reduce(_ || _)

    val stillOpen = j.filter(inBoth && !changed)
      .select(payloadCols.map(col) :+ col("valid_from") :+ col("valid_to") :+ col("scd_id"): _*)

    val closedNow = j.filter((inBoth && changed) ||
        (if (invalidateHardDeletes) onlyOpen else lit(false)))
      .select(payloadCols.map(col) :+
        col("valid_from") :+ asOf.as("valid_to") :+ col("scd_id"): _*)

    val newOpen = j.filter((inBoth && changed) || onlySrc)
      .select(payloadCols.map(c => col(s"src_$c").as(c)): _*)
      .withColumn("valid_from", asOf)
      .withColumn("valid_to", lit(null).cast(newOpenValidToType(snapshot)))
      .withColumn("scd_id", scdId(keyCols, asOf))

    closed.unionByName(stillOpen).unionByName(closedNow).unionByName(newOpen)
  }
}
