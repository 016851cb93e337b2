package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot reconciliation: classify every key of two table versions as
  * added / removed / changed / unchanged — the data-ops "diff two loads"
  * operator (the audit the reference runs by eyeballing row counts after
  * each dbt run; here it is a first-class relational op).
  *
  * Scale: one full outer shuffle join on the key — the minimal possible
  * data movement for an exact diff (any exact diff must co-locate the two
  * versions of each key). Value comparison happens post-join as a
  * codegen'd null-safe conjunction, no row-serialization or UDF. At 100 TB
  * both sides shuffle-hash-partition on the key and AQE handles skewed
  * keys; if the two snapshots share a bucketed layout on the key the
  * Exchange disappears entirely (see Layout.bucketize).
  */
object Reconcile {

  /** Per-key diff status of `b` (new) versus `a` (old) over `valueCols`.
    * Output: keyCols ++ (status: added|removed|changed|unchanged).
    * Null-safe: a value flipping to/from NULL counts as changed, NULL==NULL
    * as unchanged (IS DISTINCT FROM semantics).
    */
  def diff(a: DataFrame, b: DataFrame, keyCols: Seq[String],
      valueCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    require(valueCols.nonEmpty, "need at least one value column")
    val av = a.select((keyCols ++ valueCols).map(col): _*)
      .withColumn("__in_a", lit(true))
    val bv = b.select((keyCols ++ valueCols).map(col): _*)
      .toDF(keyCols ++ valueCols.map("__b_" + _): _*)
      .withColumn("__in_b", lit(true))
    val joined = av.join(bv, keyCols, "full_outer")
    val same: Column = valueCols.map(v =>
      col(v) <=> col("__b_" + v)).reduce(_ && _)
    joined.select(
      keyCols.map(col) :+
        when(col("__in_a").isNull, lit("added"))
          .when(col("__in_b").isNull, lit("removed"))
          .when(same, lit("unchanged"))
          .otherwise(lit("changed")).as("status"): _*)
  }

  /** Aggregate diff report: per-status row count plus a key checksum —
    * the compact reconciliation summary (4 rows max) that a scheduler
    * gate or alert consumes. checksumCol must be numeric.
    */
  def diffReport(a: DataFrame, b: DataFrame, keyCols: Seq[String],
      valueCols: Seq[String], checksumCol: String): DataFrame =
    diff(a, b, keyCols, valueCols)
      .groupBy(col("status"))
      .agg(count(lit(1)).as("cnt"),
        sum(col(checksumCol)).as("key_checksum"))
}
