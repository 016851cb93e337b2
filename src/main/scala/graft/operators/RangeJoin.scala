package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (range) join: points × intervals with
  * `start <= pt < end`.
  *
  * A naive conditional join has no equi-key, so Spark plans a
  * BroadcastNestedLoopJoin — O(|points|·|intervals|) comparisons, a
  * scale-killer unless one side is tiny. This operator bucketizes time:
  * each interval explodes to the coarse buckets it overlaps
  * (≈ span/bucket + 1 rows), each point maps to exactly ONE bucket, and
  * the join becomes a shuffle equi-join on the bucket id plus a residual
  * range filter. Shuffle volume is O(|points| + |intervals|·span/bucket),
  * and AQE sees the bucket key for skew handling.
  *
  * Because a point lives in exactly one bucket and an interval covers
  * that bucket at most once, every qualifying (interval, point) pair
  * meets exactly once — no dedup pass needed.
  *
  * Pick `bucketDays` near the TYPICAL interval span: much smaller → the
  * interval side explodes too much; much larger → each bucket pairs too
  * many non-matches for the residual filter.
  */
object RangeJoin {

  def intervalJoin(
      points: DataFrame, ptCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      bucketDays: Int): DataFrame = {
    require(bucketDays > 0)
    val b = bucketDays.toLong * 86400L
    val pb = points.withColumn("__bucket",
      floor(unix_timestamp(col(ptCol)) / b))
    val ib = intervals.withColumn("__bucket",
      explode(sequence(
        floor(unix_timestamp(col(startCol)) / b),
        floor(unix_timestamp(col(endCol)) / b))))
    pb.join(ib, Seq("__bucket"))
      .filter(col(ptCol) >= col(startCol) && col(ptCol) < col(endCol))
      .drop("__bucket")
  }
}
