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

  /** Interval × interval OVERLAP join: pairs whose half-open spans
    * intersect (`s_l < e_r && s_r < e_l`), optionally under extra equi
    * keys. Same bucketization as [[intervalJoin]] on BOTH sides, with
    * the classic first-common-bucket rule replacing a dedup pass: a
    * qualifying pair shares the contiguous bucket run
    * [bucket(max(s)), bucket(min(e)−1)], so emitting it only where
    * `__bucket = bucket(max(s_l, s_r))` yields each pair EXACTLY once —
    * no dropDuplicates shuffle of the (potentially huge) pair stream.
    * Shuffle volume is O(Σ span/bucket) exploded rows on each side, the
    * join key (`keys`, bucket) is AQE-skew-splittable, and a hot key's
    * time range spreads across buckets instead of one reducer.
    *
    * Caller renames overlapping column names before the call (the
    * self-join case). Half-open semantics assume second-or-coarser
    * timestamps (`max(s) ≤ min(e) − 1s` whenever the overlap is
    * non-empty).
    */
  def overlapJoin(
      left: DataFrame, lStart: String, lEnd: String,
      right: DataFrame, rStart: String, rEnd: String,
      bucketDays: Int, keys: Seq[String] = Nil): DataFrame = {
    require(bucketDays > 0)
    val b = bucketDays.toLong * 86400L
    def buckets(s: String, e: String) = sequence(
      floor(unix_timestamp(col(s)) / b),
      floor((unix_timestamp(col(e)) - 1) / b))
    // drop empty ([t,t) overlaps nothing under half-open semantics) and
    // inverted intervals BEFORE bucketing: Spark's sequence(start, stop)
    // silently generates a DESCENDING list when stop < start, so an
    // inverted interval would explode into bogus buckets instead of
    // erroring, and a zero-length one would still pass the residual
    // strict-inequality filter against intervals containing its instant
    def valid(s: String, e: String) = col(s) < col(e)
    val lb = left.filter(valid(lStart, lEnd))
      .withColumn("__bucket", explode(buckets(lStart, lEnd)))
    val rb = right.filter(valid(rStart, rEnd))
      .withColumn("__bucket", explode(buckets(rStart, rEnd)))
    lb.join(rb, keys :+ "__bucket")
      .filter(col(lStart) < col(rEnd) && col(rStart) < col(lEnd))
      .filter(col("__bucket") === greatest(
        floor(unix_timestamp(col(lStart)) / b),
        floor(unix_timestamp(col(rStart)) / b)))
      .drop("__bucket")
  }
}
