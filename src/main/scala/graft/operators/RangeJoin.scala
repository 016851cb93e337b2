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
  * many non-matches for the residual filter. The no-`bucketDays`
  * overloads derive it from the data ([[RangeJoin.autoBucketDays]]) —
  * a hand-picked width that drifts from the real span distribution is
  * the one knob that can quietly make these joins explode at scale.
  */
object RangeJoin {

  /** Derive the bucket width from the interval-span census: the MEDIAN
    * span (approx_percentile, one scan of the interval side, one bounded
    * row to the driver), rounded up to whole days, clamped to ≥ 1.
    * Median, not mean: a heavy tail of long intervals should not widen
    * every bucket (long intervals explode into more buckets — bounded,
    * AQE-visible); a median-sized bucket keeps the TYPICAL interval at
    * ≈1-2 exploded rows while the residual filter stays selective. The
    * explicit-width overloads remain for callers that know better.
    */
  def autoBucketDays(
      intervals: DataFrame, startCol: String, endCol: String): Int = {
    val r = intervals
      .filter(col(startCol) < col(endCol))
      .select(percentile_approx(
        (unix_timestamp(col(endCol)) - unix_timestamp(col(startCol))).cast("double"),
        lit(0.5), lit(10000)).as("med"))
      .head
    if (r.isNullAt(0)) 1
    else math.max(1, math.ceil(r.getDouble(0) / 86400.0).toInt)
  }

  /** [[intervalJoin]] with the bucket width derived from the interval
    * side's median span.
    */
  def intervalJoin(
      points: DataFrame, ptCol: String,
      intervals: DataFrame, startCol: String, endCol: String): DataFrame =
    intervalJoin(points, ptCol, intervals, startCol, endCol,
      autoBucketDays(intervals, startCol, endCol))

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
  /** [[overlapJoin]] with the bucket width derived from the combined
    * span census of BOTH sides (the self-join case sees its distribution
    * once on each leg — the median is unchanged).
    */
  def overlapJoin(
      left: DataFrame, lStart: String, lEnd: String,
      right: DataFrame, rStart: String, rEnd: String,
      keys: Seq[String]): DataFrame = {
    val spans = left.select(col(lStart).as("s"), col(lEnd).as("e"))
      .unionByName(right.select(col(rStart).as("s"), col(rEnd).as("e")))
    overlapJoin(left, lStart, lEnd, right, rStart, rEnd,
      autoBucketDays(spans, "s", "e"), keys)
  }

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
