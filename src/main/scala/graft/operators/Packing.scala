package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus packing: assign documents to fixed-token-budget shards in a
  * deterministic order — the step between "curated corpus" and "training
  * shards" in an LLM data pipeline (each shard feeds one tokenizer/writer
  * task; budget ≈ tokens per output file).
  *
  * Semantics: order docs by `orderCol` (a unique numeric key → total
  * order); a doc's shard is `cum_before div tokenBudget` where
  * `cum_before` is the exact token prefix-sum of all earlier docs. Shard
  * boundaries therefore fall every `tokenBudget` tokens of the prefix
  * sum. Documents may straddle a boundary (the downstream tokenizer
  * splits there); a single document LARGER than the budget spans several
  * boundaries, so the intermediate shard ids are skipped entirely and
  * the shard right after an oversized doc can carry far fewer tokens
  * than the budget. (Clamp oversized docs upstream if dense shards are
  * required.) All shard arithmetic is exact integer math — no doubles,
  * so assignments stay exact past 2⁵³ cumulative tokens.
  *
  * Scale design — the naive formulation is
  * `sum(tokens) over (order by orderCol)`, a GLOBAL window = one
  * partition holding the whole corpus. This implementation is the
  * two-phase prefix-sum instead:
  *   1. bucket docs by value range of `orderCol`: bucket =
  *      `(orderCol - min) div width`, with `width` derived from the
  *      observed `[min, max]` span so there are at most `targetBuckets`
  *      buckets REGARDLESS of id sparsity (dense row numbers and sparse
  *      64-bit hashed ids both work; the min/max probe is one cheap
  *      min/max aggregate). Value-range bucketing preserves the
  *      `orderCol` total order across buckets, which is what lets the
  *      per-bucket offsets compose into a global prefix sum.
  *   2. per-bucket token totals via a hash groupBy (map-side partial);
  *   3. prefix-sum the ≤`targetBuckets` totals — the only ordered global
  *      window, over a bounded, documented row count;
  *   4. broadcast the offsets back; within-bucket prefix sums run in a
  *      window PARTITIONED by bucket — fully parallel.
  * Caveat: bucket COUNT is bounded for any id distribution, but bucket
  * SIZE balance assumes ids are roughly uniform over their span (true
  * for row numbers and for hashed ids). Heavily clustered ids put most
  * docs in few buckets and the per-bucket windows inherit that skew —
  * pre-assign a dense rank first if ids cluster pathologically.
  */
object Packing {

  /** Adds `cum_before` (tokens before this doc in `orderCol` order) and
    * `shard_id` columns. `orderCol` must be numeric and unique (doc_id).
    */
  def packShards(
      docs: DataFrame,
      tokenCol: String,
      orderCol: String,
      tokenBudget: Long,
      targetBuckets: Int = 4096): DataFrame = {
    require(tokenBudget > 0, "tokenBudget must be positive")
    require(targetBuckets > 0, "targetBuckets must be positive")
    val bounds = docs.agg(
      min(col(orderCol).cast("long")), max(col(orderCol).cast("long"))).head()
    if (bounds.isNullAt(0)) // empty corpus: keep the output contract
      return docs.withColumn("cum_before", lit(0L))
        .withColumn("shard_id", lit(0L))
    val lo = bounds.getLong(0)
    val hi = bounds.getLong(1)
    // ceil((hi-lo+1)/targetBuckets) in exact integer math — span is a
    // difference of two longs, safe unless ids span the full 2^64 range
    val span = math.subtractExact(hi, lo) + 1L
    val width = math.max(1L, (span + targetBuckets - 1) / targetBuckets)
    val bucketed = docs.withColumn("bucket",
      expr(s"(cast(`$orderCol` as bigint) - ${lo}L) div ${width}L"))
    val offsets = bucketed
      .groupBy("bucket")
      .agg(sum(col(tokenCol).cast("long")).as("bucket_tokens"))
      .withColumn("bucket_offset",
        coalesce( // bucket census: ≤ targetBuckets rows by construction
          sum(col("bucket_tokens")).over(
            Window.orderBy(col("bucket"))
              .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("bucket"), col("bucket_offset"))
    val withinW = Window.partitionBy(col("bucket")).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    bucketed
      .join(broadcast(offsets), Seq("bucket"))
      .withColumn("cum_before",
        col("bucket_offset") +
          coalesce(sum(col(tokenCol).cast("long")).over(withinW), lit(0L)))
      .withColumn("shard_id", expr(s"cum_before div ${tokenBudget}L"))
      .drop("bucket", "bucket_offset")
  }

  /** Per-shard summary (doc count, token total, id span) — the manifest a
    * shard writer consumes.
    */
  def shardManifest(packed: DataFrame, tokenCol: String,
      orderCol: String): DataFrame =
    packed.groupBy("shard_id").agg(
      count(lit(1)).as("n_docs"),
      sum(col(tokenCol).cast("long")).as("n_tokens"),
      min(col(orderCol)).as("first_id"),
      max(col(orderCol)).as("last_id"))
}
