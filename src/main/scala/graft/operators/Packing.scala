package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus packing: assign documents to fixed-token-budget shards in a
  * deterministic order — the step between "curated corpus" and "training
  * shards" in an LLM data pipeline (each shard feeds one tokenizer/writer
  * task; budget ≈ tokens per output file).
  *
  * Semantics: order docs by `orderCol` (total order); a doc's shard is
  * `floor(tokens_before_it / tokenBudget)` — greedy sequential packing,
  * documents may straddle a budget boundary (the tokenizer splits there),
  * so every shard except the last carries ≥ tokenBudget tokens.
  *
  * Scale design — the naive formulation is
  * `sum(tokens) over (order by orderCol)`, a GLOBAL window = one
  * partition holding the whole corpus. This implementation is the
  * two-phase prefix-sum instead:
  *   1. bucket docs by a deterministic coarse key (`orderCol div width`);
  *   2. per-bucket token totals via a hash groupBy (map-side partial);
  *   3. prefix-sum the O(#buckets) totals — the only ordered window, over
  *      #buckets rows (corpus/width), bounded and documented;
  *   4. broadcast the offsets back; within-bucket prefix sums run in a
  *      window PARTITIONED by bucket — fully parallel.
  * At 100 TB with width 2²⁰ that is ~10⁵ bucket rows through the global
  * window and everything else partitioned — same recipe as a distributed
  * global row_number.
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
      bucketWidth: Long = 1L << 20): DataFrame = {
    require(tokenBudget > 0, "tokenBudget must be positive")
    val bucketed = docs.withColumn("bucket",
      floor(col(orderCol) / lit(bucketWidth)))
    val offsets = bucketed
      .groupBy("bucket")
      .agg(sum(col(tokenCol).cast("long")).as("bucket_tokens"))
      .withColumn("bucket_offset",
        coalesce(
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
      .withColumn("shard_id",
        floor(col("cum_before") / lit(tokenBudget.toDouble)).cast("long"))
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
