package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Packing
import graft.pipeline.CorpusPipeline

/** End-to-end pipeline compositions exposed as queries. */
object PipelineQ {

  /** Full corpus-curation funnel (quality → lang → exact dedup → MinHash
    * near-dedup → pack) — the composed LLM-training-data pipeline. Stage
    * funnel report; deterministic (hash-based dedup, fixed thresholds).
    * Rows-only: the MinHash arm is engine-specific.
    */
  val pipeCorpusReport = QueryDef(
    "pipe_corpus_report",
    None,
    (spark, dir) =>
      CorpusPipeline.run(Tables.documents(spark, dir),
          CorpusPipeline.Config(minTokens = 20, minTtr = 0.05,
            nearDupThreshold = 0.7))
        .report.orderBy(col("stage_no")))

  /** Fixed-token-budget shard packing over the corpus (deterministic
    * doc_id order): the distributed two-phase prefix sum must reproduce
    * the oracle's single global cumulative-sum window exactly — shard
    * boundaries every 2000 tokens, integer arithmetic throughout. The
    * graded output is the per-shard manifest.
    */
  val pipePackShards = QueryDef(
    "pipe_pack_shards",
    Some("""WITH d AS (SELECT doc_id, len(string_split(text, ' ')) AS t FROM documents),
           |c AS (SELECT doc_id, t,
           |        CAST(COALESCE(SUM(t) OVER (ORDER BY doc_id
           |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
           |      FROM d)
           |SELECT CAST(cum_before // 2000 AS BIGINT) AS shard_id,
           |       count(*) AS n_docs,
           |       CAST(sum(t) AS BIGINT) AS n_tokens,
           |       min(doc_id) AS first_id,
           |       max(doc_id) AS last_id
           |FROM c GROUP BY 1""".stripMargin),
    (spark, dir) => {
      val docs = Tables.documents(spark, dir)
        .select(col("doc_id"),
          graft.functions.TextFns.tokenCount(col("text")).as("t"))
      val packed = Packing.packShards(docs, tokenCol = "t",
        orderCol = "doc_id", tokenBudget = 2000L, targetBuckets = 64)
      Packing.shardManifest(packed, tokenCol = "t", orderCol = "doc_id")
    })

  val all: Seq[QueryDef] = Seq(pipeCorpusReport, pipePackShards)
}
