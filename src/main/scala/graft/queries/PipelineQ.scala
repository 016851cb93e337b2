package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
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

  val all: Seq[QueryDef] = Seq(pipeCorpusReport)
}
