package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Sampling

/** Corpus-selection query surface (training-data pipeline extensions):
  * deterministic hash sampling, per-source quotas, weighted interleaving,
  * reproducible shuffle keys. All hash-derived (md5 of a stable key), so
  * every one is oracle-checkable against DuckDB — sampling without RNG.
  */
object SamplingQ {

  private def t(frac: Double) = Sampling.hexThreshold(frac)

  /** Deterministic 10% sample keyed by doc_id (the train/holdout split
    * shape). Consistent: the same doc keeps the same fate as data grows.
    */
  val smpHashSample = QueryDef(
    "smp_hash_sample",
    Some(s"""SELECT doc_id, lang, source FROM documents
            |WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '${t(0.1)}'""".stripMargin),
    (spark, dir) =>
      Sampling.hashSample(Tables.documents(spark, dir), "doc_id", 0.1)
        .select(col("doc_id"), col("lang"), col("source")))

  /** Per-source quota: at most 10 docs per source, smallest doc_id first —
    * the corpus-mix capping step, executed by the custom two-phase
    * TopKPerKey physical operator and pinned against the window-function
    * oracle.
    */
  val smpSourceQuota = QueryDef(
    "smp_source_quota",
    Some("""SELECT source, doc_id FROM (
           |  SELECT source, doc_id,
           |         row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
           |  FROM documents) WHERE rn <= 10""".stripMargin),
    (spark, dir) =>
      Sampling.perKeyQuota(Tables.documents(spark, dir),
          Seq("source"), "doc_id", k = 10)
        .select(col("source"), col("doc_id")))

  /** Weighted interleave: English sampled at 50%, every other language at
    * 25% — the 2:1 corpus-mixing step, as one deterministic filter.
    */
  val smpInterleave = QueryDef(
    "smp_interleave",
    Some(s"""SELECT doc_id, lang FROM documents
            |WHERE CASE WHEN lang = 'en'
            |           THEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '${t(0.5)}'
            |           ELSE substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '${t(0.25)}'
            |      END""".stripMargin),
    (spark, dir) =>
      Sampling.weightedInterleave(Tables.documents(spark, dir),
          armCol = "lang", keyCol = "doc_id",
          weights = Map("en" -> 0.5, "*" -> 0.25))
        .select(col("doc_id"), col("lang")))

  /** Reproducible shuffle key: ordering by it is the pre-training global
    * shuffle (distributed spillable sort at scale, no rank window).
    */
  val smpShuffleKey = QueryDef(
    "smp_shuffle_key",
    Some("""SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS shuffle_key
           |FROM documents""".stripMargin),
    (spark, dir) =>
      Sampling.withShuffleKey(Tables.documents(spark, dir), "doc_id")
        .select(col("doc_id"), col("shuffle_key")))

  val all: Seq[QueryDef] = Seq(
    smpHashSample, smpSourceQuota, smpInterleave, smpShuffleKey)
}
