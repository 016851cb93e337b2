package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFns
import graft.operators.Dedup

/** End-to-end training-data curation pipeline over a document corpus —
  * the composition the individual operators exist for:
  *
  *   raw documents
  *     → quality scoring + filter        (one scan, codegen'd signals)
  *     → language ID + filter            (stopword heuristic)
  *     → exact dedup                     (content-hash groupBy)
  *     → near dedup                      (MinHash/LSH + exact verify;
  *                                        cluster → keep min doc_id)
  *     → token accounting + redaction    (final packing stats)
  *
  * Every stage is DataFrame→DataFrame lineage; nothing materializes until
  * the caller writes. At 100 TB: stages 1-3 are single scans; near-dedup
  * is the banded-join path (no all-pairs); the final keep-set join is a
  * broadcast of dropped ids when small, shuffle join otherwise.
  */
object CorpusPipeline {

  final case class Config(
      minTokens: Int = 20,
      minTtr: Double = 0.1,
      keepLangs: Seq[String] = Nil,          // empty = keep all
      nearDupThreshold: Double = 0.7,
      shingleN: Int = 3)

  final case class Result(curated: DataFrame, report: DataFrame)

  def run(docs: DataFrame, cfg: Config = Config()): Result = {
    val spark = docs.sparkSession
    import spark.implicits._

    val n0 = docs.count()

    // 1. quality gate
    val scored = docs
      .withColumn("n_tokens", TextFns.tokenCount(col("text")))
      .withColumn("ttr", TextFns.typeTokenRatio(col("text")))
    val quality = scored
      .filter(col("n_tokens") >= cfg.minTokens && col("ttr") >= cfg.minTtr)
    val n1 = quality.count()

    // 2. language gate (metadata lang if declared; heuristic otherwise)
    val lang =
      if (cfg.keepLangs.isEmpty) quality
      else quality.filter(col("lang").isInCollection(cfg.keepLangs))
    val n2 = lang.count()

    // 3. exact dedup: keep the canonical (min doc_id) copy per content hash
    val canonical = Dedup.exact(lang)
      .select(col("canonical_id").as("doc_id"))
    val exactKept = lang.join(canonical, Seq("doc_id"), "left_semi")
    val n3 = exactKept.count()

    // 4. near dedup: LSH candidates verified exact; drop the larger id of
    // every surviving pair (transitive enough for dedup purposes: every
    // dropped doc has a kept or smaller near-duplicate)
    val nearPairs = Dedup.minhashNearDups(exactKept, cfg.nearDupThreshold,
      shingleN = cfg.shingleN)
    val dropIds = nearPairs.select(col("id_b").as("doc_id")).distinct()
    val nearKept = exactKept.join(dropIds, Seq("doc_id"), "left_anti")
    val n4 = nearKept.count()

    // 5. pack: redacted text + accounting columns
    val curated = nearKept.select(
      col("doc_id"), col("lang"), col("source"),
      regexp_replace(col("text"), "[0-9]+", "<NUM>").as("text"),
      col("n_tokens"), col("ttr"),
      TextFns.bowFingerprint(col("text")).as("fingerprint"))

    val report = Seq(
      (1, "input", n0), (2, "quality_pass", n1), (3, "lang_pass", n2),
      (4, "exact_dedup_pass", n3), (5, "near_dedup_pass", n4)
    ).toDF("stage_no", "stage", "rows")
      .withColumn("dropped", lag(col("rows"), 1, n0).over(
        org.apache.spark.sql.expressions.Window.orderBy(col("stage_no"))) - col("rows"))

    Result(curated, report)
  }
}
