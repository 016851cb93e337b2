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
  *     → LM perplexity gate              (CCNet-style: in-engine bigram
  *                                        LM, drop the worst deciles
  *                                        per source)
  *     → exact dedup                     (content-hash groupBy)
  *     → near dedup                      (MinHash/LSH + exact verify;
  *                                        cluster → keep min doc_id)
  *     → decontamination (optional)      (benchmark n-gram leakage guard
  *                                        vs a held-out eval corpus)
  *     → token accounting + redaction    (final packing stats)
  *
  * The funnel report is derived arithmetically (a flag aggregation plus
  * bounded counts over already-materialized id sets — never tag-joins),
  * with the gated subset persisted so the scan isn't recomputed per
  * consumer. At 100 TB: stages 1-3 are single scans; the LM stage is the
  * tx_lm_perplexity plan (count-table broadcasts, text never shuffles)
  * plus a per-source ntile window over (doc_id, score) pairs only;
  * near-dedup is the banded-join path (no all-pairs); the final keep-set
  * join is a broadcast of dropped ids when small, shuffle join otherwise.
  *
  * EAGER at construction: `run` computes the funnel counts (and, with
  * the LM stage on, materializes the LM keep-set) before returning.
  */
object CorpusPipeline {

  final case class Config(
      minTokens: Int = 20,
      minTtr: Double = 0.1,
      keepLangs: Seq[String] = Nil,          // empty = keep all
      lmDropWorstDeciles: Int = 1,           // 0 = LM gate off
      nearDupThreshold: Double = 0.7,
      shingleN: Int = 3,
      deconNgram: Int = 5)                   // n for the decontamination stage

  final case class Result(curated: DataFrame, report: DataFrame)

  /** `evalDocs`: an optional held-out benchmark corpus — when present,
    * the final funnel stage drops curated docs sharing ≥ 1 distinct
    * `deconNgram`-gram with it (GPT-3-appendix-C-style leakage guard,
    * run LAST so only surviving docs pay the gram join).
    */
  def run(docs: DataFrame, cfg: Config = Config(),
      evalDocs: Option[DataFrame] = None): Result = {
    val spark = docs.sparkSession
    import spark.implicits._

    // 1+2. quality + language signals in ONE scan, kept as flags so the
    // funnel can be accounted in a single aggregation later.
    val base = docs
      .withColumn("n_tokens", TextFns.tokenCount(col("text")))
      .withColumn("ttr", TextFns.typeTokenRatio(col("text")))
      .withColumn("q_pass",
        coalesce(col("n_tokens") >= cfg.minTokens && col("ttr") >= cfg.minTtr,
          lit(false)))
      .withColumn("l_pass",
        if (cfg.keepLangs.isEmpty) lit(true)
        else col("lang").isInCollection(cfg.keepLangs))

    // The gated subset feeds the exact-dedup groupBy, the LSH banded join
    // AND the final keep-join — cache it so the quality scan runs once,
    // not once per consumer; generation-bounded (ScopedCache) so repeated
    // pipeline runs replace rather than stack the persisted copy. (At
    // 100 TB: checkpoint to storage instead; the default MEMORY_AND_DISK
    // level spills, it never OOMs.)
    val gated = graft.ScopedCache.replace("pipe.gated",
      base.filter(col("q_pass") && col("l_pass")))

    // 3. LM perplexity gate (CCNet's actual filter): train a bigram LM on
    // the gated corpus's own doc_id % 5 != 0 split, score every gated doc
    // by avg negative log2-likelihood, and drop the worst
    // `lmDropWorstDeciles` deciles PER SOURCE. Rank-based (ntile over
    // (avg_nll, doc_id) — total order, cross-engine deterministic) so no
    // absolute perplexity threshold needs tuning per corpus; per-source
    // partitioning keeps the window parallel over domains (the w6
    // pattern) instead of a global sort. Docs too short to score (< 2
    // tokens) coalesce to the best rank — the quality gate, not the LM,
    // owns short docs. The keep-set is (doc_id)-only, materialized once
    // (Materialize.stable) to serve both the funnel count and the
    // semi-join; document text never enters the window.
    val lmKeep =
      if (cfg.lmDropWorstDeciles <= 0) None
      else {
        val scores = graft.queries.Text.lmScores(gated.select("doc_id", "text"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("source").orderBy(col("avg_nll"), col("doc_id"))
        Some(graft.operators.Materialize.stable(
          gated.select(col("doc_id"), col("source"))
            .join(scores.select(col("doc_id"), col("avg_nll")), Seq("doc_id"), "left")
            .withColumn("avg_nll", coalesce(col("avg_nll"), lit(0.0)))
            .withColumn("lm_decile", ntile(10).over(w))
            .filter(col("lm_decile") <= lit(10 - cfg.lmDropWorstDeciles))
            .select("doc_id")))
      }
    val lmGated = lmKeep match {
      case Some(keep) => gated.join(keep, Seq("doc_id"), "left_semi")
      case None       => gated
    }

    // 4. exact dedup: keep the canonical (min doc_id) copy per content
    // hash. Materialized once (id-sized): it feeds the funnel count, the
    // semi-join below AND (through it) the LSH leg — without the
    // checkpoint each consumer re-runs the content-hash groupBy.
    val canonical = graft.operators.Materialize.stable(
      Dedup.exact(lmGated).select(col("canonical_id").as("doc_id")))
    val exactKept = lmGated.join(canonical, Seq("doc_id"), "left_semi")

    // 5. near dedup: LSH candidates verified exact; drop the larger id of
    // every surviving pair (transitive enough for dedup purposes: every
    // dropped doc has a kept or smaller near-duplicate). The drop set is
    // id-sized but its lineage is the whole banded LSH join — materialize
    // it once, or the funnel count and the decontamination leg each
    // re-run the LSH (measured: the whole pipeline pays the join twice).
    val nearPairs = Dedup.minhashNearDups(exactKept, cfg.nearDupThreshold,
      shingleN = cfg.shingleN)
    val dropIds = graft.operators.Materialize.stable(
      nearPairs.select(col("id_b").as("doc_id")).distinct())
    val nearKept = exactKept.join(dropIds, Seq("doc_id"), "left_anti")

    // 6. decontamination (optional): drop survivors that leak benchmark
    // n-grams — the broadcast semijoin path (eval gram set is
    // benchmark-sized); runs after dedup so only kept docs pay the join.
    // cleanCounted returns the flagged count the census already paid
    // for, so the funnel row below is pure arithmetic (no extra scan).
    val (deconKept, nFlagged) = evalDocs match {
      case Some(ev) if cfg.deconNgram > 0 =>
        graft.operators.Decontaminate.cleanCounted(nearKept, ev, cfg.deconNgram)
      case _ => (nearKept, 0L)
    }

    // 7. pack: redacted text + accounting columns
    val curated = deconKept.select(
      col("doc_id"), col("lang"), col("source"),
      regexp_replace(col("text"), "[0-9]+", "<NUM>").as("text"),
      col("n_tokens"), col("ttr"),
      TextFns.bowFingerprint(col("text")).as("fingerprint"))

    // Funnel accounting WITHOUT recomputing the pipeline per stage
    // (previously five uncached count() actions — five full recomputes):
    //   - n0/n1/n2 fall out of ONE flag aggregation over the scan;
    //   - nLm = the materialized LM keep-set's row count (ids only);
    //   - n3 = number of content-hash groups (one row each in `canonical`);
    //   - n4 = n3 − near-dup drop ids (dropIds ⊆ exact survivors, distinct).
    // Bounded actions only, and `gated` is persisted so the quality scan
    // isn't re-run by the LM/dedup legs.
    val flagAgg = base.agg(
      count(lit(1)).as("n0"),
      sum(when(col("q_pass"), 1L).otherwise(0L)).as("n1"),
      sum(when(col("q_pass") && col("l_pass"), 1L).otherwise(0L)).as("n2")).head
    val n0 = flagAgg.getLong(0)
    val n1 = flagAgg.getLong(1)
    val n2 = flagAgg.getLong(2)
    val n3 = canonical.count()
    val n4 = n3 - dropIds.count()

    val stages =
      Seq((1, "input", n0), (2, "quality_pass", n1), (3, "lang_pass", n2)) ++
        lmKeep.map(k => (4, "lm_pass", k.count())).toSeq ++
        Seq((5, "exact_dedup_pass", n3), (6, "near_dedup_pass", n4)) ++
        (if (evalDocs.isDefined && cfg.deconNgram > 0)
           Seq((7, "decontaminated", n4 - nFlagged))
         else Nil)
    val report = stages.zipWithIndex
      .map { case ((_, stage, rows), i) => (i + 1, stage, rows) }
      .toDF("stage_no", "stage", "rows")
      .withColumn("dropped", lag(col("rows"), 1, n0).over(
        // stage-count-sized frame (≤ 7 rows) — bounded by construction
        org.apache.spark.sql.expressions.Window.orderBy(col("stage_no"))) - col("rows"))

    Result(curated, report)
  }
}
