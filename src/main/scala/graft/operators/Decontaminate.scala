package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFns

/** Benchmark decontamination: flag (and drop) training documents that
  * share word n-grams with a held-out evaluation/benchmark set — the
  * standard leakage guard in LLM training-data pipelines (n-gram overlap
  * decontamination as published for GPT-3 appendix C / PaLM / Llama; the
  * reference warehouse has no analogue, this is a pipeline extension on
  * the `documents` table).
  *
  * Mechanics: both sides are reduced to their DISTINCT n-gram sets via
  * the native `ShingleHash64` expression (one codegen'd pass, strings
  * never materialize); a training doc's contamination count is how many
  * of its distinct n-grams appear anywhere in the eval set.
  *
  * Scale design (100 TB corpus, benchmark sets are MBs):
  *   - the eval n-gram set is built once (explode → distinct — a shuffle
  *     over eval-side grams only, bounded by benchmark size) and
  *     BROADCAST: the corpus-side pass is scan → explode → broadcast
  *     hash-semijoin → partial-aggregated count, no corpus-wide shuffle
  *     of gram rows — only matched (doc_id, hit) pairs (≪ corpus) reach
  *     the final per-doc aggregate.
  *   - `clean` removes flagged docs with a LEFT ANTI join that is
  *     broadcast only when a census confirms the flagged-id set's
  *     estimated broadcast size fits (`graft.decontaminate
  *     .broadcastMaxBytes`, default 256 MiB; ids are fixed-width, so
  *     estimated bytes = rows × 48 B of UnsafeRow + hash-relation entry
  *     overhead ⇒ ~5.6M ids under the default): the set is USUALLY tiny
  *     (benchmark-sized), but a heavily contaminated corpus or a low
  *     `minHits` against a large eval suite can flag a corpus-scale id
  *     set — over the threshold the hint is dropped and the anti-join
  *     plans as a shuffle join instead of a driver-memory hazard.
  *   - grams are compared as 64-bit xxhash values, same convention as the
  *     MinHash/PPJoin family: a false hit needs two distinct n-grams with
  *     equal xxhash64 — P ≈ |grams|²/2⁶⁴, negligible at corpus scale.
  */
object Decontaminate {

  /** Deterministic eval-split condition (md5 hex-prefix, shared with the
    * oracle): the held-out `frac` of docs keyed by `keyCol` plays the
    * benchmark set in fixtures; production calls pass a real eval corpus
    * to `contaminationHits` directly.
    */
  def isEval(keyCol: Column, frac: Double): Column =
    Sampling.inHashSample(keyCol, frac)

  /** Distinct n-gram hash set of a corpus, one row per gram. */
  def gramSet(docs: DataFrame, textCol: String, n: Int): DataFrame =
    docs.select(explode(TextFns.shingleHashes(col(textCol), n)).as("gram"))
      .distinct()

  /** Per-training-doc contamination: (doc_id, matched_ngrams) for every
    * train doc sharing ≥ 1 distinct n-gram with the eval set.
    */
  def contaminationHits(train: DataFrame, evalDocs: DataFrame,
      n: Int, textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val evalGrams = gramSet(evalDocs, textCol, n)
    train
      .select(col(idCol), explode(TextFns.shingleHashes(col(textCol), n)).as("gram"))
      .join(broadcast(evalGrams), "gram")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("matched_ngrams"))
  }

  /** GRADED contamination: every train doc with its distinct-n-gram
    * census, matched-gram count, and overlap fraction — the score a
    * curation policy thresholds (vs the binary verdict `clean` applies).
    * The per-doc total is a map-side size() — no second gram shuffle;
    * only the (bounded) hit counts join back onto the census.
    */
  def contaminationRate(train: DataFrame, evalDocs: DataFrame,
      n: Int, textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val totals = train.select(col(idCol),
      size(TextFns.shingleHashes(col(textCol), n)).cast("long")
        .as("total_ngrams"))
    totals.join(contaminationHits(train, evalDocs, n, textCol, idCol),
        Seq(idCol), "left")
      .select(col(idCol), col("total_ngrams"),
        coalesce(col("matched_ngrams"), lit(0L)).as("matched_ngrams"),
        (coalesce(col("matched_ngrams"), lit(0L)) * lit(1.0) /
          col("total_ngrams")).as("contamination_rate"))
  }

  /** Cleaned corpus: `docs` minus training docs with ≥ `minHits` eval
    * n-gram overlaps (eval rows themselves are not part of the output).
    * The flagged-id set — already aggregated to one row per contaminated
    * doc, ≪ the gram stream — is materialized once via
    * [[Materialize.stable]] and its census (one count over that bounded
    * table, ids never touch the driver) gates the broadcast hint — see
    * the object scaladoc.
    *
    * EAGER at construction: the census runs a Spark job before the
    * returned frame exists. At-scale callers should set a reliable
    * checkpoint dir so the materialized id set survives executor loss;
    * without one it lives executor-local (spills to local disk, but is
    * not recomputable).
    */
  def clean(train: DataFrame, evalDocs: DataFrame, n: Int,
      minHits: Long = 1L, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    cleanCounted(train, evalDocs, n, minHits, textCol, idCol)._1

  /** `clean` plus the FLAGGED-id count the census already paid for —
    * callers accounting a funnel derive the survivor count as
    * |train| − flagged arithmetically instead of re-scanning the cleaned
    * frame (flagged ⊆ train by construction, so the subtraction is
    * exact).
    */
  def cleanCounted(train: DataFrame, evalDocs: DataFrame, n: Int,
      minHits: Long = 1L, textCol: String = "text",
      idCol: String = "doc_id"): (DataFrame, Long) = {
    val maxBytes = train.sparkSession.conf
      .getOption("graft.decontaminate.broadcastMaxBytes")
      .map(_.toLong).getOrElse(256L << 20)
    val flagged = Materialize.stable(
      contaminationHits(train, evalDocs, n, textCol, idCol)
        .filter(col("matched_ngrams") >= minHits)
        .select(col(idCol)))
    // ids are fixed-width: estimated broadcast size is rows × 48 B
    // (UnsafeRow + hash-relation entry overhead per id).
    val nFlagged = flagged.count()
    val hinted = if (nFlagged * 48L <= maxBytes) broadcast(flagged) else flagged
    (train.join(hinted, Seq(idCol), "left_anti"), nFlagged)
  }
}
