package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis building blocks for large-scale training-data pipelines:
  * tokenization, shingling, quality scoring, language-ID heuristics,
  * document fingerprinting. All pure `Column` expressions (codegen'd,
  * no UDFs) so they stay inside whole-stage codegen over 100 TB of text.
  */
object TextFns {

  /** Whitespace tokenization (single-space convention of the fixtures).
    * For messy real-world text use `tokensRegex`.
    */
  def tokens(text: Column): Column = split(text, " ")

  /** BPE-ish regex tokenization: word pieces OR single non-space symbols. */
  def tokensRegex(text: Column): Column =
    // \p{L}+ letter runs, \d+ digit runs, else single non-space chars
    regexp_extract_all(text, lit("[\\p{L}]+|[0-9]+|[^\\s\\p{L}0-9]"), lit(0))

  def tokenCount(text: Column): Column = size(tokens(text))

  /** n-word shingles (distinct) over a token ARRAY column, the unit for
    * Jaccard/MinHash dedup. Documents shorter than n words yield an empty
    * set. `toks` must be a bound column (`df.select(tokens(...).as("w"))`
    * first), never an inline `split(...)` expression: HOF lambda bodies
    * evaluate interpreted with no subexpression elimination, so a free
    * split inside the lambda re-runs per array index — O(len²) per
    * document (the round-5 tx_lm_perplexity regression; ExplainCheck
    * lints the pattern across every registered query plan).
    */
  def shingles(toks: Column, n: Int): Column =
    array_distinct(shinglesAll(toks, n))

  /** DISTINCT 64-bit hashes of the n-word shingles, via the native
    * codegen'd [[graft.plans.ShingleHash64]] expression — the form every
    * set-similarity operator consumes (sizes, intersections, MinHash
    * families all work on the hashes; the strings never materialize).
    * Bit-identical to `xxhash64` of each `shingles` element.
    */
  def shingleHashes(text: Column, n: Int): Column =
    graft.plans.ShingleHash64.shingle_hash64(tokens(text), n)

  /** n-word shingles with multiplicity over a token ARRAY column (for
    * frequency statistics — `shingles` deduplicates for set-similarity
    * use). Same bound-column contract as `shingles`.
    */
  def shinglesAll(toks: Column, n: Int): Column = {
    // guard, don't clamp: sequence(1, 0) generates a DESCENDING [1, 0]
    // (Spark's sequence walks backwards when stop < start), whose 0
    // start then crashes slice() — a doc below the shingle width must
    // yield the EMPTY list, same contract as the native ShingleHash64
    val cnt = size(toks) - (n - 1)
    when(cnt <= 0, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(1), cnt),
        i => array_join(slice(toks, i, lit(n)), " ")))
  }

  /** Mean token length (0.0 for empty docs). */
  def avgTokenLength(text: Column): Column = {
    val toks = tokens(text)
    when(size(toks) === 0, 0.0).otherwise(
      aggregate(transform(toks, t => length(t)), lit(0L), (acc, x) => acc + x)
        .cast("double") / size(toks))
  }

  /** Fraction of tokens found in `stopwords` (language-ID / quality signal). */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val toks = tokens(text)
    when(size(toks) === 0, 0.0).otherwise(
      size(filter(toks, t => t.isInCollection(stopwords))).cast("double") / size(toks))
  }

  /** Ratio of punctuation characters to total characters. */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, 0.0).otherwise(
      (length(text) - length(regexp_replace(text, "[\\p{Punct}]", "")))
        .cast("double") / length(text))

  /** Type-token ratio — lexical diversity (distinct tokens / tokens). */
  def typeTokenRatio(text: Column): Column = {
    val toks = tokens(text)
    when(size(toks) === 0, 0.0)
      .otherwise(size(array_distinct(toks)).cast("double") / size(toks))
  }

  /** Composite document-quality score (length + lexical diversity +
    * stopword-ratio mix) — THE quality signal of the pipeline, shared by
    * tx_quality_score, w6_quality_ntile and the curation funnel's oracle
    * twins; keep the formula here so the consumers can't drift apart.
    */
  def qualityScore(text: Column): Column =
    lit(0.4) * least(tokenCount(text) / 100.0, lit(1.0)) +
      lit(0.4) * typeTokenRatio(text) +
      lit(0.2) * least(stopwordRatio(text, Seq("the", "a")) * 5, lit(1.0))

  /** Document fingerprint: md5 of the sorted distinct token set — the
    * canonical bag-of-words identity used for fuzzy-exact dedup (robust to
    * word order and repetition, cheap enough to compute in one pass).
    */
  def bowFingerprint(text: Column): Column =
    md5(array_join(array_sort(array_distinct(tokens(text))), " "))

  /** Exact-content fingerprint. */
  def exactFingerprint(text: Column): Column = md5(text)

  /** 64-bit rolling-hash-style fingerprint of the token sequence:
    * xxhash64 folded left over tokens — order-sensitive, constant memory.
    */
  def seqFingerprint(text: Column): Column =
    aggregate(tokens(text), lit(1469598103934665603L),
      (acc, t) => xxhash64(acc, t))
}
