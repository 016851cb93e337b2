package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Decontaminate, Packing}
import graft.pipeline.CorpusPipeline

/** End-to-end pipeline compositions exposed as queries. */
object PipelineQ {

  /** Full corpus-curation funnel (quality → lang → LM perplexity gate →
    * exact dedup → MinHash near-dedup → decontamination → pack) — the
    * composed LLM-training-data pipeline, graded against a DuckDB oracle
    * that recomputes every stage from first principles: the quality/TTR
    * flags and md5 exact-dedup are directly SQL-expressible; the LM stage
    * is the tx_lm_perplexity model (add-one bigram LM trained on the
    * gated corpus's own %5 split) followed by a per-source ntile(10) gate
    * with a (avg_nll, doc_id) total order — rank semantics identical
    * across engines; the near-dedup drop set is the brute-force all-pairs
    * jaccard ≥ 0.7 join over the exact-kept docs — which the engine's
    * banded LSH+verify path must reproduce exactly (the
    * minhash_missed/extra_pairs quant gates prove that equivalence on
    * these fixtures, same contract as dd_minhash_lsh); and the final
    * stage drops survivors sharing a distinct 5-gram with the held-out
    * 10% eval split (the pipe_decontaminate contract, hashed grams ≡
    * string grams modulo xxhash64 collisions).
    */
  val pipeCorpusReport = QueryDef(
    "pipe_corpus_report",
    Some(s"""WITH base AS (
           |  SELECT doc_id, text, source,
           |         len(string_split(text, ' ')) AS n_tok,
           |         len(list_distinct(string_split(text, ' '))) * 1.0 /
           |           len(string_split(text, ' ')) AS ttr
           |  FROM documents
           |  WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)
           |          >= '${graft.operators.Sampling.hexThreshold(0.1)}'),
           |gated AS (SELECT * FROM base WHERE n_tok >= 20 AND ttr >= 0.05),
           |d AS (SELECT doc_id, string_split(text, ' ') AS w FROM gated),
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
           |g AS (SELECT doc_id, unnest(bgs) AS b FROM bgl),
           |scored AS (SELECT g.doc_id, coalesce(cb.c, 0) AS cbi,
           |                  coalesce(cw.c, 0) AS cwi, vv.v AS v
           |           FROM g LEFT JOIN cb ON g.b = cb.b
           |                  LEFT JOIN cw ON string_split(g.b, ' ')[1] = cw.t
           |                  CROSS JOIN vv),
           |nll AS (SELECT doc_id, round(avg(-log2((cbi + 1.0) / (cwi + v))), 4) AS avg_nll
           |        FROM scored GROUP BY doc_id),
           |lmkeep AS (SELECT doc_id FROM (
           |    SELECT gt.doc_id,
           |           ntile(10) OVER (PARTITION BY gt.source
           |             ORDER BY coalesce(nll.avg_nll, 0.0), gt.doc_id) AS dec
           |    FROM gated gt LEFT JOIN nll ON gt.doc_id = nll.doc_id)
           |  WHERE dec <= 9),
           |lmg AS (SELECT g.* FROM gated g JOIN lmkeep k ON g.doc_id = k.doc_id),
           |canon AS (SELECT min(doc_id) AS doc_id FROM lmg GROUP BY md5(text)),
           |kept AS (SELECT g.* FROM lmg g JOIN canon c ON g.doc_id = c.doc_id),
           |sh AS (SELECT doc_id,
           |         list_distinct([array_to_string(w[i:i+2], ' ')
           |                        FOR i IN range(1, greatest(len(w)-1, 1))]) AS s
           |       FROM (SELECT doc_id, string_split(text, ' ') AS w FROM kept)),
           |drops AS (SELECT DISTINCT b.doc_id
           |          FROM sh a JOIN sh b ON a.doc_id < b.doc_id
           |          WHERE len(list_intersect(a.s, b.s)) * 1.0 /
           |                (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.7),
           |survivors AS (SELECT k.doc_id, k.text FROM kept k
           |              LEFT JOIN drops d ON k.doc_id = d.doc_id
           |              WHERE d.doc_id IS NULL),
           |ev AS (SELECT string_split(text, ' ') AS w FROM documents
           |       WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)
           |               < '${graft.operators.Sampling.hexThreshold(0.1)}'),
           |evg AS (SELECT DISTINCT unnest([array_to_string(w[i:i+4], ' ')
           |                                FOR i IN range(1, greatest(len(w) - 3, 1))]) AS g
           |        FROM ev),
           |flagged AS (SELECT DISTINCT t.doc_id
           |            FROM (SELECT doc_id,
           |                         unnest(list_distinct([array_to_string(w[i:i+4], ' ')
           |                                FOR i IN range(1, greatest(len(w) - 3, 1))])) AS g
           |                  FROM (SELECT doc_id, string_split(text, ' ') AS w
           |                        FROM survivors)) t
           |            JOIN evg e ON t.g = e.g),
           |counts AS (
           |  SELECT 1 AS stage_no, 'input' AS stage, (SELECT count(*) FROM base) AS "rows"
           |  UNION ALL SELECT 2, 'quality_pass', (SELECT count(*) FROM gated)
           |  UNION ALL SELECT 3, 'lang_pass', (SELECT count(*) FROM gated)
           |  UNION ALL SELECT 4, 'lm_pass', (SELECT count(*) FROM lmkeep)
           |  UNION ALL SELECT 5, 'exact_dedup_pass', (SELECT count(*) FROM canon)
           |  UNION ALL SELECT 6, 'near_dedup_pass',
           |    (SELECT count(*) FROM canon) - (SELECT count(*) FROM drops)
           |  UNION ALL SELECT 7, 'decontaminated',
           |    (SELECT count(*) FROM survivors) - (SELECT count(*) FROM flagged))
           |SELECT stage_no, stage, CAST("rows" AS BIGINT) AS "rows",
           |       CAST(COALESCE(lag("rows") OVER (ORDER BY stage_no), "rows") - "rows"
           |            AS BIGINT) AS dropped
           |FROM counts""".stripMargin),
    (spark, dir) => {
      val docs = Tables.documents(spark, dir)
      val isEval = Decontaminate.isEval(col("doc_id"), 0.1)
      CorpusPipeline.run(docs.filter(!isEval),
          CorpusPipeline.Config(minTokens = 20, minTtr = 0.05,
            nearDupThreshold = 0.7),
          evalDocs = Some(docs.filter(isEval)))
        .report.orderBy(col("stage_no"))
    })

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

  /** Benchmark decontamination: flag training docs sharing 5-word n-grams
    * with a held-out 10% eval split (GPT-3-appendix-C-style leakage
    * guard). The engine runs hashed-gram broadcast semijoin (eval gram
    * set is benchmark-sized → broadcast; no corpus-wide shuffle); the
    * oracle recomputes the same overlap with string grams — equal unless
    * two distinct 5-grams collide under xxhash64 (P ≈ |grams|²/2⁶⁴).
    * 5-grams (not 3) because the fixture vocabulary makes 3-grams
    * ubiquitous across unrelated docs; at 5 the planted near-dup pairs
    * dominate the contaminated set.
    */
  val pipeDecontaminate = QueryDef(
    "pipe_decontaminate",
    Some(s"""WITH split AS (
            |  SELECT doc_id, text,
            |         substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)
            |           < '${graft.operators.Sampling.hexThreshold(0.1)}' AS is_eval
            |  FROM documents),
            |tr AS (SELECT doc_id, string_split(text, ' ') AS w FROM split WHERE NOT is_eval),
            |ev AS (SELECT string_split(text, ' ') AS w FROM split WHERE is_eval),
            |evg AS (SELECT DISTINCT unnest([array_to_string(w[i:i+4], ' ')
            |                                FOR i IN range(1, greatest(len(w) - 3, 1))]) AS g
            |        FROM ev),
            |trg AS (SELECT doc_id,
            |               unnest(list_distinct([array_to_string(w[i:i+4], ' ')
            |                      FOR i IN range(1, greatest(len(w) - 3, 1))])) AS g
            |        FROM tr)
            |SELECT t.doc_id, CAST(count(*) AS BIGINT) AS matched_ngrams
            |FROM trg t JOIN evg e ON t.g = e.g
            |GROUP BY t.doc_id""".stripMargin),
    (spark, dir) => {
      val docs = Tables.documents(spark, dir)
      val isEval = Decontaminate.isEval(col("doc_id"), 0.1)
      Decontaminate.contaminationHits(
        docs.filter(!isEval), docs.filter(isEval), n = 5)
    })

  /** GRADED contamination: every train doc's distinct-5-gram census,
    * matched-gram count, and overlap FRACTION — the thresholdable score
    * behind pipe_decontaminate's binary verdict (a doc 90% covered by
    * eval grams is a leak; one sharing a single idiom may not be). The
    * per-doc total is a map-side size(), so the only joined stream is
    * the bounded hit table (Decontaminate.contaminationRate).
    */
  val pipeContaminationRate = QueryDef(
    "pipe_contamination_rate",
    Some(s"""WITH split AS (
            |  SELECT doc_id, text,
            |         substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)
            |           < '${graft.operators.Sampling.hexThreshold(0.1)}' AS is_eval
            |  FROM documents),
            |tr AS (SELECT doc_id, string_split(text, ' ') AS w FROM split WHERE NOT is_eval),
            |ev AS (SELECT string_split(text, ' ') AS w FROM split WHERE is_eval),
            |evg AS (SELECT DISTINCT unnest([array_to_string(w[i:i+4], ' ')
            |                                FOR i IN range(1, greatest(len(w) - 3, 1))]) AS g
            |        FROM ev),
            |trg AS (SELECT doc_id,
            |               unnest(list_distinct([array_to_string(w[i:i+4], ' ')
            |                      FOR i IN range(1, greatest(len(w) - 3, 1))])) AS g
            |        FROM tr),
            |tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS total_ngrams
            |        FROM trg GROUP BY 1),
            |hits AS (SELECT t.doc_id, CAST(count(*) AS BIGINT) AS matched
            |         FROM trg t JOIN evg e ON t.g = e.g GROUP BY 1)
            |SELECT tot.doc_id, total_ngrams,
            |       coalesce(matched, 0) AS matched_ngrams,
            |       round(coalesce(matched, 0) * 1.0 / total_ngrams, 4) AS contamination_rate
            |FROM tot LEFT JOIN hits ON tot.doc_id = hits.doc_id""".stripMargin),
    (spark, dir) => {
      val docs = Tables.documents(spark, dir)
      val isEval = Decontaminate.isEval(col("doc_id"), 0.1)
      Decontaminate.contaminationRate(
          docs.filter(!isEval), docs.filter(isEval), n = 5)
        .select(col("doc_id"), col("total_ngrams"), col("matched_ngrams"),
          graft.functions.Fns.r4(col("contamination_rate"))
            .as("contamination_rate"))
    })

  /** Token-budget water-filling: allocate a global token budget across
    * sources so no source exceeds the common level L, chosen such that
    * Σ min(tokens_s, L) = budget — the fair-allocation primitive behind
    * "cap the over-represented domains, keep the small ones whole"
    * mixture planning. The iterative level search has a closed form over
    * the sources sorted by size: with prefix sums P and rank i, the
    * level candidate is (budget − P_{i−1})/(n − i + 1), and the binding
    * level is the candidate at the first rank whose tokens exceed it —
    * pure window functions, one pass, no loop. NULL level (budget covers
    * everything) degrades to full funding.
    *
    * Scale design: the per-source token census is the only corpus-scale
    * aggregation; everything after runs on #sources rows. The level is a
    * 1-row aggregate broadcast back. Allocation conservation
    * (Σ alloc = budget) is pinned in NewOpsR8bSpec.
    */
  val pipeTokenWaterfill = QueryDef(
    "pipe_token_waterfill",
    Some("""WITH st AS (SELECT source,
           |                   CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS tokens
           |            FROM documents GROUP BY 1),
           |tot AS (SELECT CAST(floor(0.6 * sum(tokens)) AS BIGINT) AS budget FROM st),
           |r AS (SELECT source, tokens,
           |             CAST(row_number() OVER (ORDER BY tokens, source) AS BIGINT) AS rn,
           |             CAST(count(*) OVER () AS BIGINT) AS n,
           |             CAST(coalesce(sum(tokens) OVER (ORDER BY tokens, source
           |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           |               AS BIGINT) AS prefix
           |      FROM st),
           |c AS (SELECT r.*, (budget - prefix) / (n - rn + 1) AS cand_l
           |      FROM r, tot),
           |lvl AS (SELECT arg_min(cand_l, rn) AS l FROM c WHERE tokens > cand_l)
           |SELECT source, tokens,
           |       round(least(CAST(tokens AS DOUBLE),
           |                   coalesce(l, CAST(tokens AS DOUBLE))), 4) AS alloc
           |FROM c, lvl""".stripMargin),
    (spark, dir) => {
      import org.apache.spark.sql.expressions.Window
      val st = Tables.documents(spark, dir)
        .groupBy("source")
        .agg(sum(size(split(col("text"), " ")).cast("long")).as("tokens"))
      val tot = st.agg(floor(lit(0.6) * sum(col("tokens"))).cast("long")
        .as("budget"))
      // unpartitioned over the per-SOURCE census (|sources| rows —
      // bounded by the catalog of sources, never by documents)
      val byTok = Window.orderBy(col("tokens"), col("source"))
      val r = st
        .withColumn("rn", row_number().over(byTok).cast("long"))
        .withColumn("n", count(lit(1)).over(
          Window.partitionBy()).cast("long"))
        .withColumn("prefix", coalesce(sum(col("tokens")).over(
            byTok.rowsBetween(Window.unboundedPreceding, -1)), lit(0L))
          .cast("long"))
      val c = r.crossJoin(broadcast(tot))
        .withColumn("cand_l",
          (col("budget") - col("prefix")) / (col("n") - col("rn") + 1))
      val lvl = c.filter(col("tokens") > col("cand_l"))
        .agg(min_by(col("cand_l"), col("rn")).as("l"))
      c.crossJoin(broadcast(lvl))
        .select(col("source"), col("tokens"),
          round(least(col("tokens").cast("double"),
            coalesce(col("l"), col("tokens").cast("double"))), 4).as("alloc"))
    })

  /** Dataset card: the one-row corpus summary a training-data release
    * ships with — volume (docs/sources/tokens/vocabulary), central
    * quality, exact-duplication rate, and language-mix entropy. Each
    * number is a one-pass aggregate; the card is the join of four
    * 1-row frames (all broadcast). The per-metric deep dives are their
    * own queries (tx_*, dd_*, smp_ess); this is the cover sheet.
    */
  val pipeDatasetCard = QueryDef(
    "pipe_dataset_card",
    Some("""WITH f AS (
           |  SELECT doc_id, text, lang, source,
           |         len(string_split(text, ' ')) AS n_tokens,
           |         len(list_distinct(string_split(text, ' '))) * 1.0 /
           |           len(string_split(text, ' ')) AS ttr,
           |         len([t FOR t IN string_split(text, ' ') IF t IN ('the', 'a')]) * 1.0 /
           |           len(string_split(text, ' ')) AS stop_ratio
           |  FROM documents),
           |q AS (SELECT doc_id, text, lang, source, n_tokens,
           |             0.4 * least(n_tokens / 100.0, 1.0) + 0.4 * ttr
           |               + 0.2 * least(stop_ratio * 5, 1.0) AS quality FROM f),
           |lang_h AS (
           |  SELECT -sum(p * ln(p)) AS h FROM (
           |    SELECT count(*) * 1.0 / (SELECT count(*) FROM documents) AS p
           |    FROM documents GROUP BY lang)),
           |vocab AS (SELECT CAST(count(DISTINCT t) AS BIGINT) AS v FROM (
           |  SELECT unnest(string_split(text, ' ')) AS t FROM documents)
           |  WHERE t != '')
           |SELECT CAST(count(*) AS BIGINT) AS n_docs,
           |       CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
           |       CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
           |       (SELECT v FROM vocab) AS vocab,
           |       round(avg(quality), 4) AS mean_quality,
           |       round(1.0 - count(DISTINCT text) * 1.0 / count(*), 4)
           |         AS exact_dup_rate,
           |       round((SELECT h FROM lang_h), 4) AS lang_entropy
           |FROM q""".stripMargin),
    (spark, dir) => {
      import graft.functions.TextFns
      val docs = Tables.documents(spark, dir)
      val q = docs.select(col("text"), col("lang"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"),
        TextFns.qualityScore(col("text")).as("quality"))
      val main = q.agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("source")).as("n_sources"),
        sum(col("n_tokens")).as("n_tokens"),
        round(avg(col("quality")), 4).as("mean_quality"),
        round(lit(1.0) - countDistinct(col("text")) * lit(1.0) / count(lit(1)), 4)
          .as("exact_dup_rate"))
      val nDocs = docs.count().toDouble
      val langH = docs.groupBy("lang").agg(count(lit(1)).as("c"))
        .select((col("c") * lit(1.0) / lit(nDocs)).as("p"))
        .agg(round(-sum(col("p") * log(col("p"))), 4).as("lang_entropy"))
      val vocab = docs
        .select(explode(split(col("text"), " ")).as("t"))
        .filter(col("t") =!= "")
        .agg(countDistinct(col("t")).as("vocab"))
      main.crossJoin(broadcast(vocab)).crossJoin(broadcast(langH))
        .select(col("n_docs"), col("n_sources"), col("n_tokens"), col("vocab"),
          col("mean_quality"), col("exact_dup_rate"), col("lang_entropy"))
    })

  /** Per-source curation savings from span-level exact-substring dedup:
    * what fraction of each source's tokens disappears when every
    * non-canonical duplicated 8-token span is trimmed
    * (`Dedup.trimDupSpans`). This is the roll-up that turns the per-doc
    * census into a curation decision — a source with a high trim_frac
    * is boilerplate-heavy and gets span-trim (not whole-doc drop) in
    * the pipeline. One doc-keyed join onto the trim output (doc-sized,
    * never window-sized) and a #sources-row census.
    */
  val pipeTrimSavings = QueryDef(
    "pipe_trim_savings",
    Some("""WITH w AS (SELECT doc_id, source, string_split(text, ' ') AS w
           |           FROM documents),
           |g AS (SELECT doc_id, i, array_to_string(w[i:i+7], ' ') AS g
           |      FROM (SELECT doc_id, w,
           |                   unnest(range(1, greatest(len(w) - 6, 1))) AS i
           |            FROM w)),
           |own AS (SELECT g, min(doc_id) AS owner FROM g
           |        GROUP BY g HAVING min(doc_id) <> max(doc_id)),
           |dup AS (SELECT g.doc_id, g.i FROM g JOIN own USING (g)
           |        WHERE g.doc_id <> own.owner),
           |cov AS (SELECT DISTINCT doc_id, unnest(range(i, i + 8)) AS ti FROM dup),
           |kept AS (SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_kept
           |         FROM (SELECT doc_id, unnest(range(1, len(w) + 1)) AS ti
           |               FROM w) t
           |         LEFT JOIN cov c ON t.doc_id = c.doc_id AND t.ti = c.ti
           |         WHERE c.doc_id IS NULL GROUP BY 1)
           |SELECT w.source, CAST(sum(len(w.w)) AS BIGINT) AS n_tokens,
           |       CAST(sum(coalesce(k.n_kept, 0)) AS BIGINT) AS n_kept,
           |       round(1.0 - sum(coalesce(k.n_kept, 0)) * 1.0
           |             / sum(len(w.w)), 4) AS trim_frac
           |FROM w LEFT JOIN kept k USING (doc_id)
           |GROUP BY 1""".stripMargin),
    (spark, dir) => {
      val docs = Tables.documents(spark, dir)
      graft.operators.Dedup.trimDupSpans(docs, n = 8)
        .join(docs.select(col("doc_id"), col("source")), "doc_id")
        .groupBy("source")
        .agg(sum(col("n_tokens")).as("n_tokens"),
          sum(col("n_kept")).as("n_kept"),
          round(lit(1.0) - sum(col("n_kept")) * lit(1.0) /
            sum(col("n_tokens")), 4).as("trim_frac"))
    })

  val all: Seq[QueryDef] = Seq(pipeCorpusReport, pipePackShards,
    pipeDecontaminate, pipeContaminationRate, pipeTokenWaterfill,
    pipeDatasetCard, pipeTrimSavings)
}
