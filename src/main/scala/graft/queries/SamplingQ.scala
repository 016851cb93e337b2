package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Fns.r4
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

  /** Exact-k deterministic sample: the 75 hash-smallest doc_ids — the
    * "exactly N eval docs" budget a rate sample can't hit; plans as
    * TakeOrderedAndProject (per-partition heaps, no global sort).
    */
  val smpExactK = QueryDef(
    "smp_exact_k",
    Some("""SELECT doc_id, source FROM documents
           |ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id LIMIT 75""".stripMargin),
    (spark, dir) =>
      Sampling.exactKSample(Tables.documents(spark, dir), "doc_id", 75)
        .select(col("doc_id"), col("source")))

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

  /** Deterministic Poissonized bootstrap: B = 32 resampling replicas
    * where each row's multiplicity in replica b is Poisson(1)-distributed
    * via the hash variate of (row key, b) pushed through the Poisson CDF
    * as integer thresholds of [0, 65536) — the classic streaming
    * bootstrap (one pass, no resampled copies materialized per replica
    * beyond the weight column), made bit-reproducible by replacing RNG
    * with the engine's portable md5 variate. Output is the full replica
    * table (replica, effective n, weighted mean); any CI is a quantile
    * over these 32 rows. Thresholds are hardcoded integers so no float
    * CDF is ever compared cross-engine.
    *
    * Hash budget: each row computes FOUR md5 digests (k, k~, k~~, k~~~)
    * and every replica b reads its own disjoint 16-bit slice of digest
    * b/8 at offset 4·(b mod 8) — 32 independent variates for 4 hashes,
    * which is what keeps the 32× row blow-up from being 32× the hash
    * cost. The slices come from the native [[graft.plans.Md5Variates]]
    * expression (digest-byte reads, no hex-string round trip); the
    * DuckDB oracle recomputes the identical values from the hex form.
    *
    * Parallelism: the per-row work (4 md5 + 32 hex-slice decodes) is
    * CPU-bound, and the sf0.1 fixture is ONE small parquet file — one
    * input split, so without intervention the whole fan-out runs on a
    * single core (measured 11.7s warm). When the scan yields fewer
    * partitions than cores, shuffle the three skinny input columns
    * (two longs + a double — ~trivial bytes vs the compute) across
    * defaultParallelism first; measured 2.0s warm in a full-suite
    * session / 3.9s cold-session (min-of-2, sf0.1/local[32]) after the
    * spread, vs 11.7s single-split. On a real 100 TB layout the scan
    * already has more splits than cores and the spread is a no-op
    * (no shuffle).
    */
  val smpBootstrap = QueryDef(
    "smp_bootstrap",
    Some {
      // 16-bit variate from digest characters off+1..off+4 (1-based)
      def poly(d: String, off: String) =
        Seq(4096, 256, 16, 1).zipWithIndex.map { case (p, i) =>
          s"(strpos('0123456789abcdef', substr($d, $off + ${i + 1}, 1)) - 1) * $p"
        }.mkString(" + ")
      s"""WITH r AS (SELECT unnest(range(0, 32)) AS b),
         |x AS (SELECT [md5(k), md5(k || '~'), md5(k || '~~'), md5(k || '~~~')] AS hs, v FROM (
         |        SELECT CAST(l_orderkey AS VARCHAR) || '_' || CAST(l_linenumber AS VARCHAR) AS k,
         |               l_extendedprice AS v
         |        FROM lineitem)),
         |u AS (SELECT b, v,
         |             ${poly("x.hs[CAST(b // 8 AS INTEGER) + 1]", "CAST((b % 8) * 4 AS INTEGER)")} AS hvar
         |      FROM x CROSS JOIN r),
         |w AS (SELECT b, v, CASE WHEN hvar < 24109 THEN 0 WHEN hvar < 48218 THEN 1
         |                        WHEN hvar < 60273 THEN 2 WHEN hvar < 64291 THEN 3
         |                        ELSE 4 END AS w
         |      FROM u)
         |SELECT b AS replica, CAST(sum(w) AS BIGINT) AS n_eff,
         |       round(sum(w * v) / sum(w), 4) AS boot_mean
         |FROM w GROUP BY 1""".stripMargin
    },
    (spark, dir) => {
      // engine side never explodes the fact 32×: all 32 replicas are
      // static aggregation columns over one codegen pass of the scan
      // (digest offsets are compile-time constants), and only the
      // single census row fans back out to (replica, ...) rows
      val k = concat(col("l_orderkey").cast("string"), lit("_"),
        col("l_linenumber").cast("string"))
      val base = Tables.lineitem(spark, dir)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      // CPU-bound fan-out: spread the skinny columns if the scan has
      // fewer splits than cores (see scaladoc; no-op on large layouts)
      val cores = spark.sparkContext.defaultParallelism
      val spread =
        if (base.rdd.getNumPartitions < cores) base.repartition(cores) else base
      // native md5_variates: all 32 16-bit variates read straight from
      // the 4 digests' bytes in one codegen'd pass — no hex strings, no
      // conv() parsing (the composed form materialized four 32-char hex
      // strings per row and re-parsed 128 hex chars; VectorExprSpec pins
      // bit-parity between the two)
      val x = spread
        .select(col("l_extendedprice").as("v"),
          graft.plans.Md5Variates.md5_variates(k, 32).as("vs"))
      def wOf(b: Int) = {
        val hvar = element_at(col("vs"), b + 1)
        when(hvar < 24109, 0).when(hvar < 48218, 1)
          .when(hvar < 60273, 2).when(hvar < 64291, 3).otherwise(4)
      }
      // project each replica weight ONCE (32 slice reads per row in
      // one codegen'd projection) instead of re-evaluating wOf(b) inside
      // both of its aggregates (64 reads per row through the agg paths)
      val withW = x.select(
        col("v") +: (0 until 32).map(b => wOf(b).as(s"w_$b")): _*)
      val cells = (0 until 32).flatMap { b =>
        Seq(sum(col(s"w_$b")).cast("long").as(s"n_$b"),
          round(sum(col(s"w_$b") * col("v")) / sum(col(s"w_$b")), 4).as(s"m_$b"))
      }
      withW.agg(cells.head, cells.tail: _*)
        .select(posexplode(array((0 until 32).map(b =>
          struct(col(s"n_$b").as("n_eff"), col(s"m_$b").as("boot_mean"))): _*))
          .as(Seq("replica", "s")))
        .select(col("replica"), col("s.n_eff"), col("s.boot_mean"))
    })

  /** SQL for the numeric value of the first 4 hex chars of md5(key) —
    * the portable uniform [0,65536) variate (no hex-parsing builtins
    * assumed; a 4-term strpos polynomial works in any engine).
    */
  private[queries] def hexValSql(key: String): String = {
    val h = s"md5(CAST($key AS VARCHAR))"
    Seq(4096, 256, 16, 1).zipWithIndex.map { case (p, i) =>
      s"(strpos('0123456789abcdef', substr($h, ${i + 1}, 1)) - 1) * $p"
    }.mkString(" + ")
  }

  /** Domain-mixture reweighting: reshape the uniform 20-source fixture
    * mix toward weights w_s = (source index + 1) under a 2/5 global
    * budget — per-source acceptance thresholds from exact integer
    * arithmetic (BigInt in the engine, HUGEINT in the oracle), applied
    * as a deterministic hash filter. Output is the per-source kept/total
    * census, which pins every threshold exactly.
    */
  val smpMixtureReweight = QueryDef(
    "smp_mixture_reweight",
    Some(s"""WITH cnt AS (
            |  SELECT source, CAST(count(*) AS BIGINT) AS c,
            |         CAST(replace(source, 'src', '') AS BIGINT) + 1 AS wt
            |  FROM documents GROUP BY source),
            |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n,
            |               CAST(sum(wt) AS BIGINT) AS wsum FROM cnt),
            |thr AS (
            |  SELECT source,
            |         least(CAST(65536 AS BIGINT),
            |               CAST((CAST(65536 AS HUGEINT) * 2 * wt * n)
            |                    // (CAST(5 AS HUGEINT) * wsum * c) AS BIGINT)) AS t
            |  FROM cnt, tot)
            |SELECT d.source,
            |       CAST(sum(CASE WHEN ${hexValSql("d.doc_id")} < thr.t
            |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
            |       CAST(count(*) AS BIGINT) AS n_total
            |FROM documents d JOIN thr ON d.source = thr.source
            |GROUP BY d.source""".stripMargin),
    (spark, dir) => {
      val docs = Tables.documents(spark, dir)
      val thr = Sampling.mixtureThresholds(docs, "source",
        s => s.stripPrefix("src").toLong + 1, budgetNum = 2, budgetDen = 5)
      val thrCol = thr.foldLeft(lit(0L)) { case (acc, (s, t)) =>
        when(col("source") === s, lit(t)).otherwise(acc)
      }
      docs
        .groupBy(col("source"))
        .agg(
          sum(when(Sampling.hexVal(col("doc_id")) < thrCol, 1L).otherwise(0L))
            .as("n_kept"),
          count(lit(1)).as("n_total"))
    })

  /** 80/10/10 train/val/test split census per source: the split column is
    * a pure hash band (nests with hashSample, stable under growth), and
    * the census pins every band boundary per source. Conditional-count
    * shape keeps sources with an empty band in the output.
    */
  val smpSplitCensus = QueryDef(
    "smp_split_census",
    Some(s"""SELECT source,
            |       CAST(sum(CASE WHEN h < '${t(0.8)}' THEN 1 ELSE 0 END) AS BIGINT) AS n_train,
            |       CAST(sum(CASE WHEN h >= '${t(0.8)}' AND h < '${t(0.9)}' THEN 1 ELSE 0 END) AS BIGINT) AS n_val,
            |       CAST(sum(CASE WHEN h >= '${t(0.9)}' THEN 1 ELSE 0 END) AS BIGINT) AS n_test
            |FROM (SELECT source, substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS h
            |      FROM documents)
            |GROUP BY source""".stripMargin),
    (spark, dir) => {
      val split = Sampling.splitColumn(col("doc_id"),
        Seq("train" -> 0.8, "val" -> 0.9), defaultLabel = "test")
      Tables.documents(spark, dir)
        .select(col("source"), split.as("split"))
        .groupBy(col("source"))
        .agg(
          sum(when(col("split") === "train", 1L).otherwise(0L)).as("n_train"),
          sum(when(col("split") === "val", 1L).otherwise(0L)).as("n_val"),
          sum(when(col("split") === "test", 1L).otherwise(0L)).as("n_test"))
    })

  /** Temperature-scaled mixture weights (the multilingual-pretraining
    * upsampling rule: q_s ∝ p_s^α, α = 0.3): per source its raw corpus
    * share, its temperature-flattened sampling share, and the implied
    * up/downsampling boost. α < 1 flattens the head and boosts the tail —
    * the knob that keeps low-resource sources represented without
    * clipping the big ones.
    *
    * Scale design: the whole computation happens on the per-source census
    * (20 rows here, #sources at 100 TB) — the corpus is scanned EXACTLY
    * once for the initial partial-agg count and never carries text into a
    * shuffle. The two normalizers (total count, temperature partition
    * function) are unpartitioned window sums OVER THE CENSUS, not
    * broadcast-back crossJoins: a crossJoin normalizer re-executes the
    * census lineage — two scans of a 100 TB corpus for a 20-row frame
    * (the r10 finding). The single-reducer window is safe by the frame's
    * own bound: #sources rows, never the corpus. ExplainCheck pins the
    * one-scan shape.
    */
  val smpTemperature = QueryDef(
    "smp_temperature",
    Some("""WITH cnt AS (SELECT source, CAST(count(*) AS BIGINT) AS c
           |             FROM documents GROUP BY 1),
           |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cnt),
           |p AS (SELECT source, c, c * 1.0 / n AS praw,
           |             pow(c * 1.0 / n, 0.3) AS pa
           |      FROM cnt, tot),
           |z AS (SELECT sum(pa) AS zsum FROM p)
           |SELECT source, c AS n_docs, round(praw, 6) AS p_raw,
           |       round(pa / zsum, 6) AS p_temp,
           |       round((pa / zsum) / praw, 4) AS boost
           |FROM p, z""".stripMargin),
    (spark, dir) => {
      val censusW = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.documents(spark, dir)
        .groupBy("source").agg(count(lit(1)).as("c"))
        .withColumn("n", sum(col("c")).over(censusW))
        .withColumn("praw", col("c") / col("n"))
        .withColumn("pa", pow(col("c") / col("n"), 0.3))
        .withColumn("zsum", sum(col("pa")).over(censusW))
        .select(col("source"), col("c").as("n_docs"),
          round(col("praw"), 6).as("p_raw"),
          round(col("pa") / col("zsum"), 6).as("p_temp"),
          r4((col("pa") / col("zsum")) / col("praw")).as("boost"))
    })

  /** Ranked cumulative token budget: sources by token mass (desc,
    * deterministic source tiebreak) with each one's share and the
    * running cumulative share — the "how many domains until 90% of
    * training tokens" concentration view that decides where curation
    * effort goes.
    *
    * Scale design: the corpus collapses to #sources rows in one
    * partial-agg scan; the ordered window and the total both run over
    * that census, never the corpus. The total is an unpartitioned window
    * sum over the census — not a broadcast-back crossJoin, which would
    * re-execute the census lineage and scan the corpus twice (the r10
    * finding). ExplainCheck pins the one-scan shape.
    */
  val smpTokenBudget = QueryDef(
    "smp_token_budget",
    Some("""WITH s AS (SELECT source,
           |                  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS toks
           |           FROM documents GROUP BY 1),
           |t AS (SELECT CAST(sum(toks) AS BIGINT) AS total FROM s)
           |SELECT source, toks, round(toks * 1.0 / total, 6) AS share,
           |       round(sum(toks) OVER (ORDER BY toks DESC, source) * 1.0
           |             / total, 6) AS cum_share,
           |       CAST(row_number() OVER (ORDER BY toks DESC, source) AS BIGINT)
           |         AS rank
           |FROM s, t""".stripMargin),
    (spark, dir) => {
      val s = Tables.documents(spark, dir)
        .select(col("source"),
          size(graft.functions.TextFns.tokens(col("text"))).cast("long").as("n"))
        .groupBy("source").agg(sum(col("n")).as("toks"))
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("toks").desc, col("source"))
      val censusW = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
      s.withColumn("total", sum(col("toks")).over(censusW))
        .select(col("source"), col("toks"),
          round(col("toks") * lit(1.0) / col("total"), 6).as("share"),
          round(sum(col("toks")).over(w.rowsBetween(Window.unboundedPreceding, 0))
            * lit(1.0) / col("total"), 6).as("cum_share"),
          row_number().over(w).cast("long").as("rank"))
    })

  /** Weighted sampling without replacement (Efraimidis-Spirakis A-Res,
    * deterministically keyed): the 25 docs with the largest u^(1/w),
    * u = the doc_id hash-uniform, w = n_chars — longer docs
    * proportionally likelier, no RNG anywhere, so the exact sample is
    * reproducible and the oracle recomputes it from the same md5
    * arithmetic. The published one-pass weighted-reservoir rule, as a
    * TakeOrderedAndProject (per-partition heaps, never a global sort).
    */
  val smpWeightedK = QueryDef(
    "smp_weighted_k",
    Some(s"""WITH u AS (
            |  SELECT doc_id, source, n_chars,
            |         (${hexValSql("doc_id")} + 0.5) / 65536.0 AS u
            |  FROM documents WHERE n_chars > 0)
            |SELECT doc_id, source,
            |       round(pow(u, 1.0 / n_chars), 6) AS wkey
            |FROM u ORDER BY round(pow(u, 1.0 / n_chars), 6) DESC, doc_id
            |LIMIT 25""".stripMargin),
    (spark, dir) =>
      Sampling.weightedSampleK(Tables.documents(spark, dir),
          keyCol = "doc_id", weightCol = "n_chars", k = 25)
        .select(col("doc_id"), col("source"),
          round(col("wkey"), 6).as("wkey")))

  /** Exact-budget stratified sample: Hamilton largest-remainder
    * allocation of 100 seats across sources (exact integer arithmetic —
    * HUGEINT in the oracle, BigInt in the engine, identical k_s), then
    * the k_s hash-smallest doc_ids per source. The eval-set construction
    * op: proportional representation with an exact total, no RNG.
    */
  val smpStratified = QueryDef(
    "smp_stratified",
    Some("""WITH cnt AS (SELECT source, CAST(count(*) AS BIGINT) AS c
           |             FROM documents GROUP BY 1),
           |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cnt),
           |alloc AS (SELECT source, c,
           |                 CAST((CAST(100 AS HUGEINT) * c) // n AS BIGINT) AS base,
           |                 CAST((CAST(100 AS HUGEINT) * c) % n AS BIGINT) AS rem
           |          FROM cnt, tot),
           |lf AS (SELECT CAST(100 - sum(base) AS BIGINT) AS l FROM alloc),
           |rk AS (SELECT source, base, rem,
           |              row_number() OVER (ORDER BY rem DESC, source) AS rr
           |       FROM alloc),
           |k AS (SELECT source,
           |             base + CASE WHEN rr <= (SELECT l FROM lf) THEN 1 ELSE 0 END AS ks
           |      FROM rk),
           |sel AS (SELECT d.source, d.doc_id, row_number() OVER (
           |          PARTITION BY d.source
           |          ORDER BY md5(CAST(d.doc_id AS VARCHAR)), d.doc_id) AS rn
           |        FROM documents d)
           |SELECT sel.source, sel.doc_id
           |FROM sel JOIN k ON sel.source = k.source
           |WHERE rn <= k.ks""".stripMargin),
    (spark, dir) =>
      Sampling.stratifiedExactK(Tables.documents(spark, dir),
          stratumCol = "source", keyCol = "doc_id", budget = 100L)
        .select(col("source"), col("doc_id")))

  /** Deterministic contrastive pairs (embedding-training prep): within
    * each source, docs ordered by their hash-uniform variate pair up
    * 1st-with-2nd, 3rd-with-4th, … — a reproducible random matching with
    * no RNG and no self-join (one per-source window + lead()). Odd
    * leftovers drop; 25 docs/source → 12 pairs each.
    */
  val smpBalancedPairs = QueryDef(
    "smp_balanced_pairs",
    Some(s"""WITH o AS (SELECT source, doc_id,
            |             row_number() OVER win AS rk,
            |             lead(doc_id, 1) OVER win AS nxt
            |           FROM documents
            |           WINDOW win AS (PARTITION BY source
            |                          ORDER BY (${hexValSql("doc_id")}), doc_id))
            |SELECT source, doc_id AS anchor_id, nxt AS pair_id
            |FROM o WHERE rk % 2 = 1 AND nxt IS NOT NULL""".stripMargin),
    (spark, dir) =>
      Sampling.contrastivePairs(Tables.documents(spark, dir),
        groupCol = "source", keyCol = "doc_id")
        .select(col("source"), col("anchor_id"), col("pair_id")))

  /** Kish effective sample size of the quality-weighted corpus —
    * ess = (Σw)²/Σw² per source and overall (the ALL rollup row). The
    * standard diagnostic for any weighted sampler: an ess_ratio near 1
    * means the weights barely concentrate; near 1/n means a handful of
    * documents dominate the mixture and the nominal count overstates
    * the data. One scan, rollup partial aggs, #sources+1 rows.
    */
  val smpEss = QueryDef(
    "smp_ess",
    Some("""WITH f AS (
           |  SELECT doc_id, source,
           |         len(string_split(text, ' ')) AS n_tokens,
           |         len(list_distinct(string_split(text, ' '))) * 1.0 /
           |           len(string_split(text, ' ')) AS ttr,
           |         len([t FOR t IN string_split(text, ' ') IF t IN ('the', 'a')]) * 1.0 /
           |           len(string_split(text, ' ')) AS stop_ratio
           |  FROM documents),
           |q AS (
           |  SELECT doc_id, source,
           |         0.4 * least(n_tokens / 100.0, 1.0)
           |           + 0.4 * ttr
           |           + 0.2 * least(stop_ratio * 5, 1.0) AS w
           |  FROM f),
           |g AS (SELECT coalesce(source, 'ALL') AS source,
           |             CAST(count(*) AS BIGINT) AS n_docs,
           |             sum(w) AS sw, sum(w * w) AS sw2
           |      FROM q GROUP BY ROLLUP (source))
           |SELECT source, n_docs, round(sw * sw / sw2, 4) AS ess,
           |       round(sw * sw / sw2 / n_docs, 4) AS ess_ratio
           |FROM g""".stripMargin),
    (spark, dir) => {
      import graft.functions.TextFns
      Tables.documents(spark, dir)
        .select(col("source"), TextFns.qualityScore(col("text")).as("w"))
        .rollup(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("w")).as("sw"),
          sum(col("w") * col("w")).as("sw2"))
        .select(coalesce(col("source"), lit("ALL")).as("source"),
          col("n_docs"), r4(col("sw") * col("sw") / col("sw2")).as("ess"),
          r4(col("sw") * col("sw") / col("sw2") / col("n_docs")).as("ess_ratio"))
    })

  val all: Seq[QueryDef] = Seq(
    smpHashSample, smpExactK, smpSourceQuota, smpInterleave, smpShuffleKey,
    smpMixtureReweight, smpSplitCensus, smpTemperature, smpTokenBudget,
    smpWeightedK, smpStratified, smpBalancedPairs, smpEss, smpBootstrap)
}
