package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Fns._
import graft.operators.{Dedup, Similarity}

/** Dedup + similarity-search query surface (LLM-pipeline extensions).
  * SQL-expressible variants carry DuckDB oracles; the hash-family-specific
  * ones (MinHash, SimHash) are rows-only and are instead property-tested
  * in DedupSpec (planted near-dups must be found).
  */
object DedupQ {

  /** Exact dedup summary — content-hash groupBy (one row: totals). */
  val ddExact = QueryDef(
    "dd_exact",
    Some("""WITH g AS (SELECT md5(text) AS fp, min(doc_id) AS canonical_id,
           |                  count(*) AS n_copies
           |           FROM documents GROUP BY 1)
           |SELECT count(*) AS n_unique,
           |       CAST(sum(n_copies) AS BIGINT) AS n_docs,
           |       CAST(sum(n_copies - 1) AS BIGINT) AS n_dup_docs,
           |       count(*) FILTER (WHERE n_copies > 1) AS n_dup_groups
           |FROM g""".stripMargin),
    (spark, dir) =>
      Dedup.exact(Tables.documents(spark, dir)).agg(
        count(lit(1)).as("n_unique"),
        sum(col("n_copies")).as("n_docs"),
        sum(col("n_copies") - 1).as("n_dup_docs"),
        count(when(col("n_copies") > 1, 1)).as("n_dup_groups")))

  /** Bag-of-words dedup groups — fuzzy-exact dedup on the canonical token
    * set (non-trivial on the fixtures: word order / repetition differ).
    */
  val ddBowGroups = QueryDef(
    "dd_bow_groups",
    Some("""SELECT md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS bow_fp,
           |       min(doc_id) AS canonical_id, count(*) AS n_copies
           |FROM documents GROUP BY 1 HAVING count(*) > 1""".stripMargin),
    (spark, dir) =>
      Tables.documents(spark, dir)
        .groupBy(graft.functions.TextFns.bowFingerprint(col("text")).as("bow_fp"))
        .agg(min(col("doc_id")).as("canonical_id"), count(lit(1)).as("n_copies"))
        .filter(col("n_copies") > 1))

  /** n-gram (3-word shingle) Jaccard near-dup pairs over a deterministic
    * probe set — the exact-verification arm of MinHash dedup, oracle-pinned.
    * Probe slice keeps this O(|probes|·|corpus|); unbounded all-pairs only
    * ever runs through the LSH path.
    */
  val ddJaccardShingles = QueryDef(
    "dd_jaccard_shingles",
    Some("""WITH sh AS (
           |  SELECT doc_id,
           |         list_distinct([array_to_string(w[i:i+2], ' ')
           |                        FOR i IN range(1, greatest(len(w) - 1, 1))]) AS s
           |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents))
           |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           |       round(len(list_intersect(a.s, b.s)) * 1.0 /
           |             (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 4) AS jaccard
           |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
           |WHERE a.doc_id % 20 = 0
           |  AND len(list_intersect(a.s, b.s)) * 1.0 /
           |      (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.3""".stripMargin),
    (spark, dir) => {
      // inverted-index set-similarity join: explode each side's (distinct)
      // hashed shingles, equi-join on the hash, count matches per pair —
      // the same |A∩B| as a per-pair array_intersect, but computed by one
      // codegen'd hash-agg instead of O(|probes|·|corpus|) array scans.
      // Shingle hashing runs inside the native ShingleHash64 expression
      // (the strings never materialize); the shuffle carries (long, id).
      // A cross-doc collision needs two distinct shingles with equal
      // xxhash64 inside one pair — P ≈ |shingles|²/2⁶⁴, negligible even
      // at corpus scale. Pairs with zero overlap never materialize.
      val sh = Tables.documents(spark, dir).select(col("doc_id"),
        graft.functions.TextFns.shingleHashes(col("text"), 3).as("s"))
      val sizes = sh.select(col("doc_id"), size(col("s")).as("n"))
      val probeSh = sh.filter(col("doc_id") % 20 === 0)
        .select(col("doc_id").as("id_a"), explode(col("s")).as("shingle"))
      val candSh = sh.select(col("doc_id").as("id_b"), explode(col("s")).as("shingle"))
      val inter = probeSh.join(candSh, Seq("shingle"))
        .filter(col("id_a") < col("id_b"))
        .groupBy(col("id_a"), col("id_b"))
        .agg(count(lit(1)).as("inter"))
      inter
        .join(broadcast(sizes.withColumnRenamed("doc_id", "id_a").withColumnRenamed("n", "na")), "id_a")
        .join(broadcast(sizes.withColumnRenamed("doc_id", "id_b").withColumnRenamed("n", "nb")), "id_b")
        .withColumn("j", col("inter").cast("double") /
          (col("na") + col("nb") - col("inter")))
        .filter(col("j") >= 0.3)
        .select(col("id_a"), col("id_b"), r4(col("j")).as("jaccard"))
    })

  /** Shingle CONTAINMENT (asymmetric Jaccard): C(a→b) = |S_a ∩ S_b| /
    * |S_a| — the doc-in-doc detector (quotes, boilerplate wrappers,
    * subset re-posts) that symmetric Jaccard misses whenever the host
    * document is much longer. Same inverted-index machinery as
    * dd_jaccard_shingles (hashed shingles, equi-join on the hash, one
    * hash-agg per pair — zero-overlap pairs never materialize), directed:
    * both (a,b) and (b,a) orientations of a probe are scored.
    */
  val ddContainment = QueryDef(
    "dd_containment",
    Some("""WITH sh AS (
           |  SELECT doc_id,
           |         list_distinct([array_to_string(w[i:i+2], ' ')
           |                        FOR i IN range(1, greatest(len(w) - 1, 1))]) AS s
           |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents))
           |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           |       round(len(list_intersect(a.s, b.s)) * 1.0 / len(a.s), 4) AS containment
           |FROM sh a JOIN sh b ON a.doc_id != b.doc_id
           |WHERE a.doc_id % 20 = 10
           |  AND len(list_intersect(a.s, b.s)) * 1.0 / len(a.s) >= 0.5""".stripMargin),
    (spark, dir) => {
      val sh = Tables.documents(spark, dir).select(col("doc_id"),
        graft.functions.TextFns.shingleHashes(col("text"), 3).as("s"))
      val sizes = sh.select(col("doc_id"), size(col("s")).as("n"))
      val probeSh = sh.filter(col("doc_id") % 20 === 10)
        .select(col("doc_id").as("id_a"), explode(col("s")).as("shingle"))
      val candSh = sh.select(col("doc_id").as("id_b"), explode(col("s")).as("shingle"))
      probeSh.join(candSh, Seq("shingle"))
        .filter(col("id_a") =!= col("id_b"))
        .groupBy(col("id_a"), col("id_b"))
        .agg(count(lit(1)).as("inter"))
        .join(broadcast(sizes.withColumnRenamed("doc_id", "id_a")
          .withColumnRenamed("n", "na")), "id_a")
        .withColumn("c", col("inter").cast("double") / col("na"))
        .filter(col("c") >= 0.5)
        .select(col("id_a"), col("id_b"), r4(col("c")).as("containment"))
    })

  /** Content-defined chunking dedup (FastCDC-style): boundaries where
    * the md5-variate of the trailing 3-gram ≡ 0 mod 16 (≈16-token
    * chunks), so identical passages re-chunk identically at ANY offset —
    * the sub-document dedup key robust to insertions that fixed-size
    * chunking (dd_chunk_boilerplate) is not. Output: chunk fingerprints
    * shared by ≥ 2 docs with doc/occurrence counts. Whole operator
    * (boundary decisions included) recomputed by the oracle from the
    * same hash polynomial.
    */
  val ddCdcChunks = QueryDef(
    "dd_cdc_chunks",
    Some(s"""WITH d AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
            |t AS (SELECT doc_id, unnest(range(1, len(w)+1)) AS pos, w FROM d),
            |f AS (SELECT doc_id, pos, w[pos] AS tok,
            |        CASE WHEN pos >= 3 AND
            |          (${SamplingQ.hexValSql("w[pos-2] || ' ' || w[pos-1] || ' ' || w[pos]")}) % 16 = 0
            |        THEN 1 ELSE 0 END AS cut
            |      FROM t),
            |c AS (SELECT doc_id, pos, tok,
            |        coalesce(sum(cut) OVER (PARTITION BY doc_id ORDER BY pos
            |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS chunk
            |      FROM f),
            |ch AS (SELECT doc_id, chunk, md5(string_agg(tok, ' ' ORDER BY pos)) AS fp,
            |              CAST(count(*) AS BIGINT) AS n_tok
            |       FROM c GROUP BY 1, 2)
            |SELECT fp, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
            |       CAST(count(*) AS BIGINT) AS n_occ, min(n_tok) AS tok_len
            |FROM ch GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2""".stripMargin),
    (spark, dir) =>
      graft.operators.CdcChunking.duplicateChunks(
        Tables.documents(spark, dir), gramN = 3, modulus = 16))

  /** PPJoin-style EXACT all-pairs near-dup join (prefix filtering on a
    * rarest-first global order + length filter + exact verify) — unlike
    * LSH it misses nothing, so the full-corpus inequality-join oracle
    * pins it directly. The approximate/banded path is `dd_minhash_lsh`.
    */
  val ddPpjoin = QueryDef(
    "dd_ppjoin",
    Some("""WITH sh AS (
           |  SELECT doc_id,
           |         list_distinct([array_to_string(w[i:i+2], ' ')
           |                        FOR i IN range(1, greatest(len(w) - 1, 1))]) AS s
           |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents))
           |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           |       round(len(list_intersect(a.s, b.s)) * 1.0 /
           |             (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 4) AS jaccard
           |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
           |WHERE len(list_intersect(a.s, b.s)) * 1.0 /
           |      (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.7""".stripMargin),
    (spark, dir) =>
      Dedup.ppjoinNearDups(Tables.documents(spark, dir), threshold = 0.7)
        .select(col("id_a"), col("id_b"), r4(col("jaccard")).as("jaccard")))

  /** MinHash + LSH near-dup detection (the 100 TB path): signature scan →
    * band-bucket join → exact verify on candidates only. The graded
    * contract is the exact-verified pair set (true jaccard ≥ t): the
    * verify arm makes precision 1 by construction, and at 16 bands × 2
    * rows the banding's miss probability at the threshold is ~2·10⁻⁵
    * (quant gate enforces recall = 1.0 on the fixtures) — so the output
    * equals the brute-force all-pairs oracle while the ENGINE only ever
    * joins band buckets, never all pairs. The engine-specific estimated
    * jaccard stays out of the graded columns.
    */
  val ddMinhashLsh = QueryDef(
    "dd_minhash_lsh",
    Some("""WITH sh AS (
           |  SELECT doc_id,
           |         list_distinct([array_to_string(w[i:i+2], ' ')
           |                        FOR i IN range(1, greatest(len(w) - 1, 1))]) AS s
           |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents))
           |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           |       round(len(list_intersect(a.s, b.s)) * 1.0 /
           |             (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 4) AS jaccard
           |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
           |WHERE len(list_intersect(a.s, b.s)) * 1.0 /
           |      (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.7""".stripMargin),
    (spark, dir) =>
      Dedup.minhashNearDups(Tables.documents(spark, dir), threshold = 0.7,
          shingleN = 3, bands = 16, rowsPerBand = 2)
        .select(col("id_a"), col("id_b"), r4(col("jaccard")).as("jaccard")))

  /** Per-doc duplicated 8-token-window census (exact-substring dedup
    * diagnostic, Lee et al. ACL 2022): which fraction of each document
    * occurs verbatim in another document, at window granularity. DuckDB
    * recomputes it from string windows; the engine works on the native
    * multiplicity-mode shingle hashes — equality of results is also a
    * cross-check that the hash family is collision-free on the corpus.
    */
  val ddDupNgramSpans = QueryDef(
    "dd_dup_ngram_spans",
    Some("""WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
           |g AS (SELECT doc_id, unnest([array_to_string(w[i:i+7], ' ')
           |                             FOR i IN range(1, greatest(len(w) - 6, 1))]) AS g
           |      FROM w),
           |d AS (SELECT g FROM g GROUP BY g HAVING min(doc_id) <> max(doc_id))
           |SELECT g.doc_id,
           |       CAST(count(*) AS BIGINT) AS n_windows,
           |       CAST(sum(CASE WHEN d.g IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           |         AS n_dup_windows,
           |       round(sum(CASE WHEN d.g IS NOT NULL THEN 1 ELSE 0 END) * 1.0
           |             / count(*), 4) AS dup_ratio
           |FROM g LEFT JOIN d ON g.g = d.g
           |GROUP BY 1""".stripMargin),
    (spark, dir) =>
      Dedup.dupNgramSpans(Tables.documents(spark, dir), n = 8)
        .orderBy(col("doc_id")))

  /** Span-level exact-substring dedup (the trim action): cut every
    * non-canonical verbatim 8-token span, keep the unique remainder.
    * The DuckDB oracle rebuilds each trimmed document from string
    * windows and compares md5 of the reconstructed text — the strongest
    * cross-engine pin available (any off-by-one in window coverage or
    * token order changes the digest).
    */
  val ddTrimDupSpans = QueryDef(
    "dd_trim_dup_spans",
    Some("""WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
           |g AS (SELECT doc_id, i, array_to_string(w[i:i+7], ' ') AS g
           |      FROM (SELECT doc_id, w,
           |                   unnest(range(1, greatest(len(w) - 6, 1))) AS i
           |            FROM w)),
           |own AS (SELECT g, min(doc_id) AS owner FROM g
           |        GROUP BY g HAVING min(doc_id) <> max(doc_id)),
           |dup AS (SELECT g.doc_id, g.i FROM g JOIN own USING (g)
           |        WHERE g.doc_id <> own.owner),
           |cov AS (SELECT DISTINCT doc_id, unnest(range(i, i + 8)) AS ti FROM dup),
           |tok AS (SELECT doc_id, ti, w[ti] AS tok
           |        FROM (SELECT doc_id, w, unnest(range(1, len(w) + 1)) AS ti
           |              FROM w)),
           |kept AS (SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_kept,
           |                string_agg(t.tok, ' ' ORDER BY t.ti) AS trimmed
           |         FROM tok t LEFT JOIN cov c
           |           ON t.doc_id = c.doc_id AND t.ti = c.ti
           |         WHERE c.doc_id IS NULL
           |         GROUP BY 1)
           |SELECT w.doc_id, CAST(len(w.w) AS BIGINT) AS n_tokens,
           |       coalesce(k.n_kept, 0) AS n_kept,
           |       md5(coalesce(k.trimmed, '')) AS trimmed_md5
           |FROM w LEFT JOIN kept k USING (doc_id)""".stripMargin),
    (spark, dir) =>
      Dedup.trimDupSpans(Tables.documents(spark, dir), n = 8)
        .orderBy(col("doc_id")))

  /** Within-doc self-repeat trim (generation loops, chat echoes,
    * template stutter): cut every 8-token window whose gram already
    * occurred earlier in the SAME document; first occurrence survives.
    * md5 of the rebuilt text pins the exact cut set cross-engine, same
    * contract as dd_trim_dup_spans.
    */
  val ddSelfRepeatTrim = QueryDef(
    "dd_selfrepeat_trim",
    Some("""WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
           |g AS (SELECT doc_id, i, array_to_string(w[i:i+7], ' ') AS g
           |      FROM (SELECT doc_id, w,
           |                   unnest(range(1, greatest(len(w) - 6, 1))) AS i
           |            FROM w)),
           |rep AS (SELECT g.doc_id, g.i
           |        FROM g JOIN (SELECT doc_id, g, min(i) AS fi FROM g
           |                     GROUP BY 1, 2) f
           |          ON g.doc_id = f.doc_id AND g.g = f.g
           |        WHERE g.i > f.fi),
           |cov AS (SELECT DISTINCT doc_id, unnest(range(i, i + 8)) AS ti FROM rep),
           |tok AS (SELECT doc_id, ti, w[ti] AS tok
           |        FROM (SELECT doc_id, w, unnest(range(1, len(w) + 1)) AS ti
           |              FROM w)),
           |kept AS (SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_kept,
           |                string_agg(t.tok, ' ' ORDER BY t.ti) AS trimmed
           |         FROM tok t LEFT JOIN cov c
           |           ON t.doc_id = c.doc_id AND t.ti = c.ti
           |         WHERE c.doc_id IS NULL
           |         GROUP BY 1)
           |SELECT w.doc_id, CAST(len(w.w) AS BIGINT) AS n_tokens,
           |       coalesce(k.n_kept, 0) AS n_kept,
           |       md5(coalesce(k.trimmed, '')) AS trimmed_md5
           |FROM w LEFT JOIN kept k USING (doc_id)""".stripMargin),
    (spark, dir) =>
      Dedup.trimSelfRepeats(Tables.documents(spark, dir), n = 8)
        .orderBy(col("doc_id")))

  /** Duplicate-span LENGTH distribution per source (maximal spans, not
    * windows): adjacent duplicated windows coalesce into maximal runs
    * ([[graft.operators.Dedup.dupSpanIslands]]), and the histogram of
    * run lengths per source is the Lee-et-al diagnostic that decides the
    * window size n itself — mass at exactly n means n is clipping real
    * duplication; a tail far above n means n can grow. The DuckDB oracle
    * recomputes the islands with the classic ti − row_number() trick
    * over the same covered-position set.
    */
  val ddDupSpanHist = QueryDef(
    "dd_dup_span_hist",
    Some("""WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
           |g AS (SELECT doc_id, i, array_to_string(w[i:i+7], ' ') AS g
           |      FROM (SELECT doc_id, w,
           |                   unnest(range(1, greatest(len(w) - 6, 1))) AS i
           |            FROM w)),
           |own AS (SELECT g, min(doc_id) AS owner FROM g
           |        GROUP BY g HAVING min(doc_id) <> max(doc_id)),
           |dup AS (SELECT g.doc_id, g.i FROM g JOIN own USING (g)
           |        WHERE g.doc_id <> own.owner),
           |cov AS (SELECT DISTINCT doc_id, unnest(range(i, i + 8)) AS ti FROM dup),
           |isl AS (SELECT doc_id,
           |               ti - row_number() OVER (PARTITION BY doc_id ORDER BY ti) AS grp
           |        FROM cov),
           |spans AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS span_len
           |          FROM isl GROUP BY doc_id, grp)
           |SELECT d.source, s.span_len, CAST(count(*) AS BIGINT) AS n_spans
           |FROM spans s JOIN documents d USING (doc_id)
           |GROUP BY 1, 2""".stripMargin),
    (spark, dir) => {
      val docs = Tables.documents(spark, dir)
      Dedup.dupSpanIslands(docs, n = 8)
        .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
        .groupBy(col("source"), col("span_len"))
        .agg(count(lit(1)).as("n_spans"))
        .orderBy("source", "span_len")
    })

  /** SimHash near-dup candidates (Hamming ≤ 3 on 64-bit signatures, banded
    * blocking) — oracle-proven since r11 via the PORTABLE hash mode: the
    * per-token hash is the first 16 hex chars of md5(token) (the
    * `Sampling.hexVal` convention widened to 64 bits), which DuckDB
    * recomputes exactly with a strpos polynomial, rebuilds the vote
    * matrix with 64 conditional sums, reassembles the signed signature
    * and brute-force joins all pairs at hamming ≤ 3. The banded engine
    * set equals that brute set by the pigeonhole exactness of 16-bit
    * banding (maxDist ≤ 3 → ≥ 1 of 4 bands identical), so a triple-green
    * here proves BOTH the signature math and the banding. Production
    * keeps the xxhash64 mode (≈3× faster/token); each mode's banding
    * exactness is separately gated (`simhash_banding_vs_brute_diff`,
    * `simhash_portable_banding_diff`) and DedupSpec pins the portable
    * expression to an independent md5 reference.
    */
  val ddSimhash = QueryDef(
    "dd_simhash",
    Some(simhashOracleSql),
    (spark, dir) =>
      Dedup.simhashCandidates(Tables.documents(spark, dir), maxDist = 3,
          portable = true)
        .select(col("id_a"), col("id_b"), col("hamming").cast("long").as("hamming"))
        .orderBy(col("id_a"), col("id_b")))

  /** DuckDB recomputation of the portable-md5 SimHash pair set (built
    * programmatically: 16-term hex polynomial, 64 vote sums, signed
    * signature reassembly, brute all-pairs hamming join — exact twin of
    * the banded engine output for maxDist ≤ 3).
    */
  private def simhashOracleSql: String = {
    // HUGEINT value of the first 16 hex chars of md5(t) — the 64-bit
    // widening of SamplingQ.hexValSql's 4-char variate
    val hexPoly = (0 until 16).map { i =>
      val p = BigInt(16).pow(15 - i)
      s"CAST(strpos('0123456789abcdef', substr(md5(t), ${i + 1}, 1)) - 1 AS HUGEINT) * $p"
    }.mkString(" + ")
    val voteCols = (0 until 64).map { b =>
      s"sum(CASE WHEN (h // ${BigInt(2).pow(b)}) % 2 = 1 THEN 1 ELSE -1 END) AS v$b"
    }.mkString(", ")
    val sigTerms = ((0 until 63).map { b =>
      s"CASE WHEN v$b > 0 THEN CAST(${1L << b} AS BIGINT) ELSE 0 END"
    } :+ "CASE WHEN v63 > 0 THEN (-9223372036854775807 - 1) ELSE CAST(0 AS BIGINT) END")
      .mkString(" + ")
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS t
       |  FROM documents),
       |h AS (SELECT doc_id, $hexPoly AS h FROM tok),
       |v AS (SELECT doc_id, $voteCols FROM h GROUP BY doc_id),
       |sig AS (SELECT doc_id, CAST($sigTerms AS BIGINT) AS sig FROM v)
       |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |       CAST(bit_count(xor(a.sig, b.sig)) AS BIGINT) AS hamming
       |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.sig, b.sig)) <= 3""".stripMargin
  }

  /** Embedding-cosine near-dup pairs over a probe slice, double math,
    * oracle-pinned against DuckDB's list_cosine_similarity.
    */
  val ddEmbeddingNearDup = QueryDef(
    "dd_embedding_neardup",
    Some("""SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           |       round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4) AS cosine
           |FROM embeddings a JOIN embeddings b
           |  ON a.vec_id < b.vec_id AND a.vec_id % 10 = 0
           |WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) > 0.3""".stripMargin),
    (spark, dir) => {
      val e = Tables.embeddings(spark, dir)
      val a = e.filter(col("vec_id") % 10 === 0)
        .select(col("vec_id").as("id_a"),
          transform(col("embedding"), x => x.cast("double")).as("va"))
      val b = e.select(col("vec_id").as("id_b"),
        transform(col("embedding"), x => x.cast("double")).as("vb"))
      a.join(b, col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"), graft.plans.VectorFunctions.cosine_sim(col("va"), col("vb")).as("c"))
        .filter(col("c") > 0.3)
        .select(col("id_a"), col("id_b"), r4(col("c")).as("cosine"))
    })

  /** Brute-force cosine top-k (exact ANN baseline) — rank on 6-decimal
    * similarity with vec_id tiebreak so both engines order identically.
    */
  val simKnnBrute = QueryDef(
    "sim_knn_brute",
    Some("""WITH sims AS (
           |  SELECT a.vec_id AS probe_id, b.vec_id AS cand_id,
           |         round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cosine
           |  FROM embeddings a JOIN embeddings b ON a.vec_id != b.vec_id
           |  WHERE a.vec_id % 25 = 0)
           |SELECT probe_id, cand_id, cosine, rk FROM (
           |  SELECT *, row_number() OVER (
           |    PARTITION BY probe_id ORDER BY cosine DESC, cand_id) AS rk
           |  FROM sims) WHERE rk <= 5""".stripMargin),
    (spark, dir) => {
      val e = Tables.embeddings(spark, dir)
      Similarity.bruteForceKnn(e.filter(col("vec_id") % 25 === 0), e, k = 5)
        .select(col("probe_id"), col("cand_id"), col("cosine"), col("rk"))
    })

  /** Bucketed ANN (sign-random-projection, the IVF-style scale path):
    * probes scan only their own bucket. Bucket function is pure sign
    * arithmetic → SQL-expressible, so even the approximate path is
    * oracle-pinned.
    */
  val simKnnLsh = QueryDef(
    "sim_knn_lsh",
    Some("""WITH bucketed AS (
           |  SELECT vec_id, embedding::DOUBLE[] AS v,
           |         list_sum([CASE WHEN embedding[i + 1] > 0 THEN 2**i ELSE 0 END
           |                   FOR i IN range(0, 8)])::BIGINT AS bucket
           |  FROM embeddings),
           |sims AS (
           |  SELECT a.vec_id AS probe_id, b.vec_id AS cand_id,
           |         round(list_cosine_similarity(a.v, b.v), 6) AS cosine
           |  FROM bucketed a JOIN bucketed b
           |    ON a.bucket = b.bucket AND a.vec_id != b.vec_id
           |  WHERE a.vec_id % 25 = 0)
           |SELECT probe_id, cand_id, cosine, rk FROM (
           |  SELECT *, row_number() OVER (
           |    PARTITION BY probe_id ORDER BY cosine DESC, cand_id) AS rk
           |  FROM sims) WHERE rk <= 5""".stripMargin),
    (spark, dir) => {
      val e = Tables.embeddings(spark, dir)
      Similarity.lshKnn(e.filter(col("vec_id") % 25 === 0), e, k = 5, p = 8)
        .select(col("probe_id"), col("cand_id"), col("cosine"), col("rk"))
    })

  /** Learned-centroid IVF ANN (k-means cells, nProbe=2) — model-dependent
    * assignment → rows-only; recall vs the exact brute-force baseline is
    * asserted in DedupSpec.
    */
  val simKnnIvf = QueryDef(
    "sim_knn_ivf",
    None,
    (spark, dir) => {
      val e = Tables.embeddings(spark, dir)
      Similarity.ivfKnn(e.filter(col("vec_id") % 25 === 0), e, k = 5,
          nCells = 16, nProbe = 2)
        .select(col("probe_id"), col("cand_id"), col("cosine"), col("rk"))
        .orderBy(col("probe_id"), col("rk"))
    })

  /** Product-quantization ANN over the same probe set as sim_knn_ivf —
    * corpus encoded as 8 codes/vector, probes answered by ADC table
    * lookups, top-40 shortlist re-ranked exact. No oracle (learned
    * codebooks); `qc_quant_gates` grades recall@5 against brute force.
    */
  val simKnnPq = QueryDef(
    "sim_knn_pq",
    None,
    (spark, dir) => {
      val e = Tables.embeddings(spark, dir)
      Similarity.pqKnn(e.filter(col("vec_id") % 25 === 0), e, k = 5,
          m = 8, kSub = 16, rerank = 40)
        .select(col("probe_id"), col("cand_id"), col("cosine"), col("rk"))
        .orderBy(col("probe_id"), col("rk"))
    })

  /** IVF-PQ composed ANN over the same probe set — coarse cells prune
    * the candidate set (nProbe=4 of 16), PQ codes compress what's left
    * (8 codes/vector ADC scan), top-40 re-ranks exact: the FAISS IVFPQ
    * serving shape. No oracle (learned coarse quantizer + codebooks);
    * `qc_quant_gates` grades recall@5 against brute force.
    */
  val simKnnIvfPq = QueryDef(
    "sim_knn_ivfpq",
    None,
    (spark, dir) => {
      val e = Tables.embeddings(spark, dir)
      Similarity.ivfPqKnn(e.filter(col("vec_id") % 25 === 0), e, k = 5,
          nCells = 16, nProbe = 4, m = 8, kSub = 16, rerank = 40)
        .select(col("probe_id"), col("cand_id"), col("cosine"), col("rk"))
        .orderBy(col("probe_id"), col("rk"))
    })

  /** Chunk-level boilerplate detection — exact-substring dedup at chunk
    * granularity (the practical approximation of suffix-array substring
    * dedup): tokenize → 32-token windows at stride 24 (the tx_chunks
    * grid) → md5 per window → windows appearing in MORE THAN ONE doc are
    * boilerplate; per doc, the fraction of its windows that are shared.
    * Headers, footers, license blocks and templated text score high and
    * get caught even when whole-doc similarity stays under every
    * near-dup threshold.
    *
    * Scale: the chunk table shuffles (md5, doc_id) pairs only — never
    * window text; the shared set is one partial-agg groupBy; the
    * flag-join keys on the 16-byte hash and AQE picks broadcast vs
    * shuffle by the boilerplate volume.
    */
  val ddChunkBoilerplate = QueryDef(
    "dd_chunk_boilerplate",
    Some("""WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents
           |           WHERE len(string_split(text, ' ')) >= 1),
           |s AS (SELECT doc_id, w, unnest(range(1, len(w) + 1, 24)) AS start FROM d),
           |c AS (SELECT doc_id,
           |             md5(array_to_string(w[start:start + 31], ' ')) AS chunk_md5
           |      FROM s),
           |shared AS (SELECT chunk_md5 FROM c
           |           GROUP BY chunk_md5 HAVING count(DISTINCT doc_id) > 1)
           |SELECT c.doc_id,
           |       CAST(count(*) AS BIGINT) AS n_chunks,
           |       CAST(sum(CASE WHEN sh.chunk_md5 IS NOT NULL THEN 1 ELSE 0 END)
           |            AS BIGINT) AS n_shared,
           |       round(sum(CASE WHEN sh.chunk_md5 IS NOT NULL THEN 1 ELSE 0 END)
           |             * 1.0 / count(*), 4) AS boilerplate_ratio
           |FROM c LEFT JOIN shared sh ON c.chunk_md5 = sh.chunk_md5
           |GROUP BY c.doc_id""".stripMargin),
    (spark, dir) => {
      val chunks = Tables.documents(spark, dir)
        .select(col("doc_id"), graft.functions.TextFns.tokens(col("text")).as("w"))
        .filter(size(col("w")) >= 1)
        .select(col("doc_id"), col("w"),
          explode(sequence(lit(1), size(col("w")), lit(24))).as("start"))
        .select(col("doc_id"),
          md5(array_join(slice(col("w"), col("start"), lit(32)), " ")
            .cast("binary")).as("chunk_md5"))
      val shared = chunks.groupBy("chunk_md5")
        .agg(countDistinct(col("doc_id")).as("nd"))
        .filter(col("nd") > 1)
        .select(col("chunk_md5"), lit(true).as("sh"))
      chunks.join(shared, Seq("chunk_md5"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_chunks"),
          sum(when(col("sh"), 1L).otherwise(0L)).as("n_shared"))
        .withColumn("boilerplate_ratio",
          r4(col("n_shared").cast("double") / col("n_chunks")))
    })

  /** Lexical-vs-semantic dedup agreement: pairs flagged by MinHash/LSH
    * text similarity, sign-blocked embedding cosine, or both — with both
    * scores on every pair. The oracle recomputes both pair generators
    * brute-force/blocked from first principles and the full outer join.
    */
  val ddSignalAgreement = QueryDef(
    "dd_signal_agreement",
    Some("""WITH sh AS (
           |  SELECT doc_id, list_distinct([array_to_string(w[i:i+2], ' ')
           |                                FOR i IN range(1, greatest(len(w) - 1, 1))]) AS s
           |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)),
           |lex AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
           |        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
           |        WHERE len(list_intersect(a.s, b.s)) * 1.0 /
           |              (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.7),
           |blk AS (
           |  SELECT vec_id, embedding,
           |         CAST(CASE WHEN embedding[1] >= 0 THEN 32 ELSE 0 END
           |            + CASE WHEN embedding[2] >= 0 THEN 16 ELSE 0 END
           |            + CASE WHEN embedding[3] >= 0 THEN 8 ELSE 0 END
           |            + CASE WHEN embedding[4] >= 0 THEN 4 ELSE 0 END
           |            + CASE WHEN embedding[5] >= 0 THEN 2 ELSE 0 END
           |            + CASE WHEN embedding[6] >= 0 THEN 1 ELSE 0 END AS INTEGER) AS blk
           |  FROM embeddings),
           |sem AS (SELECT x.vec_id AS id_a, y.vec_id AS id_b
           |        FROM blk x JOIN blk y ON x.blk = y.blk AND x.vec_id < y.vec_id
           |        WHERE list_cosine_similarity(x.embedding::DOUBLE[], y.embedding::DOUBLE[]) >= 0.3),
           |pairs AS (
           |  SELECT coalesce(l.id_a, s2.id_a) AS id_a, coalesce(l.id_b, s2.id_b) AS id_b,
           |         l.id_a IS NOT NULL AS lex, s2.id_a IS NOT NULL AS sem
           |  FROM lex l FULL OUTER JOIN sem s2
           |    ON l.id_a = s2.id_a AND l.id_b = s2.id_b)
           |SELECT p.id_a, p.id_b,
           |       round(CASE WHEN len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) = 0
           |                  THEN 0.0
           |                  ELSE len(list_intersect(a.s, b.s)) * 1.0 /
           |                       (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) END,
           |             4) AS jaccard,
           |       round(list_cosine_similarity(ea.embedding::DOUBLE[], eb.embedding::DOUBLE[]), 4) AS cosine,
           |       CASE WHEN p.lex AND p.sem THEN 'both'
           |            WHEN p.lex THEN 'lexical_only'
           |            ELSE 'semantic_only' END AS verdict
           |FROM pairs p
           |JOIN sh a ON p.id_a = a.doc_id
           |JOIN sh b ON p.id_b = b.doc_id
           |JOIN embeddings ea ON p.id_a = ea.vec_id
           |JOIN embeddings eb ON p.id_b = eb.vec_id""".stripMargin),
    (spark, dir) =>
      Dedup.signalAgreement(Tables.documents(spark, dir),
          Tables.embeddings(spark, dir))
        .select(col("id_a"), col("id_b"), r4(col("jaccard")).as("jaccard"),
          r4(col("cosine")).as("cosine"), col("verdict")))

  /** Nearest-centroid label assignment (Rocchio): per-label mean
    * embedding as the class prototype, every vector assigned to its
    * highest-cosine prototype. Fully deterministic (mean + 6-decimal
    * rounding + label tiebreak), so the whole model — prototype build
    * included — is oracle-checked, unlike the k-means IVF path.
    */
  val simCentroidAssign = QueryDef(
    "sim_centroid_assign",
    Some("""WITH exp AS (
           |  SELECT label AS clabel, s['p'] AS pos, s['v']::DOUBLE AS v
           |  FROM (SELECT label, unnest([{'p': i, 'v': embedding[i]}
           |                              FOR i IN range(1, len(embedding) + 1)]) AS s
           |        FROM embeddings)),
           |cent AS (SELECT clabel, list(m ORDER BY pos) AS cv
           |         FROM (SELECT clabel, pos, avg(v) AS m FROM exp GROUP BY clabel, pos)
           |         GROUP BY clabel),
           |scored AS (
           |  SELECT e.vec_id, e.label, c.clabel,
           |         round(list_cosine_similarity(e.embedding::DOUBLE[], c.cv), 6) AS cosine
           |  FROM embeddings e CROSS JOIN cent c)
           |SELECT vec_id, label, clabel AS pred_label, cosine FROM (
           |  SELECT *, row_number() OVER (
           |    PARTITION BY vec_id ORDER BY cosine DESC, clabel) AS rk
           |  FROM scored) WHERE rk = 1""".stripMargin),
    (spark, dir) =>
      Similarity.centroidAssign(Tables.embeddings(spark, dir)))

  /** Dedup-cluster closure: connected components over the jaccard ≥ 0.7
    * near-dup pair set — every doc labeled with the min doc_id reachable
    * through near-dup links (pairwise drop-larger-id is not transitive;
    * this is). Engine: the pair set comes from the banded LSH + exact
    * verify path (the 100 TB route — never all-pairs; the recall-1.0
    * quant gates prove it equals brute force on these fixtures, same
    * contract as dd_minhash_lsh), then distributed min-label propagation
    * (join + partial-agg per round, O(cluster diameter) rounds). Oracle:
    * the same closure as a DuckDB recursive CTE over the brute-force
    * all-pairs edge set (min over the reachable set). Singleton docs are
    * their own component, so the full corpus census pins both the
    * clusters and the non-clusters.
    */
  val ddComponents = QueryDef(
    "dd_components",
    Some("""WITH RECURSIVE sh AS (
           |  SELECT doc_id,
           |         list_distinct([array_to_string(w[i:i+2], ' ')
           |                        FOR i IN range(1, greatest(len(w) - 1, 1))]) AS s
           |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)),
           |pairs AS (
           |  SELECT a.doc_id AS a, b.doc_id AS b
           |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
           |  WHERE len(list_intersect(a.s, b.s)) * 1.0 /
           |        (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.7),
           |edges AS (SELECT a, b FROM pairs UNION ALL SELECT b, a FROM pairs),
           |reach AS (
           |  SELECT doc_id AS src, doc_id AS node FROM sh
           |  UNION
           |  SELECT r.src, e.b FROM reach r JOIN edges e ON r.node = e.a)
           |SELECT src AS doc_id, min(node) AS component_id
           |FROM reach GROUP BY src""".stripMargin),
    (spark, dir) => {
      val docs = Tables.documents(spark, dir)
      val pairs = Dedup.minhashNearDups(docs, threshold = 0.7)
        .select(col("id_a").as("a"), col("id_b").as("b"))
      Dedup.connectedComponents(
          docs.select(col("doc_id").as("id")), pairs)
        .select(col("id").as("doc_id"), col("comp").as("component_id"))
    })

  /** Incremental-ingestion dedup: a 20% "new batch" slice graded against
    * the other 80% "existing corpus" — each batch doc gets an
    * exact_dup / near_dup / new verdict plus its smallest matching
    * existing id. The asymmetric inverted-index join only materializes
    * pairs sharing a shingle; the batch side is ingestion-sized, so the
    * dedup probe never rescans the corpus per doc (reference analogue:
    * the MERGE-insert-only idempotent ingest, generalized from key
    * equality to content similarity).
    */
  val ddIncremental = QueryDef(
    "dd_incremental",
    Some("""WITH d AS (SELECT doc_id, text, string_split(text, ' ') AS w FROM documents),
           |sh AS (SELECT doc_id, md5(text) AS fp,
           |         list_distinct([array_to_string(w[i:i+2], ' ')
           |                        FOR i IN range(1, greatest(len(w) - 1, 1))]) AS s
           |       FROM d),
           |b AS (SELECT * FROM sh WHERE doc_id % 5 = 0),
           |e AS (SELECT * FROM sh WHERE doc_id % 5 <> 0),
           |ex AS (SELECT b.doc_id AS doc_id, min(e.doc_id) AS exact_id
           |       FROM b JOIN e ON b.fp = e.fp GROUP BY 1),
           |nr AS (SELECT b.doc_id AS doc_id, min(e.doc_id) AS near_id
           |       FROM b JOIN e ON len(list_intersect(b.s, e.s)) * 1.0 /
           |            (len(b.s) + len(e.s) - len(list_intersect(b.s, e.s))) >= 0.7
           |       GROUP BY 1)
           |SELECT b.doc_id,
           |       CASE WHEN ex.exact_id IS NOT NULL THEN 'exact_dup'
           |            WHEN nr.near_id IS NOT NULL THEN 'near_dup'
           |            ELSE 'new' END AS verdict,
           |       coalesce(ex.exact_id, nr.near_id) AS match_id
           |FROM b LEFT JOIN ex ON b.doc_id = ex.doc_id
           |       LEFT JOIN nr ON b.doc_id = nr.doc_id""".stripMargin),
    (spark, dir) => {
      val docs = Tables.documents(spark, dir)
      Dedup.crossCorpusVerdicts(
        existing = docs.filter(col("doc_id") % 5 =!= 0),
        batch = docs.filter(col("doc_id") % 5 === 0),
        threshold = 0.7)
    })

  /** Semantic dedup (SemDeDup-style): sign-sketch blocking + within-block
    * cosine pruning, one keep/drop verdict per embedding — fully
    * deterministic, so unlike the k-means variant the WHOLE operator is
    * oracle-checked, blocking included.
    */
  val ddSemantic = QueryDef(
    "dd_semantic",
    Some("""WITH b AS (
           |  SELECT vec_id, embedding,
           |         CAST(CASE WHEN embedding[1] >= 0 THEN 32 ELSE 0 END
           |            + CASE WHEN embedding[2] >= 0 THEN 16 ELSE 0 END
           |            + CASE WHEN embedding[3] >= 0 THEN 8 ELSE 0 END
           |            + CASE WHEN embedding[4] >= 0 THEN 4 ELSE 0 END
           |            + CASE WHEN embedding[5] >= 0 THEN 2 ELSE 0 END
           |            + CASE WHEN embedding[6] >= 0 THEN 1 ELSE 0 END AS INTEGER) AS blk
           |  FROM embeddings),
           |p AS (
           |  SELECT y.vec_id AS vid, min(x.vec_id) AS dup_of
           |  FROM b x JOIN b y ON x.blk = y.blk AND x.vec_id < y.vec_id
           |  WHERE list_cosine_similarity(x.embedding::DOUBLE[], y.embedding::DOUBLE[]) >= 0.3
           |  GROUP BY y.vec_id)
           |SELECT b.vec_id, b.blk, p.dup_of,
           |       CASE WHEN p.dup_of IS NULL THEN 'keep' ELSE 'drop' END AS verdict
           |FROM b LEFT JOIN p ON b.vec_id = p.vid""".stripMargin),
    (spark, dir) =>
      Dedup.semanticNearDupVerdicts(
        Tables.embeddings(spark, dir), threshold = 0.3, signBits = 6))

  /** Cluster-representative selection — the step that makes dedup a
    * dedup: per near-dup component keep ONE document, the
    * highest-quality member (4-decimal quality, doc_id tiebreak), and
    * report the cluster size. Composes dd_components' closure with the
    * tx_quality_score formula; n_members = 1 rows are the untouched
    * singletons, so the output is a full keep/drop decision table.
    *
    * Scale design: the closure labels come from the banded-LSH pair set
    * (never all-pairs) + label propagation; quality is a map-side scalar
    * per doc; the rep choice is ONE partial-aggregable max_by per
    * component — no window, no per-cluster sort, no text in any shuffle
    * (the join key is doc_id, the carried payload two numbers).
    * rep_quality = max(quality) because the rep IS the quality argmax.
    */
  val ddClusterRep = QueryDef(
    "dd_cluster_rep",
    Some("""WITH RECURSIVE sh AS (
           |  SELECT doc_id,
           |         list_distinct([array_to_string(w[i:i+2], ' ')
           |                        FOR i IN range(1, greatest(len(w) - 1, 1))]) AS s
           |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)),
           |pairs AS (
           |  SELECT a.doc_id AS a, b.doc_id AS b
           |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
           |  WHERE len(list_intersect(a.s, b.s)) * 1.0 /
           |        (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.7),
           |edges AS (SELECT a, b FROM pairs UNION ALL SELECT b, a FROM pairs),
           |reach AS (
           |  SELECT doc_id AS src, doc_id AS node FROM sh
           |  UNION
           |  SELECT r.src, e.b FROM reach r JOIN edges e ON r.node = e.a),
           |comp AS (SELECT src AS doc_id, min(node) AS component_id
           |         FROM reach GROUP BY src),
           |f AS (
           |  SELECT doc_id, len(string_split(text, ' ')) AS n_tokens,
           |         len(list_distinct(string_split(text, ' '))) * 1.0
           |           / len(string_split(text, ' ')) AS ttr,
           |         len([t FOR t IN string_split(text, ' ') IF t IN ('the', 'a')])
           |           * 1.0 / len(string_split(text, ' ')) AS stop_ratio
           |  FROM documents),
           |q AS (SELECT doc_id,
           |             round(0.4 * least(n_tokens / 100.0, 1.0) + 0.4 * ttr
           |                 + 0.2 * least(stop_ratio * 5, 1.0), 4) AS quality
           |      FROM f),
           |j AS (SELECT comp.component_id, comp.doc_id, q.quality
           |      FROM comp JOIN q USING (doc_id)),
           |rep AS (SELECT component_id, doc_id AS rep_id
           |        FROM (SELECT *, row_number() OVER (
           |                PARTITION BY component_id
           |                ORDER BY quality DESC, doc_id) AS rn FROM j)
           |        WHERE rn = 1),
           |cnt AS (SELECT component_id, CAST(count(*) AS BIGINT) AS n_members,
           |               max(quality) AS rep_quality
           |        FROM j GROUP BY 1)
           |SELECT cnt.component_id, cnt.n_members, rep.rep_id, cnt.rep_quality
           |FROM cnt JOIN rep USING (component_id)""".stripMargin),
    (spark, dir) => {
      val docs = Tables.documents(spark, dir)
      val pairs = Dedup.minhashNearDups(docs, threshold = 0.7)
        .select(col("id_a").as("a"), col("id_b").as("b"))
      val comp = Dedup.connectedComponents(
          docs.select(col("doc_id").as("id")), pairs)
        .select(col("id").as("doc_id"), col("comp").as("component_id"))
      val qual = docs.select(col("doc_id"),
        r4(graft.functions.TextFns.qualityScore(col("text"))).as("quality"))
      comp.join(qual, Seq("doc_id"))
        .groupBy("component_id")
        .agg(count(lit(1)).as("n_members"),
          max_by(col("doc_id"), struct(col("quality"), -col("doc_id")))
            .as("rep_id"),
          max(col("quality")).as("rep_quality"))
        .select(col("component_id"), col("n_members"), col("rep_id"),
          col("rep_quality"))
    })

  /** Cross-source contamination matrix: near-dup pairs rolled up to the
    * (source, source) grain — which domains copy from which (the
    * diagonal is within-source duplication). The crawl-triage view that
    * decides whether a whole SOURCE is a mirror before any per-doc
    * verdict is spent on it.
    *
    * Scale design: the pair set is the banded-LSH output (never
    * all-pairs); the two source lookups join on doc_id carrying one
    * string; the matrix itself is ≤ #sources² rows out of a partial agg.
    */
  val ddCrossSourceMatrix = QueryDef(
    "dd_cross_source_matrix",
    Some("""WITH sh AS (
           |  SELECT doc_id,
           |         list_distinct([array_to_string(w[i:i+2], ' ')
           |                        FOR i IN range(1, greatest(len(w) - 1, 1))]) AS s
           |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)),
           |pairs AS (
           |  SELECT a.doc_id AS a, b.doc_id AS b
           |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
           |  WHERE len(list_intersect(a.s, b.s)) * 1.0 /
           |        (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.7),
           |m AS (SELECT doc_id, source FROM documents)
           |SELECT least(ma.source, mb.source) AS source_a,
           |       greatest(ma.source, mb.source) AS source_b,
           |       CAST(count(*) AS BIGINT) AS n_pairs
           |FROM pairs JOIN m ma ON pairs.a = ma.doc_id
           |           JOIN m mb ON pairs.b = mb.doc_id
           |GROUP BY 1, 2""".stripMargin),
    (spark, dir) => {
      val docs = Tables.documents(spark, dir)
      val pairs = Dedup.minhashNearDups(docs, threshold = 0.7)
        .select(col("id_a").as("a"), col("id_b").as("b"))
      val m = docs.select(col("doc_id"), col("source"))
      pairs
        .join(m.select(col("doc_id").as("a"), col("source").as("sa")), Seq("a"))
        .join(m.select(col("doc_id").as("b"), col("source").as("sb")), Seq("b"))
        .select(least(col("sa"), col("sb")).as("source_a"),
          greatest(col("sa"), col("sb")).as("source_b"))
        .groupBy("source_a", "source_b")
        .agg(count(lit(1)).as("n_pairs"))
    })

  /** Int8 embedding quantization audit: per-vector max-abs scale,
    * round-trip error, and retained cosine — the storage decision for a
    * 100 TB embedding store (4× smaller + SIMD-friendly) made with its
    * accuracy cost measured rather than assumed. Quantized values are
    * exact integers, so the whole round-trip is oracle-checkable.
    *
    * Scale design: strictly map-side — one projection chain per vector,
    * no shuffle, no state; the cosine check runs through the codegen'd
    * native expression. Lambdas reference only lambda variables and the
    * bound scale column (the lambda-lint rule).
    */
  val simQuantizeInt8 = QueryDef(
    "sim_quantize_int8",
    Some("""WITH s AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
           |mm AS (SELECT vec_id, e, list_max([abs(x) FOR x IN e]) AS m FROM s),
           |q AS (SELECT vec_id, e, m,
           |             [round(x * 127.0 / m) FOR x IN e] AS qv FROM mm WHERE m > 0),
           |d AS (SELECT vec_id, e, m, [x * m / 127.0 FOR x IN qv] AS dq FROM q)
           |SELECT vec_id,
           |       round(m, 4) AS scale,
           |       round(list_max([abs(e[i] - dq[i])
           |                       FOR i IN range(1, len(e) + 1)]), 4) AS max_abs_err,
           |       round(list_cosine_similarity(e, dq), 4) AS cos_keep""".stripMargin
      + "\nFROM d"),
    (spark, dir) => {
      val e = Tables.embeddings(spark, dir)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
      val mm = e
        .select(col("vec_id"), col("e"),
          array_max(transform(col("e"), x => abs(x))).as("m"))
        .filter(col("m") > 0)
      val d = mm
        .select(col("vec_id"), col("e"), col("m"),
          transform(col("e"), x => round(x * lit(127.0) / col("m"))).as("qv"))
        .select(col("vec_id"), col("e"), col("m"),
          transform(col("qv"), x => x * col("m") / lit(127.0)).as("dq"))
      d.select(col("vec_id"),
        r4(col("m")).as("scale"),
        r4(array_max(zip_with(col("e"), col("dq"), (a, b) => abs(a - b))))
          .as("max_abs_err"),
        r4(graft.plans.VectorFunctions.cosine_sim(col("e"), col("dq")))
          .as("cos_keep"))
    })

  /** Embedding-norm outlier detection (robust z via median/MAD, the
    * 3.5 Iglewicz-Hoaglin cutoff): degenerate or corrupt vectors — zero
    * rows, double-scaled batches, wrong normalization — show up as norm
    * outliers before any similarity result goes wrong. The outlier flag
    * compares the ROUNDED z in both engines so the verdict column is
    * bit-stable cross-engine.
    *
    * Scale design: the norm is the codegen'd native dot product
    * (map-side, one pass per scan); median and MAD are two sequential
    * scalar aggregates broadcast back as one-row frames — the norms are
    * deliberately recomputed per pass rather than checkpointed
    * (corpus-scale state for a map-cheap expression is a bad trade).
    * Exact `percentile` buffers the group's values; at real scale swap
    * for `approx_percentile`/GK (bounded memory) — the operator contract
    * is unchanged.
    */
  val simNormOutliers = QueryDef(
    "sim_norm_outliers",
    Some("""WITH n AS (SELECT vec_id,
           |                  sqrt(list_sum([x * x FOR x IN embedding::DOUBLE[]])) AS nrm
           |           FROM embeddings),
           |st AS (SELECT quantile_cont(nrm, 0.5) AS med FROM n),
           |m AS (SELECT quantile_cont(abs(nrm - med), 0.5) AS mad FROM n, st)
           |SELECT vec_id, round(nrm, 4) AS nrm,
           |       CASE WHEN mad > 0
           |            THEN round(0.6745 * (nrm - med) / mad, 4)
           |            ELSE 0.0 END AS robust_z,
           |       (CASE WHEN mad > 0
           |             THEN abs(round(0.6745 * (nrm - med) / mad, 4))
           |             ELSE 0.0 END > 3.5) AS is_outlier
           |FROM n, st, m""".stripMargin),
    (spark, dir) => {
      val n = Tables.embeddings(spark, dir)
        .select(col("vec_id"),
          sqrt(graft.plans.VectorFunctions.vector_dot(
            col("embedding").cast("array<double>"),
            col("embedding").cast("array<double>"))).as("nrm"))
      val st = n.agg(expr("percentile(nrm, 0.5)").as("med"))
      val withMed = n.crossJoin(broadcast(st)) // one row by construction
      val m = withMed.agg(expr("percentile(abs(nrm - med), 0.5)").as("mad"))
      // MAD = 0 is a REAL input class (exactly-normalized stores put >50%
      // of norms on the median): the convention is z = 0 / no outliers —
      // guarded identically in both engines so the verdict stays
      // bit-stable instead of null-vs-Infinity divergence.
      val z = when(col("mad") > 0,
        r4(lit(0.6745) * (col("nrm") - col("med")) / col("mad")))
        .otherwise(lit(0.0))
      withMed.crossJoin(broadcast(m)) // one row by construction
        .select(col("vec_id"), r4(col("nrm")).as("nrm"),
          z.as("robust_z"), (abs(z) > 3.5).as("is_outlier"))
    })

  /** Dedup-aware sampling weights: every document weighs 1/|its near-dup
    * cluster|, so a 6-copy boilerplate family contributes one document's
    * worth of probability mass to any downstream sampler — the standard
    * fix for near-dup-inflated mixtures (sample-then-dedup wastes budget;
    * dedup-then-sample loses the cluster-choice freedom). Per source:
    * raw count, effective (deduplicated) count, duplicated mass.
    *
    * Scale design: reuses the banded-LSH pair stream and the iterative
    * connected components (never all-pairs); cluster sizes join back on
    * component_id (partial-agg shuffle at component grain), and the final
    * report is #sources rows.
    */
  val ddDedupWeights = QueryDef(
    "dd_dedup_weights",
    Some("""WITH RECURSIVE sh AS (
           |  SELECT doc_id,
           |         list_distinct([array_to_string(w[i:i+2], ' ')
           |                        FOR i IN range(1, greatest(len(w) - 1, 1))]) AS s
           |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)),
           |pairs AS (
           |  SELECT a.doc_id AS a, b.doc_id AS b
           |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
           |  WHERE len(list_intersect(a.s, b.s)) * 1.0 /
           |        (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.7),
           |edges AS (SELECT a, b FROM pairs UNION ALL SELECT b, a FROM pairs),
           |reach AS (
           |  SELECT doc_id AS src, doc_id AS node FROM sh
           |  UNION
           |  SELECT r.src, e.b FROM reach r JOIN edges e ON r.node = e.a),
           |comp AS (SELECT src AS doc_id, min(node) AS component_id
           |         FROM reach GROUP BY src),
           |sz AS (SELECT component_id, count(*) AS n FROM comp GROUP BY 1),
           |wt AS (SELECT c.doc_id, CAST(1.0 AS DOUBLE) / s.n AS w
           |       FROM comp c JOIN sz s USING (component_id)),
           |agg AS (SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
           |               round(sum(wt.w), 4) AS eff_docs
           |        FROM documents d JOIN wt ON d.doc_id = wt.doc_id GROUP BY 1)
           |SELECT source, n_docs, eff_docs,
           |       round(1.0 - eff_docs / n_docs, 4) AS dup_mass
           |FROM agg""".stripMargin),
    (spark, dir) => {
      val docs = Tables.documents(spark, dir)
      val pairs = Dedup.minhashNearDups(docs, threshold = 0.7)
        .select(col("id_a").as("a"), col("id_b").as("b"))
      val comp = Dedup.connectedComponents(
          docs.select(col("doc_id").as("id")), pairs)
        .select(col("id").as("doc_id"), col("comp").as("component_id"))
      val sz = comp.groupBy("component_id").agg(count(lit(1)).as("n"))
      val wt = comp.join(sz, Seq("component_id"))
        .select(col("doc_id"), (lit(1.0) / col("n")).as("w"))
      docs.join(wt, Seq("doc_id"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), r4(sum(col("w"))).as("eff_docs"))
        .select(col("source"), col("n_docs"), col("eff_docs"),
          r4(lit(1.0) - col("eff_docs") / col("n_docs")).as("dup_mass"))
    })

  val all: Seq[QueryDef] = Seq(
    ddDedupWeights,
    ddExact, ddBowGroups, ddJaccardShingles, ddContainment, ddCdcChunks,
    ddPpjoin, ddMinhashLsh, ddSimhash, ddDupNgramSpans, ddTrimDupSpans, ddSelfRepeatTrim,
    ddDupSpanHist,
    ddEmbeddingNearDup, simKnnBrute, simKnnLsh, simKnnIvf, simCentroidAssign,
    ddComponents, ddIncremental, ddSemantic, ddSignalAgreement,
    ddChunkBoilerplate, ddClusterRep, ddCrossSourceMatrix, simQuantizeInt8,
    simNormOutliers, simKnnPq, simKnnIvfPq)
}
