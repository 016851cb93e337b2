package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.ml.Forecast
import graft.operators.{Dedup, Multimodal, Similarity}
import graft.pipeline.CorpusPipeline

/** Quantitative quality gates for the operators whose outputs are
  * engine-specific (no DuckDB oracle): instead of a bare rows-only check,
  * `qc_quant_gates` materializes the accuracy/sanity assertions the specs
  * make — MinHash recall against exact-Jaccard ground truth, IVF recall
  * against the brute-force baseline, ML holdout error, decode determinism,
  * funnel monotonicity — as one row per gate with an explicit pass flag.
  *
  * The driver records this like any rows-only query; `Verify` additionally
  * fails loudly (exit 2) if any gate's `pass` is false, so a silent
  * accuracy regression in a no-oracle operator becomes a red round instead
  * of an unnoticed row-count change.
  *
  * Excluded from Bench timing (`qc_` prefix): it re-runs several full
  * operators purely as a gate, not as a workload.
  */
object QuantGates {

  private val JACCARD_T = 0.7

  /** Exact all-pairs shingle-Jaccard truth (id_a < id_b, jaccard ≥ t)
    * via the inverted-index join — the ONE ground-truth construction
    * every similarity gate grades against (LSH in `qc_quant_gates`,
    * the candidate stage in `qc_ppjoin_candidates`). Shares nothing
    * with the machinery under audit: no prefix filter, no df ordering,
    * no banding.
    */
  private def exactJaccardPairs(
      docs: org.apache.spark.sql.DataFrame, shingleN: Int,
      t: Double): org.apache.spark.sql.DataFrame = {
    val sh = docs.select(col("doc_id"),
      graft.functions.TextFns.shingleHashes(col("text"), shingleN).as("s"))
    val sizes = sh.select(col("doc_id"), size(col("s")).as("n"))
    val ex = sh.select(col("doc_id").as("id_a"), explode(col("s")).as("shingle"))
    val ex2 = sh.select(col("doc_id").as("id_b"), explode(col("s")).as("shingle"))
    ex.join(ex2, Seq("shingle"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("inter"))
      .join(broadcast(sizes.toDF("id_a", "na")), "id_a")
      .join(broadcast(sizes.toDF("id_b", "nb")), "id_b")
      .filter(col("inter").cast("double") /
        (col("na") + col("nb") - col("inter")) >= t)
      .select("id_a", "id_b")
  }

  val qcQuantGates = QueryDef(
    "qc_quant_gates",
    None,
    (spark, dir) => {
      import spark.implicits._
      val docs = Tables.documents(spark, dir)

      // ---- ground truth: exact all-pairs shingle Jaccard ≥ 0.7 via the
      // inverted-index join (the same shape dd_jaccard_shingles pins
      // against DuckDB, here over ALL pairs, no probe slice); cached
      // under a key the ppjoin gate shares — the most expensive plan in
      // either gate builds once per fixture
      val truth = graft.ScopedCache.replace("qc_truth.jaccard",
        exactJaccardPairs(docs, 3, JACCARD_T))
      val nTruth = truth.count()

      // ---- gate 1/2: MinHash+LSH graded as a PAIR-SET DIFF, not a ratio:
      // the dd_minhash_lsh oracle pins the LSH output to the exact
      // brute-force pair set, so the gate mirrors that contract exactly —
      // zero missed pairs, zero extra pairs — and a failure PRINTS the
      // offending pairs (a recall ratio of 0.96 tells you nothing; the
      // pair (17,312) at jaccard 0.703 tells you which banding missed).
      val found = Dedup.minhashNearDups(docs, JACCARD_T, shingleN = 3)
        .select("id_a", "id_b")
      def pairList(df: org.apache.spark.sql.DataFrame): String =
        df.limit(11).collect()
          .map(r => s"(${r.getLong(0)},${r.getLong(1)})").mkString(" ")
      val missedDf = truth.join(found, Seq("id_a", "id_b"), "left_anti")
      val extraDf = found.join(truth, Seq("id_a", "id_b"), "left_anti")
      val nMissed = missedDf.count()
      val nExtra = extraDf.count()
      val missedDetail = if (nMissed == 0) "" else pairList(missedDf)
      val extraDetail = if (nExtra == 0) "" else pairList(extraDf)

      // ---- gate 3: SimHash signature determinism (two independent
      // computations agree on every doc)
      val s1 = Dedup.simhashSignatures(docs).toDF("id", "sig1")
      val s2 = Dedup.simhashSignatures(docs).toDF("id", "sig2")
      val simhashDiff = s1.join(s2, "id")
        .filter(col("sig1") =!= col("sig2")).count().toDouble

      // ---- gate 3b: SimHash banding EXACTNESS — the pigeonhole claim
      // that 16-bit band blocking finds EVERY pair with hamming ≤ 3.
      // Grade the banded candidate set against the brute-force all-pairs
      // hamming join over the same signatures — must match both ways.
      // (Since r11 dd_simhash is ALSO DuckDB-oracled via the portable
      // md5 hash mode; this gate keeps the production xxhash64 mode
      // covered at the same exactness bar.)
      val sigPairsBrute = s1.toDF("id_a", "sig_a")
        .join(s2.toDF("id_b", "sig_b"), col("id_a") < col("id_b"))
        .filter(Dedup.hamming64(col("sig_a"), col("sig_b")) <= 3)
        .select("id_a", "id_b")
      val banded = Dedup.simhashCandidates(docs, maxDist = 3)
        .select("id_a", "id_b")
      val simhashBandDiff =
        (sigPairsBrute.join(banded, Seq("id_a", "id_b"), "left_anti").count() +
          banded.join(sigPairsBrute, Seq("id_a", "id_b"), "left_anti").count()).toDouble

      // ---- gate 3c: the portable-md5 mode (what the graded dd_simhash
      // runs against its DuckDB oracle) honors the same banding
      // exactness over ITS signature family
      val sp = Dedup.simhashSignatures(docs, portable = true)
      val sigPairsBruteP = sp.toDF("id_a", "sig_a")
        .join(sp.toDF("id_b", "sig_b"), col("id_a") < col("id_b"))
        .filter(Dedup.hamming64(col("sig_a"), col("sig_b")) <= 3)
        .select("id_a", "id_b")
      val bandedP = Dedup.simhashCandidates(docs, maxDist = 3, portable = true)
        .select("id_a", "id_b")
      val simhashPortableBandDiff =
        (sigPairsBruteP.join(bandedP, Seq("id_a", "id_b"), "left_anti").count() +
          bandedP.join(sigPairsBruteP, Seq("id_a", "id_b"), "left_anti").count()).toDouble

      // ---- gate 4: IVF ANN recall@5 vs the exact brute-force baseline
      val e = Tables.embeddings(spark, dir)
      val probes = e.filter(col("vec_id") % 25 === 0)
      val ivf = Similarity.ivfKnn(probes, e, k = 5, nCells = 16, nProbe = 2)
        .select("probe_id", "cand_id")
      val brute = Similarity.bruteForceKnn(probes, e, k = 5)
        .select("probe_id", "cand_id")
      val nBrute = brute.count()
      val ivfHit = ivf.join(brute, Seq("probe_id", "cand_id"), "left_semi").count()
      val ivfRecall = if (nBrute == 0) 1.0 else ivfHit.toDouble / nBrute

      // ---- gate 4b: PQ/ADC recall@5 vs the same brute baseline (8 codes
      // per vector + top-40 exact re-rank must preserve the neighborhood)
      val pq = Similarity.pqKnn(probes, e, k = 5, m = 8, kSub = 16, rerank = 40)
        .select("probe_id", "cand_id")
      val pqHit = pq.join(brute, Seq("probe_id", "cand_id"), "left_semi").count()
      val pqRecall = if (nBrute == 0) 1.0 else pqHit.toDouble / nBrute

      // ---- gate 4c: IVF-PQ composed recall@5 — cells prune AND codes
      // compress; the composition must still hold a floor between the
      // single-leg gates (pruning can only lose vs exhaustive PQ)
      val ivfpq = Similarity.ivfPqKnn(probes, e, k = 5,
          nCells = 16, nProbe = 4, m = 8, kSub = 16, rerank = 40)
        .select("probe_id", "cand_id")
      val ivfpqHit =
        ivfpq.join(brute, Seq("probe_id", "cand_id"), "left_semi").count()
      val ivfpqRecall = if (nBrute == 0) 1.0 else ivfpqHit.toDouble / nBrute

      // ---- gate 5: ML holdout MAE relative to the mean label (scale-free
      // error bound; the RF must beat a 50%-of-mean naive band)
      val features = Forecast.buildDailyFeatures(Tables.events(spark, dir))
      val trained = Forecast.trainCached(dir, features)
      val meanFare = features.agg(avg(abs(col("avg_fare")))).head.getDouble(0)
      val maeRatio =
        if (trained.holdoutMae.isNaN) 0.0 // degenerate fixture: no holdout
        else trained.holdoutMae / meanFare

      // ---- gate 6: multimodal decode determinism over the REAL codecs
      // (two independent encode+decode runs agree on every decoded
      // feature, not just the checksum) + no payload degrades to
      // "unknown" (every encoded byte stream parses as its real format)
      val media = Multimodal.attachMediaPayloads(docs)
      val d1 = Multimodal.decodeFeatures(media).toDF()
      val d2 = Multimodal.decodeFeatures(
        Multimodal.attachMediaPayloads(docs)).toDF()
      val decodeDiff =
        (d1.select(col("doc_id"),
            struct(col("format"), col("width"), col("height"),
              col("sample_rate"), col("n_frames"), col("brightness"),
              col("checksum")).as("f1"))
          .join(d2.select(col("doc_id"),
            struct(col("format"), col("width"), col("height"),
              col("sample_rate"), col("n_frames"), col("brightness"),
              col("checksum")).as("f2")), "doc_id")
          .filter(col("f1") =!= col("f2")).count() +
          d1.filter(col("format") === "unknown").count()).toDouble

      // ---- gate 8: snapshot commit-protocol integrity — append, append,
      // overwrite, append against a scratch table: latest must see exactly
      // the post-overwrite rows, v1 must still time-travel (value counts
      // integrity violations; the concurrent-race variant is spec-level)
      val snapDir = java.nio.file.Files
        .createTempDirectory("graft_gate_snap").toString + "/t"
      import graft.warehouse.Snapshots
      Snapshots.commitAppend(spark, Seq(1L, 2L).toDF("id"), snapDir)
      Snapshots.commitAppend(spark, Seq(3L).toDF("id"), snapDir)
      Snapshots.commitOverwrite(spark, Seq(10L).toDF("id"), snapDir)
      Snapshots.commitAppend(spark, Seq(11L).toDF("id"), snapDir)
      val latest = Snapshots.read(spark, snapDir)
        .collect().map(_.getLong(0)).toSet
      val v1 = Snapshots.read(spark, snapDir, Some(1L))
        .collect().map(_.getLong(0)).toSet
      val snapViolations =
        (if (latest == Set(10L, 11L)) 0 else 1) +
        (if (v1 == Set(1L, 2L)) 0 else 1) +
        (if (Snapshots.currentVersion(spark, snapDir) == 4L) 0 else 1)

      // ---- gate 8b: change-feed integrity on the same scratch table —
      // an append step's incremental read is exactly the appended rows
      // (served from only the step's added files), and an OPTIMIZE
      // rewrite nets out to an EMPTY row-level feed (carried rows must
      // cancel; any residue means the feed invents changes on rewrites)
      val feed34 = Snapshots.incrementalRead(spark, snapDir, 3L, 4L)
        .collect().map(_.getLong(0)).toSet
      val cdfAppendDiff = (if (feed34 == Set(11L)) 0 else 1).toDouble
      val optV = Snapshots.compactData(spark, snapDir,
        targetFiles = 1, minFiles = 2)
      val cdfRewriteNoise = optV match {
        case Some(v) =>
          Snapshots.rowDiff(spark, snapDir, v - 1, v, Seq("id")).count().toDouble
        // a fixture too small to compact means the property never ran —
        // that is a gate failure, not a free pass
        case None => 1.0
      }

      // ---- gate 6b: stats-manifest file skipping — a z-ordered slice of
      // lineitem with a _graft_stats manifest must answer a 2-d box read
      // from a strict minority of its files AND equal the full-scan
      // filter exactly (file-level min/max can't produce false skips)
      val statsBase = java.nio.file.Files
        .createTempDirectory("graft_qc_stats").toString + "/z"
      val li = Tables.lineitem(spark, dir)
        .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"))
      graft.operators.Layout.zorderWrite(li, "l_partkey", "l_suppkey",
        statsBase, numFiles = 32)
      graft.operators.Layout.writeStatsManifest(spark, statsBase,
        Seq("l_partkey", "l_suppkey"))
      val bounds = li.agg(max(col("l_partkey")), max(col("l_suppkey"))).head
      val (pHi, sHi) = (bounds.getLong(0) / 4.0, bounds.getLong(1) / 4.0)
      val statsBox = col("l_partkey") <= pHi && col("l_suppkey") <= sHi
      val prunedCount = graft.operators.Layout
        .statsPrunedRead(spark, statsBase,
          Seq(("l_partkey", 0.0, pHi), ("l_suppkey", 0.0, sHi)))
        .filter(statsBox).count()
      val fullCount = spark.read.parquet(statsBase).filter(statsBox).count()
      val statsEqualityDiff = math.abs(prunedCount - fullCount).toDouble
      val statsPruneRate = graft.operators.Layout.lastStatsPruned match {
        case Some((read, total)) if total > 0 => 1.0 - read.toDouble / total
        case _ => 0.0
      }

      // ---- gate 6c: STRING-column clustering + stats skipping — the
      // corpus layout shape (documents keyed by `source`): a z-order on
      // (source, n_chars) with a typed stats manifest must answer a
      // source-band + length-band box from a strict minority of files
      // AND equal the full-scan filter exactly (lexicographic file
      // ranges can't produce false skips)
      val strBase = java.nio.file.Files
        .createTempDirectory("graft_qc_strstats").toString + "/z"
      val docsLayout = Tables.documents(spark, dir)
        .select(col("doc_id"), col("source"), col("n_chars"))
      graft.operators.Layout.zorderFrameN(
        docsLayout, Seq("source", "n_chars"), 32)
        .write.parquet(strBase)
      graft.operators.Layout.writeStatsManifest(spark, strBase,
        Seq("source", "n_chars"))
      val srcs = docsLayout.select("source").distinct()
        .orderBy("source").collect().map(_.getString(0))
      val (srcLo, srcHi) = (srcs.head, srcs(math.max(0, srcs.length / 4 - 1)))
      val lenHi = docsLayout.agg(expr("approx_percentile(n_chars, 0.25)"))
        .head.getLong(0).toDouble
      val strBox = col("source").between(srcLo, srcHi) &&
        col("n_chars") <= lenHi
      val strPrunedCount = graft.operators.Layout
        .statsPrunedRead(spark, strBase,
          Seq(("source", srcLo, srcHi), ("n_chars", 0.0, lenHi)))
        .filter(strBox).count()
      val strFullCount = spark.read.parquet(strBase).filter(strBox).count()
      val strStatsEqualityDiff =
        math.abs(strPrunedCount - strFullCount).toDouble
      val strStatsPruneRate = graft.operators.Layout.lastStatsPruned match {
        case Some((read, total)) if total > 0 => 1.0 - read.toDouble / total
        case _ => 0.0
      }

      // ---- gate 7: corpus funnel monotonicity (each stage's survivor
      // count never exceeds the previous stage's)
      val report = CorpusPipeline.run(docs,
        CorpusPipeline.Config(minTokens = 20, minTtr = 0.05,
          nearDupThreshold = 0.7)).report
      val rows = report.orderBy("stage_no")
        .select("rows").collect().map(_.getLong(0))
      val monotone = rows.zip(rows.tail).count { case (a, b) => b > a }.toDouble

      // ---- gates 10/11: bloom pre-filter contract — zero false
      // negatives (every replayed doc flagged might_dup) and real
      // pruning power (most genuinely-new docs skip the dedup join; at
      // 64 bits/item the expected fp rate is ≪ 1%, gate at ≥ 0.5)
      val bloomExisting = docs.filter(col("doc_id") % 5 =!= 0)
      val bloomBatch = docs.filter(col("doc_id") % 5 === 0)
        .unionByName(bloomExisting.filter(col("doc_id") % 7 === 1)
          .withColumn("doc_id", col("doc_id") + lit(10000000L)))
      val pre = Dedup.bloomPrefilter(bloomExisting, bloomBatch,
        expectedItems = 1000L, numBits = 64000L)
      val exTexts = bloomExisting.select("text").distinct()
      val bloomFalseNeg = pre.filter(!col("might_dup"))
        .join(exTexts, Seq("text"), "left_semi").count().toDouble
      val freshRows = pre.join(exTexts, Seq("text"), "left_anti")
      val freshTotal = freshRows.count()
      val bloomPrune =
        if (freshTotal == 0) 1.0
        else freshRows.filter(!col("might_dup")).count().toDouble / freshTotal

      // ---- gate 12: pHash banding exactness — the image near-dup pairs
      // (mm_phash_neardup) must equal the brute-force Hamming<=3 pair set
      // over the same signatures, both directions (pigeonhole soundness
      // of the shared 16-bit banding, now on the pHash path)
      val phSigs = graft.operators.Multimodal.phashSignatures(
        graft.operators.Multimodal.attachMediaPayloads(docs)
          .filter(col("media_type") === "image"))
      val phBrute = phSigs.toDF("id_a", "sig_a")
        .join(phSigs.toDF("id_b", "sig_b"), col("id_a") < col("id_b"))
        .filter(Dedup.hamming64(col("sig_a"), col("sig_b")) <= 3)
        .select("id_a", "id_b")
      val phBanded = Dedup.bandedHammingPairs(phSigs, maxDist = 3)
        .select("id_a", "id_b")
      val phashBandDiff =
        (phBrute.join(phBanded, Seq("id_a", "id_b"), "left_anti").count() +
          phBanded.join(phBrute, Seq("id_a", "id_b"), "left_anti").count())
          .toDouble

      Seq(
        // pair-set diff must be empty both ways — the dd_minhash_lsh
        // oracle grades the LSH output against the brute-force pair set,
        // so any banding miss is a correctness failure, not an accuracy
        // tradeoff; `detail` carries the offending pairs on failure
        ("minhash_missed_pairs", nMissed.toDouble, 0.0, "<=", missedDetail),
        ("minhash_extra_pairs", nExtra.toDouble, 0.0, "<=", extraDetail),
        ("simhash_nondeterministic_ids", simhashDiff, 0.0, "<=", ""),
        ("simhash_banding_vs_brute_diff", simhashBandDiff, 0.0, "<=", ""),
        ("simhash_portable_banding_diff", simhashPortableBandDiff, 0.0, "<=", ""),
        ("ivf_recall_at5", ivfRecall, 0.3, ">=", ""),
        ("pq_recall_at5", pqRecall, 0.5, ">=", ""),
        // floor 0.35: above the ivf leg's 0.3 (the composition must not
        // cost recall vs plain IVF at the same budget class) but with
        // fixture-drift margin under the measured 0.42 at sf0.01
        ("ivfpq_recall_at5", ivfpqRecall, 0.35, ">=", ""),
        ("ml_holdout_mae_over_mean", maeRatio, 0.5, "<=", ""),
        ("decode_nondeterministic_ids", decodeDiff, 0.0, "<=", ""),
        ("funnel_monotonicity_violations", monotone, 0.0, "<=", ""),
        ("snapshot_protocol_violations", snapViolations.toDouble, 0.0, "<=", ""),
        ("cdf_append_feed_diff", cdfAppendDiff, 0.0, "<=", ""),
        ("cdf_rewrite_noise_rows", cdfRewriteNoise, 0.0, "<=", ""),
        ("bloom_false_negatives", bloomFalseNeg, 0.0, "<=", ""),
        ("bloom_prune_rate", bloomPrune, 0.5, ">=", ""),
        ("stats_pruned_vs_full_diff", statsEqualityDiff, 0.0, "<=", ""),
        ("stats_file_prune_rate", statsPruneRate, 0.5, ">=", ""),
        ("str_stats_pruned_vs_full_diff", strStatsEqualityDiff, 0.0, "<=", ""),
        // a quarter-band on each of two clustered dims: even with a
        // domain-weighted string rank the read set must stay a minority
        ("str_stats_file_prune_rate", strStatsPruneRate, 0.5, ">=", ""),
        ("phash_banding_vs_brute_diff", phashBandDiff, 0.0, "<=", "")
      ).map { case (gate, value, threshold, op, detail) =>
        val pass = op match {
          case ">=" => value >= threshold
          case _    => value <= threshold
        }
        (gate, math.rint(value * 10000) / 10000, threshold, op, pass, detail)
      }.toDF("gate", "value", "threshold", "op", "pass", "detail")
        .orderBy("gate")
    })

  /** IVF recall@5 curve across probe budgets — the accuracy/cost
    * tradeoff every ANN deployment is tuned on, quantified instead of
    * assumed. nProbe ∈ {1, 2, 4, 8, 16} of 16 cells; each row carries
    * its own gate verdict: the curve must be non-decreasing (scanning
    * more cells can only add candidates — the per-cell rankings are
    * deterministic) and the full-scan endpoint (nProbe = nCells) must
    * recover the exact brute-force top-k, because at that point IVF
    * degenerates to an exhaustive search with the same tiebreak.
    * `qc_` prefix: correctness instrumentation, excluded from Bench;
    * Verify exits 2 if any row's gate fails.
    */
  val qcIvfRecallCurve = QueryDef(
    "qc_ivf_recall_curve",
    None,
    (spark, dir) => {
      import spark.implicits._
      val e = Tables.embeddings(spark, dir)
      val probes = e.filter(col("vec_id") % 25 === 0)
      val brute = Similarity.bruteForceKnn(probes, e, k = 5)
        .select("probe_id", "cand_id")
      val nBrute = brute.count()
      val recalls = Seq(1, 2, 4, 8, 16).map { np =>
        val hit = Similarity.ivfKnn(probes, e, k = 5, nCells = 16, nProbe = np)
          .join(brute, Seq("probe_id", "cand_id"), "left_semi").count()
        np -> (if (nBrute == 0) 1.0 else hit.toDouble / nBrute)
      }
      val monotone = recalls.zip(recalls.tail).forall {
        case ((_, a), (_, b)) => b >= a - 1e-12
      }
      recalls.map { case (np, r) =>
        val pass = monotone && (np != 16 || r >= 1.0 - 1e-12)
        (np, math.rint(r * 10000) / 10000, pass)
      }.toDF("nprobe", "recall_at5", "pass")
        .orderBy("nprobe")
    })

  /** HyperLogLog++ accuracy audit: approx_count_distinct vs the exact
    * distinct count on three cardinality profiles (users ~10², order
    * keys ~10⁴, lineitem partkeys ~10⁴ with heavy repetition). Each row
    * gates |approx/exact − 1| ≤ 3·rsd — beyond three standard errors
    * the sketch implementation (not the data) is wrong. The audit that
    * justifies `Scale.approxDistinct` replacing exact distincts at
    * 100 TB cardinalities.
    */
  val qcHllAccuracy = QueryDef(
    "qc_hll_accuracy",
    None,
    (spark, dir) => {
      import spark.implicits._
      val rsd = 0.05
      def audit(name: String, df: org.apache.spark.sql.DataFrame, c: String) = {
        val row = df.agg(
          countDistinct(col(c)).as("exact"),
          approx_count_distinct(col(c), rsd).as("approx")).head
        val exact = row.getLong(0)
        val approx = row.getLong(1)
        val relErr = if (exact == 0) 0.0
          else math.abs(approx.toDouble / exact - 1.0)
        (name, exact, approx, math.rint(relErr * 10000) / 10000,
          relErr <= 3 * rsd)
      }
      Seq(
        audit("events_users", Tables.events(spark, dir), "user_id"),
        audit("orders_keys", Tables.orders(spark, dir), "o_orderkey"),
        audit("lineitem_parts", Tables.lineitem(spark, dir), "l_partkey")
      ).toDF("metric", "exact", "approx", "rel_err", "pass")
        .orderBy("metric")
    })

  /** PQ rerank sweep: recall@5 for rerank ∈ {10, 20, 40, 80} — the ADC
    * shortlist accuracy/cost knob quantified the way qc_ivf_recall_curve
    * does nProbe. Gates: the curve is non-decreasing (a longer exact
    * re-rank list can only improve the final top-k) and the production
    * budgets (rerank ≥ 40, what sim_knn_pq ships with) must clear the
    * qc_quant_gates floor of 0.5 — the smaller budgets are
    * informational points on the tradeoff curve, not deployments.
    */
  val qcPqRecallCurve = QueryDef(
    "qc_pq_recall_curve",
    None,
    (spark, dir) => {
      import spark.implicits._
      val e = Tables.embeddings(spark, dir)
      val probes = e.filter(col("vec_id") % 25 === 0)
      val brute = Similarity.bruteForceKnn(probes, e, k = 5)
        .select("probe_id", "cand_id")
      val nBrute = brute.count()
      val recalls = Seq(10, 20, 40, 80).map { rr =>
        val hit = Similarity.pqKnn(probes, e, k = 5, m = 8, kSub = 16,
            rerank = rr)
          .join(brute, Seq("probe_id", "cand_id"), "left_semi").count()
        rr -> (if (nBrute == 0) 1.0 else hit.toDouble / nBrute)
      }
      val monotone = recalls.zip(recalls.tail).forall {
        case ((_, a), (_, b)) => b >= a - 1e-12
      }
      recalls.map { case (rr, r) =>
        (rr, math.rint(r * 10000) / 10000, monotone && (rr < 40 || r >= 0.5))
      }.toDF("rerank", "recall_at5", "pass")
        .orderBy("rerank")
    })

  /** Hash-uniformity audit of the sampling primitive: every smp_* and
    * split operator derives its determinism from `Sampling.hexVal`
    * (md5-prefix → [0, 65536)); if that map were biased, every sampling
    * rate in the engine would silently drift from its nominal value.
    * Chi-square over 16 equal-width value buckets against the uniform
    * expectation, gated at the p ≈ 0.001 critical value for 15 dof
    * (37.70) on two key populations.
    */
  val qcHashUniformity = QueryDef(
    "qc_hash_uniformity",
    None,
    (spark, dir) => {
      import spark.implicits._
      val crit = 37.70 // chi-square 0.999 quantile, 15 dof
      def audit(name: String, df: org.apache.spark.sql.DataFrame, c: String) = {
        val counts = df
          .select(pmod(graft.operators.Sampling.hexVal(col(c)), lit(16))
            .as("bucket"))
          .groupBy("bucket").agg(count(lit(1)).as("n"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val n = counts.values.sum.toDouble
        val e = n / 16.0
        val chi2 = (0L until 16L).map { b =>
          val o = counts.getOrElse(b, 0L).toDouble
          (o - e) * (o - e) / e
        }.sum
        (name, math.rint(chi2 * 100) / 100, 15L, crit, chi2 <= crit)
      }
      Seq(
        audit("documents_doc_id", Tables.documents(spark, dir), "doc_id"),
        audit("events_event_id", Tables.events(spark, dir), "event_id")
      ).toDF("metric", "chi2", "dof", "critical", "pass")
        .orderBy("metric")
    })

  /** Quantile-sketch accuracy audit: `approx_percentile` (Greenwald-
    * Khanna style, accuracy = 1000 → guaranteed rank error ≤ n/1000)
    * vs the exact rank of the returned value, at p50/p90/p99 on two
    * value profiles (uniform-ish prices, discrete heavy-tied
    * quantities). The returned value's exact rank interval
    * [count(x < v), count(x ≤ v)] must sit within εn of the target
    * rank q·n — the guarantee itself, gated per row. The audit that
    * justifies swapping exact percentile_disc for the sketch at 100 TB
    * (a17_percentile stays exact; this quantifies the substitution).
    */
  val qcQuantileAccuracy = QueryDef(
    "qc_quantile_accuracy",
    None,
    (spark, dir) => {
      import spark.implicits._
      val acc = 1000
      val qs = Seq(0.5, 0.9, 0.99)
      def audit(name: String, df: org.apache.spark.sql.DataFrame, c: String) = {
        val x = graft.ScopedCache.replace(s"qc_quant.$name",
          df.select(col(c).cast("double").as("x")))
        val n = x.count().toDouble
        val approx = x.agg(percentile_approx(col("x"),
            array(qs.map(lit): _*), lit(acc)).as("a"))
          .head.getSeq[Double](0)
        qs.zip(approx).map { case (q, v) =>
          val lo = x.filter(col("x") < v).count().toDouble
          val hi = x.filter(col("x") <= v).count().toDouble
          val target = q * n
          val rankErr = (math.max(0.0, math.max(lo - target, target - hi))) / n
          (name, q, math.rint(v * 10000) / 10000,
            math.rint(rankErr * 100000) / 100000, rankErr <= 1.0 / acc + 1e-9)
        }
      }
      (audit("lineitem_price", Tables.lineitem(spark, dir), "l_extendedprice") ++
        audit("lineitem_qty", Tables.lineitem(spark, dir), "l_quantity"))
        .toDF("metric", "q", "approx_value", "rank_err", "pass")
        .orderBy("metric", "q")
    })

  /** PPJoin join-amplification audit: the prefix self-join's candidate-
    * pair count published next to the verified-pair count (the n_wedges
    * idea applied to dd_ppjoin). The candidate stage is where PPJoin's
    * exactness contract spends its cost at 100 TB; a regression there
    * (lost length filter, df-ordering bug inflating prefixes) multiplies
    * runtime long before it changes any answer, so it must be auditable
    * from a census row, not discovered in a bench tail. Gates:
    * candidates stay a vanishing fraction of the all-pairs space (the
    * prefix filter's whole point), no TRUE pair escapes the candidate
    * stage, and the verified output equals the truth exactly. The truth
    * set is computed INDEPENDENTLY of the prefix machinery (the same
    * inverted-index all-pairs Jaccard `qc_quant_gates` grades LSH with —
    * it shares nothing with PPJoin's df-ordering/prefix/length logic),
    * so a candidate-stage regression that drops pairs actually trips
    * the gate — the r11 containment check joined the candidate set
    * against itself and could never fire.
    */
  val qcPpjoinCandidates = QueryDef(
    "qc_ppjoin_candidates",
    None,
    (spark, dir) => {
      import spark.implicits._
      val docs = Tables.documents(spark, dir)
      val nDocs = docs.count().toDouble
      val allPairs = nDocs * (nDocs - 1) / 2.0
      val cands = graft.ScopedCache.replace("qc_ppjoin.cands",
        Dedup.ppjoinCandidatePairs(docs, JACCARD_T).select("id_a", "id_b"))
      val nCand = cands.count().toDouble
      // verify the CACHED candidates — the prefix self-join (the very
      // cost this gate audits) runs once, not twice
      val verified = graft.ScopedCache.replace("qc_ppjoin.verified",
        Dedup.verifyPpjoinCandidates(docs, cands, JACCARD_T,
          "text", "doc_id", 3).select("id_a", "id_b"))
      val nVer = verified.count().toDouble
      // independent truth: inverted-index exact all-pairs Jaccard — no
      // prefix filter, no df ordering, no length bound (shared helper +
      // shared cache key with qc_quant_gates: one truth, built once,
      // probed by three counts here without re-running the self-join)
      val truth = graft.ScopedCache.replace("qc_truth.jaccard",
        exactJaccardPairs(docs, 3, JACCARD_T))
      val missedByCands = truth.join(cands, Seq("id_a", "id_b"), "left_anti").count()
      val verDiff =
        truth.join(verified, Seq("id_a", "id_b"), "left_anti").count() +
          verified.join(truth, Seq("id_a", "id_b"), "left_anti").count()
      Seq(
        ("ppjoin_verified_pairs", nVer, 1.0, ">=",
          s"candidates=${nCand.toLong} all_pairs=${allPairs.toLong}"),
        ("ppjoin_candidates_per_verified",
          if (nVer == 0) 0.0 else nCand / nVer, 50.0, "<=", ""),
        ("ppjoin_candidate_fraction_of_allpairs",
          if (allPairs == 0) 0.0 else nCand / allPairs, 0.05, "<=", ""),
        ("ppjoin_true_pairs_missing_from_candidates",
          missedByCands.toDouble, 0.0, "<=", "vs independent inverted-index truth"),
        ("ppjoin_verified_vs_truth_diff", verDiff.toDouble, 0.0, "<=", "")
      ).map { case (gate, value, threshold, op, detail) =>
        val pass = op match {
          case ">=" => value >= threshold
          case _    => value <= threshold
        }
        (gate, math.rint(value * 10000) / 10000, threshold, op, pass, detail)
      }.toDF("gate", "value", "threshold", "op", "pass", "detail")
        .orderBy("gate")
    })

  /** Span-trim semantic audit. The canonical-owner policy has a known
    * theoretical limit: overlapping duplicated spans with DIFFERENT
    * owners can cut into each other inside the owner's text, so "every
    * cross-doc gram survives somewhere" is a property of the data, not
    * of the algorithm — exactly the kind of silent semantic erosion that
    * must be measured, not assumed. Gates: (a) hard invariant — no doc
    * keeps more tokens than it had; (b) measured guarantee — the
    * fraction of distinct cross-doc grams still present as windows in
    * the trimmed corpus (1.0 on the fixtures; the 0.95 floor leaves
    * room for adversarial overlap without letting retention quietly
    * collapse).
    */
  val qcTrimInvariants = QueryDef(
    "qc_trim_invariants",
    None,
    (spark, dir) => {
      import spark.implicits._
      val docs = Tables.documents(spark, dir)
      val td = graft.ScopedCache.replace("qc_trim.docs",
        Dedup.trimmedDocs(docs, n = 8))
      val violations = td.filter(col("n_kept") > col("n_tokens")).count()
      def winHashes(df: org.apache.spark.sql.DataFrame, textCol: String) =
        df.select(col("doc_id"),
          explode(graft.plans.ShingleHash64.shingle_hash64(
            graft.functions.TextFns.tokens(col(textCol)), 8)).as("h"))
      val crossGrams = winHashes(docs, "text")
        .groupBy("h").agg(min(col("doc_id")).as("lo"), max(col("doc_id")).as("hi"))
        .filter(col("lo") =!= col("hi")).select("h")
      val nCross = crossGrams.count()
      val surviving = crossGrams
        .join(winHashes(td, "trimmed").select("h").distinct(), Seq("h"), "left_semi")
        .count()
      val retention = if (nCross == 0) 1.0 else surviving.toDouble / nCross
      Seq(
        ("trim_kept_gt_tokens_violations", violations.toDouble, 0.0, "<=", ""),
        ("trim_crossdoc_gram_retention", retention, 0.95, ">=",
          s"surviving=$surviving of $nCross")
      ).map { case (gate, value, threshold, op, detail) =>
        val pass = op match {
          case ">=" => value >= threshold
          case _    => value <= threshold
        }
        (gate, math.rint(value * 10000) / 10000, threshold, op, pass, detail)
      }.toDF("gate", "value", "threshold", "op", "pass", "detail")
        .orderBy("gate")
    })

  /** Rolling cumulative distinct via MERGEABLE HLL sketches — the
    * incremental-telemetry shape a 100 TB warehouse runs nightly: one
    * sketch per day (the unit a pipeline would PERSIST as a binary
    * column; round-trip proven in ScaleSpec), cumulative distinct as a
    * running UNION of sketches — never a rescan of history, O(days ×
    * 2^lgK) state instead of O(users × days). Exact truth comes free at
    * audit scale from the first-seen-day census (a user adds to
    * cumulative distinct exactly once, on its first day), and every day
    * is gated at |approx/exact − 1| ≤ 3·rsd(lgK=14) ≈ 2.4% (gate at 3%).
    * The running-union window is metadata-scale (one row per DAY), so
    * the single-partition window is deliberate.
    */
  val qcHllRolling = QueryDef(
    "qc_hll_rolling",
    None,
    (spark, dir) => {
      import org.apache.spark.sql.expressions.Window
      val ev = Tables.events(spark, dir)
        .select(to_date(col("ts")).as("day"), col("user_id"))
      val daily = ev.groupBy(col("day"))
        .agg(hll_sketch_agg(col("user_id"), lit(14)).as("sk"))
      // metadata-scale window (one row per day) — single partition is
      // deliberate; the sketches, not the events, flow through it
      def cumW = Window.orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val approx = daily
        .withColumn("approx_cum",
          hll_sketch_estimate(hll_union_agg(col("sk")).over(cumW)))
        .select("day", "approx_cum")
      val firstDays = ev.groupBy(col("user_id")).agg(min(col("day")).as("day"))
        .groupBy(col("day")).agg(count(lit(1)).as("new_users"))
      approx.join(firstDays, Seq("day"), "left")
        .na.fill(0, Seq("new_users"))
        .withColumn("exact_cum", sum(col("new_users")).over(cumW))
        .withColumn("rel_err",
          abs(col("approx_cum") / col("exact_cum") - 1))
        .select(col("day"), col("new_users"), col("exact_cum"),
          col("approx_cum").cast("long").as("approx_cum"),
          round(col("rel_err"), 4).as("rel_err"),
          (col("rel_err") <= 0.03).as("pass"))
        .orderBy("day")
    })

  /** Rolling quantiles via MERGEABLE KLL sketches — the quantile twin of
    * [[qcHllRolling]] and the second persisted-sketch family: one
    * KLL(k=200) sketch per day over `events.value`, PERSISTED as a
    * binary parquet column and read back (the nightly sketch store a
    * 100 TB telemetry pipeline maintains — the round-trip is
    * load-bearing, the rolling merge runs on the REREAD bytes), with the
    * cumulative median served by `kll_merge_agg` over a running window —
    * never a rescan of history, O(days × k) state instead of
    * O(rows × days). Every day is gated on the EXACT normalized rank of
    * the sketch's median within that day's cumulative data:
    * |rank − 0.5| ≤ 0.025 (KLL k=200 single-sided 99% rank error ≈
    * 1.65%; cushion to 2.5%). The exact ranks come from ONE
    * conditional-aggregation pass over events (2 columns per day, days
    * are census-scale), so the truth side never shuffles per day.
    */
  val qcKllRolling = QueryDef(
    "qc_kll_rolling",
    None,
    (spark, dir) => {
      import org.apache.spark.sql.expressions.Window
      import spark.implicits._
      val ev = Tables.events(spark, dir)
        .select(to_date(col("ts")).as("day"), col("value"))
        .filter(col("value").isNotNull)
        .localCheckpoint(true) // two bounded passes read the same blocks
      val store = java.nio.file.Files
        .createTempDirectory("graft_qc_kll").toString + "/sketches"
      ev.groupBy("day")
        .agg(call_function("kll_sketch_agg_double", col("value"), lit(200))
          .as("sk"))
        .write.mode("overwrite").parquet(store)
      val daily = spark.read.parquet(store)
      val cumW = Window.orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // metadata-scale window (one row per day) — single partition is
      // deliberate, same argument as qcHllRolling
      val approx = daily.withColumn("approx_median",
          call_function("kll_sketch_get_quantile_double",
            call_function("kll_merge_agg_double", col("sk")).over(cumW),
            lit(0.5)))
        .select("day", "approx_median")
        .orderBy("day").collect()
        .map(r => (r.getDate(0), r.getDouble(1)))
      val aggs = approx.zipWithIndex.flatMap { case ((d, m), i) => Seq(
        sum(when(col("day") <= lit(d) && col("value") <= m, 1L)
          .otherwise(0L)).as(s"le_$i"),
        sum(when(col("day") <= lit(d), 1L).otherwise(0L)).as(s"n_$i"))
      }.toIndexedSeq
      val r = ev.agg(aggs.head, aggs.tail: _*).head
      approx.zipWithIndex.map { case ((d, m), i) =>
        val le = r.getLong(2 * i)
        val n = r.getLong(2 * i + 1)
        val rank = if (n == 0) 0.5 else le.toDouble / n
        (d, n, math.rint(m * 10000) / 10000,
          math.rint(rank * 10000) / 10000, math.abs(rank - 0.5) <= 0.025)
      }.toSeq.toDF("day", "n_cum", "approx_median", "exact_rank", "pass")
        .orderBy("day")
    })

  /** Set algebra over MERGEABLE THETA sketches — the third persisted-
    * sketch family (HLL counts distinct, KLL holds quantiles, Theta does
    * UNION/INTERSECTION/DIFFERENCE): the audience-overlap / cohort-
    * retention shape ("users in A but not B") that at 100 TB must come
    * from sketch algebra, never a distinct-join of the raw sets. Two
    * deterministic partial-overlap sets (p_size bands of `part` — ~22%
    * overlap at any SF), one sketch each, PERSISTED to parquet and
    * re-read before the algebra (binary round-trip is load-bearing).
    * Each estimate gates on |approx/exact − 1| ≤ 5% (theta lgK=12 rsd
    * ≈1.6%; intersection/difference error grows with disjointness —
    * cushion to 5%); exact truth from plain distinct counts at audit
    * scale.
    */
  val qcThetaSets = QueryDef(
    "qc_theta_sets",
    None,
    (spark, dir) => {
      import spark.implicits._
      val part = Tables.part(spark, dir).select(col("p_partkey"), col("p_size"))
      val inA = col("p_size").between(1, 30)
      val inB = col("p_size").between(20, 50)
      val store = java.nio.file.Files
        .createTempDirectory("graft_qc_theta").toString + "/sketches"
      part.filter(inA)
        .agg(call_function("theta_sketch_agg", col("p_partkey")).as("sk"))
        .withColumn("tag", lit("A"))
        .unionByName(part.filter(inB)
          .agg(call_function("theta_sketch_agg", col("p_partkey")).as("sk"))
          .withColumn("tag", lit("B")))
        .write.mode("overwrite").parquet(store)
      val sks = spark.read.parquet(store).collect()
        .map(r => r.getString(r.fieldIndex("tag")) ->
          r.getAs[Array[Byte]]("sk")).toMap
      def est(c: org.apache.spark.sql.Column): Double =
        spark.range(1)
          .select(call_function("theta_sketch_estimate", c)
            .cast("double").as("e"))
          .head.getDouble(0)
      val approxU = est(call_function("theta_union",
        lit(sks("A")), lit(sks("B"))))
      val approxI = est(call_function("theta_intersection",
        lit(sks("A")), lit(sks("B"))))
      val approxD = est(call_function("theta_difference",
        lit(sks("A")), lit(sks("B"))))
      // exact truth: ONE conditional-agg pass, no distinct-join
      val ex = part.agg(
        count_distinct(when(inA || inB, col("p_partkey"))).as("u"),
        count_distinct(when(inA && inB, col("p_partkey"))).as("i"),
        count_distinct(when(inA && !inB, col("p_partkey"))).as("d")).head
      Seq(("union", ex.getLong(0), approxU),
        ("intersection", ex.getLong(1), approxI),
        ("difference", ex.getLong(2), approxD))
        .map { case (op, exact, approx) =>
          val rel = if (exact == 0) math.abs(approx)
            else math.abs(approx / exact - 1)
          (op, exact, math.rint(approx * 100) / 100,
            math.rint(rel * 10000) / 10000, rel <= 0.05)
        }.toDF("set_op", "exact", "approx", "rel_err", "pass")
        .orderBy("set_op")
    })

  /** The a23 RFM quintiles' 100 TB SCALE TWIN, gated: a23's global
    * ntile is a dimension sort (one row per customer) — past
    * broadcastable customer counts the published substitution is
    * approx-quantile CUTPOINTS broadcast back as a segment expression
    * (no global sort, no window). This gate runs BOTH segmentations of
    * the monetary dimension and bounds their disagreement at the
    * sketch's rank-error contract: approxQuantile(eps) misranks at
    * most eps·n rows per cutpoint, and ntile's ties-broken-by-key
    * order can flip at most one tie class per boundary — so
    * disagreements ≤ 4·(tieSlack + 2·eps·n). A drifting sketch, a
    * mis-sided boundary, or a wrong substitution turns the round red.
    */
  val qcRfmApprox = QueryDef(
    "qc_rfm_approx",
    None,
    (spark, dir) => {
      import spark.implicits._
      import org.apache.spark.sql.expressions.Window
      val eps = 1e-4
      val base = Tables.orders(spark, dir)
        .groupBy(col("o_custkey"))
        .agg(sum(col("o_totalprice").cast("decimal(18,2)"))
          .cast("double").as("monetary"))
        .localCheckpoint(true) // dimension-sized; consumed three times
      val n = base.count()
      // the scale path: 4 cutpoints from the sketch, broadcast back as
      // ONE segment expression — no global sort anywhere
      val cuts = base.stat.approxQuantile("monetary",
        Array(0.2, 0.4, 0.6, 0.8), eps)
      val approxSeg = cuts.foldLeft(lit(1))((acc, c) =>
        acc + when(col("monetary") > c, 1).otherwise(0))
      val exact = base.select(col("o_custkey"), col("monetary"),
        // the EXACT global quintile is this gate's reference arm — the
        // single-partition sort is the point (the approx arm above is
        // the scale path the gate certifies against it)
        ntile(5).over(Window.orderBy(col("monetary"), col("o_custkey")))
          .as("ex"))
        .withColumn("ap", approxSeg)
      val perQ = exact.groupBy(col("ex").as("quintile"))
        .agg(count(lit(1)).as("n_exact"),
          sum(when(col("ap") === col("ex"), 0L).otherwise(1L))
            .as("disagree"))
        .orderBy("quintile").collect()
      val disagreeTotal = perQ.map(_.getLong(2)).sum
      val bound = 4.0 * (2.0 + 2.0 * eps * n)
      perQ.toSeq.map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
          disagreeTotal, bound, disagreeTotal <= bound))
        .toDF("quintile", "n_exact", "disagree", "disagree_total",
          "bound", "pass")
    })

  val all: Seq[QueryDef] = Seq(qcQuantGates, qcRfmApprox, qcIvfRecallCurve, qcHllAccuracy,
    qcPqRecallCurve, qcHashUniformity, qcQuantileAccuracy, qcPpjoinCandidates,
    qcTrimInvariants, qcHllRolling, qcKllRolling, qcThetaSets)
}
