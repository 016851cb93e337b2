package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariant tests for the round-7 operators: tf-idf keyword extraction,
  * winsorized means, RANGE-frame windows, temperature-scaled mixture
  * weights, and dedup cluster-representative selection. Value-level
  * equality is the DuckDB oracle's job; these pin the structural
  * guarantees the oracle hash can't articulate (budgets, orderings,
  * conservation laws).
  */
class NewOpsR7Spec extends AnyFunSuite {
  import SparkTest._

  test("tx_tfidf_terms: at most 3 terms per doc, scores non-increasing") {
    val rows = queries.Text.txTfidfTerms.fn(spark, sf)
      .orderBy(col("doc_id"), col("tfidf").desc, col("term"))
      .collect()
    val byDoc = rows.groupBy(_.getAs[Long]("doc_id"))
    assert(byDoc.nonEmpty)
    byDoc.foreach { case (id, rs) =>
      assert(rs.length <= 3, s"doc $id has ${rs.length} terms")
      val scores = rs.map(_.getAs[Double]("tfidf"))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
        s"doc $id scores not sorted: ${scores.mkString(",")}")
      assert(rs.forall(_.getAs[Long]("tf") >= 1L))
    }
  }

  test("a21_winsorized: clamped mean stays inside the clamp bounds") {
    val rows = queries.Relational.a21Winsorized.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (p05, p95) = (r.getAs[Double]("p05"), r.getAs[Double]("p95"))
      val wm = r.getAs[Double]("win_mean")
      assert(p05 <= p95)
      // 1e-4 slack: bounds and mean are independently rounded to 4 decimals
      assert(wm >= p05 - 1e-4 && wm <= p95 + 1e-4,
        s"${r.getAs[String]("event_type")}: $wm outside [$p05, $p95]")
    }
  }

  test("w7_range_frame: window population bounded by the range width") {
    val rows = queries.Windows.w7RangeFrame.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("nwin")
      assert(n >= 1L && n <= 4L, s"${r.get(0)}: nwin $n outside [1,4]")
    }
  }

  test("smp_temperature: shares normalize and alpha<1 boosts the tail") {
    val rows = queries.SamplingQ.smpTemperature.fn(spark, sf).collect()
    assert(rows.length > 1)
    val pt = rows.map(_.getAs[Double]("p_temp")).sum
    assert(math.abs(pt - 1.0) < 1e-3, s"p_temp sums to $pt")
    val bySize = rows.sortBy(_.getAs[Long]("n_docs"))
    // flattening: the smallest source is boosted at least as much as the largest
    assert(bySize.head.getAs[Double]("boost") >=
      bySize.last.getAs[Double]("boost") - 1e-9)
  }

  test("tx_ngram_diversity: ratio in (0,1], gram totals consistent") {
    val rows = queries.Text.txNgramDiversity.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, d) = (r.getAs[Long]("n_grams"), r.getAs[Long]("n_distinct"))
      assert(d >= 1L && d <= n)
      val ratio = r.getAs[Double]("diversity")
      assert(ratio > 0.0 && ratio <= 1.0)
    }
  }

  test("dd_cross_source_matrix: pair totals match the near-dup pair set") {
    val docs = Tables.documents(spark, sf)
    val nPairs = graft.operators.Dedup.minhashNearDups(docs, threshold = 0.7).count()
    val rows = queries.DedupQ.ddCrossSourceMatrix.fn(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("n_pairs")).sum == nPairs)
    // canonical orientation: source_a <= source_b on every row
    rows.foreach(r => assert(
      r.getAs[String]("source_a") <= r.getAs[String]("source_b")))
  }

  test("sim_quantize_int8: int8 keeps cosine >= 0.999 and bounded abs error") {
    val rows = queries.DedupQ.simQuantizeInt8.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("cos_keep") >= 0.999)
      // round-trip error of max-abs int8: at most scale/254 per element
      assert(r.getAs[Double]("max_abs_err") <=
        r.getAs[Double]("scale") / 254.0 + 1e-4)
    }
  }

  test("tx_length_bands: bands partition the corpus; edges respected") {
    val docs = Tables.documents(spark, sf)
    val rows = queries.Text.txLengthBands.fn(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == docs.count())
    val edges = Map("00_lt32" -> (0L, 31L), "01_32_63" -> (32L, 63L),
      "02_64_127" -> (64L, 127L), "03_128_255" -> (128L, 255L),
      "04_ge256" -> (256L, Long.MaxValue))
    rows.foreach { r =>
      val (lo, hi) = edges(r.getAs[String]("band"))
      assert(r.getAs[Long]("min_tokens") >= lo && r.getAs[Long]("max_tokens") <= hi)
    }
  }

  test("smp_token_budget: shares sum to 1, cum_share monotone ending at 1") {
    val rows = queries.SamplingQ.smpTokenBudget.fn(spark, sf)
      .orderBy(col("rank")).collect()
    assert(rows.length > 1)
    assert(math.abs(rows.map(_.getAs[Double]("share")).sum - 1.0) < 1e-3)
    val cums = rows.map(_.getAs[Double]("cum_share"))
    assert(cums.zip(cums.tail).forall { case (a, b) => b >= a - 1e-9 })
    assert(math.abs(cums.last - 1.0) < 1e-6)
    // ranked by token mass: toks non-increasing in rank order
    val toks = rows.map(_.getAs[Long]("toks"))
    assert(toks.zip(toks.tail).forall { case (a, b) => a >= b })
  }

  test("sim_norm_outliers: unit-norm fixtures yield no outliers; z centered") {
    val rows = queries.DedupQ.simNormOutliers.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    // the fixture embeddings are ~unit-norm, so the MAD cutoff flags none
    assert(rows.count(_.getAs[Boolean]("is_outlier")) == 0)
    val zs = rows.map(_.getAs[Double]("robust_z")).sorted
    assert(math.abs(zs(zs.length / 2)) < 0.5, "median robust_z should be ~0")
  }

  test("smp_weighted_k: exact-k, deterministic across runs, weight-sensitive") {
    val a = queries.SamplingQ.smpWeightedK.fn(spark, sf).collect()
    val b = queries.SamplingQ.smpWeightedK.fn(spark, sf).collect()
    assert(a.length == 25)
    assert(a.map(_.getAs[Long]("doc_id")).toSeq ==
      b.map(_.getAs[Long]("doc_id")).toSeq, "sample must be reproducible")
    // length-weighted: the sampled docs skew longer than the corpus median
    val med = Tables.documents(spark, sf)
      .selectExpr("percentile(n_chars, 0.5)").head.getDouble(0)
    val sampled = Tables.documents(spark, sf)
      .join(queries.SamplingQ.smpWeightedK.fn(spark, sf).select("doc_id"), "doc_id")
      .selectExpr("avg(n_chars)").head.getDouble(0)
    assert(sampled > med * 0.9,
      s"weighted sample mean $sampled should not sit far below corpus median $med")
  }

  test("t7_stream_heavy_hitters: streaming sketch equals the batch result") {
    val streaming = queries.Windows.t7StreamHeavyHitters.fn(spark, sf)
    val batch = queries.Text.txHeavyHittersBySource.fn(spark, sf)
    assert(streaming.count() > 0)
    assert(streaming.exceptAll(batch).isEmpty && batch.exceptAll(streaming).isEmpty,
      "micro-batch-merged Misra-Gries must match the batch aggregation")
  }

  test("w8_share_of_day: shares sum to 1 within every day") {
    val rows = queries.Windows.w8ShareOfDay.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[java.sql.Date]("day")).foreach { case (d, rs) =>
      val s = rs.map(_.getAs[Double]("day_share")).sum
      assert(math.abs(s - 1.0) < 1e-2, s"day $d shares sum to $s")
    }
  }

  test("w9_transition_matrix: transitions = events - distinct users") {
    val e = Tables.events(spark, sf)
    val expected = e.count() - e.select("user_id").distinct().count()
    val total = queries.Windows.w9TransitionMatrix.fn(spark, sf)
      .collect().map(_.getAs[Long]("n")).sum
    assert(total == expected,
      "each user contributes exactly (its events - 1) transitions")
  }

  test("a22_cohort_retention: offset 0 covers every user exactly once") {
    val users = Tables.events(spark, sf).select("user_id").distinct().count()
    val rows = queries.Relational.a22CohortRetention.fn(spark, sf).collect()
    // every user is active on their own first day
    val day0 = rows.filter(_.getAs[Long]("offset_days") == 0L)
      .map(_.getAs[Long]("n_users")).sum
    assert(day0 == users)
    rows.foreach(r => assert(r.getAs[Long]("offset_days") >= 0L))
  }

  test("sim_knn_pq: deterministic, k rows per probe, cosine-ranked") {
    val a = queries.DedupQ.simKnnPq.fn(spark, sf).collect()
    val b = queries.DedupQ.simKnnPq.fn(spark, sf).collect()
    assert(a.length == b.length && a.length > 0)
    assert(a.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      b.map(r => (r.getLong(0), r.getLong(1))).toSeq,
      "seed-fixed codebooks + deterministic tiebreaks must reproduce exactly")
    a.groupBy(_.getAs[Long]("probe_id")).foreach { case (p, rs) =>
      assert(rs.length <= 5, s"probe $p returned ${rs.length} rows")
      val cs = rs.sortBy(_.getAs[Int]("rk")).map(_.getAs[Double]("cosine"))
      assert(cs.zip(cs.tail).forall { case (x, y) => x >= y },
        s"probe $p cosines not ranked")
    }
  }

  test("lloyd: deterministic, handles k > n, centers stay in the hull") {
    val pts = Array(Array(0.0, 0.0), Array(1.0, 0.0), Array(0.0, 1.0),
      Array(10.0, 10.0), Array(11.0, 10.0))
    val c1 = graft.operators.Similarity.lloyd(pts, 16)
    val c2 = graft.operators.Similarity.lloyd(pts, 16)
    assert(c1.length == 5, "kEff must clamp to n when k > n")
    assert(c1.map(_.toSeq).toSeq == c2.map(_.toSeq).toSeq, "must be deterministic")
    // every center is a mean of sample points, so it stays inside the hull box
    c1.foreach { c =>
      assert(c(0) >= 0.0 && c(0) <= 11.0 && c(1) >= 0.0 && c(1) <= 10.0)
    }
  }

  test("lloyd: separates two well-split blobs into distinct centers") {
    val pts = Array(Array(0.0), Array(0.1), Array(0.2),
      Array(100.0), Array(100.1), Array(100.2))
    val cs = graft.operators.Similarity.lloyd(pts, 2).map(_.head).sorted
    assert(math.abs(cs.head - 0.1) < 0.2 && math.abs(cs.last - 100.1) < 0.2,
      s"centers ${cs.mkString(",")} should sit at the two blob means")
  }

  test("w10_anomaly_flags: verdict consistent with its own excess column") {
    val rows = queries.Windows.w10AnomalyFlags.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("is_anomaly") == (r.getAs[Double]("excess") > 0))
    }
    // the first 6 days have no full trailing week and must be absent
    val days = queries.Windows.w10AnomalyFlags.fn(spark, sf).count()
    val allDays = Tables.events(spark, sf)
      .select(col("ts").cast("date")).distinct().count()
    assert(days <= allDays - 2, "warm-up days must be filtered out")
  }

  test("tx_hybrid_rrf: fused score consistent with member ranks; both signals present") {
    val rows = queries.Text.txHybridRrf.fn(spark, sf).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      val lex = Option(r.getAs[java.lang.Long]("lex_rank")).map(_.toLong)
      val den = Option(r.getAs[java.lang.Long]("dense_rank")).map(_.toLong)
      assert(lex.isDefined || den.isDefined)
      val expect = lex.map(k => 1.0 / (60 + k)).getOrElse(0.0) +
        den.map(k => 1.0 / (60 + k)).getOrElse(0.0)
      assert(math.abs(r.getAs[Double]("rrf") - expect) < 1e-6)
    }
    // a doc in BOTH rankings must outrank a doc holding the same position
    // in only one — guaranteed by the additive form; spot-check rank 1
    val top = rows.minBy(_.getAs[Long]("rank"))
    assert(top.getAs[Double]("rrf") >= rows.map(_.getAs[Double]("rrf")).max - 1e-12)
  }

  test("smp_stratified: exact budget, Hamilton allocation on skewed strata") {
    import spark.implicits._
    // uniform fixture: 100 seats over 20 sources → exactly 5 each
    val fix = queries.SamplingQ.smpStratified.fn(spark, sf).collect()
    assert(fix.length == 100)
    assert(fix.groupBy(_.getString(0)).values.forall(_.length == 5))
    // skewed strata: 7 seats over counts 5/3/2 → quotas 3.5/2.1/1.4 →
    // bases 3/2/1, leftover 1 goes to the largest remainder (a: .5)
    val skew = (1 to 5).map(i => ("a", i.toLong)) ++
      (6 to 8).map(i => ("b", i.toLong)) ++ (9 to 10).map(i => ("c", i.toLong))
    val got = graft.operators.Sampling.stratifiedExactK(
        skew.toDF("source", "doc_id"), "source", "doc_id", budget = 7L)
      .collect().groupBy(_.getString(0)).view.mapValues(_.length).toMap
    assert(got == Map("a" -> 4, "b" -> 2, "c" -> 1), s"got $got")
  }

  test("dd_cluster_rep: members conserve the corpus; reps belong to their cluster") {
    val docs = Tables.documents(spark, sf)
    val rows = queries.DedupQ.ddClusterRep.fn(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("n_members")).sum == docs.count())
    rows.foreach { r =>
      // component label is the min member id, so it lower-bounds the rep
      assert(r.getAs[Long]("component_id") <= r.getAs[Long]("rep_id"))
      if (r.getAs[Long]("n_members") == 1L)
        assert(r.getAs[Long]("rep_id") == r.getAs[Long]("component_id"),
          "a singleton's representative must be itself")
    }
  }
}
