package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Quality, Reconcile}
import graft.ml.Ols

/** Invariant tests for the round-8 operators: snapshot reconciliation,
  * gaps-and-islands streaks, shingle containment, chi-square drift, and
  * closed-form OLS residuals. Value-level equality is the DuckDB oracle's
  * job; these pin the structural guarantees (conservation laws, exact
  * classification on hand-built fixtures, algebraic identities).
  */
class NewOpsR8Spec extends AnyFunSuite {
  import SparkTest._
  import spark.implicits._

  // ------------------------------------------------------ Reconcile.diff

  test("Reconcile.diff classifies added/removed/changed/unchanged exactly") {
    val a = Seq((1L, "x", 10.0), (2L, "y", 20.0), (3L, "z", 30.0),
      (4L, null.asInstanceOf[String], 40.0)).toDF("k", "s", "v")
    val b = Seq((2L, "y", 20.0), (3L, "z", 31.0), (5L, "w", 50.0),
      (4L, null.asInstanceOf[String], 40.0)).toDF("k", "s", "v")
    val st = Reconcile.diff(a, b, Seq("k"), Seq("s", "v"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(st == Map(1L -> "removed", 2L -> "unchanged", 3L -> "changed",
      4L -> "unchanged", 5L -> "added"))
  }

  test("Reconcile.diff is null-safe: value flip to/from NULL is changed") {
    val a = Seq((1L, Some(1.0)), (2L, None: Option[Double])).toDF("k", "v")
    val b = Seq((1L, None: Option[Double]), (2L, None: Option[Double])).toDF("k", "v")
    val st = Reconcile.diff(a, b, Seq("k"), Seq("v"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(st == Map(1L -> "changed", 2L -> "unchanged"))
  }

  test("j8_table_diff: statuses partition the key universe (conservation)") {
    val rows = queries.Relational.j8TableDiff.fn(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val o = Tables.orders(spark, sf)
    val nAll = o.count()
    val nOld = o.filter(col("o_orderkey") % 13 =!= 3).count()
    val nNew = o.filter(col("o_orderkey") % 13 =!= 7).count()
    // old side = removed + changed + unchanged; new side = added + ...
    assert(rows.getOrElse("removed", 0L) + rows.getOrElse("changed", 0L) +
      rows.getOrElse("unchanged", 0L) == nOld)
    assert(rows.getOrElse("added", 0L) + rows.getOrElse("changed", 0L) +
      rows.getOrElse("unchanged", 0L) == nNew)
    assert(rows.values.sum >= nAll - math.min(nOld, nNew))
  }

  // ------------------------------------------------------- w11 streaks

  test("w11_streaks: islands split on gaps, best streak wins ties by start") {
    val e = Seq(
      // user 1: 3-day run, gap, 2-day run -> best = 3 starting d1
      (1L, "2024-01-01"), (1L, "2024-01-02"), (1L, "2024-01-03"),
      (1L, "2024-01-05"), (1L, "2024-01-06"),
      // user 2: two 2-day runs -> tiebreak earliest start
      (2L, "2024-01-10"), (2L, "2024-01-11"),
      (2L, "2024-01-20"), (2L, "2024-01-21"),
      // user 3: duplicate events same day collapse
      (3L, "2024-02-01"), (3L, "2024-02-01"), (3L, "2024-02-02"))
      .toDF("user_id", "day_s")
      .select(col("user_id"), col("day_s").cast("date").as("day"))
    val byUser = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("day"))
    val best = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
      .orderBy(col("streak_len").desc, col("streak_start"))
    val out = e.distinct()
      .withColumn("island", date_sub(col("day"), row_number().over(byUser)))
      .groupBy(col("user_id"), col("island"))
      .agg(min(col("day")).as("streak_start"), count(lit(1)).as("streak_len"))
      .withColumn("rn", row_number().over(best)).filter(col("rn") === 1)
      .collect().map(r => (r.getLong(0),
        (r.getDate(2).toString, r.getLong(3)))).toMap
    assert(out(1L) == ("2024-01-01", 3L))
    assert(out(2L) == ("2024-01-10", 2L))
    assert(out(3L) == ("2024-02-01", 2L))
  }

  test("w11_streaks query: one row per user, streak fits the day span") {
    val rows = queries.Windows.w11Streaks.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getLong(0)).distinct.length == rows.length)
    rows.foreach { r =>
      assert(r.getLong(2) >= 1L, s"user ${r.getLong(0)} streak < 1")
    }
  }

  // --------------------------------------------------- dd_containment

  test("dd_containment: a verbatim subset document has containment 1.0") {
    val docs = Seq(
      (10L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (3L, "unrelated words entirely different content here"))
      .toDF("doc_id", "text")
    val sh = docs.select(col("doc_id"),
      graft.functions.TextFns.shingleHashes(col("text"), 3).as("s"))
    val sizes = sh.select(col("doc_id"), size(col("s")).as("n"))
    val probe = sh.filter(col("doc_id") === 10L)
      .select(col("doc_id").as("id_a"), explode(col("s")).as("h"))
    val cand = sh.select(col("doc_id").as("id_b"), explode(col("s")).as("h"))
    val out = probe.join(cand, Seq("h")).filter(col("id_a") =!= col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("inter"))
      .join(sizes.withColumnRenamed("doc_id", "id_a").withColumnRenamed("n", "na"), "id_a")
      .select(col("id_b"), (col("inter").cast("double") / col("na")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(2L) == 1.0, s"subset containment ${out.get(2L)}")
    assert(!out.contains(3L), "disjoint doc must produce no pair")
  }

  test("dd_containment query: scores in (0,1], directed pairs, probes only") {
    val rows = queries.DedupQ.ddContainment.fn(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getLong(0) % 20 == 10, "id_a must be a probe")
      val c = r.getDouble(2)
      assert(c >= 0.5 && c <= 1.0, s"containment $c outside [0.5, 1]")
    }
  }

  // -------------------------------------------------------- qc_drift

  test("chiSquareDrift: identical cohorts give zero contribution") {
    // same category distribution in both cohorts -> chi2 exactly 0
    // (cohort key i%8<4 is independent of cat key i%4: each cat lands
    // 50/50 — an i%2 split would correlate with the category instead)
    val df = (0 until 400).map(i => (i.toLong, s"cat${i % 4}"))
      .toDF("id", "cat")
    val out = Quality.chiSquareDrift(df, "cat", col("id") % 8 < 4)
      .collect()
    assert(out.length == 4)
    out.foreach { r =>
      assert(math.abs(r.getDouble(3)) < 1e-12,
        s"${r.getString(0)}: contrib ${r.getDouble(3)} != 0")
      assert(r.getLong(1) == 50L && r.getLong(2) == 50L)
    }
  }

  test("chiSquareDrift: a planted shift concentrates the statistic") {
    // catX appears only in cohort A -> its contribution dominates
    val base = (0 until 300).map(i => (i.toLong * 2, s"cat${i % 3}"))
    val shifted = (0 until 60).map(i => (i.toLong * 2 + 1, "catX"))
    val df = (base ++ shifted).toDF("id", "cat")
    val out = Quality.chiSquareDrift(df, "cat", col("id") % 2 === 0)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(out("catX") > out.filterNot(_._1 == "catX").values.max,
      s"catX contribution not dominant: $out")
  }

  test("qc_drift query: counts census the corpus, contribs non-negative") {
    val rows = queries.QualityQ.qcDrift.fn(spark, sf).collect()
    val total = rows.map(r => r.getLong(1) + r.getLong(2)).sum
    assert(total == Tables.documents(spark, sf).count())
    rows.foreach(r => assert(r.getDouble(3) >= 0.0))
  }

  // ---------------------------------------------- dbt generic tests

  test("orphanedKeys finds planted orphans; accepted_values counts strays") {
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val child = Seq((10L, Some(1L)), (11L, Some(9L)), (12L, None: Option[Long]))
      .toDF("id", "fk")
    val orphans = Quality.orphanedKeys(child, "fk", parent, "pk")
      .select(col("id")).collect().map(_.getLong(0))
    assert(orphans.toSeq == Seq(11L), "only fk=9 is an orphan; NULL is not")
    val strays = Seq("O", "F", "X", null).toDF("st")
      .agg(Quality.acceptedValuesViolations("st", Seq("O", "F", "P")))
      .collect()(0).getLong(0)
    assert(strays == 1L, "X is the single stray; NULL doesn't count")
  }

  test("q6_referential_suite: the fixture warehouse is referentially clean") {
    val r = queries.QualityQ.q6ReferentialSuite.fn(spark, sf).collect()(0)
    (0 until 4).foreach(i => assert(r.getLong(i) == 0L,
      s"violation count ${r.schema(i).name} = ${r.getLong(i)}"))
  }

  // ------------------------------------------------------------- OLS

  test("Ols.fit recovers an exact line with zero residuals") {
    val pts = (0 until 50).map(i => (i.toDouble, 3.0 + 2.0 * i))
      .toDF("x", "y")
    val c = Ols.fit(pts, "x", "y").collect()(0)
    assert(math.abs(c.getDouble(0) - 3.0) < 1e-9, s"a=${c.getDouble(0)}")
    assert(math.abs(c.getDouble(1) - 2.0) < 1e-9, s"b=${c.getDouble(1)}")
  }

  test("Ols.fitExactInt agrees with Ols.fit on integer data") {
    val pts = (0 until 100).map(i => (i, BigDecimal(100 + 7 * i + (i % 5))))
      .toDF("x", "y")
    val c1 = Ols.fit(pts, "x", "y").collect()(0)
    val c2 = Ols.fitExactInt(pts, "x", "y").collect()(0)
    assert(math.abs(c1.getDouble(0) - c2.getDouble(0)) < 1e-6)
    assert(math.abs(c1.getDouble(1) - c2.getDouble(1)) < 1e-6)
  }

  test("Ols.residuals flags a planted outlier with the largest |z|") {
    val pts = ((0 until 60).map(i => (i.toDouble, 10.0 + 0.5 * i +
      (if (i % 2 == 0) 0.3 else -0.3))) :+ (30.5, 500.0)).toDF("x", "y")
    val top = Ols.residuals(pts, "x", "y")
      .orderBy(abs(col("resid_z")).desc).limit(1).collect()(0)
    assert(top.getDouble(1) == 500.0, s"outlier not top-z: $top")
  }

  // ------------------------------------------------------ CDC chunking

  test("CDC chunking is shift-invariant: a prefix insertion only reshapes " +
      "chunks up to the next boundary") {
    val base = Tables.documents(spark, sf).orderBy(col("n_chars").desc)
      .select(col("text")).limit(1).collect()(0).getString(0)
    val docs = Seq((1L, base), (2L, "zzz qqq vvv " + base))
      .toDF("doc_id", "text")
    val fps = graft.operators.CdcChunking.chunkFingerprints(docs)
      .collect().groupBy(_.getLong(0))
      .map { case (id, rs) => id -> rs.map(_.getString(2)).toSet }
    val shared = fps(1L).intersect(fps(2L)).size
    // all of doc 1's chunks except (at most) its first must re-chunk
    // identically inside the shifted doc — the fixed-size splitter
    // (tx_chunks) shares zero chunks under the same 3-token shift
    assert(shared >= fps(1L).size - 1,
      s"only $shared of ${fps(1L).size} chunks survived the shift")
    assert(fps(1L).size >= 3, "fixture doc too short to exercise chunking")
  }

  test("CDC chunks partition each doc: token counts sum to the doc length") {
    val docs = Tables.documents(spark, sf).limit(50)
    val byDoc = graft.operators.CdcChunking.chunkFingerprints(docs)
      .groupBy(col("doc_id")).agg(sum(col("n_tok")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = docs.select(col("doc_id"),
        size(graft.functions.TextFns.tokens(col("text"))).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    assert(byDoc == expected.filter(_._2 > 0))
  }

  test("dd_cdc_chunks query: every reported fingerprint spans >= 2 docs") {
    val rows = queries.DedupQ.ddCdcChunks.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) >= 2L)
      assert(r.getLong(2) >= r.getLong(1), "occurrences < docs")
      assert(r.getLong(3) >= 1L)
    }
  }

  // ------------------------------------------------- contrastive pairs

  test("contrastivePairs: disjoint same-source pairs, each doc used once") {
    val out = queries.SamplingQ.smpBalancedPairs.fn(spark, sf).collect()
    assert(out.nonEmpty)
    val used = out.flatMap(r => Seq(r.getLong(1), r.getLong(2)))
    assert(used.distinct.length == used.length, "a doc appears in 2 pairs")
    out.foreach(r => assert(r.getLong(1) != r.getLong(2)))
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("source")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    out.foreach(r => assert(docs(r.getLong(1)) == docs(r.getLong(2)),
      "pair crosses sources"))
  }

  // ---------------------------------------------- contamination rate

  test("contaminationRate: bounded scores, hits never exceed the census") {
    val rows = queries.PipelineQ.pipeContaminationRate.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (tot, m, rate) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(m >= 0 && m <= tot, s"doc ${r.getLong(0)}: matched $m > total $tot")
      assert(rate >= 0.0 && rate <= 1.0)
    }
    // eval docs (the hash split) must not be scored
    val evalIds = Tables.documents(spark, sf)
      .filter(graft.operators.Decontaminate.isEval(col("doc_id"), 0.1))
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    rows.foreach(r => assert(!evalIds.contains(r.getLong(0)),
      s"eval doc ${r.getLong(0)} was scored"))
  }

  // ------------------------------------------------- vocab growth

  test("tx_vocab_growth: monotone curve ending at the trigram vocabulary") {
    val rows = queries.Text.txVocabGrowth.fn(spark, sf)
      .orderBy(col("t")).collect()
    assert(rows.length >= 2)
    val vs = rows.map(_.getLong(1))
    assert(vs.zip(vs.tail).forall { case (a, b) => a <= b }, "not monotone")
    val total = Tables.documents(spark, sf)
      .select(explode(graft.functions.TextFns.shingleHashes(col("text"), 3)))
      .distinct().count()
    assert(vs.last == total, s"curve ends at ${vs.last}, vocab is $total")
  }

  test("ml_baseline_compare: three models scored on the same holdout") {
    val rows = queries.MlQ.mlBaselineCompare.fn(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSet ==
      Set("naive", "seasonal_naive", "ols_trend"))
    rows.foreach { r =>
      assert(r.getDouble(1) > 0.0 && !r.getDouble(1).isNaN, s"bad mae: $r")
      assert(r.getDouble(2) > 0.0 && !r.getDouble(2).isNaN, s"bad mape: $r")
    }
  }

  test("tx_kl_source_signature: Gibbs bound and token conservation") {
    val rows = queries.Text.txKlSourceSignature.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    // KL >= 0 up to float summation noise under the r4 rounding
    rows.foreach(r => assert(r.getDouble(2) >= -1e-4,
      s"${r.getString(0)}: negative KL ${r.getDouble(2)}"))
    val total = rows.map(_.getLong(1)).sum
    val expected = Tables.documents(spark, sf)
      .select(size(graft.functions.TextFns.tokens(col("text"))).as("n"))
      .agg(sum(col("n"))).collect()(0).getLong(0)
    assert(total == expected, s"per-source tokens $total != corpus $expected")
  }

  test("KL signature is zero when a source matches the corpus distribution") {
    val docs = Seq(
      (1L, "a b c d", "s1"), (2L, "a b c d", "s2"), (3L, "a b c d", "s3"))
      .toDF("doc_id", "text", "source")
    val st = docs.select(col("source"),
        explode(graft.functions.TextFns.tokens(col("text"))).as("t"))
      .groupBy("source", "t").agg(count(lit(1)).as("c"))
    val s = st.groupBy("source").agg(sum(col("c")).as("ns"))
    val g = st.groupBy("t").agg(sum(col("c")).as("cg"))
    val tot = g.agg(sum(col("cg")).as("ng"))
    val ps = col("c") * lit(1.0) / col("ns")
    val pg = col("cg") * lit(1.0) / col("ng")
    val kls = st.join(s, "source").join(g, "t").crossJoin(broadcast(tot))
      .groupBy(col("source")).agg(sum(ps * log(ps / pg)).as("kl"))
      .collect().map(_.getDouble(1))
    kls.foreach(k => assert(math.abs(k) < 1e-12, s"KL $k != 0"))
  }

  test("ml_ols_residuals: z-scores have ~zero mean and unit spread") {
    val rows = queries.MlQ.mlOlsResiduals.fn(spark, sf).collect()
    assert(rows.length > 100)
    val zs = rows.map(_.getDouble(3))
    assert(math.abs(zs.sum / zs.length) < 0.05, "mean z not ~0")
    val sd = math.sqrt(zs.map(z => z * z).sum / zs.length)
    assert(sd > 0.9 && sd < 1.1, s"z spread $sd not ~1")
  }
}
