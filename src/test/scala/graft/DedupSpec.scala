package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dedup, Similarity}
import graft.functions.TextFns

class DedupSpec extends AnyFunSuite {
  import SparkTest._

  test("exact dedup groups identical texts and keeps min id as canonical") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c"), (2L, "a b c"), (3L, "x y z"), (4L, "a b c"), (5L, "x y z")
    ).toDF("doc_id", "text")
    val got = Dedup.exact(docs).collect()
      .map(r => (r.getAs[Long]("canonical_id"), r.getAs[Long]("n_copies"))).toSet
    assert(got == Set((1L, 3L), (3L, 2L)))
  }

  test("minhash LSH finds the planted near-duplicates (recall vs exact jaccard ≥ 0.9 @ j≥0.7)") {
    val docs = Tables.documents(spark, sf)
    // ground truth: exact shingle-jaccard pairs at ≥ 0.7 (brute force, test-only)
    val sh = docs.select(col("doc_id"), TextFns.tokens(col("text")).as("w"))
      .select(col("doc_id"), TextFns.shingles(col("w"), 3).as("s"))
    val a = sh.select(col("doc_id").as("id_a"), col("s").as("sa"))
    val b = sh.select(col("doc_id").as("id_b"), col("s").as("sb"))
    val truth = a.join(b, col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), Dedup.jaccard(col("sa"), col("sb")).as("j"))
      .filter(col("j") >= 0.7)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty, "fixture should contain planted near-dups")

    val found = Dedup.minhashNearDups(docs, threshold = 0.7)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // verification arm guarantees precision; banding (8 bands × 2 rows)
    // gives P(candidate | j=0.7) ≈ 1-(1-0.49)^8 ≈ 0.995 per pair
    assert(found.subsetOf(truth), "minhash results must be verified-exact")
    val recall = found.size.toDouble / truth.size
    assert(recall >= 0.9, s"recall $recall too low (found ${found.size}/${truth.size})")
  }

  test("simhash: identical docs collide at hamming 0; signature is deterministic") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark join filter window row batch"),
      (2L, "spark join filter window row batch"),
      (3L, "completely different vocabulary entirely unrelated tokens here")
    ).toDF("doc_id", "text")
    val sigs = Dedup.simhashSignatures(docs).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("sig")).toMap
    assert(sigs(1L) == sigs(2L))
    assert(java.lang.Long.bitCount(sigs(1L) ^ sigs(3L)) > 3,
      "unrelated docs should not be within the near-dup hamming ball")
    val pairs = Dedup.simhashCandidates(docs).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(pairs.contains((1L, 2L)))
  }

  test("native shingle_hash64 matches xxhash64 of the composed string shingles") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf).filter(col("doc_id") < 100)
    val composed = docs
      .select(col("doc_id"), graft.functions.TextFns.tokens(col("text")).as("w"))
      .select(col("doc_id"),
        array_sort(transform(
          graft.functions.TextFns.shingles(col("w"), 3),
          s => xxhash64(s))).as("hs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val native = docs.select(col("doc_id"),
        array_sort(graft.functions.TextFns.shingleHashes(col("text"), 3)).as("hs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(native == composed)
    // short-doc edge: fewer than n tokens → empty set, no crash
    import spark.implicits._
    val short = Seq((1L, "one two")).toDF("doc_id", "text")
      .select(graft.functions.TextFns.shingleHashes(col("text"), 3))
      .head.getSeq[Long](0)
    assert(short.isEmpty)
  }

  test("ppjoin prefix filtering is EXACT: output equals all-pairs brute force") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf)
    val t = 0.5
    // brute-force ground truth via full array intersection over all pairs
    val sh = docs
      .select(col("doc_id"), graft.functions.TextFns.tokens(col("text")).as("w"))
      .select(col("doc_id"), graft.functions.TextFns.shingles(col("w"), 3).as("s"))
    val truth = sh.as("a").join(sh.as("b"), col("a.doc_id") < col("b.doc_id"))
      .withColumn("inter", size(array_intersect(col("a.s"), col("b.s"))).cast("double"))
      .withColumn("j", col("inter") /
        (size(col("a.s")) + size(col("b.s")) - col("inter")))
      .filter(col("j") >= t)
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = Dedup.ppjoinNearDups(docs, t)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty, "fixture should contain j>=0.5 pairs")
    assert(got == truth, s"ppjoin missed ${(truth -- got).size} / extra ${(got -- truth).size}")
  }

  test("native simhash64 expression matches the explode+aggregate formulation") {
    import org.apache.spark.sql.functions._
    // the composed form the expression replaced: explode distinct tokens,
    // 64 conditional-sum vote columns, sign-threshold bit reassembly
    val docs = Tables.documents(spark, sf).filter(col("doc_id") < 200)
    val tok = docs.select(col("doc_id").as("id"),
        explode(array_distinct(graft.functions.TextFns.tokens(col("text")))).as("t"))
      .withColumn("h", xxhash64(col("t")))
    val votes = (0 until 64).map(i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(1) === 1, 1L).otherwise(-1L)).as(s"b$i"))
    val agg = tok.groupBy("id").agg(votes.head, votes.tail: _*)
    val sigExpr = (0 until 64).map(i =>
      when(col(s"b$i") > 0, lit(1L << i)).otherwise(lit(0L)))
      .reduce((x, y) => x.bitwiseOR(y))
    val composed = agg.select(col("id"), sigExpr.as("sig")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val native = Dedup.simhashSignatures(docs).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("sig")).toMap
    assert(composed.keySet.subsetOf(native.keySet))
    composed.foreach { case (id, sig) =>
      assert(native(id) == sig, s"signature mismatch for doc $id")
    }
  }

  test("dupNgramSpans flags exactly the planted cross-doc duplicated windows") {
    import spark.implicits._
    val docs = Seq(
      // docs 1 and 2 share exactly one verbatim 8-token window (a..h)
      (1L, "a b c d e f g h i j"),
      (2L, "x y a b c d e f g h"),
      // unique single-window doc
      (3L, "p q r s t u v w"),
      // WITHIN-doc repetition only — cross-doc contract must not flag it
      (4L, "m n o p q r s t m n o p q r s t"),
      // shorter than the window: absent from the census
      (5L, "too short")
    ).toDF("doc_id", "text")
    val got = Dedup.dupNgramSpans(docs, n = 8).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_windows"), r.getAs[Long]("n_dup_windows"))).toMap
    assert(got == Map(
      1L -> (3L, 1L),
      2L -> (3L, 1L),
      3L -> (1L, 0L),
      4L -> (9L, 0L)))
  }

  test("trimDupSpans keeps owners whole and cuts exactly the duplicated span") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f g h i j"),              // owner of the shared span
      (2L, "x y a b c d e f g h"),              // loses tokens 2..9, keeps "x y"
      (3L, "p q r s t u v w"),                  // unique: untouched
      (4L, "m n o p q r s t m n o p q r s t"),  // within-doc repeat: untouched
      (5L, "too short")                         // < n tokens: untouched
    ).toDF("doc_id", "text")
    val got = Dedup.trimDupSpans(docs, n = 8).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_kept"),
          r.getAs[String]("trimmed_md5"))).toMap
    def h(s: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    assert(got(1L) == (10L, 10L, h("a b c d e f g h i j")))
    assert(got(2L) == (10L, 2L, h("x y")))
    assert(got(3L) == (8L, 8L, h("p q r s t u v w")))
    assert(got(4L) == (16L, 16L, h("m n o p q r s t m n o p q r s t")))
    assert(got(5L) == (2L, 2L, h("too short")))
  }

  test("trimSelfRepeats cuts within-doc echoes, keeps first occurrences") {
    import spark.implicits._
    val docs = Seq(
      // exact self-echo: window at pos 8 repeats pos 0 → tokens 8..15 cut
      (1L, "m n o p q r s t m n o p q r s t"),
      // no repeats: untouched
      (2L, "a b c d e f g h i j"),
      // cross-doc dup but NOT self-repeat: untouched by this operator
      (3L, "a b c d e f g h i j")
    ).toDF("doc_id", "text")
    val got = Dedup.trimSelfRepeats(docs, n = 8).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_kept"),
          r.getAs[String]("trimmed_md5"))).toMap
    def h(s: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    assert(got(1L) == (16L, 8L, h("m n o p q r s t")))
    assert(got(2L) == (10L, 10L, h("a b c d e f g h i j")))
    assert(got(3L) == (10L, 10L, h("a b c d e f g h i j")))
  }

  test("portable simhash64 matches an independent md5 reference implementation") {
    // the portable mode's whole value is cross-engine reproducibility:
    // pin the expression to a from-scratch JVM reference (MessageDigest
    // + explicit big-endian fold), the same math the DuckDB oracle
    // rebuilds with a strpos polynomial
    // doc_id filter, not limit(): limit is nondeterministic across the
    // several independent actions below
    val docs = Tables.documents(spark, sf).filter(col("doc_id") < 100)
    def refSig(text: String): Long = {
      val votes = new Array[Int](64)
      text.split(" ", -1).distinct.foreach { t =>
        val dig = java.security.MessageDigest.getInstance("MD5")
          .digest(t.getBytes("UTF-8"))
        var h = 0L
        (0 until 8).foreach(i => h = (h << 8) | (dig(i) & 0xFFL))
        (0 until 64).foreach(b =>
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1)
      }
      (0 until 64).foldLeft(0L)((s, b) => if (votes(b) > 0) s | (1L << b) else s)
    }
    val native = Dedup.simhashSignatures(docs, portable = true).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("sig")).toMap
    val rows = docs.select("doc_id", "text").collect()
    assert(rows.nonEmpty && native.size == rows.length)
    rows.foreach { r =>
      assert(native(r.getLong(0)) == refSig(r.getString(1)),
        s"portable signature mismatch for doc ${r.getLong(0)}")
    }
    // and the two modes agree where agreement is mathematically forced:
    // identical distinct-token sets → identical signatures → hamming 0
    // in EVERY hash family
    val ham0x = Dedup.simhashCandidates(docs).filter(col("hamming") === 0)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ham0p = Dedup.simhashCandidates(docs, portable = true)
      .filter(col("hamming") === 0)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ham0x == ham0p,
      s"hamming-0 pair sets diverge between modes: ${ham0x.diff(ham0p)} / ${ham0p.diff(ham0x)}")
  }

  test("lshKnn results are a subset of brute-force rankings' candidates with identical cosines") {
    val e = Tables.embeddings(spark, sf)
    val probes = e.filter(col("vec_id") % 100 === 0)
    val brute = Similarity.bruteForceKnn(probes, e, k = 5)
      .select("probe_id", "cand_id", "cosine").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val lsh = Similarity.lshKnn(probes, e, k = 5, p = 8)
      .select("probe_id", "cand_id", "cosine").collect()
    assert(lsh.nonEmpty)
    // every (probe, cand) the LSH path scores must agree with the exact cosine
    val allSims = Similarity.bruteForceKnn(probes, e, k = Int.MaxValue)
      .select("probe_id", "cand_id", "cosine").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    lsh.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      assert(math.abs(allSims(key) - r.getDouble(2)) < 1e-9,
        s"cosine mismatch for $key")
    }
    // and the top-1 brute neighbor in the same bucket must be found
    assert(brute.nonEmpty)
  }

  test("ivfKnn recall@5 vs brute force is reasonable and cosines are exact") {
    val e = Tables.embeddings(spark, sf)
    val probes = e.filter(col("vec_id") % 50 === 0)
    val brute = Similarity.bruteForceKnn(probes, e, k = 5)
      .select("probe_id", "cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfKnn(probes, e, k = 5, nCells = 8, nProbe = 3)
      .select("probe_id", "cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ivf.nonEmpty)
    val recall = brute.intersect(ivf).size.toDouble / brute.size
    assert(recall >= 0.3, s"IVF recall@5 $recall too low")
  }

  test("ivfPqKnn: cell pruning + ADC shortlist beat either leg's recall floor") {
    val e = Tables.embeddings(spark, sf)
    val probes = e.filter(col("vec_id") % 50 === 0)
    val brute = Similarity.bruteForceKnn(probes, e, k = 5)
      .select("probe_id", "cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = Similarity.ivfPqKnn(probes, e, k = 5,
      nCells = 8, nProbe = 4, m = 8, kSub = 16, rerank = 40)
    val rows = got.collect()
    assert(rows.nonEmpty)
    // output contract = the other sim_knn_*: 5 ranked rows per probe,
    // no self-match, monotone ranks
    rows.groupBy(_.getLong(0)).foreach { case (p, rs) =>
      assert(rs.map(_.getInt(3)).sorted.toSeq == (1 to rs.length),
        s"probe $p ranks")
      assert(rs.forall(_.getLong(1) != p), s"probe $p self-match")
    }
    val pairs = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = brute.intersect(pairs).size.toDouble / brute.size
    assert(recall >= 0.3, s"IVFPQ recall@5 $recall too low")
    // exactness of the re-ranked cosines: every reported pair's cosine
    // equals the brute-force cosine for that pair
    val bruteCos = Similarity.bruteForceKnn(probes, e, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    rows.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      bruteCos.get(key).foreach(c => assert(c == r.getDouble(2), s"cosine $key"))
    }
  }

  test("minhashBandHashes emits no band rows for sub-shingle docs") {
    import spark.implicits._
    // every short doc shares the all-MaxValue signature — indexing them
    // would cross-collide all of them in every band forever; they can
    // never verify at a positive threshold, so they must emit nothing
    val docs = Seq(
      (1L, "one two"), (2L, "x"), (3L, ""),
      (4L, "a full three-token doc here")
    ).toDF("doc_id", "text")
    val rows = Dedup.minhashBandHashes(docs, bands = 16, rowsPerBand = 2)
    assert(rows.select("doc_id").distinct().collect().map(_.getLong(0)).toSet == Set(4L))
    assert(rows.count() == 16)
  }

  test("dupSpanIslands coalesces overlapping windows into maximal spans, owner exempt") {
    import spark.implicits._
    // A and B are 8-token blocks; docs 2 and 3 share both, separated by a
    // unique middle token — the non-owner (3) must report exactly TWO
    // maximal spans of 8, never the per-window count, and never a merged
    // span across the unique gap. Docs 0/1 are verbatim copies: the
    // non-owner's whole 10-token text is ONE span of 10 (3 overlapping
    // windows coalesced).
    val blockA = (0 until 8).map(i => s"a$i")
    val blockB = (0 until 8).map(i => s"b$i")
    val ten = (0 until 10).map(i => s"t$i")
    val docs = Seq(
      (0L, ten.mkString(" ")),
      (1L, ten.mkString(" ")),
      (2L, (blockA ++ Seq("x2") ++ blockB).mkString(" ")),
      (3L, (blockA ++ Seq("y3") ++ blockB).mkString(" "))
    ).toDF("doc_id", "text")
    val got = Dedup.dupSpanIslands(docs, n = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set(
      (1L, 0L, 10L),       // full-copy non-owner: one maximal span
      (3L, 0L, 8L),        // block A
      (3L, 9L, 8L)))       // block B, after the unique gap at position 8
  }

  test("bowFingerprint is order- and repetition-invariant") {
    import spark.implicits._
    val fps = Seq("a b c c", "c b a", "b a c c c")
      .toDF("text").select(TextFns.bowFingerprint(col("text")))
      .collect().map(_.getString(0)).toSet
    assert(fps.size == 1)
  }

  test("connectedComponents labels every vertex with the component min, including chains") {
    import spark.implicits._
    val vertices = (1L to 10L).toDF("id")
    // component {1..5} as a diameter-4 chain (forces multiple propagation
    // rounds), triangle {6,7,8} with a redundant edge, singletons {9,10}
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (6L, 7L), (7L, 8L), (6L, 8L)
    ).toDF("a", "b")
    val got = graft.operators.Dedup.connectedComponents(vertices, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      6L -> 6L, 7L -> 6L, 8L -> 6L, 9L -> 9L, 10L -> 10L)
    assert(got == want)
  }

  test("crossCorpusVerdicts classifies exact_dup, near_dup, and new batch docs") {
    import spark.implicits._
    val existing = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta"),
      (11L, "one two three four five six seven eight"),
      (12L, "alpha beta gamma delta epsilon zeta eta theta") // dup inside existing
    ).toDF("doc_id", "text")
    val batch = Seq(
      (20L, "alpha beta gamma delta epsilon zeta eta theta"), // exact copy of 10/12
      (21L, "one two three four five six seven nine"),        // near dup of 11
      (22L, "completely different words entirely here now")   // new
    ).toDF("doc_id", "text")
    val got = graft.operators.Dedup
      .crossCorpusVerdicts(existing, batch, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    assert(got == Set(
      (20L, "exact_dup", 10L), // min existing id wins
      (21L, "near_dup", 11L),
      (22L, "new", -1L)))
  }

  test("connectedComponents on an empty edge set is the identity labeling") {
    import spark.implicits._
    val vertices = (1L to 4L).toDF("id")
    val edges = Seq.empty[(Long, Long)].toDF("a", "b")
    val got = graft.operators.Dedup.connectedComponents(vertices, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == (1L to 4L).map(i => i -> i).toMap)
  }

  test("signalAgreement: both / lexical_only / semantic_only verdicts on a crafted corpus") {
    import spark.implicits._
    // docs 1,2 share text (8 of 9 shingles); doc 3 is textually unrelated
    val t1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val t2 = t1 + " lambda"
    val t3 = "one two three four five six seven eight nine ten"
    val docs = Seq((1L, t1), (2L, t2), (3L, t3)).toDF("doc_id", "text")
    // all three embeddings share the sign block and are near-parallel,
    // so every pair is a semantic pair; only (1,2) is also lexical
    val e1 = Seq(1.0f, 1.0f, 1.0f, 1.0f, 1.0f, 1.0f, 0.5f, 0.5f)
    val e2 = Seq(1.0f, 1.0f, 1.0f, 1.0f, 1.0f, 1.0f, 0.5f, 0.5f)
    val e3 = Seq(0.9f, 1.0f, 1.0f, 1.0f, 1.0f, 1.0f, 0.5f, 0.4f)
    val emb = Seq((1L, e1), (2L, e2), (3L, e3)).toDF("vec_id", "embedding")
    val v = graft.operators.Dedup.signalAgreement(docs, emb)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getString(4))).toMap
    assert(v((1L, 2L)) == "both")
    assert(v((1L, 3L)) == "semantic_only")
    assert(v((2L, 3L)) == "semantic_only")
    // and a corpus with no semantic pairs yields lexical_only
    val far = Seq(
      (1L, Seq(1.0f, 1f, 1f, 1f, 1f, 1f, 1f, 1f)),
      (2L, Seq(-1.0f, -1f, -1f, -1f, -1f, -1f, -1f, -1f)),
      (3L, Seq(1.0f, -1f, 1f, -1f, 1f, -1f, 1f, -1f))).toDF("vec_id", "embedding")
    val v2 = graft.operators.Dedup.signalAgreement(docs, far)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getString(4))).toMap
    assert(v2 == Map((1L, 2L) -> "lexical_only"))
  }

  test("bloomPrefilter: no false negatives on replays, prunes fresh docs map-side") {
    val docs = Tables.documents(spark, sf)
    val existing = docs.filter(col("doc_id") % 5 =!= 0)
    val replayed = existing.filter(col("doc_id") % 7 === 1)
      .withColumn("doc_id", col("doc_id") + lit(10000000L))
    val fresh = docs.filter(col("doc_id") % 5 === 0) // fixture has no exact dups
    val pre = graft.operators.Dedup.bloomPrefilter(
      existing, fresh.unionByName(replayed),
      expectedItems = 1000L, numBits = 64000L)
    val exTexts = existing.select("text").distinct()
    // contract half 1: a text present in the corpus can NEVER be missed
    assert(pre.filter(!col("might_dup"))
      .join(exTexts, Seq("text"), "left_semi").count() == 0)
    // contract half 2: pruning actually happens (64 bits/item ⇒ fpp ≪ 1%)
    val freshScored = pre.join(exTexts, Seq("text"), "left_anti")
    val pruned = freshScored.filter(!col("might_dup")).count()
    assert(pruned * 2 >= freshScored.count(),
      s"bloom pruned only $pruned of ${freshScored.count()} fresh docs")
    // empty corpus: everything is definitely new
    val none = graft.operators.Dedup.bloomPrefilter(
      existing.limit(0), fresh, expectedItems = 10L, numBits = 640L)
    assert(none.filter(col("might_dup")).count() == 0)
  }

  test("centroidAssign: total assignment, valid labels, prototypes classify themselves") {
    val e = Tables.embeddings(spark, sf)
    val assigned = graft.operators.Similarity.centroidAssign(e)
    val rows = assigned.collect()
    assert(rows.length == e.count(), "every vector gets exactly one label")
    val labels = e.select("label").distinct()
      .collect().map(_.getInt(0)).toSet
    assert(rows.map(_.getAs[Int]("pred_label")).toSet.subsetOf(labels))
    // a synthetic vector AT a prototype must classify as that prototype's
    // label: axis-aligned clusters make the means near-axis unit vectors
    import spark.implicits._
    val crisp = (0 until 4).flatMap { lab =>
      (0 until 20).map { i =>
        val v = Array.fill(8)(0.01f * (i % 3))
        v(lab) = 1.0f
        (lab.toLong * 100 + i, v.toSeq, lab)
      }
    }.toDF("vec_id", "embedding", "label")
    val crispAssigned = graft.operators.Similarity.centroidAssign(crisp)
    val wrong = crispAssigned
      .filter(col("label") =!= col("pred_label")).count()
    assert(wrong == 0, s"$wrong separable vectors misclassified")
  }
}
