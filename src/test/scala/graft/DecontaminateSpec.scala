package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Decontaminate, Sampling}

class DecontaminateSpec extends AnyFunSuite {
  import SparkTest._
  import spark.implicits._

  // tiny corpus with a known 5-gram overlap structure
  private lazy val train = Seq(
    (1L, "alpha beta gamma delta epsilon zeta"),   // shares 2 distinct 5-grams with eval doc 100
    (2L, "one two three four five six seven"),     // no overlap
    (3L, "alpha beta gamma delta epsilon"),        // shares exactly 1 5-gram
    (4L, "short text only")                        // < 5 tokens: no grams at all
  ).toDF("doc_id", "text")

  private lazy val evalDocs = Seq(
    (100L, "alpha beta gamma delta epsilon zeta eta")
  ).toDF("doc_id", "text")

  test("contaminationHits counts distinct shared n-grams exactly") {
    val hits = Decontaminate.contaminationHits(train, evalDocs, n = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // eval grams: {a b g d e, b g d e z, g d e z eta}
    // doc 1 grams: {a b g d e, b g d e z} → 2 hits; doc 3: {a b g d e} → 1
    assert(hits == Map(1L -> 2L, 3L -> 1L))
  }

  test("clean drops flagged docs, keeps clean and sub-n-token docs") {
    val kept = Decontaminate.clean(train, evalDocs, n = 5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 4L))
    // higher minHits keeps the single-gram overlap
    val kept2 = Decontaminate.clean(train, evalDocs, n = 5, minHits = 2L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept2 == Set(2L, 3L, 4L))
  }

  test("fixture split decontamination is deterministic and nonempty") {
    val docs = Tables.documents(spark, sf)
    val isEval = Decontaminate.isEval(col("doc_id"), 0.1)
    val hits = Decontaminate.contaminationHits(
      docs.filter(!isEval), docs.filter(isEval), n = 5)
    val rows1 = hits.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows1.nonEmpty, "planted near-dups should cross the 10% split")
    val rows2 = Decontaminate.contaminationHits(
      docs.filter(!isEval), docs.filter(isEval), n = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows1 == rows2)
    // flagged docs are train docs (never eval ids), and clean() removes all
    val evalIds = docs.filter(isEval).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(rows1.map(_._1).intersect(evalIds).isEmpty)
    val cleanedIds = Decontaminate.clean(
      docs.filter(!isEval), docs.filter(isEval), n = 5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(cleanedIds.intersect(rows1.map(_._1)).isEmpty)
    assert(cleanedIds.size + rows1.size == docs.filter(!isEval).count())
  }

  test("clean uses RELIABLE checkpoint when a checkpoint dir is configured") {
    // Materialize.stable: with sparkContext.setCheckpointDir set, the
    // flagged-id set must land on shared storage (survives executor loss)
    // instead of executor-local blocks — same results either way.
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    val sc = spark.sparkContext
    sc.setCheckpointDir(dir)
    try {
      val kept = Decontaminate.clean(train, evalDocs, n = 5)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(kept == Set(2L, 4L))
      val ckptDir = new java.io.File(new java.net.URI(sc.getCheckpointDir.get))
      val files = Option(ckptDir.listFiles()).getOrElse(Array.empty)
      assert(files.nonEmpty, s"no reliable checkpoint written under $dir")
    } finally {
      // reset so other suites keep the (faster) executor-local path;
      // Option(null) → None inside setCheckpointDir, and the non-local
      // path warning short-circuits on isLocal
      sc.setCheckpointDir(null)
    }
  }

  test("mixtureThresholds: exact integer thresholds, cap at 65536") {
    val df = Seq.tabulate(100)(i =>
      (i.toLong, if (i < 80) "big" else "rare")).toDF("doc_id", "source")
    // budget 1/2, weights big=1 rare=3, N=100, W=4, c_big=80, c_rare=20:
    // thr_big  = floor(65536·1·1·100 / (2·4·80))  = floor(10240.0) = 10240
    // thr_rare = floor(65536·1·3·100 / (2·4·20))  = 122880 → capped 65536
    val thr = Sampling.mixtureThresholds(df, "source",
      Map("big" -> 1L, "rare" -> 3L), budgetNum = 1, budgetDen = 2)
    assert(thr == Map("big" -> 10240L, "rare" -> 65536L))
  }

  test("mixtureReweight keeps all of a capped source and a subset of others") {
    val df = Seq.tabulate(100)(i =>
      (i.toLong, if (i < 80) "big" else "rare")).toDF("doc_id", "source")
    val kept = Sampling.mixtureReweight(df, "source", "doc_id",
      Map("big" -> 1L, "rare" -> 3L), budgetNum = 1, budgetDen = 2)
    val bySource = kept.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySource.getOrElse("rare", 0L) == 20L, "rate-1 source keeps everything")
    val bigKept = bySource.getOrElse("big", 0L)
    // 80 docs at rate 10240/65536 = 15.6% → expect ~12, generous band
    assert(bigKept > 0 && bigKept < 40, s"big kept $bigKept")
    // deterministic
    val again = Sampling.mixtureReweight(df, "source", "doc_id",
      Map("big" -> 1L, "rare" -> 3L), budgetNum = 1, budgetDen = 2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again == kept.select("doc_id").collect().map(_.getLong(0)).toSet)
  }
}
