package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup
import graft.queries.Text

/** The round-5 LLM-curation additions: semantic dedup verdicts, the
  * bigram-LM quality filter, and BM25 retrieval. The oracle pins the
  * values; these specs pin the SEMANTIC contracts a fixture swap would
  * not re-derive (verdict soundness vs brute force, zero train OOV,
  * ranking shape).
  */
class LlmFilterSpec extends AnyFunSuite {
  import SparkTest._

  test("semantic verdicts match driver-side brute force exactly (blocking included)") {
    val e = Tables.embeddings(spark, sf)
    val out = Dedup.semanticNearDupVerdicts(e, threshold = 0.3, signBits = 6)
      .collect()
      .map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Int]("blk"), Option(r.getAs[Any]("dup_of")).map(_.asInstanceOf[Long]),
          r.getAs[String]("verdict")))
      .toMap

    val vecs = e.select("vec_id", "embedding").collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getAs[scala.collection.Seq[Float]]("embedding").map(_.toDouble).toArray)
      .sortBy(_._1)
    def blk(v: Array[Double]): Int =
      (0 until 6).map(i => if (v(i) >= 0) 32 >> i else 0).sum
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      if (na == 0 || nb == 0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
    }
    assert(out.size == vecs.length)
    vecs.foreach { case (id, v) =>
      val expectDup = vecs
        .filter { case (cid, cv) => cid < id && blk(cv) == blk(v) && cos(cv, v) >= 0.3 }
        .map(_._1).minOption
      val (gotBlk, gotDup, verdict) = out(id)
      assert(gotBlk == blk(v), s"block mismatch for $id")
      assert(gotDup == expectDup, s"dup_of mismatch for $id: got $gotDup want $expectDup")
      assert(verdict == (if (expectDup.isDefined) "drop" else "keep"))
    }
  }

  test("bigram LM: train-split docs have zero OOV bigrams; scores positive; one row per doc") {
    val out = Text.txLmPerplexity.fn(spark, sf)
    assert(out.count() == Tables.documents(spark, sf).count())
    // every train bigram is in the model by construction
    assert(out.filter(col("doc_id") % 5 =!= 0 && col("oov_bigrams") > 0).count() == 0)
    assert(out.filter(col("avg_nll") <= 0).count() == 0)
  }

  test("bm25: dense ranks, top score first, every hit contains a query term") {
    val rows = Text.txBm25.fn(spark, sf).orderBy("rk").collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Int]("rk")).toSeq == (1 to rows.length))
    val scores = rows.map(_.getAs[Double]("score"))
    assert(scores.head == scores.max)
    // ranking is by round(raw, 6); emitted scores are round(raw, 4) — allow
    // only boundary-rounding inversions, never more than half an rk-grain
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b - 5e-5 })
    val ids = rows.map(_.getAs[Long]("doc_id"))
    val nonHit = Tables.documents(spark, sf)
      .filter(col("doc_id").isin(ids: _*))
      .filter(!array_contains(split(col("text"), " "), "dup") &&
        !array_contains(split(col("text"), " "), "vector") &&
        !array_contains(split(col("text"), " "), "key"))
      .count()
    assert(nonHit == 0)
  }
}
