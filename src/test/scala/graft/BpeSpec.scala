package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Bpe

/** BPE tokenizer training (operators/Bpe.scala) on the classic
  * low/lower/newest/widest corpus (Sennrich et al. 2016) — the merge
  * sequence below is hand-derived from the algorithm: argmax by weight
  * desc then (left, right) asc, `_` end-of-word marker, non-overlapping
  * left-to-right applies.
  */
class BpeSpec extends AnyFunSuite {
  import SparkTest._
  import spark.implicits._

  private def corpus() = Seq(
    Array.fill(5)("low").mkString(" "),
    Array.fill(2)("lower").mkString(" "),
    Array.fill(6)("newest").mkString(" "),
    Array.fill(3)("widest").mkString(" ")
  ).toDF("text")

  test("wordHistogram: one-pass [a-z]+ census") {
    val h = Bpe.wordHistogram(corpus(), "text").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(h == Map("low" -> 5L, "lower" -> 2L,
      "newest" -> 6L, "widest" -> 3L))
  }

  test("learnMerges reproduces the hand-derived sequence, weights non-increasing, early stop") {
    val merges = Bpe.learnMerges(
      Bpe.wordHistogram(corpus(), "text"), numMerges = 20)
    // the driver fast path and the distributed loop are ONE algorithm:
    // forcing the distributed path must yield the identical sequence
    assert(Bpe.learnMerges(Bpe.wordHistogram(corpus(), "text"),
      numMerges = 20, driverVocabLimit = 0L) == merges)
    val expected = Seq(
      ("e", "s", 9L), ("es", "t", 9L), ("est", "_", 9L),
      ("l", "o", 7L), ("lo", "w", 7L),
      ("e", "w", 6L), ("ew", "est_", 6L), ("n", "ewest_", 6L),
      ("low", "_", 5L),
      ("d", "est_", 3L), ("i", "dest_", 3L), ("w", "idest_", 3L),
      ("e", "r", 2L), ("er", "_", 2L), ("low", "er_", 2L))
    assert(merges == expected)
    // asked for 20, learned 15: every remaining pair is below minWeight
    assert(merges.size == 15)
    val w = merges.map(_._3)
    assert(w.zip(w.drop(1)).forall { case (a, b) => a >= b })
  }

  test("greedy encode: lowest rank first, OOV word segments into learned subwords") {
    val rank = Bpe.learnMerges(
      Bpe.wordHistogram(corpus(), "text"), numMerges = 20)
      .zipWithIndex.map { case ((a, b, _), i) => (a, b) -> i }.toMap
    assert(Bpe.encodeWord("newest", rank) == Seq("newest_"))
    assert(Bpe.encodeWord("low", rank) == Seq("low_"))
    // "lowest" never appears in the corpus — the classic subword payoff
    assert(Bpe.encodeWord("lowest", rank) == Seq("low", "est_"))
    // fully-OOV letters fall back to characters + marker
    assert(Bpe.encodeWord("zq", rank) == Seq("z", "q", "_"))
  }

  test("mergePair: non-overlapping left-to-right (aaa + (a,a) -> [aa, a])") {
    val out = Seq(Tuple1(Seq("a", "a", "a")))
      .toDF("syms")
      .select(Bpe.mergePair(col("syms"), "a", "a").as("m"))
      .head.getSeq[String](0)
    assert(out == Seq("aa", "a"))
  }

  test("registered queries: pair census matches the trainer's first argmax, qc gate passes") {
    val pairs = queries.Text.txBpePairs.fn(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    assert(pairs.length == 20)
    // the census IS iteration 0: its argmax equals the first learned merge
    val hist = Bpe.wordHistogram(Tables.documents(spark, sf), "text")
    val first = Bpe.learnMerges(hist, numMerges = 1).head
    assert(pairs.head._1 == first._1 + first._2 &&
      pairs.head._2 == first._3)
    val qc = queries.Text.qcBpeTokenizer.fn(spark, sf).collect()
    assert(qc.length == 5 && qc.forall(_.getBoolean(2)),
      qc.map(r => s"${r.getString(0)}=${r.getBoolean(2)}").mkString(", "))
  }
}
