package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer TRAINING as a distributed operator —
  * the subword-vocabulary step of an LLM data pipeline (Sennrich,
  * Haddow & Birch 2016, "Neural Machine Translation of Rare Words with
  * Subword Units" — the word-histogram formulation of the classic BPE
  * merge loop).
  *
  * Scale shape (the reason the histogram formulation is the published
  * algorithm): ONE corpus pass builds the distinct-word histogram —
  * at 100 TB of text that aggregation is the only O(corpus) work, and
  * its partial-aggregate shuffle output is the distinct vocabulary,
  * orders of magnitude smaller than the corpus. Every merge iteration
  * then runs over the HISTOGRAM: a pair-count aggregation (map-side
  * partial), one TakeOrdered(1) for the argmax, and a map-only
  * `aggregate()` lambda that rewrites each word's symbol array —
  * O(histogram) per merge, never O(corpus). Lineage is truncated every
  * few iterations (localCheckpoint) so the loop's plan depth stays
  * bounded, the same recipe as the PageRank iteration.
  *
  * Conventions: tokens are `[a-z]+` runs of the lowercased text (the
  * repo's tx_* tokenization), and the end-of-word marker is `_` — a
  * character the token alphabet excludes, so marker pairs stay
  * SQL-expressible for the oracle surface (substr over `word || '_'`).
  * Ties in the pair argmax break deterministically: weight desc, then
  * (left, right) lexicographic asc — training is bit-reproducible, no
  * RNG anywhere.
  */
object Bpe {

  /** One corpus pass: (word, cnt) histogram of `[a-z]+` tokens. */
  def wordHistogram(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(expr(
        s"regexp_extract_all(lower($textCol), '[a-z]+', 0)")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** Replace every left-to-right, non-overlapping adjacent (a, b) in a
    * symbol array with the merged token — one fold, O(len) per word.
    * Non-overlap falls out of the fold: after a merge the accumulator's
    * last element is `a+b`, which can never equal `a` again (b is
    * non-empty), so "aaa" under (a,a) yields ["aa","a"], the classic
    * BPE apply order.
    */
  private[graft] def mergePair(syms: Column, a: String, b: String): Column =
    aggregate(syms, array().cast("array<string>"), (out, s) => {
      val canMerge = (size(out) > 0) &&
        (element_at(out, -1) === lit(a)) && (s === lit(b))
      when(canMerge,
        concat(slice(out, lit(1), size(out) - 1), array(lit(a + b))))
        .otherwise(concat(out, array(s)))
    })

  /** The merge loop: learn up to `numMerges` merges from a (word, cnt)
    * histogram. Returns (left, right, weight) in learned order — rank
    * is the sequence position. Stops early when the best pair's weight
    * drops below `minWeight` (merging a once-seen pair memorizes noise).
    *
    * Two physically different loops, ONE algorithm (same tie-breaks,
    * identical output — spec-pinned): a vocabulary at or under
    * `driverVocabLimit` collects once and iterates driver-side (the
    * histogram is dimension-sized; 2·numMerges Spark jobs over a
    * 50k-word table would be pure scheduler overhead), while a larger
    * vocabulary runs the distributed iteration — pair-count partial agg
    * + TakeOrdered(1) argmax + a map-only fold per merge, lineage
    * checkpoint-bounded. Pass `driverVocabLimit = 0` to force the
    * distributed path (the specs do, to pin the two paths equal).
    */
  def learnMerges(hist: DataFrame, numMerges: Int,
      minWeight: Long = 2L,
      driverVocabLimit: Long = 100000L): Seq[(String, String, Long)] = {
    if (driverVocabLimit > 0 &&
        hist.limit(driverVocabLimit.toInt + 1).count() <= driverVocabLimit)
      return learnMergesDriver(
        hist.collect().map(r => (r.getString(0), r.getLong(1))),
        numMerges, minWeight)
    var words = hist.select(col("cnt"),
      expr("concat(transform(sequence(1, length(word)), " +
        "i -> substring(word, i, 1)), array('_'))").as("syms"))
      .localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer[(String, String, Long)]()
    var k = 0
    var done = false
    while (k < numMerges && !done) {
      // fully-merged words (one symbol) contribute no pairs — and MUST
      // filter out: sequence(1, 0) runs DESCENDING in Spark, so the
      // transform would index past the array instead of being empty
      val top = words.filter(size(col("syms")) > 1)
        .select(col("cnt"), explode(expr(
          "transform(sequence(1, size(syms) - 1), " +
            "i -> struct(syms[i - 1] AS a, syms[i] AS b))")).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum("cnt").as("w"))
        .orderBy(desc("w"), asc("a"), asc("b")).limit(1).collect()
      if (top.isEmpty || top(0).getLong(2) < minWeight) done = true
      else {
        val (a, b, w) =
          (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((a, b, w))
        words = words.withColumn("syms", mergePair(col("syms"), a, b))
        // bound the iterative plan depth, like the PageRank loop
        if ((k + 1) % 8 == 0) words = words.localCheckpoint(true)
        k += 1
      }
    }
    merges.toSeq
  }

  /** The driver twin of the distributed loop — byte-identical argmax
    * (weight desc, then (left, right) asc) and merge semantics over a
    * collected histogram.
    */
  private def learnMergesDriver(hist: Array[(String, Long)],
      numMerges: Int, minWeight: Long): Seq[(String, String, Long)] = {
    var words = hist.map { case (w, c) =>
      ((w.map(_.toString) :+ "_").toVector, c) }
    val merges = scala.collection.mutable.ArrayBuffer[(String, String, Long)]()
    var done = false
    while (merges.size < numMerges && !done) {
      val counts = scala.collection.mutable.HashMap
        .empty[(String, String), Long]
      words.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.size - 1) {
          val k = (syms(i), syms(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + c)
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        val ((a, b), w) = counts.minBy { case ((x, y), n) => (-n, x, y) }
        if (w < minWeight) done = true
        else {
          merges += ((a, b, w))
          words = words.map { case (syms, c) =>
            val out = Vector.newBuilder[String]
            var last: String = null
            syms.foreach { s =>
              if (last == a && s == b) { last = a + b }
              else { if (last != null) out += last; last = s }
            }
            if (last != null) out += last
            (out.result(), c)
          }
        }
      }
    }
    merges.toSeq
  }

  /** Greedy BPE apply (driver-side helper, also the UDF body): merge the
    * LOWEST-RANK mergeable pair first until none applies — the standard
    * inference order, guaranteeing encode agrees with training. O(len ·
    * merges-applied) per word; words are short, ranks broadcast.
    */
  def encodeWord(word: String, rank: Map[(String, String), Int]): Seq[String] = {
    var syms = (word.map(_.toString) :+ "_").toVector
    var continue = true
    while (continue && syms.size > 1) {
      var best = Int.MaxValue
      var at = -1
      var i = 0
      while (i < syms.size - 1) {
        rank.get((syms(i), syms(i + 1))).foreach { r =>
          if (r < best) { best = r; at = i }
        }
        i += 1
      }
      if (at < 0) continue = false
      else syms = (syms.take(at) :+ (syms(at) + syms(at + 1))) ++
        syms.drop(at + 2)
    }
    syms
  }
}
