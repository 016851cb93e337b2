package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Packing

/** Corpus shard packing: the two-phase distributed prefix sum must equal
  * the naive global cumulative sum exactly, for dense AND sparse order
  * keys, with exact integer shard arithmetic.
  */
class PackingSpec extends AnyFunSuite {
  import SparkTest._
  import spark.implicits._

  private def naivePack(rows: Seq[(Long, Long)], budget: Long): Map[Long, Long] = {
    // (id, tokens) sorted by id → id → shard via exact integer division
    var cum = 0L
    rows.sortBy(_._1).map { case (id, t) =>
      val shard = cum / budget
      cum += t
      id -> shard
    }.toMap
  }

  test("packShards equals the naive global prefix sum (dense ids)") {
    val rows = (0L until 200L).map(i => (i, (i % 37) + 1L))
    val df = rows.toDF("doc_id", "t")
    val packed = Packing.packShards(df, "t", "doc_id", tokenBudget = 100L,
        targetBuckets = 16)
      .select("doc_id", "shard_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(packed == naivePack(rows, 100L))
  }

  test("packShards is exact for sparse 64-bit-style ids (bucket count bounded)") {
    // ids spread over a ~10^15 span — value-range bucketing with adaptive
    // width must still produce the same assignment as the naive pack
    val rows = (1L to 150L).map(i => (i * 7_432_843_213_117L, (i % 11) + 5L))
    val df = rows.toDF("doc_id", "t")
    val packed = Packing.packShards(df, "t", "doc_id", tokenBudget = 64L,
        targetBuckets = 32)
      .select("doc_id", "shard_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(packed == naivePack(rows, 64L))
  }

  test("oversized docs skip shard ids; boundaries stay exact") {
    val rows = Seq((1L, 10L), (2L, 350L), (3L, 10L), (4L, 40L))
    val df = rows.toDF("doc_id", "t")
    val packed = Packing.packShards(df, "t", "doc_id", tokenBudget = 100L)
      .select("doc_id", "cum_before", "shard_id").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    // doc 2 starts in shard 0 (cum 10) and spans past shards 1-2;
    // doc 3 lands at cum 360 → shard 3 (ids 1 and 2 skipped)
    assert(packed(1L) == (0L, 0L))
    assert(packed(2L) == (10L, 0L))
    assert(packed(3L) == (360L, 3L))
    assert(packed(4L) == (370L, 3L))
  }

  test("shardManifest totals reconcile with the corpus") {
    val rows = (0L until 97L).map(i => (i, (i % 13) + 2L))
    val df = rows.toDF("doc_id", "t")
    val packed = Packing.packShards(df, "t", "doc_id", tokenBudget = 50L,
      targetBuckets = 8)
    val m = Packing.shardManifest(packed, "t", "doc_id")
    assert(m.agg(sum("n_docs")).head.getLong(0) == 97L)
    assert(m.agg(sum("n_tokens")).head.getLong(0) == rows.map(_._2).sum)
    // id spans of consecutive shards never overlap (packing respects order)
    val spans = m.orderBy("shard_id")
      .select("first_id", "last_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    spans.sliding(2).foreach {
      case Array((_, lastA), (firstB, _)) => assert(lastA < firstB)
      case _ =>
    }
  }

  test("empty corpus keeps the output contract") {
    val df = Seq.empty[(Long, Long)].toDF("doc_id", "t")
    val packed = Packing.packShards(df, "t", "doc_id", tokenBudget = 10L)
    assert(packed.columns.contains("shard_id"))
    assert(packed.count() == 0L)
  }
}
