package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Merge

class MergeSpec extends AnyFunSuite {
  import SparkTest._
  import spark.implicits._

  private def state(df: org.apache.spark.sql.DataFrame): Map[Long, String] =
    df.collect().map(r => r.getAs[Long]("id") -> r.getAs[String]("v")).toMap

  test("upsert: matched keys update, unmatched insert, rest survives") {
    val target = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
    val source = Seq((2L, "B"), (9L, "i")).toDF("id", "v")
    assert(state(Merge.upsert(target, source, Seq("id"))) ==
      Map(1L -> "a", 2L -> "B", 3L -> "c", 9L -> "i"))
  }

  test("upsert rejects schema drift") {
    val target = Seq((1L, "a")).toDF("id", "v")
    val source = Seq((1L, "a", 0)).toDF("id", "v", "extra")
    intercept[IllegalArgumentException] {
      Merge.upsert(target, source, Seq("id"))
    }
  }

  test("applyChanges: delete branch removes keys, others upsert") {
    val target = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
    val changes = Seq((1L, "A", false), (2L, "", true), (4L, "d", false))
      .toDF("id", "v", "_deleted")
    assert(state(Merge.applyChanges(target, changes, Seq("id"))) ==
      Map(1L -> "A", 3L -> "c", 4L -> "d"))
  }

  test("latestPerKey collapses a multi-tick CDC batch deterministically") {
    val changes = Seq(
      (1L, "t1", 1L), (1L, "t3", 3L), (1L, "t2", 2L),
      (2L, "s5", 5L), (2L, "s4", 4L)).toDF("id", "v", "seq")
    val latest = Merge.latestPerKey(changes, Seq("id"), "seq")
    assert(state(latest.select(col("id"), col("v"))) ==
      Map(1L -> "t3", 2L -> "s5"))
    // and it composes with upsert (unique-key contract now holds)
    val target = Seq((1L, "old"), (3L, "keep")).toDF("id", "v")
    val merged = Merge.upsert(target,
      latest.select(col("id"), col("v")), Seq("id"))
    assert(state(merged) == Map(1L -> "t3", 2L -> "s5", 3L -> "keep"))
  }
}
