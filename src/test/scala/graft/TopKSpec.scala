package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.{TopK, TopKPerKeyExec}

class TopKSpec extends AnyFunSuite {
  // needs the planner strategy → reuse the extension session from RewriteRuleSpec
  lazy val spark = new RewriteRuleSpec().spark
  import org.apache.spark.sql.expressions.Window

  test("custom TopKPerKey operator matches the window row_number formulation") {
    val e = Tables.events(spark, SparkTest.sf)
    val custom = TopK.perKey(e, Seq("user_id"), "value", k = 3)
      .select("user_id", "event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("value").desc, col("event_id"))
    val builtin = e.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .select("user_id", "event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // value ties could differ in membership; compare per-key VALUE multisets
    val customVals = TopK.perKey(e, Seq("user_id"), "value", k = 3)
      .groupBy("user_id").agg(sort_array(collect_list("value")).as("vs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val builtinVals = e.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .groupBy("user_id").agg(sort_array(collect_list("value")).as("vs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(customVals == builtinVals)
    assert(custom.size == builtin.size)
  }

  test("physical plan is the two-phase exec with one exchange between phases") {
    val e = Tables.events(spark, SparkTest.sf)
    val planStr = TopK.perKey(e, Seq("user_id"), "value", k = 3)
      .queryExecution.executedPlan.toString
    // two phases (partial under the exchange, final above it)
    val lines = planStr.linesIterator.toSeq
    val topKLines = lines.filter(_.contains("TopKPerKey"))
    assert(topKLines.length == 2, s"expected 2 TopKPerKey phases:\n${planStr.take(1200)}")
    assert(planStr.contains("Exchange hashpartitioning"),
      s"expected a key exchange between phases:\n${planStr.take(1200)}")
    val exchangeIdx = lines.indexWhere(_.contains("Exchange hashpartitioning"))
    val finalIdx = lines.indexWhere(_.contains("TopKPerKey"))
    val partialIdx = lines.lastIndexWhere(_.contains("TopKPerKey"))
    assert(finalIdx < exchangeIdx && exchangeIdx < partialIdx,
      s"exchange must sit between the phases:\n${planStr.take(1200)}")
  }

  test("ascending top-k and k larger than group size") {
    val e = Tables.events(spark, SparkTest.sf)
    val asc = TopK.perKey(e, Seq("user_id"), "value", k = 2, descending = false)
    val mins = asc.groupBy("user_id").agg(max("value").as("m")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // each kept max must be ≤ the true 2nd-smallest per key
    val w = Window.partitionBy(col("user_id")).orderBy(col("value"))
    val truth = e.withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)
      .groupBy("user_id").agg(max("value").as("m")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(mins == truth)
    // k ≥ group size keeps everything
    val all = TopK.perKey(e, Seq("user_id"), "value", k = Int.MaxValue)
    assert(all.count() == e.count())
  }

  test("null order values match the window formulation (nulls sort smallest)") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(5.0)), (1L, None), (1L, Some(3.0)), (1L, Some(7.0)),
      (2L, None), (2L, None), (2L, Some(1.0)),
      (3L, None) // all-null group edge case handled too
    ).toDF("k", "v")
    def winTop(desc: Boolean, k: Int) = {
      val ord = if (desc) col("v").desc else col("v").asc // desc_nulls_last / asc_nulls_first
      val w = Window.partitionBy(col("k")).orderBy(ord)
      df.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
        .groupBy("k").agg(sort_array(collect_list(coalesce(col("v"), lit(-999.0)))).as("vs"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    }
    def customTop(desc: Boolean, k: Int) =
      TopK.perKey(df, Seq("k"), "v", k, descending = desc)
        .groupBy("k").agg(sort_array(collect_list(coalesce(col("v"), lit(-999.0)))).as("vs"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(customTop(desc = true, 2) == winTop(desc = true, 2))
    assert(customTop(desc = false, 2) == winTop(desc = false, 2))
  }

  test("high-distinct-key cardinality degrades to pass-through, not OOM") {
    import spark.implicits._
    // force a tiny partial-phase cap so nearly every key overflows: with
    // 200k distinct keys and cap=64 the old unbounded heap map would hold
    // 200k heaps; now at most 64 + streamed pass-through rows
    spark.conf.set("graft.topk.maxPartialKeys", "64")
    try {
      val big = spark.range(0, 400000)
        .select((col("id") % 200000).as("k"), (col("id") * 7 % 1001).cast("double").as("v"))
      val got = TopK.perKey(big, Seq("k"), "v", k = 2)
      assert(got.count() == 400000) // 2 rows per key × 200k keys
      // spot-check exactness on a handful of keys against the window truth
      val sample = got.filter(col("k") < 5)
        .groupBy("k").agg(sort_array(collect_list("v")).as("vs"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
      val w = Window.partitionBy(col("k")).orderBy(col("v").desc)
      val truth = big.filter(col("k") < 5)
        .withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)
        .groupBy("k").agg(sort_array(collect_list("v")).as("vs"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
      assert(sample == truth)
    } finally spark.conf.unset("graft.topk.maxPartialKeys")
  }
}
