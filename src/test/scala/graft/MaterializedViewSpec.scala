package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.MaterializedViews

class MaterializedViewSpec extends AnyFunSuite {
  // needs the injected optimizer rule → extension session
  lazy val spark = new RewriteRuleSpec().spark

  private def dailyAgg(s: org.apache.spark.sql.SparkSession) =
    Tables.events(s, SparkTest.sf)
      .groupBy(col("ts").cast("date").as("d"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total"))

  test("a query matching a materialized view reads the mart, not the fact") {
    val path = java.nio.file.Files.createTempDirectory("graft_mv").toString + "/daily"
    MaterializedViews.materialize(dailyAgg(spark), path)
    try {
      // freshly-built identical aggregation → rewritten to a parquet scan
      val fresh = dailyAgg(spark)
      val optimized = fresh.queryExecution.optimizedPlan.toString
      assert(!optimized.contains("Aggregate"),
        s"matching query must skip recomputation:\n${optimized.take(1200)}")
      assert(optimized.contains("parquet"), "should scan the materialization")

      // results identical to computing from scratch (plain session, no rule)
      val plain = GraftSession.local(2, "graft-test")
      val expected = dailyAgg(plain).orderBy("d").collect().map(_.toString)
      val got = fresh.orderBy("d").collect().map(_.toString)
      assert(got.sameElements(expected))

      // composition: operators ABOVE the matching subtree survive the swap
      // (matching is exact-result like CacheManager's — a column-PRUNED
      // variant is a different result and recomputes, so compose with
      // operators that preserve the view's output)
      val composed = dailyAgg(spark).filter(col("n") > 100)
      val cPlan = composed.queryExecution.optimizedPlan.toString
      assert(!cPlan.contains("Aggregate") && cPlan.contains("parquet"))
      assert(composed.count() ==
        dailyAgg(plain).filter(col("n") > 100).count())

      // a DIFFERENT aggregation is untouched
      val other = Tables.events(spark, SparkTest.sf)
        .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      assert(other.queryExecution.optimizedPlan.toString.contains("Aggregate"))
    } finally MaterializedViews.clear()
  }

  test("clear() restores recomputation") {
    val path = java.nio.file.Files.createTempDirectory("graft_mv2").toString + "/daily"
    MaterializedViews.materialize(dailyAgg(spark), path)
    MaterializedViews.clear()
    assert(dailyAgg(spark).queryExecution.optimizedPlan.toString.contains("Aggregate"))
  }
}
