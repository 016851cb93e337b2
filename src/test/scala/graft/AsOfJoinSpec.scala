package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.AsOfJoin

class AsOfJoinSpec extends AnyFunSuite {
  import SparkTest.spark
  import spark.implicits._

  def ts(s: String): Timestamp = Timestamp.valueOf(s)

  lazy val events = Seq(
    (1L, 10L, "2024-01-01 09:00:00"), // before any order → null
    (2L, 10L, "2024-01-01 12:00:00"), // exactly at order A → inclusive match
    (3L, 10L, "2024-01-01 15:00:00"), // between A and B → A
    (4L, 10L, "2024-01-02 12:00:00"), // after B → B
    (5L, 20L, "2024-01-01 12:00:00")  // other key, no orders → null
  ).map { case (e, u, t) => (e, u, ts(t)) }.toDF("event_id", "user_id", "ts")

  lazy val orders = Seq(
    (10L, "2024-01-01 12:00:00", 100L), // A
    (10L, "2024-01-02 00:00:00", 200L)  // B
  ).map { case (u, t, o) => (u, ts(t), o) }.toDF("user_id", "o_ts", "order_id")

  test("as-of semantics: inclusive ties, carried state, null before first right row") {
    val got = AsOfJoin.join(events, orders, "user_id", "ts", "o_ts", Seq("order_id"))
      .select("event_id", "order_id").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(got == Map(1L -> -1L, 2L -> 100L, 3L -> 100L, 4L -> 200L, 5L -> -1L))
  }

  test("plan shuffles once on the key — no nested-loop join") {
    val plan = AsOfJoin.join(events, orders, "user_id", "ts", "o_ts", Seq("order_id"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"), plan.take(1000))
    assert(!plan.contains("CartesianProduct"), plan.take(1000))
  }

  test("multiple right payload columns carried together from the same matched row") {
    val o2 = orders.withColumn("amount", col("order_id") * 10)
    val got = AsOfJoin.join(events, o2, "user_id", "ts", "o_ts",
        Seq("order_id", "amount"))
      .filter(col("event_id") === 4L).head()
    assert(got.getAs[Long]("order_id") == 200L && got.getAs[Long]("amount") == 2000L)
  }
}
