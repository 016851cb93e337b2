package graft

import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Scd2

class Scd2Spec extends AnyFunSuite {
  import SparkTest.spark
  import spark.implicits._

  def ts(s: String): Timestamp = Timestamp.valueOf(s)

  def obs(rows: (String, String, Double, String)*): DataFrame =
    rows.map { case (c, t, f, d) => (c, ts(t), f, d) }
      .toDF("city", "updated_at", "temp_f", "desc")

  /** SCD2 invariants: ≤1 open version per key; intervals non-overlapping
    * and ordered per key.
    */
  def assertInvariants(snap: DataFrame, keys: Seq[String]): Unit = {
    val open = snap.filter(col("valid_to").isNull)
      .groupBy(keys.map(col): _*).count().filter(col("count") > 1)
    assert(open.isEmpty, "more than one open version for a key")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("valid_from"))
    val overlaps = snap
      .withColumn("next_from", lead(col("valid_from"), 1).over(w))
      .filter(col("next_from").isNotNull &&
        (col("valid_to").isNull || col("valid_to") > col("next_from")))
    assert(overlaps.isEmpty, "overlapping validity intervals")
  }

  test("timestamp strategy: versions chain, unchanged rows persist, invariants hold") {
    val empty = Scd2.emptySnapshot(obs(), "updated_at")
    val day1 = obs(
      ("NY", "2024-01-01 00:00:00", 30.0, "clear"),
      ("BOS", "2024-01-01 00:00:00", 20.0, "snow"))
    val s1 = Scd2.applyTimestamp(empty, day1, Seq("city"), "updated_at",
      lit(ts("2024-01-01 12:00:00"))).cache()
    assert(s1.count() == 2)
    assertInvariants(s1, Seq("city"))

    // day 2: NY updated, BOS unchanged (same updated_at)
    val day2 = obs(
      ("NY", "2024-01-02 00:00:00", 35.0, "rain"),
      ("BOS", "2024-01-01 00:00:00", 20.0, "snow"))
    val s2 = Scd2.applyTimestamp(s1, day2, Seq("city"), "updated_at",
      lit(ts("2024-01-02 12:00:00"))).cache()
    assert(s2.count() == 3) // NY closed + NY new open + BOS unchanged open
    val nyOpen = s2.filter(col("city") === "NY" && col("valid_to").isNull).head()
    assert(nyOpen.getAs[Double]("temp_f") == 35.0)
    val nyClosed = s2.filter(col("city") === "NY" && col("valid_to").isNotNull).head()
    assert(nyClosed.getAs[Timestamp]("valid_to") == ts("2024-01-02 00:00:00"))
    assertInvariants(s2, Seq("city"))

    // day 3: BOS disappears (hard delete) → its open version closes at asOf
    val day3 = obs(("NY", "2024-01-02 00:00:00", 35.0, "rain"))
    val s3 = Scd2.applyTimestamp(s2, day3, Seq("city"), "updated_at",
      lit(ts("2024-01-03 12:00:00"))).cache()
    val bosOpen = s3.filter(col("city") === "BOS" && col("valid_to").isNull)
    assert(bosOpen.isEmpty, "hard-deleted key must have no open version")
    val bosClosed = s3.filter(col("city") === "BOS").head()
    assert(bosClosed.getAs[Timestamp]("valid_to") == ts("2024-01-03 12:00:00"))
    assertInvariants(s3, Seq("city"))
  }

  test("timestamp strategy: null source updated_at keeps the open version (no silent vanish)") {
    val empty = Scd2.emptySnapshot(obs(), "updated_at")
    val day1 = obs(("NY", "2024-01-01 00:00:00", 30.0, "clear"))
    val s1 = Scd2.applyTimestamp(empty, day1, Seq("city"), "updated_at",
      lit(ts("2024-01-01 12:00:00"))).cache()
    assert(s1.count() == 1)

    // day 2: source row matches but carries a NULL updated_at — the
    // comparison can't prove a change, so the open version must survive
    // (an unguarded `>` is NULL and the key would drop from the snapshot)
    val day2 = Seq(("NY", None: Option[Timestamp], 99.0, "bogus"))
      .toDF("city", "updated_at", "temp_f", "desc")
    val s2 = Scd2.applyTimestamp(s1, day2, Seq("city"), "updated_at",
      lit(ts("2024-01-02 12:00:00"))).cache()
    assert(s2.count() == 1, "null-updated_at source row must not change the snapshot")
    val open = s2.filter(col("city") === "NY" && col("valid_to").isNull).head()
    assert(open.getAs[Double]("temp_f") == 30.0, "open version must keep prior values")
    assertInvariants(s2, Seq("city"))
  }

  test("check strategy: version only on tracked-column change") {
    val src = Seq(("2024-01-01", 100L, 25.0)).map { case (d, n, f) =>
      (java.sql.Date.valueOf(d), n, f)
    }.toDF("trip_date", "trip_count", "avg_fare")
    val empty = Scd2.emptySnapshot(src, "trip_date")
      .withColumn("valid_from", col("valid_from").cast("timestamp"))
      .withColumn("valid_to", col("valid_to").cast("timestamp"))
    val s1 = Scd2.applyCheck(empty, src, Seq("trip_date"),
      Seq("trip_count", "avg_fare"), lit(ts("2024-01-02 02:00:00"))).cache()
    assert(s1.count() == 1)

    // same values → no new version
    val s2 = Scd2.applyCheck(s1, src, Seq("trip_date"),
      Seq("trip_count", "avg_fare"), lit(ts("2024-01-03 02:00:00"))).cache()
    assert(s2.count() == 1)
    assert(s2.filter(col("valid_to").isNull).count() == 1)

    // metric restated → close + reopen
    val restated = Seq((java.sql.Date.valueOf("2024-01-01"), 120L, 25.0))
      .toDF("trip_date", "trip_count", "avg_fare")
    val s3 = Scd2.applyCheck(s2, restated, Seq("trip_date"),
      Seq("trip_count", "avg_fare"), lit(ts("2024-01-04 02:00:00"))).cache()
    assert(s3.count() == 2)
    val open = s3.filter(col("valid_to").isNull).head()
    assert(open.getAs[Long]("trip_count") == 120L)
    assertInvariants(s3, Seq("trip_date"))
  }

  def assertInvariantsCheck(snap: DataFrame): Unit = assertInvariants(snap, Seq("trip_date"))
}
