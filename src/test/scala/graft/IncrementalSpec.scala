package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.warehouse.Incremental

class IncrementalSpec extends AnyFunSuite {
  import SparkTest._

  def dailyMart(fact: DataFrame): DataFrame =
    fact.groupBy(col("ts").cast("date").as("p_date"))
      .agg(count(lit(1)).as("n"),
        graft.functions.Fns.moneySum(col("value")).as("total"))

  test("incremental refresh rewrites only touched partitions and matches full rebuild") {
    val events = Tables.events(spark, sf).cache()
    val martPath = Files.createTempDirectory("graft_inc").toString + "/daily"

    // initial full build
    dailyMart(events).write.mode("overwrite").partitionBy("p_date").parquet(martPath)
    val before = spark.read.parquet(martPath).collect()
      .map(r => r.getDate(r.fieldIndex("p_date")).toString ->
        (r.getAs[Long]("n"), r.getAs[Double]("total"))).toMap

    // record partition dir mtimes
    def mtimes: Map[String, Long] =
      Files.list(Paths.get(martPath)).toArray.map(_.asInstanceOf[java.nio.file.Path])
        .filter(_.getFileName.toString.startsWith("p_date="))
        .map(p => p.getFileName.toString ->
          Files.list(p).toArray.map(_.asInstanceOf[java.nio.file.Path])
            .map(Files.getLastModifiedTime(_).toMillis).max).toMap
    val t0 = mtimes

    Thread.sleep(1100)
    // batch touching exactly one date
    val batch = events.filter(col("ts").cast("date") === "2024-01-03")
    val refreshed = Incremental.refresh(spark, events, batch, dailyMart, "ts", martPath)
    assert(refreshed.map(_.toString) == Seq("2024-01-03"))

    val t1 = mtimes
    val changed = t1.filter { case (k, v) => t0.get(k).exists(_ != v) }.keySet
    assert(changed == Set("p_date=2024-01-03"),
      s"expected only one partition rewritten, got $changed")

    // refreshed mart equals a full rebuild
    val after = spark.read.parquet(martPath).collect()
      .map(r => r.getDate(r.fieldIndex("p_date")).toString ->
        (r.getAs[Long]("n"), r.getAs[Double]("total"))).toMap
    assert(after == before)
  }

  test("touchedDates finds exactly the batch's dates") {
    val batch = Tables.events(spark, sf)
      .filter(col("ts").cast("date").isin("2024-01-01", "2024-01-05"))
    val dates = Incremental.touchedDates(batch, "ts").map(_.toString).sorted
    assert(dates == Seq("2024-01-01", "2024-01-05"))
  }
}
