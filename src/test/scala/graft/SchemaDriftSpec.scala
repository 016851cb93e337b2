package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventsStreaming

/** Guard against the fixture schema drift that blanked round 9: events.ts
  * has shipped as TIMESTAMP(NANOS) (read as nanos-long under the legacy
  * conf) and as timestamp[us] (read as TIMESTAMP_NTZ). The adapter must
  * accept every encoding the fixture has ever carried and produce
  * identical, correctly-dated values — and must FAIL LOUDLY on an
  * encoding it cannot prove correct, instead of silently compressing
  * event time (the 1000× unit error that turned the streaming interval
  * join into a near-cross-join in r9).
  */
class SchemaDriftSpec extends AnyFunSuite {
  import SparkTest._

  // one canonical micro-fixture: 4 events on known dates in 2024
  private val microsUtc: Seq[Long] = Seq(
    1704067200000000L, // 2024-01-01 00:00:00
    1704070800123456L, // 2024-01-01 01:00:00.123456
    1706655600000000L, // 2024-01-30 23:00:00
    1704067200000000L) // duplicate instant, distinct event

  private def rows(spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import spark.implicits._
    microsUtc.zipWithIndex
      .map { case (us, i) => (i.toLong, us, i.toLong % 2, "click", 1.0, "{}") }
      .toDF("event_id", "us", "user_id", "event_type", "value", "props")
  }

  /** Write the micro-fixture under one physical encoding of ts into
    * `<dir>/events.parquet`, returning the dir (the Tables.events layout).
    */
  private def writeEncoding(encoding: String): String = {
    val dir = Files.createTempDirectory(s"graft_drift_$encoding").toString
    val base = rows(spark)
    val df = encoding match {
      // the post-read shape of the original TIMESTAMP(NANOS) fixture
      case "nanos_long" => base.withColumn("ts", col("us") * 1000L)
      // the current fixture: parquet timestamp[us] without tz → NTZ
      case "ts_ntz" => base.withColumn("ts",
        timestamp_micros(col("us")).cast("timestamp_ntz"))
      // a tz-adjusted micros timestamp (a plausible future drift)
      case "ts_ltz" => base.withColumn("ts", timestamp_micros(col("us")))
    }
    df.select("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def readBatch(dir: String): Set[(Long, String)] =
    Tables.events(spark, dir)
      .select(col("event_id"), col("ts").cast("string"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet

  test("batch adapter yields identical correctly-dated values for every shipped encoding") {
    val expected = Set(
      (0L, "2024-01-01 00:00:00"),
      (1L, "2024-01-01 01:00:00.123456"),
      (2L, "2024-01-30 23:00:00"),
      (3L, "2024-01-01 00:00:00"))
    for (enc <- Seq("nanos_long", "ts_ntz", "ts_ltz")) {
      val got = readBatch(writeEncoding(enc))
      assert(got == expected, s"encoding $enc mis-decoded: $got")
      assert(Tables.events(spark, writeEncoding(enc)).schema("ts").dataType ==
        org.apache.spark.sql.types.TimestampType,
        s"encoding $enc did not normalize to TimestampType")
    }
  }

  test("streaming adapter matches batch for every shipped encoding") {
    for (enc <- Seq("nanos_long", "ts_ntz", "ts_ltz")) {
      val dir = writeEncoding(enc)
      val streamed = EventsStreaming.runToCompletion(
        EventsStreaming.readEventsDir(spark, s"$dir/events.parquet"),
        s"drift_$enc")
        .select(col("event_id"), col("ts").cast("string"))
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(streamed == readBatch(dir), s"stream/batch drift under $enc")
    }
  }

  test("real fixture decodes into its documented year range on both paths") {
    val batchYears = Tables.events(spark, sf)
      .agg(min(year(col("ts"))), max(year(col("ts")))).head
    assert(batchYears.getInt(0) >= 2000 && batchYears.getInt(1) <= 2100,
      s"fixture batch read outside sane range: $batchYears")
    // streaming setup runs assertSaneEventTime — must not throw
    EventsStreaming.readEvents(spark, sf)
  }

  test("a unit-drifted encoding fails loudly at stream setup, never silently") {
    // micros stored as a raw long: the Long branch must treat it as nanos
    // → 1970 → the sanity guard refuses to stream
    val dir = Files.createTempDirectory("graft_drift_bad").toString
    rows(spark).withColumn("ts", col("us"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val ex = intercept[IllegalArgumentException] {
      EventsStreaming.readEventsDir(spark, s"$dir/events.parquet")
    }
    assert(ex.getMessage.contains("encoding has drifted"))
  }

  test("real fixture's post-adapter events schema matches the column contract") {
    // the 61-query blast radius of r9 came from ONE column's encoding;
    // pin every column the registry depends on so any future fixture
    // drift fails here, in one obvious place, not as scattered failures
    import org.apache.spark.sql.types._
    val sch = Tables.events(spark, sf).schema
    val contract = Map[String, DataType](
      "event_id" -> LongType, "ts" -> TimestampType, "user_id" -> LongType,
      "event_type" -> StringType, "value" -> DoubleType, "props" -> StringType)
    contract.foreach { case (name, t) =>
      assert(sch.fieldNames.contains(name), s"events lost column $name")
      assert(sch(name).dataType == t,
        s"events.$name drifted to ${sch(name).dataType}, contract expects $t")
    }
  }

  test("an unknown ts dtype fails loudly in the batch adapter") {
    val dir = Files.createTempDirectory("graft_drift_str").toString
    rows(spark).withColumn("ts", lit("2024-01-01"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val ex = intercept[IllegalStateException] { Tables.events(spark, dir) }
    assert(ex.getMessage.contains("unsupported type"))
  }
}
