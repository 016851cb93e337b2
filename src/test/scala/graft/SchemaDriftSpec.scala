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

  test("a unit-drifted encoding fails loudly in the BATCH adapter too") {
    // micros stored as a raw long decode as nanos → 1970; before r11 only
    // the streaming path guarded this — a batch read silently dated every
    // event to 1970 (the r9 class). Batch and streaming now share the
    // same loud-failure guard.
    val dir = Files.createTempDirectory("graft_drift_bad_batch").toString
    rows(spark).withColumn("ts", col("us"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val ex = intercept[IllegalArgumentException] { Tables.events(spark, dir) }
    assert(ex.getMessage.contains("encoding has drifted"))
  }

  test("the sanity guard reads footer statistics, not the data (zero Spark jobs)") {
    // a setup-time full scan of the landed history is itself a scale bug:
    // on a stats-bearing file the guard must resolve from the parquet
    // footer alone. Sentinel-job technique: listener events are ordered,
    // so once the sentinel job's event arrives, any job the guard had
    // launched would already have been counted.
    val dir = writeEncoding("ts_ntz")
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(l)
    try {
      // drain in-flight events (the fixture write, earlier tests): a new
      // listener still receives events queued before registration
      var prev = -1
      while (jobs.get() != prev) { prev = jobs.get(); Thread.sleep(250) }
      val base = jobs.get()
      Tables.assertSaneEventTime(spark, s"$dir/events.parquet")
      // RDD sentinel: exactly ONE job (a SQL count under AQE runs ≥2)
      spark.sparkContext.parallelize(Seq(1)).count()
      val deadline = System.nanoTime() + 10000000000L
      while (jobs.get() < base + 1 && System.nanoTime() < deadline)
        Thread.sleep(20)
      assert(jobs.get() == base + 1,
        s"guard ran ${jobs.get() - base - 1} Spark job(s) on a stats-bearing file")
    } finally spark.sparkContext.removeSparkListener(l)
  }

  test("empty-dir fallback IS the declared contract (one definition, no drift)") {
    // the streaming fallback used to carry its own StructType copy next
    // to everything Tables knows — two declarations drift. Pin: the
    // empty-dir stream's schema is exactly Tables.eventsContractSchema
    // modulo the ts normalization every events path applies (NTZ → TS).
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("graft_contract_stream").toString
    val stream = EventsStreaming.readEventsDir(spark, dir)
    val normalizedContract = StructType(Tables.eventsContractSchema.map {
      case f if f.name == "ts" => f.copy(dataType = TimestampType)
      case f => f
    })
    assert(stream.schema.map(f => (f.name, f.dataType)) ==
      normalizedContract.map(f => (f.name, f.dataType)))
  }

  test("stream setup over an EMPTY directory falls back to the contract schema") {
    // production shape: the stream is set up before the first file lands;
    // schema inference has nothing to read, so the reader assumes the
    // current fixture contract and still normalizes ts on arrival
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("graft_empty_stream").toString
    val stream = EventsStreaming.readEventsDir(spark, dir)
    assert(stream.isStreaming)
    assert(stream.schema("ts").dataType == TimestampType)
    assert(Set("event_id", "ts", "user_id", "event_type", "value", "props")
      .subsetOf(stream.schema.fieldNames.toSet))
    // first file lands AFTER setup — rows flow through the same normalize
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName("late_first_file").start()
    rows(spark).withColumn("ts",
        timestamp_micros(col("us")).cast("timestamp_ntz"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("append").parquet(dir)
    q.processAllAvailable(); q.stop()
    val got = spark.table("late_first_file")
      .select(col("event_id"), col("ts").cast("string"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set(
      (0L, "2024-01-01 00:00:00"),
      (1L, "2024-01-01 01:00:00.123456"),
      (2L, "2024-01-30 23:00:00"),
      (3L, "2024-01-01 00:00:00")))
  }

  test("unit drift arriving AFTER empty-dir setup still fails the stream loudly") {
    // the footer guard runs at setup; a stream set up over an empty dir
    // never re-runs it, so the deferred per-row year check must catch
    // value-level drift in files that land later (seconds-scale values
    // inside a schema-compatible micros column → 1970)
    val dir = Files.createTempDirectory("graft_empty_drift").toString
    val q = EventsStreaming.readEventsDir(spark, dir)
      .writeStream.outputMode("append")
      .format("memory").queryName("late_drift").start()
    rows(spark).withColumn("ts",
        timestamp_micros((col("us") / 1000000L).cast("long")).cast("timestamp_ntz"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("append").parquet(dir)
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.processAllAvailable()
    }
    q.stop()
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("drifted")),
      s"expected the drift guard, got: ${messages(ex).mkString(" | ")}")
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
