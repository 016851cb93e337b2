package graft.warehouse

import org.apache.spark.sql.functions._
import graft.operators.Scd2

/** Example entrypoint: drives the reference pipeline (staging →
  * intermediates → marts with quality gates) and an SCD2 snapshot round
  * over inline sample data. `sbt "runMain graft.warehouse.Demo"`.
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(4, "graft-demo")
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)

    val rawTrips = Seq(
      (ts("2024-01-07 08:00:00"), ts("2024-01-07 08:30:00"), 10L, 20L, 1L, 3.0, 15.5, ts("2024-01-14 00:00:00")),
      (ts("2024-01-08 09:15:00"), ts("2024-01-08 09:20:00"), 10L, 20L, 2L, 1.2, 8.0, ts("2024-01-14 00:00:00")),
      (ts("2024-01-08 10:00:00"), ts("2024-01-08 09:00:00"), 10L, 20L, 1L, 2.0, 10.0, ts("2024-01-14 00:00:00")) // dropped: dropoff<pickup
    ).toDF("pickup_datetime", "dropoff_datetime", "pickup_zone_id",
      "dropoff_zone_id", "passenger_count", "trip_distance", "total_amount", "load_ts")
    val rawWeather = Seq(
      (ts("2024-01-07 08:05:00"), "New York", 30.0, "clear sky", 60L, "{}", ts("2024-01-07 08:05:00"))
    ).toDF("observed_at", "city", "temp_f", "weather_desc", "humidity_pct", "raw_json", "load_ts")
    val zones = Seq((10L, "Manhattan", "Midtown", "Yellow Zone"))
      .toDF("LocationID", "Borough", "Zone", "service_zone")

    val martDir = java.nio.file.Files.createTempDirectory("graft_demo_marts").toString
    val (built, results) = Runner.run(
      Map("raw_trips" -> rawTrips, "raw_weather" -> rawWeather, "zones" -> zones),
      Runner.referencePipeline(martDir))
    println("STAGES: " + results.map(r => s"${r.name}(rows=${r.rows.getOrElse(-1L)})").mkString(" -> "))
    built("mart_daily_metrics").show(10, truncate = false)

    val src = Seq(("NY", ts("2024-01-01 00:00:00"), 30.0)).toDF("city", "updated_at", "temp_f")
    val snap = Scd2.applyTimestamp(Scd2.emptySnapshot(src, "updated_at"), src,
      Seq("city"), "updated_at", lit(ts("2024-01-01 12:00:00")))
    val upd = Seq(("NY", ts("2024-01-02 00:00:00"), 35.0)).toDF("city", "updated_at", "temp_f")
    val snap2 = Scd2.applyTimestamp(snap, upd, Seq("city"), "updated_at",
      lit(ts("2024-01-02 12:00:00")))
    snap2.orderBy("valid_from").show(10, truncate = false)
    // incremental mart refresh: only the touched date partition is rewritten
    val events = graft.Tables.events(spark, "/root/testdata/sf0.001")
    val martPath = java.nio.file.Files.createTempDirectory("graft_demo_inc").toString + "/daily"
    def daily(f: org.apache.spark.sql.DataFrame) =
      f.groupBy(col("ts").cast("date").as("p_date"))
        .agg(count(lit(1)).as("n"))
    daily(events).write.mode("overwrite").partitionBy("p_date").parquet(martPath)
    val touched = Incremental.refresh(spark, events,
      events.filter(col("ts").cast("date") === "2024-01-02"), daily, "ts", martPath)
    println(s"INCREMENTAL_REFRESHED: ${touched.mkString(",")}")

    // streaming ingest with idempotent dedup: replaying the source inserts 0
    val factPath = java.nio.file.Files.createTempDirectory("graft_demo_stream").toString + "/events"
    val q1 = graft.streaming.EventsStreaming.appendWithDedup(
      graft.streaming.EventsStreaming.readEvents(spark, "/root/testdata/sf0.001"), factPath)
    q1.processAllAvailable(); q1.stop()
    val n1 = spark.read.parquet(factPath).count()
    val q2 = graft.streaming.EventsStreaming.appendWithDedup(
      graft.streaming.EventsStreaming.readEvents(spark, "/root/testdata/sf0.001"), factPath)
    q2.processAllAvailable(); q2.stop()
    val n2 = spark.read.parquet(factPath).count()
    println(s"STREAM_DEDUP: first=$n1 after_replay=$n2")

    println("DEMO_OK")
    spark.stop()
  }
}
