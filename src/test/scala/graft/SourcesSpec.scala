package graft

import java.time.Instant
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Sources

class SourcesSpec extends AnyFunSuite {
  import SparkTest._

  val api = new Sources.SyntheticWeatherApi

  test("current-weather fetch yields one append-shaped row with verbatim JSON") {
    val at = Instant.parse("2024-07-15T15:00:00Z")
    val df = Sources.fetchCurrentWeather(spark, api, "New York", at)
    assert(df.count() == 1)
    val r = df.head
    assert(r.getAs[String]("city") == "New York")
    val json = r.getAs[String]("raw_json")
    // payload is queryable (F9 path)
    val desc = df.select(get_json_object(col("raw_json"),
      "$.weather[0].description")).head.getString(0)
    assert(desc == r.getAs[String]("weather_desc"))
    assert(json.contains("\"name\":\"New York\""))
  }

  test("backfill fills exactly the missing hours, deterministically") {
    val hours = Seq("2024-01-01T05:00:00Z", "2024-01-01T09:00:00Z")
      .map(Instant.parse)
    val a = Sources.backfillMissingHours(spark, api, "New York", hours)
    val b = Sources.backfillMissingHours(spark, api, "New York", hours)
    assert(a.count() == 2)
    assert(a.collect().map(_.toString).sorted.sameElements(
      b.collect().map(_.toString).sorted))
  }

  test("forecast feed: 7 days hourly, daily roll-up has 7-8 days") {
    val df = Sources.fetchForecast(spark, api, "New York",
      Instant.parse("2024-03-01T00:00:00Z"))
    assert(df.count() == 168)
    val days = df.select(col("observed_at").cast("date")).distinct().count()
    assert(days == 7)
    // July afternoons warmer than January mornings (seasonal signal)
    val jul = api.forecastHourly("New York", Instant.parse("2024-07-01T15:00:00Z"), 1).head
    val jan = api.forecastHourly("New York", Instant.parse("2024-01-01T05:00:00Z"), 1).head
    assert(jul.tempF > jan.tempF)
  }

  test("CSV round trip: export then zone-lookup scan") {
    import spark.implicits._
    val zones = Seq((1L, "Manhattan", "Midtown", "Yellow Zone"),
      (2L, "Queens", "Astoria", "Boro Zone"))
      .toDF("LocationID", "Borough", "Zone", "service_zone")
    val dir = java.nio.file.Files.createTempDirectory("graft_csv").toString + "/zones"
    Sources.exportCsv(zones, dir, singleFile = true)
    val back = Sources.readZoneLookupCsv(spark, dir)
    assert(back.collect().map(_.getAs[Long]("LocationID")).sorted.toSeq == Seq(1L, 2L))
    assert(back.schema("LocationID").dataType.typeName == "long")
  }

  test("end-to-end backfill: anti-join gap detection → API fill → gaps closed") {
    import spark.implicits._
    import org.apache.spark.sql.functions.date_trunc
    // trips across 5 hours; weather only for 2 of them
    val tripHours = Seq("2024-01-01 08:00:00", "2024-01-01 09:00:00",
      "2024-01-01 10:00:00", "2024-01-01 11:00:00", "2024-01-01 12:00:00")
      .map(java.sql.Timestamp.valueOf).toDF("hour_ts")
    val weather = Sources.backfillMissingHours(spark, api, "New York",
      Seq("2024-01-01T08:00:00Z", "2024-01-01T11:00:00Z").map(Instant.parse))
    // J4: anti-join finds exactly the 3 uncovered hours
    val weatherHours = weather
      .select(date_trunc("hour", col("observed_at")).as("hour_ts")).distinct()
    val missing = tripHours.join(weatherHours, Seq("hour_ts"), "left_anti")
    val missingList = missing.collect().map(_.getTimestamp(0)).sorted
    assert(missingList.length == 3)
    // fill from the API and re-check: zero gaps
    val filled = Sources.backfillMissingHours(spark, api, "New York",
      missingList.map(t => Instant.ofEpochMilli(t.getTime)).toIndexedSeq)
    val allWeather = weather.unionByName(filled)
    val remaining = tripHours.join(
      allWeather.select(date_trunc("hour", col("observed_at")).as("hour_ts")).distinct(),
      Seq("hour_ts"), "left_anti")
    assert(remaining.isEmpty)
  }

  test("HttpWeatherApi drives all three endpoints against an in-process stub server") {
    import com.sun.net.httpserver.{HttpExchange, HttpServer}
    val server = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    val rateLimited = new java.util.concurrent.atomic.AtomicBoolean(true)
    def reply(ex: HttpExchange, code: Int, body: String): Unit = {
      val bytes = body.getBytes("UTF-8")
      ex.sendResponseHeaders(code, bytes.length)
      ex.getResponseBody.write(bytes); ex.close()
    }
    server.createContext("/current", (ex: HttpExchange) => {
      assert(ex.getRequestURI.getQuery.contains("q=New+York"))
      assert(ex.getRequestURI.getQuery.contains("units=imperial"))
      reply(ex, 200,
        """{"name":"New York","main":{"temp":71.5,"humidity":62},""" +
          """"weather":[{"description":"broken clouds"}]}""")
    })
    server.createContext("/timemachine", (ex: HttpExchange) => {
      // first call rate-limits → client must retry with backoff
      if (rateLimited.getAndSet(false)) reply(ex, 429, "slow down")
      else {
        assert(ex.getRequestURI.getQuery.contains("dt=1704103200"))
        reply(ex, 200,
          """{"data":[{"dt":1704103200,"temp":39.2,"humidity":55,""" +
            """"weather":[{"description":"light snow"}]}]}""")
      }
    })
    server.createContext("/forecast", (ex: HttpExchange) => {
      assert(ex.getRequestURI.getQuery.contains("temperature_unit=fahrenheit"))
      reply(ex, 200,
        """{"hourly":{"time":["2024-03-01T00:00","2024-03-01T01:00","2024-03-01T02:00"],""" +
          """"temperature_2m":[41.0,40.5,40.1],"relativehumidity_2m":[70,71,72],""" +
          """"precipitation":[0.0,0.2,0.0]}}""")
    })
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      val http = new Sources.HttpWeatherApi(
        apiKey = "test-key",
        currentUrl = s"$base/current",
        timemachineUrl = s"$base/timemachine",
        forecastUrl = s"$base/forecast",
        retryBackoffMs = 10L)

      val cur = http.current("New York", Instant.parse("2024-07-15T15:00:00Z"))
      assert(cur.city == "New York" && cur.tempF == 71.5 &&
        cur.humidityPct == 62 && cur.weatherDesc == "broken clouds")
      assert(cur.rawJson.contains("\"name\":\"New York\"")) // verbatim payload

      val tm = http.timemachine("New York", Instant.ofEpochSecond(1704103200L))
      assert(tm.tempF == 39.2 && tm.humidityPct == 55 &&
        tm.weatherDesc == "light snow")
      assert(!rateLimited.get, "client must have retried past the 429")

      val fc = http.forecastHourly("New York",
        Instant.parse("2024-03-01T00:00:00Z"), hours = 2)
      assert(fc.length == 2)
      assert(fc.head.tempF == 41.0 && fc.head.weatherDesc == "dry")
      assert(fc(1).weatherDesc == "precipitation")
      assert(fc.head.observedAt == Instant.parse("2024-03-01T00:00:00Z"))

      // the DataFrame surface is client-agnostic: same pipeline code runs
      // on the HTTP client as on the synthetic one
      val df = Sources.fetchCurrentWeather(spark, http, "New York",
        Instant.parse("2024-07-15T15:00:00Z"))
      assert(df.count() == 1)
      assert(df.head.getAs[Double]("temp_f") == 71.5)
    } finally server.stop(0)
  }

  test("JSONL shard export: lossless round trip, budgeted shards, ordered within shard") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonl").toString + "/shards"
    val manifest = Sources.exportJsonlShards(docs, "n_tokens", "doc_id",
      tokenBudget = 2000L, dir = dir)
    val back = spark.read.json(dir)
    // lossless: every doc lands exactly once with its text intact
    assert(back.count() == docs.count())
    val origSum = docs.select(md5(col("text"))).collect().map(_.getString(0)).sorted
    val backSum = back.select(md5(col("text"))).collect().map(_.getString(0)).sorted
    assert(backSum.sameElements(origSum), "text must survive the JSON round trip")
    // partition layout: one shard_id=N directory per manifest row
    val shardDirs = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("shard_id=")).map(_.getName).toSet
    val manifestRows = manifest.collect()
    assert(shardDirs == manifestRows.map(r => s"shard_id=${r.getLong(0)}").toSet)
    // budget: every shard's token total is under budget + one max doc
    val maxDoc = docs.agg(max(col("n_tokens"))).head.getLong(0)
    manifestRows.foreach { r =>
      assert(r.getAs[Long]("n_tokens") <= 2000L + maxDoc,
        s"shard ${r.getLong(0)} overflows: ${r.getAs[Long]("n_tokens")}")
    }
  }

  test("registered views are queryable by name (S19)") {
    Sources.registerViews(Map("zone_view" ->
      Tables.customer(spark, sf).limit(5)))
    assert(spark.sql("SELECT count(*) FROM zone_view").head.getLong(0) == 5)
  }
}
