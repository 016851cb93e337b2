package graft.sources

import java.time.{Instant, ZoneOffset}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.warehouse.Ingest

/** Source/sink surface beyond plain parquet scans (SURVEY.md §2.1).
  *
  * The reference's REST ingestion (S7 current weather, S8 timemachine
  * backfill, S10 forecast feed) is driver-side fetching of tiny payloads —
  * the right shape at any scale, since one observation/hour is not
  * distributed work. The HTTP client is pluggable (`WeatherApi`) so the
  * zero-egress build runs on `SyntheticWeatherApi` (deterministic, derived
  * from the reference's estimate tables); a production deployment swaps in
  * a real client without touching pipeline code.
  */
object Sources {

  /** One weather observation as fetched from the API (S7 row shape,
    * weather_realtime_etl.py:107-134 — parsed fields + verbatim payload).
    */
  final case class WeatherRow(observedAt: Instant, city: String, tempF: Double,
      weatherDesc: String, humidityPct: Long, rawJson: String)

  /** Pluggable API boundary (current + historical + forecast endpoints). */
  trait WeatherApi {
    def current(city: String, at: Instant): WeatherRow
    def timemachine(city: String, hour: Instant): WeatherRow
    def forecastHourly(city: String, from: Instant, hours: Int): Seq[WeatherRow]
  }

  /** Deterministic offline implementation — the reference's own fallback
    * strategy (S9, weather_historical_backfill.py:249-310) promoted to a
    * full client: seasonal monthly means + diurnal adjustment, fixed
    * description vocabulary keyed by hash of (city, hour).
    */
  final class SyntheticWeatherApi extends WeatherApi {
    private val descs = Vector("clear sky", "few clouds", "scattered clouds",
      "light rain", "overcast", "partly cloudy")

    private def gen(city: String, at: Instant): WeatherRow = {
      val utc = at.atZone(ZoneOffset.UTC)
      val month = utc.getMonthValue
      val hour = utc.getHour
      val monthly = Vector(39.0, 42.0, 50.0, 60.0, 71.0, 79.0,
        85.0, 83.0, 76.0, 65.0, 54.0, 44.0)
      val temp = monthly(month - 1) + 7.0 * math.sin((hour - 9) * math.Pi / 12)
      val h = math.abs((city + at.getEpochSecond / 3600).hashCode)
      val desc = descs(h % descs.length)
      val humidity = 40L + h % 50
      val json = f"""{"name":"$city","main":{"temp":$temp%.1f,"humidity":$humidity},""" +
        s""""weather":[{"description":"$desc"}]}"""
      WeatherRow(at, city, math.rint(temp * 10) / 10, desc, humidity, json)
    }

    override def current(city: String, at: Instant): WeatherRow = gen(city, at)
    override def timemachine(city: String, hour: Instant): WeatherRow = gen(city, hour)
    override def forecastHourly(city: String, from: Instant, hours: Int): Seq[WeatherRow] =
      (0 until hours).map(i => gen(city, from.plusSeconds(i * 3600L)))
  }

  /** Production HTTP client (S7/S8/S10) over `java.net.http` — the same
    * three endpoints the reference calls:
    *   - current:     GET {currentUrl}?q={city}&appid=…&units=imperial
    *     (weather_realtime_etl.py:107-117; parse name / main.temp /
    *     main.humidity / weather[0].description, keep the raw payload)
    *   - timemachine: GET {timemachineUrl}?lat&lon&dt&appid&units=imperial
    *     (weather_historical_backfill.py:55-67; One Call 3.0 shape —
    *     fields under data[0], with a 2.5-style `main` fallback exactly as
    *     the reference parses at weather_historical_backfill.py:205-213)
    *   - forecast:    GET {forecastUrl}?latitude&longitude&hourly=…
    *     (weather_future_realtime.py:16-23; columnar hourly arrays)
    *
    * Bounded retry with linear backoff on 429/5xx (the reference's
    * rate-limit handling, weather_historical_backfill.py:74-76). Base URLs
    * are injectable so specs drive the client against an in-process stub
    * server; offline builds keep using [[SyntheticWeatherApi]].
    */
  final class HttpWeatherApi(
      apiKey: String,
      currentUrl: String = "https://api.openweathermap.org/data/2.5/weather",
      timemachineUrl: String = "https://api.openweathermap.org/data/3.0/onecall/timemachine",
      forecastUrl: String = "https://api.open-meteo.com/v1/forecast",
      lat: Double = 40.7128,
      lon: Double = -74.0060,
      timeoutSeconds: Long = 30,
      maxRetries: Int = 3,
      retryBackoffMs: Long = 1000L) extends WeatherApi {

    private val http = java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofSeconds(timeoutSeconds))
      .build()
    private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

    private def get(url: String): String = {
      val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
        .timeout(java.time.Duration.ofSeconds(timeoutSeconds))
        .GET().build()
      var attempt = 0
      while (true) {
        val resp = http.send(req,
          java.net.http.HttpResponse.BodyHandlers.ofString())
        val code = resp.statusCode()
        if (code / 100 == 2) return resp.body()
        val retryable = code == 429 || code / 100 == 5
        if (!retryable || attempt >= maxRetries)
          throw new java.io.IOException(s"HTTP $code from $url")
        attempt += 1
        Thread.sleep(retryBackoffMs * attempt)
      }
      throw new IllegalStateException("unreachable")
    }

    private def enc(s: String) =
      java.net.URLEncoder.encode(s, java.nio.charset.StandardCharsets.UTF_8)

    override def current(city: String, at: Instant): WeatherRow = {
      val body = get(s"$currentUrl?q=${enc(city)}&appid=${enc(apiKey)}&units=imperial")
      val root = mapper.readTree(body)
      WeatherRow(
        observedAt = at, // scheduled/logical time, never wall clock (T2)
        city = if (root.hasNonNull("name")) root.get("name").asText else city,
        tempF = root.path("main").path("temp").asDouble,
        weatherDesc = root.path("weather").path(0).path("description").asText("unknown"),
        humidityPct = root.path("main").path("humidity").asLong,
        rawJson = body)
    }

    override def timemachine(city: String, hour: Instant): WeatherRow = {
      val body = get(s"$timemachineUrl?lat=$lat&lon=$lon&dt=${hour.getEpochSecond}" +
        s"&appid=${enc(apiKey)}&units=imperial")
      val root = mapper.readTree(body)
      // One Call 3.0: fields under data[0]; 2.5-style fallback under main
      val w = if (root.has("data")) root.path("data").path(0) else root
      val temp = if (w.hasNonNull("temp")) w.get("temp").asDouble
                 else w.path("main").path("temp").asDouble
      val hum = if (w.hasNonNull("humidity")) w.get("humidity").asLong
                else w.path("main").path("humidity").asLong
      WeatherRow(hour, city, temp,
        w.path("weather").path(0).path("description").asText("unknown"),
        hum, body)
    }

    override def forecastHourly(city: String, from: Instant, hours: Int): Seq[WeatherRow] = {
      val days = math.max(1, (hours + 23) / 24)
      val body = get(s"$forecastUrl?latitude=$lat&longitude=$lon" +
        "&hourly=temperature_2m,relativehumidity_2m,precipitation" +
        s"&forecast_days=$days&temperature_unit=fahrenheit&timezone=UTC")
      val hourly = mapper.readTree(body).path("hourly")
      val times = hourly.path("time")
      val temps = hourly.path("temperature_2m")
      val hums = hourly.path("relativehumidity_2m")
      val precs = hourly.path("precipitation")
      (0 until math.min(hours, times.size)).map { i =>
        val t = java.time.LocalDateTime.parse(times.get(i).asText)
          .toInstant(ZoneOffset.UTC)
        val desc = if (precs.path(i).asDouble(0.0) > 0) "precipitation" else "dry"
        WeatherRow(t, city, temps.path(i).asDouble, desc,
          hums.path(i).asLong, body)
      }
    }
  }

  /** S7/S13: one observation per run → 1-row DataFrame, append-shaped.
    * `observedAt` is the scheduled event time, never wall clock (T2).
    */
  def fetchCurrentWeather(spark: SparkSession, api: WeatherApi,
      city: String, at: Instant): DataFrame =
    toDf(spark, Seq(api.current(city, at)))

  /** S8/J4: backfill the missing hours found by the anti-join — driver
    * loop over the (small) gap list, one API row per missing hour.
    */
  def backfillMissingHours(spark: SparkSession, api: WeatherApi, city: String,
      missingHours: Seq[Instant]): DataFrame =
    toDf(spark, missingHours.map(h => api.timemachine(city, h)))

  /** S10/A13: 7-day hourly forecast feed. */
  def fetchForecast(spark: SparkSession, api: WeatherApi, city: String,
      from: Instant, hours: Int = 168): DataFrame =
    toDf(spark, api.forecastHourly(city, from, hours))

  private def toDf(spark: SparkSession, rows: Seq[WeatherRow]): DataFrame = {
    import spark.implicits._
    rows.map(r => (java.sql.Timestamp.from(r.observedAt), r.city, r.tempF,
        r.weatherDesc, r.humidityPct, r.rawJson,
        java.sql.Timestamp.from(r.observedAt)))
      .toDF("observed_at", "city", "temp_f", "weather_desc", "humidity_pct",
        "raw_json", "load_ts")
  }

  /** S1/S2 (offline analog): probe for the newest available monthly file —
    * the reference HEAD-requests `yellow_tripdata_{YYYY-MM}.parquet` from
    * the current month backwards (etl_spark_historical.py:113-143); the
    * zero-egress equivalent enumerates a local directory and picks the
    * lexicographically-newest month. No download step: Spark reads the
    * file in place (S3 subsumes S2).
    */
  def latestMonthlyFile(dir: String, prefix: String = "yellow_tripdata_",
      suffix: String = ".parquet"): Option[String] = {
    val d = new java.io.File(dir)
    Option(d.listFiles()).toSeq.flatten
      .map(_.getName)
      .filter(n => n.startsWith(prefix) && n.endsWith(suffix))
      .sorted(Ordering[String].reverse)
      .headOption
      .map(n => s"$dir/$n")
  }

  /** S11: CSV dimension scan (zone lookup) — header + explicit null token. */
  def readZoneLookupCsv(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("header", "true")
      .option("nullValue", "")
      .option("mode", "FAILFAST") // S6's ON_ERROR='ABORT_STATEMENT'
      .csv(path)
      .select(col("LocationID").cast("long").as("LocationID"),
        col("Borough"), col("Zone"), col("service_zone"))

  /** S4: CSV export surface. Single-file only for small exports (the
    * reference's coalesce(1) is an anti-pattern at scale — default keeps
    * parallel part files).
    */
  def exportCsv(df: DataFrame, dir: String, singleFile: Boolean = false): Unit = {
    val out = if (singleFile) df.coalesce(1) else df
    out.write.mode("overwrite").option("header", "true").csv(dir)
  }

  /** S19/S20: view vs table materialization — staging layers register as
    * (lazy) temp views; marts persist via the Runner's materializePath.
    */
  def registerViews(views: Map[String, DataFrame]): Unit =
    views.foreach { case (name, df) => df.createOrReplaceTempView(name) }

  /** JSONL shard export — the standard training-corpus deliverable: docs
    * packed into fixed-token-budget shards (`Packing.packShards`, exact
    * integer math) and written as line-delimited JSON under
    * `shard_id=N/` directories. `repartition(shard_id)` co-locates each
    * shard so a shard is one writer task's files, and rows within a
    * shard are written in `orderCol` order (training order is part of
    * the artifact). Returns the shard manifest (doc count, token total,
    * id span per shard) — what a downstream loader consumes.
    */
  def exportJsonlShards(docs: DataFrame, tokenCol: String, orderCol: String,
      tokenBudget: Long, dir: String): DataFrame = {
    val packed = graft.operators.Packing.packShards(
      docs, tokenCol, orderCol, tokenBudget)
    packed
      .repartition(col("shard_id"))
      .sortWithinPartitions(col("shard_id"), col(orderCol))
      .write.mode("overwrite").partitionBy("shard_id").json(dir)
    // manifest from the WRITTEN output, not the packing plan: re-running
    // the two-phase prefix sum just for the census would recompute the
    // export's most expensive step, and reading back also makes the
    // manifest describe what actually landed
    graft.operators.Packing.shardManifest(
      docs.sparkSession.read.json(dir)
        // partition-column type inference narrows shard_id to int; pin
        // the manifest schema to packShards' long
        .withColumn("shard_id", col("shard_id").cast("long")),
      tokenCol, orderCol)
  }
}
