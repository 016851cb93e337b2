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
}
