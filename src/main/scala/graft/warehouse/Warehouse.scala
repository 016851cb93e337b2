package graft.warehouse

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.Fns

/** The reference's warehouse surface re-expressed as pure
  * DataFrame → DataFrame stages: a user of
  * aakashvardhan/nyc-taxi-data-warehouse can run the same layered
  * pipeline (staging views → intermediate views → mart tables) on Spark.
  *
  * Stages are unpersisted lineage ("views" — Catalyst inlines and
  * optimizes across them, README.md:194-196 of the reference); only marts
  * materialize. Every mart is keyed/partitioned by date or zone for the
  * 100 TB layout; no coalesce(1), no driver collects.
  */
object Schemas {
  /** RAW.NYC_TAXI_TRIPS (dags/etl_spark_historical.py:50-61). */
  val trips: StructType = StructType(Seq(
    StructField("pickup_datetime", TimestampType),
    StructField("dropoff_datetime", TimestampType),
    StructField("pickup_zone_id", LongType),
    StructField("dropoff_zone_id", LongType),
    StructField("passenger_count", LongType),
    StructField("trip_distance", DoubleType),
    StructField("total_amount", DoubleType),
    StructField("load_ts", TimestampType)))

  /** RAW.RAW_WEATHER (dags/weather_realtime_etl.py:54-66). */
  val weather: StructType = StructType(Seq(
    StructField("observed_at", TimestampType),
    StructField("city", StringType),
    StructField("temp_f", DoubleType),
    StructField("weather_desc", StringType),
    StructField("humidity_pct", LongType),
    StructField("raw_json", StringType),
    StructField("load_ts", TimestampType)))

  /** taxi_zone_lookup dimension (dags/zone_forecast.py:47-48). */
  val zones: StructType = StructType(Seq(
    StructField("LocationID", LongType),
    StructField("Borough", StringType),
    StructField("Zone", StringType),
    StructField("service_zone", StringType)))
}

object Staging {

  /** stg_taxi_trips (models/staging/stg_taxi_trips.sql:31-39): not-null
    * keys, positive distance/amount, dropoff strictly after pickup.
    */
  def stgTaxiTrips(raw: DataFrame): DataFrame =
    raw.na.drop(Seq("pickup_datetime", "dropoff_datetime",
        "pickup_zone_id", "dropoff_zone_id"))
      .filter(col("trip_distance") > 0 && col("total_amount") > 0 &&
        col("dropoff_datetime") > col("pickup_datetime"))

  /** stg_weather (models/staging/stg_weather.sql:12-34): renames + null
    * filter on observation time and temperature.
    */
  def stgWeather(raw: DataFrame): DataFrame =
    raw.filter(col("observed_at").isNotNull && col("temp_f").isNotNull)
      .select(
        col("observed_at"), col("city"),
        col("temp_f").as("temperature_fahrenheit"),
        col("weather_desc").as("weather_description"),
        col("humidity_pct").as("humidity_percent"),
        col("raw_json"), col("load_ts"))
}

object Enrich {

  /** int_trips_enriched (models/intermediate/int_trips_enriched.sql):
    * Snowflake-semantics duration, guarded speed, calendar derivations,
    * anomaly flags.
    */
  def intTripsEnriched(stg: DataFrame): DataFrame = {
    val dur = Fns.datediffMinutes(col("pickup_datetime"), col("dropoff_datetime"))
    stg
      .withColumn("trip_duration_minutes", dur)
      .withColumn("avg_speed_mph",
        Fns.guardedRate(col("trip_distance"), col("trip_duration_minutes")))
      .withColumn("pickup_hour", date_trunc("hour", col("pickup_datetime")))
      .withColumn("hour_of_day", hour(col("pickup_datetime")))
      .withColumn("day_of_week", Fns.dayOfWeekSnowflake(col("pickup_datetime")))
      .withColumn("day_name", Fns.dayNameAbbrev(col("pickup_datetime")))
      .withColumn("is_weekend", Fns.isWeekend(col("pickup_datetime")))
      .withColumn("is_duration_anomaly",
        col("trip_duration_minutes") < 1 || col("trip_duration_minutes") > 180)
      .withColumn("is_distance_anomaly",
        col("trip_distance") < 0.1 || col("trip_distance") > 100)
      .withColumn("is_passenger_anomaly",
        col("passenger_count").isNull || col("passenger_count") === 0 ||
          col("passenger_count") > 6)
  }

  /** int_weather_hourly (models/intermediate/int_weather_hourly.sql:12-35):
    * hourly roll-up with max_by for the latest description.
    */
  def intWeatherHourly(stg: DataFrame): DataFrame =
    stg.groupBy(date_trunc("hour", col("observed_at")).as("observation_hour"),
        col("city"))
      .agg(
        avg(col("temperature_fahrenheit")).as("avg_temp_f"),
        min(col("temperature_fahrenheit")).as("min_temp_f"),
        max(col("temperature_fahrenheit")).as("max_temp_f"),
        avg(col("humidity_percent")).as("avg_humidity_pct"),
        max_by(col("weather_description"), col("observed_at")).as("weather_description"),
        count(lit(1)).as("observation_count"),
        max(col("observed_at")).as("latest_observed_at"))
}

object Marts {

  /** mart_trips_weather (models/marts/mart_trips_weather.sql): hourly trip
    * metrics left-joined to hourly weather (equi + city-LIKE residual),
    * grouped with the functionally-dependent weather columns in the key —
    * preserved exactly as declared (grain uniqueness is load-bearing,
    * SURVEY.md §7.4). Weather side is hours×cities → broadcast.
    */
  def martTripsWeather(enriched: DataFrame, weatherHourly: DataFrame): DataFrame =
    enriched.join(broadcast(weatherHourly),
        weatherHourly("observation_hour") === enriched("pickup_hour") &&
          lower(weatherHourly("city")).like("%new york%"),
        "left")
      .groupBy(enriched("pickup_hour").as("hour_ts"),
        enriched("hour_of_day"), enriched("day_of_week"), enriched("day_name"),
        enriched("is_weekend"), weatherHourly("avg_temp_f"),
        weatherHourly("avg_humidity_pct"), weatherHourly("weather_description"))
      .agg(
        count(lit(1)).as("trip_count"),
        avg(col("trip_distance")).as("avg_trip_distance"),
        avg(col("total_amount")).as("avg_total_amount"),
        avg(col("trip_duration_minutes")).as("avg_duration_minutes"),
        avg(col("avg_speed_mph")).as("avg_speed_mph"))

  /** mart_daily_metrics (models/marts/mart_daily_metrics.sql): pre-agg
    * trips and weather *separately* to daily grain, then left-join on the
    * day — aggregate-then-join, the scale-correct shape.
    */
  def martDailyMetrics(enriched: DataFrame, weatherHourly: DataFrame): DataFrame = {
    val dailyTrips = enriched
      .groupBy(date_trunc("day", col("pickup_datetime")).as("trip_date"))
      .agg(
        count(lit(1)).as("trip_count"),
        sum(col("total_amount")).as("total_revenue"),
        avg(col("total_amount")).as("avg_fare"),
        avg(col("trip_distance")).as("avg_distance"),
        avg(col("trip_duration_minutes")).as("avg_duration_minutes"),
        avg(col("passenger_count")).as("avg_passengers"),
        sum(when(col("is_weekend"), 1L).otherwise(0L)).as("weekend_trip_count"),
        sum(when(col("is_weekend"), 0L).otherwise(1L)).as("weekday_trip_count"))
    val dailyWeather = weatherHourly
      .filter(col("city") === "New York")
      .groupBy(date_trunc("day", col("observation_hour")).as("weather_date"))
      .agg(
        avg(col("avg_temp_f")).as("avg_daily_temperature"),
        min(col("min_temp_f")).as("min_temperature"),
        max(col("max_temp_f")).as("max_temperature"),
        avg(col("avg_humidity_pct")).as("avg_daily_humidity"))
    dailyTrips.join(dailyWeather,
      dailyTrips("trip_date") === dailyWeather("weather_date"), "left")
      .drop("weather_date")
  }

  /** mart_zone_analysis (models/marts/mart_zone_analysis.sql): OD-matrix
    * aggregation with deterministic mode(hour) and HAVING ≥ 10.
    */
  def martZoneAnalysis(enriched: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = enriched.groupBy(col("pickup_zone_id"), col("dropoff_zone_id"))
      .agg(
        count(lit(1)).as("trip_count"),
        avg(col("trip_distance")).as("avg_distance"),
        avg(col("total_amount")).as("avg_amount"),
        avg(col("trip_duration_minutes")).as("avg_duration"),
        avg(col("passenger_count")).as("avg_passengers"),
        sum(when(col("is_weekend"), 1L).otherwise(0L)).as("weekend_trips"),
        sum(when(col("is_weekend"), 0L).otherwise(1L)).as("weekday_trips"))
      .filter(col("trip_count") >= 10)
    // peak hour: deterministic mode (count desc, hour asc) per zone pair
    val hourCounts = enriched.groupBy(col("pickup_zone_id"),
        col("dropoff_zone_id"), col("hour_of_day"))
      .agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(col("pickup_zone_id"), col("dropoff_zone_id"))
      .orderBy(col("c").desc, col("hour_of_day"))
    val peak = hourCounts.withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("pickup_zone_id"), col("dropoff_zone_id"),
        col("hour_of_day").as("peak_hour"))
    base.join(peak, Seq("pickup_zone_id", "dropoff_zone_id"), "left")
  }

  /** ZONE_DEMAND (dags/zone_forecast.py:37-85): daily per-zone demand with
    * a broadcast zone-dimension join.
    */
  def zoneDemand(enriched: DataFrame, zones: DataFrame): DataFrame =
    enriched
      .groupBy(col("pickup_zone_id"),
        date_trunc("day", col("pickup_datetime")).as("trip_date"))
      .agg(count(lit(1)).as("trip_count"),
        avg(col("trip_distance")).as("avg_distance"),
        avg(col("total_amount")).as("avg_fare"))
      .join(broadcast(zones),
        col("pickup_zone_id") === zones("LocationID"), "left")
      .select(col("pickup_zone_id"), col("trip_date"), col("trip_count"),
        col("avg_distance"), col("avg_fare"), col("Borough"), col("Zone"))
}

object Ingest {

  /** TLC ingest projection (dags/etl_spark_historical.py:182-195): select
    * 7 of ~19 columns, snake_case, casts, null-drop, positive filters,
    * configurable row cap.
    */
  def cleanTrips(raw: DataFrame, rowCap: Option[Int] = None): DataFrame = {
    val projected = raw.select(
      col("tpep_pickup_datetime").as("pickup_datetime"),
      col("tpep_dropoff_datetime").as("dropoff_datetime"),
      col("PULocationID").cast("long").as("pickup_zone_id"),
      col("DOLocationID").cast("long").as("dropoff_zone_id"),
      col("passenger_count").cast("long").as("passenger_count"),
      col("trip_distance").cast("double").as("trip_distance"),
      col("total_amount").cast("double").as("total_amount"))
      .na.drop(Seq("pickup_datetime", "dropoff_datetime",
        "pickup_zone_id", "dropoff_zone_id"))
      .filter(col("trip_distance") > 0 && col("total_amount") > 0)
    rowCap.fold(projected)(projected.limit)
  }

  /** Natural key of the trips MERGE (etl_spark_historical.py:353-358). */
  val tripKey: Seq[String] = Seq("pickup_datetime", "dropoff_datetime",
    "pickup_zone_id", "dropoff_zone_id", "trip_distance", "total_amount")

  /** MERGE-insert-only (J5): append only batch rows whose natural key is
    * absent from the fact — idempotent re-runs. At scale, restrict the
    * probe to the affected date partitions before the anti-join
    * (partition pruning), which `monthsTouched` enables.
    */
  def mergeInsertOnly(fact: DataFrame, batch: DataFrame): DataFrame = {
    val pruned = monthsTouched(batch) match {
      case Some((lo, hi)) =>
        fact.filter(col("pickup_datetime") >= lo && col("pickup_datetime") < hi)
      case None => fact
    }
    batch.join(pruned.select(tripKey.map(col): _*), tripKey, "left_anti")
  }

  private def monthsTouched(batch: DataFrame): Option[(Column, Column)] = {
    val r = batch.agg(min(col("pickup_datetime")), max(col("pickup_datetime"))).head
    if (r.isNullAt(0)) None
    else Some((
      date_trunc("month", lit(r.getTimestamp(0))),
      add_months(date_trunc("month", lit(r.getTimestamp(1))), 1)))
  }

  /** S9 synthetic-weather fallback: deterministic monthly-average +
    * hour-of-day adjustment (weather_historical_backfill.py:249-310's
    * estimate function as a pure Column expression).
    */
  def estimateTempF(month: Column, hourOfDay: Column): Column = {
    val monthly = Seq(39.0, 42.0, 50.0, 60.0, 71.0, 79.0,
      85.0, 83.0, 76.0, 65.0, 54.0, 44.0)
    val base = element_at(array(monthly.map(lit): _*), month.cast("int"))
    // diurnal swing: coolest 05:00, warmest 15:00, ±7°F
    base + lit(7.0) * sin((hourOfDay - 9) * math.Pi / 12)
  }

  /** Partitioned fact layout (the 100 TB discipline): facts are written
    * partitioned by event date so month-scoped merges and date-range
    * queries prune partitions.
    */
  def writePartitioned(df: DataFrame, path: String, dateCol: String,
      mode: String = "append"): Unit =
    df.withColumn("p_date", to_date(col(dateCol)))
      .write.mode(mode).partitionBy("p_date").parquet(path)
}
