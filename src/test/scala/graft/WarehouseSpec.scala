package graft

import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.warehouse._

/** Deterministic domain fixtures per FIXTURES.md §A — cover each staging
  * filter branch (keep + drop) and anomaly boundary.
  */
object TaxiFixtures {
  import SparkTest.spark
  import spark.implicits._

  def ts(s: String): Timestamp = Timestamp.valueOf(s)

  // (pickup, dropoff, puZone, doZone, pax, dist, amount, load_ts)
  lazy val rawTrips: DataFrame = Seq(
    // clean rows across a full week (2024-01-07 is a Sunday)
    ("2024-01-07 08:00:00", "2024-01-07 08:30:00", 10L, 20L, 1L, 3.0, 15.5),
    ("2024-01-08 09:15:00", "2024-01-08 09:20:00", 10L, 20L, 2L, 1.2, 8.0),
    ("2024-01-09 18:00:00", "2024-01-09 19:00:00", 30L, 40L, 4L, 10.0, 42.0),
    ("2024-01-10 23:50:00", "2024-01-11 00:10:00", 30L, 20L, 1L, 5.0, 20.0),
    ("2024-01-11 07:00:00", "2024-01-11 07:00:30", 10L, 20L, 1L, 0.05, 3.0), // dur<1m + dist<0.1 anomalies
    ("2024-01-12 12:00:00", "2024-01-12 16:00:00", 50L, 60L, 7L, 150.0, 300.0), // dur>180 + dist>100 + pax>6
    ("2024-01-13 10:00:00", "2024-01-13 10:45:00", 10L, 20L, 0L, 4.0, 18.0), // pax=0 anomaly
    // staging-filter violations (dropped):
    ("2024-01-09 10:00:00", "2024-01-09 09:00:00", 10L, 20L, 1L, 2.0, 10.0), // dropoff <= pickup
    ("2024-01-09 11:00:00", "2024-01-09 11:30:00", 10L, 20L, 1L, 0.0, 10.0), // dist 0
    ("2024-01-09 12:00:00", "2024-01-09 12:30:00", 10L, 20L, 1L, 2.0, -5.0)  // amount < 0
  ).map { case (p, d, pu, dd, pax, dist, amt) =>
    (ts(p), ts(d), pu, dd, pax, dist, amt, ts("2024-01-14 00:00:00"))
  }.toDF("pickup_datetime", "dropoff_datetime", "pickup_zone_id",
    "dropoff_zone_id", "passenger_count", "trip_distance", "total_amount",
    "load_ts")
    // null-key rows (dropped by staging)
    .unionByName(Seq(
      (null.asInstanceOf[Timestamp], ts("2024-01-09 09:00:00"), 10L, 20L, 1L, 2.0, 10.0, ts("2024-01-14 00:00:00"))
    ).toDF("pickup_datetime", "dropoff_datetime", "pickup_zone_id",
      "dropoff_zone_id", "passenger_count", "trip_distance", "total_amount", "load_ts"))

  // weather: 3 obs in one hour (max_by target), several cities, out-of-range temp
  lazy val rawWeather: DataFrame = Seq(
    ("2024-01-07 08:05:00", "New York", 30.0, "clear sky", 60L),
    ("2024-01-07 08:25:00", "New York", 32.0, "light rain", 65L),
    ("2024-01-07 08:55:00", "New York", 34.0, "overcast", 70L), // latest in hour
    ("2024-01-08 09:10:00", "new york city", 28.0, "snow", 80L),
    ("2024-01-09 18:30:00", "New York", 40.0, "clear sky", 50L),
    ("2024-01-09 18:45:00", "Boston", 20.0, "blizzard", 90L), // filtered by city LIKE
    ("2024-01-12 12:30:00", "New York", 55.0, "partly cloudy", 60L)
  ).map { case (t, c, f, d, h) =>
    (ts(t), c, f, d, h, s"""{"main":{"temp":$f,"humidity":$h}}""", ts(t))
  }.toDF("observed_at", "city", "temp_f", "weather_desc", "humidity_pct",
    "raw_json", "load_ts")

  lazy val zones: DataFrame = Seq(
    (10L, "Manhattan", "Midtown", "Yellow Zone"),
    (20L, "Manhattan", "SoHo", "Yellow Zone"),
    (30L, "Queens", "Astoria", "Boro Zone"),
    (40L, "Brooklyn", "Williamsburg", "Boro Zone")
    // 50/60 intentionally missing → left-join null path
  ).toDF("LocationID", "Borough", "Zone", "service_zone")
}

class WarehouseSpec extends AnyFunSuite {
  import SparkTest.spark
  import TaxiFixtures._

  lazy val stg = Staging.stgTaxiTrips(rawTrips)
  lazy val enriched = Enrich.intTripsEnriched(stg)
  lazy val weatherHourly = Enrich.intWeatherHourly(Staging.stgWeather(rawWeather))

  test("staging drops exactly the violating rows") {
    assert(stg.count() == 7)
    assert(rawTrips.count() == 11)
  }

  test("enrichment: Snowflake duration/dow semantics and anomaly flags") {
    val r = enriched.filter(col("pickup_datetime") === lit(ts("2024-01-07 08:00:00"))).head()
    assert(r.getAs[Long]("trip_duration_minutes") == 30)
    assert(r.getAs[Int]("day_of_week") == 0)       // Sunday → 0
    assert(r.getAs[String]("day_name") == "Sun")
    assert(r.getAs[Boolean]("is_weekend"))
    val anomalies = enriched.filter(col("is_duration_anomaly") ||
      col("is_distance_anomaly") || col("is_passenger_anomaly"))
    assert(anomalies.count() == 3)
  }

  test("int_weather_hourly: max_by picks latest description in the hour") {
    val r = weatherHourly
      .filter(col("observation_hour") === lit(ts("2024-01-07 08:00:00")) &&
        col("city") === "New York").head()
    assert(r.getAs[String]("weather_description") == "overcast")
    assert(r.getAs[Long]("observation_count") == 3)
    assert(math.abs(r.getAs[Double]("avg_temp_f") - 32.0) < 1e-9)
  }

  test("mart_trips_weather: hour grain unique, city-LIKE matches variants, Boston excluded") {
    val mart = Marts.martTripsWeather(enriched, weatherHourly).cache()
    assert(mart.count() == mart.select("hour_ts").distinct().count())
    // 09:15 trip matches 'new york city' via LIKE
    val m = mart.filter(col("hour_ts") === lit(ts("2024-01-08 09:00:00"))).head()
    assert(m.getAs[String]("weather_description") == "snow")
    // 18:00 trip must match NY row, not Boston's
    val e = mart.filter(col("hour_ts") === lit(ts("2024-01-09 18:00:00"))).head()
    assert(e.getAs[String]("weather_description") == "clear sky")
  }

  test("mart_daily_metrics: weekend counts and weather join") {
    val daily = Marts.martDailyMetrics(enriched, weatherHourly).cache()
    assert(daily.count() == daily.select("trip_date").distinct().count())
    val sun = daily.filter(col("trip_date") === lit(ts("2024-01-07 00:00:00"))).head()
    assert(sun.getAs[Long]("weekend_trip_count") == 1)
    assert(sun.getAs[Long]("weekday_trip_count") == 0)
    assert(math.abs(sun.getAs[Double]("avg_daily_temperature") - 32.0) < 1e-9)
    // day with trips but no NY weather → left-join null
    val thu = daily.filter(col("trip_date") === lit(ts("2024-01-11 00:00:00"))).head()
    assert(thu.isNullAt(thu.fieldIndex("avg_daily_temperature")))
  }

  test("zone demand joins the broadcast dim with null path for unknown zones") {
    val zd = Marts.zoneDemand(enriched, zones).cache()
    val known = zd.filter(col("pickup_zone_id") === 10L)
    assert(known.collect().forall(_.getAs[String]("Borough") == "Manhattan"))
    val unknown = zd.filter(col("pickup_zone_id") === 50L).head()
    assert(unknown.isNullAt(unknown.fieldIndex("Borough")))
  }

  test("merge-insert-only ingest is idempotent (re-run inserts 0)") {
    import SparkTest.spark.implicits._
    val fact = stg
    val inserts1 = Ingest.mergeInsertOnly(fact, stg)
    assert(inserts1.count() == 0)
    val newRow = Seq((ts("2024-02-01 10:00:00"), ts("2024-02-01 10:20:00"),
      10L, 20L, 1L, 2.5, 12.0, ts("2024-02-02 00:00:00")))
      .toDF("pickup_datetime", "dropoff_datetime", "pickup_zone_id",
        "dropoff_zone_id", "passenger_count", "trip_distance", "total_amount", "load_ts")
    val inserts2 = Ingest.mergeInsertOnly(fact, stg.unionByName(newRow))
    assert(inserts2.count() == 1)
  }

  test("synthetic weather estimate is deterministic and seasonal") {
    import SparkTest.spark.implicits._
    val got = Seq((1, 5), (7, 15), (7, 5)).toDF("m", "h")
      .select(Ingest.estimateTempF(col("m"), col("h"))).collect().map(_.getDouble(0))
    assert(got(1) > got(0))            // July afternoon warmer than Jan morning
    assert(got(1) > got(2))            // afternoon warmer than morning in July
  }
}
