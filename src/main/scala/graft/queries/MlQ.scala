package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Fns._
import graft.ml.Forecast

/** ML-chain query surface (SURVEY.md §2.10). The feature table is pure
  * relational semantics → oracle-checked; model outputs are
  * engine-specific (MLlib RF) → rows-only, with accuracy asserted in
  * MlSpec instead.
  */
object MlQ {

  /** The reconstructed FARE_DAILY_FEATURES table (M-chain input; W1-W3). */
  val mlFeatureTable = QueryDef(
    "ml_feature_table",
    Some("""WITH daily AS (
           |  SELECT CAST(ts AS DATE) AS trip_date,
           |         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(value) AS avg_fare_raw,
           |         count(*) * 1.0 AS trip_count,
           |         CAST(sum(CAST(abs(value) AS DECIMAL(18,2))) AS DOUBLE) / count(value) AS avg_distance_raw,
           |         CAST(sum(CASE WHEN dayofweek(ts) IN (0,6) THEN 1 ELSE 0 END) AS DOUBLE) AS weekend_trip_count,
           |         CAST(sum(CASE WHEN dayofweek(ts) IN (0,6) THEN 0 ELSE 1 END) AS DOUBLE) AS weekday_trip_count
           |  FROM events GROUP BY 1)
           |SELECT trip_date,
           |       avg_fare_raw AS avg_fare,
           |       trip_count,
           |       avg_distance_raw AS avg_distance,
           |       weekend_trip_count, weekday_trip_count,
           |       CAST(CASE WHEN dayofweek(trip_date) IN (0,6) THEN 1 ELSE 0 END AS DOUBLE) AS is_weekend,
           |       lag(avg_fare_raw, 1) OVER (ORDER BY trip_date) AS avg_fare_lag1,
           |       lag(avg_fare_raw, 7) OVER (ORDER BY trip_date) AS avg_fare_lag7,
           |       round(avg(avg_fare_raw) OVER (
           |         ORDER BY trip_date ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS avg_fare_ma7
           |FROM daily""".stripMargin),
    (spark, dir) => {
      val f = Forecast.buildDailyFeatures(Tables.events(spark, dir))
      f.select(col("trip_date"),
        col("avg_fare"),
        col("trip_count"),
        col("avg_distance"),
        col("weekend_trip_count"), col("weekday_trip_count"), col("is_weekend"),
        col("avg_fare_lag1"),
        col("avg_fare_lag7"),
        r4(col("avg_fare_ma7")).as("avg_fare_ma7"))
    })

  /** Train + recursive 7-day forecast (M3/M6/M7) — rows-only: the RF model
    * is MLlib-specific. Deterministic (seed 42, deterministic features).
    */
  val mlForecast = QueryDef(
    "ml_forecast",
    None,
    (spark, dir) => {
      val features = Forecast.buildDailyFeatures(Tables.events(spark, dir))
      val trained = Forecast.trainCached(dir, features)
      Forecast.recursiveForecast(spark, trained.model, features, horizon = 7)
        .select(col("forecast_date"), r4(col("predicted_avg_fare")).as("predicted_avg_fare"),
          col("model_version"))
    })

  /** Hindcast eval — per-day abs error + ALL summary row (M5/U1). */
  val mlEval = QueryDef(
    "ml_eval",
    None,
    (spark, dir) => {
      val features = Forecast.buildDailyFeatures(Tables.events(spark, dir))
      val trained = Forecast.trainCached(dir, features)
      Forecast.evaluate(trained.model, features, k = 7)
        .select(col("day"), r4(col("actual")).as("actual"),
          r4(col("predicted")).as("predicted"), r4(col("abs_err")).as("abs_err"),
          r4(col("mape")).as("mape"))
        .orderBy(col("day"))
    })

  val all: Seq[QueryDef] = Seq(mlFeatureTable, mlForecast, mlEval)
}
