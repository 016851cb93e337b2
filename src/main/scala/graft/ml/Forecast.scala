package graft.ml

import org.apache.spark.ml.evaluation.RegressionEvaluator
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.regression.{RandomForestRegressionModel, RandomForestRegressor}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Fns

/** The ML chain (SURVEY.md §2.10 M1-M7 + §2.6 W1-W3): daily feature table
  * with lag/moving-average columns → time-ordered split → MLlib
  * random-forest regression → recursive 7-day-ahead forecast → MAE/MAPE
  * hindcast evaluation.
  *
  * Reconstructs the reference's FARE_DAILY_FEATURES builder (its creating
  * SQL is absent from the repo; schema inferred from the consumer at
  * dags/fare_model_training_dag.py:27-43) and the training/forecast/eval
  * DAGs (fare_model_training_dag.py, fare_forecasting_dag.py,
  * Forecast_evaluation.py).
  *
  * Scale: features are O(days) rows after one aggregation pass over the
  * fact table — training data never exceeds driver-trivial size even at
  * 100 TB of events, because the grain is daily. The recursive rollout is
  * inherently sequential 7-row state-carrying logic and stays on the
  * driver (as in the reference).
  */
object Forecast {

  val featureCols: Seq[String] = Seq(
    "trip_count", "avg_distance", "weekend_trip_count", "weekday_trip_count",
    "is_weekend", "avg_fare_lag1", "avg_fare_lag7", "avg_fare_ma7")

  /** Daily feature table from the events fact (the FARE_DAILY_FEATURES
    * shape): per-day aggregates + calendar flags + lag1/lag7/ma7 windows.
    */
  def buildDailyFeatures(events: DataFrame): DataFrame = {
    val daily = events
      .groupBy(col("ts").cast("date").as("trip_date"))
      .agg(
        // deterministic means: exact decimal sums, one double division
        // (cross-engine/partition-order reproducible — see Fns.moneyAvg)
        graft.functions.Fns.moneyAvg(col("value")).as("avg_fare"),
        count(lit(1)).cast("double").as("trip_count"),
        graft.functions.Fns.moneyAvg(abs(col("value"))).as("avg_distance"),
        sum(when(Fns.isWeekend(col("ts")), 1L).otherwise(0L)).cast("double")
          .as("weekend_trip_count"),
        sum(when(Fns.isWeekend(col("ts")), 0L).otherwise(1L)).cast("double")
          .as("weekday_trip_count"))
      .withColumn("is_weekend", Fns.isWeekend(col("trip_date")).cast("double"))
    // unpartitioned on purpose: the frame is the daily census
    // (calendar-sized at any scale) — WindowExec's single-partition
    // warning is expected and harmless here and in this file's siblings
    val w = Window.orderBy(col("trip_date"))
    daily
      .withColumn("avg_fare_lag1", lag(col("avg_fare"), 1).over(w))
      .withColumn("avg_fare_lag7", lag(col("avg_fare"), 7).over(w))
      .withColumn("avg_fare_ma7",
        avg(col("avg_fare")).over(w.rowsBetween(-6, 0)))
  }

  final case class TrainResult(model: RandomForestRegressionModel,
      holdoutMae: Double, nTrain: Long, nTest: Long)

  /** Training is deterministic (seed 42, deterministic features), so one
    * model per fixture dir serves both the forecast and eval queries —
    * memoized to avoid re-training inside a single session.
    */
  private val trainCache =
    new java.util.concurrent.ConcurrentHashMap[String, TrainResult]()

  def trainCached(key: String, features: DataFrame): TrainResult =
    trainCache.computeIfAbsent(key, _ => train(features))

  /** M1-M3+M5: dropna → assemble → time-ordered 70/30 split → RF(200
    * trees, minInstancesPerNode=2, seed=42) → holdout MAE.
    */
  def train(features: DataFrame): TrainResult = {
    val clean = graft.ScopedCache.replace("forecast.clean",
      features.na.drop().orderBy("trip_date"))
    val n = clean.count()
    val cut = math.max(1L, (n * 0.7).toLong)
    val w = Window.orderBy(col("trip_date"))
    val indexed = clean.withColumn("rn", row_number().over(w))
    val train = indexed.filter(col("rn") <= cut)
    val test = indexed.filter(col("rn") > cut)

    val assembler = new VectorAssembler()
      .setInputCols(featureCols.toArray).setOutputCol("features")
    val rf = new RandomForestRegressor()
      .setLabelCol("avg_fare").setFeaturesCol("features")
      .setNumTrees(200).setMinInstancesPerNode(2).setSeed(42)
    val model = rf.fit(assembler.transform(train))

    val mae =
      if (test.isEmpty) Double.NaN
      else new RegressionEvaluator()
        .setLabelCol("avg_fare").setPredictionCol("prediction")
        .setMetricName("mae")
        .evaluate(model.transform(assembler.transform(test)))
    TrainResult(model, mae, cut, n - cut)
  }

  /** M4 + P12: batch inference over a feature table with `na.fill(0)` on
    * the feature columns first (dags/fare_forecasting_dag.py:97's
    * `X_future = df_future[feature_cols].fillna(0)`) — rows with
    * incomplete lag history (the first 7 days) still score instead of
    * being dropped. The label column is left untouched.
    */
  def predictFilled(model: RandomForestRegressionModel,
      features: DataFrame): DataFrame = {
    val filled = features.na.fill(0.0, featureCols)
    val assembler = new VectorAssembler()
      .setInputCols(featureCols.toArray).setOutputCol("features")
    model.transform(assembler.transform(filled))
      .drop("features")
  }

  /** M6: recursive 7-day-ahead rollout — carries the last observed
    * trip_count/distance, weekend flags from the calendar, and shifts
    * lag1/lag7/ma7 forward with each predicted value. Driver-side by
    * design (7 rows of sequential state).
    */
  def recursiveForecast(spark: SparkSession, model: RandomForestRegressionModel,
      features: DataFrame, horizon: Int = 7): DataFrame = {
    import spark.implicits._
    val hist = features.na.drop("any", Seq("avg_fare"))
      .orderBy(desc("trip_date")).limit(14).collect()
      .sortBy(_.getAs[java.sql.Date]("trip_date").getTime)
    require(hist.nonEmpty, "no feature history to forecast from")
    val last = hist.last
    var fares = hist.map(_.getAs[Double]("avg_fare")).toVector
    var date = last.getAs[java.sql.Date]("trip_date").toLocalDate
    val out = Vector.newBuilder[(java.sql.Date, Double, String)]

    val assembler = new VectorAssembler()
      .setInputCols(featureCols.toArray).setOutputCol("features")
    for (_ <- 1 to horizon) {
      date = date.plusDays(1)
      val dow = date.getDayOfWeek.getValue % 7 // Sunday→0 (Snowflake convention)
      val isWeekend = if (dow == 0 || dow == 6) 1.0 else 0.0
      val lag1 = fares.last
      val lag7 = fares(math.max(0, fares.size - 7))
      val ma7 = fares.takeRight(7).sum / math.min(7, fares.size)
      val rowDf = Seq((
          last.getAs[Double]("trip_count"),
          last.getAs[Double]("avg_distance"),
          if (isWeekend > 0) last.getAs[Double]("trip_count") else 0.0,
          if (isWeekend > 0) 0.0 else last.getAs[Double]("trip_count"),
          isWeekend, lag1, lag7, ma7))
        .toDF(featureCols: _*)
      val pred = model.transform(assembler.transform(rowDf))
        .select("prediction").head.getDouble(0)
      fares = fares :+ pred
      out += ((java.sql.Date.valueOf(date), pred, "rf_v1"))
    }
    out.result()
      .toDF("forecast_date", "predicted_avg_fare", "model_version")
  }

  /** M5 + A15: hindcast evaluation on the last `k` days — per-day
    * absolute error plus a summary row (the reference's FORECAST_EVAL
    * shape, Forecast_evaluation.py:58-86).
    */
  def evaluate(model: RandomForestRegressionModel, features: DataFrame,
      k: Int = 7): DataFrame = {
    val spark = features.sparkSession
    import spark.implicits._
    val assembler = new VectorAssembler()
      .setInputCols(featureCols.toArray).setOutputCol("features")
    val w = Window.orderBy(desc("trip_date"))
    val lastK = features.na.drop()
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
    val scored = model.transform(assembler.transform(lastK))
      .select(col("trip_date").cast("string").as("day"),
        col("avg_fare").as("actual"), col("prediction").as("predicted"),
        abs(col("avg_fare") - col("prediction")).as("abs_err"))
    val scoredCached = graft.ScopedCache.replace("forecast.scored", scored)
    val summary = scoredCached.agg(
        lit("ALL").as("day"), avg("actual").as("actual"),
        avg("predicted").as("predicted"), avg("abs_err").as("abs_err"),
        avg(col("abs_err") / abs(col("actual"))).as("mape"))
    scoredCached.withColumn("mape", col("abs_err") / abs(col("actual")))
      .unionByName(summary)
  }
}
