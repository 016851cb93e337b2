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

  /** M8: closed-form OLS trend fit + residual z-scores over the daily
    * revenue series — deterministic "small ML" that, unlike the RF chain,
    * is EXACTLY reproducible by any SQL engine: every fit scalar
    * accumulates in integer/DECIMAL arithmetic (Ols.fitExactInt), so the
    * coefficients and the scored line are bit-identical cross-engine;
    * only the final z-score divides by a float stddev (r4-absorbed).
    * The anomaly read: |resid_z| > 2 days are revenue outliers vs trend.
    */
  val mlOlsResiduals = QueryDef(
    "ml_ols_residuals",
    Some("""WITH d AS (
           |  SELECT CAST(o_orderdate AS DATE) AS day,
           |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS ydec
           |  FROM orders GROUP BY 1),
           |x AS (SELECT day, ydec,
           |             CAST(datediff('day', DATE '1998-01-01', day) AS BIGINT) AS xi
           |      FROM d),
           |f AS (SELECT CAST(count(*) AS DOUBLE) AS n,
           |             CAST(sum(xi) AS DOUBLE) AS sx,
           |             CAST(sum(xi * xi) AS DOUBLE) AS sxx,
           |             CAST(sum(ydec) AS DOUBLE) AS sy,
           |             CAST(sum(CAST(xi AS DECIMAL(5,0)) * ydec) AS DOUBLE) AS sxy
           |      FROM x),
           |c AS (SELECT (sxy - sx * sy / n) / (sxx - sx * sx / n) AS b, n, sx, sy FROM f),
           |c2 AS (SELECT sy / n - b * (sx / n) AS a, b FROM c),
           |s AS (SELECT day, CAST(ydec AS DOUBLE) AS y,
           |             a + b * CAST(xi AS DOUBLE) AS yhat
           |      FROM x, c2),
           |sd AS (SELECT stddev_pop(y - yhat) AS sd FROM s)
           |SELECT day, round(y, 2) AS y, round(yhat, 2) AS yhat,
           |       round((y - yhat) / sd, 4) AS resid_z
           |FROM s, sd""".stripMargin),
    (spark, dir) => {
      import org.apache.spark.sql.functions.broadcast
      val d = Tables.orders(spark, dir)
        .groupBy(col("o_orderdate").cast("date").as("day"))
        .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("yraw"))
        .select(col("day"), col("yraw").cast("decimal(18,2)").as("ydec"),
          datediff(col("day"), lit("1998-01-01").cast("date")).as("xi"))
      val coef = graft.ml.Ols.fitExactInt(d, "xi", "ydec")
      val scored = d.crossJoin(broadcast(coef))
        .select(col("day"), col("ydec").cast("double").as("y"),
          (col("a") + col("b") * col("xi").cast("double")).as("yhat"))
      val sd = scored.agg(stddev_pop(col("y") - col("yhat")).as("sd"))
      scored.crossJoin(broadcast(sd))
        .select(col("day"), round(col("y"), 2).as("y"),
          round(col("yhat"), 2).as("yhat"),
          r4((col("y") - col("yhat")) / col("sd")).as("resid_z"))
    })

  /** M9: deterministic forecast-baseline benchmark — naive (lag-1),
    * seasonal-naive (lag-7), and the exact-OLS trend, scored on a
    * last-7-day holdout with MAE/MAPE. The honest-eval discipline the RF
    * chain gets from `ml_eval`, here with models simple enough that the
    * whole benchmark is exactly reproducible by the oracle: the trend
    * fits on TRAIN DAYS ONLY (no leakage) via Ols.fitExactInt, and the
    * lag features come from the full series as any production hindcast
    * would. A model only earns its complexity by beating these numbers.
    */
  val mlBaselineCompare = QueryDef(
    "ml_baseline_compare",
    Some("""WITH d AS (
           |  SELECT CAST(o_orderdate AS DATE) AS day,
           |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS ydec
           |  FROM orders GROUP BY 1),
           |x AS (SELECT day, ydec,
           |             CAST(datediff('day', DATE '1998-01-01', day) AS BIGINT) AS xi,
           |             lag(CAST(ydec AS DOUBLE), 1) OVER (ORDER BY day) AS naive,
           |             lag(CAST(ydec AS DOUBLE), 7) OVER (ORDER BY day) AS snaive
           |      FROM d),
           |cut AS (SELECT max(day) - 6 AS c0 FROM x),
           |f AS (SELECT CAST(count(*) AS DOUBLE) AS n, CAST(sum(xi) AS DOUBLE) AS sx,
           |             CAST(sum(xi * xi) AS DOUBLE) AS sxx, CAST(sum(ydec) AS DOUBLE) AS sy,
           |             CAST(sum(CAST(xi AS DECIMAL(5,0)) * ydec) AS DOUBLE) AS sxy
           |      FROM x, cut WHERE day < c0),
           |c AS (SELECT (sxy - sx * sy / n) / (sxx - sx * sx / n) AS b, n, sx, sy FROM f),
           |c2 AS (SELECT sy / n - b * (sx / n) AS a, b FROM c),
           |h AS (SELECT day, CAST(ydec AS DOUBLE) AS y, naive, snaive,
           |             a + b * CAST(xi AS DOUBLE) AS trend
           |      FROM x, c2, cut WHERE day >= c0)
           |SELECT model, round(mae, 2) AS mae, round(mape, 4) AS mape FROM (
           |  SELECT 'naive' AS model, avg(abs(y - naive)) AS mae,
           |         avg(abs(y - naive) / y) * 100 AS mape FROM h
           |  UNION ALL
           |  SELECT 'seasonal_naive', avg(abs(y - snaive)), avg(abs(y - snaive) / y) * 100 FROM h
           |  UNION ALL
           |  SELECT 'ols_trend', avg(abs(y - trend)), avg(abs(y - trend) / y) * 100 FROM h)""".stripMargin),
    (spark, dir) => {
      import org.apache.spark.sql.functions.broadcast
      import org.apache.spark.sql.expressions.Window
      // O(days) rows after the pre-agg, so the unpartitioned lag window
      // is bounded state (the Windows.scala daily-series discipline)
      val d = Tables.orders(spark, dir)
        .groupBy(col("o_orderdate").cast("date").as("day"))
        .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("yraw"))
        .select(col("day"), col("yraw").cast("decimal(18,2)").as("ydec"),
          datediff(col("day"), lit("1998-01-01").cast("date")).as("xi"))
      val wDay = Window.orderBy(col("day"))
      val x = d
        .withColumn("naive", lag(col("ydec").cast("double"), 1).over(wDay))
        .withColumn("snaive", lag(col("ydec").cast("double"), 7).over(wDay))
      val cut = x.agg(date_sub(max(col("day")), 6).as("c0"))
      val coef = graft.ml.Ols.fitExactInt(
        x.crossJoin(broadcast(cut)).filter(col("day") < col("c0")),
        "xi", "ydec")
      val h = x.crossJoin(broadcast(coef)).crossJoin(broadcast(cut))
        .filter(col("day") >= col("c0"))
        .select(col("ydec").cast("double").as("y"),
          col("naive"), col("snaive"),
          (col("a") + col("b") * col("xi").cast("double")).as("trend"))
      def score(model: String, yhat: org.apache.spark.sql.Column) =
        h.agg(avg(abs(col("y") - yhat)).as("mae"),
            (avg(abs(col("y") - yhat) / col("y")) * 100).as("mape"))
          .select(lit(model).as("model"), round(col("mae"), 2).as("mae"),
            r4(col("mape")).as("mape"))
      score("naive", col("naive"))
        .unionByName(score("seasonal_naive", col("snaive")))
        .unionByName(score("ols_trend", col("trend")))
    })

  /** M10: calibration table — the honest-eval companion every regression
    * chain needs (reliability-diagram bins: does predicted ≈ actual in
    * every prediction range, or only on average?). Predictions come from
    * the exact-OLS trend (the bit-reproducible model of M8), binned into
    * prediction quintiles; per bin the mean prediction, mean actual, and
    * bias. Deterministic: ntile over (r2-rounded yhat, day).
    *
    * Scale: the fit is one scalar aggregate broadcast back; binning is a
    * single window over O(days) rows; the report is 5 rows.
    */
  val mlCalibration = QueryDef(
    "ml_calibration",
    Some("""WITH d AS (
           |  SELECT CAST(o_orderdate AS DATE) AS day,
           |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS ydec
           |  FROM orders GROUP BY 1),
           |x AS (SELECT day, ydec,
           |             CAST(datediff('day', DATE '1998-01-01', day) AS BIGINT) AS xi
           |      FROM d),
           |f AS (SELECT CAST(count(*) AS DOUBLE) AS n,
           |             CAST(sum(xi) AS DOUBLE) AS sx,
           |             CAST(sum(xi * xi) AS DOUBLE) AS sxx,
           |             CAST(sum(ydec) AS DOUBLE) AS sy,
           |             CAST(sum(CAST(xi AS DECIMAL(5,0)) * ydec) AS DOUBLE) AS sxy
           |      FROM x),
           |c AS (SELECT (sxy - sx * sy / n) / (sxx - sx * sx / n) AS b, n, sx, sy FROM f),
           |c2 AS (SELECT sy / n - b * (sx / n) AS a, b FROM c),
           |s AS (SELECT day, CAST(ydec AS DOUBLE) AS y,
           |             a + b * CAST(xi AS DOUBLE) AS yhat
           |      FROM x, c2),
           |bins AS (SELECT day, y, yhat,
           |                ntile(5) OVER (ORDER BY round(yhat, 2), day) AS bin
           |         FROM s)
           |SELECT bin, CAST(count(*) AS BIGINT) AS n_days,
           |       round(avg(yhat), 2) AS avg_pred,
           |       round(avg(y), 2) AS avg_actual,
           |       round(avg(yhat) - avg(y), 2) AS bias
           |FROM bins GROUP BY 1""".stripMargin),
    (spark, dir) => {
      import org.apache.spark.sql.expressions.Window
      val d = Tables.orders(spark, dir)
        .groupBy(col("o_orderdate").cast("date").as("day"))
        .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("yraw"))
        .select(col("day"), col("yraw").cast("decimal(18,2)").as("ydec"),
          datediff(col("day"), lit("1998-01-01").cast("date")).as("xi"))
      val coef = graft.ml.Ols.fitExactInt(d, "xi", "ydec")
      val scored = d.crossJoin(broadcast(coef))
        .select(col("day"), col("ydec").cast("double").as("y"),
          (col("a") + col("b") * col("xi").cast("double")).as("yhat"))
      scored
        .withColumn("bin", ntile(5).over( // day-census frame (calendar-
          // bounded at any scale — the Windows.scala daily discipline)
          Window.orderBy(round(col("yhat"), 2), col("day"))))
        .groupBy("bin")
        .agg(count(lit(1)).as("n_days"),
          round(avg(col("yhat")), 2).as("avg_pred"),
          round(avg(col("y")), 2).as("avg_actual"),
          round(avg(col("yhat")) - avg(col("y")), 2).as("bias"))
    })

  /** M11: classical decomposition of the daily revenue series —
    * y = trend + weekly seasonal + residual, with the trend from the
    * exact-OLS fit (bit-reproducible, M8) and the seasonal term the
    * per-day-of-week mean of the detrended series. The additive
    * decomposition every forecasting/anomaly chain starts from, built so
    * each component is independently checkable: trend is deterministic,
    * seasonals sum the same detrended values in both engines (r2
    * absorbs order), and resid = y − trend − seasonal reconstructs y
    * exactly by construction.
    */
  val mlSeasonalDecompose = QueryDef(
    "ml_seasonal_decompose",
    Some("""WITH d AS (
           |  SELECT CAST(o_orderdate AS DATE) AS day,
           |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS ydec
           |  FROM orders GROUP BY 1),
           |x AS (SELECT day, ydec,
           |             CAST(datediff('day', DATE '1998-01-01', day) AS BIGINT) AS xi
           |      FROM d),
           |f AS (SELECT CAST(count(*) AS DOUBLE) AS n,
           |             CAST(sum(xi) AS DOUBLE) AS sx,
           |             CAST(sum(xi * xi) AS DOUBLE) AS sxx,
           |             CAST(sum(ydec) AS DOUBLE) AS sy,
           |             CAST(sum(CAST(xi AS DECIMAL(5,0)) * ydec) AS DOUBLE) AS sxy
           |      FROM x),
           |c AS (SELECT (sxy - sx * sy / n) / (sxx - sx * sx / n) AS b, n, sx, sy FROM f),
           |c2 AS (SELECT sy / n - b * (sx / n) AS a, b FROM c),
           |s AS (SELECT day, CAST(ydec AS DOUBLE) AS y,
           |             a + b * CAST(xi AS DOUBLE) AS trend,
           |             dayofweek(day) AS dow
           |      FROM x, c2),
           |seas AS (SELECT dow, avg(y - trend) AS seasonal FROM s GROUP BY 1)
           |SELECT s.day, round(s.y, 2) AS y, round(s.trend, 2) AS trend,
           |       round(seas.seasonal, 2) AS seasonal,
           |       round(s.y - s.trend - seas.seasonal, 2) AS resid
           |FROM s JOIN seas USING (dow)""".stripMargin),
    (spark, dir) => {
      val d = Tables.orders(spark, dir)
        .groupBy(col("o_orderdate").cast("date").as("day"))
        .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("yraw"))
        .select(col("day"), col("yraw").cast("decimal(18,2)").as("ydec"),
          datediff(col("day"), lit("1998-01-01").cast("date")).as("xi"))
      val coef = graft.ml.Ols.fitExactInt(d, "xi", "ydec")
      val s = d.crossJoin(broadcast(coef))
        .select(col("day"), col("ydec").cast("double").as("y"),
          (col("a") + col("b") * col("xi").cast("double")).as("trend"),
          dayOfWeekSnowflake(col("day")).as("dow"))
      val seas = s.groupBy("dow")
        .agg(avg(col("y") - col("trend")).as("seasonal"))
      s.join(broadcast(seas), Seq("dow"))
        .select(col("day"), round(col("y"), 2).as("y"),
          round(col("trend"), 2).as("trend"),
          round(col("seasonal"), 2).as("seasonal"),
          round(col("y") - col("trend") - col("seasonal"), 2).as("resid"))
    })

  /** M12: grouped exact-OLS — one trend model PER GROUP (order priority)
    * fitted in a single grouped aggregation. This is the shape that
    * matters at 100 TB: a million per-key models is ONE shuffle at key
    * grain carrying five sufficient statistics each (n, Σx, Σx², Σy,
    * Σxy), not a million driver-side fits — the sufficient-statistic
    * factorization is the whole trick, and the integer/DECIMAL sums
    * keep every coefficient bit-reproducible cross-engine (M8's
    * discipline, grouped).
    */
  val mlGroupedOls = QueryDef(
    "ml_grouped_ols",
    Some("""WITH d AS (
           |  SELECT o_orderpriority AS grp, CAST(o_orderdate AS DATE) AS day,
           |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS ydec
           |  FROM orders GROUP BY 1, 2),
           |x AS (SELECT grp, ydec,
           |             CAST(datediff('day', DATE '1998-01-01', day) AS BIGINT) AS xi
           |      FROM d),
           |f AS (SELECT grp, CAST(count(*) AS DOUBLE) AS n,
           |             CAST(sum(xi) AS DOUBLE) AS sx,
           |             CAST(sum(xi * xi) AS DOUBLE) AS sxx,
           |             CAST(sum(ydec) AS DOUBLE) AS sy,
           |             CAST(sum(CAST(xi AS DECIMAL(5,0)) * ydec) AS DOUBLE) AS sxy
           |      FROM x GROUP BY 1),
           |c AS (SELECT grp, n, (sxy - sx * sy / n) / (sxx - sx * sx / n) AS b,
           |             sx, sy FROM f)
           |SELECT grp, CAST(n AS BIGINT) AS n_days, round(b, 4) AS slope,
           |       round(sy / n - b * (sx / n), 2) AS intercept
           |FROM c""".stripMargin),
    (spark, dir) => {
      val xi = col("xi").cast("decimal(5,0)")
      Tables.orders(spark, dir)
        .groupBy(col("o_orderpriority").as("grp"),
          col("o_orderdate").cast("date").as("day"))
        .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("yraw"))
        .select(col("grp"), col("yraw").cast("decimal(18,2)").as("ydec"),
          datediff(col("day"), lit("1998-01-01").cast("date")).as("xi"))
        .groupBy("grp")
        .agg(count(lit(1)).cast("double").as("n"),
          sum(col("xi").cast("long")).cast("double").as("sx"),
          sum(col("xi").cast("long") * col("xi").cast("long"))
            .cast("double").as("sxx"),
          sum(col("ydec")).cast("double").as("sy"),
          sum(xi * col("ydec")).cast("double").as("sxy"))
        .select(col("grp"), col("n"),
          ((col("sxy") - col("sx") * col("sy") / col("n")) /
            (col("sxx") - col("sx") * col("sx") / col("n"))).as("b"),
          col("sx"), col("sy"))
        .select(col("grp"), col("n").cast("long").as("n_days"),
          round(col("b"), 4).as("slope"),
          round(col("sy") / col("n") - col("b") * (col("sx") / col("n")), 2)
            .as("intercept"))
    })

  /** Distributed Lloyd's k-means (ml.KMeans) on the embeddings table:
    * hash-order seeding, THREE update supersteps, final re-assignment —
    * every step a join+aggregation in the long-form (vec_id, pos, x)
    * layout, with the determinism contract (6dp distance and centroid
    * rounding, cluster-id tiebreaks) that makes an iterative float fit
    * exactly oracle-checkable per point across multiple iterations
    * (the unrolled-superstep discipline of g1_pagerank). The oracle
    * CTEs are generated by the same loop shape as the engine's
    * superstep loop; `hexValSql` mirrors the seed hash.
    */
  private val kmeansIters = 3

  val mlKmeans = QueryDef(
    "ml_kmeans",
    Some {
      val hv = SamplingQ.hexValSql("vec_id")
      def assignSql(i: Int) =
        s"""d$i AS (SELECT p.vec_id, c.cluster, round(sum((p.x - c.v) * (p.x - c.v)), 6) AS d
           |       FROM pts p JOIN c${i - 1} c ON c.pos = p.pos GROUP BY 1, 2),
           |a$i AS (SELECT vec_id, cluster, d FROM (
           |         SELECT vec_id, cluster, d, row_number() OVER (PARTITION BY vec_id ORDER BY d, cluster) AS rn FROM d$i)
           |       WHERE rn = 1)""".stripMargin
      def updateSql(i: Int) =
        s"""c$i AS (SELECT a.cluster, p.pos, round(avg(p.x), 6) AS v
           |       FROM a$i a JOIN pts p ON p.vec_id = a.vec_id GROUP BY 1, 2)""".stripMargin
      val supersteps = (1 to kmeansIters)
        .map(i => assignSql(i) + ",\n" + updateSql(i)).mkString(",\n")
      val fin = kmeansIters + 1
      s"""WITH pts AS (
         |  SELECT vec_id, r.i AS pos, CAST(embedding[r.i] AS DOUBLE) AS x
         |  FROM embeddings CROSS JOIN range(1, 65) r(i)),
         |seeds AS (
         |  SELECT vec_id, CAST(row_number() OVER (ORDER BY $hv, vec_id) AS BIGINT) - 1 AS cluster
         |  FROM embeddings ORDER BY $hv, vec_id LIMIT 8),
         |c0 AS (SELECT s.cluster, p.pos, p.x AS v FROM seeds s JOIN pts p ON p.vec_id = s.vec_id),
         |$supersteps,
         |${assignSql(fin)}
         |SELECT vec_id, cluster, round(d, 4) AS d2 FROM a$fin""".stripMargin
    },
    (spark, dir) =>
      graft.ml.KMeans.lloyd(Tables.embeddings(spark, dir), "vec_id", "embedding",
          k = 8, iters = kmeansIters)
        .select(col("vec_id"), col("cluster"), round(col("d"), 4).as("d2")))

  /** Signed feature hashing (the hashing trick, Weinberger et al.):
    * tokens hash to 64 buckets via the engine's portable md5 variate,
    * with a second hash bit giving each token a ±1 sign so collisions
    * cancel in expectation. Output is the long-form sparse feature
    * matrix (doc_id, bucket, feat) — fixed dimensionality with NO
    * vocabulary table, the property that makes featurization a pure
    * map-side pass at 100 TB (one partial-aggregable groupBy, nothing
    * model-sized shuffles). Exactly oracle-checked since the hash is
    * md5, not murmur.
    */
  val mlFeatureHashing = QueryDef(
    "ml_feature_hashing",
    Some {
      val hv = SamplingQ.hexValSql("t.tok")
      s"""WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
         |SELECT doc_id, CAST(($hv) % 64 AS BIGINT) AS bucket,
         |       CAST(sum(CASE WHEN (($hv) // 64) % 2 = 0 THEN 1 ELSE -1 END) AS BIGINT) AS feat
         |FROM t GROUP BY 1, 2""".stripMargin
    },
    (spark, dir) => {
      val hv = graft.operators.Sampling.hexVal(col("tok"))
      Tables.documents(spark, dir)
        .select(col("doc_id"),
          explode(graft.functions.TextFns.tokens(col("text"))).as("tok"))
        .groupBy(col("doc_id"), pmod(hv, lit(64)).cast("long").as("bucket"))
        .agg(sum(when(pmod((hv / lit(64)).cast("long"), lit(2)) === 0, 1)
          .otherwise(-1)).cast("long").as("feat"))
    })

  val all: Seq[QueryDef] = Seq(mlFeatureTable, mlForecast, mlEval,
    mlOlsResiduals, mlBaselineCompare, mlCalibration, mlSeasonalDecompose,
    mlGroupedOls, mlKmeans, mlFeatureHashing)
}
