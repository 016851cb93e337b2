package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Closed-form simple linear regression (one regressor) and residual
  * diagnostics — deterministic "small ML" that needs no iterative fit, so
  * it is exactly reproducible by any SQL engine from the same five sums.
  *
  * slope b = (Σxy − n·x̄·ȳ) / (Σx² − n·x̄²), intercept a = ȳ − b·x̄ —
  * the normal equations for y = a + bx.
  *
  * Scale: the fit is ONE map-side-combined aggregate over (x, y) — five
  * doubles of state per partition regardless of row count — broadcast
  * back as a single-row frame. Residual scoring is then a codegen'd
  * projection; the z-score pass adds one more scalar aggregate
  * (stddev_pop of the residual). Three scans total, zero shuffles beyond
  * the scalar aggregates, no driver-side math on unbounded data.
  */
object Ols {

  /** Fit y ~ a + b·x; returns a 1-row frame (a, b) for cross-joining. */
  def fit(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val x = col(xCol).cast("double")
    val y = col(yCol).cast("double")
    df.agg(
        count(lit(1)).cast("double").as("n"),
        avg(x).as("mx"), avg(y).as("my"),
        sum(x * y).as("sxy"), sum(x * x).as("sxx"))
      .select(
        (((col("sxy") - col("n") * col("mx") * col("my")) /
          (col("sxx") - col("n") * col("mx") * col("mx")))).as("b"),
        col("mx"), col("my"))
      .select((col("my") - col("b") * col("mx")).as("a"), col("b"))
  }

  /** Exact-sum fit for integer x / money y: every fit scalar (n, Σx,
    * Σx², Σy, Σxy) accumulates in integer/DECIMAL arithmetic — no
    * float-summation order-dependence — so ANY engine recomputing the
    * same sums lands on bit-identical double coefficients, and the
    * scored line (a + b·x) is reproducible to the last ulp. Requires
    * |x| < 10⁵ and y already exact (e.g. a DECIMAL(18,2)-summed money
    * aggregate); products stay within decimal(38) unadjusted, so Spark
    * never falls into precision-loss rounding.
    *
    * Returns (a, b) as a 1-row frame, computed as
    * b = (Σxy − Σx·Σy/n) / (Σx² − Σx·Σx/n), a = Σy/n − b·(Σx/n) —
    * mirror this exact expression shape when reproducing externally.
    */
  def fitExactInt(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val xi = col(xCol).cast("decimal(5,0)")
    val yd = col(yCol).cast("decimal(18,2)")
    df.agg(
        count(lit(1)).cast("double").as("n"),
        sum(col(xCol).cast("long")).cast("double").as("sx"),
        sum(col(xCol).cast("long") * col(xCol).cast("long"))
          .cast("double").as("sxx"),
        sum(yd).cast("double").as("sy"),
        sum(xi * yd).cast("double").as("sxy"))
      .select(
        ((col("sxy") - col("sx") * col("sy") / col("n")) /
          (col("sxx") - col("sx") * col("sx") / col("n"))).as("b"),
        col("n"), col("sx"), col("sy"))
      .select(
        (col("sy") / col("n") - col("b") * (col("sx") / col("n"))).as("a"),
        col("b"))
  }

  /** Score each row with the fitted line and flag residual outliers:
    * adds yhat, resid, resid_z (z-score vs population stddev of the
    * residuals). The fit and the stddev are both scalar aggregates
    * broadcast back over the data.
    */
  def residuals(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val coef = fit(df, xCol, yCol)
    val scored = df.crossJoin(broadcast(coef))
      .withColumn("yhat", col("a") + col("b") * col(xCol).cast("double"))
      .withColumn("resid", col(yCol).cast("double") - col("yhat"))
    val sd = scored.agg(stddev_pop(col("resid")).as("sd"))
    scored.crossJoin(broadcast(sd))
      .withColumn("resid_z", col("resid") / col("sd"))
      .drop("a", "b", "sd")
  }
}
