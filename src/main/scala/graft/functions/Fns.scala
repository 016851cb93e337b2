package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar helpers reproducing the reference's declared semantics
  * (SURVEY.md §2.5) as codegen-friendly `Column` expressions — no UDFs.
  */
object Fns {

  /** Snowflake `datediff('minute', a, b)` counts minute-*boundary* crossings,
    * not elapsed-seconds/60 (reference: int_trips_enriched.sql:24).
    * floor-to-minute both ends, then subtract.
    */
  def datediffMinutes(a: Column, b: Column): Column =
    floor(unix_timestamp(b) / 60) - floor(unix_timestamp(a) / 60)

  /** Snowflake `dayofweek`: 0=Sunday … 6=Saturday
    * (reference: int_trips_enriched.sql:34). Spark's is 1=Sunday…7.
    */
  def dayOfWeekSnowflake(c: Column): Column = dayofweek(c) - 1

  /** Weekend test in the Snowflake convention (`in (0,6)`,
    * int_trips_enriched.sql:36).
    */
  def isWeekend(c: Column): Column = dayOfWeekSnowflake(c).isin(0, 6)

  /** Abbreviated English day name ('Sun','Mon',…) — Snowflake `dayname`
    * (int_trips_enriched.sql:35).
    */
  def dayNameAbbrev(c: Column): Column = date_format(c, "EEE")

  /** dbt_utils.generate_surrogate_key: md5 of '-'-joined, null-coalesced
    * string casts (reference: snp_weather_observations.sql:38).
    */
  def surrogateKey(cols: Column*): Column =
    md5(concat_ws("-", cols.map(c => coalesce(c.cast("string"), lit(""))): _*))

  /** Guarded rate expression — `case when dur > 0 then dist/(dur/60) else 0`
    * (speed-mph shape, int_trips_enriched.sql:25-29).
    */
  def guardedRate(dist: Column, durationMin: Column): Column =
    when(durationMin > 0, dist / (durationMin / 60.0)).otherwise(0.0)

  /** Oracle-parity rounding for double aggregates: both engines round
    * half-away-from-zero at 4 places, absorbing summation-order noise.
    */
  def r4(c: Column): Column = round(c, 4)

  /** Order-independent money sum: exact DECIMAL(18,2) accumulation, cast
    * back to double. Floating sums of large magnitudes are order-dependent
    * (partial aggregation merges in partition order), which occasionally
    * lands a rounded value on the opposite side of a rounding boundary
    * from the oracle; decimal sums are bit-identical in every engine.
    */
  def moneySum(c: Column): Column =
    sum(c.cast("decimal(18,2)")).cast("double")

  /** Deterministic mean of a money column: exact decimal sum, one double
    * division (identical operands ⇒ identical result in both engines).
    */
  def moneyAvg(c: Column): Column =
    moneySum(c) / count(c)

  /** Column-name normalization to upper case — the reference's
    * `df.columns.str.upper()` bridge between Snowflake's upper-cased
    * identifiers and pandas (fare_model_training_dag.py:46).
    */
  def toUpperCols(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    df.toDF(df.columns.map(_.toUpperCase): _*)

  /** Timestamp → canonical string ('yyyy-MM-dd HH:mm:ss'), sidestepping
    * parquet TIMESTAMP(tz) vs DuckDB naive-TIMESTAMP schema mismatch in the
    * oracle compare. Session TZ is UTC in both engines.
    */
  def tsStr(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss")
}
