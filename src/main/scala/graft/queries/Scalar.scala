package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Fns._

/** Scalar-function operators (SURVEY.md §2.5) exercised through queries so
  * the DuckDB oracle pins their exact semantics.
  */
object Scalar {

  /** F1: Snowflake datediff('minute') = minute-boundary crossings
    * (int_trips_enriched.sql:24). DuckDB's date_diff has the same boundary
    * semantics, so it oracles directly. Joined orders↔lineitem gives two
    * timestamps per row; broadcast-free equi-join on the key, restricted to
    * a deterministic key slice to keep output bounded.
    */
  val f1DatediffMinute = QueryDef(
    "f1_datediff_minute",
    Some("""SELECT l.l_orderkey, l.l_linenumber,
           |       date_diff('minute', o.o_orderdate, l.l_shipdate) AS ship_delay_min
           |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
           |WHERE l.l_orderkey % 100 = 0""".stripMargin),
    (spark, dir) => {
      val l = Tables.lineitem(spark, dir).filter(col("l_orderkey") % 100 === 0)
      val o = Tables.orders(spark, dir)
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .select(l("l_orderkey"), l("l_linenumber"),
          datediffMinutes(o("o_orderdate"), l("l_shipdate")).as("ship_delay_min"))
    })

  /** F5+F6+F11: day-of-week in the Snowflake 0=Sunday convention, English
    * abbreviated day name, timestamp→date cast (int_trips_enriched.sql:33-36).
    */
  val f5Dayofweek = QueryDef(
    "f5_dayofweek_dayname",
    Some("""SELECT DISTINCT CAST(o_orderdate AS DATE) AS day,
           |       dayofweek(o_orderdate) AS dow,
           |       strftime(o_orderdate, '%a') AS day_name,
           |       CAST(CASE WHEN dayofweek(o_orderdate) IN (0, 6) THEN 1 ELSE 0 END AS INT) AS is_weekend
           |FROM orders""".stripMargin),
    (spark, dir) =>
      Tables.orders(spark, dir)
        .select(
          col("o_orderdate").cast("date").as("day"),
          dayOfWeekSnowflake(col("o_orderdate")).as("dow"),
          dayNameAbbrev(col("o_orderdate")).as("day_name"),
          isWeekend(col("o_orderdate")).cast("int").as("is_weekend"))
        .distinct())

  /** F7: chained CASE anomaly flags (int_trips_enriched.sql:39-55) +
    * F2-style guarded rate, aggregated per flag.
    */
  val f7CaseChains = QueryDef(
    "f7_case_chains",
    Some("""SELECT CASE WHEN l_quantity < 5 THEN 'low'
           |            WHEN l_quantity > 45 THEN 'high'
           |            ELSE 'normal' END AS qty_flag,
           |       CASE WHEN l_discount <= 0 THEN 'none'
           |            WHEN l_discount > 0.05 THEN 'deep'
           |            ELSE 'standard' END AS discount_flag,
           |       count(*) AS n,
           |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) /
           |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS avg_unit_price
           |FROM lineitem GROUP BY 1, 2""".stripMargin),
    (spark, dir) =>
      Tables.lineitem(spark, dir)
        .select(
          when(col("l_quantity") < 5, "low")
            .when(col("l_quantity") > 45, "high")
            .otherwise("normal").as("qty_flag"),
          when(col("l_discount") <= 0, "none")
            .when(col("l_discount") > 0.05, "deep")
            .otherwise("standard").as("discount_flag"),
          col("l_quantity"), col("l_extendedprice"))
        .groupBy(col("qty_flag"), col("discount_flag"))
        .agg(count(lit(1)).as("n"),
          (moneySum(col("l_extendedprice")) / moneySum(col("l_quantity")))
            .as("avg_unit_price")))

  /** F9+F16: JSON payload extraction (VARIANT shape —
    * weather_realtime_etl.py:150; queried via get_json_object, the
    * `from_json`-on-demand pattern for a kept-verbatim payload column).
    */
  val f9JsonExtract = QueryDef(
    "f9_json_extract",
    Some("""SELECT event_type,
           |       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
           |       count(json_extract_string(props, '$.k')) AS k_present
           |FROM events GROUP BY 1""".stripMargin),
    (spark, dir) =>
      Tables.events(spark, dir)
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy(col("event_type"))
        .agg(sum(col("k")).as("k_sum"), count(col("k")).as("k_present")))

  /** F12: dbt_utils surrogate key — md5 over '-'-joined null-coalesced
    * string casts (snp_weather_observations.sql:38). Distinct-count proves
    * injectivity on this keyset.
    */
  val f12SurrogateKey = QueryDef(
    "f12_surrogate_key",
    Some("""SELECT c_custkey,
           |       md5(concat_ws('-', coalesce(CAST(c_custkey AS VARCHAR), ''),
           |                          coalesce(c_mktsegment, ''))) AS sk
           |FROM customer""".stripMargin),
    (spark, dir) =>
      Tables.customer(spark, dir)
        .select(col("c_custkey"),
          surrogateKey(col("c_custkey"), col("c_mktsegment")).as("sk")))

  /** F9 (schema'd variant): `from_json` into a typed struct — the parsed
    * StructType column path (vs f9's path-extraction on demand). Malformed
    * payloads become null structs (PERMISSIVE), counted explicitly.
    */
  val f9bFromJson = QueryDef(
    "f9b_from_json_struct",
    Some("""SELECT event_type,
           |       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_total,
           |       count(*) FILTER (WHERE json_valid(props)) AS parsed_ok,
           |       count(*) FILTER (WHERE NOT json_valid(props)) AS parsed_bad
           |FROM events GROUP BY 1""".stripMargin),
    (spark, dir) => {
      import org.apache.spark.sql.types._
      val schema = StructType(Seq(StructField("k", LongType)))
      Tables.events(spark, dir)
        .withColumn("j", from_json(col("props"), schema))
        .groupBy(col("event_type"))
        .agg(
          sum(col("j.k")).as("k_total"),
          count(when(col("j").isNotNull, 1)).as("parsed_ok"),
          count(when(col("j").isNull, 1)).as("parsed_bad"))
    })

  val all: Seq[QueryDef] = Seq(
    f1DatediffMinute, f5Dayofweek, f7CaseChains, f9JsonExtract,
    f9bFromJson, f12SurrogateKey)
}
