package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Fns._

/** Core relational operator inventory (SURVEY.md §2.1–2.4, §2.7, §2.8),
  * re-expressed over the TPC-H-ish fixtures. Each query is the Spark-first
  * form of a reference operator; the oracle SQL states the same semantics
  * for DuckDB.
  *
  * Scale notes: every aggregation here is hash-aggregatable with map-side
  * partial aggregation; joins against dimension tables are explicitly
  * `broadcast()` so no shuffle of the fact side on the join key is needed;
  * fact-fact joins pre-aggregate both sides first (the reference's own
  * shape, mart_daily_metrics.sql:16-62), which shrinks shuffle input from
  * O(rows) to O(groups).
  */
object Relational {

  /** S3+P1: parquet scan with projection/rename/cast pushed into the scan
    * (etl_spark_historical.py:178-190). `.explain` shows ReadSchema with only
    * the 5 referenced columns.
    */
  val s3ScanProject = QueryDef(
    "s3_scan_project",
    Some("""SELECT l_orderkey AS order_id, l_linenumber AS line_no,
           |       CAST(l_quantity AS BIGINT) AS qty,
           |       round(l_extendedprice, 4) AS price, l_returnflag AS flag
           |FROM lineitem""".stripMargin),
    (spark, dir) =>
      Tables.lineitem(spark, dir).select(
        col("l_orderkey").as("order_id"),
        col("l_linenumber").as("line_no"),
        col("l_quantity").cast("long").as("qty"),
        r4(col("l_extendedprice")).as("price"),
        col("l_returnflag").as("flag")))

  /** P2+P3: null-drop on key columns + positive-value filters
    * (etl_spark_historical.py:191-194). Filters reach the parquet scan as
    * PushedFilters.
    */
  val p3PositiveFilter = QueryDef(
    "p3_positive_filter",
    Some("""SELECT o_orderkey, o_custkey, round(o_totalprice, 4) AS total
           |FROM orders
           |WHERE o_totalprice > 0 AND o_custkey IS NOT NULL
           |  AND o_orderstatus IS NOT NULL AND o_totalprice > 50000""".stripMargin),
    (spark, dir) =>
      Tables.orders(spark, dir)
        .na.drop(Seq("o_custkey", "o_orderstatus"))
        .filter(col("o_totalprice") > 0 && col("o_totalprice") > 50000)
        .select(col("o_orderkey"), col("o_custkey"), r4(col("o_totalprice")).as("total")))

  /** P5: staging quality filter incl. the theta predicate between two columns
    * of the same row (`dropoff > pickup`, stg_taxi_trips.sql:31-39).
    */
  val p5ThetaFilter = QueryDef(
    "p5_theta_filter",
    Some("""SELECT l_orderkey, l_linenumber, CAST(l_quantity AS BIGINT) AS qty
           |FROM lineitem
           |WHERE l_quantity > 0 AND l_extendedprice > 0
           |  AND l_extendedprice > l_quantity * 1500
           |  AND l_shipdate IS NOT NULL""".stripMargin),
    (spark, dir) =>
      Tables.lineitem(spark, dir)
        .na.drop(Seq("l_shipdate"))
        .filter(col("l_quantity") > 0 && col("l_extendedprice") > 0 &&
          col("l_extendedprice") > col("l_quantity") * 1500)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity").cast("long").as("qty")))

  /** P9: negated-conjunction sentinel exclusion
    * (weather_historical_backfill.py:145).
    */
  val p9SentinelExclusion = QueryDef(
    "p9_sentinel_exclusion",
    Some("""SELECT count(*) AS n
           |FROM lineitem
           |WHERE NOT (l_returnflag = 'N' AND l_linestatus = 'O' AND l_quantity < 10)""".stripMargin),
    (spark, dir) =>
      Tables.lineitem(spark, dir)
        .filter(!(col("l_returnflag") === "N" && col("l_linestatus") === "O" &&
          col("l_quantity") < 10))
        .agg(count(lit(1)).as("n")))

  /** A4: daily metrics hash-agg — count / sum / avgs by day
    * (mart_daily_metrics.sql:16-29). Partial aggregation map-side, one
    * shuffle on the (tiny) day key.
    */
  val a4DailyAgg = QueryDef(
    "a4_daily_agg",
    Some("""SELECT CAST(ts AS DATE) AS day,
           |       count(*) AS n_events,
           |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
           |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(value) AS avg_value
           |FROM events GROUP BY 1""".stripMargin),
    (spark, dir) =>
      Tables.events(spark, dir)
        .groupBy(col("ts").cast("date").as("day"))
        .agg(
          count(lit(1)).as("n_events"),
          moneySum(col("value")).as("total_value"),
          moneyAvg(col("value")).as("avg_value")))

  /** A5+F5: conditional weekend/weekday counts in the Snowflake 0=Sunday
    * convention (mart_daily_metrics.sql:25-26; int_trips_enriched.sql:34-36).
    */
  val a5ConditionalCounts = QueryDef(
    "a5_conditional_counts",
    Some("""SELECT event_type,
           |       count(*) AS n,
           |       CAST(sum(CASE WHEN dayofweek(ts) IN (0,6) THEN 1 ELSE 0 END) AS BIGINT) AS weekend_n,
           |       CAST(sum(CASE WHEN dayofweek(ts) IN (0,6) THEN 0 ELSE 1 END) AS BIGINT) AS weekday_n
           |FROM events GROUP BY event_type""".stripMargin),
    (spark, dir) =>
      Tables.events(spark, dir)
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          sum(when(isWeekend(col("ts")), 1L).otherwise(0L)).as("weekend_n"),
          sum(when(isWeekend(col("ts")), 0L).otherwise(1L)).as("weekday_n")))

  /** A1+A2+F3: hourly hash-agg with min/max/avg and `max_by` argmax — the
    * int_weather_hourly shape (int_weather_hourly.sql:12-35). Hour bucket is
    * emitted as a canonical string for oracle parity.
    */
  val a1HourlyMaxBy = QueryDef(
    "a1_hourly_max_by",
    Some("""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_ts,
           |       event_type,
           |       count(*) AS n,
           |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(value) AS avg_value,
           |       round(min(value), 4) AS min_value,
           |       round(max(value), 4) AS max_value,
           |       max_by(event_id, ts) AS latest_event_id,
           |       strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS latest_ts
           |FROM events GROUP BY 1, 2""".stripMargin),
    (spark, dir) =>
      Tables.events(spark, dir)
        .groupBy(
          tsStr(date_trunc("hour", col("ts"))).as("hour_ts"),
          col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          moneyAvg(col("value")).as("avg_value"),
          r4(min(col("value"))).as("min_value"),
          r4(max(col("value"))).as("max_value"),
          max_by(col("event_id"), col("ts")).as("latest_event_id"),
          tsStr(max(col("ts"))).as("latest_ts")))

  /** J2+A6: pre-aggregate both fact sides, then a left equi-join on the day
    * key (mart_daily_metrics.sql:31-62). Aggregating before the join keeps
    * the shuffle at O(days), not O(rows) — the load-bearing shape at 100 TB.
    */
  val j2AggThenJoin = QueryDef(
    "j2_agg_then_join",
    Some("""WITH daily_orders AS (
           |  SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS n_orders,
           |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
           |  FROM orders GROUP BY 1),
           |daily_ship AS (
           |  SELECT CAST(l_shipdate AS DATE) AS day,
           |         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_shipped
           |  FROM lineitem GROUP BY 1)
           |SELECT o.day, o.n_orders, o.revenue, s.qty_shipped
           |FROM daily_orders o LEFT JOIN daily_ship s ON o.day = s.day""".stripMargin),
    (spark, dir) => {
      val dailyOrders = Tables.orders(spark, dir)
        .groupBy(col("o_orderdate").cast("date").as("day"))
        .agg(count(lit(1)).as("n_orders"), moneySum(col("o_totalprice")).as("revenue"))
      val dailyShip = Tables.lineitem(spark, dir)
        .groupBy(col("l_shipdate").cast("date").as("day"))
        .agg(sum(col("l_quantity").cast("long")).as("qty_shipped"))
      dailyOrders.join(dailyShip, Seq("day"), "left")
    })

  /** J1+A3+F8: left join with an equi key plus a non-equi LIKE residual,
    * then aggregate over the joined shape (mart_trips_weather.sql:36-49).
    * Customer side is dimension-sized → broadcast, no fact shuffle.
    */
  val j1LeftJoinResidual = QueryDef(
    "j1_left_join_residual",
    Some("""SELECT o.o_orderstatus AS status,
           |       count(*) AS n,
           |       count(c.c_name) AS matched,
           |       CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(o.o_totalprice) AS avg_total
           |FROM orders o
           |LEFT JOIN customer c
           |  ON o.o_custkey = c.c_custkey AND lower(c.c_mktsegment) LIKE '%build%'
           |GROUP BY 1""".stripMargin),
    (spark, dir) => {
      val o = Tables.orders(spark, dir)
      val c = Tables.customer(spark, dir)
      o.join(broadcast(c),
          o("o_custkey") === c("c_custkey") &&
            lower(c("c_mktsegment")).like("%build%"),
          "left")
        .groupBy(o("o_orderstatus").as("status"))
        .agg(
          count(lit(1)).as("n"),
          count(c("c_name")).as("matched"),
          moneyAvg(o("o_totalprice")).as("avg_total"))
    })

  /** J3: broadcast dimension join (zone lookup shape, zone_forecast.py:51-56). */
  val j3BroadcastDim = QueryDef(
    "j3_broadcast_dim",
    Some("""SELECT p.p_brand AS brand, count(*) AS n,
           |       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
           |FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey
           |GROUP BY 1""".stripMargin),
    (spark, dir) => {
      val l = Tables.lineitem(spark, dir)
      val p = Tables.part(spark, dir)
      l.join(broadcast(p), l("l_partkey") === p("p_partkey"), "left")
        .groupBy(p("p_brand").as("brand"))
        .agg(count(lit(1)).as("n"), moneySum(l("l_extendedprice")).as("revenue"))
    })

  /** J4: anti-join gap detection (missing-hours idiom,
    * weather_historical_backfill.py:135-152) — event hours that have no
    * 'purchase' observation. Both sides are DISTINCT-reduced before the
    * anti-join, so the shuffle carries O(hours), not O(events).
    */
  val j4AntiJoin = QueryDef(
    "j4_anti_join",
    Some("""WITH all_hours AS (
           |  SELECT DISTINCT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_ts
           |  FROM events),
           |purchase_hours AS (
           |  SELECT DISTINCT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_ts
           |  FROM events WHERE event_type = 'purchase')
           |SELECT a.hour_ts FROM all_hours a
           |WHERE NOT EXISTS (SELECT 1 FROM purchase_hours p WHERE p.hour_ts = a.hour_ts)""".stripMargin),
    (spark, dir) => {
      val e = Tables.events(spark, dir)
      val allHours = e.select(tsStr(date_trunc("hour", col("ts"))).as("hour_ts")).distinct()
      val purchaseHours = e.filter(col("event_type") === "purchase")
        .select(tsStr(date_trunc("hour", col("ts"))).as("hour_ts")).distinct()
      allHours.join(purchaseHours, Seq("hour_ts"), "left_anti")
    })

  /** J5: MERGE-insert-only dedup as anti-join + union append
    * (etl_spark_historical.py:350-378). "Fact" = orders before 1997; "batch"
    * = orders of 1996H2..1997 (overlapping) — re-loading overlap inserts 0
    * dups. At scale the anti-join probe is restricted to the affected date
    * partitions (partition pruning on the fact side).
    */
  val j5MergeInsertOnly = QueryDef(
    "j5_merge_insert_only",
    Some("""WITH fact AS (
           |  SELECT * FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01'),
           |batch AS (
           |  SELECT * FROM orders WHERE o_orderdate >= TIMESTAMP '1996-07-01'),
           |merged AS (
           |  SELECT o_orderkey, o_orderstatus FROM fact
           |  UNION ALL
           |  SELECT b.o_orderkey, b.o_orderstatus FROM batch b
           |  WHERE NOT EXISTS (SELECT 1 FROM fact f WHERE f.o_orderkey = b.o_orderkey))
           |SELECT o_orderstatus AS status, count(*) AS n,
           |       CAST(sum(o_orderkey) AS BIGINT) AS key_checksum
           |FROM merged GROUP BY 1""".stripMargin),
    (spark, dir) => {
      val orders = Tables.orders(spark, dir)
      val fact = orders.filter(col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      val batch = orders.filter(col("o_orderdate") >= lit("1996-07-01").cast("timestamp"))
      val inserts = batch.join(fact.select("o_orderkey"), Seq("o_orderkey"), "left_anti")
      fact.select(col("o_orderkey"), col("o_orderstatus"))
        .unionByName(inserts.select(col("o_orderkey"), col("o_orderstatus")))
        .groupBy(col("o_orderstatus").as("status"))
        .agg(count(lit(1)).as("n"), sum(col("o_orderkey")).as("key_checksum"))
    })

  /** J6b: general MERGE — WHEN MATCHED UPDATE + WHEN NOT MATCHED INSERT
    * (the reference only exercises the insert-only slice,
    * etl_spark_historical.py:350-378; this is the full Snowflake MERGE
    * shape as a library operator). Source rows win on key collision,
    * unmatched target rows survive; one anti join + union, no shuffle of
    * the target when the batch broadcasts. Snapshot-isolated publication
    * of this state is `Snapshots.commitMerge` (spec-covered).
    */
  val j6MergeUpsert = QueryDef(
    "j6_merge_upsert",
    Some("""WITH target AS (
           |  SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
           |  FROM orders WHERE o_orderkey % 3 != 0),
           |source AS (
           |  SELECT o_orderkey, o_custkey, o_totalprice * 1.1 AS o_totalprice,
           |         'U' AS o_orderstatus
           |  FROM orders WHERE o_orderkey % 2 = 0)
           |SELECT * FROM source
           |UNION ALL
           |SELECT t.* FROM target t
           |WHERE NOT EXISTS (SELECT 1 FROM source s WHERE s.o_orderkey = t.o_orderkey)""".stripMargin),
    (spark, dir) => {
      val o = Tables.orders(spark, dir)
      val target = o.filter(col("o_orderkey") % 3 =!= 0)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          col("o_orderstatus"))
      val source = o.filter(col("o_orderkey") % 2 === 0)
        .select(col("o_orderkey"), col("o_custkey"),
          (col("o_totalprice") * 1.1).as("o_totalprice"),
          lit("U").as("o_orderstatus"))
      graft.operators.Merge.upsert(target, source, Seq("o_orderkey"))
    })

  /** A7+A9: group-pair (OD-matrix shape) agg + HAVING post-agg filter
    * (mart_zone_analysis.sql:12-35).
    */
  val a7GroupPairHaving = QueryDef(
    "a7_group_pair_having",
    Some("""SELECT l_suppkey, l_returnflag, count(*) AS n,
           |       round(avg(l_quantity), 4) AS avg_qty,
           |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(l_extendedprice) AS avg_price
           |FROM lineitem
           |GROUP BY 1, 2 HAVING count(*) >= 10""".stripMargin),
    (spark, dir) =>
      Tables.lineitem(spark, dir)
        .groupBy(col("l_suppkey"), col("l_returnflag"))
        .agg(
          count(lit(1)).as("n"),
          r4(avg(col("l_quantity"))).as("avg_qty"),
          moneyAvg(col("l_extendedprice")).as("avg_price"))
        .filter(col("n") >= 10))

  /** A8: mode (most frequent value per group) with an explicit deterministic
    * tiebreak — smallest value wins (mart_zone_analysis.sql:31; built-in
    * `mode()` leaves ties unspecified, so both engines get the same
    * two-level count + rank-1 formulation).
    */
  val a8Mode = QueryDef(
    "a8_mode",
    Some("""WITH counts AS (
           |  SELECT l_returnflag, l_linenumber, count(*) AS cnt
           |  FROM lineitem GROUP BY 1, 2),
           |ranked AS (
           |  SELECT *, row_number() OVER (
           |    PARTITION BY l_returnflag ORDER BY cnt DESC, l_linenumber) AS rk
           |  FROM counts)
           |SELECT l_returnflag, l_linenumber AS mode_line, cnt
           |FROM ranked WHERE rk = 1""".stripMargin),
    (spark, dir) => {
      import org.apache.spark.sql.expressions.Window
      val counts = Tables.lineitem(spark, dir)
        .groupBy(col("l_returnflag"), col("l_linenumber"))
        .agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy(col("l_returnflag"))
        .orderBy(col("cnt").desc, col("l_linenumber"))
      counts.withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1)
        .select(col("l_returnflag"), col("l_linenumber").as("mode_line"), col("cnt"))
    })

  /** A10+A12: global min/max scan agg + global count
    * (weather_historical_backfill.py:101-106; etl_spark_historical.py:389).
    */
  val a10MinMax = QueryDef(
    "a10_min_max",
    Some("""SELECT count(*) AS n,
           |       strftime(min(l_shipdate), '%Y-%m-%d %H:%M:%S') AS min_ship,
           |       strftime(max(l_shipdate), '%Y-%m-%d %H:%M:%S') AS max_ship,
           |       round(min(l_extendedprice), 4) AS min_price,
           |       round(max(l_extendedprice), 4) AS max_price
           |FROM lineitem""".stripMargin),
    (spark, dir) =>
      Tables.lineitem(spark, dir).agg(
        count(lit(1)).as("n"),
        tsStr(min(col("l_shipdate"))).as("min_ship"),
        tsStr(max(col("l_shipdate"))).as("max_ship"),
        r4(min(col("l_extendedprice"))).as("min_price"),
        r4(max(col("l_extendedprice"))).as("max_price")))

  /** A11: DISTINCT projection of a truncated time bucket
    * (weather_historical_backfill.py:136-146).
    */
  val a11DistinctHours = QueryDef(
    "a11_distinct_hours",
    Some("""SELECT DISTINCT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_ts
           |FROM events""".stripMargin),
    (spark, dir) =>
      Tables.events(spark, dir)
        .select(tsStr(date_trunc("hour", col("ts"))).as("hour_ts"))
        .distinct())

  /** A13: daily roll-up with a boolean-sum flag (`precip day` shape,
    * weather_future_realtime.py:30-34).
    */
  val a13FlagAgg = QueryDef(
    "a13_flag_agg",
    Some("""SELECT CAST(ts AS DATE) AS day,
           |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(value) AS avg_value,
           |       CAST(CASE WHEN sum(CASE WHEN event_type = 'error' THEN value ELSE 0 END) > 0
           |            THEN 1 ELSE 0 END AS INT) AS is_error_day
           |FROM events GROUP BY 1""".stripMargin),
    (spark, dir) =>
      Tables.events(spark, dir)
        .groupBy(col("ts").cast("date").as("day"))
        .agg(
          moneyAvg(col("value")).as("avg_value"),
          (sum(when(col("event_type") === "error", col("value")).otherwise(0.0)) > 0)
            .cast("int").as("is_error_day")))

  /** A14+J3: per-entity daily demand agg joined to a broadcast dim
    * (zone_forecast.py:37-56) — events per (user, day) + customer lookup.
    */
  val a14EntityDaily = QueryDef(
    "a14_entity_daily",
    Some("""SELECT e.user_id, CAST(e.ts AS DATE) AS day, count(*) AS n,
           |       CAST(sum(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) / count(e.value) AS avg_value, c.c_name
           |FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
           |GROUP BY 1, 2, 5""".stripMargin),
    (spark, dir) => {
      val e = Tables.events(spark, dir)
      val c = Tables.customer(spark, dir)
      e.join(broadcast(c), e("user_id") === c("c_custkey"), "left")
        .groupBy(e("user_id"), e("ts").cast("date").as("day"), c("c_name"))
        .agg(count(lit(1)).as("n"), moneyAvg(e("value")).as("avg_value"))
        .select(col("user_id"), col("day"), col("n"), col("avg_value"), col("c_name"))
    })

  /** O2: top-k with a deterministic tiebreak (TakeOrderedAndProject —
    * fare_forecasting_dag.py:36-37's ORDER BY … DESC LIMIT shape).
    */
  val o2TopK = QueryDef(
    "o2_top_k",
    Some("""SELECT o_orderkey, round(o_totalprice, 4) AS total
           |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin),
    (spark, dir) =>
      Tables.orders(spark, dir)
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)
        .select(col("o_orderkey"), r4(col("o_totalprice")).as("total")))

  /** U1: union of two branch projections with a lineage tag
    * (Forecast_evaluation.py:78-86's concat shape).
    */
  val u1Union = QueryDef(
    "u1_union",
    Some("""SELECT 'high_value' AS src, event_id, round(value, 4) AS value
           |FROM events WHERE value > 150
           |UNION ALL
           |SELECT 'error' AS src, event_id, round(value, 4) AS value
           |FROM events WHERE event_type = 'error'""".stripMargin),
    (spark, dir) => {
      val e = Tables.events(spark, dir)
      val hi = e.filter(col("value") > 150)
        .select(lit("high_value").as("src"), col("event_id"), r4(col("value")).as("value"))
      val err = e.filter(col("event_type") === "error")
        .select(lit("error").as("src"), col("event_id"), r4(col("value")).as("value"))
      hi.unionByName(err)
    })

  /** A15/M5: regression error metrics (MAE / MAPE) — per-group prediction
    * = that event_type's global mean (join back), errors aggregated
    * (Forecast_evaluation.py:58-65's sklearn metrics as one agg pass).
    */
  val a15ErrorMetrics = QueryDef(
    "a15_error_metrics",
    Some("""WITH pred AS (
           |  SELECT event_type, avg(value) AS predicted FROM events GROUP BY 1)
           |SELECT e.event_type,
           |       count(*) AS n,
           |       round(avg(abs(e.value - p.predicted)), 4) AS mae,
           |       round(avg(abs(e.value - p.predicted) / abs(e.value)), 4) AS mape
           |FROM events e JOIN pred p ON e.event_type = p.event_type
           |WHERE e.value != 0
           |GROUP BY 1""".stripMargin),
    (spark, dir) => {
      val e = Tables.events(spark, dir)
      val pred = e.groupBy(col("event_type")).agg(avg(col("value")).as("predicted"))
      e.filter(col("value") =!= 0)
        .join(broadcast(pred), Seq("event_type"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          r4(avg(abs(col("value") - col("predicted")))).as("mae"),
          r4(avg(abs(col("value") - col("predicted")) / abs(col("value")))).as("mape"))
    })

  /** As-of (temporal) join: each event picks up the user's most recent
    * order at event time (inclusive). Spark side is the shuffle-once
    * union+window formulation (operators.AsOfJoin); the oracle is DuckDB's
    * native ASOF JOIN. Right side is deduped to one order per (user, ts)
    * first — as-of semantics are undefined under timestamp ties.
    */
  val jxAsOfJoin = QueryDef(
    "jx_asof_join",
    Some("""WITH o AS (
           |  SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
           |  FROM orders GROUP BY 1, 2)
           |SELECT e.event_id, e.user_id,
           |       strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
           |       o.o_orderkey AS last_order_id
           |FROM events e
           |ASOF LEFT JOIN o ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate""".stripMargin),
    (spark, dir) => {
      val e = Tables.events(spark, dir)
        .select(col("event_id"), col("user_id"), col("ts"))
      val o = Tables.orders(spark, dir)
        .groupBy(col("o_custkey").as("user_id"), col("o_orderdate"))
        .agg(max(col("o_orderkey")).as("last_order_id"))
      graft.operators.AsOfJoin.join(e, o, key = "user_id",
          leftTs = "ts", rightTs = "o_orderdate", rightCols = Seq("last_order_id"))
        .select(col("event_id"), col("user_id"),
          tsStr(col("ts")).as("ts_s"), col("last_order_id"))
    })

  /** Nearest-direction as-of join (pandas merge_asof
    * direction='nearest'): each purchase attaches its time-closest click
    * by the same user, either side, equal-distance ties backward. The
    * oracle is the lateral nearest-1 subquery DuckDB executes directly;
    * the engine is `AsOfJoin.joinNearest`'s one-shuffle dual-frame
    * window (no lateral, no range join).
    */
  val jxAsOfNearest = QueryDef(
    "jx_asof_nearest",
    Some("""WITH p AS (SELECT user_id, event_id, ts FROM events
           |           WHERE event_type = 'purchase'),
           |c AS (SELECT user_id, event_id, ts FROM events
           |      WHERE event_type = 'click')
           |SELECT p.user_id, p.event_id AS purchase_id,
           |       n.click_id, n.asof_dir,
           |       round(n.dist_us / 1000000.0, 4) AS dist_sec
           |FROM p LEFT JOIN LATERAL (
           |  SELECT c.event_id AS click_id,
           |         CASE WHEN c.ts <= p.ts THEN 'backward'
           |              ELSE 'forward' END AS asof_dir,
           |         abs(epoch_us(c.ts) - epoch_us(p.ts)) AS dist_us
           |  FROM c WHERE c.user_id = p.user_id
           |  ORDER BY abs(epoch_us(c.ts) - epoch_us(p.ts)),
           |           CASE WHEN c.ts <= p.ts THEN 0 ELSE 1 END, c.event_id
           |  LIMIT 1) n ON TRUE""".stripMargin),
    (spark, dir) => {
      val e = Tables.events(spark, dir)
      val p = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"), col("ts"))
      val c = e.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_id"), col("ts"))
      graft.operators.AsOfJoin.joinNearest(p, c, key = "user_id",
          leftTs = "ts", rightTs = "ts", rightCols = Seq("click_id"))
        .select(col("user_id"), col("event_id").as("purchase_id"),
          col("click_id"), col("asof_dir"),
          round(col("asof_dist_us") / lit(1000000.0), 4).as("dist_sec"))
    })

  /** Range (interval) join: orders placed inside each probe shipment's
    * 14-day delivery window. Spark side is the bucketized equi-join
    * (operators.RangeJoin — no BroadcastNestedLoopJoin, shuffle-bounded);
    * the oracle is the plain inequality join DuckDB optimizes natively.
    */
  val jxRangeJoin = QueryDef(
    "jx_range_join",
    Some("""SELECT l.l_orderkey AS ship_orderkey, l.l_linenumber, o.o_orderkey
           |FROM lineitem l JOIN orders o
           |  ON o.o_orderdate >= l.l_shipdate
           | AND o.o_orderdate < l.l_shipdate + INTERVAL 14 DAY
           |WHERE l.l_orderkey % 500 = 0""".stripMargin),
    (spark, dir) => {
      val iv = Tables.lineitem(spark, dir)
        .filter(col("l_orderkey") % 500 === 0)
        .select(col("l_orderkey").as("ship_orderkey"), col("l_linenumber"),
          col("l_shipdate").as("w_start"),
          (col("l_shipdate") + expr("INTERVAL 14 DAYS")).as("w_end"))
      val pts = Tables.orders(spark, dir)
        .select(col("o_orderkey"), col("o_orderdate"))
      // no explicit bucketDays: derived from the interval-span census
      // (all spans are 14 days here → auto picks 14) — the graded query
      // exercises the default path so a census regression can't hide
      graft.operators.RangeJoin.intervalJoin(
          pts, "o_orderdate", iv, "w_start", "w_end")
        .select(col("ship_orderkey"), col("l_linenumber"), col("o_orderkey"))
    })

  /** Interval×interval OVERLAP join: pairs of the same customer's orders
    * whose processing windows (order date + 1..5 days, keyed off the
    * order id so both engines derive identical spans) intersect — the
    * concurrent-orders shape. Spark side is the bucketized overlap join
    * with first-common-bucket emission (operators.RangeJoin.overlapJoin:
    * no nested-loop, no pair dedup shuffle); the oracle is DuckDB's
    * plain inequality join.
    */
  val jxIntervalOverlap = QueryDef(
    "jx_interval_overlap",
    Some("""WITH iv AS (
           |  SELECT o_custkey AS c, o_orderkey AS k, o_orderdate AS s,
           |         o_orderdate + INTERVAL ((o_orderkey % 5) + 1) DAY AS e
           |  FROM orders)
           |SELECT a.c, a.k AS k_a, b.k AS k_b,
           |       CAST(date_diff('day', greatest(a.s, b.s), least(a.e, b.e)) AS BIGINT)
           |         AS overlap_days
           |FROM iv a JOIN iv b
           |  ON a.c = b.c AND a.k < b.k AND a.s < b.e AND b.s < a.e""".stripMargin),
    (spark, dir) => {
      def iv(suf: String) = Tables.orders(spark, dir).select(
        col("o_custkey").as("c"), col("o_orderkey").as(s"k$suf"),
        col("o_orderdate").as(s"s$suf"),
        (col("o_orderdate") +
          make_dt_interval(col("o_orderkey") % 5 + 1)).as(s"e$suf"))
      // auto bucket width from the span census (spans are 1..5 days →
      // median 3); bucketization is correctness-neutral, so the oracle
      // pins the auto path end to end
      graft.operators.RangeJoin.overlapJoin(
          iv("_a"), "s_a", "e_a", iv("_b"), "s_b", "e_b",
          keys = Seq("c"))
        .filter(col("k_a") < col("k_b"))
        .select(col("c"), col("k_a"), col("k_b"),
          datediff(least(col("e_a"), col("e_b")),
            greatest(col("s_a"), col("s_b"))).cast("long").as("overlap_days"))
    })

  /** A18: pivot — event-type counts as columns per day. Spark's `pivot`
    * relational operator (explicit value list → deterministic schema) vs
    * the portable conditional-aggregation oracle; empty cells coalesced
    * to 0 to match SUM(CASE...)'s semantics.
    */
  val a18Pivot = QueryDef(
    "a18_pivot",
    Some("""SELECT CAST(ts AS DATE) AS d,
           |       CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
           |       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
           |       CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
           |       CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
           |       CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error
           |FROM events GROUP BY 1""".stripMargin),
    (spark, dir) => {
      val types = Seq("click", "purchase", "view", "signup", "error")
      val p = Tables.events(spark, dir)
        .groupBy(col("ts").cast("date").as("d"))
        .pivot("event_type", types)
        .agg(count(lit(1)))
      p.select(col("d") +: types.map(t =>
        coalesce(col(t), lit(0L)).as(s"n_$t")): _*)
    })

  /** A19: CUBE — the full subtotal lattice over (returnflag, linestatus),
    * one pass; grouping indicators disambiguate subtotal rows.
    */
  val a19Cube = QueryDef(
    "a19_cube",
    Some("""SELECT l_returnflag, l_linestatus,
           |       CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
           |       CAST(GROUPING(l_linestatus) AS INT) AS g_status,
           |       count(*) AS n,
           |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
           |FROM lineitem
           |GROUP BY CUBE(l_returnflag, l_linestatus)""".stripMargin),
    (spark, dir) =>
      Tables.lineitem(spark, dir)
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(
          grouping(col("l_returnflag")).cast("int").as("g_flag"),
          grouping(col("l_linestatus")).cast("int").as("g_status"),
          count(lit(1)).as("n"),
          moneySum(col("l_quantity")).as("qty")))

  /** A20: explicit GROUPING SETS — the general lattice form (rollup and
    * cube are special cases): per-flag totals and per-status totals in
    * one pass, no self-union.
    */
  val a20GroupingSets = QueryDef(
    "a20_grouping_sets",
    Some("""SELECT l_returnflag, l_linestatus,
           |       count(*) AS n,
           |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
           |FROM lineitem
           |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))""".stripMargin),
    (spark, dir) => {
      Tables.lineitem(spark, dir).createOrReplaceTempView("gs_lineitem")
      spark.sql(
        """SELECT l_returnflag, l_linestatus,
          |       count(*) AS n,
          |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
          |FROM gs_lineitem
          |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))""".stripMargin)
    })

  /** U3: unpivot (wide → long) — Spark's `unpivot` relational operator vs
    * the portable stacked-UNION oracle.
    */
  val u3Unpivot = QueryDef(
    "u3_unpivot",
    Some("""WITH d AS (
           |  SELECT CAST(ts AS DATE) AS d,
           |         CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
           |         CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view
           |  FROM events GROUP BY 1)
           |SELECT d, 'n_click' AS metric, n_click AS n FROM d
           |UNION ALL
           |SELECT d, 'n_view' AS metric, n_view AS n FROM d""".stripMargin),
    (spark, dir) => {
      val wide = Tables.events(spark, dir)
        .groupBy(col("ts").cast("date").as("d"))
        .agg(
          count(when(col("event_type") === "click", 1)).as("n_click"),
          count(when(col("event_type") === "view", 1)).as("n_view"))
      wide.unpivot(Array(col("d")), Array(col("n_click"), col("n_view")),
        "metric", "n")
    })

  /** F18: try_cast — malformed casts yield NULL instead of failing the
    * job (the ingest-resilience scalar; ANSI-mode-safe).
    */
  val f18TryCast = QueryDef(
    "f18_try_cast",
    Some("""SELECT doc_id,
           |       TRY_CAST(lang AS INTEGER) AS lang_int,
           |       TRY_CAST(CAST(n_chars AS VARCHAR) AS INTEGER) AS n_int,
           |       TRY_CAST(substr(text, 1, 2) AS DOUBLE) AS junk_double
           |FROM documents""".stripMargin),
    (spark, dir) =>
      Tables.documents(spark, dir).select(
        col("doc_id"),
        expr("try_cast(lang AS int)").as("lang_int"),
        expr("try_cast(cast(n_chars AS string) AS int)").as("n_int"),
        expr("try_cast(substring(text, 1, 2) AS double)").as("junk_double")))

  /** J7: null-safe equi-join (`<=>` ≡ IS NOT DISTINCT FROM) — the NULL
    * group from each side matches, unlike a bare `=` which drops it.
    */
  val j7NullSafeJoin = QueryDef(
    "j7_null_safe_join",
    Some("""WITH a AS (
           |  SELECT CASE WHEN value > 50 THEN event_type END AS k, count(*) AS n_even
           |  FROM events WHERE user_id % 2 = 0 GROUP BY 1),
           |b AS (
           |  SELECT CASE WHEN value > 50 THEN event_type END AS k, count(*) AS n_odd
           |  FROM events WHERE user_id % 2 = 1 GROUP BY 1)
           |SELECT a.k, a.n_even, b.n_odd
           |FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k""".stripMargin),
    (spark, dir) => {
      val e = Tables.events(spark, dir)
      def side(parity: Int, outCol: String) = e
        .filter(col("user_id") % 2 === parity)
        .groupBy(when(col("value") > 50, col("event_type")).as("k"))
        .agg(count(lit(1)).as(outCol))
      val a = side(0, "n_even")
      val b = side(1, "n_odd").withColumnRenamed("k", "kb")
      a.join(b, a("k") <=> b("kb"))
        .select(col("k"), col("n_even"), col("n_odd"))
    })

  /** A16 (OLAP extension beyond the reference): ROLLUP with grouping
    * indicators — subtotal lattice over (flag, status) in one pass.
    * Spark `rollup` ≡ DuckDB GROUP BY ROLLUP; GROUPING() flags
    * distinguish real NULL keys from subtotal rows.
    */
  val a16Rollup = QueryDef(
    "a16_rollup",
    Some("""SELECT l_returnflag, l_linestatus,
           |       CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
           |       CAST(GROUPING(l_linestatus) AS INT) AS g_status,
           |       count(*) AS n,
           |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
           |FROM lineitem
           |GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin),
    (spark, dir) =>
      Tables.lineitem(spark, dir)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(
          grouping(col("l_returnflag")).cast("int").as("g_flag"),
          grouping(col("l_linestatus")).cast("int").as("g_status"),
          count(lit(1)).as("n"),
          moneySum(col("l_extendedprice")).as("revenue"))
        .select(col("l_returnflag"), col("l_linestatus"),
          col("g_flag"), col("g_status"), col("n"), col("revenue")))

  /** O2/W4 via the custom physical operator: top-3 events per user by
    * (value, event_id) through `plans.TopK` — partial per-partition
    * k-heaps, one key exchange, final merge (vs the window formulation's
    * full shuffle + sort). Struct ordering makes ties impossible, so the
    * row_number oracle pins it exactly.
    */
  val o3TopKPerKey = QueryDef(
    "o3_topk_per_key",
    Some("""SELECT user_id, event_id, round(value, 4) AS value FROM (
           |  SELECT user_id, event_id, value, row_number() OVER (
           |    PARTITION BY user_id ORDER BY value DESC, event_id DESC) AS rn
           |  FROM events) WHERE rn <= 3""".stripMargin),
    (spark, dir) => {
      val e = Tables.events(spark, dir)
        .select(col("user_id"), col("event_id"), col("value"))
        .withColumn("__ord", struct(col("value"), col("event_id")))
      graft.plans.TopK.perKey(e, Seq("user_id"), "__ord", k = 3)
        .select(col("user_id"), col("event_id"), r4(col("value")).as("value"))
    })

  /** U2/U3: INTERSECT and EXCEPT (set semantics — the reference covers
    * EXCEPT's role with anti-joins; here as first-class distinct set ops).
    */
  val u2SetOps = QueryDef(
    "u2_set_ops",
    Some("""SELECT 'intersect' AS op, count(*) AS n FROM (
           |  SELECT user_id FROM events WHERE event_type = 'purchase'
           |  INTERSECT
           |  SELECT user_id FROM events WHERE event_type = 'error')
           |UNION ALL
           |SELECT 'except' AS op, count(*) AS n FROM (
           |  SELECT user_id FROM events WHERE event_type = 'purchase'
           |  EXCEPT
           |  SELECT user_id FROM events WHERE event_type = 'error')""".stripMargin),
    (spark, dir) => {
      val e = Tables.events(spark, dir)
      val purchasers = e.filter(col("event_type") === "purchase").select("user_id")
      val erroring = e.filter(col("event_type") === "error").select("user_id")
      val i = purchasers.intersect(erroring)
        .agg(count(lit(1)).as("n")).select(lit("intersect").as("op"), col("n"))
      val x = purchasers.except(erroring)
        .agg(count(lit(1)).as("n")).select(lit("except").as("op"), col("n"))
      i.unionByName(x)
    })

  /** U4: multiset (ALL) set operations — EXCEPT ALL / INTERSECT ALL keep
    * duplicity (bag semantics), the axis `u2_set_ops`' DISTINCT forms
    * erase: a user purchasing 3× and erroring once keeps 2 rows in
    * EXCEPT ALL and 1 in INTERSECT ALL. Counts pin the multiset math
    * cross-engine.
    */
  val u4MultisetOps = QueryDef(
    "u4_multiset_ops",
    Some("""SELECT 'except_all' AS op, CAST(count(*) AS BIGINT) AS n FROM (
           |  SELECT user_id FROM events WHERE event_type = 'purchase'
           |  EXCEPT ALL
           |  SELECT user_id FROM events WHERE event_type = 'error')
           |UNION ALL
           |SELECT 'intersect_all' AS op, CAST(count(*) AS BIGINT) AS n FROM (
           |  SELECT user_id FROM events WHERE event_type = 'purchase'
           |  INTERSECT ALL
           |  SELECT user_id FROM events WHERE event_type = 'error')""".stripMargin),
    (spark, dir) => {
      val e = Tables.events(spark, dir)
      val purchasers = e.filter(col("event_type") === "purchase").select("user_id")
      val erroring = e.filter(col("event_type") === "error").select("user_id")
      val x = purchasers.exceptAll(erroring)
        .agg(count(lit(1)).as("n")).select(lit("except_all").as("op"), col("n"))
      val i = purchasers.intersectAll(erroring)
        .agg(count(lit(1)).as("n")).select(lit("intersect_all").as("op"), col("n"))
      x.unionByName(i)
    })

  /** A17: exact percentiles (median/p90) — Spark `percentile` and DuckDB
    * `quantile_cont` share linear-interpolation semantics; the
    * bounded-memory approximate path is `Scale.approxQuantiles`.
    */
  val a17Percentile = QueryDef(
    "a17_percentile",
    Some("""SELECT event_type,
           |       round(quantile_cont(value, 0.5), 4) AS p50,
           |       round(quantile_cont(value, 0.9), 4) AS p90
           |FROM events GROUP BY 1""".stripMargin),
    (spark, dir) =>
      Tables.events(spark, dir)
        .groupBy(col("event_type"))
        .agg(
          r4(expr("percentile(value, 0.5)")).as("p50"),
          r4(expr("percentile(value, 0.9)")).as("p90")))

  /** A21: winsorized (5%/95%-clamped) mean per group — the robust-stats
    * step that keeps a handful of corrupt meters from dragging a group
    * average (the standard outlier treatment before anomaly flags like
    * int_trips_enriched's become thresholds).
    *
    * Two passes by construction (the clamp bounds ARE group aggregates):
    * pass 1 computes per-group exact percentiles (5 groups → rows, not
    * data, shuffle); pass 2 re-scans the fact joined to that tiny bounds
    * table — broadcast, so the big side never shuffles and the final agg
    * is map-side partial. Same `percentile` ≡ `quantile_cont` linear-
    * interpolation contract a17 pins.
    */
  val a21Winsorized = QueryDef(
    "a21_winsorized",
    Some("""WITH q AS (
           |  SELECT event_type, quantile_cont(value, 0.05) AS p05,
           |         quantile_cont(value, 0.95) AS p95
           |  FROM events GROUP BY 1)
           |SELECT e.event_type,
           |       round(any_value(q.p05), 4) AS p05,
           |       round(any_value(q.p95), 4) AS p95,
           |       round(avg(least(greatest(e.value, q.p05), q.p95)), 4) AS win_mean,
           |       round(avg(e.value), 4) AS raw_mean
           |FROM events e JOIN q USING (event_type)
           |GROUP BY e.event_type""".stripMargin),
    (spark, dir) => {
      val e = Tables.events(spark, dir)
      val q = e.groupBy("event_type").agg(
        expr("percentile(value, 0.05)").as("p05"),
        expr("percentile(value, 0.95)").as("p95"))
      e.join(broadcast(q), Seq("event_type"))
        .groupBy("event_type")
        .agg(
          r4(first(col("p05"))).as("p05"),
          r4(first(col("p95"))).as("p95"),
          r4(avg(least(greatest(col("value"), col("p05")), col("p95"))))
            .as("win_mean"),
          r4(avg(col("value"))).as("raw_mean"))
    })

  /** A22: cohort retention — users bucketed by first-seen day, distinct
    * active users per (cohort, day offset). The standard BI retention
    * triangle. First-seen is a partial-agg min; the distinct collapse
    * happens on (user, cohort, offset) tuples — the fact table's event
    * payload never survives the first projection.
    */
  val a22CohortRetention = QueryDef(
    "a22_cohort_retention",
    Some("""WITH f AS (SELECT user_id, min(CAST(ts AS DATE)) AS cohort
           |           FROM events GROUP BY 1),
           |a AS (SELECT DISTINCT e.user_id, f.cohort,
           |             datediff('day', f.cohort, CAST(e.ts AS DATE)) AS offset_days
           |      FROM events e JOIN f ON e.user_id = f.user_id)
           |SELECT cohort, offset_days, CAST(count(*) AS BIGINT) AS n_users
           |FROM a GROUP BY 1, 2""".stripMargin),
    (spark, dir) => {
      val e = Tables.events(spark, dir)
        .select(col("user_id"), col("ts").cast("date").as("day"))
      val f = e.groupBy("user_id").agg(min(col("day")).as("cohort"))
      e.join(f, Seq("user_id"))
        .select(col("user_id"), col("cohort"),
          datediff(col("day"), col("cohort")).cast("long").as("offset_days"))
        .distinct()
        .groupBy("cohort", "offset_days")
        .agg(count(lit(1)).as("n_users"))
    })

  /** J8: snapshot reconciliation — the Reconcile.diffReport operator over
    * two deterministic "loads" of orders (old = all but keys ≡3 mod 13;
    * new = all but keys ≡7 mod 13, prices bumped 10% on keys ≡0 mod 5),
    * classifying every key added/removed/changed/unchanged with a key
    * checksum per class. One full-outer shuffle join — the minimal exact
    * diff; the price comparison is IEEE-identical in any engine since
    * both recompute the same ×1.1.
    */
  val j8TableDiff = QueryDef(
    "j8_table_diff",
    Some("""WITH a AS (SELECT o_orderkey AS k, o_totalprice AS v
           |           FROM orders WHERE o_orderkey % 13 != 3),
           |b AS (SELECT o_orderkey AS k,
           |             CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice * 1.1
           |                  ELSE o_totalprice END AS v
           |      FROM orders WHERE o_orderkey % 13 != 7),
           |d AS (SELECT coalesce(a.k, b.k) AS k,
           |             CASE WHEN a.k IS NULL THEN 'added'
           |                  WHEN b.k IS NULL THEN 'removed'
           |                  WHEN a.v IS DISTINCT FROM b.v THEN 'changed'
           |                  ELSE 'unchanged' END AS status
           |      FROM a FULL OUTER JOIN b ON a.k = b.k)
           |SELECT status, CAST(count(*) AS BIGINT) AS cnt,
           |       CAST(sum(k) AS BIGINT) AS key_checksum
           |FROM d GROUP BY 1""".stripMargin),
    (spark, dir) => {
      val o = Tables.orders(spark, dir)
      val oldLoad = o.filter(col("o_orderkey") % 13 =!= 3)
        .select(col("o_orderkey").as("k"), col("o_totalprice").as("v"))
      val newLoad = o.filter(col("o_orderkey") % 13 =!= 7)
        .select(col("o_orderkey").as("k"),
          when(col("o_orderkey") % 5 === 0, col("o_totalprice") * 1.1)
            .otherwise(col("o_totalprice")).as("v"))
      graft.operators.Reconcile.diffReport(oldLoad, newLoad,
        keyCols = Seq("k"), valueCols = Seq("v"), checksumCol = "k")
    })

  /** J9: Bloom-filter-pruned semi join (`Scale.bloomSemiJoin`) — the
    * explicit runtime-filter pattern: might_contain pushed into the fact
    * scan ahead of the exact LEFT SEMI close. Result is EXACTLY the
    * plain semi join (no false negatives; the exact join removes false
    * positives), which is what the oracle checks; the plan property
    * (might_contain predicate present) is ExplainCheck's job.
    */
  val j9BloomSemi = QueryDef(
    "j9_bloom_semi",
    Some("""SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n_items,
           |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
           |FROM lineitem
           |WHERE l_orderkey IN (SELECT o_orderkey FROM orders
           |                     WHERE o_totalprice > 400000)
           |GROUP BY 1""".stripMargin),
    (spark, dir) => {
      val hot = Tables.orders(spark, dir)
        .filter(col("o_totalprice") > 400000).select("o_orderkey")
      graft.operators.Scale.bloomSemiJoin(
          Tables.lineitem(spark, dir), hot, "l_orderkey", "o_orderkey")
        .groupBy("l_orderkey")
        .agg(count(lit(1)).as("n_items"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"))
    })

  /** J10: skew-salted join on the oracle surface. The join key is made
    * deliberately pathological — ~70% of lineitem rows collapse onto key
    * 0 — the shape where a plain shuffle join puts one reducer on the
    * critical path. `Scale.saltedJoin` splits the hot key across 8 salted
    * reducers (small side replicated 8×); the oracle checks the result
    * is EXACTLY the plain join's aggregate, which is the salting
    * correctness contract (ScaleSpec holds the row-level equality; this
    * pins it against an independent engine).
    */
  val j10SaltedSkew = QueryDef(
    "j10_salted_skew",
    Some("""WITH l AS (SELECT CASE WHEN l_partkey % 10 < 7 THEN 0
           |                       ELSE l_partkey % 10 END AS k,
           |                  l_quantity
           |           FROM lineitem),
           |d AS (SELECT range AS k, 'grp_' || CAST(range AS VARCHAR) AS label
           |      FROM range(0, 10))
           |SELECT label, CAST(count(*) AS BIGINT) AS n_rows,
           |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
           |FROM l JOIN d USING (k)
           |GROUP BY 1""".stripMargin),
    (spark, dir) => {
      import spark.implicits._
      val l = Tables.lineitem(spark, dir)
        .select(when(col("l_partkey") % 10 < 7, 0L)
          .otherwise(col("l_partkey") % 10).as("k"), col("l_quantity"))
      val dim = (0L until 10L).map(k => (k, s"grp_$k")).toDF("k", "label")
      graft.operators.Scale.saltedJoin(l, dim, "k", saltFactor = 8)
        .groupBy("label")
        .agg(count(lit(1)).as("n_rows"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"))
    })

  /** A23: RFM customer segmentation — recency/frequency/monetary
    * quintiles (ntile over a deterministic (metric, custkey) order) and
    * the 5×5×5 segment census. The per-customer base is dimension-
    * sized (one row per customer), so the global ntile sort is a
    * dimension sort, not a fact sort; at 100 TB customer counts you'd
    * swap ntile for approx-quantile thresholds — the substitution
    * qc_quantile_accuracy quantifies.
    */
  val a23RfmSegments = QueryDef(
    "a23_rfm_segments",
    Some("""WITH mx AS (SELECT max(o_orderdate) AS d FROM orders),
           |base AS (SELECT o_custkey,
           |         CAST(date_diff('day', max(o_orderdate), (SELECT d FROM mx)) AS BIGINT) AS recency_days,
           |         CAST(count(*) AS BIGINT) AS frequency,
           |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS monetary
           |         FROM orders GROUP BY 1),
           |s AS (SELECT o_custkey,
           |        ntile(5) OVER (ORDER BY recency_days, o_custkey) AS r,
           |        ntile(5) OVER (ORDER BY frequency DESC, o_custkey) AS f,
           |        ntile(5) OVER (ORDER BY monetary DESC, o_custkey) AS m,
           |        monetary
           |      FROM base)
           |SELECT r, f, m, CAST(count(*) AS BIGINT) AS n_customers,
           |       round(sum(monetary), 4) AS total_monetary
           |FROM s GROUP BY 1, 2, 3""".stripMargin),
    (spark, dir) => {
      val o = Tables.orders(spark, dir)
      val mx = o.agg(max(col("o_orderdate")).as("d"))
      val base = o.groupBy(col("o_custkey"))
        .agg(max(col("o_orderdate")).as("last_order"),
          count(lit(1)).as("frequency"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("monetary"))
        .crossJoin(broadcast(mx))
        .select(col("o_custkey"),
          datediff(col("d"), col("last_order")).cast("long").as("recency_days"),
          col("frequency"), col("monetary"))
      import org.apache.spark.sql.expressions.Window
      // unpartitioned BY CONTRACT: global quintiles are a total order
      // over the customer census (|customers|-sized, never fact-sized);
      // the single-partition WindowExec warning is expected here
      val s = base.select(col("monetary"),
        ntile(5).over(Window.orderBy(col("recency_days"), col("o_custkey"))).as("r"),
        ntile(5).over(Window.orderBy(col("frequency").desc, col("o_custkey"))).as("f"),
        ntile(5).over(Window.orderBy(col("monetary").desc, col("o_custkey"))).as("m"))
      s.groupBy(col("r"), col("f"), col("m"))
        .agg(count(lit(1)).as("n_customers"),
          round(sum(col("monetary")), 4).as("total_monetary"))
    })

  /** A24: exact equi-width histogram — the profiling primitive behind
    * every column-stats page. Bucketing runs on integer cents with
    * integer ceil-width and integer division, so bucket edges are
    * exact on any engine (the tx_length_bands rule: never let a float
    * log/divide decide a BUCKET; floats are fine as VALUES). One
    * metadata-scale min/max probe, then one map-side-partial
    * aggregation of the fact scan.
    */
  val a24Histogram = QueryDef(
    "a24_histogram",
    Some("""WITH c AS (SELECT CAST(floor(l_extendedprice * 100) AS BIGINT) AS cents FROM lineitem),
           |b AS (SELECT min(cents) AS lo,
           |             CAST(ceil((max(cents) - min(cents) + 1) / 16.0) AS BIGINT) AS w FROM c)
           |SELECT CAST(least((cents - lo) // w, 15) AS INT) AS bucket,
           |       CAST(count(*) AS BIGINT) AS n,
           |       round(min(cents) / 100.0, 2) AS lo_val,
           |       round(max(cents) / 100.0, 2) AS hi_val
           |FROM c, b GROUP BY 1""".stripMargin),
    (spark, dir) => {
      val c = Tables.lineitem(spark, dir)
        .select(floor(col("l_extendedprice") * 100).cast("long").as("cents"))
      val b = c.agg(min(col("cents")).as("lo"),
        ceil((max(col("cents")) - min(col("cents")) + 1) / 16.0).cast("long").as("w"))
      c.crossJoin(broadcast(b))
        .select(least(expr("(cents - lo) div w"), lit(15L)).cast("int").as("bucket"),
          col("cents"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"),
          round(min(col("cents")) / 100.0, 2).as("lo_val"),
          round(max(col("cents")) / 100.0, 2).as("hi_val"))
    })

  /** A25: Kaplan-Meier time-to-repurchase — survival analysis of the
    * gap between each user's first and second purchase, right-censored
    * at the observation horizon for one-purchase users. The per-user
    * duration census is one fact pass; the risk table (n_risk via a
    * reverse cumulative sum) and the survival curve are windows over
    * the handful of distinct event times — metadata-scale, so the
    * unpartitioned window is a dozen rows, never the fact table.
    * Hazards are 6dp-rounded BEFORE the product so both engines
    * compound identical terms; the hazard=1 terminal step maps to a
    * -1e9 log-sum sentinel (exp → exact 0) instead of ln(0).
    */
  val a25Survival = QueryDef(
    "a25_survival",
    Some("""WITH p AS (SELECT user_id, epoch_us(ts) AS tsl,
           |                  row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
           |           FROM events WHERE event_type = 'purchase'),
           |mx AS (SELECT max(epoch_us(ts)) AS m FROM events),
           |u AS (SELECT p1.user_id,
           |             CAST(floor((coalesce(p2.tsl, (SELECT m FROM mx)) - p1.tsl) / 86400000000.0) AS BIGINT) AS dur_days,
           |             CASE WHEN p2.tsl IS NULL THEN 0 ELSE 1 END AS observed
           |      FROM (SELECT * FROM p WHERE rn = 1) p1
           |      LEFT JOIN (SELECT * FROM p WHERE rn = 2) p2 USING (user_id)),
           |rt AS (SELECT dur_days AS t_days,
           |              CAST(sum(observed) AS BIGINT) AS n_events,
           |              CAST(count(*) AS BIGINT) AS n_exits
           |       FROM u GROUP BY 1),
           |km AS (SELECT t_days, n_events,
           |              CAST(sum(n_exits) OVER (ORDER BY t_days DESC) AS BIGINT) AS n_risk
           |       FROM rt),
           |h AS (SELECT t_days, n_risk, n_events,
           |             round(n_events * 1.0 / n_risk, 6) AS hazard
           |      FROM km WHERE n_events > 0)
           |SELECT t_days, n_risk, n_events, hazard,
           |       round(exp(sum(CASE WHEN hazard >= 1 THEN -1e9 ELSE ln(1 - hazard) END)
           |                 OVER (ORDER BY t_days)), 4) AS survival
           |FROM h""".stripMargin),
    (spark, dir) => {
      import org.apache.spark.sql.expressions.Window
      val ev = Tables.events(spark, dir)
      val wu = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), unix_micros(col("ts")).as("tsl"),
          row_number().over(wu).as("rn"))
      val mx = ev.agg(max(unix_micros(col("ts"))).as("m"))
      val p1 = p.filter(col("rn") === 1).select(col("user_id"), col("tsl").as("t1"))
      val p2 = p.filter(col("rn") === 2).select(col("user_id"), col("tsl").as("t2"))
      val u = p1.join(p2, Seq("user_id"), "left").crossJoin(broadcast(mx))
        .select(
          floor((coalesce(col("t2"), col("m")) - col("t1")) / 86400000000.0)
            .cast("long").as("dur_days"),
          when(col("t2").isNull, 0).otherwise(1).as("observed"))
      val rt = u.groupBy(col("dur_days").as("t_days"))
        .agg(sum(col("observed")).cast("long").as("n_events"),
          count(lit(1)).as("n_exits"))
      // unpartitioned over the DAY-GRAIN lifetime table (|distinct
      // t_days| rows — calendar-bounded at any scale)
      val km = rt.select(col("t_days"), col("n_events"),
        sum(col("n_exits")).over(Window.orderBy(col("t_days").desc)).as("n_risk"))
      val h = km.filter(col("n_events") > 0)
        .select(col("t_days"), col("n_risk"), col("n_events"),
          round(col("n_events") * 1.0 / col("n_risk"), 6).as("hazard"))
      h.select(col("t_days"), col("n_risk"), col("n_events"), col("hazard"),
        round(exp(sum(when(col("hazard") >= 1, -1e9).otherwise(log(lit(1) - col("hazard"))))
          .over(Window.orderBy(col("t_days")))), 4).as("survival"))
    })

  /** A26: pairwise Pearson correlation matrix over the lineitem
    * numeric columns — the ml_ols trick generalized: every sufficient
    * statistic (n, Σx, Σy, Σxy, Σx², Σy²) is an EXACT DECIMAL sum of
    * 2dp inputs, cast to double only after aggregation, so both
    * engines derive each correlation from bit-identical scalars and
    * the result is exact at 4dp (never trusting a built-in corr()'s
    * engine-specific accumulation order). One partial-aggregable pass
    * computes all six pairs; the matrix assembly is a 1-row fan-out.
    */
  val a26CorrMatrix = QueryDef(
    "a26_corr_matrix", {
      val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      val pairs = for { i <- cols.indices; j <- cols.indices if i < j }
        yield (cols(i), cols(j))
      def dsum(e: String) = s"CAST(sum(CAST($e AS DECIMAL(18,2))) AS DOUBLE)"
      def dsum2(a: String, b: String) =
        s"CAST(sum(CAST($a AS DECIMAL(18,2)) * CAST($b AS DECIMAL(18,2))) AS DOUBLE)"
      val blocks = pairs.map { case (a, b) =>
        s"""SELECT '$a' AS col_a, '$b' AS col_b,
           |       round((count(*) * ${dsum2(a, b)} - ${dsum(a)} * ${dsum(b)}) /
           |             (sqrt(count(*) * ${dsum2(a, a)} - ${dsum(a)} * ${dsum(a)}) *
           |              sqrt(count(*) * ${dsum2(b, b)} - ${dsum(b)} * ${dsum(b)})), 4) AS pearson_r
           |FROM lineitem""".stripMargin
      }
      Some(blocks.mkString(" UNION ALL "))
    },
    (spark, dir) => {
      val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      def dsum(e: org.apache.spark.sql.Column) =
        sum(e.cast("decimal(18,2)")).cast("double")
      def dsum2(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
        sum(a.cast("decimal(18,2)") * b.cast("decimal(18,2)")).cast("double")
      // ONE scan computes all 15 sufficient statistics (n, 4×Σx, 10×Σxᵢxⱼ
      // for i ≤ j) as a single partial-aggregable census row ...
      val aggs = Seq(count(lit(1)).as("n")) ++
        cols.indices.map(i => dsum(col(cols(i))).as(s"s_$i")) ++
        (for { i <- cols.indices; j <- cols.indices if i <= j }
          yield dsum2(col(cols(i)), col(cols(j))).as(s"q_${i}_$j"))
      def r(i: Int, j: Int) =
        round((col("n") * col(s"q_${i}_$j") - col(s"s_$i") * col(s"s_$j")) /
          (sqrt(col("n") * col(s"q_${i}_$i") - col(s"s_$i") * col(s"s_$i")) *
            sqrt(col("n") * col(s"q_${j}_$j") - col(s"s_$j") * col(s"s_$j"))),
          4)
      // ... and the matrix assembly fans that 1 row out to the 6 pairs
      Tables.lineitem(spark, dir).agg(aggs.head, aggs.tail: _*)
        .select(explode(array((for {
          i <- cols.indices; j <- cols.indices if i < j
        } yield struct(lit(cols(i)).as("col_a"), lit(cols(j)).as("col_b"),
          r(i, j).as("pearson_r"))): _*)).as("p"))
        .select(col("p.col_a"), col("p.col_b"), col("p.pearson_r"))
    })

  val all: Seq[QueryDef] = Seq(
    a23RfmSegments, a24Histogram, a25Survival, a26CorrMatrix,
    j9BloomSemi, j10SaltedSkew,
    a15ErrorMetrics, jxAsOfJoin, jxAsOfNearest, jxRangeJoin, jxIntervalOverlap, a16Rollup,
    a18Pivot, a19Cube, u4MultisetOps,
    a20GroupingSets, u3Unpivot, f18TryCast, a21Winsorized, a22CohortRetention,
    j7NullSafeJoin, o3TopKPerKey, u2SetOps, a17Percentile, j8TableDiff,
    s3ScanProject, p3PositiveFilter, p5ThetaFilter, p9SentinelExclusion,
    a4DailyAgg, a5ConditionalCounts, a1HourlyMaxBy, j2AggThenJoin,
    j1LeftJoinResidual, j3BroadcastDim, j4AntiJoin, j5MergeInsertOnly,
    j6MergeUpsert,
    a7GroupPairHaving, a8Mode, a10MinMax, a11DistinctHours, a13FlagAgg,
    a14EntityDaily, o2TopK, u1Union)
}
