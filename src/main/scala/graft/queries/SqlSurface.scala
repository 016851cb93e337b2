package graft.queries

import graft.Tables

/** SQL-text surface: the reference is driven by SQL (dbt models /
  * connector SQL), so capability parity includes running the same
  * declarative SQL through `spark.sql` over registered views — Catalyst
  * plans it identically to the DataFrame formulations. These queries are
  * near-verbatim ports of reference model shapes, executed as SQL text.
  */
object SqlSurface {

  private def run(spark: org.apache.spark.sql.SparkSession, dir: String,
      sql: String): org.apache.spark.sql.DataFrame = {
    Tables.registerAll(spark, dir)
    spark.sql(sql)
  }

  /** The mart_daily_metrics CTE shape (mart_daily_metrics.sql:16-62) as
    * literal SQL text — aggregate-then-join with CTEs, dialect-neutral.
    */
  val sqlMartDaily = QueryDef(
    "sql_mart_daily",
    Some("""WITH daily_orders AS (
           |  SELECT CAST(o_orderdate AS DATE) AS trip_date,
           |         count(*) AS trip_count,
           |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_revenue,
           |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(o_totalprice) AS avg_fare
           |  FROM orders GROUP BY 1),
           |daily_lines AS (
           |  SELECT CAST(l_shipdate AS DATE) AS ship_date,
           |         round(avg(l_quantity), 4) AS avg_qty
           |  FROM lineitem GROUP BY 1)
           |SELECT o.trip_date, o.trip_count, o.total_revenue, o.avg_fare, l.avg_qty
           |FROM daily_orders o LEFT JOIN daily_lines l ON l.ship_date = o.trip_date""".stripMargin),
    (spark, dir) => run(spark, dir,
      """WITH daily_orders AS (
        |  SELECT CAST(o_orderdate AS DATE) AS trip_date,
        |         count(*) AS trip_count,
        |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_revenue,
        |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(o_totalprice) AS avg_fare
        |  FROM orders GROUP BY 1),
        |daily_lines AS (
        |  SELECT CAST(l_shipdate AS DATE) AS ship_date,
        |         round(avg(l_quantity), 4) AS avg_qty
        |  FROM lineitem GROUP BY 1)
        |SELECT o.trip_date, o.trip_count, o.total_revenue, o.avg_fare, l.avg_qty
        |FROM daily_orders o LEFT JOIN daily_lines l ON l.ship_date = o.trip_date""".stripMargin))

  /** HAVING + conditional counts as SQL text (mart_zone_analysis.sql
    * shape), including `count(DISTINCT ...)` for the distinct-aggregate
    * path the DataFrame queries don't otherwise exercise.
    */
  val sqlZoneHaving = QueryDef(
    "sql_zone_having",
    Some("""SELECT l_suppkey,
           |       count(*) AS n,
           |       count(DISTINCT l_orderkey) AS n_orders,
           |       CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS n_returned
           |FROM lineitem
           |GROUP BY 1 HAVING count(*) >= 50""".stripMargin),
    (spark, dir) => run(spark, dir,
      """SELECT l_suppkey,
        |       count(*) AS n,
        |       count(DISTINCT l_orderkey) AS n_orders,
        |       CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS n_returned
        |FROM lineitem
        |GROUP BY 1 HAVING count(*) >= 50""".stripMargin))

  /** Correlated LATERAL subquery as SQL text — top-3 longest docs per
    * source via a per-row dependent subquery with ORDER BY + LIMIT, the
    * dialect feature modern warehouse SQL leans on for top-k-per-group
    * without window functions. Catalyst decorrelates it into a
    * ranked-join plan; DuckDB runs the identical text.
    */
  val sqlLateralTopk = QueryDef(
    "sql_lateral_topk",
    Some("""SELECT s.source, t.doc_id, t.n_tok
           |FROM (SELECT DISTINCT source FROM documents) s,
           |LATERAL (SELECT doc_id, len(string_split(d.text, ' ')) AS n_tok
           |         FROM documents d WHERE d.source = s.source
           |         ORDER BY n_tok DESC, doc_id LIMIT 3) t""".stripMargin),
    (spark, dir) => run(spark, dir,
      """SELECT s.source, t.doc_id, t.n_tok
        |FROM (SELECT DISTINCT source FROM documents) s,
        |LATERAL (SELECT doc_id, size(split(d.text, ' ')) AS n_tok
        |         FROM documents d WHERE d.source = s.source
        |         ORDER BY n_tok DESC, doc_id LIMIT 3) t""".stripMargin))

  /** Window functions as SQL text with the registered native expression
    * (`cosine_sim`) — the custom-Expression-in-SQL path.
    */
  val sqlKnnNative = QueryDef(
    "sql_knn_native",
    Some("""WITH sims AS (
           |  SELECT a.vec_id AS probe_id, b.vec_id AS cand_id,
           |         round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cosine
           |  FROM embeddings a JOIN embeddings b ON a.vec_id != b.vec_id
           |  WHERE a.vec_id % 50 = 0)
           |SELECT probe_id, cand_id, cosine FROM (
           |  SELECT *, row_number() OVER (
           |    PARTITION BY probe_id ORDER BY cosine DESC, cand_id) AS rk
           |  FROM sims) WHERE rk <= 3""".stripMargin),
    (spark, dir) => {
      graft.plans.VectorFunctions.register(spark)
      run(spark, dir,
        """WITH sims AS (
          |  SELECT a.vec_id AS probe_id, b.vec_id AS cand_id,
          |         round(cosine_sim(CAST(a.embedding AS ARRAY<DOUBLE>),
          |                          CAST(b.embedding AS ARRAY<DOUBLE>)), 6) AS cosine
          |  FROM embeddings a JOIN embeddings b ON a.vec_id != b.vec_id
          |  WHERE a.vec_id % 50 = 0)
          |SELECT probe_id, cand_id, cosine FROM (
          |  SELECT *, row_number() OVER (
          |    PARTITION BY probe_id ORDER BY cosine DESC, cand_id) AS rk
          |  FROM sims) WHERE rk <= 3""".stripMargin)
    })

  /** The custom misra_gries AGGREGATE through the SQL-text surface —
    * registered like a built-in, planned with map-side partial buffers.
    * Same exactness argument as tx_heavy_hitters (k ≥ vocabulary).
    */
  val sqlHeavyHitters = QueryDef(
    "sql_heavy_hitters",
    Some("""WITH t AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
           |c AS (SELECT tok AS token, count(*) AS n_tok FROM t GROUP BY 1)
           |SELECT token FROM c
           |WHERE n_tok > (SELECT count(*) FROM t) * 15 / 1000""".stripMargin),
    (spark, dir) => {
      graft.plans.VectorFunctions.register(spark)
      run(spark, dir,
        """WITH tok AS (SELECT explode(split(text, ' ')) AS t FROM documents),
          |agg AS (SELECT count(*) AS n, misra_gries(t, 100) AS mg FROM tok)
          |SELECT token FROM (
          |  SELECT n, explode(mg) AS (token, est) FROM agg)
          |WHERE est > n * 15 / 1000""".stripMargin)
    })

  /** Correlated subqueries as SQL text: EXISTS (→ semi join) and a
    * correlated scalar subquery (→ left outer aggregate join) — dialect
    * is identical on both engines.
    */
  val sqlExistsSubquery = QueryDef(
    "sql_exists_subquery",
    Some("""SELECT c_custkey, c_name,
           |       (SELECT max(o_totalprice) FROM orders o2
           |        WHERE o2.o_custkey = c.c_custkey) AS max_order
           |FROM customer c
           |WHERE EXISTS (SELECT 1 FROM orders o
           |              WHERE o.o_custkey = c.c_custkey
           |                AND o.o_totalprice > 300000)""".stripMargin),
    (spark, dir) => run(spark, dir,
      """SELECT c_custkey, c_name,
        |       (SELECT max(o_totalprice) FROM orders o2
        |        WHERE o2.o_custkey = c.c_custkey) AS max_order
        |FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey
        |                AND o.o_totalprice > 300000)""".stripMargin))

  /** mart_trips_weather.sql:15-49 as SQL text: trip-grain fact LEFT JOINed
    * to an hourly weather aggregate, then grouped by hour plus the
    * functionally-dependent weather metrics and time dims — the exact
    * join-then-agg-with-redundant-group-keys shape a dbt user would paste
    * in. Dialect deltas vs DuckDB are date_format/strftime and the
    * dayofweek origin (Spark 1=Sun, Snowflake/DuckDB 0=Sun); everything
    * else is the same text.
    */
  val sqlTripsWeather = QueryDef(
    "sql_trips_weather",
    Some("""WITH trips AS (
           |  SELECT ts, value, date_trunc('hour', ts) AS pickup_hour,
           |         hour(ts) AS hour_of_day,
           |         dayofweek(ts) AS day_of_week,
           |         strftime(ts, '%a') AS day_name,
           |         CAST(CASE WHEN dayofweek(ts) IN (0, 6) THEN 1 ELSE 0 END AS INT) AS is_weekend
           |  FROM events),
           |weather AS (
           |  SELECT date_trunc('hour', ts) AS observation_hour,
           |         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(value) AS avg_temperature,
           |         count(*) AS n_observations
           |  FROM events WHERE event_type = 'view' GROUP BY 1)
           |SELECT strftime(t.pickup_hour, '%Y-%m-%d %H:%M:%S') AS hour_ts,
           |       count(*) AS trip_count,
           |       CAST(sum(CAST(t.value AS DECIMAL(18,2))) AS DOUBLE) / count(t.value) AS avg_total_amount,
           |       w.avg_temperature,
           |       w.n_observations,
           |       t.hour_of_day, t.day_of_week, t.day_name, t.is_weekend
           |FROM trips t
           |LEFT JOIN weather w ON w.observation_hour = t.pickup_hour
           |GROUP BY t.pickup_hour, w.avg_temperature, w.n_observations,
           |         t.hour_of_day, t.day_of_week, t.day_name, t.is_weekend""".stripMargin),
    (spark, dir) => run(spark, dir,
      """WITH trips AS (
        |  SELECT ts, value, date_trunc('hour', ts) AS pickup_hour,
        |         hour(ts) AS hour_of_day,
        |         dayofweek(ts) - 1 AS day_of_week,
        |         date_format(ts, 'EEE') AS day_name,
        |         CAST(CASE WHEN dayofweek(ts) - 1 IN (0, 6) THEN 1 ELSE 0 END AS INT) AS is_weekend
        |  FROM events),
        |weather AS (
        |  SELECT date_trunc('hour', ts) AS observation_hour,
        |         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(value) AS avg_temperature,
        |         count(*) AS n_observations
        |  FROM events WHERE event_type = 'view' GROUP BY 1)
        |SELECT date_format(t.pickup_hour, 'yyyy-MM-dd HH:mm:ss') AS hour_ts,
        |       count(*) AS trip_count,
        |       CAST(sum(CAST(t.value AS DECIMAL(18,2))) AS DOUBLE) / count(t.value) AS avg_total_amount,
        |       w.avg_temperature,
        |       w.n_observations,
        |       t.hour_of_day, t.day_of_week, t.day_name, t.is_weekend
        |FROM trips t
        |LEFT JOIN weather w ON w.observation_hour = t.pickup_hour
        |GROUP BY t.pickup_hour, w.avg_temperature, w.n_observations,
        |         t.hour_of_day, t.day_of_week, t.day_name, t.is_weekend""".stripMargin))

  /** mart_zone_analysis.sql:12-35 as SQL text: zone-pair aggregate with
    * weekend/weekday conditional counts, a deterministic mode() for the
    * peak hour (count + row_number, smallest hour wins ties — built-in
    * mode() leaves ties unspecified on BOTH engines), and the HAVING
    * trip-count floor.
    */
  val sqlZoneAnalysis = QueryDef(
    "sql_zone_analysis",
    Some("""WITH trips AS (
           |  SELECT user_id % 20 AS pickup_zone_id,
           |         event_id % 25 AS dropoff_zone_id,
           |         CAST(value AS DECIMAL(18,2)) AS amount,
           |         hour(ts) AS hour_of_day,
           |         CASE WHEN dayofweek(ts) IN (0, 6) THEN 1 ELSE 0 END AS is_weekend
           |  FROM events),
           |agg AS (
           |  SELECT pickup_zone_id, dropoff_zone_id,
           |         count(*) AS trip_count,
           |         CAST(sum(amount) AS DOUBLE) / count(amount) AS avg_total_amount,
           |         CAST(sum(is_weekend) AS BIGINT) AS weekend_trip_count,
           |         CAST(sum(1 - is_weekend) AS BIGINT) AS weekday_trip_count
           |  FROM trips GROUP BY 1, 2 HAVING count(*) >= 10),
           |hour_counts AS (
           |  SELECT pickup_zone_id, dropoff_zone_id, hour_of_day, count(*) AS cnt
           |  FROM trips GROUP BY 1, 2, 3),
           |peak AS (
           |  SELECT pickup_zone_id, dropoff_zone_id, hour_of_day AS peak_hour
           |  FROM (SELECT *, row_number() OVER (
           |          PARTITION BY pickup_zone_id, dropoff_zone_id
           |          ORDER BY cnt DESC, hour_of_day) AS rk
           |        FROM hour_counts)
           |  WHERE rk = 1)
           |SELECT a.*, p.peak_hour
           |FROM agg a JOIN peak p USING (pickup_zone_id, dropoff_zone_id)""".stripMargin),
    (spark, dir) => run(spark, dir,
      """WITH trips AS (
        |  SELECT user_id % 20 AS pickup_zone_id,
        |         event_id % 25 AS dropoff_zone_id,
        |         CAST(value AS DECIMAL(18,2)) AS amount,
        |         hour(ts) AS hour_of_day,
        |         CASE WHEN dayofweek(ts) - 1 IN (0, 6) THEN 1 ELSE 0 END AS is_weekend
        |  FROM events),
        |agg AS (
        |  SELECT pickup_zone_id, dropoff_zone_id,
        |         count(*) AS trip_count,
        |         CAST(sum(amount) AS DOUBLE) / count(amount) AS avg_total_amount,
        |         CAST(sum(is_weekend) AS BIGINT) AS weekend_trip_count,
        |         CAST(sum(1 - is_weekend) AS BIGINT) AS weekday_trip_count
        |  FROM trips GROUP BY 1, 2 HAVING count(*) >= 10),
        |hour_counts AS (
        |  SELECT pickup_zone_id, dropoff_zone_id, hour_of_day, count(*) AS cnt
        |  FROM trips GROUP BY 1, 2, 3),
        |peak AS (
        |  SELECT pickup_zone_id, dropoff_zone_id, hour_of_day AS peak_hour
        |  FROM (SELECT *, row_number() OVER (
        |          PARTITION BY pickup_zone_id, dropoff_zone_id
        |          ORDER BY cnt DESC, hour_of_day) AS rk
        |        FROM hour_counts)
        |  WHERE rk = 1)
        |SELECT a.*, p.peak_hour
        |FROM agg a JOIN peak p USING (pickup_zone_id, dropoff_zone_id)""".stripMargin))

  /** The decontamination pipeline op as PURE SQL TEXT — higher-order
    * array functions (transform + lambda, slice, array_join) and the
    * md5-hex split all in the SQL dialect, proving a user can run the
    * leakage guard without touching the Scala API. Same DuckDB oracle as
    * pipe_decontaminate (which goes through the operator + native
    * shingle expression); Catalyst plans both to the same broadcast
    * semijoin shape.
    */
  val sqlDecontaminate = QueryDef(
    "sql_decontaminate",
    Some(s"""WITH split AS (
            |  SELECT doc_id, text,
            |         substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)
            |           < '${graft.operators.Sampling.hexThreshold(0.1)}' AS is_eval
            |  FROM documents),
            |tr AS (SELECT doc_id, string_split(text, ' ') AS w FROM split
            |       WHERE NOT is_eval AND len(string_split(text, ' ')) >= 5),
            |ev AS (SELECT string_split(text, ' ') AS w FROM split
            |       WHERE is_eval AND len(string_split(text, ' ')) >= 5),
            |evg AS (SELECT DISTINCT unnest([array_to_string(w[i:i+4], ' ')
            |                                FOR i IN range(1, greatest(len(w) - 3, 1))]) AS g
            |        FROM ev),
            |trg AS (SELECT doc_id,
            |               unnest(list_distinct([array_to_string(w[i:i+4], ' ')
            |                      FOR i IN range(1, greatest(len(w) - 3, 1))])) AS g
            |        FROM tr)
            |SELECT t.doc_id, CAST(count(*) AS BIGINT) AS matched_ngrams
            |FROM trg t JOIN evg e ON t.g = e.g
            |GROUP BY t.doc_id""".stripMargin),
    (spark, dir) => run(spark, dir,
      s"""WITH split AS (
         |  SELECT doc_id, text,
         |         substr(md5(CAST(CAST(doc_id AS STRING) AS BINARY)), 1, 4)
         |           < '${graft.operators.Sampling.hexThreshold(0.1)}' AS is_eval
         |  FROM documents),
         |tr AS (SELECT doc_id, split(text, ' ') AS w FROM split
         |       WHERE NOT is_eval AND size(split(text, ' ')) >= 5),
         |ev AS (SELECT split(text, ' ') AS w FROM split
         |       WHERE is_eval AND size(split(text, ' ')) >= 5),
         |evg AS (SELECT DISTINCT explode(array_distinct(
         |          transform(sequence(1, greatest(size(w) - 4, 1)),
         |                    i -> array_join(slice(w, i, 5), ' ')))) AS g
         |        FROM ev),
         |trg AS (SELECT doc_id, explode(array_distinct(
         |          transform(sequence(1, greatest(size(w) - 4, 1)),
         |                    i -> array_join(slice(w, i, 5), ' ')))) AS g
         |        FROM tr)
         |SELECT t.doc_id, CAST(count(*) AS BIGINT) AS matched_ngrams
         |FROM trg t JOIN evg e ON t.g = e.g
         |GROUP BY t.doc_id""".stripMargin))

  /** GROUP BY ALL — the modern analyst-dialect shorthand (Spark ≥ 3.4 and
    * DuckDB agree on the semantics: group on every non-aggregate select
    * item). Capability-parity item: an analyst moving a dashboard query
    * over unchanged.
    */
  val sqlGroupByAll = QueryDef(
    "sql_group_by_all",
    Some("""SELECT source, lang, CAST(count(*) AS BIGINT) AS n,
           |       CAST(sum(n_chars) AS BIGINT) AS chars
           |FROM documents GROUP BY ALL""".stripMargin),
    (spark, dir) => run(spark, dir,
      """SELECT source, lang, CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(n_chars) AS BIGINT) AS chars
        |FROM documents GROUP BY ALL""".stripMargin))

  /** WITH RECURSIVE on the SQL surface (Spark ≥ 4.0 linear recursion —
    * RecursiveProbeSpec pins the capability boundary): a monthly
    * calendar spine generated by recursion from the data's own min/max
    * bounds, left-joined to the monthly order census so absent months
    * would surface as zero rows rather than silently missing. Depth is
    * the month span (80 at the fixtures' fixed date range) — safely
    * inside Spark's default 100-level recursion limit, and pinned
    * explicitly so a wider spine can't hit the ceiling mid-quarter.
    * DuckDB's recursion is the same linear form with `+ INTERVAL`
    * arithmetic in place of `add_months`.
    */
  val sqlRecursiveSpine = QueryDef(
    "sql_recursive_spine",
    Some("""WITH RECURSIVE b AS (SELECT CAST(date_trunc('month', min(o_orderdate)) AS DATE) AS lo,
           |                            CAST(date_trunc('month', max(o_orderdate)) AS DATE) AS hi FROM orders),
           |spine(m) AS (SELECT lo FROM b
           |             UNION ALL
           |             SELECT CAST(m + INTERVAL 1 MONTH AS DATE) FROM spine, b WHERE m < b.hi),
           |c AS (SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS m2,
           |             CAST(count(*) AS BIGINT) AS n_orders,
           |             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
           |      FROM orders GROUP BY 1)
           |SELECT m AS month, coalesce(n_orders, CAST(0 AS BIGINT)) AS n_orders,
           |       round(coalesce(revenue, 0), 4) AS revenue
           |FROM spine LEFT JOIN c ON c.m2 = spine.m""".stripMargin),
    (spark, dir) => {
      val prev = spark.conf.getOption("spark.sql.cteRecursionLevelLimit")
      spark.conf.set("spark.sql.cteRecursionLevelLimit", "1000")
      try {
        Tables.registerAll(spark, dir)
        // resolve the data-dependent bounds ONCE before the recursion:
        // Spark's UnionLoop re-evaluates the recursive step's other
        // operands every level, so bounds left as a CTE would rescan
        // orders per month (80 scans; 13.8s → 0.7s at sf0.01). At 100 TB
        // the bounds probe is one min/max scan and the recursion itself
        // touches no data.
        val b = spark.sql(
          """SELECT CAST(CAST(date_trunc('MONTH', min(o_orderdate)) AS DATE) AS STRING),
            |       CAST(CAST(date_trunc('MONTH', max(o_orderdate)) AS DATE) AS STRING)
            |FROM orders""".stripMargin).head
        val (lo, hi) = (b.getString(0), b.getString(1))
        spark.sql(
          s"""WITH RECURSIVE spine(m) AS (SELECT CAST('$lo' AS DATE)
             |             UNION ALL
             |             SELECT add_months(m, 1) FROM spine WHERE m < CAST('$hi' AS DATE)),
             |c AS (SELECT CAST(date_trunc('MONTH', o_orderdate) AS DATE) AS m2,
             |             CAST(count(*) AS BIGINT) AS n_orders,
             |             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
             |      FROM orders GROUP BY 1)
             |SELECT m AS month, coalesce(n_orders, CAST(0 AS BIGINT)) AS n_orders,
             |       round(coalesce(revenue, 0), 4) AS revenue
             |FROM spine LEFT JOIN c ON c.m2 = spine.m""".stripMargin)
      } finally prev match {
        case Some(v) => spark.conf.set("spark.sql.cteRecursionLevelLimit", v)
        case None => spark.conf.unset("spark.sql.cteRecursionLevelLimit")
      }
    })

  /** The PII scrub through the verbatim-SQL surface: `pii_redact`
    * registered like the native vector/sketch functions, graded
    * byte-exactly (md5) against DuckDB running the identical pattern
    * chain. The corpus gets deterministic doc-derived PII appended in
    * BOTH dialects (the fixture text is digit-free — see tx_pii_*).
    */
  val sqlPiiScrub = QueryDef(
    "sql_pii_scrub",
    Some {
      val redacted = graft.functions.Pii.patterns.foldLeft("text") {
        case (acc, (_, p, ph)) => s"regexp_replace($acc, '$p', '$ph', 'g')"
      }
      """WITH c AS (
        |  SELECT doc_id,
        |         text || ' u' || CAST(doc_id AS VARCHAR) || '@' || source
        |           || '.net' ||
        |           CASE WHEN doc_id % 3 = 0 THEN ' 555-123-4567' ELSE '' END
        |           AS text
        |  FROM documents)
        |SELECT doc_id, md5(REDACTED) AS scrubbed_md5,
        |       CAST(length(text) - length(REDACTED) AS BIGINT) AS delta
        |FROM c""".stripMargin.replace("REDACTED", redacted)
    },
    (spark, dir) => {
      graft.functions.Pii.register(spark)
      run(spark, dir,
        """WITH c AS (
          |  SELECT doc_id,
          |         concat(text, ' u', CAST(doc_id AS STRING), '@', source,
          |                '.net',
          |                CASE WHEN doc_id % 3 = 0 THEN ' 555-123-4567'
          |                     ELSE '' END) AS text
          |  FROM documents)
          |SELECT doc_id, md5(pii_redact(text)) AS scrubbed_md5,
          |       CAST(length(text) - length(pii_redact(text)) AS BIGINT)
          |         AS delta
          |FROM c""".stripMargin)
    })

  val all: Seq[QueryDef] = Seq(sqlMartDaily, sqlZoneHaving, sqlKnnNative,
    sqlHeavyHitters, sqlExistsSubquery, sqlTripsWeather, sqlZoneAnalysis,
    sqlDecontaminate, sqlLateralTopk, sqlGroupByAll, sqlRecursiveSpine,
    sqlPiiScrub)
}
