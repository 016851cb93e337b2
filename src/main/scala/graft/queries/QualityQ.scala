package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Quality

/** Data-quality test operators as queries (SURVEY.md §2.11 Q1-Q4) — each is
  * the count-violations SELECT that the dbt generic test compiles to.
  */
object QualityQ {

  /** Q1+Q3: not_null + accepted_range over lineitem, one scan, one row.
    * (models/staging/schema.yml:9-69 pattern.)
    */
  val q1NotNullRange = QueryDef(
    "q1_notnull_range_suite",
    Some("""SELECT CAST(sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS l_orderkey_nulls,
           |       CAST(sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS l_shipdate_nulls,
           |       CAST(sum(CASE WHEN l_quantity IS NOT NULL AND (l_quantity <= 0 OR l_quantity > 60)
           |                THEN 1 ELSE 0 END) AS BIGINT) AS l_quantity_oor,
           |       CAST(sum(CASE WHEN l_discount IS NOT NULL AND (l_discount < 0 OR l_discount > 0.1)
           |                THEN 1 ELSE 0 END) AS BIGINT) AS l_discount_oor
           |FROM lineitem""".stripMargin),
    (spark, dir) =>
      Quality.runSuite(Tables.lineitem(spark, dir), Seq(
        Quality.notNullViolations("l_orderkey"),
        Quality.notNullViolations("l_shipdate"),
        Quality.rangeViolations("l_quantity", 0, 60, exclusiveMin = true),
        Quality.rangeViolations("l_discount", 0, 0.1))))

  /** Q2: unique — duplicate keys on the orders PK and the lineitem
    * composite key (schema.yml:10-11's `unique` test). Emits counts of
    * offending key-groups (0 rows each ⇒ both pass).
    */
  val q2Unique = QueryDef(
    "q2_unique_keys",
    Some("""SELECT 'orders_pk' AS test,
           |       count(*) FILTER (WHERE cnt > 1) AS violating_keys
           |FROM (SELECT o_orderkey, count(*) AS cnt FROM orders GROUP BY 1)
           |UNION ALL
           |SELECT 'lineitem_composite' AS test,
           |       count(*) FILTER (WHERE cnt > 1) AS violating_keys
           |FROM (SELECT l_orderkey, l_linenumber, count(*) AS cnt FROM lineitem GROUP BY 1, 2)""".stripMargin),
    (spark, dir) => {
      val o = Quality.duplicateKeyRows(Tables.orders(spark, dir), Seq("o_orderkey"))
        .agg(count(lit(1)).as("violating_keys"))
        .select(lit("orders_pk").as("test"), col("violating_keys"))
      val l = Quality.duplicateKeyRows(Tables.lineitem(spark, dir),
          Seq("l_orderkey", "l_linenumber"))
        .agg(count(lit(1)).as("violating_keys"))
        .select(lit("lineitem_composite").as("test"), col("violating_keys"))
      o.unionByName(l)
    })

  /** Q4/T5: freshness SLA — age of max(ts) vs a fixed as-of instant with
    * warn/error thresholds (sources.yml:13-15; deterministic clock).
    */
  val q4Freshness = QueryDef(
    "q4_freshness",
    Some("""SELECT strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS latest_ts,
           |       CAST(floor((epoch(TIMESTAMP '2024-02-01 00:00:00') - epoch(max(ts))) / 3600) AS BIGINT) AS lag_hours,
           |       CASE WHEN (epoch(TIMESTAMP '2024-02-01 00:00:00') - epoch(max(ts))) / 3600.0 > 48 THEN 'error'
           |            WHEN (epoch(TIMESTAMP '2024-02-01 00:00:00') - epoch(max(ts))) / 3600.0 > 24 THEN 'warn'
           |            ELSE 'ok' END AS status
           |FROM events""".stripMargin),
    (spark, dir) => {
      import graft.functions.Fns.tsStr
      val asOf = lit("2024-02-01 00:00:00").cast("timestamp")
      Tables.events(spark, dir).agg(
        tsStr(max(col("ts"))).as("latest_ts"),
        floor((unix_timestamp(asOf) - unix_timestamp(max(col("ts")))) / 3600).as("lag_hours"),
        Quality.freshnessStatus(col("ts"), asOf, 24, 48).as("status"))
    })

  /** Q5: chi-square source-mix drift between two hash-split corpus
    * cohorts — the distribution-shift monitor between a reference slice
    * and a new batch (Pearson's 2×k test; Σ chi2_contrib is the
    * statistic). The cohort split is the deterministic md5 parity, so
    * both engines compute the identical contingency table; one groupBy
    * pass + a 1-row broadcast of the margins (Quality.chiSquareDrift).
    */
  val qcDrift = QueryDef(
    "qc_drift",
    Some(s"""WITH c AS (SELECT source,
            |       CAST(count(*) FILTER ((${SamplingQ.hexValSql("doc_id")}) % 2 = 0) AS BIGINT) AS n_a,
            |       CAST(count(*) FILTER ((${SamplingQ.hexValSql("doc_id")}) % 2 = 1) AS BIGINT) AS n_b
            |       FROM documents GROUP BY 1),
            |t AS (SELECT CAST(sum(n_a) AS DOUBLE) AS ta, CAST(sum(n_b) AS DOUBLE) AS tb FROM c)
            |SELECT source, n_a, n_b,
            |       round(pow(n_a - (n_a + n_b) * ta / (ta + tb), 2) / ((n_a + n_b) * ta / (ta + tb))
            |           + pow(n_b - (n_a + n_b) * tb / (ta + tb), 2) / ((n_a + n_b) * tb / (ta + tb)), 4) AS chi2_contrib
            |FROM c, t""".stripMargin),
    (spark, dir) => {
      import graft.functions.Fns.r4
      val drift = Quality.chiSquareDrift(Tables.documents(spark, dir),
        categoryCol = "source",
        inCohortA = graft.operators.Sampling.hexVal(col("doc_id")) % 2 === 0)
      drift.select(col("source"), col("n_a"), col("n_b"),
        r4(col("chi2_contrib")).as("chi2_contrib"))
    })

  /** Q6: the remaining two dbt generic tests as one suite row —
    * accepted_values (o_orderstatus ∈ {O,F,P}; event_type ∈ the five
    * known kinds) and relationships (every lineitem.l_orderkey exists in
    * orders; every orders.o_custkey exists in customer). Each
    * accepted_values check folds into a single-row agg; each
    * relationships check is one anti-join count.
    */
  val q6ReferentialSuite = QueryDef(
    "q6_referential_suite",
    Some("""SELECT
           |  (SELECT CAST(sum(CASE WHEN o_orderstatus IS NOT NULL
           |            AND o_orderstatus NOT IN ('O','F','P') THEN 1 ELSE 0 END) AS BIGINT)
           |   FROM orders) AS o_orderstatus_bad_values,
           |  (SELECT CAST(sum(CASE WHEN event_type IS NOT NULL
           |            AND event_type NOT IN ('view','click','signup','purchase','error') THEN 1 ELSE 0 END) AS BIGINT)
           |   FROM events) AS event_type_bad_values,
           |  (SELECT CAST(count(*) AS BIGINT) FROM lineitem l
           |   WHERE l_orderkey IS NOT NULL
           |     AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)) AS lineitem_orphans,
           |  (SELECT CAST(count(*) AS BIGINT) FROM orders o
           |   WHERE o_custkey IS NOT NULL
           |     AND NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)) AS orders_orphans""".stripMargin),
    (spark, dir) => {
      val statusBad = Quality.runSuite(Tables.orders(spark, dir), Seq(
        Quality.acceptedValuesViolations("o_orderstatus", Seq("O", "F", "P"))))
      val typeBad = Quality.runSuite(Tables.events(spark, dir), Seq(
        Quality.acceptedValuesViolations("event_type",
          Seq("view", "click", "signup", "purchase", "error"))))
      val liOrphans = Quality.orphanedKeys(
          Tables.lineitem(spark, dir), "l_orderkey",
          Tables.orders(spark, dir), "o_orderkey")
        .agg(count(lit(1)).as("lineitem_orphans"))
      val orderOrphans = Quality.orphanedKeys(
          Tables.orders(spark, dir), "o_custkey",
          Tables.customer(spark, dir), "c_custkey")
        .agg(count(lit(1)).as("orders_orphans"))
      statusBad.crossJoin(typeBad).crossJoin(liOrphans).crossJoin(orderOrphans)
    })

  /** Q8: quarantine routing — dbt's store_failures pattern as an
    * operator. Every event is classified by the FIRST failing
    * expectation (priority order: error events, then the value-range
    * tails); failing rows land in a quarantine report with counts, id
    * bounds (the re-drive handle: the quarantine slice can be re-read
    * by id range after a fix), and corpus share. Rows passing every
    * expectation stay out — the report is the exception stream, not a
    * census.
    *
    * Scale: one scan, conditional classification in the projection,
    * partial-agg rollup at reason grain (≤ #reasons rows out).
    */
  val q8AnomalyQuarantine = QueryDef(
    "q8_anomaly_quarantine",
    Some("""WITH tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM events),
           |cls AS (
           |  SELECT event_id,
           |         CASE WHEN event_type = 'error' THEN 'error_event'
           |              WHEN value > 95 THEN 'value_high'
           |              WHEN value < 5 THEN 'value_low'
           |         END AS reason
           |  FROM events),
           |q AS (SELECT reason, CAST(count(*) AS BIGINT) AS n_rows,
           |             CAST(min(event_id) AS BIGINT) AS min_id,
           |             CAST(max(event_id) AS BIGINT) AS max_id
           |      FROM cls WHERE reason IS NOT NULL GROUP BY 1)
           |SELECT reason, n_rows, min_id, max_id,
           |       round(n_rows * 1.0 / tot.n, 4) AS share
           |FROM q, tot""".stripMargin),
    (spark, dir) => {
      val e = Tables.events(spark, dir)
      val tot = e.agg(count(lit(1)).as("n"))
      e.select(col("event_id"),
          when(col("event_type") === "error", "error_event")
            .when(col("value") > 95, "value_high")
            .when(col("value") < 5, "value_low")
            .as("reason"))
        .filter(col("reason").isNotNull)
        .groupBy("reason")
        .agg(count(lit(1)).as("n_rows"),
          min(col("event_id")).as("min_id"), max(col("event_id")).as("max_id"))
        .crossJoin(broadcast(tot))
        .select(col("reason"), col("n_rows"), col("min_id"), col("max_id"),
          round(col("n_rows") * lit(1.0) / col("n"), 4).as("share"))
    })

  val all: Seq[QueryDef] = Seq(q1NotNullRange, q2Unique, q4Freshness, qcDrift,
    q6ReferentialSuite, q8AnomalyQuarantine)
}
