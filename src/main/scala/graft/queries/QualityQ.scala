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

  /** Q7: one-stop table profiler — the dbt-docs / data-catalog summary
    * for every column of `orders` in one query: row count, null count,
    * exact distinct count, min/max, and the modal value with its count
    * (deterministic (count DESC, value) tiebreak). Values are published
    * as canonical strings (dates DATE-cast, doubles printf'd to 2dp) so
    * one schema serves every column type on both engines. Each per-
    * column block prunes the scan to that single column — the profiler
    * costs one column-pruned pass per column, not #cols full-table
    * passes; at 100 TB the distinct counts are the only shuffles, and
    * qc_hll_accuracy documents when to swap them for HLL.
    */
  val q7ProfileTable = QueryDef(
    "q7_profile_table", {
      def block(c: String, expr: String, vfmt: String => String) = {
        s"""SELECT '$c' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
           |       CAST(sum(CASE WHEN $expr IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
           |       CAST(count(DISTINCT $expr) AS BIGINT) AS n_distinct,
           |       ${vfmt(s"min($expr)")} AS min_val, ${vfmt(s"max($expr)")} AS max_val,
           |       (SELECT ${vfmt(expr)} FROM orders WHERE $expr IS NOT NULL GROUP BY $expr
           |        ORDER BY count(*) DESC, $expr LIMIT 1) AS top_val,
           |       CAST((SELECT count(*) FROM orders WHERE $expr IS NOT NULL GROUP BY $expr
           |        ORDER BY count(*) DESC, $expr LIMIT 1) AS BIGINT) AS top_n
           |FROM orders""".stripMargin
      }
      val s = (v: String) => s"CAST($v AS VARCHAR)"
      val f2 = (v: String) => s"printf('%.2f', $v)"
      Some(Seq(
        block("o_orderkey", "o_orderkey", s),
        block("o_custkey", "o_custkey", s),
        block("o_orderstatus", "o_orderstatus", s),
        block("o_totalprice", "o_totalprice", f2),
        block("o_orderdate", "CAST(o_orderdate AS DATE)", s),
        block("o_orderpriority", "o_orderpriority", s)).mkString(" UNION ALL "))
    },
    (spark, dir) => {
      // no .cache(): each block's aggs prune to one column at the parquet
      // scan, which beats materializing all columns into executor memory —
      // and a QueryDef returns a lazy plan, so a cache here could never be
      // unpersisted and would leak into every later query in the session
      val o = Tables.orders(spark, dir)
      def block(name: String, e: org.apache.spark.sql.Column,
          fmt: org.apache.spark.sql.Column => org.apache.spark.sql.Column) = {
        val base = o.agg(
          count(lit(1)).as("n_rows"),
          sum(when(e.isNull, 1).otherwise(0)).cast("long").as("n_null"),
          countDistinct(e).as("n_distinct"),
          fmt(min(e)).as("min_val"), fmt(max(e)).as("max_val"))
        val top = o.filter(e.isNotNull).groupBy(e.as("v"))
          .agg(count(lit(1)).as("top_n"))
          .orderBy(col("top_n").desc, col("v")).limit(1)
          .select(fmt(col("v")).as("top_val"), col("top_n"))
        base.crossJoin(top)
          .select(lit(name).as("col_name"), col("n_rows"), col("n_null"),
            col("n_distinct"), col("min_val"), col("max_val"),
            col("top_val"), col("top_n"))
      }
      val str = (c: org.apache.spark.sql.Column) => c.cast("string")
      val f2 = (c: org.apache.spark.sql.Column) => format_string("%.2f", c)
      Seq(
        block("o_orderkey", col("o_orderkey"), str),
        block("o_custkey", col("o_custkey"), str),
        block("o_orderstatus", col("o_orderstatus"), str),
        block("o_totalprice", col("o_totalprice"), f2),
        block("o_orderdate", col("o_orderdate").cast("date"), str),
        block("o_orderpriority", col("o_orderpriority"), str))
        .reduce(_ union _)
    })

  val all: Seq[QueryDef] = Seq(q1NotNullRange, q2Unique, q4Freshness, qcDrift,
    q6ReferentialSuite, q8AnomalyQuarantine, q7ProfileTable)
}
