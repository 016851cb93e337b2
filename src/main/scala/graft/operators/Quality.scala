package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations — the dbt generic-test surface
  * (SURVEY.md §2.11: not_null / unique / accepted_range, models/staging/
  * schema.yml:9-69) plus source-freshness SLAs (sources.yml:13-15).
  *
  * Each expectation compiles to ONE aggregate expression, so a whole
  * suite over a table is a single scan + single-row agg — at 100 TB that
  * is one pass over the data, not one job per test (unlike `dbt test`,
  * which issues a query per test).
  */
object Quality {

  /** count of NULL values in a column (must be 0 to pass `not_null`). */
  def notNullViolations(c: String): Column =
    sum(col(c).isNull.cast("long")).as(s"${c}_nulls")

  /** count of out-of-range values (dbt_utils.accepted_range; bounds
    * inclusive unless `exclusiveMin`). NULLs don't count as violations
    * (dbt semantics — not_null is a separate test).
    */
  def rangeViolations(c: String, min: Double, max: Double,
      exclusiveMin: Boolean = false): Column = {
    val lo = if (exclusiveMin) col(c) <= min else col(c) < min
    sum((col(c).isNotNull && (lo || col(c) > max)).cast("long")).as(s"${c}_oor")
  }

  /** count of values outside the accepted set (dbt `accepted_values`).
    * NULLs don't count (not_null is a separate test).
    */
  def acceptedValuesViolations(c: String, accepted: Seq[String]): Column =
    sum((col(c).isNotNull && !col(c).isin(accepted: _*)).cast("long"))
      .as(s"${c}_bad_values")

  /** Orphaned foreign keys (dbt `relationships`): rows of `child` whose
    * `fk` has no match in `parent.pk`. One anti-join — at 100 TB the
    * parent key set shuffles (or broadcasts when dimension-sized), the
    * child streams through; NULL fks are not orphans (dbt semantics).
    */
  def orphanedKeys(child: DataFrame, fk: String,
      parent: DataFrame, pk: String): DataFrame =
    child.filter(col(fk).isNotNull)
      .join(parent.select(col(pk).as(fk)).distinct(), Seq(fk), "left_anti")

  /** rows whose key occurs more than once (must be 0 to pass `unique`).
    * Needs a groupBy, so it's its own aggregation (still one shuffle of
    * key+count, partial-aggregated map-side).
    */
  def duplicateKeyRows(df: DataFrame, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > 1)

  /** Freshness status vs an as-of instant: 'ok' | 'warn' | 'error'
    * (dbt source freshness — warn_after/error_after on max(load_ts)).
    * `asOf` is injected (never wall-clock) so checks are deterministic.
    */
  def freshnessStatus(tsCol: Column, asOf: Column,
      warnAfterHours: Int, errorAfterHours: Int): Column = {
    val lagHours = (unix_timestamp(asOf) - unix_timestamp(max(tsCol))) / 3600.0
    when(lagHours > errorAfterHours, "error")
      .when(lagHours > warnAfterHours, "warn")
      .otherwise("ok")
  }

  /** Run a suite of single-column expectations as one single-row agg. */
  def runSuite(df: DataFrame, expectations: Seq[Column]): DataFrame =
    df.agg(expectations.head, expectations.tail: _*)

  /** Chi-square drift between two cohorts of one categorical column —
    * the distribution-shift monitor a curation pipeline runs between a
    * reference corpus slice and a new batch (Pearson's test on the 2×k
    * contingency table; each output row carries its cell contribution,
    * Σ of which is the χ² statistic).
    *
    * Scale: one groupBy over the category (conditional counts fold the
    * cohort split into the same pass), margins via a 2-row broadcast —
    * never a second scan, never a join on data rows.
    */
  def chiSquareDrift(df: DataFrame, categoryCol: String,
      inCohortA: Column): DataFrame = {
    val counts = df.groupBy(col(categoryCol))
      .agg(sum(inCohortA.cast("long")).as("n_a"),
        sum((!inCohortA).cast("long")).as("n_b"))
    val totals = counts.agg(sum(col("n_a")).as("ta"), sum(col("n_b")).as("tb"))
    val ea = (col("n_a") + col("n_b")) * col("ta").cast("double") /
      (col("ta") + col("tb"))
    val eb = (col("n_a") + col("n_b")) * col("tb").cast("double") /
      (col("ta") + col("tb"))
    counts.crossJoin(broadcast(totals))
      .select(col(categoryCol), col("n_a"), col("n_b"),
        (pow(col("n_a") - ea, 2) / ea + pow(col("n_b") - eb, 2) / eb)
          .as("chi2_contrib"))
  }
}
