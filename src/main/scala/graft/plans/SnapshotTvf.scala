package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.functions.lit

import graft.warehouse.Snapshots

/** Table-valued SQL functions over the snapshot protocol — the
  * composable query face of the change feed (Delta's `table_changes`),
  * injected via `SparkSessionExtensions.injectTableFunction` so they sit
  * in FROM clauses and join/filter like any relation:
  *
  * {{{
  *   SELECT * FROM snapshot_changes('/wh/t', 1, 4)            -- append-only window
  *   SELECT * FROM snapshot_changes('/wh/t', 1, 4, 'id')      -- row-exact CDF (keys)
  *   SELECT * FROM snapshot_at('/wh/t', 2) WHERE id > 10      -- pinned version
  *   SELECT * FROM snapshot_history('/wh/t') WHERE op = 'append'
  * }}}
  *
  * The first argument is a quoted path or a `catalog.table` name
  * resolved through the same `spark.sql.catalog.<name>.root` conf as the
  * read catalog and the maintenance statements. Arguments must be
  * literals (they select WHICH relation to plan — resolved once at
  * analysis, like a table reference). The returned plan is the same
  * manifest-pinned parquet scan the Scala API produces, so Catalyst
  * pushdown/pruning applies unchanged, and an append-only
  * `snapshot_changes` window still reads ONLY the window's added files
  * (IO ∝ delta — the TVF adds nothing on top of `incrementalRead`).
  */
object SnapshotTvf {

  private def str(e: Expression, what: String): String = {
    require(e.foldable, s"$what must be a literal")
    val v = e.eval()
    require(v != null, s"$what must not be NULL")
    v.toString
  }

  private def long(e: Expression, what: String): Long = {
    require(e.foldable, s"$what must be a literal")
    e.eval() match {
      case n: java.lang.Number => n.longValue()
      case other => throw new IllegalArgumentException(
        s"$what must be an integer literal, got $other")
    }
  }

  /** 'path' literals pass through; `catalog.table` strings resolve via
    * the catalog root conf (same rule as the maintenance statements).
    */
  private def resolve(spark: SparkSession, raw: String): String =
    if (raw.startsWith("/") || raw.contains(":/")) raw
    else MaintenanceSql.SnapTarget(raw).resolve(spark)

  private def changes(exprs: Seq[Expression]): LogicalPlan = {
    require(exprs.size == 3 || exprs.size == 4,
      "snapshot_changes(table, fromVersion, toVersion[, keysCsv])")
    val spark = SparkSession.active
    val path = resolve(spark, str(exprs(0), "table"))
    val from = long(exprs(1), "fromVersion")
    val to = long(exprs(2), "toVersion")
    val df =
      if (exprs.size == 4)
        Snapshots.rowDiff(spark, path, from, to,
          str(exprs(3), "keysCsv").split(',').map(_.trim).toSeq)
      else
        Snapshots.incrementalRead(spark, path, from, to)
          .withColumn("change_type", lit("insert"))
    df.queryExecution.logical
  }

  /** `snapshot_at(t, 2)` pins a version; `snapshot_at(t, TIMESTAMP
    * '...')` / `snapshot_at(t, '2026-01-01 00:00:00')` pins the newest
    * version committed at or before the instant — the TVF twin of the
    * catalog's `TIMESTAMP AS OF`, resolved against the same durable
    * `#ts:` commit instants (file mtimes only as the legacy fallback).
    */
  private def at(exprs: Seq[Expression]): LogicalPlan = {
    require(exprs.size == 2, "snapshot_at(table, versionOrTimestamp)")
    val spark = SparkSession.active
    val path = resolve(spark, str(exprs(0), "table"))
    val e = exprs(1)
    require(e.foldable, "versionOrTimestamp must be a literal")
    def instantVersion(cutoffMs: Long): Long =
      Snapshots.versionAtInstant(spark, path, cutoffMs)
        .getOrElse(throw new IllegalArgumentException(
          s"no version of $path committed at or before the instant"))
    val version = e.dataType match {
      case org.apache.spark.sql.types.ByteType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.LongType =>
        long(e, "version")
      case org.apache.spark.sql.types.TimestampType =>
        instantVersion(e.eval().asInstanceOf[Long] / 1000L)
      case org.apache.spark.sql.types.StringType |
           org.apache.spark.sql.types.DateType =>
        // cast THROUGH Spark under the session timezone — the exact
        // semantics of the catalog's TIMESTAMP AS OF twin (a
        // java.sql.Timestamp.valueOf here would parse in the JVM default
        // zone and reject date-only forms like '2026-01-01')
        val micros = org.apache.spark.sql.catalyst.expressions.Cast(
          e, org.apache.spark.sql.types.TimestampType,
          Some(spark.sessionState.conf.sessionLocalTimeZone)).eval()
        require(micros != null,
          s"cannot parse '${e.eval()}' as a timestamp")
        instantVersion(micros.asInstanceOf[Long] / 1000L)
      case other => throw new IllegalArgumentException(
        s"snapshot_at takes an integer version or a timestamp, got " +
          other.simpleString)
    }
    Snapshots.read(spark, path, Some(version)).queryExecution.logical
  }

  private def hist(exprs: Seq[Expression]): LogicalPlan = {
    require(exprs.size == 1, "snapshot_history(table)")
    val spark = SparkSession.active
    Snapshots.history(spark, resolve(spark, str(exprs(0), "table")))
      .queryExecution.logical
  }

  /** `snapshot_lookup(t, 'col', 'k1,k2,...')` — the point-lookup TVF:
    * rows whose `col` equals one of the CSV keys, served from the
    * Bloom-pruned candidate read ([[Snapshots.readPrunedByKeys]]) — the
    * driver skips files that certainly lack every probed key before a
    * footer opens (falls back to the full candidate set when the table
    * keeps no Bloom index on the column). Keys coerce to the column's
    * type through Spark's own IN coercion, matching the index's hashing
    * of the native type.
    */
  private def lookup(exprs: Seq[Expression]): LogicalPlan = {
    require(exprs.size == 3, "snapshot_lookup(table, column, keysCsv)")
    val spark = SparkSession.active
    val path = resolve(spark, str(exprs(0), "table"))
    val column = str(exprs(1), "column")
    val keys = str(exprs(2), "keysCsv").split(',').map(_.trim)
      .filter(_.nonEmpty).toSeq
    require(keys.nonEmpty, "snapshot_lookup needs at least one key")
    Snapshots.readPrunedByKeys(spark, path, column, keys)
      .filter(org.apache.spark.sql.functions.col(column)
        .isInCollection(keys))
      .queryExecution.logical
  }

  /** `snapshot_partitions(t[, version])` — the partition census
    * relation: one row per `__gp=` value of the version (plus a
    * `<flat>` row for pre-transform entries) with file and byte
    * counts. Metadata-only; what an operator joins/filters before
    * `EXPIRE PARTITIONS OLDER THAN`.
    */
  private def parts(exprs: Seq[Expression]): LogicalPlan = {
    require(exprs.size == 1 || exprs.size == 2,
      "snapshot_partitions(table[, version])")
    val spark = SparkSession.active
    val path = resolve(spark, str(exprs(0), "table"))
    val v = if (exprs.size == 2) Some(long(exprs(1), "version")) else None
    Snapshots.partitionCensus(spark, path, v).queryExecution.logical
  }

  /** The (identifier, info, builder) triples for injectTableFunction. */
  def functions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => LogicalPlan)] = Seq(
    (FunctionIdentifier("snapshot_changes"),
      new ExpressionInfo(getClass.getName, "snapshot_changes"),
      changes _),
    (FunctionIdentifier("snapshot_at"),
      new ExpressionInfo(getClass.getName, "snapshot_at"), at _),
    (FunctionIdentifier("snapshot_history"),
      new ExpressionInfo(getClass.getName, "snapshot_history"), hist _),
    (FunctionIdentifier("snapshot_lookup"),
      new ExpressionInfo(getClass.getName, "snapshot_lookup"), lookup _),
    (FunctionIdentifier("snapshot_partitions"),
      new ExpressionInfo(getClass.getName, "snapshot_partitions"),
      parts _))
}
