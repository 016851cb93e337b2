package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable unit of the engine's query surface.
  *
  * @param name   stable id; prefixed with the SURVEY.md §2 operator id it covers
  * @param fn     Spark-native implementation (dir = fixture directory)
  * @param oracle equivalent DuckDB SQL over the same parquet tables (bare
  *               table names); None → the op is not SQL-expressible and the
  *               driver records a weaker rows-only check.
  *
  * Oracle-parity conventions (the driver hash-compares values after sorting
  * columns by name):
  *   - identical column aliases on both sides;
  *   - doubles rounded to 4 places on both sides (absorbs summation-order noise);
  *   - DuckDB `sum(BIGINT)` cast to BIGINT (it widens to HUGEINT by default);
  *   - timestamps emitted as DATE or canonical strings (parquet tz-annotation
  *     vs DuckDB naive timestamps would otherwise diverge);
  *   - every output either has a unique key column or is a single row, so a
  *     row-sorted compare is total-ordered.
  */
final case class QueryDef(
    name: String,
    oracle: Option[String],
    fn: (SparkSession, String) => DataFrame)
