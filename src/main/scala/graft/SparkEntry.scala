package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 (and the LLM-data-pipeline
  * extensions) registers one `QueryDef` in `registry`; `queries`/`oracleSql`
  * are derived views of it.
  */
object SparkEntry {

  /** Full query catalog, grouped by module. */
  def registry: Seq[QueryDef] =
    Relational.all ++ Windows.all ++ Scalar.all ++ QualityQ.all ++
      Text.all ++ DedupQ.all ++ MlQ.all ++ MultimodalQ.all ++ SqlSurface.all ++
      PipelineQ.all ++ SamplingQ.all ++ QuantGates.all ++ GraphQ.all ++
      SnapshotQ.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The mart_daily_metrics shape: pre-agg both facts, broadcast-free
    * day-key left join (SURVEY.md §2.4 A4-A6 / §2.3 J2).
    */
  def entry(spark: SparkSession): DataFrame =
    Relational.j2AggThenJoin.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    *
    * Every oracle is wrapped in ORDER BY ALL NULLS FIRST and Verify writes
    * rows sorted by every column (same positional order, same null
    * placement as Spark's nulls-first ascending sort), so the comparison
    * holds whether the driver's hash is row-order-sensitive or not.
    */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(sql =>
      q.name -> s"SELECT * FROM (\n$sql\n) ORDER BY ALL NULLS FIRST")).toMap
}
