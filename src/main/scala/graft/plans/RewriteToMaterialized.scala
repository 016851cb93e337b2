package graft.plans

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Materialized-view query rewriting — the optimizer-level version of
  * "use the prebuilt mart": when a query's plan CONTAINS a subtree that
  * computes the same result as a registered materialization, the subtree
  * is replaced by a scan of the materialized parquet, skipping the
  * upstream recomputation entirely.
  *
  * Matching uses Catalyst's canonicalized `sameResult` — the same
  * machinery CacheManager uses to recognize cached plans — so it is
  * alias- and exprId-insensitive, and two independent reads of the same
  * source table do match. Views are registered with their OPTIMIZED plan
  * and the rule is injected into the post-optimization batch, so probe
  * subtrees are compared like-for-like.
  *
  * At 100 TB this is the dbt-mart contract made automatic: pipelines
  * keep declaring the full lineage (auditable, re-runnable), while
  * repeated executions hit the materialization. The replacement scan's
  * columns are re-aliased to the replaced subtree's exprIds, so parent
  * operators resolve untouched.
  *
  * Matching is EXACT-result (CacheManager semantics): operators above a
  * matching subtree compose freely, but a column-pruned or re-filtered
  * variant of the view is a different result and recomputes — register
  * the narrower view too if that pattern repeats.
  *
  * Registry is session-global and explicit (`register`/`clear`) —
  * staleness is the caller's contract, exactly as with dbt marts.
  */
object MaterializedViews {

  final case class Entry(optimized: LogicalPlan, path: String)

  private val entries = mutable.ArrayBuffer.empty[Entry]

  /** Materialize `view` at `path` (overwrite) and register it for
    * rewriting.
    */
  def materialize(view: DataFrame, path: String): Unit = {
    view.write.mode("overwrite").parquet(path)
    entries += Entry(view.queryExecution.optimizedPlan, path)
  }

  /** Register an already-materialized view (no write). */
  def register(view: DataFrame, path: String): Unit =
    entries += Entry(view.queryExecution.optimizedPlan, path)

  def clear(): Unit = entries.clear()

  def registered: Seq[Entry] = entries.toSeq
}

case class RewriteToMaterialized(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val views = MaterializedViews.registered
    if (views.isEmpty) return plan
    plan.transformUp {
      case sub if views.exists(_.optimized.sameResult(sub)) =>
        val entry = views.find(_.optimized.sameResult(sub)).get
        val scan = spark.read.parquet(entry.path).queryExecution.analyzed
        val byName = scan.output.map(a => a.name -> a).toMap
        // re-alias the scan's columns onto the replaced subtree's exprIds
        // so parent operators keep resolving
        val aligned: Seq[NamedExpression] = sub.output.map { a =>
          Alias(byName(a.name), a.name)(exprId = a.exprId)
        }
        Project(aligned, scan)
    }
  }
}
