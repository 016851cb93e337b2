package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column↔Expression conversions —
  * the standard extension-library pattern for exposing custom Catalyst
  * expressions through the public Column API (Spark 4 moved Column onto
  * ColumnNode, so `new Column(expr)` no longer exists).
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** The CONVERTED catalyst tree of a Column — `expression` above
    * returns a lazy `ColumnNodeExpression` wrapper (fine for embedding
    * into plans, opaque to tree inspection); this resolves the node
    * through the session converter so callers can pattern-match the
    * real And/Comparison/Literal structure (e.g. the snapshot
    * predicate-probe pruner). Parses `expr("...")` strings with the
    * session parser.
    */
  def catalystExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)

  /** DataFrame from a custom LogicalPlan (Dataset.ofRows is private[sql]). */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
