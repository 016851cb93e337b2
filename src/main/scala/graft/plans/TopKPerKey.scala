package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.graft.ColumnBridge

/** Whole-operator extension (LogicalPlan + SparkStrategy + SparkPlan):
  * top-k rows per key.
  *
  * The built-in formulation — `row_number().over(partitionBy(key).orderBy
  * (ord))` then `filter(rn <= k)` — shuffles EVERY row and sorts every
  * key's whole group, O(n log n) per key, even though only k rows per key
  * survive. This operator keeps a bounded k-heap per key on each map-side
  * partition (partial phase), shuffles only the ≤ k·keys-per-partition
  * survivors, and merges heaps after the exchange (final phase) — the
  * aggregation-style two-phase shape applied to top-k. At 100 TB with
  * small k this reduces shuffle volume by orders of magnitude.
  *
  * Tie behavior: rows with equal order values are retained arbitrarily
  * (same as any heap-based top-k); use a total order for determinism.
  */
case class TopKPerKeyPlan(
    k: Int,
    keys: Seq[Expression],
    order: Expression,
    descending: Boolean,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyPlan =
    copy(child = newChild)
}

case class TopKPerKeyExec(
    k: Int,
    keys: Seq[Expression],
    order: Expression,
    descending: Boolean,
    partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  // final phase co-locates each key; partial phase runs map-side anywhere
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution)
    else Seq(ClusteredDistribution(keys))

  override protected def doExecute(): RDD[InternalRow] = {
    val kVal = k
    val keyExprs = keys
    val orderExpr = order
    val desc = descending
    val childOutput = child.output

    child.execute().mapPartitions ({ iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val boundOrder = BindReferences.bindReference(orderExpr, childOutput)
      val base = TypeUtils.getInterpretedOrdering(orderExpr.dataType)
      // heap head = the WORST retained row (min-heap for descending top-k)
      val heapOrd: Ordering[(Any, InternalRow)] =
        if (desc) Ordering.by[(Any, InternalRow), Any](_._1)(base).reverse
        else Ordering.by[(Any, InternalRow), Any](_._1)(base)
      val heaps = mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[(Any, InternalRow)]]
      iter.foreach { row =>
        val key = keyProj(row)
        val heap = heaps.get(key) match {
          case Some(h) => h
          case None =>
            val h = mutable.PriorityQueue.empty[(Any, InternalRow)](heapOrd)
            heaps.put(key.copy(), h)
            h
        }
        // reference-typed order values (struct/string/array) are VIEWS into
        // the reused row buffer — copy before retaining them in the heap
        val ord = boundOrder.eval(row) match {
          case r: InternalRow => r.copy()
          case s: org.apache.spark.unsafe.types.UTF8String => s.clone()
          case a: org.apache.spark.sql.catalyst.util.ArrayData => a.copy()
          case v => v
        }
        if (heap.size < kVal) heap.enqueue((ord, row.copy()))
        else {
          val worst = heap.head._1
          val better = if (desc) base.gt(ord, worst) else base.lt(ord, worst)
          if (better) { heap.dequeue(); heap.enqueue((ord, row.copy())) }
        }
      }
      heaps.valuesIterator.flatMap(_.iterator.map(_._2))
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

/** Planner strategy: logical TopKPerKeyPlan → partial exec + final exec
  * (EnsureRequirements inserts the key exchange between them).
  */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyPlan(k, keys, order, desc, child) =>
      val partialExec = TopKPerKeyExec(k, keys, order, desc, partial = true,
        planLater(child))
      TopKPerKeyExec(k, keys, order, desc, partial = false, partialExec) :: Nil
    case _ => Nil
  }
}

/** User-facing constructor. */
object TopK {
  def perKey(df: DataFrame, keyCols: Seq[String], orderCol: String,
      k: Int, descending: Boolean = true): DataFrame = {
    val spark = df.sparkSession
    val analyzed = df.queryExecution.analyzed
    val keyExprs: Seq[Expression] = keyCols.map(c => ColumnBridge.expression(df(c)))
    val orderExpr: Expression = ColumnBridge.expression(df(orderCol))
    ColumnBridge.ofRows(spark,
      TopKPerKeyPlan(k, keyExprs, orderExpr, descending, analyzed))
  }
}
