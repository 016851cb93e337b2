package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Descending, Expression, SortOrder, UnsafeProjection, UnsafeRow}
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
  * survivors, and emits the exact per-key top-k after the key exchange
  * (final phase). At 100 TB with small k this reduces shuffle volume by
  * orders of magnitude.
  *
  * Memory discipline (both phases are bounded):
  *   - partial: the heap map is capped at `graft.topk.maxPartialKeys`
  *     distinct keys (default 131072). Rows of keys beyond the cap pass
  *     through unfiltered — the partial phase is a pure optimization, so
  *     degrading to pass-through under high key cardinality is always
  *     correct, never OOM.
  *   - final: requires child ordering on (keys…, order), so Spark plans a
  *     spillable external sort under it; the operator itself is then a
  *     streaming emit-first-k-per-group scan with O(1) state.
  *
  * Null order values sort SMALLEST — ascending nulls-first / descending
  * nulls-last, exactly Spark's default SortOrder null placement, so
  * results match the `row_number().over(...)` formulation it replaces.
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

  // final phase consumes a (keys…, order) sort — Spark inserts a spillable
  // SortExec, so high key cardinality lands on disk, not in a hash map.
  // Ascending-nulls-first / descending-nulls-last are SortOrder defaults,
  // matching the operator's null-smallest convention.
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    if (partial) Seq(Nil)
    else Seq(
      keys.map(ke => SortOrder(ke, Ascending)) :+
        SortOrder(order, if (descending) Descending else Ascending))

  /** Order comparator with explicit null placement: null compares smallest
    * (never NPEs the primitive-unboxing interpreted ordering).
    */
  private def nullAwareOrdering: Ordering[Any] = {
    val base = TypeUtils.getInterpretedOrdering(order.dataType)
    new Ordering[Any] {
      override def compare(x: Any, y: Any): Int =
        if (x == null && y == null) 0
        else if (x == null) -1
        else if (y == null) 1
        else base.compare(x, y)
    }
  }

  override protected def doExecute(): RDD[InternalRow] =
    if (partial) doExecutePartial() else doExecuteFinal()

  private def doExecutePartial(): RDD[InternalRow] = {
    val kVal = k
    val keyExprs = keys
    val orderExpr = order
    val desc = descending
    val childOutput = child.output
    val ordering = nullAwareOrdering
    val maxKeys = conf.getConfString("graft.topk.maxPartialKeys", "131072").toInt

    child.execute().mapPartitions ({ iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val boundOrder = BindReferences.bindReference(orderExpr, childOutput)
      // heap head = the WORST retained row (min-heap for descending top-k)
      val heapOrd: Ordering[(Any, InternalRow)] =
        if (desc) Ordering.by[(Any, InternalRow), Any](_._1)(ordering).reverse
        else Ordering.by[(Any, InternalRow), Any](_._1)(ordering)
      val heaps = mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[(Any, InternalRow)]]
      // reference-typed order values (struct/string/array) are VIEWS into
      // the reused row buffer — copy before retaining them in the heap
      def evalOrder(row: InternalRow): Any = boundOrder.eval(row) match {
        case r: InternalRow => r.copy()
        case s: org.apache.spark.unsafe.types.UTF8String => s.clone()
        case a: org.apache.spark.sql.catalyst.util.ArrayData => a.copy()
        case v => v
      }
      // rows whose key arrives after the cap STREAM through unfiltered
      // (no buffering) — the final phase computes the exact answer, the
      // cap only trades shuffle volume for bounded memory
      val streamed = iter.flatMap { row =>
        val key = keyProj(row)
        heaps.get(key) match {
          case Some(heap) =>
            val ord = evalOrder(row)
            if (heap.size < kVal) heap.enqueue((ord, row.copy()))
            else {
              val worst = heap.head._1
              val better = if (desc) ordering.gt(ord, worst) else ordering.lt(ord, worst)
              if (better) { heap.dequeue(); heap.enqueue((ord, row.copy())) }
            }
            Iterator.empty
          case None if heaps.size < maxKeys =>
            val h = mutable.PriorityQueue.empty[(Any, InternalRow)](heapOrd)
            h.enqueue((evalOrder(row), row.copy()))
            heaps.put(key.copy(), h)
            Iterator.empty
          case None =>
            Iterator.single(row)
        }
      }
      // `++` evaluates its operand lazily, so the heap contents are read
      // only after the input (and every heap update) is exhausted
      streamed ++ heaps.valuesIterator.flatMap(_.iterator.map(_._2))
    }, preservesPartitioning = true)
  }

  /** Final phase over (keys…, order)-sorted input: emit the first k rows of
    * each key group. Exact, single pass, O(1) state.
    */
  private def doExecuteFinal(): RDD[InternalRow] = {
    val kVal = k
    val keyExprs = keys
    val childOutput = child.output

    child.execute().mapPartitions ({ iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      var current: UnsafeRow = null
      var emitted = 0
      iter.filter { row =>
        val key = keyProj(row)
        if (current == null || key != current) {
          current = key.copy()
          emitted = 0
        }
        emitted += 1
        emitted <= kVal
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

/** Planner strategy: logical TopKPerKeyPlan → partial exec + final exec
  * (EnsureRequirements inserts the key exchange and the spillable sort
  * between them).
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
