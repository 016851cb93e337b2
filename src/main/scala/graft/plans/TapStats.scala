package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.DataType
import org.apache.spark.util.LongAccumulator

/** Pass-through boolean tap that counts rows evaluated (`probed`) and
  * rows that evaluated to true (`passed`) into Spark accumulators — the
  * zero-extra-job observability primitive for the streaming sinks' bloom
  * front-filters. The accumulation rides INSIDE the projection that the
  * micro-batch executes anyway (one `localCheckpoint` materialization),
  * so enabling stats adds no `count()` re-executions of the probe
  * lineage: accumulator deltas arrive with task completion, free and
  * production-safe (VERDICT r12 #8).
  *
  * CodegenFallback is deliberate: the tap only enters the plan when
  * `trackBloomStats` is on (spec/diagnosis mode), and correctness of the
  * counts needs exactly-once lineage execution, which the caller
  * guarantees by eagerly checkpointing the tapped frame — the codegen
  * break is confined to a frame that is materialized once and never
  * rescanned from source.
  */
case class TapBloomStat(child: Expression,
    probed: LongAccumulator,
    passed: LongAccumulator) extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "tap_bloom_stat"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    probed.add(1L)
    if (v != null && v.asInstanceOf[Boolean]) passed.add(1L)
    v
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
