package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Map-side membership test against a BANK of Bloom filters: the row's
  * long key picks its filter by `pmod(key, nb)` and tests it — the
  * per-bucket generalization of Spark's `BloomFilterMightContain`, which
  * only accepts ONE foldable sketch and so cannot express "each key
  * probes the filter of its own bucket" ([[graft.warehouse.BloomBank]]).
  *
  * The serialized blooms ship once per task inside the expression (same
  * transfer class as the single-sketch literal the non-banked path uses);
  * each executor deserializes the bank once (transient lazy) and every
  * row is then a floorMod + k hash probes. Codegen keeps the probe inside
  * whole-stage codegen via a reference object — no fallback row.
  */
case class BloomBankMightContain(bank: Array[Array[Byte]], child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_bank_might_contain"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_bank_might_contain requires a bigint key, got ${other.sql}")
  }

  @transient private lazy val filters: Array[BloomFilter] =
    BloomBankMightContain.deserialize(bank)

  override def nullSafeEval(input: Any): Any = {
    val h = input.asInstanceOf[Long]
    filters(java.lang.Math.floorMod(h, filters.length.toLong).toInt)
      .mightContainLong(h)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // Java SOURCE syntax for the cast, not classOf[...].getName: the JVM
    // binary name "[Lorg...BloomFilter;" doesn't parse as Java and makes
    // Janino reject the whole stage — silent interpreted fallback per task
    val ref = ctx.addReferenceObj("bloomBank", filters,
      classOf[BloomFilter].getName + "[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $ref[(int) java.lang.Math.floorMod($c, " +
        s"${filters.length}L)].mightContainLong($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomBankMightContain {
  private[plans] def deserialize(bank: Array[Array[Byte]]): Array[BloomFilter] =
    bank.map(b => BloomFilter.readFrom(new java.io.ByteArrayInputStream(b)))
}
