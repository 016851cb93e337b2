package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.Platform

/** shingle_hash64(tokens, n): the DISTINCT 64-bit hashes of a document's
  * n-word shingles, computed in one codegen'd pass.
  *
  * The composed formulation —
  * `array_distinct(transform(sequence(...), i => xxhash64(array_join(
  * slice(tokens, i, n), " "))))` — evaluates the lambda interpreted per
  * shingle position, materializing a sliced array and a joined string
  * each time. This expression walks the token array once, assembles each
  * shingle's UTF-8 bytes in a reused buffer, and hashes with XXH64 seed
  * 42 — BIT-IDENTICAL to `xxhash64(array_join(slice(tokens,i,n), ' '))`
  * on the same tokens, so every downstream set size / intersection count
  * / MinHash family value is unchanged.
  *
  * Documents with fewer than n tokens yield an empty array. Null token
  * elements are treated as empty strings (`array_join` semantics drop
  * nothing for our single-space fixtures; split() never yields nulls).
  *
  * `distinct = false` keeps one hash PER WINDOW POSITION (multiplicity
  * preserved, original order) — the form positional statistics need
  * (duplicated-span census, frequency profiles); set-similarity
  * consumers keep the default distinct form.
  */
case class ShingleHash64(child: Expression, n: Int,
    distinct: Boolean = true) extends UnaryExpression {

  require(n >= 1, s"shingle size must be >= 1, got $n")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hash64"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingle_hash64 requires array<string>, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    ShingleHash64.compute(input.asInstanceOf[ArrayData], n, distinct)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.ShingleHash64.compute($c, $n, $distinct)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleHash64 {

  /** One-pass shingle hashing; invoked from generated code. */
  def compute(toks: ArrayData, n: Int, distinct: Boolean): ArrayData = {
    val numToks = toks.numElements()
    val count = numToks - n + 1
    if (count <= 0) return new GenericArrayData(Array.empty[Long])
    val seen =
      if (distinct) new java.util.HashSet[java.lang.Long](count * 2) else null
    val out = new Array[Long](count)
    var outLen = 0
    var buf = new Array[Byte](64)
    var i = 0
    while (i < count) {
      // assemble "tok_i tok_{i+1} ... tok_{i+n-1}" bytes in the buffer
      var len = 0
      var j = 0
      while (j < n) {
        val s = if (toks.isNullAt(i + j)) null else toks.getUTF8String(i + j)
        val sLen = if (s == null) 0 else s.numBytes()
        val need = len + sLen + 1
        if (need > buf.length) {
          val grown = new Array[Byte](math.max(need, buf.length * 2))
          System.arraycopy(buf, 0, grown, 0, len)
          buf = grown
        }
        if (j > 0) { buf(len) = ' '; len += 1 }
        if (s != null) {
          s.writeToMemory(buf, Platform.BYTE_ARRAY_OFFSET + len)
          len += sLen
        }
        j += 1
      }
      val h = XXH64.hashUnsafeBytes(buf, Platform.BYTE_ARRAY_OFFSET, len, 42L)
      if (seen == null || seen.add(h)) { out(outLen) = h; outLen += 1 }
      i += 1
    }
    if (outLen == count) new GenericArrayData(out)
    else new GenericArrayData(java.util.Arrays.copyOf(out, outLen))
  }

  def shingle_hash64(tokens: Column, n: Int, distinct: Boolean = true): Column =
    ColumnBridge.column(ShingleHash64(ColumnBridge.expression(tokens), n, distinct))
}
