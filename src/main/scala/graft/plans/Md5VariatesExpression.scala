package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** md5_variates(key, count): `count` uniform 16-bit variates of the
  * engine-wide md5 sampling convention, in one codegen'd pass.
  *
  * Variate b is the numeric value of hex characters
  * `[(b%8)·4+1 .. (b%8)·4+4]` of `md5(key ++ "~"·(b/8))` — exactly the
  * `Sampling.hexVal` convention with tilde-suffix re-keying, which is
  * what the DuckDB oracles recompute with a strpos polynomial. The
  * composed formulation (4 × `md5` hex strings, then 32 ×
  * `conv(substring(...), 16, 10)`) materializes four 32-char hex
  * strings per row and parses 128 hex characters back into numbers;
  * this expression reads the same 16-bit windows straight out of the
  * digest bytes (hex chars 4k+1..4k+4 ARE digest bytes 2k,2k+1
  * big-endian), so the whole fan-out is digest arithmetic with zero
  * intermediate strings. Bootstrap-resampling's per-row cost drops to
  * the four digests themselves.
  *
  * Null keys yield null (UnaryExpression null-intolerant default).
  */
case class Md5Variates(child: Expression, count: Int) extends UnaryExpression {

  require(count >= 1, s"variate count must be >= 1, got $count")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "md5_variates"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"md5_variates requires string, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    Md5Variates.compute(input.asInstanceOf[UTF8String], count)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.Md5Variates.compute($c, $count)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-thread MessageDigest holder shared by every md5-convention
  * expression in the package (MessageDigest is stateful — one instance
  * per executor thread).
  */
private[plans] object Md5Local {
  private val tl = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  def get(): java.security.MessageDigest = tl.get()
}

object Md5Variates {

  /** Invoked from generated code. */
  def compute(key: UTF8String, count: Int): GenericArrayData = {
    val d = Md5Local.get()
    val base = key.getBytes
    val out = new Array[Long](count)
    val nDigests = (count + 7) / 8
    val buf = new Array[Byte](base.length + nDigests - 1)
    System.arraycopy(base, 0, buf, 0, base.length)
    var j = 0
    var b = 0
    while (j < nDigests) {
      d.reset()
      d.update(buf, 0, base.length + j)
      val dig = d.digest()
      var k = 0
      while (k < 8 && b < count) {
        // hex chars 4k+1..4k+4 of the digest == bytes 2k,2k+1 big-endian
        out(b) = (((dig(2 * k) & 0xFF) << 8) | (dig(2 * k + 1) & 0xFF)).toLong
        k += 1
        b += 1
      }
      if (j + 1 < nDigests) buf(base.length + j) = '~'
      j += 1
    }
    new GenericArrayData(out)
  }

  def md5_variates(key: Column, count: Int): Column =
    ColumnBridge.column(Md5Variates(ColumnBridge.expression(key), count))
}
