package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native expressions for the product-quantization hot path
  * (`Similarity.pqKnn`, ref dedup/ANN surface).
  *
  * The declarative formulation evaluates nested higher-order lambdas
  * interpreted per row: encoding is `array_sort(transform(cbLit, cent =>
  * struct(aggregate(zip_with(...)), code)))` — m·kSub struct allocations
  * and two lambda frames per centroid distance — and ADC scoring is
  * `aggregate(zip_with(dtab, codes, element_at), +)` per candidate pair.
  * At ANN-join cardinalities (probes × corpus) the lambda interpreter is
  * the dominant cost. These expressions compile the same arithmetic into
  * one primitive loop inside whole-stage codegen.
  *
  * Arithmetic parity with the HOF form is exact: the same sequential
  * left-to-right accumulation per subspace, the same squared-distance
  * expression shape, and the same lowest-code tiebreak on equal
  * distances (strict `<` keeps the first minimum; `array_sort` over
  * (dist, code) structs picks the same element).
  */

/** pq_encode(vec) = the m-element code array: per subspace j, the index
  * of the codebook-j centroid nearest (squared L2) to
  * vec[j·sub .. (j+1)·sub). Null for a null/length-mismatched input;
  * null vector elements read as 0.0 (fixture embeddings are non-null by
  * schema — the guard is for robustness, not semantics).
  */
case class PqEncode(child: Expression, codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression {

  require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty),
    "pq_encode requires a non-empty codebook per subspace")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_encode requires array<double>, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    PqEncode.compute(input.asInstanceOf[ArrayData], codebooks)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("pqCodebooks", codebooks, "double[][][]")
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = graft.plans.PqEncode.compute($c, $cb);
       |if (${ev.value} == null) { ${ev.isNull} = true; }
     """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PqEncode {

  /** One-pass PQ encoding; invoked from generated code. Returns null on
    * dimension mismatch (the HOF form would yield a null-poisoned sort).
    */
  def compute(vec: ArrayData, cb: Array[Array[Array[Double]]]): ArrayData = {
    val m = cb.length
    val sub = cb(0)(0).length
    if (vec.numElements() != m * sub) return null
    val out = new Array[Int](m)
    var j = 0
    while (j < m) {
      val cbj = cb(j)
      val base = j * sub
      var best = 0
      var bestD = Double.PositiveInfinity
      var c = 0
      while (c < cbj.length) {
        val cw = cbj(c)
        var dsum = 0.0
        var i = 0
        while (i < sub) {
          val v = if (vec.isNullAt(base + i)) 0.0 else vec.getDouble(base + i)
          val dx = cw(i) - v
          dsum += dx * dx
          i += 1
        }
        if (dsum < bestD) { bestD = dsum; best = c }
        c += 1
      }
      out(j) = best
      j += 1
    }
    new GenericArrayData(out)
  }
}

/** adc_score(dtab, codes) = Σ_j dtab[j][codes[j]] — the asymmetric-
  * distance-computation table lookup. Null when the outer lengths differ
  * or any looked-up cell is absent (`zip_with` + `element_at` parity).
  */
case class AdcScore(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "adc_score"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(ArrayType(DoubleType, _), _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"adc_score requires (array<array<double>>, array<int>), " +
          s"got ${l.sql} and ${r.sql}")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val dtab = a.asInstanceOf[ArrayData]
    val codes = b.asInstanceOf[ArrayData]
    val m = dtab.numElements()
    if (m != codes.numElements()) return null
    var sum = 0.0
    var j = 0
    while (j < m) {
      if (dtab.isNullAt(j) || codes.isNullAt(j)) return null
      val row = dtab.getArray(j)
      val c = codes.getInt(j)
      if (c < 0 || c >= row.numElements() || row.isNullAt(c)) return null
      sum += row.getDouble(c)
      j += 1
    }
    sum
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val m = ctx.freshName("m")
      val j = ctx.freshName("j")
      val sum = ctx.freshName("sum")
      val row = ctx.freshName("row")
      val c = ctx.freshName("c")
      s"""
         |int $m = $a.numElements();
         |double $sum = 0.0;
         |if ($m != $b.numElements()) { ${ev.isNull} = true; }
         |else {
         |  for (int $j = 0; $j < $m; $j++) {
         |    if ($a.isNullAt($j) || $b.isNullAt($j)) { ${ev.isNull} = true; break; }
         |    org.apache.spark.sql.catalyst.util.ArrayData $row = $a.getArray($j);
         |    int $c = $b.getInt($j);
         |    if ($c < 0 || $c >= $row.numElements() || $row.isNullAt($c)) {
         |      ${ev.isNull} = true; break;
         |    }
         |    $sum += $row.getDouble($c);
         |  }
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Column-API surface (codebooks make pq_encode per-query-parameterized,
  * so there is no SQL registration — the Column form is the API).
  */
object PqFunctions {

  def pq_encode(vec: Column, codebooks: Array[Array[Array[Double]]]): Column =
    ColumnBridge.column(PqEncode(ColumnBridge.expression(vec), codebooks))

  def adc_score(dtab: Column, codes: Column): Column =
    ColumnBridge.column(AdcScore(
      ColumnBridge.expression(dtab), ColumnBridge.expression(codes)))
}
