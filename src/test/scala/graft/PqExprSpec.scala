package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.PqFunctions

/** Native PQ expressions (pq_encode / adc_score) — parity with the
  * declarative HOF formulation they replaced in `Similarity.pqKnn`, and
  * the null/edge contracts the codegen path must share with eval.
  */
class PqExprSpec extends AnyFunSuite {
  import SparkTest._
  import spark.implicits._

  // 2 subspaces × 3 codewords × 2 dims; codeword 0 and 1 of subspace 1
  // are EQUIDISTANT from (0.5, 0.5) → lowest-code tiebreak must pick 0
  val cb: Array[Array[Array[Double]]] = Array(
    Array(Array(0.0, 0.0), Array(1.0, 1.0), Array(5.0, 5.0)),
    Array(Array(0.0, 1.0), Array(1.0, 0.0), Array(9.0, 9.0)))

  // the HOF argmin pqKnn used before the native expression, verbatim
  private def hofCodes(vec: org.apache.spark.sql.Column) = {
    def cbLit(j: Int) = array(cb(j).zipWithIndex.map { case (c, i) =>
      struct(lit(i).as("code"), array(c.toIndexedSeq.map(lit): _*).as("cw"))
    }.toIndexedSeq: _*)
    def sqDist(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, v) => acc + v)
    def codeOf(j: Int) =
      element_at(array_sort(transform(cbLit(j), cent =>
        struct(sqDist(cent.getField("cw"), slice(vec, j * 2 + 1, 2)).as("dist"),
          cent.getField("code").as("code")))), 1).getField("code")
    array(codeOf(0), codeOf(1))
  }

  test("pq_encode matches the HOF argmin on the fixture embeddings (8×16 books)") {
    val e = Tables.embeddings(spark, sf).limit(64)
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
    // train real codebooks the way pqKnn does: 8 subspaces over dim 64
    val sample = e.orderBy("vec_id").limit(32).select("v").collect()
      .map(_.getSeq[Double](0).toArray)
    val books: Array[Array[Array[Double]]] = Array.tabulate(8) { j =>
      graft.operators.Similarity.lloyd(
        sample.map(v => java.util.Arrays.copyOfRange(v, j * 8, (j + 1) * 8)), 16)
    }
    def cbLit(j: Int) = array(books(j).zipWithIndex.map { case (c, i) =>
      struct(lit(i).as("code"), array(c.toIndexedSeq.map(lit): _*).as("cw"))
    }.toIndexedSeq: _*)
    def sqDist(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, v) => acc + v)
    def codeOf(j: Int) =
      element_at(array_sort(transform(cbLit(j), cent =>
        struct(sqDist(cent.getField("cw"), slice(col("v"), j * 8 + 1, 8)).as("dist"),
          cent.getField("code").as("code")))), 1).getField("code")
    val rows = e.select(
        PqFunctions.pq_encode(col("v"), books).as("native"),
        array((0 until 8).map(codeOf): _*).as("hof"))
      .collect()
    assert(rows.length == 64)
    rows.foreach { r =>
      assert(r.getSeq[Int](0) == r.getSeq[Int](1).map(_.toInt))
    }
  }

  test("pq_encode: equidistant centroids break to the lowest code (HOF parity)") {
    val df = Seq((1L, Seq(0.4, 0.4, 0.5, 0.5))).toDF("id", "v")
    val native = df.select(PqFunctions.pq_encode(col("v"), cb)).head.getSeq[Int](0)
    val hof = df.select(hofCodes(col("v"))).head.getSeq[Int](0)
    assert(native == Seq(0, 0))
    assert(hof.map(_.toInt) == native)
  }

  test("pq_encode: dimension mismatch and null input are null, not garbage") {
    val df = Seq((1L, Some(Seq(1.0, 2.0, 3.0))), (2L, None))
      .toDF("id", "v")
    val got = df.select(PqFunctions.pq_encode(col("v"), cb).as("c"))
      .collect().map(_.isNullAt(0)).toSeq
    assert(got == Seq(true, true))
  }

  test("adc_score matches the zip_with/element_at HOF sum exactly") {
    val df = Seq(
      (1L, Seq(Seq(1.0, 2.0, 3.0), Seq(10.0, 20.0, 30.0)), Seq(0, 2)),
      (2L, Seq(Seq(0.5, 0.25), Seq(0.125, 0.0625)), Seq(1, 1))
    ).toDF("id", "dtab", "codes")
    val rows = df.select(
      PqFunctions.adc_score(col("dtab"), col("codes")).as("native"),
      aggregate(zip_with(col("dtab"), col("codes"),
          (t, c) => element_at(t, c.cast("int") + 1)),
        lit(0.0), (acc, v) => acc + v).as("hof")).collect()
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
    assert(rows.map(_.getDouble(0)).toSeq == Seq(31.0, 0.3125))
  }

  test("adc_score: ragged lengths and out-of-range codes are null (HOF parity)") {
    val df = Seq(
      (1L, Seq(Seq(1.0)), Seq(0, 1)),      // outer length mismatch
      (2L, Seq(Seq(1.0, 2.0)), Seq(7))     // code beyond the table row
    ).toDF("id", "dtab", "codes")
    val got = df.select(PqFunctions.adc_score(col("dtab"), col("codes")).as("s"))
      .collect().map(_.isNullAt(0)).toSeq
    assert(got == Seq(true, true))
  }

  test("sim_knn_pq end-to-end result is unchanged by the native rewrite") {
    // the query's own contract: deterministic top-5 per probe with exact
    // cosine re-rank — spot-pin shape + self-exclusion + monotone ranks
    val out = SparkEntry.queries("sim_knn_pq")(spark, sf).collect()
    assert(out.nonEmpty)
    val byProbe = out.groupBy(_.getLong(0))
    byProbe.foreach { case (p, rs) =>
      assert(rs.length == 5, s"probe $p: expected 5 neighbors")
      assert(rs.map(_.getInt(3)).sorted.toSeq == Seq(1, 2, 3, 4, 5))
      assert(rs.forall(_.getLong(1) != p), "self-match leaked")
    }
  }
}
