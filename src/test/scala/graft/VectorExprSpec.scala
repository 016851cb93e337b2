package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup
import graft.plans.VectorFunctions

class VectorExprSpec extends AnyFunSuite {
  import SparkTest._
  import spark.implicits._

  lazy val vecs = Seq(
    (1L, Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
    (2L, Seq(0.0, 0.0), Seq(1.0, 1.0)),          // zero norm
    (3L, Seq(1.0, 0.0), Seq(1.0, 0.0))            // identical
  ).toDF("id", "a", "b")

  test("native md5_variates matches the composed md5/conv formulation bit-for-bit") {
    // the bootstrap fan-out's hash convention: variate b = hex chars
    // (b%8)*4+1..+4 of md5(key ++ "~"*(b/8)), as a number — the same
    // values the DuckDB oracles recompute with a strpos polynomial
    val keys = Tables.lineitem(spark, sf).limit(500)
      .select(concat(col("l_orderkey").cast("string"), lit("_"),
        col("l_linenumber").cast("string")).as("k"))
    val composed = keys.select(col("k"),
      array(md5(col("k").cast("binary")),
        md5(concat(col("k"), lit("~")).cast("binary")),
        md5(concat(col("k"), lit("~~")).cast("binary")),
        md5(concat(col("k"), lit("~~~")).cast("binary"))).as("hs"))
      .select(col("k") +: (0 until 32).map(b =>
        conv(substring(element_at(col("hs"), b / 8 + 1),
          (b % 8) * 4 + 1, 4), 16, 10).cast("long").as(s"v$b")): _*)
    val native = keys.select(col("k"),
      graft.plans.Md5Variates.md5_variates(col("k"), 32).as("vs"))
    val joined = composed.join(native, "k")
    val bad = joined.filter((0 until 32).map(b =>
      col(s"v$b") =!= element_at(col("vs"), b + 1)).reduce(_ || _)).count()
    // limit() is nondeterministic across the two branches — the join
    // hits their overlap; parity over that overlap is the claim
    assert(joined.count() > 100 && bad == 0,
      s"$bad keys diverge between native and composed variates")
  }

  test("native cosine_sim matches the HOF formulation exactly") {
    val rows = vecs.select(
      VectorFunctions.cosine_sim(col("a"), col("b")).as("native"),
      Dedup.cosine(col("a"), col("b")).as("hof")).collect()
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("vector_dot: known values, zero-length safety") {
    val got = vecs.select(VectorFunctions.vector_dot(col("a"), col("b")))
      .collect().map(_.getDouble(0)).toSeq
    assert(got == Seq(32.0, 0.0, 1.0))
    val empty = Seq((Seq.empty[Double], Seq.empty[Double])).toDF("a", "b")
      .select(VectorFunctions.vector_dot(col("a"), col("b"))).head.getDouble(0)
    assert(empty == 0.0)
  }

  test("codegen and interpreted paths agree on the fixture embeddings") {
    val e = Tables.embeddings(spark, sf).limit(50)
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
    val pairs = e.as("x").join(e.as("y"), col("x.vec_id") < col("y.vec_id"))
    val viaNative = pairs.select(
      VectorFunctions.cosine_sim(col("x.v"), col("y.v")).as("c")).agg(sum("c")).head.getDouble(0)
    val viaHof = pairs.select(
      Dedup.cosine(col("x.v"), col("y.v")).as("c")).agg(sum("c")).head.getDouble(0)
    assert(math.abs(viaNative - viaHof) < 1e-9)
  }

  test("SQL registration: cosine_sim usable from spark.sql") {
    VectorFunctions.register(spark)
    val got = spark.sql(
      "SELECT cosine_sim(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c").head.getDouble(0)
    assert(got == 1.0)
    // type misuse produces an analysis error, not a runtime crash
    val e = intercept[Exception] {
      spark.sql("SELECT cosine_sim('a', 'b')").collect()
    }
    assert(e.getMessage.toLowerCase.contains("array"))
  }
}
