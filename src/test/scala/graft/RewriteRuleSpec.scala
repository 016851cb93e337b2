package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.GraftExtensions

class RewriteRuleSpec extends AnyFunSuite {

  // extensions install at session-build time only — getOrCreate would hand
  // back another suite's extension-less session, so temporarily clear the
  // default, build ours, and restore the previous default for other suites
  lazy val spark: SparkSession = {
    val prev = SparkSession.getDefaultSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    prev.foreach(SparkSession.setDefaultSession)
    s
  }

  test("HOF dot-product pattern is rewritten to the native DotProduct expression") {
    // parquet-backed input so the optimizer can't constant-fold the plan away
    val e = Tables.embeddings(spark, SparkTest.sf)
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
    val df = e.select(aggregate(zip_with(col("v"), col("v"), (x, y) => x * y),
      lit(0.0), (acc, v) => acc + v).as("dot"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("vector_dot"),
      s"expected native rewrite, got:\n${optimized.take(1500)}")
    // value check against hand-computed norm² of one vector
    val vec = Tables.embeddings(spark, SparkTest.sf)
      .filter(col("vec_id") === 0).head.getSeq[Float](1).map(_.toDouble)
    val expected = vec.map(x => x * x).sum
    val got = e.filter(col("vec_id") === 0)
      .select(aggregate(zip_with(col("v"), col("v"), (x, y) => x * y),
        lit(0.0), (acc, v) => acc + v)).head.getDouble(0)
    assert(math.abs(got - expected) < 1e-12)
  }

  test("rewritten and unrewritten results agree on fixture embeddings") {
    val plain = GraftSession.local(2, "graft-test") // no extensions
    def compute(s: SparkSession): Double = {
      val e = Tables.embeddings(s, SparkTest.sf).limit(100)
        .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
      val pairs = e.as("x").join(e.as("y"), col("x.vec_id") < col("y.vec_id"))
      pairs.select(aggregate(zip_with(col("x.v"), col("y.v"), (a, b) => a * b),
          lit(0.0), (acc, v) => acc + v).as("dot"))
        .agg(sum("dot")).head.getDouble(0)
    }
    assert(compute(spark) == compute(plain))
  }

  test("extension session registers cosine_sim for SQL") {
    assert(spark.sql("SELECT cosine_sim(array(1.0d), array(1.0d))").head.getDouble(0) == 1.0)
  }

  test("unequal-length arrays yield NULL, matching zip_with null-padding") {
    import spark.implicits._
    // HOF form: zip_with pads the shorter array with nulls → NULL sum
    val hof = Seq((Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0)))
      .toDF("a", "b")
      .select(aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0), (acc, v) => acc + v).as("dot"))
    assert(hof.head.isNullAt(0))
    // native form must agree — a prefix-sum here would silently change results
    val native = Seq((Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0)))
      .toDF("a", "b")
      .select(graft.plans.VectorFunctions.vector_dot(col("a"), col("b")))
    assert(native.head.isNullAt(0))
    // and the equal-length value is unaffected
    val ok = Seq((Seq(1.0, 2.0), Seq(3.0, 4.0))).toDF("a", "b")
      .select(graft.plans.VectorFunctions.vector_dot(col("a"), col("b")))
    assert(ok.head.getDouble(0) == 11.0)
  }

  test("null elements propagate identically through the rewrite (HOF semantics)") {
    import spark.implicits._
    val df = Seq((Seq(Option(1.0), None), Seq(Option(2.0), Option(3.0))))
      .toDF("a", "b")
      .select(aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0), (acc, v) => acc + v).as("dot"))
    assert(df.head.isNullAt(0)) // null element → null sum, rewritten or not
    val direct = Seq((Seq(Option(1.0), None), Seq(Option(2.0), Option(3.0))))
      .toDF("a", "b")
      .select(graft.plans.VectorFunctions.vector_dot(col("a"), col("b")))
    assert(direct.head.isNullAt(0))
  }
}
