package graft

import org.scalatest.funsuite.AnyFunSuite

/** Recursive-CTE capability boundary of the SQL surface (Spark 4.x):
  * linear recursion (UNION ALL + a monotone guard) works; DISTINCT-union
  * recursion — what a cyclic-graph closure needs to terminate — is not
  * supported, which is WHY the dedup-cluster closure ships as the
  * `Dedup.connectedComponents` DataFrame operator rather than SQL text
  * (the DuckDB oracle for dd_components uses its recursive distinct
  * UNION; the engine side uses distributed label propagation).
  */
class RecursiveProbeSpec extends AnyFunSuite {
  import SparkTest._

  test("linear recursive CTE (UNION ALL) is supported in the SQL surface") {
    val got = spark.sql(
      "WITH RECURSIVE t(n) AS (SELECT 1 UNION ALL SELECT n + 1 FROM t WHERE n < 5) SELECT sum(n) FROM t")
      .head.getLong(0)
    assert(got == 15L)
  }

  test("sql_recursive_spine: spine is contiguous first-of-month with no census rows lost") {
    val rows = SparkEntry.queries("sql_recursive_spine")(spark, sf)
      .orderBy("month").collect()
    assert(rows.nonEmpty)
    val months = rows.map(_.getDate(0).toLocalDate)
    months.foreach(m => assert(m.getDayOfMonth == 1, s"$m not month-start"))
    months.sliding(2).foreach { case Array(a, b) =>
      assert(a.plusMonths(1) == b, s"spine gap between $a and $b")
    case _ => ()
    }
    // every order lands in some spine month: census total equals table count
    val total = rows.map(_.getLong(1)).sum
    assert(total == Tables.orders(spark, sf).count(),
      "spine census lost or duplicated orders")
  }

  test("distinct-UNION recursion (cyclic closure) is rejected, not wrong") {
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql(
        """WITH RECURSIVE e(a, b) AS (
          |  SELECT * FROM VALUES (1,2),(2,1)
          |),
          |reach(src, node) AS (
          |  SELECT 1, 1
          |  UNION
          |  SELECT r.src, e.b FROM reach r JOIN e ON r.node = e.a
          |)
          |SELECT count(*) FROM reach""".stripMargin).collect()
    }
    assert(e.getCondition == "UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE")
  }
}
