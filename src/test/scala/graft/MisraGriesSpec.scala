package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.MisraGriesAgg.misra_gries

class MisraGriesSpec extends AnyFunSuite {
  import SparkTest._
  import spark.implicits._

  /** Skewed stream: "hot" 500×, "warm" 300×, 200 singletons; n = 1000. */
  lazy val skewed = {
    val rows = Seq.fill(500)("hot") ++ Seq.fill(300)("warm") ++
      (1 to 200).map(i => s"rare$i")
    // deterministic spread across partitions
    rows.zipWithIndex.map { case (s, i) => (i, s) }
      .toDF("i", "s").repartition(8, col("i"))
  }

  test("MG guarantee: items above n/k are present, estimates within n/k") {
    val n = 1000.0
    val k = 4
    val mg = skewed.agg(misra_gries(col("s"), k).as("m"))
      .head.getMap[String, Long](0)
    val m = mg.toMap
    // guaranteed membership: true freq > n/k = 250
    assert(m.contains("hot") && m.contains("warm"))
    // estimate bounds: true - n/k <= est <= true
    assert(m("hot") <= 500 && m("hot") >= 500 - n / k)
    assert(m("warm") <= 300 && m("warm") >= 300 - n / k)
    // summary never exceeds k entries
    assert(m.size <= k)
  }

  test("guarantees hold under different partitionings (merge-order independence)") {
    val k = 4
    Seq(1, 2, 32).foreach { parts =>
      val m = skewed.repartition(parts, col("i"))
        .agg(misra_gries(col("s"), k))
        .head.getMap[String, Long](0).toMap
      assert(m.contains("hot") && m.contains("warm"), s"parts=$parts")
      assert(m("hot") >= 250 && m("hot") <= 500, s"parts=$parts: ${m("hot")}")
    }
  }

  test("works per-group and is SQL-callable through the extension session") {
    val grouped = skewed
      .withColumn("g", col("i") % 2)
      .groupBy("g").agg(misra_gries(col("s"), 4).as("m"))
      .collect()
    assert(grouped.length == 2)
    grouped.foreach(r => assert(r.getMap[String, Long](1).toMap.contains("hot")))

    // SQL surface via the injected function (extension session)
    val ext = new RewriteRuleSpec().spark
    import ext.implicits._
    Seq("a", "a", "a", "b").toDF("s").createOrReplaceTempView("mg_in")
    val viaSql = ext.sql("SELECT misra_gries(s, 2) FROM mg_in")
      .head.getMap[String, Long](0).toMap
    assert(viaSql.contains("a"))
  }
}
