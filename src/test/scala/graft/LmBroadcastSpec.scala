package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the perplexity scorer's open-vocabulary degradation: with the
  * census threshold forced to 0, the count-table joins must plan WITHOUT
  * broadcast hints (shuffle hash / sort-merge on the bigram key — the
  * planner's choice, never a forced driver-side build) and produce
  * bit-identical results to the default broadcast path.
  */
class LmBroadcastSpec extends AnyFunSuite {
  import SparkTest._

  test("over-threshold vocab degrades to a non-broadcast join with identical results") {
    val name = "tx_lm_perplexity"
    val run = SparkEntry.queries(name)

    val broadcastPath = run(spark, sf)
    val bPlan = broadcastPath.queryExecution.executedPlan.toString
    assert(bPlan.contains("BroadcastHashJoin"),
      "default path should broadcast the census-verified small count tables")
    val expected = broadcastPath.collect().map(_.toString).sorted

    // threshold 0 = census says "too big"; auto-broadcast disabled so the
    // planner can't independently re-pick broadcast for these sf0.001-tiny
    // tables — with the hint correctly absent the joins MUST shuffle
    spark.conf.set("graft.lm.broadcastMaxBytes", "0")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val shufflePath = run(spark, sf)
      val sPlan = shufflePath.queryExecution.executedPlan.toString
      // vDf (one row by construction) keeps its explicit hint; the two
      // COUNT-table joins must plan as real shuffle-side joins
      assert(sPlan.contains("SortMergeJoin") || sPlan.contains("ShuffledHashJoin"),
        s"count-table joins should shuffle when over threshold:\n${sPlan.take(2000)}")
      assert(!sPlan.contains("BroadcastHashJoin"),
        s"broadcast hint leaked through the census gate:\n${sPlan.take(2000)}")
      val got = shufflePath.collect().map(_.toString).sorted
      assert(got.sameElements(expected), "join strategy changed the results")
    } finally {
      spark.conf.unset("graft.lm.broadcastMaxBytes")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
  }
}
