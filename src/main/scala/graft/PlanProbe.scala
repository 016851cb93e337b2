package graft

/** Dev tool: print the executed plan of named registry queries at
  * sf0.01 — the quick `.explain` loop the build discipline calls for
  * before a query is considered done (`sbt "runMain graft.PlanProbe
  * dd_dup_ngram_spans a1_hourly_max_by"`). ExplainCheck holds the
  * load-bearing assertions; this is the interactive magnifier.
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(4, "probe")
    val names = if (args.nonEmpty) args.toSeq else Seq("s3_scan_project")
    names.foreach { q =>
      println(s"=== $q")
      println(SparkEntry.queries(q)(spark, "/root/testdata/sf0.01")
        .queryExecution.executedPlan.toString.take(3000))
    }
    spark.stop()
  }
}
