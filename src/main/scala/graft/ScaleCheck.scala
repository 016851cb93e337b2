package graft

import org.apache.spark.sql.SparkSession

/** Sub-linear-scaling guard (dev/CI gate): times every workload query at
  * two scale factors (default sf0.01 → sf0.1, a 10× data step) and FAILS
  * any query whose runtime grows by more than `SCALE_RATIO_MAX` (default
  * 15×) — the signature of an accidental all-pairs join, an unpruned
  * scan, or a driver-side loop that a single-SF bench can't see.
  *
  * Noise handling:
  *   - each (query, SF) runs TWICE and only the second (warm) run is
  *     timed — first-run fixed costs (codegen compile, planning, shuffle
  *     file setup) otherwise inflate the small-SF denominator and a
  *     genuinely quadratic query could hide under its own overhead;
  *   - local wall-clock still drifts ±20%, so a query only counts as a
  *     violation when its big-SF time also exceeds an absolute floor
  *     (`SCALE_FLOOR_SEC`, default 1.5s) — a 0.1s → 0.9s jitter is not a
  *     scaling pathology, 2s → 40s is.
  *
  * `sbt "runMain graft.ScaleCheck"`; exits 1 on any violation.
  */
object ScaleCheck {
  def main(args: Array[String]): Unit = {
    val smallDir = sys.env.getOrElse("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.01")
    val bigDir = sys.env.getOrElse("SPARK_GRAFT_SF_BIG", "/root/testdata/sf0.1")
    val maxRatio = sys.env.getOrElse("SCALE_RATIO_MAX", "15").toDouble
    val floorSec = sys.env.getOrElse("SCALE_FLOOR_SEC", "1.5").toDouble
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    // same session shape as Bench (via the shared builder) so scale
    // timings run under the planner config the benchmark uses
    val spark = GraftSession.local(cpus, "graft-scalecheck")
    spark.range(1000000).selectExpr("sum(id)").collect()
    Tables.lineitem(spark, smallDir).limit(1).collect()

    val only = sys.env.get("SPARK_GRAFT_SCALE_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    def run(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
        dir: String): Unit =
      fn(spark, dir).write.format("noop").mode("overwrite").save()
    def timeWarm(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
        dir: String): Double = {
      run(fn, dir) // untimed warmup: codegen + planning + shuffle setup
      val t0 = System.nanoTime()
      run(fn, dir)
      (System.nanoTime() - t0) / 1e9
    }
    var bad = 0
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot(_._1.startsWith("qc_"))
      .filter(q => only.forall(_.contains(q._1)))
      .foreach { case (name, fn) =>
        try {
          val tSmall = timeWarm(fn, smallDir)
          val tBig = timeWarm(fn, bigDir)
          val ratio = tBig / math.max(tSmall, 1e-3)
          val violation = tBig > floorSec && ratio > maxRatio
          if (violation) bad += 1
          println(f"$name%-26s small=$tSmall%7.2fs big=$tBig%7.2fs ratio=$ratio%6.1f ${if (violation) "SCALE_BAD" else "ok"}")
        } catch { case e: Throwable =>
          bad += 1
          println(f"$name%-26s FAILED ${e.getMessage}")
        }
      }
    println(if (bad == 0) "ALL_SCALE_OK" else s"$bad SCALE CHECKS FAILED")
    spark.stop()
    if (bad > 0) sys.exit(1)
  }
}
