package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Scale
import graft.warehouse.Ingest

class ScaleSpec extends AnyFunSuite {
  import SparkTest._
  import spark.implicits._

  test("saltedJoin produces exactly the rows of a plain join under heavy skew") {
    // skewed large side: 90% of rows share key 1
    val large = (1 to 2000).map(i => (if (i <= 1800) 1L else i.toLong, i))
      .toDF("k", "payload")
    val small = Seq((1L, "hot"), (5L, "cold"), (1900L, "tail"))
      .toDF("k", "name")
    val plain = large.join(small, Seq("k")).select("k", "payload", "name")
      .collect().map(_.toString).sorted
    val salted = Scale.saltedJoin(large, small, "k", saltFactor = 8)
      .select("k", "payload", "name").collect().map(_.toString).sorted
    assert(salted.sameElements(plain))
    // left join keeps unmatched large rows exactly once
    val plainLeft = large.join(small, Seq("k"), "left").count()
    // outer types that preserve the REPLICATED side would duplicate
    // unmatched small-side rows once per salt value — rejected up front
    intercept[IllegalArgumentException] {
      Scale.saltedJoin(large, small, "k", 8, "right_outer")
    }
    intercept[IllegalArgumentException] {
      Scale.saltedJoin(large, small, "k", 8, "full")
    }
    val saltedLeft = Scale.saltedJoin(large, small, "k", 8, "left").count()
    assert(saltedLeft == plainLeft)
  }

  test("approxDistinct within rsd of exact on the fixtures") {
    val e = Tables.events(spark, sf)
    val approx = Scale.approxDistinct(e, Seq("event_type"), "user_id")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = e.groupBy("event_type").agg(countDistinct("user_id"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, ex) =>
      assert(math.abs(approx(k) - ex) <= math.max(2, 0.15 * ex),
        s"$k: approx=${approx(k)} exact=$ex")
    }
  }

  test("HLL sketches persist as binary columns and merge without a history rescan") {
    // the qc_hll_rolling contract's storage leg: per-day sketches written
    // to parquet, read back, UNIONed with a brand-new day's sketch — the
    // estimate must equal the all-at-once aggregation over the raw rows,
    // proving cumulative distinct at 100 TB never rescans history
    val ev = Tables.events(spark, sf)
      .select(to_date(col("ts")).as("day"), col("user_id"))
    val dir = java.nio.file.Files.createTempDirectory("graft_hll").toString + "/sk"
    val (oldDays, newDay) = (col("day") < "2024-01-20", col("day") >= "2024-01-20")
    ev.filter(oldDays).groupBy(col("day"))
      .agg(hll_sketch_agg(col("user_id"), lit(14)).as("sk"))
      .write.parquet(dir)
    val merged = spark.read.parquet(dir).select(col("sk"))
      .unionAll(ev.filter(newDay)
        .agg(hll_sketch_agg(col("user_id"), lit(14)).as("sk")))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .head.getLong(0)
    val direct = ev
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"), lit(14))))
      .head.getLong(0)
    assert(merged == direct,
      s"re-read + merged sketches must estimate like one pass ($merged vs $direct)")
  }

  test("KLL sketches persist as binary columns and merge without a history rescan") {
    // the qc_kll_rolling contract's storage leg: per-day quantile
    // sketches written to parquet, read back, merged with a brand-new
    // day's sketch — the merged median must carry the exact normalized
    // rank the sketch promises over ALL rows, proving rolling quantiles
    // at 100 TB never rescan history
    val ev = Tables.events(spark, sf)
      .select(to_date(col("ts")).as("day"), col("value"))
      .filter(col("value").isNotNull)
    val dir = java.nio.file.Files.createTempDirectory("graft_kll").toString + "/sk"
    val (oldDays, newDay) = (col("day") < "2024-01-20", col("day") >= "2024-01-20")
    ev.filter(oldDays).groupBy(col("day"))
      .agg(call_function("kll_sketch_agg_double", col("value"), lit(200)).as("sk"))
      .write.parquet(dir)
    val med = spark.read.parquet(dir).select(col("sk"))
      .unionAll(ev.filter(newDay)
        .agg(call_function("kll_sketch_agg_double", col("value"), lit(200)).as("sk")))
      .agg(call_function("kll_sketch_get_quantile_double",
        call_function("kll_merge_agg_double", col("sk")), lit(0.5)).as("m"))
      .head.getDouble(0)
    val n = ev.count()
    val rank = ev.filter(col("value") <= med).count().toDouble / n
    assert(math.abs(rank - 0.5) <= 0.025,
      s"merged persisted sketches must hold the rank bound (rank=$rank)")
  }

  test("approxQuantiles brackets the true median") {
    val e = Tables.events(spark, sf)
    val Array(q50) = Scale.approxQuantiles(e, "value", Array(0.5))
    val n = e.count()
    val below = e.filter(col("value") <= q50).count()
    assert(math.abs(below.toDouble / n - 0.5) < 0.05)
  }

  test("bucketed tables join without a shuffle (no Exchange in the plan)") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Scale.writeBucketed(Tables.orders(spark, sf), "b_orders", "o_orderkey", 8)
      Scale.writeBucketed(
        Tables.lineitem(spark, sf).withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem", "o_orderkey", 8)
      val joined = spark.table("b_orders")
        .join(spark.table("b_lineitem"), Seq("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(1200))
      assert(!plan.contains("Exchange"),
        s"bucketed join should not shuffle:\n${plan.take(1200)}")
      assert(joined.count() == Tables.lineitem(spark, sf).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }

  test("date-partitioned writes enable partition pruning (PartitionFilters in plan)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString + "/events"
    Ingest.writePartitioned(Tables.events(spark, sf), dir, "ts", mode = "overwrite")
    val pruned = spark.read.parquet(dir)
      .filter(col("p_date") === "2024-01-05")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(p_date"),
      s"no partition filter in plan:\n${plan.take(1500)}")
    // pruned count equals an independently-computed per-date count
    val expected = Tables.events(spark, sf)
      .filter(col("ts").cast("date") === "2024-01-05").count()
    assert(pruned.count() == expected && expected > 0)
    // the physical scan reads exactly one of the date partitions
    val scan = pruned.queryExecution.executedPlan.collectLeaves()
      .collectFirst { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
    assert(scan.nonEmpty)
    assert(scan.get.selectedPartitions.partitionCount == 1,
      s"expected 1 pruned partition, got ${scan.get.selectedPartitions.partitionCount}")
  }

  test("dynamic partition pruning: dim filter prunes the fact scan at runtime") {
    // date-partitioned fact joined to a filtered dim on the partition key:
    // DPP injects the dim's keys as a runtime filter into the fact scan,
    // so only matching partitions are read — the join-driven analog of
    // static partition pruning, essential when the filter is on the dim
    val dir = java.nio.file.Files.createTempDirectory("graft_dpp").toString
    val fact = (1 to 30).flatMap(d => (1 to 100).map(i =>
      (i.toLong, f"2024-01-$d%02d"))).toDF("v", "d")
      .select(col("v"), col("d").cast("date").as("p_date"))
    fact.write.partitionBy("p_date").parquet(s"$dir/fact")
    val dim = (1 to 30).map(d => (f"2024-01-$d%02d", if (d <= 2) "keep" else "drop"))
      .toDF("d", "tag").select(col("d").cast("date").as("p_date"), col("tag"))
    dim.write.parquet(s"$dir/dim")

    val f = spark.read.parquet(s"$dir/fact")
    val dm = spark.read.parquet(s"$dir/dim").filter(col("tag") === "keep")
    val joined = f.join(dm, Seq("p_date"))
    val planStr = joined.queryExecution.executedPlan.toString
    assert(planStr.contains("dynamicpruning"),
      s"fact scan should carry a dynamic pruning filter:\n${planStr.take(1500)}")
    assert(joined.count() == 200) // 2 kept dates × 100 rows
  }

  test("AQE splits a skewed sort-merge join at runtime (skew=true in final plan)") {
    // dedicated session: aggressive skew thresholds so the fixture-scale
    // skew triggers the same runtime re-plan that saves 100 TB joins
    import org.apache.spark.sql.SparkSession
    val prev = SparkSession.getDefaultSession
    SparkSession.clearDefaultSession(); SparkSession.clearActiveSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-aqe-skew")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      import s.implicits._
      val skewed = s.range(0, 200000)
        .select(when(col("id") % 10 =!= 0, 7L).otherwise(col("id")).as("k"),
          concat(lit("payload-payload-payload-"), col("id")).as("v"))
      val right = s.range(0, 50000).select(col("id").as("k"), (col("id") * 2).as("w"))
      val joined = skewed.join(right, Seq("k"))
      // drive THIS QueryExecution (a write/count would plan a fresh one
      // and the original would stay isFinalPlan=false)
      joined.queryExecution.toRdd.count()
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"AQE should mark the skewed join split:\n${finalPlan.take(1500)}")
    } finally {
      // do NOT s.stop(): getOrCreate reused the GLOBAL SparkContext (a
      // JVM has one), so stopping this session would kill the shared
      // test session's context and poison every suite that runs after
      // this one. The aggressive AQE confs are session-scoped and die
      // with `s`; just restore the default/active session handles.
      SparkSession.clearActiveSession()
      prev.foreach { p =>
        SparkSession.setDefaultSession(p)
        SparkSession.setActiveSession(p)
      }
    }
  }
}
