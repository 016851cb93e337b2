package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.warehouse.Incremental

class IncrementalSpec extends AnyFunSuite {
  import SparkTest._

  def dailyMart(fact: DataFrame): DataFrame =
    fact.groupBy(col("ts").cast("date").as("p_date"))
      .agg(count(lit(1)).as("n"),
        graft.functions.Fns.moneySum(col("value")).as("total"))

  test("incremental refresh rewrites only touched partitions and matches full rebuild") {
    val events = Tables.events(spark, sf).cache()
    val martPath = Files.createTempDirectory("graft_inc").toString + "/daily"

    // initial full build
    dailyMart(events).write.mode("overwrite").partitionBy("p_date").parquet(martPath)
    val before = spark.read.parquet(martPath).collect()
      .map(r => r.getDate(r.fieldIndex("p_date")).toString ->
        (r.getAs[Long]("n"), r.getAs[Double]("total"))).toMap

    // record partition dir mtimes
    def mtimes: Map[String, Long] =
      Files.list(Paths.get(martPath)).toArray.map(_.asInstanceOf[java.nio.file.Path])
        .filter(_.getFileName.toString.startsWith("p_date="))
        .map(p => p.getFileName.toString ->
          Files.list(p).toArray.map(_.asInstanceOf[java.nio.file.Path])
            .map(Files.getLastModifiedTime(_).toMillis).max).toMap
    val t0 = mtimes

    Thread.sleep(1100)
    // batch touching exactly one date
    val batch = events.filter(col("ts").cast("date") === "2024-01-03")
    val refreshed = Incremental.refresh(spark, events, batch, dailyMart, "ts", martPath)
    assert(refreshed.map(_.toString) == Seq("2024-01-03"))

    val t1 = mtimes
    val changed = t1.filter { case (k, v) => t0.get(k).exists(_ != v) }.keySet
    assert(changed == Set("p_date=2024-01-03"),
      s"expected only one partition rewritten, got $changed")

    // refreshed mart equals a full rebuild
    val after = spark.read.parquet(martPath).collect()
      .map(r => r.getDate(r.fieldIndex("p_date")).toString ->
        (r.getAs[Long]("n"), r.getAs[Double]("total"))).toMap
    assert(after == before)
  }

  test("date-partitioned fact layout prunes partitions for range scans and merge probes") {
    // the 100 TB claim the docs make (Ingest.writePartitioned,
    // appendWithDedup's probe, mergeInsertOnly's scaladoc), proven at the
    // plan AND file level: a date-scoped query over the partitioned fact
    // must read only that date's files, and the J5 merge probe must hit
    // the fact through the same pruned scan — not the full history
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val events = Tables.events(spark, sf)
    val base = Files.createTempDirectory("graft_part").toString
    val factPath = s"$base/events_part"
    graft.warehouse.Ingest.writePartitioned(events, factPath, "ts",
      mode = "overwrite")
    val partDirs = new java.io.File(factPath).listFiles()
      .filter(_.getName.startsWith("p_date="))
    assert(partDirs.length > 1, "fixture should span multiple dates")
    def parquetFilesIn(d: java.io.File): Int =
      d.listFiles().count(_.getName.endsWith(".parquet"))
    val totalFiles = partDirs.map(parquetFilesIn).sum
    val day = java.sql.Date.valueOf("2024-01-03")
    val dayFiles = partDirs.find(_.getName == "p_date=2024-01-03")
      .map(parquetFilesIn).getOrElse(0)
    assert(dayFiles > 0 && dayFiles < totalFiles)

    // files the executed plan actually read from the partitioned fact
    def factFilesRead(df: DataFrame): Long = {
      df.collect()
      def go(p: SparkPlan): Seq[Long] = p match {
        case a: AdaptiveSparkPlanExec => go(a.executedPlan)
        // AQE hides materialized stages: QueryStageExec has no children,
        // its actual subtree hangs off `plan`
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => go(q.plan)
        case f: FileSourceScanExec
            if f.relation.location.rootPaths.exists(_.toString.contains("events_part")) =>
          Seq(f.metrics("numFiles").value)
        case other => other.children.flatMap(go)
      }
      go(df.queryExecution.executedPlan).sum
    }

    val fact = spark.read.parquet(factPath)

    // heavy date-scoped scan: partition filter prunes to one date's
    // files, data filter reaches the parquet reader as a pushed filter
    val scanQ = fact.filter(col("p_date") === lit(day) && col("value") > 0)
      .agg(sum(col("value")).as("total"))
    val plan = scanQ.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*p_date".r.findFirstIn(plan).nonEmpty,
      s"no partition filter on p_date:\n${plan.take(1500)}")
    assert(plan.contains("PushedFilters: [IsNotNull(value), GreaterThan(value,0.0)]"),
      s"value predicate not pushed:\n${plan.take(1500)}")
    assert(factFilesRead(scanQ) == dayFiles,
      "scan must read exactly the target partition's files")

    // J5 merge-insert-only probe shape against the partitioned fact:
    // batch date range → p_date range filter → anti-join; replay of an
    // already-landed batch inserts zero AND reads only its partitions
    val batch = events.filter(to_date(col("ts")) === lit(day))
    val r = batch.agg(min(to_date(col("ts"))), max(to_date(col("ts")))).head
    val probe = fact.filter(
      col("p_date") >= lit(r.getDate(0)) && col("p_date") <= lit(r.getDate(1)))
    val inserts = batch.join(probe.select("event_id"), Seq("event_id"), "left_anti")
    assert(inserts.count() == 0, "replayed batch must find every key landed")
    assert(factFilesRead(inserts) == dayFiles,
      "merge probe must read only the touched date partitions")
  }

  test("refreshFromFeed: CDC-driven mart trails snapshot versions; emptied dates drop") {
    import graft.warehouse.Snapshots
    val base = Files.createTempDirectory("graft_feedmart").toString
    val table = base + "/fact"
    val martPath = base + "/mart"
    val events = Tables.events(spark, sf)
      .select(col("event_id"), col("ts"), col("value"))
    val d3 = "2024-01-03"
    def martState: Map[String, (Long, Double)] =
      spark.read.parquet(martPath).collect()
        .map(r => r.getDate(r.fieldIndex("p_date")).toString ->
          (r.getAs[Long]("n"), r.getAs[Double]("total"))).toMap
    def rebuilt(v: Long): Map[String, (Long, Double)] =
      dailyMart(Snapshots.read(spark, table, Some(v))).collect()
        .map(r => r.getDate(r.fieldIndex("p_date")).toString ->
          (r.getAs[Long]("n"), r.getAs[Double]("total"))).toMap

    // v1: every date but d3 lands; the v0->v1 feed IS the initial build
    Snapshots.commitAppend(spark,
      events.filter(col("ts").cast("date") =!= d3), table)
    Incremental.refreshFromFeed(spark, table, 0L, 1L, Seq("event_id"),
      dailyMart, "ts", martPath)
    assert(martState == rebuilt(1L))
    assert(!martState.contains(d3))

    // v2: d3 arrives — the feed touches ONLY d3, the mart catches up
    Snapshots.commitAppend(spark,
      events.filter(col("ts").cast("date") === d3), table)
    val r2 = Incremental.refreshFromFeed(spark, table, 1L, 2L,
      Seq("event_id"), dailyMart, "ts", martPath)
    assert(r2.map(_.toString) == Seq(d3), s"touched $r2")
    assert(martState == rebuilt(2L))

    // v3: a copy-on-write delete empties d3 — its mart partition must
    // DROP, not resurrect (dynamic overwrite only rewrites produced
    // partitions; the stale-dir clear is the part under test)
    val doomed = events.filter(col("ts").cast("date") === d3)
      .select("event_id").collect().map(_.getLong(0)).toSeq
    val (v3, nDel) = Snapshots.commitDelete(spark, table, doomed, "event_id")
    assert(nDel == doomed.size.toLong)
    val r3 = Incremental.refreshFromFeed(spark, table, 2L, v3,
      Seq("event_id"), dailyMart, "ts", martPath)
    assert(r3.map(_.toString) == Seq(d3), s"touched $r3")
    assert(martState == rebuilt(v3))
    assert(!martState.contains(d3), "emptied date's mart partition resurrected")

    // an idle step refreshes nothing
    assert(Incremental.refreshFromFeed(spark, table, v3, v3,
      Seq("event_id"), dailyMart, "ts", martPath).isEmpty)
  }

  test("refreshFromFeed: a date-moving update refreshes the date it left") {
    import graft.warehouse.Snapshots
    import spark.implicits._
    val base = Files.createTempDirectory("graft_feedmove").toString
    val table = base + "/fact"
    val martPath = base + "/mart"
    val events = Tables.events(spark, sf)
      .select(col("event_id"), col("ts"), col("value"))
    Snapshots.commitAppend(spark, events, table)
    Incremental.refreshFromFeed(spark, table, 0L, 1L, Seq("event_id"),
      dailyMart, "ts", martPath)
    // correct one event's timestamp across a date boundary: the feed's
    // update_preimage row carries the OLD date, so the partition the row
    // left recomputes too — post-image-only feeds leave it stale forever
    val mover = events.filter(col("ts").cast("date") === "2024-01-01")
      .limit(1).collect().head
    val moved = Seq((mover.getLong(0),
        java.sql.Timestamp.valueOf("2024-01-02 12:00:00"),
        mover.getDouble(2)))
      .toDF("event_id", "ts", "value")
    val v2 = Snapshots.commitMerge(spark, moved, table, Seq("event_id"))
    val r = Incremental.refreshFromFeed(spark, table, 1L, v2,
      Seq("event_id"), dailyMart, "ts", martPath)
    assert(r.map(_.toString).toSet == Set("2024-01-01", "2024-01-02"),
      s"touched $r")
    def state(df: DataFrame): Map[String, (Long, Double)] =
      df.collect().map(r => r.getDate(r.fieldIndex("p_date")).toString ->
        (r.getAs[Long]("n"), r.getAs[Double]("total"))).toMap
    assert(state(spark.read.parquet(martPath)) ==
      state(dailyMart(Snapshots.read(spark, table, Some(v2)))),
      "incremental refresh after a date-moving update must equal a rebuild")
  }

  test("syncMart: persisted cursor self-drives catch-up; retention lapse rebuilds") {
    import graft.warehouse.Snapshots
    val base = Files.createTempDirectory("graft_syncmart").toString
    val table = base + "/fact"
    val martPath = base + "/mart"
    val events = Tables.events(spark, sf)
      .select(col("event_id"), col("ts"), col("value"))
    val d3 = "2024-01-03"
    def state: Map[String, (Long, Double)] =
      spark.read.parquet(martPath).collect()
        .map(r => r.getDate(r.fieldIndex("p_date")).toString ->
          (r.getAs[Long]("n"), r.getAs[Double]("total"))).toMap
    def rebuilt(v: Long): Map[String, (Long, Double)] =
      dailyMart(Snapshots.read(spark, table, Some(v))).collect()
        .map(r => r.getDate(r.fieldIndex("p_date")).toString ->
          (r.getAs[Long]("n"), r.getAs[Double]("total"))).toMap
    def sync() = Incremental.syncMart(spark, table, Seq("event_id"),
      dailyMart, "ts", martPath)

    // first sync IS the initial build, and it records where it stopped
    Snapshots.commitAppend(spark,
      events.filter(col("ts").cast("date") =!= d3), table)
    val (f1, h1, _) = sync()
    assert((f1, h1) == (0L, 1L))
    assert(Incremental.martCursor(spark, martPath) == 1L)
    assert(state == rebuilt(1L) && !state.contains(d3))

    // two base commits between syncs: ONE catch-up covers the window
    Snapshots.commitAppend(spark,
      events.filter(col("ts").cast("date") === d3), table)        // v2
    val doomed = events.filter(col("ts").cast("date") === d3)
      .select("event_id").collect().map(_.getLong(0)).toSeq
    val (v3, _) = Snapshots.commitDelete(spark, table, doomed, "event_id")
    val (f2, h2, _) = sync()
    assert((f2, h2) == (1L, v3))
    assert(state == rebuilt(v3))
    // idle: nothing to do, cursor stays
    assert(sync() == ((v3, v3, Nil)))

    // crash between mart swap and cursor write ≡ lost cursor: the replay
    // re-covers the whole window idempotently and converges
    val fsys = new org.apache.hadoop.fs.Path(martPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fsys.delete(new org.apache.hadoop.fs.Path(martPath, "_graft_cursor"), false)
    val (f4, h4, _) = sync()
    assert((f4, h4) == (0L, v3) && state == rebuilt(v3))

    // lagging past vacuum retention: the precise feed is gone — syncMart
    // falls back to one full rebuild and resumes incremental from head
    val v4 = Snapshots.commitAppend(spark,
      events.filter(col("ts").cast("date") === d3), table)
    Snapshots.vacuum(spark, table, keepVersions = 1)
    assert(!Snapshots.hasVersion(spark, table, v3))
    val (f5, h5, _) = sync()
    assert((f5, h5) == (v3, v4))
    assert(state == rebuilt(v4) && state.contains(d3))
    assert(Incremental.martCursor(spark, martPath) == v4)
  }

  test("syncMart: a lost cursor over a mart with stale partitions rebuilds, dropping them") {
    import graft.warehouse.Snapshots
    val base = Files.createTempDirectory("graft_syncmart_lost").toString
    val table = base + "/fact"
    val martPath = base + "/mart"
    val events = Tables.events(spark, sf)
      .select(col("event_id"), col("ts"), col("value"))
    val d3 = "2024-01-03"
    def sync() = Incremental.syncMart(spark, table, Seq("event_id"),
      dailyMart, "ts", martPath)
    Snapshots.commitAppend(spark, events, table) // v1: d3 present
    sync()
    assert(spark.read.parquet(martPath)
      .filter(col("p_date") === d3).count() > 0)
    // base deletes ALL of d3; then the cursor is lost
    val doomed = events.filter(col("ts").cast("date") === d3)
      .select("event_id").collect().map(_.getLong(0)).toSeq
    Snapshots.commitDelete(spark, table, doomed, "event_id") // v2
    val fsys = new org.apache.hadoop.fs.Path(martPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fsys.delete(new org.apache.hadoop.fs.Path(martPath, "_graft_cursor"), false)
    // a v0 cursor over an existing mart must REBUILD (the inserts-only
    // v0->head feed could never clear d3's now-stale partition)
    sync()
    assert(spark.read.parquet(martPath)
      .filter(col("p_date") === d3).count() == 0,
      "stale mart partition must drop on the lost-cursor rebuild")
    assert(Incremental.martCursor(spark, martPath) == 2L)
  }

  test("touchedDates finds exactly the batch's dates") {
    val batch = Tables.events(spark, sf)
      .filter(col("ts").cast("date").isin("2024-01-01", "2024-01-05"))
    val dates = Incremental.touchedDates(batch, "ts").map(_.toString).sorted
    assert(dates == Seq("2024-01-01", "2024-01-05"))
  }
}
