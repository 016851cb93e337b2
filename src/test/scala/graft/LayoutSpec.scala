package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Layout

class LayoutSpec extends AnyFunSuite {
  import SparkTest._

  test("morton key interleaves bits (known values)") {
    import spark.implicits._
    val got = Seq((0, 0), (1, 0), (0, 1), (1, 1), (65535, 0), (0, 65535))
      .toDF("x", "y")
      .select(Layout.mortonKey(col("x"), col("y")))
      .collect().map(_.getLong(0)).toSeq
    // x fills even bit positions, y odd
    assert(got(0) == 0L && got(1) == 1L && got(2) == 2L && got(3) == 3L)
    assert(got(4) == 0x55555555L && got(5) == 0xAAAAAAAAL)
  }

  test("z-order layout: box predicates touch far fewer files than linear sort") {
    val n = 200000
    // independent dimensions (hash-derived — a linear-in-id pair would
    // correlate and accidentally cluster y under the x sort)
    val grid = spark.range(n).select(
      pmod(xxhash64(col("id")), lit(1000)).cast("int").as("x"),
      pmod(xxhash64(col("id"), lit(1)), lit(1000)).cast("int").as("y"))
    val base = java.nio.file.Files.createTempDirectory("graft_layout").toString
    val files = 64
    Layout.linearWrite(grid, "x", s"$base/linear", files)
    Layout.zorderWrite(grid, "x", "y", s"$base/zorder", files)

    // a filter on the NON-sort dimension defeats linear clustering
    val yBand = col("y") >= 100 && col("y") < 150
    val linearTouched = Layout.filesTouched(spark, s"$base/linear", yBand)
    val zTouched = Layout.filesTouched(spark, s"$base/zorder", yBand)
    assert(linearTouched >= files * 3 / 4,
      s"linear layout should smear y-values across files (touched $linearTouched/$files)")
    assert(zTouched <= linearTouched / 2,
      s"z-order should localize the y-band (z=$zTouched vs linear=$linearTouched)")

    // a small 2-d box is localized even better
    val box = col("x") >= 100 && col("x") < 200 && col("y") >= 100 && col("y") < 200
    val zBox = Layout.filesTouched(spark, s"$base/zorder", box)
    assert(zBox <= files / 4,
      s"2-d box should touch a small band of z-ordered files (got $zBox/$files)")

    // layout never changes data
    assert(spark.read.parquet(s"$base/zorder").count() == n)
  }

  test("k-dimensional z-order: a 3-d box localizes in all three dimensions") {
    val n = 200000
    val grid = spark.range(n).select(
      pmod(xxhash64(col("id")), lit(1000)).cast("int").as("x"),
      pmod(xxhash64(col("id"), lit(1)), lit(1000)).cast("int").as("y"),
      pmod(xxhash64(col("id"), lit(2)), lit(1000)).cast("int").as("z"))
    val base = java.nio.file.Files.createTempDirectory("graft_layout3").toString
    val files = 64
    Layout.zorderFrameN(grid, Seq("x", "y", "z"), files)
      .write.parquet(s"$base/z3")
    // a 10%-per-dimension box is 0.1% of the volume: on a 3-d curve it
    // touches a handful of files; a 2-d curve ignores z entirely, so the
    // same box smears across every z value inside its (x, y) band
    val box = col("x") >= 100 && col("x") < 200 &&
      col("y") >= 100 && col("y") < 200 &&
      col("z") >= 100 && col("z") < 200
    Layout.zorderWrite(grid, "x", "y", s"$base/z2", files)
    val t3 = Layout.filesTouched(spark, s"$base/z3", box)
    val t2 = Layout.filesTouched(spark, s"$base/z2", box)
    assert(t3 <= files / 8,
      s"3-d box should touch a small band of 3-d-curve files ($t3/$files)")
    assert(t3 < t2,
      s"clustering the third dimension must beat ignoring it ($t3 vs $t2)")
    assert(spark.read.parquet(s"$base/z3").count() == n)
  }

  test("stats manifest prunes the file LIST; pruned read ≡ full-scan filter") {
    val n = 100000
    val grid = spark.range(n).select(
      pmod(xxhash64(col("id")), lit(1000)).cast("int").as("x"),
      pmod(xxhash64(col("id"), lit(1)), lit(1000)).cast("int").as("y"))
    val base = java.nio.file.Files.createTempDirectory("graft_stats").toString
    val dir = s"$base/z"
    Layout.zorderWrite(grid, "x", "y", dir, 64)
    Layout.writeStatsManifest(spark, dir, Seq("x", "y"))

    val box = col("x") >= 100 && col("x") < 200 && col("y") >= 100 && col("y") < 200
    val ranges = Seq(("x", 100.0, 199.0), ("y", 100.0, 199.0))
    val pruned = Layout.statsPrunedRead(spark, dir, ranges).filter(box)
    val full = spark.read.parquet(dir).filter(box)
    assert(pruned.count() == full.count() && full.count() > 0)
    val Some((read, total)) = Layout.lastStatsPruned
    assert(total == 64 && read <= 16,
      s"driver-side file pruning must bite on a z-ordered box ($read/$total)")
    // file-level result set matches what footer-level skipping would pick
    assert(read.toLong >= Layout.filesTouched(spark, dir, box))
  }

  test("stats pruning is safe under drift: unmanifested appends always read") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_stats_drift").toString
    val dir = s"$base/t"
    (0 until 1000).map(i => (i % 100, i)).toDF("x", "v")
      .repartitionByRange(8, col("x")).sortWithinPartitions("x")
      .write.parquet(dir)
    Layout.writeStatsManifest(spark, dir, Seq("x"))
    // an append AFTER the manifest: its rows match the range but have no
    // stats — a reader that skipped them would silently drop data
    Seq((50, 999999)).toDF("x", "v").write.mode("append").parquet(dir)
    val got = Layout.statsPrunedRead(spark, dir, Seq(("x", 50.0, 50.0)))
      .filter(col("x") === 50)
    assert(got.count() ==
      spark.read.parquet(dir).filter(col("x") === 50).count())
    assert(got.filter(col("v") === 999999).count() == 1,
      "appended-after-manifest rows must not be skipped")
    val Some((read2, total2)) = Layout.lastStatsPruned
    assert(read2 < total2, "manifested non-matching files still prune")

    // an unmanifested file is read even for ranges it can't match...
    Layout.statsPrunedRead(spark, dir, Seq(("x", 10.0, 10.0)))
    val Some((readMiss, _)) = Layout.lastStatsPruned
    // ...until appendStatsManifest covers exactly the missing files
    // (scanning only them), after which it prunes out of range
    assert(Layout.appendStatsManifest(spark, dir) == 1)
    assert(Layout.appendStatsManifest(spark, dir) == 0, "idempotent")
    Layout.statsPrunedRead(spark, dir, Seq(("x", 10.0, 10.0)))
    val Some((readMiss2, _)) = Layout.lastStatsPruned
    assert(readMiss2 == readMiss - 1,
      s"the newly-manifested x=50 file must prune from an x=10 probe " +
        s"($readMiss -> $readMiss2)")
    // and the in-range probe still finds its row
    val again = Layout.statsPrunedRead(spark, dir, Seq(("x", 50.0, 50.0)))
      .filter(col("x") === 50)
    assert(again.filter(col("v") === 999999).count() == 1)
  }

  test("stats manifests reject unorderable columns; partitioned reads keep p_date") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_stats_edge").toString
    val dir = s"$base/t"
    (0 until 300).map(i => (i.toLong, f"2024-01-${i % 3 + 1}%02d", i % 2 == 0))
      .toDF("v", "d", "flag")
      .select(col("v"), col("d").cast("date").as("p_date"), col("flag"))
      .repartitionByRange(6, col("v"))
      .write.partitionBy("p_date").parquet(dir)
    // a boolean/binary/array stats column has no useful file range —
    // reject at write time instead of shipping a prune-nothing manifest
    intercept[IllegalArgumentException] {
      Layout.writeStatsManifest(spark, dir, Seq("flag"))
    }
    Layout.writeStatsManifest(spark, dir, Seq("v"))
    // leaf-file reads drop Hive partition columns without basePath — the
    // pruned frame must keep p_date and agree with the full scan
    val pruned = Layout.statsPrunedRead(spark, dir, Seq(("v", 0.0, 49.0)))
    assert(pruned.columns.contains("p_date"),
      "partition column must survive the pruned read")
    val got = pruned.filter(col("v") < 50)
      .groupBy(col("p_date")).count().collect()
      .map(r => r.get(0).toString -> r.getLong(1)).toMap
    val want = spark.read.parquet(dir).filter(col("v") < 50)
      .groupBy(col("p_date")).count().collect()
      .map(r => r.get(0).toString -> r.getLong(1)).toMap
    assert(got == want && want.nonEmpty)
    val Some((read, total)) = Layout.lastStatsPruned
    assert(read < total, s"range pruning must still fire ($read/$total)")
  }

  test("z-order + stats pruning on STRING columns (source-keyed corpus shape)") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_str_z").toString
    val dir = s"$base/t"
    // 100 sources x 100 rows: the corpus layout problem — queries filter
    // by a source band and a numeric band together
    val rows = for (s <- 0 until 100; i <- 0 until 100)
      yield (f"src$s%03d", (s * 7 + i) % 100, s.toLong * 100 + i)
    Layout.zorderFrameN(rows.toDF("source", "x", "id"),
        Seq("source", "x"), 64)
      .write.parquet(dir)
    Layout.writeStatsManifest(spark, dir, Seq("source", "x"))
    val box = col("source") >= "src010" && col("source") <= "src019" &&
      col("x") >= 10 && col("x") <= 19
    val pruned = Layout.statsPrunedRead(spark, dir,
      Seq(("source", "src010", "src019"), ("x", 10.0, 19.0))).filter(box)
    val full = spark.read.parquet(dir).filter(box)
    assert(pruned.count() == full.count() && full.count() > 0,
      "string-range pruning must agree with the full scan")
    val Some((read, total)) = Layout.lastStatsPruned
    assert(total == 64 && read * 2 < total,
      s"a 10%x10% box over a string+numeric z-order must read a strict " +
        s"minority of files ($read/$total)")
  }

  test("single-column ZORDER degenerates to a range cluster; date stats prune") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_date_z").toString
    val dir = s"$base/t"
    val rows = (0 until 3000).map { i =>
      (java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1)
        .plusDays(i % 300)), i.toLong)
    }
    Layout.zorderFrameN(rows.toDF("d", "id"), Seq("d"), 16)
      .write.parquet(dir)
    Layout.writeStatsManifest(spark, dir, Seq("d"))
    val lo = java.sql.Date.valueOf("2024-02-01")
    val hi = java.sql.Date.valueOf("2024-02-15")
    val box = col("d").between(lo, hi)
    val pruned = Layout.statsPrunedRead(spark, dir,
      Seq(("d", "2024-02-01", "2024-02-15"))).filter(box)
    assert(pruned.count() ==
      spark.read.parquet(dir).filter(box).count())
    assert(pruned.count() > 0)
    val Some((read, total)) = Layout.lastStatsPruned
    assert(read * 2 < total,
      s"a 15-of-300-day window over a date-clustered table must read a " +
        s"strict minority of files ($read/$total)")
  }
}
