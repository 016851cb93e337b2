package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.warehouse.Maintenance

class MaintenanceSpec extends AnyFunSuite {
  import SparkTest._
  import spark.implicits._
  import DupFlagKit.{docsDf, tokenRows, tokenText}

  test("compact rewrites only oversized partitions; data is identical") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact").toString + "/t"
    // partition A: 12 tiny appends (streaming accretion); partition B: 1 file
    (1 to 12).foreach { i =>
      Seq((i.toLong, "2024-01-01")).toDF("v", "d")
        .select(col("v"), col("d").cast("date").as("p_date"))
        .write.mode("append").partitionBy("p_date").parquet(dir)
    }
    Seq((100L, "2024-01-02")).toDF("v", "d")
      .select(col("v"), col("d").cast("date").as("p_date"))
      .write.mode("append").partitionBy("p_date").parquet(dir)

    val before = spark.read.parquet(dir).orderBy("v").collect().map(_.toString)
    val countsBefore = Maintenance.dataFileCounts(spark, dir)
    assert(countsBefore("p_date=2024-01-01") == 12)
    assert(countsBefore("p_date=2024-01-02") == 1)

    val compacted = Maintenance.compact(spark, dir, maxFilesPerPartition = 4)
    assert(compacted == Seq("p_date=2024-01-01"), "only the oversized partition")

    val countsAfter = Maintenance.dataFileCounts(spark, dir)
    assert(countsAfter("p_date=2024-01-01") <= 4,
      s"expected few files, got ${countsAfter("p_date=2024-01-01")}")
    assert(countsAfter("p_date=2024-01-02") == 1, "untouched partition kept as-is")
    val after = spark.read.parquet(dir).orderBy("v").collect().map(_.toString)
    assert(after.sameElements(before), "compaction must not change data")
  }

  test("compact sizes files per partition, not from the largest one") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact_pp").toString + "/t"
    // two OVERSIZED partitions with very different row counts: sizing
    // both from the larger one (the pre-r13 behavior) would re-shard the
    // small one into ~12 near-empty files — worse than before compaction
    def append(day: String, ids: Range): Unit =
      ids.grouped(math.max(1, ids.size / 6)).foreach { g =>
        g.map(i => (i.toLong, day)).toDF("v", "d")
          .select(col("v"), col("d").cast("date").as("p_date"))
          .coalesce(1).write.mode("append").partitionBy("p_date").parquet(dir)
      }
    append("2024-01-01", 0 until 1200) // → ceil(1200/100) = 12 files
    append("2024-01-02", 2000 until 2060) // → ceil(60/100) = 1 file
    val before = spark.read.parquet(dir).orderBy("v").collect().map(_.toString)
    val compacted = Maintenance.compact(spark, dir,
      maxFilesPerPartition = 4, targetRowsPerFile = 100L)
    assert(compacted.size == 2, "both partitions are oversized")
    val counts = Maintenance.dataFileCounts(spark, dir)
    assert(counts("p_date=2024-01-02") == 1,
      s"the 60-row partition must land in ONE file, got $counts")
    assert(counts("p_date=2024-01-01") > 1,
      s"the 1200-row partition must still split on targetRowsPerFile, got $counts")
    val after = spark.read.parquet(dir).orderBy("v").collect().map(_.toString)
    assert(after.sameElements(before), "compaction must not change data")
  }

  test("bloom_bank_might_contain compiles under whole-stage codegen") {
    import org.apache.spark.util.sketch.BloomFilter
    import org.apache.spark.sql.graft.ColumnBridge
    // pre-r13 the codegen cast used the JVM binary array name
    // ("[Lorg...BloomFilter;"), which Janino can't parse — every banked
    // probe stage silently fell back to interpreted eval. fallback=false
    // turns that silent fallback into a hard failure this test would see.
    val nb = 4
    val filters = Array.fill(nb)(BloomFilter.create(1000, 0.01))
    val keys = 0L until 64L
    keys.foreach(k => filters(java.lang.Math.floorMod(k, nb.toLong).toInt).putLong(k))
    val bank = filters.map { f =>
      val b = new java.io.ByteArrayOutputStream(); f.writeTo(b); b.toByteArray
    }
    val prev = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val got = spark.range(128).toDF("id")
        .filter(ColumnBridge.column(graft.plans.BloomBankMightContain(bank,
          ColumnBridge.expression(col("id")))))
        .collect().map(_.getLong(0)).toSet
      assert(keys.forall(got), "a bloom bank must have no false negatives")
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
      case None => spark.conf.unset("spark.sql.codegen.fallback")
    }
  }

  test("deleteByKey on a bucketed table rewrites only hit buckets; misses are free") {
    val dir = java.nio.file.Files.createTempDirectory("graft_del_bkt").toString + "/t"
    (0L until 200L).map(i => (i, s"doc$i")).toDF("doc_id", "body")
      .write.parquet(dir)
    Maintenance.compactDocTable(spark, dir, buckets = 16)
    def fileMap() = {
      val root = new java.io.File(dir)
      root.listFiles.filter(_.isDirectory).map(d =>
        d.getName -> d.listFiles.map(_.getName).toSet).toMap
    }
    val beforeFiles = fileMap()
    // keys 3 and 19 share bucket db=3; 1000 does not exist (its bucket
    // db=8 must NOT be rewritten for a key that never landed)
    val n = Maintenance.deleteByKey(spark, dir, Seq(3L, 19L, 1000L))
    assert(n == 2L)
    val afterFiles = fileMap()
    assert(afterFiles.keySet == beforeFiles.keySet, "no bucket dir lost")
    val changed = afterFiles.keySet.filter(k => afterFiles(k) != beforeFiles(k))
    assert(changed == Set("db=3"), s"only the hit bucket rewrites, got $changed")
    val left = spark.read.parquet(dir)
    assert(left.count() == 198)
    assert(left.filter(col("doc_id").isin(3L, 19L)).isEmpty)
    // bloom bank survives as a SUPERSET: pruned fetch of a kept id works
    val fetched = Maintenance.prunedByKey(spark, dir,
      Seq(Tuple1(35L)).toDF("doc_id"), "doc_id")
      .filter(col("doc_id") === 35L).count()
    assert(fetched == 1L)
    // deleting nothing is free: zero rows, zero rewrites
    val before2 = fileMap()
    assert(Maintenance.deleteByKey(spark, dir, Seq(1000L)) == 0L)
    assert(fileMap() == before2)
  }

  test("deleteByKey drops a fully-emptied bucket's directory (no resurrection)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_del_empty").toString + "/t"
    (0L until 64L).map(i => (i, i.toString)).toDF("doc_id", "body")
      .write.parquet(dir)
    Maintenance.compactDocTable(spark, dir, buckets = 8)
    // every doc_id ≡ 5 (mod 8): bucket db=5 empties completely — the
    // dynamic overwrite writes no rows there, so deleteByKey must drop
    // the stale directory or the "deleted" rows survive it
    val victims = (0L until 64L).filter(_ % 8 == 5)
    assert(Maintenance.deleteByKey(spark, dir, victims) == victims.size.toLong)
    assert(!new java.io.File(dir, "db=5").exists, "emptied bucket dir must go")
    val left = spark.read.parquet(dir)
    assert(left.count() == 56 && left.filter(col("doc_id") % 8 === 5).isEmpty)
  }

  test("deleteByKey on a flat table swaps whole, keeps sidecars and layout") {
    val dir = java.nio.file.Files.createTempDirectory("graft_del_flat").toString + "/t"
    (0L until 50L).map(i => (i, s"2024-01-0${i % 3 + 1}")).toDF("doc_id", "d")
      .select(col("doc_id"), col("d").cast("date").as("p_date"))
      .write.partitionBy("p_date").parquet(dir)
    val hwm = new java.io.File(dir, "_graft_hwm")
    java.nio.file.Files.write(hwm.toPath, "42".getBytes)
    assert(Maintenance.deleteByKey(spark, dir, Seq(7L, 11L, 999L)) == 2L)
    val left = spark.read.parquet(dir)
    assert(left.count() == 48 && left.filter(col("doc_id").isin(7L, 11L)).isEmpty)
    assert(new String(java.nio.file.Files.readAllBytes(
      new java.io.File(dir, "_graft_hwm").toPath)) == "42",
      "root sidecars must survive the swap")
    assert(new java.io.File(dir).listFiles.exists(f =>
      f.isDirectory && f.getName.startsWith("p_date=")),
      "foreign partition layout must be preserved")
    // a held compaction lock blocks the delete loudly
    Maintenance.acquireCompactionLock(spark, dir)
    try intercept[Maintenance.CompactionInProgressException] {
      Maintenance.deleteByKey(spark, dir, Seq(1L))
    } finally Maintenance.breakCompactionLock(spark, dir)
  }

  test("rewrites rebuild the stats manifest instead of carrying it stale") {
    import graft.operators.Layout
    def canon(s: String) = new org.apache.hadoop.fs.Path(s).toString
    def manifestFresh(dir: String): Boolean = {
      val m = spark.read.parquet(s"$dir/${Layout.statsDir}").select("file")
        .collect().map(r => canon(r.getString(0))).toSet
      m == spark.read.parquet(dir).inputFiles.map(canon).toSet
    }
    // deleteViaSwap on a range-sorted flat table: stats keep pruning
    val base = java.nio.file.Files.createTempDirectory("graft_stats_maint").toString
    val flat = s"$base/flat"
    Layout.linearWrite(
      spark.range(8000).select(col("id"), (col("id") * 2).as("v")),
      "id", flat, 16)
    Layout.writeStatsManifest(spark, flat, Seq("id"))
    assert(Maintenance.deleteByKey(spark, flat, Seq(10L, 20L), "id") == 2L)
    assert(manifestFresh(flat), "swap-path delete must rebuild the manifest")
    val pruned = Layout.statsPrunedRead(spark, flat, Seq(("id", 100.0, 199.0)))
      .filter(col("id").between(100, 199))
    assert(pruned.count() == 100)
    val Some((read, total)) = Layout.lastStatsPruned
    assert(read < total, s"fresh stats must still prune ($read/$total)")
    // compactDocTable: the bucketed rewrite renames every file — the
    // manifest must follow (stale entries are all dead → every read
    // would degrade to a full scan)
    val docs = s"$base/docs"
    (0L until 500L).map(i => (i, s"d$i")).toDF("doc_id", "b").write.parquet(docs)
    Layout.writeStatsManifest(spark, docs, Seq("doc_id"))
    Maintenance.compactDocTable(spark, docs, buckets = 8)
    assert(manifestFresh(docs), "compaction must rebuild the manifest")
    // bucketed delete refreshes in place
    assert(Maintenance.deleteByKey(spark, docs, Seq(3L)) == 1L)
    assert(manifestFresh(docs), "bucketed delete must rebuild the manifest")
  }

  test("expirePartitions drops only sub-cutoff dirs; no rewrite, stats follow") {
    import graft.operators.Layout
    val dir = java.nio.file.Files.createTempDirectory("graft_ttl").toString + "/t"
    (0 until 90).map(i => (i.toLong, s"2024-01-${"%02d".format(i % 9 + 1)}"))
      .toDF("v", "d")
      .select(col("v"), col("d").cast("date").as("p_date"))
      .write.partitionBy("p_date").parquet(dir)
    Layout.writeStatsManifest(spark, dir, Seq("v"))
    def files() = new java.io.File(dir).listFiles
      .filter(f => f.isDirectory && f.getName.startsWith("p_date="))
      .flatMap(d => d.listFiles.map(f => d.getName + "/" + f.getName)).toSet
    val before = files()
    val dropped = Maintenance.expirePartitions(spark, dir, cutoff = "2024-01-04")
    assert(dropped == Seq("p_date=2024-01-01", "p_date=2024-01-02",
      "p_date=2024-01-03"))
    // retention is a directory drop, never a rewrite: every surviving
    // file is the SAME file
    assert(files() == before.filterNot(f =>
      dropped.exists(d => f.startsWith(d + "/"))))
    val left = spark.read.parquet(dir)
    assert(left.count() == 60 && left.agg(min(col("p_date"))).head
      .getDate(0).toString == "2024-01-04")
    // the stats manifest followed the drop (no dead entries)
    val m = spark.read.parquet(s"$dir/${Layout.statsDir}").select("file")
      .collect().map(r => new org.apache.hadoop.fs.Path(r.getString(0)).toString).toSet
    assert(m == left.inputFiles.map(f =>
      new org.apache.hadoop.fs.Path(f).toString).toSet)
    // expiring everything drops the manifest rather than scanning nothing
    Maintenance.expirePartitions(spark, dir, cutoff = "2025-01-01")
    assert(!new java.io.File(dir, Layout.statsDir).exists)
    assert(new java.io.File(dir).listFiles.forall(f =>
      !f.getName.startsWith("p_date=")))
  }

  test("retention policy: retainDays expires data-relative, then compaction runs") {
    val dir = java.nio.file.Files.createTempDirectory("graft_retain").toString + "/t"
    (1 to 10).foreach { d =>
      val day = f"2024-01-$d%02d"
      // day 10 accretes 6 small files so the compaction leg also fires
      val copies = if (d == 10) 6 else 1
      (1 to copies).foreach { i =>
        Seq((d.toLong * 100 + i, day)).toDF("v", "d")
          .select(col("v"), col("d").cast("date").as("p_date"))
          .coalesce(1).write.mode("append").partitionBy("p_date").parquet(dir)
      }
    }
    val action = Maintenance.maintainIfNeeded(spark,
      Maintenance.MaintenanceTarget(dir, Maintenance.TableKind.DatePartitioned,
        maxDataFiles = 4, retainDays = Some(5)))
    assert(action.exists(a => a.contains("expired 5 partition(s)") &&
      a.contains("compacted 1 partition(s)")), s"got $action")
    val left = spark.read.parquet(dir)
    // trailing 5 days measured from the table's OWN newest day (06..10)
    assert(left.agg(min(col("p_date")).cast("string"),
      max(col("p_date")).cast("string")).head.toSeq ==
      Seq("2024-01-06", "2024-01-10"))
    assert(Maintenance.dataFileCounts(spark, dir)("p_date=2024-01-10") <= 4)
    // idempotent second run: nothing left to do
    assert(Maintenance.maintainIfNeeded(spark,
      Maintenance.MaintenanceTarget(dir, Maintenance.TableKind.DatePartitioned,
        maxDataFiles = 4, retainDays = Some(5))).isEmpty)
    // stats steady-state leg: with a manifest present, the policy covers
    // files appended since — and only reports when it did something
    graft.operators.Layout.writeStatsManifest(spark, dir, Seq("v"))
    Seq((9999L, "2024-01-10")).toDF("v", "d")
      .select(col("v"), col("d").cast("date").as("p_date"))
      .coalesce(1).write.mode("append").partitionBy("p_date").parquet(dir)
    val a2 = Maintenance.maintainIfNeeded(spark,
      Maintenance.MaintenanceTarget(dir, Maintenance.TableKind.DatePartitioned,
        maxDataFiles = 4, retainDays = Some(5)))
    assert(a2.exists(_.contains("manifested 1 new file(s)")), s"got $a2")
  }

  test("deleteByKey guards its pruning on the DECLARED bucket key") {
    // table bucketed on doc_id, but the deletion request keys on
    // user_id: pmod(user_id) pruning would visit only coincidental
    // buckets and silently retain most matching rows — the layout
    // declares its key, and a mismatch must take the full-swap path
    val dir = java.nio.file.Files.createTempDirectory("graft_del_key").toString + "/t"
    (0L until 200L).map(i => (i, i % 10, s"d$i")).toDF("doc_id", "user_id", "b")
      .write.parquet(dir)
    Maintenance.compactDocTable(spark, dir, keyCol = "doc_id", buckets = 16)
    assert(Maintenance.bucketKeyCol(spark, dir).contains("doc_id"))
    val n = Maintenance.deleteByKey(spark, dir, Seq(3L), keyCol = "user_id")
    assert(n == 20L, s"ALL 20 user_id=3 rows must go, got $n")
    val left = spark.read.parquet(dir)
    assert(left.count() == 180 && left.filter(col("user_id") === 3).isEmpty)
    // a legacy 1-field sidecar still infers db= → doc_id (fast path ok)
    val f = new org.apache.hadoop.fs.Path(dir, "_graft_buckets")
    val fs = f.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(f, true); out.write("16".getBytes); out.close()
    assert(Maintenance.bucketKeyCol(spark, dir).contains("doc_id"))
    assert(Maintenance.deleteByKey(spark, dir, Seq(8L)) == 1L)
  }

  test("deletes never take NULL-key rows; flat-table misses cost no rewrite") {
    val dir = java.nio.file.Files.createTempDirectory("graft_del_null").toString + "/t"
    (Seq((Some(1L), "a"), (Some(2L), "b"), (None, "null1"), (None, "null2")))
      .toDF("doc_id", "v").write.parquet(dir)
    def mtimes() = new java.io.File(dir).listFiles
      .filter(_.getName.endsWith(".parquet"))
      .map(f => f.getName -> f.lastModified).toMap
    val before = mtimes()
    // a miss on a flat table must not rewrite anything
    assert(Maintenance.deleteByKey(spark, dir, Seq(999L)) == 0L)
    assert(mtimes() == before, "misses must be free on every layout")
    // NOT(NULL IN ...) is NULL — the keep filter must not drop NULL keys
    assert(Maintenance.deleteByKey(spark, dir, Seq(1L)) == 1L)
    val left = spark.read.parquet(dir)
    assert(left.count() == 3, "both NULL-key rows must survive")
    assert(left.filter(col("doc_id").isNull).count() == 2)
  }

  test("retention survives a __HIVE_DEFAULT_PARTITION__ dir from a NULL date") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ttl_null").toString + "/t"
    (1 to 6).map(d => (d.toLong, Some(f"2024-01-$d%02d")))
      .toDF("v", "d")
      .union(Seq((99L, None: Option[String])).toDF("v", "d"))
      .select(col("v"), col("d").cast("date").as("p_date"))
      .write.partitionBy("p_date").parquet(dir)
    assert(new java.io.File(dir, "p_date=__HIVE_DEFAULT_PARTITION__").exists)
    // the null dir sorts AFTER every date — naive max() would parse it
    val action = Maintenance.maintainIfNeeded(spark,
      Maintenance.MaintenanceTarget(dir, Maintenance.TableKind.DatePartitioned,
        maxDataFiles = 99, retainDays = Some(3)))
    assert(action.exists(_.contains("expired 3 partition(s)")), s"got $action")
    val left = spark.read.parquet(dir)
    assert(left.filter(col("p_date").isNull).count() == 1,
      "the NULL partition is retention-exempt, not newest-day input")
    assert(left.filter(col("p_date").isNotNull)
      .agg(min(col("p_date")).cast("string")).head.getString(0) == "2024-01-04")
  }

  test("evolveAppend: null-fills missing columns, rejects/admits new ones") {
    val dir = java.nio.file.Files.createTempDirectory("graft_evolve").toString + "/t"
    Seq((1L, "a", 1.5)).toDF("id", "name", "score")
      .write.mode("append").parquet(dir)

    // batch missing `score` → null-filled, append succeeds
    Maintenance.evolveAppend(spark,
      Seq((2L, "b")).toDF("id", "name"), dir)
    val rows = spark.read.parquet(dir).orderBy("id").collect()
    assert(rows.length == 2)
    assert(rows(1).isNullAt(rows(1).fieldIndex("score")))

    // batch with an undeclared column → rejected by default
    intercept[IllegalArgumentException] {
      Maintenance.evolveAppend(spark,
        Seq((3L, "c", 2.0, "extra")).toDF("id", "name", "score", "tag"), dir)
    }
    // ... admitted when widening is allowed; mergeSchema read sees it
    Maintenance.evolveAppend(spark,
      Seq((3L, "c", 2.0, "t3")).toDF("id", "name", "score", "tag"), dir,
      allowNewColumns = true)
    val widened = Maintenance.readEvolved(spark, dir).orderBy("id").collect()
    assert(widened.length == 3)
    assert(widened(2).getAs[String]("tag") == "t3")
    assert(widened(0).isNullAt(widened(0).fieldIndex("tag")))
    // numeric batch column cast to the table's type on the common columns
    assert(spark.read.parquet(dir).schema("score").dataType.typeName == "double")
  }

  test("compactGramIndex buckets the index; pruned probe reads only matching buckets") {
    val base = java.nio.file.Files.createTempDirectory("graft_gramidx")
    val idxPath = base.resolve("gram_index").toString
    // accreted flat layout: several small append files (the micro-batch shape)
    (0 until 4).foreach { k =>
      (0 until 500).map(i => (k * 10000L + i * 7L))
        .toDF("h").coalesce(1).write.mode("append").parquet(idxPath)
    }
    val before = spark.read.parquet(idxPath).select("h")
      .collect().map(_.getLong(0)).sorted

    Maintenance.compactGramIndex(spark, idxPath, buckets = 8)

    // layout: hb= partition dirs, no data files at the root, sidecar set
    // (the underscore-prefixed bloom-bank dir is a sidecar, not data)
    val root = new java.io.File(idxPath)
    val dirs = root.listFiles().filter(_.isDirectory).map(_.getName)
      .filterNot(_.startsWith("_"))
    assert(dirs.nonEmpty && dirs.forall(_.startsWith("hb=")), dirs.mkString(","))
    assert(!root.listFiles().exists(f => f.isFile && f.getName.endsWith(".parquet")),
      "no data files may remain at the index root")
    assert(Maintenance.gramIndexBuckets(spark, idxPath).contains(8))
    // data identical
    val after = spark.read.parquet(idxPath).select("h")
      .collect().map(_.getLong(0)).sorted
    assert(after.sameElements(before), "compaction must not change the gram set")

    // bounded probe: partition pruning reaches the scan — only the
    // probe grams' buckets are listed/read
    val probe = Seq(before.head, before.last).toDF("h")
    val pruned = Maintenance.prunedGramIndex(spark, idxPath, probe)
    val scan = pruned.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scan.nonEmpty)
    val expectedBuckets = Set(before.head % 8, before.last % 8).size
    assert(scan.head.selectedPartitions.partitionCount == expectedBuckets,
      s"probe must read ${expectedBuckets} bucket(s), " +
        s"read ${scan.head.selectedPartitions.partitionCount}")
    assert(scan.head.toString.contains("PartitionFilters"))
    // semantics: the pruned view still contains the probed grams
    val got = pruned.join(probe, Seq("h"), "left_semi")
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(before.head, before.last))

    // post-compaction APPENDS keep the bucketed layout (no mixed root)
    Seq(999999983L).toDF("h")
      .withColumn("hb", pmod(col("h"), lit(8)).cast("int"))
      .write.mode("append").partitionBy("hb").parquet(idxPath)
    assert(!root.listFiles().exists(f => f.isFile && f.getName.endsWith(".parquet")))
    assert(spark.read.parquet(idxPath).count() == before.length + 1)

    // crash-mid-swap recovery: live dir missing, __compact_old present
    val p = new java.io.File(idxPath)
    val old = new java.io.File(idxPath + ".__compact_old")
    assert(p.renameTo(old))
    Maintenance.recoverGramIndex(spark, idxPath)
    assert(spark.read.parquet(idxPath).count() == before.length + 1,
      "recovery must restore the stranded index")
  }

  test("nearDup sink keeps flagging across a mid-stream OUTPUT compaction; fetch prunes") {
    import graft.streaming.EventsStreaming
    // the landed table becomes doc_id-bucketed mid-stream; the next
    // batch must (a) fetch candidate texts through the pruned path,
    // (b) append INSIDE db= buckets, (c) flag identically to an
    // uncompacted run
    def base(i: Int) = tokenText("w", i)
    val parts = Seq(
      docsDf(spark, (0 until 10).map(i => (i.toLong, base(i)))),
      docsDf(spark, (0 until 5).map(i => (100L + i, base(i)))),
      docsDf(spark, Seq((200L, base(0)))))
    val bse = java.nio.file.Files.createTempDirectory("graft_neardup_compact")
    val outPath = bse.resolve("flagged").toString
    val idxPath = bse.resolve("sig_index").toString
    val srcDir = bse.resolve("in").toString
    def run(): Unit = {
      val q = EventsStreaming.nearDupFlaggedAppend(
        DupFlagKit.docStream(spark, srcDir), outPath, idxPath, threshold = 0.7)
      q.processAllAvailable(); q.stop()
    }
    DupFlagKit.stageArrival(bse, parts.take(2)); run()
    Maintenance.compactDocTable(spark, outPath, "doc_id", buckets = 8)
    // ROBUSTNESS, not a recommendation: doc_id-bucketing the sig index
    // buys no pruning (its probe key is (band,bucket)) — but an
    // operator who compacts it anyway must not wedge the sink, so the
    // append dispatch is exercised here
    Maintenance.compactDocTable(spark, idxPath, "doc_id", buckets = 4)
    DupFlagKit.stageArrival(bse, parts.drop(2), startK = 2); run()
    val expected = DupFlagKit.nearDupReference(parts, threshold = 0.7)
    val got = DupFlagKit.readNearDupFlags(spark, outPath)
    assert(got.size == expected.size)
    expected.foreach { case (id, (n, dupOf)) =>
      assert((got(id)._1, got(id)._2) == (n, dupOf),
        s"doc $id: got ${got(id)}, want ($n,$dupOf)")
    }
    assert(got(200L)._1 == 2 && got(200L)._2.contains(0L),
      "the post-compaction batch must still verify against landed text " +
        "(200 duplicates base 0 and its batch-1 copy 100)")
    // appends landed inside buckets, never as root files — on BOTH the
    // landed table and the signature index
    assert(!new java.io.File(outPath).listFiles()
      .exists(f => f.isFile && f.getName.endsWith(".parquet")))
    assert(!new java.io.File(idxPath).listFiles()
      .exists(f => f.isFile && f.getName.endsWith(".parquet")),
      "sig-index appends must land inside db= buckets after compaction")
    // the candidate fetch prunes to the probed ids' buckets
    val probe = { import spark.implicits._; Seq(0L).toDF("doc_id") }
    val scan = Maintenance.prunedByKey(spark, outPath, probe)
      .queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }
    assert(scan.nonEmpty &&
      scan.head.selectedPartitions.partitionCount == 1,
      "a one-id fetch must read exactly one db= bucket")
  }

  test("saturated bloom is flagged; compaction rebuilds it as a sized bank that prunes") {
    import graft.streaming.EventsStreaming
    import graft.warehouse.BloomBank
    // Force the single sidecar into saturation (a 1024-bit bloom vs
    // ~1400 landed grams ⇒ fill ≈ 1, fpp ≈ 1): the merge must FLAG it,
    // the skip economy must visibly collapse, and compactGramIndex must
    // replace the sidecar with a per-bucket bank sized from the ACTUAL
    // row count — restoring a ≥90% map-side drop on novel batches and
    // bucket-pruning the post-bloom probe. Flags stay exact throughout
    // (blooms never false-negative; saturation only costs performance).
    val p0 = docsDf(spark, tokenRows("a", 0 until 60))
    val p1 = docsDf(spark, tokenRows("b", 100 until 140) :+ ((999L, tokenText("a", 0))))
    val p2 = docsDf(spark, tokenRows("c", 200 until 240) :+ ((998L, tokenText("a", 1))))
    val base = java.nio.file.Files.createTempDirectory("graft_bloom_sat")
    val outPath = base.resolve("flagged").toString
    val idxPath = base.resolve("gram_index").toString
    val srcDir = base.resolve("in").toString
    def run(): Unit = {
      val q = EventsStreaming.dupFlaggedAppend(
        DupFlagKit.docStream(spark, srcDir), outPath, idxPath, n = 8)
      q.processAllAvailable(); q.stop()
    }
    val savedBits = EventsStreaming.gramBloomBits
    EventsStreaming.gramBloomBits = 1L << 10
    EventsStreaming.trackBloomStats = true
    EventsStreaming.bloomProbedGrams.set(0)
    EventsStreaming.bloomPassedGrams.set(0)
    val warned0 = EventsStreaming.bloomSaturationWarnings.get()
    try {
      DupFlagKit.stageArrival(base, Seq(p0, p1)); run()
      // the merge measured the fill and flagged saturation
      val fill = EventsStreaming.bloomFillRatios.get(s"$idxPath/_graft_gram_bloom")
      assert(fill != null && fill > 0.5, s"fill=$fill must be flagged as saturated")
      assert(EventsStreaming.bloomSaturationWarnings.get() > warned0)
      // the skip economy visibly collapsed: most NOVEL grams still pass
      val probed1 = EventsStreaming.bloomProbedGrams.get().toDouble
      val passed1 = EventsStreaming.bloomPassedGrams.get().toDouble
      assert(probed1 > 0 && passed1 / probed1 > 0.5,
        f"saturated bloom should pass ~everything, passed ${passed1 / probed1}%.2f")
      // compaction = bloom rebuild point: bank in, single sidecar out
      graft.warehouse.Maintenance.compactGramIndex(spark, idxPath, buckets = 64)
      val fs = new org.apache.hadoop.fs.Path(idxPath)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      assert(BloomBank.metaOf(fs, idxPath).isDefined, "bank must be declared")
      assert(!new java.io.File(idxPath, "_graft_gram_bloom").exists(),
        "the saturating single sidecar must not be carried")
      EventsStreaming.bloomProbedGrams.set(0)
      EventsStreaming.bloomPassedGrams.set(0)
      DupFlagKit.stageArrival(base, Seq(p2), startK = 2); run()
      val probed2 = EventsStreaming.bloomProbedGrams.get().toDouble
      val passed2 = EventsStreaming.bloomPassedGrams.get().toDouble
      assert(probed2 > 0 && passed2 / probed2 <= 0.1,
        f"bank must restore a >=90%% drop (passed ${passed2 / probed2}%.3f)")
      // the surviving grams' buckets pruned the index scan (dup-light
      // batch: one echo doc ⇒ ~23 surviving grams over 64 buckets)
      assert(Maintenance.lastPruned.exists { case (r, b) => b == 64 && r < 32 },
        s"post-bloom probe must bucket-prune, got ${Maintenance.lastPruned}")
      // flags bit-identical throughout
      val (expected, _) = DupFlagKit.dupFlagReference(Seq(p0, p1, p2))
      assert(DupFlagKit.readFlags(spark, outPath) == expected)
    } finally {
      EventsStreaming.gramBloomBits = savedBits
      EventsStreaming.trackBloomStats = false
    }
  }

  test("a pre-key-tag bank meta migrates: declared, unprobed, re-keyed on next merge") {
    import graft.streaming.EventsStreaming
    import graft.warehouse.BloomBank
    // An index compacted before the meta carried its key domain has a
    // 3-field "_meta". Falling back to the single sidecar would
    // resurrect the saturating fixed filter the bank retired; probing
    // the unknown domain could fabricate false negatives (missed dups).
    // Contract: the bank reads as DECLARED but unusable — the probe runs
    // unfiltered (exact, slower) — and the next batch's merge rebuilds
    // it keyed on the probe column in one recovery-cost scan. Flags stay
    // bit-identical throughout.
    val p0 = docsDf(spark, tokenRows("a", 0 until 40))
    val p1 = docsDf(spark, tokenRows("b", 100 until 120) :+ ((999L, tokenText("a", 0))))
    val base = java.nio.file.Files.createTempDirectory("graft_bank_legacy")
    val outPath = base.resolve("flagged").toString
    val idxPath = base.resolve("gram_index").toString
    val srcDir = base.resolve("in").toString
    def run(): Unit = {
      val q = EventsStreaming.dupFlaggedAppend(
        DupFlagKit.docStream(spark, srcDir), outPath, idxPath, n = 8)
      q.processAllAvailable(); q.stop()
    }
    DupFlagKit.stageArrival(base, Seq(p0)); run()
    Maintenance.compactGramIndex(spark, idxPath, buckets = 8)
    val fs = new org.apache.hadoop.fs.Path(idxPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val m0 = BloomBank.metaOf(fs, idxPath, Some("h")).get
    assert(m0.key == "h")
    val metaFile = new org.apache.hadoop.fs.Path(idxPath, BloomBank.dirName + "/_meta")
    val out = fs.create(metaFile, true)
    try out.write(s"${m0.nb}:${m0.items}:${m0.bits}".getBytes("UTF-8"))
    finally out.close()
    assert(BloomBank.metaOf(fs, idxPath, Some("h")).isDefined,
      "legacy meta must read as DECLARED — bank mode holds")
    assert(BloomBank.read(fs, idxPath, Some("h")).isEmpty,
      "a legacy bank must refuse to front-filter (unknown key domain)")
    DupFlagKit.stageArrival(base, Seq(p1), startK = 1); run()
    val m1 = BloomBank.metaOf(fs, idxPath, Some("h")).get
    assert(m1.key == "h", "the merge must re-key the bank under the probe column")
    assert(BloomBank.read(fs, idxPath, Some("h")).isDefined,
      "the rebuilt bank must be probeable again")
    assert(!new java.io.File(idxPath, "_graft_gram_bloom").exists(),
      "the single sidecar must not be resurrected")
    val (expected, _) = DupFlagKit.dupFlagReference(Seq(p0, p1))
    assert(DupFlagKit.readFlags(spark, outPath) == expected)
  }

  test("compactSigIndex buckets on (band,bucket); the nearDup probe prunes to colliding sb=") {
    import graft.streaming.EventsStreaming
    import graft.warehouse.BloomBank
    def base(i: Int) = tokenText("w", i)
    val parts = Seq(
      docsDf(spark, (0 until 10).map(i => (i.toLong, base(i)))),
      docsDf(spark, (0 until 5).map(i => (100L + i, base(i)))),
      docsDf(spark, Seq((200L, base(0)))))
    val bse = java.nio.file.Files.createTempDirectory("graft_sig_compact")
    val outPath = bse.resolve("flagged").toString
    val idxPath = bse.resolve("sig_index").toString
    val srcDir = bse.resolve("in").toString
    def run(): Unit = {
      val q = EventsStreaming.nearDupFlaggedAppend(
        DupFlagKit.docStream(spark, srcDir), outPath, idxPath, threshold = 0.7)
      q.processAllAvailable(); q.stop()
    }
    DupFlagKit.stageArrival(bse, parts.take(2)); run()
    Maintenance.compactSigIndex(spark, idxPath, buckets = 64)
    // layout: sb= dirs only, scheme declared, bank replaces the sidecar
    val root = new java.io.File(idxPath)
    val dirs = root.listFiles().filter(_.isDirectory).map(_.getName)
      .filterNot(_.startsWith("_"))
    assert(dirs.nonEmpty && dirs.forall(_.startsWith("sb=")), dirs.mkString(","))
    assert(Maintenance.bucketLayout(spark, idxPath).contains((64, "sb")))
    val fs = new org.apache.hadoop.fs.Path(idxPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(BloomBank.metaOf(fs, idxPath).isDefined)
    assert(!new java.io.File(idxPath, "_graft_sig_bloom").exists())
    DupFlagKit.stageArrival(bse, parts.drop(2), startK = 2); run()
    // flags unchanged vs the flat layout (same reference the flat
    // MaintenanceSpec/StreamingSpec runs pin)
    val expected = DupFlagKit.nearDupReference(parts, threshold = 0.7)
    val got = DupFlagKit.readNearDupFlags(spark, outPath)
    expected.foreach { case (id, (n, dupOf)) =>
      assert((got(id)._1, got(id)._2) == (n, dupOf),
        s"doc $id: got ${got(id)}, want ($n,$dupOf)")
    }
    assert(got(200L)._1 == 2 && got(200L)._2.contains(0L))
    // the batch's probe read ONLY the colliding buckets (one doc ⇒ ≤16
    // band rows ⇒ ≤16 of 64 sb= buckets)
    assert(Maintenance.lastPruned.exists { case (r, b) => b == 64 && r <= 16 },
      s"sig probe must prune, got ${Maintenance.lastPruned}")
    // appends keep landing inside sb= buckets, never as root files
    assert(!root.listFiles().exists(f => f.isFile && f.getName.endsWith(".parquet")))
    // and the pruned read's partition filter reaches the file listing
    val oneRow = spark.read.parquet(idxPath).select("band", "bucket").limit(1)
    val pruned = Maintenance.prunedBySigBandBucket(spark, idxPath,
      oneRow.collect().toSeq.headOption.map { r =>
        { import spark.implicits._
          Seq((r.getInt(0), r.getLong(1))).toDF("band", "bucket") }
      }.get)
    val scan = pruned.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scan.nonEmpty && scan.head.selectedPartitions.partitionCount == 1,
      "a one-signature probe must read exactly one sb= bucket")
  }

  test("a torn bloom bank reads as absent and heals from the full index") {
    import graft.streaming.EventsStreaming
    val p0 = docsDf(spark, tokenRows("a", 0 until 20))
    val p1 = docsDf(spark, tokenRows("b", 100 until 120) :+ ((999L, tokenText("a", 0))))
    val p2 = docsDf(spark, tokenRows("c", 200 until 220))
    val base = java.nio.file.Files.createTempDirectory("graft_bank_torn")
    val outPath = base.resolve("flagged").toString
    val idxPath = base.resolve("gram_index").toString
    val srcDir = base.resolve("in").toString
    def run(): Unit = {
      val q = EventsStreaming.dupFlaggedAppend(
        DupFlagKit.docStream(spark, srcDir), outPath, idxPath, n = 8)
      q.processAllAvailable(); q.stop()
    }
    DupFlagKit.stageArrival(base, Seq(p0)); run()
    Maintenance.compactGramIndex(spark, idxPath, buckets = 8)
    val bankDir = new java.io.File(idxPath, "_graft_bloom_bank")
    assert(bankDir.isDirectory)
    // tear the bank: one bucket file gone — a missing bucket might hold
    // landed keys, so "absent file = empty bloom" would fabricate false
    // negatives; the whole bank must read as ABSENT (exact unfiltered
    // probe) and the next merge must rebuild it from the FULL index
    assert(new java.io.File(bankDir, "b3").delete())
    DupFlagKit.stageArrival(base, Seq(p1), startK = 1); run()
    assert((0 until 8).forall(b => new java.io.File(bankDir, s"b$b").exists()),
      "merge must heal the torn bank complete")
    val (expected, _) = DupFlagKit.dupFlagReference(Seq(p0, p1))
    assert(DupFlagKit.readFlags(spark, outPath) == expected,
      "the torn-bank batch must still flag exactly (echo doc included)")
    // the healed bank is a working front filter again: an all-novel
    // batch drops ~everything map-side
    EventsStreaming.trackBloomStats = true
    EventsStreaming.bloomProbedGrams.set(0)
    EventsStreaming.bloomPassedGrams.set(0)
    try { DupFlagKit.stageArrival(base, Seq(p2), startK = 2); run() }
    finally EventsStreaming.trackBloomStats = false
    val probed = EventsStreaming.bloomProbedGrams.get().toDouble
    val passed = EventsStreaming.bloomPassedGrams.get().toDouble
    assert(probed > 0 && passed / probed <= 0.1,
      f"healed bank must drop novel grams (passed ${passed / probed}%.3f)")
    // PRESENT-but-corrupt bucket file: the read path treats the bank as
    // absent (probe exact), and the merge must heal instead of
    // crash-looping on BloomFilter.readFrom every replay
    val out = new java.io.FileOutputStream(new java.io.File(bankDir, "b5"))
    try out.write(Array[Byte](1, 2, 3)) finally out.close()
    DupFlagKit.stageArrival(base,
      Seq(docsDf(spark, tokenRows("e", 300 until 310))), startK = 3); run()
    val in = new java.io.FileInputStream(new java.io.File(bankDir, "b5"))
    try org.apache.spark.util.sketch.BloomFilter.readFrom(in)
    finally in.close() // readable again = healed
    val (expected2, _) = DupFlagKit.dupFlagReference(
      Seq(p0, p1, p2, docsDf(spark, tokenRows("e", 300 until 310))))
    assert(DupFlagKit.readFlags(spark, outPath) == expected2)
  }

  test("doc-table compaction rebuilds the landed-id filter as a bank; skip economy continues") {
    import graft.streaming.EventsStreaming
    import graft.warehouse.BloomBank
    val parts = Seq(
      docsDf(spark, tokenRows("a", 0 until 8, tokens = 12)),
      docsDf(spark, tokenRows("b", 100 until 108, tokens = 12)),
      docsDf(spark, tokenRows("c", 200 until 208, tokens = 12)))
    val base = java.nio.file.Files.createTempDirectory("graft_docbloom_bank")
    val outPath = base.resolve("flagged").toString
    val idxPath = base.resolve("gram_index").toString
    val srcDir = base.resolve("in").toString
    def run(): Unit = {
      val q = EventsStreaming.dupFlaggedAppend(
        DupFlagKit.docStream(spark, srcDir), outPath, idxPath, n = 8)
      q.processAllAvailable(); q.stop()
    }
    DupFlagKit.stageArrival(base, parts.take(2)); run()
    Maintenance.compactDocTable(spark, outPath, "doc_id", buckets = 8)
    val fs = new org.apache.hadoop.fs.Path(outPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(BloomBank.metaOf(fs, outPath, Some("doc_id")).isDefined,
      "compaction must rebuild the landed-id filter as a doc_id-keyed bank")
    assert(!new java.io.File(outPath, "_graft_doc_bloom").exists(),
      "the fixed-size single filter must not be carried")
    // steady state through the bank: the next all-new batch still skips
    // the landed scan outright, flags exact
    val skip0 = EventsStreaming.landedScansSkipped.get()
    DupFlagKit.stageArrival(base, parts.drop(2), startK = 2); run()
    assert(EventsStreaming.landedScansSkipped.get() == skip0 + 1)
    val (expected, _) = DupFlagKit.dupFlagReference(parts)
    assert(DupFlagKit.readFlags(spark, outPath) == expected)
    // and a full re-delivery (fresh query) is still exactly deduped —
    // bloom-positive ids anti-join through the bucket-pruned read
    run()
    assert(spark.read.parquet(outPath).count() == expected.size)
  }

  test("compaction lock: sink batches fail loudly; racing appends abort the swap") {
    import graft.streaming.EventsStreaming
    import graft.warehouse.Maintenance.{CompactionInProgressException, ConcurrentWriterException}
    val p0 = docsDf(spark, tokenRows("a", 0 until 8, tokens = 12))
    val p1 = docsDf(spark, tokenRows("b", 100 until 108, tokens = 12))
    val base = java.nio.file.Files.createTempDirectory("graft_compact_lock")
    val outPath = base.resolve("flagged").toString
    val idxPath = base.resolve("gram_index").toString
    val srcDir = base.resolve("in").toString
    def run(): Unit = {
      val q = EventsStreaming.dupFlaggedAppend(
        DupFlagKit.docStream(spark, srcDir), outPath, idxPath, n = 8)
      q.processAllAvailable(); q.stop()
    }
    DupFlagKit.stageArrival(base, Seq(p0)); run()

    // 1) a batch arriving while a compaction owns the index fails with
    //    the NAMED reason — never appends into the about-to-move dir
    Maintenance.acquireCompactionLock(spark, idxPath)
    DupFlagKit.stageArrival(base, Seq(p1), startK = 1)
    def causeChain(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).toSeq
    val q = EventsStreaming.dupFlaggedAppend(
      DupFlagKit.docStream(spark, srcDir), outPath, idxPath, n = 8)
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.processAllAvailable()
    }
    q.stop()
    assert(causeChain(ex).exists(_.isInstanceOf[CompactionInProgressException]),
      s"want the named compaction-in-progress reason, got ${causeChain(ex)}")
    assert(spark.read.parquet(outPath).count() == 8, "no partial batch lands")
    // released lock ⇒ a fresh run replays and lands the batch exactly
    Maintenance.releaseCompactionLock(spark, idxPath)
    run()
    val (expected, _) = DupFlagKit.dupFlagReference(Seq(p0, p1))
    assert(DupFlagKit.readFlags(spark, outPath) == expected)

    // 2) an append that slips past the lock gate is caught by the
    //    pre-swap change detection: compaction ABORTS, live data intact
    val before = spark.read.parquet(idxPath).count()
    Maintenance.compactBarrier = Some(() => {
      import spark.implicits._
      Seq(123456789L).toDF("h").coalesce(1).write.mode("append").parquet(idxPath)
    })
    try intercept[ConcurrentWriterException] {
      Maintenance.compactGramIndex(spark, idxPath, buckets = 8)
    } finally Maintenance.compactBarrier = None
    assert(spark.read.parquet(idxPath).count() == before + 1,
      "abort must leave the live index (incl. the racing row) untouched")
    assert(!new java.io.File(idxPath + ".__compact_tmp").exists(),
      "abort must discard the rewrite")

    // 3) an in-flight write job (_temporary) is refused up front; the
    //    lock is released on every failure path, so a quiesced retry wins
    assert(new java.io.File(idxPath, "_temporary").mkdir())
    intercept[ConcurrentWriterException] {
      Maintenance.compactGramIndex(spark, idxPath, buckets = 8)
    }
    assert(new java.io.File(idxPath, "_temporary").delete())
    Maintenance.compactGramIndex(spark, idxPath, buckets = 8)
    assert(spark.read.parquet(idxPath).select("h").count() == before + 1)

    // 4) the DATE-PARTITIONED compact() gets the same race detection:
    //    a racing append is caught BEFORE the dynamic-partition
    //    overwrite commits anything — zero rows wiped
    val factDir = base.resolve("fact").toString
    (1 to 6).foreach { i =>
      Seq((i.toLong, "2024-01-01")).toDF("v", "d")
        .select(col("v"), col("d").cast("date").as("p_date"))
        .write.mode("append").partitionBy("p_date").parquet(factDir)
    }
    Maintenance.compactBarrier = Some(() => {
      Seq((99L, "2024-01-01")).toDF("v", "d")
        .select(col("v"), col("d").cast("date").as("p_date"))
        .coalesce(1).write.mode("append").partitionBy("p_date").parquet(factDir)
    })
    val prevOverwriteMode =
      spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    try intercept[ConcurrentWriterException] {
      Maintenance.compact(spark, factDir, maxFilesPerPartition = 4)
    } finally Maintenance.compactBarrier = None
    assert(spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
        == prevOverwriteMode,
      "an aborted compact must not leak dynamic partitionOverwriteMode — " +
        "later plain overwrites would silently keep stale partitions")
    assert(spark.read.parquet(factDir).count() == 7,
      "the abort must leave every row (incl. the racing append) intact")
    Maintenance.compact(spark, factDir, maxFilesPerPartition = 4)
    assert(spark.read.parquet(factDir).count() == 7)
  }

  test("dupFlaggedAppend keeps flagging correctly across a mid-stream compaction") {
    import graft.streaming.EventsStreaming
    // batches 0,1 land on the flat index; compaction rewrites it to the
    // bucketed layout; batch 2 must (a) append INSIDE buckets, (b) flag
    // its spans against everything landed, identically to an
    // uncompacted from-scratch run. Arrival staging + reference replay
    // are the SAME DupFlagKit machinery StreamingSpec pins the flat
    // path with — one contract, two layouts.
    val parts = DupFlagKit.fixtureParts(spark, sf)
    val base = java.nio.file.Files.createTempDirectory("graft_gramidx_stream")
    val outPath = base.resolve("flagged").toString
    val idxPath = base.resolve("gram_index").toString
    val srcDir = base.resolve("in").toString
    def run(): Unit = {
      val q = EventsStreaming.dupFlaggedAppend(
        DupFlagKit.docStream(spark, srcDir), outPath, idxPath, n = 8)
      q.processAllAvailable(); q.stop()
    }
    DupFlagKit.stageArrival(base, parts.take(2)); run()
    Maintenance.compactGramIndex(spark, idxPath, buckets = 16)
    DupFlagKit.stageArrival(base, parts.drop(2), startK = 2); run()
    val (expected, landed) = DupFlagKit.dupFlagReference(parts)
    val got = DupFlagKit.readFlags(spark, outPath)
    assert(got == expected, "flags must be unchanged by compaction")
    // index stayed a set, inside buckets only
    assert(spark.read.parquet(idxPath).select("h").count() == landed.size)
    assert(!new java.io.File(idxPath).listFiles()
      .exists(f => f.isFile && f.getName.endsWith(".parquet")),
      "post-compaction appends must land inside hb= buckets")
  }

  test("snapshot policy with zorder columns restores pruning via the scheduled OPTIMIZE") {
    import graft.warehouse.Snapshots
    import graft.warehouse.Maintenance.{MaintenanceTarget, TableKind}
    val t = java.nio.file.Files
      .createTempDirectory("graft_maint_zorder").toString + "/t"
    // 20 shuffled appends over a 60x60 grid: every file spans the full
    // range, so the stats manifest prunes nothing until a clustering pass
    val rnd = new scala.util.Random(11)
    val cells = rnd.shuffle(
      (0 until 60).flatMap(x => (0 until 60).map(y => (x.toLong, y.toLong)))
        .toVector)
    cells.grouped(180).foreach(ch => Snapshots.commitAppend(spark,
      ch.toDF("x", "y").repartition(1), t))
    Snapshots.extendStats(spark, t, Seq("x", "y"))
    val target = MaintenanceTarget(t, TableKind.Snapshot, maxDataFiles = 16,
      keepVersions = 4, vacuumMinAgeMs = 0L, zorderCols = Seq("x", "y"))
    val msg = graft.warehouse.Maintenance.maintainIfNeeded(spark, target)
    assert(msg.exists(_.contains("optimized")), s"got $msg")
    val box = Seq(("x", 0.0, 9.0), ("y", 0.0, 9.0))
    val pruned = Snapshots.readPruned(spark, t, box)
    val (chosen, total) = graft.operators.Layout.lastStatsPruned.get
    assert(total == 2 && chosen < total,
      s"policy z-order should let the box prune, got $chosen/$total")
    assert(pruned.filter(col("x") <= 9 && col("y") <= 9).count() == 100)
    assert(Snapshots.read(spark, t).count() == 3600)
  }

  test("snapshot policy leg: OPTIMIZE past threshold, aged vacuum, stats extension") {
    import graft.warehouse.Snapshots
    import graft.warehouse.Maintenance.{MaintenanceTarget, TableKind}
    val t = java.nio.file.Files
      .createTempDirectory("graft_maint_snap").toString + "/t"
    (1L to 12L).foreach(i => Snapshots.commitAppend(spark,
      Seq((i, i * 2)).toDF("id", "x"), t))
    Snapshots.extendStats(spark, t, Seq("id"))
    val target = MaintenanceTarget(t, TableKind.Snapshot,
      maxDataFiles = 8, keepVersions = 4, vacuumMinAgeMs = 0L)
    val before = Snapshots.read(spark, t).collect().map(_.getLong(0)).toSet
    val msg = graft.warehouse.Maintenance.maintainIfNeeded(spark, target)
    assert(msg.exists(_.contains("optimized")), s"got $msg")
    // OPTIMIZE committed, data identical, head compacted under threshold
    val head = Snapshots.currentVersion(spark, t)
    assert(head == 13L)
    assert(Snapshots.read(spark, t).collect().map(_.getLong(0)).toSet == before)
    assert(Snapshots.filesAt(spark, t, head).size <= 8)
    // retention: only the trailing keepVersions manifests survive
    intercept[Exception] { Snapshots.filesAt(spark, t, 1L) }
    // the stats manifest follows the rewrite: dead entries pruned, the
    // compacted files covered, and the pruned read still exact
    val msg2 = graft.warehouse.Maintenance.maintainIfNeeded(spark, target)
    assert(msg2.exists(_.contains("manifested")) || msg2.isEmpty, s"got $msg2")
    val boxed = Snapshots.readPruned(spark, t, Seq(("id", 1.0, 3.0)))
      .filter(col("id") <= 3).collect().map(_.getLong(0)).toSet
    assert(boxed == Set(1L, 2L, 3L))
    // steady state: a healthy table is left alone
    assert(graft.warehouse.Maintenance.maintainIfNeeded(spark, target).isEmpty)
    // a young unreferenced file survives an age-guarded vacuum
    val dd = new org.apache.hadoop.fs.Path(t, "data")
    val fs2 = dd.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val orphan = new org.apache.hadoop.fs.Path(dd, "young-orphan.parquet")
    fs2.create(orphan, true).close()
    assert(!Snapshots.vacuum(spark, t, keepVersions = 4,
      minAgeMs = 60000L).contains("young-orphan.parquet"),
      "an in-flight committer's staged file must survive the aged vacuum")
    assert(Snapshots.vacuum(spark, t, keepVersions = 4)
      .contains("young-orphan.parquet"),
      "an immediate vacuum reclaims the orphan")
  }

  test("snapshot policy: retainDays expires whole declared partitions, data-relative") {
    import org.apache.spark.sql.functions.{col, date_add, lit, to_date}
    import Maintenance.{MaintenanceTarget, TableKind}
    import graft.warehouse.Snapshots
    val t = java.nio.file.Files
      .createTempDirectory("graft_maint_part").toString + "/t"
    val rows = spark.range(0, 500).toDF("id")
      .withColumn("d", date_add(to_date(lit("2024-05-01")),
        (col("id") % 10).cast("int")))
    Snapshots.commitAppend(spark, rows.limit(1), t) // v1: seed
    Snapshots.commitSetPartition(spark, t, "d", "date") // v2
    Snapshots.commitAppend(spark, rows, t) // v3: 10 day-partitions
    val target = MaintenanceTarget(t, TableKind.Snapshot,
      maxDataFiles = 10000, retainDays = Some(3),
      vacuumMinAgeMs = 0L, keepVersions = 1)
    val msg = Maintenance.maintainIfNeeded(spark, target)
    assert(msg.exists(_.contains("expired")), s"got $msg")
    // newest day is 2024-05-10; retainDays=3 keeps 05-08..05-10 among
    // PARTITIONED rows; the flat v1 seed row survives (cannot prove age)
    val kept = Snapshots.read(spark, t)
    assert(kept.filter(col("d") >= "2024-05-08").count() == 150)
    assert(kept.count() == 151)
    // idempotent: a re-run expires nothing new
    assert(Maintenance.maintainIfNeeded(spark, target)
      .forall(m => !m.contains("expired")))
  }
}
