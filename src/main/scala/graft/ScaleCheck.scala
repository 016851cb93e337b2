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
    // ------- streaming-sink scale gates (VERDICT r12 #7): the per-batch
    // cost of the dedup sinks must stay ~flat as LANDED HISTORY grows
    // 10× — the O(batch) steady-state contract, gated by measurement
    // instead of argued by plan shape. Per scale: land the fixture as
    // one history batch (untimed), compact the index (the maintained
    // steady state), then time ONE probe batch of FIXED size (200 novel
    // docs — same rows at both scales — plus 20 verbatim dups drawn
    // from that scale's own history, so both the skip path and the
    // probe path execute).
    val streamMaxRatio = sys.env.getOrElse("SCALE_STREAM_RATIO_MAX", "6").toDouble
    import org.apache.spark.sql.functions._
    def stage(df: org.apache.spark.sql.DataFrame,
        srcDir: java.nio.file.Path, k: Int): Unit = {
      val tmp = srcDir.resolveSibling(s"tmp$k").toString
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dst = srcDir.resolve(s"batch$k.parquet")
      java.nio.file.Files.copy(part.toPath, dst)
      dst.toFile.setLastModified(1700000000000L + k * 60000L)
    }
    // lazy: an `only` filter that skips the streaming gates must not pay
    // this fixture materialization
    lazy val novelBase = Tables.documents(spark, smallDir)
      .select("doc_id", "text", "lang", "source", "n_chars")
      .orderBy("doc_id").limit(200)
      .withColumn("doc_id", col("doc_id") + 10000000L)
      .withColumn("text", translate(col("text"), "aeiou", "01234"))
      .localCheckpoint(true)
    def probeTime(sfDir: String, kind: String): Double = {
      val base = java.nio.file.Files.createTempDirectory(s"graft_scale_$kind")
      val outPath = base.resolve("out").toString
      val idxPath = base.resolve("idx").toString
      val ckpt = base.resolve("ckpt").toString
      val srcDir = base.resolve("in")
      java.nio.file.Files.createDirectories(srcDir)
      val docs = Tables.documents(spark, sfDir)
        .select("doc_id", "text", "lang", "source", "n_chars")
      stage(docs, srcDir, 0)
      val dups = docs.orderBy("doc_id").limit(20)
        .withColumn("doc_id", col("doc_id") + 20000000L)
      def sink() = {
        val stream = spark.readStream
          .schema(spark.read.parquet(srcDir.toString).schema)
          .parquet(srcDir.toString)
        kind match {
          case "stream_dupflag" => graft.streaming.EventsStreaming
            .dupFlaggedAppend(stream, outPath, idxPath, n = 8, Some(ckpt))
          case _ => graft.streaming.EventsStreaming
            .nearDupFlaggedAppend(stream, outPath, idxPath, checkpoint = Some(ckpt))
        }
      }
      val q1 = sink(); q1.processAllAvailable(); q1.stop() // history, untimed
      if (kind == "stream_dupflag")
        graft.warehouse.Maintenance.compactGramIndex(spark, idxPath, 64)
      else
        graft.warehouse.Maintenance.compactSigIndex(spark, idxPath, 64)
      stage(novelBase.unionByName(dups), srcDir, 1)
      val q2 = sink() // checkpoint resume: only the probe file is new
      val t0 = System.nanoTime()
      q2.processAllAvailable()
      val t = (System.nanoTime() - t0) / 1e9
      q2.stop()
      t
    }
    Seq("stream_dupflag", "stream_neardup")
      .filter(k => only.forall(_.contains(k)))
      .foreach { kind =>
        try {
          val tSmall = probeTime(smallDir, kind)
          val tBig = probeTime(bigDir, kind)
          val ratio = tBig / math.max(tSmall, 1e-3)
          val violation = tBig > floorSec && ratio > streamMaxRatio
          if (violation) bad += 1
          println(f"$kind%-26s small=$tSmall%7.2fs big=$tBig%7.2fs ratio=$ratio%6.1f ${if (violation) "SCALE_BAD" else "ok"} (per-batch vs 10x landed history)")
        } catch { case e: Throwable =>
          bad += 1
          println(f"$kind%-26s FAILED ${e.getMessage}")
        }
      }

    // ------- change-feed scale gate: rowDiff's cost must track the
    // CHURN, never the table. Build a snapshot table with a
    // size-proportional file count (fixed ~rows-per-file, range-laid on
    // the key so a compact key range lives in few files — the layout a
    // maintained table has), delete the SAME 50-key range at both
    // scales, and time the feed read. IO ∝ churned files ⇒ ~flat across
    // the 10× table step.
    if (only.forall(_.contains("snap_rowdiff"))) {
      import graft.warehouse.Snapshots
      val cdfMaxRatio = sys.env.getOrElse("SCALE_CDF_RATIO_MAX", "6").toDouble
      def cdfTime(sfDir: String): Double = {
        val table = java.nio.file.Files
          .createTempDirectory("graft_scale_cdf").toString + "/t"
        val orders = Tables.orders(spark, sfDir)
          .select("o_orderkey", "o_custkey", "o_totalprice")
        val nFiles = math.max(4L, orders.count() / 5000L).toInt
        Snapshots.commitAppend(spark,
          orders.repartitionByRange(nFiles, col("o_orderkey")), table)
        val doomed = orders.orderBy("o_orderkey").limit(50)
          .collect().map(_.getLong(0)).toSeq
        val (v, _) = Snapshots.commitDelete(spark, table, doomed, "o_orderkey")
        def feed(): Unit = Snapshots.rowDiff(spark, table, v - 1, v,
          Seq("o_orderkey")).write.format("noop").mode("overwrite").save()
        feed() // untimed warmup
        val t0 = System.nanoTime()
        feed()
        (System.nanoTime() - t0) / 1e9
      }
      val gateName = "snap_rowdiff"
      try {
        val tSmall = cdfTime(smallDir)
        val tBig = cdfTime(bigDir)
        val ratio = tBig / math.max(tSmall, 1e-3)
        val violation = tBig > floorSec && ratio > cdfMaxRatio
        if (violation) bad += 1
        println(f"$gateName%-26s small=$tSmall%7.2fs big=$tBig%7.2fs ratio=$ratio%6.1f ${if (violation) "SCALE_BAD" else "ok"} (fixed churn vs 10x table)")
      } catch { case e: Throwable =>
        bad += 1
        println(f"$gateName%-26s FAILED ${e.getMessage}")
      }
    }

    // ------- replica feed-sync scale gate: the destination side of
    // syncReplica must track the CHURN, never the replica size. Mirror a
    // size-proportional source table (same range layout as the cdf
    // gate), extend stats on the replica (the maintained steady state —
    // the policy's incremental stats pass), land a FIXED 50-key merge
    // window on the source, and time the feed sync: rowDiff reads the
    // churned source files, the replica probe is stats-pruned, and only
    // the replica files holding touched keys rewrite ⇒ ~flat across the
    // 10× table step.
    if (only.forall(_.contains("snap_replica_sync"))) {
      import graft.warehouse.Snapshots
      val repMaxRatio = sys.env.getOrElse("SCALE_REP_RATIO_MAX", "6").toDouble
      def repTime(sfDir: String): Double = {
        val root = java.nio.file.Files
          .createTempDirectory("graft_scale_rep").toString
        val src = root + "/src"
        val dst = root + "/dst"
        val orders = Tables.orders(spark, sfDir)
          .select("o_orderkey", "o_custkey", "o_totalprice")
        val nFiles = math.max(4L, orders.count() / 5000L).toInt
        Snapshots.commitAppend(spark,
          orders.repartitionByRange(nFiles, col("o_orderkey")), src)
        Snapshots.syncReplica(spark, src, dst, Seq("o_orderkey")) // untimed
        Snapshots.extendStats(spark, dst, Seq("o_orderkey"))
        Snapshots.commitMerge(spark, // fixed churn: 50-key price bump
          orders.orderBy("o_orderkey").limit(50)
            .withColumn("o_totalprice", col("o_totalprice") * 1.1),
          src, Seq("o_orderkey"))
        val t0 = System.nanoTime()
        val (_, _, mode) = Snapshots.syncReplica(spark, src, dst,
          Seq("o_orderkey"))
        val t = (System.nanoTime() - t0) / 1e9
        require(mode == "feed", s"expected a feed sync, got $mode")
        t
      }
      val gateName = "snap_replica_sync"
      try {
        val tSmall = repTime(smallDir)
        val tBig = repTime(bigDir)
        val ratio = tBig / math.max(tSmall, 1e-3)
        val violation = tBig > floorSec && ratio > repMaxRatio
        if (violation) bad += 1
        println(f"$gateName%-26s small=$tSmall%7.2fs big=$tBig%7.2fs ratio=$ratio%6.1f ${if (violation) "SCALE_BAD" else "ok"} (fixed churn vs 10x replica)")
      } catch { case e: Throwable =>
        bad += 1
        println(f"$gateName%-26s FAILED ${e.getMessage}")
      }
    }

    // ------- partial-compaction scale gate: compactSmallFiles must cost
    // O(small-file debt), never O(table). Base the table at a size-
    // proportional compact layout, accrete a FIXED 20-file debt, and
    // time the pack with a threshold measured strictly below the
    // smallest base file ⇒ only the debt rewrites ⇒ ~flat on the 10×
    // step.
    if (only.forall(_.contains("snap_small_pack"))) {
      import graft.warehouse.Snapshots
      import spark.implicits._
      val packMaxRatio = sys.env.getOrElse("SCALE_PACK_RATIO_MAX", "6").toDouble
      def packTime(sfDir: String): Double = {
        val table = java.nio.file.Files
          .createTempDirectory("graft_scale_pack").toString + "/t"
        val orders = Tables.orders(spark, sfDir)
          .select("o_orderkey", "o_custkey", "o_totalprice")
        val nFiles = math.max(4L, orders.count() / 2500L).toInt
        Snapshots.commitAppend(spark,
          orders.repartitionByRange(nFiles, col("o_orderkey")), table)
        (0 until 20).foreach { i => // the fixed debt
          Snapshots.commitAppend(spark,
            Seq((10000000L + i, 1L, 0.0))
              .toDF("o_orderkey", "o_custkey", "o_totalprice")
              .coalesce(1), table)
        }
        val dd = new org.apache.hadoop.fs.Path(table, "data")
        val hfs = dd.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val minBase = Snapshots.filesAt(spark, table, 1L)
          .map(n => hfs.getFileStatus(
            new org.apache.hadoop.fs.Path(dd, n)).getLen).min
        val t0 = System.nanoTime()
        val v = Snapshots.compactSmallFiles(spark, table,
          smallBytes = minBase, minSmall = 8)
        val t = (System.nanoTime() - t0) / 1e9
        require(v.nonEmpty, "pack must have fired")
        require(Snapshots.filesAt(spark, table, v.get).size == nFiles + 1,
          "only the debt may rewrite")
        t
      }
      val gateName = "snap_small_pack"
      try {
        val tSmall = packTime(smallDir)
        val tBig = packTime(bigDir)
        val ratio = tBig / math.max(tSmall, 1e-3)
        val violation = tBig > floorSec && ratio > packMaxRatio
        if (violation) bad += 1
        println(f"$gateName%-26s small=$tSmall%7.2fs big=$tBig%7.2fs ratio=$ratio%6.1f ${if (violation) "SCALE_BAD" else "ok"} (fixed debt vs 10x table)")
      } catch { case e: Throwable =>
        bad += 1
        println(f"$gateName%-26s FAILED ${e.getMessage}")
      }
    }

    // ------- predicate-probe scale gate: a range DELETE's cost must
    // track the files the predicate's bounds select, never the table.
    // Same range layout + stats manifest as the cdf gate; delete the
    // SAME fixed 50-key low range at both scales — the predicate-bound
    // stats prune keeps the probe to the one or two boundary slabs, so
    // the whole commit stays ~flat across the 10× table step (an
    // unpruned probe would scan every file and grow ~10×).
    if (only.forall(_.contains("snap_where_prune"))) {
      import graft.warehouse.Snapshots
      val whereMaxRatio = sys.env.getOrElse("SCALE_WHERE_RATIO_MAX", "6").toDouble
      def whereTime(sfDir: String): Double = {
        val table = java.nio.file.Files
          .createTempDirectory("graft_scale_where").toString + "/t"
        val orders = Tables.orders(spark, sfDir)
          .select("o_orderkey", "o_custkey", "o_totalprice")
        val nFiles = math.max(4L, orders.count() / 5000L).toInt
        Snapshots.commitAppend(spark,
          orders.repartitionByRange(nFiles, col("o_orderkey")), table)
        Snapshots.extendStats(spark, table, Seq("o_orderkey"))
        val cutoff = orders.orderBy("o_orderkey").limit(50)
          .collect().map(_.getLong(0)).max
        val t0 = System.nanoTime()
        val (_, n) = Snapshots.commitDeleteWhere(spark, table,
          col("o_orderkey") <= cutoff)
        val t = (System.nanoTime() - t0) / 1e9
        require(n >= 50, s"fixed-range delete removed only $n rows")
        val Some((cand, total)) = Snapshots.lastWherePruned
        require(cand <= math.max(3, total / 4),
          s"predicate probe did not prune: $cand of $total candidates")
        t
      }
      val gateName = "snap_where_prune"
      try {
        val tSmall = whereTime(smallDir)
        val tBig = whereTime(bigDir)
        val ratio = tBig / math.max(tSmall, 1e-3)
        val violation = tBig > floorSec && ratio > whereMaxRatio
        if (violation) bad += 1
        println(f"$gateName%-26s small=$tSmall%7.2fs big=$tBig%7.2fs ratio=$ratio%6.1f ${if (violation) "SCALE_BAD" else "ok"} (fixed-range delete vs 10x table)")
      } catch { case e: Throwable =>
        bad += 1
        println(f"$gateName%-26s FAILED ${e.getMessage}")
      }
    }

    // ------- delta-manifest scale gate: steady-state commit BYTES must
    // be O(batch), not O(table files) — claimManifest writes #base/#add
    // deltas between checkpoints, so a 1-file append's manifest stays
    // ~flat while the referenced-file count grows 10×. Measured in
    // BYTES (deterministic), not seconds; head-resolve time rides along
    // as a bounded sanity ratio (checkpoint + ≤16 deltas either way).
    if (only.forall(_.contains("snap_manifest_delta"))) {
      import graft.warehouse.Snapshots
      def commitBytes(nFiles: Int): (Long, Double) = {
        val table = java.nio.file.Files
          .createTempDirectory("graft_scale_mdelta").toString + "/t"
        Snapshots.commitAppend(spark,
          spark.range(0, nFiles * 100L).toDF("id")
            .repartition(nFiles, col("id")), table)
        Snapshots.commitAppend(spark,
          spark.range(0, 10).toDF("id").repartition(1), table)
        val mf = new org.apache.hadoop.fs.Path(
          table, "_manifests/v00000002.manifest")
        val bytes = mf.getFileSystem(spark.sparkContext.hadoopConfiguration)
          .getFileStatus(mf).getLen
        Snapshots.invalidateTable(table) // force a cold resolve
        val t0 = System.nanoTime()
        require(Snapshots.filesAt(spark, table, 2L).size == nFiles + 1)
        (bytes, (System.nanoTime() - t0) / 1e9)
      }
      val gateName = "snap_manifest_delta"
      try {
        val (bSmall, _) = commitBytes(40)
        val (bBig, tResolve) = commitBytes(400)
        val ratio = bBig.toDouble / math.max(bSmall, 1L)
        val violation = ratio > 3.0 || tResolve > 10.0
        if (violation) bad += 1
        println(f"$gateName%-26s small=${bSmall}B big=${bBig}B ratio=$ratio%6.1f ${if (violation) "SCALE_BAD" else "ok"} (append commit bytes vs 10x referenced files)")
      } catch { case e: Throwable =>
        bad += 1
        println(f"$gateName%-26s FAILED ${e.getMessage}")
      }
    }

    println(if (bad == 0) "ALL_SCALE_OK" else s"$bad SCALE CHECKS FAILED")
    spark.stop()
    if (bad > 0) sys.exit(1)
  }
}
