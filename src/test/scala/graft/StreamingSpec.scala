package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.EventsStreaming

class StreamingSpec extends AnyFunSuite {
  import SparkTest._

  test("streaming windowed counts equal the batch tumbling-window query") {
    val stream = EventsStreaming.readEvents(spark, sf)
    // complete mode so the finite source's full aggregation is observable
    val got = EventsStreaming.runToCompletion(
        EventsStreaming.windowedCounts(stream), "win_counts", mode = "complete")
      .select(col("window_start").cast("string"), col("event_type"), col("n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet

    val batch = Tables.events(spark, sf)
      .groupBy(window(col("ts"), "6 hours"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").cast("string"), col("event_type"), col("n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet

    assert(got == batch)
  }

  test("streaming dedup drops duplicate event_ids within the watermark") {
    val stream = EventsStreaming.readEvents(spark, sf)
    val deduped = EventsStreaming.runToCompletion(
      EventsStreaming.dedupedStream(stream), "dedup_stream")
    assert(deduped.count() == deduped.select("event_id").distinct().count())
    assert(deduped.count() == Tables.events(spark, sf).count()) // fixture has no dups
  }

  test("streaming LM scoring (broadcast model) is bit-identical to the batch scorer") {
    // the filter-at-ingest shape: model tables trained on the static
    // reference corpus, document micro-batches scored through the same
    // broadcast joins; complete mode observes the finite source's full
    // per-doc aggregation
    val docs = Tables.documents(spark, sf)
    val expected = graft.queries.Text.lmScores(docs)
      .collect().map(_.toString).sorted
    val scored = graft.queries.Text.lmScoreAgainst(docs)(
      EventsStreaming.readDocuments(spark, sf).select(col("doc_id"), col("text")))
    assert(scored.isStreaming, "scorer must accept a streaming frame")
    val got = EventsStreaming.runToCompletion(scored, "lm_stream", mode = "complete")
      .collect().map(_.toString).sorted
    assert(got.nonEmpty && got.sameElements(expected))
  }

  test("streaming decontamination equals the batch clean (per-doc verdicts compose)") {
    val docs = Tables.documents(spark, sf)
    val evalDocs = docs.filter(col("doc_id") % 10 === 0)
    val train = docs.filter(col("doc_id") % 10 =!= 0)
    val expected = graft.operators.Decontaminate.clean(train, evalDocs, n = 5)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    val outPath = java.nio.file.Files
      .createTempDirectory("graft_decon_stream").toString + "/clean"
    val q = EventsStreaming.decontaminatedAppend(
      EventsStreaming.readDocuments(spark, sf).filter(col("doc_id") % 10 =!= 0),
      evalDocs, n = 5, outPath)
    q.processAllAvailable(); q.stop()
    val got = spark.read.parquet(outPath)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(got.nonEmpty && got.sameElements(expected),
      s"stream kept ${got.length} docs, batch kept ${expected.length}")
    // at-least-once replay: a fresh stream over the same source (full
    // redelivery of every row) must insert ZERO duplicates
    val q2 = EventsStreaming.decontaminatedAppend(
      EventsStreaming.readDocuments(spark, sf).filter(col("doc_id") % 10 =!= 0),
      evalDocs, n = 5, outPath)
    q2.processAllAvailable(); q2.stop()
    assert(spark.read.parquet(outPath).count() == expected.length,
      "replay must not duplicate surviving docs")
  }

  test("snapshot stream sink: manifest watermark refuses redelivery, feed tails the table") {
    import graft.warehouse.Snapshots
    val base = java.nio.file.Files
      .createTempDirectory("graft_snapstream").toString
    val table = base + "/t"
    val src = () => EventsStreaming.readDocuments(spark, sf)
      .select(col("doc_id"), col("text"))
    val q = EventsStreaming.snapshotAppend(src(), table, "docs-ingest",
      base + "/ck1")
    q.processAllAvailable(); q.stop()
    val expected = Tables.documents(spark, sf).count()
    assert(Snapshots.read(spark, table).count() == expected)
    val head = Snapshots.currentVersion(spark, table)
    assert(Snapshots.lastCommittedBatch(spark, table, "docs-ingest").isDefined)
    // full redelivery (fresh checkpoint, same stream identity): every
    // batch id re-presents and the manifest watermark refuses each one —
    // no duplicate rows, no new versions
    val q2 = EventsStreaming.snapshotAppend(src(), table, "docs-ingest",
      base + "/ck2")
    q2.processAllAvailable(); q2.stop()
    assert(Snapshots.currentVersion(spark, table) == head,
      "redelivered batches must not commit")
    assert(Snapshots.read(spark, table).count() == expected)
    // every stream commit is an append-only step: an incremental
    // consumer tails the WHOLE history as one O(delta) feed
    assert(Snapshots.incrementalRead(spark, table, 0L, head)
      .count() == expected)
  }

  test("streaming PII redaction equals the batch redaction; replay inserts nothing") {
    import graft.functions.Pii
    // give the fixture text real PII to scrub, derived per doc (the
    // fixture corpus itself is digit-free word salad)
    def enrich(df: org.apache.spark.sql.DataFrame) = df.withColumn("text",
      concat(col("text"), lit(" u"), col("doc_id").cast("string"),
        lit("@x.io or 555-123-4567")))
    val docs = enrich(Tables.documents(spark, sf).select("doc_id", "text"))
    val expected = docs
      .select(col("doc_id"), md5(Pii.redactAll(col("text")).cast("binary")))
      .collect().map(_.toString).sorted
    val outPath = java.nio.file.Files
      .createTempDirectory("graft_pii_stream").toString + "/scrubbed"
    def start() = EventsStreaming.redactedAppend(
      enrich(EventsStreaming.readDocuments(spark, sf).select("doc_id", "text")),
      outPath)
    val q = start(); q.processAllAvailable(); q.stop()
    val landed = spark.read.parquet(outPath)
    val got = landed
      .select(col("doc_id"), md5(col("text").cast("binary")))
      .collect().map(_.toString).sorted
    assert(got.nonEmpty && got.sameElements(expected),
      "landed corpus must be exactly the batch-redacted corpus")
    // the retention property itself: nothing PII-shaped persisted
    assert(landed.select(sum(Pii.totalCol(col("text")))).head.getLong(0) == 0L)
    // at-least-once replay: full redelivery inserts zero duplicates
    val q2 = start(); q2.processAllAvailable(); q2.stop()
    assert(spark.read.parquet(outPath).count() == expected.length)
  }

  test("decontaminatedAppend also skips re-delivered batches via the mark") {
    // same commit-log rewind as the appendWithDedup test, on the
    // decontamination sink: the replayed batch must skip without
    // re-cleaning or re-probing the landed corpus
    val docs = Tables.documents(spark, sf)
    val evalDocs = docs.filter(col("doc_id") % 10 === 0)
    val base = java.nio.file.Files.createTempDirectory("graft_hwm_dc").toString
    val chk = s"$base/chk"
    val outPath = s"$base/clean"
    def start() = EventsStreaming.decontaminatedAppend(
      EventsStreaming.readDocuments(spark, sf).filter(col("doc_id") % 10 =!= 0),
      evalDocs, n = 5, outPath, checkpoint = Some(chk))
    val q1 = start()
    q1.processAllAvailable(); q1.stop()
    val n1 = spark.read.parquet(outPath).count()
    assert(n1 > 0)
    val commits = new java.io.File(s"$chk/commits")
    val lastName = commits.listFiles().map(_.getName)
      .filter(_.forall(_.isDigit)).maxBy(_.toLong)
    commits.listFiles()
      .filter(f => f.getName == lastName ||
        f.getName.stripPrefix(".").startsWith(lastName + "."))
      .foreach(f => assert(f.delete(), s"could not delete $f"))
    val skipped0 = EventsStreaming.hwmSkippedBatches.get()
    val anti0 = EventsStreaming.antiJoinedBatches.get()
    val q2 = start()
    q2.processAllAvailable(); q2.stop()
    assert(spark.read.parquet(outPath).count() == n1,
      "replayed batch must land zero docs")
    assert(EventsStreaming.hwmSkippedBatches.get() == skipped0 + 1)
    assert(EventsStreaming.antiJoinedBatches.get() == anti0)
  }

  // ----- dupFlaggedAppend helpers: shared with MaintenanceSpec via
  // DupFlagKit (one arrival convention, one reference contract)
  import DupFlagKit.{stageArrival, dupFlagReference}

  private def docStream(srcDir: String) = DupFlagKit.docStream(spark, srcDir)

  private def fixtureParts() = DupFlagKit.fixtureParts(spark, sf)

  private def assertFlagsMatch(outPath: String,
      expected: Map[Long, (Long, Long)]): Map[Long, (Long, Long)] = {
    val got = DupFlagKit.readFlags(spark, outPath)
    assert(got.size == expected.size, s"${got.size} docs landed, expected ${expected.size}")
    val diff = expected.filter { case (id, e) => got(id) != e }
    assert(diff.isEmpty, s"${diff.size} docs mis-flagged, e.g. ${diff.take(3)}")
    got
  }

  test("dupFlaggedAppend scores each arrival only against earlier batches") {
    // three ordered arrivals of the documents fixture; each batch's
    // n_dup_vs_landed must count exactly the windows present in
    // STRICTLY earlier batches (asymmetric incremental contract)
    val parts = fixtureParts()
    val base = java.nio.file.Files.createTempDirectory("graft_dupflag")
    val srcDir = stageArrival(base, parts)
    val outPath = base.resolve("flagged").toString
    val idxPath = base.resolve("gram_index").toString
    // spy on every micro-batch's output plan: the probe must carry no
    // Aggregate/Distinct whose whole subtree is the index scan (the
    // O(landed-history)-per-batch shape this sink is specified against)
    val plans = scala.collection.mutable.ListBuffer
      .empty[org.apache.spark.sql.catalyst.plans.logical.LogicalPlan]
    EventsStreaming.planSpy = Some(df => plans.synchronized {
      plans += df.queryExecution.optimizedPlan })
    try {
      val q = EventsStreaming.dupFlaggedAppend(docStream(srcDir), outPath, idxPath, n = 8)
      q.processAllAvailable(); q.stop()
    } finally EventsStreaming.planSpy = None

    val (expected, landed) = dupFlagReference(parts)
    val got = assertFlagsMatch(outPath, expected)
    assert(got.values.exists(_._2 > 0),
      "fixture boilerplate should produce cross-batch duplicated windows")
    // the index is a SET holding exactly the landed distinct grams — the
    // append is anti-joined, so row count EQUALS distinct count
    assert(spark.read.parquet(idxPath).count() == landed.size,
      "index must hold each landed gram exactly once")
    // plan audit: no aggregation over the index scan alone
    import org.apache.spark.sql.catalyst.plans.logical.Aggregate
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    // one label per leaf: the index relation's path, or the node name for
    // non-relation leaves (checkpointed grams arrive as LogicalRDD)
    def leafLabels(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Seq[String] =
      p.collectLeaves().map {
        case lr: LogicalRelation => lr.relation match {
          case h: HadoopFsRelation => h.location.rootPaths.map(_.toString).mkString(",")
          case other => other.getClass.getSimpleName
        }
        case other => other.nodeName
      }
    assert(plans.nonEmpty, "plan spy should observe every micro-batch")
    plans.foreach { plan =>
      plan.foreach {
        case agg: Aggregate =>
          val leaves = leafLabels(agg)
          assert(!(leaves.nonEmpty && leaves.forall(_.contains("gram_index"))),
            s"probe aggregates over the index scan alone:\n$agg")
        case _ => ()
      }
    }

    // full re-delivery by a FRESH query (at-least-once): the doc_id
    // safety net lands zero rows and the top-up leg appends zero grams —
    // the index stays a set, byte-for-byte the same content
    val q2 = EventsStreaming.dupFlaggedAppend(docStream(srcDir), outPath, idxPath, n = 8)
    q2.processAllAvailable(); q2.stop()
    assert(spark.read.parquet(outPath).count() == expected.size,
      "re-delivery must land zero duplicate rows")
    assert(spark.read.parquet(idxPath).count() == landed.size,
      "re-delivery must append zero grams — the index stays a set")
  }

  test("dupFlaggedAppend tops up the index for landed-but-unindexed docs") {
    // the crash window between the flagged-output append and the index
    // append: output landed, grams never indexed. Simulate the resulting
    // state (landed output + missing index), then re-deliver: the replay
    // batch's docs are all landed (fresh is empty), so the TOP-UP leg
    // must re-derive their grams and restore the index — and the NEXT
    // batch must be flagged against it exactly as a from-scratch run.
    val parts = fixtureParts()
    val base = java.nio.file.Files.createTempDirectory("graft_dupflag_topup")
    val src1 = stageArrival(base, parts.take(1))
    val outPath = base.resolve("flagged").toString
    val idxPath = base.resolve("gram_index").toString
    val q1 = EventsStreaming.dupFlaggedAppend(docStream(src1), outPath, idxPath, n = 8)
    q1.processAllAvailable(); q1.stop()
    val n1 = spark.read.parquet(outPath).count()
    // wipe the index — the landed-but-unindexed state a torn batch leaves
    def rmrf(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rmrf)); f.delete()
    }
    rmrf(new java.io.File(idxPath))
    // fresh query re-delivers part 0 (replay → top-up), then parts 1,2
    stageArrival(base, parts.drop(1), startK = 1)
    val q2 = EventsStreaming.dupFlaggedAppend(docStream(src1), outPath, idxPath, n = 8)
    q2.processAllAvailable(); q2.stop()
    val (expected, landed) = dupFlagReference(parts)
    assertFlagsMatch(outPath, expected)
    assert(spark.read.parquet(outPath).count() == expected.size && n1 < expected.size)
    assert(spark.read.parquet(idxPath).count() == landed.size,
      "top-up must restore the full landed gram set, exactly once each")
  }

  test("bloom front-filter skips the index join for novel grams, flags exact") {
    import spark.implicits._
    // batch 0: boilerplate corpus; batch 1: mostly novel docs plus a few
    // repeating batch-0 spans verbatim. The bloom sidecar must route the
    // novel grams around the index join (no false negatives ⇒ exactness
    // is free) — ≥90% of batch-1 grams skip the shuffle.
    val boiler = (0 until 40).map(i =>
      (i.toLong, (0 until 30).map(j => s"b${i % 4}_$j").mkString(" "), "en", "s0", 0L))
    val novel = (100 until 400).map(i =>
      (i.toLong, (0 until 30).map(j => s"u${i}_$j").mkString(" "), "en", "s1", 0L))
    val echo = (500 until 504).map(i =>
      (i.toLong, (0 until 30).map(j => s"b${i % 4}_$j").mkString(" "), "en", "s1", 0L))
    val allNovel = (600 until 640).map(i =>
      (i.toLong, (0 until 30).map(j => s"v${i}_$j").mkString(" "), "en", "s2", 0L))
    val p0 = boiler.toDF("doc_id", "text", "lang", "source", "n_chars")
    val p1 = (novel ++ echo).toDF("doc_id", "text", "lang", "source", "n_chars")
    val p2 = allNovel.toDF("doc_id", "text", "lang", "source", "n_chars")
    val base = java.nio.file.Files.createTempDirectory("graft_dupflag_bloom")
    val srcDir = stageArrival(base, Seq(p0, p1, p2))
    val outPath = base.resolve("flagged").toString
    val idxPath = base.resolve("gram_index").toString
    EventsStreaming.trackBloomStats = true
    EventsStreaming.bloomProbedGrams.set(0)
    EventsStreaming.bloomPassedGrams.set(0)
    val scanSkips0 = EventsStreaming.gramIndexScansSkipped.get()
    try {
      val q = EventsStreaming.dupFlaggedAppend(docStream(srcDir), outPath, idxPath, n = 8)
      q.processAllAvailable(); q.stop()
    } finally EventsStreaming.trackBloomStats = false
    // the all-novel batch skips the probe's index read (the set-append
    // derives from the probe verdicts and never re-reads in steady
    // state, so the probe is the only scan there was to skip)
    assert(EventsStreaming.gramIndexScansSkipped.get() == scanSkips0 + 1,
      "an all-novel batch must skip the gram-index read")
    val (expected, _) = dupFlagReference(Seq(p0, p1, p2))
    val got = assertFlagsMatch(outPath, expected)
    assert(got.collect { case (k, v) if k >= 500 && k < 600 => v }.forall(_._2 > 0),
      "echo docs must be flagged against batch-0 boilerplate")
    assert(got.collect { case (k, v) if (k >= 100 && k < 500) || k >= 600 => v }
      .forall(_._2 == 0L), "novel docs must not be flagged")
    val probed = EventsStreaming.bloomProbedGrams.get().toDouble
    val passed = EventsStreaming.bloomPassedGrams.get().toDouble
    assert(probed > 0, "batch 1 must probe the bloom")
    assert(passed / probed <= 0.1,
      f"bloom should skip >=90%% of novel grams (passed ${passed / probed}%.3f)")
    // accumulator discipline: the stats ride inside the probe's single
    // checkpointed execution, so every bloom-probed gram counts EXACTLY
    // once — batches 1 and 2 probe (batch 0 lands pre-index); a
    // re-executed lineage (the pre-r13 spec-mode count() pair) or a
    // double-evaluated projection would inflate this
    val expectedProbed = expected.collect {
      case (id, (nw, _)) if id >= 100 => nw
    }.sum
    assert(probed.toLong == expectedProbed,
      s"probed=$probed, want exactly $expectedProbed (once per gram)")
  }

  test("doc-id bloom skips the landed anti-join in steady state; replays and loss still exact") {
    import DupFlagKit.{docsDf, tokenRows}
    val parts = Seq(
      docsDf(spark, tokenRows("a", 0 until 8, tokens = 12)),
      docsDf(spark, tokenRows("b", 100 until 108, tokens = 12)),
      docsDf(spark, tokenRows("c", 200 until 208, tokens = 12)),
      docsDf(spark, tokenRows("d", 300 until 308, tokens = 12)))
    val base = java.nio.file.Files.createTempDirectory("graft_docbloom")
    val outPath = base.resolve("flagged").toString
    val idxPath = base.resolve("gram_index").toString
    val srcDir = base.resolve("in").toString
    def run(): Unit = {
      val q = EventsStreaming.dupFlaggedAppend(docStream(srcDir), outPath, idxPath, n = 8)
      q.processAllAvailable(); q.stop()
    }
    // steady state: every batch after the first is all-new ids — the
    // bloom proves it map-side and the landed id column is NEVER read
    val skip0 = EventsStreaming.landedScansSkipped.get()
    val anti0 = EventsStreaming.antiJoinedBatches.get()
    stageArrival(base, parts.take(3)); run()
    assert(EventsStreaming.landedScansSkipped.get() == skip0 + 2,
      "batches 1 and 2 must skip the landed scan outright")
    assert(EventsStreaming.antiJoinedBatches.get() == anti0,
      "no steady-state batch may pay the anti-join")
    // full re-delivery by a FRESH query (foreign hwm): every id is
    // bloom-positive → the anti-join safety net runs and inserts zero
    run()
    assert(spark.read.parquet(outPath).count() == 24, "replay lands nothing")
    assert(EventsStreaming.antiJoinedBatches.get() > anti0,
      "re-delivered ids must take the safety net")
    // LOST sidecar over a populated table: rebuilt from the landed ids
    // (superset rule), still exact, and the skip path resumes after
    assert(new java.io.File(outPath, "_graft_doc_bloom").delete())
    stageArrival(base, parts.drop(3), startK = 3); run()
    assert(new java.io.File(outPath, "_graft_doc_bloom").exists(),
      "lost doc bloom must be rebuilt")
    val (expected, _) = dupFlagReference(parts)
    assertFlagsMatch(outPath, expected)
    val skip1 = EventsStreaming.landedScansSkipped.get()
    stageArrival(base,
      Seq(docsDf(spark, tokenRows("e", 400 until 408, tokens = 12))),
      startK = 4); run()
    assert(EventsStreaming.landedScansSkipped.get() == skip1 + 1,
      "skip economy must resume after the rebuild")
  }

  test("NULL-doc_id rows survive the bloom front filter like the anti-join path") {
    import DupFlagKit.{docsDf, tokenRows}
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_nullid")
    val outPath = base.resolve("flagged").toString
    val idxPath = base.resolve("gram_index").toString
    val srcDir = base.resolve("in").toString
    def run(): Unit = {
      val q = EventsStreaming.dupFlaggedAppend(docStream(srcDir), outPath,
        idxPath, n = 8)
      q.processAllAvailable(); q.stop()
    }
    // batch 0 creates the table and its bloom sidecar
    stageArrival(base, Seq(docsDf(spark, tokenRows("a", 0 until 4,
      tokens = 12)))); run()
    // batch 1 arrives AFTER the bloom exists: a NULL bloom verdict must
    // route the NULL-key row into the definitely-new leg (the anti-join
    // and first-batch paths both land it — NULL never matches a key)
    val withNull = Seq(
      (Option.empty[Long], DupFlagKit.tokenText("n", 0, 12), "en", "s", 0L),
      (Some(500L), DupFlagKit.tokenText("b", 0, 12), "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    stageArrival(base, Seq(withNull), startK = 1); run()
    val out = spark.read.parquet(outPath)
    assert(out.filter(col("doc_id").isNull).count() == 1,
      "the NULL-id document must land, not silently vanish")
    assert(out.count() == 6)
  }

  test("trimDupSpansAppend over an ordered arrival equals the batch trimDupSpans") {
    // the ingest path emits the deduplicated corpus directly: landed
    // text = the batch trimDupSpans rebuild, doc for doc, when files
    // arrive in doc_id order (arrival order = canonical owner order)
    val parts = fixtureParts()
    val base = java.nio.file.Files.createTempDirectory("graft_trim_stream")
    val srcDir = stageArrival(base, parts)
    val outPath = base.resolve("trimmed").toString
    val idxPath = base.resolve("gram_index").toString
    val q = EventsStreaming.trimDupSpansAppend(docStream(srcDir), outPath, idxPath, n = 8)
    q.processAllAvailable(); q.stop()
    val streamed = spark.read.parquet(outPath)
      .select(col("doc_id"), col("n_tokens"), col("n_kept"),
        md5(col("text").cast("binary")).as("m"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3)))
      .toMap
    val batch = graft.operators.Dedup
      .trimDupSpans(parts.reduce(_ unionByName _), n = 8)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3)))
      .toMap
    assert(streamed.size == batch.size)
    val diff = batch.filter { case (id, e) => streamed(id) != e }
    assert(diff.isEmpty,
      s"${diff.size} docs differ from the batch trim, e.g. ${diff.take(3)}")
    // the index must hold the ORIGINAL texts' grams (ownership is
    // defined on what arrived; trimmed-text grams would add artifact
    // windows across cut boundaries)
    val (_, landed) = dupFlagReference(parts)
    assert(spark.read.parquet(idxPath).count() == landed.size)
  }

  test("foreachBatch append sink is idempotent across stream replays") {
    val factPath = java.nio.file.Files.createTempDirectory("graft_fact").toString + "/events"
    // first run: full fixture lands
    val q1 = EventsStreaming.appendWithDedup(
      EventsStreaming.readEvents(spark, sf), factPath)
    q1.processAllAvailable(); q1.stop()
    val n1 = spark.read.parquet(factPath).count()
    assert(n1 == Tables.events(spark, sf).count())
    // replay the same source from scratch (fresh stream, no checkpoint):
    // at-least-once redelivery of every row → anti-join inserts zero
    val q2 = EventsStreaming.appendWithDedup(
      EventsStreaming.readEvents(spark, sf), factPath)
    q2.processAllAvailable(); q2.stop()
    val n2 = spark.read.parquet(factPath).count()
    assert(n2 == n1, s"replay inserted ${n2 - n1} duplicates")

    // the fact landed date-partitioned, and the sink's probe shape (a
    // p_date range filter) prunes at the partition level — the micro-batch
    // never rescans the full history
    val factDir = new java.io.File(factPath)
    assert(factDir.listFiles().exists(_.getName.startsWith("p_date=")),
      "fact should be written partitioned by p_date")
    val lo = spark.read.parquet(factPath)
      .agg(min(col("p_date"))).head.getDate(0)
    val probe = spark.read.parquet(factPath).filter(col("p_date") === lit(lo))
    val scan = probe.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("p_date"),
      s"probe should prune on p_date partitions:\n${scan.take(1000)}")
  }

  test("a re-delivered batch is skipped via the high-water mark, no landed scan") {
    // the at-least-once window foreachBatch documents: offsets logged,
    // foreachBatch ran, but the commit-log entry was never written (crash
    // between the two) → restart re-delivers the SAME batchId. Simulate
    // by deleting the last commits/ entry after a clean run.
    val base = java.nio.file.Files.createTempDirectory("graft_hwm").toString
    val chk = s"$base/chk"
    val factPath = s"$base/events"
    val q1 = EventsStreaming.appendWithDedup(
      EventsStreaming.readEvents(spark, sf), factPath, checkpoint = Some(chk))
    q1.processAllAvailable(); q1.stop()
    val n1 = spark.read.parquet(factPath).count()
    assert(n1 > 0)
    val commits = new java.io.File(s"$chk/commits")
    val lastName = commits.listFiles().map(_.getName)
      .filter(_.forall(_.isDigit)).maxBy(_.toLong)
    // take the checksum/crc sidecars with it, or Spark 4.1's checkpoint
    // manager reads the orphan sidecar as a concurrent-writer conflict
    commits.listFiles()
      .filter(f => f.getName == lastName ||
        f.getName.stripPrefix(".").startsWith(lastName + "."))
      .foreach(f => assert(f.delete(), s"could not delete $f"))

    val skipped0 = EventsStreaming.hwmSkippedBatches.get()
    val anti0 = EventsStreaming.antiJoinedBatches.get()
    // restart from the same checkpoint: same queryId, same batchId
    val q2 = EventsStreaming.appendWithDedup(
      EventsStreaming.readEvents(spark, sf), factPath, checkpoint = Some(chk))
    q2.processAllAvailable(); q2.stop()

    assert(spark.read.parquet(factPath).count() == n1,
      "replayed batch must land zero rows")
    assert(EventsStreaming.hwmSkippedBatches.get() == skipped0 + 1,
      "replay must be recognized by the high-water mark")
    assert(EventsStreaming.antiJoinedBatches.get() == anti0,
      "the skip must not fall back to the landed anti-join")

    // and a FRESH query over the same sink (new queryId, batch ids
    // restart) must NOT trust the mark — it takes the anti-join safety
    // net and still inserts zero duplicates
    val q3 = EventsStreaming.appendWithDedup(
      EventsStreaming.readEvents(spark, sf), factPath)
    q3.processAllAvailable(); q3.stop()
    assert(spark.read.parquet(factPath).count() == n1)
    assert(EventsStreaming.antiJoinedBatches.get() > anti0,
      "a fresh query must use the safety net, not the foreign mark")
  }

  test("a sidecar-only sink directory replays as empty, never a crash loop") {
    // the torn-first-batch state: the bloom sidecar (written before the
    // first index append) or a _temporary husk exists, but no data file
    // does. fs.exists would say "index/output present" and the parquet
    // read would throw on every replay forever — the data-file probe
    // must treat both dirs as absent and land the batch normally.
    val parts = fixtureParts()
    val base = java.nio.file.Files.createTempDirectory("graft_dupflag_torn")
    val srcDir = stageArrival(base, parts.take(1))
    val outPath = base.resolve("flagged").toString
    val idxPath = base.resolve("gram_index").toString
    // plant the torn state BEFORE the first batch
    val idxDir = new java.io.File(idxPath); idxDir.mkdirs()
    val bloom = new java.io.File(idxDir, "_graft_gram_bloom")
    java.nio.file.Files.write(bloom.toPath, Array[Byte](1, 2, 3))
    val outDir = new java.io.File(outPath)
    new java.io.File(outDir, "_temporary/0").mkdirs()
    val q = EventsStreaming.dupFlaggedAppend(docStream(srcDir), outPath, idxPath, n = 8)
    q.processAllAvailable(); q.stop()
    val (expected, landed) = dupFlagReference(parts.take(1))
    assertFlagsMatch(outPath, expected)
    assert(spark.read.parquet(idxPath).count() == landed.size,
      "the index must be rebuilt from scratch past the stranded sidecar")
  }

  test("nearDupFlaggedAppend flags near-dups against earlier batches only") {
    import spark.implicits._
    // batch 0: ten 30-token base docs; batch 1: near-copies (one token
    // changed, jaccard ~0.8) of five bases + a second near-copy of base
    // 0 + five unique docs; batch 2: a verbatim copy of base 0. The
    // asymmetric contract: each doc is flagged against STRICTLY earlier
    // batches (105 matches 0, not its same-batch sibling 100).
    def base(i: Int) = (0 until 30).map(j => s"w${i}_$j").mkString(" ")
    def mutated(i: Int, pos: Int, tag: String) = {
      val t = (0 until 30).map(j => s"w${i}_$j").toArray
      t(pos) = tag; t.mkString(" ")
    }
    def df(rows: Seq[(Long, String)]) = rows
      .map { case (id, t) => (id, t, "en", "s", 0L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val p0 = df((0 until 10).map(i => (i.toLong, base(i))))
    val p1 = df(
      (0 until 5).map(i => (100L + i, mutated(i, 15, s"z$i"))) ++
        Seq((105L, mutated(0, 5, "q105"))) ++
        (0 until 5).map(i => (110L + i, base(50 + i))))
    val p2 = df(Seq((200L, base(0))))
    val parts = Seq(p0, p1, p2)
    val bse = java.nio.file.Files.createTempDirectory("graft_neardup")
    val srcDir = stageArrival(bse, parts)
    val outPath = bse.resolve("flagged").toString
    val idxPath = bse.resolve("sig_index").toString
    val q = EventsStreaming.nearDupFlaggedAppend(
      docStream(srcDir), outPath, idxPath, threshold = 0.7)
    q.processAllAvailable(); q.stop()

    // reference: plain Scala replay — exact 3-shingle jaccard vs landed
    val expected = DupFlagKit.nearDupReference(parts, threshold = 0.7)
    val got = DupFlagKit.readNearDupFlags(spark, outPath)
    assert(got.size == expected.size)
    expected.foreach { case (id, (n, dupOf)) =>
      val (gn, gd, gv) = got(id)
      assert((gn, gd) == (n, dupOf), s"doc $id: got ($gn,$gd), want ($n,$dupOf)")
      assert(gv == (if (dupOf.isDefined) "near_dup" else "keep"))
    }
    // sanity on the crafted corpus: the verbatim copy matched base 0 AND
    // both its near-copies; the same-batch sibling pair was NOT compared
    assert(got(200L)._1 == 3 && got(200L)._2.contains(0L))
    assert(got(105L)._1 == 1 && got(105L)._2.contains(0L),
      "105 must match base 0 only — not its same-batch sibling 100")
    assert((110 until 115).forall(i => got(i.toLong)._3 == "keep"))
    // the signature index is a per-doc set: bands rows per landed doc
    assert(spark.read.parquet(idxPath).count() == expected.size * 16L)
    // full re-delivery by a fresh query: zero new rows, index unchanged
    val q2 = EventsStreaming.nearDupFlaggedAppend(
      docStream(srcDir), outPath, idxPath, threshold = 0.7)
    q2.processAllAvailable(); q2.stop()
    assert(spark.read.parquet(outPath).count() == expected.size)
    assert(spark.read.parquet(idxPath).count() == expected.size * 16L,
      "re-delivery must not grow the signature index")
  }

  test("a batch arriving after a crashed compaction swap restores the stranded table") {
    // compaction crashed between the two renames: live dir gone, all
    // history in .__compact_old. The sink must run the recovery rule
    // BEFORE its existence probe — otherwise it recreates the table
    // from one batch and the stranded history is silently dropped
    // (missed flags forever)
    val parts = fixtureParts()
    val base = java.nio.file.Files.createTempDirectory("graft_stranded")
    val srcDir = stageArrival(base, parts.take(1))
    val outPath = base.resolve("flagged").toString
    val idxPath = base.resolve("gram_index").toString
    val q1 = EventsStreaming.dupFlaggedAppend(docStream(srcDir), outPath, idxPath, n = 8)
    q1.processAllAvailable(); q1.stop()
    // strand BOTH tables the way a torn swap does
    assert(new java.io.File(outPath).renameTo(new java.io.File(outPath + ".__compact_old")))
    assert(new java.io.File(idxPath).renameTo(new java.io.File(idxPath + ".__compact_old")))
    stageArrival(base, parts.drop(1), startK = 1)
    val q2 = EventsStreaming.dupFlaggedAppend(docStream(srcDir), outPath, idxPath, n = 8)
    q2.processAllAvailable(); q2.stop()
    val (expected, landed) = dupFlagReference(parts)
    assertFlagsMatch(outPath, expected)
    assert(spark.read.parquet(idxPath).count() == landed.size,
      "the stranded gram history must be recovered, not rebuilt from one batch")
  }

  test("a LOST gram bloom is rebuilt from the index, not from one batch") {
    // crash window in the sidecar swap (delete landed, rename didn't):
    // the bloom vanishes while the index holds history. A batch-only
    // rebuild would mark landed grams "definitely new" forever after —
    // missed flags. The rebuild must come from the full index.
    val parts = fixtureParts()
    val base = java.nio.file.Files.createTempDirectory("graft_bloom_lost")
    val chk = base.resolve("chk").toString
    val srcDir = stageArrival(base, parts.take(1))
    val outPath = base.resolve("flagged").toString
    val idxPath = base.resolve("gram_index").toString
    def start() = EventsStreaming.dupFlaggedAppend(
      docStream(srcDir), outPath, idxPath, n = 8, checkpoint = Some(chk))
    val q1 = start(); q1.processAllAvailable(); q1.stop()
    // the sidecar is lost; landed history stays
    assert(new java.io.File(idxPath, "_graft_gram_bloom").delete())
    // batch 1 arrives (rebuild happens here), then batch 2 echoes batch 0
    stageArrival(base, parts.drop(1), startK = 1)
    val q2 = start(); q2.processAllAvailable(); q2.stop()
    val (expected, landed) = dupFlagReference(parts)
    assertFlagsMatch(outPath, expected) // undercounts if bloom ⊉ index
    assert(spark.read.parquet(idxPath).count() == landed.size,
      "a bloom ⊉ index would also re-append landed grams")
  }

  test("intra-batch duplicate doc_ids land once with single-counted flags") {
    import spark.implicits._
    def df(rows: Seq[(Long, String)]) = rows
      .map { case (id, t) => (id, t, "en", "s", 0L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val t5 = (0 until 30).map(j => s"d5_$j").mkString(" ")
    // doc 5 delivered TWICE inside batch 0 (at-least-once source)
    val p0 = df(Seq((5L, t5), (5L, t5), (6L, (0 until 30).map(j => s"d6_$j").mkString(" "))))
    val p1 = df(Seq((100L, t5))) // near-copy arriving later
    val base = java.nio.file.Files.createTempDirectory("graft_intradup")
    val srcDir = stageArrival(base, Seq(p0, p1))
    val outPath = base.resolve("flagged").toString
    val idxPath = base.resolve("sig_index").toString
    val q = EventsStreaming.nearDupFlaggedAppend(
      docStream(srcDir), outPath, idxPath, threshold = 0.7)
    q.processAllAvailable(); q.stop()
    val out = spark.read.parquet(outPath)
    assert(out.filter(col("doc_id") === 5).count() == 1,
      "the intra-batch duplicate must land once")
    val got = DupFlagKit.readNearDupFlags(spark, outPath)
    assert(got(100L) == (1L, Some(5L), "near_dup"),
      "a doubled landed row would report n_near_dups=2")
  }

  test("nearDupDedupedAppend lands only canonicals; echoes match the kept doc, not a dropped one") {
    import DupFlagKit.{docsDf, tokenText}
    // A is the canonical; X is a near-copy of A (dropped); Y is a
    // near-copy of X but NOT of A — the one-hop contract keeps Y
    // because X never landed; copyA echoes A verbatim in a later batch
    // and must still match the kept canonical (dropped docs are never
    // indexed, so the canonical is the only possible match)
    val aText = tokenText("w", 0)
    def mutate(t: String, from: Int, until: Int, tag: String) = {
      val w = t.split(" ").zipWithIndex
        .map { case (tok, i) => if (i >= from && i < until) s"$tag$i" else tok }
      w.mkString(" ")
    }
    val xText = mutate(aText, 26, 30, "x") // jac(A,X) = 24/32 = 0.75 ≥ 0.7
    val yText = mutate(xText, 0, 4, "y")   // jac(X,Y) = 0.75; jac(A,Y) = 20/36 < 0.7
    val p0 = docsDf(spark,
      (0L, aText) +: (1 until 10).map(i => (i.toLong, tokenText("w", i))))
    val p1 = docsDf(spark, Seq((100L, xText)))
    val p2 = docsDf(spark, Seq((200L, yText), (201L, aText)))
    val base = java.nio.file.Files.createTempDirectory("graft_neardup_drop")
    val srcDir = stageArrival(base, Seq(p0, p1, p2))
    val outPath = base.resolve("deduped").toString
    val idxPath = base.resolve("sig_index").toString
    val q = EventsStreaming.nearDupDedupedAppend(
      docStream(srcDir), outPath, idxPath, threshold = 0.7)
    q.processAllAvailable(); q.stop()
    val expectedKept = DupFlagKit.nearDupDedupReference(Seq(p0, p1, p2))
    assert(expectedKept == (0L until 10L).toSet + 200L,
      s"fixture sanity: X and copyA drop, Y survives one-hop; got $expectedKept")
    val landed = spark.read.parquet(outPath)
    assert(landed.select("doc_id").collect().map(_.getLong(0)).toSet == expectedKept)
    assert(landed.filter(col("verdict") =!= "keep").count() == 0,
      "everything landed is a canonical keep")
    // dropped docs are never indexed — the index covers exactly the corpus
    val indexed = spark.read.parquet(idxPath)
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(indexed == expectedKept,
      s"index must cover kept docs only, got ${indexed -- expectedKept}")
    // replay idempotence: a fresh query re-delivers everything; dropped
    // docs are re-scored and re-dropped, kept docs are landed-deduped
    val q2 = EventsStreaming.nearDupDedupedAppend(
      docStream(srcDir), outPath, idxPath, threshold = 0.7)
    q2.processAllAvailable(); q2.stop()
    assert(spark.read.parquet(outPath).count() == expectedKept.size)
  }

  test("nearDup sig bloom skips the index scan for fully-novel batches") {
    import spark.implicits._
    // batch 0 seeds the signature index + (band,bucket) bloom; batch 1
    // is entirely novel — every band row must prove collision-free in
    // the bloom and the index scan must be skipped outright (counter),
    // with every doc landing as keep
    def df(rows: Seq[(Long, String)]) = rows
      .map { case (id, t) => (id, t, "en", "s", 0L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val p0 = df((0 until 20).map(i =>
      (i.toLong, (0 until 30).map(j => s"a${i}_$j").mkString(" "))))
    val p1 = df((100 until 140).map(i =>
      (i.toLong, (0 until 30).map(j => s"n${i}_$j").mkString(" "))))
    val base = java.nio.file.Files.createTempDirectory("graft_neardup_bloom")
    val srcDir = stageArrival(base, Seq(p0, p1))
    val outPath = base.resolve("flagged").toString
    val idxPath = base.resolve("sig_index").toString
    val skipped0 = EventsStreaming.sigIndexScansSkipped.get()
    val q = EventsStreaming.nearDupFlaggedAppend(
      docStream(srcDir), outPath, idxPath, threshold = 0.7)
    q.processAllAvailable(); q.stop()
    assert(EventsStreaming.sigIndexScansSkipped.get() == skipped0 + 1,
      "the fully-novel batch must skip the signature-index scan")
    val got = spark.read.parquet(outPath)
      .select("doc_id", "verdict").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(got.size == 60 && got.values.forall(_ == "keep"))
    // the index still indexed BOTH batches (the skip is probe-only)
    assert(spark.read.parquet(idxPath).select("doc_id").distinct().count() == 60)
  }

  test("hwm sidecar write failure is surfaced, data stays correct") {
    // a persistently unwritable hwm sidecar demotes every future batch to
    // the anti-join safety net — safe, but it must be OBSERVABLE: the
    // failure counter fires (and a once-per-sink warning logs) while the
    // data path stays exact
    val base = java.nio.file.Files.createTempDirectory("graft_hwm_fail").toString
    val factPath = s"$base/events"
    val q1 = EventsStreaming.appendWithDedup(
      EventsStreaming.readEvents(spark, sf), factPath)
    q1.processAllAvailable(); q1.stop()
    val n1 = spark.read.parquet(factPath).count()
    assert(n1 > 0)
    // poison the sidecar: its temp path becomes a NON-EMPTY DIRECTORY,
    // which fs.create(overwrite = true) cannot replace
    new java.io.File(factPath, "_graft_hwm").delete()
    val poison = new java.io.File(factPath, "._graft_hwm.tmp")
    assert(poison.mkdirs())
    assert(new java.io.File(poison, "block").createNewFile())
    val fails0 = EventsStreaming.hwmWriteFailures.get()
    val q2 = EventsStreaming.appendWithDedup(
      EventsStreaming.readEvents(spark, sf), factPath)
    q2.processAllAvailable(); q2.stop()
    assert(spark.read.parquet(factPath).count() == n1,
      "the degraded sink must still dedup exactly via the safety net")
    assert(EventsStreaming.hwmWriteFailures.get() > fails0,
      "an unwritable hwm sidecar must be counted, not swallowed")
  }

  test("appendWithDedup drops duplicate keys arriving within one micro-batch") {
    import spark.implicits._
    val srcDir = java.nio.file.Files.createTempDirectory("graft_dupsrc")
    val dup = Seq(
      (1L, "2024-01-01 00:00:00", 10L, "click", 1.0, "{}"),
      (1L, "2024-01-01 00:00:00", 10L, "click", 1.0, "{}"), // same key, same batch
      (2L, "2024-01-02 00:00:00", 11L, "view", 2.0, "{}")
    ).toDF("event_id", "ts_s", "user_id", "event_type", "value", "props")
      .select(col("event_id"), unix_timestamp(col("ts_s")).cast("long").as("secs"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .select(col("event_id"), (col("secs") * 1000000000L).as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
    dup.write.mode("overwrite").parquet(srcDir.toString + "/in")
    val factPath = java.nio.file.Files.createTempDirectory("graft_fact_dup").toString + "/events"
    val q = EventsStreaming.appendWithDedup(
      EventsStreaming.readEventsDir(spark, srcDir.toString + "/in"), factPath)
    q.processAllAvailable(); q.stop()
    val landed = spark.read.parquet(factPath)
    assert(landed.count() == 2, "intra-batch duplicate must land once")
    assert(landed.select("event_id").distinct().count() == 2)
  }

  test("sessionize groups events into gap-separated sessions (batch-driven)") {
    import spark.implicits._
    val rows = Seq(
      (1L, "2024-01-01 00:00:00", 1.0),
      (1L, "2024-01-01 00:10:00", 2.0), // same session (gap 10m < 30m)
      (1L, "2024-01-01 02:00:00", 3.0), // new session
      (2L, "2024-01-01 01:00:00", 4.0)
    ).toDF("user_id", "ts_s", "value")
      .select(col("user_id"), col("ts_s").cast("timestamp").as("ts"), col("value"))
      .as[EventsStreaming.SessionIn]
    // batch Dataset drive: flatMapGroupsWithState works on batch Datasets too
    // (state starts empty, no timeouts fire) — closed sessions are emitted,
    // the last open session per key stays in (discarded) state, so assert on
    // the closed ones.
    val out = EventsStreaming.sessionize(rows, gapMinutes = 30).collect()
    val u1Closed = out.filter(_.user_id == 1L)
    assert(u1Closed.length == 1)
    assert(u1Closed.head.n_events == 2 && u1Closed.head.total_value == 3.0)
  }

  test("checkpointed restart is exactly-once: dedup state and source log survive a stop/resume") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_restart")
    val src = base.resolve("src").toString
    val sink = base.resolve("sink").toString
    val chk = base.resolve("chk").toString
    def writeBatch(ids: Range): Unit =
      ids.map(i => (i.toLong, f"2024-01-01 00:${i % 50}%02d:00", i.toDouble))
        .toDF("event_id", "ts_s", "value")
        .select(col("event_id"), col("ts_s").cast("timestamp").as("ts"), col("value"))
        .coalesce(1).write.mode("append").parquet(src)
    def runOnce(): Unit = {
      // fresh query object each time — only the CHECKPOINT carries
      // continuity (processed-files log + dropDuplicates state store)
      val q = spark.readStream
        .schema("event_id LONG, ts TIMESTAMP, value DOUBLE")
        .parquet(src)
        .withWatermark("ts", "1 hour")
        .dropDuplicates("event_id")
        .writeStream.outputMode("append").format("parquet")
        .option("path", sink).option("checkpointLocation", chk)
        .start()
      q.processAllAvailable(); q.stop()
    }
    writeBatch(1 to 50)
    runOnce() // run 1: ids 1..50 land, then the query is killed
    assert(spark.read.parquet(sink).count() == 50)

    writeBatch(40 to 60) // 11 ids repeat ACROSS the restart boundary
    runOnce() // run 2: resumed state must drop 40..50, keep 51..60
    val after = spark.read.parquet(sink)
    assert(after.count() == 60, "restart must neither re-emit nor lose rows")
    assert(after.select("event_id").distinct().count() == 60)
    assert(after.agg(min(col("event_id")), max(col("event_id")))
      .head.toSeq == Seq(1L, 60L))

    runOnce() // run 3: nothing new → no output, no reprocessing
    assert(spark.read.parquet(sink).count() == 60)
    // the continuity really came from the checkpoint: offsets + state exist
    val chkDir = new java.io.File(chk)
    assert(new java.io.File(chkDir, "offsets").listFiles().length >= 2,
      "multiple committed micro-batches expected in the checkpoint")
    assert(new java.io.File(chkDir, "state").exists(),
      "dropDuplicates state store should be checkpointed")
  }

  test("RocksDB state store provider (the disk-backed 100TB state path) matches batch results") {
    // default HDFSBackedStateStore keeps state on the heap; RocksDB is
    // the provider whose state spills to local disk — the configuration a
    // large-state production stream runs with. Same query, same answers.
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val got = EventsStreaming.runToCompletion(
          EventsStreaming.windowedCounts(EventsStreaming.readEvents(spark, sf)),
          "rocksdb_counts", mode = "complete")
        .select(col("window_start").cast("string"), col("event_type"), col("n"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      val batch = Tables.events(spark, sf)
        .groupBy(window(col("ts"), "6 hours"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start").cast("string"), col("event_type"), col("n"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      assert(got == batch)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }
}
