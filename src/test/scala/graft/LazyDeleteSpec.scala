package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.warehouse.{Maintenance, Snapshots}

/** Merge-on-read lazy deletes (key tombstones) — Snapshots.commitDeleteLazy:
  * O(keys) logical erasure, read-side anti-join, OPTIMIZE as the
  * materialization point, and the change-feed / replica / catalog
  * interactions.
  */
class LazyDeleteSpec extends AnyFunSuite {
  import SparkTest._
  import spark.implicits._

  private def fresh(rows: Seq[(Long, String)]): String = {
    val t = Files.createTempDirectory("graft_lazy").toString + "/t"
    Snapshots.commitAppend(spark, rows.toDF("id", "v"), t)
    t
  }
  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("id").collect().map(_.getLong(0)).toSet

  test("lazy delete commits in O(keys): zero data files churn, reads filter, time travel keeps") {
    val t = fresh((1L to 10L).map(i => (i, s"v$i")))
    val filesBefore = Snapshots.filesAt(spark, t, 1L)
    val (v, n) = Snapshots.commitDeleteLazy(spark, t, Seq(3L, 7L, 3L), "id")
    assert(v == 2L && n == 2)
    // the data-file list is BYTE-IDENTICAL — no rewrite happened
    assert(Snapshots.filesAt(spark, t, 2L) == filesBefore)
    assert(ids(Snapshots.read(spark, t)) == (1L to 10L).toSet -- Set(3L, 7L))
    // pruned reads apply the same merge-on-read filter
    Snapshots.extendStats(spark, t, Seq("id"))
    assert(ids(Snapshots.readPruned(spark, t, Seq(("id", 1.0, 10.0)))) ==
      (1L to 10L).toSet -- Set(3L, 7L))
    // time travel to the pre-delete version still sees everything
    assert(ids(Snapshots.read(spark, t, Some(1L))) == (1L to 10L).toSet)
  }

  test("OPTIMIZE materializes: tombstones cleared, rows physically gone, sidecar vacuumed") {
    val t = fresh((1L to 10L).map(i => (i, s"v$i")))
    Snapshots.commitDeleteLazy(spark, t, Seq(2L, 4L), "id")
    assert(Snapshots.pendingTombstones(spark, t)._2.nonEmpty)
    // tombstones compact even under the minFiles floor
    val v = Snapshots.compactData(spark, t, targetFiles = 2, minFiles = 16)
    assert(v.contains(3L))
    assert(Snapshots.pendingTombstones(spark, t)._2.isEmpty)
    // physically gone: the RAW head files no longer hold the rows
    val raw = spark.read.parquet(Snapshots.filesAt(spark, t, 3L)
      .map(n => s"$t/data/$n"): _*)
    assert(ids(raw) == (1L to 10L).toSet -- Set(2L, 4L))
    // vacuum reclaims the now-unreferenced tombstone sidecar
    val deleted = Snapshots.vacuum(spark, t, keepVersions = 1)
    assert(deleted.nonEmpty)
    val td = new java.io.File(s"$t/_tombstones")
    assert(!td.exists() || td.listFiles().forall(!_.getName.endsWith(".parquet")))
    assert(ids(Snapshots.read(spark, t)) == (1L to 10L).toSet -- Set(2L, 4L))
  }

  test("change feed: a lazy-delete window emits delete pre-images; materialization nets empty") {
    val t = fresh((1L to 6L).map(i => (i, s"v$i")))
    Snapshots.commitDeleteLazy(spark, t, Seq(5L), "id") // v2
    // append-only transport must refuse the tombstone window
    intercept[IllegalArgumentException] {
      Snapshots.incrementalRead(spark, t, 1L, 2L)
    }
    val feed12 = Snapshots.rowDiff(spark, t, 1L, 2L, Seq("id")).collect()
    assert(feed12.map(r => (r.getAs[Long]("id"),
      r.getAs[String]("change_type"))).toSet == Set((5L, "delete")))
    Snapshots.compactData(spark, t, targetFiles = 1, minFiles = 16) // v3
    assert(Snapshots.rowDiff(spark, t, 2L, 3L, Seq("id")).count() == 0,
      "materializing already-reported deletes must not re-report them")
    // and the full window reports the delete exactly once
    assert(Snapshots.rowDiff(spark, t, 1L, 3L, Seq("id")).count() == 1)
  }

  test("lazy-delete feed over a stats-manifested table opens few carried files") {
    // 32 single-file key slabs (the layout a maintained, clustered table
    // has) + a stats manifest on the key column
    val t = Files.createTempDirectory("graft_lazy").toString + "/t"
    (0 until 32).foreach { i =>
      Snapshots.commitAppend(spark,
        (0 until 10).map(j => (i * 10L + j, s"v$i-$j")).toDF("id", "v")
          .coalesce(1), t)
    }
    Snapshots.extendStats(spark, t, Seq("id"))
    // delete keys living in exactly 2 slabs — zero files touched
    val (v, _) = Snapshots.commitDeleteLazy(spark, t, Seq(55L, 171L), "id")
    val feed = Snapshots.rowDiff(spark, t, v - 1, v, Seq("id")).collect()
    assert(feed.map(r => (r.getAs[Long]("id"),
      r.getAs[String]("change_type"))).toSet ==
      Set((55L, "delete"), (171L, "delete")))
    // the O(keys) commit's feed must not cost O(table): the carried set
    // pruned to the 2 files whose [min,max] can hold a deleted key
    val Some((cand, total)) = Snapshots.lastTombLegPruned
    assert(total >= 32 && cand == 2,
      s"feed leg opened $cand of $total carried files; want 2")
  }

  test("tombstoned keys refuse re-append; merge materializes and resurrects") {
    val t = fresh((1L to 5L).map(i => (i, s"v$i")))
    Snapshots.commitDeleteLazy(spark, t, Seq(2L), "id")
    val err = intercept[IllegalArgumentException] {
      Snapshots.commitAppend(spark, Seq((2L, "zombie")).toDF("id", "v"), t)
    }
    assert(err.getMessage.contains("tombstoned"))
    // fresh keys still append fine (tombstones carried forward)
    Snapshots.commitAppend(spark, Seq((9L, "v9")).toDF("id", "v"), t)
    assert(ids(Snapshots.read(spark, t)) == Set(1L, 3L, 4L, 5L, 9L))
    // merge is the resurrection path: full rewrite, tombstones cleared
    Snapshots.commitMerge(spark, Seq((2L, "reborn")).toDF("id", "v"), t,
      Seq("id"))
    assert(Snapshots.pendingTombstones(spark, t)._2.isEmpty)
    assert(Snapshots.read(spark, t).filter(col("id") === 2L)
      .head.getString(1) == "reborn")
  }

  test("catalog refuses pending tombstones; snapshot_at applies them; restore rewinds them") {
    val root = Files.createTempDirectory("graft_lazy_cat").toString
    val t = root + "/lt"
    Snapshots.commitAppend(spark, (1L to 4L).map(i => (i, s"v$i"))
      .toDF("id", "v"), t)
    Snapshots.commitDeleteLazy(spark, t, Seq(1L), "id")
    spark.conf.set("spark.sql.catalog.glazy",
      classOf[graft.sources.SnapshotCatalog].getName)
    spark.conf.set("spark.sql.catalog.glazy.root", root)
    val err = intercept[Exception] {
      spark.sql("SELECT * FROM glazy.lt").collect()
    }
    assert((err.getMessage + Option(err.getCause).map(_.getMessage)
      .getOrElse("")).contains("tombstone"))
    // the TVF read path applies the filter (it goes through Snapshots.read)
    assert(spark.sql(s"SELECT count(*) FROM snapshot_at('$t', 2)")
      .head.getLong(0) == 3L)
    // RESTORE to v1 resurrects (tombstones are data state)
    spark.sql(s"RESTORE '$t' TO VERSION AS OF 1")
    assert(ids(Snapshots.read(spark, t)) == (1L to 4L).toSet)
    // ...and the catalog serves it again (no pending tombstones at head)
    assert(spark.sql("SELECT count(*) FROM glazy.lt").head.getLong(0) == 4L)
  }

  test("replica sync crosses a lazy-delete window via the feed transport") {
    val root = Files.createTempDirectory("graft_lazy_rep").toString
    val (src, dst) = (root + "/src", root + "/dst")
    Snapshots.commitAppend(spark, (1L to 8L).map(i => (i, s"v$i"))
      .toDF("id", "v"), src)
    assert(Snapshots.syncReplica(spark, src, dst, Seq("id"))._3 == "append")
    Snapshots.commitDeleteLazy(spark, src, Seq(3L, 6L), "id")
    val (_, _, mode) = Snapshots.syncReplica(spark, src, dst, Seq("id"))
    assert(mode == "feed",
      "a tombstone-changing window must not ship as append-only")
    assert(ids(Snapshots.read(spark, dst)) ==
      ids(Snapshots.read(spark, src)))
  }

  test("frame-keyed lazy delete: string keys from a query, never on the driver") {
    val t = Files.createTempDirectory("graft_lazy").toString + "/t"
    Snapshots.commitAppend(spark,
      Seq((1L, "alice"), (2L, "bob"), (3L, "carol"), (4L, "bob"),
        (5L, "dave")).toDF("id", "user"), t)
    // tombstone the OUTPUT OF A QUERY — the erasure-job shape at 100 TB:
    // no driver-side key list, string-typed keys
    val doomed = Snapshots.read(spark, t)
      .filter(col("user").isin("bob", "dave")).select("user")
    val (v, n) = Snapshots.commitDeleteLazyKeys(spark, t, doomed)
    assert(v == 2L && n == 2, s"got ($v, $n)") // 2 DISTINCT keys
    // zero data files churned; reads anti-join the string tombstones
    assert(Snapshots.filesAt(spark, t, 1L) == Snapshots.filesAt(spark, t, 2L))
    assert(ids(Snapshots.read(spark, t)) == Set(1L, 3L))
    val (kc, tombs) = Snapshots.pendingTombstones(spark, t)
    assert(kc.contains("user") && tombs.nonEmpty)
    // materialization clears them like any other tombstone
    Snapshots.compactData(spark, t, targetFiles = 1, minFiles = 0)
    assert(Snapshots.pendingTombstones(spark, t)._2.isEmpty)
    assert(ids(Snapshots.read(spark, t)) == Set(1L, 3L))
  }

  test("NULL-key rows always survive the merge-on-read filter") {
    val t = Files.createTempDirectory("graft_lazy_null").toString + "/t"
    Snapshots.commitAppend(spark,
      Seq((Some(1L), "a"), (None, "nullkey"), (Some(2L), "b"))
        .toDF("id", "v"), t)
    Snapshots.commitDeleteLazy(spark, t, Seq(1L), "id")
    val rows = Snapshots.read(spark, t).select("v").collect()
      .map(_.getString(0)).toSet
    assert(rows == Set("nullkey", "b"))
  }

  test("maintenance policy: pending tombstones trigger the scheduled OPTIMIZE") {
    val t = fresh((1L to 6L).map(i => (i, s"v$i")))
    Snapshots.commitDeleteLazy(spark, t, Seq(6L), "id")
    val action = Maintenance.maintainIfNeeded(spark,
      Maintenance.MaintenanceTarget(t, Maintenance.TableKind.Snapshot,
        maxDataFiles = 1000, vacuumMinAgeMs = 0L))
    assert(action.exists(_.contains("optimized")),
      s"policy must materialize pending tombstones, got $action")
    assert(Snapshots.pendingTombstones(spark, t)._2.isEmpty)
    assert(ids(Snapshots.read(spark, t)) == (1L to 5L).toSet)
  }
}
