package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.warehouse.{ManifestFileIndex, Snapshots}

/** The manifest size ledger (`#fsz:` entries): commits record every data
  * file's byte length in the manifest itself, so reads build their
  * FileStatuses with ZERO driver-side `getFileStatus` probes — the
  * Iceberg manifest-entry idea, and the guide-§6 completion of the
  * manifest-backed file index (at 100 TB / millions of files each probe
  * is a metadata RPC; per-file probing was the next listing-shaped
  * bottleneck after directory listing itself).
  */
class ManifestSizeSpec extends AnyFunSuite {
  import SparkTest._
  import spark.implicits._

  def freshTable(): String =
    java.nio.file.Files.createTempDirectory("graft_msz").toString + "/t"

  private def fsLen(t: String, n: String): Long = {
    val p = new org.apache.hadoop.fs.Path(s"$t/data", n)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .getFileStatus(p).getLen
  }

  test("every committed file's length is recorded exactly in the ledger") {
    val t = freshTable()
    Snapshots.commitAppend(spark,
      spark.range(0, 1000).toDF("id").repartition(8), t)
    val files = Snapshots.filesAt(spark, t, 1L)
    val ledger = Snapshots.fileSizesAt(spark, t, 1L)
    assert(files.nonEmpty)
    files.foreach { n =>
      assert(ledger.get(n).contains(fsLen(t, n)),
        s"ledger disagrees with the filesystem for $n")
    }
  }

  test("a fresh process reads probe-free from the ledger alone") {
    val t = freshTable()
    Snapshots.commitAppend(spark,
      spark.range(0, 1000).toDF("id").repartition(8), t)
    Snapshots.commitAppend(spark,
      spark.range(1000, 1200).toDF("id").repartition(2), t)
    // simulate a fresh JVM: no staged sizes, no resolved manifests —
    // everything the read knows must come from the manifest bytes
    Snapshots.invalidateTable(t)
    ManifestFileIndex.clearSizes()
    val before = ManifestFileIndex.probeCount.get()
    assert(Snapshots.read(spark, t).count() == 1200L)
    assert(ManifestFileIndex.probeCount.get() == before,
      "a size-manifested read must issue zero getFileStatus probes")
  }

  test("delta manifests carry #fsz for adds only; resolution merges the chain") {
    val t = freshTable()
    Snapshots.commitAppend(spark,
      spark.range(0, 1000).toDF("id").repartition(8), t)
    Snapshots.commitAppend(spark,
      spark.range(1000, 1100).toDF("id").repartition(1), t)
    val raw = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(t, "_manifests", "v00000002.manifest")),
      "UTF-8").split("\n").toSeq
    assert(raw.exists(_.startsWith("#base:")), "v2 should be a delta")
    val fszLines = raw.count(_.startsWith("#fsz:"))
    val addLines = raw.count(_.startsWith("#add:"))
    assert(addLines == 1 && fszLines == 1,
      s"delta must ledger only its adds, got $fszLines #fsz / $addLines #add")
    // canonical resolution still serves the full 9-file ledger
    val ledger = Snapshots.fileSizesAt(spark, t, 2L)
    val files = Snapshots.filesAt(spark, t, 2L)
    assert(files.size == 9 && files.forall(ledger.contains))
  }

  test("rewrites (OPTIMIZE) re-ledger the new files; carried sizes survive restore") {
    val t = freshTable()
    Snapshots.commitAppend(spark,
      spark.range(0, 500).toDF("id").repartition(4), t)
    Snapshots.commitAppend(spark,
      spark.range(500, 1000).toDF("id").repartition(4), t)
    val v = Snapshots.compactData(spark, t, targetFiles = 2, minFiles = 2)
    assert(v.contains(3L))
    val files = Snapshots.filesAt(spark, t, 3L)
    val ledger = Snapshots.fileSizesAt(spark, t, 3L)
    assert(files.forall(n => ledger.get(n).contains(fsLen(t, n))))
    // restore to v1 re-references v1's files — ledger follows them
    Snapshots.commitRestore(spark, t, 1L)
    val l1 = Snapshots.fileSizesAt(spark, t, 4L)
    Snapshots.filesAt(spark, t, 4L).foreach(n =>
      assert(l1.get(n).contains(fsLen(t, n))))
  }
}
