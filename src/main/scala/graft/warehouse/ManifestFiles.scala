package graft.warehouse

import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.execution.datasources.{FileIndex, PartitionDirectory}
import org.apache.spark.sql.types.StructType

/** FileIndex served straight from a snapshot manifest's file list — the
  * Delta/Iceberg altitude for reads (guide §6: manifest metadata avoids
  * directory listing altogether). `spark.read.parquet(paths: _*)` over a
  * manifest's N known files re-DISCOVERS them: above
  * `parallelPartitionDiscovery.threshold` (32) that is a whole Spark job
  * with one listing task per path (measured ~150-270 ms per read on a
  * 81-120 file fixture table, twice per read because pruning rebuilds
  * the index), plus a footer read for schema inference when no explicit
  * schema rides along. The manifest already knows every file, so this
  * index hands Spark the pre-fetched `FileStatus`es and the declared
  * schema: zero listing jobs, zero inference, identical scan semantics
  * (FileSourceScanExec with full pushdown/pruning over the same files).
  *
  * Statuses are fetched driver-side at construction — one
  * `getFileStatus` per file, threaded past 64 files. At 100 TB the next
  * step is manifests that RECORD file sizes (Iceberg manifest entries) so
  * even these probes vanish; the index's shape is unchanged by that.
  */
private[graft] class ManifestFileIndex(
    root: Path, statuses: Array[FileStatus]) extends FileIndex {
  override val rootPaths: Seq[Path] = Seq(root)
  private lazy val asDir = Seq(PartitionDirectory(InternalRow.empty, statuses))
  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = asDir
  override def inputFiles: Array[String] = statuses.map(_.getPath.toString)
  override def refresh(): Unit = ()
  override val sizeInBytes: Long = statuses.map(_.getLen).sum
  override def partitionSchema: StructType = StructType(Nil)
}

private[graft] object ManifestFileIndex {
  /** One `FileStatus` per manifest entry (entries resolve against `dd`
    * like the reader's two-arg Path does, so qualified foreign URIs from
    * shallow clones work unchanged). Threaded past 64 files — each probe
    * is a metadata round-trip, independent by construction.
    */
  def statusesOf(f: FileSystem, dd: Path, names: Seq[String]): Array[FileStatus] = {
    val paths = names.map(n => new Path(dd, n))
    if (paths.size <= 64) paths.map(f.getFileStatus).toArray
    else {
      val out = new Array[FileStatus](paths.size)
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.min(16, Runtime.getRuntime.availableProcessors()))
      try {
        val futures = paths.zipWithIndex.map { case (p, i) =>
          pool.submit(new Runnable {
            def run(): Unit = out(i) = f.getFileStatus(p)
          })
        }
        futures.foreach(_.get())
      } finally pool.shutdown()
      out
    }
  }
}
