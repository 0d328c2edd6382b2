package graft.sources

import java.net.URI
import java.nio.file.attribute.PosixFilePermission
import java.nio.file.attribute.PosixFilePermission._
import java.nio.file.{Files, NoSuchFileException}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.fs.{DelegateToFileSystem, LocalFileSystem, Path, RawLocalFileSystem}

/** Fork-free permission handling for Hadoop's local filesystem.
  *
  * Without the hadoop native library (absent from plain Spark
  * distributions), `RawLocalFileSystem.setPermission` shells out to
  * `chmod` — once per created file and per mkdir-with-permission. A
  * bench/verify run writes tens of thousands of parquet parts and
  * streaming-checkpoint files, so the JVM forks `chmod` thousands of
  * times; on a memory-constrained or fork-limited host `posix_spawn`
  * can refuse mid-run ("Failed to exec spawn helper"), killing an
  * otherwise healthy query. These subclasses apply the same permission
  * bits through java.nio — zero subprocesses, identical semantics on a
  * POSIX filesystem.
  *
  * Wired in via standard Hadoop config (see [[NoForkFs.sparkConf]]):
  * `fs.file.impl` covers every FileSystem-API user (parquet writes,
  * committers, file sources) and `fs.AbstractFileSystem.file.impl`
  * covers FileContext users (Structured Streaming's checkpoint
  * manager and metadata logs).
  */
object NoForkFs {
  /** Spark-prefixed Hadoop conf entries enabling the fork-free local
    * filesystem for a SparkSession. NullGroupsMapping additionally
    * drops the `id`/`groups` subprocess Hadoop's default shell-based
    * group mapping forks on first UGI group lookup — group ACLs are
    * meaningless on a single-user local filesystem. */
  val sparkConf: Seq[(String, String)] = Seq(
    "spark.hadoop.fs.file.impl" -> classOf[NoForkLocalFileSystem].getName,
    "spark.hadoop.fs.AbstractFileSystem.file.impl" ->
      classOf[NoForkLocalFs].getName,
    "spark.hadoop.hadoop.security.group.mapping" ->
      "org.apache.hadoop.security.NullGroupsMapping",
  )

  /** FsPermission bits (rwxrwxrwx) → java.nio permission set. */
  private[sources] def posixPerms(bits: Short): java.util.Set[PosixFilePermission] = {
    val out = java.util.EnumSet.noneOf(classOf[PosixFilePermission])
    val map: Seq[(Int, PosixFilePermission)] = Seq(
      0x100 -> OWNER_READ, 0x80 -> OWNER_WRITE, 0x40 -> OWNER_EXECUTE,
      0x20 -> GROUP_READ, 0x10 -> GROUP_WRITE, 0x8 -> GROUP_EXECUTE,
      0x4 -> OTHERS_READ, 0x2 -> OTHERS_WRITE, 0x1 -> OTHERS_EXECUTE)
    map.foreach { case (m, p) => if ((bits & m) != 0) out.add(p) }
    out
  }
}

/** `RawLocalFileSystem` with process-free chmod/chown. */
class NoForkRawLocalFileSystem extends RawLocalFileSystem {
  override def setPermission(p: Path, permission: FsPermission): Unit = {
    val f = pathToFile(p).toPath
    try Files.setPosixFilePermissions(f,
      NoForkFs.posixPerms(permission.toShort))
    catch {
      // non-POSIX store (unlikely here) or a racing delete: permission
      // bits on a local scratch filesystem are advisory — never worth
      // failing the write that already succeeded
      case _: UnsupportedOperationException => ()
      case _: NoSuchFileException => ()
    }
  }

  // chown is exec-based too and cannot succeed for an unprivileged
  // single user anyway — a local test/bench filesystem has one owner
  override def setOwner(p: Path, username: String, groupname: String): Unit = ()
}

/** Drop-in `fs.file.impl`: checksummed local FS over the fork-free raw
  * layer — exactly Hadoop's default `LocalFileSystem` minus the
  * subprocesses. */
class NoForkLocalFileSystem
  extends LocalFileSystem(new NoForkRawLocalFileSystem)

/** Drop-in `fs.AbstractFileSystem.file.impl` for FileContext users
  * (streaming checkpoint managers). Skips the checksum layer like
  * Hadoop's own `RawLocalFs` — FileContext local usage in Spark is
  * checkpoint/metadata files whose integrity the formats themselves
  * version and CRC. */
class NoForkLocalFs(uri: URI, conf: Configuration)
  extends DelegateToFileSystem(
    uri, new NoForkRawLocalFileSystem, conf, "file", false)
