package graft.sources

import java.net.URI
import java.nio.file.Files
import java.nio.file.attribute.PosixFilePermission
import java.nio.file.attribute.PosixFilePermission._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{ChecksumFs, DelegateToFileSystem, LocalFileSystem, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission

/** Local-filesystem Hadoop adapters whose `chmod` is an in-process
  * java.nio call instead of Hadoop's fork/exec of `/bin/chmod`.
  *
  * Why this exists (optimization guide §1/§7.3, measured in round 19):
  * without the Hadoop native library (`libhadoop.so` — absent from
  * plain Spark distributions and sbt classpaths), EVERY local file
  * create and mkdir that goes through `RawLocalFileSystem` falls back
  * to `Shell.execCommand("chmod", ...)` — a full process fork+exec,
  * measured at 4–10 ms per file on the bench host. That tax lands on
  * every parquet part file (plus its .crc twin), every streaming
  * checkpoint/offset/commit file, and every state-store delta file;
  * worse, state-store provider initialization performs these forks
  * UNDER the global `StateStore.loadedProviders` lock, so a 32-core
  * stream-stream join serializes 128 store inits behind one chmod at
  * a time (thread dumps showed 31/32 task threads BLOCKED there; a
  * 2-batch join over 100k events cost ~8 s of pure store overhead).
  *
  * The fix is what every production Hadoop deployment gets from the
  * native library: chmod without forking. Semantics are identical —
  * the same permission bits are applied to the same files; only the
  * mechanism changes (`Files.setPosixFilePermissions`). Setuid/setgid/
  * sticky bits (unrepresentable in java.nio) fall back to the shell
  * path, preserving exact behavior for the rare caller that asks.
  *
  * Wiring (see Tuning.fastLocalFs):
  *  - `fs.file.impl` → [[NioLocalFileSystem]] (the FileSystem API —
  *    parquet writers, committers, LogFs);
  *  - `fs.AbstractFileSystem.file.impl` → [[NioLocalFs]] (the
  *    FileContext API — Spark's streaming CheckpointFileManager).
  * Both mirror Hadoop's own LocalFileSystem / LocalFs exactly
  * (checksum wrapper over the raw FS), swapping only the raw layer.
  */
class NioRawLocalFileSystem extends RawLocalFileSystem {
  override def setPermission(p: Path, permission: FsPermission): Unit = {
    if (permission == null) return
    val bits = permission.toShort & 0xfff
    if ((bits & 0xe00) != 0) super.setPermission(p, permission) // suid/sticky
    else {
      val set = new java.util.HashSet[PosixFilePermission]()
      def add(bit: Int, perm: PosixFilePermission): Unit =
        if ((bits & bit) != 0) { set.add(perm); () }
      add(0x100, OWNER_READ); add(0x80, OWNER_WRITE); add(0x40, OWNER_EXECUTE)
      add(0x20, GROUP_READ); add(0x10, GROUP_WRITE); add(0x8, GROUP_EXECUTE)
      add(0x4, OTHERS_READ); add(0x2, OTHERS_WRITE); add(0x1, OTHERS_EXECUTE)
      try Files.setPosixFilePermissions(pathToFile(p).toPath, set): Unit
      catch {
        // non-POSIX store: behave exactly as before this class existed
        case _: UnsupportedOperationException => super.setPermission(p, permission)
      }
    }
  }
}

/** `LocalFileSystem` (checksum layer included) over the fork-free raw
  * FS — the drop-in for `fs.file.impl`. No-arg constructor required by
  * Hadoop's reflective FileSystem loading.
  */
class NioLocalFileSystem extends LocalFileSystem(new NioRawLocalFileSystem)

/** FileContext twin of Hadoop's `RawLocalFs` over the fork-free raw
  * FS. Constructor shape `(URI, Configuration)` is the reflective
  * contract of `AbstractFileSystem.createFileSystem`.
  */
class NioRawLocalFs(theUri: URI, conf: Configuration)
    extends DelegateToFileSystem(theUri, new NioRawLocalFileSystem, conf,
      "file", false)

/** FileContext twin of Hadoop's `LocalFs` (ChecksumFs over RawLocalFs)
  * — the drop-in for `fs.AbstractFileSystem.file.impl`.
  */
class NioLocalFs(theUri: URI, conf: Configuration)
    extends ChecksumFs(new NioRawLocalFs(theUri, conf))
