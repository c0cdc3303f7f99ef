package graft.sources

import java.net.URI
import java.util.concurrent.atomic.AtomicInteger

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{DelegateToFileSystem, FilterFileSystem, Path, RawLocalFileSystem}

/** A minimal NON-checksummed, NON-local-typed filesystem over a local
  * directory, registered under the `rawtest:` scheme — the coverage
  * vehicle for [[VersionedStore]]'s DFS arms (r14 verdict item 2).
  *
  * Why it exists: the pointer flip's FileContext rename(OVERWRITE) arm
  * and the stamped claim's `create(overwrite = false)` arm never execute
  * on local test filesystems — `file://` matches the NIO arms by type
  * (LocalFileSystem/RawLocalFileSystem), and `enospc:` has no
  * AbstractFileSystem binding, so only the FileSystem FALLBACK arm runs
  * there. This FS is (a) NOT a Local/RawLocal subtype, so the type
  * dispatch in [[VersionedStore.exclusiveCreateStamped]] /
  * [[VersionedStore.renameNoReplace]] takes the DFS branch, and (b)
  * paired with [[RawTestAbstractFs]] under
  * `fs.AbstractFileSystem.rawtest.impl`, so
  * `FileContext.getFileContext` resolves and the pointer flip takes the
  * FileContext rename(OVERWRITE) arm.
  *
  * HDFS-shaped semantics where the arms depend on them: `rename` REFUSES
  * an occupied FILE destination (HDFS's behavior, which
  * [[VersionedStore.renameNoReplace]]'s DFS arm relies on for its
  * no-clobber contract) — the inner RawLocalFileSystem would silently
  * overwrite (POSIX rename(2)). `create(overwrite = false)` keeps the
  * inner exists-then-create, which throws FileAlreadyExistsException on
  * an occupied path: the DFS arm's expected signal.
  */
class RawTestFs extends FilterFileSystem {

  override def initialize(name: URI, conf: Configuration): Unit = {
    // inner RawLocal that ACCEPTS rawtest:// paths (checkPath compares a
    // path's scheme against the fs's own getUri)
    fs = new RawLocalFileSystem {
      override def getUri: URI = RawTestFs.Name
    }
    super.initialize(name, conf)
  }

  override def getUri: URI = RawTestFs.Name
  override def getScheme: String = "rawtest"

  override def open(f: Path, bufferSize: Int)
      : org.apache.hadoop.fs.FSDataInputStream = {
    if (RawTestFs.failOpen(f.toString))
      throw new java.io.IOException(
        "Input/output error on open (injected-rawtest-open)")
    super.open(f, bufferSize)
  }

  override def rename(src: Path, dst: Path): Boolean = {
    if (exists(dst) && getFileStatus(dst).isFile) false
    else {
      RawTestFs.fsRenames.incrementAndGet()
      super.rename(src, dst)
    }
  }

  override def create(f: Path,
      permission: org.apache.hadoop.fs.permission.FsPermission,
      overwrite: Boolean, bufferSize: Int, replication: Short,
      blockSize: Long, progress: org.apache.hadoop.util.Progressable)
      : org.apache.hadoop.fs.FSDataOutputStream = {
    val out = super.create(f, permission, overwrite, bufferSize,
      replication, blockSize, progress)
    if (RawTestFs.failStampWrite(f.toString))
      // the file IS created (the DFS-arm scenario: create succeeds,
      // the stamp bytes then fail) — the returned stream dies on write,
      // after letting `stampWritePartial` bytes through (0 = dies on
      // the first byte, leaving the marker EMPTY; >0 leaves a strict
      // non-empty prefix — the two distinct debris classes the arm's
      // failure cleanup classifies differently)
      new org.apache.hadoop.fs.FSDataOutputStream(
        new java.io.OutputStream {
          private var allowed = RawTestFs.stampWritePartial
          override def write(b: Int): Unit = {
            if (allowed <= 0) throw new java.io.IOException(
              "No space left on device (injected-rawtest)")
            allowed -= 1; out.write(b)
          }
          override def write(b: Array[Byte], off: Int, len: Int): Unit = {
            val n = math.min(len, allowed)
            if (n > 0) { out.write(b, off, n); allowed -= n; out.flush() }
            if (n < len) throw new java.io.IOException(
              "No space left on device (injected-rawtest)")
          }
          override def close(): Unit = out.close()
        }, null)
    else out
  }
}

object RawTestFs {
  val Name: URI = URI.create("rawtest:///")

  /** Renames executed through the FileSystem layer (the fallback arm's
    * route) — distinguishes it from the FileContext route below.
    */
  val fsRenames = new AtomicInteger(0)

  /** rename(OVERWRITE) calls observed at the FileContext /
    * AbstractFileSystem layer — proof the pointer flip took the DFS
    * FileContext arm, not the FileSystem fallback.
    */
  val fcRenames = new AtomicInteger(0)

  /** Write-fault knob for the DFS-arm stamp: paths matching the
    * predicate get a stream whose create SUCCEEDS but whose writes
    * fail — the half-stamped-marker scenario the arm's cleanup sweeps.
    */
  @volatile var failStampWrite: String => Boolean = _ => false

  /** Read-fault knob: paths matching the predicate fail to `open` with
    * a plain IOException — drives the DFS-arm failure cleanup's
    * classification read into its guarded propagate-with-suppressed
    * path (r15 ADVICE: the original create failure must ride along).
    */
  @volatile var failOpen: String => Boolean = _ => false

  /** How many stamp bytes a [[failStampWrite]]-matched stream lets
    * through before dying: 0 leaves the marker EMPTY (ambiguous — the
    * cleanup must leave it for the aged sweep), >0 leaves a strict
    * non-empty prefix (provably ours — the cleanup atomic-takes it).
    */
  @volatile var stampWritePartial: Int = 0
}

/** The `AbstractFileSystem` binding that makes `FileContext` resolve the
  * `rawtest:` scheme (instantiated reflectively by Hadoop from
  * `fs.AbstractFileSystem.rawtest.impl`).
  */
class RawTestAbstractFs(uri: URI, conf: Configuration)
  extends DelegateToFileSystem(uri, new RawTestFs(), conf, "rawtest", false) {

  override def renameInternal(src: Path, dst: Path,
      overwrite: Boolean): Unit = {
    RawTestFs.fcRenames.incrementAndGet()
    if (overwrite) {
      // emulate the SEMANTICS the pointer flip's FileContext arm is
      // written against — HDFS's rename(OVERWRITE) is one atomic op at
      // the namenode. AbstractFileSystem's DEFAULT here is
      // delete-then-rename, which is exactly the non-atomic behavior
      // real DFS bindings override away (and which loses a two-racer
      // flip: racer B's rename lands after racer A re-created the
      // destination and throws). One local rename(2) is the faithful
      // single-op stand-in.
      java.nio.file.Files.move(
        java.nio.file.Paths.get(src.toUri.getPath),
        java.nio.file.Paths.get(dst.toUri.getPath),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    } else super.renameInternal(src, dst, overwrite)
  }
}
