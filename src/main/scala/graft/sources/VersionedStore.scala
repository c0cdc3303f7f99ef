package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned parquet store: atomic publish, time-travel reads, metadata
  * rollback, and bounded expiry — the snapshot seam the incremental layer
  * publishes through ([[graft.streaming.ChangeStream.snapshot]] folds
  * artifact + base into a frame; this is where that frame LANDS so
  * downstream readers flip atomically from v(n) to v(n+1)).
  *
  * Layout (all under one root):
  * {{{
  *   root/v00001/part-*.parquet  + _SUCCESS   (Spark's committer)
  *   root/v00002/...
  *   root/LATEST                              ("v00002" — the pointer)
  * }}}
  *
  * Correctness model, chosen for the 100 TB deployment:
  *   - data immutability: a published version directory is never mutated —
  *     readers can pin a version for the lifetime of a job (every Spark
  *     scan of it is stable across retries and speculative tasks);
  *   - atomic flip: writers stage the full version directory first (via
  *     Spark's own committer, so a failed write leaves only an
  *     unreferenced directory with no `_SUCCESS`, never a
  *     readable-looking partial), then move the ONE-LINE pointer file.
  *     The pointer is the only mutable object in the store; it is
  *     replaced by write-temp-then-rename, the same single-object flip
  *     every table-format pointer (Iceberg's version-hint, Delta's
  *     `_last_checkpoint`) relies on where atomic rename exists, and a
  *     single-object PUT on object stores;
  *   - rollback is a pointer move (no data copied, no data deleted);
  *   - expiry only ever deletes versions strictly OLDER than the pointer
  *     minus the keep horizon, so pinned readers on recent versions and
  *     the rollback window stay intact.
  */
object VersionedStore {

  private val Pointer = "LATEST"

  private def fs(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def vdir(n: Int): String = f"v$n%05d"

  // accepts 'v' + any digit run (the %05d format grows past 5 digits at
  // version 100000 — a fixed-width parse would brick the store there)
  private def parse(name: String): Option[Int] =
    if (name.length >= 2 && name.length <= 11 && name.charAt(0) == 'v' &&
      name.drop(1).forall(_.isDigit)) {
      val v = name.drop(1).toLong
      if (v <= Int.MaxValue) Some(v.toInt) else None
    } else None

  /** Published versions present on disk (with `_SUCCESS`), ascending. */
  def versions(spark: SparkSession, root: String): Seq[Int] = {
    val rp = new Path(root)
    val f = fs(spark, rp)
    if (!f.exists(rp)) Seq.empty
    else
      f.listStatus(rp).toSeq
        .filter(_.isDirectory)
        .flatMap(s => parse(s.getPath.getName))
        .filter(n => f.exists(new Path(rp, s"${vdir(n)}/_SUCCESS")))
        .sorted
  }

  /** The pointer's current version, if any. */
  def latestVersion(spark: SparkSession, root: String): Option[Int] = {
    val p = new Path(root, Pointer)
    val f = fs(spark, p)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      try {
        val buf = new Array[Byte](64)
        val n = in.read(buf)
        parse(new String(buf, 0, math.max(n, 0), "UTF-8").trim)
      } finally in.close()
    }
  }

  private def writePointer(spark: SparkSession, root: String, n: Int): Unit = {
    val rp = new Path(root)
    val f = fs(spark, rp)
    val tmp = new Path(rp, s".$Pointer.tmp")
    val out = f.create(tmp, true)
    try out.write(vdir(n).getBytes("UTF-8")) finally out.close()
    val dst = new Path(rp, Pointer)
    // OVERWRITE rename — one atomic flip where the FS provides it (HDFS,
    // POSIX). delete-then-rename would open a window with NO pointer at
    // all: a reader in that window sees "no published version" and a
    // writer crash inside it strands the store pointer-less.
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      f.getUri, spark.sparkContext.hadoopConfiguration)
    try fc.rename(f.makeQualified(tmp), f.makeQualified(dst),
      org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    catch {
      case e: java.io.IOException =>
        throw new IllegalStateException(
          s"pointer flip failed for $root -> ${vdir(n)}", e)
    }
  }

  /** Publish `df` as the next version and flip the pointer to it. The
    * data write happens entirely BEFORE the flip: a crash mid-write
    * leaves an unreferenced `_SUCCESS`-less directory (ignored by
    * [[versions]] and swept by [[expire]]), and readers still see the
    * previous version. Returns the new version number.
    */
  def publish(df: DataFrame, root: String): Int = {
    val spark = df.sparkSession
    // next slot clears DEBRIS too (a failed write's _SUCCESS-less dir must
    // not block the next publish — it stays unreferenced until expire())
    val rp = new Path(root)
    val f = fs(spark, rp)
    val occupied =
      if (!f.exists(rp)) Seq.empty
      else f.listStatus(rp).toSeq.filter(_.isDirectory)
        .flatMap(s => parse(s.getPath.getName))
    val next = (0 +: occupied).max + 1
    df.write.mode("errorifexists").parquet(s"$root/${vdir(next)}")
    writePointer(spark, root, next)
    next
  }

  /** Read a version: the pointer's by default, or a pinned `version` for
    * time-travel. Reading never consults mutable state beyond the one
    * pointer read at open — the returned frame is stable however many
    * publishes happen while it runs.
    */
  def read(spark: SparkSession, root: String, version: Option[Int] = None): DataFrame = {
    val n = version.orElse(latestVersion(spark, root)).getOrElse(
      throw new IllegalArgumentException(s"no published version at $root"))
    val avail = versions(spark, root)
    require(avail.contains(n),
      s"version ${vdir(n)} not published at $root (have: ${avail.map(vdir).mkString(", ")})")
    spark.read.parquet(s"$root/${vdir(n)}")
  }

  /** Roll the pointer back (or forward) to an existing version — a pure
    * metadata move; no data is copied or deleted.
    */
  def rollback(spark: SparkSession, root: String, version: Int): Unit = {
    require(versions(spark, root).contains(version),
      s"cannot roll back to unpublished ${vdir(version)}")
    writePointer(spark, root, version)
  }

  /** Default age a `_SUCCESS`-less directory must reach before [[expire]]
    * treats it as debris rather than an in-flight publish: 1 hour.
    */
  val DefaultDebrisGraceMs: Long = 3600000L

  /** Delete versions older than the newest `keepLast` (and `_SUCCESS`-less
    * debris directories older than `debrisGraceMs`), but never the
    * pointer's current target. Returns the versions removed.
    *
    * Race safety: the published set and the debris set derive from ONE
    * directory listing (two listings could classify a version published
    * between them as debris), and a `_SUCCESS`-less directory younger
    * than the grace window is presumed an IN-FLIGHT publish and left
    * alone — a publish slower than the grace is still safe as long as
    * expire is not scheduled concurrently with it; raise the grace if
    * maintenance must overlap multi-hour writes.
    */
  def expire(spark: SparkSession, root: String, keepLast: Int,
      debrisGraceMs: Long = DefaultDebrisGraceMs): Seq[Int] = {
    require(keepLast >= 1, s"keepLast must be >= 1 (got $keepLast)")
    val rp = new Path(root)
    val f = fs(spark, rp)
    if (!f.exists(rp)) return Seq.empty
    val byVersion = f.listStatus(rp).toSeq.filter(_.isDirectory)
      .flatMap(s => parse(s.getPath.getName).map(_ -> s))
    val published = byVersion.map(_._1)
      .filter(n => f.exists(new Path(rp, s"${vdir(n)}/_SUCCESS"))).sorted
    val current = latestVersion(spark, root)
    val keep = published.takeRight(keepLast).toSet ++ current
    val drop = published.filterNot(keep.contains)
    val now = System.currentTimeMillis()
    val debris = byVersion.collect {
      case (n, s) if !published.contains(n) &&
        now - s.getModificationTime >= debrisGraceMs => n
    }
    (drop ++ debris).foreach(n => f.delete(new Path(rp, vdir(n)), true))
    drop
  }
}
