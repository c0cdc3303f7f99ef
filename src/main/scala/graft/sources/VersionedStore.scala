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

  private def parse(name: String): Option[Int] =
    if (name.length == 6 && name.charAt(0) == 'v' &&
      name.drop(1).forall(_.isDigit)) Some(name.drop(1).toInt)
    else None

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
    if (f.exists(dst)) f.delete(dst, false)
    require(f.rename(tmp, dst), s"pointer flip failed for $root -> ${vdir(n)}")
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

  /** Delete versions older than the newest `keepLast` (and any
    * `_SUCCESS`-less debris directories), but never the pointer's current
    * target. Returns the versions removed.
    */
  def expire(spark: SparkSession, root: String, keepLast: Int): Seq[Int] = {
    require(keepLast >= 1, s"keepLast must be >= 1 (got $keepLast)")
    val rp = new Path(root)
    val f = fs(spark, rp)
    val all = versions(spark, root)
    val current = latestVersion(spark, root)
    val keep = all.takeRight(keepLast).toSet ++ current
    // sweep unpublished debris (failed writes) alongside expired versions
    val debris = f.listStatus(rp).toSeq.filter(_.isDirectory)
      .flatMap(s => parse(s.getPath.getName))
      .filterNot(all.contains)
    val drop = all.filterNot(keep.contains)
    (drop ++ debris).foreach(n => f.delete(new Path(rp, vdir(n)), true))
    drop
  }
}
