package graft.sources

import java.io.IOException
import java.nio.file.{Files, Paths, Path => NPath}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Fault injection for the NIO claim/pointer primitives (r14 verdict
  * item 1): the r14 hardening moved the load-bearing control-file
  * operations onto `java.nio.file.Files` directly — kernel-atomic, but
  * OUT of the Hadoop-layer EnospcFs harness's reach. [[NioControl]] is
  * the seam; each lane here makes exactly one primitive step fail the
  * way a real disk does (ENOSPC on the stamp write, EIO on the
  * hard-link publish, EIO on the ATOMIC_MOVE, EEXIST on an occupied
  * link target, UnsupportedOperationException on a linkless mount) and
  * asserts the protocol's crash contract: loud failure, no debris
  * leaked, the store pointer / a foreign claim never damaged, and a
  * clean retry once the fault clears.
  */
class NioFaultSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = graft.EngineSession.local("4")

  override def afterAll(): Unit = {
    NioControl.hook = (_, _) => ()
    spark.stop()
  }

  private def tmp(prefix: String): String =
    Files.createTempDirectory(Paths.get("target"), prefix).toString

  private def docs(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def texts(df: DataFrame): Set[String] =
    df.select("text").collect().map(_.getString(0)).toSet

  private def names(root: String): Set[String] =
    Option(new java.io.File(root).list()).getOrElse(Array.empty).toSet

  private def failOn(op: String, frag: String,
      e: => Throwable): (String, NPath) => Unit =
    (o, p) => if (o == op && p.toString.contains(frag)) throw e

  // ---------------------------------------------------------------- pointer

  test("ENOSPC on the pointer STAGING WRITE (NIO arm): publish fails " +
    "loudly, the pointer is untouched, no .LATEST.tmp debris leaks, " +
    "retry flips") {
    val root = tmp("niop1")
    assert(VersionedStore.publish(docs((1L, "version one body")), root) === 1)
    val e = intercept[Throwable] {
      NioControl.armed(failOn("write", ".LATEST.tmp",
        new IOException("No space left on device (injected-nio)"))) {
        VersionedStore.publish(docs((1L, "version two body")), root)
      }
    }
    assert(graft.operators.EnospcFs.causeChain(e)
      .contains("No space left on device (injected-nio)"))
    assert(graft.operators.EnospcFs.causeChain(e)
      .contains("pointer staging failed"))
    // the previous pointer still serves; the orphan v2 is pinned-readable
    assert(VersionedStore.latestVersion(spark, root) === Some(1))
    assert(texts(VersionedStore.read(spark, root)) === Set("version one body"))
    assert(VersionedStore.versions(spark, root) === Seq(1, 2))
    // no staging debris: the failing writer swept its own tmp
    assert(!names(root).exists(_.startsWith(".LATEST.tmp")),
      s"staging debris leaked: ${names(root)}")
    assert(!names(root).exists(_.startsWith(".claim-")),
      "the failed publish must release its slot claim")
    // fault cleared: the retry lands and flips
    assert(VersionedStore.publish(docs((1L, "version three body")), root) === 3)
    assert(texts(VersionedStore.read(spark, root)) === Set("version three body"))
  }

  test("EIO on the pointer ATOMIC_MOVE (NIO arm): publish fails loudly, " +
    "tmp swept, the pointer is INTACT (not pointer-less — the whole " +
    "point of the overwrite-rename arm), retry flips") {
    val root = tmp("niop2")
    assert(VersionedStore.publish(docs((1L, "version one body")), root) === 1)
    val e = intercept[Throwable] {
      NioControl.armed(failOn("move", ".LATEST.tmp",
        new IOException("Input/output error (injected-nio)"))) {
        VersionedStore.publish(docs((1L, "version two body")), root)
      }
    }
    assert(graft.operators.EnospcFs.causeChain(e)
      .contains("pointer flip failed"))
    // unlike the FileSystem-fallback arm (delete-then-rename), the NIO
    // arm's failed flip leaves the OLD pointer serving — no window with
    // no pointer at all
    assert(VersionedStore.latestVersion(spark, root) === Some(1))
    assert(texts(VersionedStore.read(spark, root)) === Set("version one body"))
    assert(!names(root).exists(_.startsWith(".LATEST.tmp")),
      s"staging debris leaked: ${names(root)}")
    assert(VersionedStore.publish(docs((1L, "version three body")), root) === 3)
    assert(VersionedStore.latestVersion(spark, root) === Some(3))
  }

  test("ENOSPC on the slot-claim createFile: publish surfaces the real " +
    "error (an absent marker must NOT be misread as a lost race)") {
    val root = tmp("niop3")
    assert(VersionedStore.publish(docs((1L, "version one body")), root) === 1)
    val e = intercept[Throwable] {
      NioControl.armed(failOn("createFile", ".claim-",
        new IOException("No space left on device (injected-nio)"))) {
        VersionedStore.publish(docs((1L, "version two body")), root)
      }
    }
    assert(graft.operators.EnospcFs.causeChain(e)
      .contains("No space left on device (injected-nio)"))
    assert(VersionedStore.latestVersion(spark, root) === Some(1))
    assert(VersionedStore.publish(docs((1L, "version two body")), root) === 2)
  }

  // ----------------------------------------------------------- stamped claim

  test("ENOSPC on the claim STAMP WRITE: acquisition fails loudly, no " +
    ".stamp-* or claim debris leaks, the next acquisition succeeds") {
    val root = tmp("nioc1")
    new java.io.File(root).mkdirs()
    val e = intercept[IOException] {
      NioControl.armed(failOn("write", ".cycle-claim.stamp-",
        new IOException("No space left on device (injected-nio)"))) {
        graft.IncrementalPipeline.withCycleClaim(spark, root, 500000L,
          "a test") { fail("the body must not run on a failed stamp") }
      }
    }
    assert(e.getMessage.contains("injected-nio"))
    assert(!names(root).exists(_.contains(".cycle-claim")),
      s"claim-protocol debris leaked: ${names(root)}")
    graft.IncrementalPipeline.withCycleClaim(spark, root, 500000L, "a test")(())
    assert(!names(root).exists(_.contains(".cycle-claim")))
  }

  test("EIO on the hard-link PUBLISH of a stamped claim propagates " +
    "loudly — distinguished from EEXIST (lost race), which refuses " +
    "quietly; the stamp tmp is swept either way") {
    val root = tmp("nioc2")
    new java.io.File(root).mkdirs()
    val f = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val claim = new org.apache.hadoop.fs.Path(root, ".cycle-claim")

    // EIO: a real link(2) failure that is NOT an occupied path must NOT
    // be misread as "another cycle holds the claim" — that would turn a
    // dying disk into an invisible no-op cycle
    val e = intercept[IOException] {
      NioControl.armed(failOn("createLink", ".cycle-claim",
        new IOException("Input/output error (injected-nio)"))) {
        VersionedStore.exclusiveCreateStamped(f, claim, "me-stamp")
      }
    }
    assert(e.getMessage.contains("injected-nio"))
    assert(!names(root).exists(_.contains(".cycle-claim")),
      s"debris leaked after EIO link: ${names(root)}")

    // EEXIST: the genuine lost race — false, no exception, occupant kept
    Files.write(Paths.get(root, ".cycle-claim"), "owner".getBytes("UTF-8"))
    assert(!VersionedStore.exclusiveCreateStamped(f, claim, "me-stamp"))
    assert(new String(Files.readAllBytes(Paths.get(root, ".cycle-claim")),
      "UTF-8") === "owner", "a lost race must not damage the owner's stamp")
    assert(!names(root).exists(_.contains(".stamp-")),
      s"stamp tmp leaked after lost race: ${names(root)}")
  }

  test("linkless mount (UnsupportedOperationException): the stamped " +
    "claim falls back to create-then-stamp and still round-trips; a " +
    "failed fallback stamp leaves only ambiguous EMPTY debris that " +
    "the aged sweep reclaims") {
    val root = tmp("nioc3")
    new java.io.File(root).mkdirs()
    val f = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val claim = new org.apache.hadoop.fs.Path(root, ".cycle-claim")
    val uoe: (String, NPath) => Unit =
      (o, _) => if (o == "createLink") throw new UnsupportedOperationException(
        "hard links not supported (injected-nio)")

    // full acquisition round-trip on a "linkless" mount — must not
    // livelock (a silent false would refuse every claimant forever)
    NioControl.armed(uoe) {
      var ran = false
      graft.IncrementalPipeline.withCycleClaim(spark, root, 500000L,
        "a test") {
        ran = true
        assert(VersionedStore.rawControlRead(f, claim).exists(_.nonEmpty),
          "the fallback claim must carry its owner's stamp")
      }
      assert(ran)
    }
    assert(!names(root).exists(_.contains(".cycle-claim")),
      s"claim not released on the linkless fallback: ${names(root)}")

    // occupied path under the fallback: still a quiet refusal
    Files.write(Paths.get(root, ".cycle-claim"), "owner".getBytes("UTF-8"))
    NioControl.armed(uoe) {
      assert(!VersionedStore.exclusiveCreateStamped(f, claim, "me-stamp"))
    }
    assert(new String(Files.readAllBytes(Paths.get(root, ".cycle-claim")),
      "UTF-8") === "owner")
    Files.delete(Paths.get(root, ".cycle-claim"))

    // fallback stamp write dies AFTER the create, leaving the marker
    // EMPTY: empty is AMBIGUOUS debris (a foreign claimant sits empty
    // inside its own create-to-stamp window on this mount, and empty is
    // a byte-prefix of EVERY stamp), so the cleanup must LEAVE it for
    // the aged sweep rather than risk atomic-take-and-deleting a
    // legitimately won foreign acquisition (r15 ADVICE). The leak is
    // grace-bounded, not a livelock: the aged sweep reclaims it.
    val both: (String, NPath) => Unit = (o, p) => {
      if (o == "createLink") throw new UnsupportedOperationException(
        "hard links not supported (injected-nio)")
      if (o == "write" && p.getFileName.toString == ".cycle-claim")
        throw new IOException("No space left on device (injected-nio)")
    }
    val e = intercept[IOException] {
      NioControl.armed(both) {
        VersionedStore.exclusiveCreateStamped(f, claim, "me-stamp")
      }
    }
    assert(e.getMessage.contains("injected-nio"))
    assert(Files.exists(Paths.get(root, ".cycle-claim")) &&
      Files.size(Paths.get(root, ".cycle-claim")) == 0L,
      s"ambiguous EMPTY debris must be left for the aged sweep, " +
        s"not swept inline: ${names(root)}")
    // ...and the aged sweep DOES reclaim it: a later claimant with the
    // grace elapsed acquires through the leaked empty marker
    NioControl.armed(uoe) {
      var ran = false
      graft.IncrementalPipeline.withCycleClaim(spark, root, 0L,
        "a reclaim test") { ran = true }
      assert(ran, "the aged sweep must reclaim leaked empty debris")
    }
    assert(!names(root).exists(_.contains(".cycle-claim")),
      s"claim not released after the aged-sweep reclaim: ${names(root)}")
  }

  // --------------------------------------------------------- no-clobber move

  test("EIO on the no-clobber restore link: renameNoReplace returns " +
    "false and PRESERVES the source marker (the moved stamp stays for " +
    "the aged sweep — never silently lost)") {
    val root = tmp("nior1")
    new java.io.File(root).mkdirs()
    val f = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val src = new org.apache.hadoop.fs.Path(root, ".cycle-claim.swept-x")
    val dst = new org.apache.hadoop.fs.Path(root, ".cycle-claim")
    Files.write(Paths.get(root, ".cycle-claim.swept-x"),
      "stolen-stamp".getBytes("UTF-8"))
    NioControl.armed(failOn("createLink", ".cycle-claim",
      new IOException("Input/output error (injected-nio)"))) {
      assert(!VersionedStore.renameNoReplace(f, src, dst))
    }
    assert(Files.exists(Paths.get(root, ".cycle-claim.swept-x")),
      "the source marker must survive a failed restore")
    assert(new String(Files.readAllBytes(
      Paths.get(root, ".cycle-claim.swept-x")), "UTF-8") === "stolen-stamp")
    assert(!Files.exists(Paths.get(root, ".cycle-claim")))
    // fault cleared: the same restore succeeds and consumes the source
    assert(VersionedStore.renameNoReplace(f, src, dst))
    assert(!Files.exists(Paths.get(root, ".cycle-claim.swept-x")))
    assert(new String(Files.readAllBytes(Paths.get(root, ".cycle-claim")),
      "UTF-8") === "stolen-stamp")
  }

  test("linkless mount: renameNoReplace refuses (false) instead of " +
    "throwing from release's finally — the ADVICE r14 masking bug") {
    val root = tmp("nior2")
    new java.io.File(root).mkdirs()
    val f = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val src = new org.apache.hadoop.fs.Path(root, ".cycle-claim.rel-x")
    val dst = new org.apache.hadoop.fs.Path(root, ".cycle-claim")
    Files.write(Paths.get(root, ".cycle-claim.rel-x"),
      "foreign".getBytes("UTF-8"))
    NioControl.armed((o, _) => if (o == "createLink")
      throw new UnsupportedOperationException("no links (injected-nio)")) {
      assert(!VersionedStore.renameNoReplace(f, src, dst),
        "UOE must surface as a refused restore, not escape the release")
    }
    assert(Files.exists(Paths.get(root, ".cycle-claim.rel-x")),
      "the marker must stay for the aged sweep on a linkless mount")
  }

  test("linkless fallback: a marker STOLEN between the O_EXCL create " +
    "and the stamp is not resurrected — the stamp never CREATEs, the " +
    "acquisition refuses") {
    val root = tmp("nioc4")
    new java.io.File(root).mkdirs()
    val f = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val claim = new org.apache.hadoop.fs.Path(root, ".cycle-claim")
    val stolen = Paths.get(root, ".cycle-claim.swept-steal")
    // a sweeper's rename lands in the create-to-stamp gap: simulated at
    // the stamp's own hook point, after createFile has published the
    // empty marker (tmp staging writes carry a .stamp- name and pass)
    val hook: (String, NPath) => Unit = (o, p) => {
      if (o == "createLink") throw new UnsupportedOperationException(
        "no hard links (injected-nio)")
      if (o == "write" && p.getFileName.toString == ".cycle-claim")
        Files.move(p, stolen)
    }
    NioControl.armed(hook) {
      assert(!VersionedStore.exclusiveCreateStamped(f, claim, "me-stamp"),
        "a contested acquisition must refuse, not resurrect the marker")
    }
    assert(!Files.exists(Paths.get(root, ".cycle-claim")),
      "the read-back verify must never re-create a marker a sweeper took")
    // the fd follows the inode: our stamp landed in the SWEEPER's
    // debris, not at the claim path — the sweeper's view stands
    assert(Files.exists(stolen) &&
      new String(Files.readAllBytes(stolen), "UTF-8") === "me-stamp",
      "a mid-write steal carries the stamp into the sweeper's debris")

    // one interleaving deeper: a LATER claimant B re-creates the path
    // after the steal and before our stamp lands — the verify must
    // refuse WITHOUT damaging B's marker (a truncating stamp here would
    // silently orphan B: both bodies would run)
    Files.delete(stolen)
    val stolen2 = Paths.get(root, ".cycle-claim.swept-steal2")
    val hook2: (String, NPath) => Unit = (o, p) => {
      if (o == "createLink") throw new UnsupportedOperationException(
        "no hard links (injected-nio)")
      if (o == "write" && p.getFileName.toString == ".cycle-claim" &&
        !Files.exists(stolen2)) {
        Files.move(p, stolen2)
        Files.write(p, "claimant-B-stamp".getBytes("UTF-8"))
      }
    }
    NioControl.armed(hook2) {
      assert(!VersionedStore.exclusiveCreateStamped(f, claim, "me-stamp-2"),
        "the verify must refuse a path another claimant re-created")
    }
    assert(new String(Files.readAllBytes(Paths.get(root, ".cycle-claim")),
      "UTF-8") === "claimant-B-stamp",
      "the later claimant's marker must be UNDAMAGED — never truncated")
    assert(new String(Files.readAllBytes(stolen2), "UTF-8") === "me-stamp-2",
      "our stamp went to the stolen inode, not over B's marker")
    Files.delete(stolen2)
    Files.delete(Paths.get(root, ".cycle-claim"))

    // steal resolved: the same claimant acquires cleanly on the same mount
    NioControl.armed((o, _) => if (o == "createLink")
      throw new UnsupportedOperationException("no links (injected-nio)")) {
      assert(VersionedStore.exclusiveCreateStamped(f, claim, "me-stamp"))
    }
    assert(new String(Files.readAllBytes(Paths.get(root, ".cycle-claim")),
      "UTF-8") === "me-stamp")
  }

  test("linkless fallback: a write FAULT landing after a steal + " +
    "re-create must not sweep the later claimant's marker — the " +
    "failure cleanup is prefix-scoped to our own debris") {
    val root = tmp("nioc5")
    new java.io.File(root).mkdirs()
    val f = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val claim = new org.apache.hadoop.fs.Path(root, ".cycle-claim")
    val stolen = Paths.get(root, ".cycle-claim.swept-steal3")
    // the compound schedule: our CREATE_NEW lands, a sweeper steals the
    // marker, claimant B re-creates and stamps it, and THEN our stamp
    // write dies — the cleanup sees B's full stamp at the claim path
    // and must leave it (deleting would orphan B's live claim)
    val hook: (String, NPath) => Unit = (o, p) => {
      if (o == "createLink") throw new UnsupportedOperationException(
        "no hard links (injected-nio)")
      if (o == "write" && p.getFileName.toString == ".cycle-claim") {
        Files.move(p, stolen)
        Files.write(p, "claimant-B-stamp".getBytes("UTF-8"))
        throw new IOException("No space left on device (injected-nio)")
      }
    }
    val e = intercept[IOException] {
      NioControl.armed(hook) {
        VersionedStore.exclusiveCreateStamped(f, claim, "me-stamp")
      }
    }
    assert(e.getMessage.contains("injected-nio"))
    assert(new String(Files.readAllBytes(Paths.get(root, ".cycle-claim")),
      "UTF-8") === "claimant-B-stamp",
      "the failure cleanup must never delete another claimant's marker")
    // our stolen (empty — the write never ran) inode is the sweeper's
    Files.delete(stolen)
    Files.delete(Paths.get(root, ".cycle-claim"))
    // the plain failed-write case (no steal) leaves OUR empty marker in
    // place: empty is AMBIGUOUS (indistinguishable from a foreign
    // claimant's create-to-stamp window), so the cleanup refuses to
    // touch it and the aged sweep reclaims it (r15 ADVICE — the
    // bounded leak is the safe side)
    val e2 = intercept[IOException] {
      NioControl.armed((o, p) => {
        if (o == "createLink") throw new UnsupportedOperationException(
          "no hard links (injected-nio)")
        if (o == "write" && p.getFileName.toString == ".cycle-claim")
          throw new IOException("No space left on device (injected-nio)")
      }) {
        VersionedStore.exclusiveCreateStamped(f, claim, "me-stamp")
      }
    }
    assert(e2.getMessage.contains("injected-nio"))
    assert(Files.exists(Paths.get(root, ".cycle-claim")) &&
      Files.size(Paths.get(root, ".cycle-claim")) == 0L,
      s"ambiguous empty debris must be left for the aged sweep: ${names(root)}")
    Files.delete(Paths.get(root, ".cycle-claim"))
  }

  test("linkless fallback: a FOREIGN claimant's pre-stamp EMPTY marker " +
    "survives our failure cleanup — empty is ambiguous, never " +
    "'provably ours' (r15 ADVICE: sweeping it destroyed a won " +
    "acquisition)") {
    val root = tmp("nioc6")
    new java.io.File(root).mkdirs()
    val f = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val claim = new org.apache.hadoop.fs.Path(root, ".cycle-claim")
    val stolen = Paths.get(root, ".cycle-claim.swept-steal4")
    // schedule: our CREATE_NEW lands; a sweeper steals the marker;
    // claimant B re-creates it and is INSIDE its create-to-stamp window
    // (marker exists, EMPTY) when our stamp write dies. The old cleanup
    // read empty as a prefix of our stamp, atomic-took and deleted it —
    // B's read-back verify then refused a claim B had legitimately won.
    // The cleanup must leave the empty marker untouched.
    val hook: (String, NPath) => Unit = (o, p) => {
      if (o == "createLink") throw new UnsupportedOperationException(
        "no hard links (injected-nio)")
      if (o == "write" && p.getFileName.toString == ".cycle-claim") {
        Files.move(p, stolen)
        Files.createFile(p) // B's O_EXCL create; B has not stamped yet
        throw new IOException("No space left on device (injected-nio)")
      }
    }
    val e = intercept[IOException] {
      NioControl.armed(hook) {
        VersionedStore.exclusiveCreateStamped(f, claim, "me-stamp")
      }
    }
    assert(e.getMessage.contains("injected-nio"))
    assert(Files.exists(Paths.get(root, ".cycle-claim")) &&
      Files.size(Paths.get(root, ".cycle-claim")) == 0L,
      "claimant B's pre-stamp empty marker must survive our cleanup")
    // B finishes its stamp and read-back verifies: the acquisition holds
    Files.write(Paths.get(root, ".cycle-claim"),
      "claimant-B-stamp".getBytes("UTF-8"))
    assert(VersionedStore.rawControlRead(f, claim)
      .contains("claimant-B-stamp"))
    Files.delete(stolen)
    Files.delete(Paths.get(root, ".cycle-claim"))
  }

  test("rawControlRead drains the full content (short reads, > 256 " +
    "bytes) — a read-back verify must never see a truncated stamp") {
    val root = tmp("nior3")
    new java.io.File(root).mkdirs()
    val f = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(root, ".long-marker")
    val long = ("x" * 300) + "-tail"
    Files.write(Paths.get(root, ".long-marker"), long.getBytes("UTF-8"))
    assert(VersionedStore.rawControlRead(f, p).contains(long),
      "content past one 256-byte read must round-trip")
  }

  test("rawControlRead 4 KiB bound is exact: 4096 bytes round-trips, " +
    "4097..4352 fails LOUDLY (r15 ADVICE — the drain loop's pre-write " +
    "check let a short final tail round-trip silently)") {
    val root = tmp("nior4")
    new java.io.File(root).mkdirs()
    val f = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val atBound = "y" * 4096
    Files.write(Paths.get(root, ".at-bound"), atBound.getBytes("UTF-8"))
    assert(VersionedStore.rawControlRead(f,
      new org.apache.hadoop.fs.Path(root, ".at-bound")).contains(atBound))
    // the exact lengths the off-by-one admitted: one extra buffered read
    // past the bound (4097..4352 with a 256-byte buffer)
    for (n <- Seq(4097, 4200, 4352, 5000)) {
      Files.write(Paths.get(root, ".over-bound"),
        ("z" * n).getBytes("UTF-8"))
      val e = intercept[IOException] {
        VersionedStore.rawControlRead(f,
          new org.apache.hadoop.fs.Path(root, ".over-bound"))
      }
      assert(e.getMessage.contains("exceeds the 4 KiB marker bound"),
        s"a $n-byte control file must fail the bound loudly")
    }
  }

  test("compound fault inside the linkless failure cleanup: the " +
    "atomic-take MOVE dies (sweepMove seam) — the original stamp " +
    "failure still surfaces and the partial marker stays for the " +
    "aged sweep, never half-deleted") {
    val root = tmp("nioc7")
    new java.io.File(root).mkdirs()
    val f = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val claim = new org.apache.hadoop.fs.Path(root, ".cycle-claim")
    // stamp write leaves a non-empty strict prefix ("me-") then dies;
    // the cleanup classifies it as ours and goes to atomic-take — where
    // the second fault lands
    val hook: (String, NPath) => Unit = (o, p) => {
      if (o == "createLink") throw new UnsupportedOperationException(
        "no hard links (injected-nio)")
      if (o == "write" && p.getFileName.toString == ".cycle-claim") {
        val ch = java.nio.file.Files.newByteChannel(p,
          java.nio.file.StandardOpenOption.WRITE)
        try ch.write(java.nio.ByteBuffer.wrap("me-".getBytes("UTF-8")))
        finally ch.close()
        throw new IOException("No space left on device (injected-nio)")
      }
      if (o == "sweepMove") throw new IOException(
        "Input/output error (injected-nio-sweep)")
    }
    val e = intercept[IOException] {
      NioControl.armed(hook) {
        VersionedStore.exclusiveCreateStamped(f, claim, "me-stamp")
      }
    }
    // the ORIGINAL write failure surfaces (the cleanup's own fault is
    // contained), and the marker is intact for the aged sweep
    assert(e.getMessage.contains("No space left on device (injected-nio)"))
    assert(new String(Files.readAllBytes(Paths.get(root, ".cycle-claim")),
      "UTF-8") === "me-")
    Files.delete(Paths.get(root, ".cycle-claim"))
  }

  test("compound fault inside the linkless failure cleanup: the " +
    "post-take DELETE dies (sweepDelete seam) — the taken marker " +
    "parks as .swept-* debris for the aged sweep, the claim path is " +
    "clear, and the original failure surfaces") {
    val root = tmp("nioc8")
    new java.io.File(root).mkdirs()
    val f = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val claim = new org.apache.hadoop.fs.Path(root, ".cycle-claim")
    val hook: (String, NPath) => Unit = (o, p) => {
      if (o == "createLink") throw new UnsupportedOperationException(
        "no hard links (injected-nio)")
      if (o == "write" && p.getFileName.toString == ".cycle-claim") {
        val ch = java.nio.file.Files.newByteChannel(p,
          java.nio.file.StandardOpenOption.WRITE)
        try ch.write(java.nio.ByteBuffer.wrap("me-".getBytes("UTF-8")))
        finally ch.close()
        throw new IOException("No space left on device (injected-nio)")
      }
      if (o == "sweepDelete") throw new IOException(
        "Input/output error (injected-nio-del)")
    }
    val e = intercept[IOException] {
      NioControl.armed(hook) {
        VersionedStore.exclusiveCreateStamped(f, claim, "me-stamp")
      }
    }
    assert(e.getMessage.contains("No space left on device (injected-nio)"))
    assert(!Files.exists(Paths.get(root, ".cycle-claim")),
      "the atomic take must have cleared the claim path")
    val parked = names(root).filter(_.contains(".swept-"))
    assert(parked.size === 1,
      s"the taken marker must park as .swept-* debris: ${names(root)}")
    assert(new String(Files.readAllBytes(
      Paths.get(root, parked.head)), "UTF-8") === "me-")
    Files.delete(Paths.get(root, parked.head))
  }
}
