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
    "failed fallback stamp does not leak an empty marker") {
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

    // fallback stamp write dies AFTER the create: the empty marker must
    // be swept, not leaked (it would refuse every later claimant until
    // the aged sweep)
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
    assert(!names(root).exists(_.contains(".cycle-claim")),
      s"empty marker leaked by the failed fallback stamp: ${names(root)}")
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
    // and the plain failed-write case (no steal) still sweeps OUR
    // empty marker: empty is a prefix of the stamp
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
    assert(!names(root).exists(_.contains(".cycle-claim")),
      s"our own empty marker must be swept on a plain write fault: ${names(root)}")
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
}
