package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** DFS-arm coverage for the claim/pointer protocols (r14 verdict item
  * 2): every lane here drives [[VersionedStore]] through the branches
  * that local filesystems never reach — the FileContext
  * rename(OVERWRITE) pointer flip, the `create(overwrite = false)`
  * stamped claim, and the native-rename no-clobber restore — via the
  * `rawtest:` scheme ([[RawTestFs]]/[[RawTestAbstractFs]]), which is
  * non-local by TYPE and carries an AbstractFileSystem binding. The
  * comment claims on those arms ("DFS renames do not overwrite files",
  * "one API end-to-end, one atomic flip") become assertions.
  */
class RawTestFsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = {
    val s = graft.EngineSession.local("4")
    val hc = s.sparkContext.hadoopConfiguration
    hc.set("fs.rawtest.impl", classOf[RawTestFs].getName)
    hc.set("fs.AbstractFileSystem.rawtest.impl",
      classOf[RawTestAbstractFs].getName)
    s
  }

  override def afterAll(): Unit = spark.stop()

  private def tmp(prefix: String): (String, String) = {
    val local = Files.createTempDirectory(Paths.get("target"), prefix)
      .toAbsolutePath.toString
    ("rawtest:" + local, local)
  }

  private def names(local: String): Set[String] =
    Option(new java.io.File(local).list()).getOrElse(Array.empty).toSet

  private def fsOf(root: String) =
    new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Stage a published-looking version dir (data dir + _SUCCESS) without
    * a Spark write — the control protocols under test only look at the
    * directory shape.
    */
  private def stageVersion(root: String, n: Int): Unit = {
    val f = fsOf(root)
    val d = new org.apache.hadoop.fs.Path(root,
      VersionedStore.versionDirName(n))
    f.mkdirs(d)
    f.create(new org.apache.hadoop.fs.Path(d, "_SUCCESS"), false).close()
  }

  test("the FS dispatch really takes the DFS arms: rawtest is not a " +
    "Local/RawLocal subtype and FileContext resolves the scheme") {
    val (root, _) = tmp("rtdisp")
    val f = fsOf(root)
    assert(!f.isInstanceOf[org.apache.hadoop.fs.LocalFileSystem] &&
      !f.isInstanceOf[org.apache.hadoop.fs.RawLocalFileSystem],
      s"rawtest resolved to ${f.getClass} — the type dispatch would " +
        "take the NIO arms and this suite would cover nothing")
    assert(f.getScheme === "rawtest")
    // the AbstractFileSystem binding resolves (no UnsupportedFileSystem)
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      f.getUri, spark.sparkContext.hadoopConfiguration)
    assert(fc != null)
  }

  test("pointer flip through the FileContext rename(OVERWRITE) arm: " +
    "rollbacks land atomically-by-API, the flip count proves the arm, " +
    "no .crc sidecars and no staging debris") {
    val (root, local) = tmp("rtflip")
    fsOf(root).mkdirs(new org.apache.hadoop.fs.Path(root))
    stageVersion(root, 1)
    stageVersion(root, 2)
    assert(VersionedStore.versions(spark, root) === Seq(1, 2))

    val fc0 = RawTestFs.fcRenames.get()
    VersionedStore.rollback(spark, root, 1)
    assert(VersionedStore.latestVersion(spark, root) === Some(1))
    VersionedStore.rollback(spark, root, 2)
    assert(VersionedStore.latestVersion(spark, root) === Some(2))
    assert(RawTestFs.fcRenames.get() >= fc0 + 2,
      "the pointer flip must go through the FileContext " +
        "rename(OVERWRITE) arm on a scheme with an AbstractFileSystem " +
        "binding — not the FileSystem fallback")

    val leftover = names(local)
      .filter(n => n.startsWith(".LATEST.tmp") || n.endsWith(".crc"))
    assert(leftover.isEmpty, s"flip debris on the DFS arm: $leftover")
    // and the pointer content is the canonical name, readable raw
    assert(new String(Files.readAllBytes(Paths.get(local, "LATEST")),
      "UTF-8").trim === "v00002")
  }

  test("concurrent pointer flips through the FileContext arm: the " +
    "pointer always parses and lands on one of the racers' targets") {
    val (root, local) = tmp("rtrace")
    fsOf(root).mkdirs(new org.apache.hadoop.fs.Path(root))
    stageVersion(root, 1)
    stageVersion(root, 2)
    VersionedStore.rollback(spark, root, 1)
    (1 to 10).foreach { _ =>
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val gate = new java.util.concurrent.CountDownLatch(1)
      val ts = Seq(1, 2).map(v => new Thread(() => {
        gate.await()
        try VersionedStore.rollback(spark, root, v)
        catch { case t: Throwable => errs.add(t) }
      }))
      ts.foreach(_.start()); gate.countDown(); ts.foreach(_.join())
      assert(errs.isEmpty, s"racing flips must both succeed: $errs")
      val v = VersionedStore.latestVersion(spark, root)
      assert(v === Some(1) || v === Some(2),
        s"pointer must parse to a racer's target after the race, got $v")
    }
    val leftover = names(local).filter(_.startsWith(".LATEST.tmp"))
    assert(leftover.isEmpty, s"raced flips leaked staging: $leftover")
  }

  test("stamped claim through the DFS create(overwrite=false) arm: " +
    "full withCycleClaim round-trip — stamp readable while held, " +
    "occupied path refuses, release deletes only the holder's claim") {
    val (root, local) = tmp("rtclaim")
    val f = fsOf(root)
    f.mkdirs(new org.apache.hadoop.fs.Path(root))
    val claim = new org.apache.hadoop.fs.Path(root, ".cycle-claim")

    var ran = false
    graft.IncrementalPipeline.withCycleClaim(spark, root, 500000L,
      "a rawtest cycle") {
      ran = true
      val stamp = VersionedStore.rawControlRead(f, claim)
      assert(stamp.exists(_.nonEmpty),
        "the DFS-arm claim must carry its owner's stamp once visible")
      // a second acquisition while held is refused by EEXIST on the
      // namenode-atomic create(false) — the DFS arm's whole guarantee
      val e = intercept[IllegalStateException] {
        graft.IncrementalPipeline.withCycleClaim(spark, root, 500000L,
          "an intruder") { fail("must refuse while held") }
      }
      assert(e.getMessage.contains("cycle"))
      assert(VersionedStore.rawControlRead(f, claim) === stamp,
        "a refused intruder must not damage the holder's stamp")
    }
    assert(ran)
    assert(!names(local).exists(_.contains(".cycle-claim")),
      s"claim debris after release: ${names(local)}")
  }

  test("renameNoReplace through the DFS native-rename arm: an occupied " +
    "FILE destination refuses (the comment's 'DFS renames do not " +
    "overwrite files' as an assertion), a vacant one moves") {
    val (root, local) = tmp("rtnorep")
    val f = fsOf(root)
    f.mkdirs(new org.apache.hadoop.fs.Path(root))
    val src = new org.apache.hadoop.fs.Path(root, ".cycle-claim.swept-x")
    val dst = new org.apache.hadoop.fs.Path(root, ".cycle-claim")
    Files.write(Paths.get(local, ".cycle-claim.swept-x"),
      "stolen".getBytes("UTF-8"))
    Files.write(Paths.get(local, ".cycle-claim"),
      "occupant".getBytes("UTF-8"))
    assert(!VersionedStore.renameNoReplace(f, src, dst),
      "occupied destination must refuse on the DFS arm")
    assert(new String(Files.readAllBytes(Paths.get(local, ".cycle-claim")),
      "UTF-8") === "occupant", "the occupant must never be clobbered")
    assert(Files.exists(Paths.get(local, ".cycle-claim.swept-x")),
      "a refused restore must preserve its source")
    Files.delete(Paths.get(local, ".cycle-claim"))
    assert(VersionedStore.renameNoReplace(f, src, dst))
    assert(new String(Files.readAllBytes(Paths.get(local, ".cycle-claim")),
      "UTF-8") === "stolen")
    assert(!Files.exists(Paths.get(local, ".cycle-claim.swept-x")))
  }

  test("ownership-checked release on the DFS arms: a grace-violating " +
    "holder restores the successor's claim via the native no-clobber " +
    "rename instead of deleting it") {
    val (root, local) = tmp("rtown")
    val f = fsOf(root)
    f.mkdirs(new org.apache.hadoop.fs.Path(root))
    val claimLocal = Paths.get(local, ".cycle-claim")
    val out = graft.IncrementalPipeline.withCycleClaim(spark, root,
      500000L, "a rawtest cycle") {
      // simulate the grace violation: a sweeper replaced our claim with
      // a successor's while our body ran
      Files.delete(claimLocal)
      Files.write(claimLocal, "successor-stamp".getBytes("UTF-8"))
      42
    }
    assert(out === 42)
    assert(Files.exists(claimLocal),
      "release must restore a successor's claim, not delete it")
    assert(new String(Files.readAllBytes(claimLocal), "UTF-8") ===
      "successor-stamp")
    assert(!names(local).exists(_.contains(".rel-")),
      s"release tmp leaked: ${names(local)}")
  }

  test("DFS-arm stamp write fault, PARTIAL stamp: the half-stamped " +
    "marker (non-empty strict prefix, provably ours) is swept " +
    "(atomic take, prefix-checked), the error surfaces, and the next " +
    "acquisition succeeds") {
    val (root, local) = tmp("rtfault")
    val f = fsOf(root)
    f.mkdirs(new org.apache.hadoop.fs.Path(root))
    val claim = new org.apache.hadoop.fs.Path(root, ".cycle-claim")
    RawTestFs.failStampWrite = _.endsWith(".cycle-claim")
    RawTestFs.stampWritePartial = 3 // marker dies holding "me-"
    try {
      val e = intercept[java.io.IOException] {
        VersionedStore.exclusiveCreateStamped(f, claim, "me-stamp")
      }
      assert(e.getMessage.contains("injected-rawtest"))
      assert(!names(local).exists(_.contains(".cycle-claim")),
        s"half-stamped marker must be swept, not leaked: ${names(local)}")
    } finally {
      RawTestFs.failStampWrite = _ => false
      RawTestFs.stampWritePartial = 0
    }
    // fault cleared: a clean acquisition lands with its stamp readable
    assert(VersionedStore.exclusiveCreateStamped(f, claim, "me-stamp"))
    assert(new String(Files.readAllBytes(Paths.get(local, ".cycle-claim")),
      "UTF-8") === "me-stamp")
    // occupied path still refuses quietly
    assert(!VersionedStore.exclusiveCreateStamped(f, claim, "other"))
    assert(f.delete(claim, false))
  }

  test("DFS-arm stamp write fault, EMPTY marker: ambiguous debris is " +
    "LEFT for the aged sweep (r15 ADVICE — a foreign claimant sits " +
    "empty inside its create-to-close window; sweeping it would " +
    "destroy a won acquisition), and the original create failure is " +
    "what surfaces") {
    val (root, local) = tmp("rtfault2")
    val f = fsOf(root)
    f.mkdirs(new org.apache.hadoop.fs.Path(root))
    val claim = new org.apache.hadoop.fs.Path(root, ".cycle-claim")
    RawTestFs.failStampWrite = _.endsWith(".cycle-claim")
    RawTestFs.stampWritePartial = 0 // dies before the first byte
    try {
      val e = intercept[java.io.IOException] {
        VersionedStore.exclusiveCreateStamped(f, claim, "me-stamp")
      }
      assert(e.getMessage.contains("injected-rawtest"))
      assert(Files.exists(Paths.get(local, ".cycle-claim")) &&
        Files.size(Paths.get(local, ".cycle-claim")) == 0L,
        s"ambiguous EMPTY debris must be left for the aged sweep, " +
          s"not swept inline: ${names(local)}")
    } finally RawTestFs.failStampWrite = _ => false
    // the leaked empty marker refuses claimants (grace-bounded, loud at
    // the protocol layer) until swept; simulate the aged sweep and show
    // the path is serviceable again
    assert(!VersionedStore.exclusiveCreateStamped(f, claim, "other"))
    assert(f.delete(claim, false))
    assert(VersionedStore.exclusiveCreateStamped(f, claim, "me-stamp"))
    assert(f.delete(claim, false))
  }

  test("DFS-arm stamp write fault + classification READ fault: the " +
    "read fault propagates WITH the original create failure attached " +
    "as suppressed (r15 ADVICE — the root-cause diagnostic must not " +
    "be silently replaced)") {
    val (root, local) = tmp("rtfault3")
    val f = fsOf(root)
    f.mkdirs(new org.apache.hadoop.fs.Path(root))
    val claim = new org.apache.hadoop.fs.Path(root, ".cycle-claim")
    RawTestFs.failStampWrite = _.endsWith(".cycle-claim")
    RawTestFs.failOpen = _.endsWith(".cycle-claim")
    try {
      val e = intercept[java.io.IOException] {
        VersionedStore.exclusiveCreateStamped(f, claim, "me-stamp")
      }
      assert(e.getMessage.contains("injected-rawtest-open"),
        "the classification read fault is what propagates")
      assert(e.getSuppressed.exists(
        _.getMessage.contains("No space left on device (injected-rawtest)")),
        s"the original create failure must ride along as suppressed; " +
          s"got: ${e.getSuppressed.map(_.getMessage).mkString(" | ")}")
    } finally {
      RawTestFs.failStampWrite = _ => false
      RawTestFs.failOpen = _ => false
    }
    // debris from the unclassifiable failure stays (crash-equivalent,
    // aged-sweep territory); clear it and confirm the path serves
    assert(Files.exists(Paths.get(local, ".cycle-claim")))
    assert(f.delete(claim, false))
    assert(VersionedStore.exclusiveCreateStamped(f, claim, "me-stamp"))
    assert(f.delete(claim, false))
  }
}
