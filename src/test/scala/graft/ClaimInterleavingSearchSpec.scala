package graft

import java.nio.file.{Files => JF, Paths => JP}
import java.nio.file.attribute.FileTime

import graft.sources.VersionedStore
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** EXHAUSTIVE small-depth interleaving search over the cycle-claim
  * protocol (r15 verdict item 3): [[ClaimScheduleSpec]]'s schedules A-H
  * were hand-picked by review; this spec enumerates EVERY adversary
  * schedule up to a bounded depth at the same pause sites and checks
  * the protocol's contract on each, replacing sampling with a searched
  * claim.
  *
  * Model. One scheduled caller S runs the real
  * [[IncrementalPipeline.withCycleClaim]]. An adversary — emulating any
  * other participant paused at an arbitrary point of its own protocol —
  * executes a deterministic sequence of primitive steps at four pause
  * sites inside S's run:
  *   - "sweep":    between S's staleness stat and its sweep rename
  *                 (cycleClaimSweepHook)
  *   - "preClaim": between S's fresh-steal probe and its claim create
  *                 (cycleClaimPreClaimHook — documented window 1)
  *   - "inBody":   while S's body runs (the body is ours)
  *   - "release":  inside S's release take, path momentarily vacant
  *                 (cycleClaimReleaseHook — documented window 2)
  * Primitives: StealClaim (a sweeper's stat-to-rename pause: rename the
  * claim to fresh .swept-* debris), ClaimB (a second claimant B runs
  * the acquisition guards — fresh-debris probe, then the atomic stamped
  * create; B does NOT sweep stale claims, the one simplification vs the
  * full protocol, covered by ClaimScheduleSpec's hand schedules),
  * ReleaseB (B's release: delete exactly the files carrying B's stamp),
  * RestoreDebris (a paused sweeper's no-clobber restore landing late),
  * AgeAll (the grace elapsing: every control file's mtime pushed past
  * the grace).
  *
  * Enumeration: all schedules of total length <= 2 across the four
  * sites (271) plus every single-site sequence of length 3 (500) —
  * 771 schedules x 5 initial states = 3855 runs; unreached sites
  * simply do not consume their actions, so the distinct executed
  * traces are fewer and are counted in the final report.
  *
  * Checked on EVERY run:
  *  1. S either runs its body exactly once and releases, or refuses
  *     with the protocol's loud IllegalStateException — never hangs,
  *     never throws anything else.
  *  2. NEVER TWO BODIES, except through the two documented windows:
  *     an overlap (S's body live while B's body is live) is admissible
  *     only if (a) the schedule stole a live claim inside S's
  *     glob-to-create gap — window 1, silent by design when the
  *     sweeper crashes mid-steal, grace-bounded — or (b) a loud
  *     WARNING fired (the grace-violation / release-vacancy class —
  *     window 2).
  *  3. A live B is never SILENTLY orphaned: if B acquired and never
  *     released, B's stamp must still exist somewhere (claim path or
  *     parked debris) — or a loud WARNING must have fired.
  *  4. CONVERGENCE: after B releases and the grace elapses, a clean
  *     adversary-free acquisition succeeds and leaves no control
  *     debris — whatever mess the schedule made is grace-bounded.
  */
class ClaimInterleavingSearchSpec extends AnyFunSuite
  with BeforeAndAfterAll {

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

  private val GraceMs = 60000L
  private val BStamp = "claimant-B-stamp"

  sealed trait Prim
  case object StealClaim extends Prim
  case object ClaimB extends Prim
  case object ReleaseB extends Prim
  case object RestoreDebris extends Prim
  case object AgeAll extends Prim

  private val prims: Seq[Prim] =
    Seq(StealClaim, ClaimB, ReleaseB, RestoreDebris, AgeAll)
  private val sites = Seq("sweep", "preClaim", "inBody", "release")

  sealed trait InitState
  case object EmptyDir extends InitState
  case object StaleForeign extends InitState // aged claim, holder crashed
  case object FreshLive extends InitState // B's fresh claim, B in body
  case object FreshDebris extends InitState // a sweeper mid-steal
  case object AgedDebris extends InitState // a sweeper crashed long ago
  private val states: Seq[InitState] =
    Seq(EmptyDir, StaleForeign, FreshLive, FreshDebris, AgedDebris)

  /** One run's mutable adversary/oracle state. */
  private final class RunState(val root: String,
      val f: org.apache.hadoop.fs.FileSystem) {
    val rp = new org.apache.hadoop.fs.Path(root)
    val claim = new org.apache.hadoop.fs.Path(rp, ".cycle-claim")
    var bInBody = false
    var sBodyActive = false
    var bodyRuns = 0
    var overlap = false
    var gapSteal = false // a LIVE claim stolen inside S's preClaim gap
    // the grace elapsed while B's body was live — B (or the holder
    // whose claim B's acquisition depends on) outlived the grace. The
    // contract's loudness for this class fires at B's OWN release
    // (takeAndRelease's ownership mismatch, pinned by ClaimScheduleSpec
    // schedule F / IncrementalRepairSpec) — which the model's simulated
    // B never executes, so the oracle admits it as the documented
    // grace-violation window rather than demanding a warning in S's run
    var graceViolation = false
    var consumed = List.empty[(String, Prim)]
    var seq = 0
    def nextName(tag: String): String = { seq += 1; s"$tag$seq" }
  }

  private def controlFiles(root: String): Seq[java.io.File] =
    Option(new java.io.File(root).listFiles())
      .getOrElse(Array.empty[java.io.File])
      .filter(_.getName.startsWith(".cycle-claim")).toSeq

  private def age(file: java.io.File): Unit =
    JF.setLastModifiedTime(file.toPath,
      FileTime.fromMillis(System.currentTimeMillis() - 2 * GraceMs))

  private def read(file: java.io.File): String =
    new String(JF.readAllBytes(file.toPath), "UTF-8")

  private def exec(st: RunState, site: String, p: Prim): Unit = {
    st.consumed ::= (site, p)
    p match {
      case StealClaim =>
        if (st.f.exists(st.claim)) {
          val live = st.bInBody // stealing B's LIVE claim?
          val d = new org.apache.hadoop.fs.Path(st.rp,
            s".cycle-claim.swept-${st.nextName("adv")}")
          if ((try st.f.rename(st.claim, d)
            catch { case _: java.io.IOException => false }) &&
            live && site == "preClaim")
            st.gapSteal = true
        }
      case ClaimB =>
        if (!st.bInBody) {
          // B follows the acquisition guards: refuse on a fresh
          // mid-steal (.swept-* younger than grace), then the atomic
          // stamped create (fails on any occupied path — B does not
          // sweep stale claims in this model)
          val freshDebris = controlFiles(st.root).exists(fl =>
            fl.getName.startsWith(".cycle-claim.swept-") &&
              System.currentTimeMillis() - fl.lastModified() < GraceMs)
          if (!freshDebris &&
            VersionedStore.exclusiveCreateStamped(st.f, st.claim, BStamp)) {
            st.bInBody = true
            if (st.sBodyActive) st.overlap = true
          }
        }
      case ReleaseB =>
        if (st.bInBody) {
          controlFiles(st.root).foreach { fl =>
            if ((try read(fl) catch { case _: java.io.IOException => "" })
              == BStamp) fl.delete()
          }
          st.bInBody = false
        }
      case RestoreDebris =>
        controlFiles(st.root)
          .filter(_.getName.startsWith(".cycle-claim.swept-"))
          .sortBy(_.getName).headOption.foreach { fl =>
            VersionedStore.renameNoReplace(st.f,
              new org.apache.hadoop.fs.Path(st.rp, fl.getName), st.claim)
          }
      case AgeAll =>
        if (st.bInBody) st.graceViolation = true
        controlFiles(st.root).foreach(age)
    }
  }

  private def capturingErr[T](body: => T): (T, String) = {
    val buf = new java.io.ByteArrayOutputStream()
    val old = System.err
    System.setErr(new java.io.PrintStream(buf, true, "UTF-8"))
    val out = try body finally System.setErr(old)
    (out, new String(buf.toByteArray, "UTF-8"))
  }

  private def setupState(root: String, init: InitState,
      st: RunState): Unit = init match {
    case EmptyDir => ()
    case StaleForeign =>
      JF.write(JP.get(root, ".cycle-claim"),
        "crashed-holder-stamp".getBytes("UTF-8"))
      age(new java.io.File(root, ".cycle-claim"))
    case FreshLive =>
      JF.write(JP.get(root, ".cycle-claim"), BStamp.getBytes("UTF-8"))
      st.bInBody = true
    case FreshDebris =>
      JF.write(JP.get(root, ".cycle-claim.swept-mid"),
        "other-live-stamp".getBytes("UTF-8"))
    case AgedDebris =>
      JF.write(JP.get(root, ".cycle-claim.swept-old"),
        "other-crashed-stamp".getBytes("UTF-8"))
      age(new java.io.File(root, ".cycle-claim.swept-old"))
  }

  /** Run one (initial state, schedule) combination through the real
    * protocol and check the contract. Returns (executed trace
    * signature, overlapClass) — overlapClass: 0 none, 1 gap-steal
    * window, 2 warned window.
    */
  private def runOne(parent: String, idx: Int, init: InitState,
      schedule: Map[String, Seq[Prim]]): (String, Int) = {
    val root = s"$parent/run$idx"
    new java.io.File(root).mkdirs()
    val f = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val st = new RunState(root, f)
    setupState(root, init, st)

    def fire(site: String): Unit =
      schedule.getOrElse(site, Nil).foreach(p => exec(st, site, p))
    IncrementalPipeline.cycleClaimSweepHook = () => fire("sweep")
    IncrementalPipeline.cycleClaimPreClaimHook = () => fire("preClaim")
    IncrementalPipeline.cycleClaimReleaseHook = () => fire("release")

    val (outcome, err) = capturingErr {
      try {
        IncrementalPipeline.withCycleClaim(spark, root, GraceMs, "search") {
          if (st.bInBody) st.overlap = true
          st.sBodyActive = true
          st.bodyRuns += 1
          fire("inBody")
          st.sBodyActive = false
        }
        "ran"
      } catch {
        case _: IllegalStateException => "refused"
      }
      // contract 1: anything else propagates and fails the suite loudly
    }
    resetHooks()
    val warned = err.contains("WARNING")
    val trace = s"$init|${st.consumed.reverse.map { case (s, p) =>
      s"$s:$p" }.mkString(",")}|$outcome"

    // contract 1: body at most once; ran XOR refused is by construction
    assert(st.bodyRuns <= 1, s"[$trace] body ran ${st.bodyRuns} times")
    if (outcome == "ran") assert(st.bodyRuns == 1, s"[$trace] no body")

    // contract 2: never two bodies outside the documented windows —
    // (1) the glob-to-create gap (silent by design when the sweeper
    // crashes mid-steal, grace-bounded), (2) the grace-violation /
    // release-vacancy class, loud either during S's run (ownership
    // mismatch at S's release) or at the violator's own release
    val overlapClass =
      if (!st.overlap) 0
      else if (st.gapSteal) 1
      else if (warned) 2
      else if (st.graceViolation) 3
      else -1
    assert(overlapClass >= 0,
      s"[$trace] TWO BODIES outside both documented windows " +
        s"(no gap-steal, no grace violation, no warning); stderr: $err")

    // contract 3: a live B is never silently orphaned — unless B
    // itself violated the grace (then B's own release detects the
    // vanished claim and warns, per the contract's "outlived the
    // grace and its claim was swept" arm)
    if (st.bInBody) {
      val stampSurvives = controlFiles(root).exists(fl =>
        (try read(fl) catch { case _: java.io.IOException => "" }) == BStamp)
      assert(stampSurvives || warned || st.graceViolation,
        s"[$trace] live B's stamp vanished with no warning; stderr: $err")
    }

    // contract 4: convergence — B releases, the grace elapses, a clean
    // acquisition succeeds and the store is debris-free
    if (st.bInBody) exec(st, "post", ReleaseB)
    controlFiles(root).foreach(age)
    var convRan = false
    val (_, convErr) = capturingErr {
      IncrementalPipeline.withCycleClaim(spark, root, GraceMs,
        "convergence") { convRan = true }
    }
    assert(convRan,
      s"[$trace] post-grace acquisition refused — not grace-bounded; " +
        s"stderr: $convErr")
    val leftovers = controlFiles(root).map(_.getName)
    assert(leftovers.isEmpty,
      s"[$trace] control debris survived convergence: $leftovers")

    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
    (trace, overlapClass)
  }

  test("ALL adversary schedules to depth 2 (plus single-site depth 3) " +
    "x 5 initial states: never two bodies outside the two documented " +
    "windows, no silent orphan, every run grace-converges") {
    // depth 0..2 across sites
    val len0 = Seq(Map.empty[String, Seq[Prim]])
    val len1 = for (s <- sites; p <- prims) yield Map(s -> Seq(p))
    val len2same =
      for (s <- sites; p1 <- prims; p2 <- prims) yield Map(s -> Seq(p1, p2))
    val len2diff = for {
      i <- sites.indices; j <- sites.indices if i < j
      p1 <- prims; p2 <- prims
    } yield Map(sites(i) -> Seq(p1), sites(j) -> Seq(p2))
    // single-site depth 3 — reaches the release-vacancy window
    // (e.g. inBody: steal, age, claimB -> S releases a FOREIGN claim)
    val len3 = for (s <- sites; p1 <- prims; p2 <- prims; p3 <- prims)
      yield Map(s -> Seq(p1, p2, p3))
    val schedules = len0 ++ len1 ++ len2same ++ len2diff ++ len3

    val parent = JF.createTempDirectory(JP.get("target"), "clsearch")
      .toString
    var idx = 0
    val traces = scala.collection.mutable.Set[String]()
    var gapOverlaps = 0
    var warnedOverlaps = 0
    var graceOverlaps = 0
    for (init <- states; sch <- schedules) {
      idx += 1
      val (trace, cls) = runOne(parent, idx, init, sch)
      traces += trace
      if (cls == 1) gapOverlaps += 1
      if (cls == 2) warnedOverlaps += 1
      if (cls == 3) graceOverlaps += 1
    }
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(parent))

    info(s"${states.size * schedules.size} runs, ${traces.size} " +
      s"distinct executed traces; overlaps: $gapOverlaps via the " +
      s"glob-to-create gap (window 1), $warnedOverlaps loud-warned in " +
      s"S's run + $graceOverlaps grace-violation (loud at the " +
      s"violator's release) (window 2); all admissible")
    // the documented windows are REAL — the search must exercise each
    // class, otherwise the admissibility claim above is vacuous
    assert(gapOverlaps > 0,
      "the glob-to-create gap never produced an overlap — model or " +
        "probe changed; re-derive the window analysis")
    assert(warnedOverlaps > 0,
      "no warned overlap reached — the release-vacancy/ownership-" +
        "mismatch warning path is no longer exercised; re-derive the " +
        "window analysis")
    assert(graceOverlaps > 0,
      "no grace-violation overlap reached — the aged-out class is no " +
        "longer exercised; re-derive the window analysis")
  }
}
