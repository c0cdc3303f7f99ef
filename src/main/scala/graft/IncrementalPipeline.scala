package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Incremental, Retrieval}
import graft.sources.VersionedStore
import graft.streaming.ChangeStream

/** The incremental daily-ingest pipeline as ONE composed flow — the
  * production story the r11 seams exist for (r11 review item 3):
  *
  * {{{
  *   CDC stream ──ChangeStream.ingest──▶ changelog artifact (append-only)
  *                                            │
  *   publishDay (once per cycle):             ▼
  *     repair: heal any crash-torn derived state (see below)
  *     snapshot = VersionedStore.read(latest) + ChangeStream.logLatest
  *     ADDED keys → Dedup.deduplicateAgainst(BandIndex)   [i07 kernel]
  *     survivors + updates/deletes → Incremental.applyLatest [i02 kernel]
  *     → VersionedStore.publish (atomic flip, time-travel)
  *     → Dedup.appendBandIndex (committed batch, keyed by the version)
  *     → Retrieval.bm25StatsDelta (posting-stats fold, r06's twin)
  *       → published to its own versioned store, tagged `covered`
  *   serving:
  *     DocStream.matchBm25(arrivals, published stats)
  * }}}
  *
  * Composition laws, pinned in IncrementalPipelineSpec:
  *   - day-N published corpus ≡ an independent from-scratch batch replay
  *     of the same change files (inline dedup, fresh index per day,
  *     batch latest-wins) — across a checkpointed stream RESTART between
  *     the days;
  *   - maintained stats ≡ the from-scratch recount over the final corpus;
  *   - serving scores against the published stats ≡ batch scores against
  *     the from-scratch stats.
  *
  * CRASH COHERENCE (IncrementalRepairSpec pins every window): the corpus
  * publish is the transaction's commit point; the band index and the
  * serving stats are DERIVED state, re-derivable from the corpus store's
  * time-travel alone. A crash in any window —
  *
  *   1. after `VersionedStore.publish` flips to vN but before the index
  *      batch lands → the index misses vN's accepted adds (a later
  *      near-dup of them would sneak in);
  *   2. mid index append → an UNCOMMITTED batch directory (invisible to
  *      the loader by the `_COMMITTED` protocol — never torn);
  *   3. after the index commit but before the stats publish → stats lag
  *      the corpus, and a naive next-day fold would permanently skip the
  *      missed diff;
  *
  * — is healed by [[repair]], which runs at the top of every
  * [[publishDay]]: for each corpus version with no committed index batch
  * it rebuilds the batch from the snapshot diff (added keys between vN-1
  * and vN are EXACTLY the survivors the crashed run computed — the
  * deterministic replay), and it re-folds the stats from `covered` to the
  * corpus head using time-travel reads. Repair is idempotent (committed
  * batches are no-ops; the stats fold is keyed by `covered`) and
  * delta-proportional (each missing version costs one narrow key
  * anti-join plus fingerprinting of just the added docs).
  *
  * Dedup posture (the documented contracts):
  *   - the near-dup screen applies to ADDED keys only (new documents
  *     entering the corpus); updates and deletes to already-accepted keys
  *     are ownership operations and apply directly;
  *   - the band index is an accepted-content HISTORY: deleting a doc
  *     removes it from the snapshot but its fingerprints stay until the
  *     next full rebuild (tombstone posture — re-inserted duplicate
  *     content stays out), and an update's new text joins the index at
  *     the next rebuild;
  *   - screened-out adds are re-screened on later days (logLatest keeps
  *     reporting them) and re-dropped deterministically — idempotent,
  *     delta-proportional re-work, no state beyond the artifacts.
  *
  * Every per-day cost is delta-proportional: logLatest is one aggregate
  * over the (log-sized) artifact, the screen probes the band index
  * (BenchDelta's flat-in-corpus measurement), applyLatest anti-joins the
  * base against the (broadcastable) latest table, the stats fold
  * aggregates only removed/added docs, and the index append is
  * batch-sized blind writes.
  *
  * Concurrency contract, ENFORCED: [[publishDay]] holds an exclusive
  * `.cycle-claim` for its whole cycle (repair + screen + publish +
  * folds), and standalone [[repair]] takes the SAME claim — it is the
  * same read-fold-publish shape the claim exists to serialize, so a
  * repair racing a live cycle fails loudly in milliseconds instead of
  * double-folding the serving stats. On healthy state repair is a no-op,
  * so the usual pattern is to let the next publishDay run it.
  */
object IncrementalPipeline {

  /** Outcome of one publish cycle. */
  final case class DayState(
      corpusVersion: Int, statsVersion: Int, nCorpus: Long,
      nAccepted: Long, nScreenedOut: Long)

  /** Day 0: publish the base corpus, build its band index, freeze and
    * publish the serving stats. Crash windows here are healed by
    * [[repair]] too: the index base build writes its `meta` LAST (the
    * artifact is unreadable until complete, so a half-built base reads
    * as "no artifact" and is rebuilt fresh), and a missing stats store
    * is recounted from the corpus head.
    */
  def bootstrap(base: DataFrame, storeRoot: String, idxRoot: String,
      statsRoot: String): DayState = {
    val spark = base.sparkSession
    val docs = base.select("doc_id", "text")
    val v = VersionedStore.publish(docs, storeRoot)
    Dedup.writeBandIndex(docs, idxRoot, covered = v)
    val sv = publishStats(spark, statsRoot, Retrieval.bm25StatsOf(docs), v)
    DayState(v, sv, docs.count(), 0L, 0L)
  }

  /** One publish cycle over whatever the changelog artifact currently
    * holds (the stream keeps appending; this folds the latest state).
    * Starts with [[repair]], so a crash anywhere in the previous cycle's
    * post-publish maintenance is healed before the new screen runs.
    *
    * SINGLE-WRITER, ENFORCED: the cycle takes an exclusive
    * `.cycle-claim` marker under the store root (same atomic primitive
    * as the store's slot claims) and a concurrent publishDay fails
    * loudly in milliseconds. This is not just politeness — the
    * VersionedStore tolerates racing CORPUS publishes (distinct
    * versions, both readable), but the stats store is maintained by a
    * read-fold-publish: two interleaved cycles can fold the SAME
    * snapshot diff twice (B loads stats after A's publish but diffs
    * from the base it read before), leaving stats whose `covered` tag
    * equals the corpus head — silently wrong, invisible to [[repair]].
    * A crashed cycle's marker is swept once it ages past
    * `cycleClaimGraceMs` (the next day's run heals the torn state via
    * [[repair]] as usual).
    */
  def publishDay(spark: SparkSession, storeRoot: String, idxRoot: String,
      statsRoot: String, logDir: String,
      jaccardThreshold: Double = 0.6,
      cycleClaimGraceMs: Long = 6L * 3600 * 1000): DayState =
    withCycleClaim(spark, storeRoot, cycleClaimGraceMs, "a publishDay")(
      publishDayExclusive(spark, storeRoot, idxRoot, statsRoot, logDir,
        jaccardThreshold))

  /** Take the store's exclusive `.cycle-claim` (sweeping one aged past
    * `graceMs` — a crashed holder's debris), run `body`, release. The
    * claim uses the store's kernel-atomic create primitive, so two
    * processes cannot both hold it. Everything that read-fold-publishes
    * the derived stores (a publish cycle, a standalone repair) runs under
    * this claim — IncrementalRepairSpec pins both refusals.
    *
    * GRACE CONTRACT (same discipline as [[VersionedStore.expire]]'s
    * debris grace): `graceMs` must exceed the longest cycle that can
    * legitimately run — the claim's mtime is stamped once at acquisition
    * and never refreshed, so a body that outlives the grace looks like
    * crash debris to the next caller and loses its exclusion. The 6 h
    * default buys hours of headroom over any measured cycle; raise it
    * before it becomes tight, don't add a heartbeat. The flip side: a
    * hard-crashed cycle's debris refuses standalone [[repair]] until the
    * grace elapses — an operator who KNOWS no cycle is live can pass
    * `cycleClaimGraceMs = 0` to sweep immediately (with a live cycle
    * that would enable the very double-fold the claim prevents, so the
    * default stays conservative).
    *
    * Two guards contain the sweep's residual races: a sweeper that wins
    * the stale-marker rename re-checks the moved file's age and RESTORES
    * it (refusing itself) if it turns out to be a successor's fresh
    * claim stolen in the stat-to-rename window, and every claim carries
    * its holder's UUID stamp so release deletes only the holder's own
    * marker — a grace-violating cycle warns loudly instead of killing
    * its successor's claim. IncrementalRepairSpec pins both.
    */
  /** Test seam (IncrementalRepairSpec): runs between the staleness stat
    * and the sweep rename — the TOCTOU window the steal-guard below
    * contains. Production never sets it.
    */
  private[graft] var cycleClaimSweepHook: () => Unit = () => ()

  /** Test seam (ClaimScheduleSpec): runs between the fresh-steal probe
    * and the claim create — the probe's own glob-to-create gap, the
    * first of the two documented residual windows. Production never
    * sets it.
    */
  private[graft] var cycleClaimPreClaimHook: () => Unit = () => ()

  /** Test seam (ClaimScheduleSpec): runs inside release's atomic TAKE,
    * after the claim was renamed out (path momentarily VACANT) and
    * before the ownership inspection/restore — the second documented
    * residual window (third claimant entering the vacancy). Production
    * never sets it.
    */
  private[graft] var cycleClaimReleaseHook: () => Unit = () => ()

  private[graft] def withCycleClaim[T](spark: SparkSession, storeRoot: String,
      graceMs: Long, who: String)(body: => T): T = {
    val rp = new org.apache.hadoop.fs.Path(storeRoot)
    val f = rp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.mkdirs(rp)
    val claim = new org.apache.hadoop.fs.Path(rp, ".cycle-claim")
    def refuse(): Nothing = throw new IllegalStateException(
      s"another cycle holds $claim and $who folds the same derived " +
        "state — concurrent read-fold-publish can double-fold the " +
        "serving stats. If the holder crashed, the marker sweeps " +
        s"itself after ${graceMs} ms (or delete it once you are sure " +
        "no cycle is in flight).")
    // reclaim aged sibling debris nothing else owns: a sweeper that
    // crashed between its rename and age-check strands `.swept-*`, a
    // stamper killed mid-link strands `.stamp-*`. Age-gated by the SAME
    // grace as the claim itself — a fresh `.swept-*` may be a live
    // sweeper's in-flight steal whose restore must not be starved.
    try {
      val now0 = System.currentTimeMillis()
      Seq(".cycle-claim.swept-*", "..cycle-claim.stamp-*",
        ".cycle-claim.rel-*").foreach { pat =>
        Option(f.globStatus(new org.apache.hadoop.fs.Path(rp, pat)))
          .getOrElse(Array.empty)
          .filter(s => now0 - s.getModificationTime >= graceMs)
          .foreach(s => f.delete(s.getPath, false))
      }
    } catch { case _: java.io.IOException => () }
    // a FRESH .swept-* sibling means a sweeper is MID-STEAL of a live
    // claim (rename preserves mtime, so sweeping a genuinely stale claim
    // produces OLD debris, deleted moments later; only a stolen fresh
    // claim yields fresh debris). The claim path may be momentarily
    // vacant while the stolen claim's owner still runs its body —
    // claiming into that vacuum would run two bodies concurrently, so
    // refuse instead (retry after the steal resolves, milliseconds).
    // This narrows the three-party window to this probe's own
    // glob-to-create gap; the grace contract bounds what remains.
    def freshStealInFlight: Boolean =
      try Option(f.globStatus(new org.apache.hadoop.fs.Path(rp,
        ".cycle-claim.swept-*"))).getOrElse(Array.empty)
        .exists(s => System.currentTimeMillis() - s.getModificationTime < graceMs)
      catch { case _: java.io.IOException => false }
    // the claim may vanish between probe and stat (a finishing cycle's
    // release) — that just means it is not stale
    val stale =
      try System.currentTimeMillis() -
        f.getFileStatus(claim).getModificationTime >= graceMs
      catch { case _: java.io.FileNotFoundException => false }
    if (stale) {
      cycleClaimSweepHook()
      // crashed cycle's debris, aged past grace. The sweep must be
      // atomic-per-sweeper: two callers racing here could BOTH judge the
      // old marker stale, and a plain delete lets the slower one remove
      // the faster one's FRESH claim (two live cycles — the double-fold).
      // Renaming the stale marker to a unique name first means exactly
      // one sweeper wins; the loser falls through to exclusiveCreate and
      // is refused by the winner's new claim.
      val debris = new org.apache.hadoop.fs.Path(rp,
        s".cycle-claim.swept-${java.util.UUID.randomUUID()}")
      if (try f.rename(claim, debris)
        catch { case _: java.io.IOException => false }) {
        // TOCTOU guard: the rename moved whatever sat at the claim path
        // AT RENAME TIME, not the file the staleness stat judged — if
        // the crashed-looking holder released in between and a NEW cycle
        // claimed, we just stole that cycle's FRESH claim. Fresh debris
        // (younger than the grace) is exactly that case: put it back and
        // refuse ourselves rather than run two live cycles.
        val debrisAge =
          try System.currentTimeMillis() -
            f.getFileStatus(debris).getModificationTime
          catch { case _: java.io.FileNotFoundException => Long.MaxValue }
        if (debrisAge < graceMs) {
          // restore WITHOUT overwrite: if the stolen claim's owner (or a
          // third claimant) re-created the path meanwhile, clobbering it
          // would orphan THAT claim — refuse and leave the path alone
          val restored = VersionedStore.renameNoReplace(f, debris, claim)
          if (!restored) {
            // a refused restore has two causes, and only one permits
            // dropping the stolen marker: if the claim path is OCCUPIED,
            // a third caller claimed into the window — its claim stands
            // and refuses everyone, so the stolen stamp is droppable
            // (its holder's release detects the ownership mismatch and
            // warns loud). If the path is VACANT (the restore primitive
            // itself failed — a linkless mount, a transient IO error),
            // the debris IS the live owner's only claim: deleting it
            // would admit the next acquirer concurrently with the
            // owner's running body (the double-fold). Leave it — fresh
            // .swept-* refuses acquirers via the mid-steal probe, the
            // owner's release reclaims it by stamp, and the aged sweep
            // is the backstop. Observing occupied stale is the SAFE
            // direction: we only delete when a standing claim refuses
            // everyone anyway.
            val occupied = try f.exists(claim)
              catch { case _: java.io.IOException => false }
            if (occupied) {
              System.err.println(s"withCycleClaim: WARNING stole a fresh " +
                s"claim at $claim and could not restore it — a concurrent " +
                "claimant raced the stale-sweep window")
              try f.delete(debris, false)
              catch { case _: java.io.IOException => () }
            } else
              System.err.println(s"withCycleClaim: WARNING stole a fresh " +
                s"claim at $claim and the no-clobber restore failed with " +
                s"the path vacant — leaving $debris for its owner's " +
                "release (acquisitions refuse while it is fresh)")
          }
          refuse()
        }
        f.delete(debris, false)
      }
    }
    // the claim is created WITH its ownership stamp in one atomic step
    // (hard-link publish on file://): a claim visible to any sweeper
    // always carries its holder's identity. Creating first and stamping
    // second left an empty-marker window a 20x-looped two-thread race
    // actually hit — a sweeper stole the empty marker, the owner's
    // stamp re-created the path, the restore rename clobbered it, and
    // the claim leaked unreleased until the grace.
    val me = java.util.UUID.randomUUID().toString
    if (freshStealInFlight) refuse()
    cycleClaimPreClaimHook()
    if (!VersionedStore.exclusiveCreateStamped(f, claim, me)) refuse()
    try body
    finally {
      // release ONLY what we own — by ATOMIC TAKE, not read-then-delete:
      // rename the claim out to a unique name and inspect the moved
      // file. Reading in place and then deleting had a window where a
      // sweeper (rightly, after a grace violation) replaced our claim
      // between the read and the delete, and the delete killed the LIVE
      // successor. The rename takes exactly one file; a foreign stamp
      // is put back with the atomic no-clobber link restore.
      // Returns true when the claim path was occupied and dealt with.
      def takeAndRelease(): Boolean = {
        val rel = new org.apache.hadoop.fs.Path(rp,
          s".cycle-claim.rel-${java.util.UUID.randomUUID()}")
        val taken = try f.rename(claim, rel)
          catch { case _: java.io.IOException => false }
        if (taken) cycleClaimReleaseHook()
        if (!taken) false
        else if (VersionedStore.rawControlRead(f, rel).contains(me)) {
          f.delete(rel, false); true
        } else {
          // we took a live SUCCESSOR's claim (ours was swept after a
          // grace violation): restore it atomically; a failed restore
          // means a third claimant raced into the brief vacancy — leave
          // the moved stamp for the aged sweep and warn loud either way
          if (VersionedStore.renameNoReplace(f, rel, claim))
            System.err.println(s"withCycleClaim: WARNING $claim was not " +
              s"ours (${me.take(8)}) at release — this cycle outlived " +
              s"the ${graceMs} ms grace; restored the successor's claim")
          else {
            // same two-cause split as the sweep arm's steal-guard: an
            // OCCUPIED path means a third claimant stands (it refuses
            // everyone — park the successor's stamp in .rel-* for the
            // aged sweep); a VACANT path means the restore primitive
            // itself failed (linkless mount, transient IO), and leaving
            // only a .rel-* would let the next acquirer run concurrently
            // with the successor's live body — re-park it as FRESH
            // .swept-* debris, which the mid-steal probe refuses and the
            // successor's own release reclaims by stamp.
            val occupied = try f.exists(claim)
              catch { case _: java.io.IOException => false }
            if (!occupied) {
              val swept = new org.apache.hadoop.fs.Path(rp,
                s".cycle-claim.swept-${java.util.UUID.randomUUID()}")
              def park(): Boolean = try f.rename(rel, swept)
                catch { case _: java.io.IOException => false }
              val parked = park() || park() // one retry on a transient
              if (parked)
                System.err.println(s"withCycleClaim: WARNING took a " +
                  s"foreign claim at $claim during release and the " +
                  s"no-clobber restore failed with the path vacant — " +
                  s"successor's stamp parked at $swept (acquisitions " +
                  "refuse while it is fresh)")
              else
                // the stamp stays at .rel-*, which the mid-steal probe
                // does NOT glob — say so instead of claiming a refusal
                // that will not happen
                System.err.println(s"withCycleClaim: WARNING took a " +
                  s"foreign claim at $claim during release, the restore " +
                  s"AND the re-park both failed — successor's stamp left " +
                  s"at $rel for the aged sweep; concurrent cycles are " +
                  "possible until the grace elapses")
            } else
              System.err.println(s"withCycleClaim: WARNING took a foreign " +
                s"claim at $claim during release and a third claimant " +
                s"raced into the vacancy — successor's stamp left at $rel " +
                "for the aged sweep; concurrent cycles are possible until " +
                "the grace elapses")
          }
          true
        }
      }
      if (!takeAndRelease()) {
        // claim path vacant: a sweeper may be MID-STEAL of our claim
        // (the 20x loop caught its restore resurrecting a claim whose
        // owner had exited — a leak until the grace). Reclaim swept
        // debris stamped with OUR id — starving the restore — then
        // re-take once for a restore that landed first.
        var starved = false
        try Option(f.globStatus(
          new org.apache.hadoop.fs.Path(rp, ".cycle-claim.swept-*")))
          .getOrElse(Array.empty)
          .foreach { s =>
            if (VersionedStore.rawControlRead(f, s.getPath).contains(me)) {
              f.delete(s.getPath, false); starved = true
            }
          }
        catch { case _: java.io.IOException => () }
        if (!takeAndRelease() && !starved)
          // nothing of ours anywhere: the claim was swept as stale AND
          // its debris aged out — only a grace violation gets here
          System.err.println(s"withCycleClaim: WARNING $claim already " +
            s"gone at release (${me.take(8)}) — this cycle outlived the " +
            s"${graceMs} ms grace and its claim was swept")
      }
    }
  }

  private def publishDayExclusive(spark: SparkSession, storeRoot: String,
      idxRoot: String, statsRoot: String, logDir: String,
      jaccardThreshold: Double): DayState = {
    // the repair probe (heals DERIVED state: band index, stats) and the
    // change-log read touch disjoint roots — overlapped (guide §2.6);
    // `base` still reads the corpus only after repair returned, and the
    // screen below only runs after the healed index is in place
    val (_, latest) = graft.Par.both(
      () => repairUnclaimed(spark, storeRoot, idxRoot, statsRoot),
      // log-sized; several legs below re-derive it
      () => ChangeStream.logLatest(spark, logDir).localCheckpoint())
    val base = VersionedStore.read(spark, storeRoot).select("doc_id", "text")
    val baseKeys = base.select("doc_id")

    // screen ADDED keys (new documents) against the accepted corpus via
    // the materialized band index — the i07 kernel, delta-proportional
    val addCands = latest.filter(col("op") =!= "D")
      .join(baseKeys, Seq("doc_id"), "left_anti")
      .select("doc_id", "text")
    // tracked variant: the screen's internal snapshots (fresh + candidate
    // pairs) are released as soon as `survivors` is eagerly checkpointed —
    // a per-day publish loop no longer accumulates them until the
    // ContextCleaner gets around to GC (r16 ADVICE item)
    val (survivorsLazy, screenCkptIds) = Dedup.deduplicateAgainstTracked(
      addCands, Dedup.loadBandIndex(spark, idxRoot), jaccardThreshold,
      Dedup.BandIndexInListMax)
    // (r17 A/B note: overlapping this checkpoint with the fold's
    // existing-key leg CONSTRUCTION measured neutral-to-worse — the
    // fold gap's bulk is the union/applyLatest analysis that needs
    // `survivors` — so the fold stays sequential, measured not assumed.)
    val survivors = survivorsLazy.localCheckpoint()
    graft.Checkpoints.free(spark, screenCkptIds)

    // fold: existing-key rows (updates/deletes) + accepted adds
    val applicable = latest
      .join(baseKeys, Seq("doc_id"), "left_semi")
      .unionByName(latest
        .join(survivors.select("doc_id"), Seq("doc_id"), "left_semi"))
    val applied = Incremental.applyLatest(base, applicable).localCheckpoint()

    // exact stats fold from the narrow snapshot diff (i01's shape).
    // The fold and the corpus publish are independent — `base` is pinned
    // to the pre-publish version directory at read() time and `applied`
    // is checkpointed, so the fold's aggregates cannot observe the new
    // version — and each was a driver-sequential barrier; overlapped
    // (guide §2.6). Same for the two derived-state writes after the
    // publish (disjoint roots) and the three summary counts (cached
    // checkpoints). All inside the cycle claim, so the single-writer
    // contract is untouched.
    val (removed, added) = snapshotDiff(base, applied)
    val (newStats, v) = graft.Par.both(
      () => Retrieval.bm25StatsDelta(loadStats(spark, statsRoot),
        removed, added),
      () => VersionedStore.publish(applied, storeRoot))
    val (_, sv, counts) = graft.Par.three(
      () => Dedup.appendBandIndex(survivors, idxRoot,
        VersionedStore.versionDirName(v)),
      () => publishStats(spark, statsRoot, newStats, v),
      () => {
        val nSurv = survivors.count()
        (applied.count(), nSurv, addCands.count() - nSurv)
      })
    DayState(v, sv, counts._1, counts._2, counts._3)
  }

  /** Heal crash-torn derived state: for every corpus version newer than
    * the band index's committed coverage, rebuild the index batch from
    * the corpus snapshot diff; if the serving stats lag the corpus head,
    * fold the missed diff (or recount from scratch when the stats store
    * is missing/untagged). Idempotent; no-op on healthy state. Requires
    * the corpus versions it must diff to still exist — keep
    * [[VersionedStore.expire]]'s horizon at least as long as the longest
    * outage this must heal across (it fails loudly otherwise).
    *
    * Standalone repair takes the store's exclusive `.cycle-claim` (same
    * primitive, same grace sweep as [[publishDay]]): it mutates the same
    * derived state a live cycle folds, so racing one is refused loudly
    * rather than risking a double fold. [[publishDay]] runs the unclaimed
    * body directly — its own claim already covers it. Consequence: a
    * hard-crashed cycle's claim debris refuses standalone repair until
    * the grace elapses; pass `cycleClaimGraceMs = 0` to heal immediately
    * when you KNOW no cycle is live (the next publishDay's built-in
    * repair needs no such judgment — it waits out the grace naturally).
    */
  def repair(spark: SparkSession, storeRoot: String, idxRoot: String,
      statsRoot: String,
      cycleClaimGraceMs: Long = 6L * 3600 * 1000): Unit =
    withCycleClaim(spark, storeRoot, cycleClaimGraceMs,
      "a standalone repair")(
      repairUnclaimed(spark, storeRoot, idxRoot, statsRoot))

  private def repairUnclaimed(spark: SparkSession, storeRoot: String,
      idxRoot: String, statsRoot: String): Unit = {
    val vLatest = VersionedStore.latestVersion(spark, storeRoot)
      .getOrElse(return) // nothing published yet: nothing to heal
    val avail = VersionedStore.versions(spark, storeRoot).toSet

    def docsAt(n: Int): DataFrame = {
      require(avail.contains(n),
        s"repair needs corpus ${VersionedStore.versionDirName(n)} at " +
          s"$storeRoot but it was expired — keep expire()'s horizon " +
          "longer than the outage window")
      VersionedStore.read(spark, storeRoot, Some(n)).select("doc_id", "text")
    }
    def addedBetween(a: Int, b: Int): DataFrame =
      docsAt(b).join(docsAt(a).select("doc_id"), Seq("doc_id"), "left_anti")

    // ---- band index: base must exist (meta is written last, so a torn
    //      bootstrap build reads as no-artifact and rebuilds fresh).
    //      ONLY the missing-artifact signal (AnalysisException from the
    //      absent meta relation) means "no base" — any other exception
    //      (transient FS/read error) rethrows and fails the cycle, so a
    //      flaky read cannot silently trigger a full base rebuild.
    val hasBase =
      try { Dedup.bandIndexCovered(spark, idxRoot) >= -1 }
      catch { case _: org.apache.spark.sql.AnalysisException => false }
    if (!hasBase) {
      // writeBandIndex itself sweeps any stale committed batches: the
      // fresh base at vLatest covers everything they carried
      Dedup.writeBandIndex(docsAt(vLatest), idxRoot, covered = vLatest)
    } else {
      val baseCovered = Dedup.bandIndexCovered(spark, idxRoot)
      require(baseCovered >= 0,
        s"$idxRoot is not pipeline-managed (covered=$baseCovered): repair " +
          "cannot infer which corpus version its base build reflects")
      require(baseCovered <= vLatest,
        s"band index at $idxRoot covers v$baseCovered AHEAD of corpus " +
          s"head v$vLatest — corpus store rolled back? re-point or " +
          "rebuild the index, or future docs would wrongly screen out " +
          "re-inserted texts")
      val committed = Dedup.bandIndexBatches(spark, idxRoot)
        .flatMap(parseVersionDir).toSet
      ((baseCovered + 1) to vLatest)
        .filterNot(committed.contains)
        .foreach { n =>
          // added keys between vN-1 and vN = exactly the survivors the
          // crashed cycle accepted: the deterministic replay
          Dedup.appendBandIndex(addedBetween(n - 1, n), idxRoot,
            VersionedStore.versionDirName(n))
        }
    }

    // ---- serving stats: fold covered → head via time-travel
    statsCovered(spark, statsRoot) match {
      case Some(w) if w == vLatest => // healthy
      case Some(w) if w < vLatest =>
        val (removed, added) = snapshotDiff(docsAt(w), docsAt(vLatest))
        publishStats(spark, statsRoot,
          Retrieval.bm25StatsDelta(loadStats(spark, statsRoot),
            removed, added), vLatest)
      case Some(w) =>
        throw new IllegalStateException(
          s"stats at $statsRoot cover v$w AHEAD of corpus head v$vLatest " +
            "— corpus store rolled back? re-point or rebuild the stats")
      case None => // missing or untagged: recount from the corpus head
        publishStats(spark, statsRoot,
          Retrieval.bm25StatsOf(docsAt(vLatest)), vLatest)
    }
  }

  /** (removed, added) between two snapshots by key + text hash — rows
    * whose key vanished/changed, and rows whose key is new/changed.
    */
  private def snapshotDiff(before: DataFrame, after: DataFrame)
      : (DataFrame, DataFrame) = {
    val k1 = before.select(col("doc_id"), col("text"), md5(col("text")).as("h1"))
    val k2 = after.select(col("doc_id"), col("text"), md5(col("text")).as("h2"))
    val removed = k1
      .join(k2.select(col("doc_id"), col("h2")), Seq("doc_id"), "left_outer")
      .filter(col("h2").isNull || col("h2") =!= col("h1"))
      .select("doc_id", "text")
    val added = k2
      .join(k1.select(col("doc_id"), col("h1")), Seq("doc_id"), "left_outer")
      .filter(col("h1").isNull || col("h1") =!= col("h2"))
      .select("doc_id", "text")
    (removed, added)
  }

  // CANONICAL names only, same round-trip contract as VersionedStore's
  // parser: a stray alias dir ("v1" for "v00001") must NOT count as
  // committed coverage for that version, or its repair would be skipped
  private def parseVersionDir(name: String): Option[Int] =
    if (name.length >= 2 && name.length <= 11 && name.charAt(0) == 'v' &&
      name.drop(1).forall(_.isDigit)) {
      val v = name.drop(1).toLong
      if (v <= Int.MaxValue &&
        VersionedStore.versionDirName(v.toInt) == name) Some(v.toInt)
      else None
    } else None

  /** Publish frozen serving stats as a 1-row versioned relation, tagged
    * with the corpus version they COVER — the lineage [[repair]] keys its
    * catch-up fold by. Corpus version and stats version advance in
    * lockstep when driven through [[bootstrap]]/[[publishDay]].
    */
  def publishStats(spark: SparkSession, statsRoot: String,
      stats: (Long, Long, Seq[Long]), covered: Int): Int = {
    val row = spark.range(1).select(
      lit(stats._1).as("n_total"), lit(stats._2).as("sum_dl"),
      array(stats._3.map(lit(_)): _*).as("dfs"),
      lit(covered).as("covered"))
    VersionedStore.publish(row, statsRoot)
  }

  /** Load published serving stats (the pointer's version by default). */
  def loadStats(spark: SparkSession, statsRoot: String,
      version: Option[Int] = None): (Long, Long, Seq[Long]) = {
    val r = VersionedStore.read(spark, statsRoot, version).head()
    (r.getAs[Long]("n_total"), r.getAs[Long]("sum_dl"),
      r.getAs[scala.collection.Seq[Long]]("dfs").toVector)
  }

  /** The corpus version the published stats cover: None when no stats
    * are published or the row predates the `covered` tag (either way,
    * [[repair]] recounts from scratch).
    */
  def statsCovered(spark: SparkSession, statsRoot: String): Option[Int] =
    VersionedStore.latestVersion(spark, statsRoot).flatMap { _ =>
      val df = VersionedStore.read(spark, statsRoot)
      if (df.columns.contains("covered"))
        Some(df.head().getAs[Int]("covered"))
      else None
    }
}
