package graft

import java.nio.file.{Files => JF, Paths => JP}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Crash coherence of the incremental publish path
  * ([[IncrementalPipeline.repair]]): the corpus publish is the commit
  * point; the band index and serving stats are derived state that a crash
  * can strand behind it. Each test reproduces the exact on-disk state a
  * JVM kill leaves in one crash window, then proves the next publish
  * cycle heals it to BIT-IDENTICAL state with an uncrashed twin pipeline
  * fed the same changes:
  *
  *  - window 1 — after `VersionedStore.publish`, before the index batch
  *    lands: the missing batch is rebuilt from the corpus snapshot diff,
  *    so a day-2 near-dup of a day-1 accepted doc is STILL screened out;
  *  - window 2 — mid `appendBandIndex` (torn batch, no `_COMMITTED`):
  *    invisible to the loader, deleted and rebuilt by repair;
  *  - window 3 — after the index commit, before the stats publish: the
  *    missed diff is re-folded from time-travel reads, including a
  *    MULTI-version lag folded in one pass;
  *  - bootstrap crash — corpus published, index/stats never built: both
  *    are rebuilt from the corpus head (the index base writes `meta`
  *    last, so a half-built base reads as no-artifact).
  */
class IncrementalRepairSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = EngineSession.local("4")
  val sf = "/root/testdata/sf0.001"

  override def afterAll(): Unit = spark.stop()

  private def tmp(prefix: String): String =
    JF.createTempDirectory(JP.get("target"), prefix).toString

  private def ids(df: DataFrame): Set[Long] =
    df.select("doc_id").collect().map(_.getLong(0)).toSet

  private def hashes(df: DataFrame): Set[(Long, String)] =
    df.select(col("doc_id"), md5(col("text")).as("h"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet

  /** Append changes to a changelog artifact exactly as
    * [[streaming.ChangeStream.ingest]]'s foreachBatch does.
    */
  private def appendLog(logDir: String, batchId: Long,
      changes: Seq[(Long, Int, String, String)]): Unit = {
    import spark.implicits._
    changes.toDF("doc_id", "seq", "op", "text")
      .withColumn("batch_id", lit(batchId))
      .coalesce(1).write.mode("append").parquet(logDir)
  }

  private case class Roots(store: String, idx: String, stats: String,
      log: String)
  private def freshRoots(tag: String): Roots =
    Roots(tmp(s"rep-$tag-store"), tmp(s"rep-$tag-idx"),
      tmp(s"rep-$tag-stats"), tmp(s"rep-$tag-log"))

  private def day(r: Roots): IncrementalPipeline.DayState =
    IncrementalPipeline.publishDay(spark, r.store, r.idx, r.stats, r.log)

  test("crash windows 1+2+3 heal to the uncrashed twin across two days") {
    val base = Tables.documents(spark, sf)
      .filter(col("doc_id") < 200).select("doc_id", "text").localCheckpoint()
    val freshA = "completely fresh document text with unique vocabulary " +
      "tokens arriving on day one of the incremental ingest cycle"
    val baseText3 = base.filter(col("doc_id") === 3L)
      .head().getAs[String]("text")
    val day1 = Seq(
      (100001L, 1, "I", freshA), // accept
      (100002L, 1, "I", baseText3 + " appended"), // near-dup of base 3: drop
      (5L, 2, "U", "doc five rewritten for day one with new words"),
      (7L, 2, "D", ""))
    val day2 = Seq(
      (200001L, 1, "I", freshA + " trailing"), // near-dup of ACCEPTED 100001
      (200002L, 1, "I", "day two genuinely new content nothing shared"),
      (5L, 3, "U", "doc five rewritten again on day two differently"))

    val clean = freshRoots("clean")
    val crash = freshRoots("crash")
    Seq(clean, crash).foreach { r =>
      IncrementalPipeline.bootstrap(base, r.store, r.idx, r.stats)
      appendLog(r.log, 0L, day1)
    }
    val c1 = day(clean)
    val x1 = day(crash)
    assert(c1.corpusVersion === 2 && x1.corpusVersion === 2)
    assert(x1.nAccepted === 1L && x1.nScreenedOut === 1L)

    // ---- inject the crash windows on the crashed pipeline, as if the
    //      day-1 run died right after its corpus publish:
    // window 1: the v00002 index batch never landed — replace it with
    // window 2's variant, a TORN directory (texts only, no _COMMITTED)
    val fs = new org.apache.hadoop.fs.Path(crash.idx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val b2 = new org.apache.hadoop.fs.Path(s"${crash.idx}/batches/v00002")
    fs.delete(b2, true)
    spark.range(1).select(lit(0L).as("text_hash"), lit("torn").as("text"))
      .write.parquet(s"$b2/texts")
    assert(operators.Dedup.bandIndexBatches(spark, crash.idx).isEmpty)
    // window 3: the day-1 stats publish never happened — pointer back to
    // the bootstrap stats (covering corpus v1)
    sources.VersionedStore.rollback(spark, crash.stats, 1)
    assert(IncrementalPipeline.statsCovered(spark, crash.stats) === Some(1))

    // ---- day 2 on both; the crashed pipeline must first heal itself
    Seq(clean, crash).foreach(r => appendLog(r.log, 1L, day1 ++ day2))
    val c2 = day(clean)
    val x2 = day(crash)
    assert(c2.corpusVersion === 3 && x2.corpusVersion === 3)

    val cleanPub = sources.VersionedStore.read(spark, clean.store)
    val crashPub = sources.VersionedStore.read(spark, crash.store)
    assert(hashes(crashPub) === hashes(cleanPub),
      "healed pipeline's corpus ≡ uncrashed twin")
    assert(!ids(crashPub).contains(200001L),
      "near-dup of the day-1 accepted doc must be screened by the " +
        "REPAIRED index batch")
    assert(ids(crashPub).contains(200002L))
    assert(IncrementalPipeline.loadStats(spark, crash.stats) ===
      operators.Retrieval.bm25StatsOf(crashPub),
      "healed stats ≡ from-scratch recount")
    assert(IncrementalPipeline.loadStats(spark, crash.stats) ===
      IncrementalPipeline.loadStats(spark, clean.stats))
  }

  test("multi-version stats lag folds to the head in one repair pass") {
    val base = Tables.documents(spark, sf)
      .filter(col("doc_id") < 100).select("doc_id", "text").localCheckpoint()
    val r = freshRoots("lag")
    IncrementalPipeline.bootstrap(base, r.store, r.idx, r.stats)
    appendLog(r.log, 0L, Seq(
      (300001L, 1, "I", "first added document with novel words entirely")))
    day(r)
    appendLog(r.log, 1L, Seq(
      (300001L, 1, "I", "first added document with novel words entirely"),
      (300002L, 1, "I", "second added document also completely unrelated"),
      (3L, 2, "D", "")))
    day(r)
    // stats now cover v3; strand them two versions back (bootstrap's v1)
    sources.VersionedStore.rollback(spark, r.stats, 1)
    assert(IncrementalPipeline.statsCovered(spark, r.stats) === Some(1))
    IncrementalPipeline.repair(spark, r.store, r.idx, r.stats)
    val pub = sources.VersionedStore.read(spark, r.store)
    assert(IncrementalPipeline.statsCovered(spark, r.stats) === Some(3))
    assert(IncrementalPipeline.loadStats(spark, r.stats) ===
      operators.Retrieval.bm25StatsOf(pub))
  }

  test("bootstrap crash (corpus published, index+stats never built) " +
    "rebuilds both from the corpus head") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "one two three four five six seven eight nine ten eleven"))
      .toDF("doc_id", "text")
    val r = freshRoots("boot")
    sources.VersionedStore.publish(docs, r.store) // ...and the JVM dies
    IncrementalPipeline.repair(spark, r.store, r.idx, r.stats)
    assert(operators.Dedup.bandIndexCovered(spark, r.idx) === 1)
    assert(IncrementalPipeline.statsCovered(spark, r.stats) === Some(1))
    assert(IncrementalPipeline.loadStats(spark, r.stats) ===
      operators.Retrieval.bm25StatsOf(docs))
    // the rebuilt index screens an exact copy of a base doc
    val probe = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (11L, "wholly new material sharing nothing with the base corpus"))
      .toDF("doc_id", "text")
    assert(ids(operators.Dedup.deduplicateAgainst(
      probe, operators.Dedup.loadBandIndex(spark, r.idx), 0.6)) === Set(11L))
  }

  test("repair refuses an index it cannot reason about (unversioned " +
    "covered) and a stats store ahead of the corpus") {
    import spark.implicits._
    val docs = Seq((1L, "some document text here for the tiny store"))
      .toDF("doc_id", "text")
    val r = freshRoots("guard")
    sources.VersionedStore.publish(docs, r.store)
    operators.Dedup.writeBandIndex(docs, r.idx) // covered = -1: not ours
    val e = intercept[IllegalArgumentException] {
      IncrementalPipeline.repair(spark, r.store, r.idx, r.stats)
    }
    assert(e.getMessage.contains("not pipeline-managed"))

    val r2 = freshRoots("ahead")
    sources.VersionedStore.publish(docs, r2.store)
    operators.Dedup.writeBandIndex(docs, r2.idx, covered = 1)
    IncrementalPipeline.publishStats(spark, r2.stats,
      operators.Retrieval.bm25StatsOf(docs), covered = 99)
    val e2 = intercept[IllegalStateException] {
      IncrementalPipeline.repair(spark, r2.store, r2.idx, r2.stats)
    }
    assert(e2.getMessage.contains("AHEAD of corpus head"))
  }

  test("repair refuses an index AHEAD of the corpus head (rolled-back " +
    "store), and an alias-named batch dir cannot suppress a repair") {
    import spark.implicits._
    // (a) index covered=5 over a corpus whose head is v1: future docs in
    // the index would wrongly screen out re-inserted texts — refuse loudly
    val r = freshRoots("ahead-idx")
    val docs2 = Seq((1L, "some document text here for the tiny store"))
      .toDF("doc_id", "text")
    sources.VersionedStore.publish(docs2, r.store)
    operators.Dedup.writeBandIndex(docs2, r.idx, covered = 5)
    val e = intercept[IllegalArgumentException] {
      IncrementalPipeline.repair(spark, r.store, r.idx, r.stats)
    }
    assert(e.getMessage.contains("AHEAD of corpus head"))

    // (b) canonical batch names only: a committed batch dir named "v002"
    // must NOT count as coverage for version 2 — if it did, a missing
    // canonical v00002 batch would never be rebuilt
    val r2 = freshRoots("alias")
    val base = Seq(
      (1L, "alpha document body with several plain tokens inside"),
      (2L, "beta document body with other plain tokens inside")
    ).toDF("doc_id", "text")
    IncrementalPipeline.bootstrap(base, r2.store, r2.idx, r2.stats)
    val freshC = "a genuinely fresh third document about nothing else"
    appendLog(r2.log, 0L, Seq((3L, 1, "I", freshC)))
    day(r2) // v2 published; committed batch v00002 carries doc 3
    assert(operators.Dedup.bandIndexBatches(spark, r2.idx) === Seq("v00002"))

    // crash simulation: the canonical batch vanishes; an alias-named
    // committed dir for "the same version" appears (operator mistake,
    // foreign tooling — any stray dir that a sloppy digit-parse would
    // accept as version 2)
    val bfs = new org.apache.hadoop.fs.Path(r2.idx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    bfs.delete(new org.apache.hadoop.fs.Path(s"${r2.idx}/batches/v00002"), true)
    operators.Dedup.appendBandIndex(
      Seq.empty[(Long, String)].toDF("doc_id", "text"), r2.idx, "v002")
    assert(operators.Dedup.bandIndexBatches(spark, r2.idx) === Seq("v002"))

    IncrementalPipeline.repair(spark, r2.store, r2.idx, r2.stats)
    assert(operators.Dedup.bandIndexBatches(spark, r2.idx)
      .contains("v00002"),
      "repair must rebuild the canonical batch despite the alias dir")
    // and the rebuilt batch really screens: a near-dup of doc 3 drops
    val kept = operators.Dedup.deduplicateAgainst(
      Seq((99L, freshC + " trailing")).toDF("doc_id", "text"),
      operators.Dedup.loadBandIndex(spark, r2.idx), 0.6)
    assert(kept.count() === 0L)
  }

  test("TWO REAL JVMs racing publishDay over a STALE claim: the " +
    "rename-atomic sweep admits exactly one at a time, stats never " +
    "double-fold") {
    import spark.implicits._
    val abs = (p: String) => new java.io.File(p).getAbsolutePath
    val r0 = freshRoots("jvmrace")
    val r = Roots(abs(r0.store), abs(r0.idx), abs(r0.stats), abs(r0.log))
    val base = Seq(
      (1L, "alpha document body with several plain tokens inside"),
      (2L, "beta document body with other plain tokens inside")
    ).toDF("doc_id", "text")
    IncrementalPipeline.bootstrap(base, r.store, r.idx, r.stats)
    appendLog(r.log, 0L, Seq(
      (3L, 1, "I", "a genuinely fresh third document about nothing else")))

    // LOCKSTEP rounds (r13 verdict item 3): one JVM pair buys nRounds
    // aligned sweep-race windows — alpha re-plants an AGED claim before
    // each round's barrier, so BOTH workers judge it sweep-eligible
    // every round, which is exactly the TOCTOU window a plain delete
    // loses
    val nRounds = 5
    val barrier = JF.createTempDirectory(JP.get("target"), "cycbar")
      .toAbsolutePath.toString
    val opens = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.toArray.map(_.toString)
      .filter(a => a.startsWith("--add-opens") || a.startsWith("--add-exports"))
    val javaBin = new java.io.File(
      System.getProperty("java.home"), "bin/java").getPath
    def spawn(tag: String, plant: String): (Process, java.io.File) = {
      val out = java.io.File.createTempFile(s"cycworker-$tag", ".log",
        new java.io.File("target"))
      val cmd = Seq(javaBin) ++ opens ++ Seq("-Xmx2g", "-cp",
        System.getProperty("java.class.path"), "graft.CycleWorker",
        r.store, r.idx, r.stats, r.log, barrier, tag, "500000",
        nRounds.toString, plant)
      val pb = new ProcessBuilder(cmd: _*)
      pb.redirectErrorStream(true)
      pb.redirectOutput(out)
      (pb.start(), out)
    }
    val (pa, oa) = spawn("alpha", "plant")
    val (pb, ob) = spawn("beta", "noplant")
    val deadline = System.nanoTime() + 180L * 1000000000L
    while (!(new java.io.File(barrier, "ready-alpha").exists() &&
      new java.io.File(barrier, "ready-beta").exists())) {
      assert(System.nanoTime() < deadline, "workers never became ready")
      assert(pa.isAlive || new java.io.File(barrier, "ready-alpha").exists(),
        s"alpha died early:\n${scala.io.Source.fromFile(oa).mkString}")
      assert(pb.isAlive || new java.io.File(barrier, "ready-beta").exists(),
        s"beta died early:\n${scala.io.Source.fromFile(ob).mkString}")
      Thread.sleep(50)
    }
    new java.io.File(barrier, "go").createNewFile()
    assert(pa.waitFor(300, java.util.concurrent.TimeUnit.SECONDS) &&
      pb.waitFor(300, java.util.concurrent.TimeUnit.SECONDS),
      "a worker hung past the deadline")
    assert(pa.exitValue() === 0,
      s"alpha failed:\n${scala.io.Source.fromFile(oa).mkString}")
    assert(pb.exitValue() === 0,
      s"beta failed:\n${scala.io.Source.fromFile(ob).mkString}")
    val outcomes = Seq(oa, ob).flatMap(f =>
      scala.io.Source.fromFile(f).getLines()
        .filter(l => l.startsWith("DAY ") || l.startsWith("REFUSED ")))
    assert(outcomes.size === 2 * nRounds,
      s"expected ${2 * nRounds} outcomes, got $outcomes")
    val days = outcomes.count(_.startsWith("DAY"))
    assert(days >= nRounds,
      s"every round must admit at least one cycle: $outcomes")

    // THE contract: whatever the interleaving (one refused, or both ran
    // serialized), the end state equals the deterministic replay and the
    // stats were folded exactly once per snapshot diff
    val fin = sources.VersionedStore.read(spark, r.store)
    assert(ids(fin) === Set(1L, 2L, 3L))
    assert(IncrementalPipeline.loadStats(spark, r.stats) ===
      operators.Retrieval.bm25StatsOf(fin.select("doc_id", "text")),
      "maintained stats must equal the from-scratch recount — a " +
        "double-admitted sweep race double-folds them")
    assert(!new java.io.File(r.store, ".cycle-claim").exists())
  }

  test("an injected ENOSPC mid-cycle (index append dies after the corpus " +
    "publish) releases the claim and the next day heals to the twin") {
    import spark.implicits._
    spark.sparkContext.hadoopConfiguration
      .set("fs.enospc.impl", classOf[operators.EnospcFs].getName)
    // both pipelines on the fault-injectable scheme so the only
    // difference between them is the injected failure itself
    def eroots(tag: String) = Roots(
      "enospc:" + JF.createTempDirectory(JP.get("target"), s"eno-$tag-store")
        .toAbsolutePath.toString,
      "enospc:" + JF.createTempDirectory(JP.get("target"), s"eno-$tag-idx")
        .toAbsolutePath.toString,
      "enospc:" + JF.createTempDirectory(JP.get("target"), s"eno-$tag-stats")
        .toAbsolutePath.toString,
      "enospc:" + JF.createTempDirectory(JP.get("target"), s"eno-$tag-log")
        .toAbsolutePath.toString)
    val base = Seq(
      (1L, "alpha document body with several plain tokens inside"),
      (2L, "beta document body with other plain tokens inside")
    ).toDF("doc_id", "text")
    val freshA = "completely fresh document text with unique vocabulary " +
      "tokens arriving on day one of the incremental ingest cycle"
    val day1 = Seq((100001L, 1, "I", freshA))
    val day2 = Seq(
      (200001L, 1, "I", freshA + " trailing"), // near-dup of accepted 100001
      (200002L, 1, "I", "day two genuinely new content nothing shared"))

    val clean = eroots("clean")
    val crash = eroots("crash")
    Seq(clean, crash).foreach { r =>
      IncrementalPipeline.bootstrap(base, r.store, r.idx, r.stats)
      appendLog(r.log, 0L, day1)
    }
    day(clean)

    // the crashed pipeline's day 1: its v00002 index batch write dies on
    // a REAL injected disk-full, AFTER the corpus publish committed
    val e = intercept[Throwable] {
      operators.EnospcFs.armed(p =>
        p.contains(crash.idx.stripPrefix("enospc:")) &&
          p.contains("/batches/") && p.contains("/bands/")) {
        day(crash)
      }
    }
    assert(operators.EnospcFs.causeChain(e).contains("No space left on device"))
    // the commit point passed, the maintenance did not — and the FAILED
    // cycle must still have released its claim, or every later day is
    // locked out until the grace sweep
    assert(sources.VersionedStore.latestVersion(spark, crash.store) === Some(2))
    assert(operators.Dedup.bandIndexBatches(spark, crash.idx).isEmpty)
    assert(!new java.io.File(
      crash.store.stripPrefix("enospc:"), ".cycle-claim").exists(),
      "an ENOSPC-failed cycle must release its claim")

    // space back: day 2 opens with repair and must converge to the twin
    Seq(clean, crash).foreach(r => appendLog(r.log, 1L, day1 ++ day2))
    day(clean); day(crash)
    val cleanPub = sources.VersionedStore.read(spark, clean.store)
    val crashPub = sources.VersionedStore.read(spark, crash.store)
    assert(hashes(crashPub) === hashes(cleanPub),
      "healed pipeline's corpus ≡ uncrashed twin")
    assert(!ids(crashPub).contains(200001L),
      "near-dup of the day-1 accepted doc must be screened by the " +
        "batch the repair rebuilt")
    assert(IncrementalPipeline.loadStats(spark, crash.stats) ===
      operators.Retrieval.bm25StatsOf(crashPub.select("doc_id", "text")))
  }

  test("a TRANSIENT read error probing the index base FAILS the repair " +
    "instead of silently triggering a full base rebuild") {
    import spark.implicits._
    spark.sparkContext.hadoopConfiguration
      .set("fs.enospc.impl", classOf[operators.EnospcFs].getName)
    def eroot(tag: String) =
      "enospc:" + JF.createTempDirectory(JP.get("target"), s"tro-$tag")
        .toAbsolutePath.toString
    val r = Roots(eroot("store"), eroot("idx"), eroot("stats"), eroot("log"))
    val base = Seq(
      (1L, "alpha document body with several plain tokens inside"),
      (2L, "beta document body with other plain tokens inside")
    ).toDF("doc_id", "text")
    IncrementalPipeline.bootstrap(base, r.store, r.idx, r.stats)
    appendLog(r.log, 0L, Seq(
      (3L, 1, "I", "a genuinely fresh third document about nothing else")))
    IncrementalPipeline.publishDay(spark, r.store, r.idx, r.stats, r.log)
    assert(operators.Dedup.bandIndexBatches(spark, r.idx) === Seq("v00002"))

    // a flaky disk: the hasBase probe's read of idx/meta throws a plain
    // IOException — NOT the missing-artifact AnalysisException. Repair
    // must rethrow (fail the cycle) rather than misread it as "no base"
    // and launch a corpus-sized rebuild that sweeps the batches.
    val idxName = new java.io.File(r.idx.stripPrefix("enospc:")).getName
    val e = intercept[Throwable] {
      operators.EnospcFs.armedRead(p =>
        p.contains(idxName) && p.contains("/meta/")) {
        IncrementalPipeline.repair(spark, r.store, r.idx, r.stats)
      }
    }
    assert(!e.isInstanceOf[IllegalStateException],
      s"expected the transient error to propagate, got claim refusal: $e")
    assert(operators.EnospcFs.causeChain(e)
      .contains("Transient read failure"),
      s"expected the injected read fault, got: ${
        operators.EnospcFs.causeChain(e)}")
    // nothing was rebuilt: the committed batch survived and the claim
    // released despite the failure
    assert(operators.Dedup.bandIndexBatches(spark, r.idx) === Seq("v00002"),
      "a transient read error must not trigger a base rebuild")
    assert(!new java.io.File(
      r.store.stripPrefix("enospc:"), ".cycle-claim").exists())

    // the disk recovers: the same repair is a clean no-op
    IncrementalPipeline.repair(spark, r.store, r.idx, r.stats)
    assert(operators.Dedup.bandIndexBatches(spark, r.idx) === Seq("v00002"))
  }

  test("standalone repair excludes a live cycle: it takes the same " +
    ".cycle-claim, refuses fast while held, and no-ops once released") {
    import spark.implicits._
    val r = freshRoots("repx")
    val base = Seq(
      (1L, "alpha document body with several plain tokens inside"),
      (2L, "beta document body with other plain tokens inside")
    ).toDF("doc_id", "text")
    IncrementalPipeline.bootstrap(base, r.store, r.idx, r.stats)

    // a live cycle holds the claim → standalone repair is REFUSED, not
    // interleaved (it read-fold-publishes the same derived state)
    val claim = new java.io.File(r.store, ".cycle-claim")
    assert(claim.createNewFile())
    val e = intercept[IllegalStateException] {
      IncrementalPipeline.repair(spark, r.store, r.idx, r.stats)
    }
    assert(e.getMessage.contains("cycle"))
    assert(claim.exists(), "a refused repair must not release the holder's claim")

    // released → repair runs (healthy state: a no-op) and releases after
    assert(claim.delete())
    IncrementalPipeline.repair(spark, r.store, r.idx, r.stats)
    assert(!claim.exists(), "repair must release its claim on success")
    assert(IncrementalPipeline.statsCovered(spark, r.stats) === Some(1))

    // and on FAILURE: a guard tripping inside the body still releases
    val r2 = freshRoots("repx2")
    sources.VersionedStore.publish(base, r2.store)
    operators.Dedup.writeBandIndex(base, r2.idx) // covered = -1: not ours
    intercept[IllegalArgumentException] {
      IncrementalPipeline.repair(spark, r2.store, r2.idx, r2.stats)
    }
    assert(!new java.io.File(r2.store, ".cycle-claim").exists(),
      "a failed repair must release the claim")
  }

  test("publishDay is single-writer: a held cycle claim fails fast, a " +
    "stale one sweeps, and an interleaved fold cannot corrupt stats") {
    import spark.implicits._
    val r = freshRoots("cycle")
    val base = Seq(
      (1L, "alpha document body with several plain tokens inside"),
      (2L, "beta document body with other plain tokens inside")
    ).toDF("doc_id", "text")
    IncrementalPipeline.bootstrap(base, r.store, r.idx, r.stats)
    appendLog(r.log, 0L, Seq(
      (3L, 1, "I", "a genuinely fresh third document about nothing else")))

    // an in-flight cycle holds the claim → concurrent cycle fails FAST
    // and leaves every store untouched
    val claim = new java.io.File(r.store, ".cycle-claim")
    assert(claim.createNewFile())
    val before = hashes(sources.VersionedStore.read(spark, r.store))
    val e = intercept[IllegalStateException] { day(r) }
    assert(e.getMessage.contains("cycle"))
    assert(hashes(sources.VersionedStore.read(spark, r.store)) === before,
      "a refused cycle must not touch the corpus")
    assert(sources.VersionedStore.latestVersion(spark, r.store) === Some(1))

    // the same marker aged past the grace is crash debris: swept, cycle
    // proceeds (repair would heal whatever the crash left behind)
    assert(claim.setLastModified(System.currentTimeMillis() - 1000000L))
    val d1 = IncrementalPipeline.publishDay(spark, r.store, r.idx, r.stats,
      r.log, cycleClaimGraceMs = 500000L)
    assert(d1.corpusVersion === 2 && d1.nAccepted === 1L)
    assert(!claim.exists(), "claim must release on success")

    // two genuinely concurrent cycles over the same roots: at most one
    // may fold (best-effort overlap — the winner's state must equal a
    // clean sequential day regardless of scheduling)
    appendLog(r.log, 1L, Seq(
      (4L, 2, "I", "a fourth independent document body entirely new")))
    val outcomes = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val threads = Seq("x", "y").map { t =>
      new Thread(() => {
        try { day(r); outcomes.add(s"ok-$t") }
        catch { case _: IllegalStateException => outcomes.add(s"refused-$t") }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    val oks = outcomes.toArray.map(_.toString).count(_.startsWith("ok"))
    assert(oks >= 1, s"no cycle succeeded: $outcomes")
    // whether the loser was refused mid-flight or ran after the winner,
    // the end state must equal the deterministic replay: corpus holds
    // docs 1-4 and the stats recount matches the maintained store
    val fin = sources.VersionedStore.read(spark, r.store)
    assert(ids(fin) === Set(1L, 2L, 3L, 4L))
    val maintained = IncrementalPipeline.loadStats(spark, r.stats)
    val recount = operators.Retrieval.bm25StatsOf(fin.select("doc_id", "text"))
    assert(maintained === recount,
      "maintained stats must equal the from-scratch recount after a race")
    assert(!claim.exists())
  }

  test("a full pipeline day over file:-scheme-QUALIFIED roots ≡ the " +
    "same day over bare paths (claims, publish, index append, stats)") {
    // end-to-end Hadoop-FS honesty for the COMPOSED protocol stack: the
    // qualified form is what a cluster deployment passes, and it must
    // drive the NIO claim/pointer arms (makeQualified -> toUri.getPath)
    // identically — bootstrap, cycle claim, versioned publish + flip,
    // band-index batch append, stats fold, all on qualified roots.
    import spark.implicits._
    val base = Tables.documents(spark, sf)
      .filter(col("doc_id") < 150).select("doc_id", "text").localCheckpoint()
    val changes = Seq(
      (300001L, 1, "I", "a qualified-scheme day brings one fresh document"),
      (3L, 2, "U", "doc three rewritten during the qualified-scheme day"),
      (5L, 2, "D", ""))
    def runDay(qualify: Boolean): (Set[(Long, String)], Long, Int) = {
      val r = freshRoots(if (qualify) "qual" else "bare")
      def q(p: String): String =
        if (qualify) "file:" + new java.io.File(p).getAbsolutePath else p
      IncrementalPipeline.bootstrap(base, q(r.store), q(r.idx), q(r.stats))
      appendLog(r.log, 0L, changes)
      val d = IncrementalPipeline.publishDay(spark, q(r.store), q(r.idx),
        q(r.stats), r.log)
      val h = hashes(sources.VersionedStore.read(spark, q(r.store)))
      // the qualified store must be hygienic: claim released, no debris
      val names = new java.io.File(r.store).listFiles().map(_.getName).toSet
      assert(!names.exists(_.startsWith(".cycle-claim")),
        s"claim debris on ${if (qualify) "qualified" else "bare"} root: $names")
      assert(!names.contains(".LATEST.crc"))
      (h, d.nAccepted, d.corpusVersion)
    }
    val (hQ, accQ, vQ) = runDay(qualify = true)
    val (hB, accB, vB) = runDay(qualify = false)
    assert(hQ === hB, "qualified-root day must equal the bare-path day")
    assert(accQ === accB && vQ === vB)
  }

  test("aged claim-protocol debris (.swept-*/.stamp-*/.rel-*) sweeps at " +
    "the next acquisition; FRESH swept debris REFUSES it (live steal — " +
    "the claim path may be a momentary vacuum)") {
    val root = tmp("claimdebris")
    new java.io.File(root).mkdirs()
    val aged1 = new java.io.File(root, ".cycle-claim.swept-deadcafe")
    val aged2 = new java.io.File(root, "..cycle-claim.stamp-deadcafe")
    val aged3 = new java.io.File(root, ".cycle-claim.rel-deadcafe")
    val fresh = new java.io.File(root, ".cycle-claim.swept-fresh123")
    Seq(aged1, aged2, aged3, fresh).foreach(x => assert(x.createNewFile()))
    val old = System.currentTimeMillis() - 1000000L
    Seq(aged1, aged2, aged3).foreach(x => assert(x.setLastModified(old)))
    // a FRESH .swept-* is a mid-steal marker: the stolen claim's owner
    // may still be running with the claim path vacant — acquiring into
    // that vacuum would run two cycles, so this acquisition must REFUSE
    // (while still reclaiming the aged debris it walked past)
    val e = intercept[IllegalStateException] {
      IncrementalPipeline.withCycleClaim(spark, root, 500000L, "a test") {
        fail("must refuse while a fresh steal is in flight")
      }
    }
    assert(e.getMessage.contains("cycle"))
    assert(!aged1.exists() && !aged2.exists() && !aged3.exists(),
      "aged sweeper/stamper/release debris must be reclaimed")
    assert(fresh.exists(),
      "fresh swept debris is the live steal's restore source — spared")
    // steal resolved (restore consumed the debris): acquisition proceeds
    assert(fresh.delete())
    IncrementalPipeline.withCycleClaim(spark, root, 500000L, "a test")(())
    assert(!new java.io.File(root, ".cycle-claim").exists())
  }

  test("stale-claim sweep race LOOPED x20: two racing acquirers over a " +
    "stale marker — never two bodies concurrently, claim always released") {
    // volume for the sweep protocol's rename-atomicity: the two-real-JVM
    // race below proves the cross-process window once per spawn; this
    // loops the same acquisition race 20x in-process and asserts the
    // DOUBLE-FOLD invariant directly (at no instant do two bodies run),
    // which holds regardless of which thread wins which sub-race.
    (1 to 20).foreach { i =>
      val root = tmp(s"sweeprace$i")
      val claim = new java.io.File(root, ".cycle-claim")
      assert(claim.createNewFile())
      assert(claim.setLastModified(System.currentTimeMillis() - 1000000L))
      val inBody = new java.util.concurrent.atomic.AtomicInteger(0)
      val maxInBody = new java.util.concurrent.atomic.AtomicInteger(0)
      val wins = new java.util.concurrent.atomic.AtomicInteger(0)
      val gate = new java.util.concurrent.CountDownLatch(1)
      val threads = (1 to 2).map(_ => new Thread(() => {
        gate.await()
        try IncrementalPipeline.withCycleClaim(spark, root, 500000L,
          "a looped race") {
          val c = inBody.incrementAndGet()
          try {
            maxInBody.updateAndGet(m => math.max(m, c))
            wins.incrementAndGet()
            Thread.sleep(50)
          } finally inBody.decrementAndGet()
        }
        catch { case _: IllegalStateException => () } // refusal: fine
      }))
      threads.foreach(_.start()); gate.countDown(); threads.foreach(_.join())
      assert(maxInBody.get === 1,
        s"iter $i: two cycle bodies ran CONCURRENTLY — the double-fold")
      assert(wins.get >= 1, s"iter $i: nobody acquired a sweepable claim")
      assert(!claim.exists(), s"iter $i: claim not released")
    }
  }

  test("stale-sweep TOCTOU: a fresh claim stolen in the stat-to-rename " +
    "window is RESTORED and the sweeper refuses itself") {
    // the r13-ADVICE race, made deterministic via the test seam: caller
    // A stats a STALE claim; before A's sweep rename, the old holder
    // releases and a NEW cycle claims. A's rename then moves the fresh
    // claim — the steal-guard must detect it (debris younger than the
    // grace), put it back, and refuse A. Without the guard, A deleted
    // the successor's claim and two cycles folded concurrently.
    val root = tmp("toctou")
    val claim = new java.io.File(root, ".cycle-claim")
    assert(claim.createNewFile())
    assert(claim.setLastModified(System.currentTimeMillis() - 1000000L))
    val successorStamp = "successor-claim-uuid-stamp"
    IncrementalPipeline.cycleClaimSweepHook = () => {
      // the old holder releases; a successor claims and stamps — all
      // inside A's stat-to-rename window
      assert(claim.delete())
      JF.write(claim.toPath, successorStamp.getBytes("UTF-8"))
    }
    try {
      val e = intercept[IllegalStateException] {
        IncrementalPipeline.withCycleClaim(spark, root, 500000L, "a test") {
          fail("the sweeper must refuse itself, not run its body")
        }
      }
      assert(e.getMessage.contains("cycle"))
      assert(claim.exists(), "the stolen fresh claim must be restored")
      assert(new String(JF.readAllBytes(claim.toPath), "UTF-8") ===
        successorStamp, "restored claim must carry the successor's stamp")
    } finally IncrementalPipeline.cycleClaimSweepHook = () => ()
  }

  test("release is ownership-checked: a grace-violating cycle whose claim " +
    "was replaced must NOT delete its successor's claim") {
    val root = tmp("own")
    val claim = new java.io.File(root, ".cycle-claim")
    val successorStamp = "successor-claim-uuid-stamp"
    val out = IncrementalPipeline.withCycleClaim(spark, root, 500000L,
      "a test") {
      // simulate the grace violation: while our body runs, a sweeper
      // replaced our claim with a successor's (different stamp)
      assert(claim.exists(), "claim must exist while the body runs")
      JF.write(claim.toPath, successorStamp.getBytes("UTF-8"))
      42
    }
    assert(out === 42)
    assert(claim.exists(),
      "release must leave a claim it does not own in place")
    assert(new String(JF.readAllBytes(claim.toPath), "UTF-8") ===
      successorStamp)
    // normal path: our own claim IS released
    assert(claim.delete())
    IncrementalPipeline.withCycleClaim(spark, root, 500000L, "a test")(())
    assert(!claim.exists(), "release must delete the holder's own claim")
  }
}
