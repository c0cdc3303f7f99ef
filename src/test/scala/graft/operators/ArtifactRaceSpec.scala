package graft.operators

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Concurrent builders of the SHARED per-store band-index artifact
  * ([[graft.operators.Incremental.bandIndexFor]]): the artifact key is
  * deterministic, and the documented two-JVM sweep workflow can race two
  * builders — each must stage into a unique sibling and atomically
  * rename into the keyed root, with the loser adopting the winner's
  * artifact. Two in-place builds into the same root would collide in the
  * committer's shared `_temporary/0` (the corruption class the
  * two-real-JVM publish race proof exposed).
  */
class ArtifactRaceSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = graft.EngineSession.local("4")

  private val builtRoots = scala.collection.mutable.ListBuffer.empty[String]

  override def afterAll(): Unit = {
    // the shared artifacts live under java.io.tmpdir — reclaim them
    builtRoots.foreach { r =>
      val p0 = Paths.get(r)
      if (Files.exists(p0)) {
        val it = Files.walk(p0)
        try it.sorted(java.util.Comparator.reverseOrder())
          .forEach(p => Files.delete(p))
        finally it.close()
      }
    }
    spark.stop()
  }

  test("two concurrent builders: unique staging, atomic publish, the " +
    "loser adopts the winner's artifact, no staging debris") {
    import spark.implicits._
    // a fresh copy of the store → fresh deterministic key → absent artifact
    val sf = Files.createTempDirectory(Paths.get("target"), "artrace")
      .toAbsolutePath.toString
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .write.parquet(s"$sf/documents.parquet")

    val results = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (1 to 2).map(_ => new Thread(() =>
      try results.add(Incremental.bandIndexFor(spark, sf))
      catch { case t: Throwable => errs.add(t) }))
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(errs.isEmpty, s"a builder failed: ${Option(errs.peek())}")
    val roots = results.toArray.map(_.toString).toSet
    assert(roots.size === 1, s"builders disagreed on the root: $roots")
    val root = roots.head
    builtRoots += root

    // the published artifact is complete and functional: an exact copy
    // of a corpus doc screens out, fresh text survives
    val sample = graft.Tables.documents(spark, sf)
      .select("text").head().getString(0)
    val probe = Seq(
      (-1L, sample),
      (-2L, "entirely fresh probe content that matches nothing at all"))
      .toDF("doc_id", "text")
    val kept = Dedup
      .deduplicateAgainst(probe, Dedup.loadBandIndex(spark, root), 0.6)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(-2L))

    // the losing builder's staging must not linger
    val rootFile = new java.io.File(root)
    val debris = rootFile.getParentFile.listFiles()
      .filter(_.getName.startsWith(rootFile.getName + ".build-"))
    assert(debris.isEmpty, s"staging debris: ${debris.map(_.getName).toSeq}")
  }

  test("a TORN keyed root (no readable meta) self-heals: the rebuild " +
    "moves it aside and publishes fresh, instead of failing forever") {
    import spark.implicits._
    val sf = Files.createTempDirectory(Paths.get("target"), "arttorn")
      .toAbsolutePath.toString
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(50).write.parquet(s"$sf/documents.parquet")
    val root = Incremental.bandIndexFor(spark, sf)
    builtRoots += root
    // damage it the way a pre-staging-era crash (or a hand edit) would:
    // root EXISTS but meta is gone — present-probe says absent, yet a
    // plain rename onto the non-empty root fails. r13's code then threw
    // on every subsequent build until a human deleted the root.
    val meta = Paths.get(root, "meta")
    val it = Files.walk(meta)
    try it.sorted(java.util.Comparator.reverseOrder())
      .forEach(p => Files.delete(p))
    finally it.close()
    assert(!Files.exists(meta))

    val healed = Incremental.bandIndexFor(spark, sf)
    assert(healed === root, "the heal must land at the same keyed root")
    // functional again: an exact corpus copy screens out, fresh survives
    val sample = graft.Tables.documents(spark, sf)
      .select("text").head().getString(0)
    val probe = Seq(
      (-1L, sample),
      (-2L, "entirely fresh probe content that matches nothing at all"))
      .toDF("doc_id", "text")
    val kept = Dedup
      .deduplicateAgainst(probe, Dedup.loadBandIndex(spark, root), 0.6)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(-2L))
    // no torn-aside or staging debris left behind
    val rootFile = new java.io.File(root)
    val leftovers = rootFile.getParentFile.listFiles()
      .filter(f => f.getName.startsWith(rootFile.getName + ".torn-") ||
        f.getName.startsWith(rootFile.getName + ".build-"))
    assert(leftovers.isEmpty, s"heal debris: ${leftovers.map(_.getName).toSeq}")
  }

  test("stranded staging from a builder that DIED mid-write is swept " +
    "age-gated on the next build; young staging is left alone") {
    import spark.implicits._
    val sf = Files.createTempDirectory(Paths.get("target"), "artsweep")
      .toAbsolutePath.toString
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(50).write.parquet(s"$sf/documents.parquet")
    // learn the keyed root, then reset to the pre-build state
    val root = Incremental.bandIndexFor(spark, sf)
    builtRoots += root
    val rootFile = new java.io.File(root)
    val delRoot = Files.walk(rootFile.toPath)
    try delRoot.sorted(java.util.Comparator.reverseOrder())
      .forEach(p => Files.delete(p))
    finally delRoot.close()
    // a crashed builder's staging, aged past the grace — and a YOUNG
    // sibling that could be a live concurrent builder
    val stale = new java.io.File(rootFile.getParentFile,
      rootFile.getName + ".build-deadbeef")
    val young = new java.io.File(rootFile.getParentFile,
      rootFile.getName + ".build-young123")
    assert(stale.mkdirs() && young.mkdirs())
    assert(stale.setLastModified(System.currentTimeMillis() - 7200000L))
    builtRoots += young.toString
    assert(Incremental.bandIndexFor(spark, sf) === root)
    assert(!stale.exists(), "aged staging debris must sweep on rebuild")
    assert(young.exists(), "young staging may be a live builder — spared")
  }

  test("PERSISTENT publish failure during the torn-root heal restores " +
    "the torn tree to the root — the keyed root is never left absent " +
    "with both trees discarded") {
    import spark.implicits._
    val sf = Files.createTempDirectory(Paths.get("target"), "artheal")
      .toAbsolutePath.toString
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(50).write.parquet(s"$sf/documents.parquet")
    val root = Incremental.bandIndexFor(spark, sf)
    builtRoots += root
    // tear it: root exists, meta gone (present-probe says absent)
    val meta = Paths.get(root, "meta")
    val it = Files.walk(meta)
    try it.sorted(java.util.Comparator.reverseOrder())
      .forEach(p => Files.delete(p))
    finally it.close()
    // every IN-HEAL publish leg (first attempt + the retry) fails — a
    // persistent device error, not the EINTR-class transient the single
    // retry absorbs. The INITIAL publish move (also seam-routed) must
    // pass through so the real rename hits the torn root and enters the
    // heal: skip the first .build- move.
    val buildMoves = new java.util.concurrent.atomic.AtomicInteger(0)
    val e = intercept[IllegalArgumentException] {
      graft.sources.NioControl.armed((op, p) =>
        if (op == "move" && p.toString.contains(".build-") &&
          buildMoves.incrementAndGet() > 1)
          throw new java.io.IOException(
            "Input/output error (injected-heal)")) {
        Incremental.bandIndexFor(spark, sf)
      }
    }
    assert(e.getMessage.contains("neither renameable nor readable"))
    // the PRE-HEAL state is preserved: the torn tree is back at the
    // keyed root (present, heal retried by the next builder) — not an
    // absent root with the torn tree and a complete rebuild both deleted
    assert(Files.exists(Paths.get(root)),
      "the keyed root must survive a persistent heal failure")
    assert(!Files.exists(meta), "still torn — the heal never published")
    val rootFile = new java.io.File(root)
    val debris = rootFile.getParentFile.listFiles()
      .filter(f => f.getName.startsWith(rootFile.getName + ".torn-") ||
        f.getName.startsWith(rootFile.getName + ".build-"))
    assert(debris.isEmpty,
      s"no stranded trees on the failure path: ${debris.map(_.getName).toSeq}")
    // fault cleared: the next builder heals at the same keyed root
    assert(Incremental.bandIndexFor(spark, sf) === root)
    val sample = graft.Tables.documents(spark, sf)
      .select("text").head().getString(0)
    val probe = Seq(
      (-1L, sample),
      (-2L, "entirely fresh probe content that matches nothing at all"))
      .toDF("doc_id", "text")
    val kept = Dedup
      .deduplicateAgainst(probe, Dedup.loadBandIndex(spark, root), 0.6)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(-2L))
  }

  test("heal publish AND torn-restore BOTH fail: the torn tree is " +
    "preserved as a .torn-* sibling (never deleted as if healed) and " +
    "the next builder recovers") {
    import spark.implicits._
    val sf = Files.createTempDirectory(Paths.get("target"), "artheal2")
      .toAbsolutePath.toString
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(50).write.parquet(s"$sf/documents.parquet")
    val root = Incremental.bandIndexFor(spark, sf)
    builtRoots += root
    val meta = Paths.get(root, "meta")
    val it = Files.walk(meta)
    try it.sorted(java.util.Comparator.reverseOrder())
      .forEach(p => Files.delete(p))
    finally it.close()
    // the whole device is failing renames: in-heal publish legs AND the
    // torn-tree restore (initial publish passes through to hit the torn
    // root for real)
    val buildMoves = new java.util.concurrent.atomic.AtomicInteger(0)
    val e = intercept[IllegalArgumentException] {
      graft.sources.NioControl.armed((op, p) =>
        if (op == "move" &&
          ((p.toString.contains(".build-") &&
            buildMoves.incrementAndGet() > 1) ||
            p.toString.contains(".torn-")))
          throw new java.io.IOException(
            "Input/output error (injected-heal2)")) {
        Incremental.bandIndexFor(spark, sf)
      }
    }
    assert(e.getMessage.contains("neither renameable nor readable"))
    // the torn tree could not be restored (root absent), but it must
    // SURVIVE as a .torn-* sibling — the only remaining state
    val rootFile = new java.io.File(root)
    val tornSibs = rootFile.getParentFile.listFiles()
      .filter(_.getName.startsWith(rootFile.getName + ".torn-"))
    tornSibs.foreach(t => builtRoots += t.toString)
    assert(tornSibs.nonEmpty,
      "the torn tree must be preserved when even the restore fails")
    assert(!Files.exists(Paths.get(root)))
    // fault cleared: the path is vacant, so the next build publishes
    // directly (no heal needed) and the artifact is healthy
    assert(Incremental.bandIndexFor(spark, sf) === root)
    val sample = graft.Tables.documents(spark, sf)
      .select("text").head().getString(0)
    val probe = Seq(
      (-1L, sample),
      (-2L, "entirely fresh probe content that matches nothing at all"))
      .toDF("doc_id", "text")
    val kept = Dedup
      .deduplicateAgainst(probe, Dedup.loadBandIndex(spark, root), 0.6)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(-2L))
  }
}
