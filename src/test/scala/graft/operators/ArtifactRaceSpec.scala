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

  private var builtRoot: Option[String] = None

  override def afterAll(): Unit = {
    // the shared artifact lives under java.io.tmpdir — reclaim it
    builtRoot.foreach { r =>
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
    builtRoot = Some(root)

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
}
