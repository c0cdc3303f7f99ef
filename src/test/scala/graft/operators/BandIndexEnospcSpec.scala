package graft.operators

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{AnalysisException, DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** ENOSPC-mid-write proofs for the band-index artifact (r12 review item
  * 9): a REAL injected "No space left on device" — thrown from inside
  * the filesystem's `create`, through Spark's genuine parquet committer,
  * via [[EnospcFs]] — at every window of the append/build protocols:
  *
  *  - a relation write of an [[Dedup.appendBandIndex]] batch dies →
  *    the exception propagates, the torn batch is INVISIBLE (screen
  *    output byte-identical to pre-append), [[Dedup.sweepBandIndex]]
  *    reports it, and a retried append heals to ≡ full rebuild;
  *  - the `_COMMITTED` marker create itself dies (all three relations
  *    complete!) → still invisible, retry heals;
  *  - an IN-PLACE base rebuild ([[Dedup.writeBandIndex]] over an
  *    existing artifact) dies between relation overwrites → the
  *    artifact must read as ABSENT (meta is deleted first, written
  *    last), never as a healthy-looking old-meta/new-texts/old-bands
  *    mix that silently misses candidates forever.
  *
  * These differ from BandIndexSpec's torn-state tests in mechanism:
  * there the crash debris is constructed by hand; here the failure is
  * injected mid-flight and whatever Spark's aborted job actually leaves
  * on disk is what the protocol must tolerate.
  */
class BandIndexEnospcSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = {
    val s = graft.EngineSession.local("4")
    s.sparkContext.hadoopConfiguration
      .set("fs.enospc.impl", classOf[EnospcFs].getName)
    s
  }

  override def afterAll(): Unit = {
    EnospcFs.failWhen = _ => false
    spark.stop()
  }

  /** A unique local dir addressed through the fault-injecting scheme. */
  private def tmp(): String =
    "enospc:" + Files.createTempDirectory(Paths.get("target"), "enospc")
      .toAbsolutePath.toString

  private def docs(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def ids(df: DataFrame): Set[Long] =
    df.select("doc_id").collect().map(_.getLong(0)).toSet

  private def screen(dir: String, probe: DataFrame): Set[Long] =
    ids(Dedup.deduplicateAgainst(probe, Dedup.loadBandIndex(spark, dir), 0.6))

  private def causeChain(t: Throwable): String = EnospcFs.causeChain(t)

  private val baseA = (1L, "alpha beta gamma delta epsilon zeta eta theta")
  private val baseB = (2L, "one two three four five six seven eight nine ten")
  private val s1doc = (10L, "first accepted batch document with its own words")
  private val s2doc = (11L, "second accepted batch document carrying different words")
  private val s3doc = (12L, "third accepted batch document with yet other vocabulary")

  test("ENOSPC mid relation write: batch invisible, sweep sees it, " +
    "retry heals to ≡ full rebuild") {
    val dir = tmp()
    Dedup.writeBandIndex(docs(baseA, baseB), dir)
    Dedup.appendBandIndex(docs(s1doc), dir, "b1")

    // probe: exact copies of the b1 doc (must drop) and the b2 doc
    // (must SURVIVE until b2 commits), plus fresh text (always survives)
    val probe = docs((20L, s1doc._2), (21L, s2doc._2),
      (22L, "entirely fresh unrelated probe text goes right here"))
    val before = screen(dir, probe)
    assert(before === Set(21L, 22L))

    val e = intercept[Throwable] {
      EnospcFs.armed(p => p.contains("/batches/b2/") && p.contains("/bands/")) {
        Dedup.appendBandIndex(docs(s2doc), dir, "b2")
      }
    }
    assert(causeChain(e).contains("No space left on device"),
      s"expected the injected ENOSPC to propagate, got: ${causeChain(e)}")

    // whatever the aborted job left under batches/b2: invisible
    assert(Dedup.bandIndexBatches(spark, dir) === Seq("b1"))
    assert(screen(dir, probe) === before,
      "a torn batch must not change screen output")
    assert(Dedup.sweepBandIndex(spark, dir) === Seq("b2"))

    // retry with space back: commits, and equals the full rebuild
    Dedup.appendBandIndex(docs(s2doc), dir, "b2")
    assert(Dedup.bandIndexBatches(spark, dir) === Seq("b1", "b2"))
    assert(screen(dir, probe) === Set(22L))
    val rebuilt = tmp()
    Dedup.writeBandIndex(docs(baseA, baseB, s1doc, s2doc), rebuilt)
    assert(screen(rebuilt, probe) === screen(dir, probe))
  }

  test("ENOSPC on the _COMMITTED marker itself: relations complete but " +
    "the batch stays invisible; retry heals") {
    val dir = tmp()
    Dedup.writeBandIndex(docs(baseA, baseB), dir)
    val probe = docs((30L, s3doc._2))
    assert(screen(dir, probe) === Set(30L))

    val e = intercept[Throwable] {
      EnospcFs.armed(p => p.contains("/batches/b3/") &&
        p.endsWith("_COMMITTED")) {
        Dedup.appendBandIndex(docs(s3doc), dir, "b3")
      }
    }
    assert(causeChain(e).contains("No space left on device"))
    // all three relations landed — but the commit point did not
    assert(Dedup.bandIndexBatches(spark, dir).isEmpty)
    assert(screen(dir, probe) === Set(30L),
      "an uncommitted batch must be invisible even with complete relations")

    Dedup.appendBandIndex(docs(s3doc), dir, "b3")
    assert(Dedup.bandIndexBatches(spark, dir) === Seq("b3"))
    assert(screen(dir, probe) === Set.empty)
  }

  test("ENOSPC mid in-place base rebuild: the artifact reads as absent " +
    "(old meta cannot resurrect a torn mix); a fresh rebuild heals") {
    val dir = tmp()
    Dedup.writeBandIndex(docs(baseA), dir)
    assert(screen(dir, docs((40L, baseA._2))) === Set.empty) // healthy v1

    // rebuild over the SAME root onto new content; die after the texts
    // overwrite, before bands (no /batches/ here — base-level only)
    val e = intercept[Throwable] {
      EnospcFs.armed(p => p.contains("/bands/") && !p.contains("/batches/")) {
        Dedup.writeBandIndex(docs(baseB), dir)
      }
    }
    assert(causeChain(e).contains("No space left on device"))

    // the torn mix (v1 bands/tris, v2 texts) must NOT load: meta was
    // deleted first, so the artifact is loudly absent — exactly the
    // signal IncrementalPipeline.repair's hasBase probe keys on
    intercept[AnalysisException] { Dedup.loadBandIndex(spark, dir) }
    intercept[AnalysisException] { Dedup.bandIndexCovered(spark, dir) }

    Dedup.writeBandIndex(docs(baseB), dir)
    assert(screen(dir, docs((41L, baseB._2))) === Set.empty)
    assert(screen(dir, docs((42L, baseA._2))) === Set(42L),
      "the healed artifact reflects the NEW corpus only")
  }

  test("a TRANSIENT read fault opening the artifact meta FAILS the load " +
    "loudly — never classified as 'artifact absent'") {
    // the read-side twin of the meta-first crash proof: rebuild-if-absent
    // callers ([[graft.operators.Incremental.bandIndexFor]],
    // IncrementalPipeline's hasBase probe) key 'absent' on
    // AnalysisException ONLY. A flaky-disk IOException surfacing from
    // the meta open must therefore propagate as an ERROR — misreading
    // it as absent would trigger a full corpus rebuild over a healthy
    // artifact (and, pre-r13, could have in-place-rebuilt over live
    // readers).
    val dir = tmp()
    Dedup.writeBandIndex(docs(baseA), dir)
    val e = intercept[Throwable] {
      EnospcFs.armedRead(p => p.contains("/meta/") && p.contains(".parquet")) {
        Dedup.bandIndexCovered(spark, dir)
      }
    }
    assert(causeChain(e).contains("Transient read failure (injected)"),
      s"expected the injected read fault to surface, got: ${causeChain(e)}")
    assert(!e.isInstanceOf[AnalysisException],
      "a read fault must not be classified as artifact-absent")
    // fault cleared: the artifact was never touched and loads fine
    assert(Dedup.bandIndexCovered(spark, dir) === -1)
    assert(screen(dir, docs((50L, baseA._2))) === Set.empty)
  }
}
