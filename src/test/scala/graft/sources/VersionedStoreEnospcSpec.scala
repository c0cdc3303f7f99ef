package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.EnospcFs

/** ENOSPC-mid-publish proofs for [[VersionedStore]] (r12 review item 9's
  * discipline, applied to the corpus store): a REAL injected "No space
  * left on device" — thrown from the filesystem's `create` through
  * Spark's genuine committer via [[EnospcFs]] — at each window of the
  * claim → staged-write → pointer-flip protocol:
  *
  *  - the STAGED DATA write dies → publish throws, the pointer and every
  *    reader still see the previous version, the `_SUCCESS`-less debris
  *    directory is invisible to [[VersionedStore.versions]], a retried
  *    publish lands on the NEXT slot (debris blocks only its own), and
  *    [[VersionedStore.expire]] sweeps the debris once past grace;
  *  - the POINTER staging create dies (data fully committed!) → publish
  *    throws, the pointer still serves the previous version, the orphan
  *    version stays readable via time-travel, and the next publish flips
  *    the pointer past it.
  *
  * The `enospc:` scheme has no AbstractFileSystem binding (and is not
  * the `file` scheme), so the pointer flip exercises
  * [[VersionedStore.writePointer]]'s FileSystem fallback arm — the
  * narrower-guarantee path that only gets coverage here (file:// takes
  * the NIO kernel-atomic arm, DFS schemes the FileContext arm).
  */
class VersionedStoreEnospcSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = {
    val s = graft.EngineSession.local("4")
    s.sparkContext.hadoopConfiguration
      .set("fs.enospc.impl", classOf[EnospcFs].getName)
    s
  }

  override def afterAll(): Unit = {
    EnospcFs.failWhen = _ => false
    EnospcFs.failReadWhen = _ => false
    EnospcFs.failRenameWhen = (_, _) => false
    spark.stop()
  }

  private def tmp(): String =
    "enospc:" + Files.createTempDirectory(Paths.get("target"), "vsenospc")
      .toAbsolutePath.toString

  private def docs(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def texts(df: DataFrame): Set[String] =
    df.select("text").collect().map(_.getString(0)).toSet

  private def causeChain(t: Throwable): String = EnospcFs.causeChain(t)

  test("ENOSPC mid staged write: readers keep the old version, debris " +
    "blocks only its slot, retry lands the next one, expire sweeps") {
    val root = tmp()
    assert(VersionedStore.publish(docs((1L, "version one body")), root) === 1)

    val e = intercept[Throwable] {
      EnospcFs.armed(_.contains("/v00002/")) {
        VersionedStore.publish(docs((1L, "version two body")), root)
      }
    }
    assert(causeChain(e).contains("No space left on device"))

    // the failed publish is invisible end to end
    assert(VersionedStore.latestVersion(spark, root) === Some(1))
    assert(VersionedStore.versions(spark, root) === Seq(1))
    assert(texts(VersionedStore.read(spark, root)) === Set("version one body"))

    // space back: the retry must NOT reuse the debris slot (its directory
    // exists, _SUCCESS-less) — it claims the next one and flips
    assert(VersionedStore.publish(docs((1L, "version two body")), root) === 3)
    assert(VersionedStore.latestVersion(spark, root) === Some(3))
    assert(texts(VersionedStore.read(spark, root)) === Set("version two body"))

    // the torn directory is debris: swept once past grace, v1/v3 kept
    assert(VersionedStore.expire(spark, root, keepLast = 2,
      debrisGraceMs = 0L) === Seq.empty)
    val names = new java.io.File(root.stripPrefix("enospc:")).list().toSet
    assert(!names.contains("v00002"), s"debris v00002 must sweep, got $names")
    assert(names.contains("v00001") && names.contains("v00003"))
  }

  test("ENOSPC on the pointer staging: the committed orphan stays " +
    "time-travel readable, the pointer never moves, the next publish " +
    "flips past it") {
    val root = tmp()
    assert(VersionedStore.publish(docs((1L, "version one body")), root) === 1)

    val e = intercept[Throwable] {
      EnospcFs.armed(_.contains(".LATEST.tmp")) {
        VersionedStore.publish(docs((1L, "version two body")), root)
      }
    }
    assert(causeChain(e).contains("No space left on device"))

    // data committed, pointer untouched: readers serve v1, the orphan v2
    // is published-but-unreferenced and readable only by pinning it
    assert(VersionedStore.latestVersion(spark, root) === Some(1))
    assert(VersionedStore.versions(spark, root) === Seq(1, 2))
    assert(texts(VersionedStore.read(spark, root)) === Set("version one body"))
    assert(texts(VersionedStore.read(spark, root, Some(2))) ===
      Set("version two body"))

    // the next publish claims slot 3 and the flip succeeds
    assert(VersionedStore.publish(docs((1L, "version three body")), root) === 3)
    assert(VersionedStore.latestVersion(spark, root) === Some(3))
    assert(texts(VersionedStore.read(spark, root)) ===
      Set("version three body"))
  }

  test("transient READ fault on the pointer: latestVersion FAILS loudly, " +
    "never reads as 'no published version'") {
    // the raw-read change (r13 #1 fix) reroutes the pointer open through
    // the non-checksummed view — this pins that a half-visible pointer
    // (flaky disk, NFS hiccup) still surfaces as an ERROR on that path,
    // not as None: misreading it as absent would tell a pipeline the
    // store is empty and invite a from-scratch rebuild over live state.
    val root = tmp()
    assert(VersionedStore.publish(docs((1L, "version one body")), root) === 1)
    val e = intercept[Throwable] {
      EnospcFs.armedRead(p => p.endsWith("/LATEST")) {
        VersionedStore.latestVersion(spark, root)
      }
    }
    assert(causeChain(e).contains("Transient read failure (injected)"))
    // fault cleared: the pointer reads fine — nothing was mutated
    assert(VersionedStore.latestVersion(spark, root) === Some(1))
    assert(texts(VersionedStore.read(spark, root)) === Set("version one body"))
  }

  test("RENAME fault at the pointer-flip commit point: publish fails " +
    "loudly, readers keep the old version, the orphan stays " +
    "time-travel readable, retry recovers") {
    // the fallback arm's commit is fs.rename(tmp, LATEST) — the injected
    // fault dies exactly there, AFTER the data committed and the old
    // pointer was deleted (the documented narrow window of schemes with
    // no atomic-overwrite rename)
    val root = tmp()
    assert(VersionedStore.publish(docs((1L, "version one body")), root) === 1)
    val e = intercept[Throwable] {
      EnospcFs.armedRename((src, dst) =>
        src.contains(".LATEST.tmp") && dst.endsWith("/LATEST")) {
        VersionedStore.publish(docs((1L, "version two body")), root)
      }
    }
    assert(causeChain(e).contains("Rename failure (injected)"))
    assert(causeChain(e).contains("pointer flip failed"))
    // v2's data committed (orphan), v1 still the readable store via
    // versions(); the pointer is GONE in this crash window (fallback-arm
    // contract) so the next publish/rollback must restore it
    assert(VersionedStore.versions(spark, root) === Seq(1, 2))
    assert(texts(VersionedStore.read(spark, root, Some(1))) ===
      Set("version one body"))
    assert(texts(VersionedStore.read(spark, root, Some(2))) ===
      Set("version two body"))
    assert(VersionedStore.publish(docs((1L, "version three body")), root) === 3)
    assert(VersionedStore.latestVersion(spark, root) === Some(3))
    assert(texts(VersionedStore.read(spark, root)) ===
      Set("version three body"))
  }
}
