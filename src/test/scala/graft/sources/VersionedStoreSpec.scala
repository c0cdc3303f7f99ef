package graft.sources

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Versioned-store laws: atomic publish, time-travel pin, rollback as a
  * metadata move, expiry sparing the pointer, and failed writes leaving
  * no readable-looking version.
  */
class VersionedStoreSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = graft.EngineSession.local("4")
  val sfDir = "/root/testdata/sf0.001"

  override def afterAll(): Unit = spark.stop()

  private def tmp(): String =
    Files.createTempDirectory(java.nio.file.Paths.get("target"), "vstore")
      .toString

  test("publish/read round-trip; second publish flips the pointer") {
    val root = tmp()
    val docs = graft.Tables.documents(spark, sfDir).select("doc_id", "text")
    val v1 = VersionedStore.publish(docs.filter(col("doc_id") < 100), root)
    assert(v1 === 1)
    assert(VersionedStore.read(spark, root).count() ===
      docs.filter(col("doc_id") < 100).count())

    val v2 = VersionedStore.publish(docs, root)
    assert(v2 === 2)
    assert(VersionedStore.latestVersion(spark, root) === Some(2))
    assert(VersionedStore.read(spark, root).count() === docs.count())
    // time-travel: v1 still readable, unchanged
    assert(VersionedStore.read(spark, root, Some(1)).count() ===
      docs.filter(col("doc_id") < 100).count())
  }

  test("a reader pinned before a publish is unaffected by it") {
    val root = tmp()
    val docs = graft.Tables.documents(spark, sfDir).select("doc_id")
    VersionedStore.publish(docs.filter(col("doc_id") < 50), root)
    val pinned = VersionedStore.read(spark, root) // resolves the pointer NOW
    val before = pinned.count()
    VersionedStore.publish(docs, root)            // v2 lands + pointer flips
    assert(pinned.count() === before, "pinned frame must not see v2")
    assert(VersionedStore.read(spark, root).count() === docs.count())
  }

  test("rollback is a pointer move; forward again works") {
    val root = tmp()
    val docs = graft.Tables.documents(spark, sfDir).select("doc_id")
    VersionedStore.publish(docs.limit(10), root)
    VersionedStore.publish(docs.limit(20), root)
    VersionedStore.rollback(spark, root, 1)
    assert(VersionedStore.read(spark, root).count() === 10)
    // next publish continues the version sequence past the rolled-back head
    val v3 = VersionedStore.publish(docs.limit(30), root)
    assert(v3 === 3)
    assert(VersionedStore.read(spark, root).count() === 30)
    intercept[IllegalArgumentException] {
      VersionedStore.rollback(spark, root, 99)
    }
  }

  test("expire keeps the newest K and the pointer target; sweeps debris") {
    val root = tmp()
    val docs = graft.Tables.documents(spark, sfDir).select("doc_id")
    (1 to 4).foreach(i => VersionedStore.publish(docs.limit(i * 10), root))
    VersionedStore.rollback(spark, root, 2)
    // keepLast=1 would keep only v4, but the pointer sits on v2 — spared
    val dropped = VersionedStore.expire(spark, root, keepLast = 1)
    assert(dropped.toSet === Set(1, 3))
    assert(VersionedStore.versions(spark, root) === Seq(2, 4))
    assert(VersionedStore.read(spark, root).count() === 20)
  }

  test("a failed write leaves no readable version and no pointer change") {
    val root = tmp()
    val docs = graft.Tables.documents(spark, sfDir).select("doc_id", "text")
    VersionedStore.publish(docs.limit(10), root)
    // a write that fails mid-job: a column whose evaluation throws
    val bad = docs.withColumn("boom",
      expr("assert_true(doc_id < 5, 'induced failure')"))
    intercept[Exception] { VersionedStore.publish(bad, root) }
    assert(VersionedStore.latestVersion(spark, root) === Some(1))
    assert(VersionedStore.versions(spark, root) === Seq(1))
    assert(VersionedStore.read(spark, root).count() === 10)
    // the debris slot does NOT block the next publish (it skips past)
    val v = VersionedStore.publish(docs.limit(20), root)
    assert(v === 3)
    assert(VersionedStore.read(spark, root).count() === 20)
    // and expire sweeps the debris directory once it ages past the grace
    // window (0 here: the failed write is known-dead, not in-flight)
    VersionedStore.expire(spark, root, keepLast = 5, debrisGraceMs = 0L)
    val names = new java.io.File(root).listFiles().map(_.getName).toSet
    assert(!names.contains("v00002"))
    assert(VersionedStore.versions(spark, root) === Seq(1, 3))
  }

  test("CDC snapshot publishes through the store: fold -> publish -> read") {
    val root = tmp()
    val base = graft.operators.Incremental.snapshotV1(spark, sfDir)
      .select(col("doc_id"), col("text"))
    val latest = graft.operators.Incremental.latestPerKey(
      graft.operators.Incremental.changelog(spark, sfDir))
    val merged = graft.operators.Incremental.applyLatest(base, latest)
    val v = VersionedStore.publish(merged, root)
    val got = VersionedStore.read(spark, root, Some(v))
      .select(col("doc_id"), md5(col("text")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val want = graft.QueryCatalog.byName("i02_upsert_merge").run(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === want)
  }

  test("expire presumes a YOUNG _SUCCESS-less directory is in-flight") {
    val root = tmp()
    val docs = graft.Tables.documents(spark, sfDir).select("doc_id")
    VersionedStore.publish(docs.limit(10), root)
    // simulate a publish in progress: a version dir without _SUCCESS,
    // freshly modified
    val inflight = new java.io.File(root, "v00002")
    inflight.mkdirs()
    new java.io.File(inflight, "part-0.parquet").createNewFile()
    VersionedStore.expire(spark, root, keepLast = 5) // default grace
    assert(inflight.exists(), "grace window must spare an in-flight write")
    // aged past the grace → swept
    VersionedStore.expire(spark, root, keepLast = 5, debrisGraceMs = 0L)
    assert(!inflight.exists())
  }

  test("version numbers past 99999 parse (pointer + listing)") {
    val root = tmp()
    val docs = graft.Tables.documents(spark, sfDir).select("doc_id")
    VersionedStore.publish(docs.limit(10), root)
    // fast-forward the store to a 6-digit version by renaming on disk
    // and rewriting the pointer — what the store itself would produce
    // on publish #100000 (f"v$n%05d" grows past 5 digits naturally)
    assert(new java.io.File(root, "v00001")
      .renameTo(new java.io.File(root, "v100000")))
    VersionedStore.rollback(spark, root, 100000) // pointer via the store
    assert(VersionedStore.latestVersion(spark, root) === Some(100000))
    assert(VersionedStore.versions(spark, root) === Seq(100000))
    assert(VersionedStore.read(spark, root).count() === 10)
    // and the NEXT publish takes the slot above, not a colliding one
    val v = VersionedStore.publish(docs.limit(20), root)
    assert(v === 100001)
    assert(VersionedStore.read(spark, root).count() === 20)
  }
}
