package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The r16 METADATA memos (Tables.load parquet schema; the band-index
  * meta row and loaded relations) trade repeated footer/meta reads for
  * keys derived from file identity. These tests pin the invalidation
  * contract the memos rely on: a rewrite AT THE SAME PATH with different
  * content must miss the memo and surface the new bytes — a stale hit
  * here would silently serve the old store's schema or banding meta.
  */
class MemoSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = graft.EngineSession.local("4")

  override def afterAll(): Unit = spark.stop()

  private def tmp(prefix: String): String =
    Files.createTempDirectory(Paths.get("target"), prefix).toString

  test("Tables.load memoized schema equals the direct footer-inferred schema") {
    val direct = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet").schema
    val memo = Tables.load(spark, "/root/testdata/sf0.001", "documents").schema
    assert(memo === direct)
    // second load hits the memo and must agree with itself
    assert(Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .schema === memo)
  }

  test("Tables.load memo invalidates when the file is rewritten in place") {
    import spark.implicits._
    val dir = tmp("memoload")
    val path = s"$dir/documents.parquet"
    Seq((1L, "a")).toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(path)
    // single-FILE identity is what Tables.load keys on: flatten the
    // directory parquet into one file like the harness stores ship
    val part = new java.io.File(path).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val flat = s"$dir/flat.parquet"
    Files.copy(part.toPath, Paths.get(flat))
    val first = Tables.load(spark, dir, "flat").schema
    assert(first.fieldNames.sorted === Array("doc_id", "text"))

    Seq((1L, "a", 7L)).toDF("doc_id", "text", "extra")
      .coalesce(1).write.mode("overwrite").parquet(path)
    val part2 = new java.io.File(path).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    Files.delete(Paths.get(flat))
    Files.copy(part2.toPath, Paths.get(flat))
    val second = Tables.load(spark, dir, "flat").schema
    assert(second.fieldNames.sorted === Array("doc_id", "extra", "text"),
      "rewritten file (new length/mtime) must re-infer, not serve the memo")
  }

  test("Tables.load memo invalidates when a NESTED part file is rewritten " +
      "in place (same entry names, directory mtime unchanged)") {
    import spark.implicits._
    val dir = tmp("memonest")
    val path = s"$dir/documents.parquet"
    Seq((1L, "a")).toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(path)
    // strip the local FS's .crc sidecars up front: the in-place rewrite
    // below must change NOTHING but the part file's bytes (a sidecar
    // holding the old content's checksum would fail the re-read for its
    // own reasons; real rewriters regenerate them)
    new java.io.File(path).listFiles()
      .filter(_.getName.endsWith(".crc")).foreach(_.delete())
    val first = Tables.load(spark, dir, "documents").schema
    assert(first.fieldNames.sorted === Array("doc_id", "text"))
    // rewrite the part file's CONTENT at the same name: directory entry
    // set unchanged, so the dir's own mtime/length stay put — the exact
    // hole the old (dir mtime+length) key could not see
    val alt = s"$dir/alt.parquet"
    Seq((1L, "a", 7L)).toDF("doc_id", "text", "extra")
      .coalesce(1).write.mode("overwrite").parquet(alt)
    val altPart = new java.io.File(alt).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val oldPart = new java.io.File(path).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val dirMtime = new java.io.File(path).lastModified
    Files.write(oldPart.toPath, Files.readAllBytes(altPart.toPath))
    assert(new java.io.File(path).lastModified == dirMtime,
      "precondition: rewrite must not change the directory's own mtime")
    // Spark's OWN session FileStatusCache also holds the stale file
    // length after an in-place rewrite (any real rewriter must refresh
    // it); this test pins that the graft memo adds no staleness of its
    // own on top
    spark.catalog.refreshByPath(path)
    val second = Tables.load(spark, dir, "documents").schema
    assert(second.fieldNames.sorted === Array("doc_id", "extra", "text"),
      "nested same-name rewrite must re-infer, not serve the stale memo")
  }

  test("band-index meta memo invalidates on an in-place artifact rebuild") {
    import org.apache.spark.sql.functions._
    val root = tmp("memoidx")
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text")).limit(50)
    operators.Dedup.writeBandIndex(docs, root, covered = 1)
    assert(operators.Dedup.bandIndexCovered(spark, root) === 1)
    // rebuild AT THE SAME PATH with different lineage metadata
    operators.Dedup.writeBandIndex(docs, root, covered = 5)
    assert(operators.Dedup.bandIndexCovered(spark, root) === 5,
      "in-place rebuild must miss the meta memo (content identity changed)")
  }

  test("loadBandIndex memo sees a committed append (batch set keys the memo)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val root = tmp("memoapp")
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text")).limit(50)
    operators.Dedup.writeBandIndex(docs, root)
    val before = operators.Dedup.loadBandIndex(spark, root).texts.count()
    val extra = Seq((900001L, "an entirely novel appended document body"))
      .toDF("doc_id", "text")
    operators.Dedup.appendBandIndex(extra, root, "b1")
    val after = operators.Dedup.loadBandIndex(spark, root).texts.count()
    assert(after === before + 1,
      "a committed batch changes the memo key; the reload must include it")
  }
}
