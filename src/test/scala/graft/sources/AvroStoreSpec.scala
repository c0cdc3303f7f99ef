package graft.sources

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** [[AvroStore]]: the hand-rolled Avro container interchange (no
  * spark-avro datasource in this build) — round-trip fidelity on real
  * tables through the actual Avro Java library, file-grain read
  * parallelism, declared-schema drift detection, and array columns.
  */
class AvroStoreSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = graft.EngineSession.local("4")
  override def afterAll(): Unit = spark.stop()

  private val sfDir = "/root/testdata/sf0.001"

  test("documents table survives an Avro round-trip bit-for-bit") {
    val df = graft.Tables.documents(spark, sfDir)
    val out = Files.createTempDirectory(Paths.get("target"), "avro-docs").toString
    AvroStore.write(df, out)
    val back = AvroStore.read(spark, out, df.schema)
    assert(back.count() === df.count())
    def sig(d: org.apache.spark.sql.DataFrame) =
      d.agg(expr("bit_xor(xxhash64(doc_id, text, lang, source, n_chars))"))
        .head().getLong(0)
    assert(sig(back) === sig(df), "content checksum")
  }

  test("embeddings (float-array column) survive the round-trip exactly") {
    val df = graft.Tables.embeddings(spark, sfDir)
    val out = Files.createTempDirectory(Paths.get("target"), "avro-emb").toString
    AvroStore.write(df, out)
    val back = AvroStore.read(spark, out, df.schema)
    assert(back.count() === df.count())
    val a = df.orderBy("vec_id").collect()
    val b = back.orderBy("vec_id").collect()
    a.zip(b).foreach { case (x, y) =>
      assert(x.getLong(0) == y.getLong(0))
      assert(x.getSeq[Float](1) == y.getSeq[Float](1), s"vec ${x.getLong(0)}")
      assert(x.getInt(2) == y.getInt(2))
    }
  }

  test("one container file per partition; read parallelism is file-grain") {
    val df = graft.Tables.documents(spark, sfDir).repartition(5)
    val out = Files.createTempDirectory(Paths.get("target"), "avro-par").toString
    AvroStore.write(df, out)
    val files = new java.io.File(out).listFiles().filter(_.getName.endsWith(".avro"))
    assert(files.length == 5)
    val back = AvroStore.read(spark, out, df.schema)
    assert(back.rdd.getNumPartitions == 5)
    assert(back.count() == df.count())
    // files are genuine Avro containers: magic bytes "Obj"
    val head = java.nio.file.Files.readAllBytes(files.head.toPath).take(4)
    assert(head.sameElements(Array[Byte]('O', 'b', 'j', 1)))
  }

  test("declared-schema drift fails loudly (missing column)") {
    val df = graft.Tables.documents(spark, sfDir).select("doc_id", "lang")
    val out = Files.createTempDirectory(Paths.get("target"), "avro-drift").toString
    AvroStore.write(df, out)
    val declared = graft.Tables.documents(spark, sfDir).schema // expects text etc.
    val ex = intercept[org.apache.spark.SparkException] {
      AvroStore.read(spark, out, declared).count()
    }
    val msg = ex.getMessage +
      Option(ex.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("missing from Avro schema"), msg)
  }

  test("stranded .replaced-* debris is swept by the next successful write") {
    val df = graft.Tables.documents(spark, sfDir).limit(20)
    val out = Files.createTempDirectory(Paths.get("target"), "avro-swp")
      .toString + "/store"
    AvroStore.write(df, out)
    // a crash between the two commit renames (or a failed delete) leaves
    // the previous store stranded under .replaced-*
    val debris = new java.io.File(out + ".replaced-deadbeef")
    debris.mkdirs()
    new java.io.File(debris, "part-00000.avro").createNewFile()
    AvroStore.write(df, out) // overwrite commit
    assert(!debris.exists(), "next successful write must sweep stale debris")
    assert(AvroStore.read(spark, out, df.schema).count() === 20)
  }

  test("commit protocol: write publishes atomically with _SUCCESS; " +
      "read refuses uncommitted (marker-less) part files") {
    val df = graft.Tables.documents(spark, sfDir)
    val out = Files.createTempDirectory(Paths.get("target"), "avro-commit").toString
    AvroStore.write(df, out)
    val names = new java.io.File(out).listFiles().map(_.getName).toSet
    assert(names.contains("_SUCCESS"), s"marker missing: $names")
    // no staging debris next to the published store
    val outFile = new java.io.File(out)
    assert(!outFile.getParentFile.listFiles()
      .exists(_.getName.startsWith(outFile.getName + ".inprogress-")))
    // simulate a job that died mid-write: part files, no marker
    java.nio.file.Files.delete(Paths.get(out, "_SUCCESS"))
    val ex = intercept[IllegalArgumentException] {
      AvroStore.read(spark, out, df.schema)
    }
    assert(ex.getMessage.contains("_SUCCESS"), ex.getMessage)
  }
}
