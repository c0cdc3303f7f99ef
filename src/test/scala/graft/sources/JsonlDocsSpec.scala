package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util.zip.GZIPOutputStream
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class JsonlDocsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = graft.EngineSession.local("4")
  override def afterAll(): Unit = spark.stop()

  private val goodLines = Seq(
    """{"doc_id": 1, "text": "alpha beta", "lang": "en", "source": "s0", "n_chars": 10}""",
    """{"doc_id": 2, "text": "gamma", "lang": "de", "source": "s1", "n_chars": 999}""",
    """{"doc_id": 3, "text": "delta epsilon zeta", "lang": "en", "source": "s0", "n_chars": 18}""")
  private val badLines = Seq(
    """{"doc_id": 4, "text": "unterminated""",
    """not json at all""",
    // parseable JSON but missing the required id/text: clean() rejects
    // it, so audit's n_ok must not count it (r9 advice fix)
    """{"lang": "xx"}""")

  private def stage(): (String, String) = {
    val d = Files.createTempDirectory(Paths.get("target"), "jsonl")
    Files.write(d.resolve("part-0.jsonl"),
      (goodLines ++ badLines).mkString("\n").getBytes(StandardCharsets.UTF_8))
    val gz = new GZIPOutputStream(
      Files.newOutputStream(d.resolve("part-1.jsonl.gz")))
    gz.write((goodLines.map(_.replace("\"doc_id\": ", "\"doc_id\": 1"))
      .mkString("\n")).getBytes(StandardCharsets.UTF_8)) // ids 11,12,13
    gz.close()
    (d.toString, d.toString)
  }

  test("declared schema parses good lines; corrupt lines are captured, not dropped") {
    val (dir, _) = stage()
    val raw = JsonlDocs.read(spark, dir)
    assert(raw.schema.fieldNames.toSeq ==
      Seq("doc_id", "text", "lang", "source", "n_chars", "_corrupt_record"))
    val a = JsonlDocs.audit(raw).collect()
    assert(a.length == 2)
    val byFile = a.map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
    val plain = byFile.collectFirst { case (f, v) if f.endsWith(".jsonl") => v }.get
    val gzip = byFile.collectFirst { case (f, v) if f.endsWith(".gz") => v }.get
    assert(plain == ((3L, 3L)),
      s"plain file (the schema-valid-but-empty line counts corrupt): $plain")
    assert(gzip == ((3L, 0L)), s"gzip member decodes transparently: $gzip")
  }

  test("clean() heals derived n_chars from the authoritative text") {
    val (dir, _) = stage()
    val c = JsonlDocs.clean(JsonlDocs.read(spark, dir))
    assert(c.schema.fieldNames.toSeq ==
      Seq("doc_id", "text", "lang", "source", "n_chars"))
    assert(c.count() == 6) // 3 plain + 3 gzip, no corrupt rows
    // doc 2 shipped n_chars=999; the healed value is length("gamma")
    val healed = c.filter(col("doc_id") === 2).select("n_chars").head().getLong(0)
    assert(healed == 5L)
    assert(c.filter(col("n_chars") =!= length(col("text"))).count() == 0)
  }

  test("jsonl round-trip: write ∘ read ∘ clean is identity on clean frames") {
    val (dir, _) = stage()
    val c = JsonlDocs.clean(JsonlDocs.read(spark, dir))
      .filter(col("doc_id") < 10) // the plain-file docs
    val out = Files.createTempDirectory(Paths.get("target"), "jsonl-out").toString
    JsonlDocs.write(c, out)
    val back = JsonlDocs.clean(JsonlDocs.read(spark, out))
    assert(back.orderBy("doc_id").collect().toSeq ==
      c.orderBy("doc_id").collect().toSeq)
  }

  test("the real documents table survives a jsonl round-trip") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val out = Files.createTempDirectory(Paths.get("target"), "jsonl-docs").toString
    JsonlDocs.write(docs, out)
    val back = JsonlDocs.clean(JsonlDocs.read(spark, out))
    assert(back.count() == docs.count())
    assert(back.agg(expr("bit_xor(xxhash64(doc_id, text, lang, source, n_chars))"))
      .head().getLong(0) ==
      docs.agg(expr("bit_xor(xxhash64(doc_id, text, lang, source, n_chars))"))
        .head().getLong(0))
  }
}
