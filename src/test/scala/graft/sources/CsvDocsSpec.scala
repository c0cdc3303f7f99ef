package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util.zip.GZIPOutputStream
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** [[CsvDocs]]: declared-schema CSV/TSV ingest with corrupt-row audit —
  * the JsonlDocsSpec contract on the other wire format, plus the
  * CSV-specific hazards (quoted delimiters, `""` escapes, TSV dialect).
  */
class CsvDocsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = graft.EngineSession.local("4")
  override def afterAll(): Unit = spark.stop()

  private val header = "doc_id,text,lang,source,n_chars"
  private val goodLines = Seq(
    """1,alpha beta,en,s0,10""",
    """2,"gamma, with comma",de,s1,999""", // quoted embedded delimiter
    """3,"she said ""hi"" twice",en,s0,18""") // RFC-4180 "" escape
  private val badLines = Seq(
    """zap,broken id,en,s0,5""", // unparseable doc_id → corrupt
    // parseable but missing required id/text: clean() rejects, audit
    // must not count it ok (the JsonlDocs advice-fix contract)
    """,,xx,s9,1""")

  private def stage(): String = {
    val d = Files.createTempDirectory(Paths.get("target"), "csvdocs")
    Files.write(d.resolve("part-0.csv"),
      (header +: (goodLines ++ badLines)).mkString("\n")
        .getBytes(StandardCharsets.UTF_8))
    val gz = new GZIPOutputStream(
      Files.newOutputStream(d.resolve("part-1.csv.gz")))
    gz.write((header +: goodLines.map(l => "1" + l)).mkString("\n")
      .getBytes(StandardCharsets.UTF_8)) // ids 11,12,13
    gz.close()
    d.toString
  }

  test("declared schema parses quoting/escapes; corrupt rows are captured") {
    val dir = stage()
    val raw = CsvDocs.read(spark, dir)
    assert(raw.schema.fieldNames.toSeq ==
      Seq("doc_id", "text", "lang", "source", "n_chars", "_corrupt_record"))
    val byId = CsvDocs.clean(raw).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(byId(2L) == "gamma, with comma", "quoted comma must survive")
    assert(byId(3L) == """she said "hi" twice""", "\"\" must unescape")
    val a = CsvDocs.audit(raw).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
    val plain = a.collectFirst { case (f, v) if f.endsWith(".csv") => v }.get
    val gzip = a.collectFirst { case (f, v) if f.endsWith(".gz") => v }.get
    assert(plain == ((3L, 2L)),
      s"3 clean rows; bad-id and empty-required rows count corrupt: $plain")
    assert(gzip == ((3L, 0L)), s"gzip member decodes transparently: $gzip")
  }

  test("clean() heals derived n_chars from the authoritative text") {
    val c = CsvDocs.clean(CsvDocs.read(spark, stage()))
    val healed = c.filter(col("doc_id") === 2).select("n_chars").head().getLong(0)
    assert(healed == "gamma, with comma".length.toLong)
    assert(c.filter(col("n_chars") =!= length(col("text"))).count() == 0)
  }

  test("TSV dialect parses through readTsv") {
    val d = Files.createTempDirectory(Paths.get("target"), "tsvdocs")
    val rows = Seq(
      "doc_id\ttext\tlang\tsource\tn_chars",
      "21\tdelta epsilon\ten\ts0\t13",
      "22\t\"tab\there\"\tde\ts1\t7") // quoted embedded tab
    Files.write(d.resolve("part-0.tsv"),
      rows.mkString("\n").getBytes(StandardCharsets.UTF_8))
    val c = CsvDocs.clean(CsvDocs.readTsv(spark, d.toString))
    val byId = c.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(byId == Map(21L -> "delta epsilon", 22L -> "tab\there"))
  }

  test("quoted embedded newlines parse via readMultiLine (and only it)") {
    val d = Files.createTempDirectory(Paths.get("target"), "mlcsv")
    Files.write(d.resolve("part-0.csv"),
      (header + "\n" + "31,\"line one\nline two\",en,s0,17\n")
        .getBytes(StandardCharsets.UTF_8))
    val ml = CsvDocs.clean(CsvDocs.readMultiLine(spark, d.toString))
    assert(ml.collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((31L, "line one\nline two")))
    // the splittable default reader must NOT silently accept it as one row
    assert(CsvDocs.clean(CsvDocs.read(spark, d.toString)).count() < 2)
  }

  test("csv round-trip: write ∘ read ∘ clean is identity on clean frames") {
    val c = CsvDocs.clean(CsvDocs.read(spark, stage()))
      .filter(col("doc_id") < 10)
    val out = Files.createTempDirectory(Paths.get("target"), "csv-out").toString
    CsvDocs.write(c, out)
    val back = CsvDocs.clean(CsvDocs.read(spark, out))
    assert(back.orderBy("doc_id").collect().toSeq ==
      c.orderBy("doc_id").collect().toSeq)
  }

  test("the real documents table survives a csv round-trip") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val out = Files.createTempDirectory(Paths.get("target"), "csv-docs").toString
    CsvDocs.write(docs, out)
    val back = CsvDocs.clean(CsvDocs.read(spark, out))
    assert(back.count() == docs.count())
    assert(back.agg(expr("bit_xor(xxhash64(doc_id, text, lang, source, n_chars))"))
      .head().getLong(0) ==
      docs.agg(expr("bit_xor(xxhash64(doc_id, text, lang, source, n_chars))"))
        .head().getLong(0))
  }
}
