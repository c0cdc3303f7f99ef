package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Streaming corpus curation ≡ batch curation: the same operator code
  * (quality gate + fingerprint dedup) over the file stream produces the
  * same surviving set as the batch pipeline, including across duplicates
  * planted in a SECOND micro-batch file (cross-batch dedup state).
  */
class DocStreamSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = graft.EngineSession.local("4")
  val sfDir = "/root/testdata/sf0.001"

  /** documents staged into a directory, plus a second file that replays
    * some of the same texts (exact duplicates across micro-batches).
    */
  lazy val docsDir: String = {
    val d = Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "stream-docs")
    Files.copy(
      java.nio.file.Paths.get(s"$sfDir/documents.parquet"),
      d.resolve("part-0.parquet"))
    val replay = graft.Tables.documents(spark, sfDir)
      .filter(col("doc_id") < 10)
      .withColumn("doc_id", col("doc_id") + 1000000L)
    replay.coalesce(1).write.parquet(d.resolve("extra").toString)
    val f = new java.io.File(d.resolve("extra").toString).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    Files.move(f.toPath, d.resolve("part-1.parquet"))
    org.apache.commons.io.FileUtils.deleteQuietly(d.resolve("extra").toFile)
    d.toString
  }

  override def afterAll(): Unit = spark.stop()

  test("streaming curation equals the batch gate + dedup, across batches") {
    val q = DocStream.curate(DocStream.documents(spark, docsDir))
      .writeStream.outputMode("append")
      .format("memory").queryName("curated").start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("curated")
      .select(xxhash64(col("text")).as("fp")).collect()
      .map(_.getLong(0)).toSet

    val all = spark.read.parquet(docsDir)
    val batch = graft.operators.TextAnalysis.qualityFilter(all)
      .filter(col("quality_pass"))
      .select(xxhash64(col("text")).as("fp")).distinct()
      .collect().map(_.getLong(0)).toSet

    assert(streamed == batch,
      s"stream kept ${streamed.size} fingerprints, batch ${batch.size}")
    // the replayed duplicates must NOT survive twice: every fingerprint
    // is unique in the streamed output
    val n = spark.table("curated").count()
    assert(n == streamed.size, s"$n rows but ${streamed.size} fingerprints")
  }

  test("watermark-bounded dedup collapses duplicates within the horizon") {
    import spark.implicits._
    val d = Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "stream-wm")
    // three copies of one text inside a 1-minute span, one unique text
    Seq(
      (1L, "replayed body", "2026-01-01 00:00:00"),
      (2L, "replayed body", "2026-01-01 00:00:10"),
      (3L, "replayed body", "2026-01-01 00:00:40"),
      (4L, "unique body", "2026-01-01 00:00:20"))
      .toDF("doc_id", "text", "t_raw")
      .withColumn("ingest_t", col("t_raw").cast("timestamp")).drop("t_raw")
      .coalesce(1).write.parquet(d.resolve("in").toString)
    val schema = spark.read.parquet(d.resolve("in").toString).schema
    val stream = spark.readStream.schema(schema)
      .parquet(d.resolve("in").toString)
    val q = DocStream.dedupeWithin(stream, "ingest_t", "10 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("wm_dedup").start()
    q.processAllAvailable()
    q.stop()
    val kept = spark.table("wm_dedup").select("text").collect()
      .map(_.getString(0)).sorted
    assert(kept.toSeq == Seq("replayed body", "unique body"),
      s"expected one survivor per text within the horizon, got ${kept.toSeq}")
    org.apache.commons.io.FileUtils.deleteQuietly(d.toFile)
  }
}
