package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The BM25 serving path: the frozen-stats scorer must agree bit-for-bit
  * with the analytical scorer (r01's relation), and the streaming match
  * lane must emit exactly the batch answer regardless of micro-batch
  * cuts — the standing-query contract.
  */
class RetrievalStreamSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = graft.EngineSession.local("4")
  val sf = "/root/testdata/sf0.001"

  override def afterAll(): Unit = spark.stop()

  test("frozen-stats scorer equals the analytical BM25 relation") {
    val (n, sumDl, dfs) = graft.operators.Retrieval.bm25Stats(spark, sf)
    val serving = graft.operators.Retrieval
      .bm25ScoreAgainst(graft.Tables.documents(spark, sf), n, sumDl, dfs)
      .filter(col("n_hit") > 0)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val analytical = graft.operators.Retrieval.bm25Scored(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(serving === analytical)
    assert(serving.nonEmpty)
  }

  test("streaming BM25 match equals batch across micro-batch cuts") {
    import spark.implicits._
    val (n, sumDl, dfs) = graft.operators.Retrieval.bm25Stats(spark, sf)
    val d = Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "bm25-stream")
    // two arrival files: one with strong matches, one mixed
    val f1 = Seq((1L, "dup key spark batch dup"), (2L, "plain filler text"))
      .toDF("doc_id", "text")
    val f2 = Seq((3L, "dup dup dup"), (4L, "key key batch"),
      (5L, "nothing relevant at all")).toDF("doc_id", "text")
    f1.coalesce(1).write.parquet(d.resolve("in1").toString)
    f2.coalesce(1).write.parquet(d.resolve("in2").toString)
    val in = d.resolve("in").toString
    new java.io.File(in).mkdirs()
    def onlyParquet(dir: String): java.io.File =
      new java.io.File(dir).listFiles().find(_.getName.endsWith(".parquet")).get
    Files.copy(onlyParquet(d.resolve("in1").toString).toPath,
      java.nio.file.Paths.get(in, "part-0.parquet"))
    Files.copy(onlyParquet(d.resolve("in2").toString).toPath,
      java.nio.file.Paths.get(in, "part-1.parquet"))
    val now = System.currentTimeMillis()
    new java.io.File(in, "part-0.parquet").setLastModified(now - 60000)
    new java.io.File(in, "part-1.parquet").setLastModified(now)
    val schema = spark.read.parquet(in).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(in)
    val thr = 1000000L
    val q = DocStream.matchBm25(stream, n, sumDl, dfs, thr)
      .writeStream.format("memory").queryName("bm25_matches")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = spark.table("bm25_matches")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val batch = DocStream.matchBm25(
        spark.read.parquet(in), n, sumDl, dfs, thr)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(streamed === batch)
    // the no-hit docs never match; the all-rare-term doc always does
    assert(!streamed.contains(2L) && !streamed.contains(5L))
    assert(streamed.contains(3L))
    org.apache.commons.io.FileUtils.deleteQuietly(d.toFile)
  }
}
