package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.Similarity

/** [[VecStream]]: a stream-built IVF index must be indistinguishable from
  * the batch-built one — same routing, same search answers — because the
  * assignment expression is shared. Also pins the layout contract (one
  * `cid=` partition directory per non-empty list).
  */
class VecStreamSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = graft.EngineSession.local("4")
  val sfDir = "/root/testdata/sf0.001"

  override def afterAll(): Unit = spark.stop()

  private def tmp(prefix: String): String =
    Files.createTempDirectory(java.nio.file.Paths.get("target"), prefix).toString

  test("stream-ingested index equals the batch assignment, and search agrees") {
    val emb = graft.Tables.embeddings(spark, sfDir)
    val model = Similarity.ivfIndex(emb, nlist = 4, iters = 2)

    // stage the corpus as 3 arrival files (hash-split, all ids covered)
    val in = tmp("vec-in")
    (0 until 3).foreach { i =>
      emb.filter(pmod(col("vec_id"), lit(3)) === i)
        .coalesce(1).write.mode("append").parquet(in)
    }

    val indexDir = tmp("vec-index") + "/idx"
    val q = VecStream.ivfIngest(
      VecStream.vectors(spark, in), model, indexDir, tmp("vec-ckpt"))
    q.awaitTermination()

    val streamed = VecStream.loadIndex(spark, model, indexDir)
    val batchAssign = Similarity.ivfAssign(model, emb)
      .select("vec_id", "cid").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val streamAssign = streamed.assignments
      .select("vec_id", "cid").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(streamAssign == batchAssign,
      "stream routing must equal the batch build's assignment")

    // cid partition directories exist (file-level pruning surface)
    val cids = new java.io.File(indexDir).listFiles()
      .filter(_.getName.startsWith("cid=")).map(_.getName).toSet
    assert(cids == batchAssign.values.toSet.map((c: Long) => s"cid=$c"))

    // search parity: same top-k from the streamed and batch index
    val probes = emb.filter(col("vec_id") < 5)
    def hits(m: Similarity.IvfModel) =
      Similarity.ivfSearch(m, probes, k = 3, nprobe = 2)
        .select("qid", "rn", "cid", "cos").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
        .toSet
    val batchModel = model.copy(
      assignments = Similarity.ivfAssign(model, emb))
    assert(hits(streamed) == hits(batchModel))
  }

  test("a second ingest pass is incremental: only new files are routed") {
    val emb = graft.Tables.embeddings(spark, sfDir)
    val model = Similarity.ivfIndex(emb, nlist = 3, iters = 1)
    val in = tmp("vec-in2")
    val ckpt = tmp("vec-ckpt2")
    val indexDir = tmp("vec-index2") + "/idx"

    emb.filter(col("vec_id") < 20).coalesce(1).write.mode("append").parquet(in)
    VecStream.ivfIngest(VecStream.vectors(spark, in), model, indexDir, ckpt)
      .awaitTermination()
    val afterFirst = spark.read.parquet(indexDir).count()

    emb.filter(col("vec_id") >= 20 && col("vec_id") < 30)
      .coalesce(1).write.mode("append").parquet(in)
    VecStream.ivfIngest(VecStream.vectors(spark, in), model, indexDir, ckpt)
      .awaitTermination()
    val ids = spark.read.parquet(indexDir)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(afterFirst == 20L)
    assert(ids.length == 30 && ids.distinct.length == 30,
      "checkpoint must prevent re-routing already-ingested files")
  }

  test("streaming query serving equals the batch search over all batches") {
    val emb = graft.Tables.embeddings(spark, sfDir)
    val model = Similarity.ivfIndex(emb, nlist = 4, iters = 2)
    val fullModel = model.copy(assignments = Similarity.ivfAssign(model, emb))

    // stage 10 query vectors as 2 arrival files
    val qIn = tmp("vec-qin")
    emb.filter(col("vec_id") < 5).coalesce(1).write.mode("append").parquet(qIn)
    emb.filter(col("vec_id") >= 5 && col("vec_id") < 10)
      .coalesce(1).write.mode("append").parquet(qIn)

    val outDir = tmp("vec-serve") + "/out"
    VecStream.searchStream(VecStream.vectors(spark, qIn), fullModel,
      k = 3, nprobe = 2, outDir, tmp("vec-serve-ckpt"))
      .awaitTermination()

    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("qid", "rn", "cid", "cos").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val streamed = rows(spark.read.parquet(outDir))
    val batch = rows(Similarity.ivfSearch(fullModel,
      emb.filter(col("vec_id") < 10), k = 3, nprobe = 2))
    assert(streamed == batch,
      "stateless serving: streamed micro-batch results must equal the " +
        "batch search over the union of query batches")
  }
}
