package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class MultimodalSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = graft.EngineSession.local("4")
  val sfDir = "/root/testdata/sf0.001"

  override def afterAll(): Unit = spark.stop()

  test("decodeStub: per-partition decode is deterministic and complete") {
    val media = Multimodal.mediaFromDocuments(spark, sfDir)
    val feats = Multimodal.decodeStub(media)
    assert(feats.count() == media.count())
    val row = feats.filter(col("media_id") === 0).collect().head
    // histogram is normalized: 8 buckets summing to ~1
    assert(row.features.length == 8)
    assert(math.abs(row.features.sum - 1f) < 1e-4)
    // partitioning-independent
    val repart = Multimodal.decodeStub(media.repartition(7))
      .filter(col("media_id") === 0).collect().head
    assert(repart.features.toSeq == row.features.toSeq)
    assert(repart.n_bytes == row.n_bytes && repart.header == row.header)
  }

  test("frameSample: offsets step through the payload, nothing collected") {
    val media = Multimodal.mediaFromDocuments(spark, sfDir)
    val frames = Multimodal.frameSample(media, step = 64)
    val one = frames.filter(col("media_id") === 0)
      .orderBy("frame_idx").collect()
    val nBytes = media.filter(col("media_id") === 0)
      .select(octet_length(col("content"))).collect().head.getInt(0)
    assert(one.head.getAs[Int]("byte_offset") == 0)
    assert(one.map(_.getAs[Int]("byte_offset")).toSeq ==
      (0 until nBytes by 64).toSeq)
    // every media row contributes at least one frame
    assert(frames.select("media_id").distinct().count() == media.count())
  }

  test("resizeStub: strided downsample preserves schema and determinism") {
    val media = Multimodal.mediaFromDocuments(spark, sfDir)
    val small = Multimodal.resizeStub(media, factor = 4)
    assert(small.count() == media.count())
    val orig = media.filter(col("media_id") === 1).collect().head
    val shrunk = small.filter(col("media_id") === 1).collect().head
    assert(shrunk.content.length == (orig.content.length + 3) / 4)
    assert(shrunk.content.toSeq ==
      orig.content.indices.collect { case i if i % 4 == 0 => orig.content(i) }.toSeq)
    // decode composes downstream of resize
    val feats = Multimodal.decodeStub(small)
    assert(feats.count() == media.count())
  }
}
