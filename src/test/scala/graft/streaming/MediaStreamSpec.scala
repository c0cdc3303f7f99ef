package graft.streaming

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.operators.Multimodal

/** Streaming multimodal lane: decode + aHash on the stream, perceptual
  * dedup — stream ≡ batch by shared operator code, state bounded by the
  * watermark in the `dedupeWithin` variant (eviction pinned by a
  * re-emission after the horizon).
  */
class MediaStreamSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = graft.EngineSession.local("4")
  override def afterAll(): Unit = spark.stop()

  test("streaming perceptual dedup keeps exactly the batch hash classes, across a trigger cut") {
    import spark.implicits._
    // stage pattern PNGs (ids 0..39: 16 classes, several brightnesses) as
    // two parquet files so the dedup state crosses a trigger boundary
    val dir = Files.createTempDirectory(Paths.get("target"), "media-src")
    def stage(ids: Range, name: String): Unit = {
      val tmp = Files.createTempDirectory(Paths.get("target"), "media-tmp")
      ids.map(i => Multimodal.MediaRow(i.toLong, "image",
          Multimodal.syntheticPatternPng(i.toLong))).toDS()
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp).toArray.map(_.toString)
        .find(_.endsWith(".parquet")).get
      Files.copy(Paths.get(part), dir.resolve(name))
    }
    stage(0 until 20, "a.parquet")
    stage(20 until 40, "b.parquet")

    val schema = spark.read.parquet(dir.toString).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir.toString).as[Multimodal.MediaRow]
    val q = MediaStream.dedupePerceptualUnbounded(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("mediadedup").start()
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("mediadedup").collect()
      .map(r => (r.getAs[Long]("phash_hi"), r.getAs[Long]("phash_lo")))
    val batchClasses = Multimodal.aHash(
        (0 until 40).map(i => Multimodal.MediaRow(i.toLong, "image",
          Multimodal.syntheticPatternPng(i.toLong))).toDS())
      .collect().map(h => (h.phash_hi, h.phash_lo)).toSet
    assert(streamed.toSet == batchClasses, "hash classes differ from batch")
    assert(streamed.length == batchClasses.size,
      "a perceptual class emitted more than once across the trigger cut")
  }

  test("dedupeWithin: collapses inside the horizon, re-emits after eviction") {
    import spark.implicits._
    val hour = 3600L * 1000000L // micros
    def row(id: Long, patternId: Long, tMicros: Long) = MediaStream.MediaRowT(
      id, "image", Multimodal.syntheticPatternPng(patternId),
      new java.sql.Timestamp(tMicros / 1000))
    val dir = Files.createTempDirectory(Paths.get("target"), "mediaw-src")
    def stage(rows: Seq[MediaStream.MediaRowT], name: String): Unit = {
      val tmp = Files.createTempDirectory(Paths.get("target"), "mediaw-tmp")
      rows.toDS().coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp).toArray.map(_.toString)
        .find(_.endsWith(".parquet")).get
      Files.copy(Paths.get(part), dir.resolve(name))
    }
    // batch 1: pattern 3 at t0 and t0+10min (dup inside 1h horizon →
    // collapses) + a different pattern at t0+5h that drags the watermark
    // to t0+4h, evicting pattern-3 state (t0 + 1h < watermark)
    stage(Seq(
      row(1L, 3L, 0L), row(2L, 3L, 10L * 60 * 1000000L),
      row(3L, 7L, 5L * hour)), "a.parquet")

    val schema = spark.read.parquet(dir.toString).schema
    def start() = {
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(dir.toString).as[MediaStream.MediaRowT]
      MediaStream.dedupeWithin(stream, "1 hour")
        .writeStream.outputMode("append")
        .format("memory").queryName("mediawithin").start()
    }
    val q = start()
    q.processAllAvailable()
    // batch 2: pattern 3 again at t0+4.5h — its earlier state is evicted,
    // so it re-emits (the bounded-state contract: beyond the horizon the
    // class is legitimately new again)
    stage(Seq(row(4L, 3L, (45L * hour) / 10)), "b.parquet")
    q.processAllAvailable()
    q.stop()

    val out = spark.table("mediawithin").collect()
      .map(r => (r.getAs[Long]("media_id"), r.getAs[Long]("phash_hi"),
        r.getAs[Long]("phash_lo")))
    val byId = out.map(_._1).sorted.toSeq
    // exactly ONE of the two in-horizon duplicates survives (which one is
    // unspecified within a micro-batch), plus the other class, plus the
    // re-emission after eviction
    assert(byId.length == 3 && (byId.contains(1L) ^ byId.contains(2L)) &&
      byId.contains(3L) && byId.contains(4L),
      s"want one of {1,2}, then 3, then re-emitted 4; got $byId")
    // the survivor and 4 are the same perceptual class (the re-emission)
    val h1 = out.find(r => r._1 == 1L || r._1 == 2L).get
    val h4 = out.find(_._1 == 4L).get
    assert((h1._2, h1._3) == (h4._2, h4._3))
  }
}
