package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Multimodal
import graft.operators.Multimodal.MediaRow

/** Streaming multimodal lane: binary image payloads arrive as files land,
  * decode + perceptual-hash on the executors, and PERCEPTUAL dedup keeps
  * the first-seen image per aHash — the streaming twin of m08, composed
  * from the SAME operator code ([[Multimodal.aHash]]), so stream and
  * batch agree by construction (MediaStreamSpec pins it across a trigger
  * cut).
  *
  * This closes the multimodal gap the batch-only family leaves at
  * ingest time: a crawl delivers re-hosted/re-encoded copies of one
  * image continuously, and content hashes (DocStream's `xxhash64` lane)
  * miss them — brightness-shifted or re-encoded bytes differ while the
  * aHash collides.
  *
  * Scale shape: decode+hash is a stateless per-partition map fused into
  * the micro-batch scan (the [[Multimodal.aHash]] shape — 16 bytes out
  * per image); dedup state is ONE (hi, lo) pair per distinct perceptual
  * class, far smaller than per-image state. [[dedupeWithin]] bounds
  * even that by a watermark horizon for unbounded streams.
  */
object MediaStream {

  /** Streaming view of a directory of MediaRow parquet
    * (media_id BIGINT, kind STRING, content BINARY).
    */
  def media(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    val schema = spark.read.parquet(dir).schema
    spark.readStream.schema(schema).parquet(dir).as[MediaRow]
  }

  /** Decoded perceptual hashes of a media stream (streaming Datasets
    * support the same mapPartitions decode as batch — stateless).
    */
  def hashed(media: Dataset[MediaRow]): DataFrame =
    Multimodal.aHash(media).toDF()

  /** First-seen-wins perceptual dedup across all micro-batches — state
    * grows with every distinct perceptual class EVER seen (16 bytes
    * each, forever). The unbounded-state choice is in the name: reach
    * for [[dedupeWithin]] on unbounded streams; this form is for finite
    * replays/backfills where the distinct-class universe is bounded.
    */
  def dedupePerceptualUnbounded(media: Dataset[MediaRow]): DataFrame =
    hashed(media).dropDuplicates("phash_hi", "phash_lo")

  /** A timestamped media row (arrival/event time for the watermark). */
  final case class MediaRowT(media_id: Long, kind: String,
      content: Array[Byte], et: java.sql.Timestamp)

  final case class ImageHashT(media_id: Long, phash_hi: Long,
      phash_lo: Long, et: java.sql.Timestamp)

  /** Watermark-bounded variant for unbounded streams: perceptual
    * duplicates arriving within `horizon` of each other collapse, state
    * evicts past the watermark (the DocStream.dedupeWithin contract,
    * keyed on the aHash). The timestamp rides THROUGH the decode map
    * (no stream-stream rejoin), so a single watermark governs the dedup.
    */
  def dedupeWithin(media: Dataset[MediaRowT], horizon: String): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val (hi, lo) = graft.operators.Multimodal.aHashBytes(r.content, r.media_id)
        ImageHashT(r.media_id, hi, lo, r.et)
      }
    }.toDF()
      .withWatermark("et", horizon)
      .dropDuplicatesWithinWatermark("phash_hi", "phash_lo")
  }
}
