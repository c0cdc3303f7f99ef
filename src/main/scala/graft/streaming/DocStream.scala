package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming corpus curation — the ingest-time form of the batch
  * curation pipeline (`graft.PipelineDemo`): documents land continuously
  * (crawl output, upload feeds), and the gate + dedup run per micro-batch
  * instead of as a nightly batch.
  *
  * Scale shape: the quality gate is per-row (scan-fused, no state); exact
  * dedup keys on the 64-bit content fingerprint so state per seen document
  * is one long, never the text. State growth is the real design decision
  * at 100 TB:
  *   - [[dedupeExact]] keeps all fingerprints (exact global dedup — state
  *     grows with DISTINCT content; bounded only by corpus cardinality);
  *   - [[dedupeWithin]] bounds state with an ingest-time watermark
  *     (`dropDuplicatesWithinWatermark`): duplicates separated by more
  *     than the horizon pass through and are swept by the periodic batch
  *     compaction (`Dedup.exact`) — the standard lambda split: streaming
  *     handles the near-duplicate-in-time mass (replays, double uploads),
  *     batch owns the long tail.
  */
object DocStream {

  /** Streaming view of a documents parquet directory (file-source
    * micro-batch discovery, same pattern as [[EventStream.events]]).
    */
  def documents(spark: SparkSession, docsDir: String): DataFrame = {
    val schema = spark.read.parquet(docsDir).schema
    spark.readStream.schema(schema).parquet(docsDir)
  }

  /** Content fingerprint column: the dedup state unit (8 bytes/doc). */
  private def withFp(docs: DataFrame): DataFrame =
    docs.withColumn("fp", xxhash64(col("text")))

  /** Exact streaming dedup on the content fingerprint — first occurrence
    * wins across all micro-batches. State = one long per distinct text.
    */
  def dedupeExact(docs: DataFrame): DataFrame =
    withFp(docs).dropDuplicates("fp")

  /** Watermark-bounded streaming dedup: duplicates arriving within
    * `horizon` of each other collapse; state is evicted past the
    * watermark. `tsCol` is the event/ingest timestamp column.
    */
  def dedupeWithin(docs: DataFrame, tsCol: String, horizon: String): DataFrame =
    withFp(docs)
      .withWatermark(tsCol, horizon)
      .dropDuplicatesWithinWatermark("fp")

  /** Full streaming curation: per-row quality gate, then exact dedup.
    * Composes the SAME operator code as the batch pipeline
    * (`TextAnalysis.qualityFilter`), so stream and batch answers agree by
    * construction — asserted in DocStreamSpec.
    */
  def curate(docs: DataFrame): DataFrame =
    dedupeExact(
      graft.operators.TextAnalysis.qualityFilter(docs)
        .filter(col("quality_pass"))
        .select(docs.columns.map(col): _*))

  /** foreachBatch append sink (exactly-once-per-batch parquet appends),
    * the document counterpart of [[EventStream.ingest]].
    */
  def ingest(stream: DataFrame, outDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.write.mode("append").parquet(outDir)
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
}
