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

  /** Incremental NEAR-dup ingest: each micro-batch is screened against
    * the accumulated index with the full batch kernel
    * ([[graft.operators.Dedup.deduplicateAgainst]] — exact collapse +
    * LSH candidates + exact Jaccard verification), survivors append to
    * both the output and the index. The index carries only (doc_id,
    * text); at 100 TB the screen is the same linear band join the batch
    * pipeline runs, amortized per micro-batch, and the index can be
    * periodically compacted/re-bucketed offline without touching this
    * loop. Exactly-once per batch via foreachBatch; batches run
    * sequentially, so batch N+1 sees batch N's survivors.
    */
  def nearDupIngest(stream: DataFrame, indexDir: String, outDir: String,
      jaccardThreshold: Double = 0.6): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val fs = graft.hep.HadoopIo.fs(spark, indexDir)
        val hasIndex = fs.exists(new org.apache.hadoop.fs.Path(indexDir))
        val index =
          if (hasIndex) spark.read.parquet(indexDir)
          else batch.select(col("doc_id"), col("text")).limit(0)
        val kept = graft.operators.Dedup
          .deduplicateAgainst(batch, index, jaccardThreshold)
          .persist()
        kept.write.mode("append").parquet(outDir)
        kept.select(col("doc_id"), col("text"))
          .write.mode("append").parquet(indexDir)
        kept.unpersist()
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
}
