package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.Similarity
import graft.operators.Similarity.IvfModel

/** Streaming ANN-index maintenance: the incremental half of IVF.
  *
  * The expensive part of an IVF index — TRAINING the coarse quantizer —
  * happens rarely, offline, over a snapshot ([[Similarity.ivfIndex]]).
  * What arrives continuously is new vectors, and routing those needs no
  * retraining: assignment is a scan-fused argmax against the frozen
  * centroid literals ([[Similarity.ivfAssign]] — map-only, no shuffle, no
  * per-batch driver state). So ingest is a foreachBatch loop that routes
  * each micro-batch and appends it to a `cid`-partitioned parquet index:
  * searches prune to their probed lists at FILE level (partition pruning
  * on `cid`), and the append path scales with batch size, never with
  * index size.
  *
  * Consistency contract: because routing is expression-identical with the
  * batch build's final assignment, a stream-built index over batches
  * B₁…Bₙ equals the batch index over B₁∪…∪Bₙ row-for-row (VecStreamSpec).
  * Centroid drift — the corpus distribution wandering away from the
  * trained quantizer — is an OFFLINE re-train + re-route decision
  * ([[Similarity.ivfRecall]] is the monitor); the ingest loop stays
  * append-only either way.
  */
object VecStream {

  /** Streaming view of an embeddings parquet directory. */
  def vectors(spark: SparkSession, dir: String): DataFrame = {
    val schema = spark.read.parquet(dir).schema
    spark.readStream.schema(schema).parquet(dir)
  }

  /** Route every micro-batch against `model`'s trained centroids and
    * append to the `cid`-partitioned list files under `indexDir`.
    * Exactly-once per batch via foreachBatch; AvailableNow drains all
    * pending files and stops.
    */
  def ivfIngest(stream: DataFrame, model: IvfModel, indexDir: String,
      checkpointDir: String): StreamingQuery =
    stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        Similarity.ivfAssign(model, batch)
          .write.mode("append").partitionBy("cid").parquet(indexDir)
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()

  /** The searchable model over a stream-built index: same trained
    * centroids, assignments read back from the ingested list files.
    * `cid` comes back as a partition column; reorder to the assignment
    * schema so [[Similarity.ivfSearch]] sees the batch-built shape.
    */
  def loadIndex(spark: SparkSession, model: IvfModel, indexDir: String): IvfModel =
    model.copy(assignments = spark.read.parquet(indexDir)
      .select(col("vec_id"), col("qv"), col("sq"), col("cid").cast("long")))

  /** Streaming ANN SERVING: each micro-batch of query vectors probes the
    * frozen index ([[Similarity.ivfSearch]] — broadcast probes, the
    * corpus never shuffles) and lands its results under a per-batch
    * directory (idempotent under retry, the [[EventStream.ingest]]
    * commit pattern). Search is stateless given the model, so streamed
    * results over batches Q₁…Qₙ equal the batch search over Q₁∪…∪Qₙ
    * row-for-row (VecStreamSpec) — the query side of the ingest loop
    * above: vectors stream IN through ivfIngest, queries stream THROUGH
    * here, and the model retrains offline on its own cadence.
    */
  def searchStream(queries: DataFrame, model: IvfModel, k: Int, nprobe: Int,
      outDir: String, checkpointDir: String): StreamingQuery =
    queries.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        Similarity.ivfSearch(model, batch, k, nprobe)
          .write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
}
