package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}

/** Streaming CDC — the continuous form of the batch incremental family
  * ([[graft.operators.Incremental]], i02): changelog rows (I/U/D ops,
  * seq-ordered per key) arrive as a stream, and the engine maintains
  * latest-wins state per key, appends the per-batch winners to a changelog
  * artifact, and folds artifact + base snapshot into the current corpus on
  * demand.
  *
  * This is the lambda split a daily-updated 100 TB corpus actually runs:
  * the STREAM keeps per-key latest state (one small struct per touched
  * key — never the history), the ARTIFACT is an append-only log (blind
  * appends, no read-modify-write in the hot path, so ingest throughput is
  * write-bound), and the SNAPSHOT fold is a batch job that runs once per
  * publish — [[graft.operators.Incremental.applyLatest]], the exact
  * operator i02 gates against DuckDB, so stream and batch answers agree by
  * construction (asserted across trigger cuts, out-of-order delivery, and
  * a checkpointed restart in ChangeStreamSpec).
  */
object ChangeStream {

  /** One changelog row: op ∈ {I, U, D}, `seq` strictly increasing per key
    * (the CDC source's log sequence number).
    */
  final case class Change(doc_id: Long, seq: Int, op: String, text: String)

  /** Streaming view of a changelog parquet directory (file-source
    * micro-batch discovery — the restart-safe source shape; same pattern
    * as [[EventStream.events]]).
    */
  def changes(spark: SparkSession, dir: String): Dataset[Change] = {
    import spark.implicits._
    val schema = implicitly[org.apache.spark.sql.Encoder[Change]].schema
    spark.readStream.schema(schema).parquet(dir).as[Change]
  }

  // String legs compare UTF-8 BYTES unsigned — the ordering Spark's
  // UTF8String gives `max(struct(seq, op, text))` on the batch side.
  // Scala's default String ordering is UTF-16 code-unit order, which
  // disagrees on seq ties whose texts mix U+E000..U+FFFF chars with
  // supplementary (surrogate-pair) characters — that divergence would
  // silently break the documented stream ≡ batch contract.
  private val utf8Ord: Ordering[String] = (a: String, b: String) =>
    java.util.Arrays.compareUnsigned(
      a.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      b.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  private val changeOrd: Ordering[(Int, String, String)] =
    Ordering.Tuple3(Ordering.Int, utf8Ord, utf8Ord)

  /** Latest-wins state per key, maintained across micro-batches: emits,
    * for every key TOUCHED in a batch, its current winning row (update
    * semantics). Ordering is the tuple (seq, op, text) — identical to the
    * batch side's `max(struct(seq, op, text))` in
    * [[graft.operators.Incremental.latestPerKey]], so a key's final state
    * is delivery-order-independent: any interleaving of triggers converges
    * to the same winner.
    *
    * State per key is ONE (seq, op, text) struct — history is never
    * retained. Keys are never evicted (a corpus key's latest state is
    * meaningful forever); a deployment cycling unbounded key spaces should
    * snapshot-and-reset on each publish, which the artifact + fold split
    * makes a metadata operation.
    */
  def latestWins(changes: Dataset[Change]): Dataset[Change] = {
    import changes.sparkSession.implicits._
    changes
      .groupByKey(_.doc_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (id: Long, rows: Iterator[Change], state: GroupState[Change]) =>
          val batchTop = rows.maxBy(c => (c.seq, c.op, c.text))(changeOrd)
          val winner = state.getOption match {
            case Some(cur)
                if changeOrd.gteq((cur.seq, cur.op, cur.text),
                  (batchTop.seq, batchTop.op, batchTop.text)) =>
              cur
            case _ =>
              state.update(batchTop.copy(doc_id = id))
              batchTop.copy(doc_id = id)
          }
          winner
      }
  }

  /** Ingest: append each batch's winners to the changelog artifact at
    * `logDir`, tagged with the batch id. Blind parquet appends — the hot
    * path never reads the artifact. foreachBatch is at-least-once on
    * restart; [[snapshot]]'s fold is replay-idempotent (a re-appended
    * winner re-reduces to itself), so the artifact needs no dedup pass.
    */
  def ingest(changes: Dataset[Change], logDir: String,
      checkpointDir: String): StreamingQuery =
    latestWins(changes).writeStream
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Change], batchId: Long) =>
        batch.withColumn("batch_id", lit(batchId))
          .write.mode("append").parquet(logDir)
        ()
      }
      .start()

  /** The artifact's current latest-wins state: the same
    * `max(struct(seq, op, text))` reduction as the in-flight stream state,
    * so replayed appends and stale batch winners collapse to the final
    * answer. One map-side-combined aggregate over the log.
    */
  def logLatest(spark: SparkSession, logDir: String): DataFrame = {
    // zero-delta publish cycle (fresh deployment, or a trigger that saw
    // no input): foreachBatch never appended, so the artifact directory
    // is absent or file-less and spark.read.parquet cannot infer a
    // schema — return an EMPTY latest-state relation instead of crashing
    // the most common publish day.
    val p = new org.apache.hadoop.fs.Path(logDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hasData = fs.exists(p) &&
      Option(fs.globStatus(new org.apache.hadoop.fs.Path(logDir, "*.parquet")))
        .exists(_.nonEmpty)
    if (!hasData) {
      import spark.implicits._
      // latestPerKey's output shape: (doc_id, op, text)
      spark.emptyDataset[Change].toDF().select("doc_id", "op", "text")
    } else
      graft.operators.Incremental.latestPerKey(
        spark.read.parquet(logDir).select("doc_id", "seq", "op", "text"))
  }

  /** Publish: fold the changelog artifact into a base snapshot — D
    * removes, I/U upserts, untouched base rows pass through. Exactly the
    * i02-gated [[graft.operators.Incremental.applyLatest]]; the base is
    * never shuffled.
    */
  def snapshot(base: DataFrame, spark: SparkSession, logDir: String): DataFrame =
    graft.operators.Incremental.applyLatest(
      base, logLatest(spark, logDir))
}
