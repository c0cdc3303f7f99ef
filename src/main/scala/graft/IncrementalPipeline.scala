package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Incremental, Retrieval}
import graft.sources.VersionedStore
import graft.streaming.ChangeStream

/** The incremental daily-ingest pipeline as ONE composed flow — the
  * production story the r11 seams exist for (r11 review item 3):
  *
  * {{{
  *   CDC stream ──ChangeStream.ingest──▶ changelog artifact (append-only)
  *                                            │
  *   publishDay (once per cycle):             ▼
  *     snapshot = VersionedStore.read(latest) + ChangeStream.logLatest
  *     ADDED keys → Dedup.deduplicateAgainst(BandIndex)   [i07 kernel]
  *     survivors + updates/deletes → Incremental.applyLatest [i02 kernel]
  *     → VersionedStore.publish (atomic flip, time-travel)
  *     → Dedup.appendBandIndex (index maintenance, batch-sized)
  *     → Retrieval.bm25StatsDelta (posting-stats fold, r06's twin)
  *       → published to its own versioned store
  *                                            │
  *   serving:                                 ▼
  *     DocStream.matchBm25(arrivals, published stats)
  * }}}
  *
  * Composition laws, pinned in IncrementalPipelineSpec:
  *   - day-N published corpus ≡ an independent from-scratch batch replay
  *     of the same change files (inline dedup, fresh index per day,
  *     batch latest-wins) — across a checkpointed stream RESTART between
  *     the days;
  *   - maintained stats ≡ the from-scratch recount over the final corpus;
  *   - serving scores against the published stats ≡ batch scores against
  *     the from-scratch stats.
  *
  * Dedup posture (the documented contracts):
  *   - the near-dup screen applies to ADDED keys only (new documents
  *     entering the corpus); updates and deletes to already-accepted keys
  *     are ownership operations and apply directly;
  *   - the band index is an accepted-content HISTORY: deleting a doc
  *     removes it from the snapshot but its fingerprints stay until the
  *     next full rebuild (tombstone posture — re-inserted duplicate
  *     content stays out), and an update's new text joins the index at
  *     the next rebuild;
  *   - screened-out adds are re-screened on later days (logLatest keeps
  *     reporting them) and re-dropped deterministically — idempotent,
  *     delta-proportional re-work, no state beyond the artifacts.
  *
  * Every per-day cost is delta-proportional: logLatest is one aggregate
  * over the (log-sized) artifact, the screen probes the band index
  * (BenchDelta's flat-in-corpus measurement), applyLatest anti-joins the
  * base against the (broadcastable) latest table, the stats fold
  * aggregates only removed/added docs, and the index append is
  * batch-sized blind writes.
  */
object IncrementalPipeline {

  /** Outcome of one publish cycle. */
  final case class DayState(
      corpusVersion: Int, statsVersion: Int, nCorpus: Long,
      nAccepted: Long, nScreenedOut: Long)

  /** Day 0: publish the base corpus, build its band index, freeze and
    * publish the serving stats.
    */
  def bootstrap(base: DataFrame, storeRoot: String, idxRoot: String,
      statsRoot: String): DayState = {
    val spark = base.sparkSession
    val docs = base.select("doc_id", "text")
    val v = VersionedStore.publish(docs, storeRoot)
    Dedup.writeBandIndex(docs, idxRoot)
    val sv = publishStats(spark, statsRoot, Retrieval.bm25StatsOf(docs))
    DayState(v, sv, docs.count(), 0L, 0L)
  }

  /** One publish cycle over whatever the changelog artifact currently
    * holds (the stream keeps appending; this folds the latest state).
    */
  def publishDay(spark: SparkSession, storeRoot: String, idxRoot: String,
      statsRoot: String, logDir: String,
      jaccardThreshold: Double = 0.6): DayState = {
    val base = VersionedStore.read(spark, storeRoot).select("doc_id", "text")
    // log-sized; several legs below re-derive it
    val latest = ChangeStream.logLatest(spark, logDir).localCheckpoint()
    val baseKeys = base.select("doc_id")

    // screen ADDED keys (new documents) against the accepted corpus via
    // the materialized band index — the i07 kernel, delta-proportional
    val addCands = latest.filter(col("op") =!= "D")
      .join(baseKeys, Seq("doc_id"), "left_anti")
      .select("doc_id", "text")
    val survivors = Dedup
      .deduplicateAgainst(addCands, Dedup.loadBandIndex(spark, idxRoot),
        jaccardThreshold)
      .localCheckpoint()

    // fold: existing-key rows (updates/deletes) + accepted adds
    val applicable = latest
      .join(baseKeys, Seq("doc_id"), "left_semi")
      .unionByName(latest
        .join(survivors.select("doc_id"), Seq("doc_id"), "left_semi"))
    val applied = Incremental.applyLatest(base, applicable).localCheckpoint()

    // exact stats fold from the narrow snapshot diff (i01's shape):
    // removed = base rows whose key vanished or text changed; added =
    // new-corpus rows whose key is new or text changed
    val k1 = base.select(col("doc_id"), col("text"), md5(col("text")).as("h1"))
    val k2 = applied.select(col("doc_id"), col("text"), md5(col("text")).as("h2"))
    val removed = k1
      .join(k2.select(col("doc_id"), col("h2")), Seq("doc_id"), "left_outer")
      .filter(col("h2").isNull || col("h2") =!= col("h1"))
      .select("doc_id", "text")
    val added = k2
      .join(k1.select(col("doc_id"), col("h1")), Seq("doc_id"), "left_outer")
      .filter(col("h1").isNull || col("h1") =!= col("h2"))
      .select("doc_id", "text")
    val newStats = Retrieval.bm25StatsDelta(
      loadStats(spark, statsRoot), removed, added)

    val v = VersionedStore.publish(applied, storeRoot)
    Dedup.appendBandIndex(survivors, idxRoot)
    val sv = publishStats(spark, statsRoot, newStats)
    DayState(v, sv, applied.count(), survivors.count(),
      addCands.count() - survivors.count())
  }

  /** Publish frozen serving stats as a 1-row versioned relation —
    * corpus version and stats version advance in lockstep when driven
    * through [[bootstrap]]/[[publishDay]].
    */
  def publishStats(spark: SparkSession, statsRoot: String,
      stats: (Long, Long, Seq[Long])): Int = {
    val row = spark.range(1).select(
      lit(stats._1).as("n_total"), lit(stats._2).as("sum_dl"),
      array(stats._3.map(lit(_)): _*).as("dfs"))
    VersionedStore.publish(row, statsRoot)
  }

  /** Load published serving stats (the pointer's version by default). */
  def loadStats(spark: SparkSession, statsRoot: String,
      version: Option[Int] = None): (Long, Long, Seq[Long]) = {
    val r = VersionedStore.read(spark, statsRoot, version).head()
    (r.getAs[Long]("n_total"), r.getAs[Long]("sum_dl"),
      r.getAs[scala.collection.Seq[Long]]("dfs").toVector)
  }
}
