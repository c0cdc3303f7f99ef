package graft.streaming

import java.nio.file.{Files => JF, Paths => JP}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The composed daily-ingest pipeline ([[graft.IncrementalPipeline]]) —
  * r11 review item 3: VersionedStore publish → ChangeStream changelog →
  * band-index delta dedup → posting-stats fold → BM25 serving, driven for
  * two days with a checkpointed stream RESTART between them, and pinned
  * against an INDEPENDENT from-scratch batch replay of the same change
  * files (inline dedup, fresh history, batch latest-wins):
  *
  *  - day-N published corpus ≡ replay corpus (ids + text hashes);
  *  - day-1 corpus stays pinned under time-travel after day 2 publishes;
  *  - maintained posting stats ≡ from-scratch recount over the final
  *    corpus;
  *  - streaming BM25 serving against the PUBLISHED stats ≡ batch scoring
  *    with from-scratch stats;
  *  - the planted edges take their designed paths: exact-copy and
  *    near-dup adds screened out (day 2's near-dup against a day-1
  *    ACCEPTED doc proves index maintenance), updates/deletes to
  *    accepted keys apply directly, the in-batch twin keeps min.
  */
class IncrementalPipelineSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = graft.EngineSession.local("4")
  val sf = "/root/testdata/sf0.001"

  override def afterAll(): Unit = spark.stop()

  private def tmp(prefix: String): String =
    JF.createTempDirectory(JP.get("target"), prefix).toString

  private def ids(df: DataFrame): Set[Long] =
    df.select("doc_id").collect().map(_.getLong(0)).toSet

  private def hashes(df: DataFrame): Set[(Long, String)] =
    df.select(col("doc_id"), md5(col("text")).as("h"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet

  test("two-day pipeline across a restart ≡ from-scratch batch replay; " +
    "stats and serving agree") {
    import spark.implicits._
    val base = graft.Tables.documents(spark, sf)
      .filter(col("doc_id") < 300).select("doc_id", "text")
      .localCheckpoint()
    val textOf = base.filter(col("doc_id").isin(3L, 5L, 7L))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

    val storeRoot = tmp("ipl-store")
    val idxRoot = tmp("ipl-idx")
    val statsRoot = tmp("ipl-stats")
    val logDir = tmp("ipl-log")
    val ckpt = tmp("ipl-ckpt")
    val src = JF.createTempDirectory(JP.get("target"), "ipl-src")

    val d0 = graft.IncrementalPipeline.bootstrap(
      base, storeRoot, idxRoot, statsRoot)
    assert(d0.corpusVersion === 1 && d0.nCorpus === 300)

    val freshA = "completely fresh document text with unique vocabulary " +
      "tokens arriving on day one of the incremental ingest cycle"
    val twin = "another novel day one document shared by exact twins"
    val day1 = Seq(
      ChangeStream.Change(100001L, 1, "I", freshA), // accept
      ChangeStream.Change(100002L, 1, "I", textOf(5L) + " appended"), // near-dup of base 5
      ChangeStream.Change(100003L, 1, "I", textOf(7L)), // exact copy of base 7
      ChangeStream.Change(100004L, 1, "I", twin), // accept (keep-min twin)
      ChangeStream.Change(100005L, 1, "I", twin), // in-batch exact -> drop
      ChangeStream.Change(3L, 2, "U", textOf(3L) + " edited"), // editorial update
      ChangeStream.Change(11L, 2, "D", "")) // delete
    val day2 = Seq(
      ChangeStream.Change(200001L, 1, "I", freshA + " trailing"), // near-dup of ACCEPTED 100001
      ChangeStream.Change(200002L, 1, "I",
        "day two genuinely new content with nothing in common at all"), // accept
      ChangeStream.Change(3L, 3, "U",
        "doc three fully rewritten content for day two with new words"),
      ChangeStream.Change(100001L, 2, "U", freshA + " rev"), // update accepted add
      ChangeStream.Change(100004L, 2, "D", "")) // delete a day-1 accepted add

    def stage(part: Seq[ChangeStream.Change], name: String): Unit = {
      val t = JF.createTempDirectory(JP.get("target"), "ipl-stage")
      part.toDS().coalesce(1).write.mode("overwrite").parquet(t.toString)
      val p = JF.list(t).toArray.map(_.toString)
        .find(_.endsWith(".parquet")).get
      JF.copy(JP.get(p), src.resolve(name))
    }

    // ---- day 1: stream in, publish
    stage(day1, "day1.parquet")
    val q1 = ChangeStream.ingest(
      ChangeStream.changes(spark, src.toString), logDir, ckpt)
    q1.processAllAvailable(); q1.stop()
    val d1 = graft.IncrementalPipeline.publishDay(
      spark, storeRoot, idxRoot, statsRoot, logDir)
    assert(d1.corpusVersion === 2)
    assert(d1.nAccepted === 2L, "day 1 accepts freshA + one twin")
    assert(d1.nScreenedOut === 3L, "near-dup, exact copy, twin sibling")
    val v2 = graft.sources.VersionedStore.read(spark, storeRoot, Some(2))
    assert(ids(v2).contains(100001L) && ids(v2).contains(100004L))
    assert(!ids(v2).exists(Set(100002L, 100003L, 100005L)))
    assert(!ids(v2).contains(11L), "deleted key gone")

    // ---- RESTART the ingest stream from its checkpoint, day 2 arrives
    stage(day2, "day2.parquet")
    val q2 = ChangeStream.ingest(
      ChangeStream.changes(spark, src.toString), logDir, ckpt)
    q2.processAllAvailable(); q2.stop()
    val d2 = graft.IncrementalPipeline.publishDay(
      spark, storeRoot, idxRoot, statsRoot, logDir)
    assert(d2.corpusVersion === 3)
    val published = graft.sources.VersionedStore.read(spark, storeRoot)
    // day-2 designed paths
    assert(!ids(published).contains(200001L),
      "near-dup of a day-1 ACCEPTED doc must be screened out — the " +
        "maintained band index saw 100001")
    assert(ids(published).contains(200002L))
    assert(!ids(published).contains(100004L), "day-2 delete applied")
    assert(!ids(published).contains(100005L),
      "tombstone posture: twin text stays deduped after its keeper's delete")

    // ---- time-travel: day-1 snapshot unchanged by day 2
    assert(hashes(graft.sources.VersionedStore.read(spark, storeRoot, Some(2)))
      === hashes(v2))

    // ---- independent from-scratch replay: batch latest-wins over the raw
    //      change files, INLINE dedup against a grown content history
    def replayDay(corpus: DataFrame, history: DataFrame,
        cumulative: Seq[ChangeStream.Change]): (DataFrame, DataFrame) = {
      val latest = graft.operators.Incremental.latestPerKey(
        cumulative.toDF("doc_id", "seq", "op", "text"))
      val keys = corpus.select("doc_id")
      val adds = latest.filter(col("op") =!= "D")
        .join(keys, Seq("doc_id"), "left_anti").select("doc_id", "text")
      val surv = graft.operators.Dedup.deduplicateAgainst(adds, history, 0.6)
      val applicable = latest.join(keys, Seq("doc_id"), "left_semi")
        .unionByName(latest.join(surv.select("doc_id"), Seq("doc_id"), "left_semi"))
      (graft.operators.Incremental.applyLatest(corpus, applicable)
        .localCheckpoint(),
        history.unionByName(surv).localCheckpoint())
    }
    val (r1, h1) = replayDay(base, base, day1)
    assert(hashes(r1) === hashes(v2), "day-1 publish ≡ day-1 replay")
    val (r2, _) = replayDay(r1, h1, day1 ++ day2)
    assert(hashes(r2) === hashes(published), "day-2 publish ≡ replay")

    // ---- posting stats: maintained fold ≡ from-scratch recount
    val maintained = graft.IncrementalPipeline.loadStats(spark, statsRoot)
    val recount = graft.operators.Retrieval.bm25StatsOf(published)
    assert(maintained === recount)

    // ---- serving: streaming matchBm25 against the PUBLISHED stats ≡
    //      batch scoring with the from-scratch stats
    val arrivals = Seq(
      (900001L, "dup key spark batch dup"),
      (900002L, "spark spark batch filler"),
      (900003L, "nothing relevant whatsoever")).toDF("doc_id", "text")
    val arrDir = tmp("ipl-arrivals")
    arrivals.coalesce(1).write.mode("overwrite").parquet(arrDir)
    val stream = spark.readStream.schema(arrivals.schema).parquet(arrDir)
    val qs = DocStream.matchBm25(stream, maintained._1, maintained._2,
        maintained._3, 1L)
      .writeStream.format("memory").queryName("ipl_serving")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    qs.awaitTermination()
    val served = spark.table("ipl_serving")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val batch = graft.operators.Retrieval
      .bm25ScoreAgainst(spark.read.parquet(arrDir),
        recount._1, recount._2, recount._3)
      .filter(col("score_micro") >= 1L)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(served === batch)
    assert(served.contains(900001L) && !served.contains(900003L))
  }
}
