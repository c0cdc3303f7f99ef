package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Streaming CDC ≡ batch i02, across trigger cuts, out-of-order delivery,
  * and a checkpointed restart (replay-idempotent artifact fold).
  */
class ChangeStreamSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = graft.EngineSession.local("4")
  val sfDir = "/root/testdata/sf0.001"

  override def afterAll(): Unit = spark.stop()

  private def tmp(prefix: String): String =
    Files.createTempDirectory(java.nio.file.Paths.get("target"), prefix)
      .toString

  /** The i02 derived changelog as Change rows, deterministically ordered. */
  private def changeRows: Seq[ChangeStream.Change] = {
    import spark.implicits._
    graft.operators.Incremental.changelog(spark, sfDir)
      .as[ChangeStream.Change].collect().toSeq
      .sortBy(c => (c.doc_id, c.seq))
  }

  test("latest-wins state across shuffled trigger cuts = batch reduction") {
    import spark.implicits._
    val rows = changeRows
    // adversarial delivery: interleave keys, reverse seq order per key,
    // split across three triggers
    val shuffled = new scala.util.Random(7).shuffle(rows)
    val cuts = shuffled.grouped((shuffled.size + 2) / 3).toSeq

    val input = MemoryStream[ChangeStream.Change](spark)
    val q = ChangeStream.latestWins(input.toDS())
      .writeStream.outputMode("update")
      .format("memory").queryName("cdc_state").start()
    cuts.foreach { c => input.addData(c); q.processAllAvailable() }
    q.stop()

    // last update per key in the memory sink is the key's final state
    val streamed = spark.table("cdc_state")
      .groupBy("doc_id")
      .agg(max(struct(col("seq"), col("op"), col("text"))).as("top"))
      .select(col("doc_id"), col("top.op"), col("top.text"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet

    val batch = graft.operators.Incremental.latestPerKey(rows.toDF())
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet

    assert(streamed == batch)
  }

  test("artifact fold + base snapshot = the oracle-gated i02 result") {
    import spark.implicits._
    val rows = changeRows
    val logDir = tmp("cdc-log")
    val ckpt = tmp("cdc-ckpt")

    val input = MemoryStream[ChangeStream.Change](spark)
    val q = ChangeStream.ingest(input.toDS(), logDir, ckpt)
    rows.grouped((rows.size + 1) / 2).foreach { c =>
      input.addData(c); q.processAllAvailable()
    }
    q.stop()

    val base = graft.operators.Incremental.snapshotV1(spark, sfDir)
      .select(col("doc_id"), col("text"))
    val snap = ChangeStream.snapshot(base, spark, logDir)
      .select(col("doc_id"), md5(col("text")).as("text_hash"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

    val i02 = graft.QueryCatalog.byName("i02_upsert_merge").run(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

    assert(snap == i02)
  }

  test("checkpointed restart resumes latest-wins state; fold = batch") {
    import spark.implicits._
    import java.nio.file.{Files => JF, Paths => JP}
    val rows = changeRows
    val (first, second) = rows.splitAt(rows.size / 2)
    val src = JF.createTempDirectory(JP.get("target"), "cdc-src")
    val logDir = tmp("cdc-log2")
    val ckpt = tmp("cdc-ckpt2")

    def stage(part: Seq[ChangeStream.Change], name: String): Unit = {
      val t = JF.createTempDirectory(JP.get("target"), "cdc-stage")
      part.toDS().coalesce(1).write.mode("overwrite").parquet(t.toString)
      val p = JF.list(t).toArray.map(_.toString)
        .find(_.endsWith(".parquet")).get
      JF.copy(JP.get(p), src.resolve(name))
    }

    stage(first, "a.parquet")
    val q1 = ChangeStream.ingest(
      ChangeStream.changes(spark, src.toString), logDir, ckpt)
    q1.processAllAvailable(); q1.stop()

    // restart from the checkpoint: state restored, file a not reprocessed
    stage(second, "b.parquet")
    val q2 = ChangeStream.ingest(
      ChangeStream.changes(spark, src.toString), logDir, ckpt)
    q2.processAllAvailable(); q2.stop()

    val batch = graft.operators.Incremental.latestPerKey(rows.toDF())
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    def fold(): Set[(Long, String, String)] =
      ChangeStream.logLatest(spark, logDir)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(fold() == batch)

    // replay idempotency: an at-least-once duplicate append of an old
    // batch's winners must not change the fold
    val dup = spark.read.parquet(logDir).limit(20)
    dup.write.mode("append").parquet(logDir)
    assert(fold() == batch)
  }

  test("ENOSPC mid changelog append: the query dies loudly, the torn " +
    "batch stays invisible to the fold, the checkpointed restart " +
    "replays it and converges to the batch reduction") {
    import spark.implicits._
    import java.nio.file.{Files => JF, Paths => JP}
    spark.sparkContext.hadoopConfiguration
      .set("fs.enospc.impl", classOf[graft.operators.EnospcFs].getName)
    val rows = changeRows
    val (first, second) = rows.splitAt(rows.size / 2)
    val src = JF.createTempDirectory(JP.get("target"), "cdc-esrc")
    val logLocal = JF.createTempDirectory(JP.get("target"), "cdc-elog")
      .toAbsolutePath
    val logDir = "enospc:" + logLocal
    val ckpt = tmp("cdc-eckpt") // plain local: only the ARTIFACT faults

    def stage(part: Seq[ChangeStream.Change], name: String): Unit = {
      val t = JF.createTempDirectory(JP.get("target"), "cdc-estage")
      part.toDS().coalesce(1).write.mode("overwrite").parquet(t.toString)
      val p = JF.list(t).toArray.map(_.toString)
        .find(_.endsWith(".parquet")).get
      JF.copy(JP.get(p), src.resolve(name))
    }
    def fold(): Set[(Long, String, String)] =
      ChangeStream.logLatest(spark, logDir)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    def reduce(part: Seq[ChangeStream.Change]): Set[(Long, String, String)] =
      graft.operators.Incremental.latestPerKey(part.toDF())
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet

    stage(first, "a.parquet")
    val q1 = ChangeStream.ingest(
      ChangeStream.changes(spark, src.toString), logDir, ckpt)
    q1.processAllAvailable() // batch 0 lands
    assert(fold() == reduce(first))

    // the next micro-batch's append dies on a REAL injected disk-full
    stage(second, "b.parquet")
    val e = intercept[Throwable] {
      graft.operators.EnospcFs.armed(
        _.contains(logLocal.getFileName.toString)) {
        q1.processAllAvailable()
      }
    }
    assert(graft.operators.EnospcFs.causeChain(e)
      .contains("No space left on device"),
      s"expected the injected ENOSPC, got: ${
        graft.operators.EnospcFs.causeChain(e)}")
    q1.stop()
    // the torn append is INVISIBLE: the fold still equals batch-0 only
    // (Spark's committer never promoted the failed job's part files)
    assert(fold() == reduce(first),
      "a failed append must not leak rows into the changelog")

    // restart from the checkpoint: foreachBatch is at-least-once, the
    // failed batch replays, and the fold converges to the full reduction
    val q2 = ChangeStream.ingest(
      ChangeStream.changes(spark, src.toString), logDir, ckpt)
    q2.processAllAvailable(); q2.stop()
    assert(fold() == reduce(rows))
  }

  test("zero-delta publish: empty/absent changelog folds to the base unchanged") {
    val base = graft.operators.Incremental.snapshotV1(spark, sfDir)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text"))
    // absent directory (fresh deployment, no batch ever appended)
    val absent = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "cdc-empty").resolve("never-written")
    val snap = ChangeStream.snapshot(base, spark, absent.toString)
    assert(snap.count() === base.count())
    // present but file-less directory (trigger that saw no input)
    val empty = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "cdc-empty2")
    val snap2 = ChangeStream.snapshot(base, spark, empty.toString)
    assert(snap2.count() === base.count())
  }
}
