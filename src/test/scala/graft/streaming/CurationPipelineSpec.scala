package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.{Dedup, Paragraphs, TextAnalysis}

/** END-TO-END integration of the composed streaming curation pipeline
  * ([[DocStream.curationPipeline]]): gate → classifier → span dedup →
  * screened near-dup ingest → shards, over a MULTI-batch stream, asserted
  * row-identical (including the shard layout) to the batch composition of
  * the same operators.
  *
  * The fixture is MINED from the sf0.001 corpus at runtime rather than
  * hardcoded: the spec selects gate-passing documents that are span- and
  * near-dup-free within the pool (so the only duplicates are the ones it
  * plants), then stages three trigger files:
  *
  *   - trigger 0: base docs + a co-trigger exact span-duplicate pair
  *     (within-trigger span flags equal the batch profile — both copies
  *     gate out on both sides) + one junk doc (fails the quality gate);
  *   - trigger 1: a NEAR-duplicate (last word mutated, trigram J ≥ 0.6,
  *     still gate-passing) of a trigger-0 short doc — dies against the
  *     INDEX leg in the stream, against the corpus-wide pair in batch,
  *     same survivor (first arrival = min doc_id);
  *   - trigger 2: novel docs (the screened ingest's all-novel fast path).
  *
  * Cross-trigger span duplicates and near-dup chains are deliberately
  * absent — those are the two documented stream/batch asymmetries, each
  * pinned by its own DocStreamSpec contract test.
  */
class CurationPipelineSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = graft.EngineSession.local("4")
  val sfDir = "/root/testdata/sf0.001"

  override def afterAll(): Unit = spark.stop()

  private def gate(df: DataFrame): DataFrame =
    TextAnalysis.classifierScore(TextAnalysis.qualityFilter(df))
      .filter(col("quality_pass") && col("label") === "keep")
      .select(df.columns.map(col).toIndexedSeq: _*)

  private def mutateLastWord(text: String): String = {
    val ws = text.split(" ")
    (ws.init :+ (ws.last + "x")).mkString(" ")
  }

  test("composed stream over 3 triggers ≡ batch composition, shards included") {
    import spark.implicits._
    val d = Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "curation-e2e").toString

    // ---- mine the pool: gate-passing, pairwise span- and near-dup-free
    val all = graft.Tables.documents(spark, sfDir).select("doc_id", "text")
    val passing = gate(all).persist()
    val spanClean = passing.join(
      Paragraphs.spanProfile(passing).filter(col("n_dup_fp") > 0)
        .select("doc_id"),
      Seq("doc_id"), "left_anti")
    val pairs = Dedup.nearDupPairs(spanClean, 0.6)
    val pool = spanClean.join(
        pairs.select(col("doc_a").as("doc_id"))
          .union(pairs.select(col("doc_b").as("doc_id"))).distinct(),
        Seq("doc_id"), "left_anti")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(pool.length >= 12, s"pool too small: ${pool.length}")

    // the near-dup seed: a short doc whose mutated twin still passes the
    // gate and clears trigram Jaccard 0.6 ((n-3)/(n-1) with one changed
    // trigram needs n >= 8 words)
    val seed = pool.find { case (id, t) =>
      val n = t.split(" ").length
      n >= 8 && n <= 14 && {
        val twin = mutateLastWord(t)
        // the twin must survive the gate AND the pair must be an actual
        // LSH candidate (banding recall < 1 by design — deterministic on
        // both sides, so mine a captured pair rather than hope)
        gate(Seq((999999L, twin)).toDF("doc_id", "text")).count() == 1 &&
          Dedup.nearDupPairs(
            Seq((id, t), (999999L, twin)).toDF("doc_id", "text"), 0.6)
            .count() >= 1
      }
    }
    assert(seed.isDefined, "no gate-stable short doc found to mutate")
    val (seedId, seedText) = seed.get
    val rest = pool.filterNot(_._1 == seedId).take(11)
    val (base0, later) = rest.splitAt(7)

    // ---- stage three trigger files (arrival order pinned by mtime)
    val spanDupText = rest.head._2 // long enough by pool construction
    def ts(min: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 10:$min%02d:00")
    val t0 = (base0.map { case (id, t) => (id, t) } ++ Seq(
      (seedId, seedText),
      (500001L, spanDupText + " unique tail alpha beta gamma delta epsilon zeta eta theta"),
      (500002L, spanDupText + " unique tail alpha beta gamma delta epsilon zeta eta theta"),
      (500003L, "x x x x x x x x x x x x")) // fails the repetition gate
    ).map { case (id, t) => (id, t, ts(0)) }
    val t1 = Seq((600000L, mutateLastWord(seedText), ts(1))) ++
      later.take(2).map { case (id, t) => (id, t, ts(1)) }
    val t2 = later.drop(2).map { case (id, t) => (id, t, ts(2)) }
    val in = s"$d/in"
    new java.io.File(in).mkdirs()
    val now = System.currentTimeMillis()
    Seq(t0.toSeq, t1.toSeq, t2.toSeq).zipWithIndex.foreach { case (rows, i) =>
      rows.toDF("doc_id", "text", "ts").coalesce(1)
        .write.parquet(s"$d/stage$i")
      val f = new java.io.File(s"$d/stage$i").listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dst = new java.io.File(in, s"part-$i.parquet")
      Files.copy(f.toPath, dst.toPath)
      dst.setLastModified(now - (3 - i) * 60000)
    }

    // ---- streaming composition
    val shardsDir = DocStream.curationPipeline(
      spark, in, s"$d/stream", "ts", capacityDocs = 256L,
      maxDupFraction = 0.5, jaccardThreshold = 0.6, numShards = 4)

    // ---- batch composition of the same operators
    val staged = spark.read.parquet(in)
    val spanKept = Paragraphs.dropSpanDuplicates(gate(staged), 0.5)
      .select(staged.columns.map(col).toIndexedSeq: _*)
    val deduped = Dedup.deduplicate(spanKept, jaccardThreshold = 0.6)
    graft.operators.Sampling.writeTrainingShards(
      deduped, col("doc_id"), 4, s"$d/batch-shards")

    // ---- row identity of the kept set
    def rowsOf(df: DataFrame): Seq[(Long, String, java.sql.Timestamp)] =
      df.select("doc_id", "text", "ts").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2)))
        .sortBy(_._1).toSeq
    val streamKept = rowsOf(spark.read.parquet(s"$d/stream/kept"))
    val batchKept = rowsOf(deduped)
    assert(streamKept === batchKept,
      s"stream kept ${streamKept.map(_._1)} vs batch ${batchKept.map(_._1)}")

    // the planted scenario resolved as designed
    val keptIds = streamKept.map(_._1).toSet
    assert(keptIds.contains(seedId), "first arrival survives")
    assert(!keptIds.contains(600000L), "cross-trigger near-dup dies")
    assert(!keptIds.contains(500001L) && !keptIds.contains(500002L),
      "co-trigger span-duplicate pair gates out on both sides")
    assert(!keptIds.contains(500003L), "junk doc fails the quality gate")
    assert(later.map(_._1).forall(keptIds.contains), "novel docs all land")

    // ---- shard-layout identity (same shards, same deterministic order)
    def shardRows(dir: String): Map[Int, Seq[Long]] = {
      val df = spark.read.parquet(dir)
      df.select(col("shard").cast("int"), col("doc_id"), col("sort_key"))
        .collect().groupBy(_.getInt(0))
        .map { case (s, rows) =>
          s -> rows.sortBy(_.getAs[Long]("sort_key")).map(_.getLong(1)).toSeq
        }
    }
    assert(shardRows(shardsDir) === shardRows(s"$d/batch-shards"))
    passing.unpersist()
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d))
  }
}
