package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class DedupPipelineSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = graft.EngineSession.local("4")
  val sfDir = "/root/testdata/sf0.001"

  override def afterAll(): Unit = spark.stop()

  test("injected duplicates are removed, originals survive") {
    val docs = graft.Tables.documents(spark, sfDir).select("doc_id", "text")
    // baseline: what the corpus itself dedupes to
    val baseline = Dedup.deduplicate(docs, jaccardThreshold = 0.5).count()
    // exact copies under higher doc_ids (J=1 → always LSH candidates;
    // near-copies are exercised by the oracle-checked queries — their
    // LSH capture is probabilistic by design, wrong for a unit test)
    val copies = docs.orderBy("doc_id").limit(3)
      .select((col("doc_id") + 100000).as("doc_id"), col("text"))
    val withDups = docs.union(copies)
    val deduped = Dedup.deduplicate(withDups, jaccardThreshold = 0.5)

    assert(deduped.count() == baseline,
      "the 3 injected copies must be dropped, nothing else beyond baseline")
    // keep-min policy: the surviving ids are the originals
    assert(deduped.filter(col("doc_id") >= 100000).count() == 0)
  }

  test("idempotent on already-deduplicated data") {
    val docs = graft.Tables.documents(spark, sfDir).select("doc_id", "text")
    val once = Dedup.deduplicate(docs, jaccardThreshold = 0.5)
    val twice = Dedup.deduplicate(once, jaccardThreshold = 0.5)
    assert(once.count() == twice.count())
  }

  test("keepCanonical over a precomputed cluster table: best member wins") {
    import spark.implicits._
    val docs = Seq(
      (1L, 40L), (2L, 90L), (3L, 90L), // cluster 1: tie at 90 → doc 2 wins
      (7L, 10L),                       // cluster 7: singleton pair partner
      (8L, 99L)                        // cluster 7's best member
    ).toDF("doc_id", "score")
    val clusters = Seq(
      (1L, 1L), (2L, 1L), (3L, 1L), (7L, 7L), (8L, 7L)).toDF("doc_id", "cluster")
    val out = Dedup.keepCanonical(docs, clusters, col("score"))
      .select("doc_id", "cluster", "keep").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(out === Set(
      (1L, 1L, false), (2L, 1L, true), (3L, 1L, false),
      (7L, 7L, false), (8L, 7L, true)))
    // exactly one canonical per cluster, selection never recomputes pairs:
    // the plan touches only the two input relations
    val plan = Dedup.keepCanonical(docs, clusters, col("score"))
      .queryExecution.optimizedPlan.toString
    assert(!plan.toLowerCase.contains("generate"), plan) // no re-shingling
  }

  test("cluster table composes: selection + removal from ONE clustering") {
    val docs = graft.Tables.documents(spark, sfDir).select("doc_id", "text")
    val clusters = Dedup.jaccardClusters(docs, 0.2, 50)
    val marked = Dedup.keepCanonical(
      docs.select(col("doc_id"), length(col("text")).as("n_chars")),
      clusters, col("n_chars"))
    val keepIds = marked.filter(col("keep")).select("doc_id")
    // one keeper per cluster; removal = anti-join of the non-keepers
    val perCluster = marked.groupBy("cluster")
      .agg(sum(when(col("keep"), 1).otherwise(0)).as("n_keep"))
    assert(perCluster.filter(col("n_keep") =!= 1).count() === 0)
    val kept = docs.join(
      marked.filter(!col("keep")).select("doc_id"), Seq("doc_id"), "left_anti")
    assert(kept.count() === docs.count() - marked.filter(!col("keep")).count())
    assert(keepIds.count() === clusters.select("cluster").distinct().count())
  }
}
