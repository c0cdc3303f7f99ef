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
}
