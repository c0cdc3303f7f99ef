package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Exact-duplicate SKEW armor for the fingerprint dedup family (d03/d09):
  * a corpus where one boilerplate text holds thousands of exact copies must
  * never inflate a single aggregation buffer — fingerprints are computed
  * over DISTINCT texts ([[Dedup.collapseExact]]), and duplicate docs
  * re-enter only through streamed expansion joins. The all-pairs OUTPUT is
  * still quadratic in the multiplicity (that is the queries' contract);
  * what is bounded is per-task state.
  *
  * Expected pair counts are derived independently in the spec from the
  * rep-level fingerprints/candidates and the multiplicities, so the
  * assertions hold for whatever hamming/banding relations the texts
  * actually have.
  */
class DedupSkewSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = graft.EngineSession.local("8")

  private val dir = java.nio.file.Files
    .createTempDirectory(java.nio.file.Paths.get("target"), "graft-skew")
    .toString
  private val HotCopies = 2000L

  // three distinct texts: hot boilerplate (2000 exact copies), a near-dup
  // of it (1 copy), and an unrelated text (2 copies)
  private val hot =
    "the quick brown fox jumps over the lazy dog again and again"
  private val near =
    "the quick brown fox jumps over the lazy dog again and often"
  private val other =
    "completely different content about spark shuffles and parquet row groups"

  override def beforeAll(): Unit = {
    import spark.implicits._
    val docs =
      (0L until HotCopies).map(i => (i, hot)) ++
        Seq((HotCopies, near), (HotCopies + 1, other), (HotCopies + 2, other))
    docs.toDF("doc_id", "text").repartition(8)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  override def afterAll(): Unit = {
    spark.stop()
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  private def docs = graft.Tables.documents(spark, dir)

  private def choose2(n: Long): Long = n * (n - 1) / 2

  test("collapseExact: one row per distinct text, O(1) state per key") {
    val c = Dedup.collapseExact(docs).collect()
    assert(c.length == 3)
    val byText = c.map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(byText(hot) == HotCopies && byText(near) == 1L && byText(other) == 2L)
  }

  test("d09 fingerprint-group lists stay bounded by DISTINCT texts") {
    val collapsed = Dedup.collapseExact(docs)
    val g = Dedup.fpGroups(
      collapsed.select(col("rep_id").as("doc_id"), col("text")))
    val maxIds = g.select(max(size(col("ids")))).head.getInt(0)
    // 2000 exact copies contribute ONE list entry; a list can only exceed
    // 1 if two DIFFERENT texts collide on all 64 bits
    assert(maxIds <= 3, s"fingerprint list grew with duplicate mass: $maxIds")
  }

  test("d09 emits exactly the multiplicity-expanded pairs under 2000x dup mass") {
    val collapsed = Dedup.collapseExact(docs).collect()
    val mult = collapsed.map(r => r.getLong(1) -> r.getLong(2)).toMap
    // rep-level fingerprints via the same production pipeline
    val fps = Dedup.fpGroups(graft.Tables.documents(spark, dir)
        .select("doc_id", "text").groupBy("text")
        .agg(min("doc_id").as("rep_id"), count(lit(1)).as("n_copies"))
        .select(col("rep_id").as("doc_id"), col("text")))
      .select(col("simhash"), explode(col("ids")).as("rep"))
      .collect().map(r => r.getLong(1) -> r.getLong(0)).toMap
    val reps = mult.keys.toSeq.sorted
    var expected = reps.map(r => choose2(mult(r))).sum // diagonals
    for {
      i <- reps.indices; j <- (i + 1) until reps.size
      if java.lang.Long.bitCount(fps(reps(i)) ^ fps(reps(j))) <= 3
    } expected += mult(reps(i)) * mult(reps(j))
    val out = graft.QueryCatalog.byName("d09_simhash_hamming64").run(spark, dir)
    assert(out.count() == expected)
    // every same-text pair reports hamming 0
    assert(out.filter(col("hamming") === 0).count() >=
      reps.map(r => choose2(mult(r))).sum)
  }

  test("deduplicate keeps one representative per duplicated text") {
    val out = Dedup.deduplicate(docs, jaccardThreshold = 0.95).collect()
    val ids = out.map(_.getLong(0)).toSet
    // the 2000-copy hot text survives exactly once, as its smallest id
    assert(ids.contains(0L) && !ids.exists(i => i > 0 && i < HotCopies))
    // the unrelated text's duplicate pair collapses to its representative
    assert(ids.contains(HotCopies + 1) && !ids.contains(HotCopies + 2))
    // `near` survives unless trigram Jaccard with `hot` reaches 0.95
    assert(out.length == 2 || out.length == 3)
  }

  test("d20 char lane emits exactly the multiplicity-expanded candidates " +
      "(same collapse armor as d03)") {
    val collapsed = Dedup.collapseExact(docs).collect()
    val mult = collapsed.map(r => r.getLong(1) -> r.getLong(2)).toMap
    val repPairs = Dedup.charLshCandidates(
        graft.Tables.documents(spark, dir).select("doc_id", "text")
          .groupBy("text")
          .agg(min("doc_id").as("rep_id"), count(lit(1)).as("n_copies"))
          .select(col("rep_id").as("doc_id"), col("text")))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // all three texts are >= 5 chars, so every multi-copy text pairs
    val expected = repPairs.map { case (a, b) => mult(a) * mult(b) }.sum +
      mult.values.map(choose2).sum
    val out = graft.QueryCatalog.byName("d20_dedup_charngram").run(spark, dir)
    assert(out.count() == expected)
  }

  test("d03 emits exactly the multiplicity-expanded LSH candidates") {
    val collapsed = Dedup.collapseExact(docs).collect()
    val mult = collapsed.map(r => r.getLong(1) -> r.getLong(2)).toMap
    val repPairs = Dedup.lshCandidates(
        graft.Tables.documents(spark, dir).select("doc_id", "text")
          .groupBy("text")
          .agg(min("doc_id").as("rep_id"), count(lit(1)).as("n_copies"))
          .select(col("rep_id").as("doc_id"), col("text")))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // all three texts have >= 3 words, so every multi-copy text pairs
    val expected = repPairs.map { case (a, b) => mult(a) * mult(b) }.sum +
      mult.values.map(choose2).sum
    val out = graft.QueryCatalog.byName("d03_dedup_minhash_lsh").run(spark, dir)
    assert(out.count() == expected)
  }
}
