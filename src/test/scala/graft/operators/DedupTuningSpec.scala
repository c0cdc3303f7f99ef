package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The user-facing dedup tuning surface: parameterized LSH banding (the
  * recall/precision dial d11 calibrates) and canonical text
  * normalization.
  */
class DedupTuningSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = graft.EngineSession.local("4")
  val sfDir = "/root/testdata/sf0.001"

  override def afterAll(): Unit = spark.stop()

  private def docs = graft.Tables.documents(spark, sfDir)
    .select("doc_id", "text")

  test("(8,2) banding reproduces the registered d03 candidate set exactly") {
    val fixed = Dedup.lshCandidates(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val tuned = Dedup.lshCandidatesTuned(docs, 8, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fixed == tuned)
  }

  test("exact duplicates are candidates under every banding") {
    import spark.implicits._
    val base = docs.limit(5)
    val dup = base.select((col("doc_id") + 50000).as("doc_id"), col("text"))
    val corpus = base.union(dup)
    for ((sigs, bands) <- Seq((8, 2), (8, 8), (16, 4), (12, 3))) {
      val cand = Dedup.lshCandidatesTuned(corpus, sigs, bands)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val expected = base.collect().map(_.getLong(0))
        .filter(id => corpus.filter(col("doc_id") === id)
          .head.getString(1).split(" ").length >= 3)
        .map(id => (id, id + 50000)).toSet
      assert(expected.subsetOf(cand),
        s"($sigs,$bands): exact dups ${expected -- cand} not captured")
    }
  }

  test("more, narrower bands never lose candidates (recall is monotone)") {
    // bands of FEWER rows capture strictly more pairs: every 4-row band
    // match implies its two 2-row halves match. (8,2) = 4-row bands;
    // (8,4) = 2-row bands over the SAME signature slots.
    val coarse = Dedup.lshCandidatesTuned(docs, 8, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val fine = Dedup.lshCandidatesTuned(docs, 8, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(coarse.subsetOf(fine),
      s"lost pairs at finer banding: ${coarse -- fine}")
  }

  test("invalid banding is rejected") {
    intercept[IllegalArgumentException] {
      Dedup.lshCandidatesTuned(docs, 8, 3)
    }
  }

  test("normalizeText canonicalizes case, punctuation, and spacing") {
    import spark.implicits._
    val rows = Seq(
      (1L, "Hello,  World!"), (2L, "hello world"), (3L, "HELLO--WORLD"),
      (4L, "  hello   world  "), (5L, "different entirely"))
      .toDF("doc_id", "text")
    val out = Dedup.normalizedDedup(rows).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out("hello world") == ((1L, 4L)),
      "four variants normalize equal; smallest id survives")
    assert(out("different entirely") == ((5L, 1L)))
  }

  test("sourceOverlap: exact Jaccard hits planted overlap; estimate tracks it") {
    import spark.implicits._
    // srcA and srcB share exactly half of srcA's shingle vocabulary;
    // srcC is disjoint. Each doc is one long token run so shingle sets
    // are controlled: shared run in both A and B, private runs per side.
    def run(tag: String, n: Int): String =
      (1 to n).map(i => s"$tag$i").mkString(" ")
    val shared = run("shared", 42) // 40 shared trigrams
    val docs = Seq(
      (1L, "srcA", s"$shared ${run("onlyA", 42)}"),
      (2L, "srcB", s"$shared ${run("onlyB", 42)}"),
      (3L, "srcC", run("onlyC", 82))).toDF("doc_id", "source", "text")
    val got = Dedup.sourceOverlap(docs, numSigs = 16).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getDouble(2), r.getDouble(3)))).toMap
    val (estAB, jacAB) = got(("srcA", "srcB"))
    // A: 40 shared + |onlyA-run| trigrams; crossing trigrams at the seam
    // make the exact count slightly off 1/3 — assert the band, and that
    // the 16-slot estimate lands within 3 slots of the exact value
    assert(jacAB > 0.2 && jacAB < 0.45, s"planted overlap, got $jacAB")
    assert(math.abs(estAB - jacAB) <= 3.0 / 16, s"est $estAB vs exact $jacAB")
    val (estAC, jacAC) = got(("srcA", "srcC"))
    assert(jacAC == 0.0, "disjoint sources share nothing")
    assert(estAC <= 1.0 / 16 + 1e-9, "estimate on disjoint sets ~ 0")
    assert(got.keySet ==
      Set(("srcA", "srcB"), ("srcA", "srcC"), ("srcB", "srcC")),
      "every source pair reported, including zero-overlap ones")
  }

  test("overlap coefficient catches a contained sub-document Jaccard misses") {
    import spark.implicits._
    def words(tag: String, n: Int): String =
      (0 until n).map(i => s"$tag$i").mkString(" ")
    val long = words("w", 200)
    val sub = long.split(" ").slice(40, 80).mkString(" ") // 40 of 200 words
    val docs = Seq(
      (1L, long),
      (2L, sub),
      (3L, words("z", 50))).toDF("doc_id", "text")

    val ov = Dedup.overlapPairs(docs, overlapThreshold = 0.9, dfCap = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        r.getAs[Double]("overlap")).toMap
    // doc 2's shingles are a strict subset of doc 1's → overlap = 1.0
    assert(ov.keySet == Set((1L, 2L)), s"exactly the contained pair: $ov")
    assert(ov((1L, 2L)) == 1.0, "strict containment scores exactly 1.0")

    // the SAME pair is invisible to Jaccard at any near-dup threshold:
    // inter/(union) = 38/198 ≈ 0.19 — below even the permissive 0.2
    val jac = Dedup.jaccardPairs(docs, jaccardThreshold = 0.2, dfCap = 50)
      .collect()
    assert(jac.isEmpty,
      "Jaccard dilutes the contained pair below threshold — the case " +
        "d18 exists for")
  }

  test("d26 recall audit: laws the hash gate can't state") {
    val rows = graft.QueryCatalog.byName("d26_lsh_recall_audit")
      .run(spark, "/root/testdata/sf0.01").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (bucket, nPairs, nCaught) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val (recall, predicted) = (r.getDouble(3), r.getDouble(4))
      assert(bucket >= 1 && bucket <= 10)
      assert(nCaught <= nPairs, "caught mass cannot exceed truth mass")
      assert(recall == nCaught.toDouble / nPairs.toDouble)
      assert(predicted >= 0.0 && predicted <= 1.0)
      // identical shingle sets (bucket 10) carry identical signatures —
      // the band join catches them with certainty, not probability
      if (bucket == 10) assert(recall == 1.0 && predicted == 1.0)
    }
  }
}
