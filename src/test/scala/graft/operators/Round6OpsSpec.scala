package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Contracts of the round-6 operators beyond the oracle gate: t12
  * classifier scoring (custom weights, degenerate documents), t13 LM
  * fluency (probability bounds, short-document sentinel), q44 lateral
  * top-N cardinality. The oracle checks exact values at sf0.01; these pin
  * the library-function invariants on planted fixtures.
  */
class Round6OpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = graft.EngineSession.local("4")
  val sf = "/root/testdata/sf0.001"

  override def afterAll(): Unit = spark.stop()

  test("t12 classifierScore: degenerate docs score deterministically") {
    import spark.implicits._
    val docs = Seq(
      (1L, ""),                 // split('') -> [""]: one 'u:' feature
      (2L, "word"),             // one unigram, no bigram
      (3L, "word word"),        // two unigrams + one bigram
      (4L, "word word"))        // identical text -> identical score
      .toDF("doc_id", "text")
    val out = TextAnalysis.classifierScore(docs)
      .select("doc_id", "n_feats", "score_micro").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out(1L)._1 === 1L)
    assert(out(2L)._1 === 1L)
    assert(out(3L)._1 === 3L)
    assert(out(3L) === out(4L), "same text must score identically")
    // score decomposition: doc3 = doc2's unigram twice + the bigram + bias
    val biasless2 = out(2L)._2 - TextAnalysis.ClsBias
    val bigramW = out(3L)._2 - TextAnalysis.ClsBias - 2 * biasless2
    assert(bigramW >= -998L && bigramW <= 998L,
      s"implied bigram weight $bigramW outside the fixture range")
  }

  test("t12 classifierScore: custom weights change the margin, not the plumbing") {
    import spark.implicits._
    val docs = Seq((1L, "alpha beta gamma")).toDF("doc_id", "text")
    val allPos = TextAnalysis.classifierScore(docs,
      weights = IndexedSeq.fill(8)(5L), bias = 0L).select("score_micro")
      .head.getLong(0)
    // 3 unigrams + 2 bigrams = 5 features, every bucket weighs 5
    assert(allPos === 25L)
    val e = intercept[IllegalArgumentException] {
      TextAnalysis.classifierScore(docs, weights = IndexedSeq.empty)
    }
    assert(e.getMessage.contains("empty weight table"))
  }

  test("t13 fluency: per-doc scores bounded by MLE probability, sentinel for short docs") {
    val rows = graft.QueryCatalog.byName("t13_lm_fluency")
      .run(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_bigrams")
      val f = r.getAs[Long]("fluency_micro")
      if (n == 0L) assert(f === -1L, s"short doc must carry the sentinel")
      else assert(f >= 0L && f <= 1000000L,
        s"MLE mean probability must sit in [0, 1e6] micro-units, got $f")
    }
    // a repeated phrase is maximally fluent under its own MLE model
    // (every transition is the only continuation of its prefix = 1e6);
    // a one-word doc carries the sentinel; branching prefixes split mass
    import spark.implicits._
    val fixture = Seq(
      (1L, "ra ra ra ra ra ra"),
      (2L, "ra"),
      (3L, "go left"),
      (4L, "go right"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.lmFluencyScore(fixture).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got(1L) === ((5L, 1000000L)))
    assert(got(2L) === ((0L, -1L)))
    // P(left|go) = P(right|go) = 1/2 exactly
    assert(got(3L) === ((1L, 500000L)) && got(4L) === ((1L, 500000L)))
  }

  test("p12: corrected isqrt is exact over adversarial inputs") {
    import spark.implicits._
    // perfect squares, off-by-one neighbours, and large values near the
    // double-precision edge — the corrections must pin the exact root
    val ns = (1L to 2000L) ++
      Seq(1L << 40, (1L << 40) - 1, (1L << 40) + 1,
        (1L << 51) - 1, 999999999999L) ++
      (1L to 100L).map(i => i * i) ++ (1L to 100L).map(i => i * i - 1)
    val got = ns.toDF("n")
      .withColumn("r0", expr("CAST(floor(sqrt(CAST(n AS DOUBLE))) AS BIGINT)"))
      .withColumn("w", expr(
        """CASE WHEN (r0+1)*(r0+1) <= n THEN r0+1
          |     WHEN r0*r0 > n THEN r0-1 ELSE r0 END""".stripMargin))
      .select("n", "w").collect()
    got.foreach { r =>
      val (n, w) = (r.getLong(0), r.getLong(1))
      val exact = {
        var r = math.sqrt(n.toDouble).toLong
        while (r * r > n) r -= 1
        while ((r + 1) * (r + 1) <= n) r += 1
        r
      }
      assert(w === exact, s"isqrt($n): got $w, want $exact")
    }
  }

  test("p12: temperature shares lift small sources, total budget respected") {
    val rows = graft.QueryCatalog.byName("p12_temperature_mix")
      .run(spark, sf).collect()
    assert(rows.length > 1)
    val total = rows.map(_.getAs[Long]("n_lang")).sum
    rows.foreach { r =>
      val nl = r.getAs[Long]("n_lang")
      val share = r.getAs[Long]("share_micro")
      val prop = nl * 1000000L / total
      // α = 0.5 moves every source's share TOWARD uniform: smaller than
      // proportional for over-represented sources, larger for small ones
      if (prop > 1000000L / rows.length) assert(share <= prop + 1)
      else assert(share >= prop - 1)
      assert(r.getAs[Long]("n_kept") <= nl)
    }
  }

  test("d14: exactly one keeper per cluster, and it is a longest member") {
    val rows = graft.QueryCatalog.byName("d14_canonical_keep")
      .run(spark, sf).collect()
    assert(rows.nonEmpty)
    val byCluster = rows.groupBy(_.getAs[Long]("cluster"))
    byCluster.values.foreach { ms =>
      assert(ms.length >= 2, "a cluster is at least a pair")
      val keepers = ms.filter(_.getAs[Boolean]("keep"))
      assert(keepers.length === 1)
      val maxLen = ms.map(_.getAs[Int]("n_chars")).max
      assert(keepers.head.getAs[Int]("n_chars") === maxLen)
    }
  }

  test("q44: at most two orders per customer, ranked correctly") {
    val rows = graft.QueryCatalog.byName("q44_lateral_topn")
      .run(spark, sf).collect()
    assert(rows.nonEmpty)
    val byCust = rows.groupBy(_.getAs[Long]("c_custkey"))
    assert(byCust.values.forall(_.length <= 2))
    byCust.values.filter(_.length == 2).foreach { rs =>
      assert(rs(0).getAs[Double]("o_totalprice") >=
        rs(1).getAs[Double]("o_totalprice"))
    }
  }
}
