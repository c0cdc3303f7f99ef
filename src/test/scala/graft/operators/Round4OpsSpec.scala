package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Semantics of the round-4 operators: p06 language rebalancing, d11
  * minhash accuracy audit, s05 ANN recall, q40 correlated EXISTS. The
  * oracle gate checks exact values at sf0.01; these specs pin the
  * CONTRACTS on sf0.001 — budgets respected, estimates bounded, recall
  * consistent with its parts, subquery semantics equal to the algebraic
  * rewrite.
  */
class Round4OpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = graft.EngineSession.local("4")
  val sf = "/root/testdata/sf0.001"

  override def afterAll(): Unit = spark.stop()

  private def run(name: String) =
    graft.QueryCatalog.byName(name).run(spark, sf)

  test("p06: per-language kept counts respect the per-language pool and budget") {
    val docs = graft.Tables.documents(spark, sf)
    val n = docs.count()
    val k = docs.select("lang").distinct().count()
    val rows = run("p06_lang_rebalance").collect()
    assert(rows.nonEmpty)
    val totalKept = rows.map(_.getAs[Long]("n_kept")).sum
    rows.foreach { r =>
      val nl = r.getAs[Long]("n_lang"); val kept = r.getAs[Long]("n_kept")
      assert(kept <= nl, s"${r.getString(0)}: kept $kept of pool $nl")
      // rate law: kept ≈ min(1, 256T/(K·n_l))·n_l within hash-bucket noise
      val t = n / 2
      val cap = math.min(256L, (256L * t) / (k * nl) + 1) // threshold buckets
      assert(kept <= (cap * nl) / 256 + math.max(8, nl / 4),
        s"kept $kept far above the ${cap}/256 rate on pool $nl")
    }
    // a capped language keeps FEWER of its docs than a rare one (rate is
    // decreasing in pool size) — compare the extremes when they differ
    val byPool = rows.sortBy(_.getAs[Long]("n_lang"))
    val (rare, common) = (byPool.head, byPool.last)
    if (common.getAs[Long]("n_lang") > 2 * rare.getAs[Long]("n_lang")) {
      val fRare = rare.getAs[Long]("n_kept").toDouble / rare.getAs[Long]("n_lang")
      val fCommon = common.getAs[Long]("n_kept").toDouble / common.getAs[Long]("n_lang")
      assert(fRare >= fCommon - 0.25,
        s"rare lang should keep a no-smaller fraction: $fRare vs $fCommon")
    }
    assert(totalKept <= n, "rebalance never grows the corpus")
  }

  test("d11: audits exactly the d03 candidate pairs with bounded estimates") {
    val cand = run("d03_dedup_minhash_lsh").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val audit = run("d11_minhash_jaccard_est").collect()
    assert(audit.map(r => (r.getLong(0), r.getLong(1))).toSet == cand,
      "audit rows = LSH candidate pairs")
    audit.foreach { r =>
      val est = r.getAs[Double]("est_jaccard")
      val jac = r.getAs[Double]("jaccard")
      assert(est >= 0.0 && est <= 1.0 && (est * 8).isWhole,
        s"est must be k/8, got $est")
      assert(jac >= 0.0 && jac <= 1.0, s"jaccard out of range: $jac")
      // LSH candidates share a band = 4 agreeing signature slots minimum
      assert(est >= 0.5, s"a banded candidate agrees on >= 4/8 sigs, got $est")
    }
  }

  test("s05: recall is n_hit/3 with n_hit in 0..3, one row per query vector") {
    val rows = run("s05_ann_recall").collect()
    val nq = graft.Tables.embeddings(spark, sf)
      .filter(col("vec_id") < 10).count()
    assert(rows.length == nq, s"one row per query, got ${rows.length} vs $nq")
    rows.foreach { r =>
      val hit = r.getAs[Long]("n_hit"); val rec = r.getAs[Double]("recall")
      assert(hit >= 0 && hit <= 3)
      assert(math.abs(rec - hit / 3.0) < 1e-15)
    }
  }

  test("p07: replication law — n_rows = n_lang*factor, epochs sum to the triangle") {
    val pools = graft.Tables.documents(spark, sf)
      .groupBy(col("lang")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val rows = run("p07_repeat_upsample").collect()
    assert(rows.map(_.getString(0)).toSet == pools.keySet)
    rows.foreach { r =>
      val (lang, f, n, se) = (r.getString(0), r.getAs[Long]("factor"),
        r.getAs[Long]("n_rows"), r.getAs[Long]("sum_epoch"))
      assert(f >= 1 && f <= 3)
      assert(n == pools(lang) * f, s"$lang: $n rows != ${pools(lang)} * $f")
      assert(se == pools(lang) * f * (f + 1) / 2, s"$lang epoch sum")
    }
  }

  test("s06: dropped set is a subset of the corpus-wide near-dup pair tails") {
    // within-cluster pairs above the threshold are a subset of ALL pairs
    // above it, so every SemDeDup-dropped id must appear as some d06 vec_b
    val allPairTails = run("d06_dedup_embedding").collect()
      .map(_.getAs[Long]("vec_b")).toSet
    val dropped = run("s06_semdedup").collect().map(_.getLong(0))
    assert(dropped.length == dropped.distinct.length, "one row per dropped id")
    assert(dropped.forall(allPairTails.contains),
      "semantic dedup can only drop ids that have a smaller near-dup twin")
  }

  test("qualityFilter: gate agrees with independently computed metrics; plan is map-only") {
    import spark.implicits._
    // real corpus plus the edge shapes the gate must survive: leading /
    // trailing whitespace (split() emits empty tokens there), empty text
    // and whitespace-only text (zero denominators → explicit fail)
    val edges = Seq(
      (100001L, "  leading whitespace here with plenty of ordinary words to pass the gate fine"),
      (100002L, "trailing whitespace doc with plenty of ordinary words to pass the gate fine   "),
      (100003L, ""),
      (100004L, "   \t  ")).toDF("doc_id", "text")
    val docs = graft.Tables.documents(spark, sf).select("doc_id", "text")
      .unionAll(edges)
    val out = TextAnalysis.qualityFilter(docs, minWords = 10,
      maxRepetition = 0.6)
    assert(out.count() == docs.count(), "filter annotates, never drops")
    out.collect().foreach { r =>
      val text = r.getAs[String]("text")
      val words = text.split("\\s+").filter(_.nonEmpty)
      assert(r.getAs[Int]("n_words") == words.length, s"doc ${r.get(0)}")
      if (words.isEmpty) {
        assert(r.isNullAt(r.fieldIndex("repetition")), s"doc ${r.get(0)}")
        assert(!r.getAs[Boolean]("quality_pass"),
          s"empty doc ${r.get(0)} must fail the gate, not null out")
      } else {
        val rep = (words.length - words.distinct.length).toDouble / words.length
        assert(math.abs(r.getAs[Double]("repetition") - rep) < 1e-9)
        val expectPass = words.length >= 10 &&
          r.getAs[Double]("mean_wl") >= 2.0 && r.getAs[Double]("mean_wl") <= 12.0 &&
          r.getAs[Double]("alpha_ratio") >= 0.5 && rep <= 0.6
        assert(r.getAs[Boolean]("quality_pass") == expectPass, s"doc ${r.get(0)}")
      }
    }
    // map-only: no exchange of any kind in the gate itself
    val p = out.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p)
  }

  test("decontaminate: drops exactly the docs the d10 probe flags (threshold 0)") {
    val docs = graft.Tables.documents(spark, sf)
    val bench = docs.filter(col("doc_id") < 50)
    val corpus = docs.filter(col("doc_id") >= 50)
    val flagged = run("d10_contamination").collect().map(_.getLong(0)).toSet
    val survivors = Dedup.decontaminate(corpus, bench)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val corpusIds = corpus.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(survivors == corpusIds -- flagged,
      s"decontaminate must drop the probe's flagged set: " +
        s"dropped=${corpusIds -- survivors} flagged=$flagged")
    // a benchmark no doc shares 5-grams with drops nothing
    val noop = Dedup.decontaminate(corpus,
      bench.withColumn("text", lit("zz yy xx ww vv uu tt")))
    assert(noop.count() == corpus.count())
  }

  test("q40: EXISTS/NOT EXISTS equals the semi/anti join rewrite") {
    val c = graft.Tables.customer(spark, sf)
    val o = graft.Tables.orders(spark, sf)
    val urgent = o.filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey"))
    val filled = o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
    val expected = c
      .join(urgent, c("c_custkey") === urgent("o_custkey"), "left_semi")
      .join(filled, c("c_custkey") === filled("o_custkey"), "left_anti")
      .select("c_custkey").collect().map(_.getLong(0)).toSet
    val got = run("q40_correlated_exists").collect().map(_.getLong(0)).toSet
    assert(got == expected)
  }
}
