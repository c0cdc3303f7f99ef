package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Contracts of the round-5b operators: q42 event transitions, t09 heavy
  * hitters, t10 pattern redaction, p09 curriculum staging, s08 kNN graph.
  * The oracle gate checks exact values at sf0.01; these pin the invariants
  * on sf0.001 plus planted fixtures where the corpus lacks the signal
  * (PII for t10).
  */
class Round5bOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = graft.EngineSession.local("4")
  val sf = "/root/testdata/sf0.001"

  override def afterAll(): Unit = spark.stop()

  private def run(name: String) =
    graft.QueryCatalog.byName(name).run(spark, sf)

  test("q42: transition mass = events minus one per active user") {
    val ev = graft.Tables.events(spark, sf)
    val total = ev.count()
    val users = ev.select("user_id").distinct().count()
    val rows = run("q42_event_transitions").collect()
    assert(rows.nonEmpty)
    val mass = rows.map(_.getAs[Long]("n_transitions")).sum
    // each user's k events yield exactly k-1 consecutive pairs
    assert(mass === total - users, s"transition mass $mass != $total - $users")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_users") <= r.getAs[Long]("n_transitions"))
    }
  }

  test("t09: ranks are dense, counts non-increasing, shares bounded") {
    val rows = run("t09_heavy_hitters").collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("lang")).foreach { case (lang, rs) =>
      val byRn = rs.sortBy(_.getAs[Int]("rn"))
      assert(byRn.map(_.getAs[Int]("rn")).toSeq === (1 to byRn.length),
        s"$lang ranks not dense")
      val ns = byRn.map(_.getAs[Long]("n"))
      assert(ns.zip(ns.tail).forall { case (a, b) => a >= b },
        s"$lang counts not non-increasing")
      assert(byRn.length <= 10)
      val shares = byRn.map(_.getAs[Long]("share_micro"))
      assert(shares.forall(s => s >= 0 && s <= 1000000))
      assert(shares.sum <= 1000000, s"$lang top-10 share exceeds the whole")
    }
  }

  test("t10 redact: planted PII is counted and rewritten per rule") {
    import spark.implicits._
    val docs = Seq(
      (1L, "mail me at jane.doe+x@example.co.uk or call +1-555-123-4567"),
      (2L, "server 10.0.255.7 leaked ssn 123-45-6789 twice: 123-45-6789"),
      (3L, "clean text, nothing to scrub")).toDF("id", "text")
    val r = TextAnalysis.redact(docs, col("text")).collect()
      .map(x => x.getAs[Long]("id") -> x).toMap
    assert(r(1L).getAs[Long]("n_email") === 1L)
    assert(r(1L).getAs[Long]("n_phone") === 1L)
    assert(r(2L).getAs[Long]("n_ipv4") === 1L)
    assert(r(2L).getAs[Long]("n_ssn") === 2L)
    assert(r(3L).getAs[String]("redacted") === "clean text, nothing to scrub")
    val red1 = r(1L).getAs[String]("redacted")
    assert(red1.contains("<EMAIL>") && red1.contains("<PHONE>"))
    assert(!red1.contains("example.co.uk") && !red1.contains("555"))
    val red2 = r(2L).getAs[String]("redacted")
    assert(red2.contains("<IP>") && red2.contains("<SSN>"))
    assert(!red2.contains("123-45-6789") && !red2.contains("10.0.255.7"))
  }

  test("t10 audit: every row matched (synthetic props always carry a number)") {
    val rows = run("t10_redaction_audit").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_matched") === r.getAs[Long]("n_rows"))
      assert(r.getAs[Long]("n_matches") >= r.getAs[Long]("n_rows"))
    }
  }

  test("p09: stages partition the corpus with ordered score ranges") {
    val n = graft.Tables.documents(spark, sf).count()
    val rows = run("p09_curriculum").collect().sortBy(_.getAs[Int]("stage"))
    assert(rows.map(_.getAs[Int]("stage")).toSeq.forall((1 to 4).contains))
    assert(rows.map(_.getAs[Long]("n_docs")).sum === n)
    // stage score ranges must be disjoint and increasing
    rows.zip(rows.tail).foreach { case (lo, hi) =>
      assert(lo.getAs[Long]("max_score") < hi.getAs[Long]("min_score") ||
        lo.getAs[Long]("max_score") <= hi.getAs[Long]("min_score"),
        s"overlapping stage ranges: $lo vs $hi")
    }
    // quartile boundaries with ties-to-lower: no stage is empty unless the
    // score distribution is that degenerate; stage 1 holds at least N/4
    assert(rows.head.getAs[Long]("n_docs") >= n / 4)
  }

  test("p10: every source keeps min(cap, total), selection reproducible") {
    val docs = graft.Tables.documents(spark, sf)
    val totals = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val rows = run("p10_source_cap").collect()
    assert(rows.length === totals.size)
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      assert(r.getAs[Long]("n_total") === totals(src))
      assert(r.getAs[Long]("n_kept") === math.min(10L, totals(src)))
    }
    // hash-rank selection is a pure function of the ids: a rerun agrees
    val again = run("p10_source_cap").collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("kept_id_sum")).toMap
    rows.foreach { r =>
      assert(again(r.getAs[String]("source")) === r.getAs[Long]("kept_id_sum"))
    }
  }

  test("t11 blocklistProfile: exact hits, multiplicity counted, 5% rule") {
    import spark.implicits._
    val docs = Seq(
      (1L, "slow slow error fast data line part key row value value value " +
        "table scan merge sort group join the a big small batch window " +
        "stream filter hash order query"),  // 4 hits / 29 tokens >= 5%
      (2L, "fast data line part key row value table scan sort group join " +
        "the a big small batch window stream filter")) // 0 hits / 20
      .toDF("doc_id", "text")
    val r = TextAnalysis.blocklistProfile(docs, Seq("slow", "error", "merge"))
      .collect().map(x => x.getAs[Long]("doc_id") -> x).toMap
    assert(r(1L).getAs[Long]("n_hits") === 4L) // slow twice + error + merge
    assert(r(1L).getAs[Long]("n_tokens") === 29L)
    assert(r(1L).getAs[Boolean]("flagged"))
    assert(r(2L).getAs[Long]("n_hits") === 0L)
    assert(!r(2L).getAs[Boolean]("flagged"))
  }

  test("s09: cluster budgets respected, totals cover the corpus") {
    val nVecs = graft.Tables.embeddings(spark, sf).count()
    val rows = run("s09_diversity_rebalance").collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("n_cid")).sum === nVecs,
      "per-cluster pools must cover every vector")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_kept") <= r.getAs[Long]("n_cid"))
      assert(r.getAs[Long]("n_kept") >= 1L)
    }
  }

  test("d13 winnowed spans: a shifted shared run is caught; clean docs stay clean") {
    import spark.implicits._
    // a 24-token boilerplate run shared by docs 1 and 2 at DIFFERENT
    // offsets (1 vs 5 tokens in, deliberately NOT congruent mod the
    // winnow window) — paragraph-aligned and fixed-stride dedup both miss
    // this; the Schleimer winnowing guarantee (runs >= 16+8-1 = 23 tokens
    // always share a selected fingerprint) must not
    val boiler = (1 to 24).map(i => s"b$i").mkString(" ")
    val docs = Seq(
      (1L, s"x1 $boiler tail1 tail2 tail3 tail4 tail5 tail6 tail7 tail8"),
      (2L, s"y1 y2 y3 y4 y5 $boiler z1 z2 z3 z4 z5 z6 z7 z8 z9 z10 z11"),
      (3L, (1 to 40).map(i => s"c$i").mkString(" "))).toDF("doc_id", "text")
    val prof = Paragraphs.spanProfile(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(prof(1L).getAs[Long]("n_dup_fp") > 0, prof(1L).toString)
    assert(prof(2L).getAs[Long]("n_dup_fp") > 0, prof(2L).toString)
    assert(prof(3L).getAs[Long]("n_dup_fp") === 0L, prof(3L).toString)
    // the gate drops only the duplicated carriers at a strict threshold
    val kept = Paragraphs.dropSpanDuplicates(docs, 0.0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(3L))
    // winnowing density: selected fingerprints ~= 2/(S+1) of the ~40
    // windows per doc, never the full window set
    assert(prof(3L).getAs[Long]("n_fp") < 25L, prof(3L).toString)
  }

  test("d13 winnowing guarantee: random >=23-token shared runs at random offsets") {
    import spark.implicits._
    // Schleimer guarantee: any shared run of >= W+S-1 tokens is detected
    // whatever the alignment. Deterministic pseudo-random trials: distinct
    // vocabularies per doc pair, run lengths 23..40, offsets 0..12
    val rng = new scala.util.Random(20260813L)
    val cases = (0 until 12).map { t =>
      val runLen = 23 + rng.nextInt(18)
      val off1 = rng.nextInt(13); val off2 = rng.nextInt(13)
      val run = (1 to runLen).map(i => s"r${t}_$i").mkString(" ")
      val pre1 = (1 to off1).map(i => s"a${t}_$i").mkString(" ")
      val pre2 = (1 to off2).map(i => s"b${t}_$i").mkString(" ")
      val post1 = (1 to 6).map(i => s"c${t}_$i").mkString(" ")
      val post2 = (1 to 9).map(i => s"d${t}_$i").mkString(" ")
      Seq((t * 2L, s"$pre1 $run $post1".trim),
          (t * 2L + 1, s"$pre2 $run $post2".trim))
    }
    val docs = cases.flatten.toDF("doc_id", "text")
    val prof = Paragraphs.spanProfile(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_dup_fp")).toMap
    cases.flatten.foreach { case (id, text) =>
      assert(prof(id) > 0,
        s"doc $id missed its shared run (guarantee violated): $text")
    }
  }

  test("p11: affinity bounded, target docs self-covered and higher-scoring") {
    val docs = graft.Tables.documents(spark, sf)
    val targets = docs.filter(col("source") === "src0")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val rows = run("p11_importance_weights").collect()
    assert(rows.length === docs.count())
    rows.foreach { r =>
      val a = r.getAs[Long]("affinity_micro")
      assert(a >= 0 && a <= 1000000, r.toString)
      assert(r.getAs[Long]("raw_mass") >= r.getAs[Long]("n_bigrams"), r.toString)
    }
    val (t, o) = rows.partition(r => targets(r.getAs[Long]("doc_id")))
    // a target doc's own occurrences are in the target profile
    t.foreach { r =>
      assert(r.getAs[Long]("target_mass") >= r.getAs[Long]("n_bigrams"), r.toString)
    }
    if (t.nonEmpty && o.nonEmpty) {
      def mean(rs: Array[org.apache.spark.sql.Row]) =
        rs.map(_.getAs[Long]("affinity_micro")).sum.toDouble / rs.length
      assert(mean(t) > mean(o),
        s"target-domain docs must score higher on average: ${mean(t)} vs ${mean(o)}")
    }
  }

  test("p11 edge: featureless docs are absent; weights are pure functions") {
    import spark.implicits._
    val docs = Seq(
      (1L, "tgt", "alpha beta gamma alpha beta"),
      (2L, "raw", "alpha beta delta"),
      (3L, "raw", "solo")).toDF("doc_id", "source", "text")
    val w = Sampling.importanceWeights(docs, col("source") === "tgt")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(!w.contains(3L), "a 1-token doc has no bigrams and no row")
    // doc1 bigrams: (alpha beta)x2, (beta gamma), (gamma alpha) — all its
    // own, so target_mass covers them plus doc2's shared (alpha beta)
    assert(w(1L).getAs[Long]("n_bigrams") === 4L)
    assert(w(1L).getAs[Long]("target_mass") === 2L + 2L + 1L + 1L)
    // doc2: (alpha beta) hits the target profile twice; (beta delta) zero
    assert(w(2L).getAs[Long]("n_bigrams") === 2L)
    assert(w(2L).getAs[Long]("target_mass") === 2L)
    assert(w(1L).getAs[Long]("affinity_micro") >
      w(2L).getAs[Long]("affinity_micro"))
  }

  test("q43: the recursive spine surfaces zero-activity days GROUP BY skips") {
    import spark.implicits._
    val dayNs = 86400L * 1000000000L
    // events on days 100 and 102 — day 101 has NO rows, so a plain
    // GROUP BY emits two rows; the recursive spine must emit three
    val ev = Seq(100L * dayNs + 5, 100L * dayNs + 9, 102L * dayNs + 1)
      .toDF("ts")
    val rows = EventOps.daySpine(ev).collect()
    assert(rows.map(_.getAs[Long]("day")).toSeq === Seq(100L, 101L, 102L))
    assert(rows.map(_.getAs[Long]("n_events")).toSeq === Seq(2L, 0L, 1L))
    assert(rows.map(_.getAs[Boolean]("is_gap")).toSeq === Seq(false, true, false))
    // the registered corpus has full coverage: every spine day is active
    val corpus = run("q43_activity_spine").collect()
    assert(corpus.length === 30)
    assert(corpus.forall(!_.getAs[Boolean]("is_gap")))
  }

  test("s08: every vector gets min(3, block-1) neighbors from its own block") {
    val e = graft.Tables.embeddings(spark, sf)
    val blockSizes = e.groupBy("label").count().collect()
      .map(r => r.getAs[Int]("label") -> r.getAs[Long]("count")).toMap
    val rows = run("s08_knn_graph").collect()
    assert(rows.nonEmpty)
    val byVec = rows.groupBy(_.getAs[Long]("vec_id"))
    // singleton blocks have no candidate pairs, so their vector is absent
    assert(byVec.size.toLong === blockSizes.values.filter(_ >= 2).sum,
      "every vector in a block of >=2 must appear as a query")
    byVec.foreach { case (v, rs) =>
      val lbl = rs.head.getAs[Int]("label")
      val expected = math.min(3L, blockSizes(lbl) - 1)
      assert(rs.length.toLong === expected, s"vec $v: ${rs.length} != $expected")
      assert(rs.forall(_.getAs[Int]("label") === lbl))
      assert(rs.forall(r => math.abs(r.getAs[Double]("cos")) <= 1.0 + 1e-9))
      // neighbor list is ranked by descending cosine
      val byRn = rs.sortBy(_.getAs[Int]("rn")).map(_.getAs[Double]("cos"))
      assert(byRn.zip(byRn.tail).forall { case (a, b) => a >= b })
    }
  }
}
