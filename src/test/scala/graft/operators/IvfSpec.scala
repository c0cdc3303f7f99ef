package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The trained IVF/ANN family (`ivfIndex` / `ivfSearch` / `exactTopK` /
  * `ivfRecall`) on the sf0.001 embeddings parquet — FILE-backed on purpose:
  * plan-shape assertions on LocalRelation inputs constant-fold away at
  * optimization time and prove nothing.
  */
class IvfSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = graft.EngineSession.local("4")
  override def afterAll(): Unit = spark.stop()

  private lazy val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
  private lazy val queries = emb.filter(col("vec_id") < 10)

  test("ivfIndex: nlist trained centroids, assignment covers the corpus") {
    val m = Similarity.ivfIndex(emb, nlist = 16, iters = 2)
    assert(m.nlist === 16)
    assert(m.centroids.size === 16)
    assert(m.centroids.map(_._1) === (0L until 16L))
    // every centroid is a real 64-dim quantized vector with its exact norm
    m.centroids.foreach { case (_, cv, csq) =>
      assert(cv.size === 64)
      assert(csq === cv.map(x => x * x).sum)
    }
    val a = m.assignments
    assert(a.count() === emb.count())
    val cids = a.select("cid").distinct().collect().map(_.getLong(0)).toSet
    assert(cids.subsetOf((0L until 16L).toSet) && cids.nonEmpty)
  }

  test("assignment is map-only: no exchange anywhere in the routing plan") {
    val m = Similarity.ivfIndex(emb, nlist = 16, iters = 2)
    val plan = m.assignments.queryExecution.executedPlan.toString
    // the 100 TB property: routing a corpus to its lists is a scan-fused
    // argmax over literal centroids — never a shuffle, never a join
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("Join"), plan)
  }

  test("ivfSearch plan: probes broadcast, the corpus is never key-shuffled") {
    val m = Similarity.ivfIndex(emb, nlist = 16, iters = 1)
    val plan = Similarity.ivfSearch(m, queries, k = 3, nprobe = 2)
      .queryExecution.executedPlan.toString
    // candidate selection joins the assigned corpus against the tiny
    // probe relation by broadcast — a sort-merge join here would shuffle
    // the whole corpus on the list id
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("ivfSearch large-probe fallback: shuffled join on the list id, " +
      "no probe broadcast, identical rows") {
    val m = Similarity.ivfIndex(emb, nlist = 16, iters = 1)
    val small = Similarity.ivfSearch(m, queries, k = 3, nprobe = 2)
    // force the fallback: a 0-byte broadcast budget stands in for a 10⁸-row
    // probe set (the decision input is the same stats estimate either way)
    val big = Similarity.ivfSearch(m, queries, k = 3, nprobe = 2,
      maxBroadcastProbeBytes = 0L)
    val plan = big.queryExecution.executedPlan.toString
    // the candidate join must NOT materialize the probe set on every
    // executor: both sides hash-partition on the list id instead
    assert(plan.contains("ShuffledHashJoin"), plan)
    assert(!plan.contains("BroadcastHashJoin") ||
      plan.indexOf("ShuffledHashJoin") < plan.indexOf("BroadcastHashJoin"),
      plan)
    def rows(df: org.apache.spark.sql.DataFrame) = df.orderBy("qid", "rn")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(rows(big).toSeq === rows(small).toSeq)
  }

  test("nprobe = nlist degrades to exhaustive: identical to exactTopK") {
    val m = Similarity.ivfIndex(emb, nlist = 4, iters = 2)
    val full = Similarity.ivfSearch(m, queries, k = 3, nprobe = 4)
      .orderBy("qid", "rn").collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val exact = Similarity.exactTopK(emb, queries, k = 3)
      .orderBy("qid", "rn").collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(full.toSeq === exact.toSeq)
  }

  test("recall audit at two nlist settings: measured and bounded") {
    def avgRecall(nlist: Int, nprobe: Int): Double = {
      val m = Similarity.ivfIndex(emb, nlist = nlist, iters = 2)
      val rows = Similarity.ivfRecall(m, emb, queries, k = 3, nprobe = nprobe)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      assert(rows.length === 10, "one audit row per query")
      rows.foreach { case (_, nHit, rec) =>
        assert(nHit >= 0 && nHit <= 3)
        assert(rec >= 0.0 && rec <= 1.0)
        assert(rec === nHit / 3.0)
      }
      rows.map(_._3).sum / rows.length
    }
    val coarse = avgRecall(nlist = 4, nprobe = 2)  // probes ~half the corpus
    val fine = avgRecall(nlist = 16, nprobe = 2)   // probes ~1/8 of it
    // recall is NOT monotone in the probed corpus share — better-trained
    // fine centroids can route more accurately than coarse ones (measured
    // here: fine 0.87 vs coarse 0.83 on this corpus), which is exactly why
    // the audit exists: (nlist, nprobe) is chosen by measurement, not by
    // rule of thumb. Both settings must stay usable.
    assert(coarse > 0.5, s"coarse(4,2) recall unusable: $coarse")
    assert(fine > 0.5, s"fine(16,2) recall unusable: $fine")
  }

  test("planNprobe finds the MINIMAL nprobe reaching the recall target " +
      "(monotone recall, binary search exactness)") {
    val m = Similarity.ivfIndex(emb, nlist = 8, iters = 2)
    def recallAt(np: Int): Double =
      Similarity.ivfRecall(m, emb, queries, k = 3, nprobe = np)
        .agg(avg(col("recall"))).head().getDouble(0)
    // recall is monotone non-decreasing in nprobe (superset candidates)
    val curve = (1 to 8).map(recallAt)
    assert(curve.zip(curve.tail).forall { case (a, b) => b >= a }, curve)
    assert(curve.last === 1.0, "nprobe = nlist is exhaustive")
    for (target <- Seq(0.0, 0.6, 0.9, 1.0)) {
      val (np, r) = Similarity.planNprobe(m, emb, queries, k = 3, target)
      assert(r >= target && r === curve(np - 1), s"target $target")
      assert(np == 1 || curve(np - 2) < target,
        s"target $target: $np is not minimal (curve: $curve)")
    }
  }

  test("semDedupTrained: nlist=1 equals the corpus-wide rule; clusters only localize") {
    def drops(nlist: Int): Set[Long] =
      Similarity.semDedupTrained(Similarity.ivfIndex(emb, nlist, iters = 2), 0.4)
        .select("vec_id").collect().map(_.getLong(0)).toSet
    // one cluster = every pair compared: exactly the corpus-wide
    // "smaller-id twin with cos > t" rule, independently computable from
    // the exact all-pairs op
    val corpusWide = Similarity.allPairsCosine(emb, 0.4)
      .select("vec_b").distinct().collect().map(_.getLong(0)).toSet
    assert(drops(1) === corpusWide)
    // a finer partition can only MISS cross-cluster pairs, never invent a
    // drop — trained-cluster drops are a subset of the corpus-wide rule
    val fine = drops(16)
    assert(fine.subsetOf(corpusWide),
      s"invented drops: ${fine -- corpusWide}")
  }
}
