package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class ConnectedComponentsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = graft.EngineSession.local("4")
  override def afterAll(): Unit = spark.stop()

  private def pairs(ps: (Long, Long)*) = {
    import spark.implicits._
    ps.toDF("doc_a", "doc_b")
  }

  private def clusters(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("path graph collapses to the smallest id") {
    val c = clusters(Dedup.connectedComponents(pairs((1L, 2L), (2L, 3L), (3L, 4L))))
    assert(c == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
  }

  test("two components stay separate") {
    val c = clusters(Dedup.connectedComponents(
      pairs((1L, 2L), (5L, 6L), (6L, 7L))))
    assert(c == Map(1L -> 1L, 2L -> 1L, 5L -> 5L, 6L -> 5L, 7L -> 5L))
  }

  test("chain converges in few rounds (pointer jumping)") {
    val chain = (1L until 9L).map(i => (i, i + 1))
    val c = clusters(Dedup.connectedComponents(pairs(chain: _*)))
    assert(c.values.toSet == Set(1L))
    assert(c.size == 9)
  }

  test("distributed and driver-local paths agree label-for-label") {
    // mixed topology: chain + diamond + singleton pair + disjoint triangle
    val es = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (10L, 12L),
      (11L, 13L), (12L, 13L), (20L, 21L), (30L, 31L), (31L, 32L), (30L, 32L))
    val local = clusters(Dedup.connectedComponents(pairs(es: _*)))
    val dist = clusters(
      Dedup.connectedComponents(pairs(es: _*), localEdgeThreshold = 0L))
    assert(local == dist)
    assert(local(13L) == 10L && local(32L) == 30L)
  }

  test("non-convergence within maxIters fails loudly, not with partial labels") {
    // a 12-node path needs several propagation rounds; maxIters=1 cannot
    // reach the all-quiet round, and silent partial labels would mislabel
    // downstream keep/drop decisions — the guard must throw instead
    val chain = (1L until 12L).map(i => (i, i + 1))
    val e = intercept[IllegalArgumentException] {
      Dedup.connectedComponents(pairs(chain: _*),
        localEdgeThreshold = 0L, maxIters = 1).collect()
    }
    assert(e.getMessage.contains("did not converge"))
    // same graph, enough rounds: converges to the minimum label
    val ok = clusters(Dedup.connectedComponents(pairs(chain: _*),
      localEdgeThreshold = 0L))
    assert(ok.values.toSet == Set(1L))
  }

  test("above the 2M-edge threshold the DISTRIBUTED path runs, labels exact") {
    // 2.1M edges (> the 2M localEdgeThreshold default, so this is the
    // pointer-jumping loop for real, not the hook): 300k disjoint 8-node
    // paths, nodes p*8..p*8+7, edges (i, i+1) within each path. Ground
    // truth is closed-form: cluster(n) = n - n % 8.
    val edges = spark.range(2400000L)
      .filter(col("id") % 8 =!= 7)
      .select(col("id").as("doc_a"), (col("id") + 1).as("doc_b"))
    assert(edges.count() === 2100000L)
    val labels = Dedup.connectedComponents(edges)
    val bad = labels.filter(
      col("cluster") =!= col("doc_id") - pmod(col("doc_id"), lit(8))).count()
    assert(bad === 0L, s"$bad mislabeled vertices")
    assert(labels.count() === 2400000L)
    assert(labels.select("cluster").distinct().count() === 300000L)
  }

  test("driver and distributed paths agree on a randomized mid-size graph") {
    // deterministic pseudo-random topology (hash-derived endpoints over
    // 20k vertices, ~30k edges → many components, varied shapes, possible
    // multi-edges), run through BOTH paths via the threshold hook
    val edges = spark.range(30000L)
      .select(pmod(xxhash64(col("id")), lit(20000)).as("doc_a"),
        pmod(xxhash64(col("id") * 7 + 1), lit(20000)).as("doc_b"))
      .filter(col("doc_a") =!= col("doc_b"))
      .persist()
    val driver = clusters(
      Dedup.connectedComponents(edges, localEdgeThreshold = Long.MaxValue))
    val dist = clusters(
      Dedup.connectedComponents(edges, localEdgeThreshold = 0L))
    assert(driver.size === dist.size)
    assert(driver === dist, {
      val diff = driver.collect { case (k, v) if dist.get(k) != Some(v) => k }
      s"${diff.size} vertices disagree, e.g. ${diff.take(5)}"
    })
    edges.unpersist()
  }

  test("duplicate clusters over injected exact copies") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text")
    val base = docs.orderBy("doc_id").limit(1)
    val copies = base.select((col("doc_id") + 100000).as("doc_id"), col("text"))
      .union(base.select((col("doc_id") + 200000).as("doc_id"), col("text")))
    val cl = Dedup.duplicateClusters(docs.union(copies), jaccardThreshold = 0.9)
    val c = clusters(cl.filter(col("cluster") === 0))
    // doc 0 and its two copies form one cluster labeled by the smallest id
    assert(c.keySet.intersect(Set(0L, 100000L, 200000L)) == Set(0L, 100000L, 200000L))
  }

  test("sub-3-word exact duplicates cluster despite producing no bands") {
    import spark.implicits._
    val docs = Seq(
      (1L, "tiny doc"), (2L, "tiny doc"), (3L, "tiny doc"),
      (4L, "some other unrelated document with several words in it"))
      .toDF("doc_id", "text")
    val cl = Dedup.duplicateClusters(docs, jaccardThreshold = 0.5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cl.view.filterKeys(Set(1L, 2L, 3L)).values.toSet == Set(1L),
      s"exact-dup group must cluster on its smallest id: $cl")
    assert(!cl.contains(4L), "unique unpaired doc is not returned")
  }
}
