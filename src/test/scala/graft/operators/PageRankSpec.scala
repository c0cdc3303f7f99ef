package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Integer-exact PageRank (`Similarity.pageRankInt`): closed-form checks
  * on known graphs and partition-independence (the bit-reproducibility
  * the s13 oracle depends on).
  */
class PageRankSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = graft.EngineSession.local("4")
  override def afterAll(): Unit = spark.stop()

  private def ranksOf(nodes: Seq[Long], edges: Seq[(Long, Long)],
      iters: Int, parts: Int = 1): Map[Long, Long] = {
    import spark.implicits._
    val n = nodes.toDF("id").repartition(parts)
    val e = edges.toDF("src", "dst").repartition(parts)
    Similarity.pageRankInt(n, e, iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("a cycle is a fixpoint at the initial mass") {
    // out-degree 1 everywhere: each node receives exactly one full rank,
    // so 150000000 + (85 * 1e9) div 100 = 1e9 — stable at any depth
    val got = ranksOf(Seq(1L, 2L, 3L), Seq((1L, 2L), (2L, 3L), (3L, 1L)), 4)
    assert(got === Map(1L -> 1000000000L, 2L -> 1000000000L, 3L -> 1000000000L))
  }

  test("star graph matches the closed form; dangling mass is dropped") {
    val got = ranksOf(Seq(0L, 1L, 2L, 3L), Seq((0L, 1L), (0L, 2L), (0L, 3L)), 1)
    val leaf = 150000000L + (85L * (1000000000L / 3L)) / 100L
    assert(got(0L) === 150000000L) // no in-edges
    assert(got(1L) === leaf && got(2L) === leaf && got(3L) === leaf)
    // iteration 2: leaves have no out-edges (dangling), hub gets only base
    val got2 = ranksOf(Seq(0L, 1L, 2L, 3L), Seq((0L, 1L), (0L, 2L), (0L, 3L)), 2)
    val leaf2 = 150000000L + (85L * (150000000L / 3L)) / 100L
    assert(got2(0L) === 150000000L)
    assert(got2(1L) === leaf2)
  }

  test("ranks are partition-independent (integer arithmetic end to end)") {
    val nodes = (0L until 40L).toSeq
    val edges = nodes.flatMap(i => Seq((i, (i * 7 + 1) % 40), (i, (i * 13 + 5) % 40)))
    val a = ranksOf(nodes, edges, 3, parts = 1)
    val b = ranksOf(nodes, edges, 3, parts = 7)
    assert(a === b)
  }
}
