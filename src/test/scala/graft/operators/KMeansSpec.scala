package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class KMeansSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = graft.EngineSession.local("4")
  override def afterAll(): Unit = spark.stop()

  // 30 vectors in 3 tight angular clusters around orthogonal axes; ids
  // interleaved (id % 3 = true cluster) so the k smallest-id seeds start
  // one-per-cluster
  private lazy val seeded = {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    (0 until 30).map { id =>
      val axis = id % 3
      val base = Array.fill(4)(0.05f * (rnd.nextFloat() - 0.5f))
      base(axis) += 1.0f
      (id.toLong, base.toSeq)
    }.toDF("vec_id", "embedding")
  }

  private def labelsOf(m: Similarity.KMeansModel): Map[Long, Long] =
    m.assignments.collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("cluster")).toMap

  test("converges on seeded clusters: members follow their axis") {
    val m = Similarity.kmeans(seeded, k = 3, iters = 5)
    val lab = labelsOf(m)
    assert(lab.size == 30)
    // every vector of a true cluster carries the same label, labels distinct
    val byAxis = (0 until 3).map(a =>
      lab.collect { case (id, c) if id % 3 == a => c }.toSet)
    assert(byAxis.forall(_.size == 1), s"mixed cluster labels: $byAxis")
    assert(byAxis.flatten.toSet.size == 3)
    // centroids point along their axis (dominant coordinate)
    assert(m.centroids.length == 3)
    for ((c, cid) <- m.centroids.zipWithIndex) {
      val axis = c.indexOf(c.maxBy(math.abs))
      val members = lab.collect { case (id, l) if l == cid => id % 3 }.toSet
      assert(members == Set(axis.toLong),
        s"centroid $cid dominant axis $axis vs members $members")
    }
  }

  test("fixpoint: an extra iteration no longer moves the assignment") {
    val a5 = labelsOf(Similarity.kmeans(seeded, k = 3, iters = 5))
    val a6 = labelsOf(Similarity.kmeans(seeded, k = 3, iters = 6))
    assert(a5 == a6)
  }

  test("k=1 labels the whole corpus cluster 0 (greatest() needs 2 args)") {
    val m = Similarity.kmeans(seeded, k = 1, iters = 2)
    val lab = labelsOf(m)
    assert(lab.size == 30 && lab.values.toSet == Set(0L))
    assert(m.centroids.length == 1)
  }

  test("k larger than the corpus fails loudly, not with a short model") {
    import spark.implicits._
    val tiny = (0 until 3)
      .map(i => (i.toLong, Seq.fill(4)(0.1f * (i + 1)))).toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Similarity.kmeans(tiny, k = 10, iters = 1)
    }
    assert(e.getMessage.contains("at least k"))
  }

  test("k exceeding natural clusters keeps empty clusters stable") {
    // k=5 over 3 natural clusters: two seeds end up shadowed; the loop
    // must not NPE on empty clusters and must still label every vector
    val m = Similarity.kmeans(seeded, k = 5, iters = 4)
    assert(labelsOf(m).size == 30)
    assert(m.centroids.length == 5)
  }
}
