package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** [[Similarity.triangleCount]]: the degree-oriented distributed count must
  * equal a brute-force enumeration, including on graphs with hubs (the case
  * the orientation exists for) and across label blocks.
  */
class TriangleSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = graft.EngineSession.local("4")
  override def afterAll(): Unit = spark.stop()

  private def bruteTriangles(edges: Set[(Long, Long)]): Long = {
    val adj = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (v, s) => v -> s.map(_._2) }
    val verts = adj.keys.toSeq.sorted
    var n = 0L
    for {
      a <- verts
      b <- adj(a) if b > a
      c <- adj(b) if c > b && adj(a).contains(c)
    } n += 1
    n
  }

  test("degree-oriented count equals brute force on a hub-heavy graph") {
    import spark.implicits._
    // a hub (vertex 0) connected to everyone, plus a pseudo-random sparse
    // layer — triangles concentrate on the hub, the worst case for a
    // naive neighbor self-join and the motivating case for orientation
    val hub = (1L to 40L).map(v => (0L, v))
    val sparse = for {
      i <- 1L to 40L; j <- 1L to 40L
      if i < j && (i * 31 + j * 17) % 7 == 0
    } yield (i, j)
    val all = (hub ++ sparse).toSet
    val df = all.toSeq.toDF("a", "b").withColumn("label", lit(0L))
      .select("label", "a", "b")
    val got = Similarity.triangleCount(df).collect()
    assert(got.length == 1)
    assert(got.head.getAs[Long]("n_edges") == all.size.toLong)
    assert(got.head.getAs[Long]("n_tri") == bruteTriangles(all))
  }

  test("labels are independent blocks; triangle-free labels report zero") {
    import spark.implicits._
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L)).map { case (a, b) => (0L, a, b) }
    val path = Seq((10L, 11L), (11L, 12L)).map { case (a, b) => (1L, a, b) }
    val df = (tri ++ path).toDF("label", "a", "b")
    val got = Similarity.triangleCount(df).orderBy("label").collect()
    assert(got.map(r => (r.getLong(0), r.getAs[Long]("n_edges"),
      r.getAs[Long]("n_tri"))).toSeq == Seq((0L, 3L, 1L), (1L, 2L, 0L)))
  }

  test("count is partitioning-independent") {
    import spark.implicits._
    val edges = (for {
      i <- 1L to 60L; j <- 1L to 60L
      if i < j && (i * 13 + j * 29) % 11 == 0
    } yield (i, j)).toSet
    val df = edges.toSeq.toDF("a", "b").withColumn("label", lit(7L))
      .select("label", "a", "b")
    val once = Similarity.triangleCount(df).collect().head.getAs[Long]("n_tri")
    val again = Similarity.triangleCount(df.repartition(13))
      .collect().head.getAs[Long]("n_tri")
    assert(once == again && once == bruteTriangles(edges))
  }
}
