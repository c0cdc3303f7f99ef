package graft.hep

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class AncestrySpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = graft.EngineSession.local("4")
  override def afterAll(): Unit = spark.stop()

  // diamond DAG with a tail: 0→1, 0→2, 1→3, 2→3, 3→4
  private lazy val edges = {
    import spark.implicits._
    Seq((0, 1), (0, 2), (1, 3), (2, 3), (3, 4))
      .map { case (s, t) => ("p", 0L, s, t, 1.0) }
      .toDF("process", "event_id", "src", "dst", "weight")
  }

  private def verts(vs: Int*) = {
    import spark.implicits._
    vs.map(v => ("p", 0L, v)).toDF("process", "event_id", "vtx")
  }

  private def vtxSet(df: org.apache.spark.sql.DataFrame): Set[Int] =
    df.collect().map(_.getAs[Int]("vtx")).toSet

  test("children and parents") {
    assert(vtxSet(Ancestry.children(edges, verts(0))) == Set(1, 2))
    assert(vtxSet(Ancestry.parents(edges, verts(3))) == Set(1, 2))
    assert(vtxSet(Ancestry.children(edges, verts(4))) == Set.empty)
  }

  test("descendants bounded by depth") {
    assert(vtxSet(Ancestry.descendants(edges, verts(0), 1)) == Set(1, 2))
    assert(vtxSet(Ancestry.descendants(edges, verts(0), 2)) == Set(1, 2, 3))
    assert(vtxSet(Ancestry.descendants(edges, verts(0), 10)) == Set(1, 2, 3, 4))
  }

  test("descendants from multiple roots, diamond converges once") {
    val d = Ancestry.descendants(edges, verts(1, 2), 10)
    assert(vtxSet(d) == Set(3, 4))
  }

  test("deep chain: depth-30 walk completes without plan blow-up") {
    import spark.implicits._
    // a 31-vertex path graph forces 30 BFS rounds; without the per-round
    // persist/unpersist of `visited` the lineage is a 30-deep union tree
    // and each round re-computes the whole prefix (O(d^2) blow-up)
    val chain = (0 until 30)
      .map(i => ("p", 0L, i, i + 1, 1.0))
      .toDF("process", "event_id", "src", "dst", "weight")
    val d = Ancestry.descendants(chain, verts(0), 40)
    assert(vtxSet(d) == (1 to 30).toSet)
    // and the depth bound still truncates the same walk
    assert(vtxSet(Ancestry.descendants(chain, verts(0), 5)) == (1 to 5).toSet)
  }

  test("cycle-safe: traversal terminates on a cyclic graph") {
    import spark.implicits._
    val cyc = Seq((0, 1), (1, 2), (2, 0))
      .map { case (s, t) => ("p", 0L, s, t, 1.0) }
      .toDF("process", "event_id", "src", "dst", "weight")
    // roots are excluded from the result even when reachable via the cycle
    assert(vtxSet(Ancestry.descendants(cyc, verts(0), 100)) == Set(1, 2))
  }
}
