package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** q30's self-gate, pinned numerically: the HLL++ sketch estimate must
  * land within 3×rsd of the exact distinct count per group (the query
  * itself only exposes the boolean; this spec checks the actual relative
  * error so a silently mis-configured sketch cannot hide behind a loose
  * gate).
  */
class ApproxDistinctSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = graft.EngineSession.local("4")
  val sf = "/root/testdata/sf0.001"

  override def afterAll(): Unit = spark.stop()

  test("HLL estimate stays within 3×rsd of the exact distinct count") {
    val rows = graft.Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("exact"),
        approx_count_distinct(col("l_partkey"), 0.02).as("approx"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getAs[Long]("exact").toDouble
      val approx = r.getAs[Long]("approx").toDouble
      val relErr = math.abs(approx - exact) / exact
      assert(relErr <= 3 * 0.02,
        s"${r.getString(0)}: relative error $relErr beyond 3×rsd")
    }
  }

  test("q30 gate reports true on every group") {
    val rows = graft.QueryCatalog.byName("q30_approx_distinct")
      .run(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Boolean]("approx_ok"),
      s"${r.getString(0)}: sketch outside the 3×rsd gate"))
  }
}
