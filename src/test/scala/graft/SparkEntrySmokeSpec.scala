package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Twin of the driver's smoke check: `SparkEntry.entry` must return
  * rows on the sf0.001 store. entry() delegates to q01's run function
  * (oracle-gated at sf0.01 by graft.Verify), so the only failure mode
  * unique to this surface is the flagship wiring itself — pinned here
  * so a broken entry() fails the suite before the driver sees it.
  */
class SparkEntrySmokeSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = EngineSession.local("4")

  override def afterAll(): Unit = spark.stop()

  test("the driver contract's flagship entry() returns rows at sf0.001") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0, "the driver smoke-checks rows > 0")
  }

  test("every oracleSql key is a registered query (the driver joins " +
    "them by name)") {
    val qs = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet.diff(qs)
    assert(orphans.isEmpty, s"oracle SQL without a query: $orphans")
  }
}
