package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class VecAggSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = graft.EngineSession.local("4")

  override def afterAll(): Unit = spark.stop()

  test("vecSum is exact and partitioning-invariant") {
    import spark.implicits._
    val rows = (1 to 100).map(i => (i % 3, Seq(i.toLong, -i.toLong, i * 2L)))
    val df = rows.toDF("g", "v")

    def sums(parts: Int): Map[Int, Seq[Long]] =
      df.repartition(parts)
        .groupBy("g").agg(VecAgg.vecSum(col("v")).as("s"))
        .collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap

    val expected = rows.groupBy(_._1).view.mapValues(
      _.map(_._2).reduce((a, b) => a.zip(b).map { case (x, y) => x + y })).toMap
    assert(sums(1) == expected)
    assert(sums(7) == expected, "merge order must not matter")
  }
}
