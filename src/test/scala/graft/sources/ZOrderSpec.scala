package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Z-order layout: correctness of the Morton interleave, row preservation,
  * and the mechanical data-skipping win over a single-key linear sort,
  * measured from real parquet footers (not claimed from theory).
  */
class ZOrderSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = graft.EngineSession.local("4")
  override def afterAll(): Unit = spark.stop()

  private val work = Files.createTempDirectory("zorder").toString

  test("zValue interleaves bits (known values, order preserved on boxes)") {
    import spark.implicits._
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (7L, 7L))
      .toDF("x", "y")
    val got = df.select(ZOrder.zValue(Seq(col("x"), col("y")), 3).as("z"))
      .collect().map(_.getLong(0)).toSeq
    // bit i of x -> position 2i; bit i of y -> position 2i+1
    def morton(x: Long, y: Long): Long =
      (0 until 3).map(i => (((x >> i) & 1L) << (2 * i)) |
        (((y >> i) & 1L) << (2 * i + 1))).reduce(_ | _)
    assert(got === Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (7L, 7L))
      .map((morton _).tupled))
  }

  test("zorderWrite preserves rows exactly and drops the layout key") {
    val li = graft.Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity")
    val out = s"$work/li_z"
    ZOrder.zorderWrite(li,
      Seq(col("l_partkey") * 300, col("l_suppkey") * 6500), 16, 8, out)
    val back = spark.read.parquet(out)
    assert(back.columns.sorted.toSeq ===
      Seq("l_orderkey", "l_partkey", "l_quantity", "l_suppkey"))
    assert(back.count() === li.count())
    assert(back.exceptAll(li).isEmpty && li.exceptAll(back).isEmpty)
  }

  test("Z-order skips on BOTH dimensions; linear sort only on its sort key") {
    val li = graft.Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity")
    // order-preserving normalization to ~16 bits keeps footer min/max
    // meaningful on the RAW columns too (stats of partkey itself prune)
    val zOut = s"$work/skip_z"
    val linOut = s"$work/skip_lin"
    ZOrder.zorderWrite(li,
      Seq(col("l_partkey") * 300, col("l_suppkey") * 6500), 16, 8, zOut)
    li.repartitionByRange(8, col("l_partkey"))
      .sortWithinPartitions(col("l_partkey"))
      .write.mode("overwrite").parquet(linOut)

    val (pMax, sMax) = {
      val r = li.agg(max("l_partkey"), max("l_suppkey")).head()
      (r.getLong(0), r.getLong(1))
    }
    // primary-dim box: both layouts prune
    val (zP, zTot) = ZOrder.skipStats(spark, zOut, "l_partkey", 1, pMax / 8)
    val (lP, lTot) = ZOrder.skipStats(spark, linOut, "l_partkey", 1, pMax / 8)
    assert(zP < zTot, s"z-order must prune on partkey: $zP/$zTot")
    assert(lP < lTot, s"linear must prune on its own sort key: $lP/$lTot")
    // secondary-dim box: ONLY the z-order layout can prune — every linear
    // file spans the full suppkey range
    val (zS, _) = ZOrder.skipStats(spark, zOut, "l_suppkey", 1, sMax / 4)
    val (lS, lTot2) = ZOrder.skipStats(spark, linOut, "l_suppkey", 1, sMax / 4)
    assert(lS === lTot2,
      s"linear layout unexpectedly pruned on the non-sort key: $lS/$lTot2")
    assert(zS < zTot,
      s"z-order failed to prune on the secondary dimension: $zS/$zTot")
    info(s"suppkey-box row groups read: z-order $zS/$zTot, linear $lS/$lTot2")
  }
}
