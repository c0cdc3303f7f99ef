package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class BucketedStoreSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = graft.EngineSession.local("4")
  val sfDir = "/root/testdata/sf0.001"

  override def afterAll(): Unit = spark.stop()

  test("bucketed join plans with no shuffle exchange") {
    val li = graft.Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_quantity")
    val o = graft.Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_totalprice")
    BucketedStore.writeBucketed(li, "li_b", "l_orderkey", 8)
    BucketedStore.writeBucketed(o, "o_b", "o_orderkey", 8)

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = BucketedStore.coLocatedJoin(spark, "li_b", "o_b",
        "l_orderkey", "o_orderkey")
      joined.collect() // finalize the AQE plan
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"),
        "bucketed-to-bucketed join must not shuffle:\n" + plan)
      // correctness: equals the plain join count
      val expected = li.join(o, col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }
  }

  test("ancestry join over a bucketed hep store runs exchange-free") {
    import graft.hep.{HepWriter, Ancestry}
    val dir = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "hepbucket").toString + "/store"
    val w = new HepWriter(spark, dir, evtsPerChunk = 10)
    val p = w.newProcess("ttbar")
    for (e <- 0 until 20) {
      val b = p.newEvent()
      b.setPdg(Array.tabulate(6)(i => 1 + i))
      // per-event chain 0→1→…→5
      b.setEdges(Array.tabulate(5)(i => (i, i + 1)))
      p.commitEvent(b)
    }
    w.close()
    val (pt, et) = BucketedStore.writeHepBucketed(spark, dir, numBuckets = 4)

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val edges = spark.table(et)
      // frontier: each event's root vertex, projected straight off the
      // co-bucketed particles table so both join sides inherit
      // HashPartitioning(process, event_id) from the bucket layout
      val roots = spark.table(pt).filter(col("idx") === 0)
        .select(col("process"), col("event_id"), col("idx").as("vtx"))
      val kids = Ancestry.children(edges, roots)
      kids.collect() // finalize the AQE plan
      val plan = kids.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        "children over co-bucketed tables must not shuffle (join keys " +
          "are a superset of the bucket keys, and the trailing distinct " +
          "is clustered by them too):\n" + plan)
      assert(kids.count() == 20) // one child (vtx 1) per event
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }
  }

  test("salted join equals the plain join") {
    val li = graft.Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey").as("k"), col("l_quantity"))
    val o = graft.Tables.orders(spark, sfDir)
      .select(col("o_orderkey").as("k"), col("o_totalprice"))
    val plain = li.join(o.withColumnRenamed("k", "k2"), col("k") === col("k2"))
    val salted = graft.operators.Skew.saltedJoin(li, o, "k", buckets = 4)
    assert(salted.count() == plain.count())
    // spot-check one key's payload multiset
    val key = 1000L
    val a = salted.filter(col("k") === key)
      .select("o_totalprice").collect().map(_.getDouble(0)).sorted.toSeq
    val b = plain.filter(col("k") === key)
      .select("o_totalprice").collect().map(_.getDouble(0)).sorted.toSeq
    assert(a == b)
  }
}
