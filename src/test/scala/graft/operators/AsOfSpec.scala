package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class AsOfSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = graft.EngineSession.local("4")
  override def afterAll(): Unit = spark.stop()

  // the classic trades-join-latest-quote shape
  private lazy val trades = {
    import spark.implicits._
    Seq((1L, 10L, "t1"), (1L, 20L, "t2"), (1L, 25L, "t3"), (2L, 15L, "t4"))
      .toDF("sym", "ts", "trade")
  }
  private lazy val quotes = {
    import spark.implicits._
    Seq((1L, 5L, 100.0), (1L, 20L, 101.0), (1L, 30L, 102.0), (3L, 1L, 999.0))
      .toDF("sym", "ts", "px")
  }

  test("non-strict: same-instant quote is matched") {
    val r = AsOf.joinAsOf(trades, quotes, "sym", "ts", "ts")
      .orderBy("sym", "ts")
      .collect().map(x => (x.getString(2), Option(x.get(3)).map(_.toString)))
    assert(r.toSeq == Seq(
      ("t1", Some("100.0")), // quote@5
      ("t2", Some("101.0")), // quote@20 (same instant, included)
      ("t3", Some("101.0")),
      ("t4", None)))         // sym 2 has no quotes
  }

  test("strict: same-instant quote is excluded") {
    val r = AsOf.joinAsOf(trades, quotes, "sym", "ts", "ts", strict = true)
      .orderBy("sym", "ts")
      .collect().map(x => (x.getString(2), Option(x.get(3)).map(_.toString)))
    assert(r.toSeq == Seq(
      ("t1", Some("100.0")),
      ("t2", Some("100.0")), // quote@20 excluded under strict
      ("t3", Some("101.0")),
      ("t4", None)))
  }

  test("agrees with the relational max_by formulation on real events") {
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id").as("purchase_id"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
    val got = AsOf.joinAsOf(purchases, clicks, "user_id", "ts", "ts",
        strict = true)
      .filter(col("click_id").isNotNull)
      .select("purchase_id", "click_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    // brute force: per purchase, the click with max ts < purchase ts
    val expected = graft.operators.EventOps.asofJoin
      .run(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    assert(got == expected)
  }

  test("tieBreak pins which same-instant right duplicate is attached") {
    import spark.implicits._
    val left = Seq((1L, 10L, "t")).toDF("sym", "ts", "trade")
    val dupQuotes = Seq((1L, 10L, 100.0, 1L), (1L, 10L, 200.0, 2L))
      .toDF("sym", "ts", "px", "seq")
    val r = AsOf.joinAsOf(left, dupQuotes.repartition(5), "sym", "ts", "ts",
      tieBreak = Seq("seq"))
    // largest seq wins, deterministically
    assert(r.select("px").collect().head.getDouble(0) == 200.0)
    assert(r.select("seq").collect().head.getLong(0) == 2L)
  }

  test("colliding right payload names require a suffix, then disambiguate") {
    import spark.implicits._
    val left = Seq((1L, 10L, 7.0)).toDF("sym", "ts", "px")
    // right payload also named px — ambiguous without a suffix
    intercept[IllegalArgumentException] {
      AsOf.joinAsOf(left, quotes, "sym", "ts", "ts")
    }
    val r = AsOf.joinAsOf(left, quotes, "sym", "ts", "ts", rightSuffix = "_q")
    assert(r.columns.toSeq == Seq("sym", "ts", "px", "px_q"))
    assert(r.collect().head.getDouble(3) == 100.0)
  }

  test("suffixing right columns never collides them with each other") {
    import spark.implicits._
    val left = Seq((1L, 10L)).toDF("sym", "ts")
    // right carries both px and px_q: one fixed suffix keeps distinct
    // names distinct (px→px_q, px_q→px_q_q), so the output has unique
    // columns — px_q is the SUFFIXED px, the original px_q moved on
    val right = Seq((1L, 5L, 100.0, 1.0)).toDF("sym", "ts", "px", "px_q")
    val r = AsOf.joinAsOf(left, right, "sym", "ts", "ts", rightSuffix = "_q")
    assert(r.columns.toSeq == Seq("sym", "ts", "px_q", "px_q_q"))
    assert(r.columns.distinct.length == r.columns.length)
    val row = r.collect().head
    assert(row.getDouble(2) == 100.0 && row.getDouble(3) == 1.0)
  }
}
