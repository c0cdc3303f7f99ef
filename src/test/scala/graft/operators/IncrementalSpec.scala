package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The incremental/CDC family (i01-i05): semantics pins the DuckDB gate
  * can't see, on hand-built fixtures where every law is checkable by eye.
  */
class IncrementalSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = graft.EngineSession.local("4")
  val sf = "/root/testdata/sf0.001"

  override def afterAll(): Unit = spark.stop()

  test("i01: diff statuses partition both snapshots and counts reconcile") {
    val rows = graft.QueryCatalog.byName("i01_snapshot_diff")
      .run(spark, sf).collect()
    assert(rows.nonEmpty)
    val byStatus = rows.groupBy(_.getString(1))
      .map { case (k, v) => k -> v.map(_.getLong(2)).sum }
    val v1n = Incremental.snapshotV1(spark, sf).count()
    val v2n = Incremental.snapshotV2(spark, sf).count()
    // every v1 row is removed/changed/unchanged; every v2 row is
    // added/changed/unchanged — the four statuses tile the two snapshots
    assert(byStatus.getOrElse("removed", 0L) + byStatus.getOrElse("changed", 0L)
      + byStatus.getOrElse("unchanged", 0L) === v1n)
    assert(byStatus.getOrElse("added", 0L) + byStatus.getOrElse("changed", 0L)
      + byStatus.getOrElse("unchanged", 0L) === v2n)
    // the derivations guarantee all four statuses occur at sf0.001
    assert(byStatus.keySet === Set("added", "removed", "changed", "unchanged"))
  }

  test("i02: merge output keys = (v1 minus deletes) union inserts") {
    val merged = graft.QueryCatalog.byName("i02_upsert_merge")
      .run(spark, sf).collect().map(_.getLong(0)).toSet
    val all = graft.Tables.documents(spark, sf)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val expected = all.filter(id =>
      // present iff: not deleted (%11) AND (in v1 (%7!=0) OR inserted (%7))
      id % 11 != 0)
    assert(merged === expected)
  }

  test("i02: latest-wins — a key with U seq1 + U seq2 lands on the rev2 text") {
    // doc_id % 10 == 0, % 7 != 0, % 11 != 0 → survives with ' rev2' text
    val docs = graft.Tables.documents(spark, sf)
      .filter(col("doc_id") % 10 === 0 && col("doc_id") % 7 =!= 0 &&
        col("doc_id") % 11 =!= 0)
      .select(col("doc_id"), md5(concat(col("text"), lit(" rev2"))).as("want"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(docs.nonEmpty)
    val got = graft.QueryCatalog.byName("i02_upsert_merge")
      .run(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    docs.foreach { case (id, h) => assert(got(id) === h, s"doc $id") }
  }

  test("i03: survivors are exactly the genuinely-fresh delta rows") {
    import spark.implicits._
    val surv = graft.QueryCatalog.byName("i03_delta_dedup")
      .run(spark, sf).as[Long].collect().toSet
    // near-dup revisions (text || ' appended') of corpus docs must drop;
    // the %26 fresh texts must survive (nothing similar exists)
    val fresh = graft.Tables.documents(spark, sf)
      .filter(col("doc_id") % 26 === 0)
      .select((-col("doc_id") - 1).as("id")).as[Long].collect().toSet
    assert(fresh.subsetOf(surv))
    // and the appended revisions of ≥5-word docs all dropped
    val longRevs = graft.Tables.documents(spark, sf)
      .filter(col("doc_id") % 13 === 0 && col("doc_id") % 26 =!= 0 &&
        size(split(col("text"), " ")) >= 5)
      .select((-col("doc_id") - 1).as("id")).as[Long].collect().toSet
    assert(longRevs.intersect(surv).isEmpty)
  }

  test("i04: dirty days only, and published + late = corrected") {
    val rows = graft.QueryCatalog.byName("i04_late_reconcile")
      .run(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) > 0) // n_late > 0: only dirty days appear
      assert(r.getLong(1) + r.getLong(2) === r.getLong(3))
    }
  }

  test("i05: clean driver data passes every expectation") {
    val rows = graft.QueryCatalog.byName("i05_expectation_audit")
      .run(spark, sf).collect()
    assert(rows.length === 8)
    rows.foreach { r =>
      assert(r.getLong(3) === 0L,
        s"${r.getString(0)}/${r.getString(1)} has violations")
      assert(r.getLong(2) > 0L)
    }
  }

  test("i05: violations are detected, not vacuously zero") {
    import spark.implicits._
    // a corrupted in-memory documents table through the same aggregate
    val bad = Seq(
      (1L, "ok text here", "en", "src0", 12L),
      (2L, "", "en", "src0", 0L),           // empty text
      (3L, "abc", "english", "src0", 3L),   // bad lang
      (4L, "abcd", "fr", "src0", 99L))      // n_chars mismatch
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val agg = bad.agg(
      count(lit(1)).as("n"),
      count_if(col("text").isNull || col("text") === "").as("text_empty"),
      count_if(col("text").isNotNull &&
        col("n_chars") =!= length(col("text"))).as("nchars_mismatch"),
      count_if(col("lang").isNull || length(col("lang")) =!= 2).as("lang_invalid"))
      .collect()(0)
    assert(agg.getLong(1) === 1L)
    assert(agg.getLong(2) === 1L)
    assert(agg.getLong(3) === 1L)
  }
}
