package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** [[Dedup.planBanding]]: the chosen (bands, rows) split must put the
  * S-curve's steep region at the requested threshold, move monotonically
  * with the threshold, and actually drive [[Dedup.lshCandidatesTuned]].
  */
class BandPlanSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = graft.EngineSession.local("4")
  override def afterAll(): Unit = spark.stop()

  private def midpoint(b: Int, r: Int): Double =
    math.pow(1.0 / b, 1.0 / r) // where P(candidate) = 1 − (1−s^r)^b ≈ ½

  test("the S-curve midpoint of the chosen split lands near the threshold") {
    for (t <- Seq(0.3, 0.5, 0.7, 0.9)) {
      val (b, r) = Dedup.planBanding(64, t)
      assert(b * r == 64)
      val mid = midpoint(b, r)
      // FN-weighted planning biases the curve slightly LEFT of τ (catch
      // more), never far right of it
      assert(mid < t + 0.05 && mid > t - 0.35,
        s"threshold $t chose ($b, $r) with midpoint $mid")
    }
  }

  test("higher thresholds choose fewer, wider bands (monotone r)") {
    val rs = Seq(0.2, 0.4, 0.6, 0.8).map { t =>
      val (_, r) = Dedup.planBanding(64, t); r
    }
    assert(rs == rs.sorted, s"rows-per-band must grow with threshold: $rs")
  }

  test("d19 is DRIVEN by the planner: its banding is planBanding's output " +
      "and both the engine pipeline and the oracle restate that choice") {
    // the registered query's parameters come from the planner, not a
    // hand-picked constant — recomputing the plan must reproduce them
    val (b, r) = Dedup.planBanding(Dedup.PlannedSigs, Dedup.PlannedThreshold)
    assert((b, r) === ((Dedup.plannedBands, Dedup.plannedRowsPerBand)))
    assert(b * r === Dedup.PlannedSigs)
    // the oracle SQL is BUILT from the same planner output: one band
    // branch per planned band, each concatenating r signature slots
    val sql = Dedup.lshPlanned.oracle.get
    assert("AS band_idx".r.findAllIn(sql).size === b,
      s"oracle must restate exactly $b bands:\n$sql")
    val lastSlot = s"m${Dedup.PlannedSigs - 1}"
    assert(sql.contains(lastSlot),
      s"oracle must consume all ${Dedup.PlannedSigs} signature slots")
    // and the engine pipeline at the planned banding IS the registered
    // query (same rows on the sf0.001 corpus)
    val d = "/root/testdata/sf0.001"
    val viaPlanner = Dedup.lshPlanned.run(spark, d).collect().toSeq
    val direct = Dedup.lshCandidatesTuned(
        graft.Tables.documents(spark, d).select("doc_id", "text"),
        Dedup.PlannedSigs, b)
      .orderBy("doc_a", "doc_b").collect().toSeq
    assert(viaPlanner === direct)
  }

  test("d24's char banding is planner-chosen (3 bands x 4 rows at " +
      "tau=0.8) and its oracle restates the choice + the band cap") {
    val (b, r) = Dedup.planBanding(
      Dedup.CharPlannedSigs, Dedup.CharPlannedThreshold)
    assert((b, r) === ((Dedup.charPlannedBands, Dedup.charPlannedRows)))
    assert((b, r) === ((3, 4)), s"expected (3,4) at tau=0.8, got ($b,$r)")
    val mid = midpoint(b, r)
    assert(mid < Dedup.CharPlannedThreshold,
      s"FN-weighted midpoint must sit under tau: $mid")
    val sql = Dedup.lshCharPlanned.oracle.get
    assert("AS band_idx".r.findAllIn(sql).size === b,
      s"oracle must restate exactly $b bands")
    assert(sql.contains(s"m${Dedup.CharPlannedSigs - 1}"),
      "oracle must consume all signature slots")
    assert(sql.contains(s"nk <= ${Dedup.CharBandCap}"),
      "oracle must restate the band-frequency cap")
  }

  test("d24's band cap drops hot keys: a mega-template cluster generates " +
      "zero candidate pairs while normal near-dups still pair") {
    import spark.implicits._
    // 100 distinct single-char-suffix variants of one template (every
    // variant shares nearly all char 5-grams -> same band keys -> one
    // hot bucket far over any reasonable cap) + one true near-dup pair
    val template = "this is the shared boilerplate template body " * 3
    val hot = (0 until 100).map(i => (100L + i, template + ('a' + i % 26).toChar))
    val pair = Seq(
      (1L, "a genuinely unique document about owls and their habits in winter"),
      (2L, "a genuinely unique document about owls and their habits in summer"))
    val docs = (hot ++ pair).toDF("doc_id", "text")
    val bands = Dedup.charBandKeys(
      docs, Dedup.CharPlannedSigs, Dedup.charPlannedBands)
    val kc = bands.groupBy("band_idx", "band_val").agg(count(lit(1)).as("nk"))
    // the template cluster IS a hot bucket at this fixture scale
    assert(kc.filter(col("nk") > 64).count() > 0,
      "fixture must produce a hot band key")
    val kept = bands.join(kc.filter(col("nk") <= 64),
      Seq("band_idx", "band_val"))
    val keptIds = kept.select("doc_id").distinct()
      .collect().map(_.getLong(0)).toSet
    // the owls pair survives the cap; pairs among the hot cluster are
    // suppressed (they'd be cap-squared-bounded otherwise)
    assert(keptIds.contains(1L) && keptIds.contains(2L))
  }

  test("a planned banding is a valid lshCandidatesTuned parameterization") {
    import spark.implicits._
    val (b, _) = Dedup.planBanding(8, 0.5, fnWeight = 10.0)
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "completely different text with no overlap whatsoever here now"))
      .toDF("doc_id", "text")
    val cand = Dedup.lshCandidatesTuned(docs, numSigs = 8, numBands = b)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(cand.contains((1L, 2L)), "exact duplicates must be candidates")
  }
}
