package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** ENGINE-WIDE plan hygiene: while PlanQualitySpec asserts per-operator
  * plan shapes, this sweep builds the physical plan of EVERY registered
  * catalog query and enforces the invariants that must hold across the
  * whole engine — the class of regression a single-operator spec cannot
  * catch (a refactor quietly flipping some other query's join to a
  * cartesian, or adding a corpus-wide single-partition sort).
  *
  * Uses sf0.001 so model-fitting queries (IVF/PQ/k-means training runs
  * real jobs at plan-build time) stay cheap.
  */
class PlanSweepSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = EngineSession.local("8")
  private val sf = "/root/testdata/sf0.001"

  override def afterAll(): Unit = spark.stop()

  private lazy val plans: Map[String, String] =
    QueryCatalog.all.map { qd =>
      qd.name -> qd.run(spark, sf).queryExecution.executedPlan.toString
    }.toMap

  test("no catalog query plans a CartesianProduct") {
    val offenders = plans.collect {
      case (n, p) if p.contains("CartesianProduct") => n
    }
    assert(offenders.isEmpty,
      s"cartesian joins (every pair shuffled everywhere): $offenders")
  }

  /** Unpartitioned windows move ALL rows to one partition. The only
    * places the engine accepts that are spine passes whose row count is
    * bounded by history/config, never by corpus volume — each carries an
    * in-code justification. Anything else is a scale bug.
    */
  private val unpartitionedWindowWhitelist = Set(
    "q61_concurrency", // hour-spine offsets: one row per active hour
    "q47_skyline", // two windows over the bounded x-histogram
    "p09_curriculum", // cumulative over the score histogram
    "p13_weighted_systematic", // exclusive prefix over the bin table
    "p16_interleave", // row_number over an already-LIMITed 200-row frame
    // retrieval result ranking: rn over rows ALREADY cut to k by a
    // TakeOrderedAndProject limit — ≤20 rows reach the window
    "r01_bm25_topk",
    "r03_hybrid_rrf",
    "r04_prf_expansion"
  )

  test("unpartitioned windows appear only in whitelisted spine passes") {
    // a windowspecdefinition whose FIRST argument already carries a sort
    // direction has no partition keys at all
    val unpart = "windowspecdefinition\\([^,()]*#\\d+L? (ASC|DESC)".r
    val offenders = plans.collect {
      case (n, p) if unpart.findFirstIn(p).isDefined &&
        !unpartitionedWindowWhitelist.contains(n) => n
    }
    assert(offenders.isEmpty,
      s"corpus-wide single-partition window outside the whitelist: " +
        s"$offenders")
  }

  test("whitelisted spine windows still exist (whitelist stays honest)") {
    val unpart = "windowspecdefinition\\([^,()]*#\\d+L? (ASC|DESC)".r
    unpartitionedWindowWhitelist.foreach { n =>
      assert(plans.contains(n), s"$n left the catalog — prune the whitelist")
    }
    // at least one whitelisted query genuinely uses its spine window
    assert(unpartitionedWindowWhitelist.exists(n =>
      unpart.findFirstIn(plans(n)).isDefined))
  }
}
