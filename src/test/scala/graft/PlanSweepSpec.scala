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

  /** The non-adaptive physical tree of every catalog query: AQE wraps
    * the root in AdaptiveSparkPlanExec (a leaf as far as `collect` is
    * concerned), so structural sweeps unwrap to its `initialPlan` —
    * the same tree the string form always printed.
    */
  private lazy val planTrees
      : Map[String, org.apache.spark.sql.execution.SparkPlan] =
    QueryCatalog.all.map { qd =>
      val p = qd.run(spark, sf).queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.initialPlan
        case other => other
      }
      qd.name -> p
    }.toMap

  private lazy val plans: Map[String, String] =
    planTrees.map { case (n, p) => n -> p.toString }

  test("no catalog query plans a CartesianProduct") {
    val offenders = plans.collect {
      case (n, p) if p.contains("CartesianProduct") => n
    }
    assert(offenders.isEmpty,
      s"cartesian joins (every pair shuffled everywhere): $offenders")
  }

  /** Unpartitioned windows move ALL rows to one partition. The only
    * places the engine accepts that are passes whose input row count is
    * bounded by history/config/k, never by corpus volume. This was a
    * name-whitelist convention through r15; it is now a STRUCTURAL
    * assertion (r15 verdict item 2): for every unpartitioned WindowExec
    * in every catalog plan, the window's input subtree must actually
    * contain the bounding operator its justification claims —
    *  - "limit":     a GlobalLimit / TakeOrderedAndProject below the
    *                 window (top-k survivors reach it, ≤ k·fanout rows)
    *  - "aggregate": an aggregate whose grouping-key domain is bounded
    *                 by construction (a histogram's bins, a spine's
    *                 hours — the bounded-domain claim is the human-
    *                 reviewed part, the aggregate's presence is checked)
    *  - "spine":     a generate over sequence(...) — rows = spine
    *                 length, set by config/history span, not corpus
    * A query NOT declared here justifies an unpartitioned window only
    * by a structural limit; anything else fails the sweep.
    */
  private val declaredWindowBounds: Map[String, String] = Map(
    "q61_concurrency" -> "spine", // hour-spine offsets: one row per active hour
    "q47_skyline" -> "aggregate", // two windows over the bounded x-histogram
    "p09_curriculum" -> "aggregate", // cumulative over the score histogram
    "p13_weighted_systematic" -> "aggregate", // exclusive prefix over the bin table
    "p16_interleave" -> "limit", // row_number over an already-LIMITed 200-row frame
    // retrieval result ranking: rn over rows ALREADY cut to k by a
    // TakeOrderedAndProject limit — ≤20 rows reach the window
    "r01_bm25_topk" -> "limit",
    "r03_hybrid_rrf" -> "limit",
    "r04_prf_expansion" -> "limit"
  )

  test("every unpartitioned window sits above its declared bounding " +
    "operator — the bounded-global-window discipline as a structural " +
    "assertion, not a name whitelist") {
    import org.apache.spark.sql.execution.{GenerateExec, GlobalLimitExec,
      SparkPlan, TakeOrderedAndProjectExec}
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.window.{WindowExec,
      WindowGroupLimitExec}
    def hasLimit(p: SparkPlan): Boolean = p.collectFirst {
      case _: GlobalLimitExec => (); case _: TakeOrderedAndProjectExec => ()
    }.isDefined
    def hasAgg(p: SparkPlan): Boolean =
      p.collectFirst { case _: BaseAggregateExec => () }.isDefined
    def hasSpine(p: SparkPlan): Boolean = p.collectFirst {
      case g: GenerateExec
        if g.boundGenerator.toString.toLowerCase.contains("sequence") => ()
    }.isDefined
    val offenders = planTrees.toSeq.sortBy(_._1).flatMap { case (n, plan) =>
      val windowInputs = plan.collect {
        case w: WindowExec if w.partitionSpec.isEmpty => w.child
        case w: WindowGroupLimitExec if w.partitionSpec.isEmpty => w.child
      }
      windowInputs.flatMap { sub =>
        val ok = declaredWindowBounds.get(n) match {
          case Some("limit") => hasLimit(sub)
          case Some("aggregate") => hasAgg(sub)
          case Some("spine") => hasSpine(sub)
          case _ => hasLimit(sub) // undeclared: only a hard limit justifies
        }
        if (ok) None
        else Some(s"$n (declared: ${declaredWindowBounds.get(n)})")
      }
    }
    assert(offenders.isEmpty,
      s"unpartitioned window whose input subtree lacks its bounding " +
        s"operator (corpus-wide single-partition window at scale): " +
        s"${offenders.distinct}")
  }

  test("declared window bounds stay honest: each declared query still " +
    "has an unpartitioned window") {
    import org.apache.spark.sql.execution.window.{WindowExec,
      WindowGroupLimitExec}
    declaredWindowBounds.keys.foreach { n =>
      assert(planTrees.contains(n),
        s"$n left the catalog — prune declaredWindowBounds")
      val has = planTrees(n).collect {
        case w: WindowExec if w.partitionSpec.isEmpty => ()
        case w: WindowGroupLimitExec if w.partitionSpec.isEmpty => ()
      }.nonEmpty
      assert(has, s"$n no longer plans an unpartitioned window — " +
        "prune declaredWindowBounds")
    }
  }
}
