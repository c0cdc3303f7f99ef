package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import Compat._

/** Second relational batch: outer joins, explicit GROUPING SETS (through
  * the `spark.sql` surface), sketch aggregates, and richer window frames.
  */
object Relational2 {

  private def q(name: String, oracle: String)(
      run: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, Some(oracle), run)

  /** LEFT OUTER join preserving customers without orders (null-safe
    * aggregation over the padded side).
    */
  val leftOuter: QueryDef = q(
    "q27_left_outer_join",
    """SELECT c_custkey, count(o_orderkey) AS n_orders,
      |  CAST(coalesce(sum(CAST(o_totalprice AS DECIMAL(12,2))),
      |                CAST(0 AS DECIMAL(12,2))) AS DOUBLE) AS total_spend
      |FROM customer LEFT JOIN orders ON o_custkey = c_custkey
      |GROUP BY c_custkey
      |ORDER BY c_custkey""".stripMargin) { (s, d) =>
    Tables.customer(s, d)
      .join(Tables.orders(s, d), col("o_custkey") === col("c_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(
        count(col("o_orderkey")).as("n_orders"),
        coalesce(sum(money(col("o_totalprice"))), money(lit(0)))
          .cast("double").as("total_spend"))
      .orderBy("c_custkey")
  }

  /** FULL OUTER join of two independent aggregates (nation-level supplier
    * vs customer populations; either side may be missing).
    */
  val fullOuter: QueryDef = q(
    "q28_full_outer_join",
    """SELECT coalesce(s.nk, c.nk) AS nationkey,
      |       coalesce(n_supp, 0) AS n_supp,
      |       coalesce(n_cust, 0) AS n_cust
      |FROM (SELECT s_nationkey AS nk, count(*) AS n_supp FROM supplier GROUP BY 1) s
      |FULL JOIN (SELECT c_nationkey AS nk, count(*) AS n_cust FROM customer GROUP BY 1) c
      |  ON s.nk = c.nk
      |ORDER BY nationkey""".stripMargin) { (s, d) =>
    val sup = Tables.supplier(s, d).groupBy(col("s_nationkey").as("nk_s"))
      .agg(count(lit(1)).as("n_supp"))
    val cus = Tables.customer(s, d).groupBy(col("c_nationkey").as("nk_c"))
      .agg(count(lit(1)).as("n_cust"))
    sup.join(cus, col("nk_s") === col("nk_c"), "full")
      .select(
        coalesce(col("nk_s"), col("nk_c")).as("nationkey"),
        coalesce(col("n_supp"), lit(0L)).as("n_supp"),
        coalesce(col("n_cust"), lit(0L)).as("n_cust"))
      .orderBy("nationkey")
  }

  /** Explicit GROUPING SETS, exercised through the `spark.sql` entry point
    * (temp views over the same parquet) — the SQL-parser surface of
    * SURVEY.md §2.11.
    */
  val groupingSets: QueryDef = q(
    "q29_grouping_sets",
    """SELECT c_mktsegment, o_orderstatus,
      |  CAST(GROUPING(c_mktsegment) AS INT) AS g_seg,
      |  CAST(GROUPING(o_orderstatus) AS INT) AS g_st,
      |  count(*) AS n_orders
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY GROUPING SETS ((c_mktsegment), (o_orderstatus), ())
      |ORDER BY c_mktsegment NULLS FIRST, o_orderstatus NULLS FIRST""".stripMargin) {
    (s, d) =>
      Tables.orders(s, d).createOrReplaceTempView("orders")
      Tables.customer(s, d).createOrReplaceTempView("customer")
      s.sql(
        """SELECT c_mktsegment, o_orderstatus,
          |  CAST(GROUPING(c_mktsegment) AS INT) AS g_seg,
          |  CAST(GROUPING(o_orderstatus) AS INT) AS g_st,
          |  count(*) AS n_orders
          |FROM orders JOIN customer ON o_custkey = c_custkey
          |GROUP BY GROUPING SETS ((c_mktsegment), (o_orderstatus), ())
          |ORDER BY c_mktsegment NULLS FIRST, o_orderstatus NULLS FIRST""".stripMargin)
  }

  /** HLL sketch distinct counts (approx_count_distinct), SELF-GATED: the
    * raw sketch value is engine-specific (Spark's HLL++ vs DuckDB's HLL
    * produce different estimates), so the query exposes the DETERMINISTIC
    * derivative instead — the exact distinct count plus a boolean that the
    * sketch landed within 3×rsd of it. Both engines compute the gate over
    * their own sketch; with rsd = 0.02 a miss beyond 3σ on either side is
    * vanishingly unlikely, which makes the row fully hash-checkable where
    * it previously had no oracle at all. ApproxDistinctSpec additionally
    * pins the numeric error bound in-engine.
    */
  val approxDistinct: QueryDef = QueryDef(
    "q30_approx_distinct",
    Some("""SELECT l_returnflag,
      |  count(DISTINCT l_partkey) AS exact_parts,
      |  count(*) AS n_rows,
      |  abs(approx_count_distinct(l_partkey) - count(DISTINCT l_partkey))
      |    <= 0.06 * count(DISTINCT l_partkey) AS approx_ok
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin),
    (s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_partkey")).as("exact_parts"),
          count(lit(1)).as("n_rows"),
          approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"))
        .select(col("l_returnflag"), col("exact_parts"), col("n_rows"),
          (abs(col("approx_parts") - col("exact_parts")) <=
            lit(0.06) * col("exact_parts")).as("approx_ok"))
        .orderBy("l_returnflag"))

  /** Window frames beyond running totals: sliding 3-row average (exact via
    * decimal sum / count), lead lookahead, and ntile buckets — one shuffle
    * on the partition key for all three.
    */
  val windowFrames: QueryDef = q(
    "q31_window_frames",
    """SELECT o_custkey, o_orderkey,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2)))
      |       OVER w3 AS DOUBLE) / count(*) OVER w3 AS sliding_avg,
      |  lead(o_orderkey) OVER wo AS next_order,
      |  ntile(4) OVER wo AS quartile
      |FROM orders
      |WINDOW w3 AS (PARTITION BY o_custkey ORDER BY o_orderkey
      |              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
      |       wo AS (PARTITION BY o_custkey ORDER BY o_orderkey)
      |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, d) =>
    val wo = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
    val w3 = wo.rowsBetween(-2, Window.currentRow)
    Tables.orders(s, d).select(
      col("o_custkey"), col("o_orderkey"),
      (sum(money(col("o_totalprice"))).over(w3).cast("double") /
        count(lit(1)).over(w3)).as("sliding_avg"),
      lead(col("o_orderkey"), 1).over(wo).as("next_order"),
      ntile(4).over(wo).as("quartile"))
      .orderBy("o_custkey", "o_orderkey")
  }

  def defs: Seq[QueryDef] =
    Seq(leftOuter, fullOuter, groupingSets, approxDistinct, windowFrames)
}
