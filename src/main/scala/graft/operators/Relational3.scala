package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import Compat._

/** Third relational batch: scalar subqueries, multiset set ops, analytic
  * first/last values, pivot, and exact percentiles.
  */
object Relational3 {

  private def q(name: String, oracle: String)(
      run: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, Some(oracle), run)

  /** Scalar-subquery filter: customers above the global average balance.
    * The threshold is computed with the deterministic decimal-sum/count
    * form and broadcast (a 1-row cross join — the scalar-subquery shape).
    */
  val scalarSubquery: QueryDef = q(
    "q32_scalar_subquery",
    """SELECT c_custkey, c_acctbal
      |FROM customer
      |WHERE c_acctbal > (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
      |                          / count(*) FROM customer)
      |ORDER BY c_custkey""".stripMargin) { (s, d) =>
    val cust = Tables.customer(s, d)
    val thr = cust.agg(
      (sum(money(col("c_acctbal"))).cast("double") / count(lit(1))).as("thr"))
    cust.join(broadcast(thr))
      .filter(col("c_acctbal") > col("thr"))
      .select("c_custkey", "c_acctbal")
      .orderBy("c_custkey")
  }

  /** EXCEPT ALL — multiset difference preserving duplicate counts. */
  val exceptAll: QueryDef = q(
    "q33_except_all",
    """SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
      |EXCEPT ALL
      |SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'P'
      |ORDER BY custkey""".stripMargin) { (s, d) =>
    val o = Tables.orders(s, d)
    o.filter(col("o_orderstatus") === "F").select(col("o_custkey").as("custkey"))
      .exceptAll(
        o.filter(col("o_orderstatus") === "P").select(col("o_custkey").as("custkey")))
      .orderBy("custkey")
  }

  /** INTERSECT ALL — multiset intersection preserving duplicate counts
    * (each custkey appears min(count_F, count_P) times), completing the
    * multiset set-op pair with q33's EXCEPT ALL.
    */
  val intersectAllQ: QueryDef = q(
    "q50_intersect_all",
    """SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
      |INTERSECT ALL
      |SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'P'
      |ORDER BY custkey""".stripMargin) { (s, d) =>
    val o = Tables.orders(s, d)
    o.filter(col("o_orderstatus") === "F").select(col("o_custkey").as("custkey"))
      .intersectAll(
        o.filter(col("o_orderstatus") === "P").select(col("o_custkey").as("custkey")))
      .orderBy("custkey")
  }

  /** first_value / last_value analytics (last needs the full-partition
    * frame — the default running frame would return the current row).
    */
  val firstLast: QueryDef = q(
    "q34_first_last",
    """SELECT o_custkey, o_orderkey,
      |  first_value(o_orderkey) OVER w AS first_ord,
      |  last_value(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_ord
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)
      |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
    val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.orders(s, d).select(
      col("o_custkey"), col("o_orderkey"),
      first(col("o_orderkey")).over(w).as("first_ord"),
      last(col("o_orderkey")).over(wFull).as("last_ord"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Pivot: order-status counts as columns per market segment (fixed pivot
    * values so the schema is static; missing combos coalesce to 0 to match
    * the oracle's conditional counts).
    */
  val pivot: QueryDef = q(
    "q35_pivot",
    """SELECT c_mktsegment,
      |  count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS F,
      |  count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS O,
      |  count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS P
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .count()
      .select(col("c_mktsegment"),
        coalesce(col("F"), lit(0L)).as("F"),
        coalesce(col("O"), lit(0L)).as("O"),
        coalesce(col("P"), lit(0L)).as("P"))
      .orderBy("c_mktsegment")
  }

  /** Exact interpolated percentiles at dyadic points (0.25/0.5/0.75):
    * on integer-valued quantities the interpolation weights and products
    * are exact in double, so Spark's percentile and DuckDB's quantile_cont
    * agree bit-for-bit.
    */
  val percentiles: QueryDef = q(
    "q36_percentiles",
    """SELECT l_returnflag,
      |  quantile_cont(l_quantity, 0.25) AS p25,
      |  quantile_cont(l_quantity, 0.5)  AS p50,
      |  quantile_cont(l_quantity, 0.75) AS p75
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        expr("percentile(l_quantity, 0.25D)").as("p25"),
        expr("percentile(l_quantity, 0.5D)").as("p50"),
        expr("percentile(l_quantity, 0.75D)").as("p75"))
      .orderBy("l_returnflag")
  }

  /** UNPIVOT (wide → long), the inverse of q35's pivot: per-flag metric
    * columns melt into (metric, value) rows. Spark's `unpivot` is a
    * zero-shuffle Expand over the aggregate; value columns are cast to
    * DOUBLE on both sides so the unified value column has one type.
    */
  val unpivotMetrics: QueryDef = q(
    "q37_unpivot",
    """WITH base AS (
      |  SELECT l_returnflag,
      |    CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      |    CAST(sum(CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS sum_disc,
      |    CAST(count(*) AS DOUBLE) AS n_rows
      |  FROM lineitem GROUP BY l_returnflag)
      |SELECT l_returnflag, metric, value
      |FROM base UNPIVOT (value FOR metric IN (sum_qty, sum_disc, n_rows))
      |ORDER BY l_returnflag, metric""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        sum(col("l_quantity").cast("decimal(12,2)")).cast("double").as("sum_qty"),
        sum(col("l_discount").cast("decimal(12,2)")).cast("double").as("sum_disc"),
        count(lit(1)).cast("double").as("n_rows"))
      .unpivot(Array(col("l_returnflag")),
        Array(col("sum_qty"), col("sum_disc"), col("n_rows")),
        "metric", "value")
      .orderBy("l_returnflag", "metric")
  }

  /** Correlated EXISTS / NOT EXISTS subqueries through the SQL-parser
    * surface: customers holding at least one urgent order and no filled
    * order. Catalyst decorrelates the pair into a left-semi plus a
    * left-anti join on `o_custkey` — both shuffle-hash-joinable on the
    * same key, so at scale the two subquery probes co-partition with the
    * customer scan instead of re-shuffling per subquery.
    */
  val correlatedExists: QueryDef = {
    val sql =
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey
        |                AND o.o_orderpriority = '1-URGENT')
        |  AND NOT EXISTS (SELECT 1 FROM orders o2
        |                  WHERE o2.o_custkey = c.c_custkey
        |                    AND o2.o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin
    q("q40_correlated_exists", sql) { (s, d) =>
      Tables.customer(s, d).createOrReplaceTempView("customer")
      Tables.orders(s, d).createOrReplaceTempView("orders")
      s.sql(sql)
    }
  }

  /** Correlated LATERAL subquery with ORDER BY + LIMIT through the SQL
    * parser — per-customer top-2 orders, the "top-N per entity via
    * LATERAL" idiom. Catalyst decorrelates the limited lateral into a
    * ranked window over the join (no per-row subquery re-execution), so
    * at scale this is ONE orders shuffle + WindowGroupLimit, not
    * |customer| point queries — exactly the plan the q08 DataFrame form
    * builds by hand, now reachable from SQL. Identical text runs on
    * DuckDB.
    */
  val lateralTopN: QueryDef = {
    val sql =
      """SELECT c_custkey, o_orderkey, o_totalprice
        |FROM customer c, LATERAL (
        |  SELECT o_orderkey, o_totalprice FROM orders o
        |  WHERE o.o_custkey = c.c_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey
        |  LIMIT 2) t
        |WHERE c.c_mktsegment = 'BUILDING'
        |ORDER BY c_custkey, o_totalprice DESC, o_orderkey""".stripMargin
    q("q44_lateral_topn", sql) { (s, d) =>
      Tables.customer(s, d).createOrReplaceTempView("customer")
      Tables.orders(s, d).createOrReplaceTempView("orders")
      s.sql(sql)
    }
  }

  /** CDC keep-latest merge (the lakehouse MERGE/upsert reduced to its
    * engine shape): a deterministic change feed — updates (every 7th
    * order key gets a 1.1× repriced version 2), deletes (every 13th key,
    * version 3), inserts (every 17th key re-keyed +10M into a new 'N'
    * status) — applied over the base table by keeping the highest
    * version per key and dropping keys whose latest op is a delete.
    *
    * Scale shape: ONE hash shuffle on the merge key; the rank-1 filter
    * triggers WindowGroupLimit, so each map partition pre-trims to its
    * local latest-per-key before the exchange (bounded state, hot-key
    * skew damped before it ships). This is Delta/Iceberg MERGE
    * "latest wins" without table-format machinery — the same plan a
    * 100 TB snapshot+changelog compaction wants. All price arithmetic
    * is exact decimal (×1.1 in DECIMAL(15,3)); the audit output
    * aggregates per status so the result stays 4 rows at any scale
    * while its hash still covers every merged row's price.
    */
  /** The deterministic CDC change feed shared by q45 (keep-latest MERGE)
    * and q46 (SCD2 history build): base snapshot at version 1, repriced
    * updates (version 2, every 7th key), deletes (version 3, every 13th
    * key), and re-keyed inserts (version 2, every 17th key; the insert
    * offset 1e12 mints keys OUTSIDE any scaled keyspace — a smaller
    * offset collided with the 1e7-stride replica shift of the sf1 store,
    * producing duplicate (k, version) pairs whose window tie-break is
    * engine-dependent; a CDC feed's (key, version) must be unique).
    */
  private val feedCtes: String =
    """base AS (
      |  SELECT o_orderkey AS k, o_orderstatus AS status,
      |         CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DECIMAL(15,3)) AS price,
      |         1 AS version, 'u' AS op
      |  FROM orders),
      |upd AS (
      |  SELECT o_orderkey, o_orderstatus,
      |         CAST(CAST(o_totalprice AS DECIMAL(12,2)) * CAST(1.1 AS DECIMAL(2,1)) AS DECIMAL(15,3)),
      |         2, 'u'
      |  FROM orders WHERE o_orderkey % 7 = 0),
      |del AS (
      |  SELECT o_orderkey, o_orderstatus,
      |         CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DECIMAL(15,3)),
      |         3, 'd'
      |  FROM orders WHERE o_orderkey % 13 = 0),
      |ins AS (
      |  SELECT o_orderkey + 1000000000000, 'N',
      |         CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DECIMAL(15,3)),
      |         2, 'u'
      |  FROM orders WHERE o_orderkey % 17 = 0),
      |feed AS (
      |  SELECT * FROM base UNION ALL SELECT * FROM upd
      |  UNION ALL SELECT * FROM del UNION ALL SELECT * FROM ins)""".stripMargin

  /** Spark side of [[feedCtes]] — identical legs, exact decimal prices. */
  private def changeFeed(o: DataFrame): DataFrame = {
    def leg(k: Column, status: Column, price: Column, version: Int,
        op: String)(src: DataFrame): DataFrame =
      src.select(k.as("k"), status.as("status"),
        price.cast("decimal(15,3)").as("price"),
        lit(version).as("version"), lit(op).as("op"))
    val base = leg(col("o_orderkey"), col("o_orderstatus"),
      money(col("o_totalprice")), 1, "u")(o)
    val upd = leg(col("o_orderkey"), col("o_orderstatus"),
      money(col("o_totalprice")) * lit(new java.math.BigDecimal("1.1")),
      2, "u")(o.filter(col("o_orderkey") % 7 === 0))
    val del = leg(col("o_orderkey"), col("o_orderstatus"),
      money(col("o_totalprice")), 3, "d")(
      o.filter(col("o_orderkey") % 13 === 0))
    val ins = leg(col("o_orderkey") + lit(1000000000000L), lit("N"),
      money(col("o_totalprice")), 2, "u")(
      o.filter(col("o_orderkey") % 17 === 0))
    base.unionByName(upd).unionByName(del).unionByName(ins)
  }

  val upsertLatest: QueryDef = q(
    "q45_upsert_latest",
    s"""WITH $feedCtes,
      |latest AS (
      |  SELECT *, row_number() OVER (PARTITION BY k ORDER BY version DESC) AS rn
      |  FROM feed)
      |SELECT status, count(*) AS n_rows, CAST(sum(price) AS DOUBLE) AS sum_price
      |FROM latest WHERE rn = 1 AND op = 'u'
      |GROUP BY status ORDER BY status""".stripMargin) { (s, d) =>
    val o = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    val feed = changeFeed(o)
    val w = Window.partitionBy(col("k")).orderBy(col("version").desc)
    feed.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("op") === "u")
      .groupBy(col("status"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("price")).cast("double").as("sum_price"))
      .orderBy("status")
  }

  /** SCD2 history build over the same change feed q45 merges: every 'u'
    * version becomes a dimension row with a validity interval
    * [valid_from_v, valid_to_v) closed by its successor version (a delete
    * closes the last interval without contributing a row); `is_current`
    * marks open intervals. This is the other half of the lakehouse MERGE
    * story — q45 keeps only the latest state, q46 keeps the full
    * point-in-time-queryable history, both off one shuffle on the key.
    *
    * Scale shape: ONE hash shuffle on the merge key, then a per-key window
    * (versions per key are bounded by the feed's op mix, never
    * corpus-scale). `price` is exact decimal through the window and cast
    * to double only at output.
    */
  val scd2History: QueryDef = q(
    "q46_scd2_history",
    s"""WITH $feedCtes,
      |hist AS (
      |  SELECT k, status, price, version, op,
      |         lead(version) OVER (PARTITION BY k ORDER BY version)
      |           AS valid_to_v
      |  FROM feed)
      |SELECT k, status, CAST(price AS DOUBLE) AS price,
      |       version AS valid_from_v, valid_to_v,
      |       (valid_to_v IS NULL) AS is_current
      |FROM hist WHERE op = 'u'
      |ORDER BY k, valid_from_v""".stripMargin) { (s, d) =>
    val o = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    val w = Window.partitionBy(col("k")).orderBy(col("version"))
    changeFeed(o)
      .withColumn("valid_to_v", lead(col("version"), 1).over(w))
      .filter(col("op") === "u")
      .select(col("k"), col("status"), col("price").cast("double").as("price"),
        col("version").as("valid_from_v"), col("valid_to_v"),
        col("valid_to_v").isNull.as("is_current"))
      .orderBy("k", "valid_from_v")
  }

  /** SKYLINE (Pareto-frontier) operator without the quadratic self-join.
    *
    * Dominance over two maximized integer criteria (x, y): row `b`
    * dominates `a` iff `x_b ≥ x_a ∧ y_b ≥ y_a` with at least one strict.
    * The textbook formulation is a correlated NOT EXISTS — a pairwise
    * self-join that is O(n²) and undistributable on a 100 TB corpus (the
    * oracle states exactly that form, at oracle scale).
    *
    * The engine instead uses the p09 histogram trick on the BOUNDED `x`
    * domain: aggregate `h(x) = max y` (map-side combined, ≤ |x-domain|
    * rows however large the corpus), take two suffix-maxima over the tiny
    * histogram with one window each —
    *   m_gt(x) = max h over x' > x   (strictly-longer rows)
    *   m_ge(x) = max h over x' ≥ x   (longer-or-equal rows)
    * — broadcast them back, and a row survives iff
    *   NOT (m_gt(x_a) ≥ y_a  ∨  m_ge(x_a) > y_a)
    * evaluated as a scan-fused comparison. Equal rows are mutually
    * non-dominating (both kept), matching the EXISTS form exactly.
    * Integer-exact throughout; the corpus never self-joins or sorts.
    */
  def skyline(df: DataFrame, x: Column, y: Column): DataFrame = {
    val rows = df.withColumn("x$", x.cast("long")).withColumn("y$", y.cast("long"))
    val h = rows.groupBy(col("x$")).agg(max(col("y$")).as("hy"))
    // two windows over the bounded x-histogram only (p09's documented
    // single-partition-is-fine-THERE pattern)
    val wGt = Window.orderBy(col("x$").desc).rowsBetween(Window.unboundedPreceding, -1)
    val wGe = Window.orderBy(col("x$").desc).rowsBetween(Window.unboundedPreceding, 0)
    val m = h.select(col("x$").as("hx"),
      coalesce(max(col("hy")).over(wGt), lit(Long.MinValue)).as("m_gt"),
      max(col("hy")).over(wGe).as("m_ge"))
    rows.join(broadcast(m), col("x$") === col("hx"))
      .filter(!(col("m_gt") >= col("y$") || col("m_ge") > col("y$")))
      .drop("hx", "m_gt", "m_ge", "x$", "y$")
  }

  /** q47: the document-curation skyline — maximize token count AND
    * distinct-token diversity (micro-units). The audit groups the
    * frontier per language with a count + id checksum + criteria ranges,
    * pinning the exact surviving row set against the oracle's O(n²)
    * NOT EXISTS form.
    */
  val skylineAudit: QueryDef = q(
    "q47_skyline",
    """WITH sc AS (
      |  SELECT doc_id, lang,
      |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
      |         CAST(len(list_distinct(string_split(text, ' '))) * 1000000
      |              // len(string_split(text, ' ')) AS BIGINT) AS uniq_micro
      |  FROM documents),
      |sky AS (
      |  SELECT * FROM sc a
      |  WHERE NOT EXISTS (
      |    SELECT 1 FROM sc b
      |    WHERE b.n_tok >= a.n_tok AND b.uniq_micro >= a.uniq_micro
      |      AND (b.n_tok > a.n_tok OR b.uniq_micro > a.uniq_micro)))
      |SELECT lang, count(*) AS n_sky, CAST(sum(doc_id) AS BIGINT) AS id_sum,
      |       min(n_tok) AS min_tok, max(n_tok) AS max_tok,
      |       min(uniq_micro) AS min_uniq, max(uniq_micro) AS max_uniq
      |FROM sky GROUP BY lang ORDER BY lang""".stripMargin) { (s, d) =>
    val sc = Tables.documents(s, d).select(col("doc_id"), col("lang"),
      expr("CAST(size(split(text, ' ')) AS BIGINT)").as("n_tok"),
      expr("""CAST(size(array_distinct(split(text, ' '))) * 1000000
             |     div size(split(text, ' ')) AS BIGINT)""".stripMargin)
        .as("uniq_micro"))
    skyline(sc, col("n_tok"), col("uniq_micro"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_sky"), sum(col("doc_id")).as("id_sum"),
        min(col("n_tok")).as("min_tok"), max(col("n_tok")).as("max_tok"),
        min(col("uniq_micro")).as("min_uniq"),
        max(col("uniq_micro")).as("max_uniq"))
      .orderBy("lang")
  }

  def defs: Seq[QueryDef] =
    Seq(scalarSubquery, exceptAll, firstLast, pivot, percentiles,
      unpivotMetrics, correlatedExists, lateralTopN, upsertLatest,
      scd2History, skylineAudit, intersectAllQ)
}
