package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import Compat._

/** The relational capability layer (SURVEY.md §2.11): joins, aggregations,
  * windows, sorts/top-k, set ops, grouping sets, scalar functions — the
  * categories the reference lacks, provided as thin declarative DataFrame
  * plans so Catalyst owns pushdown, join selection, and codegen.
  *
  * Scale notes per query are in each Scaladoc; the shared rules:
  *   - dimensions (region/nation/supplier, filtered customer slices) are
  *     broadcast — no shuffle of the fact table for dim joins;
  *   - fact-fact joins shuffle on their equi-keys once, and AQE handles
  *     skew/coalescing at runtime;
  *   - every aggregate is a hash aggregate with map-side partials;
  *   - outputs are explicitly ordered so results are deterministic.
  */
object Relational {

  private def q(name: String, oracle: String)(
      run: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, Some(oracle), run)

  /** Q1-style pricing summary: full lineitem scan → 6-way hash aggregate.
    * Scale: map-side partial agg reduces 100 TB of scan to a handful of
    * groups before the (tiny) shuffle; decimal sums keep it deterministic.
    */
  val pricingSummary: QueryDef = q(
    "q01_pricing_summary",
    s"""SELECT l_returnflag, l_linestatus,
       |  sum(l_quantity) AS sum_qty,
       |  ${sumDoubleSql(moneySql("l_extendedprice"))} AS sum_base_price,
       |  ${sumDoubleSql(discPriceSql("l_extendedprice", "l_discount"))} AS sum_disc_price,
       |  ${sumDoubleSql(chargeSql("l_extendedprice", "l_discount", "l_tax"))} AS sum_charge,
       |  sum(l_quantity) / count(*) AS avg_qty,
       |  CAST(sum(${moneySql("l_extendedprice")}) AS DOUBLE) / count(*) AS avg_price,
       |  count(*) AS count_order
       |FROM lineitem
       |WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= lit("2001-09-02 00:00:00"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        sum(money(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        sum(discPrice(col("l_extendedprice"), col("l_discount")))
          .cast("double").as("sum_disc_price"),
        sum(charge(col("l_extendedprice"), col("l_discount"), col("l_tax")))
          .cast("double").as("sum_charge"),
        (sum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
        (sum(money(col("l_extendedprice"))).cast("double") / count(lit(1)))
          .as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** Filter + projection scan: both the shipdate range predicate and the
    * 4-column projection must reach the parquet reader (PushedFilters /
    * ReadSchema) — at 100 TB this is the difference between reading 4
    * columns of one month and the whole table.
    */
  val filterProject: QueryDef = q(
    "q02_filter_project",
    """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      |  AND l_discount >= 0.05
      |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .filter(
        col("l_shipdate") >= lit("1996-01-01 00:00:00") &&
          col("l_shipdate") < lit("1996-04-01 00:00:00") &&
          col("l_discount") >= 0.05)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** Q3-style top-k revenue: fact-fact join on orderkey + broadcast of the
    * filtered customer slice; top-10 via TakeOrdered (no full sort at scale).
    */
  val topkOrders: QueryDef = q(
    "q03_topk_orders",
    s"""SELECT o_orderkey, o_orderpriority,
       |  CAST(sum(${discPriceSql("l_extendedprice", "l_discount")}) AS DOUBLE) AS revenue
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |WHERE c_mktsegment = 'BUILDING'
       |GROUP BY o_orderkey, o_orderpriority
       |ORDER BY revenue DESC, o_orderkey
       |LIMIT 10""".stripMargin) { (s, d) =>
    val cust = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_orderkey"), col("o_orderpriority"))
      .agg(sum(discPrice(col("l_extendedprice"), col("l_discount")))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)
  }

  /** EXISTS → left-semi join: the build side is the distinct filtered
    * lineitem keys; no row multiplication, no payload shuffle of orders
    * columns beyond the two needed.
    */
  val semiJoin: QueryDef = q(
    "q04_semi_join",
    """SELECT o_orderpriority, count(*) AS n_orders
      |FROM orders
      |WHERE EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_quantity >= 48)
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .join(
        Tables.lineitem(s, d).filter(col("l_quantity") >= 48)
          .select(col("l_orderkey")),
        col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderpriority"))
  }

  /** NOT EXISTS → left-anti join (customers with no open order). */
  val antiJoin: QueryDef = q(
    "q05_anti_join",
    """SELECT c_custkey, c_name
      |FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
      |ORDER BY c_custkey""".stripMargin) { (s, d) =>
    Tables.customer(s, d)
      .join(
        Tables.orders(s, d).filter(col("o_orderstatus") === "O")
          .select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  /** Q5-style 6-table join. region+nation+supplier are tiny → broadcast;
    * the only shuffles are the two fact joins (lineitem⋈orders on orderkey,
    * then ⋈customer on custkey). The c_nationkey = s_nationkey condition
    * localizes revenue to same-nation supplier/customer pairs.
    */
  val multiJoinRevenue: QueryDef = q(
    "q06_multijoin_revenue",
    s"""SELECT n_name,
       |  CAST(sum(${discPriceSql("l_extendedprice", "l_discount")}) AS DOUBLE) AS revenue
       |FROM lineitem
       |JOIN orders   ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
       |JOIN nation   ON s_nationkey = n_nationkey
       |JOIN region   ON n_regionkey = r_regionkey
       |GROUP BY n_name
       |ORDER BY revenue DESC, n_name""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.supplier(s, d)),
        col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(Tables.nation(s, d)),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(sum(discPrice(col("l_extendedprice"), col("l_discount")))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** Q6-style single-scan agg: predicates fully pushed, one-row result. */
  val scanAgg: QueryDef = q(
    "q07_scan_agg",
    """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
      |                * CAST(l_discount AS DECIMAL(3,2))) AS DOUBLE) AS revenue,
      |       count(*) AS n_rows
      |FROM lineitem
      |WHERE l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24""".stripMargin) {
    (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
          col("l_quantity") < 24)
        .agg(
          sum(money(col("l_extendedprice")) * rate(col("l_discount")))
            .cast("double").as("revenue"),
          count(lit(1)).as("n_rows"))
  }

  /** Ranking window: top-3 lineitems per supplier. Single shuffle on the
    * partition key; deterministic tiebreak on (orderkey, linenumber).
    */
  val windowTopk: QueryDef = q(
    "q08_window_topk",
    """SELECT l_suppkey, rn, l_orderkey, l_linenumber, l_extendedprice
      |FROM (SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
      |             row_number() OVER (PARTITION BY l_suppkey
      |               ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
      |      FROM lineitem)
      |WHERE rn <= 3
      |ORDER BY l_suppkey, rn""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
    Tables.lineitem(s, d)
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("l_suppkey", "rn", "l_orderkey", "l_linenumber", "l_extendedprice")
      .orderBy("l_suppkey", "rn")
  }

  /** UNION (distinct): customers active in open orders ∪ high-balance. */
  val setUnion: QueryDef = q(
    "q09_set_union",
    """SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
      |UNION
      |SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 9000
      |ORDER BY custkey""".stripMargin) { (s, d) =>
    Tables.orders(s, d).filter(col("o_orderstatus") === "O")
      .select(col("o_custkey").as("custkey"))
      .union(Tables.customer(s, d).filter(col("c_acctbal") > 9000)
        .select(col("c_custkey").as("custkey")))
      .distinct()
      .orderBy("custkey")
  }

  /** EXCEPT: customers with a finished order but no pending one. */
  val setExcept: QueryDef = q(
    "q10_set_except",
    """SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
      |EXCEPT
      |SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'P'
      |ORDER BY custkey""".stripMargin) { (s, d) =>
    val o = Tables.orders(s, d)
    o.filter(col("o_orderstatus") === "F").select(col("o_custkey").as("custkey"))
      .except(
        o.filter(col("o_orderstatus") === "P").select(col("o_custkey").as("custkey")))
      .orderBy("custkey")
  }

  /** INTERSECT: customers with both a finished and an open order. */
  val setIntersect: QueryDef = q(
    "q11_set_intersect",
    """SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
      |INTERSECT
      |SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
      |ORDER BY custkey""".stripMargin) { (s, d) =>
    val o = Tables.orders(s, d)
    o.filter(col("o_orderstatus") === "F").select(col("o_custkey").as("custkey"))
      .intersect(
        o.filter(col("o_orderstatus") === "O").select(col("o_custkey").as("custkey")))
      .orderBy("custkey")
  }

  /** ROLLUP over the region→nation customer hierarchy. GROUPING() flags are
    * cast to INT on both sides; NULLS FIRST pinned explicitly (engine
    * defaults differ).
    */
  val rollupAgg: QueryDef = q(
    "q12_rollup_agg",
    """SELECT r_name, n_name,
      |  CAST(GROUPING(r_name) AS INT) AS g_r,
      |  CAST(GROUPING(n_name) AS INT) AS g_n,
      |  count(*) AS n_cust,
      |  CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS sum_bal
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY ROLLUP(r_name, n_name)
      |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin) { (s, d) =>
    Tables.customer(s, d)
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(
        grouping(col("r_name")).cast("int").as("g_r"),
        grouping(col("n_name")).cast("int").as("g_n"),
        count(lit(1)).as("n_cust"),
        sum(money(col("c_acctbal"))).cast("double").as("sum_bal"))
      .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)
  }

  /** CUBE over (mktsegment, orderpriority). */
  val cubeAgg: QueryDef = q(
    "q13_cube_agg",
    """SELECT c_mktsegment, o_orderpriority,
      |  CAST(GROUPING(c_mktsegment) AS INT) AS g_seg,
      |  CAST(GROUPING(o_orderpriority) AS INT) AS g_pri,
      |  count(*) AS n_orders
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY CUBE(c_mktsegment, o_orderpriority)
      |ORDER BY c_mktsegment NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin) {
    (s, d) =>
      Tables.orders(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .cube(col("c_mktsegment"), col("o_orderpriority"))
        .agg(
          grouping(col("c_mktsegment")).cast("int").as("g_seg"),
          grouping(col("o_orderpriority")).cast("int").as("g_pri"),
          count(lit(1)).as("n_orders"))
        .orderBy(col("c_mktsegment").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first)
  }

  /** Scalar function library over part (string/math ops, codegen'd). */
  val scalarFuncs: QueryDef = q(
    "q14_scalar_functions",
    """SELECT p_partkey,
      |  upper(p_name) AS uname,
      |  substr(p_name, 1, 4) AS prefix,
      |  length(p_name) AS name_len,
      |  concat_ws('|', p_brand, p_type) AS brand_type,
      |  abs(p_retailprice - 1000.0) AS price_dev,
      |  p_size % 7 AS size_mod,
      |  CAST(floor(p_retailprice) AS BIGINT) AS price_floor
      |FROM part
      |ORDER BY p_partkey""".stripMargin) { (s, d) =>
    Tables.part(s, d).select(
      col("p_partkey"),
      upper(col("p_name")).as("uname"),
      substring(col("p_name"), 1, 4).as("prefix"),
      length(col("p_name")).as("name_len"),
      concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
      abs(col("p_retailprice") - 1000.0).as("price_dev"),
      (col("p_size") % 7).as("size_mod"),
      floor(col("p_retailprice")).cast("long").as("price_floor"))
      .orderBy("p_partkey")
  }

  /** Date-part aggregation over orders (year/month extraction). */
  val dateAgg: QueryDef = q(
    "q15_date_agg",
    """SELECT CAST(date_part('year', o_orderdate) AS INT) AS yr,
      |       CAST(date_part('month', o_orderdate) AS INT) AS mo,
      |       count(*) AS n_orders,
      |       CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
      |FROM orders
      |GROUP BY 1, 2
      |ORDER BY yr, mo""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .groupBy(year(col("o_orderdate")).as("yr"), month(col("o_orderdate")).as("mo"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(money(col("o_totalprice"))).cast("double").as("sum_price"))
      .orderBy("yr", "mo")
  }

  /** Point lookup by key — partition-prunable at scale (row-group min/max
    * skipping on l_orderkey; with bucketing it's a single-task read).
    */
  val pointLookup: QueryDef = q(
    "q16_point_lookup",
    """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity,
      |       l_extendedprice, l_returnflag
      |FROM lineitem WHERE l_orderkey = 1000
      |ORDER BY l_linenumber""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .filter(col("l_orderkey") === 1000)
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
        "l_quantity", "l_extendedprice", "l_returnflag")
      .orderBy("l_linenumber")
  }

  /** COUNT(DISTINCT) — expand+two-phase agg under the hood. */
  val distinctAgg: QueryDef = q(
    "q17_distinct_agg",
    """SELECT l_returnflag,
      |  count(DISTINCT l_partkey) AS n_parts,
      |  count(DISTINCT l_suppkey) AS n_supps,
      |  count(*) AS n_rows
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag")
  }

  /** Q14-style conditional aggregation: promo revenue share. The part dim
    * is broadcast; the CASE folds into the map-side partial aggregate.
    */
  val caseAgg: QueryDef = q(
    "q18_case_agg",
    s"""SELECT 100.0 * CAST(sum(CASE WHEN p_type = 'PROMO'
       |         THEN ${discPriceSql("l_extendedprice", "l_discount")}
       |         ELSE CAST(0 AS DECIMAL(16,4)) END) AS DOUBLE)
       |       / CAST(sum(${discPriceSql("l_extendedprice", "l_discount")}) AS DOUBLE)
       |       AS promo_share,
       |       count(*) AS n_rows
       |FROM lineitem JOIN part ON l_partkey = p_partkey""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.types.DecimalType
    val dp = discPrice(col("l_extendedprice"), col("l_discount"))
    Tables.lineitem(s, d)
      .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
      .agg(
        (lit(100.0) *
          sum(when(col("p_type") === "PROMO", dp)
            .otherwise(lit(0).cast(DecimalType(16, 4)))).cast("double") /
          sum(dp).cast("double")).as("promo_share"),
        count(lit(1)).as("n_rows"))
  }

  /** Global sort + limit with deterministic tiebreak (top-N heap at scale,
    * not a full sort: Spark plans TakeOrderedAndProject).
    */
  val sortLimit: QueryDef = q(
    "q19_sort_limit",
    """SELECT o_orderkey, o_custkey, o_totalprice
      |FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey
      |LIMIT 25""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(25)
  }

  /** Theta/range join on numeric bands: parts joined to similarly-priced
    * parts one size up (banded to keep it selective — the band predicate is
    * the range-join pattern AQE/broadcast handles).
    */
  val rangeJoinParts: QueryDef = q(
    "q20_range_join",
    """SELECT a.p_partkey AS pk_a, b.p_partkey AS pk_b,
      |       a.p_retailprice AS price_a, b.p_retailprice AS price_b
      |FROM part a JOIN part b
      |  ON b.p_size = a.p_size + 1
      | AND b.p_retailprice > a.p_retailprice
      | AND b.p_retailprice <= a.p_retailprice + 10.0
      |ORDER BY pk_a, pk_b""".stripMargin) { (s, d) =>
    val p = Tables.part(s, d)
    // Band decomposition: the bare equi-key (p_size, ~50 values) makes
    // the hash join sizewise-QUADRATIC — every same-size part pair is
    // probed before the price predicate runs (measured 302 s at sf1 on
    // 200k parts, 800M probed pairs). Adding an integer-cent price band
    // of exactly the predicate's width to the key bounds each bucket to
    // one (size, 10-unit-band) cell: candidate pairs become
    // output-proportional. The a side fans out to the two bands that can
    // contain (price_a, price_a + 10]; each b row lives in exactly one
    // band, so no pair is produced twice, and the original exact double
    // predicate still decides membership. Bands come from DECIMAL cents
    // (exact, same cast both sides) — never from double division.
    val withBand = p.select(col("p_partkey"), col("p_size"),
      col("p_retailprice"),
      (money(col("p_retailprice")) * lit(100)).cast("long").as("cents"))
    val a = withBand.select(col("p_partkey").as("pk_a"),
      col("p_size").as("size_a"), col("p_retailprice").as("price_a"),
      expr("cents div 1000").as("band_a"))
      .withColumn("boff", explode(array(lit(0L), lit(1L))))
    val b = withBand.select(col("p_partkey").as("pk_b"),
      col("p_size").as("size_b"), col("p_retailprice").as("price_b"),
      expr("cents div 1000").as("band_b"))
    a.join(b,
      col("size_b") === col("size_a") + 1 &&
        col("band_b") === col("band_a") + col("boff") &&
        col("price_b") > col("price_a") &&
        col("price_b") <= col("price_a") + 10.0)
      .select("pk_a", "pk_b", "price_a", "price_b")
      .orderBy("pk_a", "pk_b")
  }

  def defs: Seq[QueryDef] = Seq(
    pricingSummary, filterProject, topkOrders, semiJoin, antiJoin,
    multiJoinRevenue, scanAgg, windowTopk, setUnion, setExcept, setIntersect,
    rollupAgg, cubeAgg, scalarFuncs, dateAgg, pointLookup, distinctAgg,
    caseAgg, sortLimit, rangeJoinParts)
}
