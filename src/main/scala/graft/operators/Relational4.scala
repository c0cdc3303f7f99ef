package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import Compat._

/** Fourth relational batch: deterministic mode, a one-pass correlation
  * matrix from exact moments, and partitioned ntile quartile profiles.
  */
object Relational4 {

  private def q(name: String, oracle: String)(
      run: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, Some(oracle), run)

  /** q52: per-group mode with a deterministic tie-break (highest count,
    * then smallest value) — DuckDB's native `mode()` leaves ties
    * unspecified, so both sides state the tie-break explicitly via a
    * count-then-rank plan. Two shuffles, both on small key spaces; the
    * candidate set after the first aggregate is |flags × distinct qty|,
    * tiny at any scale.
    */
  val modeAgg: QueryDef = q(
    "q52_mode_agg",
    """WITH c AS (
      |  SELECT l_returnflag AS flag, l_quantity AS qty, count(*) AS n
      |  FROM lineitem GROUP BY 1, 2),
      |r AS (
      |  SELECT flag, qty, n,
      |    row_number() OVER (PARTITION BY flag ORDER BY n DESC, qty) AS rn
      |  FROM c)
      |SELECT flag, qty AS mode_qty, n AS n_occurrences
      |FROM r WHERE rn = 1
      |ORDER BY flag""".stripMargin) { (s, d) =>
    val c = Tables.lineitem(s, d)
      .groupBy(col("l_returnflag").as("flag"), col("l_quantity").as("qty"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("flag").orderBy(col("n").desc, col("qty"))
    c.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("flag"), col("qty").as("mode_qty"), col("n").as("n_occurrences"))
      .orderBy("flag")
  }

  private val corrCols = Seq(
    "l_quantity" -> "q", "l_extendedprice" -> "p",
    "l_discount" -> "d", "l_tax" -> "t")
  private val corrPairs = Seq(
    ("l_discount", "d", "l_extendedprice", "p"),
    ("l_discount", "d", "l_quantity", "q"),
    ("l_discount", "d", "l_tax", "t"),
    ("l_extendedprice", "p", "l_quantity", "q"),
    ("l_extendedprice", "p", "l_tax", "t"),
    ("l_quantity", "q", "l_tax", "t"))

  /** q53: pairwise Pearson correlation matrix over the four lineitem
    * measures, computed from EXACT decimal moments in ONE scan.
    *
    * Built-in `corr()` is a streaming float aggregate whose result is
    * merge-order-dependent — unusable for a retry-safe 100 TB pipeline
    * and un-hashable against another engine. Instead: a single aggregate
    * collects n + 4 sums + 4 sum-of-squares + 6 cross-sums as exact
    * decimals (map-side partial, one shuffle of a 15-column row), each is
    * collapsed to double once (correctly rounded on both engines), and
    * every correlation is one shared double expression. The 6 output rows
    * come from `stack` over the single aggregate row — no re-scan per
    * pair.
    */
  val corrMatrix: QueryDef = {
    def m(c: String) = s"CAST($c AS DECIMAL(12,2))"
    val sumsSql = (corrCols.map { case (c, a) =>
      s"CAST(CAST(sum(${m(c)}) AS VARCHAR) AS DOUBLE) AS s_$a, " +
        s"CAST(CAST(sum(${m(c)} * ${m(c)}) AS VARCHAR) AS DOUBLE) AS s_$a$a"
    } ++ corrPairs.map { case (ca, a, cb, b) =>
      s"CAST(CAST(sum(${m(ca)} * ${m(cb)}) AS VARCHAR) AS DOUBLE) AS s_$a$b"
    }).mkString(",\n    ")
    def corrSql(a: String, b: String) =
      s"(n * s_$a$b - s_$a * s_$b) / sqrt((n * s_$a$a - s_$a * s_$a) * (n * s_$b$b - s_$b * s_$b))"
    val rowsSql = corrPairs.map { case (ca, a, cb, b) =>
      s"SELECT '$ca' AS col_a, '$cb' AS col_b, ${corrSql(a, b)} AS corr FROM s"
    }.mkString("\nUNION ALL\n")
    q(
      "q53_corr_matrix",
      s"""WITH s AS (
         |  SELECT count(*) AS n,
         |    $sumsSql
         |  FROM lineitem)
         |$rowsSql
         |ORDER BY col_a, col_b""".stripMargin) { (s, d) =>
      // the 15 exact-decimal product sums are CPU-dense per row (the
      // DECIMAL(25,4) products leave the long-backed fast path), and the
      // partial aggregate runs inside the scan stage — on a store whose
      // row groups under-split the scan (the r16 profiler read this
      // query at parallelism 1.0) that serializes the whole pass. The
      // scan-parallelism guard round-robins the 4 projected columns only
      // when the scan is under-split; at a healthy layout it is an
      // identity (same contract as the dedup lanes' scans).
      val li = Tables.parallel(Tables.lineitem(s, d)
        .select(corrCols.map(c => col(c._1)): _*))
      val aggs = count(lit(1)).as("n") +:
        (corrCols.flatMap { case (c, a) =>
          Seq(sum(money(col(c))).cast("double").as(s"s_$a"),
            sum(money(col(c)) * money(col(c))).cast("double").as(s"s_$a$a"))
        } ++ corrPairs.map { case (ca, a, cb, b) =>
          sum(money(col(ca)) * money(col(cb))).cast("double").as(s"s_$a$b")
        })
      val one = li.agg(aggs.head, aggs.tail: _*)
      def corrCol(a: String, b: String) =
        (col("n") * col(s"s_$a$b") - col(s"s_$a") * col(s"s_$b")) /
          sqrt((col("n") * col(s"s_$a$a") - col(s"s_$a") * col(s"s_$a")) *
            (col("n") * col(s"s_$b$b") - col(s"s_$b") * col(s"s_$b")))
      val stackArgs = corrPairs.map { case (ca, a, cb, b) =>
        s"'$ca', '$cb', c_$a$b"
      }.mkString(", ")
      one.select(corrPairs.map { case (_, a, _, b) =>
        corrCol(a, b).as(s"c_$a$b")
      }: _*)
        .select(expr(
          s"stack(${corrPairs.size}, $stackArgs) AS (col_a, col_b, corr)"))
        .orderBy("col_a", "col_b")
    }
  }

  /** q54: partitioned ntile quartiles — per order priority, rank orders
    * into 4 equal-depth tiles (deterministic tie-break on the key) and
    * profile each tile. The window partitions by priority, so the sort is
    * distributed across partitions rather than the single-partition
    * global-ntile shape; the profile aggregate reuses the same
    * partitioning (no extra shuffle of the big side).
    */
  val ntileQuartiles: QueryDef = q(
    "q54_ntile_quartiles",
    """WITH t AS (
      |  SELECT o_orderpriority AS pri, o_totalprice, o_orderkey,
      |    ntile(4) OVER (PARTITION BY o_orderpriority
      |                   ORDER BY o_totalprice, o_orderkey) AS qtile
      |  FROM orders)
      |SELECT pri, qtile, count(*) AS n,
      |  CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sum_price,
      |  min(o_totalprice) AS min_price, max(o_totalprice) AS max_price
      |FROM t GROUP BY 1, 2
      |ORDER BY pri, qtile""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("pri").orderBy(col("o_totalprice"), col("o_orderkey"))
    Tables.orders(s, d)
      .select(col("o_orderpriority").as("pri"), col("o_totalprice"), col("o_orderkey"))
      .withColumn("qtile", ntile(4).over(w))
      .groupBy("pri", "qtile")
      .agg(count(lit(1)).as("n"),
        sum(money(col("o_totalprice"))).cast("double").as("sum_price"),
        min(col("o_totalprice")).as("min_price"),
        max(col("o_totalprice")).as("max_price"))
      .orderBy("pri", "qtile")
  }

  private val profNumeric = Seq(
    "l_discount" -> "d", "l_extendedprice" -> "p",
    "l_quantity" -> "qt", "l_tax" -> "t")
  private val profString = Seq(
    "l_linestatus" -> "ls", "l_returnflag" -> "rf")

  /** q56: ANALYZE-style column profile — per column: row count, null
    * count, EXACT distinct count, min/max (numerics normalized through
    * DECIMAL(12,2) so both engines print identical strings), and the
    * exact decimal sum for numerics.
    *
    * One aggregate pass; the multi-column exact distincts expand the scan
    * (Spark's Expand operator — one replica per distinct spec), which is
    * the deliberate exact-profile contract: at 100 TB swap the
    * `countDistinct` columns for `approx_count_distinct` and the plan
    * collapses back to one non-expanded pass (the q30 HLL pattern). The
    * 6 output rows come from `stack` over the single aggregate row.
    */
  val columnProfile: QueryDef = {
    def m(c: String) = s"CAST($c AS DECIMAL(12,2))"
    val numSql = profNumeric.map { case (c, a) =>
      s"""count($c) AS c_$a, count(DISTINCT $c) AS d_$a,
         |      CAST(min(${m(c)}) AS VARCHAR) AS mn_$a,
         |      CAST(max(${m(c)}) AS VARCHAR) AS mx_$a,
         |      ${Compat.sumDoubleSql(m(c))} AS s_$a""".stripMargin
    }
    val strSql = profString.map { case (c, a) =>
      s"""count($c) AS c_$a, count(DISTINCT $c) AS d_$a,
         |      min($c) AS mn_$a, max($c) AS mx_$a""".stripMargin
    }
    val rows = (profNumeric.map { case (c, a) =>
      s"SELECT '$c' AS col_name, n AS n_rows, n - c_$a AS n_nulls, d_$a AS n_distinct, mn_$a AS min_val, mx_$a AS max_val, s_$a AS sum_val FROM s"
    } ++ profString.map { case (c, a) =>
      s"SELECT '$c', n, n - c_$a, d_$a, mn_$a, mx_$a, CAST(NULL AS DOUBLE) FROM s"
    }).mkString("\nUNION ALL\n")
    q(
      "q56_column_profile",
      s"""WITH s AS (
         |  SELECT count(*) AS n,
         |    ${(numSql ++ strSql).mkString(",\n    ")}
         |  FROM lineitem)
         |$rows
         |ORDER BY col_name""".stripMargin) { (s, d) =>
      // r17 A/B note: routing this through the q53 projection+guard
      // pattern was measured 2× SLOWER (0.97 → 2.0-2.2 s at sf0.1) — the
      // round-robin exchange is NOT reused across the 8 independent
      // aggregate subtrees (each is its own AQE stage tree below a
      // broadcast join), so the guard multiplied the shuffle instead of
      // sharing it. The 8 scan-fused single-task partial aggs run
      // CONCURRENTLY (independent stages of one job), which is why the
      // unguarded shape wins despite the one-row-group store. Left as-is,
      // measured, documented.
      val li = Tables.lineitem(s, d)
      // Plan shape (two revisions, both in BASELINE.md):
      //   1. ALL distincts in one aggregate → Spark's multi-distinct
      //      rewrite Expands the scan 7× into a dedup aggregate keyed on
      //      (gid + every profiled column) — 4.2 M wide rows through one
      //      keyed exchange, 4.5-4.8 s at sf0.1.
      //   2. Now: each EXACT distinct runs as its own SINGLE-distinct
      //      aggregate (no Expand — partial agg keyed on the value, one
      //      narrow exchange each, all six independent and parallel) and
      //      the seven 1-row results broadcast-join back. On a columnar
      //      store the six extra scans each read ONE column, so total
      //      bytes ≈ the one wide scan; 4.8 s -> ~1 s at sf0.1.
      // String min/max stay in their own keyless pass: a string-buffered
      // function in the numeric pass forces SortAggregate (r9 finding).
      val plainAggs = count(lit(1)).as("n") +:
        (profNumeric.flatMap { case (c, a) =>
          Seq(count(col(c)).as(s"c_$a"),
            min(money(col(c))).cast("string").as(s"mn_$a"),
            max(money(col(c))).cast("string").as(s"mx_$a"),
            sum(money(col(c))).cast("double").as(s"s_$a"))
        } ++ profString.map { case (c, a) => count(col(c)).as(s"c_$a") })
      val strAggs = profString.flatMap { case (c, a) =>
        Seq(min(col(c)).as(s"mn_$a"), max(col(c)).as(s"mx_$a"))
      }
      val one = (profNumeric ++ profString).foldLeft(
        li.agg(plainAggs.head, plainAggs.tail: _*)
          .join(broadcast(li.agg(strAggs.head, strAggs.tail: _*)))) {
        case (acc, (c, a)) =>
          acc.join(broadcast(li.agg(countDistinct(col(c)).as(s"d_$a"))))
      }
      val stackArgs = (profNumeric.map { case (c, a) =>
        s"'$c', n, n - c_$a, d_$a, mn_$a, mx_$a, s_$a"
      } ++ profString.map { case (c, a) =>
        s"'$c', n, n - c_$a, d_$a, mn_$a, mx_$a, CAST(NULL AS DOUBLE)"
      }).mkString(", ")
      one.select(expr(s"stack(${profNumeric.size + profString.size}, " +
          s"$stackArgs) AS (col_name, n_rows, n_nulls, n_distinct, " +
          "min_val, max_val, sum_val)"))
        .orderBy("col_name")
    }
  }

  /** q58: relative-standing analytics — percent_rank and cume_dist per
    * priority partition (the remaining ANSI window rank family beyond
    * q08/q31/q54). Both are exact integer ratios evaluated in one double
    * division, so cross-engine parity is bit-exact; the `% 100` sample
    * keeps the dumped result proportionate while every row still rides
    * the full-partition window.
    */
  val relativeStanding: QueryDef = q(
    "q58_percent_rank",
    """SELECT o_orderpriority AS pri, o_orderkey,
      |  percent_rank() OVER w AS pct_rank,
      |  cume_dist() OVER w AS cume
      |FROM orders
      |WINDOW w AS (PARTITION BY o_orderpriority
      |             ORDER BY o_totalprice, o_orderkey)
      |QUALIFY o_orderkey % 100 = 0
      |ORDER BY pri, o_orderkey""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    Tables.orders(s, d)
      .select(col("o_orderpriority").as("pri"), col("o_orderkey"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume"))
      .filter(col("o_orderkey") % 100 === 0)
      .orderBy("pri", "o_orderkey")
  }

  /** q60: ordered string aggregation (LISTAGG) — per priority, the top-5
    * order keys by price concatenated IN RANK ORDER plus their exact
    * price sum. `collect_list` has no deterministic order, so the rank
    * rides inside the collected struct and `array_sort` imposes the
    * order before joining — the general recipe for deterministic list
    * aggregation on Spark. The top-5 pre-trim keeps per-group list state
    * bounded (WindowGroupLimit), which is what makes LISTAGG safe at
    * scale: never aggregate an unbounded group into a string.
    */
  val stringAgg: QueryDef = q(
    "q60_string_agg",
    """WITH top5 AS (
      |  SELECT o_orderpriority AS pri, o_orderkey, o_totalprice,
      |    row_number() OVER (PARTITION BY o_orderpriority
      |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders QUALIFY rn <= 5)
      |SELECT pri,
      |  string_agg(CAST(o_orderkey AS VARCHAR), ',' ORDER BY rn) AS top_keys,
      |  CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS top_sum
      |FROM top5 GROUP BY pri
      |ORDER BY pri""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("pri")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, d)
      .select(col("o_orderpriority").as("pri"), col("o_orderkey"),
        col("o_totalprice"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .groupBy("pri")
      .agg(
        expr("array_join(transform(array_sort(collect_list(struct(rn, o_orderkey))), " +
          "x -> CAST(x.o_orderkey AS STRING)), ',')").as("top_keys"),
        sum(money(col("o_totalprice"))).cast("double").as("top_sum"))
      .orderBy("pri")
  }

  /** q62: approximate-quantile SELF-GATE (the q30 HLL pattern applied to
    * quantile sketches): exact p25/p50/p75 of the integer quantity per
    * flag — interpolation over small ints is exact in double on any
    * engine — plus a boolean that EACH ENGINE'S OWN sketch
    * (approx_percentile / approx_quantile; different algorithms, never
    * compared to each other) landed within ±2.5 units of its own exact
    * value. Makes the sketch row fully hash-checkable without demanding
    * cross-engine sketch equality, and states the production contract:
    * an approximate quantile is only usable WITH a known error bound.
    */
  val approxQuantiles: QueryDef = q(
    "q62_approx_quantiles",
    """SELECT l_returnflag, count(*) AS n_rows,
      |  quantile_cont(l_quantity, 0.25) AS p25,
      |  quantile_cont(l_quantity, 0.5) AS p50,
      |  quantile_cont(l_quantity, 0.75) AS p75,
      |  abs(approx_quantile(l_quantity, 0.25)
      |      - quantile_cont(l_quantity, 0.25)) <= 2.5
      |  AND abs(approx_quantile(l_quantity, 0.5)
      |      - quantile_cont(l_quantity, 0.5)) <= 2.5
      |  AND abs(approx_quantile(l_quantity, 0.75)
      |      - quantile_cont(l_quantity, 0.75)) <= 2.5 AS approx_ok
      |FROM lineitem GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin) { (s, d) =>
    def ok(p: Double): Column =
      abs(expr(s"approx_percentile(l_quantity, $p)") -
        expr(s"percentile(l_quantity, $p)")) <= 2.5
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_rows"),
        expr("percentile(l_quantity, 0.25)").as("p25"),
        expr("percentile(l_quantity, 0.5)").as("p50"),
        expr("percentile(l_quantity, 0.75)").as("p75"),
        (ok(0.25) && ok(0.5) && ok(0.75)).as("approx_ok"))
      .orderBy("l_returnflag")
  }

  /** q63: the APPROXIMATE column profile — q56's documented 100 TB swap
    * made real under the gate. Exact multi-distinct profiling pays one
    * Expand pass whose cost grows with column count; at warehouse scale
    * ANALYZE runs `approx_count_distinct` (HLL — one pass, mergeable,
    * O(1) state per column) instead. Sketches differ across engines, so
    * the q30/q62 SELF-GATE discipline applies: each engine audits ITS
    * OWN sketch against its own exact count within a stated 6% bound
    * (engine rsd 0.02 ⇒ ±3σ ≈ 6%), and only the exact counts + the
    * audit verdicts are compared across engines.
    */
  val profileApprox: QueryDef = {
    val cols = profNumeric ++ profString
    val oracleAggs = cols.map { case (c, a) =>
      s"count(DISTINCT $c) AS d_$a, approx_count_distinct($c) AS ad_$a"
    }.mkString(",\n    ")
    val oracleRows = cols.map { case (c, a) =>
      s"SELECT '$c' AS col_name, d_$a AS n_distinct, " +
        s"abs(ad_$a - d_$a) <= 0.06 * d_$a AS approx_ok FROM s"
    }.mkString("\nUNION ALL\n")
    q(
      "q63_profile_approx",
      s"""WITH s AS (
         |  SELECT
         |    $oracleAggs
         |  FROM lineitem)
         |$oracleRows
         |ORDER BY col_name""".stripMargin) { (s, d) =>
      val li = Tables.lineitem(s, d)
      val aggs = cols.flatMap { case (c, a) =>
        Seq(countDistinct(col(c)).as(s"d_$a"),
          approx_count_distinct(col(c), 0.02).as(s"ad_$a"))
      }
      val one = li.agg(aggs.head, aggs.tail: _*)
      cols.map { case (c, a) =>
        one.select(lit(c).as("col_name"),
          col(s"d_$a").as("n_distinct"),
          (abs(col(s"ad_$a") - col(s"d_$a")) <=
            lit(0.06) * col(s"d_$a")).as("approx_ok"))
      }.reduce(_.unionAll(_)).orderBy("col_name")
    }
  }

  def defs: Seq[QueryDef] =
    Seq(modeAgg, corrMatrix, ntileQuartiles, columnProfile, relativeStanding,
      stringAgg, approxQuantiles, profileApprox)
}
