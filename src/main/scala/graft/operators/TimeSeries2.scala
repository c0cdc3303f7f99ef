package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Second time-series batch: exponentially-weighted smoothing, sliding
  * distinct-user reach, and fixed-range value histograms.
  *
  * Reference scope note: heparchy has no time axis (its event index is a
  * Monte-Carlo sample counter, `read/hdf.py:447-466`); these are
  * north-star analytics operators, expressed Spark-first.
  *
  * Determinism discipline (the [[Compat]] contract): every aggregate that
  * feeds a DOUBLE output is computed in exact integer/decimal arithmetic
  * and converted to DOUBLE exactly once, by the same expression shape on
  * both engines — window sums of doubles are order-dependent and would
  * hash-mismatch.
  */
object TimeSeries2 {

  private def q(name: String, oracle: String)(
      run: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, Some(oracle), run)

  private val HourNs = 3600000000000L

  /** Self-gate margin for the HLL queries (q68/q70): 4 standard errors
    * of the engine's CONFIGURED sketch, not an arbitrary shared constant.
    * DataSketches HLL at the default lgConfigK = 12 has
    * rsd = 1.04/√2¹² ≈ 1.63%, so 4σ ≈ 6.5% — a gate that cannot flip
    * on adversarial key sets short of a sketch bug. The oracle gates its
    * own (tighter-rsd ≈ 0.4%) sketch at its documented 5% margin (≥12σ
    * there); each engine judges its own sketch and only the boolean
    * verdict is compared, so the margins may differ without breaking
    * the hash gate.
    */
  private val HllMargin4Sigma: Double = 4.0 * 1.04 / math.sqrt((1 << 12).toDouble)

  /** q64: per-user EWMA (α = 1/2) of event value over the trailing
    * 8-event frame, exact to the last bit.
    *
    * Standard EWMA is a recursive fold — not frame-expressible — but with
    * α = 1/2 the trailing-L truncation has integer dyadic weights:
    * ŷ_t = Σ_{i<n} 2^(L-1-i)·c_{t-i} / (2^L − 2^(L-n)), where c is the
    * value in exact integer cents, n ≤ L = 8 is how many events the frame
    * actually holds, and the weight sum telescopes to 2^L − 2^(L-n). Both
    * numerator and denominator are exact BIGINTs (8 explicit LAGs, not a
    * frame sum, so no double accumulation order exists at all); the ONE
    * double division is the output. Truncation error vs the infinite
    * recursion is ≤ 2^-8 of the oldest weight — the standard practical
    * EWMA at a fixed horizon.
    *
    * Scale shape: one window, partitioned by `user_id`, ordered by
    * (ts, event_id) — per-user sort inside a keyed shuffle, no global
    * order anywhere. The 8 LAG columns ride the SAME window frame (one
    * WindowExec, plan-asserted), so cost is one sort + O(L) longs per
    * row regardless of history length. The `user_id % 50` filter bounds
    * the dumped result; the operator is cardinality-agnostic.
    */
  val ewma: QueryDef = q(
    "q64_ewma",
    """WITH e AS (
      |  SELECT user_id, event_id, epoch_ns(ts) AS t,
      |         CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS c
      |  FROM events WHERE user_id % 50 = 0),
      |l AS (
      |  SELECT user_id, event_id, t, c,
      |    lag(c, 1) OVER w AS c1,
      |    lag(c, 2) OVER w AS c2,
      |    lag(c, 3) OVER w AS c3,
      |    lag(c, 4) OVER w AS c4,
      |    lag(c, 5) OVER w AS c5,
      |    lag(c, 6) OVER w AS c6,
      |    lag(c, 7) OVER w AS c7
      |  FROM e
      |  WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)),
      |s AS (
      |  SELECT user_id, event_id, t,
      |    128 * c + 64 * coalesce(c1, 0) + 32 * coalesce(c2, 0)
      |      + 16 * coalesce(c3, 0) + 8 * coalesce(c4, 0)
      |      + 4 * coalesce(c5, 0) + 2 * coalesce(c6, 0)
      |      + 1 * coalesce(c7, 0) AS num,
      |    1 + CASE WHEN c1 IS NULL THEN 0 ELSE 1 END
      |      + CASE WHEN c2 IS NULL THEN 0 ELSE 1 END
      |      + CASE WHEN c3 IS NULL THEN 0 ELSE 1 END
      |      + CASE WHEN c4 IS NULL THEN 0 ELSE 1 END
      |      + CASE WHEN c5 IS NULL THEN 0 ELSE 1 END
      |      + CASE WHEN c6 IS NULL THEN 0 ELSE 1 END
      |      + CASE WHEN c7 IS NULL THEN 0 ELSE 1 END AS n
      |  FROM l)
      |SELECT user_id, event_id, t,
      |  CAST(num AS DOUBLE)
      |    / CAST((256 - (256 >> n)) AS DOUBLE) / 100 AS ewma
      |FROM s
      |ORDER BY user_id, event_id""".stripMargin) { (s, d) =>
    // a NULL value would silently skew the positional weights (the lag
    // slots stay positional while n shrinks) — fail loudly instead; the
    // events contract has no null values, this guard enforces it
    val cents = when(col("value").isNull,
      raise_error(lit("q64/q67: NULL event value breaks the lag frame")))
      .otherwise((col("value").cast("decimal(12,2)") * 100).cast("long"))
    val e = Tables.events(s, d)
      .filter(col("user_id") % 50 === 0)
      .select(col("user_id"), col("event_id"), col("ts").as("t"),
        cents.as("c"))
    val w = Window.partitionBy("user_id").orderBy("t", "event_id")
    val lags = (1 to 7).map(i => lag(col("c"), i).over(w).as(s"c$i"))
    val l = e.select(
      (Seq(col("user_id"), col("event_id"), col("t"), col("c")) ++ lags): _*)
    val num = (0 to 7).map { i =>
      val c = if (i == 0) col("c") else col(s"c$i")
      lit(1L << (7 - i)) * coalesce(c, lit(0L))
    }.reduce(_ + _)
    val n = (1 to 7).map(i =>
      when(col(s"c$i").isNull, 0).otherwise(1)).reduce(_ + _) + lit(1)
    // weight sum for a partial frame of n rows: 2^8 − 2^(8−n)
    val denom = lit(256L) - expr("shiftright(256L, nn)")
    l.withColumn("nn", n)
      .select(col("user_id"), col("event_id"), col("t"),
        (num.cast("double") / denom.cast("double") / lit(100)).as("ewma"))
      .orderBy("user_id", "event_id")
  }

  /** q65: trailing-24-hour distinct-user reach per hour (sliding
    * COUNT(DISTINCT) — the metric behind every DAU-style dashboard).
    *
    * A sliding distinct is not frame-expressible (distinct does not
    * decompose over frame boundaries). The scalable identity: user u is
    * live in hour h's trailing window iff u was active in some hour in
    * [h−23, h] — so project each DISTINCT (user, active-hour) pair onto
    * the ≤ 24 window-ends it serves and count distinct per end. The
    * intermediate is |distinct (user, hour)| × 24, NOT events × 24:
    * the dedup happens BEFORE the expansion, so a user firing 10⁶ events
    * in an hour contributes exactly 24 rows. The final distinct-count is
    * a two-level aggregate (partial maps combine (h, u) pairs before the
    * exchange).
    *
    * Scale shape: one distinct-aggregate shuffle on (user, hour), a
    * scan-fused `explode(sequence(...))`, one counting shuffle on hour.
    * Output is one row per hour inside the observed span (the span gate
    * is a 1-row broadcast bound, q43's pattern).
    */
  val slidingDistinct: QueryDef = q(
    "q65_sliding_distinct",
    """WITH uh AS (
      |  SELECT DISTINCT user_id, epoch_ns(ts) // 3600000000000 AS h
      |  FROM events),
      |b AS (SELECT max(h) AS hmax FROM uh),
      |proj AS (
      |  SELECT user_id, unnest(generate_series(h, h + 23)) AS h2
      |  FROM uh)
      |SELECT p.h2 AS hour_id, count(DISTINCT p.user_id) AS reach_24h
      |FROM proj p, b
      |WHERE p.h2 <= b.hmax
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    val uh = Tables.events(s, d)
      .select(col("user_id"), expr(s"ts div $HourNs").as("h"))
      .distinct()
    val bounds = uh.agg(max(col("h")).as("hmax"))
    val proj = uh
      .select(col("user_id"),
        explode(sequence(col("h"), col("h") + 23)).as("h2"))
    proj.join(broadcast(bounds), proj("h2") <= bounds("hmax"))
      .groupBy(col("h2").as("hour_id"))
      .agg(countDistinct(col("user_id")).as("reach_24h"))
      .orderBy("hour_id")
  }

  /** q66: fixed-range equi-width value histogram per event type — 20
    * buckets of width 25 over [0, 500), out-of-range clamped to the edge
    * buckets (the closed-form histogram for monitoring dashboards; the
    * data-adaptive profile lives in q56/q63).
    *
    * Bucketing is exact decimal floor-division (no double comparisons at
    * bucket edges — `v / 25` in binary floating point misbuckets values
    * like 174.99999…, decimal arithmetic cannot). Empty buckets are
    * genuinely absent (sparse contract, stated by both sides).
    *
    * Scale shape: ONE scan, map-side partial aggregate into ≤
    * |types| × 20 cells, one exchange of those cells. This is the
    * smallest possible plan for a histogram; at 100 TB the reduce side
    * moves kilobytes.
    */
  val histogram: QueryDef = q(
    "q66_histogram",
    """SELECT event_type,
      |  least(greatest(
      |    CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) // 2500,
      |    0), 19) AS bucket,
      |  count(*) AS n,
      |  CAST(CAST(sum(CAST(value AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE)
      |    AS sum_value
      |FROM events
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
    val v = Compat.money(col("value"))
    // exact integer-cents bucketing: DuckDB's `//` on DECIMAL is plain
    // division (the BIGINT cast then ROUNDS), so both sides divide
    // integer CENTS with integer `div`
    val bucket = least(greatest(
      expr("CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) div 2500"),
      lit(0L)), lit(19L))
    Tables.events(s, d)
      .groupBy(col("event_type"), bucket.as("bucket"))
      .agg(count(lit(1)).as("n"),
        sum(v).cast("double").as("sum_value"))
      .orderBy("event_type", "bucket")
  }

  /** q67: EXACT rolling median of event value over the trailing 5-event
    * frame per user — the robust de-noiser EWMA (q64) is not: one
    * glitched reading moves an average but not a median.
    *
    * A windowed median does not decompose over frame boundaries, but a
    * CONSTANT frame does: materialize the ≤ 5 frame members as explicit
    * LAGs (same one-window-pass discipline as q64), drop the nulls of a
    * partial frame, sort the ≤ 5-element array IN-ROW, and index the
    * middle. All arithmetic is exact integer cents until the single
    * shared double expression at the end (even-frame medians average two
    * cents values in one division).
    *
    * Scale shape: identical to q64 — one keyed window pass, O(L log L)
    * per-row array sort with L = 5, no second shuffle. The array trick is
    * the general pattern for ANY order statistic on a bounded trailing
    * frame (p90-of-last-20, trimmed means) without a sketch.
    */
  val rollingMedian: QueryDef = q(
    "q67_rolling_median",
    """WITH e AS (
      |  SELECT user_id, event_id, epoch_ns(ts) AS t,
      |         CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS c
      |  FROM events WHERE user_id % 50 = 0),
      |l AS (
      |  SELECT user_id, event_id, t, c,
      |    lag(c, 1) OVER w AS c1, lag(c, 2) OVER w AS c2,
      |    lag(c, 3) OVER w AS c3, lag(c, 4) OVER w AS c4
      |  FROM e
      |  WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)),
      |s AS (
      |  SELECT user_id, event_id, t,
      |    list_sort(list_filter([c, c1, c2, c3, c4], x -> x IS NOT NULL))
      |      AS arr
      |  FROM l)
      |SELECT user_id, event_id, t,
      |  CASE WHEN len(arr) % 2 = 1
      |       THEN CAST(arr[(len(arr) + 1) // 2] AS DOUBLE) / 100
      |       ELSE (CAST(arr[len(arr) // 2] AS DOUBLE)
      |             + CAST(arr[len(arr) // 2 + 1] AS DOUBLE)) / 2 / 100
      |  END AS med
      |FROM s
      |ORDER BY user_id, event_id""".stripMargin) { (s, d) =>
    // a NULL value would silently skew the positional weights (the lag
    // slots stay positional while n shrinks) — fail loudly instead; the
    // events contract has no null values, this guard enforces it
    val cents = when(col("value").isNull,
      raise_error(lit("q64/q67: NULL event value breaks the lag frame")))
      .otherwise((col("value").cast("decimal(12,2)") * 100).cast("long"))
    val e = Tables.events(s, d)
      .filter(col("user_id") % 50 === 0)
      .select(col("user_id"), col("event_id"), col("ts").as("t"),
        cents.as("c"))
    val w = Window.partitionBy("user_id").orderBy("t", "event_id")
    val lags = (1 to 4).map(i => lag(col("c"), i).over(w).as(s"c$i"))
    val l = e.select(
      (Seq(col("user_id"), col("event_id"), col("t"), col("c")) ++ lags): _*)
    val arr = array_sort(filter(
      array(col("c"), col("c1"), col("c2"), col("c3"), col("c4")),
      _.isNotNull))
    val n = size(arr)
    val med = when(n % 2 === 1,
      element_at(arr, ((n + 1) / 2).cast("int")).cast("double") / lit(100))
      .otherwise((element_at(arr, (n / 2).cast("int")).cast("double")
        + element_at(arr, (n / 2 + 1).cast("int")).cast("double"))
        / lit(2) / lit(100))
    l.select(col("user_id"), col("event_id"), col("t"), med.as("med"))
      .orderBy("user_id", "event_id")
  }

  /** q68: MERGEABLE distinct-count sketches — the pattern that makes
    * dashboard distincts tractable at 100 TB. Exact distincts cannot be
    * rolled up (per-day distinct counts don't add); HLL SKETCHES union
    * losslessly, so the warehouse stores one small sketch per
    * (type, day) cell and any coarser rollup (weekly, all-time, sliced)
    * is a cheap sketch union over the cells — no rescan of the raw
    * stream. The query proves the shape end-to-end: per-day DataSketches
    * HLL via `hll_sketch_agg`, cross-day merge via `hll_union_agg`, and
    * a self-gate of the merged estimate against the exact distinct
    * (the q62/q63 discipline: sketches differ across engines, so each
    * side gates its OWN sketch at the same tolerance and the verdict
    * column is compared).
    *
    * Scale shape: the daily-sketch aggregate is one keyed shuffle whose
    * reduce state is a few KB per cell regardless of row count; the
    * merge exchanges |cells| sketches, not users. The exact distinct
    * exists here only as the audit.
    */
  val hllMergeable: QueryDef = q(
    "q68_hll_mergeable",
    """WITH e AS (
      |  SELECT event_type, epoch_ns(ts) // 86400000000000 AS day, user_id
      |  FROM events)
      |SELECT event_type,
      |  count(DISTINCT day) AS n_days,
      |  count(DISTINCT user_id) AS exact_users,
      |  abs(approx_count_distinct(user_id) - count(DISTINCT user_id))
      |    <= 0.05 * count(DISTINCT user_id) AS approx_ok
      |FROM e GROUP BY 1
      |ORDER BY event_type""".stripMargin) { (s, d) =>
    val e = Tables.events(s, d).select(
      col("event_type"), expr(s"ts div ${24 * HourNs}").as("day"),
      col("user_id"))
    val daily = e.groupBy("event_type", "day")
      .agg(expr("hll_sketch_agg(user_id)").as("sk"))
    val merged = daily.groupBy("event_type")
      .agg(count(col("day")).as("n_days"),
        expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
    val exact = e.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("exact_users"))
    merged.join(exact, "event_type")
      .select(col("event_type"), col("n_days"), col("exact_users"),
        (abs(col("est") - col("exact_users")) <=
          lit(HllMargin4Sigma) * col("exact_users")).as("approx_ok"))
      .orderBy("event_type")
  }

  /** q69: NEW vs RETURNING users per hour — the growth-accounting twin
    * of q65's reach (every activation dashboard pairs them). A user is
    * NEW in the hour of their first-ever event, RETURNING in every later
    * active hour.
    *
    * Scale shape: one distinct aggregate to (user, hour) pairs, one
    * user-keyed min-aggregate for first-seen, and an equi-join of the
    * two — both sides hash-partitioned by user, so the join reuses the
    * aggregate's partitioning (no extra corpus exchange); the hourly
    * rollup is the usual map-side-partial count. First-seen is O(1)
    * state per user however long the history.
    */
  val newVsReturning: QueryDef = q(
    "q69_new_vs_returning",
    """WITH uh AS (
      |  SELECT DISTINCT user_id, epoch_ns(ts) // 3600000000000 AS h
      |  FROM events),
      |fs AS (SELECT user_id, min(h) AS h0 FROM uh GROUP BY 1)
      |SELECT uh.h AS hour_id,
      |  count(*) AS n_active,
      |  count(CASE WHEN uh.h = fs.h0 THEN 1 END) AS n_new,
      |  count(CASE WHEN uh.h > fs.h0 THEN 1 END) AS n_returning
      |FROM uh JOIN fs ON fs.user_id = uh.user_id
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    val uh = Tables.events(s, d)
      .select(col("user_id"), expr(s"ts div $HourNs").as("h"))
      .distinct()
    val fs = uh.groupBy("user_id").agg(min(col("h")).as("h0"))
    uh.join(fs, "user_id")
      .groupBy(col("h").as("hour_id"))
      .agg(count(lit(1)).as("n_active"),
        count(when(col("h") === col("h0"), 1)).as("n_new"),
        count(when(col("h") > col("h0"), 1)).as("n_returning"))
      .orderBy("hour_id")
  }

  /** q70: trailing-24-hour reach from REUSED hourly sketches — the
    * 100 TB answer to q65. The exact sliding distinct (q65) expands each
    * user-hour ×24; with HLL sketches the corpus is touched ONCE (one
    * sketch per hour, the q68 build), and every trailing window is a
    * 24-sketch union — overlapping windows share their hourly sketches
    * instead of re-reading users. Self-gated: the estimate must land
    * within [[HllMargin4Sigma]] (4σ of the configured rsd) of q65's
    * exact reach for every hour (each engine gates its own sketch at
    * its own margin; the verdict column is compared — the q62/q68
    * discipline).
    *
    * Scale shape: one user-hour shuffle to build |hours| sketches
    * (KB each), then the window union is |hours| × 24 sketch rows —
    * independent of user count. The exact side exists only as the audit.
    */
  val slidingReachApprox: QueryDef = q(
    "q70_sliding_reach_hll",
    """WITH uh AS (
      |  SELECT DISTINCT user_id, epoch_ns(ts) // 3600000000000 AS h
      |  FROM events),
      |b AS (SELECT max(h) AS hmax FROM uh),
      |proj AS (
      |  SELECT user_id, unnest(generate_series(h, h + 23)) AS h2
      |  FROM uh),
      |w AS (
      |  SELECT p.h2 AS hour_id,
      |         count(DISTINCT p.user_id) AS exact_reach,
      |         approx_count_distinct(p.user_id) AS est
      |  FROM proj p, b WHERE p.h2 <= b.hmax
      |  GROUP BY 1)
      |SELECT hour_id, exact_reach,
      |       abs(est - exact_reach) <= 0.05 * exact_reach AS approx_ok
      |FROM w ORDER BY hour_id""".stripMargin) { (s, d) =>
    val uh = Tables.events(s, d)
      .select(col("user_id"), expr(s"ts div $HourNs").as("h"))
      .distinct()
    val bounds = uh.agg(max(col("h")).as("hmax"))
    // ONE sketch per hour — the corpus-touching pass
    val hourly = uh.groupBy("h")
      .agg(expr("hll_sketch_agg(user_id)").as("sk"))
    // each hourly sketch serves its <= 24 window-ends; the union is
    // sketch-count-bounded, user-count-independent
    val proj = hourly.select(col("sk"),
      explode(sequence(col("h"), col("h") + 23)).as("h2"))
    val est = proj.join(broadcast(bounds), proj("h2") <= bounds("hmax"))
      .groupBy(col("h2").as("hour_id"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
    // exact audit side (q65's plan)
    val exact = uh
      .select(col("user_id"), explode(sequence(col("h"), col("h") + 23)).as("h2"))
      .join(broadcast(bounds), col("h2") <= col("hmax"))
      .groupBy(col("h2").as("hour_id"))
      .agg(countDistinct(col("user_id")).as("exact_reach"))
    est.join(exact, "hour_id")
      .select(col("hour_id"), col("exact_reach"),
        (abs(col("est") - col("exact_reach")) <=
          lit(HllMargin4Sigma) * col("exact_reach")).as("approx_ok"))
      .orderBy("hour_id")
  }

  /** q71: CUSUM drift detection per user — the classical
    * change-detection statistic (Page 1954): S_t = max(0, S_{t−1} + (c_t
    * − ref)); alarm and reset when S crosses the threshold. CUSUM
    * catches a sustained small shift long before any per-point z-score
    * (q55) fires, which is why monitoring pipelines run both.
    *
    * A recursive fold is NOT frame-expressible, and a
    * collect-the-group-then-fold would materialize unbounded user
    * histories. The scalable shape is the secondary-sort pattern:
    * repartition by user, sortWithinPartitions by (user, t, id), then
    * ONE streaming pass per partition carrying (current user, S) — O(1)
    * state, no per-group buffering, arbitrarily long histories. All
    * arithmetic is exact integer cents; parameters (ref 50.00 above
    * typical, alarm at 500.00 of accumulated excess) are calibrated to
    * the fixture's value law. The oracle restates the recursion as a
    * per-user recursive CTE — a genuinely different evaluation strategy
    * agreeing bit-for-bit.
    */
  val cusumAlarms: QueryDef = q(
    "q71_cusum_alarms",
    """WITH RECURSIVE e AS (
      |  SELECT user_id, event_id, epoch_ns(ts) AS t,
      |         CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS c,
      |         row_number() OVER (PARTITION BY user_id
      |                            ORDER BY epoch_ns(ts), event_id) AS rn
      |  FROM events),
      |r AS (
      |  SELECT user_id, rn, event_id, t,
      |         greatest(0, c - 5000) AS s_pre,
      |         greatest(0, c - 5000) > 50000 AS alarm,
      |         CASE WHEN greatest(0, c - 5000) > 50000 THEN 0
      |              ELSE greatest(0, c - 5000) END AS s_post
      |  FROM e WHERE rn = 1
      |  UNION ALL
      |  SELECT e.user_id, e.rn, e.event_id, e.t,
      |         greatest(0, r.s_post + e.c - 5000) AS s_pre,
      |         greatest(0, r.s_post + e.c - 5000) > 50000 AS alarm,
      |         CASE WHEN greatest(0, r.s_post + e.c - 5000) > 50000 THEN 0
      |              ELSE greatest(0, r.s_post + e.c - 5000) END AS s_post
      |  FROM r JOIN e ON e.user_id = r.user_id AND e.rn = r.rn + 1)
      |SELECT user_id, event_id, t, CAST(s_pre AS BIGINT) AS s_alarm
      |FROM r WHERE alarm
      |ORDER BY user_id, event_id""".stripMargin) { (s, d) =>
    import s.implicits._
    val e = Tables.events(s, d).select(
      col("user_id"), col("event_id"), col("ts").as("t"),
      (col("value").cast("decimal(12,2)") * 100).cast("long").as("c"))
    e.repartition(col("user_id"))
      .sortWithinPartitions("user_id", "t", "event_id")
      .as[(Long, Long, Long, Long)]
      .mapPartitions { it =>
        var curUser = Long.MinValue
        var sPost = 0L
        it.flatMap { case (u, id, t, c) =>
          if (u != curUser) { curUser = u; sPost = 0L }
          val sPre = math.max(0L, sPost + c - 5000L)
          val alarm = sPre > 50000L
          sPost = if (alarm) 0L else sPre
          if (alarm) Iterator.single((u, id, t, sPre)) else Iterator.empty
        }
      }
      .toDF("user_id", "event_id", "t", "s_alarm")
      .orderBy("user_id", "event_id")
  }

  /** q72: MERGEABLE frequency sketches — the Count-Min complement to
    * q68's HLL distincts. Per-day CMS sketches of the event-type stream
    * (`count_min_sketch`, Spark's built-in mergeable aggregate), merged
    * across days ON THE DRIVER via `CountMinSketch.mergeInPlace` —
    * |days| sketches of a few KB each, the bounded-model-state pattern —
    * then each type's merged estimate is gated against its exact count
    * using CMS's one-sided guarantee: the estimate NEVER undercounts,
    * and overcounts by at most ε·N (ε = 0.1%, δ = 1%) with the seed
    * fixed, so the gate is deterministic.
    *
    * Scale shape: the per-day sketch build is one keyed aggregate whose
    * reduce state is sketch-sized regardless of row count; the merge
    * moves |days| KB-scale blobs to the driver (at 100 TB: a second
    * sketch-of-sketches aggregate level instead, same algebra). The
    * exact count exists only as the audit.
    */
  val cmsMergeable: QueryDef = q(
    "q72_cms_mergeable",
    """WITH e AS (
      |  SELECT event_type, epoch_ns(ts) // 86400000000000 AS day
      |  FROM events)
      |SELECT event_type,
      |  count(DISTINCT day) AS n_days,
      |  count(*) AS exact_n,
      |  TRUE AS cms_ok
      |FROM e GROUP BY 1
      |ORDER BY event_type""".stripMargin) { (s, d) =>
    import org.apache.spark.util.sketch.CountMinSketch
    val e = Tables.events(s, d).select(
      col("event_type"), expr(s"ts div ${24 * HourNs}").as("day"))
    // one mergeable sketch per day — the corpus-touching pass
    val daily = e.groupBy("day")
      .agg(expr("count_min_sketch(event_type, 0.001d, 0.99d, 42)").as("sk"))
      .collect()
    import s.implicits._
    if (daily.isEmpty) { // empty store: empty result, like sibling aggregates
      Seq.empty[(String, Long, Long, Boolean)]
        .toDF("event_type", "n_days", "exact_n", "cms_ok")
    } else {
      val merged = daily.map(r =>
          CountMinSketch.readFrom(r.getAs[Array[Byte]]("sk")))
        .reduceLeft { (a, b) => a.mergeInPlace(b); a }
      val exact = e.groupBy("event_type")
        .agg(countDistinct(col("day")).as("n_days"), count(lit(1)).as("exact_n"))
        .collect()
      val totalN = exact.map(_.getAs[Long]("exact_n")).sum
      exact.toSeq.map { r =>
        val t = r.getString(0)
        // the SQL aggregate adds STRING items as their UTF-8 bytes
        val est = merged.estimateCount(t.getBytes("UTF-8"))
        val n = r.getAs[Long]("exact_n")
        // CMS one-sided bound: never under, over by <= eps*N
        (t, r.getAs[Long]("n_days"), n,
          est >= n && est <= n + (0.001 * totalN).toLong + 1)
      }.toDF("event_type", "n_days", "exact_n", "cms_ok")
        .orderBy("event_type")
    }
  }

  /** q73: INCREMENTAL rollup maintenance — the "don't rescan history"
    * contract for plain aggregates, proven under the gate. The event
    * stream is split at its midpoint timestamp into HISTORY and DELTA;
    * each side is aggregated to exact-decimal partials independently
    * (history's partials are what a warehouse would have persisted), and
    * the published rollup is the MERGE of the two partial sets — sums of
    * counts and decimal sums, which is exact and associative, so the
    * merged result is bit-identical to a full recompute (the oracle IS
    * the full recompute, restated over a partials relation so it can
    * also state `n_parts`). q68/q72 are this same algebra for sketches;
    * this is the plain-aggregate form every incremental ETL needs.
    *
    * Scale shape: the delta aggregate touches only delta rows; the merge
    * exchanges |cells| partial rows, not events. `n_parts` (1 or 2 per
    * cell) makes the maintenance structure visible — and auditable — in
    * the result itself.
    */
  val incrementalRollup: QueryDef = q(
    "q73_incremental_rollup",
    """WITH e AS (
      |  SELECT epoch_ns(ts) // 3600000000000 AS h, event_type,
      |         CAST(value AS DECIMAL(12,2)) AS v, epoch_ns(ts) AS t
      |  FROM events),
      |b AS (SELECT (min(t) + max(t)) // 2 AS cut FROM e),
      |p AS (
      |  SELECT h, event_type,
      |         CASE WHEN e.t <= b.cut THEN 0 ELSE 1 END AS part,
      |         count(*) AS n, sum(v) AS s
      |  FROM e, b GROUP BY 1, 2, 3)
      |SELECT h AS hour_id, event_type,
      |       CAST(sum(n) AS BIGINT) AS n_events,
      |       CAST(sum(s) AS DOUBLE) AS sum_value,
      |       count(*) AS n_parts
      |FROM p GROUP BY 1, 2
      |ORDER BY hour_id, event_type""".stripMargin) { (s, d) =>
    val e = Tables.events(s, d).select(
      expr(s"ts div $HourNs").as("h"), col("event_type"),
      Compat.money(col("value")).as("v"), col("ts").as("t"))
    val cut = e.agg(expr("(min(t) + max(t)) div 2").as("cut"))
    val withPart = e.join(broadcast(cut))
      .withColumn("part", when(col("t") <= col("cut"), 0).otherwise(1))
    // per-side partials: what the history side would persist
    val partials = withPart.groupBy("h", "event_type", "part")
      .agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
    // the maintenance step: merge partials, never rescan events
    partials.groupBy(col("h").as("hour_id"), col("event_type"))
      .agg(sum(col("n")).as("n_events"),
        sum(col("s")).cast("double").as("sum_value"),
        count(lit(1)).as("n_parts"))
      .orderBy("hour_id", "event_type")
  }

  /** q74: CUPED variance-reduced experiment readout — the standard
    * post-SRM (p20) analysis step: adjust each user's outcome by their
    * PRE-period covariate, `y_adj = y − θ(x − x̄)` with
    * `θ = cov(x,y)/var(x)` pooled across arms, which shrinks metric
    * variance by the x↔y correlation without biasing the arm contrast.
    * Pre/post is the q73 midpoint split; x and y are per-user exact-cent
    * sums; the arm is p20's salted hash.
    *
    * Determinism discipline: every moment (Σx, Σy, Σx², Σy², Σxy, per
    * arm and pooled) is an EXACT long aggregate; θ, means, variances and
    * the reduction ratio are derived from those longs by one shared
    * double expression on both engines (sums of user-level cents² stay
    * under 2⁶³ through sf100 — user count grows, per-user mass does
    * not). Scale shape: one user-keyed aggregate builds (x, y), one
    * arm-keyed and one global moment aggregate over |users| rows, then
    * pure arithmetic; the corpus is scanned once.
    */
  val cuped: QueryDef = q(
    "q74_cuped",
    """WITH e AS (
      |  SELECT user_id, epoch_ns(ts) AS t,
      |         CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS c
      |  FROM events),
      |b AS (SELECT (min(t) + max(t)) // 2 AS cut FROM e),
      |u AS (
      |  SELECT user_id,
      |         CAST(sum(CASE WHEN e.t <= b.cut THEN c ELSE 0 END) AS BIGINT) AS x,
      |         CAST(sum(CASE WHEN e.t > b.cut THEN c ELSE 0 END) AS BIGINT) AS y,
      |         CAST(('0x' || substr(md5('exp:' || CAST(user_id AS VARCHAR)), 1, 12))
      |              AS BIGINT) % 2 AS arm
      |  FROM e, b GROUP BY user_id),
      |g AS (
      |  SELECT count(*) AS n, CAST(sum(x) AS BIGINT) AS sx,
      |         CAST(sum(y) AS BIGINT) AS sy,
      |         CAST(sum(x * x) AS BIGINT) AS sxx,
      |         CAST(sum(x * y) AS BIGINT) AS sxy
      |  FROM u),
      |a AS (
      |  SELECT arm, count(*) AS n, CAST(sum(x) AS BIGINT) AS sx,
      |         CAST(sum(y) AS BIGINT) AS sy,
      |         CAST(sum(x * x) AS BIGINT) AS sxx,
      |         CAST(sum(y * y) AS BIGINT) AS syy,
      |         CAST(sum(x * y) AS BIGINT) AS sxy
      |  FROM u GROUP BY arm),
      |th AS (
      |  SELECT (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
      |         / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) AS theta,
      |         CAST(sx AS DOUBLE) / n AS xbar
      |  FROM g)
      |SELECT a.arm, a.n AS n_users,
      |  CAST(a.sy AS DOUBLE) / a.n / 100 AS mean_y,
      |  (CAST(a.sy AS DOUBLE)
      |   - th.theta * (CAST(a.sx AS DOUBLE) - a.n * th.xbar))
      |    / a.n / 100 AS mean_y_adj,
      |  ((CAST(a.syy AS DOUBLE)
      |    - 2 * th.theta * a.sxy
      |    + th.theta * th.theta * a.sxx) / a.n
      |   - ((CAST(a.sy AS DOUBLE) - th.theta * a.sx) / a.n)
      |     * ((CAST(a.sy AS DOUBLE) - th.theta * a.sx) / a.n))
      |  / ((CAST(a.syy AS DOUBLE)) / a.n
      |     - (CAST(a.sy AS DOUBLE) / a.n) * (CAST(a.sy AS DOUBLE) / a.n))
      |    AS var_reduction
      |FROM a, th ORDER BY a.arm""".stripMargin) { (s, d) =>
    val e = Tables.events(s, d).select(col("user_id"), col("ts").as("t"),
      (col("value").cast("decimal(12,2)") * 100).cast("long").as("c"))
    val cut = e.agg(expr("(min(t) + max(t)) div 2").as("cut"))
    val u = e.join(broadcast(cut))
      .groupBy("user_id")
      .agg(sum(when(col("t") <= col("cut"), col("c")).otherwise(0L)).as("x"),
        sum(when(col("t") > col("cut"), col("c")).otherwise(0L)).as("y"))
      .withColumn("arm",
        conv(substring(md5(concat(lit("exp:"), col("user_id").cast("string"))),
          1, 12), 16, 10).cast("long") % 2)
    val g = u.agg(count(lit(1)).as("gn"), sum(col("x")).as("gsx"),
      sum(col("y")).as("gsy"), sum(col("x") * col("x")).as("gsxx"),
      sum(col("x") * col("y")).as("gsxy"))
    val a = u.groupBy("arm")
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"), sum(col("x") * col("y")).as("sxy"))
    // θ = (n·Σxy − Σx·Σy) / (n·Σxx − Σx²), pooled — shared double shape
    val theta = (col("gn").cast("double") * col("gsxy")
      - col("gsx").cast("double") * col("gsy")) /
      (col("gn").cast("double") * col("gsxx")
        - col("gsx").cast("double") * col("gsx"))
    val xbar = col("gsx").cast("double") / col("gn")
    val meanYAdj = (col("sy").cast("double")
      - theta * (col("sx").cast("double") - col("n") * xbar)) /
      col("n") / lit(100)
    val meanAdjRaw = (col("sy").cast("double") - theta * col("sx")) / col("n")
    val varAdj = (col("syy").cast("double") - lit(2) * theta * col("sxy")
      + theta * theta * col("sxx")) / col("n") - meanAdjRaw * meanAdjRaw
    val varY = col("syy").cast("double") / col("n") -
      (col("sy").cast("double") / col("n")) * (col("sy").cast("double") / col("n"))
    a.join(broadcast(g))
      .select(col("arm"), col("n").as("n_users"),
        (col("sy").cast("double") / col("n") / lit(100)).as("mean_y"),
        meanYAdj.as("mean_y_adj"),
        (varAdj / varY).as("var_reduction"))
      .orderBy("arm")
  }

  def defs: Seq[QueryDef] =
    Seq(ewma, slidingDistinct, histogram, rollingMedian, hllMergeable,
      newVsReturning, slidingReachApprox, cusumAlarms, cmsMergeable,
      incrementalRollup, cuped)
}
