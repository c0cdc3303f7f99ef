package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import Compat._

/** Time-series operators over the event stream: spine-based gap filling
  * with linear interpolation, and exact-moment anomaly scoring.
  *
  * Reference scope note: heparchy has no time axis at all (its events are
  * Monte-Carlo samples, `read/hdf.py:447-466` addresses them by index);
  * these operators are part of the engine's north-star analytics surface
  * (BASELINE.json), expressed Spark-first.
  */
object TimeSeries {

  private def q(name: String, oracle: String)(
      run: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, Some(oracle), run)

  private val HourNs = 3600000000000L

  /** q51: per-user hourly resample + linear interpolation of gaps.
    *
    * The hourly aggregate uses exact decimal sums; the spine is generated
    * DISTRIBUTED — `sequence(h0, h1)` exploded per user, so spine
    * generation parallelizes over users with no driver action (contrast
    * q43's corpus-global spine, whose 2-long bounds row is a bounded
    * driver collect). Interpolation rides two one-pass window frames
    * (last non-null before / first non-null after); the arithmetic is a
    * single double expression shaped identically to the oracle's, so
    * results are bit-exact.
    *
    * Scale shape: everything is keyed by `user_id` — one shuffle for the
    * hourly aggregate (map-side partial), one for the spine join (both
    * sides already hash-partitioned by user), and the window frames reuse
    * the same partitioning. Output is bounded by users × span-hours; the
    * `user_id % 50` sample keeps the dumped result proportionate, the
    * operator itself is cardinality-agnostic.
    */
  val gapFill: QueryDef = q(
    "q51_gap_fill",
    """WITH e AS (
      |  SELECT user_id, epoch_ns(ts) // 3600000000000 AS h,
      |         CAST(value AS DECIMAL(12,2)) AS v
      |  FROM events WHERE user_id % 50 = 0),
      |hourly AS (SELECT user_id, h, sum(v) AS hv FROM e GROUP BY 1, 2),
      |bounds AS (SELECT user_id, min(h) AS h0, max(h) AS h1
      |           FROM hourly GROUP BY 1),
      |spine AS (SELECT user_id, unnest(generate_series(h0, h1)) AS h
      |          FROM bounds),
      |joined AS (
      |  SELECT s.user_id, s.h, hourly.hv
      |  FROM spine s LEFT JOIN hourly
      |    ON hourly.user_id = s.user_id AND hourly.h = s.h),
      |marked AS (
      |  SELECT user_id, h, hv,
      |    last_value(hv IGNORE NULLS) OVER wp AS pv,
      |    last_value(CASE WHEN hv IS NOT NULL THEN h END IGNORE NULLS)
      |      OVER wp AS ph,
      |    first_value(hv IGNORE NULLS) OVER wn AS nv,
      |    first_value(CASE WHEN hv IS NOT NULL THEN h END IGNORE NULLS)
      |      OVER wn AS nh
      |  FROM joined
      |  WINDOW wp AS (PARTITION BY user_id ORDER BY h
      |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
      |         wn AS (PARTITION BY user_id ORDER BY h
      |                ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING))
      |SELECT user_id, h, hv IS NULL AS filled,
      |  CASE WHEN hv IS NOT NULL THEN CAST(hv AS DOUBLE)
      |       WHEN pv IS NULL OR nv IS NULL THEN NULL
      |       ELSE CAST(pv AS DOUBLE)
      |            + (CAST(nv AS DOUBLE) - CAST(pv AS DOUBLE))
      |              * ((h - ph) / (nh - ph))
      |  END AS v
      |FROM marked
      |ORDER BY user_id, h""".stripMargin) { (s, d) =>
    val e = Tables.events(s, d)
      .filter(col("user_id") % 50 === 0)
      .select(col("user_id"), expr(s"ts div $HourNs").as("h"),
        money(col("value")).as("v"))
    val hourly = e.groupBy("user_id", "h").agg(sum(col("v")).as("hv"))
    val spine = hourly.groupBy("user_id")
      .agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
      .select(col("user_id"), explode(sequence(col("h0"), col("h1"))).as("h"))
    val wp = Window.partitionBy("user_id").orderBy("h")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wn = Window.partitionBy("user_id").orderBy("h")
      .rowsBetween(1, Window.unboundedFollowing)
    spine.join(hourly, Seq("user_id", "h"), "left")
      .select(col("user_id"), col("h"), col("hv"),
        last(col("hv"), ignoreNulls = true).over(wp).as("pv"),
        last(when(col("hv").isNotNull, col("h")), ignoreNulls = true)
          .over(wp).as("ph"),
        first(col("hv"), ignoreNulls = true).over(wn).as("nv"),
        first(when(col("hv").isNotNull, col("h")), ignoreNulls = true)
          .over(wn).as("nh"))
      .select(col("user_id"), col("h"), col("hv").isNull.as("filled"),
        when(col("hv").isNotNull, col("hv").cast("double"))
          .when(col("pv").isNull || col("nv").isNull, lit(null).cast("double"))
          .otherwise(col("pv").cast("double")
            + (col("nv").cast("double") - col("pv").cast("double"))
              * ((col("h") - col("ph")) / (col("nh") - col("ph"))))
          .as("v"))
      .orderBy("user_id", "h")
  }

  /** q55: per-user z-score anomaly detection, exact moments.
    *
    * Per-user count / sum / sum-of-squares are EXACT decimal aggregates
    * (order-free, retry-safe — the 100 TB requirement), collapsed to
    * double once, so the z expression is a pure double tree shaped
    * identically to the oracle's. Flags |z| > 3 with sample variance.
    *
    * Scale shape: the stats frame is one row per user — aggregated
    * map-side, then joined back to the events; Catalyst/AQE broadcasts it
    * while it fits and falls back to a user_id-co-partitioned shuffle
    * join beyond that, which is exactly the right behavior at 10⁹ users
    * (forcing `broadcast()` here would be the scale bug).
    */
  val anomalyZscore: QueryDef = q(
    "q55_anomaly_zscore",
    """WITH s AS (
      |  SELECT user_id, count(*) AS n,
      |    CAST(CAST(sum(CAST(value AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sx,
      |    CAST(CAST(sum(CAST(value AS DECIMAL(12,2)) * CAST(value AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sxx
      |  FROM events GROUP BY 1)
      |SELECT e.user_id, e.event_id, e.value,
      |  (e.value - s.sx / s.n)
      |    / sqrt((s.sxx - s.sx * s.sx / s.n) / (s.n - 1)) AS z
      |FROM events e JOIN s ON s.user_id = e.user_id
      |WHERE s.n >= 2
      |  AND (s.sxx - s.sx * s.sx / s.n) / (s.n - 1) > 0
      |  AND abs((e.value - s.sx / s.n)
      |          / sqrt((s.sxx - s.sx * s.sx / s.n) / (s.n - 1))) > 3
      |ORDER BY e.user_id, e.event_id""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d)
    val stats = ev.groupBy("user_id").agg(
      count(lit(1)).as("n"),
      sum(money(col("value"))).cast("double").as("sx"),
      sum(money(col("value")) * money(col("value"))).cast("double").as("sxx"))
    val varExpr = (col("sxx") - col("sx") * col("sx") / col("n")) / (col("n") - 1)
    val z = (col("value") - col("sx") / col("n")) / sqrt(varExpr)
    ev.join(stats, "user_id")
      .filter(col("n") >= 2 && varExpr > 0 && abs(z) > 3)
      .select(col("user_id"), col("event_id"), col("value"), z.as("z"))
      .orderBy("user_id", "event_id")
  }

  /** q57: multi-touch (linear) conversion attribution — each purchase
    * splits its value equally across the user's clicks in the preceding
    * 30 minutes, reported per click. The credit is integer micro-units
    * with floor division (`value·10⁶ div n_touch`) — exact, identical on
    * both engines, and auditable: Σcredit ≤ Σpurchase value with the
    * remainder = division truncation, never float drift.
    *
    * Scale shape: the click↔purchase join is an equi-join on `user_id`
    * with a band predicate — per-user fan-out is bounded by a user's own
    * click×purchase density inside 30 min (the q25 band-decomposition
    * argument); the n_touch window and final aggregate reuse the join's
    * user-co-partitioned output. This is the batch twin of the streaming
    * [[graft.streaming.EventStream.attribution]] interval join.
    */
  val attribution: QueryDef = q(
    "q57_attribution",
    """WITH c AS (SELECT event_id AS click_id, user_id, ts FROM events
      |           WHERE event_type = 'click'),
      |p AS (SELECT event_id AS purchase_id, user_id, ts,
      |             CAST(CAST(value AS DECIMAL(12,2)) * 1000000 AS BIGINT) AS vmic
      |      FROM events WHERE event_type = 'purchase'),
      |m AS (SELECT c.click_id, p.purchase_id, p.vmic,
      |        count(*) OVER (PARTITION BY p.purchase_id) AS n_touch
      |      FROM c JOIN p ON p.user_id = c.user_id
      |        AND epoch_ns(p.ts) - epoch_ns(c.ts) BETWEEN 0 AND 1800000000000)
      |SELECT click_id, count(*) AS n_conversions,
      |       CAST(sum(vmic // n_touch) AS BIGINT) AS credit_micro
      |FROM m GROUP BY click_id
      |ORDER BY click_id""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d)
    val c = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts").as("cts"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("pts"),
        (money(col("value")) * 1000000).cast("long").as("vmic"))
    val wpid = Window.partitionBy("purchase_id")
    c.join(p, Seq("user_id"))
      .filter((col("pts") - col("cts")).between(0L, 1800000000000L))
      .withColumn("n_touch", count(lit(1)).over(wpid))
      .groupBy("click_id")
      .agg(count(lit(1)).as("n_conversions"),
        sum(expr("vmic div n_touch")).cast("long").as("credit_micro"))
      .orderBy("click_id")
  }

  /** q59: gaps-and-islands — maximal runs of CONSECUTIVE active hours per
    * user (the classic `value − row_number()` grouping constant: inside a
    * consecutive run the difference is invariant, across a gap it jumps).
    * The complement of q51's gap fill: q51 reconstructs what's missing,
    * q59 reports the contiguous structure of what's present. One
    * user-partitioned window + one hash aggregate; runs of length 1
    * filtered to keep the result about genuine streaks.
    */
  val islands: QueryDef = q(
    "q59_islands",
    """WITH hourly AS (
      |  SELECT DISTINCT user_id, epoch_ns(ts) // 3600000000000 AS h
      |  FROM events WHERE user_id % 20 = 0),
      |marked AS (
      |  SELECT user_id, h,
      |    h - row_number() OVER (PARTITION BY user_id ORDER BY h) AS grp
      |  FROM hourly)
      |SELECT user_id, min(h) AS start_h, max(h) AS end_h,
      |       count(*) AS len_hours
      |FROM marked GROUP BY user_id, grp
      |HAVING count(*) >= 2
      |ORDER BY user_id, start_h""".stripMargin) { (s, d) =>
    val hourly = Tables.events(s, d)
      .filter(col("user_id") % 20 === 0)
      .select(col("user_id"), expr(s"ts div $HourNs").as("h"))
      .distinct()
    val w = Window.partitionBy("user_id").orderBy("h")
    hourly
      .withColumn("grp", col("h") - row_number().over(w))
      .groupBy("user_id", "grp")
      .agg(min(col("h")).as("start_h"), max(col("h")).as("end_h"),
        count(lit(1)).as("len_hours"))
      .filter(col("len_hours") >= 2)
      .select("user_id", "start_h", "end_h", "len_hours")
      .orderBy("user_id", "start_h")
  }

  /** q61: sweep-line concurrency — max CONCURRENT sessions per hour. User
    * sessions (30-min-gap rule, q23's definition) become ±1 boundary
    * deltas; concurrency at any instant is the prefix sum of deltas in
    * (t, starts-first) order, and the hourly profile is the per-bucket
    * max of that running count.
    *
    * The prefix sum is TWO-LEVEL (the p13 pattern): a within-hour-bucket
    * running sum (bucket-partitioned window) plus a per-bucket offset
    * from the totals of all PRIOR buckets — so no corpus-wide
    * single-partition window ever exists; the only global window runs
    * over the bucket spine (one row per hour of history, bounded by the
    * time span, not the data volume). The oracle states the naive global
    * running sum; integer exactness makes the two forms identical.
    * Boundary semantics: ends are placed at s1+1 ns so a session is
    * concurrent through its last event's instant; peer deltas collapse
    * under the RANGE frame, so intra-instant order cannot matter.
    *
    * DENSE-HOUR semantics (strengthened in r11; stated identically by
    * the oracle): every hour from the first to the last session boundary
    * emits a row, and an hour's max includes the carried-in level — the
    * running count held at the hour's start, before its first delta (or
    * throughout, for delta-free hours fully spanned by open sessions).
    * So an hour whose only delta is a −1 still reports the carried-in
    * peak, and quiet hours inside long sessions report the held level.
    * The dense spine is `sequence(min_hour, max_hour)` — one row per
    * hour of history, bounded by the time span, not the data volume —
    * and the fill is a spine-sized window, no new corpus scan.
    */
  val concurrency: QueryDef = q(
    "q61_concurrency",
    """WITH e AS (SELECT user_id, epoch_ns(ts) AS t FROM events),
      |lagged AS (
      |  SELECT user_id, t,
      |    CASE WHEN lag(t) OVER (PARTITION BY user_id ORDER BY t) IS NULL
      |           OR t - lag(t) OVER (PARTITION BY user_id ORDER BY t)
      |              > 1800000000000
      |         THEN 1 ELSE 0 END AS new_s
      |  FROM e),
      |sess AS (
      |  SELECT user_id,
      |    sum(new_s) OVER (PARTITION BY user_id ORDER BY t) AS sid, t
      |  FROM lagged),
      |bounds AS (
      |  SELECT user_id, sid, min(t) AS s0, max(t) AS s1
      |  FROM sess GROUP BY 1, 2),
      |deltas AS (
      |  SELECT s0 AS t, 1 AS d FROM bounds
      |  UNION ALL
      |  SELECT s1 + 1 AS t, -1 AS d FROM bounds),
      |run AS (
      |  SELECT t, d,
      |    CAST(sum(d) OVER (ORDER BY t, d DESC) AS BIGINT) AS conc
      |  FROM deltas),
      |hourly AS (
      |  SELECT t // 3600000000000 AS hour_id,
      |         CAST(max(conc) AS BIGINT) AS mx_in,
      |         CAST(sum(d) AS BIGINT) AS bt
      |  FROM run GROUP BY 1),
      |spine AS (
      |  SELECT unnest(generate_series((SELECT min(hour_id) FROM hourly),
      |                                (SELECT max(hour_id) FROM hourly)))
      |         AS hour_id),
      |dense AS (
      |  SELECT s.hour_id, h.mx_in, coalesce(h.bt, 0) AS bt
      |  FROM spine s LEFT JOIN hourly h USING (hour_id)),
      |lvl AS (
      |  SELECT hour_id, mx_in,
      |    CAST(coalesce(sum(bt) OVER (ORDER BY hour_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      |      AS carried
      |  FROM dense)
      |SELECT hour_id,
      |       CAST(greatest(carried, coalesce(mx_in, carried)) AS BIGINT)
      |         AS max_concurrent
      |FROM lvl ORDER BY 1""".stripMargin) { (s, d) =>
    val wu = Window.partitionBy("user_id").orderBy("t")
    val lagged = Tables.events(s, d).select(col("user_id"), col("ts").as("t"))
      .withColumn("new_s",
        when(lag(col("t"), 1).over(wu).isNull ||
          col("t") - lag(col("t"), 1).over(wu) > 1800000000000L, 1)
          .otherwise(0))
    val bounds = lagged
      .withColumn("sid", sum(col("new_s")).over(wu))
      .groupBy("user_id", "sid")
      .agg(min(col("t")).as("s0"), max(col("t")).as("s1"))
    val deltas = bounds.select(col("s0").as("t"), lit(1).as("d"))
      .unionAll(bounds.select((col("s1") + 1).as("t"), lit(-1).as("d")))
      .withColumn("bucket", expr(s"t div $HourNs"))
    val wb = Window.partitionBy("bucket").orderBy(col("t"), col("d").desc)
    // within-bucket prefix max + bucket total: one hash-agg per bucket
    val perBucket = deltas.withColumn("local", sum(col("d")).over(wb))
      .groupBy("bucket")
      .agg(max(col("local")).as("mxl"), sum(col("d")).as("bt"))
    // dense hour spine (bounded by history span, not data volume)
    val spine = perBucket
      .agg(min(col("bucket")).as("lo"), max(col("bucket")).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"))).as("bucket"))
    val dense = spine.join(perBucket, Seq("bucket"), "left")
      .withColumn("bt0", coalesce(col("bt"), lit(0L)))
    // the ONLY global-order window runs over the spine (p13 contract)
    val wo = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    dense
      .withColumn("carried", coalesce(sum(col("bt0")).over(wo), lit(0L)))
      .select(col("bucket").as("hour_id"),
        greatest(col("carried"),
          coalesce(col("mxl") + col("carried"), col("carried")))
          .as("max_concurrent"))
      .orderBy("hour_id")
  }

  def defs: Seq[QueryDef] =
    Seq(gapFill, anomalyZscore, attribution, islands, concurrency)
}
