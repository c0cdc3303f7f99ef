package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import Compat._

/** Time-series operators over the `events` table.
  *
  * `events.ts` is parquet TIMESTAMP(NANOS); Spark has no nanosecond
  * timestamp type, so the session reads it as a raw nanosecond LONG
  * (`spark.sql.legacy.parquet.nanosAsLong`, see [[graft.EngineSession]]) and
  * all time arithmetic below is exact 64-bit integer math — deterministic,
  * codegen-friendly, and byte-identical to DuckDB's `epoch_ns` view of the
  * same column. The oracle SQL keeps native TIMESTAMP_NS semantics.
  */
object EventOps {

  private val NS: Long = 1000000000L

  private def q(name: String, oracle: String)(
      run: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, Some(oracle), run)

  /** Running (cumulative) sum per user — analytic window with the default
    * running frame; exact decimal accumulation.
    */
  val windowRunning: QueryDef = q(
    "q21_window_running",
    """SELECT user_id, event_id,
      |  CAST(sum(CAST(value AS DECIMAL(12,2)))
      |       OVER (PARTITION BY user_id ORDER BY event_id) AS DOUBLE)
      |    AS running_value
      |FROM events
      |ORDER BY user_id, event_id""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"),
        sum(money(col("value"))).over(w).cast("double").as("running_value"))
      .orderBy("user_id", "event_id")
  }

  /** Tumbling 1-hour windows (batch form of the streaming windowed agg in
    * [[graft.streaming.EventStream]]): group on hour-bucketed time — a pure
    * map-side bucket computation, one shuffle for the aggregate.
    */
  val hourlyRollup: QueryDef = q(
    "q22_hourly_rollup",
    """SELECT epoch_ns(ts) // 3600000000000 AS hour_id, event_type,
      |  count(*) AS n_events,
      |  CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY hour_id, event_type""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .groupBy(expr("ts div 3600000000000").as("hour_id"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(money(col("value"))).cast("double").as("sum_value"))
      .orderBy("hour_id", "event_type")
  }

  /** Gap-based sessionization (30-minute inactivity): lag + cumulative
    * session-start flags, then per-user session counts. One shuffle on
    * user_id; at 100 TB this is the mapGroupsWithState shape run as batch.
    */
  val sessionize: QueryDef = q(
    "q23_sessionize",
    """SELECT user_id,
      |  CAST(sum(CASE WHEN prev_ts IS NULL
      |                  OR epoch_ns(ts) - epoch_ns(prev_ts) > 1800000000000
      |            THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
      |  count(*) AS n_events
      |FROM (SELECT user_id, ts,
      |             lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
      |      FROM events)
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    Tables.events(s, d)
      .select(col("user_id"), col("ts"), lag(col("ts"), 1).over(w).as("prev_ts"))
      .groupBy(col("user_id"))
      .agg(
        sum(when(col("prev_ts").isNull ||
          col("ts") - col("prev_ts") > 1800L * NS, 1L).otherwise(0L))
          .cast("long").as("n_sessions"),
        count(lit(1)).as("n_events"))
      .orderBy("user_id")
  }

  /** As-of join: for each purchase, the most recent strictly-earlier click
    * by the same user. Implemented the scale-safe way — a single union-free
    * window pass (carry-forward of the last click id per user in time
    * order), NOT a quadratic self-join; the oracle states the same
    * semantics relationally with a ranked window.
    *
    * Tie semantics are pinned explicitly (both sides): a click at the SAME
    * instant as the purchase is excluded (strictly earlier), and among
    * equal-ts clicks the larger event_id wins. The sort key (ts, side,
    * event_id) with purchase-side 0 < click-side 1 realizes both rules in
    * one ordering — same trick as [[graft.operators.AsOf.joinAsOf]]'s
    * __side column.
    */
  val asofJoin: QueryDef = q(
    "q24_asof_join",
    """SELECT purchase_id, last_click_id FROM (
      |  SELECT p.event_id AS purchase_id, c.event_id AS last_click_id,
      |         row_number() OVER (PARTITION BY p.event_id
      |                            ORDER BY c.ts DESC, c.event_id DESC) AS rn
      |  FROM events p
      |  JOIN events c
      |    ON c.user_id = p.user_id AND c.event_type = 'click' AND c.ts < p.ts
      |  WHERE p.event_type = 'purchase')
      |WHERE rn = 1
      |ORDER BY purchase_id""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d)
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("user_id"), col("event_id"), col("event_type"), col("ts"),
        // purchases sort before clicks at an equal instant, so a same-ts
        // click is OUTSIDE the (unboundedPreceding, -1) frame → strict <
        when(col("event_type") === "purchase", 0).otherwise(1).as("side"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("side"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    ev.withColumn("last_click_id",
        last(when(col("event_type") === "click", col("event_id")), ignoreNulls = true)
          .over(w))
      .filter(col("event_type") === "purchase" && col("last_click_id").isNotNull)
      .select(col("event_id").as("purchase_id"), col("last_click_id"))
      .orderBy("purchase_id")
  }

  /** Time-band range join: events following each purchase within 60s by the
    * same user. Equi-join on user_id carries the shuffle; the band predicate
    * is applied post-join (AQE handles per-user skew).
    */
  val timeRangeJoin: QueryDef = q(
    "q25_time_range_join",
    """SELECT p.event_id AS purchase_id, count(*) AS n_follow
      |FROM events p
      |JOIN events f
      |  ON f.user_id = p.user_id
      | AND f.ts > p.ts AND f.ts <= p.ts + INTERVAL 60 SECOND
      |WHERE p.event_type = 'purchase'
      |GROUP BY p.event_id
      |ORDER BY purchase_id""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts").as("p_ts"))
    val f = ev.select(col("user_id").as("f_user"), col("ts").as("f_ts"))
    p.join(f,
        col("f_user") === col("p_user") &&
          col("f_ts") > col("p_ts") && col("f_ts") <= col("p_ts") + lit(60L * NS))
      .groupBy(col("purchase_id"))
      .agg(count(lit(1)).as("n_follow"))
      .orderBy("purchase_id")
  }

  /** JSON extraction from the string `props` column. */
  val jsonExtract: QueryDef = q(
    "q26_json_extract",
    """SELECT event_type,
      |  count(*) AS n_events,
      |  CAST(sum(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
      |  min(CAST(props->>'$.k' AS BIGINT)) AS min_k,
      |  max(CAST(props->>'$.k' AS BIGINT)) AS max_k
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin) { (s, d) =>
    val k = get_json_object(col("props"), "$.k").cast("long")
    Tables.events(s, d)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(k).as("sum_k"),
        min(k).as("min_k"),
        max(k).as("max_k"))
      .orderBy("event_type")
  }

  /** Two-step conversion funnel: users who clicked, and of those, users
    * with a purchase STRICTLY AFTER their first click — the ordered-
    * sequence semantics that separate a funnel from two independent
    * counts. Shape: two grouped min-aggregates and one equi-join on
    * user_id; each step's output is one row per converting user, so the
    * final counts are trivial.
    */
  val funnel: QueryDef = q(
    "q39_funnel",
    """WITH c AS (SELECT user_id, min(epoch_ns(ts)) AS c1
      |           FROM events WHERE event_type = 'click' GROUP BY user_id),
      |p AS (SELECT e.user_id
      |      FROM events e JOIN c ON c.user_id = e.user_id
      |      WHERE e.event_type = 'purchase' AND epoch_ns(e.ts) > c.c1
      |      GROUP BY e.user_id)
      |SELECT '1_click' AS step, count(*) AS n_users FROM c
      |UNION ALL
      |SELECT '2_click_then_purchase' AS step, count(*) AS n_users FROM p
      |ORDER BY step""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d)
    val c = ev.filter(col("event_type") === "click")
      .groupBy(col("user_id")).agg(min(col("ts")).as("c1"))
    val p = ev.filter(col("event_type") === "purchase")
      .join(c, "user_id")
      .filter(col("ts") > col("c1"))
      .select(col("user_id")).distinct()
    c.agg(count(lit(1)).as("n_users"))
      .select(lit("1_click").as("step"), col("n_users"))
      .union(p.agg(count(lit(1)).as("n_users"))
        .select(lit("2_click_then_purchase").as("step"), col("n_users")))
      .orderBy("step")
  }

  /** q41: cohort retention — the standard product-analytics matrix: users
    * bucketed by FIRST-active day (the cohort), then distinct-user counts
    * per (cohort, day offset). All integer day arithmetic on the raw
    * nanosecond LONG, so both engines bucket identically.
    *
    * Scale shape: the first-active aggregate is min() per user (O(1)
    * state); the activity rows re-join it keyed on user_id (AQE-planned,
    * both sides hash-partitioned on the key); the retention cell count is
    * a two-key distinct aggregate — partial aggregation applies, no
    * windows, no lists. The cell matrix itself is tiny (cohorts ×
    * horizon), whatever the event volume.
    */
  val cohortRetention: QueryDef = q(
    "q41_cohort_retention",
    """WITH e AS (SELECT user_id,
      |             epoch_ns(ts) // (86400 * CAST(1000000000 AS BIGINT)) AS day
      |           FROM events),
      |f AS (SELECT user_id, min(day) AS cohort FROM e GROUP BY user_id)
      |SELECT cohort, day - cohort AS day_offset,
      |       count(DISTINCT user_id) AS n_users
      |FROM e JOIN f USING (user_id)
      |GROUP BY 1, 2
      |ORDER BY cohort, day_offset""".stripMargin) { (s, d) =>
    val dayNs = 86400L * NS
    // `div`, not `/`: double division loses integer precision above 2^53
    // (ts is ~1.7e18 ns) and would mis-bucket boundary events
    val e = Tables.events(s, d)
      .select(col("user_id"), expr(s"ts div ${dayNs}L").as("day"))
    val f = e.groupBy(col("user_id")).agg(min(col("day")).as("cohort"))
    e.join(f, "user_id")
      .groupBy(col("cohort"), (col("day") - col("cohort")).as("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy("cohort", "day_offset")
  }

  /** q42: event-transition matrix — per-user consecutive event-type pairs
    * (the first-order Markov view of behavioral sequences: what users do
    * NEXT after each action). `lag(event_type)` over the per-user time
    * order, then counts per (prev, next) cell; `n_users` adds the
    * distinct-user reach of each transition.
    *
    * Determinism: the per-user order is (ts, event_id) — event_id is
    * unique, so equal-timestamp events order identically in both engines.
    *
    * Scale shape: one shuffle keyed on user_id for the window; lag(1)
    * holds a single-row frame, so window state is O(1) per user however
    * long the history (the sort within a user streams, spillable). The
    * transition matrix itself is |types|² cells — partial aggregation
    * collapses the exploded pairs map-side, and the distinct-user count
    * re-aggregates (prev, next, user) keys, still bounded by users ×
    * |types|². A pathologically hot user serializes only their own
    * partition — inherent to per-user sequencing, noted, and AQE cannot
    * split a window partition; at 100 TB the mitigation is sessionized
    * sub-keys, which q23 demonstrates.
    */
  val eventTransitions: QueryDef = q(
    "q42_event_transitions",
    """WITH t AS (
      |  SELECT user_id, event_type,
      |         lag(event_type) OVER (PARTITION BY user_id
      |                               ORDER BY ts, event_id) AS prev_type
      |  FROM events)
      |SELECT prev_type, event_type AS next_type,
      |       count(*) AS n_transitions,
      |       count(DISTINCT user_id) AS n_users
      |FROM t
      |WHERE prev_type IS NOT NULL
      |GROUP BY 1, 2
      |ORDER BY prev_type, next_type""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type").as("next_type"))
      .agg(count(lit(1)).as("n_transitions"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy("prev_type", "next_type")
  }

  /** q43: recursive day spine + activity audit — a RECURSIVE CTE (Spark
    * 4.1's `WITH RECURSIVE` surface) generates every calendar day between
    * the corpus's first and last event, then a left join reports each
    * day's event count and gap flag. The spine is how real reporting
    * handles zero-activity periods, which plain GROUP BY silently skips.
    *
    * Scale shape: the day bounds come from ONE min/max aggregate whose
    * 2-long result is collected on the driver (same bounded-driver-action
    * class as the CC edge threshold) and spliced into the recursive SQL as
    * literals — so each recursion step is O(1) arithmetic on the previous
    * spine row, and the events table is scanned exactly once (for the
    * per-day counts). Anchoring the recursion on the `bounds` RELATION
    * instead would make Spark re-evaluate that full-table aggregate every
    * iteration (depth = days spanned → thousands of scans over years of
    * history); the literal splice is what keeps the loop invariant out of
    * the loop. PlanQualitySpec pins the single-scan property structurally.
    * The DuckDB oracle keeps the self-contained `bounds` CTE — it states
    * the same semantics and DuckDB materializes non-recursive CTEs once.
    */
  val activitySpine: QueryDef = q(
    "q43_activity_spine",
    """WITH RECURSIVE
      |bounds AS (SELECT min(epoch_ns(ts) // 86400000000000) AS d0,
      |                  max(epoch_ns(ts) // 86400000000000) AS d1
      |           FROM events),
      |spine(day) AS (
      |  SELECT d0 FROM bounds
      |  UNION ALL
      |  SELECT day + 1 FROM spine, bounds WHERE day < d1),
      |act AS (SELECT epoch_ns(ts) // 86400000000000 AS day,
      |               count(*) AS n_events
      |        FROM events GROUP BY 1)
      |SELECT s.day, CAST(coalesce(act.n_events, 0) AS BIGINT) AS n_events,
      |       coalesce(act.n_events, 0) = 0 AS is_gap
      |FROM spine s LEFT JOIN act ON act.day = s.day
      |ORDER BY s.day""".stripMargin) { (s, d) =>
    daySpine(Tables.events(s, d))
  }

  /** The q43 computation over any frame with a raw-ns `ts` column.
    *
    * The day bounds are hoisted OUT of the recursion: one min/max aggregate,
    * its 2-long result collected and inlined as literals, so the recursive
    * step never touches the events table (see [[activitySpine]] scaladoc).
    */
  def daySpine(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    // Bounded driver action: exactly one row of two longs — the recursion
    // anchor, not data.
    val b = events
      .agg(min(expr("ts div 86400000000000")).as("d0"),
        max(expr("ts div 86400000000000")).as("d1"))
      .collect()(0)
    if (b.isNullAt(0)) {
      // no events → empty spine with the contract schema
      return spark.sql(
        """SELECT CAST(NULL AS BIGINT) AS day,
          |       CAST(NULL AS BIGINT) AS n_events,
          |       CAST(NULL AS BOOLEAN) AS is_gap
          |WHERE FALSE""".stripMargin)
    }
    val (d0, d1) = (b.getLong(0), b.getLong(1))
    val n = d1 - d0 + 1
    events.createOrReplaceTempView("events_rec")
    // Doubling recursion: generation k covers [d0, d0 + 2^k) by exploding
    // each previous-generation day into (day, day + span). Depth is
    // ceil(log2 n) — a decade-long spine is 12 iterations, not 3650 — and
    // each Spark recursion iteration is a whole job, so log-depth is what
    // keeps the fixed per-iteration cost from dominating. Only the last
    // generation (span >= n) survives the outer filter; earlier partial
    // generations are discarded, so no duplicate days.
    spark.sql(s"""WITH RECURSIVE
      |spine0(day, span) AS (
      |  SELECT CAST($d0 AS BIGINT) AS day, CAST(1 AS BIGINT) AS span
      |  UNION ALL
      |  SELECT day + off, span * 2
      |  FROM spine0 LATERAL VIEW explode(array(CAST(0 AS BIGINT), span)) AS off
      |  WHERE span < $n),
      |spine AS (SELECT day FROM spine0 WHERE span >= $n AND day <= $d1),
      |act AS (SELECT ts div 86400000000000 AS day, count(*) AS n_events
      |        FROM events_rec GROUP BY 1)
      |SELECT s.day, CAST(coalesce(act.n_events, 0) AS BIGINT) AS n_events,
      |       coalesce(act.n_events, 0) = 0 AS is_gap
      |FROM spine s LEFT JOIN act ON act.day = s.day
      |ORDER BY s.day""".stripMargin)
  }

  /** q48: FORWARD as-of with a conversion window — for each click, the
    * NEXT purchase by the same user within 120 s (ties at an instant break
    * to the smallest purchase id). Exercises [[AsOf.joinAsOfForward]]'s
    * negated-time plan: one union + one key-window shuffle; the oracle
    * states the same semantics as the quadratic key-join + rank.
    */
  val forwardAsof: QueryDef = q(
    "q48_forward_asof",
    """SELECT click_id, next_purchase_id, wait_ns FROM (
      |  SELECT c.event_id AS click_id, p.event_id AS next_purchase_id,
      |         epoch_ns(p.ts) - epoch_ns(c.ts) AS wait_ns,
      |         row_number() OVER (PARTITION BY c.event_id
      |                            ORDER BY p.ts, p.event_id) AS rn
      |  FROM events c
      |  JOIN events p
      |    ON p.user_id = c.user_id AND p.event_type = 'purchase'
      |   AND p.ts >= c.ts
      |   AND epoch_ns(p.ts) - epoch_ns(c.ts) <= 120000000000
      |  WHERE c.event_type = 'click')
      |WHERE rn = 1
      |ORDER BY click_id""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts").as("c_ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_id"), col("ts"),
        // joinAsOf attaches the LARGEST tie-break among same-instant
        // rows; negate the id so the smallest purchase id wins, matching
        // the oracle's ORDER BY p.event_id
        (-col("event_id")).as("nid"))
    AsOf.joinAsOfForward(clicks, purchases, "user_id", "c_ts", "ts",
      tieBreak = Seq("nid"), toleranceNs = Some(120L * 1000 * 1000 * 1000))
      .filter(col("p_id").isNotNull)
      .select(col("click_id"), col("p_id").as("next_purchase_id"),
        (col("ts") - col("c_ts")).as("wait_ns"))
      .orderBy("click_id")
  }

  /** q49: TIME-based (RANGE) window frame — trailing 1-hour count and
    * exact-decimal value sum per user at every event. RANGE frames are
    * semantically distinct from the q31 ROWS frames (the frame boundary
    * is a VALUE offset on the ordering key, and same-instant peers are
    * all in-frame regardless of row order), and on the engine's LONG-ns
    * time axis the offset is exact integer arithmetic on both engines.
    * The decimal sum keeps the frame aggregate order-free; cast to
    * double only at output.
    */
  val rangeFrame: QueryDef = q(
    "q49_range_frame",
    """SELECT user_id, event_id,
      |  count(*) OVER wr AS n_1h,
      |  CAST(sum(CAST(value AS DECIMAL(12,2))) OVER wr AS DOUBLE) AS sum_1h
      |FROM events
      |WINDOW wr AS (PARTITION BY user_id ORDER BY epoch_ns(ts)
      |              RANGE BETWEEN 3600000000000 PRECEDING AND CURRENT ROW)
      |ORDER BY user_id, event_id""".stripMargin) { (s, d) =>
    val wr = Window.partitionBy(col("user_id")).orderBy(col("ts"))
      .rangeBetween(-3600000000000L, Window.currentRow)
    Tables.events(s, d).select(
      col("user_id"), col("event_id"),
      count(lit(1)).over(wr).as("n_1h"),
      sum(money(col("value"))).over(wr).cast("double").as("sum_1h"))
      .orderBy("user_id", "event_id")
  }

  def defs: Seq[QueryDef] = Seq(
    windowRunning, hourlyRollup, sessionize, asofJoin, timeRangeJoin,
    jsonExtract, funnel, cohortRetention, eventTransitions, activitySpine,
    forwardAsof, rangeFrame)
}
