package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface (SURVEY.md §2.9).
  *
  * The reference's write path is streaming-shaped — an unbounded generator
  * feeding per-event writers (`write/hdf.py:493-516`) — but it has no
  * reader-side stream semantics. This module supplies both directions the
  * Spark-native way:
  *
  *   - [[events]]: file-source stream over the events table (micro-batch
  *     discovery of new parquet files — the 100 TB ingest pattern);
  *   - [[hourlyRollup]]: watermarked tumbling-window aggregate (same
  *     semantics as the batch `q22_hourly_rollup`, verified equal in the
  *     spec);
  *   - [[sessionize]]: custom per-key state via flatMapGroupsWithState —
  *     gap-based sessions with the same 30-min rule as `q23_sessionize`;
  *   - [[ingest]]: foreachBatch append sink — exactly-once-per-batch
  *     parquet appends, the streaming form of the hep facade's chunked
  *     writes.
  *
  * `ts` is the raw nanosecond LONG (see [[graft.EngineSession]]); event
  * time for watermarking is derived as microseconds.
  */
object EventStream {

  final case class Ev(
      event_id: Long, ts: Long, user_id: Long, event_type: String,
      value: Double)

  final case class UserSessions(user_id: Long, n_sessions: Long, n_events: Long)

  val SessionGapNs: Long = 1800L * 1000000000L

  /** Streaming view of a directory of events parquet files. The file
    * source discovers newly-landed files per micro-batch; note it requires
    * a DIRECTORY (a bare single-file path breaks its base-path inference).
    */
  def events(spark: SparkSession, eventsDir: String): DataFrame = {
    val schema = spark.read.parquet(eventsDir).schema
    // same LONG-ns `ts` contract as the batch loader, whatever the files'
    // physical timestamp type (see Tables.normalizeTs)
    graft.Tables.normalizeTs(spark.readStream.schema(schema).parquet(eventsDir))
  }

  /** Tumbling 1-hour windows with a 1-hour watermark: late events beyond
    * the watermark are dropped, state is bounded — the scale-safe shape of
    * the batch hourly rollup.
    */
  def hourlyRollup(events: DataFrame): DataFrame =
    events
      .withColumn("t", timestamp_micros(expr("ts div 1000")))
      .withWatermark("t", "1 hour")
      .groupBy(window(col("t"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(12,2)")).cast("double").as("sum_value"))
      .select(
        expr("unix_micros(window.start) div 3600000000").as("hour_id"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** [[Ev]] plus the derived event-time column the watermark rides on. */
  final case class EvT(
      event_id: Long, ts: Long, user_id: Long, event_type: String,
      value: Double, et: java.sql.Timestamp)

  /** How long past a user's last event their session state survives before
    * eviction, in EVENT time. Once the watermark passes lastTs + this TTL no
    * event can extend or reopen the old session (the TTL is ≥ the 30-min
    * gap), so eviction never changes session counts — a later event starts
    * a fresh session either way. The running totals restart from zero for
    * such a user, which Update-mode consumers handle by summing deltas
    * downstream.
    */
  val StateTtlMs: Long = 2L * 3600 * 1000

  /** Gap-based sessionization with explicit per-user state. Events within a
    * micro-batch are sorted by (ts, event_id); state carries the last seen
    * timestamp and running counts across batches. State is evicted on an
    * EVENT-time timeout: when the 2-hour watermark passes a user's last
    * event + [[StateTtlMs]], their state is dropped, bounding memory at
    * scale (without eviction, state grows with the number of distinct users
    * ever seen). Event-time (not processing-time) timeouts also keep the
    * micro-batch engine quiescent on an idle source — timeout checks fire
    * only when the watermark actually advances.
    */
  def sessionize(events: Dataset[Ev]): Dataset[UserSessions] = {
    import events.sparkSession.implicits._

    // locals, not object members: the update closure ships to executors and
    // must not capture the (non-serializable) EventStream object itself
    val ttlMs = StateTtlMs
    val gapNs = SessionGapNs

    def update(
        userId: Long, batch: Iterator[EvT],
        state: GroupState[(Long, Long, Long)]): Iterator[UserSessions] = {
      if (state.hasTimedOut) {
        state.remove()
        Iterator.empty
      } else {
        var (lastTs, sessions, nEvents) =
          state.getOption.getOrElse((Long.MinValue, 0L, 0L))
        batch.toSeq.sortBy(e => (e.ts, e.event_id)).foreach { e =>
          if (lastTs == Long.MinValue || e.ts - lastTs > gapNs) sessions += 1
          lastTs = e.ts
          nEvents += 1
        }
        state.update((lastTs, sessions, nEvents))
        // evict when the watermark passes last-event + TTL (the timestamp
        // must sit strictly beyond the current watermark or Spark rejects it)
        state.setTimeoutTimestamp(
          math.max(lastTs / 1000000L + ttlMs, state.getCurrentWatermarkMs() + 1))
        Iterator.single(UserSessions(userId, sessions, nEvents))
      }
    }

    events
      .withColumn("et", timestamp_micros(expr("ts div 1000")))
      .withWatermark("et", "2 hours")
      .as[EvT]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Update, GroupStateTimeout.EventTimeTimeout)(update)
  }

  /** Spark's NATIVE session windows (`session_window` aggregate) over the
    * event stream — the built-in counterpart to the custom-state
    * [[sessionize]]/[[sessionDeltas]] pair, with the same 30-minute gap
    * rule. Returns one FINAL row per closed session (Append mode: a
    * session emits once the watermark passes its end + gap), carrying the
    * session bounds in event-time micros and the event count.
    *
    * Why both exist: `session_window` is the right default — state
    * management, merging of overlapping partial sessions, and watermark
    * eviction are the engine's problem, and the aggregation is
    * merge-order-free — while the FMGWS twins exist for semantics the
    * built-in cannot express (emitting ±1 boundary deltas mid-session,
    * running per-session counters, the q61 composition). The spec pins
    * this against the batch gap-rule sessionization: same session count,
    * same bounds, same per-session event counts.
    */
  def sessionWindows(events: Dataset[Ev]): DataFrame =
    events
      .withColumn("et", timestamp_micros(expr("ts div 1000")))
      .withWatermark("et", "2 hours")
      .groupBy(col("user_id"), session_window(col("et"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("s0_us"),
        unix_micros(col("session_window.end")).as("s1_us"),
        col("n_events"))

  /** One emitted behavioral transition (the streaming form of the batch
    * q42 matrix cell contribution).
    */
  final case class Transition(
      user_id: Long, prev_type: String, next_type: String)

  /** Streaming event-transition extraction — q42's incremental twin: per
    * user, every consecutive (prev, next) event-type pair is emitted as it
    * becomes known; downstream a grouped count maintains the live Markov
    * matrix. State per user is ONE row (last event's ts/id/type); events
    * inside a micro-batch are sorted by (ts, event_id) — the same order
    * the batch window uses — and cross-batch continuity comes from the
    * carried last event. Sequencing REQUIRES materializing one user's
    * slice of one micro-batch (`batch.toSeq.sortBy`): that memory is
    * bounded by per-user per-trigger volume, the correct contract for
    * state-ful sequencing — but a single-user firehose concentrates its
    * whole trigger in one task (inherent to any per-key ordering,
    * exactly as the batch q42 window does; cap trigger size via
    * `maxOffsetsPerTrigger`-style source limits if one key can dominate
    * a trigger). Same event-time TTL eviction as [[sessionize]]:
    * after a user is idle past the watermark + TTL their state drops (the
    * transition spanning that idle gap is the one emission sacrificed for
    * bounded state — at 100 TB, unbounded user registries are the failure
    * mode, not a missing stale-gap edge).
    */
  def transitions(events: Dataset[Ev]): Dataset[Transition] = {
    import events.sparkSession.implicits._
    val ttlMs = StateTtlMs

    def update(
        userId: Long, batch: Iterator[EvT],
        state: GroupState[(Long, Long, String)]): Iterator[Transition] = {
      if (state.hasTimedOut) {
        state.remove()
        Iterator.empty
      } else {
        var (lastTs, lastId, lastType) =
          state.getOption.getOrElse((Long.MinValue, 0L, null: String))
        val out = Seq.newBuilder[Transition]
        batch.toSeq.sortBy(e => (e.ts, e.event_id)).foreach { e =>
          if (lastType != null) out += Transition(userId, lastType, e.event_type)
          lastTs = e.ts; lastId = e.event_id; lastType = e.event_type
        }
        state.update((lastTs, lastId, lastType))
        state.setTimeoutTimestamp(
          math.max(lastTs / 1000000L + ttlMs, state.getCurrentWatermarkMs() + 1))
        out.result().iterator
      }
    }

    events
      .withColumn("et", timestamp_micros(expr("ts div 1000")))
      .withWatermark("et", "2 hours")
      .as[EvT]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
  }

  /** Exact integer cents of a double `value`, mirroring the batch side's
    * CAST(value AS DECIMAL(12,2)) — HALF_UP on the double's shortest
    * decimal form, away from zero. Shared by [[anomalies]] and
    * [[userTotals]] so every streaming op quantizes identically.
    */
  private[streaming] def centsOf(v: Double): Long =
    (BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100)
      .toLongExact

  /** Live per-user totals. */
  final case class UserTotals(user_id: Long, n_events: Long, sum_cents: Long)

  /** Per-user running totals via `transformWithState` — Structured
    * Streaming's CURRENT arbitrary-state API (Spark 4; typed state
    * handles + explicit timers, RocksDB-backed), shown here so the
    * engine exercises both state APIs: the FMGWS operators above predate
    * it and remain for their finer semantics, this is the shape new
    * stateful operators should take. State per user is one (n, Σcents)
    * pair in a [[org.apache.spark.sql.streaming.ValueState]]; eviction
    * is an explicit EVENT-TIME TIMER at last-event + [[StateTtlMs]]
    * (re-registered per trigger, the previous timer deleted — timers
    * accumulate otherwise), firing `handleExpiredTimer` which drops the
    * user. Requires the RocksDB state store provider (the spec sets
    * `spark.sql.streaming.stateStore.providerClass`); totals are exact
    * integer cents via [[centsOf]], so stream ≡ batch is an integer
    * identity (spec-pinned across a trigger cut).
    */
  /** @param ttlMs idle horizon before a user's totals drop. NOTE the
    *   semantic difference from the FMGWS family: an event-time TIMER
    *   fires when the watermark passes it even if the key has data in
    *   the same trigger (FMGWS timeouts fire only for data-less keys),
    *   so a user idle past the TTL RESTARTS FROM ZERO on return —
    *   eviction here is by idle time, not by "idle and silent". Both
    *   contracts are spec-pinned; size ttlMs to the stream's real idle
    *   distribution.
    */
  def userTotals(events: Dataset[Ev],
      ttlMs: Long = StateTtlMs): Dataset[UserTotals] = {
    import events.sparkSession.implicits._
    events
      .withColumn("et", timestamp_micros(expr("ts div 1000")))
      .withWatermark("et", "2 hours")
      .as[EvT]
      .groupByKey(_.user_id)
      .transformWithState(new UserTotalsProcessor(ttlMs),
        org.apache.spark.sql.streaming.TimeMode.EventTime(),
        OutputMode.Update)
  }

  /** One running-z-score anomaly: the event scored against the exact
    * moments of the user's PRIOR events (value carried as integer cents).
    */
  final case class Anomaly(user_id: Long, event_id: Long, cents: Long, z: Double)

  /** Streaming running z-score anomaly detection — the incremental twin of
    * the batch q55 shape, under the PREFIX contract: each event is scored
    * against the exact moments of the user's PRIOR events only (the only
    * information a stream can have at emission time), flagged when
    * |z| > 3 with sample variance over n ≥ 2 priors.
    *
    * State per user is THREE LONGS (n, Σ, Σ²) in exact integer cents —
    * order-free, overflow-safe to ~10⁶ events/user at this value range,
    * and byte-identical to the batch prefix-window computation
    * (spec-pinned): both sides evaluate the same double expression over
    * the same exact integers. Micro-batch sequencing and watermark + TTL
    * eviction follow [[transitions]]: per-user per-trigger slices are
    * sorted by (ts, event_id), idle users' moments drop after the TTL (a
    * re-appearing user restarts cold — bounded state is the 100 TB
    * contract, a forever-moment registry is the failure mode).
    *
    * PREFIX-BY-ARRIVAL contract for cross-trigger late data: "prior"
    * means prior IN ARRIVAL ORDER. An in-watermark event arriving a
    * trigger late is scored against moments that already include
    * later-timestamped events — the stream ≡ batch(ts-order) identity is
    * exact only when arrival order respects timestamp order (the common
    * log-shipping case; EventStreamSpec pins BOTH the in-order identity
    * and the out-of-order arrival-order semantics). Buffering up to the
    * watermark before folding would recover ts-order at the cost of a
    * per-user buffer; this operator chooses 3-long state.
    */
  def anomalies(events: Dataset[Ev]): Dataset[Anomaly] = {
    import events.sparkSession.implicits._
    val ttlMs = StateTtlMs

    def update(
        userId: Long, batch: Iterator[EvT],
        state: GroupState[(Long, Long, Long, Long)]): Iterator[Anomaly] = {
      if (state.hasTimedOut) {
        state.remove()
        Iterator.empty
      } else {
        var (lastTs, n, sx, sxx) = state.getOption.getOrElse((Long.MinValue, 0L, 0L, 0L))
        val out = Seq.newBuilder[Anomaly]
        batch.toSeq.sortBy(e => (e.ts, e.event_id)).foreach { e =>
          // the batch side quantizes through CAST(value AS DECIMAL(12,2)):
          // HALF_UP on the double's shortest decimal form, away from zero.
          // math.round would differ on negative half-cent values
          // (-0.125 → -12 vs -13), so mirror the cast exactly
          val c = (BigDecimal(e.value)
            .setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100).toLongExact
          if (n >= 2) {
            // the SAME double tree the batch prefix-window query builds:
            // every operand enters as an exact integer, divisions are the
            // only rounding points, so stream ≡ batch bit-for-bit
            val v = (sxx.toDouble - sx.toDouble * sx.toDouble / n) / (n - 1)
            if (v > 0) {
              val z = (c.toDouble - sx.toDouble / n) / math.sqrt(v)
              if (math.abs(z) > 3) out += Anomaly(userId, e.event_id, c, z)
            }
          }
          // addExact/multiplyExact: c² reaches 1e20 for DECIMAL(12,2)-range
          // values — past Long at ~3e9 cents. Overflow must fail loudly
          // (wrong z-scores silently otherwise); production ranges needing
          // more headroom should widen to two-long / BigInt accumulation
          n += 1
          sx = Math.addExact(sx, c)
          sxx = Math.addExact(sxx, Math.multiplyExact(c, c))
          lastTs = e.ts
        }
        state.update((lastTs, n, sx, sxx))
        state.setTimeoutTimestamp(
          math.max(lastTs / 1000000L + ttlMs, state.getCurrentWatermarkMs() + 1))
        out.result().iterator
      }
    }

    events
      .withColumn("et", timestamp_micros(expr("ts div 1000")))
      .withWatermark("et", "2 hours")
      .as[EvT]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
  }

  /** One ±1 session-boundary delta, emitted when a session CLOSES: +1 at
    * the session's first event, −1 at one nanosecond past its last (the
    * q61 convention — a session is concurrent through its last instant).
    */
  final case class SessionDelta(t: Long, d: Int)

  /** Per-hour concurrency components under the TWO-LEVEL contract: the
    * bucket's final profile is `local_max + Σ bucket_total of all PRIOR
    * buckets` — the same offset stitching the batch q61 uses, done by the
    * consumer over the (tiny, one-row-per-hour) emitted spine.
    */
  final case class HourConc(bucket: Long, local_max: Long, bucket_total: Long,
    n_deltas: Long)

  /** [[SessionDelta]] plus its hour bucket and the derived event-time
    * column the stage-2 watermark rides on.
    */
  final case class DeltaT(t: Long, d: Int, bucket: Long,
    et: java.sql.Timestamp)

  val HourNs: Long = 3600L * 1000000000L

  /** Stage 1 of the streaming q61 twin: gap-based sessions (the 30-min
    * rule of [[sessionize]]) emitted as ±1 boundary deltas WHEN THE
    * SESSION CLOSES — either an in-order event opens the next session, or
    * event-time TTL eviction closes a trailing one. A session's end moves
    * while it is open, so close-time is the earliest a stream can emit
    * its −1 truthfully; the TTL (≥ the gap, with the watermark filtering
    * anything older) guarantees eviction can never split a session a
    * later event would have extended — closure is exact, not lossy.
    * Sequencing contract matches [[anomalies]]: per-arrival-order across
    * triggers, (ts, event_id)-sorted within a trigger.
    *
    * Scale shape: state per user is TWO LONGS (open session's start +
    * last event); emitted deltas are one pair per session, a tiny
    * fraction of event volume. The composition point with [[concurrency]]
    * is an intermediate sink (e.g. [[ingest]]'s idempotent parquet dirs
    * or a topic) — two chained stateful queries, each with bounded state,
    * rather than one multi-stateful-operator query whose FMGWS chaining
    * Structured Streaming restricts.
    */
  def sessionDeltas(events: Dataset[Ev]): Dataset[SessionDelta] = {
    import events.sparkSession.implicits._
    val ttlMs = StateTtlMs
    val gapNs = SessionGapNs

    def update(
        userId: Long, batch: Iterator[EvT],
        state: GroupState[(Long, Long)]): Iterator[SessionDelta] = {
      if (state.hasTimedOut) {
        val (s0, s1) = state.get
        state.remove()
        Iterator(SessionDelta(s0, 1), SessionDelta(s1 + 1, -1))
      } else {
        var open = state.getOption // (s0, lastTs) of the open session
        val out = Seq.newBuilder[SessionDelta]
        batch.toSeq.sortBy(e => (e.ts, e.event_id)).foreach { e =>
          open match {
            case Some((s0, s1)) if e.ts - s1 > gapNs =>
              out += SessionDelta(s0, 1) += SessionDelta(s1 + 1, -1)
              open = Some((e.ts, e.ts))
            case Some((s0, _)) => open = Some((s0, math.max(open.get._2, e.ts)))
            case None => open = Some((e.ts, e.ts))
          }
        }
        val (s0, s1) = open.get
        state.update((s0, s1))
        state.setTimeoutTimestamp(
          math.max(s1 / 1000000L + ttlMs, state.getCurrentWatermarkMs() + 1))
        out.result().iterator
      }
    }

    events
      .withColumn("et", timestamp_micros(expr("ts div 1000")))
      .withWatermark("et", "2 hours")
      .as[EvT]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
  }

  /** Stage 2 of the streaming q61 twin: the sweep-line profile as per-HOUR
    * keyed state. Each bucket's state is its delta list so far (bounded by
    * sessions touching that hour — per-bucket volume, never corpus
    * volume); every trigger re-sorts the bucket's deltas in the batch
    * order (t, starts-first) and emits the updated (local_max,
    * bucket_total) pair in Update mode. The consumer stitches final
    * values over the hour spine: `conc(b) = local_max(b) + Σ_{b'<b}
    * bucket_total(b')` — exactly the batch q61 two-level prefix sum, so
    * stream ≡ batch is an integer identity (spec-pinned, including a
    * mid-hour trigger cut). Buckets evict once the watermark passes their
    * end + TTL: by then no in-watermark delta can land in them, the
    * emitted pair is final, and state stays bounded by the TTL horizon.
    *
    * Delta-point semantics (same as batch q61): only hours containing a
    * session boundary emit a row; fully-spanned quiet hours inherit the
    * prior spine level at stitch time.
    */
  def concurrency(deltas: Dataset[SessionDelta]): Dataset[HourConc] = {
    import deltas.sparkSession.implicits._
    val ttlMs = StateTtlMs
    val hourNs = HourNs

    def update(
        bucket: Long, batch: Iterator[DeltaT],
        state: GroupState[Seq[(Long, Int)]]): Iterator[HourConc] = {
      if (state.hasTimedOut) {
        state.remove()
        Iterator.empty
      } else {
        val all = (state.getOption.getOrElse(Seq.empty) ++
          batch.map(x => (x.t, x.d))).sortBy { case (t, d) => (t, -d) }
        state.update(all)
        var run = 0L; var mx = Long.MinValue
        all.foreach { case (_, d) => run += d; if (run > mx) mx = run }
        val bucketEndMs = (bucket + 1) * (hourNs / 1000000L)
        state.setTimeoutTimestamp(
          math.max(bucketEndMs + ttlMs, state.getCurrentWatermarkMs() + 1))
        // n_deltas is the update sequence: a bucket's row with the most
        // deltas folded in supersedes earlier Update-mode emissions
        Iterator.single(HourConc(bucket, mx, run, all.length.toLong))
      }
    }

    deltas
      .withColumn("bucket", expr(s"t div $hourNs"))
      .withColumn("et", timestamp_micros(expr("t div 1000")))
      .withWatermark("et", "2 hours")
      .as[DeltaT]
      .groupByKey(_.bucket)
      .flatMapGroupsWithState(
        OutputMode.Update, GroupStateTimeout.EventTimeTimeout)(update)
  }

  /** Streaming exact dedup: drops events whose `event_id` was already seen,
    * with state BOUNDED by the watermark — the streaming form of the batch
    * `d01` exact dedup. `dropDuplicatesWithinWatermark` keeps a key's state
    * only until the watermark passes it (unlike plain `dropDuplicates`,
    * whose state grows with every distinct key ever seen — unusable on an
    * unbounded stream). At-least-once dedup within the watermark horizon:
    * exactly what ingest retries (see [[ingest]]) need upstream.
    */
  def dedupe(events: Dataset[Ev]): Dataset[Ev] = {
    import events.sparkSession.implicits._
    events
      .withColumn("et", timestamp_micros(expr("ts div 1000")))
      .withWatermark("et", "2 hours")
      .dropDuplicatesWithinWatermark("event_id")
      .drop("et")
      .as[Ev]
  }

  /** Stream-STREAM interval join: click→purchase attribution. Each
    * purchase joins every click by the same user within the preceding
    * `horizonMin` minutes. Both sides carry a watermark and the join
    * condition bounds event time in both directions, so Spark can expire
    * join state as the watermark advances — the requirements for an
    * unbounded stream-stream inner join to run with bounded memory.
    */
  def attribution(events: Dataset[Ev], horizonMin: Int = 30): DataFrame = {
    val base = events
      .withColumn("et", timestamp_micros(expr("ts div 1000")))
    val clicks = base.filter(col("event_type") === "click")
      .withWatermark("et", "1 hour")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("et").as("ct"))
    val purchases = base.filter(col("event_type") === "purchase")
      .withWatermark("et", "1 hour")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("et").as("pt"))
    clicks.join(purchases,
      col("c_user") === col("p_user") &&
        col("pt") >= col("ct") &&
        col("pt") <= col("ct") + expr(s"INTERVAL $horizonMin MINUTES"))
      .select(col("c_user").as("user_id"), col("click_id"), col("purchase_id"),
        col("ct"), col("pt"))
  }

  /** Stream-STREAM interval join, LEFT OUTER: attribution where
    * unconverted clicks are part of the answer. A streaming left-outer
    * join cannot emit the null row eagerly — a matching purchase may
    * still arrive — so the engine holds each click until the watermark
    * passes its join horizon and only then emits the (click, null) row.
    * That is the semantics gap vs [[attribution]]'s inner join: identical
    * matched rows, plus every expired click exactly once with null
    * purchase columns, all under the same bounded state (both sides
    * watermarked, time bounded in both directions). The spec pins the
    * composed result against the batch left-outer reference — including
    * that null rows appear only after the watermark actually expires the
    * horizon.
    */
  def attributionOuter(events: Dataset[Ev], horizonMin: Int = 30): DataFrame = {
    val base = events
      .withColumn("et", timestamp_micros(expr("ts div 1000")))
    val clicks = base.filter(col("event_type") === "click")
      .withWatermark("et", "1 hour")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("et").as("ct"))
    val purchases = base.filter(col("event_type") === "purchase")
      .withWatermark("et", "1 hour")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("et").as("pt"))
    clicks.join(purchases,
      col("c_user") === col("p_user") &&
        col("pt") >= col("ct") &&
        col("pt") <= col("ct") + expr(s"INTERVAL $horizonMin MINUTES"),
      "left_outer")
      .select(col("c_user").as("user_id"), col("click_id"), col("purchase_id"),
        col("ct"), col("pt"))
  }

  /** Stream-static enrichment join: every micro-batch joins against the
    * (small, broadcast) static dimension — the standard pattern for
    * attaching reference data to an event stream without stateful joins.
    */
  def enrich(stream: DataFrame, dim: DataFrame,
      streamKey: String, dimKey: String): DataFrame =
    stream.join(broadcast(dim), col(streamKey) === col(dimKey), "left")

  /** foreachBatch parquet ingest: the streaming form of the hep facade's
    * chunked appends, made idempotent under micro-batch retry. Each batch
    * OVERWRITES its own `batch_id=<id>` partition directory, so a failed or
    * replayed batch (restart after a sink write but before the offset
    * commit) lands on the same path instead of appending duplicates —
    * exactly-once per batch. Readers see `batch_id` as an ordinary
    * discovered partition column of `spark.read.parquet(outDir)`.
    */
  /** @param checkpointDir WAL + source-offset checkpoint: with it set,
    *   a stopped (or killed) ingest RESUMES from the last committed
    *   offset — already-committed batches are not reprocessed, a batch
    *   that wrote but did not commit replays onto its own batch_id path
    *   (idempotent overwrite), so the output holds every input row
    *   exactly once across restarts (spec-pinned). Production ingest
    *   always sets it; the default None keeps ad-hoc/test callers
    *   unchanged.
    */
  def ingest(stream: DataFrame, outDir: String,
      checkpointDir: Option[String] = None): org.apache.spark.sql.streaming.StreamingQuery = {
    val w = stream.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
      }
    checkpointDir.fold(w)(c => w.option("checkpointLocation", c)).start()
  }

  /** One CUSUM alarm (q71's row shape). */
  final case class CusumAlarm(user_id: Long, event_id: Long, t: Long,
      s_alarm: Long)

  /** q71's streaming twin: Page's CUSUM drift detector with the
    * accumulated statistic CARRIED ACROSS micro-batches in keyed state —
    * the live form of the batch secondary-sort fold (`TimeSeries2
    * .cusumAlarms`; same parameters, same exact integer cents). Alarms
    * emit the moment their event is processed, not at batch end — the
    * point of running detection on the stream.
    *
    * Within a trigger, a user's events fold in (ts, event_id) order;
    * across triggers the state is one (S) long per live user, evicted by
    * an event-time timer at last-event + [[StateTtlMs]] (the sessionize
    * eviction contract: a user idle past the TTL restarts from S = 0 —
    * for CUSUM that is the standard behavior, a cold statistic decays to
    * nothing). Stream ≡ batch is spec-pinned across a trigger cut for
    * in-order arrival; cross-trigger LATE data folds in arrival order —
    * the same documented contract as [[anomalies]].
    */
  def cusum(events: Dataset[Ev]): Dataset[CusumAlarm] = {
    import events.sparkSession.implicits._
    val ttlMs = StateTtlMs
    val ref = 5000L
    val threshold = 50000L

    def update(
        userId: Long, batch: Iterator[EvT],
        state: GroupState[Long]): Iterator[CusumAlarm] = {
      if (state.hasTimedOut) {
        state.remove()
        Iterator.empty
      } else {
        var s = state.getOption.getOrElse(0L)
        var lastTs = Long.MinValue
        val out = Seq.newBuilder[CusumAlarm]
        batch.toSeq.sortBy(e => (e.ts, e.event_id)).foreach { e =>
          val c = centsOf(e.value)
          val pre = math.max(0L, s + c - ref)
          val alarm = pre > threshold
          s = if (alarm) 0L else pre
          if (alarm) out += CusumAlarm(userId, e.event_id, e.ts, pre)
          lastTs = e.ts
        }
        state.update(s)
        state.setTimeoutTimestamp(
          math.max(lastTs / 1000000L + ttlMs, state.getCurrentWatermarkMs() + 1))
        out.result().iterator
      }
    }

    events
      .withColumn("et", timestamp_micros(expr("ts div 1000")))
      .withWatermark("et", "2 hours")
      .as[EvT]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
  }

  /** q65's streaming twin: trailing-24-hour distinct-user reach per hour,
    * with bounded state.
    *
    * The same dedup-before-count identity as the batch operator (project
    * each user-hour onto the ≤ 24 window-ends it serves), restated as two
    * CHAINED stateful operators in append mode — the Spark-4 multiple-
    * stateful-operator shape:
    *   1. `dropDuplicatesWithinWatermark(user_id, h2)` — the projected
    *      pair stream deduped inside the watermark horizon (state is
    *      |distinct (user, hour)| × 24, evicted as the watermark passes);
    *   2. a tumbling 1-hour window count over the survivors — each closed
    *      window holds exactly the distinct users active in its trailing
    *      24 h.
    *
    * The event-time column is the WINDOW-END hour (up to 23 h ahead of
    * the event that produced it), so the watermark delay is 26 h: 23 h of
    * forward projection + the engine's usual ≤ 2 h late-data allowance +
    * 1 h window. A window for hour H therefore finalizes once real event
    * time passes H + 4 h (H + 1 h window end + the 3 h net delay) — the
    * price of exact sliding distincts on an unbounded stream; hours never
    * reached by the watermark (the stream's live head) stay pending, and
    * stream ≡ batch holds on every EMITTED hour (spec-pinned, including
    * a mid-stream trigger cut).
    */
  def reach(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    events
      .select(col("user_id"), expr("ts div 3600000000000").as("h"))
      // dedup BEFORE the ×24 expansion (the batch q65 invariant). A
      // second STATEFUL dedup here is impossible (one watermark per
      // query — Spark rejects redefinition), so this is the stateless
      // per-partition form: a micro-batch-local seen-set. A user firing
      // 10⁶ events in one hour now costs ~1 row per partition into the
      // ×24 explode and the state store, not 24·10⁶; the downstream
      // stateful dedup stays the cross-partition/cross-batch authority.
      .as[(Long, Long)]
      .mapPartitions { it =>
        val seen = scala.collection.mutable.HashSet.empty[(Long, Long)]
        it.filter(seen.add)
      }
      .toDF("user_id", "h")
      .select(col("user_id"), explode(sequence(col("h"), col("h") + 23)).as("h2"))
      .withColumn("et2", timestamp_micros(col("h2") * lit(3600000000L)))
      .withWatermark("et2", "26 hours")
      .dropDuplicatesWithinWatermark("user_id", "h2")
      .groupBy(window(col("et2"), "1 hour"))
      .agg(count(lit(1)).as("reach_24h"))
      .select(expr("unix_micros(window.start) div 3600000000").as("hour_id"),
        col("reach_24h"))
  }
}
