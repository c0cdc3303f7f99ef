package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** The [[EventStream.userTotals]] processor: per-user exact running
  * (n_events, sum_cents) under the transformWithState API. Top-level
  * class (not an inner closure) because the processor instance ships to
  * executors whole.
  *
  * Timer discipline: ONE live event-time timer per user at
  * last-event-ms + ttlMs. `registerTimer` calls accumulate rather than
  * replace, so the previously registered expiry is tracked in its own
  * ValueState and deleted before the new one is set; a fired timer
  * removes all state (the idle user drops — the same bounded-state
  * contract as the FMGWS family's setTimeoutTimestamp).
  */
class UserTotalsProcessor(ttlMs: Long)
    extends StatefulProcessor[Long, EventStream.EvT, EventStream.UserTotals] {

  @transient private var totals: ValueState[(Long, Long, Long)] = _
  @transient private var timerAt: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    totals = getHandle.getValueState[(Long, Long, Long)](
      "totals", Encoders.product[(Long, Long, Long)], TTLConfig.NONE)
    timerAt = getHandle.getValueState[Long](
      "timerAt", Encoders.scalaLong, TTLConfig.NONE)
  }

  override def handleInputRows(
      key: Long, rows: Iterator[EventStream.EvT],
      timerValues: TimerValues): Iterator[EventStream.UserTotals] = {
    var (lastTs, n, s) =
      if (totals.exists()) totals.get() else (Long.MinValue, 0L, 0L)
    rows.foreach { e =>
      n += 1
      s = Math.addExact(s, EventStream.centsOf(e.value))
      if (e.ts > lastTs) lastTs = e.ts
    }
    totals.update((lastTs, n, s))
    val expiry = math.max(lastTs / 1000000L + ttlMs,
      timerValues.getCurrentWatermarkInMs() + 1)
    if (timerAt.exists()) getHandle.deleteTimer(timerAt.get())
    getHandle.registerTimer(expiry)
    timerAt.update(expiry)
    Iterator.single(EventStream.UserTotals(key, n, s))
  }

  override def handleExpiredTimer(
      key: Long, timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[EventStream.UserTotals] = {
    totals.clear()
    timerAt.clear()
    Iterator.empty
  }
}
