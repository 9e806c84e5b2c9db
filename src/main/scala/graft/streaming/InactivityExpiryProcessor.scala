package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** `transformWithState` with EVENT-TIME TIMERS — the third piece of the
  * new stateful API after [[RunningTotalsProcessor]]'s ValueState and
  * [[RunningTopKProcessor]]'s ListState: per key a running event count
  * plus ONE live inactivity timer at last_event_time + `gapMs`,
  * re-armed on every batch (stale timers dropped via
  * `listTimers`/`deleteTimer`, so the registration, enumeration, and
  * deletion surfaces are all exercised). When the watermark crosses the
  * timer, [[handleExpiredTimer]] emits the expired session
  * (key, n_events, expiry_ms) and clears the state, so the key's next
  * event starts a fresh session — the timer spelling of st07's
  * flatMapGroupsWithState inactivity timeout.
  *
  * WHICH timers have fired when the drain ends depends on watermark
  * progression, i.e. on batch boundaries — so this operator is pinned
  * by a controlled-microbatch spec (StreamingResumeSpec) rather than a
  * DuckDB oracle, which cannot see batching.
  */
class InactivityExpiryProcessor(gapMs: Long)
    extends StatefulProcessor[String, (String, Long),
      (String, Long, Long)] {

  // (event count, max event time seen) — the max must PERSIST across
  // batches: re-arming from only the current batch's max would let a
  // LATE (within-watermark) event drag the deadline backwards and fire
  // the session early, contradicting "last activity + gap"
  @transient private var state: ValueState[(Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[(Long, Long)](
      "n_maxts", Encoders.product[(Long, Long)], TTLConfig.NONE)

  override def handleInputRows(
      key: String,
      rows: Iterator[(String, Long)],
      timers: TimerValues): Iterator[(String, Long, Long)] = {
    var n = 0L
    var maxTs = Long.MinValue
    rows.foreach { case (_, ts) =>
      n += 1
      if (ts > maxTs) maxTs = ts
    }
    val (n0, max0) =
      if (state.exists()) state.get() else (0L, Long.MinValue)
    val newMax = math.max(max0, maxTs)
    state.update((n0 + n, newMax))
    // exactly one live timer per key, at the NEWEST activity ever seen
    val h = getHandle
    h.listTimers().foreach(t => h.deleteTimer(t))
    h.registerTimer(newMax + gapMs)
    Iterator.empty
  }

  override def handleExpiredTimer(
      key: String,
      timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[(String, Long, Long)] = {
    val n = if (state.exists()) state.get()._1 else 0L
    state.clear()
    Iterator.single((key, n, expiredTimerInfo.getExpiryTimeInMs))
  }
}
