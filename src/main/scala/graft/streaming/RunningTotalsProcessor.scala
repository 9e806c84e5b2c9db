package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Spark 4 arbitrary stateful processing (`transformWithState`): per-key
  * running (count, exact cents total) carried in a typed [[ValueState]].
  *
  * The successor API to `mapGroupsWithState` (st04 exercises that one):
  * state is declared per-variable through the handle (value/list/map
  * states, TTL, timers) instead of one opaque blob, and the runtime can
  * evolve state schema independently. Requires the RocksDB state store
  * provider. Money math in scaled longs so state is exact and replay-
  * associative; the final division to doubles happens outside, once.
  */
class RunningTotalsProcessor
    extends StatefulProcessor[Long, (Long, Long), (Long, Long, Long)] {

  @transient private var totals: ValueState[(Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    totals = getHandle.getValueState[(Long, Long)](
      "totals", Encoders.product[(Long, Long)], TTLConfig.NONE)

  override def handleInputRows(
      key: Long,
      rows: Iterator[(Long, Long)],
      timers: TimerValues): Iterator[(Long, Long, Long)] = {
    val (n0, c0) = if (totals.exists()) totals.get() else (0L, 0L)
    var n = n0
    var c = c0
    rows.foreach { r => n += 1; c += r._2 }
    totals.update((n, c))
    Iterator.single((key, n, c))
  }
}
