package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues}

/** `transformWithState` with a typed [[MapState]] — the last of the new
  * API's state-variable kinds after [[RunningTotalsProcessor]]'s
  * ValueState, [[RunningTopKProcessor]]'s ListState, and
  * [[InactivityExpiryProcessor]]'s timers: per user a (event_type →
  * running count) map, the per-entity feature bag every personalization
  * pipeline keeps. The state-store layout indexes map entries by
  * composite (grouping key, user key), so `updateValue` touches ONE
  * entry — a per-key ValueState[Map] would rewrite the whole bag per
  * event. Each batch emits only the entries it UPDATED (update-mode
  * contract); counts are monotone, so the drain-end max per
  * (user, type) equals the batch groupBy, which is what the st14
  * oracle pins.
  */
class PerTypeCountsProcessor
    extends StatefulProcessor[Long, (Long, String),
      (Long, String, Long)] {

  @transient private var counts: MapState[String, Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    counts = getHandle.getMapState[String, Long](
      "counts", Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(
      key: Long,
      rows: Iterator[(Long, String)],
      timers: TimerValues): Iterator[(Long, String, Long)] = {
    // accumulate the batch locally first: ONE store read + ONE write
    // per touched type per batch, not three RocksDB round trips per
    // input row
    val delta = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    rows.foreach { case (_, tpe) =>
      delta.update(tpe, delta.getOrElse(tpe, 0L) + 1L)
    }
    // materialized eagerly: the state writes must not hide inside a
    // lazily-consumed iterator
    val out = delta.iterator.map { case (tpe, d) =>
      val n = (if (counts.containsKey(tpe)) counts.getValue(tpe)
               else 0L) + d
      counts.updateValue(tpe, n)
      (key, tpe, n)
    }.toVector
    out.iterator
  }
}
