package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues}

/** `transformWithState` with a typed [[ListState]]: per-key running
  * top-`k` rows by (cents desc, id asc) — the streaming leaderboard.
  * The k-bounded state makes every batch's work O(batch + k) per key,
  * and top-k accumulation is ORDER-INDEPENDENT, so the bounded drain's
  * final emission equals the batch top-k however the input is split
  * into microbatches. Companion to [[RunningTotalsProcessor]]'s
  * ValueState: together they cover the new API's scalar and list state
  * variables.
  */
object RunningTopKProcessor {
  /** (cents desc, id asc) as an explicit Ordering, not `sortBy(-cents)`:
    * arithmetic negation overflows at Long.MinValue and would sort that
    * row LAST instead of last-but-correctly. Unit-pinned in
    * StreamingResumeSpec.
    */
  private[streaming] val ranking: Ordering[(Long, Long)] =
    Ordering.by[(Long, Long), Long](_._2).reverse.orElseBy(_._1)
}

class RunningTopKProcessor(k: Int)
    extends StatefulProcessor[String, (String, Long, Long),
      (String, Int, Long, Long)] {

  @transient private var top: ListState[(Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    top = getHandle.getListState[(Long, Long)](
      "top", Encoders.product[(Long, Long)], TTLConfig.NONE)

  override def handleInputRows(
      key: String,
      rows: Iterator[(String, Long, Long)],
      timers: TimerValues): Iterator[(String, Int, Long, Long)] = {
    // (event_id, cents), ranked by the overflow-safe companion Ordering
    val prev = top.get().toSeq
    val merged = (prev ++ rows.map(r => (r._2, r._3)))
      .sorted(RunningTopKProcessor.ranking)
      .take(k)
    if (merged == prev) Iterator.empty // board unchanged: no state
                                       // write, no re-emission
    else {
      top.put(merged.toArray)
      merged.iterator.zipWithIndex.map { case ((id, cents), i) =>
        (key, i + 1, id, cents)
      }
    }
  }
}
