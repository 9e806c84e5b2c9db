package graft.queries

import graft.streaming.StreamingOps
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import GraftQuery._
import graft.core.Pins.PinnedDataset

/** Event-time Structured-Streaming operators over the `events` table:
  * tumbling/sliding/session windows, watermarked append emission,
  * arbitrary stateful processing, streaming dedup. Each query drains a
  * real streaming query (state store + watermark machinery) with
  * `Trigger.AvailableNow`, so results are deterministic and the DuckDB
  * oracle can reproduce them with batch SQL (window arithmetic on the
  * raw nanosecond timestamps).
  */
object Streaming {

  private val HOUR_NS = 3600L * 1000000000L
  private val ST13_K = 3 // st13 leaderboard depth (Scala AND oracle)
  private val HALF_NS = 1800L * 1000000000L

  val all: Seq[GraftQuery] = Seq(

    // ------------------------------------------------ tumbling window agg
    GraftQuery(
      "st01_tumbling_window",
      (s, dir) => {
        import s.implicits._
        // 1-hour tumbling windows per event_type, complete mode (the
        // whole aggregation state emits at the end — the backfill shape).
        val win = StreamingOps.eventsStream(s, dir)
          .groupBy(window($"event_time", "1 hour"), $"event_type")
          .agg(count(lit(1)).as("n_events"),
            sum(dec($"value")).cast("double").as("total_value"))
        StreamingOps.drain(s, win, "st01", "complete")
          .select(unix_timestamp($"window.start").as("window_start"),
            $"event_type", $"n_events", $"total_value")
      },
      Some("""
        SELECT (epoch_ns(ts) // 3600000000000) * 3600 AS window_start,
          event_type, COUNT(*) AS n_events,
          CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
        FROM events GROUP BY 1, 2""")),

    // ------------------------------- sliding window + watermark, append
    GraftQuery(
      "st02_sliding_window_watermark",
      (s, dir) => {
        import s.implicits._
        // 1-hour windows sliding every 30 min with a 1-hour watermark,
        // APPEND mode: only windows finalized by the final watermark
        // (max event_time - 1h) emit. The oracle reproduces exactly the
        // emitted set: both sliding windows of each event, filtered to
        // window_end <= watermark.
        val win = StreamingOps.eventsStream(s, dir)
          .withWatermark("event_time", "1 hour")
          .groupBy(window($"event_time", "1 hour", "30 minutes"))
          .agg(count(lit(1)).as("n_events"),
            sum(dec($"value")).cast("double").as("total_value"))
        StreamingOps.drain(s, win, "st02", "append")
          .select(unix_timestamp($"window.start").as("window_start"),
            $"n_events", $"total_value")
      },
      Some("""
        WITH b AS (
          SELECT value,
            unnest([(epoch_ns(ts) // 1800000000000) * 1800,
                    (epoch_ns(ts) // 1800000000000) * 1800 - 1800]) AS ws
          FROM events
        ),
        wm AS (SELECT MAX(epoch_ns(ts)) // 1000000000 - 3600 AS w FROM events)
        SELECT ws AS window_start, COUNT(*) AS n_events,
          CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
        FROM b
        WHERE ws + 3600 <= (SELECT w FROM wm)
        GROUP BY 1""")),

    // ------------------------------------------- session window per user
    GraftQuery(
      "st03_session_window",
      (s, dir) => {
        import s.implicits._
        // 30-min-gap sessions per user (session_window merges events
        // closer than the gap; state bounded by the watermark horizon).
        // Append emits sessions closed by the final watermark; with gap ==
        // watermark delay, that is every session not still extendable.
        val sess = StreamingOps.eventsStream(s, dir)
          .withWatermark("event_time", "30 minutes")
          .groupBy(session_window($"event_time", "30 minutes"), $"user_id")
          .agg(count(lit(1)).as("n_events"),
            sum(dec($"value")).cast("double").as("total_value"))
        StreamingOps.drain(s, sess, "st03", "append")
          .select($"user_id",
            unix_timestamp($"session_window.start").as("session_start"),
            $"n_events", $"total_value")
      },
      Some("""
        WITH o AS (
          SELECT user_id, value, epoch_ns(ts) // 1000 AS us,
            CASE WHEN epoch_ns(ts) // 1000
                   - lag(epoch_ns(ts) // 1000, 1, CAST(-1800000001000 AS BIGINT))
                     OVER (PARTITION BY user_id ORDER BY epoch_ns(ts))
                 >= 1800000000 THEN 1 ELSE 0 END AS new_sess
          FROM events
        ),
        sess AS (
          SELECT user_id, value, us,
            SUM(new_sess) OVER (PARTITION BY user_id ORDER BY us
              ROWS UNBOUNDED PRECEDING) AS sid
          FROM o
        ),
        agg AS (
          SELECT user_id, sid, MIN(us) AS start_us,
            MAX(us) + 1800000000 AS end_us,
            COUNT(*) AS n_events,
            CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
          FROM sess GROUP BY 1, 2
        ),
        wm AS (SELECT MAX(epoch_ns(ts) // 1000) - 1800000000 AS w FROM events)
        SELECT user_id, start_us // 1000000 AS session_start,
          n_events, total_value
        FROM agg WHERE end_us <= (SELECT w FROM wm)""")),

    // --------------------------- arbitrary stateful op (mapGroupsWithState)
    GraftQuery(
      "st04_stateful_totals",
      (s, dir) => {
        import s.implicits._
        // KeyValueGroupedDataset.mapGroupsWithState: per-user running
        // (count, exact cents total) carried in explicit GroupState —
        // the escape hatch for custom streaming state machines. Update
        // mode; the bounded drain's final emission equals batch totals.
        // Money math in scaled longs (cents) so state is exact and the
        // final division is one deterministic double op.
        val typed = StreamingOps.eventsStream(s, dir)
          .select($"user_id", round($"value" * 100).cast("long").as("cents"))
          .as[(Long, Long)]
          .groupByKey(_._1)
        val updated = typed.mapGroupsWithState(
          GroupStateTimeout.NoTimeout) {
          (user: Long, rows: Iterator[(Long, Long)],
           state: GroupState[(Long, Long)]) =>
            val (n0, c0) = state.getOption.getOrElse((0L, 0L))
            var n = n0; var c = c0
            rows.foreach { r => n += 1; c += r._2 }
            state.update((n, c))
            (user, n, c)
        }
        StreamingOps.drain(s, updated.toDF("user_id", "n_events", "cents"),
            "st04", "update")
          // final emission per user (bounded drain = one batch, but keep
          // the reduction associative for multi-batch replays)
          .groupBy($"user_id")
          .agg(max($"n_events").as("n_events"), max($"cents").as("cents"))
          .select($"user_id", $"n_events",
            ($"cents".cast("double") / 100.0).as("total_value"))
      },
      Some("""
        SELECT user_id, COUNT(*) AS n_events,
          CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0
            AS total_value
        FROM events GROUP BY 1""")),

    // -------------------------------------------------- streaming dedup
    GraftQuery(
      "st05_stream_dedup",
      (s, dir) => {
        import s.implicits._
        // dropDuplicates on a stream: stateful first-occurrence keep per
        // (user_id, event_type); we aggregate the deduped stream so the
        // result is independent of WHICH duplicate won the race. The
        // follow-up count is batch over the drained sink (chaining two
        // stateful ops in one streaming query is a different operator).
        val deduped = StreamingOps.eventsStream(s, dir)
          .select($"user_id", $"event_type")
          .dropDuplicates("user_id", "event_type")
        StreamingOps.drain(s, deduped, "st05", "append")
          .groupBy($"event_type")
          .agg(count(lit(1)).as("n_distinct_users"))
      },
      Some("""
        SELECT event_type, COUNT(DISTINCT user_id) AS n_distinct_users
        FROM events GROUP BY 1""")),

    // --------------------------------------------- stream-stream join
    GraftQuery(
      "st06_stream_stream_join",
      (s, dir) => {
        import s.implicits._
        // watermarked inner join of two event streams: each click is
        // joined to the same user's purchases within the next 6 hours
        // (the click -> purchase conversion-stitching shape). Both sides
        // are pre-filtered BEFORE the join — at scale you never buffer
        // the firehose in join state when the query only needs two
        // event classes — and both carry watermarks so join state is
        // bounded by the time horizon; the range condition lets Spark
        // expire buffered rows. Inner-join emission is complete under
        // AvailableNow, so the drained result equals the batch join
        // (the oracle); grouping by user bucket keeps the check wide.
        val clicks = StreamingOps.eventsStream(s, dir)
          .filter($"event_type" === "click")
          .select($"user_id", $"event_id".as("click_id"),
            $"event_time".as("click_time"))
          .withWatermark("click_time", "1 hour")
          .alias("clicks")
        val follows = StreamingOps.eventsStream(s, dir)
          .filter($"event_type" === "purchase")
          .select($"user_id".as("f_user_id"), $"event_id".as("next_id"),
            $"event_time".as("next_time"))
          .withWatermark("next_time", "1 hour")
          .alias("follows")
        val joined = clicks.join(follows,
          expr("clicks.user_id = follows.f_user_id AND " +
            "next_time > click_time AND " +
            "next_time <= click_time + INTERVAL 6 HOURS"))
        StreamingOps.drain(s,
          joined.select($"user_id", $"click_id", $"next_id"),
          "st06", "append")
          .groupBy(($"user_id" % 100).as("user_bucket"))
          .agg(count(lit(1)).as("n_pairs"),
            min($"click_id").as("first_click"))
      },
      Some("""
        SELECT c.user_id % 100 AS user_bucket, COUNT(*) AS n_pairs,
               MIN(c.event_id) AS first_click
        FROM events c JOIN events f ON f.user_id = c.user_id
          AND f.ts > c.ts
          AND f.ts <= c.ts + INTERVAL 6 HOUR
        WHERE c.event_type = 'click' AND f.event_type = 'purchase'
        GROUP BY 1""")),

    // ------------------- custom sessionization (flatMapGroupsWithState)
    GraftQuery(
      "st07_custom_sessionize",
      (s, dir) => {
        import s.implicits._
        // the full arbitrary-state API: flatMapGroupsWithState with
        // EventTimeTimeout. Per user, buffered events fold into
        // 30-min-gap sessions; sessions whose end passed the watermark
        // EMIT and leave state; open sessions persist and register an
        // event-time timeout, firing when the watermark passes their
        // end (bounded state, incremental emission — the hand-rolled
        // equivalent of st03's session_window, same oracle).
        val GapUs = 1800L * 1000000L
        val typed = StreamingOps.eventsStream(s, dir)
          .withWatermark("event_time", "30 minutes")
          .select($"user_id", $"event_time",
            round($"value" * 100).cast("long").as("cents"))
          .as[(Long, java.sql.Timestamp, Long)]
          .groupByKey(_._1)
        val sessions = typed.flatMapGroupsWithState[
            List[(Long, Long)], (Long, Long, Long, Double)](
          OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
          (user: Long, rows: Iterator[(Long, java.sql.Timestamp, Long)],
           state: GroupState[List[(Long, Long)]]) =>
            // state: buffered (eventUs, cents), unsessionized
            val buf = (state.getOption.getOrElse(Nil) ++
              rows.map(r => (r._2.getTime * 1000L +
                (r._2.getNanos / 1000 % 1000), r._3))).sortBy(_._1)
            val wmUs = state.getCurrentWatermarkMs() * 1000L
            // fold into sessions; a session is CLOSED iff its end
            // (last event + gap) <= watermark
            val sessionsAll = buf.foldLeft(List.empty[List[(Long, Long)]]) {
              case (acc, ev) => acc match {
                case cur :: rest if ev._1 < cur.head._1 + GapUs =>
                  (ev :: cur) :: rest // cur.head is the latest event
                case _ => List(ev) :: acc
              }
            }
            val (closed, open) = sessionsAll.partition(sess =>
              sess.head._1 + GapUs <= wmUs)
            val remaining = open.flatten.sortBy(_._1)
            if (remaining.isEmpty) state.remove()
            else {
              state.update(remaining)
              // fire when the watermark passes the earliest open end
              val earliestEndMs =
                open.map(_.head._1 + GapUs).min / 1000L
              if (earliestEndMs > state.getCurrentWatermarkMs())
                state.setTimeoutTimestamp(earliestEndMs)
            }
            closed.map { sess =>
              val evs = sess.reverse
              (user, evs.head._1 / 1000000L, evs.size.toLong,
                evs.map(_._2).sum.toDouble / 100.0)
            }.iterator
        }
        StreamingOps.drain(s,
          sessions.toDF("user_id", "session_start", "n_events", "total_value"),
          "st07", "append")
      },
      Some("""
        WITH o AS (
          SELECT user_id, value, epoch_ns(ts) // 1000 AS us,
            CASE WHEN epoch_ns(ts) // 1000
                   - lag(epoch_ns(ts) // 1000, 1, CAST(-1800000001000 AS BIGINT))
                     OVER (PARTITION BY user_id ORDER BY epoch_ns(ts))
                 >= 1800000000 THEN 1 ELSE 0 END AS new_sess
          FROM events
        ),
        sess AS (
          SELECT user_id, value, us,
            SUM(new_sess) OVER (PARTITION BY user_id ORDER BY us
              ROWS UNBOUNDED PRECEDING) AS sid
          FROM o
        ),
        agg AS (
          SELECT user_id, sid, MIN(us) AS start_us,
            MAX(us) + 1800000000 AS end_us,
            COUNT(*) AS n_events,
            CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0
              AS total_value
          FROM sess GROUP BY 1, 2
        ),
        wm AS (SELECT MAX(epoch_ns(ts) // 1000) - 1800000000 AS w FROM events)
        SELECT user_id, start_us // 1000000 AS session_start,
          n_events, total_value
        FROM agg WHERE end_us <= (SELECT w FROM wm)""")),

    // ------------------------------------------- stream-static join
    GraftQuery(
      "st08_stream_static_join",
      (s, dir) => {
        import s.implicits._
        // dimension enrichment on a stream: the static side (customer)
        // is broadcast once and joined into every microbatch with no
        // state store — the standard fact-stream x dim-table shape. At
        // 100 TB the stream shards by files and the dim broadcast is
        // per-executor, so no shuffle ever touches the stream. Complete-
        // mode aggregation over the enriched stream = the batch oracle.
        val cust = graft.Tables.load(s, dir, "customer")
          .select($"c_custkey", $"c_mktsegment")
        val enriched = StreamingOps.eventsStream(s, dir)
          .join(broadcast(cust), $"user_id" === $"c_custkey")
        val agg = enriched.groupBy($"c_mktsegment")
          .agg(count(lit(1)).as("n_events"),
            sum(dec($"value")).cast("double").as("total_value"))
        StreamingOps.drain(s, agg, "st08", "complete")
          .select($"c_mktsegment".as("mktsegment"), $"n_events",
            $"total_value")
      },
      Some("""
        SELECT c.c_mktsegment AS mktsegment, COUNT(*) AS n_events,
          CAST(SUM(CAST(e.value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
        FROM events e JOIN customer c ON c.c_custkey = e.user_id
        GROUP BY 1""")),

    // ---------------------------------------------- foreachBatch sink
    GraftQuery(
      "st09_foreach_batch_sink",
      (s, dir) => {
        import s.implicits._
        // foreachBatch: each microbatch lands in ordinary batch code —
        // here an append-mode parquet writer stamping batch_id (the
        // pattern behind custom sinks, multi-sink fanout, and MERGE
        // upserts). The reread of the written files is the check that
        // every row passed through the sink exactly once.
        val out = graft.core.StreamStore.scratchRoot("graft-st09-")
        val stream = StreamingOps.eventsStream(s, dir)
          .select($"event_id", $"event_type", $"value")
        StreamingOps.drainForeachBatch(s, stream, "st09") { (batch, id) =>
          batch.withColumn("batch_id", lit(id))
            .write.mode("append").parquet(out.toString)
        }
        s.read.parquet(out.toString)
          .agg(
            count(lit(1)).as("n"),
            sum(dec($"value")).cast("double").as("total_value"),
            min($"event_id").as("min_event_id"),
            max($"event_id").as("max_event_id"),
            when(countDistinct($"batch_id") >= 1, lit(1)).otherwise(lit(0))
              .as("sink_ran"))
      },
      Some("""
        SELECT COUNT(*) AS n,
          CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value,
          MIN(event_id) AS min_event_id,
          MAX(event_id) AS max_event_id,
          CAST(1 AS INT) AS sink_ran
        FROM events""")),

    // ----------------------------- transformWithState (Spark 4 API)
    GraftQuery(
      "st11_transform_with_state",
      (s, dir) => {
        import s.implicits._
        // transformWithState, the successor to mapGroupsWithState:
        // per-user running (count, exact cents) in a declared
        // ValueState (graft.streaming.RunningTotalsProcessor). Same
        // semantics as st04 through the NEW stateful API — typed state
        // variables via the handle, RocksDB-backed state store
        // (transformWithState requires the RocksDB provider; restored
        // after the drain).
        val typed = StreamingOps.eventsStream(s, dir)
          .select($"user_id", round($"value" * 100).cast("long").as("cents"))
          .as[(Long, Long)]
          .groupByKey(_._1)
        val updated = typed.transformWithState(
          new graft.streaming.RunningTotalsProcessor,
          org.apache.spark.sql.streaming.TimeMode.None(),
          OutputMode.Update())
        val drained = StreamingOps.withRocksDb(s) {
          StreamingOps.drain(s,
            updated.toDF("user_id", "n_events", "cents"), "st11", "update")
            .pin() // pin before the provider conf reverts
        }
        drained
          .groupBy($"user_id")
          .agg(max($"n_events").as("n_events"), max($"cents").as("cents"))
          .select($"user_id", $"n_events",
            ($"cents".cast("double") / 100.0).as("total_value"))
      },
      Some("""
        SELECT user_id, COUNT(*) AS n_events,
          CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0
            AS total_value
        FROM events GROUP BY 1""")),

    // ------------------------- dedup bounded by the watermark horizon
    GraftQuery(
      "st12_dedup_within_watermark",
      (s, dir) => {
        import s.implicits._
        // dropDuplicatesWithinWatermark: first-occurrence keep per
        // (user_id, event_type) where state lives only inside the
        // watermark horizon — the production spelling when keys recur
        // forever but only near-time duplicates matter (unbounded
        // dropDuplicates state in st05 never shrinks). Aggregated so
        // the result is independent of which duplicate won.
        //
        // Horizon choice: for THIS bounded backfill drain the horizon
        // (35 d) must cover the replayed corpus (30 d of events) — a
        // shorter one makes re-emission of an expired key legitimate
        // streaming behavior the moment the drain runs as >1 microbatch
        // (file-count admission control, growing directory), and no
        // batch SQL can reproduce which batch boundary did it. Live
        // incremental deployments pick the horizon for state size; a
        // backfill picks it for corpus coverage.
        val deduped = StreamingOps.eventsStream(s, dir)
          .withWatermark("event_time", "35 days")
          .select($"user_id", $"event_type", $"event_time")
          .dropDuplicatesWithinWatermark("user_id", "event_type")
        StreamingOps.drain(s, deduped, "st12", "append")
          .groupBy($"event_type")
          .agg(count(lit(1)).as("n_distinct_users"))
      },
      Some("""
        SELECT event_type, COUNT(DISTINCT user_id) AS n_distinct_users
        FROM events GROUP BY 1""")),

    // --------------------------- transformWithState ListState top-k
    GraftQuery(
      "st13_stream_topk",
      (s, dir) => {
        import s.implicits._
        // the streaming leaderboard: per-event-type running top-3 by
        // (cents desc, event_id asc) in a typed ListState
        // (graft.streaming.RunningTopKProcessor) — k-bounded state,
        // order-independent accumulation, so the drain's final
        // emission equals the batch top-3 under ANY microbatching.
        // With st11 this covers the new API's scalar AND list state
        // variables.
        val typed = StreamingOps.eventsStream(s, dir)
          .select($"event_type", $"event_id",
            round($"value" * 100).cast("long").as("cents"))
          .as[(String, Long, Long)]
          .groupByKey(_._1)
        val ranked = typed.transformWithState(
          new graft.streaming.RunningTopKProcessor(ST13_K),
          org.apache.spark.sql.streaming.TimeMode.None(),
          OutputMode.Update())
        val drained = StreamingOps.withRocksDb(s) {
          StreamingOps.drain(s,
            ranked.toDF("event_type", "rank", "event_id", "cents"),
            "st13", "update").pin()
        }
        // update mode re-emits a key's board every batch it improves;
        // per (type, rank) the LATEST emission is the one with the
        // HIGHEST cents (boards only improve over time; among
        // equal-cents emissions the rows are identical), so rn = 1
        // under (cents desc, id asc) recovers the final board — with
        // the bounded single-batch drain there is exactly one emission
        // anyway, and this reduction keeps the result well-defined
        // under multi-batch replays
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy($"event_type", $"rank")
          .orderBy($"cents".desc, $"event_id".asc)
        drained.withColumn("rn", row_number().over(w))
          .filter($"rn" === 1)
          .select($"event_type", $"rank", $"event_id",
            ($"cents".cast("double") / 100.0).as("value_approx"))
      },
      Some(s"""
        SELECT event_type, rank, event_id,
          CAST(CAST(round(value * 100) AS BIGINT) AS DOUBLE) / 100.0
            AS value_approx
        FROM (
          SELECT event_type, event_id, value,
            CAST(row_number() OVER (PARTITION BY event_type
              ORDER BY CAST(round(value * 100) AS BIGINT) DESC,
                       event_id ASC) AS INT) AS rank
          FROM events) t
        WHERE rank <= $ST13_K""")),

    // --------------------------- MapState per-entity feature bag (st14)
    GraftQuery(
      "st14_map_state",
      (s, dir) => {
        import s.implicits._
        // transformWithState with a typed MAP state — the last of the
        // new API's state-variable kinds (st11 ValueState, st13
        // ListState, timer coverage in StreamingResumeSpec): per user a
        // (event_type -> running count) map, the per-entity feature
        // bag, where each event updates ONE map entry instead of
        // rewriting a whole per-key bag. Counts are monotone and each
        // batch emits the entries it touched, so the drain-end max per
        // (user, type) equals the batch groupBy — the oracle.
        val typed = StreamingOps.eventsStream(s, dir)
          .select($"user_id", $"event_type")
          .as[(Long, String)]
          .groupByKey(_._1)
        val updated = typed.transformWithState(
          new graft.streaming.PerTypeCountsProcessor,
          org.apache.spark.sql.streaming.TimeMode.None(),
          OutputMode.Update())
        val drained = StreamingOps.withRocksDb(s) {
          StreamingOps.drain(s,
            updated.toDF("user_id", "event_type", "n"), "st14", "update")
            .pin() // pin before the provider conf reverts
        }
        drained.groupBy($"user_id", $"event_type")
          .agg(max($"n").as("n_events"))
      },
      Some("""
        SELECT user_id, event_type, COUNT(*) AS n_events
        FROM events GROUP BY 1, 2""")),

    // ------------------------- dynamic-gap session windows (st15)
    GraftQuery(
      "st15_session_dynamic_gap",
      (s, dir) => {
        import s.implicits._
        // session_window with a PER-EVENT gap expression — the dynamic
        // overload st03's fixed 30-minute gap doesn't touch: error
        // events keep sessions alive for 30 minutes, everything else
        // for an hour (the "failure bursts end sessions sooner" shape).
        // Each event contributes [t, t + gap(t)); overlapping windows
        // merge, so a session's end is max(t_i + gap_i) and a new
        // session starts when an event's time reaches the running max
        // end — which is exactly the gaps-and-islands spelling the
        // oracle runs (running MAX over prior ends, d09's machinery).
        // Watermark delay = the LARGEST gap, so append emits every
        // session not still extendable.
        val sess = StreamingOps.eventsStream(s, dir)
          .withWatermark("event_time", "1 hour")
          .groupBy(session_window($"event_time",
            when($"event_type" === "error", lit("30 minutes"))
              .otherwise(lit("1 hour"))), $"user_id")
          .agg(count(lit(1)).as("n_events"),
            sum(dec($"value")).cast("double").as("total_value"))
        StreamingOps.drain(s, sess, "st15", "append")
          .select($"user_id",
            unix_timestamp($"session_window.start").as("session_start"),
            $"n_events", $"total_value")
      },
      Some("""
        WITH o AS (
          SELECT user_id, value, epoch_ns(ts) // 1000 AS us,
            CASE WHEN event_type = 'error' THEN 1800000000
                 ELSE 3600000000 END AS gap_us
          FROM events
        ),
        m AS (
          SELECT *,
            MAX(us + gap_us) OVER (PARTITION BY user_id ORDER BY us
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              AS prev_max_end
          FROM o
        ),
        i AS (
          SELECT *, CASE WHEN prev_max_end IS NULL OR us >= prev_max_end
            THEN 1 ELSE 0 END AS new_sess
          FROM m
        ),
        sess AS (
          SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY us
            ROWS UNBOUNDED PRECEDING) AS sid
          FROM i
        ),
        agg AS (
          SELECT user_id, sid, MIN(us) AS start_us,
            MAX(us + gap_us) AS end_us,
            COUNT(*) AS n_events,
            CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
              AS total_value
          FROM sess GROUP BY 1, 2
        ),
        wm AS (SELECT MAX(epoch_ns(ts) // 1000) - 3600000000 AS w
               FROM events)
        SELECT user_id, start_us // 1000000 AS session_start,
          n_events, total_value
        FROM agg WHERE end_us <= (SELECT w FROM wm)"""))
  )
}
