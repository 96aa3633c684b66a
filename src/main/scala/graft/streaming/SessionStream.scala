package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming sessionization with event-time-timeout state — the
  * streaming twin of [[graft.report.Analytics.sessionWindows]] (native
  * `session_window`, gap-merged): per user, an open session lives in
  * keyed state, extends while events arrive within the gap, and is
  * emitted either when a later event proves the gap elapsed or when the
  * WATERMARK passes `last_event + gap` (the event-time timeout) — so an
  * idle user's final session still flushes without any further input,
  * the part a batch `session_window` gets for free by seeing the whole
  * corpus and a stream cannot.
  *
  * Emitted rows carry exactly the batch operator's shape
  * (`end = last_event + gap`), so the two are directly comparable —
  * StreamingSpec drives both over the same events and asserts equality.
  *
  * Correctness contract: exact for arrival lateness ≤ gap (in-batch
  * disorder is sorted away; an out-of-order event that still touches
  * the open session merges into it, extending backward if needed). An
  * event older than `open.start − gap` is emitted as its own already-
  * closed session: by then the watermark has passed it, so no earlier
  * neighbor can still arrive.
  *
  * Scale: state is ONE fixed-size record per ACTIVE user (idle users
  * expire via the timeout — unlike [[StatefulOps]]' NoTimeout demo,
  * state here cannot grow past the live-user set); the state store
  * shards by user across executors; emitted sessions are a trickle
  * bounded by the input. No shuffle beyond the groupByKey exchange.
  */
object SessionStream {

  final case class SessionEvent(user_id: Long, ts: java.sql.Timestamp,
    value: Double) {
    def ts_ms: Long = ts.getTime
  }

  final case class OpenSession(start_ms: Long, last_ms: Long,
    n: Long, sum: Double)

  final case class Session(user_id: Long, session_start_ms: Long,
    session_end_ms: Long, n_events: Long, total_value: Double)

  /** Default session gap, matching the batch operator. */
  val GapMs: Long = 30L * 60000L

  private def close(uid: Long, s: OpenSession, gapMs: Long): Session =
    Session(uid, s.start_ms, s.last_ms + gapMs, s.n,
      math.rint(s.sum * 100) / 100)

  /** Attach the sessionizer to an event stream (`user_id`, `ts`
    * timestamp, `value`). The watermark is applied HERE (the event-time
    * column must flow into the stateful operator still carrying its
    * watermark tag) — the timeout fires when it passes
    * `last_event + gap`. Works identically over a batch frame (one big
    * micro-batch, no timeouts — every session closed by a successor is
    * emitted; the final open ones stay in state, which batch mode
    * discards, matching "emit only what the stream would have emitted").
    */
  def sessions(events: DataFrame, gapMs: Long = GapMs,
      watermarkDelay: String = "0 seconds"): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    val src = events.select(col("user_id"), col("ts"), col("value"))
    val marked = if (src.isStreaming)
      src.withWatermark("ts", watermarkDelay) else src
    // .as[SessionEvent] is a typed VIEW (no object round-trip), so the
    // ts column keeps its watermark tag into the stateful operator
    marked
      .as[SessionEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, rows: Iterator[SessionEvent],
         state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(close(uid, s, gapMs))
          } else {
            // in-batch disorder is sorted away; (ts, value) makes the
            // fold order total for replay determinism
            val sorted = rows.toSeq.sortBy(e => (e.ts_ms, e.value))
            var open = state.getOption
            val out = Seq.newBuilder[Session]
            sorted.foreach { e =>
              open = open match {
                case Some(s)
                    if e.ts_ms <= s.last_ms + gapMs
                      && e.ts_ms + gapMs >= s.start_ms =>
                  Some(OpenSession(math.min(s.start_ms, e.ts_ms),
                    math.max(s.last_ms, e.ts_ms), s.n + 1, s.sum + e.value))
                case Some(s) if e.ts_ms > s.last_ms + gapMs =>
                  out += close(uid, s, gapMs)
                  Some(OpenSession(e.ts_ms, e.ts_ms, 1L, e.value))
                case Some(s) =>
                  // older than open.start − gap: the watermark has
                  // passed it, so it is final on its own
                  out += close(uid,
                    OpenSession(e.ts_ms, e.ts_ms, 1L, e.value), gapMs)
                  Some(s)
                case None =>
                  Some(OpenSession(e.ts_ms, e.ts_ms, 1L, e.value))
              }
            }
            open.foreach { s =>
              state.update(s)
              try {
                // a timeout at/behind the watermark is rejected — clamp
                // one past it (the session then flushes next batch)
                val wm = state.getCurrentWatermarkMs()
                state.setTimeoutTimestamp(
                  math.max(s.last_ms + gapMs, wm + 1))
              } catch {
                // batch mode has no watermark/timeout clock
                case _: UnsupportedOperationException => ()
              }
            }
            out.result().iterator
          }
      }
  }
}
