package graft.stream

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-time streaming pipelines (SURVEY.md §2b streaming row + §7.2
  * step 5). Each takes an unbounded DataFrame (from MemoryStream, rate,
  * file, or Kafka source) and returns the transformed unbounded frame;
  * the caller picks sink + trigger. State lives in the state store, never
  * on the driver (100 TB posture, SURVEY.md §4.3).
  */
object Pipelines {

  /** Tumbling event-time window counts with late-data drop.
    * Expects columns (ts: timestamp, event_type: string). */
  def tumblingCounts(
      events: DataFrame,
      windowLen: String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(
        col("window.start").as("win_start"),
        col("event_type"), col("n"))

  /** Built-in session windows: events within `gap` of each other merge
    * into one session per user. */
  def sessionCounts(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col("session_window.start").as("sess_start"),
        col("session_window.end").as("sess_end"),
        col("user_id"), col("n_events"))

  /** Streaming exact dedup on a key within the watermark horizon — the
    * streaming twin of q_dedup_exact. State size is bounded by the
    * watermark, so this holds at unbounded input. */
  def dedupKeyed(events: DataFrame, keyCols: Seq[String],
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)

  // ------------------------------------------------------- custom state

  final case class SessionInput(user_id: Long, ts: Timestamp)
  final case class SessionState(start: Long, end: Long, n: Long)
  final case class SessionOut(
      user_id: Long, sess_start: Long, sess_end: Long, n_events: Long)

  /** Custom-state sessionization via flatMapGroupsWithState — the shape to
    * reach for when session semantics outgrow `session_window` (e.g.
    * per-session running features). Emits a session when the event-time
    * watermark passes its close. Demonstrates the state-store API the
    * SURVEY mandates; `sessionCounts` is the built-in route. */
  def sessionsWithState(events: Dataset[SessionInput],
      gapMs: Long = 30L * 60 * 1000): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "2 hours")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (user, rows, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionOut(user, s.start, s.end, s.n))
          } else {
            // Interval-merge the open session WITH the batch's events as
            // intervals sorted by start, bridging any pair within gapMs.
            // This handles every out-of-order case uniformly: an event
            // inside / within-gap of the open session extends it
            // (min-start/max-end — never shrinks), while an event more
            // than gapMs BEFORE the session's start forms its own
            // earlier session instead of being swallowed (folding raw
            // times against the session's END alone would merge it:
            // t - end <= gapMs is trivially true for early events).
            val ivs: List[SessionState] =
              (state.getOption.toList ++
                rows.map(r => { val t = r.ts.getTime; SessionState(t, t, 1L) }))
                .sortBy(v => (v.start, v.end))
            val merged = ivs.foldLeft(List.empty[SessionState]) {
              case (h :: tl, v) if v.start - h.end <= gapMs =>
                SessionState(h.start, math.max(h.end, v.end), h.n + v.n) :: tl
              case (acc, v) => v :: acc
            }
            // merged is newest-first; everything but the newest is
            // gap-closed within this batch and emits now (a still-later
            // out-of-order arrival could in principle have merged with
            // one of them — the same single-open-session approximation
            // as before, now only for genuinely closed sessions)
            val latest = merged.head
            state.update(latest)
            // Spark rejects a timeout at/below the current watermark —
            // clamp just above it when the session end already trails
            // the watermark (late-but-accepted data).
            val wm = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(math.max(latest.end + gapMs, wm + 1))
            merged.tail.reverse
              .map(s => SessionOut(user, s.start, s.end, s.n)).iterator
          }
      }
  }

  /** Stream-stream coincidence join — the streaming twin of the batch
    * theta/range query (and the TDC trigger-matching shape): hits join
    * triggers of the same key within ±`toleranceSec` of event time. Both
    * sides carry watermarks and the join condition bounds event-time
    * distance, so Spark can evict state on both sides — nothing
    * accumulates unboundedly. Expects (key, ts) on both inputs; hit
    * columns prefixed h_, trigger columns t_. */
  def coincidence(hits: DataFrame, triggers: DataFrame,
      toleranceSec: Int = 5, watermark: String = "30 seconds"): DataFrame = {
    val h = hits.withWatermark("ts", watermark)
      .select(col("key").as("h_key"), col("ts").as("h_ts"))
    val t = triggers.withWatermark("ts", watermark)
      .select(col("key").as("t_key"), col("ts").as("t_ts"))
    h.join(t,
      expr(s"""h_key = t_key AND
               h_ts BETWEEN t_ts - INTERVAL $toleranceSec SECONDS
                        AND t_ts + INTERVAL $toleranceSec SECONDS"""))
  }

  /** Streaming occupancy histogram over decoded TDC hits: counts per
    * (FPGA, TDC_CHANNEL) per orbit-time window — the per-chamber monitor
    * the reference's notebook user would build by hand. Expects the
    * decoded hit columns plus an `ts` event-time column (see
    * [[graft.time.OrbitTime.orbitTimestamp]]). */
  def occupancy(hits: DataFrame, windowLen: String = "1 second",
      watermark: String = "5 seconds"): DataFrame =
    hits
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("FPGA"), col("TDC_CHANNEL"))
      .agg(count(lit(1)).as("n_hits"))
      .select(col("window.start").as("win_start"),
        col("FPGA"), col("TDC_CHANNEL"), col("n_hits"))
}
