package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators over the `events` table shape
  * (event_id, ts, user_id, event_type, value). The reference is
  * batch-only (SURVEY §3.2: no streaming anywhere in the repo), so this
  * module is part of the north-star pipeline surface: the same
  * aggregations a training-data ingest pipeline runs continuously.
  *
  * Design: everything is a `readStream`-composable transform — input is
  * any streaming (or batch — the transforms are mode-agnostic)
  * DataFrame/Dataset with this schema. Watermarks bound state; windowed
  * aggregations use event time; custom state goes through
  * `flatMapGroupsWithState` with event-time timeouts (state is evicted
  * by watermark, never unbounded).
  */
object StreamOps {

  final case class Event(
      event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)

  final case class Session(
      user_id: Long, session_start: Timestamp, session_end: Timestamp,
      n_events: Int, sum_value: Double)

  /** Internal per-user session accumulator (public: the state encoder's
    * generated code must reach the accessors from another package).
    */
  final case class SessionState(
      startMs: Long, endMs: Long, n: Int, total: Double)

  /** Tumbling event-time window counts per event type. Late data beyond
    * the watermark is dropped; state per (window, type) is evicted once
    * the watermark passes window end.
    */
  def windowedCounts(
      events: DataFrame,
      watermarkDelay: String = "10 minutes",
      windowDuration: String = "5 minutes"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowDuration), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("cnt"), col("sum_value"))

  /** In-stream exact dedup by event_id: duplicates arriving within the
    * watermark horizon are dropped; state for an id is released once the
    * watermark passes it (bounded state — the batch analogue is
    * [[graft.operators.Dedup.exact]]).
    */
  def dedupEvents(
      events: DataFrame,
      watermarkDelay: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("event_id")

  /** Gap-based sessionization per user via `flatMapGroupsWithState`
    * (SURVEY §3.2 "stateful" row): a session closes when no event
    * arrives within `gapMs` of its last event; closed sessions are
    * emitted either when a later event proves the gap or when the
    * event-time timeout fires (watermark passed last_end + gap).
    */
  def sessionize(
      events: Dataset[Event],
      gapMs: Long,
      watermarkDelay: String = "10 minutes"): Dataset[Session] = {
    implicit val stateEnc = Encoders.product[SessionState]
    implicit val outEnc = Encoders.product[Session]
    implicit val longEnc = Encoders.scalaLong

    def emit(uid: Long, s: SessionState): Session =
      Session(uid, new Timestamp(s.startMs), new Timestamp(s.endMs), s.n, s.total)

    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (uid: Long, it: Iterator[Event], state: GroupState[SessionState]) => {
          if (state.hasTimedOut) {
            val out = state.getOption.map(emit(uid, _)).iterator
            state.remove()
            out
          } else {
            val sorted = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var cur = state.getOption
            val closed = Seq.newBuilder[Session]
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                // within [start - gap, end + gap]: extend (the lower
                // bound covers in-watermark out-of-order arrivals, which
                // may legitimately precede the open session's start)
                case Some(s) if t >= s.startMs - gapMs && t - s.endMs <= gapMs =>
                  cur = Some(SessionState(math.min(s.startMs, t),
                    math.max(s.endMs, t), s.n + 1, s.total + e.value))
                case Some(s) if t > s.endMs + gapMs =>
                  closed += emit(uid, s)
                  cur = Some(SessionState(t, t, 1, e.value))
                case Some(_) =>
                  // late arrival more than gap BEFORE the open session:
                  // its own already-closed session (nothing later can
                  // join it — the open session bounds it on the right)
                  closed += emit(uid, SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.endMs + gapMs)
            }
            closed.result().iterator
          }
        })
  }
}
