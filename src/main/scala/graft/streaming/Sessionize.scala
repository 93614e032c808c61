package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One user event on the session timeline (event time). */
final case class SessionEvent(user_id: Long, ts: Timestamp)

/** Open-session state carried across micro-batches (epoch ms). */
final case class OpenSession(start: Long, end: Long, n: Long)

/** A closed session: emitted once, when the gap passes or watermark expires it. */
final case class UserSession(user_id: Long, start: Timestamp, end: Timestamp, n_events: Long)

/** Custom sessionization via `flatMapGroupsWithState` (SURVEY §2.5
  * streaming surface; VERDICT r02 stretch item 8) — the shape to use when
  * `session_window` can't express the semantics (per-session custom
  * aggregates, mid-session emission, dynamic gaps).
  *
  * Two ways a session closes, both handled:
  *   - in-stream: a later event for the same user arrives more than `gap`
  *     after the session end → the closed session is emitted in that batch;
  *   - by watermark: no further events → the event-time timeout fires once
  *     the watermark passes sessionEnd + gap, and the final session flushes.
  *     This is what makes the operator correct under unbounded keys: state
  *     is guaranteed to be dropped, so memory is bounded by ACTIVE users,
  *     not ever-seen users.
  *
  * Scale: state lives in the state store partitioned by user — a 1000-
  * executor job holds each user's open session exactly once, and every
  * micro-batch shuffles only that batch's events (not the state).
  */
object Sessionize {

  /** @param events watermarked stream (the event-time timeout requires it),
    *               e.g. `df.withWatermark("ts", "10 seconds").as[SessionEvent]`
    * @param gapMs  session gap: events further apart start a new session
    */
  def sessions(events: Dataset[SessionEvent], gapMs: Long): Dataset[UserSession] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, UserSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, rows: Iterator[SessionEvent], state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(UserSession(user, new Timestamp(s.start), new Timestamp(s.end), s.n))
          } else {
            // Events within one batch may arrive unordered; sessionize in
            // event-time order. Late events behind the watermark were
            // already dropped by the engine.
            val times = rows.map(_.ts.getTime).toArray.sorted
            val closed = List.newBuilder[UserSession]
            var cur = state.getOption
            times.foreach { t =>
              cur = cur match {
                case Some(s) if t - s.end <= gapMs =>
                  Some(OpenSession(s.start, math.max(s.end, t), s.n + 1))
                case Some(s) =>
                  closed += UserSession(user, new Timestamp(s.start), new Timestamp(s.end), s.n)
                  Some(OpenSession(t, t, 1))
                case None => Some(OpenSession(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.end + gapMs)
            }
            closed.result().iterator
          }
      }
  }
}
