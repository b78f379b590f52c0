package graft.stream

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

final case class SessionEvent(user_id: Long, ts: java.sql.Timestamp, value: Double)
final case class SessionState(start: Long, end: Long, n: Long, sum: Double)
final case class UserSession(
    user_id: Long,
    session_start: java.sql.Timestamp,
    session_end: java.sql.Timestamp,
    n_events: Long,
    sum_value: Double)

/** Gap-based sessionization over the events schema — the
  * `flatMapGroupsWithState` custom-state path (SURVEY §2 streaming):
  * events for a user belong to one session while consecutive gaps stay
  * under `gapMinutes`; a session closes when the gap is exceeded in-batch
  * or when the event-time watermark passes its timeout.
  *
  * State per key is one [[SessionState]] (4 numbers) regardless of event
  * volume, and the watermark bounds how long it lives — the state store
  * stays O(active users), which is what makes this safe on an unbounded
  * stream. (For batch frames the equivalent is a lag-over-window gap
  * query; this operator is the streaming path.) */
object Sessionize {

  def sessionize(
      events: DataFrame,
      gapMinutes: Int = 30,
      watermark: String = "1 hour"
  ): Dataset[UserSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMs = gapMinutes * 60000L
    val src = events.selectExpr("user_id", "ts", "CAST(value AS DOUBLE) AS value")
      .withWatermark("ts", watermark)
      .as[SessionEvent]

    def toSession(user: Long, s: SessionState): UserSession =
      UserSession(user, new java.sql.Timestamp(s.start), new java.sql.Timestamp(s.end), s.n, s.sum)

    src.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        (user: Long, evs: Iterator[SessionEvent], state: GroupState[SessionState]) => {
          val out = Seq.newBuilder[UserSession]
          if (!evs.hasNext) {
            // only reachable on timeout: the watermark passed end+gap
            if (state.hasTimedOut) {
              state.getOption.foreach(s => out += toSession(user, s))
              state.remove()
            }
          } else {
            var cur = state.getOption
            evs.toSeq.sortBy(_.ts.getTime).foreach { e =>
              cur match {
                // merge keeps end = max and start = min so a late event from
                // a later micro-batch (still within the watermark) can never
                // rewind the session window or pull the event-time timeout
                // (end+gap) earlier than the true last event. A late event
                // more than `gap` BEFORE the session start also merges here
                // (single-session state cannot retro-open an earlier
                // session) — the documented trade-off of O(1) state.
                case Some(s) if e.ts.getTime - s.end <= gapMs =>
                  cur = Some(SessionState(
                    start = math.min(s.start, e.ts.getTime),
                    end = math.max(s.end, e.ts.getTime),
                    n = s.n + 1, sum = s.sum + e.value))
                case Some(s) =>
                  out += toSession(user, s)
                  cur = Some(SessionState(e.ts.getTime, e.ts.getTime, 1, e.value))
                case None =>
                  cur = Some(SessionState(e.ts.getTime, e.ts.getTime, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.end + gapMs)
            }
          }
          out.result().iterator
        })
  }
}
