package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** True streaming sessionization with custom state (the
  * `flatMapGroupsWithState` tier of the streaming surface): the stateful
  * twin of the batch `EventOps.sessionize`. A user's open session lives in
  * `GroupState`; a session closes — and is emitted downstream — either when
  * a later event arrives past the gap, or when the event-time watermark
  * passes `last_event + gap` (timeout), so results stream out incrementally
  * with bounded state. */
object StreamingSessionize {

  case class OpenSession(sessionId: Long, startEpoch: Long, lastEpoch: Long,
                         count: Long)

  case class ClosedSession(user_id: Long, session_id: Long, n_events: Long,
                           start_epoch: Long, end_epoch: Long)

  /** events: streaming (ts TIMESTAMP, user_id, event_id). Watermark must be
    * ≥ gap so timeouts fire only for genuinely closed sessions. */
  def sessions(events: DataFrame, gapMinutes: Int,
               watermarkMinutes: Int): Dataset[ClosedSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapSec = gapMinutes * 60L
    val typed = events
      .withWatermark("ts", s"$watermarkMinutes minutes")
      .select(col("user_id").cast("long"), col("ts"),
        col("event_id").cast("long"))
      .as[(Long, Timestamp, Long)]

    typed.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, rows: Iterator[(Long, Timestamp, Long)],
         state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            // watermark passed last_event + gap: the open session is final
            val s = state.get
            state.remove()
            Iterator.single(ClosedSession(user, s.sessionId, s.count,
              s.startEpoch, s.lastEpoch))
          } else {
            val sorted = rows.toSeq.sortBy(r => (r._2.getTime, r._3))
            var closed = List.empty[ClosedSession]
            var cur = state.getOption
            sorted.foreach { case (_, ts, _) =>
              val t = ts.getTime / 1000
              cur match {
                case Some(s) if t >= s.startEpoch - gapSec &&
                    t - s.lastEpoch <= gapSec =>
                  // in-order extension OR an in-watermark straggler inside
                  // the session's gap envelope: widen the bounds min/max —
                  // the batch twin sorts first, so its bounds are exactly
                  // the min/max of the merged events
                  cur = Some(s.copy(
                    startEpoch = math.min(s.startEpoch, t),
                    lastEpoch = math.max(s.lastEpoch, t),
                    count = s.count + 1))
                case Some(s) if t > s.lastEpoch + gapSec =>
                  closed ::= ClosedSession(user, s.sessionId, s.count,
                    s.startEpoch, s.lastEpoch)
                  cur = Some(OpenSession(s.sessionId + 1, t, t, 1))
                case Some(s) =>
                  // straggler older than the open session's envelope
                  // (t < start − gap): the batch twin orders it as its own
                  // EARLIER session — emit it closed under the open
                  // session's id and shift the open session's id up one
                  closed ::= ClosedSession(user, s.sessionId, 1, t, t)
                  cur = Some(s.copy(sessionId = s.sessionId + 1))
                case None =>
                  cur = Some(OpenSession(1, t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp((s.lastEpoch + gapSec) * 1000)
            }
            closed.reverse.iterator
          }
      }
  }
}
