package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Gap-based sessionization (SURVEY §2.1) — the custom-state streaming
  * shape: `flatMapGroupsWithState` with event-time timeout for streams,
  * and the same fold via `flatMapGroups` for batch (used by the
  * e2_sessions query; its DuckDB oracle is the classic gaps-and-islands
  * SQL).
  *
  * State per user is one open session (constant size); the watermark
  * timeout closes and emits it — state stays bounded no matter how long
  * the stream runs, the requirement for a 100 TB/day event feed.
  *
  * All gap arithmetic is in MICROseconds (`Timestamp.getTime` truncates
  * to millis and would disagree with the oracle's epoch_us), and session
  * bounds are the original event Timestamps, not reconstructed ones.
  */
object Sessionize {

  case class EventIn(user_id: Long, ts: Timestamp, value: Double)
  case class OpenSession(startTs: Timestamp, lastTs: Timestamp,
                         lastUs: Long, n: Long, sum: Double)
  case class SessionOut(user_id: Long, session_start: Timestamp,
                        session_end: Timestamp, n_events: Long, sum_value: Double)

  /** Epoch microseconds, exact (getTime is millis; sub-ms lives in getNanos). */
  def micros(t: Timestamp): Long =
    (t.getTime / 1000) * 1000000L + t.getNanos / 1000

  private def close(uid: Long, s: OpenSession): SessionOut =
    SessionOut(uid, s.startTs, s.lastTs, s.n, math.rint(s.sum * 100) / 100)

  /** Fold time-sorted events into sessions split on > gapUs silence. */
  private def fold(uid: Long, sorted: Seq[EventIn], gapUs: Long,
                   open: Option[OpenSession]): (Seq[SessionOut], Option[OpenSession]) = {
    var cur = open
    val out = Seq.newBuilder[SessionOut]
    sorted.foreach { e =>
      val t = micros(e.ts)
      cur = cur match {
        case Some(s) if t - s.lastUs <= gapUs =>
          Some(OpenSession(s.startTs, e.ts, t, s.n + 1, s.sum + e.value))
        case Some(s) =>
          out += close(uid, s)
          Some(OpenSession(e.ts, e.ts, t, 1, e.value))
        case None =>
          Some(OpenSession(e.ts, e.ts, t, 1, e.value))
      }
    }
    (out.result(), cur)
  }

  /** Batch sessionization: every session is closed at end of input. */
  def batch(events: Dataset[EventIn], gapUs: Long): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id).flatMapGroups { (uid, it) =>
      val sorted = it.toSeq.sortBy(e => (micros(e.ts), e.value))
      val (closed, open) = fold(uid, sorted, gapUs, None)
      (closed ++ open.map(close(uid, _))).iterator
    }
  }

  /** Streaming sessionization: sessions are emitted when the event-time
    * watermark passes their gap horizon (GroupStateTimeout). */
  def stream(events: Dataset[EventIn], gapUs: Long,
             watermarkDelay: String): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events.withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, it: Iterator[EventIn], state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(close(uid, s))
          } else {
            val sorted = it.toSeq.sortBy(e => (micros(e.ts), e.value))
            val (closed, open) = fold(uid, sorted, gapUs, state.getOption)
            open match {
              case Some(s) =>
                state.update(s)
                // wake up when the watermark passes the session gap
                state.setTimeoutTimestamp(s.lastUs / 1000 + gapUs / 1000)
              case None => state.remove()
            }
            closed.iterator
          }
      }
  }
}
