package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming event-funnel resolution — the stateful-streaming
  * counterpart of the q17 batch funnel, with IDENTICAL semantics:
  * first view, first click strictly after it, first purchase strictly
  * after that.
  *
  * Funnel stages are inherently order-sensitive (a late-arriving
  * earlier view can re-qualify a click that was previously too early),
  * so incremental per-event state would be wrong under out-of-order
  * arrival. Instead the per-user state buffers the user's (type,
  * micros) events inside the watermark horizon and the funnel is
  * resolved ONCE, when the event-time timeout fires — the
  * correct-by-construction pattern for order-sensitive logic on
  * streams. State is bounded by a user's events within the horizon
  * (not stream lifetime): the watermark is the lateness contract, the
  * timeout horizon is the inactivity contract, both explicit
  * parameters. Batch parity is spec-pinned against the same fold.
  */
object FunnelStream {

  case class FunnelEvent(user_id: Long, event_type: String, ts: Timestamp)

  /** Resolved funnel; stage times as epoch micros (None = not reached). */
  case class FunnelOut(user_id: Long, view_us: Option[Long],
                       click_us: Option[Long], purchase_us: Option[Long])

  /** The exact batch semantics over one user's buffered events. */
  def resolve(uid: Long, evs: Seq[(String, Long)]): FunnelOut = {
    val views = evs.collect { case ("view", t) => t }
    val v = views.minOption
    val c = v.flatMap(vt =>
      evs.collect { case ("click", t) if t > vt => t }.minOption)
    val p = c.flatMap(ct =>
      evs.collect { case ("purchase", t) if t > ct => t }.minOption)
    FunnelOut(uid, v, c, p)
  }

  /** One funnel row per user, emitted when the watermark passes the
    * user's last event + `inactivityMs`. */
  def stream(events: Dataset[FunnelEvent], watermarkDelay: String,
             inactivityMs: Long): Dataset[FunnelOut] = {
    import events.sparkSession.implicits._
    events.withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Seq[(String, Long)], FunnelOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, it: Iterator[FunnelEvent],
         state: GroupState[Seq[(String, Long)]]) =>
          if (state.hasTimedOut) {
            val evs = state.get
            state.remove()
            Iterator(resolve(uid, evs))
          } else {
            val buf = state.getOption.getOrElse(Seq.empty) ++
              it.map(e => (e.event_type, Sessionize.micros(e.ts)))
            state.update(buf)
            state.setTimeoutTimestamp(
              buf.map(_._2).max / 1000 + inactivityMs)
            Iterator.empty
          }
      }
  }
}
