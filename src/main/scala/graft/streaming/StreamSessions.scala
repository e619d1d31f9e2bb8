package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful sessionization with `flatMapGroupsWithState` — the
  * streaming twin of `operators.TimeOps.sessionize` for when the
  * built-in `session_window` isn't enough (per-session derived state,
  * custom close conditions, side outputs).
  *
  * State per key is one open session; an event past the gap closes and
  * EMITS the previous session and opens a new one. Closed sessions are
  * the output stream (append semantics); the open session stays in
  * state. At scale, state size is O(active keys) and the state store
  * handles persistence/recovery.
  */
object StreamSessions {

  case class Evt(user_id: Long, ts_us: Long, value: Double)
  case class Session(user_id: Long, start_us: Long, end_us: Long,
      n_events: Int, session_value: Double)

  def sessionize(events: Dataset[Evt], gapSeconds: Long): Dataset[Session] = {
    implicit val evtEnc = Encoders.product[Evt]
    implicit val sesEnc = Encoders.product[Session]
    implicit val longEnc = Encoders.scalaLong
    val gapUs = gapSeconds * 1000000L
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Session, Session](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, batch: Iterator[Evt], state: GroupState[Session]) =>
          val sorted = batch.toSeq.sortBy(e => (e.ts_us))
          var open = state.getOption
          val closed = Seq.newBuilder[Session]
          sorted.foreach { e =>
            open match {
              case Some(s) if e.ts_us - s.end_us <= gapUs =>
                // max(): an out-of-order event inside the gap must not
                // move the session end backwards
                open = Some(s.copy(
                  start_us = math.min(s.start_us, e.ts_us),
                  end_us = math.max(s.end_us, e.ts_us),
                  n_events = s.n_events + 1,
                  session_value = s.session_value + e.value))
              case Some(s) =>
                closed += s
                open = Some(Session(user, e.ts_us, e.ts_us, 1, e.value))
              case None =>
                open = Some(Session(user, e.ts_us, e.ts_us, 1, e.value))
            }
          }
          open.foreach(state.update)
          closed.result().iterator
      }
  }
}
