package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Custom stateful streaming exemplar (SURVEY.md §2.9 "stateful ops"):
  * gap-based sessionization per key via `flatMapGroupsWithState` — the
  * KeyValueGroupedDataset state API the reference has no analogue for
  * (its pipeline is stateless per record).
  *
  * A session closes when the event-time watermark passes
  * (last event + gap): the state times out and the session row is
  * emitted. State per key is O(1) (start/last/count), so state-store
  * size scales with ACTIVE keys, not history — the property that matters
  * when this runs for weeks against a firehose.
  */
object Sessionize {

  final case class Event(user_id: Long, ts: Timestamp)
  final case class SessionState(start: Long, last: Long, n: Int)
  final case class Session(user_id: Long, session_start: Timestamp,
                           session_end: Timestamp, n_events: Int)

  def sessionize(events: Dataset[Event], gapMs: Long): Dataset[Session] = {
    implicit val sessionEnc = Encoders.product[Session]
    implicit val stateEnc = Encoders.product[SessionState]
    implicit val keyEnc = Encoders.scalaLong

    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>

        if (state.hasTimedOut) {
          // watermark passed last+gap: close and emit the session
          val s = state.get
          state.remove()
          Iterator.single(Session(userId, new Timestamp(s.start),
            new Timestamp(s.last), s.n))
        } else {
          val sorted = rows.map(_.ts.getTime).toSeq.sorted
          var emitted = List.empty[Session]
          var cur = state.getOption
          for (t <- sorted) {
            cur match {
              case Some(s) if t - s.last <= gapMs =>
                cur = Some(s.copy(last = math.max(s.last, t), n = s.n + 1))
              case Some(s) =>
                // gap exceeded within the batch: close the old session now
                emitted ::= Session(userId, new Timestamp(s.start),
                  new Timestamp(s.last), s.n)
                cur = Some(SessionState(t, t, 1))
              case None =>
                cur = Some(SessionState(t, t, 1))
            }
          }
          cur.foreach { s =>
            state.update(s)
            state.setTimeoutTimestamp(s.last + gapMs)
          }
          emitted.reverseIterator
        }
      }
  }
}
