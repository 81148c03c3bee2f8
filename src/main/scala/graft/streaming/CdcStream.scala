package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming counterpart of [[graft.operators.Scd.latestByKey]]: maintain
  * a continuously-updated one-row-per-key latest-state view over a CDC
  * update stream, emitting a key's row only when its winner CHANGES.
  *
  * `mapGroupsWithState` in Update mode; state per key is the current
  * winner — O(1), like the batch aggregate's buffer, so the state store
  * scales with live keys, not update history. Out-of-order updates (an
  * earlier (ord, tie) arriving late) lose to the stored winner exactly as
  * they would in the batch max_by, keeping stream and batch results
  * convergent on the same input set.
  */
object CdcStream {

  final case class Update(key: Long, ord: Long, tie: Long, payload: String)

  def latestByKey(updates: Dataset[Update]): Dataset[Update] = {
    implicit val updEnc = Encoders.product[Update]
    implicit val keyEnc = Encoders.scalaLong

    updates
      .groupByKey(_.key)
      .flatMapGroupsWithState[Update, Update](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (_: Long, rows: Iterator[Update], state: GroupState[Update]) =>
          val incoming = rows.maxBy(u => (u.ord, u.tie))
          val winner = state.getOption match {
            case Some(cur) if cur.ord > incoming.ord ||
              (cur.ord == incoming.ord && cur.tie >= incoming.tie) => cur
            case _ => incoming
          }
          if (state.getOption.contains(winner)) Iterator.empty
          else { state.update(winner); Iterator.single(winner) }
      }
  }
}
