package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Stateful streaming Markov transitions via flatMapGroupsWithState — the
  * incremental counterpart of [[graft.queries.Analytics.eventTransitions]]:
  * each user's NEXT event closes a (from, to) successor pair against the
  * last event held in state, so the transition stream emits continuously
  * while state stays O(1) per user (one (ts, id, type) triple — scales
  * with distinct active users, not event volume, same state-budget
  * argument as [[StatefulSessionize]]).
  *
  * Ordering contract (shared with the sessionizer): events are sorted
  * within each micro-batch by (ts, event_id), and per-user arrival order
  * must hold ACROSS batches — a straggler older than the held state would
  * pair out of order (the batch operator, sorting globally, would not).
  * Ingestion pipelines that can reorder across the batch boundary put a
  * watermark + sort in front; the parity spec feeds ordered batches.
  */
object StatefulTransitions {

  case class LastEvent(tsMs: Long, eventId: Long, eventType: String)

  case class Transition(user_id: Long, from_type: String, to_type: String)

  /** Fold one user's new events through the last-event state, emitting
    * one transition per consecutive pair (state-held predecessor first).
    */
  def stepUser(
      userId: Long,
      events: Iterator[(Long, Long, Timestamp, String)],
      state: GroupState[LastEvent]): Iterator[Transition] = {
    val sorted = events.toSeq.sortBy(e => (e._3.getTime, e._2))
    var last = state.getOption.orNull
    val out = Seq.newBuilder[Transition]
    for ((_, id, ts, tp) <- sorted) {
      if (last != null) out += Transition(userId, last.eventType, tp)
      last = LastEvent(ts.getTime, id, tp)
    }
    if (last != null) state.update(last)
    out.result().iterator
  }

  /** Wire the state machine over a streaming (or batch) typed event set
    * of (user_id, event_id, ts, event_type).
    */
  def transitions(
      spark: SparkSession,
      events: Dataset[(Long, Long, Timestamp, String)]): Dataset[Transition] = {
    import spark.implicits._
    events
      .groupByKey(_._1)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(stepUser)
  }
}
