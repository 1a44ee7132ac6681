package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Stateful streaming sessionization via flatMapGroupsWithState — the exact
  * semantics of the reference's sticky per-user sessions
  * (producer/src/domain/event_generator.py:41-42: a session persists across
  * a user's events and rotates), generalized to the standard gap rule: a
  * session closes when the user is idle longer than `gapSeconds`.
  *
  * This is the engine's custom-state surface (SURVEY.md §2.8 / prompt's
  * `KeyValueGroupedDataset` requirement): per-key state lives in the state
  * store (RocksDB/HDFS-backed on a cluster), emitted sessions flow as an
  * append stream. State per user is O(1) — counters and two timestamps —
  * so the operator scales with distinct active users, not event volume.
  */
object StatefulSessionize {

  case class SessionState(
      sessionIndex: Long,
      sessionStartMs: Long,
      lastEventMs: Long,
      eventCount: Long,
      valueSum: Double)

  case class CompletedSession(
      user_id: Long,
      session_index: Long,
      session_start: Timestamp,
      session_end: Timestamp,
      event_count: Long,
      value_sum: Double)

  /** Flat-map one user's new events through the session state machine.
    * Emits sessions closed by the gap rule; the open session stays in state.
    */
  def stepUser(
      gapMs: Long)(
      userId: Long,
      events: Iterator[(Long, Timestamp, Double)],
      state: GroupState[SessionState]): Iterator[CompletedSession] = {
    val sorted = events.toSeq.sortBy(e => (e._2.getTime, e._1))
    var cur = state.getOption.orNull
    val out = Seq.newBuilder[CompletedSession]
    for ((_, ts, value) <- sorted) {
      val t = ts.getTime
      if (cur == null) {
        cur = SessionState(1L, t, t, 1L, value)
      } else if (t - cur.lastEventMs > gapMs) {
        out += CompletedSession(
          userId, cur.sessionIndex,
          new Timestamp(cur.sessionStartMs), new Timestamp(cur.lastEventMs),
          cur.eventCount, cur.valueSum)
        cur = SessionState(cur.sessionIndex + 1, t, t, 1L, value)
      } else {
        cur = cur.copy(
          lastEventMs = math.max(cur.lastEventMs, t),
          eventCount = cur.eventCount + 1,
          valueSum = cur.valueSum + value)
      }
    }
    if (cur != null) state.update(cur)
    out.result().iterator
  }

  /** Wire the state machine over a streaming (or batch) typed event set.
    * Expects columns (user_id, ts, value); 30-minute gap default matches
    * [[graft.operators.Sessionize]].
    */
  def sessions(
      spark: SparkSession,
      events: Dataset[(Long, Timestamp, Double)],
      gapSeconds: Long = 1800L): Dataset[CompletedSession] = {
    import spark.implicits._
    events
      .groupByKey(_._1)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(stepUser(gapSeconds * 1000L))
  }
}
