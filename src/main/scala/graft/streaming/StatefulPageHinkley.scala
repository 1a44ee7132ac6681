package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Streaming Page-Hinkley drift monitor via flatMapGroupsWithState —
  * the online counterpart of
  * [[graft.operators.Changepoint.pageHinkley]]: finalized hourly counts
  * fold into the PH statistic per event type with O(1) state
  * (t, Σx, m, min m), emitting the walk row (and the alarm) as each
  * hour closes. Unlike the EWMA monitor no offline baseline is needed —
  * PH tracks its own running mean, which is exactly why it is the
  * detector you can attach to a BRAND-NEW stream.
  *
  * Parity contract: the update m' = m + x·10⁶ − (Σ'x·10⁶ DIV t') − δ is
  * the IDENTICAL integer arithmetic of the batch fold (JVM Long
  * division on non-negative sums), so on the same hourly series the
  * streaming walk is bit-identical to the batch operator's — asserted
  * by the parity spec.
  *
  * Ordering contract (shared with [[StatefulEwma]]): rows sort within a
  * micro-batch; across batches the watermarked append-mode window
  * aggregation emits hours monotonically per type, and replayed hours
  * (at or before the state-held hour) are dropped, not folded twice.
  */
object StatefulPageHinkley {

  case class PhState(lastHourMs: Long, t: Long, s: Long, m: Long, mn: Long)

  case class PhPoint(event_type: String, window_start: Timestamp, x: Long,
      m_micros: Long, ph_micros: Long, alarm: Boolean)

  def stepType(deltaMicros: Long, lambdaMicros: Long)(
      eventType: String,
      rows: Iterator[StatefulEwma.HourCount],
      state: GroupState[PhState]): Iterator[PhPoint] = {
    val sorted = rows.toSeq.sortBy(_.window_start.getTime)
    var st = state.getOption.getOrElse(PhState(Long.MinValue, 0L, 0L, 0L, 0L))
    val out = Seq.newBuilder[PhPoint]
    for (r <- sorted) {
      val hm = r.window_start.getTime
      if (hm > st.lastHourMs) {
        val t = st.t + 1
        val s = st.s + r.x
        val m = st.m + r.x * 1000000L - (s * 1000000L / t) - deltaMicros
        val mn = math.min(st.mn, m)
        st = PhState(hm, t, s, m, mn)
        out += PhPoint(eventType, r.window_start, r.x, m, m - mn,
          m - mn > lambdaMicros)
      }
    }
    state.update(st)
    out.result().iterator
  }

  def monitor(
      spark: SparkSession,
      hourly: Dataset[StatefulEwma.HourCount],
      deltaMicros: Long = 500000L,
      lambdaMicros: Long = 20000000L): Dataset[PhPoint] = {
    import spark.implicits._
    hourly
      .groupByKey(_.event_type)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(
        stepType(deltaMicros, lambdaMicros))
  }
}
