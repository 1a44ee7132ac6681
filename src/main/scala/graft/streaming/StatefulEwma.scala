package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Streaming EWMA volume monitor via flatMapGroupsWithState — the
  * online counterpart of [[graft.operators.Changepoint.ewmaAnomalies]]:
  * finalized hourly counts (the output of a watermarked window
  * aggregation in append mode) fold into one exponentially-weighted
  * level per event type, emitting the chart row as each hour closes.
  * State is O(1) per type (last hour + the running level) — the
  * deployment where the baseline μ/σ are fit OFFLINE on history (the
  * batch operator) and the monitor runs ONLINE against them.
  *
  * Parity contract: the update z' = z + (x − z)·λ is spelled exactly as
  * the batch fold, so with the same seed (the baseline mean, passed in
  * as config) and the same hourly series the streaming levels are
  * bit-identical to the batch operator's — asserted by the parity spec.
  *
  * Ordering contract (shared with [[StatefulTransitions]]): rows sort
  * within a micro-batch by hour; ACROSS batches the append-mode window
  * aggregation emits each hour once, after the watermark passes it, so
  * hours arrive monotonically per type. A row at or before the
  * state-held hour (replay/duplicate) is dropped rather than folded
  * twice.
  */
object StatefulEwma {

  case class HourCount(event_type: String, window_start: Timestamp, x: Long)

  case class EwmaState(lastHourMs: Long, z: Double)

  case class EwmaPoint(event_type: String, window_start: Timestamp, x: Long,
      ewma: Double)

  def stepType(seeds: Map[String, Double], lambda: Double)(
      eventType: String,
      rows: Iterator[HourCount],
      state: GroupState[EwmaState]): Iterator[EwmaPoint] = {
    val sorted = rows.toSeq.sortBy(_.window_start.getTime)
    var st = state.getOption.getOrElse(
      EwmaState(Long.MinValue, seeds.getOrElse(eventType, 0.0)))
    val out = Seq.newBuilder[EwmaPoint]
    for (r <- sorted) {
      val hm = r.window_start.getTime
      if (hm > st.lastHourMs) {
        val z = st.z + (r.x.toDouble - st.z) * lambda
        st = EwmaState(hm, z)
        out += EwmaPoint(eventType, r.window_start, r.x, z)
      }
    }
    state.update(st)
    out.result().iterator
  }

  /** Wire the monitor over a streaming (or batch) typed hourly-count
    * set. `seeds` is the per-type baseline mean from the offline fit.
    */
  def monitor(
      spark: SparkSession,
      hourly: Dataset[HourCount],
      seeds: Map[String, Double],
      lambda: Double = 0.25): Dataset[EwmaPoint] = {
    import spark.implicits._
    hourly
      .groupByKey(_.event_type)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(
        stepType(seeds, lambda))
  }
}
