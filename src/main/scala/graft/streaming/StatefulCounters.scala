package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor,
  TTLConfig, TimeMode, TimerValues}

/** Per-user running (event_type -> count, cents-sum) counters on Spark 4's
  * `transformWithState` — the arbitrary-state API that supersedes
  * flatMapGroupsWithState: typed composite state (MapState here) lives in
  * the state store as individual map entries, so an update touches ONE
  * entry instead of rewriting a whole serialized blob per key per batch
  * (the flatMapGroupsWithState cost model), and per-state TTL replaces
  * hand-rolled timeout bookkeeping.
  *
  * Emission is changelog-style (Update mode): each micro-batch emits the
  * NEW running totals for exactly the (user, type) pairs it touched — the
  * same "latest row per key wins" contract as [[graft.operators.Upsert]]
  * downstream. State is bounded by |active users| x |event types|, not
  * event volume; exact cents (no float accumulation drift across
  * batches).
  *
  * Engine requirement: transformWithState runs only on the RocksDB state
  * store provider (Spark enforces it); the spec pins that wiring. At
  * cluster scale that is also the right provider — state lives off-heap
  * and snapshots to the checkpoint location incrementally.
  */
object StatefulCounters {

  case class TypeTotals(n_events: Long, value_cents: Long)

  case class CountUpdate(
      user_id: Long, event_type: String, n_events: Long, value_cents: Long)

  /** Input: (user_id, event_type, value_cents). */
  class CounterProcessor
      extends StatefulProcessor[Long, (Long, String, Long), CountUpdate] {
    @transient private var counts: MapState[String, TypeTotals] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      counts = getHandle.getMapState[String, TypeTotals](
        "counts", Encoders.STRING, Encoders.product[TypeTotals], TTLConfig.NONE)

    override def handleInputRows(
        key: Long,
        rows: Iterator[(Long, String, Long)],
        timerValues: TimerValues): Iterator[CountUpdate] = {
      // fold the batch locally first: one state read + one write per
      // DISTINCT type touched, not per row
      val touched = scala.collection.mutable.LinkedHashMap[String, TypeTotals]()
      for ((_, tp, cents) <- rows) {
        val cur = touched.getOrElse(tp,
          if (counts.containsKey(tp)) counts.getValue(tp) else TypeTotals(0L, 0L))
        touched(tp) = TypeTotals(cur.n_events + 1L, cur.value_cents + cents)
      }
      touched.foreach { case (tp, v) => counts.updateValue(tp, v) }
      touched.iterator.map { case (tp, t) =>
        CountUpdate(key, tp, t.n_events, t.value_cents)
      }
    }
  }

  /** Wire the processor over a typed (user_id, event_type, value_cents)
    * stream. Update output mode: downstream sinks upsert on
    * (user_id, event_type).
    */
  def runningCounts(
      spark: SparkSession,
      events: Dataset[(Long, String, Long)]): Dataset[CountUpdate] = {
    import spark.implicits._
    events
      .groupByKey(_._1)
      .transformWithState(
        new CounterProcessor, TimeMode.None(), OutputMode.Update())
  }
}
