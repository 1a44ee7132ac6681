package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization.
  *
  * The reference models sessions generatively — a per-user session UUID that
  * rotates with p=0.1 per event (`producer/src/domain/event_generator.py:41-42`)
  * — and the engine consumes `session_id` as a given column. The harness
  * `events` table has no session column, so we reconstruct sessions the
  * standard analytical way: a new session starts when a user's inter-event
  * gap exceeds a threshold.
  *
  * Shape at scale: one shuffle on user_id (Window partitioning), then a
  * per-partition sort by time — the same cost profile as any sessionization
  * on a cluster. No state is held beyond the window sort; skewed users would
  * be the only hazard (bounded here by the generator's uniform user pool).
  */
object Sessionize {

  /** Tag every event with a per-user session index (1-based, in time order).
    * An event starts a new session when it is the user's first event or
    * arrives more than `gap` after the previous one. `event_id` breaks
    * equal-timestamp ties deterministically.
    */
  def withSessionIndex(events: DataFrame, gap: String = "30 minutes"): DataFrame = {
    val byUserTime = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val prevTs = lag(col("ts"), 1).over(byUserTime)
    val isNew = when(prevTs.isNull || col("ts") > prevTs + expr(s"INTERVAL $gap"), 1L)
      .otherwise(0L)
    events
      .withColumn("session_index", sum(isNew).over(
        byUserTime.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Per-user session rollup: how many sessions, events, events per session. */
  def sessionStats(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    withSessionIndex(events, gap)
      .groupBy(col("user_id"))
      .agg(
        max(col("session_index")).as("session_count"),
        count(lit(1)).as("event_count"),
        (count(lit(1)) / max(col("session_index"))).as("events_per_session"))
      .orderBy(col("user_id"))

  /** Per-session rows via Spark's NATIVE `session_window` operator — the
    * built-in merging-window aggregate (one shuffle on the group key, then
    * in-partition window merging; the same operator Structured Streaming
    * uses for stateful session aggregation, so this batch query and a
    * streaming variant share semantics by construction).
    *
    * Boundary semantics (fixture-verified, not just read off the docs):
    * each event opens a window [ts, ts+gap) and per-user windows merge when
    * they overlap OR TOUCH — an event at exactly `prev_ts + gap` is merged,
    * so a new session starts iff `ts > prev_ts + gap`. That is the SAME
    * break rule as [[withSessionIndex]]'s reconstruction; what differs is
    * the reported boundary: `session_end` is `last_ts + gap`, not the last
    * event time.
    *
    * The value mass rides a DECIMAL(18,2) cast: order-independent exact,
    * bit-reproducible against the gap-islands oracle.
    */
  def sessionWindows(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("event_type")).as("n_types"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("value_sum"))
      .select(
        col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("n_types"), col("value_sum"))
      .orderBy(col("user_id"), col("session_start"))
}
