package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the most recent right row with
  * `rightTime <= leftTime`, per key.
  *
  * Spark has no native as-of join; the naive formulation (equi-join on key +
  * time filter + per-pair max) materializes |left| x |orders-per-key| rows.
  * This implementation is the merge formulation: UNION both sides, one
  * shuffle on the key, one per-partition sort on (time, side), then
  * `last(value, ignoreNulls)` over an unbounded-preceding window carries the
  * latest right value forward into each left row. Cost: one shuffle + one
  * sort over |left| + |right| — the same profile as a sort-merge join, with
  * no pair blow-up, at any scale.
  *
  * Ties (right time == left time) match, like an inclusive `<=` as-of; the
  * right side is pre-deduplicated to one row per (key, time) so tie-breaks
  * are deterministic.
  */
object AsOfJoin {

  /** events x orders instance: each event matched to the user's most recent
    * order at or before the event's timestamp (inner semantics: events with
    * no prior order are dropped). Right dedup keeps max orderkey per
    * (custkey, orderdate).
    */
  def eventsToLatestOrder(events: DataFrame, orders: DataFrame): DataFrame = {
    val dedupedOrders = orders
      .groupBy(col("o_custkey"), col("o_orderdate"))
      .agg(max(col("o_orderkey")).as("orderkey"))

    val right = dedupedOrders.select(
      col("o_custkey").as("user_id"),
      col("o_orderdate").as("t"),
      lit(0).as("side"),
      col("orderkey"),
      lit(null).cast("long").as("event_id"))
    val left = events.select(
      col("user_id"),
      col("ts").as("t"),
      lit(1).as("side"),
      lit(null).cast("long").as("orderkey"),
      col("event_id"))

    // side=0 sorts before side=1 at equal t: an order dated exactly at the
    // event's timestamp is visible to it (inclusive <=).
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("t"), col("side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    right.unionByName(left)
      .withColumn("matched_orderkey", last(col("orderkey"), ignoreNulls = true).over(w))
      .filter(col("side") === 1 && col("matched_orderkey").isNotNull)
      .select(col("event_id"), col("user_id"), col("matched_orderkey"))
      .orderBy(col("event_id"))
  }

  /** Feature-store POINT-IN-TIME-correct join: each purchase event is
    * enriched with the user's order-history features (orders so far,
    * spend so far in exact cents) AS OF the event's timestamp — the
    * no-future-leakage primitive for training-example assembly (a
    * feature computed over data later than the label's timestamp leaks
    * the future into training). Same merge formulation: cumulative
    * features via one per-user window over orders, one union, one keyed
    * shuffle, carry-forward — never an events x orders pair join. Orders
    * dated exactly at the event timestamp are visible (inclusive as-of,
    * side ordering); several orders on one date collapse to that date's
    * final cumulative row before the carry. Users with no prior orders
    * report zeros (a real feature value, not a dropped row).
    */
  def pointInTimeFeatures(events: DataFrame, orders: DataFrame): DataFrame = {
    val cumW = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = orders
      .withColumn("n_orders_cum", count(lit(1)).over(cumW))
      .withColumn("spend_cents_cum",
        sum(graft.queries.Analytics.centsOf(col("o_totalprice"))).over(cumW)
          .cast("long"))
      // date-final row only: the as-of carry must see one cumulative per
      // (user, date), the one including every order of that date
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("o_custkey"), col("o_orderdate"))
          .orderBy(col("o_orderkey").desc)))
      .filter(col("rn") === 1)
    val right = cum.select(
      col("o_custkey").as("user_id"), col("o_orderdate").as("t"),
      lit(0).as("side"), col("n_orders_cum"), col("spend_cents_cum"),
      lit(null).cast("long").as("event_id"))
    val left = events
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("t"), lit(1).as("side"),
        lit(null).cast("long").as("n_orders_cum"),
        lit(null).cast("long").as("spend_cents_cum"),
        col("event_id"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("t"), col("side"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    right.unionByName(left)
      .withColumn("pit_orders", last(col("n_orders_cum"), ignoreNulls = true).over(w))
      .withColumn("pit_spend", last(col("spend_cents_cum"), ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select(col("event_id"), col("user_id"),
        coalesce(col("pit_orders"), lit(0L)).as("n_orders_pit"),
        coalesce(col("pit_spend"), lit(0L)).as("spend_cents_pit"))
      .orderBy(col("event_id"))
  }

  /** Last-touch attribution: each purchase is credited to the user's most
    * recent click/view at or before it, provided the touch falls inside
    * the lookback window; purchases with no such touch report as 'none'.
    * The marketing-attribution shape, built on the same merge formulation
    * as [[eventsToLatestOrder]]: one union, one shuffle on user, one
    * per-partition sort, carry-forward via last(ignoreNulls) — no
    * purchases x touches pair join at any scale. The lookback compares
    * TIMESTAMPS (interval arithmetic, exact micros on both engines),
    * never epoch-seconds floats. Sort key includes event_id so two
    * touches at an identical timestamp break ties deterministically.
    * Attributed value is the exact cents fixed point.
    */
  def lastTouchAttribution(events: DataFrame, lookback: String = "1 hour"): DataFrame = {
    val touches = events
      .filter(col("event_type").isin("click", "view"))
      .select(col("user_id"), col("ts").as("t"), lit(0).as("side"),
        col("event_type").as("touch_type"), col("ts").as("touch_ts"),
        col("event_id"), lit(null).cast("double").as("value"))
    val purchases = events
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("t"), lit(1).as("side"),
        lit(null).cast("string").as("touch_type"),
        lit(null).cast("timestamp").as("touch_ts"),
        col("event_id"), col("value"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("t"), col("side"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    touches.unionByName(purchases)
      .withColumn("lt_type", last(col("touch_type"), ignoreNulls = true).over(w))
      .withColumn("lt_ts", last(col("touch_ts"), ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .withColumn("attributed_to",
        when(col("lt_ts").isNotNull &&
          col("lt_ts") >= col("t") - expr(s"INTERVAL $lookback"),
          col("lt_type")).otherwise(lit("none")))
      .groupBy(col("attributed_to"))
      .agg(
        count(lit(1)).as("n_purchases"),
        sum(graft.queries.Analytics.centsOf(col("value"))).cast("long")
          .as("value_cents"))
      .orderBy(col("attributed_to"))
  }
}
