package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Table-evolution operators: the warehouse-maintenance trio a production
  * pipeline runs around its fact tables — slowly-changing-dimension
  * reconstruction, snapshot CDC diff, and incremental (partial-aggregate)
  * view maintenance. The reference delegates all state evolution to a
  * Postgres upsert (processor/src/infrastructure/database.py ON CONFLICT,
  * migrations/001_initial_schema.sql:13); these operators generalize that
  * single LWW key-state contract to the three shapes a lakehouse actually
  * needs once history, reconciliation, and re-aggregation enter the
  * picture.
  *
  * Scale notes are per-operator; the common discipline is that every
  * operator is one (or two, when semantically required) hash-partitioned
  * passes keyed by the entity key — no self-joins, no driver state.
  */
object Evolution {

  import graft.queries.Analytics.centsOf

  /** SCD Type-2 history reconstruction (Kimball dimension versioning):
    * collapse an append-only change log into per-entity validity
    * intervals — one row per RUN of consecutive equal attribute values,
    * with `valid_from` / `valid_to` / `is_current` / `version`.
    *
    * Here the change log is `orders` per customer ordered by
    * (o_orderdate, o_orderkey) and the tracked attribute is
    * `o_orderpriority` — the customer's "current priority regime".
    *
    * Distributed shape: the islands-and-gaps trick (lag-compare -> running
    * sum of change flags = run id) needs ONE hash partitioning by
    * `o_custkey`; the run groupBy and the valid_to lead-window re-use the
    * same key prefix, so at cluster scale this is a single shuffle of
    * (key, date, attr) tuples followed by narrow window passes. No join,
    * no state beyond the window buffers; 100 TB of change log shards by
    * entity key.
    */
  def scd2History(orders: DataFrame): DataFrame = {
    val byTime = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val changed = when(
      lag(col("o_orderpriority"), 1).over(byTime).isNull ||
        lag(col("o_orderpriority"), 1).over(byTime) =!= col("o_orderpriority"),
      1L).otherwise(0L)
    val runs = orders
      .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"),
        col("o_orderpriority"))
      .withColumn("version", sum(changed).over(
        byTime.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("o_custkey"), col("version"), col("o_orderpriority"))
      .agg(
        min(col("o_orderdate")).as("valid_from"),
        count(lit(1)).as("n_orders"))
    val byVersion = Window.partitionBy(col("o_custkey")).orderBy(col("version"))
    runs
      .withColumn("valid_to", lead(col("valid_from"), 1).over(byVersion))
      .select(
        col("o_custkey"),
        col("version").cast("long").as("version"),
        col("o_orderpriority").as("status"),
        col("valid_from"), col("valid_to"),
        col("valid_to").isNull.as("is_current"),
        col("n_orders"))
      .orderBy(col("o_custkey"), col("version"))
  }

  /** Snapshot CDC diff: classify every entity's state change between two
    * as-of snapshots of an append-only fact table (orders as-of `t1` vs
    * as-of `t2`) as added / changed, with old/new/delta measures. The
    * reconciliation primitive behind "what moved since the last publish".
    *
    * Distributed shape: NOT a join of two snapshots — both states come
    * out of ONE scan of the `< t2` slice with an `< t1` indicator folded
    * into conditional aggregates, so the cost is one filtered scan + one
    * hash aggregate regardless of how many snapshots-pairs you diff.
    * (A materialized-snapshot diff would be two scans + a full outer
    * join; the indicator formulation is what you want when both
    * snapshots derive from the same immutable log.) Money is diffed in
    * the exact cents fixed point.
    */
  def snapshotDiff(orders: DataFrame, t1: String, t2: String): DataFrame = {
    val isOld = col("o_orderdate") < to_timestamp(lit(t1))
    orders
      .filter(col("o_orderdate") < to_timestamp(lit(t2)))
      .groupBy(col("o_custkey"))
      .agg(
        sum(when(isOld, 1L).otherwise(0L)).as("n_old"),
        count(lit(1)).as("n_new"),
        sum(when(isOld, centsOf(col("o_totalprice")).cast("long"))
          .otherwise(0L)).as("spend_old_cents"),
        sum(centsOf(col("o_totalprice")).cast("long")).as("spend_new_cents"))
      .withColumn("change_type",
        when(col("n_old") === 0L, lit("added"))
          .when(col("n_new") === col("n_old"), lit("unchanged"))
          .otherwise(lit("changed")))
      .filter(col("change_type") =!= "unchanged")
      .select(
        col("o_custkey"), col("change_type"),
        col("n_old"), col("n_new"),
        (col("n_new") - col("n_old")).as("delta_orders"),
        col("spend_old_cents"), col("spend_new_cents"),
        (col("spend_new_cents") - col("spend_old_cents")).as("delta_spend_cents"))
      .orderBy(col("o_custkey"))
  }

  /** Incremental view maintenance by partial-aggregate MERGE: aggregate an
    * "old" batch and a "delta" batch into mergeable partials (count / sum /
    * min / max in exact cents), then combine partials by key — the
    * algebraic-aggregate contract (count+=count, sum+=sum, min=min(min),
    * max=max(max)) that lets a materialized view absorb a new partition
    * WITHOUT rescanning history. `avg` is derived at read time from the
    * merged sum/count, never merged itself (averages don't merge).
    *
    * The oracle for this operator is the FULL recompute over the base
    * table — equality IS the correctness statement (merge ≡ recompute).
    * The split timestamp deliberately lands mid-hour so boundary windows
    * genuinely exercise the merge path.
    *
    * Distributed shape: each batch aggregates with map-side combine to a
    * frame bounded by |windows|x|event types|; the merge is a second tiny
    * hash aggregate over 2x that frame. At 100 TB the "old" side is the
    * already-materialized view (no rescan) — only the delta is scanned,
    * which is the entire point.
    */
  def incrementalMerge(events: DataFrame, splitTs: String): DataFrame = {
    def partials(df: DataFrame): DataFrame = df
      .groupBy(
        date_trunc("hour", col("ts")).as("window_start"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(centsOf(col("value")).cast("long")).as("sum_cents"),
        min(centsOf(col("value")).cast("long")).as("min_cents"),
        max(centsOf(col("value")).cast("long")).as("max_cents"))
    val split = to_timestamp(lit(splitTs))
    val old = partials(events.filter(col("ts") < split))
    val delta = partials(events.filter(col("ts") >= split))
    old.unionByName(delta)
      .groupBy(col("window_start"), col("event_type"))
      .agg(
        sum(col("n")).as("n"),
        sum(col("sum_cents")).as("sum_cents"),
        min(col("min_cents")).as("min_cents"),
        max(col("max_cents")).as("max_cents"))
      .select(
        col("window_start"), col("event_type"), col("n"),
        col("sum_cents"), col("min_cents"), col("max_cents"),
        // RAW division, never round(quotient): the operands are exact
        // longs so the IEEE result is bit-identical cross-engine, while
        // cents-quotients land on round()'s tie boundaries routinely
        // (caught by the sf0.1 sweep: 47.25375 rounds differently on
        // Spark's BigDecimal HALF_UP vs DuckDB's multiply path)
        (col("sum_cents").cast("double") / lit(100.0) /
          col("n").cast("double")).as("avg_value"))
      .orderBy(col("window_start"), col("event_type"))
  }
}
