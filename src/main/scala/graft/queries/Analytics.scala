package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Star-schema analytics beyond the reference surface (SURVEY.md §7 step 7):
  * joins, top-K, SQL window functions, semi/anti joins, rollup — the query
  * shapes a user of the reference's Postgres-backed API would reach for next,
  * expressed the way they should run on a 1000-executor cluster:
  *
  *   - fixed-cardinality dims (`nation`, `region`) carry explicit
  *     broadcast hints; scale-factor-sized tables (`customer`, `part`,
  *     `orders`) are left to AQE, which broadcasts them while they fit
  *     the threshold and falls back to shuffle joins when they don't —
  *     a hard-coded broadcast of a scaled table would OOM at 100 TB;
  *   - aggregations are declarative groupBy so Catalyst plans partial+final
  *     hash agg with map-side combine;
  *   - top-K = orderBy+limit, planned as TakeOrderedAndProject (per-partition
  *     heap + driver merge, no global sort).
  *
  * Determinism note (oracle bit-exactness): large double sums are
  * order-dependent, so money measures are summed as DECIMAL (exact,
  * order-independent) and cast back to double — see [[decSum]].
  */
object Analytics {

  /** Sum `c` exactly: cast each value to DECIMAL(18,scale) (deterministic
    * per-row rounding of an identical double on every engine), sum without
    * order sensitivity, return as double (correctly-rounded conversion).
    * `scale` is the natural decimal scale of the summand (2 for prices,
    * 4 for price*(1-disc), 6 with a tax factor).
    */
  def decSum(c: Column, scale: Int): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  /** Exact money-to-cents fixed point: one deterministic per-row rounding
    * of the double into DECIMAL(18,2), then the integral cents value as
    * DECIMAL(18,0) — the cross-engine contract every cents-based oracle
    * (`CAST(CAST(x AS DECIMAL(18,2)) * 100 AS ...)`) replays. Cast further
    * (`.cast("long")`) at sites that need a BIGINT.
    */
  def centsOf(c: Column): Column =
    (c.cast(DecimalType(18, 2)) * 100).cast(DecimalType(18, 0))

  /** TPC-H Q1-shaped pricing summary over lineitem (scan + hash agg only). */
  def pricingSummary(lineitem: DataFrame, shipdateCutoff: String = "1998-09-02"): DataFrame = {
    val discPrice = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    val charge = discPrice * (lit(1.0) + col("l_tax"))
    lineitem
      .filter(col("l_shipdate") <= to_timestamp(lit(s"$shipdateCutoff 00:00:00")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        decSum(col("l_quantity"), 2).as("sum_qty"),
        decSum(col("l_extendedprice"), 2).as("sum_base_price"),
        decSum(discPrice, 4).as("sum_disc_price"),
        decSum(charge, 6).as("sum_charge"),
        (decSum(col("l_quantity"), 2) / count(lit(1))).as("avg_qty"),
        (decSum(col("l_extendedprice"), 2) / count(lit(1))).as("avg_price"),
        (decSum(col("l_discount"), 2) / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** Revenue by market segment: orders x customer (AQE picks the strategy). */
  def mktsegRevenue(orders: DataFrame, customer: DataFrame): DataFrame =
    orders
      .join(customer, orders("o_custkey") === customer("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(
        decSum(col("o_totalprice"), 2).as("revenue"),
        count(lit(1)).as("order_count"),
        countDistinct(col("o_custkey")).as("customer_count"))
      .orderBy(col("c_mktsegment"))

  /** Revenue by region/nation: snowflake with fixed dims broadcast. */
  def nationRevenue(
      orders: DataFrame, customer: DataFrame,
      nation: DataFrame, region: DataFrame): DataFrame =
    orders
      .join(customer, orders("o_custkey") === customer("c_custkey"))
      .join(broadcast(nation), customer("c_nationkey") === nation("n_nationkey"))
      .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        decSum(col("o_totalprice"), 2).as("revenue"),
        count(lit(1)).as("order_count"))
      .orderBy(col("r_name"), col("n_name"))

  /** Top-10 part brands by discounted revenue (top-K, AQE-joined part). */
  def topBrandsByRevenue(lineitem: DataFrame, part: DataFrame, k: Int = 10): DataFrame =
    lineitem
      .join(part, lineitem("l_partkey") === part("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(
        decSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4).as("revenue"),
        decSum(col("l_quantity"), 2).as("total_qty"))
      .orderBy(desc("revenue"), asc("p_brand"))
      .limit(k)

  /** SQL window function: each customer's top-N orders by value.
    * One shuffle on o_custkey; rank computed within sorted partitions.
    */
  def topOrdersPerCustomer(orders: DataFrame, n: Int = 3): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
    orders
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= n)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rnk"))
      .orderBy(col("o_custkey"), col("rnk"))
  }

  /** Anti join: customers with no order above `threshold` (NOT EXISTS). */
  def customersWithoutBigOrders(
      orders: DataFrame, customer: DataFrame, threshold: Double = 300000.0): DataFrame =
    customer
      .join(
        orders.filter(col("o_totalprice") > threshold),
        customer("c_custkey") === col("o_custkey"),
        "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))

  /** Semi join: customers with at least one order above `threshold` (EXISTS). */
  def bigSpenders(
      orders: DataFrame, customer: DataFrame, threshold: Double = 400000.0): DataFrame =
    customer
      .join(
        orders.filter(col("o_totalprice") > threshold),
        customer("c_custkey") === col("o_custkey"),
        "left_semi")
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      .orderBy(col("c_custkey"))

  /** ROLLUP over (orderstatus, orderpriority): subtotals + grand total in one
    * pass (Catalyst expands grouping sets map-side; still one shuffle).
    */
  def revenueRollup(orders: DataFrame): DataFrame =
    orders
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(
        decSum(col("o_totalprice"), 2).as("revenue"),
        count(lit(1)).as("order_count"))
      .orderBy(
        asc_nulls_first("o_orderstatus"),
        asc_nulls_first("o_orderpriority"))

  /** TPC-H Q3 shape — shipping priority: filtered fact x filtered scaled
    * dims, revenue per order, top-K. Filters reach all three parquet scans
    * before the joins.
    */
  def shippingPriority(
      lineitem: DataFrame, orders: DataFrame, customer: DataFrame,
      segment: String = "BUILDING", cutoff: String = "1998-03-15"): DataFrame = {
    val cut = to_timestamp(lit(s"$cutoff 00:00:00"))
    lineitem
      .filter(col("l_shipdate") > cut)
      .join(orders.filter(col("o_orderdate") < cut),
        col("l_orderkey") === col("o_orderkey"))
      .join(customer.filter(col("c_mktsegment") === segment),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(decSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4).as("revenue"))
      .orderBy(desc("revenue"), asc("l_orderkey"))
      .limit(10)
  }

  /** TPC-H Q5 shape — regional volume through a 5-table snowflake; fixed
    * dims broadcast, scaled tables AQE-joined.
    */
  def regionalVolume(
      lineitem: DataFrame, orders: DataFrame, customer: DataFrame,
      nation: DataFrame, region: DataFrame,
      regionName: String = "ASIA"): DataFrame =
    lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region.filter(col("r_name") === regionName)),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(
        decSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4).as("revenue"),
        count(lit(1)).as("line_count"))
      .orderBy(desc("revenue"), asc("n_name"))

  /** Ranking-window breadth: per-user spend quartile (ntile), percentile
    * rank and cumulative distribution over total order value — one
    * aggregate, then EXACT global ranks via
    * [[graft.operators.DistributedRank]]: range repartition + parallel
    * per-partition windows + a partition-offset prefix sum, never an
    * unpartitioned `Window.orderBy` (which funnels every row through one
    * task — the straggler this query used to accept on the aggregated
    * frame). ntile/percent_rank/cume_dist derive arithmetically from the
    * rank with the window functions' own formulas, so results are
    * row-identical to the single-window formulation (asserted in
    * AnalyticsSpec) and the DuckDB window-function oracle still matches
    * bit-for-bit. Tie-broken by customer key: a total order, as
    * DistributedRank requires.
    */
  def customerSpendQuartiles(orders: DataFrame): DataFrame = {
    val perUser = orders
      .groupBy(col("o_custkey"))
      .agg(decSum(col("o_totalprice"), 2).as("total_spend"),
        count(lit(1)).as("order_count"))
    graft.operators.DistributedRank
      .withRankStats(
        perUser, Seq(col("total_spend"), col("o_custkey")), k = 4,
        tileCol = "spend_quartile", pctCol = "spend_pct_rank",
        cumeCol = "spend_cume_dist")
      .select(
        col("o_custkey"), col("total_spend"), col("order_count"),
        col("spend_quartile"), col("spend_pct_rank"), col("spend_cume_dist"))
      .orderBy(col("o_custkey"))
  }

  /** RFM segmentation — recency / frequency / monetary quintiles per
    * customer, reported as the 5×5×5 segment grid with exact average
    * spend. Quintiles come from [[graft.operators.DistributedRank
    * .withRankStats]] (exact distributed ranks, ntile arithmetic — no
    * single-partition window), tie-broken by customer key into a total
    * order; the DuckDB ntile(5) window oracle matches row-for-row
    * because the arithmetic IS ntile's definition.
    *
    * Scale: one orders fold to the per-customer frame, then three
    * range-partitioned rankings of that dimension-sized frame; the
    * report is ≤ 125 rows.
    */
  def rfmSegments(orders: DataFrame): DataFrame = {
    val cust = orders.groupBy(col("o_custkey")).agg(
      datediff(lit("1998-08-02").cast("date"),
        max(to_date(col("o_orderdate")))).cast("long").as("recency_days"),
      count(lit(1)).as("frequency"),
      sum(centsOf(col("o_totalprice")).cast("long")).as("monetary_cents"))
    def tile(df: org.apache.spark.sql.DataFrame, metric: String,
        out: String) =
      graft.operators.DistributedRank
        .withRankStats(df, Seq(col(metric), col("o_custkey")), k = 5,
          tileCol = out, pctCol = s"__p_$out", cumeCol = s"__c_$out")
        .drop(s"__p_$out", s"__c_$out")
    val tiled = tile(tile(tile(cust, "recency_days", "rq"),
      "frequency", "fq"), "monetary_cents", "mq")
    tiled
      .groupBy(col("rq"), col("fq"), col("mq"))
      .agg(count(lit(1)).as("n_customers"),
        sum(col("monetary_cents")).as("seg_cents"))
      .select(col("rq"), col("fq"), col("mq"), col("n_customers"),
        expr("CAST(seg_cents AS DECIMAL(38,0)) * 1000000" +
          " DIV n_customers").as("avg_monetary_micros"))
      .orderBy(col("rq"), col("fq"), col("mq"))
  }

  def rfmSegmentsOracleSql: String =
    """WITH cust AS (SELECT o_custkey,
      |  CAST(date_diff('day', CAST(max(o_orderdate) AS DATE),
      |    DATE '1998-08-02') AS BIGINT) AS recency_days,
      |  CAST(count(*) AS BIGINT) AS frequency,
      |  CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
      |    AS BIGINT)) AS BIGINT) AS monetary_cents
      |  FROM orders GROUP BY 1),
      |t AS (SELECT *,
      |  CAST(ntile(5) OVER (ORDER BY recency_days, o_custkey)
      |    AS INTEGER) AS rq,
      |  CAST(ntile(5) OVER (ORDER BY frequency, o_custkey)
      |    AS INTEGER) AS fq,
      |  CAST(ntile(5) OVER (ORDER BY monetary_cents, o_custkey)
      |    AS INTEGER) AS mq FROM cust)
      |SELECT rq, fq, mq, CAST(count(*) AS BIGINT) AS n_customers,
      |  CAST(CAST(sum(monetary_cents) AS HUGEINT) * 1000000
      |    // count(*) AS BIGINT) AS avg_monetary_micros
      |FROM t GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin

  /** Retention cohorts: users grouped by first-seen day, counted on each
    * subsequent activity-day offset — the classic triangle. Two aggregates
    * (first-seen per user; distinct active users per (cohort, offset)),
    * both keyed shuffles with map-side combine; the cohort join input is
    * one row per user, not the event stream.
    */
  def retentionCohorts(events: DataFrame, maxOffsetDays: Int = 7): DataFrame = {
    val firstSeen = events
      .groupBy(col("user_id"))
      .agg(min(to_date(col("ts"))).as("cohort_day"))
    events
      .select(col("user_id"), to_date(col("ts")).as("active_day"))
      .distinct()
      .join(firstSeen, "user_id")
      .withColumn("day_offset", datediff(col("active_day"), col("cohort_day")))
      .filter(col("day_offset") <= maxOffsetDays)
      .groupBy(col("cohort_day"), col("day_offset"))
      .agg(countDistinct(col("user_id")).as("active_users"))
      .orderBy(col("cohort_day"), col("day_offset"))
  }

  /** Staged conversion funnel: users with a view; of those, a first click
    * at-or-after their first view; of those, a first purchase at-or-after
    * that click — per-stage user counts (the classic product-analytics
    * query, with real event-ORDER semantics, not mere per-type presence).
    * Each stage is a filtered min-aggregate forward-joined on user_id —
    * shuffles are keyed on user_id and carry one row per qualifying user,
    * never the event stream; stage cardinality only shrinks.
    */
  def funnel(events: DataFrame): DataFrame = {
    val firstView = events.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("view_ts"))
    val firstClick = events.filter(col("event_type") === "click").as("e")
      .join(firstView.as("v"),
        col("e.user_id") === col("v.user_id") && col("e.ts") >= col("v.view_ts"))
      .groupBy(col("e.user_id")).agg(min(col("e.ts")).as("click_ts"))
      .select(col("user_id"), col("click_ts"))
    val firstPurchase = events.filter(col("event_type") === "purchase").as("e")
      .join(firstClick.as("c"),
        col("e.user_id") === col("c.user_id") && col("e.ts") >= col("c.click_ts"))
      .groupBy(col("e.user_id")).agg(min(col("e.ts")).as("purchase_ts"))
    firstView.agg(count(lit(1)).as("users")).withColumn("stage", lit("1_view"))
      .unionByName(
        firstClick.agg(count(lit(1)).as("users")).withColumn("stage", lit("2_click")))
      .unionByName(
        firstPurchase.agg(count(lit(1)).as("users")).withColumn("stage", lit("3_purchase")))
      .select(col("stage"), col("users"))
      .orderBy(col("stage"))
  }

  /** TPC-H Q10 shape — returned-item revenue: the customers who returned
    * the most (l_returnflag = 'R'), with their nation. The returnflag
    * filter reaches the lineitem parquet scan before the first join; the
    * scaled tables (lineitem/orders/customer) meet on AQE-sized shuffle
    * equi-joins; only the fixed 25-row nation dim broadcasts.
    */
  def returnedItemRevenue(
      lineitem: DataFrame, orders: DataFrame, customer: DataFrame,
      nation: DataFrame, topK: Int = 20): DataFrame =
    lineitem
      .filter(col("l_returnflag") === "R")
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
      .agg(decSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4).as("revenue"))
      .orderBy(desc("revenue"), asc("c_custkey"))
      .limit(topK)

  /** Supplier-side revenue rollup: lineitem ⋈ supplier ⋈ nation — revenue,
    * distinct suppliers and line count per SUPPLIER nation. `supplier` is a
    * scaled table (grows with SF) so it is NOT hint-broadcast — AQE picks
    * the join strategy per run; the fixed nation dim broadcasts.
    */
  def supplierNationRevenue(
      lineitem: DataFrame, supplier: DataFrame, nation: DataFrame): DataFrame =
    lineitem
      .join(supplier, col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        decSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4).as("revenue"),
        countDistinct(col("s_suppkey")).as("supplier_count"),
        count(lit(1)).as("line_count"))
      .orderBy(desc("revenue"), asc("n_name"))

  /** Window frames: per-user running totals (unbounded-preceding DECIMAL
    * frame sum — order-independent exactness even under DuckDB's segment
    * trees), event index, and delta vs the previous event's value.
    */
  def userRunningTotals(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val frame = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events.select(
        col("user_id"), col("event_id"),
        row_number().over(byUser).as("event_index"),
        sum(col("value").cast(DecimalType(18, 2))).over(frame).cast("double")
          .as("running_value"),
        (col("value") - lag(col("value"), 1).over(byUser)).as("value_delta"))
      .orderBy(col("user_id"), col("event_index"))
  }

  /** Time-based RANGE window frame: per-event trailing-interval aggregate
    * (events and value mass in the preceding `seconds` per user) — the
    * sliding time-window primitive of monitoring/feature pipelines, and a
    * genuinely different frame kind from [[userRunningTotals]]'s ROWS
    * frame: membership is defined by the ORDER KEY's value (epoch micros),
    * not row position, so ties (peer rows) enter the frame together.
    * The sum rides the same DECIMAL(18,2) cast as the running totals —
    * order-independent exact, so the oracle comparison is bit-exact
    * regardless of how either engine walks the frame.
    */
  def userTrailingWindow(events: DataFrame, seconds: Long = 3600L): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(unix_micros(col("ts")))
      .rangeBetween(-seconds * 1000000L, 0L)
    events.select(
        col("event_id"), col("user_id"),
        count(lit(1)).over(w).as("trailing_events"),
        sum(col("value").cast(DecimalType(18, 2))).over(w).cast("double")
          .as("trailing_value"))
      .orderBy(col("event_id"))
  }

  /** Decorrelated-subquery shape: customers above their nation's average
    * balance — a partition-wide window aggregate (DECIMAL-exact) compared
    * against the row value, no self-join.
    */
  def aboveAvgBalance(customer: DataFrame): DataFrame = {
    val byNation = Window.partitionBy(col("c_nationkey"))
    customer
      .withColumn("nation_avg",
        sum(col("c_acctbal").cast(DecimalType(18, 2))).over(byNation).cast("double")
          / count(lit(1)).over(byNation))
      .filter(col("c_acctbal") > col("nation_avg"))
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"), col("nation_avg"))
      .orderBy(col("c_custkey"))
  }

  /** Temporal profile: events by hour-of-day x day-of-week (dow aligned to
    * Sunday=0 to match ANSI/DuckDB conventions).
    */
  def eventsTimeProfile(events: DataFrame): DataFrame =
    events
      .groupBy(
        hour(col("ts")).as("hour_of_day"),
        (dayofweek(col("ts")) - 1).as("dow"))
      .agg(
        count(lit(1)).as("event_count"),
        round(sum(col("value")), 2).as("total_value"))
      .orderBy(col("hour_of_day"), col("dow"))

  /** SCD2-style run compaction of the event stream: consecutive same-type
    * events per user collapse into validity intervals
    * (`valid_from`, `valid_to`) — the change-data-capture shape that turns
    * an event log into a slowly-changing dimension snapshot. Two window
    * passes over ONE shuffle on user_id (lag → run-id prefix sum, then a
    * keyed aggregate and a lead over the compacted frame — the second
    * window re-partitions on the same key, so AQE coalesces it onto the
    * same exchange). `valid_to` of the last run is NULL (`is_current`).
    */
  def eventTypeIntervals(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val prevType = lag(col("event_type"), 1).over(byUser)
    val runs = events
      .withColumn("chg",
        when(prevType.isNull || col("event_type") =!= prevType, 1L).otherwise(0L))
      .withColumn("run_id", sum(col("chg")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("run_id"), col("event_type"))
      .agg(min(col("ts")).as("valid_from"), count(lit(1)).as("n_events"))
    val byRun = Window.partitionBy(col("user_id")).orderBy(col("run_id"))
    runs
      .withColumn("valid_to", lead(col("valid_from"), 1).over(byRun))
      .withColumn("is_current", col("valid_to").isNull)
      .select(
        col("user_id"), col("run_id"), col("event_type"),
        col("valid_from"), col("valid_to"), col("is_current"), col("n_events"))
      .orderBy(col("user_id"), col("run_id"))
  }

  /** Explicit GROUPING SETS — two INDEPENDENT one-dimension aggregates
    * (by status, by priority) in a single pass/shuffle, a shape neither
    * ROLLUP nor CUBE can express (both would add the (status, priority)
    * cross term). `grouping_id` disambiguates which set a row belongs to
    * (bit per grouping column, first column = MSB — the convention Spark
    * and DuckDB share).
    */
  def groupingSetsRevenue(orders: DataFrame): DataFrame =
    orders
      .groupingSets(
        Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority"))),
        col("o_orderstatus"), col("o_orderpriority"))
      .agg(
        grouping_id().as("gid"),
        decSum(col("o_totalprice"), 2).as("revenue"),
        count(lit(1)).as("order_count"))
      .select(
        col("gid"), col("o_orderstatus"), col("o_orderpriority"),
        col("revenue"), col("order_count"))
      .orderBy(
        asc("gid"),
        asc_nulls_first("o_orderstatus"),
        asc_nulls_first("o_orderpriority"))

  /** TPC-H Q17 shape — small-quantity-order revenue: lineitems of one
    * brand's parts whose quantity is below `factor` x that part's average
    * quantity; yearly-ized revenue. The correlated per-part average is a
    * partition window over the joined frame (every lineitem of a surviving
    * part survives the brand equi-join, so the window average equals the
    * correlated subquery's) — no second scan, no self-join, and the brand
    * filter prunes the part side before the join. DECIMAL-exact sums; the
    * quantity comparison is double-deterministic (exact decimal sum → one
    * division → one multiply).
    */
  def smallQuantityRevenue(
      lineitem: DataFrame, part: DataFrame,
      brand: String = "Brand#4", factor: Double = 0.5): DataFrame = {
    val byPart = Window.partitionBy(col("p_partkey"))
    lineitem
      .join(part.filter(col("p_brand") === brand),
        col("l_partkey") === col("p_partkey"))
      .withColumn("avg_qty",
        sum(col("l_quantity").cast(DecimalType(18, 2))).over(byPart).cast("double")
          / count(lit(1)).over(byPart))
      .filter(col("l_quantity") < lit(factor) * col("avg_qty"))
      .agg(
        (decSum(col("l_extendedprice"), 2) / lit(7.0)).as("avg_yearly"),
        count(lit(1)).as("line_count"))
  }

  /** TPC-H Q2 shape — min-cost supplier per part within a region: the
    * observed unit cost (min `l_extendedprice / l_quantity` over a
    * part-supplier's lineitems — the harness has no partsupp table, so the
    * lineitem history IS the cost book) is minimized per part ACROSS the
    * region's suppliers, keeping ties. The correlated min is a partition
    * window over the already-filtered frame (one shuffle on p_partkey; no
    * second scan, no self-join); region/nation are broadcast; the p_size
    * filter prunes the part scan. The unit cost is one IEEE division of
    * identical doubles and min() is order-independent, so the `cost ==
    * min_cost` equality is bit-deterministic cross-engine.
    */
  def minCostSupplier(
      lineitem: DataFrame, part: DataFrame, supplier: DataFrame,
      nation: DataFrame, region: DataFrame,
      regionName: String = "EUROPE", size: Int = 15): DataFrame = {
    val unitCost = col("l_extendedprice") / col("l_quantity")
    // prune BEFORE aggregating: the p_size filter keeps ~1/50 of parts, and
    // joining the (AQE-broadcastable) filtered part first cuts the cost-book
    // aggregate's input by the same factor — at 100 TB the aggregate over
    // unfiltered lineitem would dominate the query
    val costBook = lineitem
      .join(part.filter(col("p_size") === size),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_partkey"), col("l_suppkey"), col("p_partkey"), col("p_brand"))
      .agg(min(unitCost).as("cost"))
    val inRegion = costBook
      .join(supplier, col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region.filter(col("r_name") === regionName)),
        col("n_regionkey") === col("r_regionkey"))
    inRegion
      .withColumn("min_cost",
        min(col("cost")).over(Window.partitionBy(col("p_partkey"))))
      .filter(col("cost") === col("min_cost"))
      .select(
        col("p_partkey"), col("p_brand"), col("s_name"), col("n_name"),
        col("cost"))
      .orderBy(col("p_partkey"), col("s_name"))
  }

  /** TPC-H Q7 shape — directional trade volume between supplier and
    * customer nations over a two-year shipping window. The two nation
    * lookups are independent broadcast joins (aliased dims); the fact
    * table shuffles once for the final (supp, cust, year) aggregate.
    * Same-nation flows are excluded (the interesting signal is
    * cross-border volume).
    */
  def nationTradeVolume(
      lineitem: DataFrame, orders: DataFrame, customer: DataFrame,
      supplier: DataFrame, nation: DataFrame,
      from: String = "1995-01-01", until: String = "1997-01-01"): DataFrame = {
    val suppNation = nation.select(
      col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
    val custNation = nation.select(
      col("n_nationkey").as("cn_key"), col("n_name").as("cust_nation"))
    lineitem
      .filter(col("l_shipdate") >= to_timestamp(lit(s"$from 00:00:00")) &&
        col("l_shipdate") < to_timestamp(lit(s"$until 00:00:00")))
      .join(supplier, col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(suppNation), col("s_nationkey") === col("sn_key"))
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(custNation), col("c_nationkey") === col("cn_key"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(
        decSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
          .as("volume"),
        count(lit(1)).as("line_count"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  /** TPC-H Q8 shape — market share: the fraction of a region's yearly
    * order volume (for one part type) supplied by one target nation.
    * Numerator and denominator are both order-independent DECIMAL sums
    * (the conditional numerator sums `0.0000` for non-target rows, NOT
    * NULL — share must be 0, not NULL, in years the nation sold nothing);
    * the share is then one double division of two cross-engine-identical
    * doubles.
    */
  def marketShare(
      lineitem: DataFrame, orders: DataFrame, customer: DataFrame,
      supplier: DataFrame, part: DataFrame, nation: DataFrame,
      region: DataFrame, targetNation: String = "NATION_2",
      regionName: String = "ASIA", partType: String = "ECONOMY"): DataFrame = {
    val suppNation = nation.select(
      col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
    val custNation = nation.select(
      col("n_nationkey").as("cn_key"), col("n_regionkey").as("cn_region"))
    val volume = (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
      .cast(DecimalType(18, 4))
    lineitem
      .join(part.filter(col("p_type") === partType),
        col("l_partkey") === col("p_partkey"))
      .join(supplier, col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(suppNation), col("s_nationkey") === col("sn_key"))
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(custNation), col("c_nationkey") === col("cn_key"))
      .join(broadcast(region.filter(col("r_name") === regionName)),
        col("cn_region") === col("r_regionkey"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(
        (sum(when(col("supp_nation") === targetNation, volume)
          .otherwise(lit(0.0).cast(DecimalType(18, 4)))).cast("double")
          / sum(volume).cast("double")).as("mkt_share"),
        sum(volume).cast("double").as("total_volume"),
        count(lit(1)).as("line_count"))
      .orderBy(col("o_year"))
  }

  /** TPC-H Q13 shape — customer order-count distribution INCLUDING the
    * zero bucket: a left outer join with the filter ON the join condition
    * (an inner join or a post-join filter would silently drop order-less
    * customers), `count(o_orderkey)` counting only matched rows, then a
    * second aggregate over the per-customer counts. Two shuffles by
    * construction (custkey, then c_count — the second is dim-sized).
    */
  def orderCountDistribution(
      orders: DataFrame, customer: DataFrame,
      excludePriority: String = "1-URGENT"): DataFrame =
    customer
      .join(orders,
        col("c_custkey") === col("o_custkey") &&
          col("o_orderpriority") =!= excludePriority,
        "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(desc("custdist"), desc("c_count"))

  /** TPC-H Q14 shape — promo revenue share of one shipping month: a
    * conditional DECIMAL sum over the part-type flag against the total,
    * scaled to percent. The month filter reaches the lineitem scan; part
    * rides the join (AQE broadcasts it while it fits).
    */
  def promoRevenueShare(
      lineitem: DataFrame, part: DataFrame,
      from: String = "1996-01-01", until: String = "1996-02-01"): DataFrame = {
    val volume = (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
      .cast(DecimalType(18, 4))
    lineitem
      .filter(col("l_shipdate") >= to_timestamp(lit(s"$from 00:00:00")) &&
        col("l_shipdate") < to_timestamp(lit(s"$until 00:00:00")))
      .join(part, col("l_partkey") === col("p_partkey"))
      .agg(
        (lit(100.0) * sum(when(col("p_type") === "PROMO", volume)
          .otherwise(lit(0.0).cast(DecimalType(18, 4)))).cast("double")
          / sum(volume).cast("double")).as("promo_pct"),
        sum(volume).cast("double").as("total_revenue"),
        count(lit(1)).as("line_count"))
  }

  /** TPC-H Q15 shape — top supplier(s) by revenue over one quarter, ties
    * kept: per-supplier DECIMAL-exact revenue, then a global-max window.
    * The window is over an UNPARTITIONED frame but it runs on the
    * supplier-level aggregate (dim-sized, thousands of rows at any SF),
    * not the fact table — the same shape as the reference's "max of an
    * aggregate" view, without a second scan.
    */
  def topSupplierRevenue(
      lineitem: DataFrame, supplier: DataFrame,
      from: String = "1996-01-01", until: String = "1996-04-01"): DataFrame = {
    val perSupplier = lineitem
      .filter(col("l_shipdate") >= to_timestamp(lit(s"$from 00:00:00")) &&
        col("l_shipdate") < to_timestamp(lit(s"$until 00:00:00")))
      .groupBy(col("l_suppkey"))
      .agg(decSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
        .as("total_revenue"))
    perSupplier
      .withColumn("max_revenue",
        max(col("total_revenue")).over(Window.partitionBy()))
      .filter(col("total_revenue") === col("max_revenue"))
      .join(supplier, col("l_suppkey") === col("s_suppkey"))
      .select(col("l_suppkey").as("s_suppkey"), col("s_name"),
        col("total_revenue"))
      .orderBy(col("s_suppkey"))
  }

  /** TPC-H Q19 shape — disjunctive bracket predicates: revenue from three
    * OR'd (brand, size-range, quantity-range) brackets. The OR spans both
    * join sides, which no engine can push as-is, so the standard Q19
    * rewrite is applied EXPLICITLY: the part-only disjunction prunes the
    * part scan, the quantity envelope prunes the lineitem scan, and the
    * full bracket predicate re-checks the survivors after the equi-join —
    * semantics-preserving because each derived filter is implied by the
    * original OR.
    */
  def disjunctiveBracketRevenue(lineitem: DataFrame, part: DataFrame): DataFrame = {
    val b1 = col("p_brand") === "Brand#1" && col("p_size").between(1, 5) &&
      col("l_quantity").between(1, 11)
    val b2 = col("p_brand") === "Brand#2" && col("p_size").between(1, 10) &&
      col("l_quantity").between(10, 20)
    val b3 = col("p_brand") === "Brand#3" && col("p_size").between(1, 15) &&
      col("l_quantity").between(20, 30)
    val partSide = part.filter(
      (col("p_brand") === "Brand#1" && col("p_size").between(1, 5)) ||
        (col("p_brand") === "Brand#2" && col("p_size").between(1, 10)) ||
        (col("p_brand") === "Brand#3" && col("p_size").between(1, 15)))
    lineitem
      .filter(col("l_quantity").between(1, 30))
      .join(partSide, col("l_partkey") === col("p_partkey"))
      .filter(b1 || b2 || b3)
      .agg(
        decSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
          .as("revenue"),
        count(lit(1)).as("line_count"))
  }

  /** Relational UNPIVOT (melt) of a metrics rollup: per event type the
    * wide aggregate row (n_events, n_users, value_sum) is melted into
    * (metric, value) rows via Spark's native `unpivot` operator — the
    * long/tidy shape metric stores and plotting layers ingest. All three
    * metrics are exact doubles (counts < 2^53 widen losslessly; the sum is
    * DECIMAL-exact before its single cast), so one common value column
    * loses nothing. Unpivot is a per-row expand of an already dim-sized
    * aggregate — no extra shuffle.
    */
  def eventMetricsUnpivot(events: DataFrame): DataFrame =
    events
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).cast("double").as("n_events"),
        countDistinct(col("user_id")).cast("double").as("n_users"),
        decSum(col("value"), 2).as("value_sum"))
      .unpivot(
        Array(col("event_type")),
        Array(col("n_events"), col("n_users"), col("value_sum")),
        "metric", "value")
      .orderBy(col("event_type"), col("metric"))

  /** Sliding (hopping) windows via Spark's native `window(ts, len, slide)`
    * operator: each event lands in `len/slide` overlapping windows (4 here)
    * and the expand happens BEFORE the keyed aggregate, so map-side combine
    * still bounds the shuffle at windows x partitions rows. Windows are
    * epoch-aligned at multiples of the slide — the contract the oracle
    * reproduces with integer micro-arithmetic.
    */
  def slidingWindowCounts(
      events: DataFrame, len: String = "1 hour",
      slide: String = "15 minutes"): DataFrame =
    events
      .groupBy(window(col("ts"), len, slide))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        decSum(col("value"), 2).as("value_sum"))
      .select(
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("n_events"), col("n_users"), col("value_sum"))
      .orderBy(col("window_start"))

  /** Exponentially time-decayed per-user value mass — the recency-weighted
    * engagement score a ranking/retention pipeline keeps per entity:
    * half-life = 1 day, weight 2^-k for an event k days before `anchor`.
    * Every float is deterministic BY CONSTRUCTION, not by tolerance:
    * per-(user, day) masses are exact integer cents; the weight is
    * `1.0 / (1L << k)` (an exact dyadic — no libm `pow`, whose last ulp is
    * engine-dependent); each product and every partial sum stays exactly
    * representable (numerators < 2^53, denominators <= 2^30), so the sum is
    * order-independent; the single final /100.0 is one correctly-rounded
    * IEEE division. Two keyed aggregates, both with map-side combine; the
    * second input is |users| x |days| rows at most.
    */
  def timeDecayTotals(events: DataFrame, anchor: String = "2024-01-31"): DataFrame = {
    val k = datediff(to_date(lit(anchor)), to_date(col("ts")))
    val cents = centsOf(col("value")).cast("long")
    events
      .filter(col("value").isNotNull && col("ts") <= to_timestamp(lit(s"$anchor 00:00:00")))
      .groupBy(col("user_id"), k.as("k"))
      .agg(sum(cents).as("day_cents"), count(lit(1)).as("n"))
      .select(col("user_id"), col("k"), col("n"),
        (col("day_cents").cast("double") /
          expr("CAST(shiftleft(1L, k) AS DOUBLE)")).as("term"))
      .groupBy(col("user_id"))
      .agg(
        (sum(col("term")) / lit(100.0)).as("decayed_value"),
        sum(col("n")).as("n_events"),
        count(lit(1)).as("n_days"),
        min(col("k")).as("newest_day"))
      .orderBy(col("user_id"))
  }

  /** Relational division — "users who did EVERY event type": per-user
    * distinct-type counts compared against the corpus-wide distinct-type
    * count. The divisor is a ONE-ROW aggregate broadcast into the join (no
    * driver collect, no correlated re-scan); the dividend is a two-level
    * keyed aggregate with map-side combine. The classic double-NOT-EXISTS
    * spelling decorrelates to exactly this plan — we declare it directly.
    */
  def usersAllEventTypes(events: DataFrame): DataFrame = {
    val total = events.agg(
      countDistinct(col("event_type")).as("total_types"))
    events
      .groupBy(col("user_id"))
      .agg(countDistinct(col("event_type")).as("n_types"))
      .join(broadcast(total), col("n_types") === col("total_types"))
      .select(col("user_id"), col("n_types"))
      .orderBy(col("user_id"))
  }

  /** Unbounded-frame window functions — first/last/nth over each user's
    * full history: first event type, last event type, second event type
    * (NULL for single-event users). `last_value`/`nth_value` need the
    * explicit UNBOUNDED FOLLOWING frame (the default frame stops at
    * CURRENT ROW, where last_value degenerates to the current row); one
    * row survives per user via a row_number filter on the SAME window
    * ordering — still a single shuffle + sort on user_id.
    */
  def userFirstLast(events: DataFrame): DataFrame = {
    val order = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val full = order.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    events
      .select(
        col("user_id"),
        first(col("event_type")).over(full).as("first_type"),
        last(col("event_type")).over(full).as("last_type"),
        nth_value(col("event_type"), 2).over(full).as("second_type"),
        count(lit(1)).over(full).as("n_events"),
        row_number().over(order).as("rn"))
      .filter(col("rn") === 1)
      .drop("rn")
      .orderBy(col("user_id"))
  }

  /** TPC-H Q16 shape — supplier variety per part attribute: how many
    * DISTINCT suppliers have shipped each (brand, type, size) combination,
    * excluding a denylisted supplier set (NOT IN → anti-join, the
    * decorrelated form). The (part, supplier) pair set is distinct-reduced
    * BEFORE the attribute rollup — the pair frame is the harness's stand-in
    * for partsupp, and the early distinct bounds the rollup input by
    * |parts| x |suppliers| regardless of lineitem volume.
    */
  def partSupplierVariety(
      lineitem: DataFrame, part: DataFrame, supplier: DataFrame,
      sizes: Seq[Int] = Seq(5, 15, 25, 35, 45)): DataFrame = {
    val excluded = supplier
      .filter(col("s_acctbal") < 0.0)
      .select(col("s_suppkey").as("x_suppkey"))
    val pairs = lineitem
      .select(col("l_partkey"), col("l_suppkey")).distinct()
      .join(excluded, col("l_suppkey") === col("x_suppkey"), "left_anti")
    pairs
      .join(part.filter(col("p_size").isInCollection(sizes)),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(desc("supplier_cnt"), asc("p_brand"), asc("p_type"), asc("p_size"))
  }

  /** TPC-H Q4 shape — order-priority check: how many orders per priority
    * class had at least one LATE line (shipped more than `lateDays` after
    * the order date; the harness lacks commit/receipt dates, so lateness is
    * ship-vs-order — reference semantics: EXISTS, counted once per order
    * however many lines qualify). The EXISTS is a LEFT SEMI join — Spark
    * stops probing an order on its first qualifying line and never
    * duplicates the left side, which is exactly the decorrelated plan the
    * classic subquery spelling lowers to. The date predicate is a residual
    * on the equi-join (not expressible pre-join — it spans both sides), but
    * the quarter filter prunes the orders scan at the source.
    */
  def lateShipmentPriority(
      orders: DataFrame, lineitem: DataFrame,
      from: String = "1995-01-01", until: String = "1995-04-01",
      lateDays: Int = 60): DataFrame = {
    val o = orders.filter(
      col("o_orderdate") >= to_timestamp(lit(s"$from 00:00:00")) &&
        col("o_orderdate") < to_timestamp(lit(s"$until 00:00:00")))
    o.join(lineitem,
        o("o_orderkey") === lineitem("l_orderkey") &&
          lineitem("l_shipdate") > o("o_orderdate") + expr(s"INTERVAL $lateDays DAYS"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("late_order_count"))
      .orderBy(col("o_orderpriority").asc_nulls_last)
  }

  /** TPC-H Q6 shape — forecast revenue delta: the revenue change from
    * hypothetically eliminating a discount band on small-quantity lines in
    * one year. Pure scan + filter + scalar aggregate — the plan is a single
    * WholeStageCodegen over the parquet scan with every predicate pushed
    * (`PushedFilters` shows the date range; quantity/discount prune via
    * row-group stats), the shape where the scan IS the query and the only
    * thing that matters at 100 TB is that nothing but the 4 needed columns
    * is read.
    */
  def forecastRevenueDelta(
      lineitem: DataFrame,
      from: String = "1995-01-01", until: String = "1996-01-01"): DataFrame =
    lineitem
      .filter(
        col("l_shipdate") >= to_timestamp(lit(s"$from 00:00:00")) &&
          col("l_shipdate") < to_timestamp(lit(s"$until 00:00:00")) &&
          col("l_discount").between(0.05, 0.07) &&
          col("l_quantity") < 24)
      .agg(
        decSum(col("l_extendedprice") * col("l_discount"), 4).as("revenue_delta"),
        count(lit(1)).as("line_count"))

  /** TPC-H Q12 shape — priority mix by return flag (the harness's stand-in
    * for ship mode): per flag, how many lines belong to critical-priority
    * orders vs not, over one shipping year. The CASE/sum conditional
    * aggregation runs on the joined frame with map-side combine; the fact
    * side is pruned by the pushed date range before the join, and the
    * orders side carries only (key, priority).
    */
  def priorityMixByFlag(
      lineitem: DataFrame, orders: DataFrame,
      from: String = "1995-01-01", until: String = "1996-01-01"): DataFrame = {
    val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    lineitem
      .filter(col("l_shipdate") >= to_timestamp(lit(s"$from 00:00:00")) &&
        col("l_shipdate") < to_timestamp(lit(s"$until 00:00:00")))
      .join(orders.select(col("o_orderkey"), col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(
        sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(high, 0L).otherwise(1L)).as("low_line_count"))
      .orderBy(col("l_returnflag").asc_nulls_last)
  }

  /** TPC-H Q21 shape — the sole late supplier: suppliers who, in
    * multi-supplier orders, were STRICTLY the last to ship (their latest
    * line postdates every other supplier's). The classic spelling is a
    * correlated EXISTS (another supplier exists) plus NOT EXISTS (none
    * shipped later-or-equal); both decorrelate to per-order extremes, so we
    * declare that form directly: one keyed aggregate to (order, supplier,
    * max ship), one window over order computing the order-wide max and how
    * many suppliers attain it — a supplier is sole-late iff it attains the
    * max, alone, among >= 2 suppliers. The explicit repartition on
    * orderkey makes ONE exchange serve both the aggregate and the window:
    * HashPartitioning(orderkey) satisfies the aggregate's clustering on
    * (orderkey, suppkey) — a superset key — so neither re-shuffles.
    * Forfeiting pre-shuffle partial aggregation is the right trade HERE
    * because (order, supplier) is nearly row-distinct in lineitem (combine
    * would shrink almost nothing) while the avoided second shuffle is
    * full-size: measured 0.84 -> 0.51 s at sf0.1, identical results. Vs
    * the 3 lineitem self-joins of the literal EXISTS plan — the DuckDB
    * oracle runs the literal EXISTS/NOT-EXISTS spelling as the
    * independent check.
    */
  def soleLateSupplier(
      lineitem: DataFrame, supplier: DataFrame, k: Int = 50): DataFrame = {
    val perSupp = lineitem
      .repartition(col("l_orderkey"))
      .groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(max(col("l_shipdate")).as("supp_last_ship"))
    val w = Window.partitionBy(col("l_orderkey"))
    val flagged = perSupp
      .withColumn("order_last_ship", max(col("supp_last_ship")).over(w))
      .withColumn("n_suppliers", count(lit(1)).over(w))
      .withColumn("n_at_last",
        sum(when(col("supp_last_ship") === col("order_last_ship"), 1L)
          .otherwise(0L)).over(w))
      .filter(col("n_suppliers") >= 2 &&
        col("supp_last_ship") === col("order_last_ship") &&
        col("n_at_last") === 1)
    flagged
      .groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("numwait"))
      .join(supplier, col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("numwait"))
      .orderBy(desc("numwait"), asc("s_suppkey"))
      .limit(k)
  }

  /** Pearson correlation without cross-engine float drift: quantity vs
    * extended price per return flag, computed from EXACT integer moment
    * sums — prices in cents, quantities as integers, every power sum
    * accumulated in DECIMAL(38,0) (syy reaches ~6e19, past the int64
    * range, never past 38 digits) — then ONE correctly-rounded cast of each
    * exact sum to double and an identical, fixed sequence of IEEE ops on
    * both engines. corr/covar built-ins differ across engines in summation
    * order (doubles) and normalization (sample vs population); explicit
    * moments sidestep both. Single scan, map-side combine, 3-row output.
    */
  def priceQtyCorr(lineitem: DataFrame): DataFrame = {
    val qty = col("l_quantity").cast(DecimalType(18, 0))
    val cents = centsOf(col("l_extendedprice"))
    val big = DecimalType(38, 0)
    lineitem
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        sum(qty.cast(big)).cast("double").as("sx"),
        sum(cents.cast(big)).cast("double").as("sy"),
        sum((qty * qty).cast(big)).cast("double").as("sxx"),
        sum((cents * cents).cast(big)).cast("double").as("syy"),
        sum((qty * cents).cast(big)).cast("double").as("sxy"))
      // zero-variance guard: Spark's 0.0/0.0 is NULL while DuckDB's is
      // IEEE nan — corr of a constant column is undefined; emit NULL on
      // BOTH engines explicitly
      .withColumn("denom",
        sqrt(col("n") * col("sxx") - col("sx") * col("sx")) *
          sqrt(col("n") * col("syy") - col("sy") * col("sy")))
      .select(
        col("l_returnflag"), col("n"),
        when(col("denom") > 0.0, round(
          (col("n") * col("sxy") - col("sx") * col("sy")) / col("denom"),
          6)).as("qty_price_corr"),
        round(
          (col("sxy") - col("sx") * col("sy") / col("n")) / col("n") / lit(100.0),
          4).as("qty_price_covar_pop"))
      .orderBy(col("l_returnflag").asc_nulls_last)
  }

  /** Ordered string aggregation (LISTAGG) — per nation, its top-5
    * customers by account balance as one deterministic CSV. Top-5 is a
    * rank-window filter (per-partition heap semantics, ties broken by
    * name); the CSV is collect_list -> array_sort -> transform -> join,
    * sorted by the SAME (balance desc, name) key via a sortable composite
    * string, so the aggregation order is data-independent. Output is
    * |nations| rows; the bounded k caps the list payload at scale.
    */
  def nationTopCustomerList(customer: DataFrame, nation: DataFrame,
      k: Int = 5): DataFrame = {
    // ONE sort key for both the rank window and the CSV: the cents fixed
    // point. Ranking on raw c_acctbal while the CSV sorts on rounded cents
    // would let sub-cent precision diverge the two orders (dormant on
    // 2-decimal harness money, but the contract should not depend on it).
    val cents = centsOf(col("c_acctbal")).cast("long")
    val rn = row_number().over(
      Window.partitionBy(col("c_nationkey"))
        .orderBy(desc("cents_key"), asc("c_name")))
    // Sortable composite key: balance in cents, zero-padded, DESCENDING via
    // (5*10^12 - cents) so lexicographic order == (balance desc, name asc).
    // The offset keeps every key (negative balances included) a CONSTANT
    // 13 digits — mixed widths would break lexicographic = numeric. A '|'
    // inside c_name would truncate at substring_index — harness names
    // ("Customer#...") never contain one.
    val keyed = format_string("%013d|%s",
      lit(5000000000000L) - col("cents_key"), col("c_name"))
    customer
      .withColumn("cents_key", cents)
      .withColumn("rn", rn)
      .filter(col("rn") <= k)
      .groupBy(col("c_nationkey"))
      .agg(
        count(lit(1)).as("n_top"),
        array_join(
          transform(array_sort(collect_list(keyed)),
            s => substring_index(s, "|", -1)),
          ",").as("top_customers"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("n_top"), col("top_customers"))
      .orderBy(col("n_name"))
  }

  /** Sequenced-event pattern match (the CEP shape): purchases preceded by
    * an add_to_cart within `maxGap`, with no logout between — matched
    * per-user with ONE ordered window pass carrying the latest cart/logout
    * timestamps into each row (running max over a conditional), instead of
    * a per-purchase backward self-join. Interval arithmetic, not epoch
    * casts, does the gap test (identical across engines); (ts, event_id)
    * ordering makes equal-timestamp frames deterministic. Single shuffle
    * on user_id; output is a per-user rollup.
    */
  def cartToPurchase(events: DataFrame, maxGap: String = "30 minutes"): DataFrame = {
    val before = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val purchases = events
      .withColumn("last_cart_ts",
        max(when(col("event_type") === "add_to_cart", col("ts"))).over(before))
      .withColumn("last_logout_ts",
        max(when(col("event_type") === "logout", col("ts"))).over(before))
      .filter(col("event_type") === "purchase")
    val matched = col("last_cart_ts").isNotNull &&
      col("ts") <= col("last_cart_ts") + expr(s"INTERVAL $maxGap") &&
      (col("last_logout_ts").isNull || col("last_logout_ts") < col("last_cart_ts"))
    purchases
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_purchases"),
        sum(when(matched, 1L).otherwise(0L)).as("n_matched"))
      .filter(col("n_matched") > 0)
      // nulls_last matches DuckDB's ORDER BY default (Spark ASC defaults
      // to NULLS FIRST) — moot on the harness data, load-bearing the day a
      // null key appears
      .orderBy(col("user_id").asc_nulls_last)
  }

  /** Mode per group — each user's most frequent event type (ties to the
    * lexicographically smallest type, so the answer is deterministic).
    * count-per-(user,type) then a rank window on the counts: both steps
    * shuffle on user_id only, and the window input is already collapsed to
    * |users| x |types| rows.
    */
  def userTopEvent(events: DataFrame): DataFrame = {
    val counts = events
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    counts
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("user_id"))
          .orderBy(desc("n"), asc("event_type"))))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type").as("top_event"), col("n"))
      .orderBy(col("user_id").asc_nulls_last)
  }

  /** Skyline (Pareto frontier) — suppliers not dominated on the
    * (unit price, shipping delay) tradeoff: s is dominated iff some s' is
    * no worse on both axes and strictly better on one. Both metrics are
    * FIXED-POINT integers (cents per unit, micro-days), so the frontier is
    * bit-exact across engines. The dominance test is NOT the O(n^2)
    * NOT-EXISTS self-join (that's the DuckDB oracle's independent
    * spelling): sorted by price, a supplier is dominated iff some
    * strictly-cheaper supplier has delay <= its own (a RANGE window
    * running-min), or some equal-priced supplier has strictly lower delay
    * (a per-price partition min) — one sort, O(n log n), the textbook
    * sort-filter skyline (Borzsony et al. ICDE'01) as two window passes.
    *
    * Non-negativity assumption (same as [[graft.operators.Centrality]]):
    * the fixed-point `DIV`s require non-negative operands — Spark DIV
    * truncates toward zero while DuckDB `//` floors, so a shipment dated
    * BEFORE its order (negative delay) would diverge across engines.
    * Ship-after-order holds by construction in the harness.
    */
  def paretoSuppliers(lineitem: DataFrame, orders: DataFrame,
      supplier: DataFrame): DataFrame = {
    val cents = centsOf(col("l_extendedprice"))
    val perSupp = lineitem
      .join(orders.select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_suppkey"))
      .agg(
        count(lit(1)).as("n_lines"),
        sum(cents).cast("long").as("total_cents"),
        sum(col("l_quantity").cast("long")).as("total_qty"),
        sum(datediff(col("l_shipdate"), col("o_orderdate")).cast("long"))
          .as("total_delay_days"))
      .select(
        col("l_suppkey"), col("n_lines"),
        expr("total_cents DIV total_qty").as("unit_price_cents"),
        expr("total_delay_days * 1000000 DIV n_lines").as("delay_micro_days"))
    val strictlyCheaper = Window.orderBy(col("unit_price_cents"))
      .rangeBetween(Window.unboundedPreceding, -1)
    val samePrice = Window.partitionBy(col("unit_price_cents"))
    val flagged = perSupp
      .withColumn("best_delay_cheaper", min(col("delay_micro_days")).over(strictlyCheaper))
      .withColumn("best_delay_same", min(col("delay_micro_days")).over(samePrice))
      .withColumn("on_frontier",
        (col("best_delay_cheaper").isNull ||
          col("best_delay_cheaper") > col("delay_micro_days")) &&
          col("best_delay_same") === col("delay_micro_days"))
    flagged
      .join(supplier, col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_lines"),
        col("unit_price_cents"), col("delay_micro_days"), col("on_frontier"))
      .orderBy(col("s_suppkey"))
  }

  /** Time-series gap filling — the dense hourly spine per event type, with
    * empty hours zero-filled, a running total, and last-observation-
    * carried-forward (the hour of the most recent nonempty bucket). The
    * spine is generated relationally (per-type min/max + `sequence` +
    * explode — no driver loop), so it scales as |types| x |hours|, and the
    * fill joins are per-type equi-joins. LOCF is `max(CASE...)` over the
    * ordered window — one pass, no self-join.
    */
  def hourlyGapfill(events: DataFrame): DataFrame = {
    val hourly = events
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("n"))
    val spine = hourly
      .groupBy(col("event_type"))
      .agg(min(col("hour")).as("h0"), max(col("hour")).as("h1"))
      .select(col("event_type"),
        explode(sequence(col("h0"), col("h1"), expr("INTERVAL 1 HOUR")))
          .as("hour"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("hour"))
    spine
      .join(hourly, Seq("event_type", "hour"), "left")
      .withColumn("n_events", coalesce(col("n"), lit(0L)))
      .withColumn("cum_events", sum(col("n_events")).over(w))
      .withColumn("last_active_hour",
        max(when(col("n_events") > 0, col("hour"))).over(w))
      .withColumn("is_gap", col("n_events") === 0)
      .select(col("event_type"), col("hour"), col("n_events"),
        col("cum_events"), col("last_active_hour"), col("is_gap"))
      .orderBy(col("event_type").asc_nulls_last, col("hour"))
  }

  /** Cross-source reconciliation — the FULL OUTER join shape: every key
    * appearing in either the order system or the event stream, with
    * per-side counts and a presence class. Both sides pre-aggregate to one
    * row per key BEFORE the join (the full-outer then joins |users|-sized
    * frames, not raw facts — at 100 TB the join input is the distinct key
    * set, orders of magnitude smaller than either fact table).
    */
  def orderEventReconcile(orders: DataFrame, events: DataFrame): DataFrame = {
    val o = orders.groupBy(col("o_custkey")).agg(count(lit(1)).as("n_orders"))
    val e = events.groupBy(col("user_id")).agg(count(lit(1)).as("n_events"))
    o.join(e, col("o_custkey") === col("user_id"), "full_outer")
      .select(
        coalesce(col("o_custkey"), col("user_id")).as("user_id"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        coalesce(col("n_events"), lit(0L)).as("n_events"))
      // presence derives from the COUNTS, not key nullness: a NULL-key
      // group (null o_custkey with n_orders > 0) would otherwise
      // misclassify as events_only — internally contradictory output
      .withColumn("presence",
        when(col("n_orders") > 0 && col("n_events") > 0, "both")
          .when(col("n_orders") > 0, "orders_only")
          .otherwise("events_only"))
      .orderBy(col("user_id").asc_nulls_last)
  }

  /** Robust outlier detection — exact median + MAD (median absolute
    * deviation) of order totals per priority class, and the count outside
    * median +/- 3 * 1.4826 * MAD (the normal-consistent MAD z-score). Money
    * is integer cents, so both percentiles interpolate on an exact
    * half-integer grid and the doubles are bit-identical across engines;
    * the threshold is one fixed IEEE product applied to identical
    * operands. Three passes over a 2-column projection (median -> MAD ->
    * count), each a grouped aggregate with map-side combine — the one-pass
    * approximate alternative is the existing `quantiles_approx` sketch
    * path; exact-median-per-group is inherently a sort-based aggregate.
    */
  def medianMadOutliers(orders: DataFrame): DataFrame = {
    val o = orders.select(
      col("o_orderpriority"),
      centsOf(col("o_totalprice")).cast("long").as("cents"))
    val med = o.groupBy(col("o_orderpriority"))
      .agg(expr("percentile(cents, 0.5)").as("median_cents"),
        count(lit(1)).as("n"))
    val dev = o.join(broadcast(med), Seq("o_orderpriority"))
      .withColumn("adev", abs(col("cents") - col("median_cents")))
    val mad = dev.groupBy(col("o_orderpriority"))
      .agg(expr("percentile(adev, 0.5)").as("mad_cents"))
    dev
      .join(broadcast(mad), Seq("o_orderpriority"))
      .groupBy(col("o_orderpriority"))
      .agg(
        first(col("n")).as("n"),
        first(col("median_cents")).as("median_cents"),
        first(col("mad_cents")).as("mad_cents"),
        sum(when(col("adev") > lit(3.0) * lit(1.4826) * col("mad_cents"), 1L)
          .otherwise(0L)).as("n_outliers"))
      .select(col("o_orderpriority"), col("n"), col("median_cents"),
        col("mad_cents"), col("n_outliers"),
        expr("n_outliers * 1000000 DIV n").as("outlier_ppm"))
      .orderBy(col("o_orderpriority").asc_nulls_last)
  }

  /** TPC-H Q9 shape — product-type profit by nation and year: for every
    * line whose part name carries a token, profit = discounted revenue
    * minus a supply-cost proxy (the harness has no partsupp, so cost is
    * 10% of the part's retail price per unit — a fixed, exact formula),
    * rolled up by the SUPPLIER's nation and the order year. Exactness:
    * both per-line measures round once into DECIMAL(18,4) (identical
    * correctly-rounded cast on both engines) and the two exact sums are
    * subtracted before one final cast to double. Join order at scale: the
    * token filter shrinks part to a broadcastable side, lineitem joins it
    * first (cutting the fact stream ~8x before any shuffle), then one
    * shuffle join to orders for the year axis; supplier and nation ride
    * in as broadcasts.
    */
  def productProfit(
      lineitem: DataFrame, part: DataFrame, supplier: DataFrame,
      nation: DataFrame, orders: DataFrame,
      nameToken: String = "red"): DataFrame = {
    val gross = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    val cost = col("p_retailprice") * lit(0.1) * col("l_quantity")
    lineitem
      .join(part.filter(col("p_name").contains(nameToken))
        .select(col("p_partkey"), col("p_retailprice")),
        col("l_partkey") === col("p_partkey"))
      .join(orders.select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .join(supplier.select(col("s_suppkey"), col("s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(
        (sum(gross.cast(DecimalType(18, 4))) - sum(cost.cast(DecimalType(18, 4))))
          .cast("double").as("profit"),
        count(lit(1)).as("line_count"))
      .orderBy(col("n_name"), col("o_year"))
  }

  /** TPC-H Q11 shape — important part values: within ONE nation's
    * suppliers, the parts whose shipped value exceeds a fixed fraction of
    * that nation's total shipped value. The classic spelling is a HAVING
    * against a scalar subquery; declared here as an aggregate + a
    * broadcast of the 1-row total + an integer-exact threshold compare
    * (value_cents > total_cents DIV 10000 — no float fraction, so the
    * cut is bit-identical on every engine; 0.1 per-mille keeps the cut
    * selective-but-nonempty as the part population scales with SF — the
    * same reason TPC-H divides its Q11 fraction by SF). The nation
    * filter prunes the supplier dim BEFORE the fact join, and the
    * per-part rollup map-side-combines; the 1-row total re-aggregates
    * the per-part frame (tiny), not the fact stream a second time.
    */
  def importantPartValues(
      lineitem: DataFrame, supplier: DataFrame, nation: DataFrame,
      nationName: String = "NATION_3", perTenMille: Int = 1): DataFrame = {
    val natSupp = supplier
      .join(broadcast(nation.filter(col("n_name") === nationName)),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"))
    val perPart = lineitem
      .join(natSupp, col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("l_partkey"))
      .agg(sum(centsOf(col("l_extendedprice"))).cast("long").as("value_cents"))
    val total = perPart
      .agg(sum(col("value_cents")).as("total_cents"))
    perPart
      .join(broadcast(total))
      .filter(col("value_cents") > expr(s"$perTenMille * total_cents DIV 10000"))
      .select(col("l_partkey"), col("value_cents"))
      .orderBy(desc("value_cents"), asc("l_partkey"))
  }

  /** TPC-H Q18 shape — large-volume orders: customers whose single order
    * accumulated more than `minQty` units across its lines. The classic
    * spelling is `o_orderkey IN (GROUP BY HAVING)`; here the HAVING frame
    * is computed once and joined back — at any scale the qualifying set
    * is a tiny fraction of orders (sum-of-quantity tails), so AQE
    * broadcasts it into both the orders and customer probes and no
    * full-size shuffle survives. Quantity sums are DECIMAL-exact; the
    * final ordering (totalprice desc) tiebreaks on orderkey for a
    * deterministic hash.
    */
  def largeVolumeCustomers(
      customer: DataFrame, orders: DataFrame, lineitem: DataFrame,
      minQty: Int = 300, k: Int = 100): DataFrame = {
    val big = lineitem
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity").cast(DecimalType(18, 2))).as("qsum"))
      .filter(col("qsum") > minQty)
      .select(col("l_orderkey"), col("qsum").cast("double").as("total_qty"))
    orders
      .join(big, col("o_orderkey") === col("l_orderkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"), col("total_qty"))
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
      .limit(k)
  }

  /** TPC-H Q20 shape — year-concentrated suppliers: for (supplier, part)
    * pairs on a name-filtered part family, flag pairs whose `year`
    * shipments exceed half their all-time shipments, then count flagged
    * parts per supplier. The classic spelling correlates a scalar
    * half-of-sum subquery per pair; both the year slice and the lifetime
    * total come out of ONE conditional aggregation pass here (no second
    * scan, no self-join), and the half comparison is exact DECIMAL
    * (2*year_qty > total_qty — quantities are integral).
    */
  def supplierYearConcentration(
      lineitem: DataFrame, supplier: DataFrame, part: DataFrame,
      namePrefix: String = "small", inYear: Int = 1995): DataFrame = {
    val pairs = lineitem
      .join(part.filter(col("p_name").startsWith(namePrefix))
        .select(col("p_partkey")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_suppkey"), col("l_partkey"))
      .agg(
        sum(col("l_quantity").cast(DecimalType(18, 2))).as("qty_total"),
        sum(when(year(col("l_shipdate")) === inYear,
          col("l_quantity").cast(DecimalType(18, 2))).otherwise(lit(0)))
          .as("qty_year"))
      .filter(col("qty_year") * 2 > col("qty_total"))
    pairs
      .groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("concentrated_parts"))
      .join(supplier, col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("concentrated_parts"))
      .orderBy(desc("concentrated_parts"), asc("s_suppkey"))
  }

  /** TPC-H Q22 shape — idle high-balance customers: customers in a set of
    * "country code" buckets (custkey mod 10 — the harness has no phone
    * column) whose balance beats the bucket-set's average positive
    * balance and who placed NO order since `cutoff`, rolled up per
    * bucket. The two classic subqueries become: (a) the average —
    * a 1-row exact aggregate broadcast back, compared WITHOUT division
    * (bal_cents * n > sum_cents, integer-exact on both engines); (b) the
    * NOT EXISTS — a left-anti join against the distinct recent-orderer
    * set, which at scale is the decorrelated plan Catalyst would pick
    * anyway (broadcast the distinct custkeys if small, shuffled anti
    * otherwise, both correct).
    */
  def idleCustomerBalances(
      customer: DataFrame, orders: DataFrame,
      codes: Seq[Int] = Seq(1, 3, 5, 7, 9),
      cutoff: String = "1999-01-01"): DataFrame = {
    val cntry = (col("c_custkey") % 10).cast("int")
    val eligible = customer
      .filter(cntry.isInCollection(codes) && col("c_acctbal") > 0.0)
      .withColumn("cntry_code", cntry.cast("long"))
      .withColumn("bal_cents", centsOf(col("c_acctbal")).cast("long"))
    val stats = eligible.agg(
      sum(col("bal_cents")).as("sum_cents"),
      count(lit(1)).as("n_eligible"))
    val recent = orders
      .filter(col("o_orderdate") >= to_timestamp(lit(s"$cutoff 00:00:00")))
      .select(col("o_custkey")).distinct()
    eligible
      .join(broadcast(stats))
      .filter(col("bal_cents") * col("n_eligible") > col("sum_cents"))
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("cntry_code"))
      .agg(
        count(lit(1)).as("n_customers"),
        decSum(col("c_acctbal"), 2).as("total_acctbal"))
      .orderBy(col("cntry_code"))
  }

  /** Gaps-and-islands — per-user daily activity streaks: the longest run
    * of CONSECUTIVE active days, how many runs, and when the longest one
    * started. The classic trick: on the distinct (user, day) frame,
    * `day - row_number() days` is constant within a consecutive run, so
    * one groupBy on that island key collapses each run. Two shuffles on
    * user_id (distinct + window) and the frames after the distinct are
    * |user x active-day|, far smaller than the event stream. The longest
    * streak's start tiebreaks to the EARLIEST such run (min over a
    * same-length window compare), keeping the answer deterministic.
    */
  def activityStreaks(events: DataFrame): DataFrame = {
    val days = events
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
    val streaks = days
      .withColumn("island", date_sub(col("day"), row_number().over(w)))
      .groupBy(col("user_id"), col("island"))
      .agg(count(lit(1)).as("len"), min(col("day")).as("start_day"))
    val wu = Window.partitionBy(col("user_id"))
    streaks
      .withColumn("maxlen", max(col("len")).over(wu))
      .groupBy(col("user_id"))
      .agg(
        sum(col("len")).as("n_active_days"),
        count(lit(1)).as("n_streaks"),
        max(col("len")).as("longest_streak"),
        min(when(col("len") === col("maxlen"), col("start_day")))
          .as("longest_start"))
      .orderBy(col("user_id").asc_nulls_last)
  }

  /** First-order Markov transition matrix over the event stream: per-user
    * time-ordered successor pairs (lead window), collapsed to
    * (from, to) counts, with the per-from transition probability as an
    * EXACT ppm fixed point (count * 1e6 DIV row total — integer math, no
    * float division to drift cross-engine). One shuffle on user_id for
    * the lead, one on event_type for the rollup; output is |types|^2.
    */
  def eventTransitions(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type"), col("next_type"))
      .agg(count(lit(1)).as("n_transitions"))
      .withColumn("from_total",
        sum(col("n_transitions")).over(Window.partitionBy(col("event_type"))))
      .withColumn("prob_ppm", expr("n_transitions * 1000000 DIV from_total"))
      .orderBy(col("event_type"), col("next_type"))
  }

  /** Session path analysis: the most common event-type journeys, where a
    * journey is the '->'-joined sequence of a session's first 5 events
    * ([[graft.operators.Sessionize.withSessionIndex]] reconstructs the
    * session axis). The path string is built ORDER-DETERMINISTICALLY
    * without an ordered string_agg (Spark has none): each kept event
    * carries a rank-prefixed sortable key, array_sort recovers the order
    * inside the aggregation, and the prefix is stripped after sorting —
    * the same composite-key trick as [[nationTopCustomerList]]. Cost:
    * the two sessionize windows (one user_id shuffle), then a rollup on
    * the tiny |distinct path| frame.
    */
  def sessionPaths(events: DataFrame, maxLen: Int = 5): DataFrame = {
    // the sortable key zero-pads the rank to 2 digits
    require(maxLen >= 1 && maxLen <= 99, s"maxLen must be in [1, 99], got $maxLen")
    val bySess = Window.partitionBy(col("user_id"), col("session_index"))
    val ordered = bySess.orderBy(col("ts"), col("event_id"))
    val tagged = graft.operators.Sessionize.withSessionIndex(events)
      .withColumn("rn", row_number().over(ordered))
      .withColumn("n_events", count(lit(1)).over(bySess))
    tagged
      .filter(col("rn") <= maxLen)
      .groupBy(col("user_id"), col("session_index"), col("n_events"))
      .agg(
        array_join(
          transform(
            array_sort(collect_list(
              format_string("%02d|%s", col("rn"), col("event_type")))),
            s => substring_index(s, "|", -1)),
          "->").as("path"))
      .groupBy(col("path"))
      .agg(
        count(lit(1)).as("n_sessions"),
        countDistinct(col("user_id")).as("n_users"),
        sum(col("n_events")).as("total_events"))
      .orderBy(desc("n_sessions"), col("path"))
  }

  /** Exact distributed higher moments in ONE pass: per event_type, the
    * variance and skewness NUMERATORS from raw integer power sums on the
    * cents fixed point — `m2*n = n*S2 - S1^2` and
    * `m3*n^2 = n^2*S3 - 3n*S1*S2 + 2*S1^3` are integers whenever the
    * inputs are, so the classic single-pass moment trick (map-side
    * combined sums, no second centering pass) stays BIT-EXACT across
    * engines — float skewness is summation-order-dependent and could
    * never oracle-check. Every intermediate carries an explicitly
    * declared DECIMAL precision sized from the data envelope (cents <=
    * 5e4, group rows <= 1e6 -> every term <= ~5e32, inside DECIMAL(38,0)
    * and DuckDB's HUGEINT); the numerators emit as STRINGS (exact at any
    * magnitude), alongside LONG-safe derived scalars (mean in
    * micro-cents, variance floor-divided). Envelope: safe to ~1e9 rows
    * per group, past which S1^3 leaves 38 digits — at that scale a
    * production caller shards the group (salt + re-combine: the sums are
    * associative) before the final combine.
    */
  def valueMoments(events: DataFrame): DataFrame = {
    val d = centsOf(col("value")).cast(DecimalType(6, 0))
    val d2 = (d * d).cast(DecimalType(13, 0))
    val d3 = (d2 * d).cast(DecimalType(20, 0))
    events
      .filter(col("value").isNotNull)
      .select(col("event_type"), d.as("d"), d2.as("d2"), d3.as("d3"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("d")).cast(DecimalType(11, 0)).as("s1"),
        sum(col("d2")).cast(DecimalType(16, 0)).as("s2"),
        sum(col("d3")).cast(DecimalType(21, 0)).as("s3"))
      .withColumn("n_big", col("n").cast(DecimalType(7, 0)))
      // variance numerator: n*S2 - S1^2  (<= ~2.5e21 -> DECIMAL(25,0))
      .withColumn("m2_n", expr(
        "n_big * s2 - CAST(s1 * s1 AS DECIMAL(23,0))"))
      // skewness numerator: n^2*S3 - 3n*S1*S2 + 2*S1^3 (<= ~5e32)
      .withColumn("m3_n2", expr(
        """CAST(n_big * n_big AS DECIMAL(13,0)) * s3
          |  - CAST(3 AS DECIMAL(1,0)) * CAST(n_big * s1 AS DECIMAL(19,0)) * s2
          |  + CAST(2 AS DECIMAL(1,0)) * CAST(s1 * s1 AS DECIMAL(23,0)) * s1"""
          .stripMargin))
      .select(
        col("event_type"),
        col("n"),
        col("s1").cast("long").as("sum_cents"),
        expr("CAST(s1 AS DECIMAL(17,0)) * 1000000 DIV n_big")
          .cast("long").as("mean_cents_micro"),
        col("m2_n").cast("string").as("m2_n_str"),
        expr("m2_n DIV CAST(n_big * n_big AS DECIMAL(13,0))")
          .cast("long").as("var_cents2"),
        col("m3_n2").cast("string").as("m3_n2_str"),
        signum(col("m3_n2")).cast("long").as("skew_sign"))
      .orderBy(col("event_type"))
  }

  /** Sweep-line interval concurrency: the maximum number of SIMULTANEOUS
    * sessions per day (capacity planning's load question). Each session
    * window ([[graft.operators.Sessionize.sessionWindows]]) explodes to
    * the days it overlaps and is CLIPPED to each day, then the classic
    * sweep: +1 at (clipped) start, -1 at end, running sum ordered by
    * (t, delta) — the -1-first tie order makes touching sessions (one
    * ends exactly when another starts) NOT concurrent, matching the
    * half-open [start, end) window semantics. Partitioning by day keeps
    * the ordered window PARALLEL (no single-partition global sort — the
    * trap a naive global sweep falls into); a midnight-straddling session
    * counts into both days via the clip. The PEAK of the running sum is
    * invariant to ordering among equal (t, delta) rows, so the per-day
    * max is deterministic even though interior prefix values are not.
    */
  def concurrentSessions(events: DataFrame): DataFrame = {
    val sessions = graft.operators.Sessionize.sessionWindows(events)
      .select(col("user_id"), col("session_start"), col("session_end"))
    val byDay = sessions
      .withColumn("day",
        explode(expr(
          "sequence(to_date(session_start), to_date(session_end - INTERVAL 1 MICROSECOND))")))
      .withColumn("s", greatest(col("session_start"), col("day").cast("timestamp")))
      .withColumn("e",
        least(col("session_end"), (col("day") + expr("INTERVAL 1 DAY")).cast("timestamp")))
      // consumed 3x (two sweep legs + the per-day rollup): materialize the
      // clipped session frame once instead of re-running sessionization —
      // it is |sessions|-sized, the smallest frame in the query
      .localCheckpoint()
    val sweep = byDay.select(col("day"), col("s").as("t"), lit(1).as("delta"),
        col("user_id"))
      .union(
        // a -1 landing exactly on the next-day boundary can be dropped:
        // it cannot change any prefix inside this day
        byDay.filter(col("e") < (col("day") + expr("INTERVAL 1 DAY")).cast("timestamp"))
          .select(col("day"), col("e").as("t"), lit(-1).as("delta"),
            col("user_id")))
    val w = Window.partitionBy(col("day")).orderBy(col("t"), col("delta"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val peaks = sweep
      .withColumn("running", sum(col("delta")).over(w))
      .groupBy(col("day"))
      .agg(max(col("running")).as("max_concurrent"))
    byDay
      .groupBy(col("day"))
      .agg(
        count(lit(1)).as("n_sessions"),
        countDistinct(col("user_id")).as("n_users"))
      .join(peaks, Seq("day"))
      .orderBy(col("day"))
  }

  /** Business-day shipping SLA: per order priority, the shipping delay
    * measured in BUSINESS days (weekends excluded) — the calendar
    * arithmetic every fulfillment report needs and every engine spells
    * differently. Done here with a closed-form prefix count instead of a
    * calendar explode: with d = days since 1970-01-01 (a THURSDAY),
    * B(d) = 5*(d DIV 7) + g(d MOD 7) counts business days in [0, d),
    * where g = [0,1,2,2,2,3,4] walks Thu,Fri,(Sat),(Sun),Mon,Tue — so a
    * delay is B(ship) - B(order), pure integer math identical on both
    * engines (no dayofweek() — Spark and DuckDB number weekdays
    * differently, the classic cross-engine trap). Averages and SLA rates
    * emit as exact micro/ppm fixed points.
    */
  def shippingBusinessSla(
      lineitem: DataFrame, orders: DataFrame, slaDays: Int = 5): DataFrame = {
    // B(d) over a named epoch-day column (integer DIV/MOD only)
    def busIndex(c: String): String =
      s"(($c DIV 7) * 5 + element_at(array(0L,1L,2L,2L,2L,3L,4L), CAST($c % 7 + 1 AS INT)))"
    lineitem
      .join(orders.select(col("o_orderkey"), col("o_orderdate"),
        col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey"))
      .withColumn("ds",
        datediff(to_date(col("l_shipdate")), to_date(lit("1970-01-01"))).cast("long"))
      .withColumn("od",
        datediff(to_date(col("o_orderdate")), to_date(lit("1970-01-01"))).cast("long"))
      .select(col("o_orderpriority"),
        expr(s"${busIndex("ds")} - ${busIndex("od")}").as("bus_delay"))
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_lines"),
        sum(col("bus_delay")).as("delay_sum"),
        max(col("bus_delay")).as("max_delay"),
        sum(when(col("bus_delay") <= slaDays, 1L).otherwise(0L)).as("n_within"))
      .select(
        col("o_orderpriority"), col("n_lines"),
        expr("delay_sum * 1000000 DIV n_lines").as("avg_delay_micro"),
        col("max_delay"),
        expr("n_within * 1000000 DIV n_lines").as("within_sla_ppm"))
      .orderBy(col("o_orderpriority").asc_nulls_last)
  }

  /** Star-schema enrichment of the event stream: events joined to customer
    * (user_id = c_custkey in the harness), rolled up by segment x
    * event_type.
    */
  def eventsBySegment(events: DataFrame, customer: DataFrame): DataFrame =
    events
      .join(customer, events("user_id") === customer("c_custkey"))
      .groupBy(col("c_mktsegment"), col("event_type"))
      .agg(
        count(lit(1)).as("event_count"),
        countDistinct(col("user_id")).as("unique_user_count"),
        round(sum(col("value")), 2).as("total_value"))
      .orderBy(col("c_mktsegment"), col("event_type"))

  /** Market-basket co-purchase pairs with lift (the association-rule
    * primitive: support(a,b), marginals, lift = P(ab)/(P(a)P(b))).
    *
    * Distributed shape: ONE lineitem shuffle into per-order baskets
    * (collect_set, map-side partial sets), then pair expansion INSIDE each
    * row — a double explode bounded by lines-per-order (TPC-H ≤ 7, so
    * ≤ 21 pairs/order), never a corpus self-join. Pair counts are a
    * map-side-combined aggregate bounded by observed pairs; marginals come
    * from the same basket frame (one exploded count, part-dimension-sized,
    * exchange-reused); the order total rides a 1-row broadcast. The
    * part-marginal join is left to AQE: it broadcasts while the part
    * dimension fits and falls back to a shuffle join at 100 TB scale.
    *
    * Top-k cutoff orders on exact longs (support DESC, then the pair key)
    * — no float in the ordering; lift is emitted rounded, computed from
    * exact-long operands so the double is argument-identical cross-engine.
    */
  def copurchasePairs(
      lineitem: DataFrame,
      minSupport: Long = 2L,
      k: Int = 50): DataFrame = {
    val baskets = lineitem
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_set(col("l_partkey"))).as("parts"))
    val pairs = baskets
      .select(explode(graft.operators.Association.orderedPairs(col("parts")))
        .as("p"))
      .select(col("p.part_a"), col("p.part_b"))
      .groupBy(col("part_a"), col("part_b"))
      .agg(count(lit(1)).as("support"))
    val partCounts = baskets
      .select(explode(col("parts")).as("pk"))
      .groupBy(col("pk"))
      .agg(count(lit(1)).as("n_ok"))
    val nOrders = baskets.agg(count(lit(1)).as("n_orders"))
    pairs
      .filter(col("support") >= minSupport)
      .join(partCounts.withColumnRenamed("pk", "part_a")
        .withColumnRenamed("n_ok", "n_a"), Seq("part_a"))
      .join(partCounts.withColumnRenamed("pk", "part_b")
        .withColumnRenamed("n_ok", "n_b"), Seq("part_b"))
      .crossJoin(broadcast(nOrders))
      .withColumn("lift_raw",
        col("support").cast("double") * col("n_orders").cast("double") /
          (col("n_a").cast("double") * col("n_b").cast("double")))
      .orderBy(col("support").desc, col("part_a"), col("part_b"))
      .limit(k)
      .select(col("part_a"), col("part_b"), col("support"),
        col("n_a"), col("n_b"), round(col("lift_raw"), 4).as("lift"))
      .orderBy(col("support").desc, col("part_a"), col("part_b"))
  }

  /** MATCH_RECOGNIZE-lite event-pattern matching: each user's ordered
    * event history becomes a one-char-per-event string, and the CEP
    * questions ("view immediately followed by purchase", "longest
    * purchase streak") become REGEX COUNTS over it — the cheap-trick
    * spelling of sequence pattern matching that stays fully relational
    * and engine-agnostic. Patterns are restricted to the unambiguous
    * regex subset (fixed literals, maximal `p+` runs) where Java and
    * RE2 agree on non-overlapping leftmost matching; everything emitted
    * is an exact integer.
    *
    * Scale: one shuffle keyed by user; each user's sequence is bounded
    * by their own activity (the sessionize-class shape — a pathological
    * mega-user would need the same per-key cap every sessionizer
    * applies).
    */
  def eventPatternMatch(events: DataFrame): DataFrame = {
    val code = when(col("event_type") === "click", "c")
      .when(col("event_type") === "view", "v")
      .when(col("event_type") === "purchase", "p")
      .when(col("event_type") === "error", "e")
      .otherwise("s")
    events
      .select(col("user_id"), col("ts"), col("event_id"), code.as("__code"))
      .groupBy(col("user_id"))
      .agg(expr(
        """array_join(transform(
          |  array_sort(collect_list(struct(ts, event_id, __code))),
          |  x -> x.__code), '')""".stripMargin).as("seq"))
      .select(
        col("user_id"),
        length(col("seq")).cast("bigint").as("seq_len"),
        size(expr("regexp_extract_all(seq, 'vp', 0)")).cast("bigint")
          .as("view_then_buy"),
        size(expr("regexp_extract_all(seq, 'cp', 0)")).cast("bigint")
          .as("click_then_buy"),
        size(expr("regexp_extract_all(seq, 'ep', 0)")).cast("bigint")
          .as("buy_after_error"),
        coalesce(expr(
          """array_max(transform(regexp_extract_all(seq, 'p+', 0),
            |          x -> length(x)))""".stripMargin).cast("bigint"),
          lit(0L)).as("max_buy_streak"))
      .orderBy(col("user_id"))
  }

  /** Time-to-convert distribution: per user, the lag from FIRST view to
    * the first purchase AFTER it, summarized as exact quantiles — the
    * latency histogram growth teams read next to the funnel's
    * conversion rates. Lags are exact epoch-micros differences; the
    * quantile is the exact k-th order statistic (k = ceil(q·n)) over
    * the per-user lag frame, ranked via [[graft.operators
    * .DistributedRank]] (users ≪ events; no single-task sort). Caller
    * releases the pinned frame (Verify/Bench do).
    */
  def conversionLagQuantiles(events: DataFrame): DataFrame = {
    val firstView = events.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("first_view"))
    val lags = events.filter(col("event_type") === "purchase")
      .join(firstView, Seq("user_id"))
      .filter(col("ts") >= col("first_view"))
      .groupBy(col("user_id"))
      .agg((unix_micros(min(col("ts"))) -
        unix_micros(first(col("first_view")))).as("lag_micros"))
    val n = lags.agg(count(lit(1)).as("n"))
    val ranked = graft.operators.DistributedRank
      .withGlobalRank(lags, Seq(col("lag_micros"), col("user_id")), "rk")
      .crossJoin(broadcast(n))
    val qs = Seq(250000L, 500000L, 750000L, 900000L)
    qs.map { q =>
      ranked
        .filter(col("rk") === expr(s"(n * $q + 999999) DIV 1000000"))
        .select(lit(q).as("q_ppm"), col("n").as("n_users"),
          col("lag_micros").as("lag_micros"))
    }.reduce(_ unionByName _)
      .orderBy(col("q_ppm"))
  }

  def conversionLagOracleSql: String = {
    val qs = Seq(250000L, 500000L, 750000L, 900000L)
    val branches = qs.map { q =>
      s"""SELECT $q AS q_ppm, n AS n_users, lag_micros
         |FROM r WHERE rk = (n * $q + 999999) // 1000000""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH fv AS (
       |  SELECT user_id, min(ts) AS first_view
       |  FROM events WHERE event_type = 'view' GROUP BY 1),
       |lags AS (
       |  SELECT e.user_id,
       |    CAST(epoch_us(min(e.ts)) - epoch_us(any_value(first_view))
       |      AS BIGINT) AS lag_micros
       |  FROM events e JOIN fv ON e.user_id = fv.user_id
       |  WHERE e.event_type = 'purchase' AND e.ts >= fv.first_view
       |  GROUP BY 1),
       |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM lags),
       |r AS (
       |  SELECT lag_micros,
       |    CAST(row_number() OVER (ORDER BY lag_micros, user_id) AS BIGINT)
       |      AS rk, n
       |  FROM lags, n)
       |SELECT * FROM (
       |$branches)
       |ORDER BY q_ppm""".stripMargin
  }

  /** Month-over-month revenue growth per market segment: exact cents
    * sums keyed by (segment, month), the previous month via a lag
    * window over the calendar-bounded frame, growth in exact ppm
    * (DIV on cents). The BI staple that exercises date truncation +
    * windowed deltas on the integer path.
    */
  def momGrowth(orders: DataFrame, customer: DataFrame): DataFrame = {
    val monthly = orders
      .join(customer.select(col("c_custkey"), col("c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("segment"),
        date_trunc("month", col("o_orderdate")).as("month"))
      .agg(sum(centsOf(col("o_totalprice"))).cast("long").as("revenue_cents"))
    val w = Window.partitionBy(col("segment")).orderBy(col("month"))
    monthly
      .withColumn("prev_cents", lag(col("revenue_cents"), 1).over(w))
      .select(col("segment"), col("month"), col("revenue_cents"),
        col("prev_cents"),
        when(col("prev_cents") > 0L,
          expr("((revenue_cents - prev_cents) * 1000000L) DIV prev_cents"))
          .as("growth_ppm"))
      .orderBy(col("segment"), col("month"))
  }

  def momGrowthOracleSql: String =
    """WITH m AS (
      |  SELECT c_mktsegment AS segment,
      |    date_trunc('month', o_orderdate) AS month,
      |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
      |      AS BIGINT)) AS BIGINT) AS revenue_cents
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  GROUP BY 1, 2),
      |l AS (
      |  SELECT segment, month, revenue_cents,
      |    lag(revenue_cents) OVER (PARTITION BY segment ORDER BY month)
      |      AS prev_cents
      |  FROM m)
      |SELECT segment, month, revenue_cents, prev_cents,
      |  CASE WHEN prev_cents > 0
      |    THEN CAST((revenue_cents - prev_cents) * 1000000 // prev_cents
      |      AS BIGINT)
      |  END AS growth_ppm
      |FROM l ORDER BY segment, month""".stripMargin

  /** Adtributor-style delta attribution (Bhagwan et al., NSDI 2014,
    * simplified to its exact-share core): when volume shifts between two
    * periods, which dimension values moved the mix? Per dimension
    * (event_type, hour-of-day), each value's share of period A vs
    * period B in exact ppm and the signed delta — the root-cause table
    * an on-call reads under a volume alarm. Everything is integer
    * counts and micros DIV.
    *
    * Scale: one scan folds to the (dimension, value, period) counts
    * (dimension-bounded frame); marginals ride count windows over it.
    */
  def deltaAttribution(events: DataFrame,
      splitTs: String = "2024-01-15 00:00:00"): DataFrame = {
    val period = when(col("ts") < to_timestamp(lit(splitTs)), lit("a"))
      .otherwise(lit("b"))
    def dim(name: String, value: Column): DataFrame = events
      .groupBy(value.cast("string").as("value"), period.as("p"))
      .agg(count(lit(1)).as("c"))
      .withColumn("dimension", lit(name))
    val cells = dim("event_type", col("event_type"))
      .unionByName(dim("hour_of_day", hour(col("ts"))))
    val withTotals = cells
      .withColumn("tot", sum(col("c")).over(
        Window.partitionBy(col("dimension"), col("p"))))
    val a = withTotals.filter(col("p") === "a")
      .select(col("dimension"), col("value"), col("c").as("count_a"),
        col("tot").as("tot_a"))
    val b = withTotals.filter(col("p") === "b")
      .select(col("dimension"), col("value"), col("c").as("count_b"),
        col("tot").as("tot_b"))
    a.join(b, Seq("dimension", "value"), "full_outer")
      .select(col("dimension"), col("value"),
        coalesce(col("count_a"), lit(0L)).as("count_a"),
        coalesce(col("count_b"), lit(0L)).as("count_b"),
        // coalesce, not greatest: an absent (dimension, value) in one
        // period carries a NULL total, and the engines disagree on
        // greatest(NULL, 1); the count is 0 there so any divisor works
        expr("(coalesce(count_a, 0L) * 1000000L) DIV coalesce(tot_a, 1L)")
          .as("share_a_ppm"),
        expr("(coalesce(count_b, 0L) * 1000000L) DIV coalesce(tot_b, 1L)")
          .as("share_b_ppm"))
      .withColumn("delta_ppm", col("share_b_ppm") - col("share_a_ppm"))
      .orderBy(col("dimension"), col("value"))
  }

  def deltaAttributionOracleSql(splitTs: String = "2024-01-15 00:00:00")
      : String =
    s"""WITH cells AS (
       |  SELECT 'event_type' AS dimension, CAST(event_type AS VARCHAR)
       |      AS value,
       |    CASE WHEN ts < TIMESTAMP '$splitTs' THEN 'a' ELSE 'b' END AS p,
       |    CAST(count(*) AS BIGINT) AS c
       |  FROM events GROUP BY 2, 3
       |  UNION ALL
       |  SELECT 'hour_of_day', CAST(CAST(hour(ts) AS INTEGER) AS VARCHAR),
       |    CASE WHEN ts < TIMESTAMP '$splitTs' THEN 'a' ELSE 'b' END,
       |    CAST(count(*) AS BIGINT)
       |  FROM events GROUP BY 2, 3),
       |t AS (
       |  SELECT dimension, value, p, c,
       |    CAST(sum(c) OVER (PARTITION BY dimension, p) AS BIGINT) AS tot
       |  FROM cells),
       |j AS (
       |  SELECT coalesce(a.dimension, b.dimension) AS dimension,
       |    coalesce(a.value, b.value) AS value,
       |    coalesce(a.c, 0) AS count_a, coalesce(b.c, 0) AS count_b,
       |    CAST(coalesce(a.c, 0) * 1000000
       |      // coalesce(a.tot, 1) AS BIGINT) AS share_a_ppm,
       |    CAST(coalesce(b.c, 0) * 1000000
       |      // coalesce(b.tot, 1) AS BIGINT) AS share_b_ppm
       |  FROM (SELECT * FROM t WHERE p = 'a') a
       |  FULL OUTER JOIN (SELECT * FROM t WHERE p = 'b') b
       |    ON a.dimension = b.dimension AND a.value = b.value)
       |SELECT dimension, value, count_a, count_b, share_a_ppm, share_b_ppm,
       |  share_b_ppm - share_a_ppm AS delta_ppm
       |FROM j ORDER BY dimension, value""".stripMargin

  /** Exact per-hour-of-day value percentiles (p50/p95 of purchase value
    * cents): per group, the k = ceil(q·n)-th order statistic via a
    * PARTITIONED rank window (24 parallel partitions, each
    * group-bounded — not a global sort), pivoted to one row per hour.
    */
  def hourlyValuePercentiles(events: DataFrame): DataFrame = {
    val vals = events
      .filter(col("event_type") === "purchase" && col("value").isNotNull)
      .select(hour(col("ts")).cast("int").as("hod"),
        centsOf(col("value")).cast("long").as("cents"),
        col("event_id"))
    val w = Window.partitionBy(col("hod"))
      .orderBy(col("cents"), col("event_id"))
    val ranked = vals
      .withColumn("rk", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("hod"))))
    ranked
      .groupBy(col("hod"))
      .agg(
        first(col("n")).as("n"),
        max(when(col("rk") === expr("(n * 500000L + 999999L) DIV 1000000L"),
          col("cents"))).as("p50_cents"),
        max(when(col("rk") === expr("(n * 950000L + 999999L) DIV 1000000L"),
          col("cents"))).as("p95_cents"))
      .orderBy(col("hod"))
  }

  def hourlyValuePercentilesOracleSql: String =
    """WITH v AS (
      |  SELECT CAST(hour(ts) AS INTEGER) AS hod,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
      |    event_id
      |  FROM events WHERE event_type = 'purchase' AND value IS NOT NULL),
      |r AS (
      |  SELECT hod, cents,
      |    CAST(row_number() OVER (PARTITION BY hod ORDER BY cents, event_id)
      |      AS BIGINT) AS rk,
      |    CAST(count(*) OVER (PARTITION BY hod) AS BIGINT) AS n
      |  FROM v)
      |SELECT hod, any_value(n) AS n,
      |  CAST(max(CASE WHEN rk = (n * 500000 + 999999) // 1000000
      |    THEN cents END) AS BIGINT) AS p50_cents,
      |  CAST(max(CASE WHEN rk = (n * 950000 + 999999) // 1000000
      |    THEN cents END) AS BIGINT) AS p95_cents
      |FROM r GROUP BY hod ORDER BY hod""".stripMargin

  /** Linear multi-touch attribution: each purchase splits one unit of
    * conversion credit equally across the user's click/view touches in
    * the trailing 24 h (time-RANGE window counts — the as-of merge
    * formulation, no event×event join). Credit is exact micros
    * (per-type count · 10^6 DIV total touches, summed over purchases);
    * the companion to the last-touch model in
    * [[graft.operators.AsOfJoin.lastTouchAttribution]].
    */
  def linearAttribution(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(unix_micros(col("ts")))
      .rangeBetween(-86400000000L, -1L)
    def trailing(tp: String) = sum(
      when(col("event_type") === tp, 1L).otherwise(0L)).over(w)
    val atPurchase = events
      .withColumn("n_click", trailing("click"))
      .withColumn("n_view", trailing("view"))
      .filter(col("event_type") === "purchase")
      .withColumn("n_touch", col("n_click") + col("n_view"))
      .filter(col("n_touch") > 0L)
    atPurchase
      .select(
        expr("(n_click * 1000000L) DIV n_touch").as("click_credit"),
        expr("(n_view * 1000000L) DIV n_touch").as("view_credit"))
      .agg(
        count(lit(1)).as("n_purchases"),
        sum(col("click_credit")).as("click_credit_micros"),
        sum(col("view_credit")).as("view_credit_micros"))
  }

  def linearAttributionOracleSql: String =
    """WITH t AS (
      |  SELECT user_id, event_type, epoch_us(ts) AS tus
      |  FROM events),
      |p AS (
      |  SELECT
      |    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
      |      OVER w AS BIGINT) AS n_click,
      |    CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
      |      OVER w AS BIGINT) AS n_view,
      |    event_type
      |  FROM t
      |  WINDOW w AS (PARTITION BY user_id ORDER BY tus
      |               RANGE BETWEEN 86400000000 PRECEDING
      |                         AND 1 PRECEDING)),
      |c AS (
      |  SELECT n_click * 1000000 // (n_click + n_view) AS click_credit,
      |    n_view * 1000000 // (n_click + n_view) AS view_credit
      |  FROM p
      |  WHERE event_type = 'purchase' AND n_click + n_view > 0)
      |SELECT CAST(count(*) AS BIGINT) AS n_purchases,
      |  CAST(sum(click_credit) AS BIGINT) AS click_credit_micros,
      |  CAST(sum(view_credit) AS BIGINT) AS view_credit_micros
      |FROM c""".stripMargin

  /** Windowed funnel depth (the ClickHouse `windowFunnel` semantic):
    * per user, the deepest prefix of view → click → purchase reached
    * with each step AFTER the previous one and the WHOLE chain inside
    * `windowHours` of step 1. Spelled as chained min-aggregations (step
    * k = earliest qualifying event after step k−1), not a per-user
    * sequential fold — three user-keyed aggregate+join rounds on
    * bounded frames, each exact on epoch micros.
    *
    * Reported as user counts per depth (0..3) plus the conversion of
    * each step among users that reached the previous one.
    */
  def windowFunnelDepth(events: DataFrame, windowHours: Int = 24)
      : DataFrame = {
    val windowMicros = windowHours.toLong * 3600L * 1000000L
    val t = events.select(col("user_id"),
      col("event_type"), unix_micros(col("ts")).as("tus"))
    val s1 = t.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("tus")).as("t1"))
    val s2 = t.filter(col("event_type") === "click")
      .join(s1, Seq("user_id"))
      .filter(col("tus") > col("t1") &&
        col("tus") <= col("t1") + lit(windowMicros))
      .groupBy(col("user_id")).agg(min(col("tus")).as("t2"),
        first(col("t1")).as("t1b"))
    val s3 = t.filter(col("event_type") === "purchase")
      .join(s2, Seq("user_id"))
      .filter(col("tus") > col("t2") &&
        col("tus") <= col("t1b") + lit(windowMicros))
      .groupBy(col("user_id")).agg(min(col("tus")).as("t3"))
    val allUsers = t.select(col("user_id")).distinct()
    val depth = allUsers
      .join(s1.select(col("user_id"), lit(1L).as("d1")), Seq("user_id"),
        "left")
      .join(s2.select(col("user_id"), lit(1L).as("d2")), Seq("user_id"),
        "left")
      .join(s3.select(col("user_id"), lit(1L).as("d3")), Seq("user_id"),
        "left")
      .select(col("user_id"),
        (coalesce(col("d1"), lit(0L)) + coalesce(col("d2"), lit(0L)) +
          coalesce(col("d3"), lit(0L))).as("depth"))
    depth
      .groupBy(col("depth"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("depth"))
  }

  def windowFunnelOracleSql(windowHours: Int = 24): String = {
    val wm = windowHours.toLong * 3600L * 1000000L
    s"""WITH t AS (
       |  SELECT user_id, event_type, epoch_us(ts) AS tus FROM events),
       |s1 AS (
       |  SELECT user_id, min(tus) AS t1
       |  FROM t WHERE event_type = 'view' GROUP BY 1),
       |s2 AS (
       |  SELECT t.user_id, min(tus) AS t2, any_value(t1) AS t1b
       |  FROM t JOIN s1 ON t.user_id = s1.user_id
       |  WHERE event_type = 'click' AND tus > t1 AND tus <= t1 + $wm
       |  GROUP BY 1),
       |s3 AS (
       |  SELECT t.user_id, min(tus) AS t3
       |  FROM t JOIN s2 ON t.user_id = s2.user_id
       |  WHERE event_type = 'purchase' AND tus > t2 AND tus <= t1b + $wm
       |  GROUP BY 1),
       |d AS (
       |  SELECT u.user_id,
       |    (CASE WHEN s1.user_id IS NULL THEN 0 ELSE 1 END
       |     + CASE WHEN s2.user_id IS NULL THEN 0 ELSE 1 END
       |     + CASE WHEN s3.user_id IS NULL THEN 0 ELSE 1 END) AS depth
       |  FROM (SELECT DISTINCT user_id FROM t) u
       |  LEFT JOIN s1 ON u.user_id = s1.user_id
       |  LEFT JOIN s2 ON u.user_id = s2.user_id
       |  LEFT JOIN s3 ON u.user_id = s3.user_id)
       |SELECT CAST(depth AS BIGINT) AS depth,
       |  CAST(count(*) AS BIGINT) AS n_users
       |FROM d GROUP BY depth ORDER BY depth""".stripMargin
  }

  /** Customer-lifetime-value cohort curves: users cohorted by SIGNUP
    * month, cumulative purchase cents per cohort over month index —
    * the LTV table under every payback-period decision. Exact cents
    * all the way; the cumulative ride is an integer window sum over the
    * calendar-bounded (cohort × month-index) frame.
    */
  def clvCohortCurves(events: DataFrame): DataFrame = {
    // weekly cohorts (the harness corpus spans one month); the week
    // index clears engine week-diff semantics by exact day arithmetic
    val signup = events.filter(col("event_type") === "signup")
      .groupBy(col("user_id"))
      .agg(date_trunc("week", min(col("ts"))).as("cohort_week"))
    val weekly = events
      .filter(col("event_type") === "purchase" && col("value").isNotNull)
      .join(signup, Seq("user_id"))
      .groupBy(col("cohort_week"),
        (datediff(date_trunc("week", col("ts")), col("cohort_week"))
          .cast("long") / lit(7L)).cast("long").as("week_index"))
      .agg(sum(centsOf(col("value"))).cast("long").as("revenue_cents"))
      .filter(col("week_index") >= 0)
    val cohortSizes = signup.groupBy(col("cohort_week"))
      .agg(count(lit(1)).as("cohort_users"))
    val w = Window.partitionBy(col("cohort_week")).orderBy(col("week_index"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    weekly
      .join(broadcast(cohortSizes), Seq("cohort_week"))
      .withColumn("cum_cents", sum(col("revenue_cents")).over(w))
      .select(col("cohort_week"), col("week_index"), col("cohort_users"),
        col("revenue_cents"), col("cum_cents"),
        expr("cum_cents DIV cohort_users").as("clv_cents_per_user"))
      .orderBy(col("cohort_week"), col("week_index"))
  }

  def clvCohortOracleSql: String =
    """WITH signup AS (
      |  SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
      |  FROM events WHERE event_type = 'signup' GROUP BY 1),
      |weekly AS (
      |  SELECT cohort_week,
      |    CAST(date_diff('day', cohort_week, date_trunc('week', e.ts)) // 7
      |      AS BIGINT) AS week_index,
      |    CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
      |      AS BIGINT) AS revenue_cents
      |  FROM events e JOIN signup s ON e.user_id = s.user_id
      |  WHERE event_type = 'purchase' AND value IS NOT NULL
      |  GROUP BY 1, 2
      |  HAVING CAST(date_diff('day', cohort_week,
      |      date_trunc('week', e.ts)) // 7 AS BIGINT) >= 0),
      |sizes AS (
      |  SELECT cohort_week, CAST(count(*) AS BIGINT) AS cohort_users
      |  FROM signup GROUP BY 1)
      |SELECT m.cohort_week, m.week_index, z.cohort_users,
      |  m.revenue_cents,
      |  CAST(sum(m.revenue_cents) OVER (PARTITION BY m.cohort_week
      |    ORDER BY m.week_index ROWS UNBOUNDED PRECEDING) AS BIGINT)
      |    AS cum_cents,
      |  CAST(CAST(sum(m.revenue_cents) OVER (PARTITION BY m.cohort_week
      |    ORDER BY m.week_index ROWS UNBOUNDED PRECEDING) AS BIGINT)
      |    // z.cohort_users AS BIGINT) AS clv_cents_per_user
      |FROM weekly m JOIN sizes z ON m.cohort_week = z.cohort_week
      |ORDER BY m.cohort_week, m.week_index""".stripMargin

  /** Daily new-vs-returning user split: each user's first-ever event
    * day marks them "new" that day, "returning" on every later active
    * day — the growth-accounting curve (acquisition vs retention mix).
    * Exact counts + ppm share.
    *
    * Scale: first-day is one user-keyed min; daily activity is one
    * (day, user)-distinct aggregate; the join back rides the same user
    * keying.
    */
  def newVsReturning(events: DataFrame): DataFrame = {
    val firstDay = events.groupBy(col("user_id"))
      .agg(to_date(min(col("ts"))).as("first_day"))
    val daily = events
      .select(to_date(col("ts")).as("day"), col("user_id"))
      .distinct()
    daily
      .join(firstDay, Seq("user_id"))
      .groupBy(col("day"))
      .agg(
        count(lit(1)).as("active_users"),
        sum((col("day") === col("first_day")).cast("bigint"))
          .as("new_users"))
      .select(col("day"), col("active_users"), col("new_users"),
        (col("active_users") - col("new_users")).as("returning_users"),
        expr("(new_users * 1000000L) DIV active_users").as("new_share_ppm"))
      .orderBy(col("day"))
  }

  def newVsReturningOracleSql: String =
    """WITH fd AS (
      |  SELECT user_id, CAST(min(ts) AS DATE) AS first_day
      |  FROM events GROUP BY 1),
      |daily AS (
      |  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
      |a AS (
      |  SELECT day, CAST(count(*) AS BIGINT) AS active_users,
      |    CAST(sum(CASE WHEN day = first_day THEN 1 ELSE 0 END) AS BIGINT)
      |      AS new_users
      |  FROM daily JOIN fd ON daily.user_id = fd.user_id
      |  GROUP BY day)
      |SELECT day, active_users, new_users,
      |  active_users - new_users AS returning_users,
      |  CAST(new_users * 1000000 // active_users AS BIGINT)
      |    AS new_share_ppm
      |FROM a ORDER BY day""".stripMargin

  /** Multi-window SLO burn rate (the SRE error-budget alert, Google SRE
    * workbook ch.5): per hour, the error rate over the short (1 h) and
    * long (trailing 6 h) windows in exact ppm, and the page condition =
    * BOTH windows above the burn threshold (fast burn that is not just
    * a blip). Budget: 2% error target → threshold 20 000 ppm.
    *
    * Scale: one scan to the hourly (errors, total) frame; the long
    * window is a 6-row ROWS frame over the calendar-bounded series.
    */
  def sloBurnRate(events: DataFrame,
      thresholdPpm: Long = 20000L): DataFrame = {
    val hourly = events
      .groupBy(date_trunc("hour", col("ts")).as("h"))
      .agg(
        count(lit(1)).as("total"),
        sum((col("event_type") === "error").cast("bigint")).as("errors"))
    val w6 = Window.orderBy(col("h")).rowsBetween(-5, 0)
    hourly
      .withColumn("total_6h", sum(col("total")).over(w6))
      .withColumn("errors_6h", sum(col("errors")).over(w6))
      .select(col("h").as("window_start"), col("total"), col("errors"),
        expr("(errors * 1000000L) DIV total").as("error_ppm_1h"),
        expr("(errors_6h * 1000000L) DIV total_6h").as("error_ppm_6h"))
      .withColumn("page",
        col("error_ppm_1h") > thresholdPpm &&
          col("error_ppm_6h") > thresholdPpm)
      .orderBy(col("window_start"))
  }

  def sloBurnRateOracleSql(thresholdPpm: Long = 20000L): String =
    s"""WITH hourly AS (
       |  SELECT date_trunc('hour', ts) AS h,
       |    CAST(count(*) AS BIGINT) AS total,
       |    CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
       |      AS BIGINT) AS errors
       |  FROM events GROUP BY 1),
       |r AS (
       |  SELECT h, total, errors,
       |    CAST(sum(total) OVER w AS BIGINT) AS total_6h,
       |    CAST(sum(errors) OVER w AS BIGINT) AS errors_6h
       |  FROM hourly
       |  WINDOW w AS (ORDER BY h ROWS BETWEEN 5 PRECEDING AND CURRENT ROW))
       |SELECT h AS window_start, total, errors,
       |  CAST(errors * 1000000 // total AS BIGINT) AS error_ppm_1h,
       |  CAST(errors_6h * 1000000 // total_6h AS BIGINT) AS error_ppm_6h,
       |  (errors * 1000000 // total > $thresholdPpm
       |   AND errors_6h * 1000000 // total_6h > $thresholdPpm) AS page
       |FROM r ORDER BY window_start""".stripMargin

  def eventPatternMatchOracleSql: String =
    """WITH c AS (
      |  SELECT user_id, ts, event_id,
      |    CASE event_type WHEN 'click' THEN 'c' WHEN 'view' THEN 'v'
      |      WHEN 'purchase' THEN 'p' WHEN 'error' THEN 'e'
      |      ELSE 's' END AS code
      |  FROM events),
      |s AS (
      |  SELECT user_id,
      |    string_agg(code, '' ORDER BY ts, event_id) AS seq
      |  FROM c GROUP BY user_id)
      |SELECT user_id,
      |  CAST(length(seq) AS BIGINT) AS seq_len,
      |  CAST(len(regexp_extract_all(seq, 'vp')) AS BIGINT) AS view_then_buy,
      |  CAST(len(regexp_extract_all(seq, 'cp')) AS BIGINT) AS click_then_buy,
      |  CAST(len(regexp_extract_all(seq, 'ep')) AS BIGINT) AS buy_after_error,
      |  CAST(coalesce(list_max(list_transform(
      |    regexp_extract_all(seq, 'p+'), x -> length(x))), 0) AS BIGINT)
      |    AS max_buy_streak
      |FROM s ORDER BY user_id""".stripMargin
}
