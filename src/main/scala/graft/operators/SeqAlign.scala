package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dynamic-programming sequence operators: DTW profile alignment and a
  * min-cost two-state burst automaton (the Viterbi shape). Both reduce the
  * corpus to TIME-DOMAIN-bounded frames in one scan-shaped aggregate and
  * fold only those bounded frames — the discipline every sequential
  * operator in this repo follows ([[Changepoint.cusumChangepoints]],
  * [[Changepoint.holtWinters]]): at 100 TB the only full-data pass is the
  * initial count, and the non-associative recursions run on arrays whose
  * length is fixed by the calendar (24 phases / observed hours), never by
  * the row count.
  *
  * All arithmetic is exact integer (counts, absolute deviations, min-plus
  * sums), so the DuckDB oracles are bit-exact with no IEEE hazard.
  */
object SeqAlign {

  /** Big-but-safe integer infinity for min-plus DP: far above any
    * reachable path cost (24 steps × count-scale costs), far below
    * Long.MaxValue so INF + cost never overflows.
    */
  private val Inf = 1000000000000000L

  /** Dynamic-time-warping distance between the hour-of-day volume
    * profiles of every event-type pair (Sakoe & Chiba, IEEE TASSP 1978;
    * full 24×24 band). The profile-similarity question a pipeline asks
    * before pooling event streams: "do clicks and views follow the same
    * daily shape, allowing phase shift?" — the L1 column is the
    * no-warp baseline, so dtw_cost ≤ l1_cost is part of the contract
    * (asserted in the spec; the oracle checks the exact values).
    *
    * Shape: one scan-shaped (type, hour-of-day) count aggregate
    * (map-side combined), a 24-row dense spine exploded per type (no
    * crossJoin), profiles as 24-long arrays, and the DP folded entirely
    * inside ONE row per type pair — the pair frame is |types|²-bounded,
    * never corpus-sized. D[i][j] = |pa_i − pb_j| + min(D[i−1][j],
    * D[i−1][j−1], D[i][j−1]) with an INF-padded j=0 column; the inner
    * fold appends to the row array and reads its own last element
    * (element_at(row, -1)).
    *
    * The oracle replays the recurrence in its prefix-decomposed form
    * (D[i][j] = min_{k≤j} [min(D[i−1][k], D[i−1][k−1]) + Σ_{t=k..j} c_t])
    * — an independent spelling of the same exact integers.
    */
  def dtwProfiles(events: DataFrame): DataFrame = {
    val hod = events
      .groupBy(col("event_type"), hour(col("ts")).as("h"))
      .agg(count(lit(1)).as("x"))
    val spine = events.select(col("event_type")).distinct()
      .select(col("event_type"), explode(sequence(lit(0), lit(23))).as("h"))
    val profs = spine.join(hod, Seq("event_type", "h"), "left")
      .select(col("event_type"), col("h"),
        coalesce(col("x"), lit(0L)).as("x"))
      .groupBy(col("event_type"))
      .agg(sort_array(collect_list(struct(col("h"), col("x")))).as("hx"))
      .select(col("event_type"),
        expr("transform(hx, e -> e.x)").as("p"))
    val pairs = profs.select(col("event_type").as("type_a"), col("p").as("pa"))
      .join(profs.select(col("event_type").as("type_b"), col("p").as("pb")),
        col("type_a") < col("type_b"))
    pairs
      .withColumn("dtw_cost", expr(
        s"""aggregate(
           |  sequence(1, 24),
           |  struct(concat(array(cast(0 as bigint)),
           |    array_repeat(cast($Inf as bigint), 24)) as prev),
           |  (acc, i) -> struct(
           |    aggregate(
           |      sequence(1, 24),
           |      array(cast($Inf as bigint)),
           |      (row, j) -> concat(row, array(
           |        abs(element_at(pa, i) - element_at(pb, j)) +
           |        least(element_at(acc.prev, j + 1),
           |              element_at(acc.prev, j),
           |              element_at(row, -1))))) as prev),
           |  acc -> element_at(acc.prev, 25))""".stripMargin))
      .withColumn("l1_cost", expr(
        "aggregate(zip_with(pa, pb, (a, b) -> abs(a - b))," +
          " cast(0 as bigint), (s, v) -> s + v)"))
      .select(col("type_a"), col("type_b"), col("dtw_cost"), col("l1_cost"))
      .orderBy(col("type_a"), col("type_b"))
  }

  /** DuckDB replay: recursive CTE over rows i, carrying the INF-padded
    * DP row as a LIST, each new row via the prefix-decomposed min-plus
    * form (nested index lambdas — O(24³) per row on a 10-pair frame).
    */
  def dtwProfilesOracleSql: String =
    s"""WITH RECURSIVE hod AS (
       |  SELECT event_type, CAST(hour(ts) AS INT) AS h,
       |    CAST(count(*) AS BIGINT) AS x
       |  FROM events GROUP BY 1, 2),
       |types AS (SELECT DISTINCT event_type FROM events),
       |spine AS (
       |  SELECT t.event_type, CAST(g.h AS INT) AS h
       |  FROM types t, (SELECT unnest(range(24)) AS h) g),
       |profs AS (
       |  SELECT s.event_type,
       |    list(COALESCE(hod.x, 0) ORDER BY s.h) AS p
       |  FROM spine s LEFT JOIN hod
       |    ON s.event_type = hod.event_type AND s.h = hod.h
       |  GROUP BY s.event_type),
       |pairs AS (
       |  SELECT a.event_type AS type_a, b.event_type AS type_b,
       |    a.p AS pa, b.p AS pb
       |  FROM profs a JOIN profs b ON a.event_type < b.event_type),
       |walk(type_a, type_b, i, prev) AS (
       |  SELECT type_a, type_b, 0,
       |    [CAST(0 AS BIGINT)] ||
       |      list_transform(range(24), z -> CAST($Inf AS BIGINT))
       |  FROM pairs
       |  UNION ALL
       |  SELECT w.type_a, w.type_b, w.i + 1,
       |    [CAST($Inf AS BIGINT)] ||
       |      list_transform(range(1, 25), j ->
       |        list_min(list_transform(range(1, j + 1), k ->
       |          least(w.prev[CAST(k AS INT) + 1], w.prev[CAST(k AS INT)]) +
       |          list_sum(list_transform(range(k, j + 1), t ->
       |            abs(p.pa[CAST(w.i AS INT) + 1] - p.pb[CAST(t AS INT)]))))))
       |  FROM walk w JOIN pairs p
       |    ON p.type_a = w.type_a AND p.type_b = w.type_b
       |  WHERE w.i < 24),
       |dtw AS (
       |  SELECT type_a, type_b, prev[25] AS dtw_cost
       |  FROM walk WHERE i = 24),
       |l1 AS (
       |  SELECT type_a, type_b,
       |    list_sum(list_transform(range(1, 25), j ->
       |      abs(pa[CAST(j AS INT)] - pb[CAST(j AS INT)]))) AS l1_cost
       |  FROM pairs)
       |SELECT d.type_a, d.type_b,
       |  CAST(d.dtw_cost AS BIGINT) AS dtw_cost,
       |  CAST(l.l1_cost AS BIGINT) AS l1_cost
       |FROM dtw d JOIN l1 l
       |  ON l.type_a = d.type_a AND l.type_b = d.type_b
       |ORDER BY d.type_a, d.type_b""".stripMargin

  /** Min-cost two-state burst segmentation of the hourly volume series —
    * the Viterbi decode of a Kleinberg-style burst automaton (Kleinberg,
    * KDD 2002) with exact integer costs: state levels L0 = ⌊Σx/T⌋ (the
    * baseline mean) and L1 = 2·L0 + 1, per-hour emission cost
    * |x_t − L_s|, switch penalty γ = L0 + 1, start pinned to baseline.
    * Instead of an explicit backtrack (which a relational replay can't
    * express cleanly), the optimal path is decoded by FORWARD +
    * BACKWARD min-sum: state(t) = argmin_s fwd(t,s) + bwd(t,s), the
    * min cost of any full path constrained through (t,s) — on the
    * optimal path both terms are tight, and ties break to baseline.
    *
    * Output: burst islands (consecutive burst hours) with extent,
    * volume and peak, plus the constant optimal path cost as an
    * in-row self-check column.
    *
    * SEMANTIC CONTRACT (ties): state(t)=1 iff routing through burst at
    * t is STRICTLY cheaper, i.e. the islands are the hours where EVERY
    * optimal path bursts (the intersection of all optimal paths' burst
    * sets). With ties/multiple optima the island set can therefore be
    * a proper subset of any single optimal path's bursts. Engine,
    * oracle and spec all implement this strict decode; [[viterbiStates]]
    * additionally emits the min(c0,c1)=path_cost tightness self-check
    * certifying the per-hour costs against the optimal cost.
    *
    * Scale: identical to [[Changepoint.holtWinters]] — the corpus
    * reduces to the calendar-bounded gap-filled hourly frame in one
    * map-side-combined aggregate; both folds walk ONE bounded array.
    * KNOWN QUADRATIC CONSTANT: each fold step appends to the carried
    * per-hour array with concat, so the single-row fold costs O(T²)
    * struct copies (T = observed hours — ~8760²/2 ≈ 38M tiny copies
    * for one year, seconds in one task; ~77M for two). Bounded by the
    * calendar, never by corpus rows, but a multi-decade series should
    * switch to the associative 2×2 min-plus matrix-product form and a
    * two-level partition fold (the [[DistributedRank]] shape).
    */
  def viterbiBursts(events: DataFrame): DataFrame = {
    val perHour = decodedStates(events)
    val w = Window.orderBy(col("h"))
    val islands = perHour
      .withColumn("rn", row_number().over(w))
      .filter(col("state") === 1)
      .withColumn("rb", row_number().over(Window.orderBy(col("h"))))
      .withColumn("grp", expr("rn - rb"))
    islands
      .groupBy(col("grp"))
      .agg(
        min(col("h")).as("burst_start"),
        max(col("h")).as("burst_end"),
        count(lit(1)).as("n_hours"),
        sum(col("x")).as("total_events"),
        max(col("x")).as("peak_events"),
        max(col("path_cost")).as("path_cost"))
      .withColumn("burst_id",
        row_number().over(Window.orderBy(col("burst_start"))))
      .select(col("burst_id"), col("burst_start"), col("burst_end"),
        col("n_hours"), col("total_events"), col("peak_events"),
        col("path_cost"))
      .orderBy(col("burst_id"))
  }

  /** Per-hour decode table (h, x, c0, c1, state, path_cost) behind
    * [[viterbiBursts]]/[[viterbiStates]] — one row per gap-filled hour,
    * so the correctness harness exercises the forward-backward decode
    * on EVERY dataset (burst islands are empty on calm data, which made
    * the islands-only oracle comparison vacuous — ADVICE r8).
    */
  private def decodedStates(events: DataFrame): DataFrame = {
    val hourly = events
      .groupBy(date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("x"))
    val spine = hourly
      .agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
      .select(explode(sequence(col("h0"), col("h1"),
        expr("INTERVAL 1 HOUR"))).as("h"))
    val filled = spine.join(hourly, Seq("h"), "left")
      .select(col("h"), coalesce(col("x"), lit(0L)).as("x"))
    val folded = filled
      .agg(sort_array(collect_list(struct(col("h"), col("x")))).as("xs"),
        sum(col("x")).as("tot"), count(lit(1)).as("t_n"))
      // Empty-input guard: the no-groupBy agg still emits one row with
      // xs=[] and t_n=0, on which slice(xs, 2, -1) / element_at(xs, 1)
      // error under Spark 4 ANSI. Filter BEFORE the fold projections so
      // empty events yield 0 rows, matching the oracle.
      .filter(col("t_n") > 0)
      .withColumn("l0", expr("tot DIV t_n"))
      .withColumn("l1", expr("2 * l0 + 1"))
      .withColumn("gam", expr("l0 + 1"))
      // forward: f(1,0)=e(1,0), f(1,1)=γ+e(1,1);
      // f(t,s) = e(t,s) + min(f(t−1,s), f(t−1,1−s)+γ)
      .withColumn("fwd", expr(
        """aggregate(
          |  slice(xs, 2, size(xs) - 1),
          |  struct(
          |    abs(element_at(xs, 1).x - l0) as f0,
          |    gam + abs(element_at(xs, 1).x - l1) as f1,
          |    array(struct(element_at(xs, 1).h as h,
          |      abs(element_at(xs, 1).x - l0) as f0,
          |      gam + abs(element_at(xs, 1).x - l1) as f1)) as out),
          |  (acc, e) -> struct(
          |    abs(e.x - l0) + least(acc.f0, acc.f1 + gam) as f0,
          |    abs(e.x - l1) + least(acc.f1, acc.f0 + gam) as f1,
          |    concat(acc.out, array(struct(e.h as h,
          |      abs(e.x - l0) + least(acc.f0, acc.f1 + gam) as f0,
          |      abs(e.x - l1) + least(acc.f1, acc.f0 + gam) as f1))) as out),
          |  acc -> acc)""".stripMargin))
      // backward over the reversed series: g(T,s)=0;
      // g(t,s) = min(g(t+1,s)+e(t+1,s), g(t+1,1−s)+e(t+1,1−s)+γ)
      .withColumn("bwd", expr(
        """aggregate(
          |  slice(reverse(xs), 2, size(xs) - 1),
          |  struct(
          |    cast(0 as bigint) as g0, cast(0 as bigint) as g1,
          |    element_at(reverse(xs), 1).x as px,
          |    array(struct(element_at(reverse(xs), 1).h as h,
          |      cast(0 as bigint) as g0, cast(0 as bigint) as g1)) as out),
          |  (acc, e) -> struct(
          |    least(acc.g0 + abs(acc.px - l0),
          |          acc.g1 + abs(acc.px - l1) + gam) as g0,
          |    least(acc.g1 + abs(acc.px - l1),
          |          acc.g0 + abs(acc.px - l0) + gam) as g1,
          |    e.x as px,
          |    concat(acc.out, array(struct(e.h as h,
          |      least(acc.g0 + abs(acc.px - l0),
          |            acc.g1 + abs(acc.px - l1) + gam) as g0,
          |      least(acc.g1 + abs(acc.px - l1),
          |            acc.g0 + abs(acc.px - l0) + gam) as g1))) as out),
          |  acc -> acc)""".stripMargin))
      .withColumn("path_cost", expr("least(fwd.f0, fwd.f1)"))
    val perHour = folded
      .select(col("path_cost"),
        explode(expr(
          """zip_with(fwd.out, reverse(bwd.out), (f, g) ->
            |  struct(f.h as h,
            |    f.f0 + g.g0 as c0, f.f1 + g.g1 as c1))""".stripMargin))
          .as("st"))
      .select(col("path_cost"),
        col("st.h").as("h"),
        col("st.c0").as("c0"), col("st.c1").as("c1"),
        (col("st.c1") < col("st.c0")).cast("int").as("state"))
    // tiny time-bounded join: re-attach the hourly volume
    perHour.join(filled.select(col("h"), col("x")), Seq("h"))
  }

  /** The per-hour decode surfaced directly: hour, volume, through-state
    * min costs, the strict burst state, the optimal path cost, and a
    * `min_cost_tight` self-check (min(c0,c1) = path_cost must hold at
    * EVERY hour — both terms of c_s are path costs constrained through
    * (t,s), so the minimum over states is always the optimum). One row
    * per gap-filled hour, so the oracle comparison is never vacuous on
    * burst-free data.
    */
  def viterbiStates(events: DataFrame): DataFrame =
    decodedStates(events)
      .select(col("h").as("hour"), col("x"),
        col("c0"), col("c1"), col("state"),
        col("path_cost"),
        (least(col("c0"), col("c1")) === col("path_cost"))
          .as("min_cost_tight"))
      .orderBy(col("hour"))

  /** DuckDB replay: forward and backward recursive-CTE walks over the
    * same gap-filled frame, per-hour argmin join, gaps-and-islands.
    */
  def viterbiBurstsOracleSql: String = viterbiBurstsOracleSql("SELECT ts FROM events")

  /** Islands oracle over an arbitrary ts-producing source subquery
    * (lets the burst-bearing spiked fixture share the replay verbatim).
    */
  def viterbiBurstsOracleSql(sourceSql: String): String =
    viterbiDecodePrelude(sourceSql) +
    """,
      |islands AS (
      |  SELECT *, rn - row_number() OVER (ORDER BY rn) AS grp
      |  FROM states WHERE state = 1)
      |SELECT
      |  CAST(row_number() OVER (ORDER BY min(h)) AS INT) AS burst_id,
      |  min(h) AS burst_start, max(h) AS burst_end,
      |  CAST(count(*) AS BIGINT) AS n_hours,
      |  CAST(sum(x) AS BIGINT) AS total_events,
      |  CAST(max(x) AS BIGINT) AS peak_events,
      |  CAST(max(path_cost) AS BIGINT) AS path_cost
      |FROM islands
      |GROUP BY grp
      |ORDER BY burst_id""".stripMargin

  /** Per-hour decode oracle (see [[viterbiStates]]). */
  def viterbiStatesOracleSql: String =
    viterbiDecodePrelude("SELECT ts FROM events") +
    """
      |SELECT h AS hour, CAST(x AS BIGINT) AS x,
      |  CAST(c0 AS BIGINT) AS c0, CAST(c1 AS BIGINT) AS c1,
      |  CAST(state AS INT) AS state,
      |  CAST(path_cost AS BIGINT) AS path_cost,
      |  least(c0, c1) = path_cost AS min_cost_tight
      |FROM states ORDER BY hour""".stripMargin

  /** Shared fwd/bwd recursive-CTE decode prelude ending at the `states`
    * CTE (h, x, c0, c1, state, path_cost per gap-filled hour).
    */
  private def viterbiDecodePrelude(sourceSql: String): String =
    s"""WITH RECURSIVE hourly AS (
      |  SELECT date_trunc('hour', ts) AS h, CAST(count(*) AS BIGINT) AS x
      |  FROM ($sourceSql) GROUP BY 1),
      |spine AS (
      |  SELECT unnest(generate_series((SELECT min(h) FROM hourly),
      |    (SELECT max(h) FROM hourly), INTERVAL 1 HOUR)) AS h),
      |filled AS (
      |  SELECT s.h, COALESCE(hourly.x, 0) AS x
      |  FROM spine s LEFT JOIN hourly ON s.h = hourly.h),
      |idx AS (
      |  SELECT h, x, row_number() OVER (ORDER BY h) AS rn FROM filled),
      |params AS (
      |  SELECT CAST(sum(x) // count(*) AS BIGINT) AS l0,
      |    CAST(2 * (sum(x) // count(*)) + 1 AS BIGINT) AS l1,
      |    CAST(sum(x) // count(*) + 1 AS BIGINT) AS gam,
      |    CAST(count(*) AS BIGINT) AS t_n
      |  FROM idx),
      |fwd(rn, f0, f1) AS (
      |  SELECT CAST(1 AS BIGINT),
      |    abs(i.x - p.l0), p.gam + abs(i.x - p.l1)
      |  FROM idx i, params p WHERE i.rn = 1
      |  UNION ALL
      |  SELECT w.rn + 1,
      |    abs(i.x - p.l0) + least(w.f0, w.f1 + p.gam),
      |    abs(i.x - p.l1) + least(w.f1, w.f0 + p.gam)
      |  FROM fwd w JOIN idx i ON i.rn = w.rn + 1, params p),
      |bwd(rn, g0, g1) AS (
      |  SELECT t_n, CAST(0 AS BIGINT), CAST(0 AS BIGINT) FROM params
      |  UNION ALL
      |  SELECT w.rn - 1,
      |    least(w.g0 + abs(i.x - p.l0), w.g1 + abs(i.x - p.l1) + p.gam),
      |    least(w.g1 + abs(i.x - p.l1), w.g0 + abs(i.x - p.l0) + p.gam)
      |  FROM bwd w JOIN idx i ON i.rn = w.rn, params p
      |  WHERE w.rn > 1),
      |states AS (
      |  SELECT i.rn, i.h, i.x,
      |    f.f0 + b.g0 AS c0, f.f1 + b.g1 AS c1,
      |    CASE WHEN f.f1 + b.g1 < f.f0 + b.g0 THEN 1 ELSE 0 END AS state,
      |    (SELECT least(f0, f1) FROM fwd
      |     WHERE rn = (SELECT t_n FROM params)) AS path_cost
      |  FROM idx i JOIN fwd f ON f.rn = i.rn JOIN bwd b ON b.rn = i.rn)""".stripMargin

  /** Maximum burst window (Bentley's max-subarray, CACM 1984) of each
    * event type's m0-centered hourly series: the contiguous hour span
    * [bl, br] maximizing Σ(x_t − m0) over the gap-filled calendar grid
    * (m0 = Σx DIV n, the [[Autoregression]] centering) — the single
    * strongest sustained burst, where [[viterbiBursts]] extracts ALL
    * bursts under a switch-cost model.
    *
    * Decoded RELATIONALLY via prefix sums rather than the sequential
    * Kadane recurrence: with cum_t the running sum of residuals,
    *
    *   best = max_t ( cum_t − min_{k < t} cum_k ),   cum_{first−1} = 0
    *
    * so the whole decode is two windows (a running sum and a running
    * struct-min) plus one struct-min aggregate — no fold, no recursion,
    * and the windows run over the calendar-bounded per-type grid. Tie
    * rules are canonical and engine-identical: the running min carries
    * (cum, k) so equal minima resolve to the EARLIEST k (⇒ minimal
    * window start), and the final argmax over t picks the lexicographic
    * min of (−sum, l, r) (⇒ max sum, then min start, then min end). All
    * integer arithmetic; window bounds are epoch hours.
    *
    * (A DuckDB list_reduce spelling of the associative Kadane monoid was
    * rejected: DuckDB evaluates a reduce lambda's struct-literal fields
    * SEQUENTIALLY against an in-place accumulator, so later fields read
    * already-updated values — the prefix-sum form has no such hazard and
    * is the better distributed plan anyway.)
    *
    * Scale: corpus reduces to the calendar grid in one map-side-combined
    * aggregate (the [[viterbiBursts]] shape); both windows are per-type
    * partitions bounded by the calendar, never corpus rows.
    */
  def maxBurstWindow(events: DataFrame): DataFrame = {
    val counts = events
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("x"))
    val spans = counts
      .groupBy(col("event_type"))
      .agg(min(col("h")).as("min_h"), max(col("h")).as("max_h"))
    val grid = spans
      .select(col("event_type"),
        explode(expr("sequence(min_h, max_h, interval 1 hour)")).as("h"))
    val gf = grid
      .join(counts, Seq("event_type", "h"), "left")
      .select(col("event_type"),
        expr("unix_timestamp(h) DIV 3600").as("t"),
        coalesce(col("x"), lit(0L)).as("x"))
    val base = gf
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"))
      .withColumn("m0", expr("sx DIV n"))
    val byT = Window.partitionBy(col("event_type")).orderBy(col("t"))
    val scored = gf
      .join(base, Seq("event_type"))
      .withColumn("e", col("x") - col("m0"))
      .withColumn("cum", sum(col("e")).over(byT))
      .withColumn("pm", min(struct(col("cum").as("c"), col("t").as("k")))
        .over(byT.rowsBetween(Window.unboundedPreceding, -1)))
      // cum_{first-1} = 0 at k = first−1 (the empty prefix) is a legal
      // cut for EVERY row, not just the first: fold the virtual cut
      // (0, first_t−1) into the running min so a window starting at the
      // first grid hour is still found when later prefix cums are all
      // positive. Lexicographic least keeps the earliest-k tie rule
      // (the virtual cut has the smallest k, so a 0-valued min resolves
      // to it — same tie outcome as a materialized cum_{first-1} row).
      .withColumn("ft", min(col("t"))
        .over(Window.partitionBy(col("event_type"))))
      .withColumn("pm2", {
        val virt = struct(lit(0L).as("c"), (col("ft") - 1L).as("k"))
        least(coalesce(col("pm"), virt), virt)
      })
      .withColumn("s", col("cum") - col("pm2.c"))
      .withColumn("l", col("pm2.k") + 1L)
    scored
      .groupBy(col("event_type"), col("n"), col("m0"))
      .agg(min(struct((-col("s")).as("ns"), col("l").as("l"),
        col("t").as("r"))).as("b"))
      .select(col("event_type"), col("n").as("n_hours"), col("m0"),
        (-col("b.ns")).as("best_sum"),
        col("b.l").as("burst_start_epoch_hour"),
        col("b.r").as("burst_end_epoch_hour"),
        (col("b.r") - col("b.l") + 1L).as("burst_hours"))
      .orderBy(col("event_type"))
  }

  def maxBurstWindowOracleSql: String =
    """WITH counts AS (
      |  SELECT event_type, date_trunc('hour', ts) AS h,
      |    CAST(count(*) AS BIGINT) AS x
      |  FROM events GROUP BY 1, 2),
      |spans AS (SELECT event_type, min(h) AS min_h, max(h) AS max_h
      |  FROM counts GROUP BY 1),
      |grid AS (SELECT s.event_type,
      |    unnest(generate_series(s.min_h, s.max_h, INTERVAL 1 HOUR)) AS h
      |  FROM spans s),
      |gf AS (SELECT g.event_type,
      |    epoch(g.h)::BIGINT // 3600 AS t, COALESCE(c.x, 0) AS x
      |  FROM grid g LEFT JOIN counts c
      |    ON g.event_type = c.event_type AND g.h = c.h),
      |base AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(x) AS BIGINT) AS sx
      |  FROM gf GROUP BY 1),
      |cums AS (
      |  SELECT gf.event_type, b.n, b.sx // b.n AS m0, gf.t,
      |    CAST(sum(gf.x - b.sx // b.n) OVER (PARTITION BY gf.event_type
      |      ORDER BY gf.t ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
      |  FROM gf JOIN base b ON gf.event_type = b.event_type),
      |scored AS (
      |  SELECT event_type, n, m0, t, cum,
      |    min({'c': cum, 'k': t})
      |      OVER (PARTITION BY event_type ORDER BY t
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm,
      |    min(t) OVER (PARTITION BY event_type) AS ft
      |  FROM cums),
      |cand AS (
      |  SELECT event_type, n, m0,
      |    cum - (pm2).c AS s,
      |    (pm2).k + 1 AS l, t AS r
      |  FROM (
      |    SELECT *, (list_sort([
      |        COALESCE(pm, {'c': CAST(0 AS BIGINT), 'k': ft - 1}),
      |        {'c': CAST(0 AS BIGINT), 'k': ft - 1}]))[1] AS pm2
      |    FROM scored)),
      |best AS (
      |  SELECT event_type, n, m0,
      |    min({'ns': -s, 'l': l, 'r': r}) AS b
      |  FROM cand GROUP BY 1, 2, 3)
      |SELECT event_type, n AS n_hours, m0,
      |  CAST(-((b).ns) AS BIGINT) AS best_sum,
      |  CAST((b).l AS BIGINT) AS burst_start_epoch_hour,
      |  CAST((b).r AS BIGINT) AS burst_end_epoch_hour,
      |  CAST((b).r - (b).l + 1 AS BIGINT) AS burst_hours
      |FROM best ORDER BY event_type""".stripMargin
}
