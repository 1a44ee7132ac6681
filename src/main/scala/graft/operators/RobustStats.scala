package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Robust location/trend statistics — the outlier-resistant siblings of
  * `value_moments` (exact moments) and `ols_trend` (L2 slope):
  * 10%-trimmed and winsorized segment means, and the Theil-Sen median
  * slope over the hourly volume series. All integer-exact: cents fixed
  * point, rank-based boundaries, sign-separated floor division for
  * negative quotients (Spark DIV truncates where DuckDB `//` floors).
  */
object RobustStats {

  /** Per-mktsegment 10% two-sided trimmed and winsorized means of order
    * totals. Ranks WITHIN each segment derive from ONE global
    * [[DistributedRank]] total order (segment, cents, tiebreakers) minus
    * a per-segment offset — a `Window.partitionBy(segment)` would push
    * each segment's full row set through a single task (5 segments = 5
    * straggler tasks at warehouse scale); the ranged rank keeps every
    * partition parallel. Caller releases the pinned frame via
    * DistributedRank.release (Verify/Bench already do).
    *
    * trimmed = mean of ranks (t, n−t]; winsorized = same sum with the t
    * lowest replaced by the (t+1)-th value and the t highest by the
    * (n−t)-th, t = n DIV 10. Means are dollar-micros via integral DIV.
    */
  def trimmedMeans(orders: DataFrame, customer: DataFrame): DataFrame = {
    val cents = graft.queries.Analytics.centsOf(col("o_totalprice"))
      .cast("long")
    val vals = orders.join(customer,
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("seg"), cents.as("v"),
        col("o_orderkey"))
    val ranked = DistributedRank.withGlobalRank(
      vals, Seq(col("seg"), col("v"), col("o_orderkey")), "gr")
    val offs = ranked.groupBy(col("seg"))
      .agg(min(col("gr")).as("off"), count(lit(1)).as("n"))
    val local = ranked.join(broadcast(offs), Seq("seg"))
      .withColumn("lr", col("gr") - col("off") + 1L)
      .withColumn("t", expr("n DIV 10"))
    local
      .groupBy(col("seg"))
      .agg(
        first(col("n")).as("n"),
        first(col("t")).as("t"),
        sum(when(col("lr") > col("t") && col("lr") <= col("n") - col("t"),
          col("v")).otherwise(lit(0L))).cast("decimal(38,0)").as("s_kept"),
        max(when(col("lr") === col("t") + 1L, col("v"))).as("lo_cents"),
        max(when(col("lr") === col("n") - col("t"), col("v")))
          .as("hi_cents"))
      .select(
        col("seg"), col("n"), col("t"), col("lo_cents"), col("hi_cents"),
        expr("cast((s_kept * 10000) DIV (n - 2 * t) as bigint)")
          .as("trimmed_mean_micros"),
        expr("""cast(((s_kept + cast(t as decimal(38,0)) * lo_cents
               |       + cast(t as decimal(38,0)) * hi_cents) * 10000)
               |  DIV n as bigint)""".stripMargin)
          .as("winsor_mean_micros"))
      .orderBy(col("seg"))
  }

  def trimmedMeansOracleSql: String =
    """WITH v AS (
      |  SELECT c_mktsegment AS seg,
      |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v,
      |    o_orderkey
      |  FROM orders JOIN customer ON o_custkey = c_custkey),
      |r AS (
      |  SELECT seg, v,
      |    row_number() OVER (PARTITION BY seg ORDER BY v, o_orderkey)
      |      AS lr,
      |    count(*) OVER (PARTITION BY seg) AS n
      |  FROM v),
      |g AS (
      |  SELECT seg, CAST(any_value(n) AS BIGINT) AS n,
      |    CAST(any_value(n) // 10 AS BIGINT) AS t,
      |    CAST(sum(CASE WHEN lr > n // 10 AND lr <= n - n // 10
      |      THEN v ELSE 0 END) AS HUGEINT) AS s_kept,
      |    max(CASE WHEN lr = n // 10 + 1 THEN v END) AS lo_cents,
      |    max(CASE WHEN lr = n - n // 10 THEN v END) AS hi_cents
      |  FROM r GROUP BY seg)
      |SELECT seg, n, t, lo_cents, hi_cents,
      |  CAST((s_kept * 10000) // (n - 2 * t) AS BIGINT)
      |    AS trimmed_mean_micros,
      |  CAST(((s_kept + CAST(t AS HUGEINT) * lo_cents
      |         + CAST(t AS HUGEINT) * hi_cents) * 10000) // n AS BIGINT)
      |    AS winsor_mean_micros
      |FROM g ORDER BY seg""".stripMargin

  /** Theil-Sen estimator (Theil 1950; Sen, JASA 1968) of the hourly
    * event-volume trend: the LOWER MEDIAN of all pairwise slopes
    * (y_j−y_i)/(j−i) over the hour index, in floor-micros with
    * sign-separated division. Robust to the volume spikes that drag
    * `ols_trend`'s L2 fit.
    *
    * Scale: the corpus folds to the hourly frame in one scan; the O(H²)
    * pair frame is bounded by the observation window's hour count
    * squared (time-domain bounded, never row-count bounded), and the
    * median is a rank over that bounded frame via [[DistributedRank]]
    * (caller releases).
    */
  def theilSen(events: DataFrame): DataFrame = {
    val hourly = events
      .groupBy(date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("y"))
      .select(col("h"), col("y"))
    // hour index via epoch-hour delta from the window start: exact,
    // rank-free, identical in SQL
    val based = hourly
      .crossJoin(broadcast(hourly.agg(min(col("h")).as("h0"))))
      .select(
        (unix_timestamp(col("h")) - unix_timestamp(col("h0")))
          .cast("long").as("secs"),
        col("y"))
      .select(expr("secs DIV 3600").as("i"), col("y"))
    val a = based.select(col("i").as("i1"), col("y").as("y1"))
    val b = based.select(col("i").as("i2"), col("y").as("y2"))
    val pairs = a.join(b, col("i2") > col("i1"))
      .select(
        (col("y2") - col("y1")).as("dy"),
        (col("i2") - col("i1")).as("dx"))
      .select(
        when(col("dy") >= 0L, expr("(dy * 1000000) DIV dx"))
          .otherwise(-expr("((-dy) * 1000000) DIV dx"))
          .cast("long").as("slope_micros"))
    // ties make the rank assignment among EQUAL slopes arbitrary, but the
    // k-th smallest VALUE is invariant to it — no tiebreaker needed
    val ranked = DistributedRank.withGlobalRank(
      pairs, Seq(col("slope_micros")), "r")
    val cnt = pairs.agg(count(lit(1)).as("n_pairs"))
    ranked.crossJoin(broadcast(cnt))
      .filter(col("r") === expr("(n_pairs + 1) DIV 2"))
      .select(col("n_pairs"),
        col("slope_micros").as("slope_micros_median"))
  }

  /** Quantile treatment effects (Doksum 1974; the distributional A/B
    * readout beside the mean-shift estimators): per-variant exact
    * p25/p50/p75 of purchase cents, and the per-quantile treated−control
    * differences. Means hide heterogeneity — a lift concentrated in the
    * tail moves p75 but not p50; this shows WHERE the distribution
    * moved.
    *
    * Exactness: order statistics at rank ⌈q·n⌉ over a total order
    * (cents, event_id); all integers.
    *
    * Scale: ONE global [[DistributedRank]] over (variant, cents, id)
    * minus per-variant offsets — the [[trimmedMeans]] shape; no
    * per-variant single-task window. Caller releases.
    */
  /** Hodges–Lehmann one-sample pseudo-median (Hodges & Lehmann, Ann.
    * Math. Stat. 1963) of each event type's hourly volume: the median of
    * the N = n(n+1)/2 Walsh averages (x_i + x_j)/2, i ≤ j — the location
    * estimator dual to the Wilcoxon signed-rank test, robust to the
    * bursty tails that distort the mean.
    *
    * Exactness: the DIVISION BY 2 NEVER HAPPENS — ranks are taken over
    * the integer pair SUMS s = x_i + x_j (the k-th smallest average is
    * the k-th smallest sum halved), and the final value is emitted as
    * hl_micros = (s_low + s_high)·250000 with lowRank = (N+1) DIV 2 and
    * highRank = N DIV 2 + 1 — the usual both-middles spelling that
    * covers odd and even N in one expression, all exact longs. Ranks
    * among EQUAL sums are arbitrary, but the value AT a rank is
    * invariant to that (the [[theilSen]] argument), so no tiebreak is
    * needed. The mean rides along in micros for the robustness contrast.
    *
    * Scale: the pair frame is calendar-bounded (observed hours², ~277k
    * rows per type-year — never corpus rows) and the rank is a window
    * per type partition, the same budget [[theilSen]] already pays.
    */
  def hodgesLehmann(events: DataFrame): DataFrame = {
    val hourly = events
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("y"))
    val a = hourly.select(col("event_type"), col("h").as("h1"),
      col("y").as("y1"))
    val b = hourly.select(col("event_type"), col("h").as("h2"),
      col("y").as("y2"))
    val pairs = a.join(b, Seq("event_type"))
      .filter(col("h2") >= col("h1"))
      .select(col("event_type"), (col("y1") + col("y2")).as("s"))
    val byS = Window.partitionBy(col("event_type")).orderBy(col("s"))
    val ranked = pairs
      .withColumn("rk", row_number().over(byS).cast("long"))
    val sizes = hourly
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_hours"), sum(col("y")).as("sy"))
      .withColumn("n_pairs",
        expr("n_hours * (n_hours + 1) DIV 2"))
    ranked
      .join(sizes, Seq("event_type"))
      .filter(col("rk") === expr("(n_pairs + 1) DIV 2") ||
        col("rk") === expr("n_pairs DIV 2 + 1"))
      .groupBy(col("event_type"))
      .agg(
        first(col("n_hours")).as("n_hours"),
        first(col("n_pairs")).as("n_pairs"),
        // odd N: both ranks coincide on one row — sum(s)·2 keeps the
        // (s_low + s_high) contract without a special case
        (when(count(lit(1)) === 1, sum(col("s")) * 2L)
          .otherwise(sum(col("s"))) * 250000L).as("hl_micros"),
        first(expr("(sy * 1000000) DIV n_hours")).as("mean_micros"))
      .orderBy(col("event_type"))
  }

  def hodgesLehmannOracleSql: String =
    """WITH hourly AS (
      |  SELECT event_type, date_trunc('hour', ts) AS h,
      |    CAST(count(*) AS BIGINT) AS y
      |  FROM events GROUP BY 1, 2),
      |pairs AS (
      |  SELECT a.event_type, a.y + b.y AS s
      |  FROM hourly a JOIN hourly b
      |    ON a.event_type = b.event_type AND b.h >= a.h),
      |ranked AS (
      |  SELECT event_type, s,
      |    CAST(row_number() OVER (PARTITION BY event_type ORDER BY s)
      |      AS BIGINT) AS rk
      |  FROM pairs),
      |sizes AS (
      |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_hours,
      |    CAST(sum(y) AS BIGINT) AS sy,
      |    CAST(count(*) * (count(*) + 1) // 2 AS BIGINT) AS n_pairs
      |  FROM hourly GROUP BY 1)
      |SELECT r.event_type,
      |  any_value(z.n_hours) AS n_hours,
      |  any_value(z.n_pairs) AS n_pairs,
      |  CAST(CASE WHEN count(*) = 1 THEN sum(r.s) * 2
      |       ELSE sum(r.s) END * 250000 AS BIGINT) AS hl_micros,
      |  CAST(any_value((z.sy * 1000000) // z.n_hours) AS BIGINT)
      |    AS mean_micros
      |FROM ranked r JOIN sizes z ON r.event_type = z.event_type
      |WHERE r.rk = (z.n_pairs + 1) // 2 OR r.rk = z.n_pairs // 2 + 1
      |GROUP BY r.event_type
      |ORDER BY r.event_type""".stripMargin

  /** Quantile treatment effects (Doksum 1974; the distributional A/B
    * readout beside the mean-shift estimators): per-variant exact
    * p25/p50/p75 of purchase cents, and the per-quantile treated−control
    * differences. Means hide heterogeneity — a lift concentrated in the
    * tail moves p75 but not p50; this shows WHERE the distribution
    * moved.
    *
    * Exactness: order statistics at rank ⌈q·n⌉ over a total order
    * (cents, event_id); all integers.
    *
    * Scale: ONE global [[DistributedRank]] over (variant, cents, id)
    * minus per-variant offsets — the [[trimmedMeans]] shape; no
    * per-variant single-task window. Caller releases.
    */
  def qteQuartiles(events: DataFrame): DataFrame = {
    val obs = events
      .filter(col("event_type") === "purchase" && col("value").isNotNull)
      .select(
        pmod(col("user_id"), lit(2)).cast("int").as("v"),
        (col("value").cast("decimal(18,2)") * 100).cast("bigint")
          .as("cents"),
        col("event_id"))
    val ranked = DistributedRank.withGlobalRank(
      obs, Seq(col("v"), col("cents"), col("event_id")), "gr")
    val offs = ranked.groupBy(col("v"))
      .agg(min(col("gr")).as("off"), count(lit(1)).as("n"))
    val local = ranked.join(broadcast(offs), Seq("v"))
      .withColumn("lr", col("gr") - col("off") + 1L)
    // k_q = ceil(q·n) = (q_num·n + q_den − 1) DIV q_den
    def pick(qNum: Int, qDen: Int, name: String) =
      max(when(col("lr") ===
        expr(s"($qNum * n + ${qDen - 1}) DIV $qDen"), col("cents")))
        .as(name)
    val byV = local.groupBy(col("v"))
      .agg(first(col("n")).as("n"),
        pick(1, 4, "p25_cents"), pick(1, 2, "p50_cents"),
        pick(3, 4, "p75_cents"))
    val c = byV.filter(col("v") === 0)
      .select(col("n").as("n0"), col("p25_cents").as("c25"),
        col("p50_cents").as("c50"), col("p75_cents").as("c75"))
    val t = byV.filter(col("v") === 1)
      .select(col("n").as("n1"), col("p25_cents").as("t25"),
        col("p50_cents").as("t50"), col("p75_cents").as("t75"))
    t.crossJoin(broadcast(c))
      .select(col("n0"), col("n1"),
        col("c25"), col("t25"), (col("t25") - col("c25")).as("qte25_cents"),
        col("c50"), col("t50"), (col("t50") - col("c50")).as("qte50_cents"),
        col("c75"), col("t75"), (col("t75") - col("c75")).as("qte75_cents"))
  }

  def qteOracleSql: String =
    """WITH obs AS (
      |  SELECT CAST(user_id % 2 AS INTEGER) AS v,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
      |    event_id
      |  FROM events WHERE event_type = 'purchase' AND value IS NOT NULL),
      |r AS (
      |  SELECT v, cents,
      |    row_number() OVER (PARTITION BY v ORDER BY cents, event_id)
      |      AS lr,
      |    count(*) OVER (PARTITION BY v) AS n
      |  FROM obs),
      |byv AS (
      |  SELECT v, CAST(any_value(n) AS BIGINT) AS n,
      |    max(CASE WHEN lr = (1 * n + 3) // 4 THEN cents END) AS p25,
      |    max(CASE WHEN lr = (1 * n + 1) // 2 THEN cents END) AS p50,
      |    max(CASE WHEN lr = (3 * n + 3) // 4 THEN cents END) AS p75
      |  FROM r GROUP BY v)
      |SELECT c.n AS n0, t.n AS n1,
      |  c.p25 AS c25, t.p25 AS t25, t.p25 - c.p25 AS qte25_cents,
      |  c.p50 AS c50, t.p50 AS t50, t.p50 - c.p50 AS qte50_cents,
      |  c.p75 AS c75, t.p75 AS t75, t.p75 - c.p75 AS qte75_cents
      |FROM byv t, byv c WHERE t.v = 1 AND c.v = 0""".stripMargin

  /** Spearman rank correlation between per-user engagement (event
    * count) and spend (purchase cents) — the monotone-association
    * screen run before trusting a linear correlation
    * (`price_qty_corr`'s Pearson assumes linearity). Tie-free total
    * order by (metric, user_id), documented: with heavy ties the
    * midrank correction matters; here the rank axes are made total the
    * same way both engines, so ρ = 1 − 6Σd²/(n(n²−1)) is EXACT
    * integer arithmetic end-to-end, emitted in micros (sign-separated
    * floor).
    *
    * Scale: two ranged ranks over the per-user frame + one scalar agg.
    */
  def spearmanEngagementSpend(events: DataFrame): DataFrame = {
    val perUser = events
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("eng"),
        sum(when(col("event_type") === "purchase",
          (col("value").cast("decimal(18,2)") * 100).cast("bigint"))
          .otherwise(lit(0L))).as("spend"))
    val r1 = DistributedRank.withGlobalRank(
      perUser, Seq(col("eng"), col("user_id")), "ra")
    val r2 = DistributedRank.withGlobalRank(
      r1, Seq(col("spend"), col("user_id")), "rb")
    val agg = r2.agg(
      count(lit(1)).cast("decimal(38,0)").as("n"),
      sum((col("ra") - col("rb")).cast("decimal(38,0)") *
        (col("ra") - col("rb"))).cast("decimal(38,0)").as("sd2"))
    agg.select(
      col("n").cast("bigint").as("n_users"),
      col("sd2").cast("bigint").as("sum_d2"),
      // rho·10^6 = 10^6 − (6·Σd²·10^6 DIV n(n²−1)): the subtrahend is
      // non-negative, so one floor DIV keeps both engines identical
      when(col("n") > 1,
        lit(1000000L) - expr(
          "cast((6 * sd2 * 1000000) DIV (n * (n * n - 1)) as bigint)"))
        .as("rho_micros"))
  }

  def spearmanOracleSql: String =
    """WITH pu AS (
      |  SELECT user_id, CAST(count(*) AS BIGINT) AS eng,
      |    CAST(sum(CASE WHEN event_type = 'purchase'
      |      THEN CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
      |      ELSE 0 END) AS BIGINT) AS spend
      |  FROM events GROUP BY user_id),
      |r AS (
      |  SELECT user_id,
      |    row_number() OVER (ORDER BY eng, user_id) AS ra,
      |    row_number() OVER (ORDER BY spend, user_id) AS rb
      |  FROM pu),
      |agg AS (
      |  SELECT CAST(count(*) AS HUGEINT) AS n,
      |    CAST(sum(CAST(ra - rb AS HUGEINT) * (ra - rb)) AS HUGEINT)
      |      AS sd2
      |  FROM r)
      |SELECT CAST(n AS BIGINT) AS n_users,
      |  CAST(sd2 AS BIGINT) AS sum_d2,
      |  CASE WHEN n > 1 THEN
      |    1000000 - CAST((6 * sd2 * 1000000) // (n * (n * n - 1))
      |      AS BIGINT)
      |  END AS rho_micros
      |FROM agg""".stripMargin

  def theilSenOracleSql: String =
    """WITH hourly AS (
      |  SELECT date_trunc('hour', ts) AS h, CAST(count(*) AS BIGINT) AS y
      |  FROM events GROUP BY 1),
      |based AS (
      |  SELECT date_diff('second', (SELECT min(h) FROM hourly), h) // 3600
      |    AS i, y
      |  FROM hourly),
      |pairs AS (
      |  SELECT CASE WHEN (b.y - a.y) >= 0
      |      THEN ((b.y - a.y) * 1000000) // (b.i - a.i)
      |      ELSE -((-(b.y - a.y) * 1000000) // (b.i - a.i)) END
      |    AS slope_micros
      |  FROM based a JOIN based b ON b.i > a.i),
      |r AS (
      |  SELECT slope_micros, row_number() OVER (ORDER BY slope_micros)
      |      AS r,
      |    count(*) OVER () AS n_pairs
      |  FROM pairs)
      |SELECT CAST(n_pairs AS BIGINT) AS n_pairs,
      |  CAST(slope_micros AS BIGINT) AS slope_micros_median
      |FROM r WHERE r = (n_pairs + 1) // 2""".stripMargin

  /** Exact Kendall tau-b (Kendall, Biometrika 1938) between hourly event
    * volume and hourly purchase spend — [[spearmanEngagementSpend]]'s
    * pair-counting sibling: Spearman squares rank gaps (sensitive to a
    * few large displacements), tau counts pairwise order agreements
    * (each pair votes once), so the two together distinguish "a few
    * hours wildly reordered" from "many hours slightly reordered".
    *
    * Exactness: concordant / discordant / tie counts are pure integer
    * comparisons; tau_b = (C−D)/√((n0−n1)(n0−n2)) is one identically
    * spelled floor((·)·10⁶/sqrt(·)) on exact-below-2^53 operands.
    *
    * Scale: the corpus reduces to the TIME-DOMAIN-BOUNDED hourly frame
    * (30 days = 720 rows however large the input); the pair join is
    * hour²-bounded — the same discipline as [[theilSen]], never a
    * data-sized product. (The O(n log n) merge-inversion formulation
    * only matters when the frame itself grows with the data.)
    */
  def kendallTau(events: DataFrame): DataFrame = {
    val hourly = events
      .groupBy(date_trunc("hour", col("ts")).as("h"))
      .agg(
        count(lit(1)).as("x"),
        sum(when(col("event_type") === "purchase",
          (col("value").cast("decimal(18,2)") * 100).cast("bigint"))
          .otherwise(lit(0L))).as("y"))
    val a = hourly.select(col("h").as("h1"), col("x").as("x1"),
      col("y").as("y1"))
    val b = hourly.select(col("h").as("h2"), col("x").as("x2"),
      col("y").as("y2"))
    val counted = a.join(b, col("h2") > col("h1"))
      .agg(
        sum(when((col("x2") - col("x1")) * (col("y2") - col("y1")) > 0, 1L)
          .otherwise(0L)).as("concordant"),
        sum(when((col("x2") - col("x1")) * (col("y2") - col("y1")) < 0, 1L)
          .otherwise(0L)).as("discordant"),
        sum(when(col("x1") === col("x2") && col("y1") =!= col("y2"), 1L)
          .otherwise(0L)).as("ties_x"),
        sum(when(col("y1") === col("y2") && col("x1") =!= col("x2"), 1L)
          .otherwise(0L)).as("ties_y"),
        sum(when(col("x1") === col("x2") && col("y1") === col("y2"), 1L)
          .otherwise(0L)).as("ties_both"))
    val n = hourly.agg(count(lit(1)).as("n_hours"))
    counted.crossJoin(broadcast(n))
      .withColumn("n0", expr("n_hours * (n_hours - 1) DIV 2"))
      .withColumn("n1", col("ties_x") + col("ties_both"))
      .withColumn("n2", col("ties_y") + col("ties_both"))
      .select(
        col("n_hours"), col("concordant"), col("discordant"),
        col("ties_x"), col("ties_y"), col("ties_both"),
        when(col("n0") > col("n1") && col("n0") > col("n2"),
          expr("cast(floor((concordant - discordant) * 1000000.0" +
            " / sqrt(cast((n0 - n1) * (n0 - n2) as double))) as bigint)"))
          .as("tau_b_micros"))
  }

  /** Mann-Kendall trend test (Mann, Econometrica 1945; Kendall 1975) on
    * the hourly volume series — [[theilSen]]'s significance companion
    * (the pair: Theil-Sen says HOW STEEP, Mann-Kendall says WHETHER the
    * monotone trend is real): S = Σ_{i<j} sign(x_j − x_i), the
    * tie-corrected variance 18·Var(S) = n(n−1)(2n+5) − Σ_t t(t−1)(2t+5),
    * and the continuity-corrected Z.
    *
    * Exactness: S and the variance numerator are pure integer folds; Z
    * is one identically spelled floor((S∓1)·10⁶/sqrt(num/18.0)). The
    * verdict threshold is 1.96 in micros.
    *
    * Scale: the same hour²-bounded pair frame as [[kendallTau]] — the
    * corpus reduces to ≤ |hours| rows before any join.
    */
  def mannKendall(events: DataFrame): DataFrame = {
    val hourly = events
      .groupBy(date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("x"))
    val a = hourly.select(col("h").as("h1"), col("x").as("x1"))
    val b = hourly.select(col("h").as("h2"), col("x").as("x2"))
    val s = a.join(b, col("h2") > col("h1"))
      .agg(sum(signum(col("x2") - col("x1")).cast("bigint")).as("s"))
    val nn = hourly.agg(count(lit(1)).as("n"))
    val ties = hourly.groupBy(col("x")).agg(count(lit(1)).as("t"))
      .agg(coalesce(sum(
        expr("t * (t - 1) * (2 * t + 5)")), lit(0L)).as("tie_term"))
    s.crossJoin(broadcast(nn)).crossJoin(broadcast(ties))
      .withColumn("var18",
        expr("n * (n - 1) * (2 * n + 5) - tie_term"))
      .select(
        col("n").as("n_hours"), col("s"), col("var18"),
        when(col("var18") > 0,
          when(col("s") > 0, expr(
            "cast(floor((s - 1) * 1000000.0" +
              " / sqrt(cast(var18 as double) / 18.0)) as bigint)"))
            .when(col("s") < 0, expr(
              "cast(floor((s + 1) * 1000000.0" +
                " / sqrt(cast(var18 as double) / 18.0)) as bigint)"))
            .otherwise(lit(0L))).as("z_micros"))
      .withColumn("trend",
        when(col("z_micros") > 1960000L, "increasing")
          .when(col("z_micros") < -1960000L, "decreasing")
          .otherwise(lit("none")))
  }

  def mannKendallOracleSql: String =
    """WITH hourly AS (
      |  SELECT date_trunc('hour', ts) AS h, CAST(count(*) AS BIGINT) AS x
      |  FROM events GROUP BY 1),
      |sv AS (
      |  SELECT CAST(sum(CASE WHEN b.x > a.x THEN 1
      |    WHEN b.x < a.x THEN -1 ELSE 0 END) AS BIGINT) AS s
      |  FROM hourly a JOIN hourly b ON b.h > a.h),
      |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM hourly),
      |tt AS (
      |  SELECT CAST(COALESCE(sum(t * (t - 1) * (2 * t + 5)), 0) AS BIGINT)
      |    AS tie_term
      |  FROM (SELECT CAST(count(*) AS BIGINT) AS t FROM hourly
      |        GROUP BY x)),
      |fin AS (
      |  SELECT n, s, tie_term,
      |    n * (n - 1) * (2 * n + 5) - tie_term AS var18
      |  FROM sv, nn, tt),
      |zz AS (
      |  SELECT n, s, var18,
      |    CASE WHEN var18 > 0 THEN
      |      CASE WHEN s > 0 THEN
      |        CAST(floor((s - 1) * 1000000.0
      |          / sqrt(CAST(var18 AS DOUBLE) / 18.0)) AS BIGINT)
      |      WHEN s < 0 THEN
      |        CAST(floor((s + 1) * 1000000.0
      |          / sqrt(CAST(var18 AS DOUBLE) / 18.0)) AS BIGINT)
      |      ELSE 0 END
      |    END AS z_micros
      |  FROM fin)
      |SELECT n AS n_hours, s, var18, z_micros,
      |  CASE WHEN z_micros > 1960000 THEN 'increasing'
      |    WHEN z_micros < -1960000 THEN 'decreasing'
      |    ELSE 'none' END AS trend
      |FROM zz""".stripMargin

  def kendallTauOracleSql: String =
    """WITH hourly AS (
      |  SELECT date_trunc('hour', ts) AS h,
      |    CAST(count(*) AS BIGINT) AS x,
      |    CAST(sum(CASE WHEN event_type = 'purchase'
      |      THEN CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
      |      ELSE 0 END) AS BIGINT) AS y
      |  FROM events GROUP BY 1),
      |cnts AS (
      |  SELECT
      |    CAST(sum(CASE WHEN (b.x - a.x) * (b.y - a.y) > 0 THEN 1
      |      ELSE 0 END) AS BIGINT) AS concordant,
      |    CAST(sum(CASE WHEN (b.x - a.x) * (b.y - a.y) < 0 THEN 1
      |      ELSE 0 END) AS BIGINT) AS discordant,
      |    CAST(sum(CASE WHEN a.x = b.x AND a.y <> b.y THEN 1
      |      ELSE 0 END) AS BIGINT) AS ties_x,
      |    CAST(sum(CASE WHEN a.y = b.y AND a.x <> b.x THEN 1
      |      ELSE 0 END) AS BIGINT) AS ties_y,
      |    CAST(sum(CASE WHEN a.x = b.x AND a.y = b.y THEN 1
      |      ELSE 0 END) AS BIGINT) AS ties_both
      |  FROM hourly a JOIN hourly b ON b.h > a.h),
      |nn AS (SELECT CAST(count(*) AS BIGINT) AS n_hours FROM hourly),
      |fin AS (
      |  SELECT n_hours, concordant, discordant, ties_x, ties_y,
      |    ties_both,
      |    n_hours * (n_hours - 1) // 2 AS n0,
      |    ties_x + ties_both AS n1,
      |    ties_y + ties_both AS n2
      |  FROM cnts, nn)
      |SELECT n_hours, concordant, discordant, ties_x, ties_y, ties_both,
      |  CASE WHEN n0 > n1 AND n0 > n2 THEN
      |    CAST(floor((concordant - discordant) * 1000000.0
      |      / sqrt(CAST((n0 - n1) * (n0 - n2) AS DOUBLE))) AS BIGINT)
      |  END AS tau_b_micros
      |FROM fin""".stripMargin
}
