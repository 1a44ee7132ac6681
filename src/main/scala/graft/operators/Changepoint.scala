package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CUSUM changepoint detection (Page, Biometrika 1954) over per-key hourly
  * count series: the control chart a pipeline runs on its own ingest
  * volumes to catch level shifts that per-point z-scores miss. Two-sided:
  * S⁺_t = max(0, S⁺_{t-1} + (x_t − μ − k)), S⁻_t = min(0, S⁻_{t-1} +
  * (x_t − μ + k)), alarm when |S| exceeds h; μ/σ come from a baseline
  * window, with the standard k = σ/2 slack and h = 4σ threshold.
  *
  * Why this shape: CUSUM is inherently SEQUENTIAL — it is not a window
  * aggregate (the max/min clamp makes it non-associative), so it cannot
  * be a plain `sum() OVER ()`. The scale-safe formulation is: reduce the
  * corpus to the per-key hourly count frame (ONE shuffle, map-side
  * combine; the frame is TIME-DOMAIN-bounded — hours×keys, independent
  * of corpus row count), then fold each key's series with the
  * higher-order `aggregate` over a `sort_array`-ordered collect_list.
  * The per-key series length is bounded by the calendar, not the data,
  * so the O(len²) array-append fold is a few hundred thousand tiny
  * copies — never a corpus-scale operation. At 100 TB the only
  * full-data pass is the initial count.
  *
  * The DuckDB oracle replays the same fold as a RECURSIVE CTE walking
  * rn→rn+1 per key — an independent sequential formulation, so the
  * clamp arithmetic (exact-long deviations, identically-spelled μ/σ/k/h
  * doubles) is cross-checked step by step.
  *
  * Series are folded over OBSERVED hours only (an empty hour contributes
  * no step); both engines derive the series from the same hourly frame,
  * and the harness generator emits events every hour.
  */
object Changepoint {

  def cusumChangepoints(events: DataFrame,
      baselineEnd: String = "2024-01-08 00:00:00"): DataFrame = {
    val hourly = events
      .groupBy(col("event_type"),
        date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("x"))
    // Baseline μ/σ from exact long sums (sum, sumsq), spelled identically
    // in the oracle — NOT stddev_samp, whose single-pass formulation
    // differs across engines in the last ulps.
    val base = hourly
      .filter(col("h") < to_timestamp(lit(baselineEnd)))
      .groupBy(col("event_type"))
      .agg(
        sum(col("x")).as("s1"),
        sum(col("x") * col("x")).as("s2"),
        count(lit(1)).as("n"))
      // a type with a single baseline hour has no sample variance:
      // (n-1) = 0 would make sigma NaN and every comparison against it
      // meaningless — such types are excluded from the chart (same
      // guard as overdispersionCheck; mirrored as HAVING in the oracle)
      .filter(col("n") > 1L)
      .select(
        col("event_type"),
        (col("s1").cast("double") / col("n").cast("double")).as("mu"),
        sqrt((col("s2").cast("double") -
          col("s1").cast("double") * col("s1").cast("double") /
            col("n").cast("double")) /
          (col("n") - lit(1)).cast("double")).as("sigma"))
    val folded = hourly
      .join(broadcast(base), Seq("event_type"))
      .groupBy(col("event_type"), col("mu"), col("sigma"))
      .agg(sort_array(collect_list(struct(col("h"), col("x")))).as("xs"))
      .withColumn("steps", expr(
        """aggregate(
          |  xs,
          |  struct(cast(array() as array<struct<h timestamp, x bigint,
          |                                      sp double, sn double>>) as out,
          |         cast(0.0 as double) as sp, cast(0.0 as double) as sn),
          |  (acc, e) -> struct(
          |    concat(acc.out, array(named_struct(
          |      'h', e.h, 'x', e.x,
          |      'sp', greatest(cast(0.0 as double),
          |               acc.sp + (cast(e.x as double) - mu - sigma * 0.5)),
          |      'sn', least(cast(0.0 as double),
          |            acc.sn + (cast(e.x as double) - mu + sigma * 0.5))))),
          |    greatest(cast(0.0 as double),
          |             acc.sp + (cast(e.x as double) - mu - sigma * 0.5)),
          |    least(cast(0.0 as double),
          |          acc.sn + (cast(e.x as double) - mu + sigma * 0.5))),
          |  acc -> acc.out)""".stripMargin))
    folded
      .select(col("event_type"), col("mu"), col("sigma"),
        explode(col("steps")).as("st"))
      .select(
        col("event_type"),
        col("st.h").as("window_start"),
        col("st.x").as("x"),
        round(col("st.sp"), 4).as("s_pos"),
        round(col("st.sn"), 4).as("s_neg"),
        (col("st.sp") > col("sigma") * 4.0).as("alarm_pos"),
        (col("st.sn") < col("sigma") * -4.0).as("alarm_neg"))
      .orderBy(col("event_type"), col("window_start"))
  }

  /** Classical additive seasonal decomposition (the moving-average
    * method, Kendall & Stuart) of per-type hourly volumes:
    * trend = centered 25-hour moving average (NULL until the window is
    * full), seasonal = per hour-of-day mean residual, remainder = what's
    * left. The daily-rhythm baseline a volume monitor subtracts before
    * alerting.
    *
    * Exactness trick: residuals are kept as the SCALED integers
    * x·25 − Σwindow (exact longs), so the per-hour-of-day seasonal mean
    * is an exact-integer sum divided once — no unordered double
    * summation anywhere; the only floating point is three final
    * divisions on identically-derived operands.
    *
    * Scale: one corpus scan to the hourly frame; everything else runs on
    * time-domain-bounded frames (the seasonal join broadcasts a
    * |types|×24 frame).
    */
  def seasonalDecompose(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hourly = events
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("x"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("h"))
      .rowsBetween(-12, 12)
    val trended = hourly
      .withColumn("tnum0", sum(col("x")).over(w))
      .withColumn("tcnt", count(lit(1)).over(w))
      .withColumn("tnum", when(col("tcnt") === 25L, col("tnum0")))
      .withColumn("hod", hour(col("h")).cast("int"))
    val seasonal = trended
      .filter(col("tnum").isNotNull)
      .groupBy(col("event_type"), col("hod"))
      .agg(
        sum(col("x") * lit(25L) - col("tnum")).as("snum"),
        (count(lit(1)) * lit(25L)).as("sden"))
    val trend = col("tnum").cast("double") / lit(25.0)
    val seas = col("snum").cast("double") / col("sden").cast("double")
    trended
      .join(broadcast(seasonal), Seq("event_type", "hod"), "left")
      .select(
        col("event_type"), col("h").as("window_start"), col("x"),
        // Unrounded doubles from identically-spelled expressions on
        // exact-long operands: IEEE division/subtraction is correctly
        // rounded in both engines, so the bits match without round()
        // (whose decimal HALF_UP tie-breaking diverged between Spark
        // and DuckDB on ratio ties — the r8 hash mismatch).
        trend.as("trend"),
        seas.as("seasonal"),
        (col("x").cast("double") - trend - seas).as("remainder"))
      .orderBy(col("event_type"), col("window_start"))
  }

  /** DuckDB replay of [[seasonalDecompose]] (same scaled-integer
    * residuals).
    */
  def seasonalOracleSql: String =
    """WITH hourly AS (
      |  SELECT event_type, date_trunc('hour', ts) AS h,
      |    CAST(count(*) AS BIGINT) AS x
      |  FROM events GROUP BY 1, 2),
      |tr AS (
      |  SELECT event_type, h, x,
      |    CAST(sum(x) OVER w AS BIGINT) AS tnum0,
      |    CAST(count(*) OVER w AS BIGINT) AS tcnt
      |  FROM hourly
      |  WINDOW w AS (PARTITION BY event_type ORDER BY h
      |               ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)),
      |t2 AS (
      |  SELECT event_type, h, x,
      |    CASE WHEN tcnt = 25 THEN tnum0 END AS tnum,
      |    CAST(hour(h) AS INTEGER) AS hod
      |  FROM tr),
      |seas AS (
      |  SELECT event_type, hod,
      |    CAST(sum(x * 25 - tnum) AS BIGINT) AS snum,
      |    CAST(count(*) AS BIGINT) * 25 AS sden
      |  FROM t2 WHERE tnum IS NOT NULL GROUP BY 1, 2)
      |SELECT t2.event_type, t2.h AS window_start, t2.x,
      |  CAST(t2.tnum AS DOUBLE) / 25.0 AS trend,
      |  CAST(s.snum AS DOUBLE) / CAST(s.sden AS DOUBLE) AS seasonal,
      |  CAST(t2.x AS DOUBLE) - CAST(t2.tnum AS DOUBLE) / 25.0
      |    - CAST(s.snum AS DOUBLE) / CAST(s.sden AS DOUBLE)
      |    AS remainder
      |FROM t2 LEFT JOIN seas s
      |  ON s.event_type = t2.event_type AND s.hod = t2.hod
      |ORDER BY t2.event_type, window_start""".stripMargin

  /** Poisson overdispersion check of hourly volumes — the modelling
    * question behind every count-based alert threshold: is var ≈ mean
    * (Poisson-ish, z-tests valid) or var ≫ mean (bursty; use negative
    * binomial / wider bands)? Dispersion index = sample var / mean, with
    * the overdispersion VERDICT decided on cleared-denominator exact
    * integers (2·(n·SS − S²) > 3·S·(n−1) ⇔ var > 1.5·mean) so the flag
    * never rides a float comparison.
    *
    * Scale: one scan to the time-domain-bounded hourly frame; the rest
    * is a |types|-row aggregate.
    */
  def overdispersionCheck(events: DataFrame): DataFrame = {
    val hourly = events
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("x"))
    hourly
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_hours"),
        sum(col("x")).as("s"),
        sum(col("x") * col("x")).as("ss"))
      .filter(col("n_hours") > 1L)
      .select(
        col("event_type"), col("n_hours"), col("s").as("total"),
        round((col("n_hours") * col("ss") - col("s") * col("s"))
          .cast("double") /
          (col("n_hours") * (col("n_hours") - 1L)).cast("double"), 4)
          .as("var_hourly"),
        round(col("s").cast("double") / col("n_hours").cast("double"), 4)
          .as("mean_hourly"),
        (lit(2L) * (col("n_hours") * col("ss") - col("s") * col("s")) >
          lit(3L) * col("s") * (col("n_hours") - 1L)).as("overdispersed"))
      .orderBy(col("event_type"))
  }

  def overdispersionOracleSql: String =
    """WITH hourly AS (
      |  SELECT event_type, date_trunc('hour', ts) AS h,
      |    CAST(count(*) AS BIGINT) AS x
      |  FROM events GROUP BY 1, 2),
      |a AS (
      |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_hours,
      |    CAST(sum(x) AS BIGINT) AS s, CAST(sum(x*x) AS BIGINT) AS ss
      |  FROM hourly GROUP BY 1)
      |SELECT event_type, n_hours, s AS total,
      |  round(CAST(n_hours * ss - s * s AS DOUBLE)
      |    / CAST(n_hours * (n_hours - 1) AS DOUBLE), 4) AS var_hourly,
      |  round(CAST(s AS DOUBLE) / CAST(n_hours AS DOUBLE), 4)
      |    AS mean_hourly,
      |  (2 * (n_hours * ss - s * s) > 3 * s * (n_hours - 1))
      |    AS overdispersed
      |FROM a WHERE n_hours > 1 ORDER BY event_type""".stripMargin

  /** Lag-1 autocorrelation of hourly volumes per type, computed as the
    * exact Pearson correlation of consecutive-hour pairs (x_{t−1}, x_t)
    * — the "is this series momentum-driven?" diagnostic read next to
    * [[seasonalDecompose]]. Same exactness shape as
    * [[TableStats.corrMatrix]]: every moment sum is an exact long over
    * the lag-joined frame; the one float division happens on
    * identically-derived operands.
    *
    * Scale: one scan to the hourly frame; the lag join is a window over
    * the calendar-bounded per-type series.
    */
  def hourlyAutocorr(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hourly = events
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("x"))
    val lagged = hourly
      .withColumn("x_prev", lag(col("x"), 1).over(
        Window.partitionBy(col("event_type")).orderBy(col("h"))))
      .filter(col("x_prev").isNotNull)
    lagged
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("m"),
        sum(col("x")).as("sa"),
        sum(col("x_prev")).as("sb"),
        sum(col("x") * col("x")).as("saa"),
        sum(col("x_prev") * col("x_prev")).as("sbb"),
        sum(col("x") * col("x_prev")).as("sab"))
      .select(
        col("event_type"), col("m").as("n_pairs"),
        when(
          (col("m") * col("saa") - col("sa") * col("sa")) > 0L &&
            (col("m") * col("sbb") - col("sb") * col("sb")) > 0L,
          round((col("m") * col("sab") - col("sa") * col("sb")).cast("double") /
            (sqrt((col("m") * col("saa") - col("sa") * col("sa"))
              .cast("double")) *
              sqrt((col("m") * col("sbb") - col("sb") * col("sb"))
                .cast("double"))), 6)).as("acf_lag1"))
      .orderBy(col("event_type"))
  }

  def hourlyAutocorrOracleSql: String =
    """WITH hourly AS (
      |  SELECT event_type, date_trunc('hour', ts) AS h,
      |    CAST(count(*) AS BIGINT) AS x
      |  FROM events GROUP BY 1, 2),
      |lagged AS (
      |  SELECT event_type, x,
      |    lag(x) OVER (PARTITION BY event_type ORDER BY h) AS x_prev
      |  FROM hourly),
      |a AS (
      |  SELECT event_type, CAST(count(*) AS BIGINT) AS m,
      |    CAST(sum(x) AS BIGINT) AS sa, CAST(sum(x_prev) AS BIGINT) AS sb,
      |    CAST(sum(x*x) AS BIGINT) AS saa,
      |    CAST(sum(x_prev*x_prev) AS BIGINT) AS sbb,
      |    CAST(sum(x*x_prev) AS BIGINT) AS sab
      |  FROM lagged WHERE x_prev IS NOT NULL GROUP BY 1)
      |SELECT event_type, m AS n_pairs,
      |  CASE WHEN (m * saa - sa * sa) > 0 AND (m * sbb - sb * sb) > 0
      |  THEN round(CAST(m * sab - sa * sb AS DOUBLE)
      |    / (sqrt(CAST(m * saa - sa * sa AS DOUBLE))
      |       * sqrt(CAST(m * sbb - sb * sb AS DOUBLE))), 6)
      |  END AS acf_lag1
      |FROM a ORDER BY event_type""".stripMargin

  /** Holt linear (double-exponential) smoothing (Holt 1957) of hourly
    * volumes — the trend-aware forecaster between the EWMA's flat level
    * and the full seasonal decomposition: level l' = λx + (1−λ)(l+b),
    * trend b' = γ(l'−l) + (1−γ)b, one-step forecast l+b emitted beside
    * each observation, λ = 1/2 and γ = 1/4 (exact binary fractions —
    * each step is a multiply-add chain spelled identically in the
    * recursive-CTE oracle, so the doubles agree bit-for-bit). Seeds:
    * l₁ = x₁, b₁ = 0.
    *
    * Same scale shape as [[cusumChangepoints]]: the corpus reduces to
    * the time-domain-bounded hourly frame in one scan; the
    * non-associative recursion folds each key's sorted series with
    * `aggregate`.
    */
  def holtForecast(events: DataFrame): DataFrame = {
    val hourly = events
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("x"))
    val folded = hourly
      .groupBy(col("event_type"))
      .agg(sort_array(collect_list(struct(col("h"), col("x")))).as("xs"))
      .withColumn("steps", expr(
        """aggregate(
          |  slice(xs, 2, size(xs) - 1),
          |  struct(
          |    array(named_struct(
          |      'h', xs[0].h, 'x', xs[0].x,
          |      'level', cast(xs[0].x as double),
          |      'trend', cast(0.0 as double),
          |      'forecast', cast(null as double))) as out,
          |    cast(xs[0].x as double) as l,
          |    cast(0.0 as double) as b),
          |  (acc, e) -> struct(
          |    concat(acc.out, array(named_struct(
          |      'h', e.h, 'x', e.x,
          |      'level', cast(e.x as double) * 0.5 + (acc.l + acc.b) * 0.5,
          |      'trend',
          |        ((cast(e.x as double) * 0.5 + (acc.l + acc.b) * 0.5)
          |          - acc.l) * 0.25 + acc.b * 0.75,
          |      'forecast', acc.l + acc.b))),
          |    cast(e.x as double) * 0.5 + (acc.l + acc.b) * 0.5,
          |    ((cast(e.x as double) * 0.5 + (acc.l + acc.b) * 0.5)
          |      - acc.l) * 0.25 + acc.b * 0.75),
          |  acc -> acc.out)""".stripMargin))
    folded
      .filter(size(col("xs")) >= 1)
      .select(col("event_type"), explode(col("steps")).as("st"))
      .select(col("event_type"),
        col("st.h").as("window_start"),
        col("st.x").as("x"),
        round(col("st.level"), 4).as("level"),
        round(col("st.trend"), 4).as("trend"),
        round(col("st.forecast"), 4).as("forecast"))
      .orderBy(col("event_type"), col("window_start"))
  }

  /** Full autocorrelation profile, lags 1..maxLag, of the gap-filled
    * GLOBAL hourly volume series — [[hourlyAutocorr]]'s lag-1 readout
    * generalized into the correlogram that actually justifies seasonal
    * modelling choices (a daily cycle shows as the ACF peak at lag 24 —
    * the measured argument for [[holtWinters]]' m = 24). Exact Pearson
    * per lag from integer moment sums; the series is gap-filled so lag k
    * means exactly k CALENDAR hours, not k observed rows.
    *
    * Scale: the corpus reduces to the bounded hourly frame; the lag
    * expansion is a broadcast of 24 literals and ONE equi-join on the
    * shifted hour key (never a window over a single global partition,
    * never a theta-join).
    */
  def acfProfile(events: DataFrame, maxLag: Int = 24): DataFrame = {
    val hourly = events
      .groupBy(date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("x"))
    val spine = hourly
      .agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
      .select(explode(sequence(col("h0"), col("h1"),
        expr("INTERVAL 1 HOUR"))).as("h"))
    val filled = spine.join(hourly, Seq("h"), "left")
      .select(col("h"), coalesce(col("x"), lit(0L)).as("x"))
    val lags = filled.limit(1)
      .select(explode(expr(s"sequence(1, $maxLag)")).as("lag"))
    val a = filled.crossJoin(broadcast(lags))
      .select(col("lag"),
        expr("h + make_interval(0, 0, 0, 0, lag)").as("h2"),
        col("x").as("xa"))
    val joined = a.join(
      filled.select(col("h").as("h2"), col("x").as("xb")), Seq("h2"))
    joined
      .groupBy(col("lag"))
      .agg(
        count(lit(1)).as("m"),
        sum(col("xa")).as("sa"), sum(col("xb")).as("sb"),
        sum(col("xa") * col("xa")).as("saa"),
        sum(col("xb") * col("xb")).as("sbb"),
        sum(col("xa") * col("xb")).as("sab"))
      .select(
        col("lag").cast("bigint").as("lag"), col("m").as("n_pairs"),
        when(
          (col("m") * col("saa") - col("sa") * col("sa")) > 0L &&
            (col("m") * col("sbb") - col("sb") * col("sb")) > 0L,
          round((col("m") * col("sab") - col("sa") * col("sb"))
            .cast("double") /
            (sqrt((col("m") * col("saa") - col("sa") * col("sa"))
              .cast("double")) *
              sqrt((col("m") * col("sbb") - col("sb") * col("sb"))
                .cast("double"))), 6)).as("acf"))
      .orderBy(col("lag"))
  }

  def acfProfileOracleSql(maxLag: Int = 24): String =
    s"""WITH hourly AS (
       |  SELECT date_trunc('hour', ts) AS h, CAST(count(*) AS BIGINT) AS x
       |  FROM events GROUP BY 1),
       |spine AS (
       |  SELECT unnest(generate_series((SELECT min(h) FROM hourly),
       |    (SELECT max(h) FROM hourly), INTERVAL 1 HOUR)) AS h),
       |filled AS (
       |  SELECT s.h, COALESCE(hourly.x, 0) AS x
       |  FROM spine s LEFT JOIN hourly ON s.h = hourly.h),
       |lags AS (SELECT unnest(range(1, ${maxLag + 1})) AS lag),
       |j AS (
       |  SELECT l.lag, a.x AS xa, b.x AS xb
       |  FROM filled a, lags l
       |  JOIN filled b ON b.h = a.h + to_hours(l.lag)),
       |agg AS (
       |  SELECT lag, CAST(count(*) AS BIGINT) AS m,
       |    CAST(sum(xa) AS BIGINT) AS sa, CAST(sum(xb) AS BIGINT) AS sb,
       |    CAST(sum(xa*xa) AS BIGINT) AS saa,
       |    CAST(sum(xb*xb) AS BIGINT) AS sbb,
       |    CAST(sum(xa*xb) AS BIGINT) AS sab
       |  FROM j GROUP BY 1)
       |SELECT CAST(lag AS BIGINT) AS lag, m AS n_pairs,
       |  CASE WHEN (m * saa - sa * sa) > 0 AND (m * sbb - sb * sb) > 0
       |  THEN round(CAST(m * sab - sa * sb AS DOUBLE)
       |    / (sqrt(CAST(m * saa - sa * sa AS DOUBLE))
       |       * sqrt(CAST(m * sbb - sb * sb AS DOUBLE))), 6)
       |  END AS acf
       |FROM agg ORDER BY lag""".stripMargin

  /** Forecast skill audit (MASE, Hyndman & Koehler, IJF 2006): the Holt
    * model's in-sample one-step absolute errors against the naive
    * (x_{t−1}) and seasonal-naive (x_{t−24}) baselines, per event type —
    * the readout that says whether [[holtForecast]] EARNS its keep over
    * "predict yesterday". MASE < 1 beats the baseline.
    *
    * Exactness without a float sum anywhere: the model's per-row error
    * |x − f| (f is the 4-dec forecast) is snapped to integer
    * TENTH-MILLIS per row — floor(|x−f|·10⁴ + 0.5), one identically
    * spelled double op on bit-identical operands — and then only
    * INTEGERS are summed, so aggregation order cannot perturb the
    * result. Baseline errors are born integral. The MASE ratio clears
    * denominators into one exact integer DIV.
    *
    * Scale: the corpus reduces to the (type × hour) frame; one window
    * pass per type (naturally small partitions), one aggregate.
    */
  def forecastEval(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hw = holtForecast(events)
    val byType = Window.partitionBy(col("event_type"))
      .orderBy(col("window_start"))
    val errs = hw
      .withColumn("x1", lag(col("x"), 1).over(byType))
      .withColumn("x24", lag(col("x"), 24).over(byType))
      .withColumn("em", when(col("forecast").isNotNull,
        expr("cast(floor(abs(cast(x as double) - forecast) * 10000 + 0.5)"
          + " as bigint)")))
      .withColumn("en", when(col("x1").isNotNull, abs(col("x") - col("x1"))))
      .withColumn("es", when(col("x24").isNotNull,
        abs(col("x") - col("x24"))))
    errs
      .groupBy(col("event_type"))
      .agg(
        count(col("em")).as("n_model"),
        sum(col("em")).as("sum_abs_err_model_tm"),
        count(col("en")).as("n_naive"),
        sum(col("en")).as("sum_abs_err_naive"),
        count(col("es")).as("n_snaive"),
        sum(col("es")).as("sum_abs_err_snaive"))
      .select(col("*"),
        when(col("sum_abs_err_naive") > 0 && col("n_model") > 0,
          expr("(sum_abs_err_model_tm * n_naive * 100)" +
            " DIV (n_model * sum_abs_err_naive)")).as("mase_naive_micros"),
        when(col("sum_abs_err_snaive") > 0 && col("n_model") > 0,
          expr("(sum_abs_err_model_tm * n_snaive * 100)" +
            " DIV (n_model * sum_abs_err_snaive)"))
          .as("mase_snaive_micros"))
      .orderBy(col("event_type"))
  }

  def forecastEvalOracleSql: String =
    s"""WITH RECURSIVE hourly AS (
       |  SELECT event_type, date_trunc('hour', ts) AS h,
       |    CAST(count(*) AS BIGINT) AS x
       |  FROM events GROUP BY 1, 2),
       |idx AS (
       |  SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY h)
       |    AS rn
       |  FROM hourly),
       |walk(event_type, rn, h, x, l, b, f) AS (
       |  SELECT event_type, rn, h, x, CAST(x AS DOUBLE),
       |    CAST(0.0 AS DOUBLE), CAST(NULL AS DOUBLE)
       |  FROM idx WHERE rn = 1
       |  UNION ALL
       |  SELECT w.event_type, i.rn, i.h, i.x,
       |    CAST(i.x AS DOUBLE) * 0.5 + (w.l + w.b) * 0.5,
       |    ((CAST(i.x AS DOUBLE) * 0.5 + (w.l + w.b) * 0.5) - w.l) * 0.25
       |      + w.b * 0.75,
       |    w.l + w.b
       |  FROM walk w
       |  JOIN idx i ON i.event_type = w.event_type AND i.rn = w.rn + 1),
       |hw AS (
       |  SELECT event_type, h AS window_start, x, round(f, 4) AS forecast
       |  FROM walk),
       |er AS (
       |  SELECT event_type,
       |    CASE WHEN forecast IS NOT NULL THEN
       |      CAST(floor(abs(CAST(x AS DOUBLE) - forecast) * 10000 + 0.5)
       |        AS BIGINT) END AS em,
       |    abs(x - lag(x, 1) OVER w) AS en,
       |    abs(x - lag(x, 24) OVER w) AS es
       |  FROM hw
       |  WINDOW w AS (PARTITION BY event_type ORDER BY window_start)),
       |agg AS (
       |  SELECT event_type,
       |    CAST(count(em) AS BIGINT) AS n_model,
       |    CAST(sum(em) AS BIGINT) AS sum_abs_err_model_tm,
       |    CAST(count(en) AS BIGINT) AS n_naive,
       |    CAST(sum(en) AS BIGINT) AS sum_abs_err_naive,
       |    CAST(count(es) AS BIGINT) AS n_snaive,
       |    CAST(sum(es) AS BIGINT) AS sum_abs_err_snaive
       |  FROM er GROUP BY 1)
       |SELECT event_type, n_model, sum_abs_err_model_tm, n_naive,
       |  sum_abs_err_naive, n_snaive, sum_abs_err_snaive,
       |  CASE WHEN sum_abs_err_naive > 0 AND n_model > 0 THEN
       |    (sum_abs_err_model_tm * n_naive * 100)
       |      // (n_model * sum_abs_err_naive) END AS mase_naive_micros,
       |  CASE WHEN sum_abs_err_snaive > 0 AND n_model > 0 THEN
       |    (sum_abs_err_model_tm * n_snaive * 100)
       |      // (n_model * sum_abs_err_snaive) END AS mase_snaive_micros
       |FROM agg ORDER BY event_type""".stripMargin

  /** Croston's intermittent-demand forecaster (Croston, Oper Res Q 1972)
    * with the Syntetos–Boylan bias correction (SBA, IJF 2005) — the
    * estimator for series that are MOSTLY ZERO, where Holt/Holt-Winters
    * average the gaps into mush: per part, smooth the nonzero demand
    * SIZES (z) and the INTER-DEMAND intervals (p) separately, forecast
    * z/p per period. Croston's key structural property makes it ideal
    * for the relational setting: the state only updates AT demand
    * points, so the fold runs over each part's (day, qty) demand list —
    * no gap-filling, no zero rows materialized.
    *
    * Exactness: α = 1/4 updates in integer micros with SIGN-SEPARATED
    * floor DIVs (Spark DIV truncates toward zero, DuckDB // floors —
    * they agree only on non-negatives, so negative deltas divide as
    * -((-d) DIV 4) on both engines). SBA = forecast·7 DIV 8 (1 − α/2).
    *
    * Scale: one (part, day) aggregate, one part-keyed fold over ≤
    * |days| elements — the classic linear sketch-per-key shape.
    */
  def crostonForecast(lineitem: DataFrame): DataFrame = {
    val daily = lineitem
      .groupBy(col("l_partkey"),
        expr("unix_timestamp(date_trunc('day', l_shipdate)) DIV 86400")
          .as("di"))
      .agg(sum(col("l_quantity").cast("bigint")).as("q"))
    def sdiv4(v: String): String =
      s"CASE WHEN ($v) >= 0 THEN ($v) DIV 4 ELSE -((-($v)) DIV 4) END"
    daily
      .groupBy(col("l_partkey"))
      .agg(sort_array(collect_list(struct(col("di"), col("q")))).as("xs"))
      .withColumn("fin", expr(
        s"""aggregate(
           |  slice(xs, 2, size(xs) - 1),
           |  struct(
           |    xs[0].q * 1000000 as z,
           |    cast(1000000 as bigint) as p,
           |    xs[0].di as pd,
           |    cast(1 as bigint) as n),
           |  (acc, e) -> struct(
           |    acc.z + ${sdiv4("e.q * 1000000 - acc.z")},
           |    acc.p + ${sdiv4("(e.di - acc.pd) * 1000000 - acc.p")},
           |    e.di,
           |    acc.n + 1),
           |  acc -> acc)""".stripMargin))
      .select(
        col("l_partkey"),
        col("fin.n").as("n_demands"),
        col("fin.z").as("level_micros"),
        col("fin.p").as("interval_micros"),
        expr("fin.z * 1000000 DIV fin.p").as("croston_micros"),
        expr("(fin.z * 1000000 DIV fin.p) * 7 DIV 8").as("sba_micros"))
      .orderBy(col("l_partkey"))
  }

  def crostonOracleSql: String =
    """WITH RECURSIVE daily AS (
      |  SELECT l_partkey,
      |    epoch(date_trunc('day', l_shipdate))::BIGINT // 86400 AS di,
      |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
      |  FROM lineitem GROUP BY 1, 2),
      |idx AS (
      |  SELECT *, row_number() OVER (PARTITION BY l_partkey ORDER BY di)
      |    AS rn
      |  FROM daily),
      |walk(l_partkey, rn, z, p, pd, n) AS (
      |  SELECT l_partkey, rn, q * 1000000, CAST(1000000 AS BIGINT), di,
      |    CAST(1 AS BIGINT)
      |  FROM idx WHERE rn = 1
      |  UNION ALL
      |  SELECT w.l_partkey, i.rn,
      |    w.z + (CASE WHEN (i.q * 1000000 - w.z) >= 0
      |      THEN (i.q * 1000000 - w.z) // 4
      |      ELSE -((-(i.q * 1000000 - w.z)) // 4) END),
      |    w.p + (CASE WHEN ((i.di - w.pd) * 1000000 - w.p) >= 0
      |      THEN ((i.di - w.pd) * 1000000 - w.p) // 4
      |      ELSE -((-((i.di - w.pd) * 1000000 - w.p)) // 4) END),
      |    i.di, w.n + 1
      |  FROM walk w
      |  JOIN idx i ON i.l_partkey = w.l_partkey AND i.rn = w.rn + 1),
      |fin AS (
      |  SELECT l_partkey, z, p, n,
      |    row_number() OVER (PARTITION BY l_partkey ORDER BY rn DESC)
      |      AS rr
      |  FROM walk)
      |SELECT l_partkey, n AS n_demands,
      |  z AS level_micros, p AS interval_micros,
      |  z * 1000000 // p AS croston_micros,
      |  (z * 1000000 // p) * 7 // 8 AS sba_micros
      |FROM fin WHERE rr = 1
      |ORDER BY l_partkey""".stripMargin

  /** Page-Hinkley drift test (Page, Biometrika 1954 §5; the sequential
    * mean-shift detector usually run beside CUSUM in streaming-drift
    * work, e.g. Gama et al.'s survey, ACM CSUR 2014): per event type,
    * m_t = m_{t−1} + (x_t − x̄_t − δ) against the RUNNING mean x̄_t —
    * unlike [[cusumChangepoints]] it needs no frozen baseline window, so
    * it is the detector you can run from the first hour of a new
    * pipeline. Alarm when m_t − min_{i≤t} m_i > λ.
    *
    * Exactness: everything in integer micros — the only division is the
    * running mean's floor DIV (Σx·10⁶ DIV t, non-negative), so the walk
    * is bit-exact and the DuckDB recursive CTE replays it literally.
    * δ = 0.5 events, λ = 20 events (micros constants in the fold).
    *
    * Scale: same discipline as every detector here — the corpus reduces
    * to the time-domain-bounded (type × hour) frame in one scan; the
    * non-associative recursion folds each type's bounded series.
    */
  def pageHinkley(
      events: DataFrame,
      deltaMicros: Long = 500000L,
      lambdaMicros: Long = 20000000L): DataFrame = {
    val hourly = events
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("x"))
    hourly
      .groupBy(col("event_type"))
      .agg(sort_array(collect_list(struct(col("h"), col("x")))).as("xs"))
      .withColumn("steps", expr(
        s"""aggregate(
           |  xs,
           |  struct(
           |    cast(array() as array<struct<h: timestamp, x: bigint,
           |      m: bigint, mn: bigint>>) as out,
           |    cast(0 as bigint) as t, cast(0 as bigint) as s,
           |    cast(0 as bigint) as m, cast(0 as bigint) as mn),
           |  (acc, e) -> struct(
           |    concat(acc.out, array(named_struct(
           |      'h', e.h, 'x', e.x,
           |      'm', acc.m + e.x * 1000000
           |        - ((acc.s + e.x) * 1000000 DIV (acc.t + 1))
           |        - $deltaMicros,
           |      'mn', least(acc.mn, acc.m + e.x * 1000000
           |        - ((acc.s + e.x) * 1000000 DIV (acc.t + 1))
           |        - $deltaMicros)))),
           |    acc.t + 1, acc.s + e.x,
           |    acc.m + e.x * 1000000
           |      - ((acc.s + e.x) * 1000000 DIV (acc.t + 1))
           |      - $deltaMicros,
           |    least(acc.mn, acc.m + e.x * 1000000
           |      - ((acc.s + e.x) * 1000000 DIV (acc.t + 1))
           |      - $deltaMicros)),
           |  acc -> acc.out)""".stripMargin))
      .select(col("event_type"), explode(col("steps")).as("st"))
      .select(col("event_type"),
        col("st.h").as("window_start"),
        col("st.x").as("x"),
        col("st.m").as("m_micros"),
        (col("st.m") - col("st.mn")).as("ph_micros"),
        (col("st.m") - col("st.mn") > lambdaMicros).as("alarm"))
      .orderBy(col("event_type"), col("window_start"))
  }

  def pageHinkleyOracleSql(
      deltaMicros: Long = 500000L,
      lambdaMicros: Long = 20000000L): String =
    s"""WITH RECURSIVE hourly AS (
       |  SELECT event_type, date_trunc('hour', ts) AS h,
       |    CAST(count(*) AS BIGINT) AS x
       |  FROM events GROUP BY 1, 2),
       |idx AS (
       |  SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY h)
       |    AS rn
       |  FROM hourly),
       |walk(event_type, rn, h, x, t, s, m, mn) AS (
       |  SELECT event_type, CAST(0 AS BIGINT), CAST(NULL AS TIMESTAMP),
       |    CAST(NULL AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT),
       |    CAST(0 AS BIGINT), CAST(0 AS BIGINT)
       |  FROM (SELECT DISTINCT event_type FROM idx)
       |  UNION ALL
       |  SELECT w.event_type, i.rn, i.h, i.x,
       |    w.t + 1, w.s + i.x,
       |    w.m + i.x * 1000000 - ((w.s + i.x) * 1000000 // (w.t + 1))
       |      - $deltaMicros,
       |    least(w.mn, w.m + i.x * 1000000
       |      - ((w.s + i.x) * 1000000 // (w.t + 1)) - $deltaMicros)
       |  FROM walk w
       |  JOIN idx i ON i.event_type = w.event_type AND i.rn = w.rn + 1)
       |SELECT event_type, h AS window_start, x,
       |  m AS m_micros,
       |  m - mn AS ph_micros,
       |  (m - mn) > $lambdaMicros AS alarm
       |FROM walk WHERE rn > 0
       |ORDER BY event_type, window_start""".stripMargin

  /** Holt-Winters additive seasonal smoothing (Winters, Mgmt Sci 1960)
    * over the gap-filled GLOBAL hourly volume series, season m = 24 —
    * [[holtForecast]]'s seasonal sibling: level + trend + a 24-phase
    * seasonal profile, the decomposition a daily-cyclic ops series
    * actually needs. α = 1/2, β = 1/4, γ = 1/2 (exact binary fractions,
    * so every update is one IEEE multiply-add chain spelled identically
    * in the DuckDB recursive-CTE oracle).
    *
    * Init (classic two-season heuristic): l₀ = mean of season 1,
    * b₀ = (Σ season 2 − Σ season 1)/m², s₀ = season-1 deviations — all
    * from exact integer sums. Updates and emission start at t = m+1.
    *
    * The seasonal state is a ROTATING queue: at step t the head IS the
    * phase of t−m, so the update is "use head, drop head, append new" —
    * no modular indexing on either engine, and after the last in-sample
    * step the queue is phase-aligned so that s[h] is exactly the seasonal
    * of future hour T+h: the 24 appended forecast rows
    * (phase = 'fc', f = l + h·b + s[h]) read it straight off.
    *
    * Scale: the corpus reduces to the time-domain-bounded hourly frame in
    * one scan-shaped aggregate; the non-associative recursion folds ONE
    * bounded array (30 days = 720 points) — same discipline as
    * [[cusumChangepoints]]/[[ewmaAnomalies]].
    */
  def holtWinters(events: DataFrame): DataFrame = {
    val hourly = events
      .groupBy(date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("x"))
    val spine = hourly
      .agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
      .select(explode(sequence(col("h0"), col("h1"),
        expr("INTERVAL 1 HOUR"))).as("h"))
    val filled = spine.join(hourly, Seq("h"), "left")
      .select(col("h"), coalesce(col("x"), lit(0L)).as("x"))
    // l': the level update; repeated textually (no let-bindings in SQL
    // lambdas) — the oracle repeats the identical spelling.
    val lNew = "(cast(e.x as double) - element_at(acc.s, 1)) * 0.5" +
      " + (acc.l + acc.b) * 0.5"
    val folded = filled
      .agg(sort_array(collect_list(struct(col("h"), col("x")))).as("xs"))
      .withColumn("sum1", expr(
        "aggregate(slice(xs, 1, 24), cast(0 as bigint), (a, e) -> a + e.x)"))
      .withColumn("sum2", expr(
        "aggregate(slice(xs, 25, 24), cast(0 as bigint), (a, e) -> a + e.x)"))
      .withColumn("l0", expr("cast(sum1 as double) / 24.0"))
      .withColumn("b0", expr("cast(sum2 - sum1 as double) / 576.0"))
      .withColumn("s0", expr(
        "transform(slice(xs, 1, 24), e -> cast(e.x as double) - l0)"))
      .withColumn("fin", expr(
        s"""aggregate(
           |  slice(xs, 25, size(xs) - 24),
           |  struct(
           |    cast(array() as array<struct<
           |      h: timestamp, x: bigint, level: double, trend: double,
           |      seasonal: double, forecast: double>>) as out,
           |    l0 as l, b0 as b, s0 as s),
           |  (acc, e) -> struct(
           |    concat(acc.out, array(named_struct(
           |      'h', e.h, 'x', e.x,
           |      'level', $lNew,
           |      'trend', (($lNew) - acc.l) * 0.25 + acc.b * 0.75,
           |      'seasonal',
           |        (cast(e.x as double) - ($lNew)) * 0.5
           |          + element_at(acc.s, 1) * 0.5,
           |      'forecast', acc.l + acc.b + element_at(acc.s, 1)))),
           |    $lNew,
           |    (($lNew) - acc.l) * 0.25 + acc.b * 0.75,
           |    concat(slice(acc.s, 2, 23), array(
           |      (cast(e.x as double) - ($lNew)) * 0.5
           |        + element_at(acc.s, 1) * 0.5))),
           |  acc -> acc)""".stripMargin))
    val fit = folded
      .select(col("xs"), explode(col("fin.out")).as("st"))
      .select(
        col("st.h").as("window_start"), lit("fit").as("phase"),
        col("st.x").as("x"),
        round(col("st.level"), 4).as("level"),
        round(col("st.trend"), 4).as("trend"),
        round(col("st.seasonal"), 4).as("seasonal"),
        round(col("st.forecast"), 4).as("forecast"))
    val future = folded
      .filter(size(col("xs")) >= 48)
      .select(col("xs"), col("fin"),
        explode(expr("sequence(1, 24)")).as("hh"))
      .select(
        expr("element_at(xs, size(xs)).h + make_interval(0, 0, 0, 0, hh)")
          .as("window_start"),
        lit("fc").as("phase"),
        lit(null).cast("bigint").as("x"),
        lit(null).cast("double").as("level"),
        lit(null).cast("double").as("trend"),
        round(expr("element_at(fin.s, hh)"), 4).as("seasonal"),
        round(expr(
          "fin.l + cast(hh as double) * fin.b + element_at(fin.s, hh)"), 4)
          .as("forecast"))
    fit.unionByName(future).orderBy(col("window_start"))
  }

  /** Recursive-CTE replay of the Holt-Winters fold: the seasonal queue is
    * a DOUBLE[] list rotated per step with identical IEEE spelling.
    */
  def holtWintersOracleSql: String = {
    val lNew = "(CAST(i.x AS DOUBLE) - w.s[1]) * 0.5 + (w.l + w.b) * 0.5"
    s"""WITH RECURSIVE hourly AS (
       |  SELECT date_trunc('hour', ts) AS h, CAST(count(*) AS BIGINT) AS x
       |  FROM events GROUP BY 1),
       |spine AS (
       |  SELECT unnest(generate_series((SELECT min(h) FROM hourly),
       |    (SELECT max(h) FROM hourly), INTERVAL 1 HOUR)) AS h),
       |filled AS (
       |  SELECT s.h, COALESCE(hourly.x, 0) AS x
       |  FROM spine s LEFT JOIN hourly ON s.h = hourly.h),
       |idx AS (
       |  SELECT h, x, row_number() OVER (ORDER BY h) AS rn FROM filled),
       |inits AS (
       |  SELECT
       |    CAST((SELECT sum(x) FROM idx WHERE rn <= 24) AS BIGINT) AS sum1,
       |    CAST((SELECT sum(x) FROM idx WHERE rn BETWEEN 25 AND 48)
       |      AS BIGINT) AS sum2,
       |    (SELECT list(CAST(x AS DOUBLE) ORDER BY rn) FROM idx
       |     WHERE rn <= 24) AS xs1,
       |    (SELECT count(*) FROM idx) AS n),
       |walk(rn, h, x, l, b, s, lvl, tr, se, f) AS (
       |  SELECT 24, CAST(NULL AS TIMESTAMP), CAST(NULL AS BIGINT),
       |    CAST(sum1 AS DOUBLE) / 24.0,
       |    CAST(sum2 - sum1 AS DOUBLE) / 576.0,
       |    list_transform(xs1, v -> v - CAST(sum1 AS DOUBLE) / 24.0),
       |    CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
       |    CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)
       |  FROM inits
       |  UNION ALL
       |  SELECT i.rn, i.h, i.x,
       |    $lNew,
       |    (($lNew) - w.l) * 0.25 + w.b * 0.75,
       |    w.s[2:24] || [(CAST(i.x AS DOUBLE) - ($lNew)) * 0.5
       |      + w.s[1] * 0.5],
       |    $lNew,
       |    (($lNew) - w.l) * 0.25 + w.b * 0.75,
       |    (CAST(i.x AS DOUBLE) - ($lNew)) * 0.5 + w.s[1] * 0.5,
       |    w.l + w.b + w.s[1]
       |  FROM walk w JOIN idx i ON i.rn = w.rn + 1),
       |fit AS (
       |  SELECT h AS window_start, 'fit' AS phase, x,
       |    round(lvl, 4) AS level, round(tr, 4) AS trend,
       |    round(se, 4) AS seasonal, round(f, 4) AS forecast
       |  FROM walk WHERE rn > 24),
       |last AS (
       |  SELECT w.l, w.b, w.s,
       |    (SELECT max(h) FROM idx) AS hT
       |  FROM walk w
       |  WHERE w.rn = (SELECT max(rn) FROM walk)
       |    AND (SELECT n FROM inits) >= 48),
       |future AS (
       |  SELECT hT + to_hours(hh) AS window_start, 'fc' AS phase,
       |    CAST(NULL AS BIGINT) AS x,
       |    CAST(NULL AS DOUBLE) AS level, CAST(NULL AS DOUBLE) AS trend,
       |    round(s[hh], 4) AS seasonal,
       |    round(l + CAST(hh AS DOUBLE) * b + s[hh], 4) AS forecast
       |  FROM last, (SELECT unnest(range(1, 25)) AS hh))
       |SELECT * FROM fit UNION ALL SELECT * FROM future
       |ORDER BY window_start""".stripMargin
  }

  /** Recursive-CTE replay of the Holt fold (identical update spelling). */
  def holtOracleSql: String =
    """WITH RECURSIVE hourly AS (
      |  SELECT event_type, date_trunc('hour', ts) AS h,
      |    CAST(count(*) AS BIGINT) AS x
      |  FROM events GROUP BY 1, 2),
      |idx AS (
      |  SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY h)
      |    AS rn
      |  FROM hourly),
      |walk(event_type, rn, h, x, l, b, f) AS (
      |  SELECT event_type, rn, h, x, CAST(x AS DOUBLE),
      |    CAST(0.0 AS DOUBLE), CAST(NULL AS DOUBLE)
      |  FROM idx WHERE rn = 1
      |  UNION ALL
      |  SELECT w.event_type, i.rn, i.h, i.x,
      |    CAST(i.x AS DOUBLE) * 0.5 + (w.l + w.b) * 0.5,
      |    ((CAST(i.x AS DOUBLE) * 0.5 + (w.l + w.b) * 0.5) - w.l) * 0.25
      |      + w.b * 0.75,
      |    w.l + w.b
      |  FROM walk w
      |  JOIN idx i ON i.event_type = w.event_type AND i.rn = w.rn + 1)
      |SELECT event_type, h AS window_start, x,
      |  round(l, 4) AS level, round(b, 4) AS trend,
      |  round(f, 4) AS forecast
      |FROM walk
      |ORDER BY event_type, window_start""".stripMargin

  /** EWMA control chart (Roberts, Technometrics 1959) over per-type
    * hourly volumes: z_t = z_{t-1} + λ·(x_t − z_{t-1}), λ = 1/4, seeded
    * at the baseline mean; alarm when |z_t − μ| exceeds L·σ·√(λ/(2−λ))
    * (the asymptotic control limit, L = 3). Catches small sustained
    * drifts faster than per-point z-scores, with a shorter memory than
    * CUSUM's unbounded walk.
    *
    * Same scale/exactness shape as [[cusumChangepoints]]: the corpus
    * reduces to the time-domain-bounded hourly frame in one scan; the
    * non-associative recursion folds each key's sorted series with
    * `aggregate`; μ/σ/limit come from exact long sums. The oracle walks
    * the identical IEEE update step by step in a recursive CTE, so the
    * doubles agree bit-for-bit (λ = 0.25 is an exact binary fraction —
    * each step is one multiply-add chain spelled identically).
    */
  def ewmaAnomalies(events: DataFrame,
      baselineEnd: String = "2024-01-08 00:00:00"): DataFrame = {
    val hourly = events
      .groupBy(col("event_type"),
        date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("x"))
    val base = hourly
      .filter(col("h") < to_timestamp(lit(baselineEnd)))
      .groupBy(col("event_type"))
      .agg(
        sum(col("x")).as("s1"),
        sum(col("x") * col("x")).as("s2"),
        count(lit(1)).as("n"))
      // a type with a single baseline hour has no sample variance:
      // (n-1) = 0 would make sigma NaN and every comparison against it
      // meaningless — such types are excluded from the chart (same
      // guard as overdispersionCheck; mirrored as HAVING in the oracle)
      .filter(col("n") > 1L)
      .select(
        col("event_type"),
        (col("s1").cast("double") / col("n").cast("double")).as("mu"),
        sqrt((col("s2").cast("double") -
          col("s1").cast("double") * col("s1").cast("double") /
            col("n").cast("double")) /
          (col("n") - lit(1)).cast("double")).as("sigma"))
    val folded = hourly
      .join(broadcast(base), Seq("event_type"))
      .groupBy(col("event_type"), col("mu"), col("sigma"))
      .agg(sort_array(collect_list(struct(col("h"), col("x")))).as("xs"))
      .withColumn("steps", expr(
        """aggregate(
          |  xs,
          |  struct(cast(array() as array<struct<h timestamp, x bigint,
          |                                      z double>>) as out,
          |         mu as z),
          |  (acc, e) -> struct(
          |    concat(acc.out, array(named_struct(
          |      'h', e.h, 'x', e.x,
          |      'z', acc.z + (cast(e.x as double) - acc.z) * 0.25))),
          |    acc.z + (cast(e.x as double) - acc.z) * 0.25),
          |  acc -> acc.out)""".stripMargin))
    // Asymptotic 3-sigma EWMA limit: sigma * sqrt(lambda / (2 - lambda)).
    val limit = col("sigma") * lit(3.0) * sqrt(lit(0.25 / 1.75))
    folded
      .select(col("event_type"), col("mu"), col("sigma"),
        explode(col("steps")).as("st"))
      .select(
        col("event_type"),
        col("st.h").as("window_start"),
        col("st.x").as("x"),
        round(col("st.z"), 4).as("ewma"),
        round(col("mu") + limit, 4).as("ucl"),
        round(col("mu") - limit, 4).as("lcl"),
        (col("st.z") > col("mu") + limit ||
          col("st.z") < col("mu") - limit).as("alarm"))
      .orderBy(col("event_type"), col("window_start"))
  }

  /** Recursive-CTE replay of the EWMA fold (identical update spelling). */
  def ewmaOracleSql(baselineEnd: String = "2024-01-08 00:00:00"): String =
    s"""WITH RECURSIVE hourly AS (
       |  SELECT event_type, date_trunc('hour', ts) AS h,
       |    CAST(count(*) AS BIGINT) AS x
       |  FROM events GROUP BY 1, 2),
       |idx AS (
       |  SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY h)
       |    AS rn
       |  FROM hourly),
       |base AS (
       |  SELECT event_type,
       |    CAST(sum(x) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mu,
       |    sqrt((CAST(sum(x * x) AS DOUBLE)
       |      - CAST(sum(x) AS DOUBLE) * CAST(sum(x) AS DOUBLE)
       |        / CAST(count(*) AS DOUBLE))
       |      / CAST(count(*) - 1 AS DOUBLE)) AS sigma
       |  FROM hourly WHERE h < TIMESTAMP '$baselineEnd' GROUP BY 1
       |  HAVING count(*) > 1),
       |walk(event_type, rn, h, x, z) AS (
       |  SELECT event_type, CAST(0 AS BIGINT), CAST(NULL AS TIMESTAMP),
       |    CAST(NULL AS BIGINT), mu
       |  FROM base
       |  UNION ALL
       |  SELECT w.event_type, i.rn, i.h, i.x,
       |    w.z + (CAST(i.x AS DOUBLE) - w.z) * 0.25
       |  FROM walk w
       |  JOIN idx i ON i.event_type = w.event_type AND i.rn = w.rn + 1)
       |SELECT w.event_type, w.h AS window_start, w.x,
       |  round(w.z, 4) AS ewma,
       |  round(b.mu + b.sigma * 3.0 * sqrt(0.25 / 1.75), 4) AS ucl,
       |  round(b.mu - b.sigma * 3.0 * sqrt(0.25 / 1.75), 4) AS lcl,
       |  (w.z > b.mu + b.sigma * 3.0 * sqrt(0.25 / 1.75)
       |   OR w.z < b.mu - b.sigma * 3.0 * sqrt(0.25 / 1.75)) AS alarm
       |FROM walk w JOIN base b ON b.event_type = w.event_type
       |WHERE w.rn > 0
       |ORDER BY w.event_type, window_start""".stripMargin

  /** The recursive-CTE replay of the same fold (DuckDB dialect). */
  def oracleSql(baselineEnd: String = "2024-01-08 00:00:00"): String =
    s"""WITH RECURSIVE hourly AS (
       |  SELECT event_type, date_trunc('hour', ts) AS h,
       |    CAST(count(*) AS BIGINT) AS x
       |  FROM events GROUP BY 1, 2),
       |idx AS (
       |  SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY h)
       |    AS rn
       |  FROM hourly),
       |base AS (
       |  SELECT event_type,
       |    CAST(sum(x) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mu,
       |    sqrt((CAST(sum(x * x) AS DOUBLE)
       |      - CAST(sum(x) AS DOUBLE) * CAST(sum(x) AS DOUBLE)
       |        / CAST(count(*) AS DOUBLE))
       |      / CAST(count(*) - 1 AS DOUBLE)) AS sigma
       |  FROM hourly WHERE h < TIMESTAMP '$baselineEnd' GROUP BY 1
       |  HAVING count(*) > 1),
       |walk(event_type, rn, h, x, sp, sn) AS (
       |  SELECT event_type, CAST(0 AS BIGINT), CAST(NULL AS TIMESTAMP),
       |    CAST(NULL AS BIGINT), CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE)
       |  FROM base
       |  UNION ALL
       |  SELECT w.event_type, i.rn, i.h, i.x,
       |    greatest(CAST(0.0 AS DOUBLE),
       |      w.sp + (CAST(i.x AS DOUBLE) - b.mu - b.sigma * 0.5)),
       |    least(CAST(0.0 AS DOUBLE),
       |      w.sn + (CAST(i.x AS DOUBLE) - b.mu + b.sigma * 0.5))
       |  FROM walk w
       |  JOIN idx i ON i.event_type = w.event_type AND i.rn = w.rn + 1
       |  JOIN base b ON b.event_type = w.event_type)
       |SELECT w.event_type, w.h AS window_start, w.x,
       |  round(w.sp, 4) AS s_pos, round(w.sn, 4) AS s_neg,
       |  (w.sp > b.sigma * 4.0) AS alarm_pos,
       |  (w.sn < b.sigma * -4.0) AS alarm_neg
       |FROM walk w JOIN base b ON b.event_type = w.event_type
       |WHERE w.rn > 0
       |ORDER BY w.event_type, window_start""".stripMargin
}
