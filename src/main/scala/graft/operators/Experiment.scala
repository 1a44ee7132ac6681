package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Experimentation / uncertainty-quantification operators: CUPED
  * variance reduction (Deng et al., WSDM 2013) and split-conformal
  * prediction intervals (Vovk; Lei et al., JASA 2018) — the two audits a
  * measurement pipeline runs beside an SPRT monitor ([[Sprt]]).
  *
  * Exactness discipline (shared with [[graft.queries.Analytics]]
  * value_moments): event values become exact integer CENTS via a
  * DECIMAL(18,2) cast before any aggregation, so every sum/moment
  * numerator is an exact integer; doubles appear only in final scalar
  * arithmetic over identically-derived operands (no unordered double
  * summation anywhere).
  */
object Experiment {

  /** CUPED: per-user post-period purchase value adjusted by the
    * pre-period covariate. θ = cov(X,Y)/var(X) from POOLED exact moment
    * numerators (n·Σxy − ΣxΣy over n·Σx² − (Σx)²); per-variant
    * means/variances of the adjusted metric follow from the same exact
    * sums by the identity var(Y−θX) = var(Y) − 2θ·cov(X,Y) + θ²·var(X).
    *
    * Scale: ONE corpus scan folds to per-user (x, y) cents with map-side
    * combine (users ≪ events); the moment reduction is a scalar agg; the
    * report is |variants| rows.
    */
  def cupedAdjust(events: DataFrame,
      preEnd: String = "2024-01-08 00:00:00"): DataFrame = {
    val cents = col("value").cast("decimal(18,2)") * lit(100)
    val perUser = events
      .filter(col("event_type") === "purchase" && col("value").isNotNull)
      .groupBy(col("user_id"))
      .agg(
        sum(when(col("ts") < to_timestamp(lit(preEnd)), cents)
          .otherwise(lit(0))).cast("decimal(38,0)").as("x"),
        sum(when(col("ts") >= to_timestamp(lit(preEnd)), cents)
          .otherwise(lit(0))).cast("decimal(38,0)").as("y"))
      .withColumn("variant", pmod(col("user_id"), lit(2)).cast("int"))
    // Pooled θ from exact decimal numerators; kept as ONE row and
    // broadcast onto the (tiny) per-variant frame.
    val pooled = perUser.agg(
      count(lit(1)).cast("decimal(38,0)").as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("x")).cast("decimal(38,0)").as("sxx"),
      sum(col("x") * col("y")).cast("decimal(38,0)").as("sxy"))
      .select(
        (col("n") * col("sxy") - col("sx") * col("sy"))
          .cast("double").as("cov_num"),
        (col("n") * col("sxx") - col("sx") * col("sx"))
          .cast("double").as("var_num"),
        (col("sx").cast("double") / col("n").cast("double")).as("mean_x_pool"))
      .select(col("mean_x_pool"),
        // θ undefined on a zero-variance covariate (e.g. preEnd before
        // all data): NULL, not 0/0 = NaN — NaN renders differently
        // across engines and poisons every adjusted column downstream
        when(col("var_num") > lit(0.0), col("cov_num") / col("var_num"))
          .as("theta"))
    val perVariant = perUser
      .groupBy(col("variant"))
      .agg(
        count(lit(1)).cast("decimal(38,0)").as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).cast("decimal(38,0)").as("sxx"),
        sum(col("y") * col("y")).cast("decimal(38,0)").as("syy"),
        sum(col("x") * col("y")).cast("decimal(38,0)").as("sxy"))
    val nD = col("n").cast("double")
    val varY = (col("n") * col("syy") - col("sy") * col("sy")).cast("double") /
      (nD * nD)
    val varX = (col("n") * col("sxx") - col("sx") * col("sx")).cast("double") /
      (nD * nD)
    val covXY = (col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
      (nD * nD)
    val varAdj = varY - lit(2.0) * col("theta") * covXY +
      col("theta") * col("theta") * varX
    perVariant
      .crossJoin(broadcast(pooled))
      .select(
        col("variant"),
        col("n").cast("bigint").as("n_users"),
        col("sy").cast("bigint").as("sum_y_cents"),
        col("sx").cast("bigint").as("sum_x_cents"),
        expr("cast(sy * 1000000 DIV n as bigint)").as("mean_y_micros"),
        round(col("theta"), 6).as("theta"),
        round(col("sy").cast("double") / nD -
          col("theta") * (col("sx").cast("double") / nD - col("mean_x_pool")),
          4).as("mean_y_adj"),
        round(varY, 4).as("var_y"),
        round(varAdj, 4).as("var_y_adj"),
        // NULL when the variant's raw variance is 0 (0/0 across engines)
        when(varY > lit(0.0),
          round((varY - varAdj) / varY * lit(100.0), 4))
          .as("var_reduction_pct"))
      .orderBy(col("variant"))
  }

  def cupedOracleSql(preEnd: String = "2024-01-08 00:00:00"): String =
    s"""WITH pu AS (
       |  SELECT user_id,
       |    CAST(sum(CASE WHEN ts < TIMESTAMP '$preEnd'
       |      THEN CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
       |      ELSE 0 END) AS HUGEINT) AS x,
       |    CAST(sum(CASE WHEN ts >= TIMESTAMP '$preEnd'
       |      THEN CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
       |      ELSE 0 END) AS HUGEINT) AS y,
       |    CAST(user_id % 2 AS INTEGER) AS variant
       |  FROM events WHERE event_type = 'purchase' AND value IS NOT NULL
       |  GROUP BY user_id),
       |pool AS (
       |  SELECT CAST(count(*) AS HUGEINT) AS n, sum(x) AS sx, sum(y) AS sy,
       |    sum(x*x) AS sxx, sum(x*y) AS sxy
       |  FROM pu),
       |theta AS (
       |  SELECT CASE WHEN CAST(n*sxx - sx*sx AS DOUBLE) > 0.0
       |    THEN CAST(n*sxy - sx*sy AS DOUBLE)
       |         / CAST(n*sxx - sx*sx AS DOUBLE) END AS theta,
       |    CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mean_x_pool
       |  FROM pool),
       |pv AS (
       |  SELECT variant, CAST(count(*) AS HUGEINT) AS n, sum(x) AS sx,
       |    sum(y) AS sy, sum(x*x) AS sxx, sum(y*y) AS syy, sum(x*y) AS sxy
       |  FROM pu GROUP BY variant)
       |SELECT variant,
       |  CAST(n AS BIGINT) AS n_users,
       |  CAST(sy AS BIGINT) AS sum_y_cents,
       |  CAST(sx AS BIGINT) AS sum_x_cents,
       |  CAST(sy * 1000000 // n AS BIGINT) AS mean_y_micros,
       |  round(theta, 6) AS theta,
       |  round(CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)
       |    - theta * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) - mean_x_pool),
       |    4) AS mean_y_adj,
       |  round(CAST(n*syy - sy*sy AS DOUBLE)
       |    / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 4) AS var_y,
       |  round(CAST(n*syy - sy*sy AS DOUBLE)
       |      / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))
       |    - 2.0 * theta * CAST(n*sxy - sx*sy AS DOUBLE)
       |      / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))
       |    + theta * theta * CAST(n*sxx - sx*sx AS DOUBLE)
       |      / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 4) AS var_y_adj,
       |  CASE WHEN CAST(n*syy - sy*sy AS DOUBLE) > 0.0 THEN
       |  round((CAST(n*syy - sy*sy AS DOUBLE)
       |      / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))
       |    - (CAST(n*syy - sy*sy AS DOUBLE)
       |      / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))
       |    - 2.0 * theta * CAST(n*sxy - sx*sy AS DOUBLE)
       |      / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))
       |    + theta * theta * CAST(n*sxx - sx*sx AS DOUBLE)
       |      / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))))
       |    / (CAST(n*syy - sy*sy AS DOUBLE)
       |      / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) * 100.0, 4)
       |  END AS var_reduction_pct
       |FROM pv, theta
       |ORDER BY variant""".stripMargin

  /** Split-conformal interval audit for a token-count predictor:
    * calibration docs (even doc_id) fit a single exact tokens-per-char
    * rate (micros) and supply the order-statistic radius q̂ =
    * r_(⌈(n_cal+1)·0.9⌉); held-out docs (odd doc_id) report empirical
    * coverage of |tokens − pred| ≤ q̂ — globally and per source. The
    * whole path is integer-exact: predictions via micros DIV, residuals
    * as longs, coverage as ppm.
    *
    * Scale: one scan to per-doc (tokens, chars); the quantile is a
    * single order-statistic over the calibration half (top-k-by-rank,
    * not a full sort at scale — here a window rank over the bounded
    * residual frame); coverage is a counted broadcast-join probe.
    */
  def conformalIntervals(documents: DataFrame,
      alphaPpm: Long = 100000L): DataFrame = {
    val perDoc = documents
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("bigint").as("tokens"),
        col("n_chars").cast("bigint").as("chars"),
        pmod(col("doc_id"), lit(2)).as("fold"))
    val cal = perDoc.filter(col("fold") === 0L)
    val test = perDoc.filter(col("fold") === 1L)
    val fit = cal.agg(
      sum(col("tokens")).as("st"), sum(col("chars")).as("sc"),
      count(lit(1)).as("n_cal"))
      .select(expr("(st * 1000000L) DIV sc").as("rate_micros"), col("n_cal"))
    val calResid = cal.crossJoin(broadcast(fit))
      .withColumn("pred", expr("(chars * rate_micros) DIV 1000000L"))
      .withColumn("r", abs(col("tokens") - col("pred")))
    // k-th smallest residual, k = ceil((n_cal+1) * (1 - alpha)):
    // ceil(a/b) over positive longs as (a + b - 1) DIV b. The order
    // statistic rides DistributedRank's range-partitioned rank — no
    // single-partition global sort (caller releases the pinned frame via
    // DistributedRank.release, as Verify/Bench already do per query).
    // qhat as a GLOBAL aggregate, not a filter: when k > n_cal (tiny
    // calibration set — k = ceil((n_cal+1)·(1−α)) exceeds n_cal for
    // n_cal <= 1/α − 1) the order statistic does not exist and split
    // conformal prescribes an INFINITE radius (trivial full coverage).
    // The aggregate spelling emits qhat = NULL in that regime instead of
    // silently producing an empty report, and always yields exactly one
    // row (matching the oracle's GROUP-BY-less aggregate on the same
    // path).
    val qhat = DistributedRank
      .withGlobalRank(calResid, Seq(col("r"), col("doc_id")), "rk")
      .withColumn("k", expr(
        s"((n_cal + 1) * (1000000 - $alphaPpm) + 999999) DIV 1000000"))
      .agg(max(when(col("rk") === col("k"), col("r"))).as("qhat"),
        first(col("n_cal")).as("n_cal"),
        first(col("rate_micros")).as("rate_micros"))
    val testResid = test.crossJoin(broadcast(qhat))
      .withColumn("pred", expr("(chars * rate_micros) DIV 1000000L"))
      .withColumn("covered",
        when(col("qhat").isNull, lit(1L))
          .otherwise((abs(col("tokens") - col("pred")) <= col("qhat"))
            .cast("bigint")))
    val bySource = testResid
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_test"), sum(col("covered")).as("covered"),
        first(col("qhat")).as("qhat"), first(col("n_cal")).as("n_cal"),
        first(col("rate_micros")).as("rate_micros"))
    // the '__all__' row is a global aggregate (always exactly ONE row,
    // even over an empty test frame — groupBy(lit) would emit zero and
    // diverge from the oracle's GROUP-BY-less branch)
    val overall = testResid
      .agg(count(lit(1)).as("n_test"),
        coalesce(sum(col("covered")), lit(0L)).as("covered"),
        first(col("qhat")).as("qhat"), first(col("n_cal")).as("n_cal"),
        first(col("rate_micros")).as("rate_micros"))
      .select(lit("__all__").as("source"), col("n_test"), col("covered"),
        col("qhat"), col("n_cal"), col("rate_micros"))
    bySource.unionByName(overall)
      .select(col("source"), col("n_cal"), col("n_test"), col("rate_micros"),
        col("qhat"), col("covered"),
        when(col("n_test") > 0L,
          expr("(covered * 1000000L) DIV n_test")).as("coverage_ppm"))
      .orderBy(col("source"))
  }

  /** Sample-ratio-mismatch check (the FIRST thing a trustworthy A/B
    * system validates — Fabijan et al., "Diagnosing sample ratio
    * mismatch", KDD 2019): USER-level assignment counts against the
    * expected 50/50 hash split, with the exact delta and the one-cell
    * chi-square statistic (identically spelled IEEE over integer
    * counts). A failed SRM invalidates every downstream readout — this
    * runs before CUPED/DiD/uplift, not after.
    */
  def srmCheck(events: DataFrame): DataFrame = {
    val perUser = events.select(col("user_id")).distinct()
      .groupBy(pmod(col("user_id"), lit(2)).cast("int").as("v"))
      .agg(count(lit(1)).as("n"))
    val agg = perUser.agg(
      sum(when(col("v") === 0, col("n")).otherwise(lit(0L))).as("n0"),
      sum(when(col("v") === 1, col("n")).otherwise(lit(0L))).as("n1"))
    val n0d = col("n0").cast("double")
    val n1d = col("n1").cast("double")
    val chi2 = (n0d - n1d) * (n0d - n1d) / (n0d + n1d)
    agg.select(
      col("n0").as("n_control"), col("n1").as("n_treated"),
      (col("n1") - col("n0")).as("delta_users"),
      when(col("n0") + col("n1") > 0L,
        when(col("n1") >= col("n0"),
          expr("((n1 - n0) * 1000000) DIV (n0 + n1)"))
          .otherwise(-expr("((n0 - n1) * 1000000) DIV (n0 + n1)")))
        .as("delta_ppm"),
      when(col("n0") + col("n1") > 0L, round(chi2, 6)).as("chi2"),
      // 3.8415 ≈ χ²₁ at α=0.05: the standard SRM alarm line
      when(col("n0") + col("n1") > 0L, chi2 > lit(3.841458820694124))
        .as("srm_alarm"))
  }

  def srmOracleSql: String = {
    val crit = java.lang.Double.toString(3.841458820694124)
    s"""WITH pu AS (
       |  SELECT DISTINCT user_id FROM events),
       |cells AS (
       |  SELECT
       |    CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
       |      AS BIGINT) AS n0,
       |    CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END)
       |      AS BIGINT) AS n1
       |  FROM pu)
       |SELECT n0 AS n_control, n1 AS n_treated,
       |  n1 - n0 AS delta_users,
       |  CASE WHEN n0 + n1 = 0 THEN NULL
       |    WHEN n1 >= n0 THEN
       |      CAST(((n1 - n0) * 1000000) // (n0 + n1) AS BIGINT)
       |    ELSE -CAST(((n0 - n1) * 1000000) // (n0 + n1) AS BIGINT)
       |  END AS delta_ppm,
       |  CASE WHEN n0 + n1 > 0 THEN
       |    round((CAST(n0 AS DOUBLE) - CAST(n1 AS DOUBLE))
       |      * (CAST(n0 AS DOUBLE) - CAST(n1 AS DOUBLE))
       |      / (CAST(n0 AS DOUBLE) + CAST(n1 AS DOUBLE)), 6)
       |  END AS chi2,
       |  CASE WHEN n0 + n1 > 0 THEN
       |    (CAST(n0 AS DOUBLE) - CAST(n1 AS DOUBLE))
       |      * (CAST(n0 AS DOUBLE) - CAST(n1 AS DOUBLE))
       |      / (CAST(n0 AS DOUBLE) + CAST(n1 AS DOUBLE)) > $crit
       |  END AS srm_alarm
       |FROM cells""".stripMargin
  }

  /** Negative-binomial method-of-moments fit of per-user purchase counts
    * (Anscombe 1950 MoM; what a volume model fits when
    * `overdispersion_check` rejects Poisson): p = m/v and r = m²/(v−m)
    * from exact integer moment numerators — p = S·n/(n·Q−S²),
    * r = S²/(n·Q−S²−S·n) — emitted as floor-micros, with the observed
    * zero share beside the Poisson-predicted one (the zero-inflation
    * tell). All users appearing in the event log count, including
    * zero-purchase users — dropping them is the classic truncation bug.
    *
    * Scale: ONE scan to per-user counts (map-side combine), one scalar
    * aggregate.
    */
  def nbFit(events: DataFrame): DataFrame = {
    val perUser = events
      .groupBy(col("user_id"))
      .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
        .as("k"))
    val agg = perUser.agg(
      count(lit(1)).cast("decimal(38,0)").as("n"),
      sum(col("k")).cast("decimal(38,0)").as("s"),
      sum(col("k").cast("decimal(38,0)") * col("k"))
        .cast("decimal(38,0)").as("q"),
      sum(when(col("k") === 0L, 1L).otherwise(0L)).as("zeros"))
    val varnum = col("n") * col("q") - col("s") * col("s")
    val meanD = col("s").cast("double") / col("n").cast("double")
    agg.select(
      col("n").cast("bigint").as("n_users"),
      col("s").cast("bigint").as("total_purchases"),
      col("zeros").as("zero_users"),
      expr("cast((s * 1000000) DIV n as bigint)").as("mean_micros"),
      expr("cast(((n * q - s * s) * 1000000) DIV (n * n) as bigint)")
        .as("var_micros"),
      (varnum > col("s") * col("n")).as("overdispersed"),
      when(varnum > 0,
        expr("cast((s * n * 1000000) DIV (n * q - s * s) as bigint)"))
        .as("nb_p_micros"),
      when(varnum > col("s") * col("n"),
        expr("cast((s * s * 1000000) DIV (n * q - s * s - s * n)" +
          " as bigint)")).as("nb_r_micros"),
      expr("cast((zeros * 1000000) DIV n as bigint)").as("zero_ppm"),
      round(exp(-meanD), 6).as("poisson_zero_prob"))
  }

  def nbFitOracleSql: String =
    """WITH pu AS (
      |  SELECT user_id,
      |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS k
      |  FROM events GROUP BY user_id),
      |agg AS (
      |  SELECT CAST(count(*) AS HUGEINT) AS n,
      |    CAST(sum(k) AS HUGEINT) AS s,
      |    CAST(sum(CAST(k AS HUGEINT) * k) AS HUGEINT) AS q,
      |    CAST(sum(CASE WHEN k = 0 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS zeros
      |  FROM pu)
      |SELECT CAST(n AS BIGINT) AS n_users,
      |  CAST(s AS BIGINT) AS total_purchases,
      |  zeros AS zero_users,
      |  CAST((s * 1000000) // n AS BIGINT) AS mean_micros,
      |  CAST(((n * q - s * s) * 1000000) // (n * n) AS BIGINT)
      |    AS var_micros,
      |  (n * q - s * s) > s * n AS overdispersed,
      |  CASE WHEN (n * q - s * s) > 0 THEN
      |    CAST((s * n * 1000000) // (n * q - s * s) AS BIGINT)
      |  END AS nb_p_micros,
      |  CASE WHEN (n * q - s * s) > s * n THEN
      |    CAST((s * s * 1000000) // (n * q - s * s - s * n) AS BIGINT)
      |  END AS nb_r_micros,
      |  CAST((zeros * 1000000) // n AS BIGINT) AS zero_ppm,
      |  round(exp(-(CAST(s AS DOUBLE) / CAST(n AS DOUBLE))), 6)
      |    AS poisson_zero_prob
      |FROM agg""".stripMargin

  /** Two-proportion readout with Wilson score intervals (Wilson, JASA
    * 1927 — the interval that behaves at small n and extreme rates,
    * unlike the Wald interval): per-variant conversion with exact
    * integer cells and identically spelled IEEE bounds at z = 1.96.
    */
  def abWilson(events: DataFrame): DataFrame = {
    val cells = events
      .groupBy(pmod(col("user_id"), lit(2)).cast("int").as("variant"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("y"))
    val z2 = lit(1.96 * 1.96)
    val nD = col("n").cast("double")
    val p = col("y").cast("double") / nD
    val denom = lit(1.0) + z2 / nD
    val center = (p + z2 / (lit(2.0) * nD)) / denom
    val half = lit(1.96) * sqrt(p * (lit(1.0) - p) / nD +
      z2 / (lit(4.0) * nD * nD)) / denom
    cells.select(
      col("variant"), col("n"), col("y"),
      expr("cast((y * 1000000) DIV n as bigint)").as("rate_micros"),
      round(center - half, 6).as("wilson_lo"),
      round(center + half, 6).as("wilson_hi"))
      .orderBy(col("variant"))
  }

  def abWilsonOracleSql: String = {
    // inject the Scala-computed doubles round-trip-exactly: the DuckDB
    // literal `3.8416` parses to a DIFFERENT double than 1.96*1.96
    // rounds to (EntityResolution's log-weight discipline)
    val z = java.lang.Double.toString(1.96)
    val z2 = java.lang.Double.toString(1.96 * 1.96)
    s"""WITH cells AS (
      |  SELECT CAST(user_id % 2 AS INTEGER) AS variant,
      |    CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS y
      |  FROM events GROUP BY 1)
      |SELECT variant, n, y,
      |  CAST((y * 1000000) // n AS BIGINT) AS rate_micros,
      |  round((CAST(y AS DOUBLE) / CAST(n AS DOUBLE)
      |      + $z2 / (2.0 * CAST(n AS DOUBLE)))
      |    / (1.0 + $z2 / CAST(n AS DOUBLE))
      |    - $z * sqrt(CAST(y AS DOUBLE) / CAST(n AS DOUBLE)
      |        * (1.0 - CAST(y AS DOUBLE) / CAST(n AS DOUBLE))
      |        / CAST(n AS DOUBLE)
      |      + $z2 / (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
      |      / (1.0 + $z2 / CAST(n AS DOUBLE)), 6) AS wilson_lo,
      |  round((CAST(y AS DOUBLE) / CAST(n AS DOUBLE)
      |      + $z2 / (2.0 * CAST(n AS DOUBLE)))
      |    / (1.0 + $z2 / CAST(n AS DOUBLE))
      |    + $z * sqrt(CAST(y AS DOUBLE) / CAST(n AS DOUBLE)
      |        * (1.0 - CAST(y AS DOUBLE) / CAST(n AS DOUBLE))
      |        / CAST(n AS DOUBLE)
      |      + $z2 / (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
      |      / (1.0 + $z2 / CAST(n AS DOUBLE)), 6) AS wilson_hi
      |FROM cells ORDER BY variant""".stripMargin
  }

  /** Propensity-score matching ATT (Rosenbaum & Rubin, Biometrika 1983;
    * 1-NN caliper matching WITH replacement): every treated user matches
    * the control user nearest in pre-period engagement within a caliper,
    * and ATT = mean(y_treated − y_matched_control) over matched pairs —
    * the observational-causal sibling of [[upliftDeciles]]' randomized
    * readout, sharing its leakage-free score/outcome split.
    *
    * Exactness: scores and outcomes are integers; the nearest-control
    * argmin uses max(struct(−|Δscore|, −control_id)) — deterministic
    * ties; ATT is a sign-separated floor-micros ratio of integer sums.
    *
    * Scale: matching is the repo's BANDED discipline — engagement bucket
    * `score DIV caliper`, treated rows equi-join control buckets
    * {b−1, b, b+1}, filter |Δ| ≤ caliper, per-treated argmin — never a
    * treated×control product. Candidates are bounded by caliper-band
    * occupancy (the quantity [[SkewStats]] profiles).
    */
  def psmAtt(events: DataFrame, postDays: Int = 7,
      caliper: Long = 10L): DataFrame = {
    val wEnd = events.agg(max(col("ts")).as("w_end"))
    val perUser = events
      .crossJoin(broadcast(wEnd))
      .withColumn("post_start",
        col("w_end") - expr(s"INTERVAL $postDays DAYS"))
      .groupBy(col("user_id"))
      .agg(
        sum(when(col("ts") < col("post_start"), 1L).otherwise(0L))
          .as("score"),
        max(when(col("ts") >= col("post_start") &&
          col("event_type") === "purchase", 1L).otherwise(0L))
          .as("y"))
      .withColumn("treated", pmod(col("user_id"), lit(2)).cast("int"))
      .withColumn("b", expr(s"score DIV $caliper"))
    val t = perUser.filter(col("treated") === 1)
      .select(col("user_id").as("tid"), col("score").as("ts_"),
        col("y").as("yt"), col("b"))
    val c = perUser.filter(col("treated") === 0)
      .select(col("user_id").as("cid"), col("score").as("cs"),
        col("y").as("yc"), col("b").as("cb"))
    val cand = Seq(-1L, 0L, 1L).map(d =>
      t.join(c, col("cb") === col("b") + d))
      .reduce(_ unionByName _)
      .filter(abs(col("cs") - col("ts_")) <= caliper)
    val matched = cand
      .groupBy(col("tid"), col("yt"))
      .agg(max(struct(
        (-abs(col("cs") - col("ts_"))).as("nd"),
        (-col("cid")).as("nc"),
        col("yc"))).as("m"))
      .select(col("tid"), col("yt"), col("m.yc").as("yc"),
        (-col("m.nd")).as("score_gap"))
    val nT = perUser.filter(col("treated") === 1)
      .agg(count(lit(1)).as("n_treated"))
    matched
      .agg(count(lit(1)).as("n_matched"),
        sum(col("yt")).as("sum_yt"), sum(col("yc")).as("sum_yc"),
        sum(col("score_gap")).as("sum_gap"))
      .crossJoin(broadcast(nT))
      .select(
        col("n_treated"), col("n_matched"), col("sum_yt"), col("sum_yc"),
        when(col("n_matched") > 0L,
          expr("(sum_gap * 1000000) DIV n_matched"))
          .as("mean_score_gap_micros"),
        when(col("n_matched") > 0L,
          when(col("sum_yt") >= col("sum_yc"),
            expr("((sum_yt - sum_yc) * 1000000) DIV n_matched"))
            .otherwise(-expr("((sum_yc - sum_yt) * 1000000)" +
              " DIV n_matched")))
          .as("att_micros"))
  }

  def psmOracleSql(postDays: Int = 7, caliper: Long = 10L): String =
    s"""WITH w AS (SELECT max(ts) - INTERVAL $postDays DAY AS post_start
       |  FROM events),
       |pu AS (
       |  SELECT user_id,
       |    CAST(sum(CASE WHEN ts < post_start THEN 1 ELSE 0 END)
       |      AS BIGINT) AS score,
       |    CAST(max(CASE WHEN ts >= post_start
       |      AND event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
       |      AS y,
       |    CAST(user_id % 2 AS INTEGER) AS treated
       |  FROM events, w GROUP BY user_id),
       |t AS (SELECT user_id AS tid, score AS ts_, y AS yt FROM pu
       |      WHERE treated = 1),
       |c AS (SELECT user_id AS cid, score AS cs, y AS yc FROM pu
       |      WHERE treated = 0),
       |m AS (
       |  SELECT tid, yt, yc, abs(cs - ts_) AS score_gap,
       |    row_number() OVER (PARTITION BY tid
       |      ORDER BY abs(cs - ts_), cid) AS rn
       |  FROM t JOIN c ON abs(cs - ts_) <= $caliper),
       |mm AS (SELECT tid, yt, yc, score_gap FROM m WHERE rn = 1),
       |agg AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_matched,
       |    CAST(sum(yt) AS BIGINT) AS sum_yt,
       |    CAST(sum(yc) AS BIGINT) AS sum_yc,
       |    CAST(sum(score_gap) AS BIGINT) AS sum_gap
       |  FROM mm)
       |SELECT
       |  (SELECT CAST(count(*) AS BIGINT) FROM t) AS n_treated,
       |  n_matched, sum_yt, sum_yc,
       |  CASE WHEN n_matched > 0 THEN
       |    CAST((sum_gap * 1000000) // n_matched AS BIGINT)
       |  END AS mean_score_gap_micros,
       |  CASE WHEN n_matched = 0 THEN NULL
       |    WHEN sum_yt >= sum_yc THEN
       |      CAST(((sum_yt - sum_yc) * 1000000) // n_matched AS BIGINT)
       |    ELSE -CAST(((sum_yc - sum_yt) * 1000000) // n_matched
       |      AS BIGINT)
       |  END AS att_micros
       |FROM agg""".stripMargin

  /** Cochran-Mantel-Haenszel pooled odds ratio (Mantel & Haenszel, JNCI
    * 1959) across the same day-of-week strata [[simpsonReversal]]
    * audits: the confounding-adjusted ESTIMATOR beside that audit's
    * sign check — OR_MH = Σ(a·d/n) / Σ(b·c/n) over per-stratum 2×2
    * conversion cells.
    *
    * Exactness: each stratum term is floor-micros of an exact integer
    * product over n (DECIMAL-widened; a·d·10⁶ overflows a long past
    * ~10⁹-event cells), the pooled ratio is one more floor DIV — no
    * float anywhere.
    *
    * Scale: the same 7×2 one-scan cell fold as the Simpson audit;
    * everything downstream is 7 rows.
    */
  def cmhPooledOdds(events: DataFrame): DataFrame = {
    val cells = events
      .select(
        (dayofweek(col("ts")) - 1).cast("long").as("dow"),
        pmod(col("user_id"), lit(2)).cast("int").as("v"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("y"))
      .groupBy(col("dow"))
      .agg(
        sum(when(col("v") === 0, 1L).otherwise(0L)).as("n0"),
        sum(when(col("v") === 0, col("y")).otherwise(lit(0L))).as("y0"),
        sum(when(col("v") === 1, 1L).otherwise(0L)).as("n1"),
        sum(when(col("v") === 1, col("y")).otherwise(lit(0L))).as("y1"))
    cells
      .select(
        expr("""cast((cast(y1 as decimal(38,0)) * (n0 - y0) * 1000000)
               |  DIV (n0 + n1) as decimal(38,0))""".stripMargin).as("r"),
        expr("""cast((cast(n1 - y1 as decimal(38,0)) * y0 * 1000000)
               |  DIV (n0 + n1) as decimal(38,0))""".stripMargin).as("s"))
      .agg(count(lit(1)).as("n_strata"),
        sum(col("r")).cast("decimal(38,0)").as("sum_r"),
        sum(col("s")).cast("decimal(38,0)").as("sum_s"))
      .select(
        col("n_strata"),
        col("sum_r").cast("bigint").as("sum_r_micros"),
        col("sum_s").cast("bigint").as("sum_s_micros"),
        // OR undefined when the denominator mass is 0
        when(col("sum_s") > 0,
          expr("cast((sum_r * 1000000) DIV sum_s as bigint)"))
          .as("cmh_or_micros"))
  }

  def cmhOracleSql: String =
    """WITH cells AS (
      |  SELECT CAST(dayofweek(ts) AS BIGINT) AS dow,
      |    CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
      |      AS BIGINT) AS n0,
      |    CAST(sum(CASE WHEN user_id % 2 = 0 AND event_type = 'purchase'
      |      THEN 1 ELSE 0 END) AS BIGINT) AS y0,
      |    CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END)
      |      AS BIGINT) AS n1,
      |    CAST(sum(CASE WHEN user_id % 2 = 1 AND event_type = 'purchase'
      |      THEN 1 ELSE 0 END) AS BIGINT) AS y1
      |  FROM events GROUP BY 1),
      |terms AS (
      |  SELECT
      |    (CAST(y1 AS HUGEINT) * (n0 - y0) * 1000000) // (n0 + n1) AS r,
      |    (CAST(n1 - y1 AS HUGEINT) * y0 * 1000000) // (n0 + n1) AS s
      |  FROM cells),
      |agg AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_strata,
      |    CAST(sum(r) AS HUGEINT) AS sum_r,
      |    CAST(sum(s) AS HUGEINT) AS sum_s
      |  FROM terms)
      |SELECT n_strata,
      |  CAST(sum_r AS BIGINT) AS sum_r_micros,
      |  CAST(sum_s AS BIGINT) AS sum_s_micros,
      |  CASE WHEN sum_s > 0 THEN
      |    CAST((sum_r * 1000000) // sum_s AS BIGINT)
      |  END AS cmh_or_micros
      |FROM agg""".stripMargin

  /** Delete-a-group jackknife variance for a RATIO metric (Quenouille
    * 1956; the "delete-a-group" form of Särndal et al. that large
    * experimentation platforms use for avg-order-value-style metrics,
    * where user-level ratios are biased): B user-hash buckets, per-bucket
    * leave-one-out ratio r_i = (S−s_i)/(N−n_i), and
    * v = (B−1)/B · Σ(r_i − r̄)².
    *
    * Exactness: bucket sums are integer cents/counts; each LOO ratio is
    * a floor-micros integer; r̄ and the variance come from Σr and Σr²
    * (exact decimal-widened integer sums) through ONE identically
    * spelled IEEE expression — v = (B−1)/B·(Σr² − B·r̄²) — so the
    * doubles agree bit-for-bit. The full-sample ratio and per-bucket
    * table stay integer.
    *
    * Scale: one scan folds the corpus to B buckets with map-side
    * combine; everything downstream is B rows.
    */
  def jackknifeRatio(events: DataFrame, buckets: Int = 20): DataFrame = {
    val cents = col("value").cast("decimal(18,2)") * lit(100)
    val byBucket = events
      .filter(col("event_type") === "purchase" && col("value").isNotNull)
      .groupBy(pmod(col("user_id"), lit(buckets.toLong)).as("b"))
      .agg(sum(cents).cast("decimal(38,0)").as("s"),
        count(lit(1)).as("n"))
    val tot = byBucket.agg(
      sum(col("s")).cast("decimal(38,0)").as("st"),
      sum(col("n")).cast("decimal(38,0)").as("nt"),
      count(lit(1)).as("nb"))
    val loo = byBucket.crossJoin(broadcast(tot))
      // LOO ratio in dollar-micros: cents·10^4 DIV count
      .withColumn("r", expr(
        "cast(((st - s) * 10000) DIV (nt - n) as bigint)"))
    val agg = loo.agg(
      first(col("st")).as("st"), first(col("nt")).as("nt"),
      first(col("nb")).cast("double").as("bd"),
      sum(col("r")).cast("decimal(38,0)").as("sr"),
      sum(col("r").cast("decimal(38,0)") * col("r"))
        .cast("decimal(38,0)").as("srr"))
    val rbar = col("sr").cast("double") / col("bd")
    val v = (col("bd") - lit(1.0)) / col("bd") *
      (col("srr").cast("double") - col("bd") * rbar * rbar)
    agg.select(
      col("nt").cast("bigint").as("n_purchases"),
      col("st").cast("bigint").as("sum_cents"),
      expr("cast((st * 10000) DIV nt as bigint)").as("ratio_micros"),
      col("bd").cast("bigint").as("n_buckets"),
      round(rbar, 4).as("loo_mean_micros"),
      round(v, 4).as("jk_var"),
      round(sqrt(v), 4).as("jk_se"))
  }

  def jackknifeOracleSql(buckets: Int = 20): String =
    s"""WITH bb AS (
       |  SELECT user_id % $buckets AS b,
       |    CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
       |      AS HUGEINT) AS s,
       |    CAST(count(*) AS HUGEINT) AS n
       |  FROM events WHERE event_type = 'purchase' AND value IS NOT NULL
       |  GROUP BY 1),
       |tot AS (
       |  SELECT sum(s) AS st, sum(n) AS nt,
       |    CAST(count(*) AS BIGINT) AS nb
       |  FROM bb),
       |loo AS (
       |  SELECT CAST(((st - s) * 10000) // (nt - n) AS BIGINT) AS r,
       |    st, nt, nb
       |  FROM bb, tot),
       |agg AS (
       |  SELECT any_value(st) AS st, any_value(nt) AS nt,
       |    CAST(any_value(nb) AS DOUBLE) AS bd,
       |    CAST(sum(r) AS HUGEINT) AS sr,
       |    CAST(sum(CAST(r AS HUGEINT) * r) AS HUGEINT) AS srr
       |  FROM loo)
       |SELECT CAST(nt AS BIGINT) AS n_purchases,
       |  CAST(st AS BIGINT) AS sum_cents,
       |  CAST((st * 10000) // nt AS BIGINT) AS ratio_micros,
       |  CAST(bd AS BIGINT) AS n_buckets,
       |  round(CAST(sr AS DOUBLE) / bd, 4) AS loo_mean_micros,
       |  round((bd - 1.0) / bd *
       |    (CAST(srr AS DOUBLE) - bd * (CAST(sr AS DOUBLE) / bd)
       |      * (CAST(sr AS DOUBLE) / bd)), 4) AS jk_var,
       |  round(sqrt((bd - 1.0) / bd *
       |    (CAST(srr AS DOUBLE) - bd * (CAST(sr AS DOUBLE) / bd)
       |      * (CAST(sr AS DOUBLE) / bd))), 4) AS jk_se
       |FROM agg""".stripMargin

  /** Uplift decile table (Radcliffe, "Using control groups to target on
    * predicted lift" 2007): users ranked by an engagement score,
    * ntile(10)-bucketed, and each decile's treated-vs-control conversion
    * lift reported with cumulative (Qini-curve) sums — the standard
    * readout for "does targeting the top deciles actually lift
    * conversions".
    *
    * Exactness: conversions and cell counts are integers; per-decile and
    * cumulative uplifts are differences of floor-micros rates. Deciles
    * ride [[DistributedRank.withRankStats]]' exact ntile (bit-identical
    * to the window function, no single-task global sort — same machinery
    * as `customer_spend_quartiles`); the cumulative window runs over the
    * 10-row decile frame only. Caller releases via
    * DistributedRank.release.
    */
  def upliftDeciles(events: DataFrame, postDays: Int = 7): DataFrame = {
    // score period = everything before the final `postDays`; outcome =
    // converted IN the final window. Splitting the axes keeps the
    // ranking score leakage-free (an "ever purchased" outcome is 1 for
    // nearly every active user and the curve degenerates to zero).
    val wEnd = events.agg(max(col("ts")).as("w_end"))
    val perUser = events
      .crossJoin(broadcast(wEnd))
      .withColumn("post_start",
        col("w_end") - expr(s"INTERVAL $postDays DAYS"))
      .groupBy(col("user_id"))
      .agg(
        sum(when(col("ts") < col("post_start"), 1L).otherwise(0L))
          .as("engagement"),
        max(when(col("ts") >= col("post_start") &&
          col("event_type") === "purchase", 1L).otherwise(0L))
          .as("converted"))
      .withColumn("treated", pmod(col("user_id"), lit(2)).cast("int"))
    val tiled = DistributedRank.withRankStats(
      perUser, Seq((-col("engagement")).as("neg"), col("user_id")),
      10, "decile", "__pct", "__cume")
    val byDecile = tiled
      .groupBy(col("decile"))
      .agg(
        sum(when(col("treated") === 1, 1L).otherwise(0L)).as("n_t"),
        sum(when(col("treated") === 1, col("converted")).otherwise(0L))
          .as("y_t"),
        sum(when(col("treated") === 0, 1L).otherwise(0L)).as("n_c"),
        sum(when(col("treated") === 0, col("converted")).otherwise(0L))
          .as("y_c"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("decile"))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, 0)
    byDecile
      .withColumn("cyt", sum(col("y_t")).over(w))
      .withColumn("cnt_", sum(col("n_t")).over(w))
      .withColumn("cyc", sum(col("y_c")).over(w))
      .withColumn("cnc", sum(col("n_c")).over(w))
      .select(
        col("decile"), col("n_t"), col("y_t"), col("n_c"), col("y_c"),
        when(col("n_t") > 0L && col("n_c") > 0L,
          expr("(y_t * 1000000) DIV n_t - (y_c * 1000000) DIV n_c"))
          .as("uplift_micros"),
        when(col("cnt_") > 0L && col("cnc") > 0L,
          expr("(cyt * 1000000) DIV cnt_ - (cyc * 1000000) DIV cnc"))
          .as("cum_uplift_micros"))
      .orderBy(col("decile"))
  }

  def upliftOracleSql(postDays: Int = 7): String =
    s"""WITH w AS (SELECT max(ts) - INTERVAL $postDays DAY AS post_start
      |  FROM events),
      |pu AS (
      |  SELECT user_id,
      |    CAST(sum(CASE WHEN ts < post_start THEN 1 ELSE 0 END)
      |      AS BIGINT) AS engagement,
      |    CAST(max(CASE WHEN ts >= post_start AND event_type = 'purchase'
      |      THEN 1 ELSE 0 END) AS BIGINT) AS converted,
      |    CAST(user_id % 2 AS INTEGER) AS treated
      |  FROM events, w GROUP BY user_id),
      |tiled AS (
      |  SELECT *, CAST(ntile(10) OVER (ORDER BY -engagement, user_id)
      |    AS INTEGER) AS decile
      |  FROM pu),
      |d AS (
      |  SELECT decile,
      |    CAST(sum(CASE WHEN treated = 1 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_t,
      |    CAST(sum(CASE WHEN treated = 1 THEN converted ELSE 0 END)
      |      AS BIGINT) AS y_t,
      |    CAST(sum(CASE WHEN treated = 0 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_c,
      |    CAST(sum(CASE WHEN treated = 0 THEN converted ELSE 0 END)
      |      AS BIGINT) AS y_c
      |  FROM tiled GROUP BY decile),
      |c AS (
      |  SELECT *,
      |    sum(y_t) OVER wd AS cyt, sum(n_t) OVER wd AS cnt_,
      |    sum(y_c) OVER wd AS cyc, sum(n_c) OVER wd AS cnc
      |  FROM d
      |  WINDOW wd AS (ORDER BY decile ROWS BETWEEN UNBOUNDED PRECEDING
      |    AND CURRENT ROW))
      |SELECT decile, n_t, y_t, n_c, y_c,
      |  CASE WHEN n_t > 0 AND n_c > 0 THEN
      |    CAST((y_t * 1000000) // n_t - (y_c * 1000000) // n_c AS BIGINT)
      |  END AS uplift_micros,
      |  CASE WHEN cnt_ > 0 AND cnc > 0 THEN
      |    CAST((cyt * 1000000) // cnt_ - (cyc * 1000000) // cnc AS BIGINT)
      |  END AS cum_uplift_micros
      |FROM c ORDER BY decile""".stripMargin

  /** Simpson's-paradox audit (Simpson, JRSS-B 1951; Bickel et al.,
    * Science 1975 shape) of the variant conversion comparison: the sign
    * of p₁ − p₀ per day-of-week stratum vs the pooled sign, flagging
    * strata whose direction REVERSES under aggregation — the classic
    * confounding symptom an experiment readout must surface before
    * anyone trusts the pooled lift.
    *
    * Exactness: rate comparisons never divide — sign(p₁ − p₀) =
    * sign(y₁·n₀ − y₀·n₁) on decimal-widened integer cells (the cross
    * product overflows a long near 10⁹ events per cell).
    *
    * Scale: one scan folds the corpus to 7×2 cells with map-side
    * combine; everything downstream is constant-size.
    */
  def simpsonReversal(events: DataFrame): DataFrame = {
    val cells = events
      .select(
        (dayofweek(col("ts")) - 1).cast("long").as("dow"),
        pmod(col("user_id"), lit(2)).cast("int").as("v"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("y"))
    val strata = cells.groupBy(col("dow"))
      .agg(
        sum(when(col("v") === 0, 1L).otherwise(0L)).as("n0"),
        sum(when(col("v") === 0, col("y")).otherwise(lit(0L))).as("y0"),
        sum(when(col("v") === 1, 1L).otherwise(0L)).as("n1"),
        sum(when(col("v") === 1, col("y")).otherwise(lit(0L))).as("y1"))
      .select(col("dow").cast("string").as("stratum"),
        col("n0"), col("y0"), col("n1"), col("y1"))
    val agg = strata.agg(
      sum(col("n0")).as("n0"), sum(col("y0")).as("y0"),
      sum(col("n1")).as("n1"), sum(col("y1")).as("y1"))
      .select(lit("__agg__").as("stratum"), col("n0"), col("y0"),
        col("n1"), col("y1"))
    val signed = strata.unionByName(agg)
      .withColumn("rate_diff_sign",
        signum((col("y1").cast("decimal(38,0)") * col("n0") -
          col("y0").cast("decimal(38,0)") * col("n1")).cast("double"))
          .cast("int"))
    val aggSign = signed.filter(col("stratum") === "__agg__")
      .select(col("rate_diff_sign").as("agg_sign"))
    signed.crossJoin(broadcast(aggSign))
      .select(col("stratum"), col("n0"), col("y0"), col("n1"), col("y1"),
        col("rate_diff_sign"),
        (col("stratum") =!= "__agg__" && col("rate_diff_sign") =!= 0 &&
          col("agg_sign") =!= 0 &&
          col("rate_diff_sign") === -col("agg_sign"))
          .as("reversed_vs_agg"))
      .orderBy(col("stratum"))
  }

  def simpsonOracleSql: String =
    """WITH cells AS (
      |  SELECT CAST(dayofweek(ts) AS BIGINT) AS dow,
      |    CAST(user_id % 2 AS INTEGER) AS v,
      |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      |  FROM events),
      |strata AS (
      |  SELECT CAST(dow AS VARCHAR) AS stratum,
      |    CAST(sum(CASE WHEN v = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
      |    CAST(sum(CASE WHEN v = 0 THEN y ELSE 0 END) AS BIGINT) AS y0,
      |    CAST(sum(CASE WHEN v = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
      |    CAST(sum(CASE WHEN v = 1 THEN y ELSE 0 END) AS BIGINT) AS y1
      |  FROM cells GROUP BY dow
      |  UNION ALL
      |  SELECT '__agg__',
      |    CAST(sum(CASE WHEN v = 0 THEN 1 ELSE 0 END) AS BIGINT),
      |    CAST(sum(CASE WHEN v = 0 THEN y ELSE 0 END) AS BIGINT),
      |    CAST(sum(CASE WHEN v = 1 THEN 1 ELSE 0 END) AS BIGINT),
      |    CAST(sum(CASE WHEN v = 1 THEN y ELSE 0 END) AS BIGINT)
      |  FROM cells),
      |signed AS (
      |  SELECT *, CAST(sign(CAST(CAST(y1 AS HUGEINT) * n0
      |    - CAST(y0 AS HUGEINT) * n1 AS DOUBLE)) AS INTEGER)
      |    AS rate_diff_sign
      |  FROM strata),
      |a AS (SELECT rate_diff_sign AS agg_sign FROM signed
      |      WHERE stratum = '__agg__')
      |SELECT stratum, n0, y0, n1, y1, rate_diff_sign,
      |  (stratum <> '__agg__' AND rate_diff_sign <> 0 AND agg_sign <> 0
      |   AND rate_diff_sign = -agg_sign) AS reversed_vs_agg
      |FROM signed, a
      |ORDER BY stratum""".stripMargin

  /** Difference-in-differences readout (Card & Krueger, AER 1994 shape)
    * on per-user purchase value across the same pre/post split CUPED
    * uses: DiD = (post₁ − pre₁) − (post₀ − pre₀) over per-variant user
    * means. Everything is exact: per-user period sums are integer cents,
    * per-variant means are dollar-micros via `(Σcents·10⁴) DIV n`, and
    * the estimate is a four-term integer subtraction of those micros —
    * no float anywhere.
    *
    * Scale: identical to [[cupedAdjust]] — one corpus scan to per-user
    * (pre, post) cents with map-side combine, then a single conditional
    * aggregate to one row.
    */
  def diffInDiff(events: DataFrame,
      preEnd: String = "2024-01-08 00:00:00"): DataFrame = {
    val cents = col("value").cast("decimal(18,2)") * lit(100)
    val perUser = events
      .filter(col("event_type") === "purchase" && col("value").isNotNull)
      .groupBy(col("user_id"))
      .agg(
        sum(when(col("ts") < to_timestamp(lit(preEnd)), cents)
          .otherwise(lit(0))).cast("decimal(38,0)").as("x"),
        sum(when(col("ts") >= to_timestamp(lit(preEnd)), cents)
          .otherwise(lit(0))).cast("decimal(38,0)").as("y"))
      .withColumn("v", pmod(col("user_id"), lit(2)).cast("int"))
    def side(v: Int, c: String) =
      sum(when(col("v") === v, col(c)).otherwise(lit(0)))
        .cast("decimal(38,0)")
    perUser
      .agg(
        sum(when(col("v") === 0, 1L).otherwise(0L)).as("n0"),
        sum(when(col("v") === 1, 1L).otherwise(0L)).as("n1"),
        side(0, "x").as("sx0"), side(0, "y").as("sy0"),
        side(1, "x").as("sx1"), side(1, "y").as("sy1"))
      .select(
        col("n0"), col("n1"),
        expr("cast((sx0 * 10000) DIV n0 as bigint)").as("pre0_micros"),
        expr("cast((sy0 * 10000) DIV n0 as bigint)").as("post0_micros"),
        expr("cast((sx1 * 10000) DIV n1 as bigint)").as("pre1_micros"),
        expr("cast((sy1 * 10000) DIV n1 as bigint)").as("post1_micros"))
      .withColumn("did_micros",
        (col("post1_micros") - col("pre1_micros")) -
          (col("post0_micros") - col("pre0_micros")))
  }

  def diffInDiffOracleSql(preEnd: String = "2024-01-08 00:00:00"): String =
    s"""WITH pu AS (
       |  SELECT user_id,
       |    CAST(sum(CASE WHEN ts < TIMESTAMP '$preEnd'
       |      THEN CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
       |      ELSE 0 END) AS HUGEINT) AS x,
       |    CAST(sum(CASE WHEN ts >= TIMESTAMP '$preEnd'
       |      THEN CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
       |      ELSE 0 END) AS HUGEINT) AS y,
       |    CAST(user_id % 2 AS INTEGER) AS v
       |  FROM events WHERE event_type = 'purchase' AND value IS NOT NULL
       |  GROUP BY user_id),
       |agg AS (
       |  SELECT
       |    CAST(sum(CASE WHEN v = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
       |    CAST(sum(CASE WHEN v = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
       |    sum(CASE WHEN v = 0 THEN x ELSE 0 END) AS sx0,
       |    sum(CASE WHEN v = 0 THEN y ELSE 0 END) AS sy0,
       |    sum(CASE WHEN v = 1 THEN x ELSE 0 END) AS sx1,
       |    sum(CASE WHEN v = 1 THEN y ELSE 0 END) AS sy1
       |  FROM pu),
       |m AS (
       |  SELECT n0, n1,
       |    CAST((sx0 * 10000) // n0 AS BIGINT) AS pre0_micros,
       |    CAST((sy0 * 10000) // n0 AS BIGINT) AS post0_micros,
       |    CAST((sx1 * 10000) // n1 AS BIGINT) AS pre1_micros,
       |    CAST((sy1 * 10000) // n1 AS BIGINT) AS post1_micros
       |  FROM agg)
       |SELECT n0, n1, pre0_micros, post0_micros, pre1_micros, post1_micros,
       |  (post1_micros - pre1_micros) - (post0_micros - pre0_micros)
       |    AS did_micros
       |FROM m""".stripMargin

  /** Mann-Whitney U rank test (Mann & Whitney, Ann. Math. Stat. 1947)
    * comparing purchase values between the two hash variants — the
    * nonparametric A/B readout a measurement pipeline runs when value
    * distributions are heavy-tailed enough that the t-statistic behind
    * CUPED is untrustworthy. Midrank tie handling, exact tie-corrected
    * variance.
    *
    * Exactness: everything until the final z is integer. Doubled rank
    * sums keep midranks integral (2·avgrank of a tie group member =
    * 2·n_less + t + 1); the tie term Σ(t³−t) and the rank-biserial
    * effect size (micros, sign-separated magnitude DIV — Spark DIV
    * truncates where DuckDB `//` floors) are exact; z is one identically
    * spelled IEEE expression over those integers on both engines.
    *
    * Scale: observation ranks ride [[DistributedRank]]'s
    * range-partitioned rank (no single-partition window over the value
    * axis — n_less(v) = min rank of v's tie group − 1, a distributed
    * groupBy over distinct values, never a global prefix-sum task).
    * Caller releases the pinned ranked frame via DistributedRank.release
    * (Verify/Bench already do).
    */
  def mannWhitney(events: DataFrame): DataFrame = {
    val obs = events
      .filter(col("event_type") === "purchase" && col("value").isNotNull)
      .select(
        (col("value").cast("decimal(18,2)") * 100).cast("bigint").as("v"),
        pmod(col("user_id"), lit(2)).cast("int").as("g"),
        col("event_id"))
    val ranked = DistributedRank.withGlobalRank(
      obs, Seq(col("v"), col("event_id")), "rk")
    val grp = ranked
      .groupBy(col("v"))
      .agg(
        count(lit(1)).as("cnt"),
        sum(when(col("g") === 1, 1L).otherwise(0L)).as("cnt1"),
        (min(col("rk")) - 1L).as("nless"))
    val agg = grp.agg(
      sum(col("cnt") - col("cnt1")).cast("decimal(38,0)").as("n0"),
      sum(col("cnt1")).cast("decimal(38,0)").as("n1"),
      // operands widened BEFORE the product: cnt1·(2·n_less + t + 1) is
      // O(N²) and overflows a long past ~3B observations
      sum(col("cnt1").cast("decimal(38,0)") *
        (col("nless").cast("decimal(38,0)") * 2L + col("cnt") + 1L))
        .cast("decimal(38,0)").as("two_r1"),
      sum(col("cnt").cast("decimal(38,0)") * col("cnt") * col("cnt")
        - col("cnt")).cast("decimal(38,0)").as("tie_cubes"))
    val nD = (col("n0") + col("n1")).cast("double")
    val varD = col("n0").cast("double") * col("n1").cast("double") /
      lit(12.0) *
      ((nD + lit(1.0)) - col("tie_cubes").cast("double") /
        (nD * (nD - lit(1.0))))
    agg
      .withColumn("u1_x2", col("two_r1") - col("n1") * (col("n1") + 1L))
      .withColumn("num", col("u1_x2") - col("n0") * col("n1"))
      .select(
        col("n0").cast("bigint").as("n0"),
        col("n1").cast("bigint").as("n1"),
        col("two_r1").cast("bigint").as("r1_x2"),
        col("u1_x2").cast("bigint").as("u1_x2"),
        col("tie_cubes").cast("bigint").as("tie_cubes"),
        when(col("num") >= 0,
          expr("(num * 1000000) DIV (n0 * n1)"))
          .otherwise(-expr("((-num) * 1000000) DIV (n0 * n1)"))
          .cast("bigint").as("rank_biserial_micros"),
        // z undefined when every observation ties (variance 0) or a
        // group is empty — NULL, not NaN/Inf
        when(col("n0") > 0 && col("n1") > 0 && varD > lit(0.0),
          round(col("num").cast("double") / (lit(2.0) * sqrt(varD)), 6))
          .as("z"))
  }

  def mannWhitneyOracleSql: String =
    """WITH obs AS (
      |  SELECT CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v,
      |    CAST(user_id % 2 AS INTEGER) AS g, event_id
      |  FROM events WHERE event_type = 'purchase' AND value IS NOT NULL),
      |grp AS (
      |  SELECT v, CAST(count(*) AS BIGINT) AS cnt,
      |    CAST(sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cnt1
      |  FROM obs GROUP BY v),
      |w AS (
      |  SELECT v, cnt, cnt1,
      |    CAST(sum(cnt) OVER (ORDER BY v) - cnt AS HUGEINT) AS nless
      |  FROM grp),
      |agg AS (
      |  SELECT CAST(sum(cnt - cnt1) AS HUGEINT) AS n0,
      |    CAST(sum(cnt1) AS HUGEINT) AS n1,
      |    CAST(sum(CAST(cnt1 AS HUGEINT) * (nless * 2 + cnt + 1))
      |      AS HUGEINT) AS two_r1,
      |    CAST(sum(CAST(cnt AS HUGEINT) * cnt * cnt - cnt) AS HUGEINT)
      |      AS tie_cubes
      |  FROM w),
      |d AS (
      |  SELECT *, two_r1 - n1 * (n1 + 1) AS u1_x2,
      |    two_r1 - n1 * (n1 + 1) - n0 * n1 AS num,
      |    CAST(n0 + n1 AS DOUBLE) AS nd
      |  FROM agg)
      |SELECT CAST(n0 AS BIGINT) AS n0, CAST(n1 AS BIGINT) AS n1,
      |  CAST(two_r1 AS BIGINT) AS r1_x2,
      |  CAST(u1_x2 AS BIGINT) AS u1_x2,
      |  CAST(tie_cubes AS BIGINT) AS tie_cubes,
      |  CAST(CASE WHEN num >= 0 THEN (num * 1000000) // (n0 * n1)
      |       ELSE -(((-num) * 1000000) // (n0 * n1)) END AS BIGINT)
      |    AS rank_biserial_micros,
      |  CASE WHEN n0 > 0 AND n1 > 0 AND
      |      CAST(n0 AS DOUBLE) * CAST(n1 AS DOUBLE) / 12.0 *
      |        ((nd + 1.0) - CAST(tie_cubes AS DOUBLE) / (nd * (nd - 1.0)))
      |        > 0.0
      |    THEN round(CAST(num AS DOUBLE) /
      |      (2.0 * sqrt(CAST(n0 AS DOUBLE) * CAST(n1 AS DOUBLE) / 12.0 *
      |        ((nd + 1.0) - CAST(tie_cubes AS DOUBLE) / (nd * (nd - 1.0))))),
      |      6)
      |  END AS z
      |FROM d""".stripMargin

  def conformalOracleSql(alphaPpm: Long = 100000L): String =
    s"""WITH pd AS (
       |  SELECT doc_id, source,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens,
       |    CAST(n_chars AS BIGINT) AS chars,
       |    doc_id % 2 AS fold
       |  FROM documents),
       |fit AS (
       |  SELECT CAST(sum(tokens) * 1000000 // sum(chars) AS BIGINT)
       |    AS rate_micros, CAST(count(*) AS BIGINT) AS n_cal
       |  FROM pd WHERE fold = 0),
       |calr AS (
       |  SELECT abs(tokens - (chars * rate_micros) // 1000000) AS r, doc_id,
       |    n_cal, rate_micros
       |  FROM pd, fit WHERE fold = 0),
       |q AS (
       |  SELECT max(CASE WHEN rk = k THEN r END) AS qhat,
       |    any_value(n_cal) AS n_cal, any_value(rate_micros) AS rate_micros
       |  FROM (SELECT r, n_cal, rate_micros,
       |          row_number() OVER (ORDER BY r, doc_id) AS rk,
       |          ((n_cal + 1) * (1000000 - $alphaPpm) + 999999) // 1000000
       |            AS k
       |        FROM calr) t),
       |tr AS (
       |  SELECT source,
       |    CASE WHEN qhat IS NULL THEN 1
       |         WHEN abs(tokens - (chars * rate_micros) // 1000000) <= qhat
       |      THEN 1 ELSE 0 END AS covered,
       |    qhat, n_cal, rate_micros
       |  FROM pd, q WHERE fold = 1),
       |by_src AS (
       |  SELECT source, any_value(n_cal) AS n_cal,
       |    CAST(count(*) AS BIGINT) AS n_test,
       |    any_value(rate_micros) AS rate_micros, any_value(qhat) AS qhat,
       |    CAST(sum(covered) AS BIGINT) AS covered
       |  FROM tr GROUP BY source
       |  UNION ALL
       |  SELECT '__all__', any_value(n_cal), CAST(count(*) AS BIGINT),
       |    any_value(rate_micros), any_value(qhat),
       |    CAST(coalesce(sum(covered), 0) AS BIGINT)
       |  FROM tr)
       |SELECT source, n_cal, n_test, rate_micros, qhat, covered,
       |  CASE WHEN n_test > 0
       |    THEN CAST(covered * 1000000 // n_test AS BIGINT)
       |  END AS coverage_ppm
       |FROM by_src ORDER BY source""".stripMargin

  /** Beta-binomial empirical-Bayes shrinkage (Robbins 1956; the
    * method-of-moments variant of Efron–Morris JASA 1975): small-cohort
    * conversion rates are noisy — shrink each cohort's rate toward the
    * population prior with strength proportional to the prior's
    * pseudo-count mass M = α+β. The prior is fit by MoM on the per-USER
    * rate population (mean m, variance v → M = m(1−m)/v − 1), then each
    * user-id cohort publishes raw and shrunken rates. The everyday use:
    * ranking many small segments/sources by rate without the tiny ones
    * dominating through noise.
    *
    * Exactness: per-user rates are floor-micros integers; their moments
    * are exact decimal sums; m, v, M, α, β and the shrunken rate are a
    * chain of nested floor DIVs at fixed points — spelled identically in
    * DuckDB HUGEINT, so every published integer is bit-equal. (The MoM
    * chain on the floored-rate population IS the estimator, on both
    * engines — no float in the pipeline.)
    *
    * Scale: one user-keyed aggregate (map-side combined), one global
    * moment fold, one cohort aggregate — all shuffles on bounded keys;
    * the prior is a 1-row broadcast.
    */
  def ebShrinkage(events: DataFrame, cohorts: Int = 8): DataFrame = {
    val perUser = events
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("x"))
      .select(col("user_id"), col("n"), col("x"),
        expr("(x * 1000000) DIV n").as("r"))
    val prior = perUser.agg(
      count(lit(1)).cast("decimal(38,0)").as("u"),
      sum(col("r")).cast("decimal(38,0)").as("sr"),
      sum(col("r").cast("decimal(38,0)") * col("r")).cast("decimal(38,0)")
        .as("sq"))
      .select(
        expr("cast(sr DIV u as decimal(38,0))").as("m"),
        expr("cast(CASE WHEN u > 1 THEN (u * sq - sr * sr) DIV (u * (u - 1))"
          + " ELSE 0 END as decimal(38,0))").as("v"),
        col("u"))
      .select(col("u"), col("m"), col("v"),
        expr("cast(CASE WHEN v > 0"
          + " THEN m * (1000000 - m) * 1000000 DIV v - 1000000"
          + " ELSE NULL END as decimal(38,0))").as("mm"))
      .select(col("u"), col("m"), col("v"),
        when(col("mm") > 0, col("mm")).as("mm"))
      .select(col("u"), col("m"), col("v"), col("mm"),
        expr("cast(m * mm DIV 1000000 as decimal(38,0))").as("alpha"),
        expr("cast((1000000 - m) * mm DIV 1000000 as decimal(38,0))")
          .as("beta"))
    val bySeg = perUser
      .groupBy(pmod(col("user_id"), lit(cohorts.toLong)).as("cohort"))
      .agg(
        count(lit(1)).as("n_users"),
        sum(col("n")).cast("decimal(38,0)").as("n_events"),
        sum(col("x")).cast("decimal(38,0)").as("purchases"))
    bySeg.crossJoin(broadcast(prior))
      .select(
        col("cohort"),
        col("n_users"),
        col("n_events").cast("bigint").as("n_events"),
        col("purchases").cast("bigint").as("purchases"),
        expr("cast((purchases * 1000000) DIV n_events as bigint)")
          .as("raw_micros"),
        expr("cast(m as bigint)").as("prior_mean_micros"),
        expr("cast(mm as bigint)").as("prior_strength_micros"),
        expr("cast(alpha as bigint)").as("alpha_micros"),
        expr("cast(beta as bigint)").as("beta_micros"),
        expr("cast((purchases * 1000000 + alpha) * 1000000" +
          " DIV (n_events * 1000000 + alpha + beta) as bigint)")
          .as("shrunk_micros"))
      .orderBy(col("cohort"))
  }

  def ebShrinkageOracleSql(cohorts: Int = 8): String =
    s"""WITH pu AS (
       |  SELECT user_id, CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
       |      AS BIGINT) AS x
       |  FROM events GROUP BY user_id),
       |pr AS (SELECT user_id, n, x, (x * 1000000) // n AS r FROM pu),
       |mo AS (
       |  SELECT CAST(count(*) AS HUGEINT) AS u,
       |    CAST(sum(r) AS HUGEINT) AS sr,
       |    CAST(sum(CAST(r AS HUGEINT) * r) AS HUGEINT) AS sq
       |  FROM pr),
       |m1 AS (
       |  SELECT u, sr // u AS m,
       |    CASE WHEN u > 1 THEN (u * sq - sr * sr) // (u * (u - 1))
       |      ELSE 0 END AS v
       |  FROM mo),
       |m2 AS (
       |  SELECT u, m, v,
       |    CASE WHEN v > 0
       |      THEN m * (1000000 - m) * 1000000 // v - 1000000 END AS mm0
       |  FROM m1),
       |m3 AS (
       |  SELECT u, m, v, CASE WHEN mm0 > 0 THEN mm0 END AS mm FROM m2),
       |pri AS (
       |  SELECT u, m, v, mm,
       |    m * mm // 1000000 AS alpha,
       |    (1000000 - m) * mm // 1000000 AS beta
       |  FROM m3),
       |seg AS (
       |  SELECT user_id % $cohorts AS cohort,
       |    CAST(count(*) AS BIGINT) AS n_users,
       |    CAST(sum(n) AS HUGEINT) AS n_events,
       |    CAST(sum(x) AS HUGEINT) AS purchases
       |  FROM pr GROUP BY 1)
       |SELECT s.cohort, s.n_users,
       |  CAST(s.n_events AS BIGINT) AS n_events,
       |  CAST(s.purchases AS BIGINT) AS purchases,
       |  CAST((s.purchases * 1000000) // s.n_events AS BIGINT)
       |    AS raw_micros,
       |  CAST(p.m AS BIGINT) AS prior_mean_micros,
       |  CAST(p.mm AS BIGINT) AS prior_strength_micros,
       |  CAST(p.alpha AS BIGINT) AS alpha_micros,
       |  CAST(p.beta AS BIGINT) AS beta_micros,
       |  CAST((s.purchases * 1000000 + p.alpha) * 1000000
       |    // (s.n_events * 1000000 + p.alpha + p.beta) AS BIGINT)
       |    AS shrunk_micros
       |FROM seg s, pri p
       |ORDER BY s.cohort""".stripMargin

  /** Neyman optimal stratified-sampling allocation (Neyman, JRSS 1934):
    * given a fixed label/inspection budget B, allocate draws across
    * strata ∝ N_h·σ_h — the allocation that minimizes the stratified
    * estimator's variance. The pipeline use: deciding how many docs per
    * source (or rows per event type) to route to human QA.
    *
    * Exactness: N_h·σ_h = √(N_h·Σc² − (Σc)²) EXACTLY (the N_h factors
    * cancel), so each weight is one floor(sqrt(cast-to-double)) of an
    * exact integer — correctly-rounded on both engines — and the
    * apportionment is pure-integer largest-remainder (Hamilton) rounding:
    * base = ⌊B·w_h/W⌋, the B − Σbase leftovers go to the largest
    * remainders (stratum name breaking ties), so allocations sum to B
    * exactly.
    *
    * Scale: one stratum-keyed moment aggregate; the apportionment frame
    * is |strata| rows.
    */
  def neymanAllocation(events: DataFrame, budget: Long = 10000L): DataFrame = {
    val cents = (col("value").cast("decimal(18,2)") * 100).cast("bigint")
    val strata = events
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).cast("decimal(38,0)").as("n"),
        sum(cents).cast("decimal(38,0)").as("s"),
        sum(cents.cast("decimal(38,0)") * cents).cast("decimal(38,0)")
          .as("q"))
      .select(col("event_type"), col("n"),
        expr("cast(floor(sqrt(cast(n * q - s * s as double))) as bigint)")
          .as("w"))
    val tot = strata.agg(sum(col("w")).cast("decimal(38,0)").as("tw"))
    val based = strata.crossJoin(broadcast(tot))
      .select(col("event_type"), col("n").cast("bigint").as("n_rows"),
        col("w").as("weight"),
        expr(s"cast(($budget * w) DIV tw as bigint)").as("base"),
        expr(s"cast(($budget * w) % tw as bigint)").as("rem"))
    val leftover = based.agg(
      (lit(budget) - sum(col("base"))).as("leftover"))
    val byRem = org.apache.spark.sql.expressions.Window
      .orderBy(col("rem").desc, col("event_type"))
    based.crossJoin(broadcast(leftover))
      .withColumn("rk", row_number().over(byRem))
      .select(col("event_type"), col("n_rows"), col("weight"),
        col("base"),
        (col("base") + when(col("rk") <= col("leftover"), 1L)
          .otherwise(0L)).as("alloc"))
      .orderBy(col("event_type"))
  }

  def neymanAllocationOracleSql(budget: Long = 10000L): String =
    s"""WITH st AS (
       |  SELECT event_type,
       |    CAST(count(*) AS HUGEINT) AS n,
       |    CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
       |      AS HUGEINT) AS s,
       |    CAST(sum(CAST(CAST(CAST(value AS DECIMAL(18,2)) * 100
       |      AS BIGINT) AS HUGEINT)
       |      * CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
       |      AS HUGEINT) AS q
       |  FROM events GROUP BY 1),
       |wt AS (
       |  SELECT event_type, n,
       |    CAST(floor(sqrt(CAST(n * q - s * s AS DOUBLE))) AS BIGINT)
       |      AS w
       |  FROM st),
       |tw AS (SELECT CAST(sum(w) AS HUGEINT) AS tw FROM wt),
       |based AS (
       |  SELECT event_type, CAST(n AS BIGINT) AS n_rows, w AS weight,
       |    CAST(($budget * w) // tw AS BIGINT) AS base,
       |    CAST(($budget * w) % tw AS BIGINT) AS rem
       |  FROM wt, tw),
       |lo AS (SELECT $budget - sum(base) AS leftover FROM based),
       |rk AS (
       |  SELECT *, row_number() OVER (ORDER BY rem DESC, event_type)
       |    AS rk
       |  FROM based)
       |SELECT event_type, n_rows, weight, base,
       |  CAST(base + CASE WHEN rk <= (SELECT leftover FROM lo)
       |    THEN 1 ELSE 0 END AS BIGINT) AS alloc
       |FROM rk ORDER BY event_type""".stripMargin
}
