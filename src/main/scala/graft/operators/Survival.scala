package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Survival analysis over customer purchase activity: the Kaplan-Meier
  * product-limit estimator (Kaplan & Meier, JASA 1958) of "time until a
  * customer stops ordering", with right-censoring for customers still
  * active at the end of the observation window — the retention statistic
  * a growth pipeline reads beside the cohort table (`retention_cohorts`
  * gives per-cohort decay; this gives the censoring-correct population
  * curve).
  *
  * Semantics: a customer's lifetime is `(last_order − first_order) DIV
  * 86400` whole days. Customers whose last order falls within
  * `activeDays` of the global window end are CENSORED at that lifetime
  * (they may still be alive); everyone else churned at theirs. At each distinct lifetime t
  * (ascending): n_risk(t) = users with lifetime ≥ t, d(t) = churned at t,
  * c(t) = censored at t, and S(t) = S(t⁻)·(n_risk−d)/n_risk.
  *
  * Exactness: the survival product is an integer recurrence at scale
  * 10^12 — s ← (s·(n−d)) DIV n with the product widened to DECIMAL(38,0)
  * before the multiply (10^12·n overflows a long past ~9M users) — so the
  * whole curve is bit-exact; the DuckDB oracle replays the identical
  * floor-division walk in HUGEINT via a recursive CTE.
  *
  * Scale: ONE scan reduces the corpus to per-customer (min,max)
  * timestamps with map-side combine; the per-lifetime frame is bounded by
  * the observation window's day count (never by row count), so the
  * sequential fold over its sorted rows is a constant-size tail on a
  * distributed reduction — same shape as
  * [[Changepoint.ewmaAnomalies]]' hourly walk.
  */
object Survival {

  def kmSurvival(orders: DataFrame, activeDays: Int = 90): DataFrame = {
    val perUser = orders
      .groupBy(col("o_custkey"))
      .agg(min(col("o_orderdate")).as("f"), max(col("o_orderdate")).as("l"))
    val wEnd = perUser.agg(max(col("l")).as("w_end"))
    val byDur = perUser
      .crossJoin(broadcast(wEnd))
      .select(
        ((unix_timestamp(col("l")) - unix_timestamp(col("f")))
          .cast("long")).as("secs"),
        (col("l") < col("w_end") - expr(s"INTERVAL $activeDays DAYS"))
          .as("churned"))
      .select(expr("secs DIV 86400").as("duration_days"), col("churned"))
      .groupBy(col("duration_days"))
      .agg(
        sum(when(col("churned"), 1L).otherwise(0L)).as("d"),
        sum(when(col("churned"), 0L).otherwise(1L)).as("c"))
    byDur
      .agg(
        sort_array(collect_list(
          struct(col("duration_days"), col("d"), col("c")))).as("xs"),
        sum(col("d") + col("c")).as("n0"))
      .withColumn("steps", expr(
        """aggregate(
          |  xs,
          |  struct(cast(array() as array<struct<duration_days bigint,
          |           n_risk bigint, d bigint, c bigint, s bigint>>) as out,
          |         n0 as rem,
          |         cast(1000000000000 as bigint) as s),
          |  (acc, e) -> struct(
          |    concat(acc.out, array(named_struct(
          |      'duration_days', e.duration_days,
          |      'n_risk', acc.rem, 'd', e.d, 'c', e.c,
          |      's', cast((cast(acc.s as decimal(38,0)) * (acc.rem - e.d))
          |             div acc.rem as bigint)))),
          |    acc.rem - e.d - e.c,
          |    cast((cast(acc.s as decimal(38,0)) * (acc.rem - e.d))
          |      div acc.rem as bigint)),
          |  acc -> acc.out)""".stripMargin))
      .select(explode(col("steps")).as("st"))
      .select(
        col("st.duration_days").as("duration_days"),
        col("st.n_risk").as("n_risk"),
        col("st.d").as("d_churned"),
        col("st.c").as("c_censored"),
        col("st.s").as("survival_e12"))
      .orderBy(col("duration_days"))
  }

  /** Recursive-CTE replay of the identical floor-division walk. */
  def kmOracleSql(activeDays: Int = 90): String =
    s"""WITH RECURSIVE pu AS (
       |  SELECT o_custkey, min(o_orderdate) AS f, max(o_orderdate) AS l
       |  FROM orders GROUP BY 1),
       |w AS (SELECT max(l) AS w_end FROM pu),
       |bydur AS (
       |  SELECT date_diff('second', f, l) // 86400 AS duration_days,
       |    CAST(sum(CASE WHEN l < w_end - INTERVAL $activeDays DAY
       |      THEN 1 ELSE 0 END) AS BIGINT) AS d,
       |    CAST(sum(CASE WHEN l < w_end - INTERVAL $activeDays DAY
       |      THEN 0 ELSE 1 END) AS BIGINT) AS c
       |  FROM pu, w GROUP BY 1),
       |idx AS (
       |  SELECT *, row_number() OVER (ORDER BY duration_days) AS rn
       |  FROM bydur),
       |tot AS (SELECT CAST(sum(d + c) AS HUGEINT) AS n0 FROM bydur),
       |walk(rn, duration_days, n_risk, d, c, rem, s) AS (
       |  SELECT 0, CAST(NULL AS BIGINT), CAST(NULL AS HUGEINT),
       |    CAST(0 AS BIGINT), CAST(0 AS BIGINT), n0,
       |    CAST(1000000000000 AS HUGEINT)
       |  FROM tot
       |  UNION ALL
       |  SELECT i.rn, i.duration_days, w.rem, i.d, i.c,
       |    w.rem - i.d - i.c,
       |    (w.s * (w.rem - i.d)) // w.rem
       |  FROM walk w JOIN idx i ON i.rn = w.rn + 1)
       |SELECT duration_days, CAST(n_risk AS BIGINT) AS n_risk,
       |  d AS d_churned, c AS c_censored, CAST(s AS BIGINT) AS survival_e12
       |FROM walk WHERE rn > 0
       |ORDER BY duration_days""".stripMargin


  /** Nelson–Aalen cumulative hazard (Nelson 1972; Aalen, Ann. Stat.
    * 1978) over the same churn-duration frame as [[kmSurvival]] — the
    * additive counterpart of KM's multiplicative survival: at each
    * observed duration with d churns out of n at risk,
    *
    *   Ĥ(t) = Σ_{tᵢ ≤ t} dᵢ/nᵢ,   Var ≈ Σ dᵢ/nᵢ²   (Aalen's estimator)
    *
    * Exactness contract: each step contributes its exact e12 floor
    * (d·10¹² DIV n, resp. d·10¹² DIV n²) and the cumulative curve is the
    * running SUM of those longs — sum-of-floors, spelled identically in
    * the oracle (the same lattice discipline as BH's min-of-floors).
    * Unlike KM's running product (a sequential fold), the hazard is a
    * pure prefix sum: n_risk falls out of a window too, so the whole
    * estimator is two window passes over the duration-bounded frame —
    * no fold at all.
    *
    * Scale: the corpus reduces to per-user (first, last) in one keyed
    * aggregate; everything after is bounded by distinct durations.
    */
  def nelsonAalen(orders: DataFrame, activeDays: Int = 90): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val perUser = orders
      .groupBy(col("o_custkey"))
      .agg(min(col("o_orderdate")).as("f"), max(col("o_orderdate")).as("l"))
    val wEnd = perUser.agg(max(col("l")).as("w_end"))
    val byDur = perUser
      .crossJoin(broadcast(wEnd))
      .select(
        ((unix_timestamp(col("l")) - unix_timestamp(col("f")))
          .cast("long")).as("secs"),
        (col("l") < col("w_end") - expr(s"INTERVAL $activeDays DAYS"))
          .as("churned"))
      .select(expr("secs DIV 86400").as("duration_days"), col("churned"))
      .groupBy(col("duration_days"))
      .agg(
        sum(when(col("churned"), 1L).otherwise(0L)).as("d"),
        sum(when(col("churned"), 0L).otherwise(1L)).as("c"))
    val byT = Window.orderBy(col("duration_days"))
    byDur
      .withColumn("n_risk",
        sum(col("d") + col("c")).over(
          byT.rowsBetween(Window.currentRow, Window.unboundedFollowing)))
      .withColumn("h_step", expr("d * 1000000000000 DIV n_risk"))
      .withColumn("v_step", expr("d * 1000000000000 DIV (n_risk * n_risk)"))
      .withColumn("na_e12", sum(col("h_step")).over(
        byT.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("var_e12", sum(col("v_step")).over(
        byT.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("duration_days"), col("n_risk"),
        col("d").as("d_churned"), col("c").as("c_censored"),
        col("na_e12"), col("var_e12"))
      .orderBy(col("duration_days"))
  }

  def nelsonAalenOracleSql(activeDays: Int = 90): String =
    s"""WITH pu AS (
       |  SELECT o_custkey, min(o_orderdate) AS f, max(o_orderdate) AS l
       |  FROM orders GROUP BY 1),
       |we AS (SELECT max(l) AS w_end FROM pu),
       |dur AS (
       |  SELECT (epoch(l)::BIGINT - epoch(f)::BIGINT) // 86400
       |      AS duration_days,
       |    l < w_end - INTERVAL $activeDays DAYS AS churned
       |  FROM pu, we),
       |byd AS (
       |  SELECT duration_days,
       |    CAST(sum(CASE WHEN churned THEN 1 ELSE 0 END) AS BIGINT) AS d,
       |    CAST(sum(CASE WHEN churned THEN 0 ELSE 1 END) AS BIGINT) AS c
       |  FROM dur GROUP BY 1),
       |risk AS (
       |  SELECT *,
       |    CAST(sum(d + c) OVER (ORDER BY duration_days
       |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
       |      AS BIGINT) AS n_risk
       |  FROM byd),
       |steps AS (
       |  SELECT *, d * 1000000000000 // n_risk AS h_step,
       |    d * 1000000000000 // (n_risk * n_risk) AS v_step
       |  FROM risk)
       |SELECT duration_days, n_risk, d AS d_churned, c AS c_censored,
       |  CAST(sum(h_step) OVER (ORDER BY duration_days
       |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS na_e12,
       |  CAST(sum(v_step) OVER (ORDER BY duration_days
       |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS var_e12
       |FROM steps ORDER BY duration_days""".stripMargin
}

