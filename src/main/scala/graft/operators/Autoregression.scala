package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact Yule–Walker AR(2) fit of each event type's hourly volume series
  * (Yule 1927; Walker 1931; standard treatment: Box & Jenkins ch. 3) —
  * the classical autoregressive companion to the smoothing forecasters
  * already in [[Changepoint]] (Holt, Holt–Winters, Croston).
  *
  * EXACT INTEGER FORM. The series is the gap-filled hourly count x_t
  * (t = 1..n over the type's own [min,max] hour span, missing hours 0).
  * Instead of the float sample mean, the series is centered at the
  * integer floor-mean m0 = Σx DIV n — a deliberate, documented contract
  * (the fit is of the m0-centered series) that keeps every residual
  * e_t = x_t − m0 an exact long. The lag products
  *
  *   g_k = Σ_{t=1}^{n−k} e_t·e_{t+k},   k = 0,1,2
  *
  * are exact longs, and the Yule–Walker solution is a pair of exact
  * rationals over the common determinant:
  *
  *   φ₁ = g₁·(g₀ − g₂) / (g₀² − g₁²)
  *   φ₂ = (g₀·g₂ − g₁²) / (g₀² − g₁²)
  *
  * The quadratics live in DECIMAL(38,0) (HUGEINT in the oracle) — g₀ can
  * reach ~2e11 at sf10 so g₀² needs 128-bit headroom — and the micros
  * quotients use the sign-split floor spelling (Spark DIV truncates
  * toward zero, DuckDB // floors; `CASE WHEN v ≥ 0 THEN v DIV d ELSE
  * -((-v) DIV d) END` agrees on both, the [[Changepoint.crostonForecast]]
  * convention), because φ can be negative.
  *
  * The one-step forecast closes the loop: x̂_{n+1} = m0 + φ₁e_n + φ₂e_{n−1},
  * emitted as the exact micros of (den·m0 + num₁·e_n + num₂·e_{n−1})/den.
  *
  * Degenerate series (den = 0: constant or too-short series) are
  * excluded on both sides — a φ of 0/0 is not a fit.
  *
  * Scale: the corpus reduces to the calendar-bounded hourly frame in one
  * map-side-combined aggregate (the [[Changepoint.holtWinters]] shape);
  * the lag joins are two lead() windows over per-type partitions bounded
  * by the calendar, never by corpus rows.
  */
object Autoregression {

  def ar2YuleWalker(events: DataFrame): DataFrame = {
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val counts = events
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("x"))
    val spans = counts
      .groupBy(col("event_type"))
      .agg(min(col("h")).as("min_h"), max(col("h")).as("max_h"))
    val grid = spans
      .select(col("event_type"), col("min_h"), col("max_h"),
        explode(expr("sequence(min_h, max_h, interval 1 hour)")).as("h"))
    val gf = grid
      .join(counts, Seq("event_type", "h"), "left")
      .select(col("event_type"), col("h"), col("max_h"),
        coalesce(col("x"), lit(0L)).as("x"))
    val base = gf
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"))
      .withColumn("m0", expr("sx DIV n"))
    val byH = Window.partitionBy(col("event_type")).orderBy(col("h"))
    val resid = gf
      .join(base, Seq("event_type"))
      .withColumn("e", col("x") - col("m0"))
      .withColumn("e1", lead(col("e"), 1).over(byH))
      .withColumn("e2", lead(col("e"), 2).over(byH))
    val g = resid
      .groupBy(col("event_type"))
      .agg(
        first(col("n")).as("n_hours"),
        first(col("m0")).as("m0"),
        sum(col("e") * col("e")).as("g0"),
        sum(when(col("e1").isNotNull, col("e") * col("e1"))
          .otherwise(0L)).as("g1"),
        sum(when(col("e2").isNotNull, col("e") * col("e2"))
          .otherwise(0L)).as("g2"),
        max(when(col("h") === col("max_h"), col("e"))).as("e_n"),
        max(when(col("h") === col("max_h") - expr("interval 1 hour"),
          col("e"))).as("e_n1"))

    def dec(c: Column): Column = c.cast(d38)
    // den = g0² − g1² ≥ 0 by Cauchy–Schwarz (|g1| ≤ g0), so after the
    // den ≠ 0 filter the sign-split floor only has to handle num's sign
    val den = dec(col("g0")) * dec(col("g0")) - dec(col("g1")) * dec(col("g1"))
    val num1 = dec(col("g1")) * (dec(col("g0")) - dec(col("g2")))
    val num2 = dec(col("g0")) * dec(col("g2")) - dec(col("g1")) * dec(col("g1"))
    val fNum = den * dec(col("m0")) +
      num1 * dec(col("e_n")) + num2 * dec(col("e_n1"))

    g.withColumn("den", den)
      .withColumn("num1", num1 * lit(1000000L).cast(d38))
      .withColumn("num2", num2 * lit(1000000L).cast(d38))
      .withColumn("fnum", fNum * lit(1000000L).cast(d38))
      .filter(col("den") =!= lit(0L).cast(d38))
      .withColumn("phi1_micros", expr(
        "CASE WHEN num1 >= 0 THEN CAST(num1 DIV den AS BIGINT) " +
          "ELSE -CAST((-num1) DIV den AS BIGINT) END"))
      .withColumn("phi2_micros", expr(
        "CASE WHEN num2 >= 0 THEN CAST(num2 DIV den AS BIGINT) " +
          "ELSE -CAST((-num2) DIV den AS BIGINT) END"))
      .withColumn("forecast_micros", expr(
        "CASE WHEN fnum >= 0 THEN CAST(fnum DIV den AS BIGINT) " +
          "ELSE -CAST((-fnum) DIV den AS BIGINT) END"))
      .select(col("event_type"), col("n_hours"), col("m0"),
        col("g0"), col("g1"), col("g2"),
        col("phi1_micros"), col("phi2_micros"), col("forecast_micros"))
      .orderBy(col("event_type"))
  }

  def ar2YuleWalkerOracleSql: String =
    """WITH counts AS (
      |  SELECT event_type, date_trunc('hour', ts) AS h,
      |    CAST(count(*) AS BIGINT) AS x
      |  FROM events GROUP BY 1, 2),
      |spans AS (SELECT event_type, min(h) AS min_h, max(h) AS max_h
      |  FROM counts GROUP BY 1),
      |grid AS (SELECT s.event_type, s.max_h,
      |    unnest(generate_series(s.min_h, s.max_h, INTERVAL 1 HOUR)) AS h
      |  FROM spans s),
      |gf AS (SELECT g.event_type, g.h, g.max_h,
      |    COALESCE(c.x, 0) AS x
      |  FROM grid g LEFT JOIN counts c
      |    ON g.event_type = c.event_type AND g.h = c.h),
      |base AS (SELECT event_type,
      |    CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(x) AS BIGINT) AS sx
      |  FROM gf GROUP BY 1),
      |resid AS (SELECT gf.event_type, gf.h, gf.max_h, b.n,
      |    sx // n AS m0, gf.x - sx // n AS e,
      |    lead(gf.x - sx // n, 1) OVER
      |      (PARTITION BY gf.event_type ORDER BY gf.h) AS e1,
      |    lead(gf.x - sx // n, 2) OVER
      |      (PARTITION BY gf.event_type ORDER BY gf.h) AS e2
      |  FROM gf JOIN base b ON gf.event_type = b.event_type),
      |g AS (SELECT event_type,
      |    CAST(any_value(n) AS BIGINT) AS n_hours,
      |    CAST(any_value(m0) AS BIGINT) AS m0,
      |    CAST(sum(e * e) AS BIGINT) AS g0,
      |    CAST(sum(CASE WHEN e1 IS NOT NULL THEN e * e1 ELSE 0 END)
      |      AS BIGINT) AS g1,
      |    CAST(sum(CASE WHEN e2 IS NOT NULL THEN e * e2 ELSE 0 END)
      |      AS BIGINT) AS g2,
      |    CAST(max(CASE WHEN h = max_h THEN e END) AS BIGINT) AS e_n,
      |    CAST(max(CASE WHEN h = max_h - INTERVAL 1 HOUR THEN e END)
      |      AS BIGINT) AS e_n1
      |  FROM resid GROUP BY 1),
      |q AS (SELECT event_type, n_hours, m0, g0, g1, g2,
      |    CAST(g0 AS HUGEINT) * g0 - CAST(g1 AS HUGEINT) * g1 AS den,
      |    (CAST(g1 AS HUGEINT) * (CAST(g0 AS HUGEINT) - g2)) * 1000000
      |      AS num1,
      |    (CAST(g0 AS HUGEINT) * g2 - CAST(g1 AS HUGEINT) * g1) * 1000000
      |      AS num2,
      |    ((CAST(g0 AS HUGEINT) * g0 - CAST(g1 AS HUGEINT) * g1) * m0
      |     + CAST(g1 AS HUGEINT) * (CAST(g0 AS HUGEINT) - g2) * e_n
      |     + (CAST(g0 AS HUGEINT) * g2 - CAST(g1 AS HUGEINT) * g1) * e_n1)
      |      * 1000000 AS fnum
      |  FROM g)
      |SELECT event_type, n_hours, m0, g0, g1, g2,
      |  CAST(CASE WHEN num1 >= 0 THEN num1 // den
      |            ELSE -((-num1) // den) END AS BIGINT) AS phi1_micros,
      |  CAST(CASE WHEN num2 >= 0 THEN num2 // den
      |            ELSE -((-num2) // den) END AS BIGINT) AS phi2_micros,
      |  CAST(CASE WHEN fnum >= 0 THEN fnum // den
      |            ELSE -((-fnum) // den) END AS BIGINT) AS forecast_micros
      |FROM q WHERE den <> 0 ORDER BY event_type""".stripMargin
}
