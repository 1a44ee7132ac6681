package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequential probability ratio test (Wald, 1945) on conversion rates —
  * the always-valid A/B monitor a pipeline runs hourly instead of waiting
  * for a fixed-horizon sample: per variant, the cumulative log-likelihood
  * ratio of H1 (p = p1) against H0 (p = p0) walks until it crosses
  * ln((1−β)/α) (accept H1) or ln(β/(1−α)) (accept H0).
  *
  * Because each Bernoulli trial contributes one of two CONSTANTS to the
  * LLR, the walk aggregates exactly: at any point, llr = successes·w1 +
  * failures·w0 — so unlike CUSUM there is no clamp and no sequential
  * fold; the whole monitor is per-variant hourly counts + a cumulative
  * window over the time-domain-bounded frame. The w0/w1/boundary
  * constants are computed ONCE here and injected into both engines as
  * round-trip-exact double literals (1−p is a double roundoff in Scala
  * but exact DECIMAL arithmetic in DuckDB — same hazard as the
  * Fellegi–Sunter weights).
  *
  * Scale: one scan folds to (variant, hour) counters with map-side
  * combine; everything after runs on ≤ |hours|×2 rows.
  */
object Sprt {

  val P0 = 0.18
  val P1 = 0.22
  val Alpha = 0.05
  val Beta = 0.05

  /** Per-success / per-failure LLR increments and decision boundaries. */
  val WSucc: Double = math.log(P1 / P0)
  val WFail: Double = math.log((1.0 - P1) / (1.0 - P0))
  val Upper: Double = math.log((1.0 - Beta) / Alpha)
  val Lower: Double = math.log(Beta / (1.0 - Alpha))

  def sprtAbTest(events: DataFrame): DataFrame = {
    val hourly = events
      .groupBy(
        pmod(col("user_id"), lit(2)).cast("int").as("variant"),
        date_trunc("hour", col("ts")).as("h"))
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("s"))
    val walk = Window.partitionBy(col("variant")).orderBy(col("h"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hourly
      .withColumn("cum_n", sum(col("n")).over(walk))
      .withColumn("cum_s", sum(col("s")).over(walk))
      .withColumn("llr_raw",
        col("cum_s").cast("double") * lit(WSucc) +
          (col("cum_n") - col("cum_s")).cast("double") * lit(WFail))
      .select(
        col("variant"), col("h").as("window_start"),
        col("cum_n"), col("cum_s"),
        round(col("llr_raw"), 6).as("llr"),
        when(col("llr_raw") >= lit(Upper), lit("accept_h1"))
          .when(col("llr_raw") <= lit(Lower), lit("accept_h0"))
          .otherwise(lit("continue")).as("decision"))
      .orderBy(col("variant"), col("window_start"))
  }

  /** DuckDB replay with the same injected constants. */
  def oracleSql: String = {
    def d(x: Double): String = java.lang.Double.toString(x)
    s"""WITH hourly AS (
       |  SELECT CAST(user_id % 2 AS INTEGER) AS variant,
       |    date_trunc('hour', ts) AS h,
       |    CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
       |      AS BIGINT) AS s
       |  FROM events GROUP BY 1, 2),
       |walk AS (
       |  SELECT variant, h,
       |    CAST(sum(n) OVER w AS BIGINT) AS cum_n,
       |    CAST(sum(s) OVER w AS BIGINT) AS cum_s
       |  FROM hourly
       |  WINDOW w AS (PARTITION BY variant ORDER BY h
       |               ROWS UNBOUNDED PRECEDING)),
       |llr AS (
       |  SELECT variant, h, cum_n, cum_s,
       |    CAST(cum_s AS DOUBLE) * ${d(WSucc)}
       |      + CAST(cum_n - cum_s AS DOUBLE) * ${d(WFail)} AS llr_raw
       |  FROM walk)
       |SELECT variant, h AS window_start, cum_n, cum_s,
       |  round(llr_raw, 6) AS llr,
       |  CASE WHEN llr_raw >= ${d(Upper)} THEN 'accept_h1'
       |       WHEN llr_raw <= ${d(Lower)} THEN 'accept_h0'
       |       ELSE 'continue' END AS decision
       |FROM llr
       |ORDER BY variant, window_start""".stripMargin
  }
}
