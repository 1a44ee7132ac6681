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
       |  FROM hourly WHERE h < TIMESTAMP '$baselineEnd' GROUP BY 1),
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
