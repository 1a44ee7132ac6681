package graft.operators

import graft.functions.Mix64
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** RANSAC line fit (Fischler & Bolles, CACM 1981) of each event type's
  * hourly revenue trend — the robust-regression companion to
  * [[RobustStats]]' Theil–Sen: instead of the median of all pairwise
  * slopes, sample B candidate 2-point models, score each by its inlier
  * count, keep the consensus winner, then refit exactly on its inliers.
  *
  * EXACT INTEGER FORM, end to end:
  *  - points: (x = hour index in the type's observed-hour order,
  *    y = total cents that hour) — x unique per type by construction;
  *  - candidate r picks indices i = pmod(A_r, n) and
  *    j' = pmod(B_r, n−1), j = j' + [j' ≥ i] (the uniform-without-
  *    replacement shift), with A_r/B_r fixed splitmix64 literals
  *    emitted into the oracle;
  *  - the inlier test for (x,y) against the line through (x₁,y₁),(x₂,y₂)
  *    is CROSS-MULTIPLIED — |(y−y₁)(x₂−x₁) − (y₂−y₁)(x−x₁)| ≤ τ·|x₂−x₁|
  *    — so no division and no float anywhere in the consensus loop;
  *  - the tolerance τ = (Σy DIV n) DIV 4 (a quarter of the mean hourly
  *    cents) is itself an exact long, per type;
  *  - the winner is argmax inliers with min-r tiebreak (a total order);
  *  - the final exact OLS refit on the winner's inliers puts the
  *    quadratics in DECIMAL(38,0)/HUGEINT and emits signed floor micros
  *    (the [[Autoregression]] spelling).
  *
  * Scale: the point frame is calendar-bounded (per-type observed hours),
  * the model frame is |types|·B rows and BROADCAST into the scoring
  * join, consensus is one map-side-combined aggregate over
  * points×B rows (still calendar-bounded), and the refit is a second
  * bounded aggregate. Corpus rows are touched exactly once, in the
  * hourly reduction.
  */
object Ransac {

  /** Candidate models per type. */
  val B = 64

  /** Fixed splitmix64 draw pairs (A_r, B_r), single-sourced for both
    * engines.
    */
  def drawSeeds: Seq[(Long, Long)] =
    (1 to B).map { r =>
      (Mix64.mix(0xA15AC0FFE7L * r + 0x9E3779B9L),
        Mix64.mix(0x7E57AB1EL * r + 0x1CEB00DAL))
    }

  def ransacTrend(events: DataFrame): DataFrame = {
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val cents = (col("value").cast("decimal(18,2)") * 100).cast("long")
    val hourly = events
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .agg(sum(cents).as("y"))
    val byH = Window.partitionBy(col("event_type")).orderBy(col("h"))
    val pts = hourly
      .withColumn("x", (row_number().over(byH) - 1).cast("long"))
      .select(col("event_type"), col("x"), col("y"))
    val base = pts
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("sy"))
      .filter(col("n") >= 3)
      .withColumn("tau", expr("(sy DIV n) DIV 4"))

    val seedsDf = {
      val s = events.sparkSession
      import s.implicits._
      drawSeeds.zipWithIndex
        .map { case ((a, b), r) => (r.toLong, a, b) }
        .toDF("r", "sa", "sb")
    }
    val models = base
      .crossJoin(seedsDf)
      .withColumn("i", pmod(col("sa"), col("n")))
      .withColumn("jp", pmod(col("sb"), col("n") - 1))
      .withColumn("j",
        col("jp") + when(col("jp") >= col("i"), 1L).otherwise(0L))
      .join(pts.withColumnRenamed("x", "i").withColumnRenamed("y", "y1"),
        Seq("event_type", "i"))
      .withColumnRenamed("i", "x1")
      .join(pts.withColumnRenamed("x", "j").withColumnRenamed("y", "y2"),
        Seq("event_type", "j"))
      .withColumnRenamed("j", "x2")
      .select(col("event_type"), col("r"), col("n"), col("tau"),
        col("x1"), col("y1"), col("x2"), col("y2"))

    // consensus: score every candidate against every point of its type.
    // |types|·B models broadcast; the scan is the calendar-bounded point
    // frame replicated B ways — one map-side-combined aggregate.
    val scored = pts
      .join(broadcast(models), Seq("event_type"))
      .withColumn("resid_num",
        abs((col("y") - col("y1")) * (col("x2") - col("x1")) -
          (col("y2") - col("y1")) * (col("x") - col("x1"))))
      .withColumn("is_in",
        when(col("resid_num") <=
          col("tau") * abs(col("x2") - col("x1")), 1L).otherwise(0L))
      .groupBy(col("event_type"), col("r"))
      .agg(
        first(col("n")).as("n"), first(col("tau")).as("tau"),
        first(col("x1")).as("x1"), first(col("y1")).as("y1"),
        first(col("x2")).as("x2"), first(col("y2")).as("y2"),
        sum(col("is_in")).as("inliers"))
    val best = scored
      .groupBy(col("event_type"))
      .agg(min(struct((-col("inliers")).as("ni"), col("r").as("r"),
        col("n").as("n"), col("tau").as("tau"),
        col("x1").as("x1"), col("y1").as("y1"),
        col("x2").as("x2"), col("y2").as("y2"))).as("b"))
      .select(col("event_type"), col("b.r").as("best_r"),
        col("b.n").as("n_points"), col("b.tau").as("tau"),
        (-col("b.ni")).as("inliers"),
        col("b.x1").as("x1"), col("b.y1").as("y1"),
        col("b.x2").as("x2"), col("b.y2").as("y2"))

    // exact OLS refit on the winner's inliers
    val refit = pts
      .join(broadcast(best), Seq("event_type"))
      .filter(
        abs((col("y") - col("y1")) * (col("x2") - col("x1")) -
          (col("y2") - col("y1")) * (col("x") - col("x1"))) <=
          col("tau") * abs(col("x2") - col("x1")))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("m"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy2"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("x").cast(d38) * col("y").cast(d38)).as("sxy"))
    def dec(c: Column): Column = c.cast(d38)
    best
      .join(refit, Seq("event_type"))
      .withColumn("den",
        dec(col("m")) * dec(col("sxx")) - dec(col("sx")) * dec(col("sx")))
      .withColumn("snum",
        (dec(col("m")) * col("sxy") - dec(col("sx")) * dec(col("sy2"))) *
          lit(1000000L).cast(d38))
      .withColumn("inum",
        (dec(col("sy2")) * dec(col("sxx")) - dec(col("sx")) * col("sxy")) *
          lit(1000000L).cast(d38))
      .withColumn("ols_slope_micros", expr(
        "CASE WHEN snum >= 0 THEN CAST(snum DIV den AS BIGINT) " +
          "ELSE -CAST((-snum) DIV den AS BIGINT) END"))
      .withColumn("ols_intercept_micros", expr(
        "CASE WHEN inum >= 0 THEN CAST(inum DIV den AS BIGINT) " +
          "ELSE -CAST((-inum) DIV den AS BIGINT) END"))
      .select(col("event_type"), col("n_points"), col("tau"),
        col("best_r"), col("inliers"),
        col("x1"), col("y1"), col("x2"), col("y2"),
        col("ols_slope_micros"), col("ols_intercept_micros"))
      .orderBy(col("event_type"))
  }

  def ransacTrendOracleSql: String = {
    val seedRows = drawSeeds.zipWithIndex
      .map { case ((a, b), r) => s"    ($r, $a, $b)" }
      .mkString(",\n")
    s"""WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS h,
    CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100
              AS DECIMAL(18,0))) AS BIGINT) AS y
  FROM events GROUP BY 1, 2),
pts AS (SELECT event_type,
    CAST(row_number() OVER (PARTITION BY event_type ORDER BY h) - 1
      AS BIGINT) AS x, y
  FROM hourly),
base AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
    CAST(sum(y) AS BIGINT) AS sy
  FROM pts GROUP BY 1 HAVING count(*) >= 3),
sd(r, sa, sb) AS (VALUES
$seedRows),
models AS (
  SELECT b.event_type, sd.r, b.n, (b.sy // b.n) // 4 AS tau,
    p1.x AS x1, p1.y AS y1, p2.x AS x2, p2.y AS y2
  FROM base b CROSS JOIN sd
  JOIN pts p1 ON p1.event_type = b.event_type
    AND p1.x = ((sd.sa % b.n) + b.n) % b.n
  JOIN pts p2 ON p2.event_type = b.event_type
    AND p2.x = ((sd.sb % (b.n - 1)) + (b.n - 1)) % (b.n - 1)
      + CASE WHEN ((sd.sb % (b.n - 1)) + (b.n - 1)) % (b.n - 1)
                  >= ((sd.sa % b.n) + b.n) % b.n
             THEN 1 ELSE 0 END),
scored AS (
  SELECT m.event_type, m.r, any_value(m.n) AS n,
    any_value(m.tau) AS tau,
    any_value(m.x1) AS x1, any_value(m.y1) AS y1,
    any_value(m.x2) AS x2, any_value(m.y2) AS y2,
    CAST(sum(CASE WHEN abs((p.y - m.y1) * (m.x2 - m.x1)
                         - (m.y2 - m.y1) * (p.x - m.x1))
                       <= m.tau * abs(m.x2 - m.x1)
                  THEN 1 ELSE 0 END) AS BIGINT) AS inliers
  FROM models m JOIN pts p ON p.event_type = m.event_type
  GROUP BY 1, 2),
best AS (
  SELECT event_type, s2.s.r AS best_r, s2.s.n AS n_points,
    s2.s.tau AS tau, -(s2.s.ni) AS inliers,
    s2.s.x1 AS x1, s2.s.y1 AS y1, s2.s.x2 AS x2, s2.s.y2 AS y2
  FROM (SELECT event_type,
          min({'ni': -inliers, 'r': r, 'n': n, 'tau': tau,
               'x1': x1, 'y1': y1, 'x2': x2, 'y2': y2}) AS s
        FROM scored GROUP BY 1) s2),
refit AS (
  SELECT p.event_type, CAST(count(*) AS BIGINT) AS m,
    CAST(sum(p.x) AS BIGINT) AS sx, CAST(sum(p.y) AS BIGINT) AS sy2,
    CAST(sum(p.x * p.x) AS BIGINT) AS sxx,
    CAST(sum(CAST(p.x AS HUGEINT) * p.y) AS HUGEINT) AS sxy
  FROM pts p JOIN best b ON p.event_type = b.event_type
  WHERE abs((p.y - b.y1) * (b.x2 - b.x1)
          - (b.y2 - b.y1) * (p.x - b.x1))
        <= b.tau * abs(b.x2 - b.x1)
  GROUP BY 1),
fin AS (
  SELECT b.*, r.m, r.sx, r.sy2, r.sxx, r.sxy,
    CAST(r.m AS HUGEINT) * r.sxx - CAST(r.sx AS HUGEINT) * r.sx AS den,
    (CAST(r.m AS HUGEINT) * r.sxy
      - CAST(r.sx AS HUGEINT) * r.sy2) * 1000000 AS snum,
    (CAST(r.sy2 AS HUGEINT) * r.sxx
      - CAST(r.sx AS HUGEINT) * r.sxy) * 1000000 AS inum
  FROM best b JOIN refit r ON b.event_type = r.event_type)
SELECT event_type, n_points, tau, best_r, inliers, x1, y1, x2, y2,
  CAST(CASE WHEN snum >= 0 THEN snum // den
            ELSE -((-snum) // den) END AS BIGINT) AS ols_slope_micros,
  CAST(CASE WHEN inum >= 0 THEN inum // den
            ELSE -((-inum) // den) END AS BIGINT) AS ols_intercept_micros
FROM fin ORDER BY event_type"""
  }
}
