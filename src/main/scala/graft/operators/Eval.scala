package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Train/test model-evaluation operators on fully integer-exact paths:
  * a Markov next-event predictor with held-out accuracy, and a
  * propensity-calibration audit. Both follow the repo's split
  * discipline (deterministic user-parity folds, model fit on train
  * only) and emit nothing but exact longs and micros-DIV ratios — no
  * cross-engine float hazard anywhere, argmaxes included (counts are
  * integers; ties break lexicographically in both engines).
  */
object Eval {

  /** First-order Markov next-event model: transition counts on the
    * TRAIN users (even user_id), per-state prediction = argmax count
    * (ties to the lexicographically smallest next state), evaluated as
    * held-out accuracy on the TEST users' transitions.
    *
    * Scale: transitions come from one lag-window pass per user
    * partition (shuffle keyed by user — bounded by the events frame,
    * map-side nothing, standard sessionize shape); the model is a
    * |states|² frame broadcast onto the test transitions; the report is
    * |states| rows.
    */
  def markovNextEvent(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val transitions = events
      .select(col("user_id"), col("event_type").as("next"),
        lag(col("event_type"), 1).over(w).as("prev"))
      .filter(col("prev").isNotNull)
      .withColumn("fold", pmod(col("user_id"), lit(2)))
    val model = transitions
      .filter(col("fold") === 0L)
      .groupBy(col("prev"), col("next"))
      .agg(count(lit(1)).as("c"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("prev"))
          .orderBy(col("c").desc, col("next"))))
      .filter(col("rk") === 1)
      .select(col("prev"), col("next").as("predicted"),
        col("c").as("train_support"))
    transitions
      .filter(col("fold") === 1L)
      .join(broadcast(model), Seq("prev"))
      .groupBy(col("prev"), col("predicted"), col("train_support"))
      .agg(
        count(lit(1)).as("n_test"),
        sum((col("next") === col("predicted")).cast("bigint")).as("correct"))
      .select(col("prev"), col("predicted"), col("train_support"),
        col("n_test"), col("correct"),
        expr("(correct * 1000000L) DIV n_test").as("accuracy_ppm"))
      .orderBy(col("prev"))
  }

  def markovOracleSql: String =
    """WITH tr AS (
      |  SELECT user_id,
      |    lag(event_type) OVER (PARTITION BY user_id
      |                          ORDER BY ts, event_id) AS prev,
      |    event_type AS next,
      |    user_id % 2 AS fold
      |  FROM events),
      |t AS (SELECT * FROM tr WHERE prev IS NOT NULL),
      |model AS (
      |  SELECT prev, next AS predicted, c AS train_support
      |  FROM (SELECT prev, next, CAST(count(*) AS BIGINT) AS c,
      |          row_number() OVER (PARTITION BY prev
      |                             ORDER BY count(*) DESC, next) AS rk
      |        FROM t WHERE fold = 0 GROUP BY prev, next) m
      |  WHERE rk = 1),
      |test AS (
      |  SELECT t.prev, m.predicted, m.train_support,
      |    CAST(count(*) AS BIGINT) AS n_test,
      |    CAST(sum(CASE WHEN t.next = m.predicted THEN 1 ELSE 0 END)
      |      AS BIGINT) AS correct
      |  FROM t JOIN model m ON t.prev = m.prev
      |  WHERE t.fold = 1
      |  GROUP BY t.prev, m.predicted, m.train_support)
      |SELECT prev, predicted, train_support, n_test, correct,
      |  CAST(correct * 1000000 // n_test AS BIGINT) AS accuracy_ppm
      |FROM test ORDER BY prev""".stripMargin

  /** Calibration audit of the hour-of-day purchase-propensity model:
    * per-bucket predicted rate fit on TRAIN users (purchases/events in
    * micros), observed rate on TEST users, and the absolute calibration
    * gap — the reliability-diagram table, bucketed by the model's own
    * feature so every number stays an exact integer ratio.
    *
    * Scale: two single-scan aggregations to 24-row frames; the join is
    * a broadcast of a calendar-bounded frame.
    */
  def propensityCalibration(events: DataFrame): DataFrame = {
    val bucketed = events
      .select(hour(col("ts")).cast("int").as("hod"),
        (col("event_type") === "purchase").cast("bigint").as("is_purchase"),
        pmod(col("user_id"), lit(2)).as("fold"))
    val train = bucketed.filter(col("fold") === 0L)
      .groupBy(col("hod"))
      .agg(count(lit(1)).as("n_train"),
        sum(col("is_purchase")).as("purchases_train"))
      .withColumn("predicted_ppm",
        expr("(purchases_train * 1000000L) DIV n_train"))
    val test = bucketed.filter(col("fold") === 1L)
      .groupBy(col("hod"))
      .agg(count(lit(1)).as("n_test"),
        sum(col("is_purchase")).as("purchases_test"))
      .withColumn("observed_ppm",
        expr("(purchases_test * 1000000L) DIV n_test"))
    train.join(test, Seq("hod"))
      .select(col("hod"), col("n_train"), col("predicted_ppm"),
        col("n_test"), col("observed_ppm"),
        abs(col("observed_ppm") - col("predicted_ppm")).as("gap_ppm"))
      .orderBy(col("hod"))
  }

  def propensityOracleSql: String =
    """WITH b AS (
      |  SELECT CAST(hour(ts) AS INTEGER) AS hod,
      |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS p,
      |    user_id % 2 AS fold
      |  FROM events),
      |tr AS (
      |  SELECT hod, CAST(count(*) AS BIGINT) AS n_train,
      |    CAST(sum(p) AS BIGINT) AS purchases_train,
      |    CAST(sum(p) * 1000000 // count(*) AS BIGINT) AS predicted_ppm
      |  FROM b WHERE fold = 0 GROUP BY hod),
      |te AS (
      |  SELECT hod, CAST(count(*) AS BIGINT) AS n_test,
      |    CAST(sum(p) * 1000000 // count(*) AS BIGINT) AS observed_ppm
      |  FROM b WHERE fold = 1 GROUP BY hod)
      |SELECT tr.hod, n_train, predicted_ppm, n_test, observed_ppm,
      |  abs(observed_ppm - predicted_ppm) AS gap_ppm
      |FROM tr JOIN te ON tr.hod = te.hod
      |ORDER BY tr.hod""".stripMargin

  /** Murphy decomposition of the Brier score (Murphy, JAM 1973) + ECE
    * for the hour-of-day propensity model — the scalar verdict over
    * [[propensityCalibration]]'s per-bucket table: BS = REL − RES + UNC
    * separates "the forecast numbers are wrong" (reliability, the part
    * recalibration fixes) from "the forecast doesn't discriminate"
    * (resolution, the part only a better model fixes) from the outcome
    * base-rate entropy no forecast can beat (uncertainty). ECE rides
    * along as the plain calibration-gap summary.
    *
    * Exactness: outcomes are 0/10⁶ ppm points and the forecast is the
    * train-fold integer ppm, so every Σ is exact decimal:
    * ECE·N = Σ_b |f_b·n_b − s_b·10⁶| needs NO division at all; the
    * quadratic terms clear denominators per bucket and take documented
    * floor DIVs (both engines identical), with the decomposition
    * identity's flooring slack published as `identity_gap_ppm2` instead
    * of hidden.
    *
    * Scale: two scans to 24-bucket aggregates, then arithmetic on a
    * 24-row broadcast frame.
    */
  def brierDecomposition(events: DataFrame): DataFrame = {
    val bucketed = events
      .select(hour(col("ts")).cast("int").as("hod"),
        (col("event_type") === "purchase").cast("bigint").as("p"),
        pmod(col("user_id"), lit(2)).as("fold"))
    val train = bucketed.filter(col("fold") === 0L)
      .groupBy(col("hod"))
      .agg(count(lit(1)).as("n_train"), sum(col("p")).as("s_train"))
      .withColumn("f", expr("(s_train * 1000000L) DIV n_train"))
    val test = bucketed.filter(col("fold") === 1L)
      .groupBy(col("hod"))
      .agg(count(lit(1)).as("n"), sum(col("p")).as("s"))
    val cells = train.join(test, Seq("hod"))
      .select(col("hod"),
        col("f").cast("decimal(38,0)").as("f"),
        col("n").cast("decimal(38,0)").as("n"),
        col("s").cast("decimal(38,0)").as("s"))
    val tot = cells.agg(
      sum(col("n")).cast("decimal(38,0)").as("nn"),
      sum(col("s")).cast("decimal(38,0)").as("ss"),
      count(lit(1)).as("buckets"))
    cells.crossJoin(broadcast(tot))
      .agg(
        max(col("nn")).as("nn"), max(col("ss")).as("ss"),
        max(col("buckets")).as("buckets"),
        sum(expr("n * f * f - 2 * f * s * 1000000" +
          " + s * cast(1000000 as decimal(38,0)) * 1000000"))
          .cast("decimal(38,0)").as("bs_num"),
        sum(expr("cast((f * n - s * 1000000) * (f * n - s * 1000000)" +
          " DIV n as decimal(38,0))")).cast("decimal(38,0)").as("rel_num"),
        sum(expr("cast(abs(f * n - s * 1000000) as decimal(38,0))"))
          .cast("decimal(38,0)").as("ece_num"),
        sum(expr("cast((s * nn - ss * n) * (s * nn - ss * n)" +
          " * 1000000 * 1000000 DIV (n * nn * nn) as decimal(38,0))"))
          .cast("decimal(38,0)").as("res_num"))
      .select(
        expr("cast(nn as bigint)").as("n_test"),
        col("buckets"),
        expr("cast(bs_num DIV nn as bigint)").as("bs_ppm2"),
        expr("cast(rel_num DIV nn as bigint)").as("rel_ppm2"),
        expr("cast(res_num DIV nn as bigint)").as("res_ppm2"),
        expr("cast(ss * (nn - ss) * 1000000 * 1000000 DIV (nn * nn)" +
          " as bigint)").as("unc_ppm2"),
        expr("cast(ece_num DIV nn as bigint)").as("ece_ppm"))
      .withColumn("identity_gap_ppm2",
        col("bs_ppm2") -
          (col("rel_ppm2") - col("res_ppm2") + col("unc_ppm2")))
  }

  def brierOracleSql: String =
    """WITH b AS (
      |  SELECT CAST(hour(ts) AS INTEGER) AS hod,
      |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS p,
      |    user_id % 2 AS fold
      |  FROM events),
      |tr AS (
      |  SELECT hod,
      |    CAST(sum(p) AS HUGEINT) * 1000000 // count(*) AS f
      |  FROM b WHERE fold = 0 GROUP BY hod),
      |te AS (
      |  SELECT hod, CAST(count(*) AS HUGEINT) AS n,
      |    CAST(sum(p) AS HUGEINT) AS s
      |  FROM b WHERE fold = 1 GROUP BY hod),
      |cells AS (
      |  SELECT tr.hod, tr.f, te.n, te.s FROM tr JOIN te ON tr.hod = te.hod),
      |tot AS (
      |  SELECT CAST(sum(n) AS HUGEINT) AS nn,
      |    CAST(sum(s) AS HUGEINT) AS ss,
      |    CAST(count(*) AS BIGINT) AS buckets
      |  FROM cells),
      |agg AS (
      |  SELECT max(nn) AS nn, max(ss) AS ss, max(buckets) AS buckets,
      |    CAST(sum(n * f * f - 2 * f * s * 1000000
      |      + s * CAST(1000000 AS HUGEINT) * 1000000) AS HUGEINT)
      |      AS bs_num,
      |    CAST(sum((f * n - s * 1000000) * (f * n - s * 1000000) // n)
      |      AS HUGEINT) AS rel_num,
      |    CAST(sum(abs(f * n - s * 1000000)) AS HUGEINT) AS ece_num,
      |    CAST(sum((s * nn - ss * n) * (s * nn - ss * n)
      |      * 1000000 * 1000000 // (n * nn * nn)) AS HUGEINT) AS res_num
      |  FROM cells, tot),
      |fin AS (
      |  SELECT CAST(nn AS BIGINT) AS n_test, buckets,
      |    CAST(bs_num // nn AS BIGINT) AS bs_ppm2,
      |    CAST(rel_num // nn AS BIGINT) AS rel_ppm2,
      |    CAST(res_num // nn AS BIGINT) AS res_ppm2,
      |    CAST(ss * (nn - ss) * 1000000 * 1000000 // (nn * nn) AS BIGINT)
      |      AS unc_ppm2,
      |    CAST(ece_num // nn AS BIGINT) AS ece_ppm
      |  FROM agg)
      |SELECT *,
      |  bs_ppm2 - (rel_ppm2 - res_ppm2 + unc_ppm2) AS identity_gap_ppm2
      |FROM fin""".stripMargin
}
