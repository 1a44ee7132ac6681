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
}
