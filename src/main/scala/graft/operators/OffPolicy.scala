package graft.operators

import graft.functions.Mix64
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Off-policy evaluation of a deterministic target policy from uniformly
  * logged exploration (Horvitz & Thompson, JASA 1952; contextual-bandit
  * form: Li et al., WSDM 2011; self-normalized variant: Swaminathan &
  * Joachims, NeurIPS 2015) — the counterfactual question a data pipeline
  * answers before shipping a policy change: "what value WOULD the
  * time-targeted promo have earned on the logged traffic?".
  *
  * The logged behavior policy assigns each event one of 4 promo arms
  * uniformly — arm = mix64(mix64(event_id) ⊕ seed) mod 4, the public
  * splitmix chain, so the propensity is EXACTLY 1/4 and the oracle
  * replays the assignment bit-for-bit. The target policy is
  * deterministic: arm = hour-of-day DIV 6 (serve promo k in day-part k).
  * With reward r = purchase cents:
  *
  *   V_IPS   = (1/n)·Σ 1[a_log = a_tgt]·r / (1/4)  = 4·Σ_match r / n
  *   V_SNIPS = Σ w·r / Σ w                         = Σ_match r / n_match
  *
  * — both exact integer rationals (the 1/4 propensity cancels into the
  * integer 4), emitted as floor micros of cents; the logged value and
  * the match rate ride along. SNIPS's denominator guard (no matches →
  * 0) is part of the contract.
  *
  * Scale: one map-side-combined 4-counter aggregate over the event scan;
  * the mechanism is a per-row codegen'd expression.
  */
object OffPolicy {

  /** Fixed splitmix64 seed for the logged arm draw (public constant,
    * emitted into the oracle).
    */
  val LogSeed: Long = Mix64.mix(0x0FFB0711C7L)

  def ipsPolicyValue(events: DataFrame): DataFrame = {
    import graft.functions.GraftColumns.mix64
    val cents = (col("value").cast("decimal(18,2)") * 100).cast("long")
    val r = when(col("event_type") === "purchase", cents).otherwise(0L)
    val aLog = pmod(mix64(mix64(col("event_id")).bitwiseXOR(lit(LogSeed))),
      lit(4L))
    val aTgt = expr("hour(ts) DIV 6")
    events
      .select(r.as("r"), (aLog === aTgt).as("m"))
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("m"), 1L).otherwise(0L)).as("n_matched"),
        sum(col("r")).as("sum_r_cents"),
        sum(when(col("m"), col("r")).otherwise(0L))
          .as("sum_matched_r_cents"))
      .withColumn("match_rate_micros",
        expr("n_matched * 1000000 DIV n"))
      .withColumn("v_logged_micros",
        expr("sum_r_cents * 1000000 DIV n"))
      .withColumn("v_ips_micros",
        expr("4 * sum_matched_r_cents * 1000000 DIV n"))
      .withColumn("v_snips_micros", expr(
        "CASE WHEN n_matched > 0" +
          " THEN sum_matched_r_cents * 1000000 DIV n_matched ELSE 0 END"))
      .select(col("n"), col("n_matched"), col("sum_r_cents"),
        col("sum_matched_r_cents"), col("match_rate_micros"),
        col("v_logged_micros"), col("v_ips_micros"), col("v_snips_micros"))
  }

  def ipsPolicyValueOracleSql: String = {
    import graft.SketchOracles.{mixChain, U64 => u64}
    val golden = "11400714819323198485::HUGEINT"
    val seed =
      (BigInt(LogSeed) & ((BigInt(1) << 64) - 1)).toString + "::HUGEINT"
    s"""WITH ev AS (
  SELECT CASE WHEN event_type = 'purchase'
           THEN CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
           ELSE 0 END AS r,
    hour(ts) // 6 AS a_tgt,
    ((CASE WHEN event_id < 0 THEN CAST(event_id AS HUGEINT) + $u64
           ELSE CAST(event_id AS HUGEINT) END) + $golden) % $u64 AS z0
  FROM events),
${mixChain("o1", "ev", Seq("r", "a_tgt"), "z0")},
x1 AS (SELECT r, a_tgt, (xor(mx, $seed) + $golden) % $u64 AS z0 FROM o14),
${mixChain("o2", "x1", Seq("r", "a_tgt"), "z0")},
arms AS (SELECT r, (CAST(mx % 4 AS BIGINT) = a_tgt) AS m FROM o24),
agg AS (SELECT
  CAST(count(*) AS BIGINT) AS n,
  CAST(sum(CASE WHEN m THEN 1 ELSE 0 END) AS BIGINT) AS n_matched,
  CAST(sum(r) AS BIGINT) AS sum_r_cents,
  CAST(sum(CASE WHEN m THEN r ELSE 0 END) AS BIGINT)
    AS sum_matched_r_cents
  FROM arms)
SELECT n, n_matched, sum_r_cents, sum_matched_r_cents,
  n_matched * 1000000 // n AS match_rate_micros,
  sum_r_cents * 1000000 // n AS v_logged_micros,
  4 * sum_matched_r_cents * 1000000 // n AS v_ips_micros,
  CASE WHEN n_matched > 0
    THEN sum_matched_r_cents * 1000000 // n_matched ELSE 0 END
    AS v_snips_micros
FROM agg"""
  }
}
