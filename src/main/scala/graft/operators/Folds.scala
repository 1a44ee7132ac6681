package graft.operators

import graft.SketchOracles.{mixChain, U64}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Group-aware K-fold cross-validation assignment — the split a training
  * pipeline needs when rows are NOT exchangeable (all events of a user
  * must land in one fold or per-user signals leak across train/eval;
  * same precedent as the doc-level `doc_splits` / `split_leakage` pair,
  * lifted to grouped K-fold).
  *
  * fold(user) = mix64(user_id) & (K−1): a pure function of the group
  * key, so the assignment is reproducible from the key alone (no state
  * to persist) and K is a power of two so the unsigned-mod is a bit
  * mask, identical across engines. The structural leakage audit (a user
  * appearing in more than one fold) is recomputed FROM THE MATERIALIZED
  * row-level assignment, not assumed from the construction — that is
  * the eval-integrity check a release gate actually runs.
  *
  * Scale: one scan; fold stats are a K-bounded aggregate with map-side
  * combine; the audit reuses the same (user, fold) distinct frame.
  */
object Folds {

  /** Power of two — the & (K-1) mask IS unsigned mod K. */
  val K = 8

  def cvFolds(events: DataFrame): DataFrame = {
    import graft.functions.GraftColumns.mix64
    val assigned = events.select(
      col("user_id"), col("event_id"),
      mix64(col("user_id")).bitwiseAND(lit((K - 1).toLong)).as("fold"))
    val perFold = assigned.groupBy(col("fold"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"))
    // total from the ≤K-row fold frame — no extra pass over events
    val total = perFold.agg(sum(col("n_events")).as("n_total"))
    val spanning = assigned
      .select(col("user_id"), col("fold")).distinct()
      .groupBy(col("user_id")).agg(count(lit(1)).as("nf"))
      .agg(coalesce(sum(when(col("nf") > 1, 1L).otherwise(0L)), lit(0L))
        .as("users_spanning"))
    perFold
      .crossJoin(broadcast(total))
      .crossJoin(broadcast(spanning))
      .select(
        col("fold"), col("n_events"), col("n_users"),
        expr("n_events * 1000000 DIV n_total").as("share_micros"),
        col("users_spanning"))
      .orderBy(col("fold"))
  }

  def cvFoldsOracleSql: String =
    s"""WITH uu AS (SELECT DISTINCT user_id FROM events),
ux AS (SELECT user_id,
  ((CASE WHEN user_id < 0 THEN CAST(user_id AS HUGEINT) + $U64
         ELSE CAST(user_id AS HUGEINT) END)
   + 11400714819323198485::HUGEINT) % $U64 AS z0 FROM uu),
${mixChain("mh", "ux", Seq("user_id"), "z0")},
fo AS (SELECT user_id, CAST(mx % $K AS BIGINT) AS fold FROM mh4),
ev AS (SELECT e.event_id, e.user_id, f.fold
  FROM events e JOIN fo f ON e.user_id = f.user_id),
pf AS (SELECT fold, CAST(count(*) AS BIGINT) AS n_events,
  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
  FROM ev GROUP BY 1),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM ev),
sp AS (SELECT CAST(COALESCE(sum(CASE WHEN nf > 1 THEN 1 ELSE 0 END), 0)
    AS BIGINT) AS users_spanning
  FROM (SELECT user_id, count(DISTINCT fold) AS nf FROM ev GROUP BY 1))
SELECT fold, n_events, n_users,
  n_events * 1000000 // n_total AS share_micros,
  users_spanning
FROM pf, tot, sp
ORDER BY fold"""
}
