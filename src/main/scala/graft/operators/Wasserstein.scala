package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact 1-D optimal transport (Wasserstein-1 / earth-mover) distance
  * between empirical value distributions — the standard drift metric a
  * mixture-calibration pipeline runs per source pair before reweighting
  * (complementing the binned PSI and the sup-norm KS queries: W₁ is the
  * INTEGRAL of the CDF gap, so it sees shifts KS undersells and needs no
  * binning choice like PSI).
  *
  * For 1-D empiricals, W₁(A,B) = ∫ |F_A(x) − F_B(x)| dx — exactly
  * computable on the merged support as
  * Σ_i |cumA_i/nA − cumB_i/nB| · (x_{i+1} − x_i)  (Vallender 1974).
  * Everything rides exact integers: values are cents, the CDF gap is
  * cross-multiplied to |cumA_i·nB − cumB_i·nA| and the distance is
  * emitted as the exact fraction (w1_num, w1_den = nA·nB) plus the
  * micros-DIV quotient — no float ever enters.
  *
  * Scale: the corpus reduces to one row per DISTINCT cent value per pair
  * (a map-side-combined groupBy), so the ordered cumulative scan runs on
  * a frame bounded by the VALUE DOMAIN (≤ ~20 k rows for two-decimal
  * values under $200), not by corpus rows — the same domain-bounded
  * window-scan class as the calendar folds. A genuinely unbounded
  * domain (e.g. 64-bit measurements) would swap the window for
  * [[DistributedRank]]'s two-level scan; the plan below keeps the
  * partitionBy(type_a, type_b) so Spark never funnels unrelated pairs
  * through one task.
  */
object Wasserstein {

  /** Pairwise W₁ between the purchase-value distributions of every
    * event-type pair (type_a < type_b lexicographically). Output per
    * pair: sample sizes, exact fraction, micros quotient.
    */
  def w1ValueDrift(events: DataFrame): DataFrame = {
    val cents = graft.queries.Analytics.centsOf(col("value")).cast("long")
    // one row per (event_type, cent value): domain-bounded. Null values
    // carry no mass in either empirical — drop them identically to the
    // oracle's WHERE value IS NOT NULL (after which `v` is never null,
    // so Spark's NULLS FIRST vs DuckDB's NULLS LAST cannot diverge).
    val hist = events
      .filter(col("value").isNotNull)
      .select(col("event_type").as("t"), cents.as("v"))
      .groupBy(col("t"), col("v"))
      .agg(count(lit(1)).as("c"))

    val pairs = hist.select(col("t").as("type_a")).distinct()
      .join(hist.select(col("t").as("type_b")).distinct(),
        col("type_a") < col("type_b"))

    // merged support per pair: every distinct value of either side, with
    // per-side counts (0 where absent). The pair frame is exploded into
    // (pair, side) rows so the hist join is a plain EQUI-join on t with
    // the tiny side broadcast — never a nested-loop OR-join.
    val sides = pairs
      .select(col("type_a"), col("type_b"),
        explode(array(col("type_a"), col("type_b"))).as("t"))
    val merged = sides
      .join(hist.select(col("t"), col("v"), col("c")), Seq("t"))
      .groupBy(col("type_a"), col("type_b"), col("v"))
      .agg(
        sum(when(col("t") === col("type_a"), col("c")).otherwise(0L))
          .as("ca"),
        sum(when(col("t") === col("type_b"), col("c")).otherwise(0L))
          .as("cb"))

    val byPair = Window.partitionBy(col("type_a"), col("type_b"))
    val scan = byPair.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val whole = byPair
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val stepped = merged
      .withColumn("cum_a", sum(col("ca")).over(scan))
      .withColumn("cum_b", sum(col("cb")).over(scan))
      .withColumn("n_a", sum(col("ca")).over(whole))
      .withColumn("n_b", sum(col("cb")).over(whole))
      .withColumn("gap",
        lead(col("v"), 1).over(byPair.orderBy(col("v"))) - col("v"))
      .filter(col("gap").isNotNull) // last support point carries no mass
      .withColumn("term",
        abs(col("cum_a").cast(d38) * col("n_b").cast(d38)
          - col("cum_b").cast(d38) * col("n_a").cast(d38))
          * col("gap").cast(d38))

    stepped
      .groupBy(col("type_a"), col("type_b"))
      .agg(
        max(col("n_a")).as("n_a"),
        max(col("n_b")).as("n_b"),
        sum(col("term")).as("w1_num"))
      .withColumn("w1_den",
        col("n_a").cast(d38) * col("n_b").cast(d38))
      .select(
        col("type_a"), col("type_b"), col("n_a"), col("n_b"),
        // over-int64-capable exact integers travel as STRINGS (the
        // value_moments convention, Analytics.scala:1557): DuckDB
        // materializes DECIMAL(38,0) into pandas as float64, so a raw
        // decimal column hash-mismatches the driver even when the
        // values are identical.
        col("w1_num").cast("decimal(38,0)").cast("string").as("w1_num"),
        col("w1_den").cast("decimal(38,0)").cast("string").as("w1_den"),
        expr("CAST(CAST(w1_num AS DECIMAL(38,0)) * 1000000" +
          " DIV (CAST(n_a AS DECIMAL(38,0)) * CAST(n_b AS DECIMAL(38,0)))" +
          " AS BIGINT)").as("w1_cents_micros"))
      .orderBy(col("type_a"), col("type_b"))
  }

  /** DuckDB replay: identical merged-support scan in window SQL,
    * HUGEINT cross-multiplied terms, floor-division quotient.
    */
  def w1ValueDriftOracleSql: String =
    """WITH hist AS (
      |  SELECT event_type AS t,
      |         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v,
      |         count(*) AS c
      |  FROM events WHERE value IS NOT NULL GROUP BY event_type, v
      |),
      |pairs AS (
      |  SELECT a.t AS type_a, b.t AS type_b
      |  FROM (SELECT DISTINCT t FROM hist) a,
      |       (SELECT DISTINCT t FROM hist) b
      |  WHERE a.t < b.t
      |),
      |merged AS (
      |  SELECT p.type_a, p.type_b, h.v,
      |         sum(CASE WHEN h.t = p.type_a THEN h.c ELSE 0 END) AS ca,
      |         sum(CASE WHEN h.t = p.type_b THEN h.c ELSE 0 END) AS cb
      |  FROM pairs p
      |  JOIN hist h ON h.t = p.type_a OR h.t = p.type_b
      |  GROUP BY p.type_a, p.type_b, h.v
      |),
      |stepped AS (
      |  SELECT type_a, type_b, v,
      |    sum(ca) OVER w AS cum_a,
      |    sum(cb) OVER w AS cum_b,
      |    sum(ca) OVER p AS n_a,
      |    sum(cb) OVER p AS n_b,
      |    lead(v) OVER (PARTITION BY type_a, type_b ORDER BY v) - v AS gap
      |  FROM merged
      |  WINDOW w AS (PARTITION BY type_a, type_b ORDER BY v
      |               ROWS UNBOUNDED PRECEDING),
      |         p AS (PARTITION BY type_a, type_b)
      |)
      |SELECT type_a, type_b,
      |  CAST(max(n_a) AS BIGINT) AS n_a,
      |  CAST(max(n_b) AS BIGINT) AS n_b,
      |  CAST(CAST(sum(abs(CAST(cum_a AS HUGEINT) * n_b
      |              - CAST(cum_b AS HUGEINT) * n_a) * gap)
      |       AS DECIMAL(38,0)) AS VARCHAR) AS w1_num,
      |  CAST(CAST(CAST(max(n_a) AS HUGEINT) * max(n_b) AS DECIMAL(38,0))
      |    AS VARCHAR) AS w1_den,
      |  CAST(sum(abs(CAST(cum_a AS HUGEINT) * n_b
      |              - CAST(cum_b AS HUGEINT) * n_a) * gap) * 1000000
      |       // (CAST(max(n_a) AS HUGEINT) * max(n_b)) AS BIGINT)
      |    AS w1_cents_micros
      |FROM stepped
      |WHERE gap IS NOT NULL
      |GROUP BY type_a, type_b
      |ORDER BY type_a, type_b""".stripMargin
}
