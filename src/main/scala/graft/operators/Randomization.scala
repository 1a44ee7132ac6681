package graft.operators

import graft.functions.Mix64
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fisher randomization inference for the A/B revenue contrast
  * (Fisher 1935; modern treatment: Imbens & Rubin 2015, ch. 5): instead
  * of a parametric null, the treatment labels are re-drawn B times under
  * the null of no effect and the observed mean difference is ranked
  * against the replicated differences. The Bernoulli(½) re-draw makes
  * this the RANDOMIZATION-test variant (labels re-flipped per unit, the
  * same mechanism `user_id % 2` plausibly came from) rather than the
  * finite-population permutation that preserves group sizes exactly —
  * the p-value is `(1 + #{|T_b| ≥ |T_obs|}) / (B + 1)`, the standard
  * add-one Monte-Carlo estimator (Davison & Hinkley 1997, eq. 4.12).
  *
  * Everything is exact integer arithmetic, bit-identical across engines:
  *  - per-user revenue in cents (the DECIMAL(18,2)·100 contract);
  *  - replicate b's label for user u = low bit of
  *    mix64(mix64(u) XOR seed_b) — the same public splitmix64 finalizer
  *    chain the bootstrap/minhash oracles replay in DuckDB;
  *  - the mean difference is compared CROSS-MULTIPLIED:
  *    |T_b| = |sA_b·nB_b − sB_b·nA_b| lives over denominator nA_b·nB_b,
  *    so `|T_b| ≥ |T_obs|` becomes
  *    |sA_b·nB_b − sB_b·nA_b| · (nA·nB) ≥ |sA·nB − sB·nA| · (nA_b·nB_b)
  *    in DECIMAL(38,0) / HUGEINT — no division anywhere, so no
  *    floor-vs-truncate hazard and no float.
  *
  * Scale: ONE full scan — the per-user reduction shuffles on user_id
  * once, then a single wide aggregate computes all B replicate sums
  * map-side (2B+3 running longs per partition, no per-replicate pass,
  * no crossJoin blowup). This is the bootstrapCi shape: at 100 TB the
  * cost is the user-level groupBy that any per-user metric already pays,
  * plus O(B) registers per partition.
  */
object Randomization {

  /** Replicate count. p-value resolution = 1/(B+1). */
  val B = 64

  /** Per-replicate seeds — fixed splitmix64 points, single-sourced for
    * both engines (emitted as literals into the oracle SQL).
    */
  def permSeeds: Seq[Long] =
    (1 to B).map(b => Mix64.mix(0x9E37F1A7C15DA7L * b + 0xF15AE12345L))

  private def replicateBit(user: Column, seed: Long): Column = {
    import graft.functions.GraftColumns.mix64
    pmod(mix64(mix64(user).bitwiseXOR(lit(seed))), lit(2L)).cast("long")
  }

  /** One-row report: group sizes, the observed cross-multiplied
    * statistic, the exceed count and the add-one p-value as an exact
    * fraction (`p_num`/`p_den`).
    */
  def permTestAb(events: DataFrame): DataFrame = {
    val cents = graft.queries.Analytics
      .centsOf(when(col("event_type") === "purchase", col("value"))
        .otherwise(lit(0.0)))
      .cast("long")
    // unit frame: EVERY observed user (assignment must not depend on
    // outcome), x = total purchase cents (0 for non-purchasers)
    val units = events
      .groupBy(col("user_id").as("u"))
      .agg(sum(cents).as("x"))
    val obsBit = pmod(col("u"), lit(2L)).cast("long") // variant A = odd

    val aggs =
      Seq(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(obsBit).as("na"), sum(obsBit * col("x")).as("sa")) ++
        permSeeds.zipWithIndex.flatMap { case (seed, b) =>
          val bit = replicateBit(col("u"), seed)
          Seq(sum(bit).as(s"na_$b"), sum(bit * col("x")).as(s"sa_$b"))
        }
    val wide = units.agg(aggs.head, aggs.tail: _*)

    // |sA·nB − sB·nA| as DECIMAL(38,0), with nB = n − nA, sB = sx − sA
    def absT(na: Column, sa: Column): Column = {
      val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
      val nb = (col("n") - na).cast(d38)
      val sb = (col("sx") - sa).cast(d38)
      abs(sa.cast(d38) * nb - sb * na.cast(d38))
    }
    def pairProd(na: Column): Column = {
      val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
      na.cast(d38) * (col("n") - na).cast(d38)
    }

    val exceed = (0 until B).map { b =>
      when(absT(col(s"na_$b"), col(s"sa_$b")) * pairProd(col("na"))
        >= absT(col("na"), col("sa")) * pairProd(col(s"na_$b")),
        1L).otherwise(0L)
    }.reduceLeft(_ + _)

    wide
      .withColumn("exceed_cnt", exceed)
      .select(
        col("n").as("n_users"),
        col("na").as("n_a"),
        (col("n") - col("na")).as("n_b"),
        absT(col("na"), col("sa")).cast("long").as("abs_t_obs_num"),
        lit(B.toLong).as("replicates"),
        col("exceed_cnt"),
        (col("exceed_cnt") + 1L).as("p_num"),
        lit(B + 1L).as("p_den"))
  }

  /** DuckDB replay: same seeds as literals, the shared HUGEINT splitmix64
    * chain (SketchOracles.mixChain conventions), cross-multiplied exceed
    * comparison — bit-exact by construction.
    */
  def permTestAbOracleSql: String = {
    import graft.SketchOracles.{mixChain, U64 => u64}
    val golden = "11400714819323198485::HUGEINT"
    val seedRows = permSeeds.zipWithIndex
      .map { case (s, b) =>
        val us = (BigInt(s) & ((BigInt(1) << 64) - 1)).toString
        s"    ($b, $us::HUGEINT)"
      }.mkString(",\n")
    s"""WITH units AS (
  SELECT user_id AS u,
         CAST(sum(CASE WHEN event_type = 'purchase'
                       THEN CAST(CAST(value AS DECIMAL(18,2)) * 100
                                 AS DECIMAL(18,0))
                       ELSE 0 END) AS BIGINT) AS x
  FROM events GROUP BY user_id),
sd(b, su) AS (VALUES
$seedRows),
u1 AS (SELECT u, x,
  ((CASE WHEN u < 0 THEN CAST(u AS HUGEINT) + $u64
         ELSE CAST(u AS HUGEINT) END) + $golden) % $u64 AS z0 FROM units),
${mixChain("k1", "u1", Seq("u", "x"), "z0")},
x1 AS (SELECT x, b, (xor(mx, su) + $golden) % $u64 AS z0 FROM k14, sd),
${mixChain("b1", "x1", Seq("x", "b"), "z0")},
bits AS (SELECT x, b, CAST(mx % 2 AS BIGINT) AS bit FROM b14),
obs AS (SELECT count(*) AS n, sum(x) AS sx,
  sum(u % 2) AS na, sum((u % 2) * x) AS sa FROM units),
reps AS (SELECT b, sum(bit) AS nab, sum(bit * x) AS sab
  FROM bits GROUP BY b),
cmp AS (SELECT r.b,
  CASE WHEN abs(CAST(r.sab AS HUGEINT) * (o.n - r.nab)
              - CAST(o.sx - r.sab AS HUGEINT) * r.nab)
            * (CAST(o.na AS HUGEINT) * (o.n - o.na))
        >= abs(CAST(o.sa AS HUGEINT) * (o.n - o.na)
              - CAST(o.sx - o.sa AS HUGEINT) * o.na)
            * (CAST(r.nab AS HUGEINT) * (o.n - r.nab))
       THEN 1 ELSE 0 END AS ex
  FROM reps r, obs o)
SELECT o.n AS n_users,
  CAST(o.na AS BIGINT) AS n_a,
  CAST(o.n - o.na AS BIGINT) AS n_b,
  CAST(abs(CAST(o.sa AS HUGEINT) * (o.n - o.na)
         - CAST(o.sx - o.sa AS HUGEINT) * o.na) AS BIGINT)
    AS abs_t_obs_num,
  CAST($B AS BIGINT) AS replicates,
  CAST((SELECT sum(ex) FROM cmp) AS BIGINT) AS exceed_cnt,
  CAST((SELECT sum(ex) FROM cmp) + 1 AS BIGINT) AS p_num,
  CAST(${B + 1} AS BIGINT) AS p_den
FROM obs o"""
  }
}
