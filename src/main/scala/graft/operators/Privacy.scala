package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy-governance operators: the k-anonymity audit and a bounded
  * generalization ladder (Sweeney, IJUFKS 2002; Samarati, TKDE 2001) over
  * quasi-identifier (QI) combinations — the release gate a data pipeline
  * runs before publishing user-derived tables. Companion to the regex
  * PII redaction pass (`pii_redact`).
  *
  * Scale design: everything is hash aggregates over QI tuples — the audit
  * is one scan with map-side combine; the ladder is a per-LEVEL group
  * count joined back by QI key (broadcast when the violating-group frame
  * is small, which it is by definition — violators are the k<threshold
  * tail). No per-record state, no iteration beyond the FIXED number of
  * generalization levels.
  */
object Privacy {

  /** Balance generalized to a bucket at ladder level 0/1/2: $1000 bands,
    * $5000 bands, then fully suppressed. Stringly-typed so every level
    * lives in one column (the published schema of an anonymized release).
    */
  private def balBucket(level: Int): Column = level match {
    case 0 => concat(lit("b1k:"), floor(col("c_acctbal") / 1000.0).cast("long"))
    case 1 => concat(lit("b5k:"), floor(col("c_acctbal") / 5000.0).cast("long"))
    case _ => lit("*")
  }

  /** k-anonymity + l-diversity audit: for each QI combination
    * (nation, segment, $1000 balance band), the group size k, the
    * l-diversity of the sensitive attribute (distinct exact balances),
    * and the at-risk flag (k below threshold). One scan, one hash
    * aggregate; the report is QI-domain-bounded.
    */
  def kAnonymityAudit(customer: DataFrame, k: Int = 5): DataFrame =
    customer
      .groupBy(
        col("c_nationkey").as("nation"),
        col("c_mktsegment").as("segment"),
        balBucket(0).as("bal_bucket"))
      .agg(
        count(lit(1)).as("k"),
        countDistinct(col("c_acctbal")).as("l_distinct"))
      .withColumn("at_risk", col("k") < k)
      .orderBy(col("nation"), col("segment"), col("bal_bucket"))

  /** Full-domain generalization ladder: each record publishes the FINEST
    * balance bucket at which its (nation, segment, bucket) group reaches
    * size >= k; records still exposed at the coarsest level are
    * suppressed. Exactly the fixed-ladder variant of Samarati's
    * full-domain generalization: level 0 = $1000 bands, level 1 = $5000
    * bands, level 2 = suppressed bucket, and a group promotes as a WHOLE
    * (group size at level L decides for every record in it — promotion
    * is monotone because level-L groups nest inside level-L+1 groups).
    *
    * Emitted as the anonymized release's group table: final QI tuple,
    * group size, and the level it published at. The count of level-2
    * rows is the suppression cost of the release.
    *
    * Distributed shape: two QI-bounded count aggregates (level 0 and
    * level 1) joined onto the record frame by QI key — the joins are
    * broadcastable because the group-count frames are domain-bounded —
    * then one final aggregate over published tuples. No iteration:
    * the ladder depth is a compile-time constant.
    */
  def kAnonymize(customer: DataFrame, k: Int = 5): DataFrame = {
    val qi0 = Seq(col("c_nationkey").as("nation"),
      col("c_mktsegment").as("segment"))
    val recs = customer.select(
      (qi0 :+ balBucket(0).as("b0")) :+ balBucket(1).as("b1"): _*)
    val k0 = recs.groupBy(col("nation"), col("segment"), col("b0"))
      .agg(count(lit(1)).as("k0"))
    val k1 = recs.groupBy(col("nation"), col("segment"), col("b1"))
      .agg(count(lit(1)).as("k1"))
    recs
      .join(broadcast(k0), Seq("nation", "segment", "b0"))
      .join(broadcast(k1), Seq("nation", "segment", "b1"))
      .withColumn("level",
        when(col("k0") >= k, 0).when(col("k1") >= k, 1).otherwise(2))
      .withColumn("bal_bucket",
        when(col("level") === 0, col("b0"))
          .when(col("level") === 1, col("b1"))
          .otherwise(lit("*")))
      .groupBy(col("nation"), col("segment"), col("bal_bucket"), col("level"))
      .agg(count(lit(1)).as("group_size"))
      .orderBy(col("nation"), col("segment"), col("level"), col("bal_bucket"))
  }

  /** t-closeness audit (Li, Li & Venkatasubramanian, ICDE 2007) —
    * completes the k-anonymity / l-diversity / t-closeness triad: for
    * each QI group (nation, segment), the Earth-Mover's Distance between
    * the group's sensitive-attribute distribution ($1000 balance bands,
    * an ORDERED domain) and the global distribution. For 1-D ordered
    * categories EMD is the mean absolute difference of the two CDFs:
    *   EMD = Σ_b |cumP_g(b) − cumP(b)| / (m − 1)
    * computed EXACTLY by clearing denominators:
    *   emd_micros = (Σ_b |cum_g(b)·N − cum(b)·n_g|) · 10^6
    *                  DIV (n_g · N · (m−1)).
    *
    * Scale: ONE record-table hash aggregate (the QI × band cell counts),
    * two re-aggregates of that bounded cells frame (group sizes, band
    * totals), a broadcast cross of groups × bands (so zero-count bands
    * enter the CDF), and windows over that bounded frame — the record
    * table is scanned once and never reshuffled.
    */
  def tCloseness(customer: DataFrame, tMicros: Long = 200000): DataFrame = {
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val base = customer.select(
      col("c_nationkey").as("nation"),
      col("c_mktsegment").as("segment"),
      floor(col("c_acctbal") / 1000.0).cast("long").as("bucket"))
    val cells = base.groupBy(col("nation"), col("segment"), col("bucket"))
      .agg(count(lit(1)).as("c_gb"))
    // group sizes and band totals re-aggregate the BOUNDED cells frame —
    // the record table is scanned exactly once (the cells aggregate)
    val groups = cells.groupBy(col("nation"), col("segment"))
      .agg(sum(col("c_gb")).as("n_g"))
    val bands = cells.groupBy(col("bucket")).agg(sum(col("c_gb")).as("c_b"))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col("nation"), col("segment"))
      .orderBy(col("bucket"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val gwin = org.apache.spark.sql.expressions.Window
      .orderBy(col("bucket"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val bandsCum = bands
      .withColumn("cum_b", sum(col("c_b")).over(gwin))
      .withColumn("n_total", sum(col("c_b")).over(
        org.apache.spark.sql.expressions.Window.partitionBy()
          .rowsBetween(Long.MinValue, Long.MaxValue)))
      .withColumn("m", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy()
          .rowsBetween(Long.MinValue, Long.MaxValue)))
    groups
      .crossJoin(broadcast(bandsCum))
      .join(cells, Seq("nation", "segment", "bucket"), "left")
      .withColumn("c_gb", coalesce(col("c_gb"), lit(0L)))
      .withColumn("cum_g", sum(col("c_gb")).over(win))
      .groupBy(col("nation"), col("segment"))
      .agg(
        first(col("n_g")).as("n_g"),
        sum(abs(col("cum_g").cast(dec38) * col("n_total") -
          col("cum_b").cast(dec38) * col("n_g"))).as("num"),
        first(col("n_total")).as("n_total"),
        first(col("m")).as("m"))
      .select(
        col("nation"), col("segment"), col("n_g"),
        // m = 1 (every balance in one band) means every distribution is
        // the global one: EMD is 0 by definition — and the unguarded
        // (m - 1) divisor would throw under ANSI where DuckDB NULLs
        when(col("m") > 1,
          expr("CAST(num AS DECIMAL(38,0)) * 1000000" +
            " DIV (CAST(n_g AS DECIMAL(38,0)) * n_total * (m - 1))"))
          .otherwise(lit(0L))
          .as("emd_micros"))
      .withColumn("t_violation", col("emd_micros") > tMicros)
      .orderBy(col("nation"), col("segment"))
  }

  /** Recursive (c,l)-diversity audit (Machanavajjhala et al., ICDE 2006)
    * — the criterion between k-anonymity's "big enough" and
    * t-closeness's "distribution-shaped": a QI class is (c,l)-diverse
    * iff the most common sensitive value is not c-times-dominant over
    * the tail, r₁ < c·(r_l + … + r_m) on the DESC-sorted sensitive
    * counts. Catches the class that k-anonymity passes where 49 of 50
    * records share one sensitive value (a 98%-confidence homogeneity
    * attack).
    *
    * QI = (nation, $1000 band); sensitive = market segment. Tie order
    * among equal counts is irrelevant: r₁ is the max, and the ≥l tail
    * SUM is invariant to how equal values straddle the rank boundary.
    *
    * Scale: one (QI × sensitive) hash aggregate, then windows over the
    * QI-domain-bounded cell frame.
    */
  def recursiveLDiversity(
      customer: DataFrame, l: Int = 3, c: Int = 2): DataFrame = {
    val cells = customer
      .groupBy(
        col("c_nationkey").as("nation"),
        floor(col("c_acctbal") / 1000.0).cast("long").as("bucket"),
        col("c_mktsegment").as("segment"))
      .agg(count(lit(1)).as("r"))
    val byClass = org.apache.spark.sql.expressions.Window
      .partitionBy(col("nation"), col("bucket"))
    val ranked = cells
      .withColumn("rk", row_number().over(
        byClass.orderBy(col("r").desc, col("segment"))))
    ranked
      .groupBy(col("nation"), col("bucket"))
      .agg(
        sum(col("r")).as("class_size"),
        count(lit(1)).as("m_distinct"),
        max(when(col("rk") === 1, col("r"))).as("r1"),
        coalesce(sum(when(col("rk") >= l, col("r"))), lit(0L))
          .as("tail_sum"))
      .withColumn("well_diverse", col("r1") < lit(c.toLong) * col("tail_sum"))
      .orderBy(col("nation"), col("bucket"))
  }

  def recursiveLDiversityOracleSql(l: Int = 3, c: Int = 2): String =
    s"""WITH cells AS (
       |  SELECT c_nationkey AS nation,
       |    CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bucket,
       |    c_mktsegment AS segment,
       |    CAST(count(*) AS BIGINT) AS r
       |  FROM customer GROUP BY 1, 2, 3),
       |rk AS (
       |  SELECT *, row_number() OVER (PARTITION BY nation, bucket
       |    ORDER BY r DESC, segment) AS rk
       |  FROM cells)
       |SELECT nation, bucket,
       |  CAST(sum(r) AS BIGINT) AS class_size,
       |  CAST(count(*) AS BIGINT) AS m_distinct,
       |  CAST(max(CASE WHEN rk = 1 THEN r END) AS BIGINT) AS r1,
       |  CAST(COALESCE(sum(CASE WHEN rk >= $l THEN r END), 0) AS BIGINT)
       |    AS tail_sum,
       |  max(CASE WHEN rk = 1 THEN r END)
       |    < $c * COALESCE(sum(CASE WHEN rk >= $l THEN r END), 0)
       |    AS well_diverse
       |FROM rk GROUP BY 1, 2
       |ORDER BY nation, bucket""".stripMargin

  /** Per-user contribution bounding + value clipping — the
    * sensitivity-control pass differential privacy needs BEFORE noise
    * (Wilson et al., VLDB 2020 §4: bound each user to ≤ maxPerUser rows
    * per partition, clip each value to capCents): after this transform,
    * one user can move a per-type sum by at most maxPerUser·capCents —
    * the published l1_sensitivity_cents — however pathological their
    * activity. Deterministic keep-first-k (by ts, event_id), so the
    * report is replayable; the noise-addition step itself is out of
    * scope (it is not a deterministic relational transform).
    *
    * Scale: one (user,type)-keyed window over naturally small
    * partitions, one type-keyed aggregate. No global state.
    */
  def contributionCappedAgg(
      events: DataFrame,
      maxPerUser: Int = 3,
      capCents: Long = 20000L): DataFrame = {
    val cents = (col("value").cast("decimal(18,2)") * 100).cast("bigint")
    val byUserType = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    val ranked = events
      .select(col("user_id"), col("event_type"), col("ts"),
        col("event_id"), cents.as("cents"))
      .withColumn("rk", row_number().over(byUserType))
    ranked
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("raw_rows"),
        sum(when(col("rk") <= maxPerUser, 1L).otherwise(0L))
          .as("kept_rows"),
        countDistinct(col("user_id")).as("contributing_users"),
        sum(when(col("rk") > maxPerUser, 1L).otherwise(0L))
          .as("rows_dropped"),
        sum(when(col("rk") === (maxPerUser + 1), 1L).otherwise(0L))
          .as("users_truncated"),
        sum(col("cents")).as("raw_sum_cents"),
        sum(when(col("rk") <= maxPerUser,
          least(col("cents"), lit(capCents))).otherwise(0L))
          .as("capped_sum_cents"),
        sum(when(col("rk") <= maxPerUser && col("cents") > capCents, 1L)
          .otherwise(0L)).as("clipped_rows"))
      .withColumn("l1_sensitivity_cents",
        lit(maxPerUser.toLong * capCents))
      .orderBy(col("event_type"))
  }

  def contributionCappedAggOracleSql(
      maxPerUser: Int = 3, capCents: Long = 20000L): String =
    s"""WITH r AS (
       |  SELECT user_id, event_type, ts, event_id,
       |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
       |    row_number() OVER (PARTITION BY user_id, event_type
       |      ORDER BY ts, event_id) AS rk
       |  FROM events)
       |SELECT event_type,
       |  CAST(count(*) AS BIGINT) AS raw_rows,
       |  CAST(sum(CASE WHEN rk <= $maxPerUser THEN 1 ELSE 0 END)
       |    AS BIGINT) AS kept_rows,
       |  CAST(count(DISTINCT user_id) AS BIGINT) AS contributing_users,
       |  CAST(sum(CASE WHEN rk > $maxPerUser THEN 1 ELSE 0 END)
       |    AS BIGINT) AS rows_dropped,
       |  CAST(sum(CASE WHEN rk = ${maxPerUser + 1} THEN 1 ELSE 0 END)
       |    AS BIGINT) AS users_truncated,
       |  CAST(sum(cents) AS BIGINT) AS raw_sum_cents,
       |  CAST(sum(CASE WHEN rk <= $maxPerUser
       |    THEN least(cents, $capCents) ELSE 0 END) AS BIGINT)
       |    AS capped_sum_cents,
       |  CAST(sum(CASE WHEN rk <= $maxPerUser AND cents > $capCents
       |    THEN 1 ELSE 0 END) AS BIGINT) AS clipped_rows,
       |  CAST(${maxPerUser.toLong * capCents} AS BIGINT)
       |    AS l1_sensitivity_cents
       |FROM r GROUP BY event_type
       |ORDER BY event_type""".stripMargin

  /** Fixed splitmix64 seed for the randomized-response coin — a public
    * constant, emitted as a literal into the oracle so both engines draw
    * the identical coin per event.
    */
  val LdpSeed: Long = graft.functions.Mix64.mix(0x4C4450525253L)

  /** Warner-style randomized response (Warner, JASA 1965) under local
    * differential privacy: each event reports its sensitive bit
    * b = [event_type = 'purchase'] truthfully with probability 3/4 and
    * flipped with probability 1/4 — the classic ε = ln 3 local-DP
    * mechanism (P[report=1|b=1]/P[report=1|b=0] = (3/4)/(1/4) = 3).
    *
    * The "coin" is the low two bits of the public splitmix64 chain on
    * event_id (flip iff mix(mix(id) ⊕ seed) ≡ 0 mod 4) — the same
    * deterministic-randomness convention as [[Randomization]], so the
    * mechanism is bit-replayable in the oracle. The per-day debiased
    * count estimator is exact integer arithmetic throughout:
    *
    *   E[R] = n/4 + b_true/2  ⇒  b̂ = (4·R − n)/2
    *
    * so est_micros = (4·R − n)·500000 — no division at all (the /2
    * folds into the micros scale), hence no floor-vs-truncate hazard
    * even though the estimator can go negative. The true count rides
    * along as the utility audit (abs_err_micros).
    *
    * Scale: one map-side-combined aggregate over the event scan — the
    * mechanism is a per-row scalar, the estimator a 3-counter groupBy.
    * Overflow: est_micros = (4R−n)·5·10⁵ needs day volume < ~4.6e12
    * events; beyond that the micros scale moves to DECIMAL(38,0).
    */
  def ldpRandomizedResponse(events: DataFrame): DataFrame = {
    import graft.functions.GraftColumns.mix64
    val b = when(col("event_type") === "purchase", 1L).otherwise(0L)
    val flip = pmod(
      mix64(mix64(col("event_id")).bitwiseXOR(lit(LdpSeed))),
      lit(4L)) === 0L
    val reported = when(flip, lit(1L) - b).otherwise(b)
    events
      .select(date_trunc("day", col("ts")).as("day"),
        b.as("b"), reported.as("rep"))
      .groupBy(col("day"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("b")).as("n_true"),
        sum(col("rep")).as("n_reported"))
      .withColumn("est_num",
        lit(4L) * col("n_reported") - col("n_events"))
      .withColumn("est_micros", col("est_num") * lit(500000L))
      .withColumn("abs_err_micros",
        abs(col("est_micros") - col("n_true") * lit(1000000L)))
      .orderBy(col("day"))
  }

  /** DuckDB replay: the same two mix64 rounds on event_id via the shared
    * HUGEINT chain, seed emitted as an unsigned literal.
    */
  def ldpRandomizedResponseOracleSql: String = {
    import graft.SketchOracles.{mixChain, U64 => u64}
    val golden = "11400714819323198485::HUGEINT"
    val seed =
      (BigInt(LdpSeed) & ((BigInt(1) << 64) - 1)).toString + "::HUGEINT"
    s"""WITH ev AS (
  SELECT date_trunc('day', ts) AS day,
    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS b,
    ((CASE WHEN event_id < 0 THEN CAST(event_id AS HUGEINT) + $u64
           ELSE CAST(event_id AS HUGEINT) END) + $golden) % $u64 AS z0
  FROM events),
${mixChain("m1", "ev", Seq("day", "b"), "z0")},
x1 AS (SELECT day, b, (xor(mx, $seed) + $golden) % $u64 AS z0 FROM m14),
${mixChain("m2", "x1", Seq("day", "b"), "z0")},
rr AS (SELECT day, b,
  CASE WHEN mx % 4 = 0 THEN 1 - b ELSE b END AS rep FROM m24),
agg AS (SELECT day,
  CAST(count(*) AS BIGINT) AS n_events,
  CAST(sum(b) AS BIGINT) AS n_true,
  CAST(sum(rep) AS BIGINT) AS n_reported
  FROM rr GROUP BY day)
SELECT day, n_events, n_true, n_reported,
  4 * n_reported - n_events AS est_num,
  (4 * n_reported - n_events) * 500000 AS est_micros,
  abs((4 * n_reported - n_events) * 500000 - n_true * 1000000)
    AS abs_err_micros
FROM agg ORDER BY day"""
  }

  def tClosenessOracleSql(tMicros: Long = 200000): String =
    s"""WITH base AS (SELECT c_nationkey AS nation, c_mktsegment AS segment,
  CAST(floor(CAST(c_acctbal AS DOUBLE) / 1000.0) AS BIGINT) AS bucket
  FROM customer),
cells AS (SELECT nation, segment, bucket, CAST(count(*) AS BIGINT) AS c_gb
  FROM base GROUP BY 1, 2, 3),
groups AS (SELECT nation, segment, CAST(sum(c_gb) AS BIGINT) AS n_g
  FROM cells GROUP BY 1, 2),
bands AS (SELECT bucket, CAST(sum(c_gb) AS BIGINT) AS c_b
  FROM cells GROUP BY 1),
bc AS (SELECT bucket, c_b,
  CAST(sum(c_b) OVER (ORDER BY bucket
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_b,
  CAST(sum(c_b) OVER () AS BIGINT) AS n_total,
  CAST(count(*) OVER () AS BIGINT) AS m FROM bands),
full_grid AS (SELECT g.nation, g.segment, g.n_g, b.bucket, b.cum_b,
  b.n_total, b.m, COALESCE(c.c_gb, 0) AS c_gb
  FROM groups g CROSS JOIN bc b
  LEFT JOIN cells c ON c.nation = g.nation AND c.segment = g.segment
    AND c.bucket = b.bucket),
cg AS (SELECT *, CAST(sum(c_gb) OVER (PARTITION BY nation, segment
  ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
  AS BIGINT) AS cum_g FROM full_grid),
agg AS (SELECT nation, segment, any_value(n_g) AS n_g,
  CAST(sum(abs(CAST(cum_g AS HUGEINT) * n_total
    - CAST(cum_b AS HUGEINT) * n_g)) AS HUGEINT) AS num,
  any_value(n_total) AS n_total, any_value(m) AS m
  FROM cg GROUP BY 1, 2)
SELECT nation, segment, n_g,
  CASE WHEN m > 1 THEN
    CAST(num * 1000000 // (CAST(n_g AS HUGEINT) * n_total * (m - 1))
      AS BIGINT) ELSE 0 END AS emd_micros,
  (CASE WHEN m > 1 THEN
    CAST(num * 1000000 // (CAST(n_g AS HUGEINT) * n_total * (m - 1))
      AS BIGINT) ELSE 0 END > $tMicros) AS t_violation
FROM agg ORDER BY nation, segment"""
}
