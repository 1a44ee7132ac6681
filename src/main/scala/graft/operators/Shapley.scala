package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** EXACT Shapley-value attribution (Shapley 1953; the coalitional
  * formulation marketing pipelines run beside position rules — cf.
  * `linear_attribution`'s equal split and `delta_attribution`'s
  * before/after deltas): the characteristic function v(S) counts
  * conversions whose pre-purchase channel set is contained in S, and
  * channel i's credit is
  *
  *   φ_i = Σ_{S ⊆ C\{i}} |S|!·(|C|−|S|−1)!/|C|! · (v(S∪{i}) − v(S)).
  *
  * Exactness: clearing the |C|! denominator makes every φ an integer —
  * `phi_x_fact` = φ·|C|! — computed from integer subset counts and
  * factorial weights; Σᵢ phi_x_fact = |C|!·(v(C) − v(∅)) (the
  * empty-journey conversions are unattributable), pinned by the spec.
  * Shares are floor-micros of that exact ratio.
  *
  * Scale: the corpus reduces in one scan + one broadcast-joined filter
  * to a per-user bitmask frame (map-side combine); EVERYTHING downstream
  * is bounded by the channel catalog — ≤2^|C| mask-count rows, 2^|C|
  * subset rows, |C|·2^|C|-pair joins of broadcast frames. The single
  * driver collect is the sorted channel universe (catalog-scale,
  * `require`-bounded at maxChannels=12 — the 2^|C| blow-up is
  * intrinsic to exact Shapley; larger universes need the sampling
  * estimator, deliberately out of scope).
  */
object Shapley {

  def shapleyAttribution(events: DataFrame,
      maxChannels: Int = 12): DataFrame = {
    val spark = events.sparkSession
    val channels = events
      .filter(col("event_type") =!= "purchase")
      .select(col("event_type")).distinct()
      .collect().map(_.getString(0)).sorted
    require(channels.length <= maxChannels,
      s"exact Shapley is 2^|C|: ${channels.length} channels > $maxChannels")
    val nc = channels.length
    val bitOf = typedLit(channels.zipWithIndex.map {
      case (c, i) => c -> (1L << i)
    }.toMap)
    val fact = (0 to nc).map(k => (1 to k).foldLeft(1L)(_ * _))
    // weight by |S|: |S|!·(nc−1−|S|)!
    val wOf = typedLit((0 until nc)
      .map(k => k -> fact(k) * fact(nc - 1 - k)).toMap)

    val first = events.filter(col("event_type") === "purchase")
      .groupBy(col("user_id")).agg(min(col("ts")).as("fp"))
    val journeys = events.filter(col("event_type") =!= "purchase")
      .join(first, Seq("user_id"))
      .filter(col("ts") < col("fp"))
      .select(col("user_id"), element_at(bitOf, col("event_type")).as("b"))
      .distinct()
      .groupBy(col("user_id")).agg(sum(col("b")).as("mask"))
    val cnt = first.join(journeys, Seq("user_id"), "left")
      .select(coalesce(col("mask"), lit(0L)).as("mask"))
      .groupBy(col("mask")).agg(count(lit(1)).as("cnt"))
    val v = spark.range(0L, 1L << nc).select(col("id").as("s"))
      .join(broadcast(cnt),
        cnt("mask").bitwiseAND(col("s")) === cnt("mask"), "left")
      .groupBy(col("s")).agg(coalesce(sum(col("cnt")), lit(0L)).as("v"))
    val chans = spark.createDataFrame(
      channels.zipWithIndex.toSeq.map { case (c, i) => (c, 1L << i) })
      .toDF("channel", "bit")
    val s0 = v.select(col("s").as("s0"), col("v").as("v0"))
    val s1 = v.select(col("s").as("s1"), col("v").as("v1"))
    val totals = v.agg(
      max(when(col("s") === (1L << nc) - 1, col("v"))).as("conv"),
      max(when(col("s") === 0L, col("v"))).as("empty"))
    broadcast(chans)
      .join(s0, s0("s0").bitwiseAND(col("bit")) === 0L)
      .join(s1, s1("s1") === s0("s0").bitwiseOR(col("bit")))
      .groupBy(col("channel"))
      .agg(sum(element_at(wOf, expr("bit_count(s0)").cast("int"))
        .cast("decimal(38,0)") * (col("v1") - col("v0")))
        .cast("decimal(38,0)").as("phi"))
      .crossJoin(broadcast(totals))
      .select(
        col("channel"),
        col("phi").cast("bigint").as("phi_x_fact"),
        col("conv").as("conversions"),
        (col("conv") - col("empty")).as("attributable"),
        when(col("conv") - col("empty") > 0L,
          expr(s"cast((phi * 1000000) DIV (${fact(nc)} *" +
            " (conv - empty)) as bigint)"))
          .as("share_micros"))
      .orderBy(col("channel"))
  }

  /** Static-text replay: the channel universe, subset lattice (recursive
    * include/exclude CTE), factorials, and the same cleared-denominator
    * weighted sum — all derived from the data inside the SQL.
    */
  def shapleyOracleSql: String =
    """WITH RECURSIVE uni AS (
      |  SELECT channel,
      |    CAST(row_number() OVER (ORDER BY channel) - 1 AS BIGINT) AS idx
      |  FROM (SELECT DISTINCT event_type AS channel FROM events
      |        WHERE event_type <> 'purchase') u),
      |nc AS (SELECT CAST(count(*) AS INTEGER) AS n FROM uni),
      |fp AS (
      |  SELECT user_id, min(ts) AS fp FROM events
      |  WHERE event_type = 'purchase' GROUP BY 1),
      |jm AS (
      |  SELECT DISTINCT f.user_id, u.idx
      |  FROM fp f
      |  JOIN events e ON e.user_id = f.user_id AND e.ts < f.fp
      |    AND e.event_type <> 'purchase'
      |  JOIN uni u ON u.channel = e.event_type),
      |masks AS (
      |  SELECT f.user_id, coalesce(
      |    (SELECT sum(CAST(1 AS BIGINT) << j.idx) FROM jm j
      |     WHERE j.user_id = f.user_id), 0) AS mask
      |  FROM fp f),
      |cnt AS (SELECT mask, CAST(count(*) AS BIGINT) AS cnt
      |        FROM masks GROUP BY 1),
      |subsets(s, i) AS (
      |  SELECT CAST(0 AS BIGINT), 0
      |  UNION ALL
      |  SELECT s | (CAST(b.b AS BIGINT) << i), i + 1
      |  FROM subsets, (VALUES (0), (1)) b(b), nc WHERE i < n),
      |v AS (
      |  SELECT t.s, CAST(coalesce(sum(c.cnt), 0) AS BIGINT) AS v
      |  FROM (SELECT s FROM subsets, nc WHERE i = n) t
      |  LEFT JOIN cnt c ON (c.mask & t.s) = c.mask
      |  GROUP BY 1),
      |fact(k, f) AS (
      |  SELECT 0, CAST(1 AS HUGEINT)
      |  UNION ALL
      |  SELECT k + 1, f * (k + 1) FROM fact, nc WHERE k < n),
      |tot AS (
      |  SELECT
      |    (SELECT v FROM v, nc WHERE s = (CAST(1 AS BIGINT) << n) - 1)
      |      AS conv,
      |    (SELECT v FROM v WHERE s = 0) AS empty),
      |phi AS (
      |  SELECT u.channel,
      |    CAST(sum(f1.f * f2.f * (s1.v - s0.v)) AS HUGEINT) AS phi
      |  FROM uni u
      |  JOIN v s0 ON (s0.s & (CAST(1 AS BIGINT) << u.idx)) = 0
      |  JOIN v s1 ON s1.s = (s0.s | (CAST(1 AS BIGINT) << u.idx))
      |  JOIN fact f1 ON f1.k = bit_count(s0.s)
      |  JOIN nc ON true
      |  JOIN fact f2 ON f2.k = nc.n - 1 - bit_count(s0.s)
      |  GROUP BY 1)
      |SELECT p.channel, CAST(p.phi AS BIGINT) AS phi_x_fact,
      |  t.conv AS conversions,
      |  t.conv - t.empty AS attributable,
      |  CASE WHEN t.conv - t.empty > 0 THEN
      |    CAST((p.phi * 1000000) //
      |      ((SELECT f FROM fact, nc WHERE k = n) * (t.conv - t.empty))
      |      AS BIGINT)
      |  END AS share_micros
      |FROM phi p, tot t
      |ORDER BY p.channel""".stripMargin
}
