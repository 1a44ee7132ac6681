package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Omnibus k-group comparison tests, exact on the integer lattice — the
  * "is there ANY difference across groups" layer above the pairwise
  * tests in [[Experiment]] (Mann–Whitney) and [[MultipleTesting]]. All
  * three statistics are rationals of integer counts/rank sums; outputs
  * are defined floor-micros (sum-of-floors where a sum of per-group
  * fractions is involved — the [[Survival.nelsonAalen]] contract),
  * spelled identically in both engines.
  */
object GroupTests {

  private val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
  private def cents = (col("value").cast("decimal(18,2)") * 100).cast("long")

  /** Kruskal–Wallis H (Kruskal & Wallis, JASA 1952) across event types
    * on value cents, with the tie correction. Pooled average ranks stay
    * integral DOUBLED (the [[ClassifierEval.rocAucValue]] device):
    * rank2(v) = 2·cum_before + n_v + 1 on the distinct-cents histogram,
    * R2_g = Σ_v n_{g,v}·rank2(v), and with R_g = R2_g/2,
    *
    *   H = 12/(N(N+1)) · Σ_g R_g²/n_g − 3(N+1)
    *     = [Σ_g 3·R2_g²/(N(N+1)·n_g)] − 3(N+1)
    *   H_tie = H / (1 − ΣT/(N³−N)),  T_v = t_v³ − t_v
    *
    * CONTRACT: h_micros is the SUM of each group's exact floor micros of
    * 3·R2_g²·10⁶ DIV (N(N+1)·n_g), minus 3(N+1)·10⁶ — sum-of-floors,
    * deterministic and engine-identical; the tie adjustment is one more
    * exact DIV on DECIMAL(38,0)/HUGEINT. Emitted per group (group rank
    * sums are the per-row payload; H rides along group-constant).
    *
    * Scale: one scan to the (group × distinct cents) histogram; rank
    * windows run over the value-domain grid, never corpus rows.
    */
  def kruskalWallis(events: DataFrame): DataFrame = {
    val hist = events
      .select(col("event_type").as("g"), cents.as("v"))
      .groupBy(col("g"), col("v"))
      .agg(count(lit(1)).as("ngv"))
    val grid = hist.groupBy(col("v")).agg(sum(col("ngv")).as("nv"))
      .withColumn("cumb",
        coalesce(sum(col("nv")).over(Window.orderBy(col("v"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("rank2", lit(2L) * col("cumb") + col("nv") + 1L)
      .withColumn("tie_t",
        col("nv") * col("nv") * col("nv") - col("nv"))
    val groups = hist
      .join(grid.select(col("v"), col("rank2")), Seq("v"))
      .groupBy(col("g"))
      .agg(sum(col("ngv")).as("n_g"),
        sum(col("ngv") * col("rank2")).as("r2_g"))
    val tot = grid.agg(sum(col("nv")).as("n"), sum(col("tie_t")).as("t_sum"))
    val terms = groups.crossJoin(broadcast(tot))
      .withColumn("term_micros", expr(
        "CAST((CAST(r2_g AS DECIMAL(38,0)) * r2_g * 3000000)" +
          " DIV (CAST(n AS DECIMAL(38,0)) * (n + 1) * n_g) AS BIGINT)"))
    val all = Window.partitionBy()
    terms
      .withColumn("h_micros",
        sum(col("term_micros")).over(all) -
          lit(3L) * (col("n") + 1L) * lit(1000000L))
      // sum-of-floors can leave h_micros a few micros below 0 on a
      // degenerate all-tied sample, and ΣT = N³−N there zeroes the tie
      // denominator: sign-split the DIV and 0-guard the denominator
      .withColumn("h_tie_micros", expr(
        "CASE WHEN CAST(n AS DECIMAL(38,0)) * n * n - n - t_sum <= 0 THEN 0" +
          " WHEN h_micros >= 0 THEN" +
          " CAST((CAST(h_micros AS DECIMAL(38,0))" +
          " * (CAST(n AS DECIMAL(38,0)) * n * n - n))" +
          " DIV (CAST(n AS DECIMAL(38,0)) * n * n - n - t_sum) AS BIGINT)" +
          " ELSE -CAST((CAST(-h_micros AS DECIMAL(38,0))" +
          " * (CAST(n AS DECIMAL(38,0)) * n * n - n))" +
          " DIV (CAST(n AS DECIMAL(38,0)) * n * n - n - t_sum) AS BIGINT)" +
          " END"))
      .select(col("g").as("event_type"), col("n_g"), col("r2_g"),
        col("n"), col("t_sum"), col("h_micros"), col("h_tie_micros"))
      .orderBy(col("event_type"))
  }

  def kruskalWallisOracleSql: String =
    """WITH hist AS (
      |  SELECT event_type AS g,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v,
      |    CAST(count(*) AS BIGINT) AS ngv
      |  FROM events GROUP BY 1, 2),
      |grid AS (
      |  SELECT v, CAST(sum(ngv) AS BIGINT) AS nv FROM hist GROUP BY 1),
      |grid2 AS (
      |  SELECT v, nv,
      |    2 * COALESCE(CAST(sum(nv) OVER (ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
      |      0) + nv + 1 AS rank2,
      |    nv * nv * nv - nv AS tie_t
      |  FROM grid),
      |groups AS (
      |  SELECT h.g, CAST(sum(h.ngv) AS BIGINT) AS n_g,
      |    CAST(sum(h.ngv * g2.rank2) AS BIGINT) AS r2_g
      |  FROM hist h JOIN grid2 g2 ON h.v = g2.v GROUP BY 1),
      |tot AS (SELECT CAST(sum(nv) AS BIGINT) AS n,
      |    CAST(sum(tie_t) AS BIGINT) AS t_sum
      |  FROM grid2),
      |terms AS (
      |  SELECT g, n_g, r2_g, n, t_sum,
      |    CAST((CAST(r2_g AS HUGEINT) * r2_g * 3000000)
      |      // (CAST(n AS HUGEINT) * (n + 1) * n_g) AS BIGINT)
      |      AS term_micros
      |  FROM groups, tot),
      |h AS (
      |  SELECT *, CAST(sum(term_micros) OVER () AS BIGINT)
      |      - 3 * (n + 1) * 1000000 AS h_micros
      |  FROM terms)
      |SELECT g AS event_type, n_g, r2_g, n, t_sum, h_micros,
      |  CASE WHEN CAST(n AS HUGEINT) * n * n - n - t_sum <= 0 THEN 0
      |    WHEN h_micros >= 0 THEN
      |      CAST((CAST(h_micros AS HUGEINT)
      |          * (CAST(n AS HUGEINT) * n * n - n))
      |        // (CAST(n AS HUGEINT) * n * n - n - t_sum) AS BIGINT)
      |    ELSE -CAST((CAST(-h_micros AS HUGEINT)
      |          * (CAST(n AS HUGEINT) * n * n - n))
      |        // (CAST(n AS HUGEINT) * n * n - n - t_sum) AS BIGINT)
      |    END AS h_tie_micros
      |FROM h ORDER BY event_type""".stripMargin

  /** Cochran–Armitage trend test (Cochran 1954; Armitage 1955) of the
    * purchase rate across ORDERED day-parts (scores w = 0..3): with
    * per-part totals n_i and purchases p_i, N = Σn, P = Σp,
    *
    *   T' = N·Σ w_i p_i − P·Σ w_i n_i
    *   Z² = T'²·N / [ P·(N−P)·(N·Σ n_i w_i² − (Σ n_i w_i)²) ]
    *
    * — one exact rational (all operands integer, DECIMAL(38,0)/HUGEINT
    * quadratics), emitted as floor micros. T' is signed and rides along
    * raw so the trend DIRECTION is visible; Z² needs no sign split.
    *
    * Scale: one 4-counter-per-daypart aggregate over the scan.
    */
  def cochranArmitage(events: DataFrame): DataFrame = {
    val parts = events
      .select(expr("hour(ts) DIV 6").as("w"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("y"))
      .groupBy(col("w"))
      .agg(count(lit(1)).as("n_i"), sum(col("y")).as("p_i"))
    parts
      .agg(
        sum(col("n_i")).as("n"), sum(col("p_i")).as("p"),
        sum(col("w") * col("n_i")).as("swn"),
        sum(col("w") * col("p_i")).as("swp"),
        sum(col("w") * col("w") * col("n_i")).as("sw2n"))
      .withColumn("t_num", col("n") * col("swp") - col("p") * col("swn"))
      // degenerate corpora (single-class: p = 0 or p = n; or zero score
      // variance: all mass in one daypart) define Z² = 0 by contract —
      // the mcnemar/stumpConfusion posture, identical in the oracle.
      .withColumn("z2_micros", expr(
        // first factor cast like the denominator's: a raw BIGINT
        // p * (n - p) wraps negative near n ~ 6e9 events and would
        // wrongly take the THEN 0 branch where the HUGEINT oracle doesn't
        "CASE WHEN CAST(p AS DECIMAL(38,0)) * (n - p) *" +
          " (CAST(n AS DECIMAL(38,0)) * sw2n - CAST(swn AS DECIMAL(38,0)) * swn)" +
          " <= 0 THEN 0 ELSE" +
          " CAST((CAST(t_num AS DECIMAL(38,0)) * t_num * n * 1000000)" +
          " DIV (CAST(p AS DECIMAL(38,0)) * (n - p)" +
          " * (CAST(n AS DECIMAL(38,0)) * sw2n - CAST(swn AS DECIMAL(38,0)) * swn))" +
          " AS BIGINT) END"))
      .select(col("n"), col("p"), col("swn"), col("swp"), col("sw2n"),
        col("t_num"), col("z2_micros"))
  }

  def cochranArmitageOracleSql: String =
    """WITH parts AS (
      |  SELECT hour(ts) // 6 AS w,
      |    CAST(count(*) AS BIGINT) AS n_i,
      |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS p_i
      |  FROM events GROUP BY 1),
      |agg AS (
      |  SELECT CAST(sum(n_i) AS BIGINT) AS n,
      |    CAST(sum(p_i) AS BIGINT) AS p,
      |    CAST(sum(w * n_i) AS BIGINT) AS swn,
      |    CAST(sum(w * p_i) AS BIGINT) AS swp,
      |    CAST(sum(w * w * n_i) AS BIGINT) AS sw2n
      |  FROM parts)
      |SELECT n, p, swn, swp, sw2n,
      |  n * swp - p * swn AS t_num,
      |  CASE WHEN CAST(p AS HUGEINT) * (n - p)
      |      * (CAST(n AS HUGEINT) * sw2n - CAST(swn AS HUGEINT) * swn) <= 0
      |    THEN 0 ELSE
      |  CAST((CAST(n * swp - p * swn AS HUGEINT) * (n * swp - p * swn)
      |      * n * 1000000)
      |    // (CAST(p AS HUGEINT) * (n - p)
      |      * (CAST(n AS HUGEINT) * sw2n - CAST(swn AS HUGEINT) * swn))
      |    AS BIGINT) END AS z2_micros
      |FROM agg""".stripMargin

  /** Jonckheere–Terpstra ordered-alternative test (Jonckheere 1954;
    * Terpstra 1952) — the directional refinement of [[kruskalWallis]]
    * when the groups carry a natural ORDER (day-parts 0..3 here): the
    * statistic accumulates, over every ordered group pair i < j, the
    * Mann–Whitney count of earlier-group values below later-group
    * values, so a monotone shift shows up where the omnibus H only sees
    * "different".
    *
    * Kept integral DOUBLED (ties count 1 where wins count 2):
    *
    *   JT2 = Σ_{i<j} Σ_v n_j(v) · (2·cumlt_i(v) + n_i(v))
    *   E[JT2] under H₀ = (N² − Σ n_i²)/2      (exact integer)
    *
    * where cumlt_i(v) is group i's count strictly below v — one prefix
    * window per group on the shared distinct-cents grid, then a k²/2
    * pair join of group-grid frames (k = 4 day-parts). The centered
    * statistic jt2_minus_e rides along signed; no variance normal
    * approximation is emitted (the tie-corrected variance is a float
    * affair — the exact centered statistic is the lattice-safe readout).
    *
    * Scale: everything after the histogram reduction is bounded by
    * k × value domain.
    */
  def jonckheereTerpstra(events: DataFrame): DataFrame = {
    val hist = events
      .select(expr("hour(ts) DIV 6").as("g"), cents.as("v"))
      .groupBy(col("g"), col("v"))
      .agg(count(lit(1)).as("c"))
    val grid = hist.select(col("v")).distinct()
    val dense = grid
      .crossJoin(hist.select(col("g")).distinct())
      .join(hist, Seq("g", "v"), "left")
      .select(col("g"), col("v"), coalesce(col("c"), lit(0L)).as("c"))
    val byGV = Window.partitionBy(col("g")).orderBy(col("v"))
    val pre = dense
      .withColumn("cumlt",
        coalesce(sum(col("c")).over(
          byGV.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val a = pre.select(col("g").as("gi"), col("v"),
      col("c").as("ci"), col("cumlt").as("clti"))
    val b = pre.select(col("g").as("gj"), col("v"), col("c").as("cj"))
    val jt = a.join(b, Seq("v"))
      .filter(col("gi") < col("gj"))
      .agg(sum(col("cj") * (lit(2L) * col("clti") + col("ci"))).as("jt2"))
    val sizes = hist.groupBy(col("g")).agg(sum(col("c")).as("n_g"))
    val tot = sizes.agg(sum(col("n_g")).as("n"),
      sum(col("n_g") * col("n_g")).as("sn2"))
    sizes.crossJoin(broadcast(jt)).crossJoin(broadcast(tot))
      .withColumn("e_jt2", expr("(n * n - sn2) DIV 2"))
      .withColumn("jt2_minus_e", col("jt2") - col("e_jt2"))
      .select(col("g").as("daypart"), col("n_g"), col("n"),
        col("jt2"), col("e_jt2"), col("jt2_minus_e"))
      .orderBy(col("daypart"))
  }

  def jonckheereTerpstraOracleSql: String =
    """WITH hist AS (
      |  SELECT hour(ts) // 6 AS g,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v,
      |    CAST(count(*) AS BIGINT) AS c
      |  FROM events GROUP BY 1, 2),
      |dense AS (
      |  SELECT gs.g, vs.v, COALESCE(h.c, 0) AS c
      |  FROM (SELECT DISTINCT v FROM hist) vs
      |  CROSS JOIN (SELECT DISTINCT g FROM hist) gs
      |  LEFT JOIN hist h ON h.g = gs.g AND h.v = vs.v),
      |pre AS (
      |  SELECT g, v, c,
      |    COALESCE(CAST(sum(c) OVER (PARTITION BY g ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
      |      0) AS cumlt
      |  FROM dense),
      |jt AS (
      |  SELECT CAST(sum(b.c * (2 * a.cumlt + a.c)) AS BIGINT) AS jt2
      |  FROM pre a JOIN pre b ON a.v = b.v AND a.g < b.g),
      |sizes AS (SELECT g, CAST(sum(c) AS BIGINT) AS n_g
      |  FROM hist GROUP BY 1),
      |tot AS (SELECT CAST(sum(n_g) AS BIGINT) AS n,
      |    CAST(sum(n_g * n_g) AS BIGINT) AS sn2
      |  FROM sizes)
      |SELECT s.g AS daypart, s.n_g, t.n, j.jt2,
      |  (t.n * t.n - t.sn2) // 2 AS e_jt2,
      |  j.jt2 - (t.n * t.n - t.sn2) // 2 AS jt2_minus_e
      |FROM sizes s, jt j, tot t
      |ORDER BY daypart""".stripMargin

  /** Brown–Forsythe homogeneity-of-variance test (Brown & Forsythe,
    * JASA 1974 — Levene's test with the group MEDIAN center, the robust
    * variant): on z = |cents − median_g|,
    *
    *   W = (N−k)/(k−1) · Σ_g n_g(z̄_g − z̄)² / Σ_g Σ_j (z_gj − z̄_g)²
    *
    * EXACT FORM: medians are exact lower medians (rank ⌈n/2⌉ on the
    * per-group histogram); the between term folds each group to the
    * exact floor a_g = (Zs_g·N − Zs·n_g)²·10⁶ DIV (n_g·N²) and the
    * within term to b_g = (n_g·Zq_g − Zs_g²)·10⁶ DIV n_g (Zs = Σz,
    * Zq = Σz²) — sum-of-floors on both sides, then one exact DIV for
    * W. DECIMAL(38,0)/HUGEINT throughout.
    *
    * Scale: two scans folded to per-group histograms (median pass) and
    * moment aggregates; windows run on the value-domain grid.
    */
  def brownForsythe(events: DataFrame): DataFrame = {
    val hist = events
      .select(col("event_type").as("g"), cents.as("v"))
      .groupBy(col("g"), col("v"))
      .agg(count(lit(1)).as("c"))
    val byGV = Window.partitionBy(col("g")).orderBy(col("v"))
    val medians = hist
      .withColumn("cum", sum(col("c")).over(
        byGV.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n_g", sum(col("c")).over(Window.partitionBy(col("g"))))
      .filter(col("cum") * 2L >= col("n_g"))
      .groupBy(col("g"))
      .agg(min(col("v")).as("med"))
    val z = hist
      .join(medians, Seq("g"))
      .select(col("g"), abs(col("v") - col("med")).as("z"), col("c"),
        col("med"))
    val grp = z.groupBy(col("g"))
      .agg(first(col("med")).as("median_cents"),
        sum(col("c")).as("n_g"),
        sum(col("z") * col("c")).as("zs"),
        sum(col("z").cast(d38) * col("z") * col("c")).as("zq"))
    val tot = grp.agg(sum(col("n_g")).as("n"), sum(col("zs")).as("zs_all"),
      count(lit(1)).as("k"))
    val terms = grp.crossJoin(broadcast(tot))
      .withColumn("a_g", expr(
        "CAST(((CAST(zs AS DECIMAL(38,0)) * n - CAST(zs_all AS DECIMAL(38,0)) * n_g)" +
          " * (CAST(zs AS DECIMAL(38,0)) * n - CAST(zs_all AS DECIMAL(38,0)) * n_g)" +
          " * 1000000) DIV (CAST(n_g AS DECIMAL(38,0)) * n * n) AS BIGINT)"))
      .withColumn("b_g", expr(
        "CAST(((CAST(n_g AS DECIMAL(38,0)) * zq - CAST(zs AS DECIMAL(38,0)) * zs)" +
          " * 1000000) DIV CAST(n_g AS DECIMAL(38,0)) AS BIGINT)"))
    val all = Window.partitionBy()
    terms
      .withColumn("a_sum", sum(col("a_g")).over(all))
      .withColumn("b_sum", sum(col("b_g")).over(all))
      .withColumn("w_micros", expr(
        "CASE WHEN b_sum > 0 THEN" +
          " CAST((CAST(a_sum AS DECIMAL(38,0)) * (n - k) * 1000000)" +
          " DIV (CAST(b_sum AS DECIMAL(38,0)) * (k - 1)) AS BIGINT)" +
          " ELSE 0 END"))
      .select(col("g").as("event_type"), col("n_g"), col("median_cents"),
        col("zs").as("z_sum"), col("a_g"), col("b_g"), col("w_micros"))
      .orderBy(col("event_type"))
  }

  def brownForsytheOracleSql: String =
    """WITH hist AS (
      |  SELECT event_type AS g,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v,
      |    CAST(count(*) AS BIGINT) AS c
      |  FROM events GROUP BY 1, 2),
      |meds AS (
      |  SELECT g, min(v) AS med FROM (
      |    SELECT g, v, c,
      |      CAST(sum(c) OVER (PARTITION BY g ORDER BY v
      |        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
      |      CAST(sum(c) OVER (PARTITION BY g) AS BIGINT) AS n_g
      |    FROM hist)
      |  WHERE cum * 2 >= n_g GROUP BY g),
      |z AS (
      |  SELECT h.g, abs(h.v - m.med) AS z, h.c, m.med
      |  FROM hist h JOIN meds m ON h.g = m.g),
      |grp AS (
      |  SELECT g, any_value(med) AS median_cents,
      |    CAST(sum(c) AS BIGINT) AS n_g,
      |    CAST(sum(z * c) AS BIGINT) AS zs,
      |    CAST(sum(CAST(z AS HUGEINT) * z * c) AS HUGEINT) AS zq
      |  FROM z GROUP BY 1),
      |tot AS (SELECT CAST(sum(n_g) AS BIGINT) AS n,
      |    CAST(sum(zs) AS BIGINT) AS zs_all,
      |    CAST(count(*) AS BIGINT) AS k
      |  FROM grp),
      |terms AS (
      |  SELECT g, median_cents, n_g, zs, n, k,
      |    CAST(((CAST(zs AS HUGEINT) * n - CAST(zs_all AS HUGEINT) * n_g)
      |        * (CAST(zs AS HUGEINT) * n - CAST(zs_all AS HUGEINT) * n_g)
      |        * 1000000) // (CAST(n_g AS HUGEINT) * n * n) AS BIGINT)
      |      AS a_g,
      |    CAST(((CAST(n_g AS HUGEINT) * zq - CAST(zs AS HUGEINT) * zs)
      |        * 1000000) // CAST(n_g AS HUGEINT) AS BIGINT) AS b_g
      |  FROM grp, tot),
      |sums AS (
      |  SELECT *, CAST(sum(a_g) OVER () AS BIGINT) AS a_sum,
      |    CAST(sum(b_g) OVER () AS BIGINT) AS b_sum
      |  FROM terms)
      |SELECT g AS event_type, n_g, median_cents, zs AS z_sum, a_g, b_g,
      |  CASE WHEN b_sum > 0 THEN
      |    CAST((CAST(a_sum AS HUGEINT) * (n - k) * 1000000)
      |      // (CAST(b_sum AS HUGEINT) * (k - 1)) AS BIGINT)
      |  ELSE 0 END AS w_micros
      |FROM sums ORDER BY event_type""".stripMargin
}
