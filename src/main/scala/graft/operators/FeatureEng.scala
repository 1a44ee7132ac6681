package graft.operators

import graft.SketchOracles.{mixChain, U64}
import graft.functions.Mix64
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Feature engineering for model-training pipelines: leave-one-out target
  * encoding and Poisson-bootstrap confidence intervals. Both are EXACT
  * integer pipelines end-to-end (cents fixed point, micros via integral
  * division, splitmix64 randomness) so the DuckDB oracle replays every
  * value bit-exactly — no float leaves either engine.
  *
  * Scale designs:
  *  - Target encoding folds the fact table to |categories| rows
  *    (map-side combine) and broadcasts them back — the fact table never
  *    shuffles. That is the only shape that survives a 100 TB fact side.
  *  - The bootstrap computes ALL replicate weights per row in one scan
  *    (B pairs of counters, no row explosion): replicate b's Poisson(1)
  *    weight is a pure function of mix64(mix64(key) ^ seed_b), so the
  *    whole resample is one aggregate over B·2 counters — the standard
  *    "Poisson bootstrap for massive data" formulation (Chamandy et al.,
  *    Google 2012) where per-row multinomial sampling is replaced by
  *    independent Poisson draws.
  */
object FeatureEng {

  // ---- target encoding ----------------------------------------------------

  /** Smoothing pseudo-count for the shrunk encoding. */
  val SmoothM = 10

  /** Leave-one-out + smoothed target encoding of o_orderpriority against
    * the o_totalprice cents target. Exact micros:
    *   loo    = (Σ_g − x) · 10^6 DIV (n_g − 1)        (global mean if n_g = 1)
    *   smooth = (Σ_g·N + m·Σ) · 10^6 DIV ((n_g + m)·N)
    * the second is (Σ_g + m·μ)/(n_g + m) cleared of the rational μ = Σ/N.
    */
  def targetEncode(orders: DataFrame): DataFrame = {
    val cents = graft.queries.Analytics.centsOf(col("o_totalprice"))
      .cast("long")
    val stats = orders
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_g"), sum(cents).as("sum_g"))
    // globals re-aggregate the |categories|-row stats frame — the fact
    // table is scanned once, not twice
    val glob = stats.agg(
      sum(col("n_g")).as("gn"), sum(col("sum_g")).as("gsum"))
    orders
      .select(col("o_orderkey"), col("o_orderpriority"),
        cents.as("price_cents"))
      .join(broadcast(stats), Seq("o_orderpriority"))
      .crossJoin(broadcast(glob))
      .select(
        col("o_orderkey"), col("o_orderpriority"), col("price_cents"),
        when(col("n_g") > 1,
          expr("CAST((sum_g - price_cents) AS DECIMAL(38,0)) * 1000000" +
            " DIV (n_g - 1)"))
          .otherwise(expr(
            "CAST(gsum AS DECIMAL(38,0)) * 1000000 DIV gn"))
          .as("te_loo_micros"),
        expr(s"(CAST(sum_g AS DECIMAL(38,0)) * gn + $SmoothM *" +
          " CAST(gsum AS DECIMAL(38,0))) * 1000000" +
          s" DIV (CAST(n_g + $SmoothM AS DECIMAL(38,0)) * gn)")
          .as("te_smooth_micros"))
      .orderBy(col("o_orderkey"))
  }

  def targetEncodeOracleSql: String =
    s"""WITH c AS (SELECT o_orderkey, o_orderpriority,
  CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS price_cents
  FROM orders),
g AS (SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_g,
  CAST(sum(price_cents) AS HUGEINT) AS sum_g FROM c GROUP BY 1),
t AS (SELECT CAST(count(*) AS HUGEINT) AS gn,
  CAST(sum(price_cents) AS HUGEINT) AS gsum FROM c)
SELECT c.o_orderkey, c.o_orderpriority, c.price_cents,
  CAST(CASE WHEN g.n_g > 1
    THEN (sum_g - price_cents) * 1000000 // (g.n_g - 1)
    ELSE gsum * 1000000 // gn END AS BIGINT) AS te_loo_micros,
  CAST((sum_g * gn + $SmoothM * gsum) * 1000000
    // ((g.n_g + $SmoothM) * gn) AS BIGINT) AS te_smooth_micros
FROM c JOIN g USING (o_orderpriority), t
ORDER BY c.o_orderkey"""

  // ---- Poisson bootstrap --------------------------------------------------

  /** Replicate count. 32 keeps the order-statistic CI crude but real
    * (2nd/31st ≈ 5%/95%) while the per-scan counter count stays small.
    */
  val B = 32

  /** Per-replicate seeds — arbitrary fixed splitmix64 points, single-
    * sourced for both engines.
    */
  def bootSeeds: Seq[Long] =
    (1 to B).map(b => Mix64.mix(0x0B007B007B007L * b + 0x5EED5EED5EEDL))

  /** Poisson(1) inverse-CDF thresholds scaled to u64: u < t_k ⟹ weight k,
    * capped at [[PoissonCap]]. Computed once from the double CDF and
    * embedded as exact integer literals on BOTH engines.
    */
  val PoissonCap = 6
  def poissonThresholds: Seq[BigInt] = {
    val invE = math.exp(-1.0)
    val pmf = (0 until PoissonCap).scanLeft(invE) { case (p, k) =>
      p / (k + 1.0)
    }.take(PoissonCap) // p_0 .. p_{cap-1}
    val cdf = pmf.scanLeft(0.0)(_ + _).drop(1)
    cdf.map(p =>
      (BigDecimal(p) * BigDecimal(BigInt(1) << 64)).toBigInt)
  }

  private def thresholdFlipped: Seq[Long] =
    poissonThresholds.map { t =>
      val signed = if (t >= (BigInt(1) << 63)) t - (BigInt(1) << 64) else t
      signed.toLong ^ Long.MinValue
    }

  /** Poisson(1) weight of replicate `b` for key column `key` — flipped-
    * domain unsigned threshold compare on mix64(mix64(key) ^ seed_b).
    */
  private def poissonW(key: Column, seed: Long): Column = {
    import graft.functions.GraftColumns.mix64
    val uf = mix64(mix64(key).bitwiseXOR(lit(seed)))
      .bitwiseXOR(lit(Long.MinValue))
    val tf = thresholdFlipped
    tf.zipWithIndex.foldRight(lit(PoissonCap): Column) {
      case ((t, k), elseC) => when(uf < lit(t), lit(k)).otherwise(elseC)
    }
  }

  /** One-scan Poisson bootstrap of the mean order price: B resampled
    * means as exact micros, CI = 2nd/31st order statistics, the exact
    * full-sample mean in-row.
    */
  def bootstrapCi(orders: DataFrame): DataFrame = {
    val cents = graft.queries.Analytics.centsOf(col("o_totalprice"))
      .cast("long")
    val base = orders.select(col("o_orderkey").as("k"), cents.as("x"))
    val aggs =
      Seq(count(lit(1)).as("n"), sum(col("x")).as("sx")) ++
        bootSeeds.zipWithIndex.flatMap { case (seed, b) =>
          val w = poissonW(col("k"), seed).cast("long")
          Seq(sum(w * col("x")).as(s"bs_$b"), sum(w).as(s"bn_$b"))
        }
    val wide = base.agg(aggs.head, aggs.tail: _*)
    // a replicate whose Poisson(1) weights are ALL zero (P = e^-n per
    // replicate — real on tiny/filtered inputs) is an empty resample:
    // fall back to the full-sample mean so the order statistics stay
    // defined, and guard every division (ANSI DIV throws on zero where
    // DuckDB's // returns NULL)
    val meanCols = (0 until B).map(b =>
      expr(s"CASE WHEN bn_$b > 0" +
        s" THEN CAST(bs_$b AS DECIMAL(38,0)) * 1000000 DIV bn_$b" +
        " WHEN n > 0 THEN CAST(sx AS DECIMAL(38,0)) * 1000000 DIV n" +
        " END"))
    wide
      .withColumn("means", array_sort(array(meanCols: _*)))
      .select(
        col("n"),
        expr("CASE WHEN n > 0" +
          " THEN CAST(sx AS DECIMAL(38,0)) * 1000000 DIV n END")
          .as("mean_micros"),
        lit(B).cast("long").as("replicates"),
        element_at(col("means"), 2).as("boot_lo_micros"),
        element_at(col("means"), B - 1).as("boot_hi_micros"))
  }

  // ---- Johnson–Lindenstrauss ±1 random projection -------------------------

  /** Projection dims; input embeddings are 64-dim float. */
  val RpDim = 16
  val SrcDim = 64

  /** The ±1 projection matrix (Achlioptas, JCSS 2003: database-friendly
    * random projections — Rademacher entries preserve JL), derived from
    * mix64 parity so both engines share the SAME literal matrix.
    */
  def rpSigns: IndexedSeq[IndexedSeq[Int]] =
    IndexedSeq.tabulate(RpDim, SrcDim) { (d, i) =>
      if ((Mix64.mix(0x4A11C0DEL + (d * SrcDim + i).toLong) & 1L) == 0L) 1
      else -1
    }

  /** Project each embedding to RpDim dims: p_d = Σ_i s_di·x_i folded in
    * FIXED index order (a left-associated add chain generated from the
    * same sign matrix on both engines — bit-identical doubles, so the
    * raw doubles are emitted unrounded). Emits the first 4 components
    * plus the JL distortion self-check ‖p‖²/(D·‖x‖²), whose expectation
    * is 1.
    *
    * Scale: a pure stateless scan — 16 codegen'd multiply-add chains per
    * row, no shuffle, no UDF; exactly the shape a 100 TB embedding
    * compaction wants (usually fused into the scan that writes the
    * compressed table).
    */
  def rpProject(embeddings: DataFrame): DataFrame = {
    val s = rpSigns
    def x(i: Int): Column =
      element_at(col("embedding"), i + 1).cast("double")
    def proj(d: Int): Column =
      (0 until SrcDim).map(i => x(i) * lit(s(d)(i).toDouble))
        .reduceLeft(_ + _)
    val normSq = (0 until SrcDim).map(i => x(i) * x(i)).reduceLeft(_ + _)
    val withP = embeddings.select(
      col("vec_id") +:
        (0 until RpDim).map(d => proj(d).as(s"p$d")) :+
        normSq.as("norm_sq"): _*)
    val rpNormSq = (0 until RpDim).map(d => col(s"p$d") * col(s"p$d"))
      .reduceLeft(_ + _)
    withP
      .withColumn("rp_norm_sq", rpNormSq)
      .select(
        col("vec_id"), col("p0"), col("p1"), col("p2"), col("p3"),
        col("norm_sq"), col("rp_norm_sq"),
        when(col("norm_sq") > 0.0,
          col("rp_norm_sq") / (lit(RpDim.toDouble) * col("norm_sq")))
          .as("distortion"))
      .orderBy(col("vec_id"))
  }

  def rpProjectOracleSql: String = {
    val s = rpSigns
    def x(i: Int): String = s"CAST(embedding[${i + 1}] AS DOUBLE)"
    def proj(d: Int): String =
      (0 until SrcDim).map(i => s"${x(i)} * ${s(d)(i)}.0")
        .mkString(" + ")
    val normSq = (0 until SrcDim).map(i => s"${x(i)} * ${x(i)}")
      .mkString(" + ")
    val ps = (0 until RpDim).map(d => s"(${proj(d)}) AS p$d")
      .mkString(",\n  ")
    val rpNorm = (0 until RpDim).map(d => s"p$d * p$d").mkString(" + ")
    s"""WITH pr AS (SELECT vec_id,
  $ps,
  ($normSq) AS norm_sq
  FROM embeddings),
n2 AS (SELECT *, ($rpNorm) AS rp_norm_sq FROM pr)
SELECT vec_id, p0, p1, p2, p3, norm_sq, rp_norm_sq,
  CASE WHEN norm_sq > 0.0
    THEN rp_norm_sq / (${RpDim}.0 * norm_sq) END AS distortion
FROM n2 ORDER BY vec_id"""
  }

  def bootstrapCiOracleSql: String = {
    val seedRows = bootSeeds.zipWithIndex
      .map { case (s, b) =>
        val u = (BigInt(s) & ((BigInt(1) << 64) - 1)).toString
        s"    ($b, $u::HUGEINT)"
      }.mkString(",\n")
    val ts = poissonThresholds
    val wCase = ts.zipWithIndex
      .map { case (t, k) => s"WHEN mx < $t::HUGEINT THEN $k" }
      .mkString(" ") + s" ELSE $PoissonCap"
    s"""WITH c AS (SELECT o_orderkey AS k,
  CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS x
  FROM orders),
sd(b, su) AS (VALUES
$seedRows),
u1 AS (SELECT k, x,
  ((CASE WHEN k < 0 THEN CAST(k AS HUGEINT) + $U64
         ELSE CAST(k AS HUGEINT) END)
   + 11400714819323198485::HUGEINT) % $U64 AS z0 FROM c),
${mixChain("k1", "u1", Seq("k", "x"), "z0")},
x1 AS (SELECT x, b, (xor(mx, su) + 11400714819323198485::HUGEINT) % $U64
  AS z0 FROM k14, sd),
${mixChain("b1", "x1", Seq("x", "b"), "z0")},
w AS (SELECT x, b, CASE $wCase END AS w FROM b14),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
  CASE WHEN count(*) > 0 THEN
    CAST(CAST(sum(x) AS HUGEINT) * 1000000 // count(*) AS BIGINT)
  END AS mean_micros FROM c),
reps AS (SELECT b,
  CASE WHEN sum(w) > 0 THEN
    CAST(sum(w * x) AS HUGEINT) * 1000000 // CAST(sum(w) AS HUGEINT)
  ELSE (SELECT CAST(mean_micros AS HUGEINT) FROM tot)
  END AS mean_b
  FROM w GROUP BY b),
ordered AS (SELECT mean_b, row_number() OVER (ORDER BY mean_b) AS rn
  FROM reps)
SELECT t.n, t.mean_micros, CAST($B AS BIGINT) AS replicates,
  CAST((SELECT mean_b FROM ordered WHERE rn = 2) AS BIGINT)
    AS boot_lo_micros,
  CAST((SELECT mean_b FROM ordered WHERE rn = ${B - 1}) AS BIGINT)
    AS boot_hi_micros
FROM tot t"""
  }

  // ---- isotonic calibration ----------------------------------------------

  /** Isotonic (monotone non-decreasing) calibration of the hourly
    * purchase propensity — the PAVA-equivalent fit, computed through the
    * minimax closed form (Robertson/Wright/Dykstra, "Order Restricted
    * Statistical Inference" 1988):
    *
    *   iso(i) = max_{j≤i} min_{k≥i} mean(y over buckets j..k, pooled)
    *
    * the exact weighted-L2 isotonic solution. Every interval mean is the
    * integer `(Σy·10^6) DIV (Σn)`; floor commutes with max and min, so
    * the floored minimax IS the floor of the exact rational fit — both
    * engines walk identical integers (no PAVA stack fold needed).
    *
    * Scale: ONE scan reduces the corpus to the 24-hour bucket frame with
    * map-side combine; the O(B³) minimax runs on B = 24 rows of
    * broadcast-joined constants — corpus size never touches it. The
    * reliability table `propensity_calibration` reports the RAW rates;
    * this is the monotone model a serving layer would actually apply.
    */
  def isotonicCalibration(events: DataFrame): DataFrame = {
    val buckets = events
      .groupBy(hour(col("ts")).cast("long").as("h"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("y"))
    val hs = buckets.select(col("h"))
    val intervals = hs.select(col("h").as("j"))
      .join(hs.select(col("h").as("k")), col("j") <= col("k"))
      .join(buckets.select(col("h").as("hh"), col("n"), col("y")),
        col("hh") >= col("j") && col("hh") <= col("k"))
      .groupBy(col("j"), col("k"))
      .agg(expr("(sum(y) * 1000000) DIV sum(n)").as("m"))
    val iso = hs.select(col("h").as("i"))
      .join(intervals, col("j") <= col("i") && col("i") <= col("k"))
      .groupBy(col("i"), col("j")).agg(min(col("m")).as("inner"))
      .groupBy(col("i")).agg(max(col("inner")).as("iso_micros"))
    buckets.join(iso, col("h") === col("i"))
      .select(col("h").as("hour"), col("n"), col("y"),
        expr("(y * 1000000) DIV n").as("rate_micros"),
        col("iso_micros"))
      .orderBy(col("hour"))
  }

  def isotonicOracleSql: String =
    """WITH b AS (
      |  SELECT CAST(hour(ts) AS BIGINT) AS h,
      |    CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS y
      |  FROM events GROUP BY 1),
      |iv AS (
      |  SELECT j.h AS j, k.h AS k,
      |    CAST(sum(x.y) * 1000000 // sum(x.n) AS BIGINT) AS m
      |  FROM b j JOIN b k ON j.h <= k.h
      |    JOIN b x ON x.h BETWEEN j.h AND k.h
      |  GROUP BY 1, 2),
      |inner_min AS (
      |  SELECT i.h AS i, iv.j, min(iv.m) AS inner_m
      |  FROM b i JOIN iv ON iv.j <= i.h AND i.h <= iv.k
      |  GROUP BY 1, 2),
      |iso AS (
      |  SELECT i, CAST(max(inner_m) AS BIGINT) AS iso_micros
      |  FROM inner_min GROUP BY 1)
      |SELECT b.h AS hour, b.n, b.y,
      |  CAST(b.y * 1000000 // b.n AS BIGINT) AS rate_micros,
      |  iso.iso_micros
      |FROM b JOIN iso ON iso.i = b.h
      |ORDER BY hour""".stripMargin
}
