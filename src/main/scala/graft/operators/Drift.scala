package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution-drift monitoring: the statistical gates a training-data
  * pipeline runs per ingest batch to detect when a source's distribution
  * has shifted — two-sample Kolmogorov–Smirnov per source, binned PSI
  * (population stability index) between time periods, and α-temperature
  * mixture reweighting (the multilingual-sampling correction of
  * Conneau et al. 2020 / the mC4 recipe). Companion to the categorical
  * chi-square audit in [[DataQuality.chiSquareIndependence]].
  *
  * Numeric discipline: every double derives from exact long counts by an
  * expression tree spelled identically in the DuckDB oracle; where a SUM
  * of irrational doubles would make the fold order observable, the fold
  * is a cumulative window (sequential in ORDER BY order on both engines)
  * instead of an unordered aggregate.
  */
object Drift {

  /** Two-sample KS statistic of each source's `n_chars` distribution vs
    * the REST of the corpus: D_s = sup_x |F_s(x) − F_rest(x)|, evaluated
    * at every observed value (the sup of a step-function difference is
    * attained at a sample point). Reports D and the scaled statistic
    * sqrt(n_s·n_r/(n_s+n_r))·D (the quantity compared against c(α) in the
    * classical test).
    *
    * Distributed shape: one scan folds to a (source, value) count frame
    * bounded by |sources|×|value domain|, NOT corpus size; the evaluation
    * grid is the distinct-value frame crossed with the (broadcast,
    * |sources|-row) totals, so the windowed CDF passes run over a
    * domain-bounded frame. The one single-partition window (global value
    * CDF) is over the |domain|-row grid only — at 100 TB the corpus never
    * passes through it, only the distinct-value histogram does. Skew-free:
    * the candidate frame is uniform by construction.
    */
  def ksDrift(documents: DataFrame): DataFrame = {
    val counts = documents
      .groupBy(col("source"), col("n_chars").as("x"))
      .agg(count(lit(1)).as("c"))
    val totals = documents.groupBy(col("source"))
      .agg(count(lit(1)).as("n_source"))
    val grand = documents.agg(count(lit(1)).as("n_total"))
    // Global CDF over the distinct-value grid (domain-bounded frame).
    val grid = counts.groupBy(col("x")).agg(sum(col("c")).as("g"))
      .withColumn("cum_g", sum(col("g")).over(
        Window.orderBy(col("x"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    // Every (source, grid point), with the source's own cumulative count
    // carried across grid points where the source has no observation.
    val bySourceX = Window.partitionBy(col("source")).orderBy(col("x"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val crossed = grid.crossJoin(broadcast(totals))
      .join(counts, Seq("source", "x"), "left")
      .withColumn("cum_s", sum(coalesce(col("c"), lit(0L))).over(bySourceX))
    val diffs = crossed.crossJoin(broadcast(grand))
      .withColumn("n_rest", col("n_total") - col("n_source"))
      .withColumn("diff", abs(
        col("cum_s").cast("double") / col("n_source").cast("double") -
          (col("cum_g") - col("cum_s")).cast("double") /
            col("n_rest").cast("double")))
    diffs
      .groupBy(col("source"), col("n_source"), col("n_rest"))
      .agg(max(col("diff")).as("d_raw"))
      .select(
        col("source"), col("n_source"), col("n_rest"),
        // RAW: an integer-ratio quotient lands near round()'s 4-decimal
        // tie boundaries at realistic rates, where the engines' rounding
        // paths disagree; the raw IEEE value is bit-identical instead
        col("d_raw").as("ks_d"),
        round(sqrt(col("n_source").cast("double") *
          col("n_rest").cast("double") /
          (col("n_source") + col("n_rest")).cast("double")) *
          col("d_raw"), 4).as("ks_stat"))
      .orderBy(col("source"))
  }

  /** Binned PSI between a baseline period (`ts < splitTs`) and the current
    * period, over `value`: `bins` equal-width bins spanning the BASELINE
    * min/max (current-period outliers clamp into the edge bins — the
    * standard scorecard-monitoring convention, which makes out-of-range
    * drift visible as edge-bin mass instead of silently widening the
    * grid). Per-bin term (p−q)·ln(p/q) with ε-floored proportions;
    * `psi_cum` is the running total in bin order — its last row is the
    * PSI (a cumulative window, so the double fold is sequential and
    * engine-agnostic; the conventional alert thresholds are 0.1 / 0.25).
    *
    * Distributed shape: one 1-row baseline-range aggregate broadcast into
    * one full-scan conditional hash aggregate bounded by `bins` rows;
    * both periods bin in the SAME pass via indicator counters. The window
    * passes run on the ≤`bins`-row frame.
    */
  def psiDrift(events: DataFrame, splitTs: String, bins: Int = 10,
      eps: Double = 1e-6): DataFrame = {
    val split = to_timestamp(lit(splitTs))
    val range = events.filter(col("ts") < split)
      .agg(min(col("value")).as("bmin"), max(col("value")).as("bmax"))
    val binned = events.crossJoin(broadcast(range))
      .withColumn("bin",
        least(lit(bins - 1), greatest(lit(0),
          floor((col("value") - col("bmin")) / (col("bmax") - col("bmin")) *
            lit(bins)).cast("int"))))
      .groupBy(col("bin"))
      .agg(
        sum(when(col("ts") < split, 1L).otherwise(0L)).as("n_base"),
        sum(when(col("ts") >= split, 1L).otherwise(0L)).as("n_cur"))
    val totals = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val ordered = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    binned
      .withColumn("tot_base", sum(col("n_base")).over(totals))
      .withColumn("tot_cur", sum(col("n_cur")).over(totals))
      .withColumn("p_raw",
        greatest(col("n_base").cast("double") / col("tot_base").cast("double"),
          lit(eps)))
      .withColumn("q_raw",
        greatest(col("n_cur").cast("double") / col("tot_cur").cast("double"),
          lit(eps)))
      .withColumn("term", (col("p_raw") - col("q_raw")) *
        log(col("p_raw") / col("q_raw")))
      .select(
        col("bin"), col("n_base"), col("n_cur"),
        // RAW integer-ratio quotients (see ksDrift note on round() ties)
        col("p_raw").as("p_base"),
        col("q_raw").as("p_cur"),
        round(col("term"), 4).as("psi_term"),
        round(sum(col("term")).over(ordered), 4).as("psi_cum"))
      .orderBy(col("bin"))
  }

  /** α-temperature mixture reweighting: from per-source token masses n_i,
    * the sampling distribution q_i ∝ (n_i/N)^α (α<1 upsamples the tail —
    * the multilingual/low-resource correction), the expected token draw at
    * a fixed budget, and the oversample factor q_i/p_i a sampler must
    * apply per source.
    *
    * Distributed shape: one scan folds token counts (a per-row `size
    * (split(...))`, no explode) to a |sources|-row frame; the q
    * normalizer is a cumulative-then-last window fold over that tiny
    * frame (sequential double fold — the unordered-SUM-of-powers is the
    * one place a plain agg could diverge cross-engine in the last ulp).
    */
  def temperatureMixture(documents: DataFrame, alpha: Double = 0.3,
      budgetTokens: Long = 1000000L): DataFrame = {
    val masses = documents
      .groupBy(col("source"))
      .agg(sum(size(graft.functions.TextAnalysis.tokens(col("text")))
        .cast("long")).as("n_tokens"))
    val totals = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val ordered = Window.orderBy(col("source"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    masses
      .withColumn("n_total", sum(col("n_tokens")).over(totals))
      .withColumn("p_raw",
        col("n_tokens").cast("double") / col("n_total").cast("double"))
      .withColumn("w", pow(col("p_raw"), lit(alpha)))
      // Sequential fold + max-picks-last: w > 0 so the cumulative sum is
      // strictly increasing and its max IS the final normalizer.
      .withColumn("w_cum", sum(col("w")).over(ordered))
      .withColumn("w_tot", max(col("w_cum")).over(totals))
      .withColumn("q_raw", col("w") / col("w_tot"))
      .select(
        col("source"), col("n_tokens"),
        // RAW integer-ratio quotient (see ksDrift note on round() ties)
        col("p_raw").as("p_natural"),
        round(col("q_raw"), 4).as("p_temperature"),
        round(col("q_raw") * lit(budgetTokens.toDouble), 1)
          .as("expected_tokens"),
        round(col("q_raw") / col("p_raw"), 4).as("oversample"))
      .orderBy(col("source"))
  }

  /** Embedding-space drift between two folds (the "did the encoder or
    * the corpus move?" gate a vector pipeline runs per snapshot): per
    * label, the per-dimension centroid shift between the even- and
    * odd-vec_id halves, reported as the mean and max absolute shift with
    * the worst dimension. Companion to the scalar KS/PSI gates — this is
    * the multivariate version an index rebuild decision reads.
    *
    * Exactness: per-row doubles enter through [[Similarity.dimStats]]'s
    * DECIMAL(16,15) scale-15 fixed point; per-(label, fold, dim) sums are
    * exact decimals; the centroid difference clears denominators
    * (num = s_a·n_b − s_b·n_a over n_a·n_b·10^15), so mean/max shifts
    * are exact integer micros. No unordered float sum anywhere.
    *
    * Scale: posexplode fans the corpus to (label, fold, dim) rows that
    * aggregate with map-side combine into a |labels|×|folds|×|dims|
    * frame; everything after is bounded by that grid.
    */
  def embeddingSplitDrift(embeddings: DataFrame): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val fp = (c: org.apache.spark.sql.Column) =>
      (c.cast(org.apache.spark.sql.types.DecimalType(16, 15))
        * lit(1000000000000000L)).cast("long")
    val byDim = embeddings
      .select(col("label"), pmod(col("vec_id"), lit(2L)).as("fold"),
        posexplode(col("embedding").cast("array<double>")).as(Seq("dim", "x")))
      .groupBy(col("label"), col("fold"), col("dim"))
      .agg(sum(fp(col("x")).cast(dec)).cast(dec).as("s"),
        count(lit(1)).as("n"))
    val a = byDim.filter(col("fold") === 0L)
      .select(col("label"), col("dim"), col("s").as("s_a"), col("n").as("n_a"))
    val b = byDim.filter(col("fold") === 1L)
      .select(col("label"), col("dim"), col("s").as("s_b"), col("n").as("n_b"))
    val diffs = a.join(b, Seq("label", "dim"))
      .withColumn("num",
        abs(col("s_a") * col("n_b").cast(dec) - col("s_b") * col("n_a").cast(dec)))
    diffs
      .groupBy(col("label"))
      .agg(
        first(col("n_a")).as("n_a"), first(col("n_b")).as("n_b"),
        count(lit(1)).as("n_dims"),
        sum(col("num")).cast(dec).as("sum_num"),
        max(struct(col("num"), (-col("dim")).as("negdim"))).as("mx"))
      .select(
        col("label"), col("n_a"), col("n_b"),
        expr("""cast(sum_num * 1000000
               |  DIV (cast(n_a as decimal(38,0)) * cast(n_b as decimal(38,0))
               |       * 1000000000000000 * cast(n_dims as decimal(38,0)))
               |  as bigint)""".stripMargin).as("mean_shift_micros"),
        expr("""cast(mx.num * 1000000
               |  DIV (cast(n_a as decimal(38,0)) * cast(n_b as decimal(38,0))
               |       * 1000000000000000) as bigint)""".stripMargin)
          .as("max_shift_micros"),
        (-col("mx.negdim")).cast("int").as("worst_dim"))
      .orderBy(col("label"))
  }

  def embeddingSplitDriftOracleSql: String =
    """WITH x0 AS (
      |  SELECT label, vec_id % 2 AS fold,
      |    unnest(list_transform(range(1, len(embedding) + 1),
      |      i -> {'dim': i - 1, 'x': embedding[i]::DOUBLE})) AS s
      |  FROM embeddings),
      |x AS (SELECT label, fold, CAST(s.dim AS INT) AS dim, s.x AS x
      |      FROM x0),
      |fp AS (
      |  SELECT label, fold, dim,
      |    CAST(CAST(x AS DECIMAL(16,15)) * 1000000000000000 AS BIGINT)
      |      AS x_fp
      |  FROM x),
      |bd AS (
      |  SELECT label, fold, dim, CAST(sum(x_fp) AS HUGEINT) AS s,
      |    CAST(count(*) AS HUGEINT) AS n
      |  FROM fp GROUP BY 1, 2, 3),
      |j AS (
      |  SELECT a.label, a.dim, abs(a.s * b.n - b.s * a.n) AS num,
      |    a.n AS n_a, b.n AS n_b
      |  FROM bd a JOIN bd b ON a.label = b.label AND a.dim = b.dim
      |  WHERE a.fold = 0 AND b.fold = 1),
      |g AS (
      |  SELECT label, any_value(n_a) AS n_a, any_value(n_b) AS n_b,
      |    CAST(count(*) AS HUGEINT) AS n_dims,
      |    sum(num) AS sum_num, max(num) AS max_num
      |  FROM j GROUP BY label),
      |w AS (
      |  SELECT g.label, g.n_a, g.n_b, g.n_dims, g.sum_num, g.max_num,
      |    min(j.dim) AS worst_dim
      |  FROM g JOIN j ON j.label = g.label AND j.num = g.max_num
      |  GROUP BY 1, 2, 3, 4, 5, 6)
      |SELECT CAST(label AS BIGINT) AS label,
      |  CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
      |  CAST(sum_num * 1000000
      |    // (n_a * n_b * 1000000000000000 * n_dims) AS BIGINT)
      |    AS mean_shift_micros,
      |  CAST(max_num * 1000000 // (n_a * n_b * 1000000000000000) AS BIGINT)
      |    AS max_shift_micros,
      |  CAST(worst_dim AS INTEGER) AS worst_dim
      |FROM w ORDER BY label""".stripMargin

  /** Two-sample Cramér–von Mises drift (Anderson, Ann. Math. Stat. 1962)
    * of each source's `n_chars` distribution vs the rest of the corpus —
    * the INTEGRAL companion to [[ksDrift]]'s sup statistic: KS sees the
    * single worst CDF gap, CvM accumulates ALL of them, so a broad small
    * shift that never produces one large gap still registers.
    *
    *   T = n·m/(n+m)² · Σ_k (F₁(z_k) − F₂(z_k))²
    *
    * summed over the POOLED sample points z_k (ties = the distinct-value
    * grid weighted by pooled multiplicity g_x). Unlike ksDrift (whose sup
    * is an IEEE max of exactly-representable quotient gaps), the sum of
    * squares is kept EXACT: with s = cum_s·m − (cum_g−cum_s)·n over the
    * common denominator n·m,
    *
    *   T = Σ g_x·s_x² / ((n+m)²·n·m)
    *
    * and the output is the exact floor micros of that rational —
    * DECIMAL(38,0)/HUGEINT quadratics, no float anywhere. Overflow
    * headroom: Σ g·s² ≤ (n+m)·(n·m)², ~1e24 at this corpus's sf0.1 —
    * the micros product needs n·m ≲ 3e15, i.e. per-source doc counts
    * into the tens of millions; past that the micros scale moves to a
    * wider fixed point, same plan.
    *
    * Distributed shape: identical to [[ksDrift]] — domain-bounded
    * (source × distinct n_chars) frames, windowed CDFs over the grid,
    * corpus touched once.
    */
  def cvmDrift(documents: DataFrame): DataFrame = {
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val counts = documents
      .groupBy(col("source"), col("n_chars").as("x"))
      .agg(count(lit(1)).as("c"))
    val totals = documents.groupBy(col("source"))
      .agg(count(lit(1)).as("n_source"))
    val grand = documents.agg(count(lit(1)).as("n_total"))
    val grid = counts.groupBy(col("x")).agg(sum(col("c")).as("g"))
      .withColumn("cum_g", sum(col("g")).over(
        Window.orderBy(col("x"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val bySourceX = Window.partitionBy(col("source")).orderBy(col("x"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val crossed = grid.crossJoin(broadcast(totals))
      .join(counts, Seq("source", "x"), "left")
      .withColumn("cum_s", sum(coalesce(col("c"), lit(0L))).over(bySourceX))
    def dec(c: org.apache.spark.sql.Column) = c.cast(d38)
    crossed.crossJoin(broadcast(grand))
      .withColumn("n_rest", col("n_total") - col("n_source"))
      .withColumn("s_num",
        dec(col("cum_s")) * dec(col("n_rest")) -
          dec(col("cum_g") - col("cum_s")) * dec(col("n_source")))
      .groupBy(col("source"), col("n_source"), col("n_rest"))
      .agg(sum(dec(col("g")) * col("s_num") * col("s_num")).as("t_num"))
      .withColumn("cvm_micros", expr(
        "CAST((t_num * 1000000) DIV " +
          "(CAST((n_source + n_rest) AS DECIMAL(38,0)) * (n_source + n_rest)" +
          " * n_source * n_rest) AS BIGINT)"))
      .select(col("source"), col("n_source"), col("n_rest"),
        col("cvm_micros"))
      .orderBy(col("source"))
  }

  def cvmDriftOracleSql: String =
    """WITH counts AS (
      |  SELECT source, n_chars AS x, CAST(count(*) AS BIGINT) AS c
      |  FROM documents GROUP BY 1, 2),
      |totals AS (
      |  SELECT source, CAST(count(*) AS BIGINT) AS n_source
      |  FROM documents GROUP BY 1),
      |grand AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM documents),
      |grid AS (SELECT x, sum(c) AS g FROM counts GROUP BY 1),
      |gcum AS (
      |  SELECT x, g, CAST(sum(g) OVER (ORDER BY x ROWS UNBOUNDED PRECEDING)
      |    AS BIGINT) AS cum_g
      |  FROM grid),
      |crossed AS (
      |  SELECT t.source, t.n_source, gc.x, gc.g, gc.cum_g,
      |    CAST(sum(COALESCE(c.c, 0)) OVER (PARTITION BY t.source
      |      ORDER BY gc.x ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_s
      |  FROM gcum gc CROSS JOIN totals t
      |  LEFT JOIN counts c ON c.source = t.source AND c.x = gc.x),
      |terms AS (
      |  SELECT cr.source, cr.n_source, g.n_total - cr.n_source AS n_rest,
      |    CAST(cr.g AS HUGEINT) *
      |      (CAST(cr.cum_s AS HUGEINT) * (g.n_total - cr.n_source)
      |       - CAST(cr.cum_g - cr.cum_s AS HUGEINT) * cr.n_source)
      |      * (CAST(cr.cum_s AS HUGEINT) * (g.n_total - cr.n_source)
      |       - CAST(cr.cum_g - cr.cum_s AS HUGEINT) * cr.n_source) AS term
      |  FROM crossed cr CROSS JOIN grand g),
      |agg AS (
      |  SELECT source, n_source, n_rest, sum(term) AS t_num
      |  FROM terms GROUP BY 1, 2, 3)
      |SELECT source, n_source, n_rest,
      |  CAST((t_num * 1000000) //
      |    (CAST(n_source + n_rest AS HUGEINT) * (n_source + n_rest)
      |     * n_source * n_rest) AS BIGINT) AS cvm_micros
      |FROM agg ORDER BY source""".stripMargin
}
