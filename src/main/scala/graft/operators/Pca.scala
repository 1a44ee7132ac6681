package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact-arithmetic PCA primitives over the embedding corpus: the Gram
  * (uncentered second-moment) matrix, computed distributed, and the top
  * principal direction by fixed-point power iteration — the spectrum
  * audit a vector pipeline runs before choosing index/whitening params
  * (cf. Jolliffe, "Principal Component Analysis"; power iteration per
  * von Mises & Pollaczek-Geiringer 1929).
  *
  * Exactness discipline (the repo's power-of-two fixed point,
  * cf. Similarity.nearestCentroid): each embedding coordinate quantizes
  * ONCE as q = floor(x·2^20) — an exact double op on both engines —
  * and everything after is int64 arithmetic: Gram entries are exact
  * Σ q_i·q_j (|x| < 1 ⇒ |q| <= 2^20 ⇒ products <= 2^40, safe for
  * corpora to ~2^22 rows; larger corpora would drop to scale 2^16),
  * and the power iteration renormalizes to max |component| ≈ 2^20 by
  * sign-separated integer division each step (Spark DIV truncates,
  * DuckDB // floors — the CASE makes both truncate) so no floating
  * point ever enters the loop. Results are bit-identical across
  * engines BY CONSTRUCTION, not by tolerance.
  *
  * Scale: the Gram pair fan-out is rows × d(d+1)/2 with map-side
  * combine down to d(d+1)/2 groups — the shuffle is dimension-bounded,
  * not corpus-bounded. The power iteration then runs on the SINGLE
  * collected d×d row (d = 64 here; a matrix that small is single-row
  * territory by design — the distributed work is the corpus pass).
  *
  * Magnitude ledger for the iteration (d = 64): |G_q| < 2^27 after
  * requantizing Gram to scale 2^20 (entries bounded by corpus rows ×
  * 2^40 / 2^20), |v| <= 2^20, matvec Σ over 64 terms < 2^53; the
  * renorm divisor mx DIV 2^20 then caps the next |v| at ~2^20 again.
  * Rayleigh numerator uses (matvec DIV 2^20)·v < 2^53. All exact.
  */
object Pca {

  private val Scale = 1048576L // 2^20

  /** Upper-triangle Gram matrix: (i, j, gram_fp, gram) with
    * gram_fp = Σ_rows floor(x_i·2^20)·floor(x_j·2^20) exact and
    * gram = gram_fp / 2^40 its double view.
    */
  def gramMatrix(embeddings: DataFrame): DataFrame =
    embeddings
      .select(col("embedding").cast("array<double>").as("v"))
      // native one-pass pair fan-out (GramPairs) — bit-identical to the
      // nested flatten(transform(sequence...)) HOF spelling it replaces
      // (equality-spec-pinned), which re-entered two interpreted lambdas
      // per pair and was the whole cost of this corpus pass
      .select(explode(graft.functions.GraftColumns.gramPairs(col("v"))).as("s"))
      .groupBy(col("s.i").as("i"), col("s.j").as("j"))
      .agg(sum(col("s.p")).as("gram_fp"))
      .select(col("i"), col("j"), col("gram_fp"),
        (col("gram_fp").cast("double") / lit(1099511627776.0)).as("gram"))
      .orderBy(col("i"), col("j"))

  /** In-SQL helpers for the single-row iteration. `bind1` is the
    * one-element-array trick that lets a lambda NAME an intermediate
    * (SQL higher-order functions have no `let`): transform([expr],
    * w -> body(w))[1].
    */
  private def matvecSql(m: String, v: String): String =
    s"""transform($m, r ->
       |  aggregate(sequence(0, size(r) - 1), CAST(0 AS BIGINT),
       |    (acc, i) -> acc + element_at(r, i + 1)
       |                    * element_at($v, i + 1)))""".stripMargin

  /** Top principal direction of the Gram matrix by `iters` fixed-point
    * power-iteration steps from v0 = (2^20, …, 2^20), renormalized each
    * step. Output, one row per dimension:
    * (dim, v_fp, rayleigh_num_fp, rayleigh_den_fp) — v_fp in
    * [-2^20, 2^20]; λ of the quantized Gram ≈ 2^20·num/den in the
    * scale-2^20 units of G_q (exact integer pair emitted, no division
    * performed; the Gram is PSD so the iteration cannot oscillate).
    */
  def pcaPowerIteration(embeddings: DataFrame, iters: Int = 20): DataFrame = {
    val gram = gramMatrix(embeddings)
    val full = gram.select(col("i"), col("j"), col("gram_fp"))
      .unionByName(gram.filter(col("i") =!= col("j"))
        .select(col("j").as("i"), col("i").as("j"), col("gram_fp")))
      .withColumn("gq", expr(
        "CASE WHEN gram_fp >= 0 THEN gram_fp DIV 1048576" +
          " ELSE -((-gram_fp) DIV 1048576) END"))
    val mat = full
      .groupBy(col("i"))
      .agg(sort_array(collect_list(struct(col("j"), col("gq")))).as("rj"))
      .groupBy()
      .agg(sort_array(collect_list(
        struct(col("i"), col("rj.gq").as("row")))).as("m0"))
      .select(expr("transform(m0, r -> r.row)").as("m"))
    // step(v) = renorm(M·v); renorm divides by greatest(1, max|w| DIV 2^20)
    // with truncation-toward-zero on both engines. The inner transform
    // over array(matvec) BINDS w so the max-divisor is expressible.
    val stepBody =
      s"""element_at(transform(array(${matvecSql("m", "v")}), w ->
         |  transform(w, x -> CASE WHEN x >= 0
         |    THEN x DIV greatest(CAST(1 AS BIGINT),
         |      aggregate(w, CAST(0 AS BIGINT),
         |        (a, y) -> greatest(a, abs(y))) DIV $Scale)
         |    ELSE -((-x) DIV greatest(CAST(1 AS BIGINT),
         |      aggregate(w, CAST(0 AS BIGINT),
         |        (a, y) -> greatest(a, abs(y))) DIV $Scale)) END)), 1)"""
        .stripMargin
    val vec = mat.select(col("m"), expr(
      s"""aggregate(
         |  sequence(1, $iters),
         |  transform(m, r -> CAST($Scale AS BIGINT)),
         |  (v, it) -> $stepBody,
         |  v -> v)""".stripMargin).as("v"))
    val withRayleigh = vec.select(col("m"), col("v"),
      expr(
        s"""element_at(transform(array(${matvecSql("m", "v")}), w ->
           |  aggregate(sequence(0, size(w) - 1), CAST(0 AS BIGINT),
           |    (acc, i) -> acc + element_at(v, i + 1) *
           |      (CASE WHEN element_at(w, i + 1) >= 0
           |        THEN element_at(w, i + 1) DIV $Scale
           |        ELSE -((-element_at(w, i + 1)) DIV $Scale) END))), 1)"""
          .stripMargin).as("rayleigh_num_fp"),
      expr(
        """aggregate(v, CAST(0 AS BIGINT),
          |  (acc, x) -> acc + x * x)""".stripMargin).as("rayleigh_den_fp"))
    withRayleigh
      .select(posexplode(col("v")).as(Seq("dim0", "v_fp")),
        col("rayleigh_num_fp"), col("rayleigh_den_fp"))
      .select(col("dim0").cast("int").as("dim"), col("v_fp"),
        col("rayleigh_num_fp"), col("rayleigh_den_fp"))
      .orderBy(col("dim"))
  }

  /** DuckDB replay of [[gramMatrix]]: same quantize-once products via
    * list comprehensions.
    */
  def gramOracleSql: String =
    """WITH pr AS (
      |  SELECT unnest(flatten(list_transform(
      |    range(0, len(embedding)), i ->
      |    list_transform(range(i, len(embedding)), j -> {
      |      'i': i, 'j': j,
      |      'p': CAST(floor(CAST(embedding[CAST(i AS INT) + 1] AS DOUBLE)
      |             * 1048576.0) AS BIGINT)
      |         * CAST(floor(CAST(embedding[CAST(j AS INT) + 1] AS DOUBLE)
      |             * 1048576.0) AS BIGINT)})))) AS s
      |  FROM embeddings)
      |SELECT CAST(s.i AS INT) AS i, CAST(s.j AS INT) AS j,
      |  CAST(sum(s.p) AS BIGINT) AS gram_fp,
      |  CAST(sum(s.p) AS DOUBLE) / 1099511627776.0 AS gram
      |FROM pr
      |GROUP BY 1, 2
      |ORDER BY i, j""".stripMargin

  /** DuckDB replay of [[pcaPowerIteration]]: the same quantized matrix,
    * the same truncating renormalized matvec, iterated by a recursive
    * CTE carrying the BIGINT vector.
    */
  def pcaOracleSql(iters: Int = 20): String = {
    // the matvec M·v, macro-expanded wherever the step needs it (SQL
    // higher-order functions have no `let`, and DuckDB cannot correlate
    // the recursive v through a nested derived table)
    val W = """list_transform(m, r ->
      |      CAST(list_sum(list_transform(range(1, len(r) + 1),
      |        i -> r[CAST(i AS INT)] * v[CAST(i AS INT)])) AS BIGINT))"""
      .stripMargin
    s"""WITH RECURSIVE pr AS (
      |  SELECT unnest(flatten(list_transform(
      |    range(0, len(embedding)), i ->
      |    list_transform(range(i, len(embedding)), j -> {
      |      'i': i, 'j': j,
      |      'p': CAST(floor(CAST(embedding[CAST(i AS INT) + 1] AS DOUBLE)
      |             * 1048576.0) AS BIGINT)
      |         * CAST(floor(CAST(embedding[CAST(j AS INT) + 1] AS DOUBLE)
      |             * 1048576.0) AS BIGINT)})))) AS s
      |  FROM embeddings),
      |gr AS (
      |  SELECT CAST(s.i AS BIGINT) AS i, CAST(s.j AS BIGINT) AS j,
      |    CAST(sum(s.p) AS BIGINT) AS gram_fp
      |  FROM pr GROUP BY 1, 2),
      |fullg AS (
      |  SELECT i, j,
      |    CASE WHEN gram_fp >= 0 THEN gram_fp // 1048576
      |         ELSE -((-gram_fp) // 1048576) END AS gq
      |  FROM (SELECT i, j, gram_fp FROM gr
      |        UNION ALL
      |        SELECT j AS i, i AS j, gram_fp FROM gr WHERE i <> j)),
      |rows_m AS (
      |  SELECT i, list(gq ORDER BY j) AS r FROM fullg GROUP BY i),
      |mm AS (SELECT list(r ORDER BY i) AS m FROM rows_m),
      |it(k, v) AS (
      |  SELECT 0,
      |    (SELECT list_transform(range(1, len(m) + 1),
      |       x -> CAST(1048576 AS BIGINT)) FROM mm)
      |  UNION ALL
      |  SELECT k + 1,
      |    list_transform($W, x -> CASE WHEN x >= 0
      |      THEN x // greatest(CAST(1 AS BIGINT),
      |        CAST(list_max(list_transform($W, y -> abs(y))) AS BIGINT)
      |          // 1048576)
      |      ELSE -((-x) // greatest(CAST(1 AS BIGINT),
      |        CAST(list_max(list_transform($W, y -> abs(y))) AS BIGINT)
      |          // 1048576)) END)
      |  FROM it, mm WHERE k < $iters),
      |fin AS (SELECT v FROM it WHERE k = $iters),
      |wfin AS (SELECT v, $W AS w FROM fin, mm),
      |ray AS (
      |  SELECT v,
      |    CAST(list_sum(list_transform(range(1, len(v) + 1), i ->
      |      v[CAST(i AS INT)] * (CASE WHEN w[CAST(i AS INT)] >= 0
      |        THEN w[CAST(i AS INT)] // 1048576
      |        ELSE -((-w[CAST(i AS INT)]) // 1048576) END)))
      |      AS BIGINT) AS rayleigh_num_fp,
      |    CAST(list_sum(list_transform(v, x -> x * x)) AS BIGINT)
      |      AS rayleigh_den_fp
      |  FROM wfin)
      |SELECT CAST(d AS INT) AS dim,
      |  v[CAST(d AS INT) + 1] AS v_fp,
      |  rayleigh_num_fp, rayleigh_den_fp
      |FROM ray, (SELECT unnest(range(0, (SELECT len(m) FROM mm))) AS d)
      |ORDER BY dim""".stripMargin
  }
}
