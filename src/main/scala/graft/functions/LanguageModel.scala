package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interpolated Kneser–Ney bigram language model (Kneser & Ney, ICASSP
  * 1995; Chen & Goodman, Harvard TR-10-98) over the corpus's own token
  * stream — the discounting family that modern LM-quality filters (and
  * every n-gram toolkit: KenLM, SRILM) actually use, where
  * [[TextAnalysis.bigramNll]] is the add-one baseline.
  *
  *   P(w2|w1) = max(c(w1,w2) − D, 0)/c(w1·) + λ(w1)·P_cont(w2)
  *   λ(w1)    = D·N1+(w1·)/c(w1·)            (leftover mass)
  *   P_cont(w2) = N1+(·w2)/B                  (continuation prob)
  *
  * with D = 3/4, c(w1·) the head occurrence count, N1+(w1·)/N1+(·w2) the
  * distinct-follower/distinct-predecessor type counts and B the total
  * number of distinct bigram types.
  *
  * EXACT INTEGER FORM — the reason D = 3/4: put every conditional over
  * the common denominator den(w1) = 4·c(w1·)·B. Then for an observed
  * bigram (counts ≥ 1 ⇒ the max() never clips),
  *
  *   num(w1,w2) = (4·c12 − 3)·B + 3·N1+(w1·)·N1+(·w2)
  *
  * and for an UNSEEN w2 the numerator is just the continuation term
  * 3·N1+(w1·)·N1+(·w2). Both sides are products of exact longs, so the
  * model is bit-identical across engines with no float in sight, and the
  * normalization is PROVABLE row-local arithmetic:
  *
  *   Σ_observed num = B·(4·c(w1·) − 3·N1+(w1·)) + 3·N1+(w1·)·Σ_obs N1+(·w2)
  *   Σ_unseen   num = 3·N1+(w1·)·(B − Σ_obs N1+(·w2))     [Σ_w2 N1+(·w2)=B]
  *   total          = 4·c(w1·)·B = den(w1)                             ∎
  *
  * Every output row carries `norm_tight`, the per-head materialization of
  * that identity — a self-check the oracle recomputes independently.
  *
  * Distributed shape: one bigram explode (two array slices zipped per
  * row, no per-element re-split) into a vocab²-bounded
  * map-side-combined (w1,w2) count; c1/r1 and r2 are count-only windows
  * over that frame (partition sizes bounded by per-token fan-out, i.e.
  * vocab, never corpus rows); B rides a 1-row broadcast. Top-k orders by
  * the exact micros quotient with (w1,w2) tiebreak — a total order, so
  * the selected set is engine-independent.
  *
  * Overflow bound (documented, not latent): p_micros = num·10⁶ needs
  * num < 2⁶³/10⁶ ≈ 9.2e12, i.e. c(w1·)·B ≲ 2.3e12 — holds through sf10
  * here; a 100-TB corpus moves num/den to DECIMAL(38,0) (same plan,
  * wider type) or rescales D's denominator out of the micros quotient.
  */
object LanguageModel {

  private def bigrams(documents: DataFrame): DataFrame = {
    val toks = TextAnalysis.tokens(col("text"))
    val n = size(toks)
    val pairs = arrays_zip(
      slice(toks, lit(1), n - 1).as("w1"),
      slice(toks, lit(2), n - 1).as("w2"))
    documents
      .select(col("doc_id"), explode(pairs).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
  }

  /** The exact KN conditional table restricted to heads with
    * c(w1·) ≥ minHeadCount, top-k rows by probability. Columns:
    * (w1, w2, c12, c1, r1, r2, b, p_num, p_den, p_micros, norm_tight).
    */
  def knBigramTable(
      documents: DataFrame,
      minHeadCount: Long = 30L,
      k: Int = 40): DataFrame = {
    val pc = bigrams(documents)
      .groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c12"))
    val bTot = pc.agg(count(lit(1)).as("b"))
    val w1W = Window.partitionBy(col("w1"))
    val w2W = Window.partitionBy(col("w2"))
    val m = pc
      .withColumn("c1", sum(col("c12")).over(w1W))
      .withColumn("r1", count(lit(1)).over(w1W))
      .withColumn("r2", count(lit(1)).over(w2W))
      // per-head sums for the normalization identity (window over w1 on
      // top of the w2 window: the second shuffle is vocab²-bounded)
      .withColumn("s_r2", sum(col("r2")).over(w1W))
      .crossJoin(broadcast(bTot))
      .withColumn("p_num",
        (lit(4L) * col("c12") - lit(3L)) * col("b") +
          lit(3L) * col("r1") * col("r2"))
      .withColumn("p_den", lit(4L) * col("c1") * col("b"))
      .withColumn("s_num", sum(col("p_num")).over(w1W))
      // Σ_obs num + 3·r1·(B − Σ_obs r2) must equal den — exactly.
      .withColumn("norm_tight",
        (col("s_num") + lit(3L) * col("r1") * (col("b") - col("s_r2")))
          === col("p_den"))
      .filter(col("c1") >= minHeadCount)
      .withColumn("p_micros", expr("p_num * 1000000 DIV p_den"))
    m.orderBy(col("p_micros").desc, col("w1"), col("w2"))
      .limit(k)
      .select(col("w1"), col("w2"), col("c12"), col("c1"), col("r1"),
        col("r2"), col("b"), col("p_num"), col("p_den"), col("p_micros"),
        col("norm_tight"))
      .orderBy(col("p_micros").desc, col("w1"), col("w2"))
  }

  def knBigramTableOracleSql(minHeadCount: Long = 30L, k: Int = 40): String =
    s"""WITH bi AS (
       |  SELECT
       |    unnest(list_transform(range(1, len(string_split(text, ' '))),
       |      i -> string_split(text, ' ')[i])) AS w1,
       |    unnest(list_transform(range(1, len(string_split(text, ' '))),
       |      i -> string_split(text, ' ')[i+1])) AS w2
       |  FROM documents),
       |pc AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
       |       FROM bi GROUP BY 1, 2),
       |bt AS (SELECT CAST(count(*) AS BIGINT) AS b FROM pc),
       |m AS (SELECT w1, w2, c12,
       |    CAST(sum(c12) OVER (PARTITION BY w1) AS BIGINT) AS c1,
       |    CAST(count(*) OVER (PARTITION BY w1) AS BIGINT) AS r1,
       |    CAST(count(*) OVER (PARTITION BY w2) AS BIGINT) AS r2
       |  FROM pc),
       |m2 AS (SELECT w1, w2, c12, c1, r1, r2,
       |    CAST(sum(r2) OVER (PARTITION BY w1) AS BIGINT) AS s_r2
       |  FROM m),
       |n AS (SELECT w1, w2, c12, c1, r1, r2, b, s_r2,
       |    (4 * c12 - 3) * b + 3 * r1 * r2 AS p_num,
       |    4 * c1 * b AS p_den
       |  FROM m2, bt),
       |n2 AS (SELECT *,
       |    CAST(sum(p_num) OVER (PARTITION BY w1) AS BIGINT) AS s_num
       |  FROM n)
       |SELECT w1, w2, c12, c1, r1, r2, b,
       |  CAST(p_num AS BIGINT) AS p_num, CAST(p_den AS BIGINT) AS p_den,
       |  CAST(p_num * 1000000 // p_den AS BIGINT) AS p_micros,
       |  (s_num + 3 * r1 * (b - s_r2)) = p_den AS norm_tight
       |FROM n2 WHERE c1 >= $minHeadCount
       |ORDER BY p_micros DESC, w1, w2 LIMIT $k""".stripMargin

  /** Per-document mean KN negative log-likelihood — the CCNet-style
    * (Wenzek et al. 2020) quality signal scored with the KN model instead
    * of add-one: avg over the document's bigram OCCURRENCES of
    * −ln(num/den). Each summand is ln() of an exact-long rational, so the
    * only cross-engine drift is ≤1-ulp ln() and sum order (~1e-13,
    * [[TextAnalysis.bigramNll]] hazard class) — far inside the 4-decimal
    * rounding grid.
    *
    * Distributed shape: the per-doc distinct-bigram frame (multiplicity
    * as a count column) joins the vocab²-bounded model on (w1,w2) — a
    * shuffle equi-join on both sides' natural key; no broadcast needed
    * and none assumed at corpus scale.
    */
  def knDocNll(documents: DataFrame): DataFrame = {
    val docBi = bigrams(documents)
      .groupBy(col("doc_id"), col("w1"), col("w2"))
      .agg(count(lit(1)).as("c_doc"))
    val pc = docBi
      .groupBy(col("w1"), col("w2"))
      .agg(sum(col("c_doc")).as("c12"))
    val bTot = pc.agg(count(lit(1)).as("b"))
    val model = pc
      .withColumn("c1", sum(col("c12")).over(Window.partitionBy(col("w1"))))
      .withColumn("r1", count(lit(1)).over(Window.partitionBy(col("w1"))))
      .withColumn("r2", count(lit(1)).over(Window.partitionBy(col("w2"))))
      .crossJoin(broadcast(bTot))
      .select(col("w1"), col("w2"),
        ((lit(4L) * col("c12") - lit(3L)) * col("b") +
          lit(3L) * col("r1") * col("r2")).as("p_num"),
        (lit(4L) * col("c1") * col("b")).as("p_den"))
    docBi
      .join(model, Seq("w1", "w2"))
      .groupBy(col("doc_id"))
      .agg(
        sum(col("c_doc")).as("n_bigrams"),
        sum(col("c_doc").cast("double") *
          (log(col("p_den").cast("double")) -
            log(col("p_num").cast("double")))).as("nll_sum"))
      .select(col("doc_id"), col("n_bigrams"),
        round(col("nll_sum") / col("n_bigrams"), 4).as("avg_kn_nll"))
      .orderBy(col("doc_id"))
  }

  /** Stupid Backoff cross-split evaluation (Brants et al., EMNLP 2007,
    * "Large Language Models in Machine Translation") — the score web-scale
    * n-gram systems use because it needs NO discounting statistics, just
    * raw counts and a fixed backoff α = 0.4 = 2/5:
    *
    *   S(w2|w1) = c(w1,w2)/c(w1·)       if the bigram was seen in train
    *            = (2·c(w2)) / (5·N)     else, backing off to the unigram
    *            = 0 (counted as OOV)    if w2 itself is unseen
    *
    * where c(w1·) is the bigram-context count (Σ_w2 c(w1,w2), doc-final
    * occurrences excluded — the MLE conditional normalizes exactly) and
    * c(w2)/N are raw train unigram frequencies.
    *
    * Scoring the corpus against itself never exercises the backoff path
    * (every bigram is trivially "seen"), so this evaluates HELD-OUT text:
    * the model trains on the train+val side of the repo's content-hash
    * split rule (doc_splits: rollingHash(text) % 100 < 90) and scores the
    * test side — the same cross-split discipline as splitContamination.
    *
    * Everything stays on the integer lattice: each bigram contributes
    * its exact micros quotient (c12·10⁶ DIV u1, resp. 2·c(w2)·10⁶ DIV
    * (5·N)) and the per-doc score is the SUM of those longs — no float
    * anywhere, bit-identical across engines. Per-doc seen/backoff/OOV
    * path counts make the backoff behavior itself part of the contract.
    *
    * Distributed shape: train-side bigram and unigram models are
    * map-side-combined aggregates bounded by vocab²/vocab; the test-side
    * (doc, w1, w2, multiplicity) frame LEFT-joins the bigram model on
    * (w1,w2) and the unigram model on w2 — shuffle equi-joins on natural
    * keys, no broadcast assumed; N rides a 1-row broadcast.
    */
  def stupidBackoffCrossSplit(documents: DataFrame): DataFrame = {
    val bucket = GraftColumns.rollingHash(col("text")) % 100
    val isTrain = bucket < 90
    val train = documents.filter(isTrain)
    val test = documents.filter(!isTrain)
    val biModel = bigrams(train)
      .groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c12"))
      .withColumn("u1", sum(col("c12")).over(Window.partitionBy(col("w1"))))
    // unigram model over the FULL train token stream (doc-final tokens
    // included), which is what Brants' f(w) denominators count
    val uniModel = train
      .select(explode(TextAnalysis.tokens(col("text"))).as("w2"))
      .groupBy(col("w2"))
      .agg(count(lit(1)).as("cu"))
    val nTot = uniModel.agg(sum(col("cu")).as("n_train"))
    val testBi = bigrams(test)
      .groupBy(col("doc_id"), col("w1"), col("w2"))
      .agg(count(lit(1)).as("c_doc"))
    testBi
      .join(biModel, Seq("w1", "w2"), "left")
      .join(uniModel, Seq("w2"), "left")
      .crossJoin(broadcast(nTot))
      .withColumn("path",
        when(col("c12").isNotNull, lit("seen"))
          .when(col("cu").isNotNull, lit("backoff"))
          .otherwise(lit("oov")))
      .withColumn("s_micros",
        when(col("path") === "seen", expr("c12 * 1000000 DIV u1"))
          .when(col("path") === "backoff",
            expr("2 * cu * 1000000 DIV (5 * n_train)"))
          .otherwise(lit(0L)))
      .groupBy(col("doc_id"))
      .agg(
        sum(col("c_doc")).as("n_bigrams"),
        sum(when(col("path") === "seen", col("c_doc")).otherwise(0L))
          .as("n_seen"),
        sum(when(col("path") === "backoff", col("c_doc")).otherwise(0L))
          .as("n_backoff"),
        sum(when(col("path") === "oov", col("c_doc")).otherwise(0L))
          .as("n_oov"),
        sum(col("c_doc") * col("s_micros")).as("score_micros"))
      .orderBy(col("doc_id"))
  }

  def stupidBackoffCrossSplitOracleSql: String = {
    val split =
      s"""sp AS (
         |  SELECT doc_id, text,
         |    list_reduce(
         |      list_prepend(CAST(0 AS BIGINT),
         |        list_transform(range(1, length(text) + 1),
         |                       i -> CAST(ascii(text[i]) AS BIGINT))),
         |      (a, b) -> (a * 31 + b) % 1000000007) % 100 < 90 AS is_train
         |  FROM documents
         |  WHERE ${graft.SketchOracles.asciiGuard} = 0)""".stripMargin
    s"""WITH $split,
       |tb AS (
       |  SELECT doc_id, is_train,
       |    unnest(list_transform(range(1, len(string_split(text, ' '))),
       |      i -> string_split(text, ' ')[i])) AS w1,
       |    unnest(list_transform(range(1, len(string_split(text, ' '))),
       |      i -> string_split(text, ' ')[i+1])) AS w2
       |  FROM sp),
       |bm AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
       |       FROM tb WHERE is_train GROUP BY 1, 2),
       |bm2 AS (SELECT w1, w2, c12,
       |    CAST(sum(c12) OVER (PARTITION BY w1) AS BIGINT) AS u1 FROM bm),
       |um AS (
       |  SELECT w2, CAST(count(*) AS BIGINT) AS cu FROM (
       |    SELECT unnest(string_split(text, ' ')) AS w2
       |    FROM sp WHERE is_train) GROUP BY 1),
       |nt AS (SELECT CAST(sum(cu) AS BIGINT) AS n_train FROM um),
       |db AS (SELECT doc_id, w1, w2, CAST(count(*) AS BIGINT) AS c_doc
       |       FROM tb WHERE NOT is_train GROUP BY 1, 2, 3),
       |sc AS (
       |  SELECT db.doc_id, db.c_doc,
       |    CASE WHEN bm2.c12 IS NOT NULL THEN 'seen'
       |         WHEN um.cu IS NOT NULL THEN 'backoff'
       |         ELSE 'oov' END AS path,
       |    CASE WHEN bm2.c12 IS NOT NULL THEN bm2.c12 * 1000000 // bm2.u1
       |         WHEN um.cu IS NOT NULL THEN 2 * um.cu * 1000000 // (5 * nt.n_train)
       |         ELSE 0 END AS s_micros
       |  FROM db
       |  LEFT JOIN bm2 ON db.w1 = bm2.w1 AND db.w2 = bm2.w2
       |  LEFT JOIN um ON db.w2 = um.w2
       |  CROSS JOIN nt)
       |SELECT doc_id,
       |  CAST(sum(c_doc) AS BIGINT) AS n_bigrams,
       |  CAST(sum(CASE WHEN path = 'seen' THEN c_doc ELSE 0 END) AS BIGINT)
       |    AS n_seen,
       |  CAST(sum(CASE WHEN path = 'backoff' THEN c_doc ELSE 0 END) AS BIGINT)
       |    AS n_backoff,
       |  CAST(sum(CASE WHEN path = 'oov' THEN c_doc ELSE 0 END) AS BIGINT)
       |    AS n_oov,
       |  CAST(sum(c_doc * s_micros) AS BIGINT) AS score_micros
       |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  def knDocNllOracleSql: String =
    """WITH bi AS (
      |  SELECT doc_id,
      |    unnest(list_transform(range(1, len(string_split(text, ' '))),
      |      i -> string_split(text, ' ')[i])) AS w1,
      |    unnest(list_transform(range(1, len(string_split(text, ' '))),
      |      i -> string_split(text, ' ')[i+1])) AS w2
      |  FROM documents),
      |db AS (SELECT doc_id, w1, w2, CAST(count(*) AS BIGINT) AS c_doc
      |       FROM bi GROUP BY 1, 2, 3),
      |pc AS (SELECT w1, w2, CAST(sum(c_doc) AS BIGINT) AS c12
      |       FROM db GROUP BY 1, 2),
      |bt AS (SELECT CAST(count(*) AS BIGINT) AS b FROM pc),
      |m AS (SELECT w1, w2, c12,
      |    CAST(sum(c12) OVER (PARTITION BY w1) AS BIGINT) AS c1,
      |    CAST(count(*) OVER (PARTITION BY w1) AS BIGINT) AS r1,
      |    CAST(count(*) OVER (PARTITION BY w2) AS BIGINT) AS r2
      |  FROM pc),
      |model AS (SELECT w1, w2,
      |    (4 * c12 - 3) * b + 3 * r1 * r2 AS p_num,
      |    4 * c1 * b AS p_den
      |  FROM m, bt)
      |SELECT db.doc_id, CAST(sum(c_doc) AS BIGINT) AS n_bigrams,
      |  round(sum(CAST(c_doc AS DOUBLE) *
      |    (ln(CAST(p_den AS DOUBLE)) - ln(CAST(p_num AS DOUBLE))))
      |    / sum(c_doc), 4) AS avg_kn_nll
      |FROM db JOIN model USING (w1, w2)
      |GROUP BY db.doc_id ORDER BY db.doc_id""".stripMargin
}
