package graft.operators

import graft.functions.TextAnalysis
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-level estimation and boilerplate detection for the curation
  * pipeline.
  */
object CorpusStats {

  /** Capture–recapture estimate of the corpus vocabulary size
    * (Lincoln–Petersen mark-recapture; bias-corrected form: Chapman
    * 1951) — the classic two-sample trick for "how many distinct tokens
    * does the FULL corpus have" from two cheap disjoint samples, useful
    * when the exact global distinct is the expensive thing at 100 TB
    * (here the exact count rides along as the utility audit precisely
    * because the test corpus is small enough to afford it).
    *
    * Sample A = docs with mix64(doc_id) ≡ 0 (mod 4), sample B = ≡ 1 —
    * disjoint by construction, the public splitmix64 chain replayed in
    * the oracle. With n₁/n₂ the samples' distinct-token counts and m
    * the overlap:
    *
    *   Chapman  N̂ = (n₁+1)(n₂+1) DIV (m+1) − 1      (never divides by 0)
    *   Lincoln–Petersen  N̂ = n₁·n₂·10⁶ DIV m        (micros; 0 if m = 0)
    *
    * all exact integer arithmetic.
    *
    * Scale: two hash-gated distinct reductions plus one intersection —
    * map-side-combined token reductions bounded by vocab, with the gates
    * applied at the scan so only ~half the corpus is tokenized at all.
    */
  def captureRecaptureVocab(documents: DataFrame): DataFrame = {
    import graft.functions.GraftColumns.mix64
    val gate = pmod(mix64(col("doc_id")), lit(4L))
    val toks = documents
      .select(gate.as("g"), explode(TextAnalysis.tokens(col("text")))
        .as("token"))
      .filter(col("g") <= 1L)
      .distinct()
    val agg = toks
      .groupBy(col("token"))
      .agg(max(when(col("g") === 0L, 1L).otherwise(0L)).as("in_a"),
        max(when(col("g") === 1L, 1L).otherwise(0L)).as("in_b"))
      .agg(
        sum(col("in_a")).as("n1"),
        sum(col("in_b")).as("n2"),
        sum(col("in_a") * col("in_b")).as("m"))
    val exact = documents
      .select(explode(TextAnalysis.tokens(col("text"))).as("token"))
      .agg(countDistinct(col("token")).as("true_vocab"))
    agg.crossJoin(exact)
      .withColumn("chapman_nhat",
        expr("((n1 + 1) * (n2 + 1)) DIV (m + 1) - 1"))
      .withColumn("lp_nhat_micros",
        when(col("m") > 0L, expr("(n1 * n2 * 1000000) DIV m"))
          .otherwise(0L))
      .select(col("n1"), col("n2"), col("m"),
        col("chapman_nhat"), col("lp_nhat_micros"), col("true_vocab"))
  }

  def captureRecaptureVocabOracleSql: String = {
    import graft.SketchOracles.{mixChain, U64 => u64}
    val golden = "11400714819323198485::HUGEINT"
    s"""WITH d0 AS (
  SELECT doc_id, text,
    ((CASE WHEN doc_id < 0 THEN CAST(doc_id AS HUGEINT) + $u64
           ELSE CAST(doc_id AS HUGEINT) END) + $golden) % $u64 AS z0
  FROM documents),
${mixChain("c1", "d0", Seq("doc_id", "text"), "z0")},
gated AS (SELECT CAST(mx % 4 AS BIGINT) AS g, text FROM c14
  WHERE mx % 4 <= 1),
toks AS (SELECT DISTINCT g, unnest(string_split(text, ' ')) AS token
  FROM gated),
flags AS (SELECT token,
    max(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS in_a,
    max(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS in_b
  FROM toks GROUP BY 1),
agg AS (SELECT CAST(sum(in_a) AS BIGINT) AS n1,
    CAST(sum(in_b) AS BIGINT) AS n2,
    CAST(sum(in_a * in_b) AS BIGINT) AS m
  FROM flags),
exact AS (SELECT CAST(count(DISTINCT token) AS BIGINT) AS true_vocab
  FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents))
SELECT n1, n2, m,
  ((n1 + 1) * (n2 + 1)) // (m + 1) - 1 AS chapman_nhat,
  CASE WHEN m > 0 THEN (n1 * n2 * 1000000) // m ELSE 0 END
    AS lp_nhat_micros,
  true_vocab
FROM agg, exact"""
  }

  /** Per-source boilerplate tokens: tokens present in ≥ minShare of a
    * source's documents (doc-frequency, not term-frequency — the CCNet /
    * RefinedWeb notion of template boilerplate: what repeats ACROSS
    * documents of one origin). Share is compared cross-multiplied
    * (df·den ≥ num·n_docs), exact integers.
    *
    * Scale: one scan to the (source, token, df) frame (distinct
    * per-doc tokens first, so a token repeated inside one doc counts
    * once), bounded by source-count × vocab — never corpus tokens.
    */
  def sourceBoilerplateTokens(
      documents: DataFrame,
      shareNum: Int = 4,
      shareDen: Int = 5): DataFrame = {
    val perDoc = documents
      .select(col("source"), col("doc_id"),
        explode(array_distinct(TextAnalysis.tokens(col("text"))))
          .as("token"))
    val df = perDoc
      .groupBy(col("source"), col("token"))
      .agg(count(lit(1)).as("df"))
    val sizes = documents
      .groupBy(col("source"))
      .agg(countDistinct(col("doc_id")).as("n_docs"))
    df.join(sizes, Seq("source"))
      .filter(col("df") * shareDen >= lit(shareNum.toLong) * col("n_docs"))
      .withColumn("share_micros", expr("df * 1000000 DIV n_docs"))
      .select(col("source"), col("token"), col("df"), col("n_docs"),
        col("share_micros"))
      .orderBy(col("source"), col("token"))
  }

  def sourceBoilerplateTokensOracleSql(
      shareNum: Int = 4, shareDen: Int = 5): String =
    s"""WITH perdoc AS (
       |  SELECT DISTINCT source, doc_id,
       |    unnest(string_split(text, ' ')) AS token
       |  FROM documents),
       |df AS (SELECT source, token, CAST(count(*) AS BIGINT) AS df
       |  FROM perdoc GROUP BY 1, 2),
       |sizes AS (SELECT source, CAST(count(DISTINCT doc_id) AS BIGINT)
       |    AS n_docs
       |  FROM documents GROUP BY 1)
       |SELECT d.source, d.token, d.df, z.n_docs,
       |  d.df * 1000000 // z.n_docs AS share_micros
       |FROM df d JOIN sizes z ON d.source = z.source
       |WHERE d.df * $shareDen >= $shareNum * z.n_docs
       |ORDER BY d.source, d.token""".stripMargin
}
