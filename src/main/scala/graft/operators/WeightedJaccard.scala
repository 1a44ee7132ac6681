package graft.operators

import graft.functions.{GraftColumns, TextAnalysis}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multiset (term-frequency-weighted) Jaccard rerank of the set-level
  * near-duplicate candidates — the second stage the set-based
  * [[Dedup.ngramJaccardPairs]] score deliberately ignores: two documents
  * can share every 3-gram TYPE yet differ wildly in how often they
  * repeat them (a template instantiated 1× vs 40×). The weighted score
  * (Chierichetti et al., KDD 2010 notation; a.k.a. histogram
  * intersection over union)
  *
  *   J_w(A,B) = Σ_t min(c_A(t), c_B(t)) / Σ_t max(c_A(t), c_B(t))
  *
  * uses Σmax = |A| + |B| − Σmin, so only the INTERSECTION histogram join
  * is ever materialized; the score is the exact micros quotient
  * Σmin·10⁶ DIV (len_a + len_b − Σmin).
  *
  * Candidate contract (identical in the oracle): the shingle UNIVERSE
  * is first restricted to DISCRIMINATIVE shingles, df ≤ maxDf — the
  * classic stop-shingle cut (Broder 1997 §4: ultra-common shingles
  * carry no resemblance signal and make the inverted index quadratic;
  * an unbanded run on a dense-vocab synthetic corpus OOM'd at 100×
  * with Σ df² in the billions). Over that universe, pairs with
  * set-level 3-gram Jaccard ≥ 1/4 are candidates, tested exactly
  * cross-multiplied (4·common ≥ n_a + n_b − common). Two pure
  * optimizations under that contract: df = 1 shingles are skipped on
  * the JOIN side (they cannot produce a pair; they still count in
  * n_a/n_b), and the ε-relaxed size-band prune (the
  * [[Dedup.ngramJaccardPairs]] argument) trims the index join.
  *
  * Scale: the banded index join is Σ_{2 ≤ df ≤ maxDf} df² ≤ maxDf ·
  * Σ df — LINEAR in corpus shingle volume by construction; the rerank
  * joins the candidate pairs to the per-doc token histograms on
  * (doc, token) — shuffle equi-joins bounded by candidates ×
  * shared-token types, never corpus × corpus.
  */
object WeightedJaccard {

  def weightedJaccardRerank(
      documents: DataFrame, k: Int = 3, maxDf: Long = 50L): DataFrame = {
    val setThresholdInv = 4L // set-Jaccard gate = 1/setThresholdInv
    // df from a count-only window, not groupBy+join-back (the
    // hashedShingleDf argument: the join formulation re-explodes the
    // corpus for the dfreq side), and the filtered frame is CHECKPOINTED
    // before the self-join — each side of a self-join otherwise
    // re-executes the whole explode+window subtree (the before-plan had
    // SIX Generate nodes and ten Exchanges for two logical explodes).
    val occ = Dedup.shingles(Layout.widen(documents), k)
      .select(col("doc_id"), explode(col("shingles")).as("shingle"))
    val uni = occ.withColumn("df", count(lit(1)).over(
      org.apache.spark.sql.expressions.Window.partitionBy(col("shingle"))))
      .filter(col("df") <= maxDf)
    val sh = uni
      .withColumn("n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id")))
        .cast("long"))
      .filter(col("df") >= 2L)
      .localCheckpoint()
    val pruneT = lit(1.0 / setThresholdInv - 1e-9)
    val cands = sh.as("a")
      .join(sh.as("b"),
        col("a.shingle") === col("b.shingle") &&
          col("a.doc_id") < col("b.doc_id") &&
          col("a.n") * pruneT <= col("b.n") &&
          col("b.n") * pruneT <= col("a.n"))
      .groupBy(
        col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.n").as("na"), col("b.n").as("nb"))
      .agg(count(lit(1)).as("common_shingles"))
      .filter(lit(setThresholdInv) * col("common_shingles") >=
        col("na") + col("nb") - col("common_shingles"))
      .withColumn("set_j_micros",
        expr("common_shingles * 1000000 DIV (na + nb - common_shingles)"))
    // token histograms with the doc length riding along (functionally
    // dependent on doc_id — no separate lengths aggregate)
    val toks = TextAnalysis.tokens(col("text"))
    // checkpointed for the same reason as `sh`: ha and hb below would
    // each re-run the token explode + aggregate
    val hist = documents
      .select(col("doc_id"), size(toks).cast("long").as("len"),
        explode(toks).as("token"))
      .groupBy(col("doc_id"), col("len"), col("token"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val ha = hist.select(col("doc_id").as("doc_a"), col("len").as("len_a"),
      col("token"), col("c").as("ca"))
    val hb = hist.select(col("doc_id").as("doc_b"), col("len").as("len_b"),
      col("token"), col("c").as("cb"))
    cands
      .join(ha, Seq("doc_a"))
      .join(hb, Seq("doc_b", "token"))
      .groupBy(col("doc_a"), col("doc_b"), col("common_shingles"),
        col("set_j_micros"), col("len_a"), col("len_b"))
      .agg(sum(least(col("ca"), col("cb"))).as("sum_min"))
      .withColumn("jw_micros",
        expr("sum_min * 1000000 DIV (len_a + len_b - sum_min)"))
      .select(col("doc_a"), col("doc_b"), col("common_shingles"),
        col("set_j_micros"), col("sum_min"), col("len_a"), col("len_b"),
        col("jw_micros"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  def weightedJaccardRerankOracleSql(maxDf: Long = 50L): String =
    s"""WITH occ AS (
      |  SELECT doc_id, unnest(list_distinct(list_transform(
      |    range(1, len(string_split(text, ' ')) - 1),
      |    i -> string_split(text, ' ')[i] || ' ' ||
      |         string_split(text, ' ')[i+1] || ' ' ||
      |         string_split(text, ' ')[i+2]))) AS shingle
      |  FROM documents),
      |dfreq AS (SELECT shingle, CAST(count(*) AS BIGINT) AS df
      |  FROM occ GROUP BY 1),
      |uni AS (SELECT o.doc_id, o.shingle, d.df
      |  FROM occ o JOIN dfreq d ON o.shingle = d.shingle
      |  WHERE d.df <= $maxDf),
      |sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n
      |  FROM uni GROUP BY doc_id),
      |sh AS (SELECT doc_id, shingle FROM uni WHERE df >= 2),
      |cands AS (
      |  SELECT p.doc_a, p.doc_b, p.common_shingles,
      |    p.common_shingles * 1000000
      |      // (sa.n + sb.n - p.common_shingles) AS set_j_micros
      |  FROM (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |               CAST(count(*) AS BIGINT) AS common_shingles
      |        FROM sh a JOIN sh b
      |          ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      |        GROUP BY 1, 2) p
      |  JOIN sizes sa ON p.doc_a = sa.doc_id
      |  JOIN sizes sb ON p.doc_b = sb.doc_id
      |  WHERE 4 * p.common_shingles >= sa.n + sb.n - p.common_shingles),
      |hist AS (
      |  SELECT doc_id, token, CAST(count(*) AS BIGINT) AS c
      |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token
      |        FROM documents)
      |  GROUP BY 1, 2),
      |lens AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS len
      |  FROM hist GROUP BY 1)
      |SELECT c.doc_a, c.doc_b, c.common_shingles, c.set_j_micros,
      |  CAST(sum(least(ha.c, hb.c)) AS BIGINT) AS sum_min,
      |  any_value(la.len) AS len_a, any_value(lb.len) AS len_b,
      |  CAST(sum(least(ha.c, hb.c)) * 1000000
      |    // (any_value(la.len) + any_value(lb.len)
      |       - sum(least(ha.c, hb.c))) AS BIGINT) AS jw_micros
      |FROM cands c
      |JOIN hist ha ON ha.doc_id = c.doc_a
      |JOIN hist hb ON hb.doc_id = c.doc_b AND hb.token = ha.token
      |JOIN lens la ON la.doc_id = c.doc_a
      |JOIN lens lb ON lb.doc_id = c.doc_b
      |GROUP BY 1, 2, 3, 4
      |ORDER BY c.doc_a, c.doc_b""".stripMargin
}
