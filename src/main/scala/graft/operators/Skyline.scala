package graft.operators

import graft.functions.TextAnalysis
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Skyline / Pareto-frontier query (Börzsönyi, Kossmann & Stocker, ICDE
  * 2001) over the document corpus: the documents not dominated on the
  * (token_count, distinct_token_count) plane — no other document has
  * ≥ both coordinates with > in at least one. In a curation pipeline
  * this is the "maximal documents" set: the frontier of length vs
  * lexical richness that no other document strictly improves on.
  *
  * Algorithm: the classic sort-based 2-D sweep, expressed as ONE window
  * — sort by (x DESC, y DESC); a row is on the skyline iff its y
  * strictly exceeds the running max y of all STRICTLY-greater-x rows.
  * Handling of ties is where naive sweeps go wrong, so the dominance
  * rule is spelled explicitly: rows that tie on BOTH coordinates don't
  * dominate each other (both kept — distinct-on-duplicates is a policy
  * choice, documented as "keep all"); rows equal in x are not compared
  * against each other by the prefix max (the max is taken over the
  * PRECEDING x-GROUPS via a two-level max: per-x-group max y, then the
  * running max over earlier groups with a 1-group lag).
  *
  * Exactness: pure integer comparisons on exact token counts — nothing
  * to round. The skyline membership is therefore bit-identical across
  * engines by construction; both sides spell the identical two-level
  * window.
  *
  * Scale: one corpus scan to the per-doc count frame; the sweep is a
  * window over the DISTINCT-x group frame (bounded by the token-count
  * value domain, not corpus rows) joined back to the doc frame — the
  * doc-level window never materializes a single-partition corpus sort
  * at 100 TB because the group frame is what gets globally ordered.
  */
object Skyline {

  def paretoDocs(documents: DataFrame): DataFrame = {
    val toks = TextAnalysis.tokens(col("text"))
    val docs = documents.select(
      col("doc_id"),
      size(toks).cast("long").as("n_tokens"),
      size(array_distinct(toks)).cast("long").as("n_distinct"))
    // per-x-group max y (value-domain-bounded frame)
    val groups = docs
      .groupBy(col("n_tokens"))
      .agg(max(col("n_distinct")).as("gmax"))
    // running max of gmax over STRICTLY greater x only: order by x DESC
    // and lag the inclusive prefix max by one group
    val byXDesc = Window.orderBy(col("n_tokens").desc)
    val sweep = groups
      .withColumn("prefmax",
        max(col("gmax")).over(
          byXDesc.rowsBetween(Window.unboundedPreceding, -1)))
    // a doc survives iff (a) nothing in its own x-group beats its y
    // (y = gmax — equal-on-both ties all survive) and (b) no
    // strictly-greater-x group reaches its y (y > prefmax)
    docs
      .join(sweep, Seq("n_tokens"))
      .filter(col("n_distinct") === col("gmax") &&
        (col("prefmax").isNull || col("n_distinct") > col("prefmax")))
      .select(col("doc_id"), col("n_tokens"), col("n_distinct"))
      .orderBy(col("n_tokens").desc, col("doc_id"))
  }

  def paretoDocsOracleSql: String =
    """WITH docs AS (
      |  SELECT doc_id,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      |    CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
      |      AS n_distinct
      |  FROM documents),
      |groups AS (
      |  SELECT n_tokens, max(n_distinct) AS gmax
      |  FROM docs GROUP BY 1),
      |sweep AS (
      |  SELECT n_tokens, gmax,
      |    max(gmax) OVER (ORDER BY n_tokens DESC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prefmax
      |  FROM groups)
      |SELECT d.doc_id, d.n_tokens, d.n_distinct
      |FROM docs d JOIN sweep s ON d.n_tokens = s.n_tokens
      |WHERE d.n_distinct = s.gmax
      |  AND (s.prefmax IS NULL OR d.n_distinct > s.prefmax)
      |ORDER BY d.n_tokens DESC, d.doc_id""".stripMargin
}
