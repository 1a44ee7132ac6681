package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Positional (substring-level) duplication operators — the span-granular
  * member of the dedup family (Lee et al. 2022, "Deduplicating Training
  * Data Makes Language Models Better"): document-level dedup
  * ([[Dedup.exactGroups]], MinHash/SimHash) removes whole near-identical
  * documents, but the dominant residual duplication in web corpora is
  * REPEATED SPANS — boilerplate, licence blocks, templated paragraphs —
  * embedded inside otherwise-distinct documents. These operators find
  * them and plan around them.
  *
  * Distinct from [[Dedup.crossDocNgramOverlap]] (per-doc distinct shingle
  * SETS — how much of a doc's vocabulary-of-shingles is shared): here
  * windows are POSITIONAL, so the same span twice in one doc is two
  * occurrences, and the per-doc output is an exact interval-union token
  * coverage, not a set fraction.
  *
  * Scale notes:
  *   - Window extraction is one scan-shaped projection (transform over the
  *     token array, no joins, no window functions); total work is linear
  *     in corpus token count — the same bound as tokenization itself.
  *   - Corpus-frequency of a span needs one distinct + one aggregate
  *     shuffle keyed on the span; the per-doc coverage join is
  *     broadcast-sized only when the duplicated-span set is small, so it
  *     is written as a plain equi-join and left to AQE.
  *   - The interval-union fold is a per-document sorted walk (lag over a
  *     doc-partitioned window): partitions are bounded by document length,
  *     never by corpus size.
  *
  * Reference behavior: the reference dedups at document granularity only
  * (`processor/src/domain/` has no substring pass); this family is part of
  * the beyond-the-reference LLM-pipeline surface.
  */
object SpanDedup {

  /** One row per positional k-token window: (doc_id, pos, span), pos
    * 1-based. Documents shorter than k tokens emit nothing.
    */
  private[graft] def positionalSpans(documents: DataFrame, k: Int): DataFrame =
    documents
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= k)
      .select(col("doc_id"), expr(
        s"""transform(sequence(1, size(toks) - ${k - 1}),
           |  i -> struct(i as pos, concat_ws(' ', slice(toks, i, $k)) as span))"""
          .stripMargin).as("ws"))
      .select(col("doc_id"), explode(col("ws")).as("w"))
      .select(col("doc_id"), col("w.pos").as("pos"), col("w.span").as("span"))

  /** Spans (exact k-token substrings) appearing in ≥2 DISTINCT documents,
    * ranked by spread: the report that tells you which boilerplate to
    * strip before training. n_docs = distinct documents containing the
    * span, n_occ = total positional occurrences (intra-doc repeats count).
    */
  def duplicateSpans(documents: DataFrame, k: Int = 6, topN: Int = 30): DataFrame =
    positionalSpans(documents, k)
      .groupBy(col("span"))
      .agg(
        countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_occ"))
      .filter(col("n_docs") >= 2)
      .orderBy(col("n_docs").desc, col("n_occ").desc, col("span"))
      .limit(topN)

  /** Per-document duplicated-token coverage: the fraction of each doc's
    * token positions covered by at least one cross-doc duplicated k-window
    * — the per-doc decision signal (drop / trim / keep) that
    * [[duplicateSpans]]'s corpus-level report cannot give. Exact interval
    * union over the sorted window starts: a window at pos after a previous
    * one at prev adds min(k, pos − prev) new tokens, so one lag pass per
    * doc computes the union length with no position explode.
    */
  def spanCoverage(documents: DataFrame, k: Int = 6): DataFrame = {
    val w = positionalSpans(documents, k)
    val dupSpans = w
      .select(col("span"), col("doc_id")).distinct()
      .groupBy(col("span")).agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= 2)
      .select(col("span"))
    val dup = w.join(dupSpans, Seq("span"))
      .select(col("doc_id"), col("pos"))
    val byPos = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val perDoc = dup
      .withColumn("prev", lag(col("pos"), 1).over(byPos))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("dup_windows"),
        sum(when(col("prev").isNull, lit(k))
          .otherwise(least(lit(k), col("pos") - col("prev"))))
          .as("covered_tokens"),
        // maximal contiguous covered runs: a window at pos extends the
        // previous run iff pos ≤ prev + k (overlap or adjacency)
        sum(when(col("prev").isNull || col("pos") - col("prev") > k, lit(1))
          .otherwise(lit(0))).as("dup_islands"))
    documents
      .select(col("doc_id"), size(split(col("text"), " ")).as("n_tokens"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        col("n_tokens").cast("bigint").as("n_tokens"),
        coalesce(col("dup_windows"), lit(0L)).as("dup_windows"),
        coalesce(col("covered_tokens"), lit(0L)).as("covered_tokens"),
        coalesce(col("dup_islands"), lit(0L)).as("dup_islands"),
        expr("coalesce(covered_tokens, 0) * 1000000 DIV n_tokens")
          .as("coverage_ppm"))
      .orderBy(col("doc_id"))
  }

  def duplicateSpansOracleSql(k: Int = 6, topN: Int = 30): String =
    s"""WITH tk AS (SELECT doc_id, string_split(text, ' ') AS toks
       |            FROM documents),
       |w AS (
       |  SELECT doc_id, unnest(list_transform(
       |    range(1, len(toks) - ${k - 2}),
       |    i -> struct_pack(pos := i,
       |      span := array_to_string(toks[i:i+${k - 1}], ' ')))) AS s
       |  FROM tk WHERE len(toks) >= $k)
       |SELECT s.span AS span,
       |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       |  CAST(count(*) AS BIGINT) AS n_occ
       |FROM w GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2
       |ORDER BY n_docs DESC, n_occ DESC, span
       |LIMIT $topN""".stripMargin

  def spanCoverageOracleSql(k: Int = 6): String =
    s"""WITH tk AS (SELECT doc_id, string_split(text, ' ') AS toks
       |            FROM documents),
       |w AS (
       |  SELECT doc_id, unnest(list_transform(
       |    range(1, len(toks) - ${k - 2}),
       |    i -> struct_pack(pos := i,
       |      span := array_to_string(toks[i:i+${k - 1}], ' ')))) AS s
       |  FROM tk WHERE len(toks) >= $k),
       |wf AS (SELECT doc_id, s.pos AS pos, s.span AS span FROM w),
       |ds AS (SELECT span FROM (SELECT DISTINCT span, doc_id FROM wf)
       |       GROUP BY span HAVING count(*) >= 2),
       |dup AS (SELECT doc_id, pos FROM wf JOIN ds USING (span)),
       |lagd AS (
       |  SELECT doc_id, pos,
       |    lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
       |  FROM dup),
       |perdoc AS (
       |  SELECT doc_id,
       |    CAST(count(*) AS BIGINT) AS dup_windows,
       |    CAST(sum(CASE WHEN prev IS NULL THEN $k
       |      ELSE least($k, pos - prev) END) AS BIGINT) AS covered_tokens,
       |    CAST(sum(CASE WHEN prev IS NULL OR pos - prev > $k
       |      THEN 1 ELSE 0 END) AS BIGINT) AS dup_islands
       |  FROM lagd GROUP BY 1)
       |SELECT d.doc_id,
       |  CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens,
       |  COALESCE(p.dup_windows, 0) AS dup_windows,
       |  COALESCE(p.covered_tokens, 0) AS covered_tokens,
       |  COALESCE(p.dup_islands, 0) AS dup_islands,
       |  COALESCE(p.covered_tokens, 0) * 1000000
       |    // len(string_split(d.text, ' ')) AS coverage_ppm
       |FROM documents d LEFT JOIN perdoc p ON d.doc_id = p.doc_id
       |ORDER BY d.doc_id""".stripMargin
}
