package graft.operators

import graft.functions.GraftColumns
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-document n-gram NOVELTY against everything ingested before it —
  * the crawl-freshness / incremental-value profile a data-acquisition
  * pipeline tracks per batch: of the distinct word k-grams a document
  * contains, how many appear in NO earlier document (doc_id order = the
  * ingestion timeline, the same convention the repo's evolution queries
  * use)? A near-duplicate of earlier content scores ~0; genuinely new
  * text scores ~10⁶. This is the n-gram-granular complement of
  * [[Dedup]]'s doc-level incremental anti-join: it does not just flag a
  * repeat, it MEASURES how much of each arriving document is repeat.
  *
  * First-occurrence attribution is one min() window per shingle key:
  * a shingle is novel in exactly the doc that carries the corpus-wide
  * minimum doc_id for it. The fraction is emitted as an exact micros
  * quotient — no float.
  *
  * Distributed shape: one codegen'd shingle pass per row
  * ([[graft.functions.Expressions WordShingles]] — distinct k-grams
  * already deduped per doc inside the expression), exploded to
  * (doc_id, xxhash64(shingle)) — 8-byte shuffle keys, never shingle
  * strings (the [[SpanDedup]] discipline); the min-doc window partitions
  * by shingle hash (fan-out bounded by per-shingle df, the same key the
  * dedup ops shuffle on), then one map-side-combined per-doc count. The
  * DuckDB oracle groups the shingle STRINGS — agreement certifies the
  * hash path collision-free at tested scale (64-bit keys: expected
  * collisions ≪ 1 below ~10⁹ distinct shingles; beyond that pair the
  * hash with a second independent 64-bit family).
  */
object Novelty {

  def ngramNovelty(documents: DataFrame, k: Int = 5): DataFrame = {
    val sh = documents
      .select(col("doc_id"),
        explode(GraftColumns.wordShingles(col("text"), k)).as("s"))
      .select(col("doc_id"), xxhash64(col("s")).as("h"))
    sh
      .withColumn("first_doc",
        min(col("doc_id")).over(Window.partitionBy(col("h"))))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_shingles"),
        sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L))
          .as("n_novel"))
      .withColumn("novelty_micros",
        expr("n_novel * 1000000 DIV n_shingles"))
      .orderBy(col("doc_id"))
  }

  def ngramNoveltyOracleSql(k: Int = 5): String = {
    val parts = (0 until k)
      .map(j => s"string_split(text, ' ')[i+$j]").mkString(", ")
    s"""WITH sh AS (
       |  SELECT DISTINCT doc_id, s FROM (
       |    SELECT doc_id,
       |      unnest(list_transform(
       |        range(1, len(string_split(text, ' ')) - ${k - 2}),
       |        i -> concat_ws(' ', $parts))) AS s
       |    FROM documents)),
       |fd AS (SELECT doc_id, s,
       |    min(doc_id) OVER (PARTITION BY s) AS first_doc
       |  FROM sh)
       |SELECT doc_id,
       |  CAST(count(*) AS BIGINT) AS n_shingles,
       |  CAST(sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_novel,
       |  CAST(sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END)
       |    * 1000000 // count(*) AS BIGINT) AS novelty_micros
       |FROM fd GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }
}
