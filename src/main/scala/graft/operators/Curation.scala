package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The end-to-end curation funnel — the reference pipeline's PURPOSE
  * expressed as one auditable query: ingest → language-ID gate → quality
  * gate → exact dedup → cross-doc span dedup → mixture sample, with
  * per-stage document and token counts. Every stage applies to the
  * PREVIOUS stage's survivors, so the output reads as the loss curve a
  * curation run reports before training.
  *
  * Each stage reuses the already-oracled primitive (langId's marker argmax,
  * docStats' quality score, md5 keep-lowest-id, crossDocNgramOverlap's
  * shared fraction, the fnv+mix64 content-keyed mixture gate), and the
  * whole funnel has a single machine-generated DuckDB oracle
  * (graft.SketchOracles.funnelSql) that chains the same stages as CTEs.
  *
  * Scale shape: a linear pipeline of the component shapes — per-row gates
  * (lang, quality, sample), one 16-byte-digest window (exact dedup), and
  * the pair-free shingle-df join (span dedup). Six aggregate rows out.
  */
object Curation {

  /** Quality score column — MUST stay aligned with TextAnalysis.docStats
    * (and its oracle fragment): length, lexical diversity, stopword mass.
    */
  private[graft] def qualityScore(toks: Column, stopwords: Seq[String]): Column = {
    val tokenCount = size(toks).cast("long")
    val distinctTokens = size(array_distinct(toks)).cast("long")
    val stopCount = size(filter(toks, t => t.isin(stopwords: _*))).cast("long")
    least(tokenCount / lit(50.0), lit(1.0)) * lit(0.5) +
      (distinctTokens / tokenCount) * lit(0.3) +
      (stopCount / tokenCount) * lit(0.2)
  }

  /** Language prediction column — MUST stay aligned with
    * TextAnalysis.langId's marker-count argmax and priority order.
    */
  private[graft] def langPred(toks: Column): Column = {
    def hits(lang: String): Column =
      size(filter(toks, t =>
        t.isin(graft.functions.TextAnalysis.langMarkers(lang): _*))).cast("long")
    val (en, de, fr, es) = (hits("en"), hits("de"), hits("fr"), hits("es"))
    when(en > 0 && en >= de && en >= fr && en >= es, "en")
      .when(de > 0 && de >= fr && de >= es, "de")
      .when(fr > 0 && fr >= es, "fr")
      .when(es > 0, "es")
      .otherwise("und")
  }

  def funnel(
      documents: DataFrame,
      stopwords: Seq[String],
      qualityMin: Double = 0.5,
      spanMax: Double = 0.95,
      rates: Map[String, Double] = Mixture.DriverRates,
      defaultRate: Double = Mixture.DriverDefaultRate): DataFrame = {
    val toks = split(col("text"), " ")
    def stage(df: DataFrame, id: Int, name: String): DataFrame =
      df.agg(
          count(lit(1)).as("docs"),
          coalesce(sum(size(toks).cast("long")), lit(0L)).as("tokens"))
        .select(lit(id).as("stage_id"), lit(name).as("stage"),
          col("docs"), col("tokens"))

    val d0 = documents
    val d1 = d0.filter(langPred(toks) =!= "und")
    val d2 = d1.filter(qualityScore(toks, stopwords) >= qualityMin)
    // exact dedup: keep the lowest doc_id of every identical-content group
    val d3 = d2
      .withColumn("keeper", min(col("doc_id")).over(Window.partitionBy(md5(col("text")))))
      .filter(col("doc_id") === col("keeper"))
      .drop("keeper")
    // span dedup among the exact survivors; docs below the shingle width
    // have no overlap row — treated as fraction 0 (kept)
    val frac = Dedup.crossDocNgramOverlap(d3)
      .select(col("doc_id"), col("shared_fraction"))
    val d4 = d3.join(frac, Seq("doc_id"), "left")
      .filter(coalesce(col("shared_fraction"), lit(0.0)) <= spanMax)
      .drop("shared_fraction")
    val d5 = d4.filter(
      Mixture.textUniform(col("text")) < Mixture.rateFor(col("source"), rates, defaultRate))

    stage(d0, 0, "ingested")
      .union(stage(d1, 1, "lang_id"))
      .union(stage(d2, 2, "quality"))
      .union(stage(d3, 3, "exact_dedup"))
      .union(stage(d4, 4, "span_dedup"))
      .union(stage(d5, 5, "sampled"))
      .orderBy(col("stage_id"))
  }
}
