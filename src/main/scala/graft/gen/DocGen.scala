package graft.gen

import graft.functions.GraftColumns
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthetic document / embedding generation as pure DataFrame expressions,
  * mirroring the harness tables' schemas (`TESTDATA.md`: documents =
  * doc_id/text/lang/source/n_chars, embeddings = vec_id/embedding/label) so
  * the dedup/LSH/ANN/sketch operators can be cost-curved at arbitrary row
  * counts (SCALING.md evidence — never a replacement for the canonical
  * harness tables the oracles run on).
  *
  * Fully distributed: `spark.range(n)` + the same splitmix64 mix the
  * engine's sketches use ([[graft.functions.Mix64]], native, wrap-safe
  * under ANSI) — no driver loop, reproducible for a fixed seed, and stable
  * under repartitioning (unlike `rand`, which is only fixed per partition
  * layout).
  */
object DocGen {

  /** Same flavor of corpus vocabulary as the harness generator's docs. */
  val vocab: Seq[String] = Seq(
    "batch", "part", "spark", "line", "column", "order", "small", "sort",
    "fast", "value", "scan", "hash", "slow", "group", "agg", "filter",
    "query", "big", "key", "window", "row", "table", "stream", "merge",
    "data", "join", "shuffle", "cache", "plan", "stage", "task", "skew")

  private val langs = Seq("en", "de", "fr", "es", "zh")

  private def pick(arr: Column, h: Column): Column =
    element_at(arr, (pmod(GraftColumns.mix64(h), lit(vocab.size.toLong)) + 1).cast("int"))

  /** `n` documents in near-duplicate groups of `groupSize`: all members of a
    * group share the same `tokens`-token base text and differ only in their
    * final token, so MinHash/SimHash banding has real collisions to find
    * (Jaccard within a group ≈ (tokens-k)/(tokens+k) — well above the 0.5
    * default threshold at the defaults) while cross-group texts are
    * hash-independent.
    */
  def documents(
      spark: SparkSession,
      n: Long,
      groupSize: Int = 8,
      sources: Int = 20,
      tokens: Int = 40,
      seed: Long = 42L): DataFrame = {
    val vocabArr = array(vocab.map(lit): _*)
    val g = expr(s"id DIV $groupSize")
    val body = (0 until tokens - 1).map(p =>
      pick(vocabArr, g * lit(tokens.toLong) + lit(p.toLong) + lit(seed)))
    val tail = pick(vocabArr, col("id") + lit(seed * 7919L))
    spark.range(n).select(
      col("id").as("doc_id"),
      concat_ws(" ", body :+ tail: _*).as("text"),
      element_at(array(langs.map(lit): _*),
        (pmod(GraftColumns.mix64(g + lit(seed + 1)), lit(langs.size.toLong)) + 1).cast("int"))
        .as("lang"),
      concat(lit("src"), pmod(col("id"), lit(sources.toLong))).as("source"))
      .withColumn("n_chars", length(col("text")))
  }

  /** `n` embeddings of dimension `dim` in `clusters` planted clusters:
    * element d = unit-scale splitmix64 noise + a +2.0 offset on the
    * coordinates congruent to the row's cluster id, so IVF's k-means has
    * real structure to recover and LSH buckets are non-degenerate.
    */
  def embeddings(
      spark: SparkSession,
      n: Long,
      dim: Int = 64,
      clusters: Int = 16,
      seed: Long = 42L): DataFrame = {
    val label = pmod(col("id"), lit(clusters.toLong))
    val elems = (0 until dim).map { d =>
      (GraftColumns.mix64(col("id") * lit(dim.toLong) + lit(d.toLong) + lit(seed))
        .cast("double") / lit(Long.MaxValue.toDouble)
        + when(label === lit((d % clusters).toLong), lit(2.0)).otherwise(lit(0.0)))
        .cast("float")
    }
    spark.range(n).select(
      col("id").as("vec_id"),
      array(elems: _*).as("embedding"),
      label.cast("int").as("label"))
  }
}
