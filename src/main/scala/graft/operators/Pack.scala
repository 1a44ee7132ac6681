package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training-data preparation: assign every document a
  * position in a fixed-capacity token stream (the "concatenate then chunk
  * every `capacity` tokens" scheme GPT-style pipelines use to fill context
  * windows — each chunk is `capacity` tokens of concatenated documents;
  * a document belongs to the chunk its FIRST token falls in).
  *
  * A single global concatenation order is a sequential recurrence — one
  * task, no matter the cluster. The scalable shape shards first: each doc
  * lands in one of `shards` independent streams by a splitmix64 hash of
  * its id (layout-independent, skew-proof — NOT `doc_id % shards`, which
  * inherits whatever structure ids have), and the running token offset is
  * a window cumsum per shard, ordered by doc_id. At 100 TB that is one
  * shuffle on a uniform key + `shards`-way parallel sequential scans;
  * `shards` scales with the cluster (32 here to match local[32]), and the
  * chunk stream within a shard is deterministic regardless of input
  * partitioning.
  *
  * Emits per doc: its shard, whitespace token count (the same
  * [[graft.functions.TextAnalysis.wsTokenCount]] every other query uses),
  * the start offset in the shard's token stream, the chunk it starts in,
  * and whether it straddles a chunk boundary (training pipelines count
  * straddlers to size the attention-mask waste of packing).
  */
object Pack {

  def chunkAssignments(
      documents: DataFrame, capacity: Int = 2048, shards: Int = 32): DataFrame = {
    require(capacity > 0 && shards > 0 && (shards & (shards - 1)) == 0,
      "shards must be a positive power of two (unsigned-mod == pmod contract)")
    val tokens = graft.functions.TextAnalysis.wsTokenCount(col("text"))
    // power-of-two shard counts keep pmod == low-bits == the oracle's
    // unsigned `% shards` (any positive count works for the engine; the
    // DuckDB mirror relies on shards dividing 2^64)
    val shard = pmod(
      graft.functions.GraftColumns.mix64(col("doc_id")), lit(shards.toLong))
      .cast("int")
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    documents
      .select(col("doc_id"), shard.as("shard"), tokens.as("tokens"))
      .withColumn("start_offset", sum(col("tokens")).over(w) - col("tokens"))
      // integer DIV, never `/` (double division corrupts large offsets)
      .withColumn("chunk_id", expr(s"start_offset DIV $capacity"))
      .withColumn("straddles",
        pmod(col("start_offset"), lit(capacity.toLong)) + col("tokens") > capacity)
      .orderBy(col("doc_id"))
  }

  /** Composed training-batch MANIFEST — the output-side pipeline a data
    * loader consumes, three already-oracled primitives in one plan:
    * rendezvous (HRW) CONTENT sharding ([[Mixture.rendezvousShards]]'s
    * pick — stable under doc-id reassignment and minimal-movement under
    * shard growth, unlike the id-hash sharding of [[chunkAssignments]]),
    * the per-shard concatenate-then-chunk token stream (the
    * [[graft.functions.TextAnalysis.tokenPackBins]] interval fold), and
    * a per-(shard, bin) rollup: how many docs touch the bin, how many
    * START in it (attention-mask segments), the exact fill, and the
    * first starting doc (the loader's seek key; NULL for pure
    * continuation bins, emitted as -1).
    *
    * Scale: one |shards|-candidate in-row argmax per doc (map-only),
    * one shuffle on the uniform shard key, per-shard window cumsum,
    * bin-bounded explode (a doc adds O(tokens / binTokens) rows), one
    * aggregate. No driver-side data.
    */
  def trainingBatchManifest(
      documents: DataFrame, binTokens: Int = 2048,
      shards: Int = 32): DataFrame = {
    require(binTokens > 0 && shards > 0)
    import graft.functions.GraftColumns
    val h = GraftColumns.fnv1a64(col("text"))
    // HRW pick, identical tie rule to Mixture.rendezvousShards: max
    // weight, ties to the SMALLEST shard id (struct max of (w, -s))
    val cand = transform(
      sequence(lit(0L), lit(shards.toLong - 1)),
      s => struct(GraftColumns.mix64(h.bitwiseXOR(s)).as("w"), (-s).as("ns")))
    val shard = element_at(array_sort(cand), -1).getField("ns") * -1
    val base = documents
      .select(col("doc_id"),
        graft.functions.TextAnalysis.wsTokenCount(col("text")).as("tokens"),
        shard.as("shard"))
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val spans = base
      .withColumn("cum", sum(col("tokens")).over(w))
      .withColumn("first_tok", col("cum") - col("tokens"))
      .withColumn("last_tok", col("cum") - 1)
    spans
      .withColumn("bin", explode(sequence(
        expr(s"first_tok DIV $binTokens"), expr(s"last_tok DIV $binTokens"))))
      .groupBy(col("shard"), col("bin"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(expr(s"first_tok DIV $binTokens") === col("bin"), 1L)
          .otherwise(0L)).as("n_starting"),
        sum(
          least(col("last_tok"), (col("bin") + 1) * binTokens - 1) -
            greatest(col("first_tok"), col("bin") * binTokens) + 1
        ).as("fill_tokens"),
        coalesce(
          min(when(expr(s"first_tok DIV $binTokens") === col("bin"),
            col("doc_id"))), lit(-1L)).as("first_doc"))
      .orderBy(col("shard"), col("bin"))
  }
}
