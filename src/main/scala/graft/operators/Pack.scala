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
}
