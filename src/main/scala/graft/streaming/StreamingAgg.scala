package graft.streaming

import graft.operators.Upsert
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import scala.collection.mutable

/** Structured Streaming parity for the reference's write path (SURVEY.md
  * §3.1): Kafka-consume loop + in-memory window dict + periodic flush,
  * re-expressed as readStream → window agg → foreachBatch upsert.
  *
  * Semantics mapping (reference file:line per SURVEY.md §2.3):
  *   - O9 grace period: `withWatermark(ts, 1h + grace)` — event-time rather
  *     than the reference's processing-time clock (documented divergence,
  *     SURVEY.md §2.7; for now()-stamped streams they coincide).
  *   - O10 60 s flush cadence: `Trigger.ProcessingTime("60 seconds")`.
  *   - O14 idempotent upsert: last-write-wins merge per (window_start,
  *     event_type) in foreachBatch — at-least-once replay is safe.
  *   - O4/O5 exact distinct: streaming aggregation can't plan
  *     `countDistinct`, so [[ExactDistinctLong]] (a typed Aggregator UDAF)
  *     accumulates the exact set single-pass, matching the reference's
  *     materialized `set` semantics (aggregation.py:16-17). At reference
  *     cardinalities (user pool <= 1000/window) the state is tiny; for
  *     unbounded domains swap in approx_count_distinct.
  */
object StreamingAgg {

  /** Exact COUNT(DISTINCT <long col>) as a single-pass typed Aggregator —
    * usable in streaming aggregations where Spark's planner rejects
    * countDistinct.
    */
  class ExactDistinctLong extends Aggregator[Long, mutable.HashSet[Long], Long] {
    override def zero: mutable.HashSet[Long] = mutable.HashSet.empty
    override def reduce(b: mutable.HashSet[Long], a: Long): mutable.HashSet[Long] = { b += a; b }
    override def merge(b1: mutable.HashSet[Long], b2: mutable.HashSet[Long]): mutable.HashSet[Long] = { b1 ++= b2; b1 }
    override def finish(r: mutable.HashSet[Long]): Long = r.size.toLong
    override def bufferEncoder = org.apache.spark.sql.Encoders.kryo[mutable.HashSet[Long]]
    override def outputEncoder = org.apache.spark.sql.Encoders.scalaLong
  }

  def registerExactDistinct(spark: SparkSession): Unit =
    spark.udf.register("exact_distinct_long", udaf(new ExactDistinctLong))

  /** The streaming hourly aggregation: same measure set as the batch
    * [[graft.operators.HourlyAggregation]], over a streaming `events` frame.
    * `grace` mirrors GRACE_PERIOD_SECONDS (default 60 s).
    */
  def hourlyAggStream(spark: SparkSession, events: DataFrame, grace: String = "60 seconds"): DataFrame = {
    registerExactDistinct(spark)
    events
      .withWatermark("ts", s"1 hour $grace")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("event_count"),
        expr("exact_distinct_long(user_id)").as("unique_user_count"),
        round(sum(col("value")), 2).as("total_value"),
        (round(sum(col("value")), 2) / count(col("value"))).as("avg_value"))
      .select(
        col("w.start").as("window_start"), col("w.end").as("window_end"),
        col("event_type"), col("event_count"), col("unique_user_count"),
        col("total_value"), col("avg_value"))
  }

  /** foreachBatch sink body: last-write-wins upsert of a micro-batch into a
    * parquet target keyed by (window_start, event_type) — the relational
    * equivalent of the reference's `INSERT ... ON CONFLICT DO UPDATE`
    * (upsert_aggregation.sql:1-19). On a lakehouse table this would be a
    * single `MERGE INTO`; over plain parquet we rewrite the (tiny) aggregate
    * table — correct because the aggregate cardinality is bounded by
    * hours x event_types, not by event volume.
    */
  def upsertBatch(spark: SparkSession, batch: DataFrame, targetDir: String, batchId: Long): Unit = {
    val target = new java.io.File(targetDir)
    val old = new java.io.File(targetDir + "_old")
    // Crash recovery: a previous swap may have died between the two renames,
    // leaving the accumulated table at _old and no target.
    val existingDir =
      if (target.exists()) Some(targetDir)
      else if (old.exists()) Some(targetDir + "_old")
      else None

    val stamped = batch.withColumn("created_at", lit(batchId))
    val merged = existingDir match {
      case Some(dir) =>
        Upsert.lastWriteWins(
          spark.read.parquet(dir).unionByName(stamped),
          keys = Seq("window_start", "event_type"),
          version = Seq(col("created_at")))
      case None => stamped
    }
    val tmp = targetDir + "_tmp"
    merged.coalesce(1).write.mode("overwrite").parquet(tmp)
    // Swap keeps the prior state on disk until the new one is in place:
    // target -> _old, _tmp -> target, then drop _old. A crash at any point
    // leaves either target or _old readable — never silent loss.
    if (old.exists()) deleteRecursively(old)
    if (target.exists() && !target.renameTo(old))
      throw new java.io.IOException(s"upsertBatch: failed to stage $targetDir aside")
    if (!new java.io.File(tmp).renameTo(target))
      throw new java.io.IOException(
        s"upsertBatch: failed to publish batch $batchId to $targetDir")
    if (old.exists()) deleteRecursively(old)
  }

  /** Throwing recursive delete — a silently-failed swap would drop the
    * micro-batch and break the effectively-once contract.
    */
  private def deleteRecursively(f: java.io.File): Unit = {
    val children = f.listFiles()
    if (children != null) children.foreach(deleteRecursively)
    if (!f.delete())
      throw new java.io.IOException(s"upsertBatch: could not delete $f")
  }
}
