package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the harness parquet tables (TESTDATA.md).
  *
  * All queries receive a scale-factor directory and read through here, so
  * schema normalization (e.g. nanosecond parquet timestamps) lives in one
  * place. At cluster scale these reads are plain columnar parquet scans:
  * Catalyst pushes filters/projections down into them, so no caching or
  * materialization happens at this layer.
  */
object Tables {
  private def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // The harness parquet stores naive timestamps (isAdjustedToUTC=false,
    // micros since the 2026-08-13 regeneration), which Spark 4 would infer
    // as TIMESTAMP_NTZ by default. Read them as session-TZ TIMESTAMP
    // instead: every session here pins UTC, so the instant is identical,
    // downstream code keeps the TIMESTAMP type it was written against
    // (unix_micros, getAs[java.sql.Timestamp], window()), and DuckDB's
    // naive reading of the same files stays value-aligned.
    // Set per-load, not at session build: the DRIVER constructs its own
    // SparkSession and calls SparkEntry.queries directly — this loader is
    // the only seam the library controls (same reason the nanos conf
    // below lives here). Re-setting an unchanged conf is a no-op.
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    spark.read.parquet(s"$dir/$name.parquet")
  }

  /** `events` — the stream-shaped fact table (reference: UserActivityEvent,
    * utils/domain/events.py:7-18). Harness schema: event_id long, ts
    * timestamp[ns], user_id long, event_type string, value double, props
    * string(JSON). Parquet TIMESTAMP(NANOS) is not a Spark-native type; if
    * the session reads it as raw long nanos we convert to a microsecond
    * timestamp (matching DuckDB's own nanos->micros truncation).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = load(spark, dir, "events")
    df.schema("ts").dataType match {
      case LongType =>
        // Integer division — epoch nanos (~1.7e18) overflow a double's
        // 53-bit mantissa, so `/` (double division) would corrupt the micros.
        df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case _ => df
    }
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
