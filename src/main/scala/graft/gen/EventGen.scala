package graft.gen

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthetic event generation as pure DataFrame expressions (reference:
  * producer/src/domain/event_generator.py:33-61 — uniform user pool, uniform
  * event-type enum, conditional optional fields).
  *
  * Batch: `spark.range(n)` + splitmix64 streams over the row id — fully
  * distributed, no driver loop, reproducible via the seed AND invariant to
  * partitioning (see [[EventGen.batch]]; do NOT add rand()-based columns —
  * they seed per partition and break the oracle-replayability contract
  * gen_events_audit depends on). Streaming: the `rate` source with the
  * same projection. Used to fabricate test fixtures at arbitrary scale
  * (never to replace the harness tables, which stay canonical for oracles).
  */
object EventGen {

  val eventTypes: Seq[String] = Seq("view", "click", "purchase", "signup", "error")

  /** `n` events spread uniformly over `days` days from `startDate`, user ids
    * uniform in [0, userPool). Deterministic for a fixed seed AND invariant
    * to physical partitioning: every column derives from the splitmix64
    * family over the row id (`rand(seed)` seeds per PARTITION, so the old
    * formulation changed values under repartition — and was inherently
    * un-emulatable by the DuckDB oracle; mix64 streams are both stable and
    * replayed bit-exactly by SketchOracles' HUGEINT emitter). Column k's
    * stream input is id*8 + k + (seed << 40): disjoint across columns and
    * across seeds for any n < 2^37.
    */
  def batch(
      spark: SparkSession,
      n: Long,
      userPool: Int = 150,
      days: Int = 30,
      startDate: String = "2024-01-01",
      seed: Long = 42L): DataFrame = {
    import graft.functions.GraftColumns.mix64
    val typeArr = array(eventTypes.map(lit): _*)
    def uni(k: Int) = // 53-bit uniform integer stream for column k
      shiftrightunsigned(mix64(col("id") * 8 + lit((seed << 40) + k)), 11)
    spark.range(n).select(
      col("id").as("event_id"),
      timestamp_seconds(
        unix_timestamp(to_timestamp(lit(s"$startDate 00:00:00"))) +
          uni(0) % (days * 86400L)).as("ts"),
      (uni(1) % userPool).as("user_id"),
      element_at(typeArr, ((uni(2) % eventTypes.size) + 1).cast("int"))
        .as("event_type"),
      round(uni(3).cast("double") / lit(9007199254740992.0) * 200.0, 2).as("value"),
      concat(lit("""{"k": """), (uni(4) % 100).cast("int"), lit("}"))
        .as("props"))
  }

  /** Streaming variant over the rate source (rowsPerSecond events/s), same
    * column derivations keyed off the rate source's `value` counter.
    */
  def stream(spark: SparkSession, rowsPerSecond: Int = 100, userPool: Int = 150): DataFrame = {
    val typeArr = array(eventTypes.map(lit): _*)
    spark.readStream
      .format("rate")
      .option("rowsPerSecond", rowsPerSecond)
      .load()
      .select(
        col("value").as("event_id"),
        col("timestamp").as("ts"),
        pmod(col("value"), lit(userPool.toLong)).as("user_id"),
        element_at(typeArr, (pmod(col("value"), lit(eventTypes.size.toLong)) + 1).cast("int"))
          .as("event_type"),
        round(pmod(col("value") * 7919L, lit(20000L)) / 100.0, 2).as("value"),
        lit("""{"k": 0}""").as("props"))
  }
}
