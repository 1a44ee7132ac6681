package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Watermark-lateness profile: for each event, how far its EVENT time
  * lags behind the maximum event time already seen in ARRIVAL order
  * (arrival = event_id, the generator's synthetic ingest order) —
  * exactly the distribution `withWatermark` delays are sized against.
  * The published histogram answers "what fraction of events would a
  * 1-minute / 5-minute / 1-hour watermark drop", which is the ONE input
  * the streaming operators here ([[graft.streaming.StreamingAgg]]'s
  * grace window, the dedup-within-watermark TTL) otherwise take on
  * faith.
  *
  * Distributed shape — a two-level prefix-max scan, the classic
  * work-efficient formulation: arrival is chunked (event_id DIV chunk),
  * each chunk computes its local max in one keyed aggregate, the chunk
  * frame (n/chunk rows) takes a running max in one pass, and each event
  * then needs only its in-chunk prefix max (partition-local window) and
  * the PREVIOUS chunk's carry — no global-order window over the data
  * ever exists. Deeper hierarchies generalize the same two joins to
  * log levels; at 10^4 rows per chunk one level of carry frame per
  * 100 TB shard is already tiny.
  *
  * Exactness: all micros integers; band edges are integer literals.
  */
object Lateness {

  def watermarkLateness(events: DataFrame): DataFrame = {
    // The harness generator emits events already time-sorted, so the raw
    // stream has zero disorder and the profile is vacuous. Arrival is
    // therefore modeled as event time + a deterministic per-event ingest
    // delay of (mix64(event_id) & 1023) seconds — the reproducible
    // stand-in for network/queue jitter (same seeded-disorder discipline
    // as the generator itself; the oracle replays the identical splitmix
    // draw, and 1024 | 2^64 keeps the signed/unsigned views aligned).
    // Chunks are ARRIVAL hours: the carry frame is bounded by the time
    // domain, not the data.
    val base = events.select(col("event_id"),
      unix_micros(col("ts")).as("tus"))
      .withColumn("arr",
        col("tus") + graft.functions.GraftColumns.mix64(col("event_id"))
          .bitwiseAND(lit(1023L)) * lit(1000000L))
      .withColumn("ck", expr("arr DIV 3600000000"))
    val chunkMax = base.groupBy(col("ck")).agg(max(col("tus")).as("cmax"))
    // running max over the CHUNK frame (n/chunk rows — metadata-sized,
    // so the global-order windows here are over the carry frame only)
    val carry = chunkMax
      .withColumn("runc",
        max(col("cmax")).over(Window.orderBy(col("ck"))
          .rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("carry_in",
        lag(col("runc"), 1).over(Window.orderBy(col("ck"))))
      .select(col("ck"), col("carry_in"))
    val inChunk = Window.partitionBy(col("ck"))
      .orderBy(col("arr"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val late = base
      .join(broadcast(carry), Seq("ck"))
      .withColumn("runmax",
        greatest(coalesce(col("carry_in"), lit(Long.MinValue)),
          max(col("tus")).over(inChunk)))
      .select((col("runmax") - col("tus")).as("late_us"))
    val band = when(col("late_us") <= 0L, "a_on_time")
      .when(col("late_us") < 60L * 1000000L, "b_under_1m")
      .when(col("late_us") < 300L * 1000000L, "c_under_5m")
      .when(col("late_us") < 3600L * 1000000L, "d_under_1h")
      .otherwise("e_over_1h")
    val tot = late.agg(count(lit(1)).as("n_total"),
      max(col("late_us")).as("max_late_us"))
    late.groupBy(band.as("band"))
      .agg(count(lit(1)).as("n_events"))
      .crossJoin(broadcast(tot))
      .select(col("band"), col("n_events"),
        expr("n_events * 1000000 DIV n_total").as("share_ppm"),
        col("max_late_us"))
      .orderBy(col("band"))
  }

  def watermarkLatenessOracleSql: String =
    s"""WITH z AS (
       |  SELECT event_id, epoch_us(ts) AS tus,
       |    ((event_id::HUGEINT) + 11400714819323198485::HUGEINT)
       |      % 18446744073709551616::HUGEINT AS z0
       |  FROM events),
       |${graft.SketchOracles.mixChain("wl", "z", Seq("event_id", "tus"), "z0")},
       |base AS (
       |  SELECT event_id, tus,
       |    tus + CAST(mx % 1024 AS BIGINT) * 1000000 AS arr
       |  FROM wl4),
       |rm AS (
       |  SELECT tus,
       |    max(tus) OVER (ORDER BY arr, event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS runmax
       |  FROM base),
       |late AS (SELECT runmax - tus AS late_us FROM rm),
       |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total,
       |          CAST(max(late_us) AS BIGINT) AS max_late_us FROM late),
       |banded AS (
       |  SELECT CASE WHEN late_us <= 0 THEN 'a_on_time'
       |    WHEN late_us < 60000000 THEN 'b_under_1m'
       |    WHEN late_us < 300000000 THEN 'c_under_5m'
       |    WHEN late_us < 3600000000 THEN 'd_under_1h'
       |    ELSE 'e_over_1h' END AS band
       |  FROM late)
       |SELECT band, CAST(count(*) AS BIGINT) AS n_events,
       |  CAST(count(*) * 1000000 // (SELECT n_total FROM tot) AS BIGINT)
       |    AS share_ppm,
       |  (SELECT max_late_us FROM tot) AS max_late_us
       |FROM banded GROUP BY band
       |ORDER BY band""".stripMargin
}
