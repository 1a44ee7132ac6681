package graft

import java.sql.Timestamp
import graft.operators.Privacy
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The LDP randomized-response mechanism is a stateless per-row scalar
  * plus a keyed counting aggregate — exactly the shape Structured
  * Streaming handles natively. This spec pins the BATCH = STREAMING
  * parity contract: the same mechanism applied in a streaming query
  * (complete mode over the per-day aggregate) yields bit-identical
  * counts and the identical debiased estimator.
  */
class StreamingLdpSpec extends SparkTestBase {
  import spark.implicits._

  private def ev(id: Long, t: String, typ: String) =
    Ev(id, Timestamp.valueOf(t), id % 7, typ, 1.0)

  test("streaming randomized response matches the batch operator exactly") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val events = (0L until 150L).map { i =>
      val day = if (i % 3 == 0) "2024-03-01" else "2024-03-02"
      ev(i, s"$day 0${(i % 9) + 1}:30:00",
        if (i % 4 == 0) "purchase" else "click")
    }
    // two arrival batches: the mechanism must not depend on batching
    mem.addData(events.take(70): _*)

    import graft.functions.GraftColumns.mix64
    val b = when(col("event_type") === "purchase", 1L).otherwise(0L)
    val flip = pmod(
      mix64(mix64(col("event_id")).bitwiseXOR(lit(Privacy.LdpSeed))),
      lit(4L)) === 0L
    val rep = when(flip, lit(1L) - b).otherwise(b)
    val agg = mem.toDF()
      .select(date_trunc("day", col("ts")).as("day"),
        b.as("b"), rep.as("rep"))
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("b")).as("n_true"),
        sum(col("rep")).as("n_reported"))
    val q = agg.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName("ldp_stream_out")
      .start()
    try {
      q.processAllAvailable()
      mem.addData(events.drop(70): _*)
      q.processAllAvailable()
      val streamed = spark.table("ldp_stream_out")
        .withColumn("est_num",
          lit(4L) * col("n_reported") - col("n_events"))
        .withColumn("est_micros", col("est_num") * lit(500000L))
        .collect()
        .map(r => r.getTimestamp(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(5))))
        .toMap
      val batch = Privacy.ldpRandomizedResponse(events.toDF())
        .collect()
        .map(r => r.getTimestamp(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3),
            r.getAs[Long]("est_micros"))))
        .toMap
      assert(streamed == batch)
      assert(batch.size == 2)
    } finally q.stop()
  }
}
