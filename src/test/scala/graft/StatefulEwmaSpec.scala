package graft

import java.sql.Timestamp

import graft.streaming.StatefulEwma
import graft.streaming.StatefulEwma.{EwmaPoint, HourCount}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming EWMA monitor: cross-batch state continuation, replay
  * idempotence, and bit-identical parity with the batch chart's fold.
  */
class StatefulEwmaSpec extends SparkTestBase {
  import spark.implicits._

  private def hourTs(h: Int): Timestamp = Timestamp.valueOf(
    java.time.LocalDateTime.of(2024, 1, 1, 0, 0).plusHours(h.toLong))

  test("streaming levels are bit-identical to the batch fold across batches") {
    implicit val sqlCtx = spark.sqlContext
    // Batch reference: events at 10/hour for 6 hours then 30/hour, one type.
    val counts = Seq.fill(6)(10L) ++ Seq.fill(6)(30L)
    val events = counts.zipWithIndex.flatMap { case (n, h) =>
      (0L until n).map(i => (h * 1000 + i, hourTs(h), i, "click", 1.0, "{}"))
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val batch = graft.operators.Changepoint
      .ewmaAnomalies(events, baselineEnd = hourTs(6).toString)
      .collect()
      .map(r => (r.getTimestamp(1), r.getDouble(3))).toMap

    // Streaming: the same hourly series in three micro-batches, seeded at
    // the batch baseline mean (10.0), out-of-order WITHIN a batch.
    val mem = MemoryStream[HourCount]
    val q = StatefulEwma.monitor(spark, mem.toDS(), Map("click" -> 10.0))
      .writeStream.outputMode("append").format("memory")
      .queryName("ewma_stream").start()
    try {
      mem.addData((0 until 4).map(h => HourCount("click", hourTs(h), counts(h))))
      q.processAllAvailable()
      // batch 2 arrives out of order within the batch; the sort fixes it
      mem.addData(Seq(7, 5, 4, 6).map(h => HourCount("click", hourTs(h), counts(h))))
      q.processAllAvailable()
      mem.addData((8 until 12).map(h => HourCount("click", hourTs(h), counts(h))))
      q.processAllAvailable()
      val got = spark.table("ewma_stream").as[EwmaPoint].collect()
      assert(got.length == 12)
      got.foreach { p =>
        // round(4) matches the batch chart's emitted grid; the raw fold is
        // the same IEEE sequence so even the raw doubles agree
        assert(p.ewma == batch(p.window_start) ||
          math.rint(p.ewma * 1e4) / 1e4 == batch(p.window_start),
          s"$p vs ${batch(p.window_start)}")
      }
    } finally q.stop()
  }

  test("replayed or stale hours are dropped, not folded twice") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[HourCount]
    val q = StatefulEwma.monitor(spark, mem.toDS(), Map("click" -> 0.0))
      .writeStream.outputMode("append").format("memory")
      .queryName("ewma_replay").start()
    try {
      mem.addData(Seq(HourCount("click", hourTs(0), 8L),
        HourCount("click", hourTs(1), 8L)))
      q.processAllAvailable()
      // replay hour 1 and a stale hour 0 — both must be ignored
      mem.addData(Seq(HourCount("click", hourTs(1), 999L),
        HourCount("click", hourTs(0), 999L),
        HourCount("click", hourTs(2), 8L)))
      q.processAllAvailable()
      val got = spark.table("ewma_replay").as[EwmaPoint].collect()
        .sortBy(_.window_start.getTime)
      assert(got.length == 3)
      assert(got.forall(_.x == 8L))
      // monotone convergence toward 8 from seed 0: 2, 3.5, 4.625
      assert(got.map(_.ewma).toSeq == Seq(2.0, 3.5, 4.625))
    } finally q.stop()
  }
}
