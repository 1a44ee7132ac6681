package graft

import java.sql.Timestamp

import graft.streaming.{StatefulEwma, StatefulPageHinkley}
import graft.streaming.StatefulEwma.HourCount
import graft.streaming.StatefulPageHinkley.PhPoint
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming PH monitor: bit-identical parity with the batch walk,
  * cross-batch state continuation, replay idempotence.
  */
class StatefulPageHinkleySpec extends SparkTestBase {
  import spark.implicits._

  private def hourTs(h: Int): Timestamp = Timestamp.valueOf(
    java.time.LocalDateTime.of(2024, 1, 1, 0, 0).plusHours(h.toLong))

  test("streaming PH walk is bit-identical to the batch operator") {
    implicit val sqlCtx = spark.sqlContext
    val counts = Seq.fill(5)(10L) ++ Seq.fill(5)(40L)
    val events = counts.zipWithIndex.flatMap { case (n, h) =>
      (0L until n).map(i => (h * 1000 + i, hourTs(h), i, "click", 1.0, "{}"))
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val batch = graft.operators.Changepoint.pageHinkley(events)
      .collect()
      .map(r => (r.getTimestamp(1), (r.getLong(3), r.getLong(4),
        r.getBoolean(5)))).toMap

    val mem = MemoryStream[HourCount]
    val q = StatefulPageHinkley.monitor(spark, mem.toDS())
      .writeStream.outputMode("append").format("memory")
      .queryName("ph_stream").start()
    try {
      mem.addData((0 until 4).map(h => HourCount("click", hourTs(h), counts(h))))
      q.processAllAvailable()
      // out-of-order within a batch; the sort fixes it
      mem.addData(Seq(6, 4, 5).map(h => HourCount("click", hourTs(h), counts(h))))
      q.processAllAvailable()
      mem.addData((7 until 10).map(h => HourCount("click", hourTs(h), counts(h))))
      q.processAllAvailable()
      val got = spark.table("ph_stream").as[PhPoint].collect()
      assert(got.length == 10)
      got.foreach { p =>
        assert((p.m_micros, p.ph_micros, p.alarm) == batch(p.window_start),
          s"$p vs ${batch(p.window_start)}")
      }
      // the level shift must actually alarm somewhere in the walk
      assert(got.exists(_.alarm))
    } finally q.stop()
  }

  test("replayed hours are dropped: the walk does not double-count") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[HourCount]
    val q = StatefulPageHinkley.monitor(spark, mem.toDS())
      .writeStream.outputMode("append").format("memory")
      .queryName("ph_replay").start()
    try {
      mem.addData(Seq(HourCount("click", hourTs(0), 5L),
        HourCount("click", hourTs(1), 6L)))
      q.processAllAvailable()
      // replay hour 1 plus a stale hour 0: both must be ignored
      mem.addData(Seq(HourCount("click", hourTs(1), 6L),
        HourCount("click", hourTs(0), 5L),
        HourCount("click", hourTs(2), 7L)))
      q.processAllAvailable()
      val got = spark.table("ph_replay").as[PhPoint].collect()
      assert(got.length == 3)
      assert(got.map(_.window_start).distinct.length == 3)
      // t=3 step uses s=18: m3 = m2 + 7e6 - 6e6 - 5e5
      val m1 = 5000000L - 5000000L - 500000L
      val m2 = m1 + 6000000L - (11000000L / 2) - 500000L
      val m3 = m2 + 7000000L - (18000000L / 3) - 500000L
      assert(got.map(_.m_micros).sorted.toSeq ===
        Seq(m1, m2, m3).sorted.toSeq)
    } finally q.stop()
  }
}
