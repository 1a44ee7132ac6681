package graft

import java.sql.Timestamp
import graft.operators.Lateness

/** Independent Scala replay of the jittered-arrival lateness profile. */
class LatenessSpec extends SparkTestBase {

  test("watermarkLateness matches a sequential Scala replay of the scan") {
    import spark.implicits._
    // 300 events over ~5 hours, ts strictly increasing by 67 s
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val rows = (0 until 300).map { i =>
      (i.toLong, new Timestamp(t0 + i * 67000L), 1L, "click", 0.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = Lateness.watermarkLateness(rows)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap

    // reference: same delays, global sort by (arr, id), running max
    val ev = (0 until 300).map { i =>
      val tus = (t0 + i * 67000L) * 1000L
      val arr = tus + (graft.functions.Mix64.mix(i.toLong) & 1023L) * 1000000L
      (i.toLong, tus, arr)
    }
    var runmax = Long.MinValue
    val lates = ev.sortBy(e => (e._3, e._1)).map { case (_, tus, _) =>
      runmax = math.max(runmax, tus); runmax - tus
    }
    def band(l: Long) =
      if (l <= 0) "a_on_time"
      else if (l < 60000000L) "b_under_1m"
      else if (l < 300000000L) "c_under_5m"
      else if (l < 3600000000L) "d_under_1h"
      else "e_over_1h"
    val exp = lates.groupBy(band).map { case (b, ls) => b -> ls.size }
    val maxLate = lates.max
    exp.foreach { case (b, n) =>
      assert(got(b)._1 === n.toLong, s"band $b")
      assert(got(b)._2 === n.toLong * 1000000L / 300L, s"share $b")
      assert(got(b)._3 === maxLate, s"max $b")
    }
    assert(got.keySet === exp.keySet)
    // jitter up to 1023 s must actually produce late bands
    assert(got.contains("b_under_1m") || got.contains("c_under_5m"))
  }
}
