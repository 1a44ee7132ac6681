package graft

import java.sql.Timestamp

import graft.operators.Changepoint

/** Hand-computed CUSUM fixtures: clamp behavior, alarm latency after a
  * level shift, and the two-sided symmetry.
  */
class ChangepointSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  /** n events of `typ` inside the given hour. */
  private def hour(typ: String, h: String, n: Int, idBase: Long) =
    (0 until n).map(i => (idBase + i, ts(s"$h:30:00"), typ, 1.0))

  test("cusumChangepoints: level shift alarms after cumulative drift") {
    // Baseline (4 hours): 8,12,8,12 -> mu=10, sigma=sqrt(16/3), k=sigma/2.
    // Shift hours at 15: each step adds 5-k; alarm once sp > 4*sigma.
    val sigma = math.sqrt((416.0 - 1600.0 / 4.0) / 3.0)
    val k = sigma * 0.5
    val events = (
      hour("a", "2024-01-01 00", 8, 0L) ++
        hour("a", "2024-01-01 01", 12, 100L) ++
        hour("a", "2024-01-01 02", 8, 200L) ++
        hour("a", "2024-01-01 03", 12, 300L) ++
        hour("a", "2024-01-10 00", 15, 400L) ++
        hour("a", "2024-01-10 01", 15, 500L) ++
        hour("a", "2024-01-10 02", 15, 600L)
      ).toDF("event_id", "ts", "event_type", "value")
    val got = Changepoint.cusumChangepoints(events).collect()
    assert(got.length == 7)
    val step = 5.0 - k // each shift hour's increment (15 - mu - k)
    // Baseline walk: +12 hour leaves 2-mu-k = 2-k, the +8 hour clamps back
    // to 0, the final +12 hour leaves carry = 2-k entering the shift.
    val carry = 2.0 - k
    val sps = got.map(_.getDouble(3))
    def r4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(sps(1) == r4(carry) && sps(2) == 0.0 && sps(3) == r4(carry))
    assert(sps(4) == r4(carry + step))
    assert(sps(5) == r4(carry + step * 2))
    assert(sps(6) == r4(carry + step * 3))
    val alarms = got.map(_.getBoolean(5))
    // 4*sigma = 9.24; walk 4.69, 8.54, 12.38 -> third shift hour alarms
    assert(alarms.toSeq == Seq(false, false, false, false,
      carry + step > 4 * sigma, carry + step * 2 > 4 * sigma,
      carry + step * 3 > 4 * sigma))
    assert(alarms(6))
  }

  test("cusumChangepoints: downward shift drives s_neg, not s_pos") {
    val events = (
      hour("b", "2024-01-01 00", 9, 0L) ++
        hour("b", "2024-01-01 01", 11, 100L) ++
        hour("b", "2024-01-10 00", 1, 200L) ++
        hour("b", "2024-01-10 01", 1, 300L)
      ).toDF("event_id", "ts", "event_type", "value")
    val got = Changepoint.cusumChangepoints(events).collect()
    val last = got.last
    assert(last.getDouble(3) == 0.0) // s_pos clamped at 0
    assert(last.getDouble(4) < 0.0) // s_neg accumulates the deficit
  }

  test("cusumChangepoints: in-control series never alarms") {
    val events = (0 until 10).flatMap(i =>
      hour("c", f"2024-01-01 $i%02d", 10, i * 100L))
      .toDF("event_id", "ts", "event_type", "value")
    val got = Changepoint.cusumChangepoints(events).collect()
    assert(got.forall(r => !r.getBoolean(5) && !r.getBoolean(6)))
    assert(got.forall(r => r.getDouble(3) == 0.0 && r.getDouble(4) == 0.0))
  }
}
