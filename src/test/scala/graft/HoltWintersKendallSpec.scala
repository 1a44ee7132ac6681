package graft

import java.sql.Timestamp
import graft.operators.{Changepoint, RobustStats}

/** Independent recomputation pins for the seasonal smoother and tau-b. */
class HoltWintersKendallSpec extends SparkTestBase {

  private def ev(rows: (Long, String, String, Double)*) = {
    import spark.implicits._
    rows.zipWithIndex.map { case ((_, ts, tpe, v), i) =>
      (i.toLong, Timestamp.valueOf(ts), 1L, tpe, v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  test("kendallTau: hand-computed pair votes and tau-b") {
    // hourly (x, y-cents): A(1,0) B(2,100) C(2,50) D(3,200)
    val d = ev(
      (1L, "2024-01-01 00:10:00", "click", 0.0),
      (2L, "2024-01-01 01:10:00", "purchase", 1.0),
      (3L, "2024-01-01 01:20:00", "click", 0.0),
      (4L, "2024-01-01 02:10:00", "purchase", 0.5),
      (5L, "2024-01-01 02:20:00", "click", 0.0),
      (6L, "2024-01-01 03:10:00", "purchase", 2.0),
      (7L, "2024-01-01 03:20:00", "click", 0.0),
      (8L, "2024-01-01 03:30:00", "click", 0.0))
    val r = RobustStats.kendallTau(d).collect()(0)
    // C=5 D=0 ties_x=1 (B-C) ties_y=0 both=0; n0=6 n1=1 n2=0
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5)) === ((4L, 5L, 0L, 1L, 0L, 0L)))
    // tau_b = 5/sqrt(5*6) -> floor(5e6/sqrt(30)) = 912870
    assert(r.getLong(6) === 912870L)
  }

  test("kendallTau: all-tied axis yields null tau") {
    val d = ev(
      (1L, "2024-01-01 00:10:00", "click", 0.0),
      (2L, "2024-01-01 01:10:00", "click", 0.0))
    val r = RobustStats.kendallTau(d).collect()(0)
    assert(r.isNullAt(6)) // x tied on both hours -> n0 == n1
  }

  test("holtWinters matches an independent Scala fold, fit and future") {
    // 60 gap-free hours with a planted daily-ish pattern + trend
    val withTs = (0 until 60).flatMap { i =>
      val n = 1 + (i % 24) / 6 + i / 30 // 1..5 events per hour
      val day = 1 + i / 24
      val hr = i % 24
      (0 until n).map(j =>
        (0L, f"2024-01-$day%02d $hr%02d:0$j:00", "click", 0.0))
    }
    val d = ev(withTs: _*)
    val xs = (0 until 60).map(i => (1 + (i % 24) / 6 + i / 30).toLong)
    // reference fold (same IEEE ops)
    val sum1 = xs.take(24).sum
    val sum2 = xs.slice(24, 48).sum
    var l = sum1.toDouble / 24.0
    var b = (sum2 - sum1).toDouble / 576.0
    var s = xs.take(24).map(_.toDouble - l).toVector
    val exp = (24 until 60).map { t =>
      val x = xs(t).toDouble
      val f = l + b + s.head
      val lN = (x - s.head) * 0.5 + (l + b) * 0.5
      val bN = (lN - l) * 0.25 + b * 0.75
      val sN = (x - lN) * 0.5 + s.head * 0.5
      l = lN; b = bN; s = s.tail :+ sN
      (f, lN, bN, sN)
    }
    val got = Changepoint.holtWinters(d).collect()
    val fit = got.filter(_.getString(1) == "fit")
    assert(fit.length === 36)
    fit.zip(exp).foreach { case (r, (f, lN, bN, sN)) =>
      assert(math.abs(r.getDouble(3) - lN) < 5.1e-5, "level")
      assert(math.abs(r.getDouble(4) - bN) < 5.1e-5, "trend")
      assert(math.abs(r.getDouble(5) - sN) < 5.1e-5, "seasonal")
      assert(math.abs(r.getDouble(6) - f) < 5.1e-5, "forecast")
    }
    val fc = got.filter(_.getString(1) == "fc")
    assert(fc.length === 24)
    fc.zipWithIndex.foreach { case (r, i) =>
      val h = i + 1
      assert(math.abs(r.getDouble(6) - (l + h.toDouble * b + s(i))) < 5.1e-5)
      assert(r.isNullAt(2) && r.isNullAt(3) && r.isNullAt(4))
    }
  }
}
