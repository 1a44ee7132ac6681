package graft

import java.sql.Timestamp
import graft.operators.Changepoint

/** Hand pins for the correlogram and the MASE skill audit. */
class AcfForecastEvalSpec extends SparkTestBase {

  private def hourlySeries(counts: Seq[Int], tpe: String = "click") = {
    import spark.implicits._
    counts.zipWithIndex.flatMap { case (n, i) =>
      val day = 1 + i / 24
      val hr = i % 24
      (0 until n).map(j =>
        (0L, Timestamp.valueOf(f"2024-01-$day%02d $hr%02d:0${j % 6}:00"),
          1L, tpe, 0.0, "{}"))
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  test("acfProfile: period-2 series has acf(+1) = -1, acf(+2) = +1") {
    // counts alternate 1,3,1,3,... over 12 hours
    val d = hourlySeries(Seq.tabulate(12)(i => if (i % 2 == 0) 1 else 3))
    val got = Changepoint.acfProfile(d, maxLag = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), if (r.isNullAt(2)) null else r.getDouble(2))))
      .toMap
    assert(got(1L)._1 === 11L)
    assert(got(1L)._2 === -1.0)
    assert(got(2L)._1 === 10L)
    assert(got(2L)._2 === 1.0)
  }

  test("acfProfile: lag means calendar hours across a gap") {
    // hours 0,1,2 then a missing hour 3 then hour 4: spine fills zero
    val d = hourlySeries(Seq(2, 2, 2)).unionByName(
      hourlySeries(Seq(2)).selectExpr(
        "event_id", "ts + INTERVAL 4 HOURS as ts", "user_id",
        "event_type", "value", "props"))
    val got = Changepoint.acfProfile(d, maxLag = 1).collect()(0)
    // spine = 5 hours (0..4) -> 4 lag-1 pairs including the zero row
    assert(got.getLong(1) === 4L)
  }

  test("forecastEval: constant series gives zero errors and null MASE") {
    val d = hourlySeries(Seq.fill(30)(2))
    val r = Changepoint.forecastEval(d).collect()(0)
    // model errors 0 (after warmup f = 2 exactly), baselines all 0
    assert(r.getLong(2) === 0L, "model error sum")
    assert(r.getLong(4) === 0L, "naive error sum")
    // sum_abs_err_naive == 0 -> MASE undefined
    assert(r.isNullAt(7) && r.isNullAt(8))
  }

  test("forecastEval: hand-walked MASE on a 3-point series") {
    // counts [1, 3, 2]: holt f2 = 1.0 (l1=1,b=0), after t2 l=2,b=0.25,
    // f3 = 2.25. em = |3-1|*1e4 + |2-2.25|*1e4 = 20000 + 2500 = 22500.
    // naive errors: |3-1| + |2-3| = 3.
    val d = hourlySeries(Seq(1, 3, 2))
    val r = Changepoint.forecastEval(d).collect()(0)
    assert(r.getLong(1) === 2L, "n_model")
    assert(r.getLong(2) === 22500L, "model tenth-millis")
    assert(r.getLong(3) === 2L, "n_naive")
    assert(r.getLong(4) === 3L, "naive sum")
    // MASE = (22500 * 2 * 100) DIV (2 * 3) = 750000 (0.75: beats naive)
    assert(r.getLong(7) === 750000L)
    assert(r.isNullAt(8)) // no 24-lag pairs on 3 points
  }
}
