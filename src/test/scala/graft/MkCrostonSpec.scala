package graft

import java.sql.Timestamp
import graft.operators.{Changepoint, RobustStats}

/** Hand-walked pins for Mann-Kendall and Croston/SBA. */
class MkCrostonSpec extends SparkTestBase {

  test("mannKendall: S, tie-corrected variance, continuity-corrected Z") {
    import spark.implicits._
    // hourly counts [1, 2, 2, 3]
    val rows = (Seq.fill(1)(0) ++ Seq.fill(2)(1) ++ Seq.fill(2)(2) ++
      Seq.fill(3)(3)).zipWithIndex.map { case (hr, i) =>
      (i.toLong, Timestamp.valueOf(f"2024-01-01 $hr%02d:0${i % 6}:00"),
        1L, "click", 0.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = RobustStats.mannKendall(rows).collect()(0)
    // S = 5; tie group {2,2}: tie_term=18; var18 = 4*3*13-18 = 138
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((4L, 5L, 138L)))
    val expZ = math.floor((5L - 1L) * 1000000.0 /
      math.sqrt(138.0 / 18.0)).toLong
    assert(r.getLong(3) === expZ)
    assert(r.getString(4) === "none") // |z| ~ 1.44 < 1.96
  }

  test("crostonForecast: hand-walked size/interval smoothing with SBA") {
    import spark.implicits._
    // part 7: demand day0 sum=4 (3+1), day3 q=2, day5 q=6
    val li = Seq(
      (7L, 3.0, "2024-01-01 10:00:00"),
      (7L, 1.0, "2024-01-01 15:00:00"),
      (7L, 2.0, "2024-01-04 09:00:00"),
      (7L, 6.0, "2024-01-06 23:00:00"))
      .map { case (p, q, d) => (p, q, Timestamp.valueOf(d)) }
      .toDF("l_partkey", "l_quantity", "l_shipdate")
    val r = Changepoint.crostonForecast(li).collect()(0)
    // z: 4e6 -> 3.5e6 -> 4125000 ; p: 1e6 -> 1.5e6 -> 1625000
    assert((r.getLong(0), r.getLong(1)) === ((7L, 3L)))
    assert(r.getLong(2) === 4125000L, "level")
    assert(r.getLong(3) === 1625000L, "interval")
    assert(r.getLong(4) === 2538461L, "croston") // 4125000e6 DIV 1625000
    assert(r.getLong(5) === 2221153L, "sba")     // *7 DIV 8
  }

  test("crostonForecast: single-demand part keeps its init state") {
    import spark.implicits._
    val li = Seq((9L, 5.0, Timestamp.valueOf("2024-01-02 10:00:00")))
      .toDF("l_partkey", "l_quantity", "l_shipdate")
    val r = Changepoint.crostonForecast(li).collect()(0)
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ===
      ((1L, 5000000L, 1000000L, 5000000L)))
  }
}
