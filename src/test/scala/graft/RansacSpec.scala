package graft

import java.sql.Timestamp
import graft.operators.Ransac

class RansacSpec extends SparkTestBase {

  import spark.implicits._

  /** one event of `cents` revenue in hour h of 2024-01-01/02. */
  private def ev(tpe: String, hourCents: Seq[(Int, Long)]) =
    hourCents.zipWithIndex.map { case ((h, c), i) =>
      val day = 1 + h / 24
      (i.toLong, tpe,
        Timestamp.valueOf(f"2024-01-0$day ${h % 24}%02d:30:00"),
        c / 100.0)
    }.toDF("event_id", "event_type", "ts", "value")

  test("consensus rejects gross outliers; refit is the exact line") {
    // 17 hours on y = 1000 + 500x, 3 gross outliers at 100000 cents
    val pts = (0 until 20).map { x =>
      val y = if (Set(4, 11, 16)(x)) 100000L else 1000L + 500L * x
      (x, y)
    }
    val out = Ransac.ransacTrend(ev("purchase", pts)).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("n_points") == 20L)
    // the inlier test reduces to |true residual| <= tau, so the three
    // 100k-cent hours (residual ~94k >> tau ~5k) can never be inliers
    // of any 2-line-point model; the winner keeps exactly the 17
    assert(r.getAs[Long]("inliers") == 17L)
    // exact OLS on 17 perfectly collinear points
    assert(r.getAs[Long]("ols_slope_micros") == 500L * 1000000L)
    assert(r.getAs[Long]("ols_intercept_micros") == 1000L * 1000000L)
  }

  test("types with fewer than 3 observed hours are excluded") {
    val out = Ransac.ransacTrend(
      ev("click", Seq(0 -> 100L, 1 -> 200L))).collect()
    assert(out.isEmpty)
  }

  test("model points come from the type's own index space") {
    val small = ev("view", Seq(0 -> 100L, 1 -> 200L, 2 -> 300L, 3 -> 400L))
    val out = Ransac.ransacTrend(small).collect()
    assert(out.length == 1)
    val r = out.head
    // perfect line: every candidate scores 4/4 inliers; min-r tiebreak
    assert(r.getAs[Long]("inliers") == 4L)
    assert(r.getAs[Long]("best_r") == 0L)
    assert(Set(0L, 1L, 2L, 3L)(r.getAs[Long]("x1")))
    assert(r.getAs[Long]("x1") != r.getAs[Long]("x2"))
    assert(r.getAs[Long]("ols_slope_micros") == 100L * 1000000L)
  }
}
