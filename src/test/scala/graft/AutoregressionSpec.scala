package graft

import java.sql.Timestamp
import graft.operators.Autoregression

class AutoregressionSpec extends SparkTestBase {

  import spark.implicits._

  /** counts(h) copies of an event in hour h of 2024-01-01. */
  private def hourly(tpe: String, counts: Seq[Int]) =
    counts.zipWithIndex.flatMap { case (c, h) =>
      (0 until c).map(k =>
        ((h * 100 + k).toLong, tpe,
          Timestamp.valueOf(f"2024-01-01 $h%02d:15:00")))
    }.toDF("event_id", "event_type", "ts")

  test("alternating series: hand-checked exact YW solution") {
    // x = 3,1,3,1,3,1,3,1: n=8, m0=2, e=±1
    // g0=8, g1=-7, g2=6, den=15, num1=-14, num2=-1
    // e_n=-1, e_{n-1}=1 → fnum = 30 + 14 - 1 = 43
    val out = Autoregression
      .ar2YuleWalker(hourly("click", Seq(3, 1, 3, 1, 3, 1, 3, 1)))
      .collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("n_hours") == 8L)
    assert(r.getAs[Long]("m0") == 2L)
    assert(r.getAs[Long]("g0") == 8L)
    assert(r.getAs[Long]("g1") == -7L)
    assert(r.getAs[Long]("g2") == 6L)
    assert(r.getAs[Long]("phi1_micros") == -933333L) // -floor(14e6/15)
    assert(r.getAs[Long]("phi2_micros") == -66666L)  // -floor(1e6/15)
    assert(r.getAs[Long]("forecast_micros") == 2866666L) // 43e6 div 15
  }

  test("missing hours gap-fill as zeros") {
    // hours 0 and 2 only → hour 1 participates as x=0
    val out = Autoregression
      .ar2YuleWalker(hourly("view", Seq(4, 0, 2)))
      .collect()
    assert(out.length == 1)
    val r = out.head
    // S=6, n=3, m0=2, e = 2,-2,0 → g0=8, g1=-4, g2=0
    assert(r.getAs[Long]("n_hours") == 3L)
    assert(r.getAs[Long]("g0") == 8L && r.getAs[Long]("g1") == -4L &&
      r.getAs[Long]("g2") == 0L)
    // den=48, num1=(-4)(8)= -32 → phi1 = -666666; num2 = -16 → -333333
    assert(r.getAs[Long]("phi1_micros") == -666666L)
    assert(r.getAs[Long]("phi2_micros") == -333333L)
  }

  test("constant series is degenerate and excluded") {
    val out = Autoregression
      .ar2YuleWalker(hourly("error", Seq(2, 2, 2, 2)))
      .collect()
    assert(out.isEmpty)
  }

  test("types fit independently") {
    val ev = hourly("click", Seq(3, 1, 3, 1, 3, 1, 3, 1))
      .unionByName(hourly("error", Seq(2, 2, 2, 2)))
      .unionByName(hourly("view", Seq(4, 0, 2)))
    val out = Autoregression.ar2YuleWalker(ev).collect()
    assert(out.map(_.getString(0)).toSeq == Seq("click", "view"))
  }
}
