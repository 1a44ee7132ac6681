package graft

import java.sql.Timestamp

import graft.operators.{Changepoint, Sprt, TableStats}

/** Fixtures for the SPRT monitor, the exact-moment correlation matrix,
  * and the seasonal decomposition.
  */
class StatsMonitorSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  // ---- SPRT ---------------------------------------------------------------

  /** Per hour: `n` trials for each variant, `sA`/`sB` purchases. Users are
    * fixed (0 and 1) so variant = user % 2 is stable.
    */
  private def abEvents(hours: Int, n: Int, sA: Int, sB: Int) =
    (0 until hours).flatMap { h =>
      val hh = f"2024-01-${h / 24 + 1}%02d ${h % 24}%02d"
      def mk(uid: Long, s: Int, base: Long) = (0 until n).map { i =>
        (base + i, ts(s"$hh:05:00"), uid,
          if (i < s) "purchase" else "view", 1.0)
      }
      mk(0L, sA, h * 1000L) ++ mk(1L, sB, h * 1000L + 500L)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")

  test("sprtAbTest: strong variant accepts H1, weak accepts H0") {
    // variant 0: 30% conversions (> p1=0.22); variant 1: 10% (< p0=0.18)
    val got = Sprt.sprtAbTest(abEvents(hours = 30, n = 10, sA = 3, sB = 1))
      .collect()
    val v0 = got.filter(_.getInt(0) == 0)
    val v1 = got.filter(_.getInt(0) == 1)
    assert(v0.last.getString(5) == "accept_h1")
    assert(v1.last.getString(5) == "accept_h0")
    // per-hour llr increment is the exact two-constant sum
    val step0 = 3 * Sprt.WSucc + 7 * Sprt.WFail
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(v0.head.getDouble(4) == r6(step0))
    assert(v0(4).getDouble(4) == r6(5 * 3 * Sprt.WSucc + 5 * 7 * Sprt.WFail))
    // decisions flip exactly when the walk crosses the boundary
    v0.foreach { r =>
      val expect = if (r.getDouble(4) >= r6(Sprt.Upper)) "accept_h1"
      else if (r.getDouble(4) <= r6(Sprt.Lower)) "accept_h0"
      else "continue"
      // compare on the rounded value; the raw boundary compare can only
      // differ inside the rounding grid, so allow the grid edge
      assert(r.getString(5) == expect ||
        math.abs(r.getDouble(4) - Sprt.Upper) < 1e-5 ||
        math.abs(r.getDouble(4) - Sprt.Lower) < 1e-5)
    }
  }

  // ---- correlation matrix -------------------------------------------------

  private def li(rows: Seq[(Double, Double, Double, Double)]) =
    rows.toDF("l_quantity", "l_extendedprice", "l_discount", "l_tax")

  test("corrMatrix: perfect linear relation gives corr 1, inverse -1") {
    val got = TableStats.corrMatrix(li(Seq(
      (1.0, 2.0, 0.03, 3.0),
      (2.0, 4.0, 0.02, 2.0),
      (3.0, 6.0, 0.01, 1.0)))).collect()
    val byPair = got.map(r =>
      (r.getString(0), r.getString(1)) -> r).toMap
    assert(byPair(("l_quantity", "l_extendedprice")).getDouble(3) == 1.0)
    assert(byPair(("l_quantity", "l_discount")).getDouble(3) == -1.0)
    assert(byPair(("l_discount", "l_tax")).getDouble(3) == 1.0)
    assert(got.forall(_.getLong(2) == 3L))
  }

  test("corrMatrix: zero-variance column yields NULL, not NaN") {
    val got = TableStats.corrMatrix(li(Seq(
      (1.0, 2.0, 0.05, 1.0),
      (2.0, 9.0, 0.05, 2.0)))).collect()
    val dis = got.filter(r => r.getString(0) == "l_discount" ||
      r.getString(1) == "l_discount")
    assert(dis.nonEmpty && dis.forall(_.isNullAt(3)))
  }

  test("corrMatrix: matches a naive two-pass computation") {
    val rows = (1 to 40).map(i => (
      (i % 7 + 1).toDouble, (i % 11 + 2) * 3.0 + i % 3,
      (i % 5).toDouble / 100.0, (i % 4).toDouble / 50.0))
    val got = TableStats.corrMatrix(li(rows)).collect()
    def cents(x: Double): Long = BigDecimal(x).setScale(2,
      BigDecimal.RoundingMode.HALF_UP).*(100).toLongExact
    val cols = Seq(rows.map(r => cents(r._1)), rows.map(r => cents(r._2)),
      rows.map(r => cents(r._3)), rows.map(r => cents(r._4)))
    def corr(a: Seq[Long], b: Seq[Long]): Double = {
      val n = a.length.toDouble
      val ma = a.sum / n; val mb = b.sum / n
      val cov = a.zip(b).map { case (x, y) => (x - ma) * (y - mb) }.sum
      val va = a.map(x => (x - ma) * (x - ma)).sum
      val vb = b.map(y => (y - mb) * (y - mb)).sum
      cov / math.sqrt(va * vb)
    }
    val names = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    got.foreach { r =>
      val i = names.indexOf(r.getString(0))
      val j = names.indexOf(r.getString(1))
      assert(math.abs(r.getDouble(3) - corr(cols(i), cols(j))) < 1e-6,
        s"${r.getString(0)} x ${r.getString(1)}")
    }
  }

  // ---- seasonal decomposition ---------------------------------------------

  test("seasonalDecompose: constant series decomposes to level + zeros") {
    val events = (0 until 50).flatMap { h =>
      (0 until 5).map(i =>
        ((h * 10 + i).toLong,
          ts(f"2024-01-${h / 24 + 1}%02d ${h % 24}%02d:10:00"), "e", 1.0))
    }.toDF("event_id", "ts", "event_type", "value")
    val got = Changepoint.seasonalDecompose(events).collect()
    assert(got.length == 50)
    // first/last 12 hours have no full centered window
    assert(got.take(12).forall(_.isNullAt(3)))
    assert(got.takeRight(12).forall(_.isNullAt(3)))
    val interior = got.slice(12, 38)
    interior.foreach { r =>
      assert(r.getDouble(3) == 5.0 && r.getDouble(4) == 0.0 &&
        r.getDouble(5) == 0.0)
    }
  }

  test("seasonalDecompose: remainder = x - trend - seasonal by definition") {
    val events = (0 until 72).flatMap { h =>
      val n = if (h % 24 == 0) 9 else 3 + (h % 5)
      (0 until n).map(i =>
        ((h * 100 + i).toLong,
          ts(f"2024-01-${h / 24 + 1}%02d ${h % 24}%02d:10:00"), "e", 1.0))
    }.toDF("event_id", "ts", "event_type", "value")
    val got = Changepoint.seasonalDecompose(events).collect()
    got.filter(r => !r.isNullAt(3)).foreach { r =>
      val e = r.getLong(2).toDouble - r.getDouble(3) - r.getDouble(4)
      assert(math.abs(r.getDouble(5) - e) < 2e-4)
    }
  }
}
