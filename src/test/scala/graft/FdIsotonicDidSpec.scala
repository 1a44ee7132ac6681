package graft

import java.sql.Timestamp

import graft.operators.{DataQuality, Experiment, FeatureEng}

/** Fixture pins for the profiling/calibration additions: FD g₃ counts on
  * a planted table, the isotonic minimax against an independent PAVA
  * implementation, and a hand-computed diff-in-differences.
  */
class FdIsotonicDidSpec extends SparkTestBase {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("fdViolations counts the g3 error on the harness tables") {
    val got = DataQuality.fdViolations(
      spark.read.parquet(s"$sf/orders.parquet"),
      spark.read.parquet(s"$sf/lineitem.parquet"),
      spark.read.parquet(s"$sf/events.parquet"),
      spark.read.parquet(s"$sf/documents.parquet"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(3), r.getBoolean(4))).toMap
    // o_orderkey is the orders primary key: the FD holds exactly.
    val (n, v, holds) = got("orders.o_orderkey->o_orderstatus")
    assert(holds && v == 0L && n > 0L)
    // every other profiled pair must be internally consistent:
    // 0 ≤ violations < n_rows, holds ⇔ violations == 0
    got.values.foreach { case (rows, viol, h) =>
      assert(viol >= 0L && viol < rows && h == (viol == 0L))
    }
  }

  test("isotonic minimax equals an independent PAVA fold") {
    val events = spark.read.parquet(s"$sf/events.parquet")
    val got = FeatureEng.isotonicCalibration(events)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(4)))
    assert(got.map(_._1).toSeq == got.map(_._1).sorted.toSeq)
    // monotone non-decreasing
    got.sliding(2).foreach { case Array(a, b) => assert(a._4 <= b._4) }
    // reference PAVA over exact rationals (BigInt num/den), floored to
    // micros at the end — must agree with the relational minimax
    case class Block(y: BigInt, n: BigInt)
    var stack = List.empty[(Block, Int)] // block + its width
    got.foreach { case (_, n, y, _) =>
      var cur = (Block(BigInt(y), BigInt(n)), 1)
      while (stack.nonEmpty &&
        // mean(prev) > mean(cur): cross-multiplied rational compare
        stack.head._1.y * cur._1.n > cur._1.y * stack.head._1.n) {
        val (p, w) = stack.head
        stack = stack.tail
        cur = (Block(p.y + cur._1.y, p.n + cur._1.n), w + cur._2)
      }
      stack = cur :: stack
    }
    val pava = stack.reverse.flatMap { case (b, w) =>
      Seq.fill(w)((b.y * 1000000 / b.n).toLong)
    }
    assert(got.map(_._4).toSeq == pava)
  }

  test("diffInDiff reproduces a hand-computed 2x2") {
    import spark.implicits._
    // variant 0 = user 2, variant 1 = user 1. Split at Jan 8.
    //   u1: pre 10.00, post 30.00   u2: pre 10.00, post 15.00
    // DiD = (30−10) − (15−10) = 15.00 → 15_000_000 micros.
    val events = Seq(
      (1L, 1L, "purchase", 10.0, ts("2024-01-02 00:00:00")),
      (2L, 1L, "purchase", 30.0, ts("2024-01-10 00:00:00")),
      (3L, 2L, "purchase", 10.0, ts("2024-01-03 00:00:00")),
      (4L, 2L, "purchase", 15.0, ts("2024-01-11 00:00:00")),
      (5L, 2L, "view", 99.0, ts("2024-01-11 00:00:00")))
      .toDF("event_id", "user_id", "event_type", "value", "ts")
    val r = Experiment.diffInDiff(events).collect().head
    assert(r.getAs[Long]("n0") == 1L && r.getAs[Long]("n1") == 1L)
    assert(r.getAs[Long]("pre1_micros") == 10000000L)
    assert(r.getAs[Long]("post1_micros") == 30000000L)
    assert(r.getAs[Long]("did_micros") == 15000000L)
  }
}
