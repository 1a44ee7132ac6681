package graft

import java.sql.Timestamp

import graft.operators.{DistributedRank, Experiment, Survival}

/** Planted-fixture pins for the survival / rank-test family:
  * [[Survival.kmSurvival]] against a hand-computed product-limit curve
  * (churn + censoring + the floor-division recurrence) and
  * [[Experiment.mannWhitney]] against hand-counted U statistics with and
  * without ties.
  */
class SurvivalRankSpec extends SparkTestBase {

  private def ts(day: Int): Timestamp =
    Timestamp.from(Timestamp.valueOf("2024-01-01 00:00:00").toInstant
      .plusSeconds(day * 86400L))

  test("kmSurvival reproduces the hand-computed product-limit curve") {
    import spark.implicits._
    // w_end = day 400 (customer D's last order). activeDays = 90 ⇒
    // censored iff last order ≥ day 310.
    //   A: day 0 only           → dur 0,   churned
    //   B: days 0,2             → dur 2,   churned
    //   C: days 350,352         → dur 2,   censored
    //   D: days 0,400           → dur 400, censored
    val orders = Seq(
      (1L, 0), (2L, 0), (2L, 2), (3L, 350), (3L, 352), (4L, 0), (4L, 400))
      .map { case (ck, d) => (ck, ts(d)) }
      .toDF("o_custkey", "o_orderdate")
    val got = Survival.kmSurvival(orders, activeDays = 90)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    // t=0: n=4,d=1 → s = 1e12·3 DIV 4; t=2: n=3,d=1,c=1 → s·2 DIV 3;
    // t=400: n=1,d=0 → s unchanged.
    assert(got.toSeq === Seq(
      (0L, 4L, 1L, 0L, 750000000000L),
      (2L, 3L, 1L, 1L, 500000000000L),
      (400L, 1L, 0L, 1L, 500000000000L)))
  }

  test("kmSurvival: all-censored population keeps survival at 1") {
    import spark.implicits._
    val orders = Seq((1L, ts(0)), (1L, ts(5)), (2L, ts(3)), (2L, ts(6)))
      .toDF("o_custkey", "o_orderdate")
    val got = Survival.kmSurvival(orders, activeDays = 90).collect()
    assert(got.forall(_.getLong(4) == 1000000000000L))
    assert(got.map(_.getLong(3)).sum == 2L) // both censored
    assert(got.map(_.getLong(2)).sum == 0L) // nobody churns
  }

  private def mwOf(vals: Seq[(Int, Double)]) = {
    import spark.implicits._
    // variant = user_id % 2; give each obs a distinct event_id tiebreaker
    val events = vals.zipWithIndex.map { case ((g, v), i) =>
      (i.toLong, g.toLong, "purchase", v, ts(0))
    }.toDF("event_id", "user_id", "event_type", "value", "ts")
    try Experiment.mannWhitney(events).collect().head
    finally DistributedRank.release(spark)
  }

  test("mannWhitney: separated groups give the extreme U") {
    // g0 = {1,2,3}, g1 = {4,5,6}: U1 = 9, no ties.
    val r = mwOf(Seq((0, 1.0), (0, 2.0), (0, 3.0),
      (1, 4.0), (1, 5.0), (1, 6.0)))
    assert(r.getAs[Long]("n0") == 3L && r.getAs[Long]("n1") == 3L)
    assert(r.getAs[Long]("u1_x2") == 18L)
    assert(r.getAs[Long]("tie_cubes") == 0L)
    // rank-biserial = 2U/(n0·n1) − 1 = 1 exactly
    assert(r.getAs[Long]("rank_biserial_micros") == 1000000L)
    assert(r.getAs[Double]("z") > 1.9)
  }

  test("mannWhitney: midrank ties match the hand count") {
    // g0 = {1,2,2}, g1 = {2,3}: avg rank of the three 2s = 3;
    // R1 = 3 + 5 = 8 → 2R1 = 16, U1 = 8 − n1(n1+1)/2 = 5 → u1_x2 = 10.
    val r = mwOf(Seq((0, 1.0), (0, 2.0), (2, 2.0), (1, 2.0), (1, 3.0)))
    assert(r.getAs[Long]("r1_x2") == 16L)
    assert(r.getAs[Long]("u1_x2") == 10L)
    assert(r.getAs[Long]("tie_cubes") == 24L) // one tie group of 3: 27−3
    // (u1_x2 − n0·n1)·10^6 DIV (n0·n1) = 4·10^6 DIV 6
    assert(r.getAs[Long]("rank_biserial_micros") == 666666L)
  }

  test("mannWhitney: all-tied values yield NULL z (zero variance)") {
    val r = mwOf(Seq((0, 5.0), (0, 5.0), (1, 5.0), (1, 5.0)))
    assert(r.isNullAt(r.fieldIndex("z")))
    // all four share avg rank 2.5: 2R1 = 10, u1_x2 = 10 − n1(n1+1) = 4
    assert(r.getAs[Long]("u1_x2") == 4L)
  }
}
