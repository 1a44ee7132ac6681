package graft

import java.sql.Timestamp

import graft.operators.{DistributedRank, RobustStats}

/** Fixture pins for QTE order statistics and Spearman rho. */
class QteSpearmanSpec extends SparkTestBase {

  private val ts0 = Timestamp.valueOf("2024-01-05 00:00:00")

  test("qteQuartiles: exact ceil-rank order statistics per variant") {
    import spark.implicits._
    // control (u=2): 10,20,30,40 → p25=10 (k=1), p50=20 (k=2), p75=30.
    // treated (u=1): 15,25,35,45 → 15/25/35. QTE = +5 everywhere.
    val rows =
      Seq(10, 20, 30, 40).zipWithIndex.map { case (v, i) =>
        ((i + 1).toLong, 2L, "purchase", v.toDouble, ts0) } ++
      Seq(15, 25, 35, 45).zipWithIndex.map { case (v, i) =>
        ((i + 10).toLong, 1L, "purchase", v.toDouble, ts0) }
    val events = rows.toDF("event_id", "user_id", "event_type", "value",
      "ts")
    try {
      val r = RobustStats.qteQuartiles(events).collect().head
      assert(r.getAs[Long]("c25") == 1000L && r.getAs[Long]("t25") == 1500L)
      assert(r.getAs[Long]("qte25_cents") == 500L)
      assert(r.getAs[Long]("qte50_cents") == 500L)
      assert(r.getAs[Long]("qte75_cents") == 500L)
    } finally DistributedRank.release(spark)
  }

  test("spearman: perfect monotone association gives rho = 1") {
    import spark.implicits._
    // engagement strictly increases with spend: user u has u events,
    // one purchase of value 10·u → both rank axes identical, Σd² = 0.
    val rows = (1 to 5).flatMap { u =>
      val views = (1 until u).map(i =>
        ((u * 100 + i).toLong, u.toLong, "view", 1.0, ts0))
      views :+ ((u * 100 + 99).toLong, u.toLong, "purchase",
        10.0 * u, ts0)
    }
    val events = rows.toDF("event_id", "user_id", "event_type", "value",
      "ts")
    try {
      val r = RobustStats.spearmanEngagementSpend(events).collect().head
      assert(r.getAs[Long]("sum_d2") == 0L)
      assert(r.getAs[Long]("rho_micros") == 1000000L)
    } finally DistributedRank.release(spark)
  }

  test("spearman: perfect inverse association gives rho = -1") {
    import spark.implicits._
    // user u has u events but spend DECREASES with u
    val rows = (1 to 4).flatMap { u =>
      val views = (1 until u).map(i =>
        ((u * 100 + i).toLong, u.toLong, "view", 1.0, ts0))
      views :+ ((u * 100 + 99).toLong, u.toLong, "purchase",
        10.0 * (5 - u), ts0)
    }
    val events = rows.toDF("event_id", "user_id", "event_type", "value",
      "ts")
    try {
      val r = RobustStats.spearmanEngagementSpend(events).collect().head
      // n=4: Σd² for full reversal = 2·(3²+1²) = 20; 6·20/(4·15) = 2
      assert(r.getAs[Long]("rho_micros") == -1000000L)
    } finally DistributedRank.release(spark)
  }
}
