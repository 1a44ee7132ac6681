package graft

import java.sql.Timestamp

import graft.operators.TableStats

/** Fixtures for the CMS join-cardinality estimator. */
class JoinCardinalitySpec extends SparkTestBase {
  import spark.implicits._

  private val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
  private def ordersOf(keys: Seq[Long]) = keys.zipWithIndex.map {
    case (k, i) => (i.toLong, k, "O", 1.0, t0, "LO")
  }.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
    "o_orderdate", "o_orderpriority")
  private def eventsOf(keys: Seq[Long]) = keys.zipWithIndex.map {
    case (k, i) => (i.toLong, t0, k, "click", 1.0)
  }.toDF("event_id", "ts", "user_id", "event_type", "value")

  test("joinCardinalityEst: exact join rows from count frames; CMS one-sided") {
    // keys A: 1,1,2,3 ; keys B: 1,2,2,9 -> join rows = 2*1 + 1*2 = 4
    val orders = ordersOf(Seq(1L, 1L, 2L, 3L))
    val events = eventsOf(Seq(1L, 2L, 2L, 9L))
    val r = TableStats.joinCardinalityEst(orders, events).collect().head
    assert(r.getLong(0) == 4L && r.getLong(1) == 4L)
    assert(r.getLong(2) == 3L && r.getLong(3) == 3L)
    assert(r.getLong(4) == 4L)
    // brute-force cross-check of the exact path
    val brute = orders.join(events,
      orders("o_custkey") === events("user_id")).count()
    assert(brute == r.getLong(4))
    // CMS inner product never underestimates
    assert(r.getLong(5) >= r.getLong(4))
    assert(r.getLong(6) == r.getLong(5) - r.getLong(4))
  }

  test("joinCardinalityEst: disjoint key sets estimate near zero") {
    val r = TableStats.joinCardinalityEst(
      ordersOf((1L to 50L)), eventsOf((1001L to 1050L))).collect().head
    assert(r.getLong(4) == 0L)
    // 50x50 keys in 4x2048 buckets: collisions are possible but bounded
    assert(r.getLong(5) >= 0L && r.getLong(5) <= 50L)
  }

  test("joinCardinalityEst: heavy key dominates the product") {
    val r = TableStats.joinCardinalityEst(
      ordersOf(Seq.fill(100)(7L)), eventsOf(Seq.fill(100)(7L) ++ Seq(8L)))
      .collect().head
    assert(r.getLong(4) == 10000L)
    assert(r.getLong(5) >= 10000L)
  }
}
