package graft

import java.sql.Timestamp
import graft.operators.{DistributedRank, Layout}

/** Hand pins for the exact range-partitioner plan. */
class RangePlanSpec extends SparkTestBase {

  test("rangePartitionPlan: exact boundaries and ±1-row bucket sizes") {
    import spark.implicits._
    // 10 orders with totals 1..10 dollars; k=4 -> targets 2,5,7,10
    val orders = (1 to 10).map(i =>
      (i.toLong, 1L, "O", i.toDouble,
        Timestamp.valueOf("2024-01-01 00:00:00"), "P"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    val got = Layout.rangePartitionPlan(orders, k = 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    DistributedRank.release(spark)
    // bucket i boundary at rank (i*10) DIV 4 = 2,5,7,10
    assert(got(1L) === ((2L, 2L, 200L, 2L)))
    assert(got(2L) === ((5L, 3L, 500L, 5L)))
    assert(got(3L) === ((7L, 2L, 700L, 7L)))
    assert(got(4L) === ((10L, 3L, 1000L, 10L)))
    assert(got.values.map(_._2).sum === 10L) // rows sum to n
  }

  test("rangePartitionPlan: duplicated values split deterministically by key") {
    import spark.implicits._
    val orders = (1 to 6).map(i =>
      (i.toLong, 1L, "O", 5.0, // ALL totals equal
        Timestamp.valueOf("2024-01-01 00:00:00"), "P"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    val got = Layout.rangePartitionPlan(orders, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(4)))
    DistributedRank.release(spark)
    // ties broken by orderkey: boundaries at keys 2, 4, 6; 2 rows each
    assert(got.toSeq === Seq((1L, 2L, 2L), (2L, 2L, 4L), (3L, 2L, 6L)))
  }
}
