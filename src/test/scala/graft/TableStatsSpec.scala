package graft

import java.sql.Timestamp

import graft.operators.TableStats

/** Fixtures for the ANALYZE-style column profile. */
class TableStatsSpec extends SparkTestBase {
  import spark.implicits._

  test("columnStats: counts, ndv, canonical min/max, null accounting") {
    val orders = Seq(
      (1L, 10L, "O", 10.10, Timestamp.valueOf("1995-01-01 00:00:00"), "HI"),
      (2L, 10L, "F", 20.20, Timestamp.valueOf("1996-01-01 00:00:00"), "LO"),
      (3L, 11L, "O", 5.55, Timestamp.valueOf("1994-06-01 00:00:00"), "HI")
    ).toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")
    val events = Seq(
      (1L, Timestamp.valueOf("2024-01-01 00:00:00"), 7L, "click", 1.25),
      (2L, Timestamp.valueOf("2024-01-02 00:00:00"), 7L, "view", 0.50)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = TableStats.columnStats(orders, events).collect()
    assert(got.length == 11)
    val byCol = got.map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val price = byCol(("orders", "o_totalprice"))
    assert(price.getLong(2) == 3L && price.getLong(3) == 0L &&
      price.getLong(4) == 3L)
    assert(price.getString(5) == "555" && price.getString(6) == "2020")
    val cust = byCol(("orders", "o_custkey"))
    assert(cust.getLong(4) == 2L) // ndv
    val date = byCol(("orders", "o_orderdate"))
    // canonical = epoch micros of the naive timestamp (UTC session)
    assert(date.getString(5) ==
      (Timestamp.valueOf("1994-06-01 00:00:00").getTime * 1000L).toString)
    val et = byCol(("events", "event_type"))
    assert(et.getString(5) == "click" && et.getString(6) == "view")
    assert(byCol(("events", "event_id")).getLong(2) == 2L)
  }
}
