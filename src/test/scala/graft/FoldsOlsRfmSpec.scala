package graft

import java.sql.Timestamp

import graft.operators.{Folds, TableStats}
import graft.queries.Analytics

/** Fixtures for grouped CV folds, the exact OLS trend, and RFM grid
  * invariants.
  */
class FoldsOlsRfmSpec extends SparkTestBase {
  import spark.implicits._

  private val t0 = Timestamp.valueOf("2024-01-01 00:00:00")

  test("cvFolds: partition of events, group-atomic, shares sum to ~1") {
    val ev = (0L until 3000L).map(i =>
      (i, t0, i % 457L, "click", 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val rows = Folds.cvFolds(ev).collect()
    assert(rows.length == Folds.K)
    assert(rows.map(_.getLong(1)).sum == 3000L)     // events partitioned
    assert(rows.map(_.getLong(2)).sum == 457L)      // users partitioned
    assert(rows.forall(_.getLong(4) == 0L))         // no user spans folds
    val shares = rows.map(_.getLong(3)).sum
    assert(shares > 999000L && shares <= 1000000L)  // DIV floors each term
    // folds are reasonably balanced for a hash assignment of 457 groups
    val us = rows.map(_.getLong(2))
    assert(us.min > 25 && us.max < 90, s"user balance: ${us.toSeq}")
  }

  test("cvFolds: assignment is a pure function of user_id") {
    val ev = (0L until 100L).map(i => (i, t0, i % 7L, "x", 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val a = Folds.cvFolds(ev).collect().map(r => (r.getLong(0), r.getLong(2)))
    val b = Folds.cvFolds(ev.repartition(11)).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    assert(a.toSeq == b.toSeq)
  }

  test("olsTrend: recovers a planted exact linear trend") {
    // y = 200 + 50*x cents on days x = 0..99, one segment
    val o2 = (0 until 100).map { x =>
      val d = java.time.LocalDate.of(1992, 1, 1).plusDays(x)
      (x.toLong, 1L, "O", (200 + 50 * x) / 100.0,
        Timestamp.valueOf(d.atStartOfDay()), "P")
    }.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")
    val cust = Seq((1L, "SEG")).toDF("c_custkey", "c_mktsegment")
    val r = TableStats.olsTrend(o2, cust).collect().head
    assert(r.getLong(1) == 100L)                  // n_days
    assert(r.getLong(2) == 50L * 1000000L)        // slope = 50 cents/day
    assert(r.getLong(3) == 200L * 1000000L)       // intercept = 200 cents
    assert(r.getDouble(4) == 1.0)                 // perfect fit
  }

  test("olsTrend: negative slope survives the sign-separated division") {
    val o2 = (0 until 50).map { x =>
      val d = java.time.LocalDate.of(1992, 1, 1).plusDays(x)
      (x.toLong, 1L, "O", (10000 - 30 * x) / 100.0,
        Timestamp.valueOf(d.atStartOfDay()), "P")
    }.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")
    val cust = Seq((1L, "SEG")).toDF("c_custkey", "c_mktsegment")
    val r = TableStats.olsTrend(o2, cust).collect().head
    assert(r.getLong(2) == -30L * 1000000L)
    assert(r.getLong(3) == 10000L * 1000000L)
  }

  test("olsTrend: a single-day segment yields NULL trend, not an ANSI crash") {
    val o2 = Seq(
      (1L, 1L, "O", 10.0, Timestamp.valueOf("1992-01-01 00:00:00"), "P"),
      (2L, 1L, "O", 20.0, Timestamp.valueOf("1992-01-01 00:00:00"), "P"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    val cust = Seq((1L, "SEG")).toDF("c_custkey", "c_mktsegment")
    val r = TableStats.olsTrend(o2, cust).collect().head
    assert(r.getLong(1) == 1L)
    assert(r.isNullAt(2) && r.isNullAt(3) && r.isNullAt(4))
  }

  test("bootstrapCi: tiny inputs survive empty replicates (full-mean fallback)") {
    val one = Seq((1L, "P", 10.00))
      .toDF("o_orderkey", "o_orderpriority", "o_totalprice")
    val r = graft.operators.FeatureEng.bootstrapCi(one).collect().head
    assert(r.getLong(0) == 1L && r.getLong(1) == 1000000000L)
    // every replicate mean is either the resampled or the full mean of a
    // single constant row -> both order statistics equal the mean
    assert(r.getLong(3) == 1000000000L && r.getLong(4) == 1000000000L)
  }

  test("rfmSegments: grid counts partition customers; quintiles balanced") {
    val orders = (0 until 1000).flatMap { c =>
      (0 to c % 5).map { k =>
        val d = java.time.LocalDate.of(1995, 1, 1).plusDays((c * 7 + k) % 1200)
        ((c * 10 + k).toLong, c.toLong, "O", (100 + c % 777).toDouble,
          Timestamp.valueOf(d.atStartOfDay()), "P")
      }
    }.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")
    val got = Analytics.rfmSegments(orders).collect()
    assert(got.map(_.getLong(3)).sum == 1000L)
    got.foreach { r =>
      assert(r.getInt(0) >= 1 && r.getInt(0) <= 5)
      assert(r.getInt(1) >= 1 && r.getInt(1) <= 5)
      assert(r.getInt(2) >= 1 && r.getInt(2) <= 5)
    }
    graft.operators.DistributedRank.release(spark)
  }
}
