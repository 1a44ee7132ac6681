package graft

import java.sql.Timestamp
import graft.operators.Privacy

/** Hand pins for the (c,l)-diversity audit and DP contribution bounding. */
class PrivacyBoundingSpec extends SparkTestBase {

  test("recursiveLDiversity: dominance, diversity, and singleton classes") {
    import spark.implicits._
    def block(nation: Int, segs: Seq[String]) =
      segs.zipWithIndex.map { case (s, i) =>
        (nation.toLong * 100 + i, s"c$nation-$i", nation, 500.0, s)
      }
    val cust = (
      block(1, Seq("A", "A", "A", "A", "A", "B", "C")) ++ // r=[5,1,1]
        block(2, Seq("A", "A", "B", "B", "C", "C")) ++    // r=[2,2,2]
        block(3, Seq("A", "A", "A", "A")))                // r=[4]
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal",
        "c_mktsegment")
    val got = Privacy.recursiveLDiversity(cust, l = 3, c = 2)
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getBoolean(6)))).toMap
    assert(got(1) === ((7L, 3L, 5L, 1L, false))) // 5 !< 2*1: dominated
    assert(got(2) === ((6L, 3L, 2L, 2L, true)))  // 2 < 2*2: diverse
    assert(got(3) === ((4L, 1L, 4L, 0L, false))) // homogeneous class
  }

  test("contributionCappedAgg: keep-first-k by time, clip, sensitivities") {
    import spark.implicits._
    val rows = Seq(
      // u1 type A: 5 events; first (by ts) is 300.00 -> clipped
      (1L, "2024-01-01 00:00:01", 1L, "A", 300.0),
      (2L, "2024-01-01 00:00:02", 1L, "A", 1.0),
      (3L, "2024-01-01 00:00:03", 1L, "A", 1.0),
      (4L, "2024-01-01 00:00:04", 1L, "A", 1.0),
      (5L, "2024-01-01 00:00:05", 1L, "A", 1.0),
      // u2 type A: single small event
      (6L, "2024-01-01 00:00:06", 2L, "A", 0.5))
      .map { case (id, ts, uid, tpe, v) =>
        (id, Timestamp.valueOf(ts), uid, tpe, v, "{}")
      }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = Privacy.contributionCappedAgg(rows, maxPerUser = 3,
      capCents = 20000L).collect()(0)
    assert(r.getString(0) === "A")
    assert(r.getLong(1) === 6L, "raw_rows")
    assert(r.getLong(2) === 4L, "kept_rows")
    assert(r.getLong(3) === 2L, "contributing_users")
    assert(r.getLong(4) === 2L, "rows_dropped")
    assert(r.getLong(5) === 1L, "users_truncated")
    assert(r.getLong(6) === 30450L, "raw_sum_cents")
    // kept: 30000->20000, 100, 100 (u1) + 50 (u2)
    assert(r.getLong(7) === 20250L, "capped_sum_cents")
    assert(r.getLong(8) === 1L, "clipped_rows")
    assert(r.getLong(9) === 60000L, "l1_sensitivity_cents")
  }
}
