package graft

import java.sql.Timestamp
import graft.functions.Mix64
import graft.operators.{OffPolicy, Survival}

class OffPolicySurvivalSpec extends SparkTestBase {

  import spark.implicits._

  test("ipsPolicyValue replays arms and the exact IPS/SNIPS identities") {
    val rows = (0L until 120L).map { i =>
      val h = (i % 24).toInt
      (i, if (i % 5 == 0) "purchase" else "click",
        Timestamp.valueOf(f"2024-01-01 $h%02d:10:00"),
        (i % 13 + 1).toDouble)
    }
    val df = rows.toDF("event_id", "event_type", "ts", "value")
    val r = OffPolicy.ipsPolicyValue(df).collect().head
    // replay in Scala from the same public chain
    def arm(id: Long) =
      java.lang.Math.floorMod(
        Mix64.mix(Mix64.mix(id) ^ OffPolicy.LogSeed), 4L)
    val recomputed = rows.map { case (id, t, ts, v) =>
      val cents = math.round(v * 100)
      val rew = if (t == "purchase") cents else 0L
      val m = arm(id) == (ts.toLocalDateTime.getHour / 6).toLong
      (rew, m)
    }
    val n = recomputed.size.toLong
    val nm = recomputed.count(_._2).toLong
    val sr = recomputed.map(_._1).sum
    val smr = recomputed.filter(_._2).map(_._1).sum
    assert(r.getAs[Long]("n") == n)
    assert(r.getAs[Long]("n_matched") == nm)
    assert(r.getAs[Long]("sum_r_cents") == sr)
    assert(r.getAs[Long]("sum_matched_r_cents") == smr)
    assert(r.getAs[Long]("v_ips_micros") == 4L * smr * 1000000L / n)
    assert(r.getAs[Long]("v_snips_micros") ==
      (if (nm > 0) smr * 1000000L / nm else 0L))
  }

  test("nelsonAalen: hand-checked hazard and sum-of-floors curve") {
    // three users churned at durations 0, 0, 10; one censored at 10
    // (its last order is within 90 days of the window end)
    def d(s: String) = Timestamp.valueOf(s + " 00:00:00")
    val orders = Seq(
      (1L, d("2024-01-01"), d("2024-01-01")), // dur 0, churned
      (2L, d("2024-01-05"), d("2024-01-05")), // dur 0, churned
      (3L, d("2024-01-01"), d("2024-01-11")), // dur 10, churned
      (4L, d("2024-06-01"), d("2024-06-11"))  // dur 10, censored (last)
    ).flatMap { case (u, f, l) =>
      Seq((u, f), (u, l))
    }.toDF("o_custkey", "o_orderdate")
    val out = Survival.nelsonAalen(orders).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    // duration 0: n_risk 4, d 2 → step = 2e12/4 = 5e11
    assert(out(0L) == ((4L, 2L, 0L, 500000000000L)))
    // duration 10: n_risk 2, d 1, c 1 → cum = 5e11 + 5e11 = 1e12
    assert(out(10L) == ((2L, 1L, 1L, 1000000000000L)))
  }
}
