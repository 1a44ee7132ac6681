package graft

import java.sql.Timestamp

import graft.operators.Shapley

/** Hand-computed pins for exact Shapley attribution. */
class ShapleySpec extends SparkTestBase {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def ev(rows: (Long, Long, String, String)*) = {
    import spark.implicits._
    rows.map { case (id, u, t, when) => (id, u, t, 1.0, ts(when)) }
      .toDF("event_id", "user_id", "event_type", "value", "ts")
  }

  test("two-channel lattice matches the hand computation") {
    // u1: click→purchase, u2: view→purchase, u3: click+view→purchase,
    // u4: purchase only. v(∅)=1, v(c)=2, v(v)=2, v(cv)=4.
    // φ_c·2! = 1·(2−1) + 1·(4−2) = 3 = φ_v·2!; Σ = 2!·(4−1).
    val df = ev(
      (1L, 1L, "click", "2024-01-01 00:00:00"),
      (2L, 1L, "purchase", "2024-01-01 01:00:00"),
      (3L, 2L, "view", "2024-01-01 00:00:00"),
      (4L, 2L, "purchase", "2024-01-01 01:00:00"),
      (5L, 3L, "click", "2024-01-01 00:00:00"),
      (6L, 3L, "view", "2024-01-01 00:30:00"),
      (7L, 3L, "purchase", "2024-01-01 01:00:00"),
      (8L, 4L, "purchase", "2024-01-01 01:00:00"))
    val got = Shapley.shapleyAttribution(df)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got("click") === ((3L, 4L, 3L, 500000L)))
    assert(got("view") === ((3L, 4L, 3L, 500000L)))
  }

  test("post-purchase touches earn no credit; efficiency holds on sf") {
    // channel AFTER the first purchase must not enter the journey mask
    val df = ev(
      (1L, 1L, "purchase", "2024-01-01 01:00:00"),
      (2L, 1L, "click", "2024-01-01 02:00:00"),
      (3L, 2L, "click", "2024-01-01 00:00:00"),
      (4L, 2L, "purchase", "2024-01-01 01:00:00"))
    val got = Shapley.shapleyAttribution(df)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // v(∅)=1 (u1), v({click})=2: φ_click·1! = 1
    assert(got("click") == 1L)

    // efficiency on the real table: Σφ·|C|! = |C|!·attributable
    val events = graft.Tables.events(spark, sf)
    val rows = Shapley.shapleyAttribution(events).collect()
    val nc = rows.length
    val factNc = (1 to nc).foldLeft(1L)(_ * _)
    assert(rows.map(_.getLong(1)).sum == factNc * rows.head.getLong(3))
  }
}
