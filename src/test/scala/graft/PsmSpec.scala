package graft

import java.sql.Timestamp

import graft.operators.Experiment

/** Hand-computed pin for caliper PSM matching. */
class PsmSpec extends SparkTestBase {

  test("psmAtt: nearest control within caliper, ties to smaller id") {
    import spark.implicits._
    def burst(u: Long, n: Int, conv: Boolean) = {
      val pre = (1 to n).map(i => (u * 1000 + i, u, "view", 1.0,
        Timestamp.valueOf("2024-01-05 00:00:00")))
      val post = if (conv)
        Seq((u * 1000 + 999, u, "purchase", 1.0,
          Timestamp.valueOf("2024-01-30 00:00:00")))
      else Seq((u * 1000 + 998, u, "view", 1.0,
        Timestamp.valueOf("2024-01-30 00:00:00")))
      pre ++ post
    }
    // treated: u1 score 20 (converts), u3 score 50 (no).
    // controls: u2 score 22 (no), u4 score 24 (no), u6 score 100 (yes).
    // caliper 10: u1 → nearest control u2 (gap 2); u3 → none in caliper.
    // ATT over 1 matched pair: (1 − 0) → 1e6 micros.
    val events = (burst(1, 20, true) ++ burst(3, 50, false) ++
      burst(2, 22, false) ++ burst(4, 24, false) ++ burst(6, 100, true))
      .toDF("event_id", "user_id", "event_type", "value", "ts")
    val r = Experiment.psmAtt(events, caliper = 10L).collect().head
    assert(r.getAs[Long]("n_treated") == 2L)
    assert(r.getAs[Long]("n_matched") == 1L)
    assert(r.getAs[Long]("sum_yt") == 1L && r.getAs[Long]("sum_yc") == 0L)
    assert(r.getAs[Long]("mean_score_gap_micros") == 2000000L)
    assert(r.getAs[Long]("att_micros") == 1000000L)
  }

  test("psmAtt: negative ATT survives the sign-separated division") {
    import spark.implicits._
    val ts0 = Timestamp.valueOf("2024-01-05 00:00:00")
    val tsP = Timestamp.valueOf("2024-01-30 00:00:00")
    // treated u1 (score 5, no conv); control u2 (score 5, converts)
    val events = Seq(
      (1L, 1L, "view", 1.0, ts0), (2L, 1L, "view", 1.0, ts0),
      (3L, 1L, "view", 1.0, ts0), (4L, 1L, "view", 1.0, ts0),
      (5L, 1L, "view", 1.0, ts0), (6L, 1L, "view", 1.0, tsP),
      (11L, 2L, "view", 1.0, ts0), (12L, 2L, "view", 1.0, ts0),
      (13L, 2L, "view", 1.0, ts0), (14L, 2L, "view", 1.0, ts0),
      (15L, 2L, "view", 1.0, ts0), (16L, 2L, "purchase", 1.0, tsP))
      .toDF("event_id", "user_id", "event_type", "value", "ts")
    val r = Experiment.psmAtt(events, caliper = 10L).collect().head
    assert(r.getAs[Long]("n_matched") == 1L)
    assert(r.getAs[Long]("att_micros") == -1000000L)
  }
}
