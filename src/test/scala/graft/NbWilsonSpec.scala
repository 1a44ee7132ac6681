package graft

import java.sql.Timestamp

import graft.operators.Experiment

/** Fixture pins for the NB moment fit and Wilson intervals. */
class NbWilsonSpec extends SparkTestBase {

  private val ts0 = Timestamp.valueOf("2024-01-05 00:00:00")

  test("nbFit: overdispersed planted counts recover p and r") {
    import spark.implicits._
    // users: counts 0, 0, 0, 8 → n=4, S=8, Q=64, zeros=3.
    // mean = 2; var = (4·64 − 64)/16 = 12; overdispersed.
    // p = m/v = 2/12 → 166666 micros; r = m²/(v−m) = 4/10 → 400000.
    val rows =
      (1 to 8).map(i => (i.toLong, 4L, "purchase", 1.0, ts0)) ++
      Seq((20L, 1L, "view", 1.0, ts0), (21L, 2L, "view", 1.0, ts0),
        (22L, 3L, "view", 1.0, ts0))
    val events = rows.toDF("event_id", "user_id", "event_type", "value",
      "ts")
    val r = Experiment.nbFit(events).collect().head
    assert(r.getAs[Long]("n_users") == 4L)
    assert(r.getAs[Long]("mean_micros") == 2000000L)
    assert(r.getAs[Long]("var_micros") == 12000000L)
    assert(r.getAs[Boolean]("overdispersed"))
    assert(r.getAs[Long]("nb_p_micros") == 166666L)
    assert(r.getAs[Long]("nb_r_micros") == 400000L)
    assert(r.getAs[Long]("zero_ppm") == 750000L)
  }

  test("nbFit: equidispersed counts yield NULL r") {
    import spark.implicits._
    // counts 1,1 → var 0 < mean: not overdispersed, r undefined
    val events = Seq(
      (1L, 1L, "purchase", 1.0, ts0), (2L, 2L, "purchase", 1.0, ts0))
      .toDF("event_id", "user_id", "event_type", "value", "ts")
    val r = Experiment.nbFit(events).collect().head
    assert(!r.getAs[Boolean]("overdispersed"))
    assert(r.isNullAt(r.fieldIndex("nb_r_micros")))
  }

  test("srmCheck: planted imbalance trips the alarm") {
    import spark.implicits._
    // 40 control users vs 10 treated: chi2 = 30²/50 = 18 > 3.84
    val rows = (1 to 40).map(i => (i.toLong, i.toLong * 2, "view", 1.0,
      ts0)) ++ (1 to 10).map(i => (100L + i, i.toLong * 2 + 1, "view",
      1.0, ts0))
    val events = rows.toDF("event_id", "user_id", "event_type", "value",
      "ts")
    val r = Experiment.srmCheck(events).collect().head
    assert(r.getAs[Long]("n_control") == 40L)
    assert(r.getAs[Long]("n_treated") == 10L)
    assert(r.getAs[Long]("delta_ppm") == -600000L)
    assert(r.getAs[Double]("chi2") == 18.0)
    assert(r.getAs[Boolean]("srm_alarm"))
  }

  test("abWilson: interval brackets the rate and tightens with n") {
    import spark.implicits._
    val small = (1 to 10).map(i => (i.toLong, (i % 2).toLong,
      if (i <= 4) "purchase" else "view", 1.0, ts0))
    val events = small.toDF("event_id", "user_id", "event_type", "value",
      "ts")
    val rows = Experiment.abWilson(events).collect()
    rows.foreach { r =>
      val p = r.getAs[Long]("rate_micros").toDouble / 1e6
      assert(r.getAs[Double]("wilson_lo") <= p + 1e-6)
      assert(r.getAs[Double]("wilson_hi") >= p - 1e-6)
      assert(r.getAs[Double]("wilson_lo") >= 0.0 &&
        r.getAs[Double]("wilson_hi") <= 1.0)
    }
  }
}
