package graft

import java.sql.Timestamp
import graft.functions.Mix64
import graft.operators.Privacy

class LdpSpec extends SparkTestBase {

  import spark.implicits._

  private def ev(rows: Seq[(Long, String, String)]) =
    rows.map { case (id, t, d) =>
      (id, t, Timestamp.valueOf(s"$d 10:30:00"))
    }.toDF("event_id", "event_type", "ts")

  private def flips(ids: Seq[Long]): Seq[Boolean] =
    ids.map(id => java.lang.Math.floorMod(
      Mix64.mix(Mix64.mix(id) ^ Privacy.LdpSeed), 4L) == 0L)

  test("mechanism replays the splitmix coin exactly") {
    val rows = (0L until 200L).map(i =>
      (i, if (i % 3 == 0) "purchase" else "click", "2024-01-01"))
    val out = Privacy.ldpRandomizedResponse(ev(rows)).collect()
    assert(out.length == 1)
    val r = out.head
    val b = rows.map(x => if (x._2 == "purchase") 1L else 0L)
    val f = flips(rows.map(_._1))
    val reported = b.zip(f).map { case (bi, fi) => if (fi) 1L - bi else bi }
    assert(r.getAs[Long]("n_events") == 200L)
    assert(r.getAs[Long]("n_true") == b.sum)
    assert(r.getAs[Long]("n_reported") == reported.sum)
    assert(r.getAs[Long]("est_num") == 4L * reported.sum - 200L)
    assert(r.getAs[Long]("est_micros") == (4L * reported.sum - 200L) * 500000L)
    assert(r.getAs[Long]("abs_err_micros") ==
      math.abs((4L * reported.sum - 200L) * 500000L - b.sum * 1000000L))
  }

  test("days aggregate independently and the estimator can go negative") {
    // a day with zero true purchases: est = (4R - n)/2 where R ~ n/4,
    // so est_num = 4R - n straddles 0 — the signed path must be exact
    val rows = (0L until 97L).map(i => (i, "click", "2024-02-02")) ++
      (100L until 140L).map(i => (i, "purchase", "2024-02-03"))
    val out = Privacy.ldpRandomizedResponse(ev(rows))
      .collect().sortBy(_.getTimestamp(0).getTime)
    assert(out.length == 2)
    val d1 = out(0)
    val f1 = flips((0L until 97L))
    val r1 = f1.count(identity).toLong // all b=0: reported = #flips
    assert(d1.getAs[Long]("n_reported") == r1)
    assert(d1.getAs[Long]("est_num") == 4L * r1 - 97L)
    val d2 = out(1)
    val f2 = flips((100L until 140L))
    val r2 = 40L - f2.count(identity).toLong // all b=1: flips report 0
    assert(d2.getAs[Long]("n_reported") == r2)
  }
}
