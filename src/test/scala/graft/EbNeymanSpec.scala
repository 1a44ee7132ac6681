package graft

import java.sql.Timestamp
import graft.operators.Experiment

/** Independent BigInt recomputation + hand pins for the EB/Neyman pair. */
class EbNeymanSpec extends SparkTestBase {

  private def evRows(rows: (Long, String, Double)*) = {
    import spark.implicits._
    rows.zipWithIndex.map { case ((uid, tpe, v), i) =>
      (i.toLong, Timestamp.valueOf("2024-01-01 00:10:00"), uid, tpe, v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  test("ebShrinkage matches a BigInt reimplementation of the MoM chain") {
    // users: (events, purchases): u1 (2,1) u2 (4,1) u3 (2,0) u4 (4,2)
    val users = Map(1L -> (2, 1), 2L -> (4, 1), 3L -> (2, 0), 4L -> (4, 2))
    val rows = users.toSeq.flatMap { case (uid, (n, x)) =>
      (0 until x).map(_ => (uid, "purchase", 1.0)) ++
        (0 until n - x).map(_ => (uid, "click", 0.0))
    }
    val got = Experiment.ebShrinkage(evRows(rows: _*), cohorts = 2)
      .collect().map(r => r.getLong(0) -> r).toMap

    // independent BigInt replay
    val r6 = users.map { case (uid, (n, x)) =>
      uid -> BigInt(x) * 1000000 / n
    }
    val u = BigInt(users.size)
    val sr = r6.values.sum
    val sq = r6.values.map(v => v * v).sum
    val m = sr / u
    val v = (u * sq - sr * sr) / (u * (u - 1))
    val mm = m * (BigInt(1000000) - m) * 1000000 / v - 1000000
    assert(mm > 0)
    val alpha = m * mm / 1000000
    val beta = (BigInt(1000000) - m) * mm / 1000000
    for (c <- Seq(0L, 1L)) {
      val us = users.filter(_._1 % 2 == c)
      val nEv = us.values.map(_._1).sum
      val xs = us.values.map(_._2).sum
      val shrunk =
        (BigInt(xs) * 1000000 + alpha) * 1000000 /
          (BigInt(nEv) * 1000000 + alpha + beta)
      val r = got(c)
      assert(r.getLong(2) === nEv.toLong, "n_events")
      assert(r.getLong(4) === (BigInt(xs) * 1000000 / nEv).toLong, "raw")
      assert(r.getLong(5) === m.toLong, "prior mean")
      assert(r.getLong(6) === mm.toLong, "prior strength")
      assert(r.getLong(9) === shrunk.toLong, "shrunk")
      // shrinkage pulls toward the prior mean
      val raw = r.getLong(4)
      assert((raw - m.toLong).sign * (raw - r.getLong(9)).sign >= 0)
    }
  }

  test("neymanAllocation: exact weights and Hamilton apportionment") {
    // strata by event_type; values in dollars -> cents
    val rows = Seq(
      (1L, "A", 0.0), (1L, "A", 2.0), // Vnum = 2*40000-40000 -> w=200
      (2L, "B", 1.0), (2L, "B", 1.0), // Vnum = 0 -> w=0
      (3L, "C", 0.0), (3L, "C", 3.0), (4L, "C", 3.0)) // w=floor(sqrt(180000))=424
    val got = Experiment.neymanAllocation(evRows(rows: _*), budget = 10L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // W=624: A 2000//624=3 r128; B 0; C 4240//624=6 r496 -> leftover 1 to C
    assert(got("A") === ((2L, 200L, 3L, 3L)))
    assert(got("B") === ((2L, 0L, 0L, 0L)))
    assert(got("C") === ((3L, 424L, 6L, 7L)))
    assert(got.values.map(_._4).sum === 10L) // allocations sum to budget
  }
}
