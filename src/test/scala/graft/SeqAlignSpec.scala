package graft

import java.sql.Timestamp

import graft.operators.SeqAlign
import org.apache.spark.sql.DataFrame

/** SeqAlign (DTW + burst automaton) against independent plain-Scala
  * folds on synthetic series — the engine's array-fold DP must equal a
  * direct imperative implementation (all-integer, so equality is exact).
  */
class SeqAlignSpec extends SparkTestBase {
  import spark.implicits._

  // --- independent reference implementations ------------------------------

  private def dtwRef(a: Array[Long], b: Array[Long]): Long = {
    val n = a.length
    val inf = 1000000000000000L
    var prev = Array.fill(n + 1)(inf); prev(0) = 0L
    for (i <- 1 to n) {
      val cur = Array.fill(n + 1)(inf)
      for (j <- 1 to n)
        cur(j) = math.abs(a(i - 1) - b(j - 1)) +
          math.min(prev(j), math.min(prev(j - 1), cur(j - 1)))
      prev = cur
    }
    prev(n)
  }

  /** Forward-backward min-sum decode (the operator's rule: tie → 0). */
  private def burstRef(xs: Array[Long]): (Long, Array[Int]) = {
    val t = xs.length
    val l0 = xs.sum / t
    val l1 = 2 * l0 + 1
    val gam = l0 + 1
    def e(x: Long, s: Int): Long = math.abs(x - (if (s == 0) l0 else l1))
    val f0 = new Array[Long](t); val f1 = new Array[Long](t)
    f0(0) = e(xs(0), 0); f1(0) = gam + e(xs(0), 1)
    for (i <- 1 until t) {
      f0(i) = e(xs(i), 0) + math.min(f0(i - 1), f1(i - 1) + gam)
      f1(i) = e(xs(i), 1) + math.min(f1(i - 1), f0(i - 1) + gam)
    }
    val g0 = new Array[Long](t); val g1 = new Array[Long](t)
    for (i <- t - 2 to 0 by -1) {
      g0(i) = math.min(g0(i + 1) + e(xs(i + 1), 0),
        g1(i + 1) + e(xs(i + 1), 1) + gam)
      g1(i) = math.min(g1(i + 1) + e(xs(i + 1), 1),
        g0(i + 1) + e(xs(i + 1), 0) + gam)
    }
    val states = Array.tabulate(t)(i =>
      if (f1(i) + g1(i) < f0(i) + g0(i)) 1 else 0)
    (math.min(f0(t - 1), f1(t - 1)), states)
  }

  // --- fixtures ------------------------------------------------------------

  /** Synthetic events: hour-of-day h of day d gets `counts(type)(h)` rows. */
  private def eventsFor(counts: Map[String, Array[Int]]): DataFrame = {
    val rows = for {
      (tpe, cs) <- counts.toSeq
      (c, h) <- cs.zipWithIndex
      k <- 0 until c
    } yield (Timestamp.valueOf(f"2024-01-01 $h%02d:${k % 60}%02d:00"), tpe)
    rows.toDF("ts", "event_type")
  }

  test("dtwProfiles equals the imperative DP on synthetic profiles") {
    val pa = Array.tabulate(24)(h => if (h < 12) 3 else 0)
    val pb = Array.tabulate(24)(h => if (h >= 2 && h < 14) 3 else 0) // shifted
    val pc = Array.tabulate(24)(h => h % 4)
    val df = SeqAlign.dtwProfiles(
      eventsFor(Map("a" -> pa, "b" -> pb, "c" -> pc)))
    val got = df.collect().map(r =>
      (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    val profs = Map("a" -> pa.map(_.toLong), "b" -> pb.map(_.toLong),
      "c" -> pc.map(_.toLong))
    assert(got.keySet === Set(("a", "b"), ("a", "c"), ("b", "c")))
    for (((ta, tb), (dtw, l1)) <- got) {
      val (va, vb) = (profs(ta), profs(tb))
      assert(dtw === dtwRef(va, vb), s"pair $ta/$tb")
      assert(l1 === va.zip(vb).map { case (x, y) => math.abs(x - y) }.sum)
      assert(dtw <= l1, "warping can only lower the alignment cost")
    }
    // the shifted twin must warp much cheaper than it L1-compares
    val (dtwAb, l1Ab) = got(("a", "b"))
    assert(dtwAb < l1Ab)
  }

  test("dtwProfiles on harness events: bounds + pair frame shape") {
    val df = SeqAlign.dtwProfiles(Tables.events(spark, sf))
    val rows = df.collect()
    val nTypes = Tables.events(spark, sf)
      .select("event_type").distinct().count()
    assert(rows.length === nTypes * (nTypes - 1) / 2)
    rows.foreach { r =>
      assert(r.getLong(2) >= 0 && r.getLong(2) <= r.getLong(3))
    }
  }

  test("viterbiBursts equals the imperative forward-backward decode") {
    // three days of hourly events: quiet base with a 5-hour surge
    val base = Array.tabulate(24)(h => if (h >= 8 && h < 13) 9 else 1)
    val rows = for {
      d <- 1 to 3
      (c, h) <- base.zipWithIndex
      k <- 0 until c
    } yield (Timestamp.valueOf(f"2024-01-0$d $h%02d:${k % 60}%02d:00"), "e")
    val ev = rows.toDF("ts", "event_type")
    val xs = Array.tabulate(72)(i => base(i % 24).toLong)
    val (cost, states) = burstRef(xs)
    val got = SeqAlign.viterbiBursts(ev).collect()
    assert(got.nonEmpty, "the surge must decode as bursts")
    got.foreach(r => assert(r.getLong(6) === cost))
    // islands reconstruct exactly the reference's burst-hour set
    val burstHours = got.flatMap { r =>
      val s = r.getTimestamp(1).getTime
      val e = r.getTimestamp(2).getTime
      (s to e by 3600000L)
    }.toSet
    val refHours = states.zipWithIndex.collect { case (1, i) =>
      Timestamp.valueOf("2024-01-01 00:00:00").getTime + i * 3600000L
    }.toSet
    assert(burstHours === refHours)
    // islands are disjoint, ordered, and sized consistently
    val sorted = got.sortBy(_.getInt(0))
    sorted.sliding(2).foreach {
      case Array(p, n) =>
        assert(p.getTimestamp(2).before(n.getTimestamp(1)))
      case _ =>
    }
    sorted.foreach { r =>
      val hours =
        (r.getTimestamp(2).getTime - r.getTimestamp(1).getTime) / 3600000 + 1
      assert(r.getLong(3) === hours)
    }
  }
}
