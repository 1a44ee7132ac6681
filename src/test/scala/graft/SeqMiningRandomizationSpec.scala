package graft

import graft.operators.{Randomization, SeqMining, Wasserstein}
import org.apache.spark.sql.functions._

class SeqMiningRandomizationSpec extends SparkTestBase {

  import spark.implicits._

  private def mkEvents(rows: Seq[(Long, String, String, Double)]) =
    rows.zipWithIndex.map { case ((u, tp, ts, v), i) =>
      (i.toLong, java.sql.Timestamp.valueOf(ts), u, tp, v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  // ---- SeqMining ----------------------------------------------------------

  test("frequentSequences: subsequence (not substring) semantics on a fixture") {
    // one user, one day: view, click, view, purchase
    // 'view>purchase' holds (positions 1<4 or 3<4); 'purchase>view' does not.
    val ev = mkEvents(Seq(
      (1L, "view", "2024-01-01 10:00:00", 1.0),
      (1L, "click", "2024-01-01 10:01:00", 1.0),
      (1L, "view", "2024-01-01 10:02:00", 1.0),
      (1L, "purchase", "2024-01-01 10:03:00", 1.0)))
    val got = SeqMining.frequentSequences(ev).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    // 1 sequence -> minSup = 1/100 + 1 = 1
    assert(got.contains(("view", 1, 1L)))
    assert(got.contains(("view>purchase", 2, 1L)))
    assert(got.contains(("click>view", 2, 1L)))      // non-adjacent pair
    assert(got.contains(("view>click>view", 3, 1L)))
    assert(!got.exists(_._1 == "purchase>view"))
    assert(!got.exists(_._1 == "purchase>click"))
  }

  test("frequentSequences: support counts sequences, not occurrences") {
    // u1 has TWO view->click witnesses in one day: support still 1.
    // u2's day has click before view only.
    val ev = mkEvents(Seq(
      (1L, "view", "2024-01-01 10:00:00", 1.0),
      (1L, "click", "2024-01-01 10:01:00", 1.0),
      (1L, "view", "2024-01-01 10:02:00", 1.0),
      (1L, "click", "2024-01-01 10:03:00", 1.0),
      (2L, "click", "2024-01-01 10:00:00", 1.0),
      (2L, "view", "2024-01-01 10:01:00", 1.0)))
    val got = SeqMining.frequentSequences(ev).collect()
      .map(r => (r.getString(0), r.getLong(2))).toMap
    assert(got("view>click") == 1L)
    assert(got("click>view") == 2L) // u1 (pos 2<3) and u2 (pos 1<2)
    assert(got("view") == 2L)
  }

  test("frequentSequences: the day boundary splits sequences") {
    // same user, different calendar days: 'view>click' never within one
    // sequence unit
    val ev = mkEvents(Seq(
      (1L, "view", "2024-01-01 23:00:00", 1.0),
      (1L, "click", "2024-01-02 01:00:00", 1.0)))
    val got = SeqMining.frequentSequences(ev).collect()
      .map(r => r.getString(0)).toSet
    assert(!got.contains("view>click"))
    assert(got.contains("view") && got.contains("click"))
  }

  test("frequentSequences matches its DuckDB-shaped brute force on sf0.001") {
    // engine (Apriori-pruned) vs an in-Spark brute force over ALL
    // type pairs/triples — pruning must not change the result set.
    val ev = Tables.events(spark, sf)
    val got = SeqMining.frequentSequences(ev).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))

    // brute force replay on collected user-day sequences (sf0.001 small)
    val rows = ev
      .withColumn("blk", date_trunc("day", col("ts")))
      .select(col("user_id"), col("blk"), col("event_type"),
        col("ts"), col("event_id"))
      .collect()
      .map(r => ((r.getLong(0), r.getTimestamp(1)),
        (r.getTimestamp(3).getTime, r.getLong(4), r.getString(2))))
      .groupBy(_._1)
      .map { case (_, es) => es.map(_._2).sortBy(e => (e._1, e._2)).map(_._3).toList }
      .toSeq
    val s = rows.size
    val minSup = s / 100 + 1
    def subseq(pat: List[String], sess: List[String]): Boolean = {
      @annotation.tailrec
      def go(p: List[String], xs: List[String]): Boolean = p match {
        case Nil => true
        case h :: t => xs.dropWhile(_ != h) match {
          case _ :: rest => go(t, rest)
          case Nil => false
        }
      }
      go(pat, sess)
    }
    val alpha = rows.flatten.distinct.sorted
    val pats =
      alpha.map(List(_)) ++
        (for (a <- alpha; b <- alpha) yield List(a, b)) ++
        (for (a <- alpha; b <- alpha; c <- alpha) yield List(a, b, c))
    val expect = pats.flatMap { p =>
      val sup = rows.count(subseq(p, _)).toLong
      if (sup >= minSup) Some((p.mkString(">"), p.size, sup)) else None
    }.toSet
    assert(got.toSet == expect, s"got ${got.length} vs expect ${expect.size}")
  }

  // ---- Randomization ------------------------------------------------------

  test("permTestAb: null data gives a uniform-ish p, planted effect a small p") {
    // Null: every user identical -> every |T_b| == |T_obs| == 0 -> p = 1.
    val nullEv = mkEvents((1L to 200L).map(u =>
      (u, "purchase", "2024-01-01 10:00:00", 10.0)))
    val r0 = Randomization.permTestAb(nullEv).collect()(0)
    assert(r0.getAs[Long]("p_num") == Randomization.B + 1L)
    assert(r0.getAs[Long]("abs_t_obs_num") == 0L)

    // Planted: odd users (variant A) buy 100x more -> no relabeling
    // should reproduce a split this aligned: p at the floor.
    val eff = mkEvents((1L to 200L).map(u =>
      (u, "purchase", "2024-01-01 10:00:00",
        if (u % 2 == 1) 1000.0 else 10.0)))
    val r1 = Randomization.permTestAb(eff).collect()(0)
    assert(r1.getAs[Long]("p_num") == 1L,
      s"planted effect should beat all ${Randomization.B} replicates")
    assert(r1.getAs[Long]("n_a") == 100L && r1.getAs[Long]("n_b") == 100L)
  }

  test("permTestAb: non-purchase events count as zero-revenue units") {
    val ev = mkEvents(Seq(
      (1L, "view", "2024-01-01 10:00:00", 50.0),   // not revenue
      (2L, "purchase", "2024-01-01 10:00:00", 20.0)))
    val r = Randomization.permTestAb(ev).collect()(0)
    assert(r.getAs[Long]("n_users") == 2L)
    // T = sA*nB - sB*nA with A = odd users = {1}: sA=0, sB=2000 cents
    assert(r.getAs[Long]("abs_t_obs_num") == 2000L)
  }

  // ---- Wasserstein --------------------------------------------------------

  test("w1ValueDrift: hand-computed two-point distributions") {
    // type a: values {1.00, 3.00}; type b: {2.00, 4.00} -> W1 = 1.00 (100c)
    val ev = mkEvents(Seq(
      (1L, "a", "2024-01-01 10:00:00", 1.0),
      (2L, "a", "2024-01-01 10:00:00", 3.0),
      (3L, "b", "2024-01-01 10:00:00", 2.0),
      (4L, "b", "2024-01-01 10:00:00", 4.0)))
    val r = Wasserstein.w1ValueDrift(ev).collect()
    assert(r.length == 1)
    val row = r(0)
    assert(row.getAs[Long]("n_a") == 2L && row.getAs[Long]("n_b") == 2L)
    // support 100,200,300,400: gaps 100 each, |cumA*2-cumB*2| = 2,2,2
    // num = 600, den = 4 -> 150 cents? No: terms |1*2-0*2|*100=200,
    // |1*2-1*2|*100=0, |2*2-1*2|*100=200 -> num=400, /4 = 100 cents.
    // exact integers travel as strings (driver-hash canonicalization)
    assert(row.getAs[String]("w1_num") == "400")
    assert(row.getAs[Long]("w1_cents_micros") == 100000000L)
  }

  test("w1ValueDrift: identical distributions give zero") {
    val ev = mkEvents(Seq(
      (1L, "a", "2024-01-01 10:00:00", 5.0),
      (2L, "a", "2024-01-01 10:00:00", 7.0),
      (3L, "b", "2024-01-01 10:00:00", 5.0),
      (4L, "b", "2024-01-01 10:00:00", 7.0)))
    val r = Wasserstein.w1ValueDrift(ev).collect()(0)
    assert(r.getAs[String]("w1_num") == "0")
    assert(r.getAs[Long]("w1_cents_micros") == 0L)
  }

  test("w1ValueDrift: all type pairs appear exactly once, ordered") {
    val ev = Tables.events(spark, sf)
    val rows = Wasserstein.w1ValueDrift(ev).collect()
    val types = ev.select("event_type").distinct().as[String].collect()
    val expected = types.length * (types.length - 1) / 2
    assert(rows.length == expected)
    rows.foreach(r =>
      assert(r.getString(0) < r.getString(1), "pair order violated"))
  }
}
