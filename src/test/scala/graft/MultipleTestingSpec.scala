package graft

import java.sql.Timestamp
import graft.operators.MultipleTesting

class MultipleTestingSpec extends SparkTestBase {

  import spark.implicits._

  private def ts(hour: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 $hour%02d:00:00")

  private def events(
      rows: Seq[(Long, Long, String, Int, Double)]) =
    rows.map { case (id, u, t, h, v) => (id, u, t, ts(h), v) }
      .toDF("event_id", "user_id", "event_type", "ts", "value")

  test("null data: constant outcomes give p = 1 and no rejections") {
    // every user has identical value → every |T| = 0 → exceed = B
    val ev = events((0 until 40).map(i =>
      (i.toLong, i.toLong, if (i % 2 == 0) "click" else "view",
        (i % 4) * 6, 5.0)))
    val out = MultipleTesting.bhFdr(ev).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("p_num") == 65L)
      assert(r.getAs[Long]("p_den") == 65L)
      assert(!r.getAs[Boolean]("rejected"))
      assert(r.getAs[Long]("p_adj_micros") == 1000000L)
    }
  }

  test("strong signal in a single stratum is rejected at q = 0.05") {
    // one stratum (one type, one day-part), odd users worth 100, even 0
    val ev = events((0 until 60).map(i =>
      (i.toLong, i.toLong, "purchase", 2,
        if (i % 2 == 1) 100.0 else 0.0)))
    val out = MultipleTesting.bhFdr(ev).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("m_tests") == 1L)
    assert(r.getAs[Long]("p_num") == 1L) // no replicate beats the truth
    assert(r.getAs[Boolean]("bh_pass") && r.getAs[Boolean]("rejected"))
  }

  test("BH invariants: ranks, step-up consistency, monotone adjusted p") {
    // mixed: types x day-parts, one stratum loaded with signal
    val rows = (0 until 240).map { i =>
      val t = Seq("click", "view", "purchase")(i % 3)
      val h = (i % 4) * 6
      val v = if (t == "purchase" && h == 0)
        (if (i % 2 == 1) 50.0 else 1.0)
      else (i % 7).toDouble
      (i.toLong, (i % 40).toLong, t, h, v)
    }
    val out = MultipleTesting.bhFdr(events(rows)).collect()
    val m = out.length
    assert(out.map(_.getAs[Long]("k_rank")).toSeq == (1 to m).map(_.toLong))
    assert(out.forall(_.getAs[Long]("m_tests") == m.toLong))
    // step-up definition holds row by row
    out.foreach { r =>
      val pass = 20L * r.getAs[Long]("p_num") * m <=
        65L * r.getAs[Long]("k_rank")
      assert(r.getAs[Boolean]("bh_pass") == pass)
    }
    // rejected set is exactly ranks 1..k*
    val kstar = out.filter(_.getAs[Boolean]("bh_pass"))
      .map(_.getAs[Long]("k_rank")).maxOption.getOrElse(0L)
    out.foreach { r =>
      assert(r.getAs[Boolean]("rejected") ==
        (r.getAs[Long]("k_rank") <= kstar))
    }
    // adjusted p is non-decreasing in rank and never exceeds 1
    val adj = out.sortBy(_.getAs[Long]("k_rank"))
      .map(_.getAs[Long]("p_adj_micros"))
    assert(adj.zip(adj.tail).forall { case (a, b) => a <= b })
    assert(adj.forall(_ <= 1000000L))
  }
}
