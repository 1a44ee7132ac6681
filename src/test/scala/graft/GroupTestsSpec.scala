package graft

import java.sql.Timestamp
import graft.operators.GroupTests

class GroupTestsSpec extends SparkTestBase {

  import spark.implicits._

  private def ev(rows: Seq[(String, Int, Double)]) =
    rows.zipWithIndex.map { case ((t, h, v), i) =>
      (i.toLong, t, Timestamp.valueOf(f"2024-01-01 $h%02d:30:00"), v)
    }.toDF("event_id", "event_type", "ts", "value")

  test("kruskalWallis: hand-checked no-tie case") {
    // groups a={1,2}, b={3,4} cents ranks 1..4: R_a=3, R_b=7, N=4
    // H = 12/(4*5)*(9/2+49/2) - 3*5 = 0.6*29 - 15 = 2.4
    val df = ev(Seq(("a", 1, 0.01), ("a", 1, 0.02),
      ("b", 1, 0.03), ("b", 1, 0.04)))
    val out = GroupTests.kruskalWallis(df).collect()
      .map(r => r.getString(0) -> r).toMap
    // R2_a = 2+4 = 6, R2_b = 10+14 = 24... rank2 of v-th distinct:
    // 2*cumb+1+1 = 2,4? ranks doubled: 2,4,6,8 → R2_a=6, R2_b=14
    assert(out("a").getAs[Long]("r2_g") == 6L)
    assert(out("b").getAs[Long]("r2_g") == 14L)
    // terms: 3*36e6/(20*2)=2_700_000; 3*196e6/(20*2)=14_700_000
    // H = 17_400_000 - 15_000_000 = 2_400_000 ✓ = 2.4
    assert(out("a").getAs[Long]("h_micros") == 2400000L)
    // no ties → t_sum = 0 → tie-adjusted equals H
    assert(out("a").getAs[Long]("h_tie_micros") == 2400000L)
  }

  test("kruskalWallis: identical groups score H = 0 exactly") {
    val df = ev(Seq(("a", 1, 0.05), ("a", 1, 0.07),
      ("b", 1, 0.05), ("b", 1, 0.07)))
    val out = GroupTests.kruskalWallis(df).collect()
    // symmetric rank sums → Σ floors hits H = 0 with no floor loss here
    assert(out.forall(_.getAs[Long]("h_micros") == 0L))
  }

  test("cochranArmitage: positive trend detected, flat trend is zero") {
    // purchase rate rises with day-part: parts 0..3 get 0,1,2,3
    // purchases of 3 events each
    val rows = for {
      w <- 0 to 3; j <- 0 until 3
    } yield (if (j < w) "purchase" else "click", w * 6 + 1, 1.0)
    val r = GroupTests.cochranArmitage(ev(rows)).collect().head
    assert(r.getAs[Long]("t_num") > 0L)
    assert(r.getAs[Long]("z2_micros") > 0L)
    // flat: same purchase count in every part → T' = 0
    val flat = for {
      w <- 0 to 3; j <- 0 until 3
    } yield (if (j == 0) "purchase" else "click", w * 6 + 1, 1.0)
    val f = GroupTests.cochranArmitage(ev(flat)).collect().head
    assert(f.getAs[Long]("t_num") == 0L)
    assert(f.getAs[Long]("z2_micros") == 0L)
  }

  test("cochranArmitage: degenerate corpora define Z² = 0, not NULL") {
    // single-class (no purchases): p = 0 → denominator 0 → contract 0
    val noPos = for (w <- 0 to 3; _ <- 0 until 3)
      yield ("click", w * 6 + 1, 1.0)
    val n = GroupTests.cochranArmitage(ev(noPos)).collect().head
    assert(!n.isNullAt(n.fieldIndex("z2_micros")))
    assert(n.getAs[Long]("z2_micros") == 0L)
    // zero score variance (all events in one day-part): same contract
    val oneBin = Seq(("purchase", 1, 1.0), ("click", 1, 1.0),
      ("click", 2, 1.0))
    val o = GroupTests.cochranArmitage(ev(oneBin)).collect().head
    assert(!o.isNullAt(o.fieldIndex("z2_micros")))
    assert(o.getAs[Long]("z2_micros") == 0L)
  }

  test("brownForsythe: equal spreads score near zero, unequal large") {
    // group a spread {1,3}, group b spread {1,3} (same dispersion,
    // different centers) → z-values identical → between term 0
    val same = ev(Seq(("a", 1, 0.01), ("a", 1, 0.03),
      ("b", 1, 0.11), ("b", 1, 0.13)))
    val s = GroupTests.brownForsythe(same).collect()
    assert(s.forall(_.getAs[Long]("w_micros") == 0L))
    // group b wildly more dispersed → W > 0
    val diff = ev(Seq(("a", 1, 0.10), ("a", 1, 0.10), ("a", 1, 0.10),
      ("b", 1, 0.01), ("b", 1, 1.00), ("b", 1, 5.00)))
    val d = GroupTests.brownForsythe(diff).collect()
    assert(d.forall(_.getAs[Long]("w_micros") > 0L))
  }

  test("jonckheereTerpstra: hand-checked ordered shift") {
    // daypart 0 values {1,2}, daypart 1 values {3,4}: all 4 cross pairs
    // are wins for the later group → JT = 4 → JT2 = 8; E[JT2] =
    // (16 − 8)/2 = 4 → centered +4
    val df = ev(Seq(("click", 1, 0.01), ("click", 2, 0.02),
      ("click", 7, 0.03), ("click", 8, 0.04)))
    val out = GroupTests.jonckheereTerpstra(df).collect()
    assert(out.length == 2)
    out.foreach { r =>
      assert(r.getAs[Long]("jt2") == 8L)
      assert(r.getAs[Long]("e_jt2") == 4L)
      assert(r.getAs[Long]("jt2_minus_e") == 4L)
    }
    // ties: both groups all at one value → JT2 = ties = n0·n1 = 4 = E
    val tied = ev(Seq(("click", 1, 0.05), ("click", 2, 0.05),
      ("click", 7, 0.05), ("click", 8, 0.05)))
    val t = GroupTests.jonckheereTerpstra(tied).collect().head
    assert(t.getAs[Long]("jt2") == 4L)
    assert(t.getAs[Long]("jt2_minus_e") == 0L)
  }

  test("brownForsythe medians are exact lower medians per group") {
    val df = ev(Seq(("a", 1, 0.01), ("a", 1, 0.02), ("a", 1, 0.09),
      ("b", 1, 0.04), ("b", 1, 0.08)))
    val out = GroupTests.brownForsythe(df).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("median_cents")).toMap
    assert(out("a") == 2L) // n=3 → rank 2 of {1,2,9}
    assert(out("b") == 4L) // n=2 → rank 1 of {4,8} (lower median)
  }
}
