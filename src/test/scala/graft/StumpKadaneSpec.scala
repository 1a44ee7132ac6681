package graft

import java.sql.Timestamp
import graft.operators.{DecisionStump, Drift, SeqAlign}

class StumpKadaneSpec extends SparkTestBase {

  import spark.implicits._

  test("giniStump finds the perfectly separating threshold") {
    // purchases at 1.00-2.00, clicks at 5.00-6.00: split at 200 cents
    // separates perfectly → cost 0
    val ev = Seq(
      (1L, "purchase", 1.00), (2L, "purchase", 1.50),
      (3L, "purchase", 2.00), (4L, "click", 5.00),
      (5L, "click", 5.50), (6L, "click", 6.00))
      .map { case (i, t, v) =>
        (i, t, Timestamp.valueOf("2024-01-01 10:00:00"), v)
      }.toDF("event_id", "event_type", "ts", "value")
    val r = DecisionStump.giniStump(ev).collect().head
    assert(r.getAs[Long]("threshold_cents") == 200L)
    assert(r.getAs[Long]("cost_micros") == 0L)
    assert(r.getAs[Long]("n_left") == 3L && r.getAs[Long]("pos_left") == 3L)
    assert(r.getAs[Long]("n_right") == 3L && r.getAs[Long]("pos_right") == 0L)
    // root: N=6, P=3 → N·G = (36−9−9)/6 = 3 → 3e6 micros
    assert(r.getAs[Long]("root_cost_micros") == 3000000L)
  }

  test("giniStump ties resolve to the smallest threshold") {
    // symmetric data: thresholds 100 and 200 tie — 100 must win
    val ev = Seq(
      (1L, "purchase", 1.00), (2L, "click", 2.00), (3L, "purchase", 3.00))
      .map { case (i, t, v) =>
        (i, t, Timestamp.valueOf("2024-01-01 10:00:00"), v)
      }.toDF("event_id", "event_type", "ts", "value")
    val r = DecisionStump.giniStump(ev).collect().head
    // costs: t=100 → left(1,1) right(2,1): 0 + 2·(4−1−1)/2 = 1
    //        t=200 → left(2,1) right(1,1): (4−1−1)/2·?  = 1 (symmetric)
    assert(r.getAs[Long]("threshold_cents") == 100L)
    assert(r.getAs[Long]("cost_micros") == 1000000L)
  }

  test("maxBurstWindow: hand-checked window with gap-fill") {
    // hours 0..5 with counts 1,0(gap),1,9,9,1: S=21, n=6, m0=3
    // e = -2,-3,-2,6,6,-2 → best window = hours 3..4 (sum 12)
    val rows = Seq((0, 1), (2, 1), (3, 9), (4, 9), (5, 1)).flatMap {
      case (h, c) => (0 until c).map(k => ((h * 100 + k).toLong, "click",
        Timestamp.valueOf(f"2024-01-01 0$h:15:00")))
    }
    val ev = rows.toDF("event_id", "event_type", "ts")
    val r = SeqAlign.maxBurstWindow(ev).collect().head
    assert(r.getAs[Long]("n_hours") == 6L)
    assert(r.getAs[Long]("m0") == 3L)
    assert(r.getAs[Long]("best_sum") == 12L)
    assert(r.getAs[Long]("burst_hours") == 2L)
    assert(r.getAs[Long]("burst_end_epoch_hour") -
      r.getAs[Long]("burst_start_epoch_hour") == 1L)
  }

  test("maxBurstWindow ties pick the earliest window") {
    // two separated equal bursts: counts 5,1,1,5 → m0=3, e=2,-2,-2,2
    // best = 2 at hour 0 AND hour 3 → earliest (hour 0) wins
    val rows = Seq((0, 5), (1, 1), (2, 1), (3, 5)).flatMap {
      case (h, c) => (0 until c).map(k => ((h * 100 + k).toLong, "view",
        Timestamp.valueOf(f"2024-01-01 0$h:15:00")))
    }
    val ev = rows.toDF("event_id", "event_type", "ts")
    val r = SeqAlign.maxBurstWindow(ev).collect().head
    assert(r.getAs[Long]("best_sum") == 2L)
    assert(r.getAs[Long]("burst_hours") == 1L)
    // hour 0 of 2024-01-01 UTC
    assert(r.getAs[Long]("burst_start_epoch_hour") % 24 == 0L)
  }

  test("maxBurstWindow: burst starting at the first grid hour, length > 1") {
    // counts 5,5,2 → m0 = 12 DIV 3 = 4, e = 1,1,-2, cum = 1,2,0.
    // Best window = hours 0..1 (sum 2) — reachable only via the virtual
    // empty-prefix cut cum_{first-1}=0, which the pre-fix prefix-min
    // omitted for every row after the first (it reported best_sum=1).
    val rows = Seq((0, 5), (1, 5), (2, 2)).flatMap {
      case (h, c) => (0 until c).map(k => ((h * 100 + k).toLong, "click",
        Timestamp.valueOf(f"2024-01-01 0$h:15:00")))
    }
    val ev = rows.toDF("event_id", "event_type", "ts")
    val r = SeqAlign.maxBurstWindow(ev).collect().head
    assert(r.getAs[Long]("m0") == 4L)
    assert(r.getAs[Long]("best_sum") == 2L)
    assert(r.getAs[Long]("burst_hours") == 2L)
    assert(r.getAs[Long]("burst_start_epoch_hour") % 24 == 0L)
  }

  test("cvmDrift: zero for identical distributions, positive for a shift") {
    val same = (0L until 40L).map(i =>
      (i, s"src${i % 2}", "t", (100 + (i % 5)).toInt))
      .toDF("doc_id", "source", "text", "n_chars")
    val out = Drift.cvmDrift(same).collect()
    // both sources see the same n_chars multiset → every CDF gap is 0
    assert(out.forall(_.getAs[Long]("cvm_micros") == 0L))
    val shifted = ((0L until 20L).map(i => (i, "a", "t", 100)) ++
      (20L until 40L).map(i => (i, "b", "t", 500)))
      .toDF("doc_id", "source", "text", "n_chars")
    val out2 = Drift.cvmDrift(shifted).collect()
    // disjoint supports: the gap is 1 at the 20 pooled points of the
    // lower value, 0 at the upper → T = (20·20/40²)·20 = 5 per source
    assert(out2.forall(_.getAs[Long]("cvm_micros") == 5000000L))
  }
}
