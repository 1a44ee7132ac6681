package graft

import java.sql.Timestamp

import graft.operators.{Drift, Evolution}

/** Hand-computed fixtures for the table-evolution operators (SCD2,
  * snapshot diff, incremental merge) and the drift monitors (KS, PSI,
  * temperature mixture). The driver's DuckDB oracle covers these at corpus
  * scale; these pin the semantics on inputs small enough to verify by hand.
  */
class EvolutionDriftSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def half4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  // ---- SCD2 ---------------------------------------------------------------

  test("scd2History: runs collapse, valid_to chains, is_current on last") {
    val orders = Seq(
      // customer 1: HIGH, HIGH, LOW, HIGH -> 3 versions (runs)
      (1L, ts("1995-01-01 00:00:00"), 10L, "HIGH"),
      (1L, ts("1995-02-01 00:00:00"), 11L, "HIGH"),
      (1L, ts("1995-03-01 00:00:00"), 12L, "LOW"),
      (1L, ts("1995-04-01 00:00:00"), 13L, "HIGH"),
      // customer 2: single order -> one current version
      (2L, ts("1996-01-01 00:00:00"), 20L, "MED")
    ).toDF("o_custkey", "o_orderdate", "o_orderkey", "o_orderpriority")
    val got = Evolution.scd2History(orders).collect()
    assert(got.length == 4)
    val c1 = got.filter(_.getLong(0) == 1L)
    assert(c1.map(_.getLong(1)).toSeq == Seq(1L, 2L, 3L))
    assert(c1.map(_.getString(2)).toSeq == Seq("HIGH", "LOW", "HIGH"))
    // run 1 spans two orders; valid_to = next run's valid_from
    assert(c1(0).getLong(6) == 2L)
    assert(c1(0).getTimestamp(4) == ts("1995-03-01 00:00:00"))
    assert(c1(1).getTimestamp(4) == ts("1995-04-01 00:00:00"))
    assert(c1(2).isNullAt(4) && c1(2).getBoolean(5))
    assert(!c1(0).getBoolean(5) && !c1(1).getBoolean(5))
    val c2 = got.filter(_.getLong(0) == 2L)
    assert(c2.length == 1 && c2(0).getBoolean(5) && c2(0).getLong(6) == 1L)
  }

  test("scd2History: same-date orders break ties by orderkey") {
    val orders = Seq(
      (1L, ts("1995-01-01 00:00:00"), 2L, "B"),
      (1L, ts("1995-01-01 00:00:00"), 1L, "A")
    ).toDF("o_custkey", "o_orderdate", "o_orderkey", "o_orderpriority")
    val got = Evolution.scd2History(orders).collect()
    // orderkey 1 (A) sorts first -> A then B
    assert(got.map(_.getString(2)).toSeq == Seq("A", "B"))
    assert(got(1).getBoolean(5))
  }

  // ---- snapshot diff ------------------------------------------------------

  test("snapshotDiff: added/changed classified, unchanged dropped, cents") {
    val orders = Seq(
      // cust 1: one order before t1, one between t1 and t2 -> changed
      (1L, ts("1998-06-01 00:00:00"), 1L, 10.10),
      (1L, ts("1999-06-01 00:00:00"), 2L, 5.05),
      // cust 2: only before t1 -> unchanged (dropped)
      (2L, ts("1998-01-01 00:00:00"), 3L, 7.00),
      // cust 3: only between t1 and t2 -> added
      (3L, ts("1999-03-01 00:00:00"), 4L, 2.50),
      // cust 4: only after t2 -> not in either snapshot (absent)
      (4L, ts("2000-06-01 00:00:00"), 5L, 9.99)
    ).toDF("o_custkey", "o_orderdate", "o_orderkey", "o_totalprice")
    val got = Evolution.snapshotDiff(orders,
      "1999-01-01 00:00:00", "2000-01-01 00:00:00").collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(1L, 3L))
    val c1 = got(0)
    assert(c1.getString(1) == "changed")
    assert(c1.getLong(2) == 1L && c1.getLong(3) == 2L && c1.getLong(4) == 1L)
    assert(c1.getLong(5) == 1010L && c1.getLong(6) == 1515L &&
      c1.getLong(7) == 505L)
    val c3 = got(1)
    assert(c3.getString(1) == "added" && c3.getLong(2) == 0L &&
      c3.getLong(5) == 0L && c3.getLong(6) == 250L)
  }

  // ---- incremental merge --------------------------------------------------

  test("incrementalMerge: merged partials equal full recompute, any split") {
    val events = Seq(
      (1L, ts("2024-01-16 12:10:00"), "a", 1.00),
      (2L, ts("2024-01-16 12:40:00"), "a", 2.00), // same hour, other side
      (3L, ts("2024-01-16 12:50:00"), "b", 3.50),
      (4L, ts("2024-01-16 13:05:00"), "a", 0.25)
    ).toDF("event_id", "ts", "event_type", "value")
    val got = Evolution.incrementalMerge(events, "2024-01-16 12:30:00")
      .collect()
    assert(got.length == 3)
    val h12a = got(0)
    assert(h12a.getTimestamp(0) == ts("2024-01-16 12:00:00"))
    assert(h12a.getLong(2) == 2L && h12a.getLong(3) == 300L &&
      h12a.getLong(4) == 100L && h12a.getLong(5) == 200L)
    assert(h12a.getDouble(6) == 1.5)
    // split before everything and after everything give the same answer
    // (one side's partial frame is empty — union degenerates cleanly)
    val early = Evolution.incrementalMerge(events, "2024-01-01 00:00:00")
    val late = Evolution.incrementalMerge(events, "2025-01-01 00:00:00")
    assert(early.collect().toSeq == got.toSeq)
    assert(late.collect().toSeq == got.toSeq)
  }

  // ---- KS drift -----------------------------------------------------------

  test("ksDrift: hand-computed D for a two-source split") {
    // src A: values {1, 2}; src B: values {2, 3}.
    // Grid {1,2,3}: F_A = 1/2, 1, 1 ; F_B = 0, 1/2, 1 -> D = 1/2 at x<=2.
    val docs = Seq(
      (1L, "A", 1L), (2L, "A", 2L), (3L, "B", 2L), (4L, "B", 3L)
    ).toDF("doc_id", "source", "n_chars")
    val got = Drift.ksDrift(docs).collect()
    assert(got.map(_.getString(0)).toSeq == Seq("A", "B"))
    got.foreach { r =>
      assert(r.getLong(1) == 2L && r.getLong(2) == 2L)
      assert(r.getDouble(3) == 0.5)
      assert(r.getDouble(4) == half4(math.sqrt(4.0 / 4.0) * 0.5))
    }
  }

  test("ksDrift: identical distributions give D = 0") {
    val docs = Seq(
      (1L, "A", 5L), (2L, "A", 9L), (3L, "B", 5L), (4L, "B", 9L)
    ).toDF("doc_id", "source", "n_chars")
    assert(Drift.ksDrift(docs).collect().forall(_.getDouble(3) == 0.0))
  }

  // ---- PSI ----------------------------------------------------------------

  test("psiDrift: bins span baseline range, out-of-range clamps to edges") {
    // Baseline (< split): values 0..10 -> bmin=0, bmax=10, width-1 bins.
    // Current: -5 clamps to bin 0, 25 clamps to bin 9, 10 lands in bin 9.
    val base = (0 to 10).map(i =>
      (i.toLong, ts("2024-01-10 00:00:00"), "e", i.toDouble))
    val cur = Seq(
      (100L, ts("2024-01-20 00:00:00"), "e", -5.0),
      (101L, ts("2024-01-20 00:00:00"), "e", 25.0),
      (102L, ts("2024-01-20 00:00:00"), "e", 10.0))
    val events = (base ++ cur).toDF("event_id", "ts", "event_type", "value")
    val got = Drift.psiDrift(events, "2024-01-16 00:00:00").collect()
    val byBin = got.map(r => r.getInt(0) -> r).toMap
    assert(byBin(0).getLong(2) == 1L) // the clamped -5
    assert(byBin(9).getLong(2) == 2L) // 25 clamped + 10 at the top edge
    assert(byBin(9).getLong(1) == 2L) // baseline 9 and 10 both in bin 9
    // last psi_cum = total PSI; compare against the sum of the ROUNDED
    // per-bin terms, so allow bins x half-a-rounding-grid of slack
    val terms = got.map(_.getDouble(5))
    assert(math.abs(got.last.getDouble(6) - terms.sum) < terms.length * 5e-5)
  }

  test("psiDrift: identical halves give ~zero PSI") {
    val mk = (off: Long, day: String) => (1 to 20).map(i =>
      (off + i, ts(s"2024-01-$day 00:00:00"), "e", (i % 5).toDouble + 1.0))
    val events = (mk(0L, "10") ++ mk(100L, "20"))
      .toDF("event_id", "ts", "event_type", "value")
    val got = Drift.psiDrift(events, "2024-01-16 00:00:00").collect()
    assert(math.abs(got.last.getDouble(6)) < 1e-9)
    got.foreach(r => assert(r.getLong(1) == r.getLong(2)))
  }

  // ---- temperature mixture ------------------------------------------------

  test("temperatureMixture: alpha=1 is the natural distribution") {
    val docs = Seq(
      (1L, "A", "w w w"), (2L, "B", "w")
    ).toDF("doc_id", "source", "text")
    val got = Drift.temperatureMixture(docs, alpha = 1.0, budgetTokens = 100L)
      .collect()
    val byS = got.map(r => r.getString(0) -> r).toMap
    assert(byS("A").getLong(1) == 3L && byS("B").getLong(1) == 1L)
    assert(byS("A").getDouble(3) == 0.75 && byS("B").getDouble(3) == 0.25)
    assert(byS("A").getDouble(5) == 1.0 && byS("B").getDouble(5) == 1.0)
  }

  test("temperatureMixture: alpha<1 upsamples the tail source") {
    val docs = Seq(
      (1L, "A", Seq.fill(99)("w").mkString(" ")), (2L, "B", "w")
    ).toDF("doc_id", "source", "text")
    val got = Drift.temperatureMixture(docs, alpha = 0.3,
      budgetTokens = 1000000L).collect()
    val byS = got.map(r => r.getString(0) -> r).toMap
    // q_B ∝ 0.01^0.3, q_A ∝ 0.99^0.3 -> B oversampled, A undersampled
    assert(byS("B").getDouble(5) > 1.0 && byS("A").getDouble(5) < 1.0)
    val wA = math.pow(0.99, 0.3); val wB = math.pow(0.01, 0.3)
    assert(byS("B").getDouble(3) == half4(wB / (wA + wB)))
    // expected tokens sum ~ budget
    assert(math.abs(got.map(_.getDouble(4)).sum - 1000000.0) < 1.0)
  }
}
