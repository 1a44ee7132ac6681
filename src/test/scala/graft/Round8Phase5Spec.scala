package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.{Centrality, DataQuality}
import graft.queries.Analytics

/** Fixture-level contracts for the round-8 phase-5 surface (graph
  * centrality, skyline dominance, gap filling, reconciliation, robust
  * stats, data-quality checking) — boundary semantics the corpus oracles
  * can't isolate.
  */
class Round8Phase5Spec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  // ---- doc_pagerank --------------------------------------------------------

  test("docPagerank: star graph matches the hand-computed fixed-point ranks") {
    // A shares one 8-gram with B (A's tokens 1-8) and a different one with
    // C (tokens 9-16); A's interior 8-grams have df=1 and create no edges.
    val t = (1 to 16).map(i => s"t$i")
    val docs = Seq(
      (1L, t.mkString(" ")),                 // A: hub, degree 2
      (2L, t.take(8).mkString(" ")),         // B: leaf
      (3L, t.drop(8).mkString(" ")),         // C: leaf
      (4L, "alone " * 3)                     // D: < 8 tokens -> isolated
    ).toDF("doc_id", "text")
    val got = Centrality.docPagerank(docs, k = 8, dfCap = 50, iterations = 3)
      .as[(Long, Long, Long)].collect().toList
    // r0 = 1e6 each. Round 1: A <- 1e6+1e6 -> 150000+85*2e6/100 = 1850000;
    // B,C <- 1e6/2 -> 575000. Round 2: A = 1127500, B = C = 936250... and
    // round 3 (floors included): A = 1741625, B = C = 629187.
    assert(got == List(
      (1L, 2L, 1741625L), (2L, 1L, 629187L), (3L, 1L, 629187L),
      (4L, 0L, 150000L)), s"got $got")
  }

  test("docPagerank: spans over dfCap docs create no edges (stop-span rule)") {
    val shared = (1 to 8).map(i => s"s$i").mkString(" ")
    val docs = Seq((1L, shared), (2L, shared), (3L, shared))
      .toDF("doc_id", "text")
    val got = Centrality.docPagerank(docs, k = 8, dfCap = 2, iterations = 3)
      .as[(Long, Long, Long)].collect().toList
    assert(got.forall { case (_, deg, rank) => deg == 0L && rank == 150000L },
      s"df=3 > cap=2 must isolate all docs: $got")
  }

  // ---- pareto_suppliers ----------------------------------------------------

  test("paretoSuppliers: dominance is strict-on-one-axis; duplicate points co-exist") {
    // One line per supplier, qty 1 -> unit price = cents, delay in days.
    val day0 = ts("1995-01-01 00:00:00")
    def line(supp: Long, price: Double, delayDays: Int) =
      (supp * 10, supp, price, 1.0, ts(f"1995-01-0${1 + delayDays}%d 00:00:00"))
    val lines = Seq(
      line(1, 1.00, 5), // frontier: cheapest
      line(2, 2.00, 3), // frontier: cheaper ones are slower
      line(3, 3.00, 3), // dominated by s2 (pricier, same delay)
      line(4, 1.00, 7), // dominated by s1 (same price, slower)
      line(5, 4.00, 1), // frontier
      line(6, 4.00, 1)  // duplicate of s5: NEITHER dominates -> both frontier
    ).toDF("l_orderkey", "l_suppkey", "l_extendedprice", "l_quantity", "l_shipdate")
    val orders = lines.select(col("l_orderkey").as("o_orderkey"))
      .withColumn("o_orderdate", lit(day0))
    val supplier = (1L to 6L).map(i => (i, s"S#$i")).toDF("s_suppkey", "s_name")
    val got = Analytics.paretoSuppliers(lines, orders, supplier)
      .select(col("s_suppkey"), col("on_frontier"))
      .as[(Long, Boolean)].collect().toMap
    assert(got == Map(1L -> true, 2L -> true, 3L -> false, 4L -> false,
      5L -> true, 6L -> true), s"got $got")
  }

  // ---- hourly_gapfill ------------------------------------------------------

  test("hourlyGapfill: zero-filled gaps, running totals, LOCF per type") {
    val events = Seq(
      (1L, ts("2024-01-01 10:05:00"), "click"),
      (2L, ts("2024-01-01 10:40:00"), "click"),
      (3L, ts("2024-01-01 13:30:00"), "click"),
      (4L, ts("2024-01-01 11:00:00"), "view")
    ).toDF("event_id", "ts", "event_type")
    val got = Analytics.hourlyGapfill(events)
      .as[(String, Timestamp, Long, Long, Timestamp, Boolean)].collect().toList
    val h = (i: Int) => ts(f"2024-01-01 $i%02d:00:00")
    assert(got == List(
      ("click", h(10), 2L, 2L, h(10), false),
      ("click", h(11), 0L, 2L, h(10), true),
      ("click", h(12), 0L, 2L, h(10), true),
      ("click", h(13), 1L, 3L, h(13), false),
      ("view", h(11), 1L, 1L, h(11), false)), s"got $got")
  }

  // ---- order_event_reconcile ----------------------------------------------

  test("orderEventReconcile: full-outer presence classes with zero-filled counts") {
    val orders = Seq((10L, 1L), (11L, 1L), (12L, 2L))
      .toDF("o_orderkey", "o_custkey")
    val events = Seq((100L, 2L), (101L, 3L), (102L, 3L), (103L, 3L))
      .toDF("event_id", "user_id")
    val got = Analytics.orderEventReconcile(orders, events)
      .as[(Long, Long, Long, String)].collect().toList
    assert(got == List(
      (1L, 2L, 0L, "orders_only"),
      (2L, 1L, 1L, "both"),
      (3L, 0L, 3L, "events_only")), s"got $got")
  }

  // ---- median_mad_outliers -------------------------------------------------

  test("medianMadOutliers: exact median/MAD on cents; threshold is strict") {
    val orders = Seq(
      ("A", 1.00), ("A", 2.00), ("A", 3.00), ("A", 4.00), ("A", 100.00),
      ("B", 1.00), ("B", 2.00), ("B", 3.00), ("B", 4.00), ("B", 5.00)
    ).toDF("o_orderpriority", "o_totalprice")
    val got = Analytics.medianMadOutliers(orders)
      .as[(String, Long, Double, Double, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // A: cents [100,200,300,400,10000] -> med 300, adev [200,100,0,100,9700]
    // -> MAD 100, threshold 444.78: only 9700 exceeds -> 1 outlier.
    assert(got("A") == ("A", 5L, 300.0, 100.0, 1L, 200000L), s"got ${got("A")}")
    // B: symmetric, max adev 200 < 444.78 -> none.
    assert(got("B") == ("B", 5L, 300.0, 100.0, 0L, 0L), s"got ${got("B")}")
  }

  // ---- dq_report -----------------------------------------------------------

  test("DataQuality.report counts planted violations and flags pass correctly") {
    val orders = Seq(
      (1L, 10.0, ts("1995-01-01 00:00:00")),
      (1L, -5.0, ts("2005-01-01 00:00:00")), // dup key, bad price, bad date
      (2L, 20.0, ts("1996-01-01 00:00:00"))
    ).toDF("o_orderkey", "o_totalprice", "o_orderdate")
    val lineitem = Seq(
      (1L, 5.0, 0.05, 100.0),
      (99L, 0.0, 0.5, -1.0) // orphan key, qty 0, discount 0.5, price <= 0
    ).toDF("l_orderkey", "l_quantity", "l_discount", "l_extendedprice")
    val customer = Seq((1L, "BUILDING"), (2L, "")).toDF("c_custkey", "c_mktsegment")
    val events = Seq((1L, Some(ts("2024-01-01 00:00:00")), Some(7L)),
        (2L, None, None))
      .toDF("event_id", "ts", "user_id")
    val documents = Seq((1L, "abc", 3L), (2L, "abc", 5L), (3L, "", 0L))
      .toDF("doc_id", "text", "n_chars")
    val got = DataQuality.report(orders, lineitem, customer, events, documents)
      .as[(String, String, Long, Long, Boolean)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap
    assert(got(("orders", "orderkey_unique")) == ((3L, 1L, false)))
    assert(got(("orders", "totalprice_positive")) == ((3L, 1L, false)))
    assert(got(("orders", "orderdate_in_range")) == ((3L, 1L, false)))
    assert(got(("lineitem", "orderkey_fk_orders")) == ((2L, 1L, false)))
    assert(got(("lineitem", "quantity_in_1_50")) == ((2L, 1L, false)))
    assert(got(("lineitem", "discount_in_range")) == ((2L, 1L, false)))
    assert(got(("lineitem", "price_positive")) == ((2L, 1L, false)))
    assert(got(("customer", "mktsegment_not_empty")) == ((2L, 1L, false)))
    assert(got(("customer", "custkey_unique")) == ((2L, 0L, true)))
    assert(got(("events", "ts_not_null")) == ((2L, 1L, false)))
    assert(got(("events", "user_not_null")) == ((2L, 1L, false)))
    assert(got(("documents", "n_chars_consistent")) == ((3L, 1L, false)))
    assert(got(("documents", "text_not_empty")) == ((3L, 1L, false)))
    assert(got.size == 15, s"15 constraint rows expected, got ${got.size}")
  }

  // ---- table_fingerprints --------------------------------------------------

  private def fpOf(orders: org.apache.spark.sql.DataFrame): (Long, Long) =
    DataQuality.fingerprintTable("orders", orders)
      .select(col("n_rows"), col("checksum_mod"))
      .as[(Long, Long)].head()

  private def ordersFixture(rows: Seq[(Long, Long, String, Double, String)]) =
    rows.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderpriority")
      .withColumn("o_orderdate", lit(ts("1995-06-01 12:00:00")))

  test("tableFingerprints: checksum is row-order and partitioning invariant") {
    val rows = (1L to 97L).map(i =>
      (i, i % 7, s"S$i", i * 1.25, s"P${i % 3}"))
    val a = fpOf(ordersFixture(rows))
    val b = fpOf(ordersFixture(scala.util.Random.shuffle(rows)).repartition(13))
    assert(a == b, s"order/partitioning must not change the checksum: $a vs $b")
  }

  test("tableFingerprints: a single-cell edit flips the checksum; merge adds mod p") {
    val rows = (1L to 50L).map(i => (i, i, "O", 10.0 + i, "HIGH"))
    val (n1, c1) = fpOf(ordersFixture(rows))
    val edited = rows.updated(24, (25L, 25L, "O", 35.01, "HIGH"))
    val (n2, c2) = fpOf(ordersFixture(edited))
    assert(n1 == n2 && c1 != c2, "a one-cent change must flip the checksum")
    // Mergeability: checksum(A union B) == (checksum(A)+checksum(B)) mod p.
    val (left, right) = rows.splitAt(20)
    val (_, cl) = fpOf(ordersFixture(left))
    val (_, cr) = fpOf(ordersFixture(right))
    assert((cl + cr) % 1000000007L == c1,
      "shard checksums must fold to the whole-table checksum")
  }

  // ---- bpe_pair_counts -----------------------------------------------------

  test("bpePairCounts: frequency-weighted pairs, 1-char words excluded, ties by pair") {
    val docs = Seq(
      (1L, "abab ab cd"),  // abab: pairs ab,ba,ab; ab: ab; cd: cd
      (2L, "ab x cd")      // ab again (freq 2 now); x is sub-2-char -> dropped
    ).toDF("doc_id", "text")
    val got = graft.functions.TextAnalysis.bpePairCounts(docs)
      .as[(String, Long)].collect().toList
    // weighted counts: ab = 2(from abab) + 2x1(word ab, freq 2) = 4;
    // ba = 1; cd = 2. Order: count desc, then pair asc.
    assert(got == List(("ab", 4L), ("cd", 2L), ("ba", 1L)), s"got $got")
  }

  // ---- corpus-level properties --------------------------------------------

  test("docPagerank properties: rank bounds, isolation floor, mass never grows") {
    val docs = (1 to 80).map { i =>
      // clique groups of 4 sharing an 8-token body + distinct tail
      val body = (1 to 8).map(t => s"g${i / 4}w$t").mkString(" ")
      (i.toLong, s"$body tail$i")
    }.toDF("doc_id", "text")
    val got = Centrality.docPagerank(docs, k = 8, dfCap = 50, iterations = 3)
      .as[(Long, Long, Long)].collect()
    val scale = Centrality.Scale
    got.foreach { case (id, deg, rank) =>
      assert(rank >= 15L * scale / 100, s"doc $id below damping floor")
      if (deg == 0L) assert(rank == 15L * scale / 100, s"isolated doc $id")
    }
    // floor truncation + damping only ever LOSE mass vs the uniform start
    assert(got.map(_._3).sum <= got.length * scale, "rank mass must not grow")
    // symmetric positions inside a clique get identical ranks — and the
    // degree-3 cliques must actually exist, or this assertion is vacuous
    val byDeg = got.groupBy(_._2)
    assert(byDeg.contains(3L), s"fixture must yield 4-cliques; degrees: ${byDeg.keySet}")
    assert(byDeg(3L).map(_._3).distinct.length == 1,
      "all degree-3 clique members must tie")
  }

  test("hourlyGapfill properties: dense spine, non-gap endpoints, conservation") {
    val events = (1 to 200).map { i =>
      (i.toLong, ts(f"2024-03-01 ${(i * 7) % 24}%02d:${(i * 13) % 60}%02d:00"),
        s"t${i % 3}")
    }.toDF("event_id", "ts", "event_type")
    val got = Analytics.hourlyGapfill(events)
      .as[(String, Timestamp, Long, Long, Timestamp, Boolean)].collect()
    got.groupBy(_._1).foreach { case (typ, rows) =>
      val hours = rows.map(_._2.getTime).sorted
      assert(hours.sliding(2).forall {
        case Array(a, b) => b - a == 3600000L
        case _ => true
      }, s"$typ spine must be dense hourly")
      assert(!rows.minBy(_._2.getTime)._6 && !rows.maxBy(_._2.getTime)._6,
        s"$typ endpoints are observed hours, never gaps")
      assert(rows.map(_._3).sum ==
        events.filter(col("event_type") === typ).count(),
        s"$typ conservation: gap-filled counts must sum to the raw count")
    }
  }
}
