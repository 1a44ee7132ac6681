package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis
import graft.queries.Analytics

/** Fixture-level contracts for the round-8 phase-4 surface (EXISTS shapes,
  * exact-moment statistics, ordered string aggregation, CEP matching,
  * sequence packing, classifier gating) — boundary semantics the corpus
  * oracles can't isolate.
  */
class Round8Phase4Spec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  // ---- late_shipment_priority ---------------------------------------------

  test("lateShipmentPriority: EXISTS counts an order once; range + lateness bound") {
    val orders = Seq(
      (1L, "1-URGENT", ts("1995-01-10 00:00:00")),
      (2L, "1-URGENT", ts("1995-02-01 00:00:00")),
      (3L, "3-MEDIUM", ts("1994-12-31 00:00:00")), // outside the quarter
      (4L, "1-URGENT", ts("1995-03-01 00:00:00"))
    ).toDF("o_orderkey", "o_orderpriority", "o_orderdate")
    val lines = Seq(
      // order 1: TWO late lines -> still one late order
      (1L, ts("1995-06-01 00:00:00")),
      (1L, ts("1995-07-01 00:00:00")),
      // order 2: exactly +60d is NOT late (strict >)
      (2L, ts("1995-04-02 00:00:00")),
      // order 3: late but its order is out of range
      (3L, ts("1995-09-01 00:00:00")),
      // order 4: on time
      (4L, ts("1995-03-15 00:00:00"))
    ).toDF("l_orderkey", "l_shipdate")
    val got = Analytics.lateShipmentPriority(orders, lines)
      .as[(String, Long)].collect().toMap
    assert(got == Map("1-URGENT" -> 1L),
      s"one urgent order is late, counted once: $got")
  }

  // ---- sole_late_supplier --------------------------------------------------

  test("soleLateSupplier: strictly-last among >=2 suppliers; ties and solos excluded") {
    val lines = Seq(
      // order 1: s1 ships last strictly -> s1 waits-blamed
      (1L, 1L, ts("1995-01-10 00:00:00")),
      (1L, 2L, ts("1995-01-05 00:00:00")),
      // order 2: single supplier -> excluded (no other supplier exists)
      (2L, 1L, ts("1995-02-01 00:00:00")),
      // order 3: s2 and s3 tie at the max -> nobody is SOLE late
      (3L, 2L, ts("1995-03-01 00:00:00")),
      (3L, 3L, ts("1995-03-01 00:00:00")),
      (3L, 1L, ts("1995-02-20 00:00:00")),
      // order 4: s2 is strictly last -> its first (and only) blame count
      (4L, 2L, ts("1995-04-02 00:00:00")),
      (4L, 3L, ts("1995-04-01 00:00:00"))
    ).toDF("l_orderkey", "l_suppkey", "l_shipdate")
    val supplier = Seq((1L, "Supplier#1"), (2L, "Supplier#2"), (3L, "Supplier#3"))
      .toDF("s_suppkey", "s_name")
    val got = Analytics.soleLateSupplier(lines, supplier)
      .as[(Long, String, Long)].collect().toList
    assert(got == List((1L, "Supplier#1", 1L), (2L, "Supplier#2", 1L)),
      s"got $got")
  }

  // ---- price_qty_corr ------------------------------------------------------

  test("priceQtyCorr: exactly linear data gives corr 1.0 and the known covariance") {
    // price = 2 * qty dollars -> perfectly correlated; covar_pop of
    // qty in {1,2,3} vs price in {2,4,6}: E[xy]-E[x]E[y] = 28/3 - 2*4
    // in dollar units = 4/3 -> rounded 1.3333
    val lines = Seq(
      ("A", 1.0, 2.0), ("A", 2.0, 4.0), ("A", 3.0, 6.0)
    ).toDF("l_returnflag", "l_quantity", "l_extendedprice")
    val r = Analytics.priceQtyCorr(lines).collect()
    assert(r.length == 1 && r(0).getLong(1) == 3L)
    assert(r(0).getDouble(2) == 1.0, s"corr of exact linear data: ${r.toSeq}")
    assert(r(0).getDouble(3) == 1.3333, s"covar_pop: ${r.toSeq}")
  }

  // ---- nation_top_customers ------------------------------------------------

  test("nationTopCustomerList: CSV ordered by balance desc, negatives last, k bound") {
    val customer = Seq(
      (1L, "c_f", 10, -50.25), // negative balance must sort LAST
      (2L, "c_a", 10, 900.00),
      (3L, "c_b", 10, 900.00), // tie with c_a -> name order a before b
      (4L, "c_c", 10, 100.10),
      (5L, "c_d", 10, 50.00),
      (6L, "c_e", 10, 20.00),  // rank 6 of 7 -> cut by k=5
      (7L, "c_g", 20, 0.00)
    ).toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal")
    val nation = Seq((10, "NATION_A"), (20, "NATION_B")).toDF("n_nationkey", "n_name")
    val got = Analytics.nationTopCustomerList(customer, nation)
      .as[(String, Long, String)].collect().toList
    assert(got == List(
      ("NATION_A", 5L, "c_a,c_b,c_c,c_d,c_e"),
      ("NATION_B", 1L, "c_g")), s"got $got")
  }

  // ---- user_top_event ------------------------------------------------------

  test("userTopEvent: mode per user, ties to the lexicographically smallest type") {
    val events = Seq(
      (1L, "view"), (1L, "view"), (1L, "click"),
      (2L, "view"), (2L, "click") // tie -> click < view
    ).toDF("user_id", "event_type")
    val got = Analytics.userTopEvent(events).as[(Long, String, Long)].collect().toList
    assert(got == List((1L, "view", 2L), (2L, "click", 1L)), s"got $got")
  }

  // ---- cart_purchase_pattern -----------------------------------------------

  test("cartToPurchase: gap bound inclusive, logout breaks, cartless never matches") {
    val events = Seq(
      // u1: cart -> purchase 10m later: match
      (1L, "a1", ts("2024-01-01 10:00:00"), "add_to_cart"),
      (1L, "a2", ts("2024-01-01 10:10:00"), "purchase"),
      // u2: logout between cart and purchase: no match
      (2L, "b1", ts("2024-01-01 10:00:00"), "add_to_cart"),
      (2L, "b2", ts("2024-01-01 10:05:00"), "logout"),
      (2L, "b3", ts("2024-01-01 10:10:00"), "purchase"),
      // u3: purchase exactly +30m: still a match (inclusive)
      (3L, "c1", ts("2024-01-01 10:00:00"), "add_to_cart"),
      (3L, "c2", ts("2024-01-01 10:30:00"), "purchase"),
      // u4: purchase 30m01s after cart: no match
      (4L, "d1", ts("2024-01-01 10:00:00"), "add_to_cart"),
      (4L, "d2", ts("2024-01-01 10:30:01"), "purchase"),
      // u5: purchase with no cart ever: no match
      (5L, "e1", ts("2024-01-01 10:00:00"), "purchase"),
      // u6: logout BEFORE the cart does not break the later pair
      (6L, "f1", ts("2024-01-01 09:00:00"), "logout"),
      (6L, "f2", ts("2024-01-01 10:00:00"), "add_to_cart"),
      (6L, "f3", ts("2024-01-01 10:01:00"), "purchase"),
      (6L, "f4", ts("2024-01-01 10:02:00"), "purchase") // same cart matches twice
    ).toDF("user_id", "event_id", "ts", "event_type")
    val got = Analytics.cartToPurchase(events)
      .as[(Long, Long, Long)].collect().toList
    // users with zero matches are filtered out entirely
    assert(got == List((1L, 1L, 1L), (3L, 1L, 1L), (6L, 2L, 2L)), s"got $got")
  }

  // ---- token_pack_bins -----------------------------------------------------

  test("tokenPackBins: spans tile the stream; interior bins fill to exactly B") {
    def doc(id: String, src: String, n: Int): (String, String, String) =
      (id, Seq.fill(n)("w").mkString(" "), src)
    val docs = Seq(doc("d1", "s1", 1000), doc("d2", "s1", 1500), doc("d3", "s1", 600))
      .toDF("doc_id", "text", "source")
    val got = TextAnalysis.tokenPackBins(docs)
      .as[(String, Long, Long, Long, Long)].collect().toList
    // stream: d1 [0,999], d2 [1000,2499], d3 [2500,3099]; B=2048
    assert(got == List(
      ("s1", 0L, 2L, 2L, 2048L), // d1 whole + d2 head; full interior bin
      ("s1", 1L, 2L, 1L, 1052L)  // d2 tail (452) + d3 whole (600)
    ), s"got $got")
    // conservation: fills sum to the token total
    assert(got.map(_._5).sum == 3100L)
  }

  test("tokenPackBins invariant on a generated corpus: conservation + interior fill") {
    val docs = (1 to 57).map { i =>
      (f"doc_$i%03d", Seq.fill(i * 37 % 400 + 1)("tok").mkString(" "),
        s"src_${i % 3}")
    }.toDF("doc_id", "text", "source")
    val bins = TextAnalysis.tokenPackBins(docs, binTokens = 512)
      .as[(String, Long, Long, Long, Long)].collect()
    val totalTokens = docs.select(sum(size(split(col("text"), " ")))).as[Long].head()
    assert(bins.map(_._5).sum == totalTokens, "token conservation across bins")
    val lastBin = bins.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    bins.foreach { case (src, bin, _, _, fill) =>
      if (bin != lastBin(src))
        assert(fill == 512L, s"interior bin ($src,$bin) must be full, got $fill")
    }
  }

  // ---- quality_logit -------------------------------------------------------

  test("qualityLogit: keep mirrors the rounded score; diversity raises, stopwords lower") {
    val stop = Seq("the", "a", "of", "and")
    val docs = Seq(
      ("d1", ("the " * 40).trim),                        // all stopwords, no diversity
      ("d2", (1 to 40).map(i => s"tok$i").mkString(" ")) // all distinct, no stopwords
    ).toDF("doc_id", "text")
    val got = TextAnalysis.qualityLogit(docs, stop)
      .as[(String, Long, Double, Double, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    got.values.foreach { case (id, _, _, score, keep) =>
      assert(score > 0.0 && score < 1.0, s"$id sigmoid range")
      assert(keep == (score >= 0.5), s"$id keep must mirror the ROUNDED score")
    }
    assert(got("d2")._4 > got("d1")._4,
      "distinct-heavy doc must outscore stopword-heavy doc of equal length")
  }
}
