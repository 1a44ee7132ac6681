package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.{Mixture, Sessionize, Similarity}
import graft.functions.TextAnalysis
import graft.queries.Analytics

/** Fixture-level contracts for the round-8 surface, beside the DuckDB
  * oracles (which hash-verify the corpus results): boundary semantics,
  * partitioning-invariance, and monotonicity properties the oracle compare
  * can't isolate.
  */
class Round8SurfaceSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  // ---- session_window ------------------------------------------------------

  test("sessionWindows: touching windows merge (ts == prev+gap); strict overshoot breaks") {
    val events = Seq(
      // user 1: 10:00, 10:29 merge; 10:59 is EXACTLY 30m after 10:29 ->
      // windows touch -> still the same session (inclusive merge)
      (1L, "e1", ts("2024-01-01 10:00:00"), "view", Some(1.0)),
      (1L, "e2", ts("2024-01-01 10:29:00"), "click", Some(2.0)),
      (1L, "e3", ts("2024-01-01 10:59:00"), "view", None),
      // user 2: second event 30m 1s after the first -> strict break
      (2L, "e4", ts("2024-01-01 00:00:00"), "purchase", Some(5.5)),
      (2L, "e5", ts("2024-01-01 00:30:01"), "view", Some(1.0))
    ).toDF("user_id", "event_id", "ts", "event_type", "value")
    val got = Sessionize.sessionWindows(events).collect()
    assert(got.length == 3, s"expected 3 sessions, got ${got.toSeq}")
    val u1 = got.filter(_.getLong(0) == 1L)
    assert(u1.length == 1, "touching windows must merge into one session")
    assert(u1(0).getTimestamp(1) == ts("2024-01-01 10:00:00"))
    assert(u1(0).getTimestamp(2) == ts("2024-01-01 11:29:00")) // last(10:59)+30m
    assert(u1(0).getLong(3) == 3 && u1(0).getLong(4) == 2)
    assert(u1(0).getDouble(5) == 3.0, "null value must not poison the sum")
    val u2 = got.filter(_.getLong(0) == 2L)
    assert(u2.length == 2, "an event strictly past the gap starts a new session")
    assert(u2(0).getTimestamp(2) == ts("2024-01-01 00:30:00"))
    assert(u2(1).getTimestamp(1) == ts("2024-01-01 00:30:01"))
  }

  // ---- event_type_intervals ------------------------------------------------

  test("eventTypeIntervals: runs compact; intervals tile; last run open") {
    val events = Seq(
      (1L, "a", ts("2024-01-01 00:00:00"), "view"),
      (1L, "b", ts("2024-01-01 00:01:00"), "view"),
      (1L, "c", ts("2024-01-01 00:02:00"), "click"),
      (1L, "d", ts("2024-01-01 00:03:00"), "view")
    ).toDF("user_id", "event_id", "ts", "event_type")
    val got = Analytics.eventTypeIntervals(events).collect()
    assert(got.map(_.getString(2)).toSeq == Seq("view", "click", "view"))
    assert(got.map(r => r.getLong(6)).toSeq == Seq(2L, 1L, 1L))
    // tiling: valid_to(run i) == valid_from(run i+1); last is NULL/current
    assert(got(0).getTimestamp(4) == got(1).getTimestamp(3))
    assert(got(1).getTimestamp(4) == got(2).getTimestamp(3))
    assert(got(2).isNullAt(4) && got(2).getBoolean(5))
    assert(!got(0).getBoolean(5) && !got(1).getBoolean(5))
  }

  // ---- grouping sets -------------------------------------------------------

  test("groupingSetsRevenue: exactly two grouping ids; each set partitions the order count") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val got = Analytics.groupingSetsRevenue(orders).collect()
    val total = orders.count()
    val byGid = got.groupBy(_.getLong(0))
    assert(byGid.keySet == Set(1L, 2L), s"gids: ${byGid.keySet}")
    // gid=1: grouped by status (priority aggregated -> NULL); gid=2 mirror
    assert(byGid(1L).forall(r => !r.isNullAt(1) && r.isNullAt(2)))
    assert(byGid(2L).forall(r => r.isNullAt(1) && !r.isNullAt(2)))
    assert(byGid(1L).map(_.getLong(4)).sum == total)
    assert(byGid(2L).map(_.getLong(4)).sum == total)
  }

  // ---- TPC-H Q17 shape -----------------------------------------------------

  test("smallQuantityRevenue: window formulation equals the correlated-subquery formulation") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val part = spark.read.parquet(s"$sf/part.parquet")
    val got = Analytics.smallQuantityRevenue(li, part).collect()(0)
    // independent formulation: aggregate per-part averages, then join back
    val avgs = li.groupBy(col("l_partkey").as("pk"))
      .agg((sum(col("l_quantity")) / count(lit(1))).as("avg_qty"))
    val ref = li
      .join(part.filter(col("p_brand") === "Brand#4"), col("l_partkey") === col("p_partkey"))
      .join(avgs, col("l_partkey") === col("pk"))
      .filter(col("l_quantity") < lit(0.5) * col("avg_qty"))
      .agg(sum(col("l_extendedprice")).cast("double").as("rev"), count(lit(1)).as("n"))
      .collect()(0)
    assert(got.getLong(1) == ref.getLong(1), "line_count differs between formulations")
    assert(math.abs(got.getDouble(0) - ref.getDouble(0) / 7.0) < 1e-6)
  }

  // ---- embedding dim stats -------------------------------------------------

  test("dimStats: exact fixed-point sums match brute-force mean/var on a fixture") {
    val vecs = Seq(
      (1L, Array(0.5f, -0.25f)),
      (2L, Array(0.125f, 0.75f)),
      (3L, Array(-0.5f, 0.0f))
    ).toDF("id", "embedding")
    val got = Similarity.dimStats(vecs).collect()
    val xs0 = Seq(0.5, 0.125, -0.5)
    val xs1 = Seq(-0.25, 0.75, 0.0)
    for ((r, xs) <- got.zip(Seq(xs0, xs1))) {
      val n = xs.length
      val mean = xs.sum / n
      val varx = (xs.map(x => x * x).sum - xs.sum * xs.sum / n) / n
      assert(r.getLong(1) == n)
      assert(r.getDouble(2) == xs.min && r.getDouble(3) == xs.max)
      assert(math.abs(r.getDouble(4) - mean) < 1e-12)
      assert(math.abs(r.getDouble(5) - varx) < 1e-12)
    }
  }

  // ---- length buckets ------------------------------------------------------

  test("lengthBuckets: power-of-two boundaries are inclusive; waste accounts exactly") {
    val docs = Seq(
      ("d1", "one " * 15 + "x"),          // 16 tokens -> bucket 16, waste 0
      ("d2", "one " * 16 + "x"),          // 17 tokens -> bucket 32
      ("d3", "a b c")                     // 3 tokens  -> bucket 16
    ).toDF("doc_id", "text")
    val got = TextAnalysis.lengthBuckets(docs).collect()
    val m = got.map(r => r.getInt(0) -> r).toMap
    assert(m.keySet == Set(16, 32))
    assert(m(16).getLong(1) == 2 && m(16).getLong(2) == 19)
    assert(m(16).getLong(3) == 32 && math.abs(m(16).getDouble(4) - 13.0 / 32) < 1e-15)
    assert(m(32).getLong(1) == 1 && m(32).getLong(2) == 17)
  }

  // ---- token postings ------------------------------------------------------

  test("tokenPostings: deterministic under repartitioning; posting list capped and tf-ordered") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val a = TextAnalysis.tokenPostings(docs).collect()
    val b = TextAnalysis.tokenPostings(docs.repartition(7, col("source"))).collect()
    assert(a.toSeq == b.toSeq, "postings depend on input partitioning")
    // per-row contract: <=5 postings, tf non-increasing, df >= #postings
    a.foreach { r =>
      val posts = r.getString(3).split(",").toSeq
      assert(posts.length <= 5)
      val tfs = posts.map(_.split(":")(1).toLong)
      assert(tfs == tfs.sorted.reverse, s"postings not tf-ordered: $posts")
      assert(r.getLong(1) >= posts.length)
    }
  }

  // ---- classic analytics shapes (phase 2) ----------------------------------

  test("orderCountDistribution: zero bucket present; histogram covers every customer") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val customer = spark.read.parquet(s"$sf/customer.parquet")
    val got = Analytics.orderCountDistribution(orders, customer).collect()
    // left-join shape: the histogram partitions ALL customers, including
    // those with no (non-excluded) orders
    assert(got.map(_.getLong(1)).sum == customer.count())
    // the corpus has no order-less customers at this SF, so the zero-bucket
    // contract is pinned on a fixture: c2 has only an excluded order, c3
    // has none at all -> both land in bucket 0
    val fixOrders = Seq(
      (100L, 1L, "5-LOW"), (101L, 1L, "2-HIGH"), (102L, 2L, "1-URGENT")
    ).toDF("o_orderkey", "o_custkey", "o_orderpriority")
    val fixCust = Seq((1L, "c1"), (2L, "c2"), (3L, "c3")).toDF("c_custkey", "c_name")
    val fix = Analytics.orderCountDistribution(fixOrders, fixCust).collect()
    assert(fix.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((0L, 2L), (2L, 1L)),
      s"zero bucket must hold the excluded-only and order-less customers: ${fix.toSeq}")
  }

  test("disjunctiveBracketRevenue: derived single-side filters reach both parquet scans") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val part = spark.read.parquet(s"$sf/part.parquet")
    val df = Analytics.disjunctiveBracketRevenue(li, part)
    df.collect()
    val scans = df.queryExecution.executedPlan.toString
    // quantity envelope pushed to the lineitem scan; brand/size disjunction
    // pushed to the part scan (both appear in PushedFilters)
    assert(scans.contains("PushedFilters"), scans)
    assert(scans.contains("GreaterThanOrEqual(l_quantity,1.0)") ||
      scans.contains("GreaterThanOrEqual(l_quantity,1)"),
      s"lineitem quantity envelope not pushed:\n$scans")
    assert(scans.contains("Or(And(EqualTo(p_brand,Brand#1)"),
      s"part-side bracket disjunction not pushed:\n$scans")
  }

  test("minCostSupplier / topSupplierRevenue: ties kept, min/max correct on a fixture") {
    val li = Seq(
      // part 1: supplier 10 cost 2.0, supplier 11 cost 2.0 (tie), supplier 12 cost 3.0
      (1L, 1L, 10L, 4.0, 2.0), (1L, 1L, 11L, 8.0, 4.0), (1L, 1L, 12L, 3.0, 1.0),
      // part 2: supplier 10 only
      (2L, 2L, 10L, 10.0, 2.0)
    ).toDF("l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_quantity")
      .withColumn("l_shipdate", lit(ts("1996-01-15 00:00:00")))
      .withColumn("l_discount", lit(0.0))
    val part = Seq((1L, "Brand#1", 15), (2L, "Brand#2", 15))
      .toDF("p_partkey", "p_brand", "p_size")
    val supplier = Seq((10L, "S10", 0L), (11L, "S11", 0L), (12L, "S12", 0L))
      .toDF("s_suppkey", "s_name", "s_nationkey")
    val nation = Seq((0L, "NATION_0", 0L)).toDF("n_nationkey", "n_name", "n_regionkey")
    val region = Seq((0L, "EUROPE")).toDF("r_regionkey", "r_name")
    val mc = Analytics.minCostSupplier(li, part, supplier, nation, region)
      .collect()
    assert(mc.map(r => (r.getLong(0), r.getString(2))).toSeq ==
      Seq((1L, "S10"), (1L, "S11"), (2L, "S10")),
      s"tie at the min cost must keep both suppliers: ${mc.toSeq}")
    val ts15 = Analytics.topSupplierRevenue(li, supplier).collect()
    // revenue: S10 4+10=14, S11 8, S12 3 -> single max S10
    assert(ts15.map(r => (r.getLong(0), r.getDouble(2))).toSeq == Seq((10L, 14.0)))
  }

  test("marketShare: share is 0.0 (not NULL) in years the target nation sold nothing") {
    val got = Analytics.marketShare(
      spark.read.parquet(s"$sf/lineitem.parquet"),
      spark.read.parquet(s"$sf/orders.parquet"),
      spark.read.parquet(s"$sf/customer.parquet"),
      spark.read.parquet(s"$sf/supplier.parquet"),
      spark.read.parquet(s"$sf/part.parquet"),
      spark.read.parquet(s"$sf/nation.parquet"),
      spark.read.parquet(s"$sf/region.parquet")).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(!r.isNullAt(1), s"mkt_share must never be NULL: $r")
      val share = r.getDouble(1)
      assert(share >= 0.0 && share <= 1.0, s"share out of range: $r")
    }
  }

  // ---- unpivot / sliding windows / decay / knn graph -----------------------

  test("eventMetricsUnpivot: three metric rows per type; values match the wide row") {
    val events = Tables.events(spark, sf)
    val got = Analytics.eventMetricsUnpivot(events).collect()
    val types = events.select("event_type").distinct().count()
    assert(got.length == types * 3)
    val m = got.map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    val perType = events.groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    perType.foreach { case (t, n) =>
      assert(m((t, "n_events")) == n.toDouble, s"n_events mismatch for $t")
    }
  }

  test("slidingWindowCounts: every event lands in exactly len/slide windows of the right span") {
    val events = Tables.events(spark, sf)
    val got = Analytics.slidingWindowCounts(events).collect()
    assert(got.map(_.getLong(2)).sum == events.count() * 4,
      "1h/15min hopping windows must expand each event exactly 4x")
    got.foreach { r =>
      assert(r.getTimestamp(1).getTime - r.getTimestamp(0).getTime == 3600 * 1000L)
      assert(r.getTimestamp(0).getTime % (900 * 1000L) == 0,
        s"window start must align to the slide: ${r.getTimestamp(0)}")
    }
  }

  test("timeDecayTotals: hand-computed dyadic decay on a fixture") {
    val events = Seq(
      // user 1: 100.00 one day before anchor, 50.00 two days before
      (1L, ts("2024-01-30 10:00:00"), Some(100.0)),
      (1L, ts("2024-01-29 09:00:00"), Some(50.0)),
      // user 2: null value (dropped) + 8.00 four days before
      (2L, ts("2024-01-28 00:00:00"), None),
      (2L, ts("2024-01-27 12:00:00"), Some(8.0))
    ).toDF("user_id", "ts", "value")
    val got = Analytics.timeDecayTotals(events).collect()
    val m = got.map(r => r.getLong(0) -> r).toMap
    // u1: 100/2^1 + 50/2^2 = 50 + 12.5 = 62.5 ; u2: 8/2^4 = 0.5
    assert(m(1L).getDouble(1) == 62.5 && m(1L).getLong(2) == 2 && m(1L).getLong(3) == 2)
    assert(m(1L).getInt(4) == 1)
    assert(m(2L).getDouble(1) == 0.5 && m(2L).getLong(2) == 1, "null value must be dropped")
  }

  test("knnGraph: ranks ordered by sim; mutual flag matches the reverse-edge set") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val got = Similarity.knnGraph(emb, k = 3).collect()
    val edges = got.map(r => (r.getLong(0), r.getLong(1))).toSet
    got.foreach { r =>
      val mutual = r.getBoolean(4)
      assert(mutual == edges.contains((r.getLong(1), r.getLong(0))),
        s"mutual flag wrong for ${(r.getLong(0), r.getLong(1))}")
    }
    // per-source: ranks are 1..3 and sims non-increasing
    got.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getInt(3))
      assert(sorted.map(_.getInt(3)).toSeq == (1 to sorted.length))
      val sims = sorted.map(_.getDouble(2))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
    }
  }

  // ---- division / window frames / supplier variety -------------------------

  test("usersAllEventTypes: division bites — a user missing one type is excluded") {
    // the corpus generator gives every user every type (the oracle passes
    // vacuously there), so the exclusion semantics are pinned on a fixture
    val events = Seq(
      (1L, "view"), (1L, "click"), (1L, "purchase"),
      (2L, "view"), (2L, "click"),               // missing purchase
      (3L, "purchase"), (3L, "view"), (3L, "click"), (3L, "click")
    ).toDF("user_id", "event_type")
    val got = Analytics.usersAllEventTypes(events).collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(1L, 3L), s"got ${got.toSeq}")
    assert(got.forall(_.getLong(1) == 3L))
  }

  test("userFirstLast: frame covers the whole partition; nth is NULL for short histories") {
    val events = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00"), "view"),
      (1L, 11L, ts("2024-01-01 11:00:00"), "click"),
      (1L, 12L, ts("2024-01-01 12:00:00"), "purchase"),
      (2L, 20L, ts("2024-01-01 09:00:00"), "error")   // single event
    ).toDF("user_id", "event_id", "ts", "event_type")
    val got = Analytics.userFirstLast(events).collect()
    val m = got.map(r => r.getLong(0) -> r).toMap
    assert(m(1L).getString(1) == "view" && m(1L).getString(2) == "purchase")
    assert(m(1L).getString(3) == "click" && m(1L).getLong(4) == 3)
    assert(m(2L).getString(1) == "error" && m(2L).getString(2) == "error")
    assert(m(2L).isNullAt(3), "nth_value(2) must be NULL for a single-event user")
  }

  test("partSupplierVariety: denylisted supplier never counts; pair dedup precedes rollup") {
    val li = Seq(
      (1L, 10L), (1L, 10L), (1L, 11L),  // part 1: suppliers 10 (dup), 11
      (2L, 12L)                          // part 2: supplier 12 (denylisted)
    ).toDF("l_partkey", "l_suppkey")
    val part = Seq((1L, "Brand#1", "PROMO", 5), (2L, "Brand#2", "LARGE", 15))
      .toDF("p_partkey", "p_brand", "p_type", "p_size")
    val supplier = Seq((10L, 100.0), (11L, 50.0), (12L, -5.0))
      .toDF("s_suppkey", "s_acctbal")
    val got = Analytics.partSupplierVariety(li, part, supplier).collect()
    assert(got.length == 1, s"denylisted-only part must vanish: ${got.toSeq}")
    assert(got(0).getString(0) == "Brand#1" && got(0).getLong(3) == 2,
      "duplicate lineitem pairs must count a supplier once")
  }

  // ---- quality-weighted sample --------------------------------------------

  test("weightedSample: monotone in targetTokens; short docs always kept") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val s20 = Mixture.weightedSample(docs, 20.0).select("doc_id").collect().map(_.getLong(0)).toSet
    val s40 = Mixture.weightedSample(docs, 40.0).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(s20.subsetOf(s40), "sample must grow monotonically with the token budget")
    // rate clamps to 1 for docs at/below the budget: they are always kept
    val short = docs
      .filter(TextAnalysis.wsTokenCount(col("text")) <= 40)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(short.subsetOf(s40), "docs within budget must never be dropped")
    // expected token mass per kept doc is bounded by the budget in rate terms:
    // every kept row has rate in (0, 1]
    val rates = Mixture.weightedSample(docs, 40.0).select("rate").collect().map(_.getDouble(0))
    assert(rates.forall(r => r > 0.0 && r <= 1.0))
  }
}
