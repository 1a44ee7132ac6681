package graft

import java.sql.Timestamp

import graft.functions.TextAnalysis
import graft.operators.{Association, Changepoint}

/** Fixtures for the volume-monitoring statistics (overdispersion,
  * lag-1 ACF), PRF expansion, and the recommender hit-rate eval.
  */
class VolumeIrSpec extends SparkTestBase {
  import spark.implicits._

  private def hourlyEvents(perHour: Seq[Int], tp: String = "click") =
    perHour.zipWithIndex.flatMap { case (n, h) =>
      (0 until n).map(i =>
        ((h * 1000 + i).toLong,
          Timestamp.valueOf(java.time.LocalDateTime.of(2024, 1, 1, 0, 0)
            .plusHours(h.toLong)),
          i.toLong, tp, 1.0, "{}"))
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  test("overdispersionCheck: constant series var 0; bursty series flags") {
    val flat = hourlyEvents(Seq.fill(10)(5), "flat")
    val bursty = hourlyEvents(Seq(1, 19, 1, 19, 1, 19, 1, 19, 1, 19), "burst")
    val r = Changepoint.overdispersionCheck(flat.union(bursty)).collect()
      .map(x => x.getString(0) -> x).toMap
    assert(r("flat").getDouble(3) == 0.0)
    assert(!r("flat").getBoolean(5))
    // burst: mean 10, sample var = 10*81/9 = 90 > 1.5*10
    assert(r("burst").getDouble(3) == 90.0)
    assert(r("burst").getBoolean(5))
  }

  test("hourlyAutocorr: alternating series has ACF -1, trend +1-ish") {
    val alt = hourlyEvents(Seq(1, 9, 1, 9, 1, 9, 1, 9), "alt")
    val ramp = hourlyEvents((1 to 12).map(i => i), "ramp")
    val r = Changepoint.hourlyAutocorr(alt.union(ramp)).collect()
      .map(x => x.getString(0) -> x.getDouble(2)).toMap
    assert(r("alt") == -1.0)
    assert(r("ramp") == 1.0)
  }

  test("hourlyAutocorr: zero-variance leg emits NULL not NaN") {
    val flat = hourlyEvents(Seq.fill(6)(3), "flat")
    val r = Changepoint.hourlyAutocorr(flat).collect().head
    assert(r.isNullAt(2))
  }

  test("prfExpansion: expansion terms come from feedback docs only") {
    // Docs 1-3 contain the query terms plus planted expansion term
    // 'shards'; docs 4+ contain unrelated terms and never enter feedback.
    val docs = (
      (1L to 3L).map(i => (i, "dup key fast shards shards merge", "en",
        "s1", 30L)) ++
      (4L to 20L).map(i => (i, "noise words only here", "en", "s1", 20L))
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = TextAnalysis.prfExpansion(docs).collect()
    val terms = r.map(_.getString(0)).toSet
    assert(terms.contains("shards") && terms.contains("merge"))
    assert(!terms.exists(Set("dup", "key", "fast")))
    assert(!terms.contains("noise"), "non-feedback vocab excluded")
    val shards = r.find(_.getString(0) == "shards").get
    assert(shards.getLong(1) == 6L)  // 2 per doc x 3 feedback docs
    assert(shards.getLong(2) == 3L)  // df_feedback
    assert(shards.getLong(3) == 3L)  // df_corpus
  }

  test("itemrecHitrate: planted co-purchase structure is recovered") {
    // Even (train) orders always pair 1-2; odd (test) orders also pair
    // 1-2 -> predicting 2 from 1 hits every time.
    val li = (0L until 40L).flatMap(ok => Seq((ok, 1L), (ok, 2L)))
      .zipWithIndex.map { case ((ok, pk), i) =>
        (ok, pk, 1L, i.toLong, 1.0, 1.0, 0.0, 0.0, "N", "O",
          Timestamp.valueOf("1995-01-01 00:00:00"))
      }.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
    val r = Association.itemrecHitrate(li).collect().head
    assert(r.getLong(0) == 2L)        // model: 1->2 and 2->1
    assert(r.getLong(1) == 40L)       // 20 test orders x 2 items
    assert(r.getLong(3) == 1000000L)  // every prediction hits
  }

  test("keySkewGini: hand-computed Gini on planted distributions") {
    // events: user 9 has 6 rows, users 0-3 one each -> G = 0.4 exactly.
    val ev = (Seq.fill(6)(9L) ++ Seq(0L, 1L, 2L, 3L)).zipWithIndex.map {
      case (u, i) => (i.toLong, Timestamp.valueOf("2024-01-01 00:00:00"), u,
        "click", 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    // lineitem: perfectly uniform keys -> G = 0.
    val li = (0L until 8L).map(i => (i, i % 4L, 1L, 0L, 1.0, 1.0, 0.0, 0.0,
      "N", "O", Timestamp.valueOf("1995-01-01 00:00:00")))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
    val ord = (0L until 4L).map(ok => (ok, ok, "O", 1.0,
      Timestamp.valueOf("1995-01-01 00:00:00"), "P"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    try {
      val r = graft.operators.SkewStats.keySkewGini(ev, li, ord).collect()
        .map(x => x.getString(0) -> x).toMap
      assert(r("events.user_id").getLong(5) == 400000L)
      assert(r("events.user_id").getLong(4) == 600000L)  // top share 6/10
      assert(r("lineitem.l_partkey").getLong(5) == 0L)
      assert(r("orders.o_custkey").getLong(5) == 0L)
    } finally graft.operators.DistributedRank.release(spark)
  }

  test("embeddingSplitDrift: planted fold shift recovered exactly") {
    // label 0: identical folds -> zero shift. label 1: dim 2 shifted by
    // exactly 0.5 in the odd fold -> max shift 500000 micros at dim 2,
    // mean = 500000/4 over the 4 dims.
    val rows = (0L until 40L).map { i =>
      val label = i / 20L
      val base = Array(0.25f, -0.5f, 0.125f, 0.75f)
      // fold = vec_id % 2; shift dim 2 for the odd fold of label 1
      val emb = if (label == 1L && i % 2L == 1L)
        Array(0.25f, -0.5f, 0.625f, 0.75f) else base
      (i, emb.toSeq, label)
    }.toDF("vec_id", "embedding", "label")
    val r = graft.operators.Drift.embeddingSplitDrift(rows).collect()
      .map(x => x.getLong(0) -> x).toMap
    assert(r(0L).getLong(3) == 0L && r(0L).getLong(4) == 0L)
    assert(r(1L).getLong(4) == 500000L)
    assert(r(1L).getInt(5) == 2)
    assert(r(1L).getLong(3) == 125000L)
  }

  test("eventPatternMatch: hand-counted patterns on a planted sequence") {
    // user 1: v p c p p p e p  -> vp=1, cp=1, ep=1, max p-run=3
    val types = Seq("view", "purchase", "click", "purchase", "purchase",
      "purchase", "error", "purchase")
    val rows = types.zipWithIndex.map { case (t, i) =>
      (i.toLong, Timestamp.valueOf(java.time.LocalDateTime
        .of(2024, 1, 1, 0, 0).plusSeconds(i.toLong)), 1L, t, 1.0, "{}")
    } :+ ((100L, Timestamp.valueOf("2024-01-01 01:00:00"), 2L, "signup",
      1.0, "{}"))
    val df = rows.toDF("event_id", "ts", "user_id", "event_type", "value",
      "props")
    val r = graft.queries.Analytics.eventPatternMatch(df).collect()
      .map(x => x.getLong(0) -> x).toMap
    val u1 = r(1L)
    assert(u1.getLong(1) == 8L)
    assert(u1.getLong(2) == 1L)  // vp
    assert(u1.getLong(3) == 1L)  // cp
    assert(u1.getLong(4) == 1L)  // ep
    assert(u1.getLong(5) == 3L)  // max p-run
    val u2 = r(2L)
    assert(u2.getLong(1) == 1L && u2.getLong(5) == 0L)
  }

  test("equidepthHistogram: exact bucket sizes and disjoint boundaries") {
    // 103 rows over values 1..103 cents, k=10: first 3 buckets get 11.
    val li = (1 to 103).map(i => (i.toLong, 1L, 1L, i.toLong, 1.0,
      i / 100.0, 0.0, 0.0, "N", "O",
      Timestamp.valueOf("1995-01-01 00:00:00")))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
    try {
      val r = graft.operators.Histogram.equidepthHistogram(li).collect()
      assert(r.length == 10)
      assert(r.map(_.getLong(1)).toSeq ==
        Seq(11L, 11L, 11L, 10L, 10L, 10L, 10L, 10L, 10L, 10L))
      // contiguous, disjoint, exact boundaries
      assert(r.head.getLong(2) == 1L && r.last.getLong(3) == 103L)
      r.sliding(2).foreach { case Array(a, b) =>
        assert(a.getLong(3) < b.getLong(2))
      }
    } finally graft.operators.DistributedRank.release(spark)
  }

  test("deltaAttribution: planted mix shift lands on the right value") {
    // Period A: 40 clicks, 40 views. Period B: 60 clicks, 20 views.
    def ev(n: Int, tp: String, day: Int, off: Int) =
      (0 until n).map(i => ((day * 100000 + off * 1000 + i).toLong,
        Timestamp.valueOf(java.time.LocalDateTime.of(2024, 1, day, 6, 0)
          .plusSeconds(i.toLong)), i.toLong, tp, 1.0, "{}"))
    val rows = ev(40, "click", 2, 0) ++ ev(40, "view", 2, 1) ++
      ev(60, "click", 20, 0) ++ ev(20, "view", 20, 1)
    val df = rows.toDF("event_id", "ts", "user_id", "event_type", "value",
      "props")
    val r = graft.queries.Analytics.deltaAttribution(df).collect()
      .filter(_.getString(0) == "event_type")
      .map(x => x.getString(1) -> (x.getLong(4), x.getLong(5), x.getLong(6)))
      .toMap
    assert(r("click") == (500000L, 750000L, 250000L))
    assert(r("view") == (500000L, 250000L, -250000L))
  }

  test("hourlyValuePercentiles: exact order statistics per group") {
    // Hour 3: purchase values 1..20 cents -> p50 = 10th = 0.10, p95 = 19th.
    val rows = (1 to 20).map(i =>
      (i.toLong, Timestamp.valueOf("2024-01-01 03:15:00"), i.toLong,
        "purchase", i / 100.0, "{}")) :+
      ((99L, Timestamp.valueOf("2024-01-01 03:20:00"), 99L, "view",
        999.0, "{}"))
    val df = rows.toDF("event_id", "ts", "user_id", "event_type", "value",
      "props")
    val r = graft.queries.Analytics.hourlyValuePercentiles(df).collect()
    assert(r.length == 1 && r.head.getInt(0) == 3)
    assert(r.head.getLong(1) == 20L)
    assert(r.head.getLong(2) == 10L)  // ceil(20*0.5) = 10th smallest
    assert(r.head.getLong(3) == 19L)  // ceil(20*0.95) = 19th
  }

  test("linearAttribution: credit splits equally over trailing touches") {
    // User 1: 3 clicks + 1 view in the hour before one purchase.
    val rows = Seq(
      (1L, "click", 0), (2L, "click", 60), (3L, "view", 120),
      (4L, "click", 180), (5L, "purchase", 240),
      // user 2: purchase with NO trailing touches -> excluded
      (6L, "purchase", 0)
    ).zipWithIndex.map { case ((id, tp, off), i) =>
      val u = if (id <= 5) 1L else 2L
      (id, Timestamp.valueOf(java.time.LocalDateTime.of(2024, 1, 1, 10, 0)
        .plusSeconds(off.toLong)), u, tp, 1.0, "{}")
    }
    val df = rows.toDF("event_id", "ts", "user_id", "event_type", "value",
      "props")
    val r = graft.queries.Analytics.linearAttribution(df).collect().head
    assert(r.getLong(0) == 1L)
    assert(r.getLong(1) == 750000L)  // 3/4
    assert(r.getLong(2) == 250000L)  // 1/4
  }

  test("windowFunnelDepth: ordering and window constraints both bite") {
    def at(u: Long, tp: String, h: Int) =
      ((u * 1000 + h).toLong, Timestamp.valueOf(
        java.time.LocalDateTime.of(2024, 1, 1, 0, 0).plusHours(h.toLong)),
        u, tp, 1.0, "{}")
    val rows = Seq(
      // user 1: v -> c -> p inside 24h: depth 3
      at(1, "view", 0), at(1, "click", 2), at(1, "purchase", 4),
      // user 2: click BEFORE first view: depth 1 (ordering bites)
      at(2, "click", 0), at(2, "view", 2), at(2, "purchase", 1),
      // user 3: click after 24h window: depth 1 (window bites)
      at(3, "view", 0), at(3, "click", 30), at(3, "purchase", 31),
      // user 4: no funnel events at all: depth 0
      at(4, "error", 0))
    val df = rows.toDF("event_id", "ts", "user_id", "event_type", "value",
      "props")
    val r = graft.queries.Analytics.windowFunnelDepth(df).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r == Map(0L -> 1L, 1L -> 2L, 3L -> 1L))
  }

  test("clvCohortCurves: cumulative cents per cohort hand-checked") {
    def at(u: Long, tp: String, day: Int, v: Double) =
      ((u * 1000 + day).toLong, Timestamp.valueOf(
        java.time.LocalDateTime.of(2024, 1, day, 12, 0)), u, tp, v, "{}")
    // Cohort week of Jan 1 (Mon): users 1, 2 sign up; purchases in week
    // 0 and week 1.
    val rows = Seq(
      at(1, "signup", 1, 0.0), at(2, "signup", 2, 0.0),
      at(1, "purchase", 3, 10.0), at(2, "purchase", 4, 20.0),
      at(1, "purchase", 10, 5.0))
    val df = rows.toDF("event_id", "ts", "user_id", "event_type", "value",
      "props")
    val r = graft.queries.Analytics.clvCohortCurves(df).collect()
    assert(r.length == 2)
    assert(r(0).getLong(1) == 0L && r(0).getLong(3) == 3000L)
    assert(r(0).getLong(4) == 3000L && r(0).getLong(5) == 1500L)
    assert(r(1).getLong(1) == 1L && r(1).getLong(3) == 500L)
    assert(r(1).getLong(4) == 3500L && r(1).getLong(5) == 1750L)
  }

  test("holtForecast: hand-computed level/trend on a short ramp") {
    // x = 10, 20, 30: l1=10 b1=0; l2=15 b2=1.25; l3=23.125 b3=2.96875;
    // forecasts: null, 10, 16.25.
    val rows = Seq(10, 20, 30).zipWithIndex.flatMap { case (n, h) =>
      (0 until n).map(i => ((h * 100 + i).toLong,
        Timestamp.valueOf(java.time.LocalDateTime.of(2024, 1, 1, h, 0)),
        i.toLong, "click", 1.0, "{}"))
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = graft.operators.Changepoint.holtForecast(rows).collect()
    assert(r.length == 3)
    assert(r(0).getDouble(3) == 10.0 && r(0).getDouble(4) == 0.0)
    assert(r(0).isNullAt(5))
    assert(r(1).getDouble(3) == 15.0 && r(1).getDouble(4) == 1.25)
    assert(r(1).getDouble(5) == 10.0)
    assert(r(2).getDouble(3) == 23.125 && r(2).getDouble(4) == 2.9688)
    assert(r(2).getDouble(5) == 16.25)
  }

  test("vocabGrowth: new-type attribution to first-occurrence decile") {
    // 20 docs; token 'zz' appears only from doc 10 on; 'aa' everywhere.
    val docs = (0L until 20L).map { i =>
      val text = if (i >= 10L) "aa zz" else "aa"
      (i, text, "en", "s0", text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    try {
      val rows = graft.functions.TextAnalysis.vocabGrowth(docs).collect()
      assert(rows.length == 10)
      assert(rows.map(_.getLong(1)).sum == 20L)           // docs partitioned
      assert(rows.head.getLong(3) == 1L)                  // 'aa' in decile 1
      assert(rows(5).getLong(3) == 1L)                    // 'zz' first at doc 10
      assert(rows.last.getLong(5) == 2L)                  // cumulative vocab
      assert(rows.map(_.getLong(3)).sum == 2L)
    } finally graft.operators.DistributedRank.release(spark)
  }

  test("newVsReturning: first-day attribution hand-checked") {
    def at(u: Long, day: Int) = ((u * 100 + day).toLong,
      Timestamp.valueOf(java.time.LocalDateTime.of(2024, 1, day, 9, 0)),
      u, "click", 1.0, "{}")
    // day 1: users 1,2 (both new); day 2: users 1 (returning), 3 (new)
    val df = Seq(at(1, 1), at(2, 1), at(1, 2), at(3, 2), at(1, 2))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = graft.queries.Analytics.newVsReturning(df).collect()
      .map(x => x.getDate(0).toString ->
        ((x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4)))).toMap
    assert(r("2024-01-01") == (2L, 2L, 0L, 1000000L))
    assert(r("2024-01-02") == (2L, 1L, 1L, 500000L))
  }

  test("sloBurnRate: page only when both windows burn") {
    // 10 hours at 1% errors, then one hour at 50%: 1h window pages
    // immediately, 6h window needs the spike to move the trailing rate.
    val rows = (0 until 11).flatMap { h =>
      val ts = Timestamp.valueOf(
        java.time.LocalDateTime.of(2024, 1, 1, 0, 0).plusHours(h.toLong))
      val errs = if (h < 10) 1 else 50
      (0 until errs).map(i => ((h * 1000 + i).toLong, ts, i.toLong,
        "error", 1.0, "{}")) ++
        (0 until (100 - errs)).map(i => ((h * 1000 + 500 + i).toLong, ts,
          i.toLong, "view", 1.0, "{}"))
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = graft.queries.Analytics.sloBurnRate(rows).collect()
    assert(r.length == 11)
    assert(r.take(10).forall(x => !x.getBoolean(5)))
    val spike = r.last
    assert(spike.getLong(3) == 500000L)
    // 6h trailing: (5*1 + 50) / 600 = 91666 ppm > 20000 -> page
    assert(spike.getLong(4) == 91666L)
    assert(spike.getBoolean(5))
  }

  test("rareTokenShare: hapax and rare-mass hand-checked") {
    // source s1: 'a' x10, 'b' x3, 'c' x1 -> vocab 3, hapax 1,
    // rare (<=5) types 2, rare mass 4 of 14 tokens.
    val text = (Seq.fill(10)("a") ++ Seq.fill(3)("b") :+ "c").mkString(" ")
    val docs = Seq((1L, text, "en", "s1", text.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = graft.functions.TextAnalysis.rareTokenShare(docs).collect().head
    assert(r.getLong(1) == 3L && r.getLong(2) == 14L)
    assert(r.getLong(3) == 1L && r.getLong(4) == 2L)
    assert(r.getLong(5) == 1000000L / 3L)
    assert(r.getLong(6) == 2000000L / 3L)
    assert(r.getLong(7) == 4000000L / 14L)
  }

  test("itemrecHitrate: empty model emits (0, 0, NULL) not an error") {
    // Singleton baskets -> no pairs -> empty model/probe.
    val li = (0L until 10L).map(ok => (ok, ok + 1L, 1L, 0L, 1.0, 1.0, 0.0,
      0.0, "N", "O", Timestamp.valueOf("1995-01-01 00:00:00")))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
    val r = Association.itemrecHitrate(li).collect().head
    assert(r.getLong(0) == 0L && r.getLong(1) == 0L && r.getLong(2) == 0L)
    assert(r.isNullAt(3))
  }
}
