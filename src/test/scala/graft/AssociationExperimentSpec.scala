package graft

import java.sql.Timestamp

import graft.operators.{Association, Changepoint, DataQuality, Experiment}

/** Fixture tests for the association-mining, experimentation, and
  * data-audit operators added alongside the chi-square/CUSUM family:
  * planted baskets, a planted covariate shift, a planted EWMA level
  * shift, and hand-computed Benford/PMI cells.
  */
class AssociationExperimentSpec extends SparkTestBase {
  import spark.implicits._

  private def li(rows: Seq[(Long, Long)]) =
    rows.zipWithIndex.map { case ((ok, pk), i) =>
      (ok, pk, 1L, i.toLong, 1.0, 1.0, 0.0, 0.0, "N", "O",
        Timestamp.valueOf("1995-01-01 00:00:00"))
    }.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_quantity", "l_extendedprice", "l_discount", "l_tax",
      "l_returnflag", "l_linestatus", "l_shipdate")

  test("assocRules: hand-computed confidence and lift on planted baskets") {
    // parts 1,2 co-occur in 3 of 4 baskets; part 1 in all 4, part 2 in 3.
    val baskets = Seq(
      1L -> 1L, 1L -> 2L, 2L -> 1L, 2L -> 2L, 3L -> 1L, 3L -> 2L,
      4L -> 1L, 4L -> 3L, 5L -> 3L, 6L -> 3L)
    val r = Association.assocRules(li(baskets), minSupport = 3L)
      .collect().map(x => (x.getLong(1), x.getLong(0), x.getLong(2),
        x.getLong(5), x.getLong(6)))
    // rule 2 -> 1: conf = 3/3 = 1.0, lift = 3*6/(3*4)
    assert(r.contains((1L, 2L, 3L, 1000000L, 3L * 6L * 1000000L / 12L)))
    // rule 1 -> 2: conf = 3/4
    assert(r.contains((2L, 1L, 3L, 750000L, 1500000L)))
    // no rule involving part 3 (its pairs are below min support)
    assert(!r.exists(x => x._1 == 3L || x._2 == 3L))
  }

  test("itemCosineTopK: cos2 exact and per-item rank contiguous") {
    val baskets = Seq(
      1L -> 1L, 1L -> 2L, 2L -> 1L, 2L -> 2L, 3L -> 1L, 3L -> 2L,
      4L -> 1L, 4L -> 2L, 5L -> 1L, 6L -> 2L)
    val rows = Association.itemCosineTopK(li(baskets), minSupport = 3L)
      .collect()
    // cos^2(1,2) = 4^2 / (5*5); both directions present at rank 1
    assert(rows.length == 2)
    assert(rows.forall(_.getInt(1) == 1))
    assert(rows.forall(_.getLong(6) == 16L * 1000000L / 25L))
  }

  test("cupedAdjust: pre-period covariate absorbs planted user baseline") {
    // Each user's post-period purchases equal its pre-period purchases
    // (a pure user effect): CUPED should drive adjusted variance ~0,
    // while raw variance across users is large.
    val rows = (0L until 40L).flatMap { u =>
      val base = 10.0 + u
      Seq(
        (u * 2, Timestamp.valueOf("2024-01-03 00:00:00"), u, "purchase",
          base, "{}"),
        (u * 2 + 1, Timestamp.valueOf("2024-01-20 00:00:00"), u, "purchase",
          base, "{}"))
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = Experiment.cupedAdjust(rows).collect()
    assert(r.length == 2)
    r.foreach { v =>
      assert(v.getDouble(5) == 1.0, "theta == 1 for identical pre/post")
      assert(v.getDouble(8) < 1e-9, s"adjusted variance ~0: $v")
      assert(v.getDouble(7) > 100.0, "raw variance is large")
      assert(v.getDouble(9) > 99.999, "variance reduction ~100%")
    }
  }

  test("cupedAdjust: constant pre-period covariate gives NULL theta, not NaN") {
    // All pre-period spend identical -> var(X) = 0 -> theta undefined.
    val rows = (0L until 20L).flatMap { u =>
      Seq(
        (u * 2, Timestamp.valueOf("2024-01-03 00:00:00"), u, "purchase",
          5.0, "{}"),
        (u * 2 + 1, Timestamp.valueOf("2024-01-20 00:00:00"), u, "purchase",
          10.0 + u, "{}"))
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = Experiment.cupedAdjust(rows).collect()
    assert(r.length == 2)
    r.foreach { v =>
      assert(v.isNullAt(5), "theta NULL on zero covariate variance")
      assert(v.isNullAt(6) && v.isNullAt(8), "adjusted columns NULL too")
      assert(!v.getDouble(7).isNaN, "raw variance still real")
    }
  }

  test("conformalIntervals: tiny calibration set gives infinite radius") {
    // 4 even-id docs: k = ceil(5 * 0.9) = 5 > 4 -> qhat NULL, full
    // coverage on the test half (not an empty report).
    val docs = (0L until 9L).map { i =>
      val words = (0 until 10).map(_ => "ab").mkString(" ")
      (i, words, "en", "s0", (20 + i).toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = Experiment.conformalIntervals(docs).collect()
    assert(r.nonEmpty, "tiny calibration must not collapse to zero rows")
    assert(r.forall(_.isNullAt(4)), "qhat NULL in the infinite regime")
    assert(r.forall(_.getLong(6) == 1000000L), "trivial full coverage")
    assert(r.map(_.getString(0)).contains("__all__"))
  }

  test("ewmaAnomalies: single-baseline-hour type is excluded, not NaN") {
    // 'solo' has one baseline hour; 'ok' has a full baseline.
    val rows =
      (0 until 48).flatMap { h =>
        val ts = Timestamp.valueOf(java.time.LocalDateTime
          .of(2024, 1, 1, 0, 30).plusHours(h.toLong))
        (0 until 5).map(i => ((h * 100 + i).toLong, ts, i.toLong, "ok",
          1.0, "{}"))
      } :+ ((9999L, Timestamp.valueOf("2024-01-02 10:30:00"), 1L, "solo",
        1.0, "{}"))
    val df = rows.toDF("event_id", "ts", "user_id", "event_type", "value",
      "props")
    val r = Changepoint.ewmaAnomalies(df, "2024-01-03 00:00:00").collect()
    assert(r.nonEmpty)
    assert(!r.exists(_.getString(0) == "solo"), "no-variance type excluded")
    assert(r.forall(v => !v.getDouble(4).isNaN && !v.getDouble(5).isNaN))
  }

  test("conformalIntervals: planted exact-rate corpus covers everywhere") {
    // tokens = chars/10 exactly for every doc: residuals 0, qhat 0,
    // coverage 1e6 ppm.
    val docs = (0L until 100L).map { i =>
      val words = (0 until 20).map(_ => "abcdefghi").mkString(" ")
      (i, words, "en", s"src${i % 4}", 200L)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = Experiment.conformalIntervals(docs).collect()
    assert(r.forall(_.getLong(6) == 1000000L))
    assert(r.forall(_.getLong(4) == 0L))
  }

  test("conformalIntervals: coverage is ~1-alpha on a noisy corpus") {
    // Deterministic residual noise: token count varies by doc id.
    val docs = (0L until 400L).map { i =>
      val extra = (i * 2654435761L % 11L).toInt  // 0..10 extra tokens
      val words = (0 until (20 + extra)).map(_ => "abcdefghi").mkString(" ")
      (i, words, "en", "src0", 200L)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val all = Experiment.conformalIntervals(docs)
      .filter("source = '__all__'").collect().head
    val ppm = all.getLong(6)
    assert(ppm >= 880000L && ppm <= 1000000L,
      s"coverage $ppm should be >= 1 - alpha with finite-sample slack")
  }

  test("ewmaAnomalies: planted level shift raises alarms after the shift") {
    // Baseline week: 10 events/hour; after Jan 15: 30/hour.
    val rows = (0 until 24 * 20).flatMap { h =>
      val ts = Timestamp.valueOf(
        java.time.LocalDateTime.of(2024, 1, 1, 0, 30).plusHours(h.toLong))
      val n = if (h < 24 * 14) 10 else 30
      (0 until n).map(i =>
        (h.toLong * 100 + i, ts, i.toLong, "click", 1.0, "{}"))
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = Changepoint.ewmaAnomalies(rows).collect()
    val (pre, post) = r.partition(_.getTimestamp(1).before(
      Timestamp.valueOf("2024-01-15 00:00:00")))
    assert(pre.forall(!_.getBoolean(6)), "no alarms on the flat baseline")
    // After the sustained shift the EWMA must exceed the UCL and stay there.
    assert(post.count(_.getBoolean(6)) > post.length / 2)
    // EWMA converges to the new level
    assert(math.abs(r.last.getDouble(3) - 30.0) < 0.5)
  }

  test("benfordAudit: digits come from decimal strings, cells hand-checked") {
    val orders = Seq(1.0, 1.5, 19.99, 123.0, 2.0, 25.0, 31.4, 999.0, 0.5)
      .zipWithIndex.map { case (p, i) =>
        (i.toLong, 1L, "O", p, Timestamp.valueOf("1995-01-01 00:00:00"), "P")
      }.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    val r = DataQuality.benfordAudit(orders, "o_totalprice")
      .collect().map(x => (x.getInt(0), x.getLong(1))).toMap
    // 0.5 excluded (< 1); digits: 1,1,1,1,2,2,3,9
    assert(r == Map(1 -> 4L, 2 -> 2L, 3 -> 1L, 9 -> 1L))
  }

  test("mutualInformation: independent columns give ~0 MI, exact cells") {
    val df = (0 until 400).map(i => (s"a${i % 4}", s"b${i % 5}"))
      .toDF("x", "y")
    val r = DataQuality.mutualInformation(df, "x", "y").collect()
    assert(r.length == 20)
    // perfectly independent: every pmi contribution is exactly ln(1) = 0
    assert(r.forall(v => math.abs(v.getDouble(5)) < 1e-9))
  }

  test("deletionPropagation: transitive lineitem scope matches direct count") {
    val cust = (1L to 200L).map(k => (k, s"c$k", 0L, 0.0, "SEG"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
    val orders = (1L to 500L).map(ok =>
      (ok, ok % 200L + 1L, "O", 1.0,
        Timestamp.valueOf("1995-01-01 00:00:00"), "P"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    val lineitem = li((1L to 500L).flatMap(ok => Seq(ok -> 1L, ok -> 2L)))
    val events = (0L until 300L).map(i =>
      (i, Timestamp.valueOf("2024-01-02 00:00:00"), i % 200L, "click", 1.0,
        "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = DataQuality.deletionPropagation(cust, orders, lineitem, events,
      m = 97).collect().map(x => (x.getString(0), x.getLong(1))).toMap
    // custkeys 97, 194 of 1..200 are cohort
    assert(r("customer") == 2L)
    // orders with o_custkey in {97, 194}
    val expectedOrders = (1L to 500L).count(ok => {
      val ck = ok % 200L + 1L; ck == 97L || ck == 194L })
    assert(r("orders") == expectedOrders.toLong)
    assert(r("lineitem") == expectedOrders.toLong * 2)
    // user_ids 0 and 97 (mod 97 == 0) among 0..199
    assert(r("events") == (0L until 300L).count(i =>
      (i % 200L) % 97L == 0L).toLong)
  }
}
