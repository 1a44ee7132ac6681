package graft

import java.sql.Timestamp

import graft.operators.{Centrality, Experiment}

/** Fixture pins for the jackknife ratio variance and LPA communities. */
class JackknifeLpaSpec extends SparkTestBase {

  test("jackknifeRatio: hand-computed two-bucket case") {
    import spark.implicits._
    val ts0 = Timestamp.valueOf("2024-01-05 00:00:00")
    // bucket 0 (user 2): $10 + $20; bucket 1 (user 1): $30.
    // R = 60000 cents·10^4 / 3 = 20e6 micros.
    // LOO: drop b0 → 30e6; drop b1 → 15e6. v = 0.5·(Σr² − 2·r̄²)
    //   = 0.5·(1125e12 − 1012.5e12) = 56.25e12; se = 7.5e6.
    val events = Seq(
      (1L, 2L, "purchase", 10.0, ts0),
      (2L, 2L, "purchase", 20.0, ts0),
      (3L, 1L, "purchase", 30.0, ts0),
      (4L, 1L, "view", 99.0, ts0))
      .toDF("event_id", "user_id", "event_type", "value", "ts")
    val r = Experiment.jackknifeRatio(events, buckets = 2).collect().head
    assert(r.getAs[Long]("n_purchases") == 3L)
    assert(r.getAs[Long]("ratio_micros") == 20000000L)
    assert(r.getAs[Double]("loo_mean_micros") == 22500000.0)
    assert(r.getAs[Double]("jk_var") == 5.625e13)
    assert(r.getAs[Double]("jk_se") == 7500000.0)
  }

  test("docCommunities: two planted span-cliques get min-label communities") {
    import spark.implicits._
    // an 8-gram shared within each trio; trios disjoint; doc 99 isolated
    val spanA = "alpha beta gamma delta epsilon zeta eta theta"
    val spanB = "one two three four five six seven eight"
    def doc(id: Long, span: String, salt: String) =
      (id, s"$salt $span tail$id filler$id", "en", "s", 50L)
    val docs = Seq(
      doc(1L, spanA, "x1"), doc(2L, spanA, "x2"), doc(3L, spanA, "x3"),
      doc(10L, spanB, "y1"), doc(11L, spanB, "y2"),
      (99L, "lonely words only here nothing shared at all", "en", "s", 40L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = Centrality.docCommunities(docs, rounds = 4)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    // trio A collapses to label 1, pair B to label 10 (self-vote breaks
    // the synchronous two-clique oscillation), loner keeps itself
    assert(got(1L)._1 == 1L && got(2L)._1 == 1L && got(3L)._1 == 1L)
    assert(got(1L)._2 == 3L)
    assert(got(10L)._1 == 10L && got(11L)._1 == 10L && got(10L)._2 == 2L)
    assert(got(99L) === ((99L, 1L, got(99L)._3)))
    assert(got.values.forall(_._3), "4 rounds must converge on this graph")
  }
}
