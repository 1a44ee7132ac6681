package graft

import java.sql.Timestamp
import graft.operators.{Centrality, Changepoint}

/** Hand-walked pins for the PH detector and bipartite HITS. */
class PageHinkleyHitsSpec extends SparkTestBase {

  test("pageHinkley: hand-walked running-mean micros and alarm") {
    import spark.implicits._
    // type A hourly counts: [2, 2, 10]
    val rows = Seq(0, 0, 1, 1, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2).zipWithIndex
      .map { case (hr, i) =>
        (i.toLong, Timestamp.valueOf(f"2024-01-01 $hr%02d:0${i % 6}:00"),
          1L, "A", 0.0, "{}")
      }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = Changepoint.pageHinkley(rows, deltaMicros = 500000L,
      lambdaMicros = 2000000L).collect()
    // t1: m=-5e5 ph=0; t2: m=-1e6 ph=0;
    // t3: mean=14e6 DIV 3=4666666, term=4833334, m=3833334, ph=4833334
    assert(got.map(r => (r.getLong(2), r.getLong(3), r.getLong(4),
      r.getBoolean(5))).toSeq === Seq(
      (2L, -500000L, 0L, false),
      (2L, -1000000L, 0L, false),
      (10L, 3833334L, 4833334L, true)))
  }

  test("docHits: two-round mean-normalized bipartite walk, hand values") {
    import spark.implicits._
    // shared 4-grams: "a b c d" in {1,2}; "e f g h" in {2,3}; doc4 isolated
    val d = Seq(
      (1L, "a b c d x1 x2"),
      (2L, "a b c d q e f g h"),
      (3L, "e f g h z1 z2"),
      (4L, "solo words only here"))
      .map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = Centrality.docHits(d, k = 4, dfCap = 30)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    // hubs normalize to 1e6 each round; authorities: center doc 2 gets
    // 2e6 raw -> 1.5e6 normalized, leaves 750000, both rounds
    assert(got(1L) === ((1L, 750000L, 750000L)))
    assert(got(2L) === ((2L, 1500000L, 1500000L)))
    assert(got(3L) === ((1L, 750000L, 750000L)))
    assert(got(4L) === ((0L, 0L, 0L)))
  }
}
