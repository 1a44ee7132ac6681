package graft

import graft.operators.Centrality

/** Hand-computed pins on a planted path+triangle shared-span graph. */
class LinkPredictionSpec extends SparkTestBase {

  test("linkPrediction scores distance-2 non-edges and excludes edges") {
    import spark.implicits._
    // Shared 4-grams: "p q r s" in docs {1,2,4}; "w x y z" in {2,3}.
    // Graph: triangle 1-2-4 plus pendant 3 on 2.
    // deg: 1->2, 2->3, 3->1, 4->2.
    // Non-edges at distance 2: (1,3) and (3,4), both via w=2.
    val d = Seq(
      (1L, "p q r s k1 k2 k3"),
      (2L, "p q r s m w x y z"),
      (3L, "w x y z n1 n2 n3"),
      (4L, "p q r s t1 t2 t3"))
      .map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = Centrality.linkPrediction(d, k = 4, dfCap = 30)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    // (1,3): cn=1, jaccard = 1e6 DIV (2+1-1) = 500000,
    //   ra = 1e6 DIV deg(2)=3 = 333333, pa = 2*1
    assert(got((1L, 3L)) === ((1L, 500000L, 333333L, 2L)))
    // (3,4): symmetric
    assert(got((3L, 4L)) === ((1L, 500000L, 333333L, 2L)))
    // triangle edges (1,2),(1,4),(2,4) and pendant edge (2,3) excluded
    assert(got.size === 2)
  }

  test("linkPrediction: nodes above the degree cap are excluded from the subgraph") {
    import spark.implicits._
    // path 1-2-3: deg(2)=2. With midDegCap=1 the only midpoint is
    // pruned -> no candidates; with the default cap (1,3) appears.
    val d = Seq(
      (1L, "p q r s k1 k2 k3"),
      (2L, "p q r s m w x y z"),
      (3L, "w x y z n1 n2 n3"))
      .map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    assert(Centrality.linkPrediction(d, k = 4, dfCap = 30, degCap = 1)
      .count() === 0L)
    assert(Centrality.linkPrediction(d, k = 4, dfCap = 30)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet ===
      Set((1L, 3L)))
  }
}
