package graft

import java.sql.Timestamp

import graft.operators.Centrality

/** Planted-graph fixtures for k-core peeling: each intended edge (a,b)
  * is a unique 8-token phrase placed verbatim in both documents; phrases
  * are separated by doc-unique filler tokens so boundary-spanning
  * 8-grams have df = 1 and never create unintended edges.
  */
class KcoreSpec extends SparkTestBase {
  import spark.implicits._

  private val t0 = Timestamp.valueOf("2024-01-01 00:00:00")

  private def phrase(a: Long, b: Long): String =
    (0 until 8).map(j => s"e${a}_${b}_$j").mkString(" ")

  private def docsFor(edges: Seq[(Long, Long)]) = {
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    nodes.map { d =>
      val mine = edges.filter(e => e._1 == d || e._2 == d)
      val text = mine.zipWithIndex
        .map { case ((a, b), i) => s"${phrase(a, b)} f${d}_$i" }
        .mkString(" ")
      (d, t0, text, "s")
    }.toDF("doc_id", "ingest_ts", "text", "source")
  }

  test("2-core keeps K4 and the triangle, peels the pendant path") {
    val k4 = for {
      a <- 1L to 4L; b <- 1L to 4L if a < b
    } yield (a, b)
    val edges = k4 ++ Seq((5L, 6L), (7L, 8L), (8L, 9L), (7L, 9L))
    val got = Centrality.docKcore(docsFor(edges), k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(3)))
    assert(got.toSeq == Seq(
      (1L, 3L, true), (2L, 3L, true), (3L, 3L, true), (4L, 3L, true),
      (7L, 2L, true), (8L, 2L, true), (9L, 2L, true)))
  }

  test("unconverged peel reports converged = false and the partial core") {
    // path 1-2-...-20 under k = 2: each round peels both endpoints;
    // 6 rounds strip 12 nodes, leaving the middle 8 still shrinking
    val edges = (1L until 20L).map(a => (a, a + 1))
    val got = Centrality.docKcore(docsFor(edges), k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(3)))
    assert(got.forall(!_._3), "a still-shrinking peel must not claim convergence")
    assert(got.map(_._1).toSeq == (7L to 14L))
    assert(got.map(_._2).toSeq == Seq(1L, 2L, 2L, 2L, 2L, 2L, 2L, 1L))
  }

  test("k above the max degree empties the core") {
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L))
    assert(Centrality.docKcore(docsFor(edges), k = 3).count() == 0L)
  }
}
