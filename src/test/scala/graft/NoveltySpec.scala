package graft

import graft.operators.Novelty

class NoveltySpec extends SparkTestBase {

  import spark.implicits._

  private def docs(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, "src0", t) }
      .toDF("doc_id", "source", "text")

  test("ngramNovelty: verbatim repeat of an earlier doc scores zero") {
    val t = "one two three four five six seven"
    val rows = Novelty.ngramNovelty(docs(t, t), k = 5).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    // 7 tokens, k=5 → 3 distinct shingles per doc
    assert(rows(0L) == (3L, 3L, 1000000L))
    assert(rows(1L) == (3L, 0L, 0L))
  }

  test("ngramNovelty: partial overlap counts shingle-exactly") {
    // doc1 shares exactly the window "b c d e f" with doc0 (and only it)
    val rows = Novelty.ngramNovelty(
      docs("a b c d e f", "b c d e f g h"), k = 5).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(rows(0L) == (2L, 2L, 1000000L))
    // doc1: shingles {b..f, c..g, d..h}; only b..f was seen before
    assert(rows(1L) == (3L, 2L, 2L * 1000000L / 3L))
  }

  test("ngramNovelty: repeated shingle WITHIN one doc counts once") {
    // "x y x y x y x y" with k=3 has only 2 distinct shingles
    val rows = Novelty.ngramNovelty(docs("x y x y x y x y"), k = 3).collect()
    assert(rows.length == 1)
    assert(rows(0).getLong(1) == 2L && rows(0).getLong(2) == 2L)
  }

  test("ngramNovelty: short docs (< k tokens) emit no row") {
    val rows = Novelty.ngramNovelty(docs("too short", "a b c d e"), k = 5)
      .collect()
    assert(rows.map(_.getLong(0)).toSet == Set(1L))
  }
}
