package graft

import graft.functions.TextAnalysis
import graft.operators.Keywords

/** Hand-walked pins for TextRank and the langid confusion matrix. */
class TextrankLangidSpec extends SparkTestBase {

  private def docs(rows: (Long, String, String)*) = {
    import spark.implicits._
    rows.map { case (id, t, lang) => (id, t, lang, "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  test("textrankKeywords: 3-round damped walk on triangle + pendant") {
    // graph: x-y, y-z, x-z, x-w; hand-walked integer pagerank
    val d = docs(
      (1L, "x y", "en"), (2L, "y z", "en"),
      (3L, "x z", "en"), (4L, "x w", "en"))
    val got = Keywords.textrankKeywords(d, topK = 10)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(got("x") === ((3L, 1606153L)))
    assert(got("y") === ((2L, 945131L)))
    assert(got("z") === ((2L, 945131L)))
    assert(got("w") === ((1L, 503575L)))
  }

  test("textrankKeywords: self-adjacency is dropped, repeat edges dedup") {
    val d = docs((1L, "a a b a b", "en"))
    // pairs: (a,a) dropped; (a,b) x3 -> one undirected edge
    val got = Keywords.textrankKeywords(d, topK = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("a" -> 1L, "b" -> 1L))
  }

  test("langidConfusion: cells, per-class recall, correctness flags") {
    val d = docs(
      (1L, "the and house", "en"),
      (2L, "zzz qqq", "en"), // no markers -> und
      (3L, "la le monde", "fr"))
    val got = TextAnalysis.langidConfusion(d)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5))))
      .toMap
    assert(got(("en", "en")) === ((1L, 2L, 500000L, true)))
    assert(got(("en", "und")) === ((1L, 2L, 500000L, false)))
    assert(got(("fr", "fr")) === ((1L, 1L, 1000000L, true)))
    assert(got.size === 3)
  }
}
