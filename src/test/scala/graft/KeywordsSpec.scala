package graft

import graft.operators.Keywords

/** Hand-computed RAKE pin. */
class KeywordsSpec extends SparkTestBase {

  test("rakeKeywords scores the planted corpus per Rose et al.") {
    import spark.implicits._
    // stopword = "x". Doc 1: "deep learning x deep learning x ai"
    //   phrases: "deep learning" ×2, "ai" ×1.
    // freq: deep 2, learning 2, ai 1. deg: deep 4, learning 4, ai 1.
    // scores (micros): deep 2e6, learning 2e6, ai 1e6.
    // "deep learning" = 4e6, "ai" = 1e6.
    val docs = Seq(
      (1L, "deep learning x deep learning x ai", "en", "s", 34L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = Keywords.rakeKeywords(docs, Seq("x"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got("deep learning") === ((2L, 2L, 4000000L)))
    assert(got("ai") === ((1L, 1L, 1000000L)))
  }

  test("overlong candidates are dropped before scoring") {
    import spark.implicits._
    val long = (1 to 9).map(i => s"w$i").mkString(" ") // 9-word island
    val docs = Seq(
      (1L, s"$long x ok run", "en", "s", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = Keywords.rakeKeywords(docs, Seq("x"), maxPhraseWords = 8)
      .collect().map(_.getString(0)).toSet
    assert(got === Set("ok run"))
  }
}
