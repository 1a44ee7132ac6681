package graft

import graft.functions.TextAnalysis

/** Hand-computed greedy longest-match WordPiece fixtures. */
class WordpieceSpec extends SparkTestBase {
  import spark.implicits._

  private def counts(texts: String*): Map[String, Long] = {
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    TextAnalysis.wordpieceTokenCounts(docs).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("wordpiece: greedy longest match with ## continuations") {
    // sparkling -> spark ##l ##ing ; query -> qu ##ery ;
    // customer -> cust ##omer ; the -> th ##e
    val got = counts("sparkling query customer the")
    assert(got == Map(
      "spark" -> 1L, "##l" -> 1L, "##ing" -> 1L,
      "qu" -> 1L, "##ery" -> 1L,
      "cust" -> 1L, "##omer" -> 1L,
      "th" -> 1L, "##e" -> 1L))
  }

  test("wordpiece: longest piece beats a shorter one at every step") {
    // window -> wind ##ow (not w ##i ##n ##d ...)
    val got = counts("window")
    assert(got == Map("wind" -> 1L, "##ow" -> 1L))
  }

  test("wordpiece: unmatched remainder emits [UNK] and stops") {
    // 'x9': 'x' matches, '9' matches nothing -> x [UNK]
    val got = counts("x9")
    assert(got == Map("x" -> 1L, "[UNK]" -> 1L))
  }

  test("wordpiece: distinct words tokenize once, weighted by frequency") {
    val got = counts("spark spark spark", "spark query")
    assert(got("spark") == 4L)
    assert(got("qu") == 1L)
  }
}
