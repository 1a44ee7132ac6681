package graft

import graft.functions.TextAnalysis

/** Hand-computed greedy longest-match WordPiece fixtures. */
class WordpieceSpec extends SparkTestBase {
  import spark.implicits._

  private def docsOf(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")

  private def counts(texts: String*): Map[String, Long] = {
    val docs = docsOf(texts: _*)
    val decl = TextAnalysis.wordpieceTokenCounts(docs).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // every fixture doubles as an equality pin of the native expression
    val native = TextAnalysis.wordpieceTokenCountsNative(docs).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(native == decl, "native WordpieceEncode vs declarative fold")
    decl
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

  test("wordpiece: native expression equals the fold on the sf0.001 corpus") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val decl = TextAnalysis.wordpieceTokenCounts(docs).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSeq.sorted
    val native = TextAnalysis.wordpieceTokenCountsNative(docs).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSeq.sorted
    assert(native.nonEmpty && native == decl)
  }

  test("wordpiece native: no UDF object in the plan, encode stays codegen'd") {
    val p = TextAnalysis.wordpieceTokenCountsNative(docsOf("spark query"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("ScalaUDF") && !p.contains("BatchEvalPython"), p)
    assert(p.contains("wordpiece_encode"), p)
  }
}
