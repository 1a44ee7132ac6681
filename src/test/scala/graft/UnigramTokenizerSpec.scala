package graft

import graft.functions.UnigramTokenizer

class UnigramTokenizerSpec extends SparkTestBase {

  import spark.implicits._

  private def docs(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, "src0", t) }
      .toDF("doc_id", "source", "text")

  private def seg(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r =>
      r.getString(0) ->
        ((r.getLong(3), r.getLong(4), r.getString(5)))).toMap

  test("whole word in vocab segments as one piece") {
    val out = seg(UnigramTokenizer.unigramSegment(docs("ab ab ab cd")))
    assert(out("ab") == ((1L, 3L, "ab")))
    assert(out("cd") == ((1L, 1L, "cd")))
  }

  test("piece count dominates piece frequency") {
    // "ab" occurs twice as a substring but the 1-piece decode of "abc"
    // beats any 2-piece split regardless of frequency
    val out = seg(UnigramTokenizer.unigramSegment(docs("abc ab bc")))
    assert(out("abc") == ((1L, 1L, "abc")))
  }

  test("char-only vocab forces the per-character fallback") {
    val out = seg(UnigramTokenizer.unigramSegment(
      docs("abcd"), vocabTopK = 0))
    assert(out("abcd") == ((4L, 4L, "a|b|c|d")))
  }

  test("8-char word with maxPieceLen=6 picks the lexicographic 2-split") {
    // all np=2 splits tie on frequency (every substring occurs once);
    // ASCII '|' > any letter, so the longest first piece sorts first
    val out = seg(UnigramTokenizer.unigramSegment(docs("abcdefgh")))
    assert(out("abcdefgh") == ((2L, 2L, "abcdef|gh")))
  }

  test("words longer than maxWordLen are excluded") {
    val out = seg(UnigramTokenizer.unigramSegment(
      docs("a_seventeen_chars ok")))
    assert(out.keySet == Set("ok"))
  }

  test("frequency tiebreak prefers the frequent piece at equal count") {
    // "xy" (freq 3: 2 standalone + 1 inside xyz) vs "yz" (freq 1):
    // both 2-splits of "xyz" tie at np=2, sf differs: xy|z has sf 3+1,
    // x|yz has 1+1 → xy|z wins on frequency, not lexicography
    val out = seg(UnigramTokenizer.unigramSegment(
      docs("xyz xy xy"), vocabTopK = 1))
    // top-1 len>=2 vocab = xy (F=3); yz/xyz drop out → only split is xy|z
    assert(out("xyz")._3 == "xy|z")
    val full = seg(UnigramTokenizer.unigramSegment(docs("xyz xy xy")))
    // with the full vocab the 1-piece decode wins again
    assert(full("xyz") == ((1L, 1L, "xyz")))
  }
}
