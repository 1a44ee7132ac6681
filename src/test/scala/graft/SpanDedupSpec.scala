package graft

import graft.operators.SpanDedup

/** Hand-computed pins for the positional substring-dedup family. */
class SpanDedupSpec extends SparkTestBase {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  test("duplicateSpans: cross-doc spans only, intra-doc repeats add occurrences not docs") {
    val d = docs(
      1L -> "a b c d e f",
      2L -> "a b c d x y",
      3L -> "z z a b c z",
      4L -> "q r", // below k: no windows
      5L -> "a b c q q a b c q") // "a b c" twice in ONE doc
    val got = SpanDedup.duplicateSpans(d, k = 3)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    // "a b c": docs {1,2,3,5}, occurrences 1+1+1+2
    assert(got("a b c") === ((4L, 5L)))
    // "b c d": docs {1,2}
    assert(got("b c d") === ((2L, 2L)))
    // everything else is df=1 and filtered
    assert(got.size === 2)
  }

  test("duplicateSpans: a span repeated only within one doc is not a duplicate") {
    val d = docs(1L -> "u v w u v w x", 2L -> "n o p q r s")
    assert(SpanDedup.duplicateSpans(d, k = 3).count() === 0L)
  }

  test("spanCoverage: exact interval union, islands, and short-doc zeros") {
    val d = docs(
      1L -> "a b c d e f",
      2L -> "a b c d x y",
      3L -> "z z a b c z",
      4L -> "q r")
    val got = SpanDedup.spanCoverage(d, k = 3)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5))))
      .toMap
    // doc1: dup windows at pos 1 ("a b c") and 2 ("b c d"):
    //   3 + min(3, 2-1) = 4 covered (a,b,c,d), one island
    assert(got(1L) === ((6L, 2L, 4L, 1L, 666666L)))
    assert(got(2L) === ((6L, 2L, 4L, 1L, 666666L)))
    // doc3: single dup window at pos 3
    assert(got(3L) === ((6L, 1L, 3L, 1L, 500000L)))
    // doc4: below k -> all zeros
    assert(got(4L) === ((2L, 0L, 0L, 0L, 0L)))
  }

  test("spanCoverage: adjacent windows (gap exactly k) merge into one island") {
    val d = docs(
      7L -> "g h i g h i", // "g h i" at pos 1 and 4: distance == k
      8L -> "g h i j k l")
    val got = SpanDedup.spanCoverage(d, k = 3)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    // [1,3] and [4,6] are contiguous: one island covering all 6 tokens
    assert(got(7L) === ((2L, 6L, 1L, 1000000L)))
    // doc8's single window covers 3 of 6
    assert(got(8L) === ((1L, 3L, 1L, 500000L)))
  }
}
