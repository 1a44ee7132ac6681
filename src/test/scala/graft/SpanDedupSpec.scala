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

  test("blocklistHits: positional phrase matches per length, overlaps counted") {
    val d = docs(
      1L -> "a b c b c d",   // "b c" at pos 2 and 4
      2L -> "b c x spark y", // "b c" once, "spark" once
      3L -> "no hits here")
    val got = SpanDedup
      .blocklistHits(d, Seq("spark", "b c", "hits here zz"))
      .collect().map(r => r.getString(0) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    assert(got("b c") === ((2L, 3L)))
    assert(got("spark") === ((1L, 1L)))
    // 3-token phrase with no match emits no row
    assert(got.size === 2)
  }

  test("spanMaskPlan matches an independent Scala fold of the same draw") {
    val d = docs(
      11L -> (1 to 40).map(i => s"t$i").mkString(" "),
      12L -> "only three tokens",
      13L -> (1 to 100).map(i => s"u$i").mkString(" "))
    val got = SpanDedup.spanMaskPlan(d, spanLen = 3)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5))))
      .toMap
    for ((id, n) <- Seq(11L -> 40, 12L -> 3, 13L -> 100)) {
      val starts = (1 to n).filter(p =>
        (graft.functions.Mix64.mix(id * 1000003L + p) & 15L) == 0L)
      // reference fold: mark every masked position directly
      val masked = starts.flatMap(p => p to math.min(p + 2, n)).toSet
      val islands =
        if (masked.isEmpty) 0
        else masked.toSeq.sorted.sliding(2)
          .count(w => w.length == 2 && w(1) - w(0) > 1) + 1
      val expPpm = masked.size.toLong * 1000000L / n
      assert(got(id) === ((n.toLong, starts.size.toLong,
        masked.size.toLong, islands.toLong, expPpm)),
        s"doc $id: starts at $starts")
    }
  }

  test("spanTrimPlan: longest clean stretch, edges, full-coverage, no-dup") {
    val d = docs(
      // doc1: dup windows "a b c" at pos 4 (covers 4-6 of 10 tokens):
      //   gaps [1,3] and [7,10] -> keep (7,4)
      1L -> "x1 x2 x3 a b c y1 y2 y3 y4",
      2L -> "z a b c zz",     // dup at pos 2 covers 2-4: gaps [1,1],[5,5] -> (1,1)
      3L -> "a b c",          // fully covered -> keep_len 0
      4L -> "solo tokens only here now") // no dup -> keep all
    val got = SpanDedup.spanTrimPlan(d, k = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got(1L) === ((10L, 7L, 4L, 6L)))
    assert(got(2L) === ((5L, 1L, 1L, 4L)))
    assert(got(3L) === ((3L, 0L, 0L, 3L)))
    assert(got(4L) === ((5L, 1L, 5L, 0L)))
  }

  test("spanTrimApply emits the edited corpus matching its plan") {
    val d = docs(
      1L -> "x1 x2 x3 a b c y1 y2 y3 y4", // keep (7,4) -> "y1 y2 y3 y4"
      2L -> "z a b c zz",                 // keep (1,1) -> "z"
      3L -> "a b c",                      // fully covered -> ""
      4L -> "solo tokens only here now")  // untouched
    val got = SpanDedup.spanTrimApply(d, k = 3)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getAs[String]("cleaned_text"), r.getAs[Long]("removed_tokens"))))
      .toMap
    assert(got(1L) === (("y1 y2 y3 y4", 6L)))
    assert(got(2L) === (("z", 4L)))
    assert(got(3L) === (("", 3L)))
    assert(got(4L) === (("solo tokens only here now", 0L)))
  }

  test("spanMaskApply: rewrite agrees with a direct fold AND the plan's counts") {
    val d = docs(
      11L -> (1 to 40).map(i => s"t$i").mkString(" "),
      12L -> "only three tokens",
      13L -> (1 to 100).map(i => s"u$i").mkString(" "))
    val plan = SpanDedup.spanMaskPlan(d, spanLen = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap // masked_tokens
    val got = SpanDedup.spanMaskApply(d, spanLen = 3)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("masked_tokens"),
          r.getAs[String]("cleaned_text"))))
      .toMap
    for ((id, n) <- Seq(11L -> 40, 12L -> 3, 13L -> 100)) {
      val toks = (1 to n).map(i => if (id == 12L)
        Seq("only", "three", "tokens")(i - 1)
        else s"${if (id == 11L) "t" else "u"}$i")
      val starts = (1 to n).filter(p =>
        (graft.functions.Mix64.mix(id * 1000003L + p) & 15L) == 0L)
      val masked = starts.flatMap(p => p to math.min(p + 2, n)).toSet
      val expected = (1 to n)
        .map(i => if (masked(i)) "<mask>" else toks(i - 1)).mkString(" ")
      val (gn, gm, gt) = got(id)
      assert(gn == n.toLong)
      assert(gm == masked.size.toLong)
      assert(gm == plan(id), s"apply vs plan masked count, doc $id")
      assert(gt == expected, s"doc $id rewrite")
    }
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
