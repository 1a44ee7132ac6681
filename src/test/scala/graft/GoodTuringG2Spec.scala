package graft

import graft.functions.TextAnalysis

/** Fixture pins for Good-Turing smoothing and G² collocations. */
class GoodTuringG2Spec extends SparkTestBase {

  private def docs(texts: String*) = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) =>
      (i.toLong, t, "en", "s", t.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  test("goodTuring: hand-built count-of-counts") {
    // trigrams: "a b c" ×3 (three docs), "x y z" ×1, "p q r" ×1
    // → N_3 = 1, N_1 = 2. r=1: r* = 2·N_2/N_1 → N_2=0 → NULL.
    // Add "m n o" ×2 → N_2 = 1: r=1: r* = (2·1·1e6)/2 = 1e6;
    // r=2: r* = 3·1/1 → 3e6... N_3=1: r=2 → (3·1·1e6)/1 = 3e6.
    val df = docs("a b c", "a b c", "a b c", "x y z", "p q r",
      "m n o", "m n o")
    val got = TextAnalysis.goodTuring(df)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    assert(got(1L) === ((2L, 1L, 1000000L)))
    assert(got(2L) === ((1L, 1L, 3000000L)))
    assert(got(3L) === ((1L, 0L, -1L))) // no N_4: NULL r*
  }

  test("collocationsG2: the planted collocation dominates") {
    // "strong pair" always adjacent (20×); filler bigrams random-ish.
    val df = docs(
      (Seq.fill(20)("strong pair").mkString(" ") + " " +
        Seq.tabulate(40)(i => s"w${i % 7}").mkString(" ")))
    val rows = TextAnalysis.collocationsG2(df, minCount = 5L)
      .collect()
    assert(rows.nonEmpty)
    val top = rows.head
    assert(top.getString(0) == "strong" && top.getString(1) == "pair")
    // G² of a perfect association is strongly positive
    assert(top.getAs[Double]("g2") > 10.0)
    // G² is monotone down the emitted list (rounded grid)
    val g2s = rows.map(_.getAs[Double]("g2"))
    assert(g2s.sliding(2).forall { case Array(a, b) => a >= b })
  }
}
