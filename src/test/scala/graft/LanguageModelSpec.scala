package graft

import graft.functions.LanguageModel
import org.apache.spark.sql.functions._

class LanguageModelSpec extends SparkTestBase {

  import spark.implicits._

  private def docs(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, "src0", t) }
      .toDF("doc_id", "source", "text")

  // Fixture: "a b", "a b", "a c", "b c"
  //   bigram counts: (a,b)=2 (a,c)=1 (b,c)=1; B=3 types
  //   heads: c(a·)=3, N1+(a·)=2; c(b·)=1, N1+(b·)=1
  //   continuations: N1+(·b)=1, N1+(·c)=2
  // Hand KN (D=3/4, common denominator 4·c1·B):
  //   (a,b): num=(8−3)·3+3·2·1=21, den=36  → 7/12
  //   (a,c): num=(4−3)·3+3·2·2=15, den=36  → 5/12   (head a sums to 1, no
  //          unseen mass: both continuation types observed after a)
  //   (b,c): num=(4−3)·3+3·1·2=9,  den=12  → 3/4; unseen w2=b adds
  //          3·1·(3−2)=3 → 12/12 ✓
  private val fixture = docs("a b", "a b", "a c", "b c")

  test("knBigramTable matches the hand-computed KN lattice") {
    val got = LanguageModel.knBigramTable(fixture, minHeadCount = 1L, k = 10)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6), r.getLong(7), r.getLong(8), r.getLong(9),
          r.getBoolean(10)))
      .toMap
    assert(got(("a", "b")) == (2L, 3L, 2L, 1L, 3L, 21L, 36L,
      21L * 1000000L / 36L, true))
    assert(got(("a", "c")) == (1L, 3L, 2L, 2L, 3L, 15L, 36L,
      15L * 1000000L / 36L, true))
    assert(got(("b", "c")) == (1L, 1L, 1L, 2L, 3L, 9L, 12L,
      750000L, true))
    assert(got.size == 3)
  }

  test("knBigramTable: per-head probabilities normalize exactly (property)") {
    // A messier corpus; norm_tight must hold on EVERY row because the
    // identity is algebraic, not data-dependent.
    val messy = docs(
      "x y z x y", "y z q", "q x q y q z q q", "z z z y x", "x q")
    val rows = LanguageModel.knBigramTable(messy, minHeadCount = 1L, k = 100)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getBoolean(10),
      s"norm_tight violated at (${r.getString(0)},${r.getString(1)})"))
    // and the head-a mass really is Σ_obs num + unseen = den, recomputed
    // outside the engine from the emitted columns
    val byHead = rows.groupBy(_.getString(0))
    byHead.foreach { case (_, hs) =>
      val b = hs.head.getLong(6)
      val r1 = hs.head.getLong(4)
      val den = hs.head.getLong(8)
      val obsNum = hs.map(_.getLong(7)).sum
      val obsR2 = hs.map(_.getLong(5)).sum
      assert(obsNum + 3L * r1 * (b - obsR2) == den)
    }
  }

  test("knBigramTable: minHeadCount filters output, not the model") {
    // head 'a' occurs 3 times, 'b' once; with the floor at 2 only head-a
    // rows survive, but their counts still reflect the full corpus.
    val got = LanguageModel.knBigramTable(fixture, minHeadCount = 2L, k = 10)
      .collect()
    assert(got.map(_.getString(0)).distinct.sameElements(Array("a")))
    assert(got.forall(_.getLong(6) == 3L)) // B still counts (b,c)
  }

  test("knDocNll scores degenerate repetition below typical text") {
    // doc 0 repeats one high-probability transition; doc 1 is the same
    // tokens shuffled into rarer transitions. Lower NLL = more typical.
    val corpus = docs(
      "a b a b a b a b a b",
      "b a a b b a b a a a",
      "a b a b c d c d e f")
    val rows = LanguageModel.knDocNll(corpus).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(rows.size == 3)
    assert(rows(0L) < rows(2L))
    // all finite (num ≥ continuation term > 0 for observed bigrams)
    rows.values.foreach(v => assert(!v.isNaN && !v.isInfinite))
  }

  test("knDocNll: single-token and empty-ish docs yield no row, not a crash") {
    val corpus = docs("solo", "a b a", "x")
    val rows = LanguageModel.knDocNll(corpus).collect()
    assert(rows.map(_.getLong(0)).toSet == Set(1L))
  }

  // ---- Stupid Backoff ------------------------------------------------------

  test("stupidBackoffCrossSplit exercises all three score paths") {
    // Build a corpus where we CONTROL the split by probing the hash: find
    // texts landing train-side and test-side, then assert path counts.
    import graft.functions.GraftColumns
    val probe = (0 until 200).map(i => s"w$i a b").toDF("text")
      .withColumn("bucket", GraftColumns.rollingHash(col("text")) % 100)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val trainTxt = probe.collectFirst { case (t, b) if b < 90 => t }.get
    // a test-side doc containing: a train bigram ("a b" if trainTxt has
    // it), a backoff bigram (both unigrams trained, pair untrained) and
    // an OOV bigram
    val testTxt = (0 until 500).map(i => s"z$i b a qqq$i a b")
      .toDF("text")
      .withColumn("bucket", GraftColumns.rollingHash(col("text")) % 100)
      .collect().collectFirst {
        case r if r.getLong(1) >= 90 => r.getString(0)
      }.get
    val corpus = Seq((0L, "src0", trainTxt), (1L, "src0", testTxt))
      .toDF("doc_id", "source", "text")
    val rows = LanguageModel.stupidBackoffCrossSplit(corpus).collect()
    assert(rows.length == 1 && rows(0).getLong(0) == 1L)
    val (nBi, nSeen, nBack, nOov) =
      (rows(0).getLong(1), rows(0).getLong(2), rows(0).getLong(3),
        rows(0).getLong(4))
    assert(nBi == nSeen + nBack + nOov)
    assert(nSeen >= 1L, "the train bigram 'a b' must score as seen")
    assert(nBack >= 1L, "'b a' (unigrams known, pair unknown) must back off")
    assert(nOov >= 1L, "the z*/qqq* tokens must be OOV")
  }

  test("stupidBackoffCrossSplit: exact micros arithmetic on a pinned model") {
    import graft.functions.GraftColumns
    // trainTxt = "c d c d c": bigrams (c,d)x2 (d,c)x2; unigrams c=3 d=2 N=5
    val trainTxt = "c d c d c"
    val trainBucket = Seq(trainTxt).toDF("text")
      .select((GraftColumns.rollingHash(col("text")) % 100).as("b"))
      .head().getLong(0)
    assume(trainBucket < 90, "fixture text must land train-side")
    // find a test-side doc "p_i c d d" — seen (c,d): c12=2 over context
    // count u1(c)=2 (bigram starts, doc-final c excluded) → 10⁶ exactly;
    // backoff (d,d): 2·cu(d)·10⁶/(5·N) = 2·2·10⁶/25 = 160000
    val testTxt = (0 until 500).map(i => s"p$i c d d")
      .toDF("text")
      .withColumn("bucket", GraftColumns.rollingHash(col("text")) % 100)
      .collect().collectFirst {
        case r if r.getLong(1) >= 90 => r.getString(0)
      }.get
    val corpus = Seq((0L, "s", trainTxt), (1L, "s", testTxt))
      .toDF("doc_id", "source", "text")
    val r = LanguageModel.stupidBackoffCrossSplit(corpus).head()
    // bigrams of testTxt: (c,d)=seen; (d,d) AND (p_i,c) back off — the
    // path is decided by w2 (c is a known unigram even though p_i isn't)
    assert(r.getLong(1) == 3L && r.getLong(2) == 1L &&
      r.getLong(3) == 2L && r.getLong(4) == 0L)
    val expected = 2L * 1000000L / 2L +          // (c,d): c12=2, u1(c)=2
      2L * 2L * 1000000L / 25L +                 // (d,d): cu(d)=2, N=5
      2L * 3L * 1000000L / 25L                   // (p_i,c): cu(c)=3
    assert(r.getLong(5) == expected)
  }
}
