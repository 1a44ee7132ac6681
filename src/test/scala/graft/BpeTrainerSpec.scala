package graft

import graft.operators.BpeTrainer

/** Hand-computed BPE merge-learning fixtures. */
class BpeTrainerSpec extends SparkTestBase {
  import spark.implicits._

  private def learn(n: Int, texts: String*) = {
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    BpeTrainer.learnMerges(docs, numMerges = n).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
  }

  test("learnMerges: textbook low/lower/newest/widest example") {
    // Sennrich et al.'s canonical corpus (frequencies as words):
    // low x5, lower x2, newest x6, widest x3
    val corpus = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    val got = learn(4, corpus)
    // pair counts round 1: (e,s)=9, (s,t)=9, (w,e)=8(2 lower+6 newest)...
    // tie (e,s)/(s,t) at 9 -> lexicographic picks (e,s)
    assert(got(0) == ((1, "e", "s", 9L)))
    // round 2: (es,t)=9 wins
    assert(got(1) == ((2, "es", "t", 9L)))
    // round 3: (l,o)=7 vs (est ends)... (l,o)=7, (o,w)=7, (n,e)=6,
    //          (w,est)=6, (i,d)=3... tie (l,o)/(o,w) -> (l,o)
    assert(got(2) == ((3, "l", "o", 7L)))
    assert(got(3) == ((4, "lo", "w", 7L)))
  }

  test("applyMerge: leftmost non-overlapping occurrences") {
    assert(BpeTrainer.applyMerge(List("a", "a", "a"), "a", "a") ==
      List("aa", "a"))
    assert(BpeTrainer.applyMerge(List("a", "a", "a", "a"), "a", "a") ==
      List("aa", "aa"))
    assert(BpeTrainer.applyMerge(List("a", "b", "a", "b"), "a", "b") ==
      List("ab", "ab"))
    assert(BpeTrainer.applyMerge(List("x", "a", "b", "y"), "a", "b") ==
      List("x", "ab", "y"))
    assert(BpeTrainer.applyMerge(List("a", "b"), "b", "a") ==
      List("a", "b"))
  }

  test("learnMerges: merge count caps at available pairs") {
    val got = learn(10, "ab ab")
    // 'ab' -> one merge (a,b) with count 2, then no pairs remain
    assert(got.length == 1)
    assert(got(0) == ((1, "a", "b", 2L)))
  }

  /** The naive rescan-every-round reference loop (the pre-r11 engine
    * implementation, verbatim semantics): full pair recount per round,
    * argmax (-count, l, r), fold-based merge application.
    */
  private def naiveLearn(
      wordCounts: Seq[(String, Long)], numMerges: Int): Seq[(Int, String, String, Long)] = {
    var vocab = wordCounts.map { case (w, c) => (w.split("").toList, c) }
    val out = Seq.newBuilder[(Int, String, String, Long)]
    var step = 1
    var exhausted = false
    while (step <= numMerges && !exhausted) {
      val pc = scala.collection.mutable.LinkedHashMap.empty[(String, String), Long]
      vocab.foreach { case (syms, c) =>
        syms.zip(syms.tail).foreach(p => pc.update(p, pc.getOrElse(p, 0L) + c))
      }
      if (pc.isEmpty) exhausted = true
      else {
        val ((l, r), cnt) = pc.minBy { case ((a, b), n) => (-n, a, b) }
        out += ((step, l, r, cnt))
        vocab = vocab.map { case (s, c) => (BpeTrainer.applyMerge(s, l, r), c) }
        step += 1
      }
    }
    out.result()
  }

  test("incremental trainer == naive rescan loop on randomized corpora, deep merges") {
    import org.apache.spark.sql.functions._
    val rng = new scala.util.Random(41)
    (0 until 5).foreach { trial =>
      // random words over a 4-letter alphabet: heavy pair collisions,
      // many exact-count ties — the tie-break is what's being stressed
      val words = (0 until 120).map { _ =>
        (1 to (2 + rng.nextInt(7))).map(_ => ('a' + rng.nextInt(4)).toChar).mkString
      }
      val text = words.mkString(" ")
      val docs = Seq((0L, text)).toDF("doc_id", "text")
      val got = BpeTrainer.learnMerges(docs, numMerges = 64).collect()
        .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
      val wc = words.groupBy(identity).view.mapValues(_.size.toLong).toSeq.sorted
      val want = naiveLearn(wc, 64)
      assert(got == want, s"trial $trial")
    }
  }

  test("learnMerges: oversized vocabulary fails loudly instead of collecting") {
    val docs = Seq((0L, "a b c d e f g h")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      BpeTrainer.learnMerges(docs, numMerges = 2, maxVocabRows = 3)
    }
    assert(e.getMessage.contains("maxVocabRows"))
  }

  test("encodeStats: counts reflect the applied merges per source") {
    val docs = Seq(
      (1L, "abab abab cd"), // source A
      (2L, "ab xy")
    ).toDF("doc_id", "text")
      .withColumn("source",
        org.apache.spark.sql.functions.when(
          org.apache.spark.sql.functions.col("doc_id") === 1L, "A")
          .otherwise("B"))
    val got = graft.operators.BpeTrainer.encodeStats(docs, numMerges = 2)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // merges: (a,b) count 5 -> then (ab,ab) count 2:
    // 'abab' -> [abab]x1 sym; 'ab' -> [ab]; 'cd' -> [c,d]; 'xy' -> [x,y]
    assert(got("A") == ((3L, 10L, 1L + 1L + 2L)))
    assert(got("B") == ((2L, 4L, 1L + 2L)))
  }
}
