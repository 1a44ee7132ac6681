package graft

import java.sql.Timestamp
import graft.functions.Mix64
import graft.operators.{CorpusStats, RobustStats, Skyline, WeightedJaccard}

class SkylineCorpusSpec extends SparkTestBase {

  import spark.implicits._

  private def docs(rows: (Long, String, String)*) =
    rows.toDF("doc_id", "source", "text")

  test("paretoDocs: domination, same-x groups and full ties") {
    val out = Skyline.paretoDocs(docs(
      (1L, "s", "a b c d e"),      // 5 tokens, 5 distinct — frontier
      (2L, "s", "a a a b c"),      // 5/3 — dominated by doc 1
      (3L, "s", "a a a b b c c"),  // 7/3 — frontier
      (4L, "s", "x x y y z z z"),  // 7/3 — full tie with 3: both kept
      (5L, "s", "a a b")           // 3/2 — dominated by doc 1
    )).collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((3L, 7L, 3L), (4L, 7L, 3L), (1L, 5L, 5L)))
  }

  test("hodgesLehmann: hand-checked Walsh-average medians") {
    def ev(tpe: String, counts: Seq[Int]) =
      counts.zipWithIndex.flatMap { case (c, h) =>
        (0 until c).map(k => ((h * 100 + k).toLong, tpe,
          Timestamp.valueOf(f"2024-01-01 $h%02d:15:00")))
      }.toDF("event_id", "event_type", "ts")
    // counts 1,2,4 → sums {2,3,4,5,6,8}, N=6 even → (4+5)·250000
    val even = RobustStats.hodgesLehmann(ev("click", Seq(1, 2, 4)))
      .collect().head
    assert(even.getAs[Long]("n_pairs") == 6L)
    assert(even.getAs[Long]("hl_micros") == 2250000L)
    assert(even.getAs[Long]("mean_micros") == 2333333L)
    // counts 1,3 → sums {2,4,6}, N=3 odd → middle 4 → 4·2·250000
    val odd = RobustStats.hodgesLehmann(ev("view", Seq(1, 3)))
      .collect().head
    assert(odd.getAs[Long]("n_pairs") == 3L)
    assert(odd.getAs[Long]("hl_micros") == 2000000L)
  }

  test("captureRecaptureVocab replays the gates and Chapman exactly") {
    val rows = (0L until 40L).map(i =>
      (i, "s", s"tok${i % 7} tok${i % 11} common"))
    val out = CorpusStats.captureRecaptureVocab(docs(rows: _*))
      .collect().head
    // recompute in Scala from the same public chain
    def gate(id: Long) =
      java.lang.Math.floorMod(Mix64.mix(id), 4L)
    val a = rows.filter(r => gate(r._1) == 0L)
      .flatMap(_._3.split(" ")).toSet
    val b = rows.filter(r => gate(r._1) == 1L)
      .flatMap(_._3.split(" ")).toSet
    val all = rows.flatMap(_._3.split(" ")).toSet
    val (n1, n2, m) = (a.size.toLong, b.size.toLong, (a & b).size.toLong)
    assert(out.getAs[Long]("n1") == n1)
    assert(out.getAs[Long]("n2") == n2)
    assert(out.getAs[Long]("m") == m)
    assert(out.getAs[Long]("chapman_nhat") ==
      (n1 + 1) * (n2 + 1) / (m + 1) - 1)
    assert(out.getAs[Long]("true_vocab") == all.size.toLong)
  }

  test("sourceBoilerplateTokens: the 4/5 gate is exact") {
    val rows = (0L until 5L).map { i =>
      val tpl = if (i < 4) "tpl " else ""
      (i, "s1", s"${tpl}u$i filler")
    } :+ (9L, "s2", "solo words")
    val out = CorpusStats.sourceBoilerplateTokens(docs(rows: _*))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(4)))
    // s1: "tpl" df=4 of 5 → exactly 4/5, kept at share 800000;
    // "filler" df=5 → kept; u0..u4 df=1 → dropped.
    // s2 single doc: every token df=1 of 1 → kept at 1000000.
    assert(out.toSet == Set(
      ("s1", "filler", 5L, 1000000L),
      ("s1", "tpl", 4L, 800000L),
      ("s2", "solo", 1L, 1000000L),
      ("s2", "words", 1L, 1000000L)))
  }

  test("weightedJaccardRerank scores multiplicity, not just types") {
    val out = WeightedJaccard.weightedJaccardRerank(docs(
      (1L, "s", "a b c a b c"), // histogram a:2 b:2 c:2, len 6
      (2L, "s", "a b c")        // 1 each, len 3
    )).collect()
    assert(out.length == 1)
    val r = out.head
    // shingle types: doc1 {abc,bca,cab} n=3, doc2 {abc} n=1, common=1
    // set-J = 1/3 >= 1/4 → candidate; set_j_micros = 333333
    assert(r.getAs[Long]("common_shingles") == 1L)
    assert(r.getAs[Long]("set_j_micros") == 333333L)
    // Σmin = 3, Σmax = 6+3−3 = 6 → jw = 1/2
    assert(r.getAs[Long]("sum_min") == 3L)
    assert(r.getAs[Long]("jw_micros") == 500000L)
  }

  test("weightedJaccardRerank: below the set gate no pair is scored") {
    // 10 distinct shingles each, exactly one shared → set-J = 1/19 < 1/4
    val t1 = "q w e r t y u i o p a s"
    val t2 = "z x c v b n m k j h q w e" // shares only the tail overlap?
    val out = WeightedJaccard.weightedJaccardRerank(docs(
      (1L, "s", t1), (2L, "s", t2))).collect()
    assert(out.isEmpty)
  }
}
