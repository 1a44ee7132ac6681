package graft

import java.sql.Timestamp

import graft.functions.TextAnalysis
import graft.operators.Eval

/** Fixture tests for the train/test evaluation operators and the
  * lexical-complexity audit.
  */
class EvalSpec extends SparkTestBase {
  import spark.implicits._

  private def ev(rows: Seq[(Long, String, String)]) =
    // (user, t-offset-seconds encoded in event_id order, type)
    rows.zipWithIndex.map { case ((u, tp, _), i) =>
      (i.toLong, Timestamp.valueOf(
        java.time.LocalDateTime.of(2024, 1, 1, 0, 0).plusSeconds(i.toLong)),
        u, tp, 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  test("markovNextEvent: planted deterministic chain scores 100%") {
    // Both folds follow a -> b -> a -> b...; model learns a->b, b->a.
    val rows = for {
      u <- 0L until 10L
      i <- 0 until 20
    } yield (u, if (i % 2 == 0) "a" else "b", "")
    val r = Eval.markovNextEvent(ev(rows)).collect()
      .map(x => x.getString(0) -> ((x.getString(1), x.getLong(5)))).toMap
    assert(r("a") == ("b", 1000000L))
    assert(r("b") == ("a", 1000000L))
  }

  test("markovNextEvent: argmax tie breaks to lexicographic smallest") {
    // Train user 0: a->b once, a->c once (tie); prediction must be 'b'.
    val train = Seq((0L, "a", ""), (0L, "b", ""), (0L, "a", ""), (0L, "c", ""),
      (0L, "a", ""))
    // Test user 1: a->c twice -> accuracy 0 for prediction 'b'.
    val test = Seq((1L, "a", ""), (1L, "c", ""), (1L, "a", ""), (1L, "c", ""))
    val r = Eval.markovNextEvent(ev(train ++ test)).collect()
    val aRow = r.find(_.getString(0) == "a").get
    assert(aRow.getString(1) == "b")
    assert(aRow.getLong(5) == 0L)
  }

  test("propensityCalibration: planted per-hour rates recovered exactly") {
    // Train (even users): hour 0 rate 1/2, hour 1 rate 1/4.
    // Test (odd users): hour 0 rate 1/4, hour 1 rate 1/2.
    def at(u: Long, h: Int, tp: String, i: Int) =
      (u * 10000 + h * 100 + i.toLong,
        Timestamp.valueOf(java.time.LocalDateTime.of(2024, 1, 1, h, 0)
          .plusSeconds(i.toLong)), u, tp, 1.0, "{}")
    val rows =
      (0 until 2).map(i => at(0L, 0, "purchase", i)) ++
      (2 until 4).map(i => at(0L, 0, "view", i)) ++
      (0 until 1).map(i => at(0L, 1, "purchase", i)) ++
      (1 until 4).map(i => at(0L, 1, "view", i)) ++
      (0 until 1).map(i => at(1L, 0, "purchase", i)) ++
      (1 until 4).map(i => at(1L, 0, "view", i)) ++
      (0 until 2).map(i => at(1L, 1, "purchase", i)) ++
      (2 until 4).map(i => at(1L, 1, "view", i))
    val df = rows.toDF("event_id", "ts", "user_id", "event_type", "value",
      "props")
    val r = Eval.propensityCalibration(df).collect()
      .map(x => x.getInt(0) -> (x.getLong(2), x.getLong(4), x.getLong(5)))
      .toMap
    assert(r(0) == (500000L, 250000L, 250000L))
    assert(r(1) == (250000L, 500000L, 250000L))
  }

  test("lexicalComplexity: hand-counted syllables and ratios") {
    val docs = Seq(
      (1L, "cat elephant a", "en", "s1", 14L),
      (2L, "ab", "en", "s2", 2L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = TextAnalysis.lexicalComplexity(docs).collect()
      .map(x => x.getString(0) -> x).toMap
    val s1 = r("s1")
    // words: cat(1 syl), elephant(3: e,e,a), a(1); chars 3+8+1=12
    assert(s1.getLong(1) == 3L)
    assert(s1.getLong(2) == 12L)
    assert(s1.getLong(3) == 5L)
    assert(s1.getLong(4) == 1L)                 // only 'elephant' >= 3
    assert(s1.getLong(5) == 4000000L)           // 12/3 chars per word
    assert(s1.getLong(6) == 5000000L / 3L)      // 5/3 syllables per word
    assert(s1.getLong(7) == 1000000L / 3L)
    val s2 = r("s2")
    assert(s2.getLong(3) == 1L && s2.getLong(4) == 0L)
  }
}
