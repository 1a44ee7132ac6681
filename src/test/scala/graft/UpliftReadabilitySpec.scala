package graft

import java.sql.Timestamp

import graft.functions.TextAnalysis
import graft.operators.{DistributedRank, Experiment}

/** Fixture pins for uplift deciles and the Flesch readability profile. */
class UpliftReadabilitySpec extends SparkTestBase {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("upliftDeciles: planted lift in the top decile") {
    import spark.implicits._
    // 20 users; window end = Jan 31, post window = last 7 days.
    // users 1..20: engagement (pre events) = 100 − id → deciles by id.
    // Treated (odd id) users 1,3 convert in post; control never does.
    val pre = (1 to 20).flatMap { u =>
      (1 to (100 - u)).map(i =>
        ((u * 1000 + i).toLong, u.toLong, "view", 1.0,
          ts("2024-01-05 00:00:00")))
    }
    val post = Seq(1L, 3L).map(u =>
      (900000L + u, u, "purchase", 1.0, ts("2024-01-30 00:00:00"))) :+
      ((999999L, 2L, "view", 1.0, ts("2024-01-31 00:00:00")))
    val events = (pre ++ post)
      .toDF("event_id", "user_id", "event_type", "value", "ts")
    try {
      val rows = Experiment.upliftDeciles(events).collect()
      assert(rows.length == 10)
      // decile 1 = users 1,2 (highest engagement): u1 treated converts,
      // u2 control does not → uplift = +1e6
      val d1 = rows.find(_.getInt(0) == 1).get
      assert(d1.getAs[Long]("y_t") == 1L && d1.getAs[Long]("y_c") == 0L)
      assert(d1.getAs[Long]("uplift_micros") == 1000000L)
      // decile 2 = users 3,4: u3 treated converts → +1e6 again
      val d2 = rows.find(_.getInt(0) == 2).get
      assert(d2.getAs[Long]("uplift_micros") == 1000000L)
      assert(d2.getAs[Long]("cum_uplift_micros") == 1000000L)
      // below that nobody converts: cumulative decays but stays positive
      val d10 = rows.find(_.getInt(0) == 10).get
      assert(d10.getAs[Long]("y_t") == 0L)
      assert(d10.getAs[Long]("cum_uplift_micros") == 200000L)
    } finally DistributedRank.release(spark)
  }

  test("readability: hand-counted Flesch pieces") {
    import spark.implicits._
    // "the cat sat. it ran!" → 5 words, 2 sentence runs, vowel groups:
    // e/a/a/i/a = 5.
    val docs = Seq((1L, "the cat sat. it ran!", "en", "s1", 20L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = TextAnalysis.readability(docs).collect().head
    assert(r.getAs[Long]("words") == 5L)
    assert(r.getAs[Long]("sentences") == 2L)
    assert(r.getAs[Long]("syllables") == 5L)
    // wps = 5e6/2 = 2.5e6; spw = 1e6
    assert(r.getAs[Long]("words_per_sentence_micros") == 2500000L)
    assert(r.getAs[Long]("syllables_per_word_micros") == 1000000L)
    // flesch = 206.835 − 1.015·2.5 − 84.6·1 = 119.6975 → micros
    assert(r.getAs[Long]("flesch_micros") ==
      206835000L - 2537500L - 84600000L)
  }

  test("readability: no terminal punctuation floors sentences at 1") {
    import spark.implicits._
    val docs = Seq((1L, "xyz pqr", "en", "s1", 7L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = TextAnalysis.readability(docs).collect().head
    assert(r.getAs[Long]("sentences") == 1L)
    assert(r.getAs[Long]("syllables") == 0L) // no vowels at all
  }
}
