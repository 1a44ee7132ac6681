package graft

import java.sql.Timestamp

import graft.operators.{Curation, Experiment}

/** Fixture pins for greedy coverage selection and the CMH estimator. */
class CoverageCmhSpec extends SparkTestBase {

  test("wordShingles(3) set == the declarative transform(sequence) trigram set") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // repeated/leading/trailing spaces produce EMPTY tokens in both
    // spellings; short docs produce empty arrays; duplicates within a
    // doc collapse (the declarative side dedups via array_distinct here,
    // mirroring coverageSelection's old per-(doc,g) distinct)
    val docs = Seq("a b c d e f", "a  b c", " a b c ", "x y", "", "a b c a b c",
      "w w w w").zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val decl = docs.select(col("doc_id"), explode(expr(
      """array_distinct(case when size(split(text, ' ')) >= 3 then
        |  transform(
        |    sequence(1, size(split(text, ' ')) - 2),
        |    i -> concat_ws(' ',
        |      element_at(split(text, ' '), i),
        |      element_at(split(text, ' '), i + 1),
        |      element_at(split(text, ' '), i + 2)))
        |else array() end)""".stripMargin)).as("g"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val native = docs.select(col("doc_id"),
      explode(graft.functions.GraftColumns.wordShingles(col("text"), 3)).as("g"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(native == decl)
  }

  test("coverageSelection: greedy picks maximize marginal trigram gain") {
    import spark.implicits._
    // doc 5: 6 trigrams; doc 7: 4 trigrams, 2 shared with doc 5;
    // doc 9: subset of doc 5 (0 marginal after it).
    val d5 = "a b c d e f g h" // trigrams: abc bcd cde def efg fgh (6)
    val d7 = "g h i j k l"     // ghi hij ijk jkl (4, none shared w/ d5)
    val d9 = "a b c d e"       // abc bcd cde (3, all ⊂ d5)
    val docs = Seq((5L, d5), (7L, d7), (9L, d9))
      .map { case (i, t) => (i, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = Curation.coverageSelection(docs, k = 3)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(got(0) === ((1, 5L, 6L, 6L)))
    assert(got(1) === ((2, 7L, 4L, 10L)))
    // round 3: doc 9 is fully covered (⊂ doc 5) and nothing else
    // remains — coverage is exhausted, so the pick list STOPS at 2
    // (matching the oracle's empty third round)
    assert(got.length == 2)
  }

  test("coverageSelection: tie on gain breaks to the smaller doc_id") {
    import spark.implicits._
    val docs = Seq((4L, "p q r s"), (2L, "w x y z"))
      .map { case (i, t) => (i, t, "en", "s", 7L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = Curation.coverageSelection(docs, k = 2)
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(got(0) === ((1, 2L))) // both gain 2; min doc_id wins
    assert(got(1) === ((2, 4L)))
  }

  test("cmhPooledOdds: hand-computed single stratum equals the plain OR") {
    import spark.implicits._
    val ts0 = Timestamp.valueOf("2024-01-07 12:00:00") // one Sunday
    // v0 (u=2): 1 purchase / 4 events → a2x2 with y0=1,n0=4
    // v1 (u=1): 2 purchases / 4 events → y1=2,n1=4
    // r = (2·3·1e6)//8 = 750000; s = (2·1·1e6)//8 = 250000 → OR = 3e6.
    val rows =
      (1 to 4).map(i => (i.toLong, 2L,
        if (i <= 1) "purchase" else "view", 1.0, ts0)) ++
      (5 to 8).map(i => (i.toLong, 1L,
        if (i <= 6) "purchase" else "view", 1.0, ts0))
    val events = rows.toDF("event_id", "user_id", "event_type", "value",
      "ts")
    val r = Experiment.cmhPooledOdds(events).collect().head
    assert(r.getAs[Long]("n_strata") == 1L)
    assert(r.getAs[Long]("sum_r_micros") == 750000L)
    assert(r.getAs[Long]("sum_s_micros") == 250000L)
    assert(r.getAs[Long]("cmh_or_micros") == 3000000L)
  }
}
