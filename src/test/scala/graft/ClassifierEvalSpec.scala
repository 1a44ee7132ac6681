package graft

import java.sql.Timestamp
import graft.operators.ClassifierEval

class ClassifierEvalSpec extends SparkTestBase {

  import spark.implicits._

  private def ev(rows: Seq[(Long, String, String, Double)]) =
    rows.map { case (id, t, d, v) =>
      (id, id % 7, t, Timestamp.valueOf(d), v)
    }.toDF("event_id", "user_id", "event_type", "ts", "value")

  test("rocAucValue: perfect separation gives AUC 1, ties give 1/2") {
    val perfect = ev(Seq(
      (1L, "click", "2024-01-01 10:00:00", 1.0),
      (2L, "click", "2024-01-01 10:00:00", 2.0),
      (3L, "purchase", "2024-01-01 10:00:00", 3.0),
      (4L, "purchase", "2024-01-01 10:00:00", 4.0)))
    val r = ClassifierEval.rocAucValue(perfect).collect().head
    assert(r.getAs[Long]("auc_micros") == 1000000L)
    assert(r.getAs[Long]("gini_micros") == 1000000L)
    // everything at one value: AUC = 1/2 by the tie convention
    val tied = ev(Seq(
      (1L, "click", "2024-01-01 10:00:00", 5.0),
      (2L, "purchase", "2024-01-01 10:00:00", 5.0)))
    val t = ClassifierEval.rocAucValue(tied).collect().head
    assert(t.getAs[Long]("auc_micros") == 500000L)
    assert(t.getAs[Long]("gini_micros") == 0L)
  }

  test("rocAucValue: single-class input defines AUC and Gini as 0") {
    // no purchases at all → n_pos·n_neg = 0: contract value 0, not NULL
    val neg = ev(Seq(
      (1L, "click", "2024-01-01 10:00:00", 1.0),
      (2L, "view", "2024-01-01 11:00:00", 2.0)))
    val r = ClassifierEval.rocAucValue(neg).collect().head
    assert(r.getAs[Long]("n_pos") == 0L)
    assert(r.getAs[Long]("auc_micros") == 0L)
    assert(r.getAs[Long]("gini_micros") == 0L)
    // all purchases → n_neg = 0: same contract
    val pos = ev(Seq(
      (1L, "purchase", "2024-01-01 10:00:00", 1.0),
      (2L, "purchase", "2024-01-01 11:00:00", 2.0)))
    val p = ClassifierEval.rocAucValue(pos).collect().head
    assert(p.getAs[Long]("n_neg") == 0L)
    assert(p.getAs[Long]("auc_micros") == 0L)
    assert(p.getAs[Long]("gini_micros") == 0L)
  }

  test("rocAucValue: hand-checked mixed case with a tie block") {
    // neg at 1, pos at 2, neg at 2, pos at 3:
    // pairs (pos > neg): (2,1)=1, (2,2)=1/2, (3,1)=1, (3,2)=1 → 3.5/4
    val r = ClassifierEval.rocAucValue(ev(Seq(
      (1L, "click", "2024-01-01 10:00:00", 0.01),
      (2L, "purchase", "2024-01-01 10:00:00", 0.02),
      (3L, "click", "2024-01-01 10:00:00", 0.02),
      (4L, "purchase", "2024-01-01 10:00:00", 0.03)))).collect().head
    assert(r.getAs[Long]("auc_micros") == 875000L)
  }

  test("stumpConfusion: the perfect split scores perfect metrics") {
    val r = ClassifierEval.stumpConfusion(ev(Seq(
      (1L, "purchase", "2024-01-01 10:00:00", 1.00),
      (2L, "purchase", "2024-01-01 10:00:00", 1.50),
      (3L, "click", "2024-01-01 10:00:00", 5.00),
      (4L, "click", "2024-01-01 10:00:00", 6.00)))).collect().head
    assert(r.getAs[Boolean]("left_pos") && !r.getAs[Boolean]("right_pos"))
    assert(r.getAs[Long]("tp") == 2L && r.getAs[Long]("tn") == 2L)
    assert(r.getAs[Long]("fp") == 0L && r.getAs[Long]("fn") == 0L)
    assert(r.getAs[Long]("precision_micros") == 1000000L)
    assert(r.getAs[Long]("f1_micros") == 1000000L)
    assert(r.getAs[Long]("accuracy_micros") == 1000000L)
  }

  test("mcnemarConversion: discordant-only statistic") {
    // users 0..9; window 10:00..12:00, mid = 11:00
    // users 0,1,2 purchase ONLY before mid; user 3 ONLY after;
    // user 4 both; users 5..9 never (clicks keep them observed)
    val rows =
      Seq(0L, 1L, 2L).zipWithIndex.map { case (u, i) =>
        (100L + i, "purchase", "2024-01-01 10:30:00", 1.0, u)
      } ++ Seq(
        (200L, "purchase", "2024-01-01 11:30:00", 1.0, 3L),
        (201L, "purchase", "2024-01-01 10:15:00", 1.0, 4L),
        (202L, "purchase", "2024-01-01 11:45:00", 1.0, 4L)) ++
        (0L until 10L).map(u =>
          (300L + u, "click",
            if (u % 2 == 0) "2024-01-01 10:00:00"
            else "2024-01-01 12:00:00", 1.0, u))
    val df = rows.map { case (id, t, d, v, u) =>
      (id, u, t, Timestamp.valueOf(d), v)
    }.toDF("event_id", "user_id", "event_type", "ts", "value")
    val r = ClassifierEval.mcnemarConversion(df).collect().head
    assert(r.getAs[Long]("n_users") == 10L)
    assert(r.getAs[Long]("n11") == 1L) // user 4
    assert(r.getAs[Long]("n10") == 3L) // users 0,1,2
    assert(r.getAs[Long]("n01") == 1L) // user 3
    assert(r.getAs[Long]("n00") == 5L)
    // (3-1)²/(3+1) = 1 → 1e6
    assert(r.getAs[Long]("mcnemar_micros") == 1000000L)
  }

  test("langidKappa: perfect agreement gives kappa 1") {
    val docs = Seq(
      (1L, "the and of x", "en"), (2L, "the of and y", "en"),
      (3L, "der die und x", "de"), (4L, "und der die y", "de"))
      .toDF("doc_id", "text", "lang")
    val r = ClassifierEval.langidKappa(docs).collect().head
    assert(r.getAs[Long]("diag") == 4L)
    assert(r.getAs[Long]("kappa_micros") == 1000000L)
  }

  test("langidKappa: majority-class prediction scores kappa 0") {
    // predictor says 'en' always; labels split 2/2 → po = 1/2,
    // pe = 1/2 → kappa = 0
    val docs = Seq(
      (1L, "the and of x", "en"), (2L, "the of and y", "en"),
      (3L, "the and of z", "de"), (4L, "the of and w", "de"))
      .toDF("doc_id", "text", "lang")
    val r = ClassifierEval.langidKappa(docs).collect().head
    assert(r.getAs[Long]("kappa_micros") == 0L)
  }
}
