package graft

import java.sql.Timestamp
import graft.operators.Eval

/** BigInt reimplementation pin for the Murphy decomposition + ECE. */
class BrierSpec extends SparkTestBase {

  test("brierDecomposition matches a BigInt replay; identity gap is tiny") {
    import spark.implicits._
    // two hods; fold by user parity. Train (even users) rates:
    //   hod 0: 1/2 purchases; hod 1: 1/4.
    // Test (odd users): hod 0: 2 rows 1 purchase; hod 1: 4 rows 3.
    def row(id: Long, uid: Long, hod: Int, tpe: String) =
      (id, Timestamp.valueOf(f"2024-01-01 $hod%02d:10:00"), uid, tpe, 0.0,
        "{}")
    val rows = Seq(
      row(1, 2, 0, "purchase"), row(2, 2, 0, "click"),
      row(3, 4, 1, "purchase"), row(4, 4, 1, "click"),
      row(5, 6, 1, "click"), row(6, 6, 1, "click"),
      row(7, 1, 0, "purchase"), row(8, 1, 0, "click"),
      row(9, 3, 1, "purchase"), row(10, 3, 1, "purchase"),
      row(11, 5, 1, "purchase"), row(12, 5, 1, "click"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = Eval.brierDecomposition(rows).collect()(0)

    // BigInt replay
    val M = BigInt(1000000)
    val cells = Seq( // (f_ppm, n_test, s_test)
      (BigInt(1) * M / 2, BigInt(2), BigInt(1)),
      (BigInt(1) * M / 4, BigInt(4), BigInt(3)))
    val nn = cells.map(_._2).sum
    val ss = cells.map(_._3).sum
    val bs = cells.map { case (f, n, s) =>
      n * f * f - 2 * f * s * M + s * M * M }.sum / nn
    val rel = cells.map { case (f, n, s) =>
      (f * n - s * M) * (f * n - s * M) / n }.sum / nn
    val res = cells.map { case (_, n, s) =>
      (s * nn - ss * n) * (s * nn - ss * n) * M * M / (n * nn * nn)
    }.sum / nn
    val unc = ss * (nn - ss) * M * M / (nn * nn)
    val ece = cells.map { case (f, n, s) => (f * n - s * M).abs }.sum / nn
    assert(r.getLong(0) === nn.toLong)
    assert(r.getLong(2) === bs.toLong, "bs")
    assert(r.getLong(3) === rel.toLong, "rel")
    assert(r.getLong(4) === res.toLong, "res")
    assert(r.getLong(5) === unc.toLong, "unc")
    assert(r.getLong(6) === ece.toLong, "ece")
    // Murphy identity up to published flooring slack
    assert(math.abs(r.getLong(7)) < 10L, s"identity gap ${r.getLong(7)}")
  }
}
