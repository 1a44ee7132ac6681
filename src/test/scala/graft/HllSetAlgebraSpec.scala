package graft

import java.sql.Timestamp

import graft.operators.Hll

/** Planted-overlap fixtures for the HLL set algebra: union accuracy,
  * inclusion–exclusion intersection, and consistency with the direct
  * estimator on the concatenated stream.
  */
class HllSetAlgebraSpec extends SparkTestBase {
  import spark.implicits._

  private val t0 = Timestamp.valueOf("2024-01-01 00:00:00")

  /** Two audiences with a planted overlap: A = users [0, 1000),
    * B = users [700, 1700) -> |A|=|B|=1000, |A∩B|=300, |A∪B|=1700.
    */
  private def planted = {
    val a = (0L until 1000L).map(u => (u, t0, u, "a", 1.0))
    val b = (0L until 1000L).map(i => (10000L + i, t0, 700L + i, "b", 1.0))
    (a ++ b).toDF("event_id", "ts", "user_id", "event_type", "value")
  }

  test("setAlgebra: exact fields are exact; estimates inside the error bar") {
    val got = Hll.setAlgebra(planted).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getString(0) == "a" && r.getString(1) == "b")
    assert(r.getLong(2) == 1000L && r.getLong(3) == 1000L)
    assert(r.getLong(4) == 300L && r.getLong(5) == 1700L)
    // 3-sigma bar for m=256: 3 * 1.04/16 ~ 19.5%
    val tol = 3.0 * 1.04 / math.sqrt(Hll.M)
    assert(math.abs(r.getDouble(6) - 1000.0) / 1000.0 < tol)
    assert(math.abs(r.getDouble(8) - 1700.0) / 1700.0 < tol)
    // intersection inherits the union's absolute error — use a loose bar
    assert(math.abs(r.getDouble(9) - 300.0) < 1700.0 * tol)
  }

  test("setAlgebra: union estimate equals the direct estimate on A++B") {
    val r = Hll.setAlgebra(planted).collect().head
    val direct = Hll.approxDistinctUsers(
      planted, Seq("value"), "user_id") // (value, users_exact, approx)
      .collect().head.getDouble(2)
    def r4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    // merging the two per-type sketches is lossless: same registers as
    // sketching the concatenated stream directly
    assert(r.getDouble(8) == r4(direct))
  }

  test("setAlgebra: disjoint audiences intersect near zero") {
    val a = (0L until 500L).map(u => (u, t0, u, "a", 1.0))
    val b = (0L until 500L).map(i => (10000L + i, t0, 100000L + i, "b", 1.0))
    val r = Hll.setAlgebra(
      (a ++ b).toDF("event_id", "ts", "user_id", "event_type", "value"))
      .collect().head
    assert(r.getLong(4) == 0L)
    val tol = 3.0 * 1.04 / math.sqrt(Hll.M)
    assert(math.abs(r.getDouble(9)) < 1000.0 * tol)
  }
}
