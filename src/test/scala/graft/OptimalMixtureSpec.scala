package graft

import graft.operators.Mixture
import org.apache.spark.sql.functions._

/** Invariants of the exact water-filling allocation ([[Mixture.optimalMixture]]):
  * token-exact budget, per-source caps, proportional shares among uncapped
  * sources, capped-set monotonicity in the budget, and partition
  * invariance. The closed form itself is additionally verified against an
  * iterative exact-rational reference in the operator's development notes
  * and bit-exactly against DuckDB by the driver oracle.
  */
class OptimalMixtureSpec extends SparkTestBase {

  private lazy val docs = Tables.documents(spark, sf)

  private case class Row2(
      source: String, supply: Long, w: Long, capped: Boolean, alloc: Long)

  private def rows(budgetPpm: Long): Seq[Row2] =
    Mixture.optimalMixture(docs, budgetPpm).collect().toSeq.map { r =>
      Row2(r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3),
        r.getLong(4))
    }

  test("allocation sums to the exact budget and respects supplies") {
    for (ppm <- Seq(0L, 300000L, 600000L, 900000L, 1000000L)) {
      val rs = rows(ppm)
      val total = rs.map(_.supply).sum
      val budget = BigInt(total) * ppm / 1000000
      assert(rs.map(r => BigInt(r.alloc)).sum == budget.min(BigInt(total)),
        s"ppm=$ppm")
      rs.foreach { r =>
        assert(r.alloc >= 0 && r.alloc <= r.supply, s"ppm=$ppm $r")
        if (r.capped) assert(r.alloc == r.supply, s"capped must take all: $r")
      }
    }
  }

  test("uncapped allocations are proportional to weights within 1 token") {
    val rs = rows(900000L)
    assert(rs.exists(_.capped) && rs.exists(!_.capped),
      "fixture must exercise both branches")
    val total = rs.map(_.supply).sum
    val budget = BigInt(total) * 900000 / 1000000
    val x = budget - rs.filter(_.capped).map(r => BigInt(r.supply)).sum
    val remW = rs.filterNot(_.capped).map(r => BigInt(r.w)).sum
    rs.filterNot(_.capped).foreach { r =>
      // |alloc - x*w/remW| < 1  <=>  |alloc*remW - x*w| < remW
      assert((BigInt(r.alloc) * remW - x * r.w).abs < remW, r.toString)
    }
  }

  test("raising the budget only grows the capped set") {
    val lo = rows(600000L).filter(_.capped).map(_.source).toSet
    val hi = rows(900000L).filter(_.capped).map(_.source).toSet
    assert(lo.subsetOf(hi))
    // and at 100% everything is capped (alloc == supply everywhere)
    assert(rows(1000000L).forall(_.capped))
  }

  test("result is invariant under input repartitioning") {
    val a = Mixture.optimalMixture(docs, 900000L)
    val b = Mixture.optimalMixture(docs.repartition(7), 900000L)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("a source that cannot cover its share is capped and budget re-flows") {
    import spark.implicits._
    // tiny crafted corpus: heavy weight on a starving source
    val tiny = Seq(
      (1L, "x x x", "a"),            // 3 tokens
      (2L, "y y y y y y y y y y", "b"), // 10 tokens
      (3L, "z z z z z z z z z z", "c")  // 10 tokens
    ).toDF("doc_id", "text", "source")
    val rs = Mixture.optimalMixture(tiny, 1000000L).collect()
    // full budget: everyone capped at supply
    assert(rs.map(_.getLong(4)).sum == 23L)
    assert(rs.forall(r => r.getLong(4) == r.getLong(1)))
  }
}
