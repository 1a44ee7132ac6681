package graft

import graft.operators.FeatureEng

/** Hand-computed fixtures for the target encoding and the Poisson
  * bootstrap (constant-column exactness, planted-mean bracketing,
  * threshold sanity).
  */
class FeatureEngSpec extends SparkTestBase {
  import spark.implicits._

  test("targetEncode: LOO, singleton fallback, smoothing — by hand") {
    // A: 10.00, 20.00, 30.00; B: 40.00. Global mean 25.00.
    val orders = Seq(
      (1L, "A", 10.00), (2L, "A", 20.00), (3L, "A", 30.00),
      (4L, "B", 40.00))
      .toDF("o_orderkey", "o_orderpriority", "o_totalprice")
    val got = FeatureEng.targetEncode(orders).collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L))
    // LOO(1) = (6000-1000)/2 cents = 2500 cents -> 2.5e9 micros
    assert(got(0).getLong(3) == 2500000000L)
    // LOO(2) = (6000-2000)/2 = 2000 cents
    assert(got(1).getLong(3) == 2000000000L)
    assert(got(2).getLong(3) == 1500000000L)
    // singleton B falls back to the global mean 2500 cents
    assert(got(3).getLong(3) == 2500000000L)
    // smooth(A) = (6000*4 + 10*10000)*1e6 DIV (13*4)
    assert(got(0).getLong(4) == 124000000000L / 52L)
    // smooth(B) = (4000*4 + 10*10000)*1e6 DIV (11*4)
    assert(got(3).getLong(4) == 116000000000L / 44L)
  }

  test("bootstrapCi: constant column — every replicate mean is exact") {
    val orders = (1L to 2000L).map(k => (k, "P", 10.00))
      .toDF("o_orderkey", "o_orderpriority", "o_totalprice")
    val r = FeatureEng.bootstrapCi(orders).collect().head
    assert(r.getLong(0) == 2000L)
    assert(r.getLong(1) == 1000000000L) // 1000 cents in micros
    assert(r.getLong(3) == 1000000000L) // weighted mean of a constant
    assert(r.getLong(4) == 1000000000L)
  }

  test("bootstrapCi: CI brackets the true mean and is ordered") {
    val orders = (1L to 5000L).map(k => (k, "P", k.toDouble / 100.0))
      .toDF("o_orderkey", "o_orderpriority", "o_totalprice")
    val r = FeatureEng.bootstrapCi(orders).collect().head
    val mean = r.getLong(1); val lo = r.getLong(3); val hi = r.getLong(4)
    assert(lo < hi)
    assert(lo <= mean && mean <= hi,
      s"CI [$lo, $hi] should bracket $mean")
    // σ of a Poisson-bootstrap mean ≈ σ_x/√n; bar generously at 5σ
    val sigma = (5000.0 / math.sqrt(12.0)) / math.sqrt(5000.0) * 1e6
    assert((hi - lo) < 2 * 5 * sigma, s"CI width ${hi - lo}")
  }

  test("poissonThresholds: monotone, matches the CDF, capped") {
    val ts = FeatureEng.poissonThresholds
    assert(ts.length == FeatureEng.PoissonCap)
    assert(ts == ts.sorted)
    val u64 = BigDecimal(BigInt(1) << 64)
    assert((BigDecimal(ts.head) / u64 - math.exp(-1.0)).abs < 1e-12)
    assert(BigDecimal(ts.last) / u64 > 0.999)
    assert(ts.last < (BigInt(1) << 64))
  }
}
