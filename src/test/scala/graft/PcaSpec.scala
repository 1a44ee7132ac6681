package graft

import graft.operators.Pca

class PcaSpec extends SparkTestBase {

  /** Independent Scala replay of the whole fixed-point pipeline. */
  private def replay(vecs: Array[Array[Double]], iters: Int)
      : (Array[Array[Long]], Array[Long], Long, Long) = {
    val d = vecs.head.length
    val q = vecs.map(_.map(x => math.floor(x * 1048576.0).toLong))
    val gram = Array.ofDim[Long](d, d)
    for (r <- q; i <- 0 until d; j <- 0 until d)
      gram(i)(j) += r(i) * r(j)
    def tdiv(a: Long, b: Long): Long = // truncation toward zero
      if (a >= 0) a / b else -((-a) / b)
    val gq = gram.map(_.map(tdiv(_, 1048576L)))
    var v = Array.fill(d)(1048576L)
    for (_ <- 1 to iters) {
      val w = gq.map(row => row.zip(v).map { case (a, b) => a * b }.sum)
      val mx = w.map(math.abs).max
      val s = math.max(1L, mx / 1048576L)
      v = w.map(tdiv(_, s))
    }
    val w = gq.map(row => row.zip(v).map { case (a, b) => a * b }.sum)
    val num = v.zip(w.map(tdiv(_, 1048576L))).map { case (a, b) => a * b }.sum
    val den = v.map(x => x * x).sum
    (gq, v, num, den)
  }

  test("gram + power iteration are bit-identical to the integer replay") {
    val df = Tables.embeddings(spark, sf)
    val vecs = df.select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val (_, vRef, numRef, denRef) = replay(vecs, 20)
    val got = Pca.pcaPowerIteration(df).collect()
    assert(got.length == vRef.length)
    got.foreach { r =>
      val dim = r.getInt(0)
      assert(r.getLong(1) == vRef(dim), s"v_fp at dim $dim")
      assert(r.getLong(2) == numRef)
      assert(r.getLong(3) == denRef)
    }
    // the direction is genuinely dominant: Rayleigh quotient must be
    // positive (Gram is PSD and nonzero) and |v| normalized to ~2^20
    assert(numRef > 0L && denRef > 0L)
    assert(vRef.map(math.abs).max <= 1048576L)
    assert(vRef.map(math.abs).max >= 1048576L / 2L)
  }

  test("gram matrix is the exact quantized second-moment matrix") {
    val df = Tables.embeddings(spark, sf)
    val vecs = df.select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val d = vecs.head.length
    val q = vecs.map(_.map(x => math.floor(x * 1048576.0).toLong))
    val expect = Array.ofDim[Long](d, d)
    for (r <- q; i <- 0 until d; j <- 0 until d)
      expect(i)(j) += r(i) * r(j)
    val got = Pca.gramMatrix(df).collect()
    assert(got.length == d * (d + 1) / 2)
    got.foreach { r =>
      val (i, j) = (r.getInt(0), r.getInt(1))
      assert(r.getLong(2) == expect(i)(j), s"gram($i,$j)")
      assert(r.getDouble(3) == expect(i)(j).toDouble / 1099511627776.0)
    }
  }
}
