package graft

import graft.operators.{DistributedRank, EntityResolution}

/** Pins for sorted-neighborhood blocking. */
class SortedNeighborhoodSpec extends SparkTestBase {

  test("window property: every emitted pair is cross-side within w ranks") {
    val customer = Tables.customer(spark, sf)
    try {
      val rows = EntityResolution.sortedNeighborhoodPairs(customer, w = 4)
        .collect()
      assert(rows.nonEmpty)
      rows.foreach { r =>
        assert(r.getAs[Long]("rank_gap") >= 1L &&
          r.getAs[Long]("rank_gap") <= 4L)
        assert(r.getAs[Int]("name_lev") <= 2)
      }
      // every true pair has lev == 1 (single dropped char)
      rows.filter(_.getAs[Boolean]("is_true_match"))
        .foreach(r => assert(r.getAs[Int]("name_lev") == 1))
    } finally DistributedRank.release(spark)
  }

  test("quality: candidates ≈ O(n·w), recall consistent with pairs") {
    val customer = Tables.customer(spark, sf)
    try {
      val q = EntityResolution.sortedNeighborhoodQuality(customer, w = 4)
        .collect().head
      val n = q.getAs[Long]("n")
      val cand = q.getAs[Long]("candidates")
      // window blocking generates at most 2n·w cross-side candidates
      assert(cand <= 2L * n * 4L)
      assert(q.getAs[Long]("true_found") <= n)
      // reduction ratio must be extreme vs the n² cross
      assert(q.getAs[Long]("reduction_ratio_ppm") > 900000L)
      // the dirty twin sorts adjacent often enough to beat 50% recall
      assert(q.getAs[Long]("recall_ppm") > 500000L)
    } finally DistributedRank.release(spark)
  }
}
