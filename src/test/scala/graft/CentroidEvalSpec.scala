package graft

import graft.operators.Similarity

/** Hand pin for the nearest-centroid eval. */
class CentroidEvalSpec extends SparkTestBase {

  test("centroidClassifierEval: parity split, argmax, confusion cells") {
    import spark.implicits._
    // train (even ids): axis-aligned centroids; test (odd ids): one
    // correct per class plus one mislabeled vector
    val d = Seq(
      (0L, Array(1.0f, 0.0f), 0),
      (2L, Array(0.0f, 1.0f), 1),
      (1L, Array(0.9f, 0.1f), 0), // -> 0 correct
      (3L, Array(0.2f, 0.8f), 1), // -> 1 correct
      (5L, Array(0.7f, 0.3f), 1)) // labeled 1, predicted 0
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.centroidClassifierEval(d)
      .collect().map(r => (r.getInt(0), r.getInt(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5))))
      .toMap
    assert(got((0, 0)) === ((1L, 1L, 1000000L, true)))
    assert(got((1, 0)) === ((1L, 2L, 500000L, false)))
    assert(got((1, 1)) === ((1L, 2L, 500000L, true)))
    assert(got.size === 3)
  }

  test("centroidClassifierEval: score ties break to the smaller label") {
    import spark.implicits._
    val d = Seq(
      (0L, Array(1.0f, 0.0f), 3),
      (2L, Array(1.0f, 0.0f), 7), // identical centroid as label 3
      (1L, Array(1.0f, 0.0f), 7))
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.centroidClassifierEval(d).collect()
    assert(got.length === 1)
    assert(got(0).getInt(0) === 7 && got(0).getInt(1) === 3) // tie -> 3
  }
}
