package graft

import graft.operators.Similarity

class KCenterSpec extends SparkTestBase {

  import spark.implicits._

  private def emb(vs: (Long, Seq[Float])*) =
    vs.map { case (id, v) => (id, v.toArray) }.toDF("vec_id", "embedding")

  test("kCenterSelection follows the farthest-point order on a line") {
    // points on a 1-D line at 0, 1, 10, 21 (ids 0..3).
    // Gonzalez from id 0: farthest is 21 (id 3); then dmin = min(d to 0,
    // d to 21): id1 -> min(1,400)=1, id2 -> min(100,121)=100 → pick id 2
    // with radius 100; then id 1 with dmin min(1, 81)=1.
    val df = emb(
      0L -> Seq(0f, 0f), 1L -> Seq(1f, 0f),
      2L -> Seq(10f, 0f), 3L -> Seq(21f, 0f))
    val rows = Similarity.kCenterSelection(df, k = 4).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(t => (t._1, t._2)).toSeq ==
      Seq((1, 0L), (2, 3L), (3, 2L), (4, 1L)))
    // radii in the rel_fp convention (one DIV 2³⁰ off the 2⁶⁰-scaled
    // square): exact d² · 2³⁰ for integer coordinates
    assert(rows.map(_._3).toSeq ==
      Seq(0L, 441L << 30, 100L << 30, 1L << 30))
  }

  test("kCenterSelection: covering radii are nonincreasing (property)") {
    val df = emb((0L to 40L).map(i =>
      i -> Seq((i % 7).toFloat, (i % 11).toFloat, (i * 13 % 17).toFloat)): _*)
    val radii = Similarity.kCenterSelection(df, k = 6).collect()
      .map(_.getLong(2)).toSeq
    assert(radii.head == 0L)
    val picked = radii.drop(1)
    assert(picked.zip(picked.tail).forall { case (a, b) => a >= b },
      s"radii must be nonincreasing, got $radii")
  }

  test("kCenterSelection: duplicate points tie-break to smaller vec_id") {
    val df = emb(
      5L -> Seq(0f), 6L -> Seq(0f), 7L -> Seq(3f), 8L -> Seq(3f))
    val rows = Similarity.kCenterSelection(df, k = 3).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    // start at 5; farthest (d²=9) is shared by 7 and 8 → pick 7; all
    // remaining dmin are 0 → pick the smallest id, 6, radius 0
    assert(rows.toSeq == Seq((1, 5L, 0L), (2, 7L, 9L << 30), (3, 6L, 0L)))
  }
}
