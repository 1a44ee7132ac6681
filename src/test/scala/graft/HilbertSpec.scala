package graft

import graft.functions.HilbertXY2D
import graft.operators.Layout
import org.apache.spark.sql.functions._

/** Hilbert-curve key: the defining adjacency property (consecutive
  * indices are Manhattan-adjacent cells — exactly what Morton lacks),
  * bijectivity, codegen parity with the Scala loop, and the locality
  * win over z-order on bucket bounding boxes.
  */
class HilbertSpec extends SparkTestBase {
  import spark.implicits._

  test("consecutive Hilbert indices are Manhattan-adjacent; d is a bijection") {
    val n = 64L
    val cells = for (x <- 0L until n; y <- 0L until n)
      yield (HilbertXY2D.xy2d(n, x, y), x, y)
    val byD = cells.sortBy(_._1)
    assert(byD.map(_._1) == (0L until n * n), "not a bijection onto [0, n²)")
    byD.sliding(2).foreach { case Seq((_, x1, y1), (_, x2, y2)) =>
      assert((x1 - x2).abs + (y1 - y2).abs == 1,
        s"jump between ($x1,$y1) and ($x2,$y2)")
    }
  }

  test("codegen expression matches the Scala loop") {
    val df = (0 until 500).map(i => ((i * 131L) % 1024, (i * 379L) % 1024))
      .toDF("x", "y")
    val got = df.select(col("x"), col("y"),
        Layout.hilbertKey(col("x"), col("y"), 10).as("d"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(2) ==
        HilbertXY2D.xy2d(1024, r.getLong(0), r.getLong(1)))
    }
  }

  test("Hilbert buckets have tighter bounding boxes than Morton buckets") {
    // uniform grid sample; 64 buckets of 4096 cells each over 1024²...
    // use a 256² grid fully enumerated, buckets of 1024 cells
    val n = 256L
    val cells = (for (x <- 0L until n; y <- 0L until n) yield (x, y)).toDF("x", "y")
    def avgSemiPerimeter(key: org.apache.spark.sql.Column): Double = {
      val r = cells.select(col("x"), col("y"), key.as("k"))
        .groupBy(shiftright(col("k"), 10).as("b"))
        .agg((max(col("x")) - min(col("x")) +
          max(col("y")) - min(col("y"))).as("sp"))
        .agg(avg(col("sp"))).collect().head.getDouble(0)
      r
    }
    val h = avgSemiPerimeter(Layout.hilbertKey(col("x"), col("y"), 8))
    val z = avgSemiPerimeter(Layout.zorderKey(col("x"), col("y"), 8))
    assert(h <= z, s"hilbert $h should not be looser than morton $z")
  }
}
