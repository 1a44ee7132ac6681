package graft

import graft.functions.GraftColumns
import org.apache.spark.sql.functions._

/** Edge semantics of the native vector expressions: malformed inputs must
  * yield NULL, never plausible truncated values.
  */
class ExpressionEdgeSpec extends SparkTestBase {
  import spark.implicits._

  test("dot_product/cosine_sim: NULL on length mismatch and null elements") {
    val df = Seq(
      (1L, Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),   // clean
      (2L, Seq(1.0, 2.0), Seq(4.0, 5.0, 6.0)),          // length mismatch
      (3L, Seq(1.0, 2.0, 3.0), Seq(1.0, 2.0, 3.0))
    ).toDF("id", "a", "b")
      .select(col("id"),
        GraftColumns.dotProduct(col("a"), col("b")).as("dp"),
        GraftColumns.cosineSim(col("a"), col("b")).as("cs"))
      .orderBy("id").collect()
    assert(df(0).getDouble(1) == 32.0)
    assert(df(1).isNullAt(1) && df(1).isNullAt(2))
    assert(df(2).getDouble(2) == 1.0)

    val withNullElem = Seq((1L, Seq[java.lang.Double](1.0, null, 3.0), Seq[java.lang.Double](1.0, 2.0, 3.0)))
      .toDF("id", "a", "b")
      .select(
        GraftColumns.dotProduct(col("a").cast("array<double>"), col("b").cast("array<double>")).as("dp"))
      .collect()
    assert(withNullElem(0).isNullAt(0))
  }

  test("Column-level API works with no function registration (fresh analyzer path)") {
    // GraftColumns must not depend on GraftFunctions.register having run.
    val out = Seq((Seq(3.0, 4.0), Seq(3.0, 4.0))).toDF("a", "b")
      .select(GraftColumns.cosineSim(col("a"), col("b")).as("sim"))
      .as[Double].head
    assert(out == 1.0)
  }
}
