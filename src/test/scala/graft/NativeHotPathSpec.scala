package graft

import graft.functions.GraftColumns
import graft.operators.KMeans
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row

/** Round-12 optimization: the three native expressions that replaced
  * interpreted higher-order-function folds on the embeddings hot paths
  * (guide §4 — keep hot expressions inside whole-stage codegen) are
  * pinned bit-exactly to the compositional spellings they replaced,
  * including the null/malformed edge cases those spellings imply.
  */
class NativeHotPathSpec extends SparkTestBase {

  private lazy val implicitsHolder = spark
  import implicitsHolder.implicits._

  private def hofDot(w: Array[Long]) =
    aggregate(
      zip_with(col("v"), typedLit(w.toSeq), (a, b) => a * b),
      lit(0L), (acc, x) => acc + x)

  test("DotLongLit equals the aggregate/zip_with fold incl. edge cases") {
    // No overflow vectors here: the session runs Spark 4's default ANSI
    // mode, where the HOF fold THROWS on long overflow while the native
    // loop wraps — both operators' inputs are magnitude-ledgered so the
    // case is unreachable; parity is pinned on the reachable domain.
    val w = Array(3L, -7L, 11L, 1000003L)
    val vs: Seq[Seq[java.lang.Long]] = Seq(
      Seq[java.lang.Long](1L, 2L, 3L, 4L),
      Seq[java.lang.Long](-5L, 0L, 123456789L, 2L),
      Seq[java.lang.Long](1L, null, 3L, 4L),           // null element
      Seq[java.lang.Long](1L, 2L, 3L),                 // short
      Seq[java.lang.Long](1L, 2L, 3L, 4L, 5L),         // long
      null)                                            // null vector
    val df = vs.zipWithIndex.toDF("v", "id")
      .select(col("id"), col("v").cast("array<bigint>").as("v"))
    val got = df.select(col("id"), GraftColumns.dotLongLit(col("v"), w).as("d"),
      hofDot(w).as("h")).collect()
    got.foreach { r =>
      assert(r.isNullAt(1) == r.isNullAt(2), s"null mismatch on id=${r.getInt(0)}")
      if (!r.isNullAt(1))
        assert(r.getLong(1) == r.getLong(2), s"value mismatch on id=${r.getInt(0)}")
    }
  }

  test("NearestCentroidFp equals the array_min-over-structs spelling incl. edges") {
    val cents = Array(Array(0L, 0L, 0L), Array(5L, 5L, 5L), Array(5L, 5L, 5L))
    val vs: Seq[Seq[java.lang.Long]] = Seq(
      Seq[java.lang.Long](1L, 1L, 1L),   // nearest 0
      Seq[java.lang.Long](4L, 4L, 4L),   // nearest 1 (tie 1 vs 2 -> low cid)
      Seq[java.lang.Long](3L, 3L, 2L),
      Seq[java.lang.Long](1L, null, 1L), // null element -> (null, 0)
      Seq[java.lang.Long](1L, 1L),       // short -> (null, 0)
      null)                              // null vector -> (null, 0)
    val df = vs.zipWithIndex.toDF("v", "id")
      .select(col("id"), col("v").cast("array<bigint>").as("v"))
    val a = KMeans.assignTo(df, cents)
      .select(col("id"), col("cluster"), col("d2")).collect().sortBy(_.getInt(0))
    val b = KMeans.assignToDecl(df, cents)
      .select(col("id"), col("cluster"), col("d2")).collect().sortBy(_.getInt(0))
    a.zip(b).foreach { case (x, y) =>
      assert(x.getInt(1) == y.getInt(1), s"cid mismatch on id=${x.getInt(0)}")
      assert(x.isNullAt(2) == y.isNullAt(2), s"d2 null mismatch on id=${x.getInt(0)}")
      if (!x.isNullAt(2))
        assert(x.getLong(2) == y.getLong(2), s"d2 mismatch on id=${x.getInt(0)}")
    }
  }

  test("NearestCentroidFp matches on the real embedding corpus") {
    val emb = Tables.embeddings(spark, sf)
    val cents = KMeans.fit(emb, k = 8, iters = 3)
    val fp = emb.select(col("vec_id"), KMeans.quantize(col("embedding")).as("v"))
    val a = KMeans.assignTo(fp, cents)
      .select(col("vec_id"), col("cluster"), col("d2"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sortBy(_._1)
    val b = KMeans.assignToDecl(fp, cents)
      .select(col("vec_id"), col("cluster"), col("d2"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sortBy(_._1)
    assert(a.sameElements(b))
  }

  test("GramPairs equals the nested-transform HOF spelling incl. null element") {
    val hof = expr(
      s"""flatten(transform(sequence(0, size(v) - 1), i ->
         |  transform(sequence(i, size(v) - 1), j -> struct(
         |    i as i, j as j,
         |    CAST(floor(element_at(v, i + 1) * 1048576.0) AS BIGINT)
         |      * CAST(floor(element_at(v, j + 1) * 1048576.0) AS BIGINT)
         |      as p))))""".stripMargin)
    val vs: Seq[Seq[java.lang.Double]] = Seq(
      Seq[java.lang.Double](0.25, -0.5, 0.99),
      Seq[java.lang.Double](0.1, null, 0.3), // null element -> null products
      Seq[java.lang.Double](-0.77))
    val df = vs.zipWithIndex.toDF("v", "id")
      .select(col("id"), col("v").cast("array<double>").as("v"))
    def norm(rows: Array[Row]) = rows.map { r =>
      (r.getInt(0), r.getSeq[Row](1).map(s =>
        (s.getInt(0), s.getInt(1), if (s.isNullAt(2)) null else s.getLong(2))))
    }.sortBy(_._1)
    val a = norm(df.select(col("id"), GraftColumns.gramPairs(col("v"))).collect())
    val b = norm(df.select(col("id"), hof).collect())
    assert(a.sameElements(b))
  }

  test("FirstGreaterInt equals element_at(filter(...), 1) on sorted arrays") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(11)
    val rows = (0 until 300).map { i =>
      val arr = Seq.fill(rnd.nextInt(6))(rnd.nextInt(10)).sorted
      (arr, rnd.nextInt(12) - 1)
    }
    val df = rows.toDF("arr", "v")
    val native = df.select(graft.functions.GraftColumns
      .firstGreaterInt(col("arr"), col("v"))).collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getInt(0)))
    val hof = df.select(
      when(size(filter(col("arr"), x => x > col("v"))) > 0,
        element_at(filter(col("arr"), x => x > col("v")), 1))).collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getInt(0)))
    assert(native.toSeq == hof.toSeq)
    // and the sorted-array existence identity used beside it
    val exLast = df.filter(size(col("arr")) > 0)
      .select((element_at(col("arr"), -1) > col("v")).as("e")).collect()
      .map(_.getBoolean(0))
    val exHof = df.filter(size(col("arr")) > 0)
      .select((size(filter(col("arr"), x => x > col("v"))) > 0).as("e"))
      .collect().map(_.getBoolean(0))
    assert(exLast.toSeq == exHof.toSeq)
  }

  test("gramMatrix on the real corpus matches the HOF recompute") {
    val emb = Tables.embeddings(spark, sf)
    val got = graft.operators.Pca.gramMatrix(emb)
      .select(col("i"), col("j"), col("gram_fp"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    val want = emb
      .select(col("embedding").cast("array<double>").as("v"))
      .select(explode(expr(
        s"""flatten(transform(sequence(0, size(v) - 1), i ->
           |  transform(sequence(i, size(v) - 1), j -> struct(
           |    i as i, j as j,
           |    CAST(floor(element_at(v, i + 1) * 1048576.0) AS BIGINT)
           |      * CAST(floor(element_at(v, j + 1) * 1048576.0) AS BIGINT)
           |      as p))))""".stripMargin)).as("s"))
      .groupBy(col("s.i").as("i"), col("s.j").as("j"))
      .agg(sum(col("s.p")).as("gram_fp"))
      .orderBy(col("i"), col("j"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    assert(got.sameElements(want))
  }
}
