package graft

import java.sql.Timestamp

import graft.operators.Kmv
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** KMV sketch: planted-overlap accuracy, saturation boundaries,
  * partitioning invariance of the sketch itself, and batch ≡ streaming
  * parity of the bounded-state aggregator.
  */
class KmvSpec extends SparkTestBase {
  import spark.implicits._

  private val t0 = Timestamp.valueOf("2024-01-01 00:00:00")

  /** A = users [0, 1000), B = users [700, 1700):
    * |A| = |B| = 1000, |A∩B| = 300, |A∪B| = 1700, J = 3/17.
    */
  private def planted: DataFrame = {
    val a = (0L until 1000L).map(u => (u, t0, u, "a", 1.0))
    val b = (0L until 1000L).map(i => (10000L + i, t0, 700L + i, "b", 1.0))
    (a ++ b).toDF("event_id", "ts", "user_id", "event_type", "value")
  }

  test("kmvDistinct: exact fields exact; estimate inside 3σ") {
    val rows = Kmv.kmvDistinct(planted).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("a", "b"))
    rows.foreach { r =>
      assert(r.getLong(1) == Kmv.K) // saturated at 1000 distinct
      assert(r.getLong(3) == 1000L)
      val est = r.getLong(2) / 1e6
      // KMV rel. std. error ≈ 1/√(K−2); 3σ bar
      assert(math.abs(est - 1000.0) / 1000.0 < 3.0 / math.sqrt(Kmv.K - 2.0),
        s"estimate $est too far from 1000")
    }
  }

  test("kmvDistinct: unsaturated sketch is the exact distinct set") {
    for (n <- Seq(Kmv.K - 1, Kmv.K, Kmv.K + 1)) {
      val df = (0L until n.toLong).map(u => (u, t0, u, "x", 1.0))
        .toDF("event_id", "ts", "user_id", "event_type", "value")
      val r = Kmv.kmvDistinct(df).collect().head
      assert(r.getLong(1) == math.min(n, Kmv.K).toLong, s"size at n=$n")
      assert(r.getLong(3) == n.toLong)
      if (n < Kmv.K) assert(r.getLong(2) == n * 1000000L, s"exact at n=$n")
    }
  }

  test("kmvJaccard: exact micros exact; sketch estimate inside 3σ") {
    val r = Kmv.kmvJaccard(planted).collect().head
    assert(r.getString(0) == "a" && r.getString(1) == "b")
    val jExact = r.getLong(5) / 1e6
    assert(r.getLong(5) == 300L * 1000000L / 1700L) // 176470
    val jEst = r.getLong(4) / 1e6
    // matched/K is a K-sample proportion: σ ≈ √(J(1−J)/K)
    val sigma = math.sqrt(jExact * (1 - jExact) / Kmv.K)
    assert(math.abs(jEst - jExact) < 3 * sigma + 1e-9,
      s"jaccard est $jEst vs exact $jExact")
    assert(r.getLong(2) == Kmv.K) // union sketch saturated
  }

  test("sketch is partitioning-invariant (merge-order independence)") {
    val one = Kmv.sketches(planted.repartition(1))
      .orderBy("event_type").collect()
    val many = Kmv.sketches(planted.repartition(13))
      .orderBy("event_type").collect()
    assert(one.length == many.length)
    one.zip(many).foreach { case (x, y) =>
      assert(x.getString(0) == y.getString(0))
      assert(x.getSeq[Long](1) == y.getSeq[Long](1),
        s"sketch differs for ${x.getString(0)}")
    }
  }

  test("sketch array is ascending in the flipped domain and ≤ K entries") {
    val sk = Kmv.sketches(planted).collect().head.getSeq[Long](1)
    assert(sk.length <= Kmv.K)
    assert(sk == sk.sorted)
    assert(sk.distinct.length == sk.length)
  }

  test("streaming groupBy with the KMV aggregator matches batch") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    mem.addData((0L until 500L).map(u =>
      Ev(u, t0, u % 211L, if (u % 2 == 0) "a" else "b", 1.0)): _*)
    import graft.functions.GraftColumns.mix64
    val agg = mem.toDF()
      .select(col("event_type"), mix64(col("user_id")).as("h"))
      .groupBy(col("event_type"))
      .agg(udaf(new Kmv.KmvSketchLong).apply(col("h")).as("sketch"))
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("kmv_stream").start()
    try { q.processAllAvailable() } finally q.stop()
    val stream = spark.table("kmv_stream")
      .orderBy("event_type").collect()
    val batch = (0L until 500L).map(u =>
        (u, t0, u % 211L, if (u % 2 == 0) "a" else "b", 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val bat = Kmv.sketches(batch).orderBy("event_type").collect()
    assert(stream.length == bat.length)
    stream.zip(bat).foreach { case (s, b) =>
      assert(s.getString(0) == b.getString(0))
      assert(s.getSeq[Long](1) == b.getSeq[Long](1))
    }
  }
}
