package graft

import graft.operators.{DistributedRank, Mixture}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming distribution-matched admission ([[Mixture.distMatchedStream]]):
  * whole-corpus-in-one-batch parity with the batch operator (row for row,
  * quota included), and multi-batch ledger invariants — per-bucket dense
  * pick_ranks across batches, no admissions outside the reference's
  * buckets, per-bucket totals bounded by the largest standing quota.
  */
class StreamingDistMatchedSpec extends SparkTestBase {
  import spark.implicits._

  private def doc(i: Long, src: String, tokens: Int): MixDoc =
    MixDoc(i, (1 to tokens).map(j => s"w${(i + j) % 7}").mkString(" "), src)

  test("one-batch streaming admission == batch distMatchedSample, row for row") {
    implicit val sqlCtx = spark.sqlContext
    // ref spans buckets 16 and 32; pool spans 16/32/64 (64 must be excluded)
    val docs =
      (0L until 6L).map(i => doc(i, "ref", 10 + i.toInt)) ++
        (6L until 10L).map(i => doc(i, "ref", 20 + i.toInt)) ++
        (10L until 40L).map(i => doc(i, "pool",
          Seq(12, 25, 40)((i % 3L).toInt)))
    val mem = MemoryStream[MixDoc]
    @volatile var got: Seq[Seq[Any]] = Seq.empty
    val q = Mixture.distMatchedStream(mem.toDF(), refSource = "ref",
      samplePpm = 500000L) { (adm, _) =>
      got = got ++ adm.collect().toSeq.map(_.toSeq)
    }
    try {
      mem.addData(docs: _*)
      q.processAllAvailable()
      val want = Mixture.distMatchedSample(docs.toDF(), refSource = "ref",
        samplePpm = 500000L).collect().toSeq.map(_.toSeq)
      DistributedRank.release(spark)
      assert(got.nonEmpty)
      assert(got.toSet == want.toSet, s"stream ${got.size} vs batch ${want.size}")
    } finally q.stop()
  }

  test("multi-batch admission: dense ranks, ref-bucket-only, quota-bounded") {
    implicit val sqlCtx = spark.sqlContext
    val b1 =
      (0L until 8L).map(i => doc(i, "ref", 12)) ++
        (8L until 24L).map(i => doc(i, "pool", if (i % 2L == 0L) 12 else 40))
    val b2 = // the pool surges in bucket 16; new ref mass lands in bucket 32
      (24L until 28L).map(i => doc(i, "ref", 25)) ++
        (28L until 48L).map(i => doc(i, "pool", 12))
    val mem = MemoryStream[MixDoc]
    val emitted = scala.collection.mutable.ArrayBuffer.empty[(Long, Int, Long, Long)]
    val q = Mixture.distMatchedStream(mem.toDF(), refSource = "ref",
      samplePpm = 600000L) { (adm, _) =>
      adm.collect().foreach(r => emitted +=
        ((r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))))
    }
    try {
      mem.addData(b1: _*)
      q.processAllAvailable()
      mem.addData(b2: _*)
      q.processAllAvailable()
      assert(emitted.nonEmpty)
      // no doc admitted twice
      assert(emitted.map(_._1).distinct.size == emitted.size)
      // only reference buckets are ever admitted (16 and 32 here, never 64)
      assert(emitted.map(_._2).toSet.subsetOf(Set(16, 32)))
      emitted.groupBy(_._2).foreach { case (bk, rows) =>
        // dense pick_ranks 1..n across batches
        assert(rows.map(_._3).sorted == (1L to rows.size.toLong),
          s"bucket $bk ranks ${rows.map(_._3).sorted}")
        // per-bucket total admitted never exceeds the largest standing quota
        assert(rows.size <= rows.map(_._4).max,
          s"bucket $bk admitted ${rows.size} > max quota ${rows.map(_._4).max}")
      }
    } finally q.stop()
  }
}
