package graft

import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

/** Clip-level video dedup: majority-vote signatures over stride-sampled
  * REAL-decoded frame dHashes must equal the formula recompute, and the
  * collapse-then-band near-dup join must account for every brute-force
  * signature pair.
  */
class VideoDedupSpec extends SparkTestBase {

  private def frameDhash(v: Long): Long = {
    val w = (8 + v % 13).toInt
    val h = (8 + v % 11).toInt
    def g(x: Int, y: Int): Int = ((v + 31L * x + 17L * y) % 256L).toInt
    var fp = 0L
    for (yt <- 0 until 8) {
      val ys = yt * h / 8
      var prev = g(0, ys)
      for (xt <- 0 until 8) {
        val next = g((xt + 1) * w / 9, ys)
        if (next > prev) fp |= 1L << (yt * 8 + xt)
        prev = next
      }
    }
    fp
  }

  private def refSig(d: Long): (Int, Int, Long) = {
    val nf = (4 + d % 7).toInt
    val hs = (0 until nf by 2).map(k => frameDhash(d * 131L + k.toLong * 17L))
    var sig = 0L
    for (b <- 0 until 64)
      if (2 * hs.count(h => ((h >> b) & 1L) == 1L) > hs.size) sig |= 1L << b
    (nf, hs.size, sig)
  }

  test("video signatures from decoded frames equal the formula recompute") {
    val docs = Tables.documents(spark, sf)
    val got = Multimodal.videoSignatures(spark, docs).collect()
    assert(got.length == docs.count())
    got.foreach { r =>
      val id = r.getLong(0)
      val (nf, m, sig) = refSig(id)
      assert((r.getInt(1), r.getInt(2), r.getLong(3)) == ((nf, m, sig)), s"doc $id")
    }
  }

  test("collapse-then-band accounts for every brute-force signature pair") {
    val docs = Tables.documents(spark, sf)
    val edges = Multimodal.videoNearDups(spark, docs, maxHamming = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
    val ids = docs.select(col("doc_id")).collect().map(_.getLong(0)).sorted
    val sigs = ids.map(id => id -> refSig(id)._3).toMap
    val classes = ids.groupBy(sigs).map { case (s, ms) => s -> (ms.min, ms.length.toLong) }
    val bruteCross = for {
      i <- ids.indices; j <- (i + 1) until ids.length
      hm = java.lang.Long.bitCount(sigs(ids(i)) ^ sigs(ids(j)))
      if hm >= 1 && hm <= 2
    } yield (ids(i), ids(j), hm)
    assert(bruteCross.nonEmpty, "fixture has no cross-class pairs — gate is vacuous")
    edges.foreach { case (a, b, hm, w) =>
      assert(classes(sigs(a))._1 == a && classes(sigs(b))._1 == b)
      assert(java.lang.Long.bitCount(sigs(a) ^ sigs(b)) == hm)
      assert(classes(sigs(a))._2 * classes(sigs(b))._2 == w)
    }
    assert(edges.map(_._4).sum == bruteCross.size.toLong)
  }

  test("near-dup plan: band equi-join, no cartesian product") {
    val docs = Tables.documents(spark, sf)
    val plan = Multimodal.videoNearDups(spark, docs)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
