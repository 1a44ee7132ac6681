package graft

import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

/** Perceptual-hash audio dedup: the envelope-delta/profile fingerprints
  * computed from REAL javax.sound-decoded WAV bytes must equal an
  * independent arithmetic recompute from the sample formula (pinning the
  * whole RIFF parse + framing path), and the collapse-then-band near-dup
  * join must account for every brute-force pair — cross-class edges via
  * pair_count, within-class (Hamming 0) pairs via the class sizes.
  */
class AudioDedupSpec extends SparkTestBase {

  /** Formula-only reimplementation (no javax.sound, no WAV bytes): what the
    * DuckDB oracle computes. Equality against the engine proves the
    * encode → real-codec-decode → frame-energy path is exact.
    */
  private def refFp(d: Long): (Int, Long, Long) = {
    val n = (64 + d % 97).toInt
    val abs = Array.tabulate(n)(i => math.abs((d * 7 + i.toLong * 193) % 65536 - 32768))
    val e = Array.tabulate(65)(f => abs.slice(f * n / 65, (f + 1) * n / 65).sum)
    val tot = e.sum
    var afp = 0L
    var pfp = 0L
    for (f <- 0 until 64) {
      if (e(f + 1) > e(f)) afp |= 1L << f
      if (65L * e(f) > tot) pfp |= 1L << f
    }
    (n, afp, pfp)
  }

  test("audio fingerprints from decoded PCM equal the formula recompute") {
    val docs = Tables.documents(spark, sf)
    val got = Multimodal.audioFingerprints(spark, docs).collect()
    assert(got.length == docs.count())
    got.foreach { r =>
      val id = r.getLong(0)
      val (n, afp, pfp) = refFp(id)
      assert((r.getInt(1), r.getLong(2), r.getLong(3)) == ((n, afp, pfp)), s"doc $id")
    }
  }

  test("collapse-then-band accounts for every brute-force pair at hamming <= 2") {
    val docs = Tables.documents(spark, sf)
    val edges = Multimodal.audioNearDups(spark, docs, maxHamming = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))

    val ids = docs.select(col("doc_id")).collect().map(_.getLong(0)).sorted
    val fps = ids.map(id => id -> refFp(id)._2).toMap
    val brute = for {
      i <- ids.indices; j <- (i + 1) until ids.length
      hm = java.lang.Long.bitCount(fps(ids(i)) ^ fps(ids(j)))
      if hm <= 2
    } yield (ids(i), ids(j), hm)
    val bruteCross = brute.filter(_._3 >= 1)
    assert(bruteCross.nonEmpty, "fixture has no cross-class pairs — gate is vacuous")

    // Every edge's endpoints are true class representatives (min doc per fp)
    // and its hamming is the exact fingerprint distance.
    val classes = ids.groupBy(fps).map { case (fp, ms) => fp -> (ms.min, ms.length.toLong) }
    edges.foreach { case (a, b, hm, w) =>
      val fa = fps(a); val fb = fps(b)
      assert(classes(fa)._1 == a && classes(fb)._1 == b, s"($a,$b) not class reps")
      assert(java.lang.Long.bitCount(fa ^ fb) == hm)
      assert(classes(fa)._2 * classes(fb)._2 == w, s"($a,$b) weight")
    }
    // Cross-class completeness: summed pair_count equals the brute-force
    // count of doc pairs at hamming in [1, 2] (collapse loses nothing)...
    assert(edges.map(_._4).sum == bruteCross.size.toLong)
    // ...and each brute cross pair maps to exactly the edge of its classes.
    val edgeSet = edges.map(e => (e._1, e._2)).toSet
    bruteCross.foreach { case (x, y, _) =>
      val (rx, ry) = (classes(fps(x))._1, classes(fps(y))._1)
      val key = if (rx < ry) (rx, ry) else (ry, rx)
      assert(edgeSet.contains(key), s"brute pair ($x,$y) missing edge $key")
    }
    // Within-class (hamming 0) pairs are the complement: C(members, 2) each.
    val withinExpected = classes.values.map { case (_, m) => m * (m - 1) / 2 }.sum
    assert(brute.count(_._3 == 0).toLong == withinExpected)
  }

  test("near-dup plan: band equi-join over distinct fingerprints, no cartesian") {
    val docs = Tables.documents(spark, sf)
    val plan = Multimodal.audioNearDups(spark, docs)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
