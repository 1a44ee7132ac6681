package graft

import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

/** Perceptual-hash image dedup: the dHash/aHash fingerprints computed from
  * REAL decoded bytes of a MIXED-container corpus (odd ids PNG, even ids
  * BMP) must equal an independent arithmetic recompute from the pixel
  * formula (pinning both codec paths + grid resize), and the
  * Hamming-banded near-dup join must be lossless vs brute force.
  */
class ImageDedupSpec extends SparkTestBase {

  test("the corpus really is mixed-container: PNG magic on odd, BM on even") {
    val png = Multimodal.encodeImage(7L)
    assert((png(0) & 0xff) == 0x89 && png(1) == 'P'.toByte &&
      png(2) == 'N'.toByte && png(3) == 'G'.toByte, "odd id must be PNG")
    val bmp = Multimodal.encodeImage(8L)
    assert(bmp(0) == 'B'.toByte && bmp(1) == 'M'.toByte, "even id must be BMP")
    // both containers decode to the SAME pixels (lossless round-trip)
    def px(bytes: Array[Byte]) = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      for (y <- 0 until img.getHeight; x <- 0 until img.getWidth)
        yield img.getRGB(x, y) & 0xffffff
    }
    assert(px(Multimodal.encodePng(12L)) == px(Multimodal.encodeBmp(12L)))
  }

  /** Formula-only reimplementation (no ImageIO, no BMP bytes): what the
    * DuckDB oracle computes. Equality against the engine proves the
    * encode → real-codec-decode → grid-sample path is exact.
    */
  private def refFp(d: Long): (Int, Int, Long, Long) = {
    val w = (8 + d % 13).toInt
    val h = (8 + d % 11).toInt
    def g(x: Int, y: Int): Int = ((d + 31L * x + 17L * y) % 256L).toInt
    var dhash = 0L
    for (yt <- 0 until 8) {
      val ys = yt * h / 8
      var prev = g(0, ys)
      for (xt <- 0 until 8) {
        val next = g((xt + 1) * w / 9, ys)
        if (next > prev) dhash |= 1L << (yt * 8 + xt)
        prev = next
      }
    }
    val grid = for (yt <- 0 until 8; xt <- 0 until 8) yield g(xt * w / 8, yt * h / 8)
    val sum = grid.map(_.toLong).sum
    var ahash = 0L
    grid.zipWithIndex.foreach { case (v, i) => if (64L * v > sum) ahash |= 1L << i }
    (w, h, dhash, ahash)
  }

  test("image fingerprints from decoded pixels equal the formula recompute") {
    val docs = Tables.documents(spark, sf)
    val got = Multimodal.imageFingerprints(spark, docs).collect()
    assert(got.length == docs.count())
    got.foreach { r =>
      val id = r.getLong(0)
      val (w, h, dh, ah) = refFp(id)
      assert((r.getInt(1), r.getInt(2), r.getLong(3), r.getLong(4)) ==
        ((w, h, dh, ah)), s"doc $id")
    }
  }

  test("banded near-dups are lossless: equal to brute-force all-pairs (recall = 1)") {
    val docs = Tables.documents(spark, sf)
    val banded = Multimodal.imageNearDups(spark, docs, maxHamming = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // brute force over the formula fingerprints (driver-side, 500 docs)
    val ids = docs.select(col("doc_id")).collect().map(_.getLong(0)).sorted
    val fps = ids.map(id => id -> refFp(id)._3).toMap
    val brute = (for {
      i <- ids.indices; j <- (i + 1) until ids.length
      hm = java.lang.Long.bitCount(fps(ids(i)) ^ fps(ids(j)))
      if hm <= 2
    } yield (ids(i), ids(j), hm)).toSet
    assert(brute.nonEmpty, "fixture has no near-dup pairs — gate is vacuous")
    assert(banded == brute)
  }

  test("collapsed variant accounts for every plain banded pair") {
    val docs = Tables.documents(spark, sf)
    val plain = Multimodal.imageNearDups(spark, docs, maxHamming = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val edges = Multimodal.imageNearDupsCollapsed(spark, docs, maxHamming = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
    val ids = docs.select(col("doc_id")).collect().map(_.getLong(0))
    val fps = ids.map(id => id -> refFp(id)._3).toMap
    val rep = ids.groupBy(fps).map { case (fp, ms) => fp -> ms.min }
    // cross-class plain pairs (hamming >= 1) aggregate exactly to the edges
    val cross = plain.filter(_._3 >= 1)
    assert(cross.nonEmpty && edges.nonEmpty)
    assert(edges.map(_._4).sum == cross.size.toLong)
    val edgeSet = edges.map(e => (e._1, e._2)).toSet
    cross.foreach { case (a, b, _) =>
      val (ra, rb) = (rep(fps(a)), rep(fps(b)))
      val key = if (ra < rb) (ra, rb) else (rb, ra)
      assert(edgeSet.contains(key), s"plain pair ($a,$b) missing edge $key")
    }
  }

  test("near-dup plan: band equi-join, no cartesian product") {
    val docs = Tables.documents(spark, sf)
    val plan = Multimodal.imageNearDups(spark, docs)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
