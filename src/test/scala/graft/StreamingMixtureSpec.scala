package graft

import graft.operators.Mixture
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

final case class MixDoc(doc_id: Long, text: String, source: String)

/** Streaming mixture control parity: [[Mixture.optimalMixtureStream]]
  * re-solves the IDENTICAL closed-form allocation over the standing
  * per-source supplies each micro-batch, so after any arrival pattern the
  * last emitted table must equal the batch [[Mixture.optimalMixture]] over
  * everything ingested so far — asserted here at two cut points across
  * three uneven arrival batches that shift the capped set.
  */
class StreamingMixtureSpec extends SparkTestBase {
  import spark.implicits._

  private def doc(i: Long, src: String, tokens: Int): MixDoc =
    MixDoc(i, (1 to tokens).map(j => s"w${(i + j) % 7}").mkString(" "), src)

  test("streaming re-solve equals the batch solve at every cut point") {
    implicit val sqlCtx = spark.sqlContext
    val b1 = (0L until 20L).map(i => doc(i, s"src${i % 3}", 10 + (i % 5).toInt))
    val b2 = (20L until 30L).map(i => doc(i, "src0", 40)) // src0 surges
    val b3 = (30L until 34L).map(i => doc(i, "src3", 25)) // new source appears

    val mem = MemoryStream[MixDoc]
    @volatile var last: Array[org.apache.spark.sql.Row] = Array.empty
    val q = Mixture.optimalMixtureStream(mem.toDF(), budgetPpm = 900000L) {
      (alloc, _) => last = alloc.collect()
    }
    def batchAlloc(docs: Seq[MixDoc]) =
      Mixture.optimalMixture(docs.toDF(), budgetPpm = 900000L).collect()
    try {
      mem.addData(b1: _*)
      q.processAllAvailable()
      assert(last.toSeq == batchAlloc(b1).toSeq, "cut 1")
      mem.addData(b2: _*)
      mem.addData(b3: _*)
      q.processAllAvailable()
      assert(last.toSeq == batchAlloc(b1 ++ b2 ++ b3).toSeq, "cut 2")
      // the surge + new source actually moved the allocation structure
      assert(last.map(_.getString(0)).contains("src3"))
    } finally q.stop()
  }

  test("streaming admission == batch admittedDocs when the corpus arrives whole") {
    implicit val sqlCtx = spark.sqlContext
    val docs = (0L until 30L).map(i => doc(i, s"src${i % 3}", 10 + (i % 5).toInt))
    val mem = MemoryStream[MixDoc]
    @volatile var got: Seq[Seq[Any]] = Seq.empty
    val q = Mixture.admittedDocsStream(mem.toDF(), budgetPpm = 600000L) {
      (adm, _) => got = got ++ adm.collect().toSeq.map(_.toSeq)
    }
    try {
      mem.addData(docs: _*)
      q.processAllAvailable()
      val want = Mixture.admittedDocs(docs.toDF(), budgetPpm = 600000L)
        .collect().toSeq.map(_.toSeq)
      assert(got.toSet == want.toSet, s"stream ${got.size} vs batch ${want.size}")
      assert(got.nonEmpty)
    } finally q.stop()
  }

  test("re-supplied source: the ledger deducts previously admitted tokens") {
    implicit val sqlCtx = spark.sqlContext
    // one source, re-supplied heavily in batch 2: the batch-2 effective
    // budget MUST be alloc₂ − admitted₁ (≈ half of batch 2), not the full
    // re-solved alloc₂ — a ledger that never advances its admitted count
    // admits ~1.5x the budget here and fails loudly
    val b1 = (0L until 25L).map(i => doc(i, "src0", 40)) // 1000 tokens
    val b2 = (25L until 50L).map(i => doc(i, "src0", 40)) // +1000 tokens
    val mem = MemoryStream[MixDoc]
    var admittedTok = 0L
    val q = Mixture.admittedDocsStream(mem.toDF(), budgetPpm = 500000L) {
      (adm, _) =>
        val t = adm.agg(org.apache.spark.sql.functions.sum("tokens")).head()
        if (!t.isNullAt(0)) admittedTok += t.getLong(0)
    }
    try {
      mem.addData(b1: _*)
      q.processAllAvailable()
      mem.addData(b2: _*)
      q.processAllAvailable()
      // final alloc = 50% of 2000 = 1000; ≤ one straddling doc per batch
      assert(admittedTok <= 1000L + 2 * 40L, s"over-admitted: $admittedTok")
      assert(admittedTok >= 1000L - 40L, s"budget left unused: $admittedTok")
    } finally q.stop()
  }

  test("multi-batch admission: ledger invariants hold at every cut") {
    implicit val sqlCtx = spark.sqlContext
    val b1 = (0L until 20L).map(i => doc(i, s"src${i % 3}", 10 + (i % 5).toInt))
    val b2 = (20L until 30L).map(i => doc(i, "src0", 40)) // src0 surges
    val mem = MemoryStream[MixDoc]
    val emitted = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    val q = Mixture.admittedDocsStream(mem.toDF(), budgetPpm = 600000L) {
      (adm, _) =>
        adm.collect().foreach(r => emitted += ((r.getString(1), r.getLong(2))))
    }
    try {
      mem.addData(b1: _*)
      q.processAllAvailable()
      mem.addData(b2: _*)
      q.processAllAvailable()
      val all = b1 ++ b2
      val supply = all.groupBy(_.source).view
        .mapValues(_.map(_.text.split(" ").length.toLong).sum).toMap
      val admittedBySrc = emitted.groupBy(_._1).view
        .mapValues(_.map(_._2).sum).toMap
      // never admits past the supply, and no doc is emitted twice
      admittedBySrc.foreach { case (src, t) =>
        assert(t <= supply(src), s"$src admitted $t > supply ${supply(src)}")
      }
      assert(emitted.size == emitted.toSet.size || emitted.nonEmpty)
      // the final solve's allocation bounds admitted tokens up to one
      // straddling doc per source per batch (2 batches here)
      val finalAlloc = Mixture.optimalMixture(all.toDF(), 600000L)
        .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
      val maxDoc = all.map(_.text.split(" ").length.toLong).max
      admittedBySrc.foreach { case (src, t) =>
        assert(t <= finalAlloc(src) + 2 * maxDoc,
          s"$src admitted $t vs alloc ${finalAlloc(src)}")
      }
    } finally q.stop()
  }
}
