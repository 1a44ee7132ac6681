package graft

import graft.operators.QualityClassifier
import org.apache.spark.sql.functions._

final case class QcDoc(doc_id: Long, text: String, source: String)

/** Trained quality classifier: planted-gate recovery, a full driver-side
  * exact-arithmetic differential reference of the training run, edge
  * rows (null text, single token), and order invariance.
  */
class QualityClassifierSpec extends SparkTestBase {
  import spark.implicits._

  private val Dim = 64
  private val S = 1000000L

  /** Pure-Scala reference of the ENTIRE fit — tokenize, hash, normalize,
    * GD with BigInt arithmetic — sharing NOTHING with the Spark
    * implementation but the spelled-out contract.
    */
  private def refFit(
      docs: Seq[(Long, String)], iters: Int, lr: Long): Array[Long] = {
    def fnv(s: String): Long =
      graft.functions.SimHash64.fnv1a(s.getBytes("UTF-8"))
    def pmod(x: Long, m: Long): Long = ((x % m) + m) % m
    val feats = docs.map { case (_, text) =>
      val v = Array.fill(Dim + 1)(0L)
      var y = 0L
      if (text != null) {
        val t = text.split(" ", -1)
        val grams = t.toSeq ++
          (if (t.length >= 2) (0 until t.length - 1).map(i => t(i) + " " + t(i + 1))
           else Seq.empty)
        val cnt = grams.groupBy(g => pmod(fnv(g), Dim)).view.mapValues(_.size)
        val tot = cnt.values.sum.toLong
        cnt.foreach { case (b, c) => v(b.toInt) = c.toLong * S / tot }
        val sm = t.count(QualityClassifier.StopTokens.contains)
        y = if (sm.toLong * QualityClassifier.ThreshDen >=
          QualityClassifier.ThreshNum * t.length) 1L else 0L
      }
      v(Dim) = S
      (y, v)
    }
    def sdiv(a: BigInt, b: BigInt): BigInt =
      if (a >= 0) a / b else -((-a) / b) // BigInt / truncates toward zero
    var w = Array.fill(Dim + 1)(0L)
    val n = BigInt(feats.size)
    for (_ <- 0 until iters) {
      val g = Array.fill(Dim + 1)(BigInt(0))
      feats.foreach { case (y, v) =>
        var z = 0L
        var i = 0
        while (i <= Dim) { z += v(i) * w(i); i += 1 }
        val yh = math.min(math.max(500000L + sdiv(z, 4000000L).toLong, 0L), S)
        val r = y * S - yh
        i = 0
        while (i <= Dim) { g(i) += BigInt(r) * v(i); i += 1 }
      }
      w = w.zipWithIndex.map { case (wi, i) =>
        wi + sdiv(BigInt(lr) * g(i), n * S).toLong
      }
    }
    w
  }

  private def plantedDocs: Seq[(Long, String, String)] = {
    // positives: stopword-heavy; negatives: zero stopword mass. Shared
    // content words keep the task non-trivial for the hashed features.
    (0L until 60L).map { i =>
      if (i % 2 == 0)
        (i, s"the data the pipeline the scan row$i", "hi")
      else
        (i, s"data pipeline scan shuffle batch row$i", "lo")
    }
  }

  test("planted stopword gate is recovered exactly (100% agreement)") {
    val docs = plantedDocs.toDF("doc_id", "text", "source")
    val conf = QualityClassifier.scoreConfusion(docs).collect()
    val (n, agree) = (conf.map(_.getLong(1)).sum, conf.map(_.getLong(4)).sum)
    assert(n == 60L)
    assert(agree == n, s"agreement $agree / $n")
    // and the two planted sources separate: hi all label-1, lo all label-0
    val bySrc = conf.map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(bySrc("hi") == 30L && bySrc("lo") == 0L)
  }

  test("fit equals the pure-Scala BigInt reference, weight for weight") {
    val raw = plantedDocs.map { case (id, t, _) => (id, t) } ++
      Seq((100L, null.asInstanceOf[String]), (101L, "solo")) // edge rows
    val docs = raw.map { case (id, t) => (id, t, "s") }
      .toDF("doc_id", "text", "source")
    val got = QualityClassifier.fit(docs, Dim, iters = 5, lr = 4L)
    val want = refFit(raw, iters = 5, lr = 4L)
    assert(got.toSeq == want.toSeq)
  }

  test("weights are order-invariant (exact sums: repartition changes nothing)") {
    val docs = plantedDocs.toDF("doc_id", "text", "source")
    val a = QualityClassifier.fit(docs, Dim, 3, 4L)
    val b = QualityClassifier.fit(
      docs.repartition(7, col("doc_id")).sortWithinPartitions(col("text")),
      Dim, 3, 4L)
    assert(a.toSeq == b.toSeq)
  }

  test("trainedWeights emits dim+1 rows with the bias last") {
    val docs = plantedDocs.toDF("doc_id", "text", "source")
    val w = QualityClassifier.trainedWeights(docs).collect()
    assert(w.length == Dim + 1)
    assert(w.map(_.getInt(0)).toSeq == (0 to Dim))
    // the bias exists and the stop-bucket weights moved off zero
    assert(w.exists(_.getLong(1) != 0L))
  }

  test("one-class corpora pin to the constant class (degenerate prior)") {
    // every doc passes the teacher gate: stopword-saturated corpus
    val allHi = (0L until 20L).map(i => (i, "the the the a", "s"))
      .toDF("doc_id", "text", "source")
    val hi = QualityClassifier.scoreConfusion(allHi).collect()
    assert(hi.map(_.getLong(2)).sum == 20L) // all labeled 1
    assert(hi.map(_.getLong(3)).sum == 20L, "all-positive corpus must predict 1")
    // no doc passes: zero stopword mass
    val allLo = (0L until 20L).map(i => (i, s"data pipeline row$i", "s"))
      .toDF("doc_id", "text", "source")
    val lo = QualityClassifier.scoreConfusion(allLo).collect()
    assert(lo.map(_.getLong(2)).sum == 0L)
    assert(lo.map(_.getLong(3)).sum == 0L, "all-negative corpus must predict 0")
  }

  test("row-local kernel margins == the batch featureFrame margins, doc for doc") {
    val docs = Tables.documents(spark, sf)
    val w = QualityClassifier.fit(docs, Dim, 3, 4L)
    val batch = QualityClassifier.scoreDocs(docs, Dim, 3, 4L)
      .select(col("doc_id"), col("z")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val kernel = QualityClassifier.scoreWith(docs, w, Dim).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(kernel == batch)
  }

  test("streaming gate == batch kernel over the same arrivals") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val w = QualityClassifier.fit(
      plantedDocs.toDF("doc_id", "text", "source"), Dim, 3, 4L)
    val arrivals = plantedDocs.map { case (id, t, s) => QcDoc(id + 1000, t, s) }
    val mem = MemoryStream[QcDoc]
    val q = QualityClassifier.scoreWith(mem.toDF(), w, Dim)
      .writeStream.outputMode("append").format("memory")
      .queryName("qc_stream_out").start()
    try {
      mem.addData(arrivals.take(10): _*)
      q.processAllAvailable()
      mem.addData(arrivals.drop(10): _*)
      q.processAllAvailable()
      val got = spark.table("qc_stream_out").collect()
        .map(r => (r.getLong(0), r.getLong(2), r.getInt(3))).toSet
      val batch = QualityClassifier.scoreWith(
        arrivals.toDF(), w, Dim).collect()
        .map(r => (r.getLong(0), r.getLong(2), r.getInt(3))).toSet
      assert(got == batch)
      assert(got.nonEmpty)
    } finally q.stop()
  }

  test("corpus run: learns past the base rate at sf (plans stay sane)") {
    val docs = Tables.documents(spark, sf)
    val conf = QualityClassifier.scoreConfusion(docs)
    val plan = conf.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    val rows = conf.collect()
    val n = rows.map(_.getLong(1)).sum
    val agree = rows.map(_.getLong(4)).sum
    val hi = rows.map(_.getLong(2)).sum
    val base = math.max(hi, n - hi).toDouble / n
    assert(agree.toDouble / n > base + 0.10,
      s"agreement ${agree.toDouble / n} vs base $base")
  }
}
