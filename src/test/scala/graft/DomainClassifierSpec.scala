package graft

import graft.operators.DomainClassifier
import org.apache.spark.sql.functions._

/** Multi-class (one-vs-rest) domain classifier: planted-class recovery,
  * teacher tie rules, zero-support head exclusion, order invariance.
  */
class DomainClassifierSpec extends SparkTestBase {
  import spark.implicits._

  private def planted: Seq[(Long, String, String)] =
    (0L until 80L).map { i =>
      val k = (i % 4).toInt
      val core = DomainClassifier.Groups(k).mkString(" ")
      (i, s"$core $core filler$i", s"src$k")
    }

  test("planted one-group-per-class corpus is recovered exactly") {
    val docs = planted.toDF("doc_id", "text", "source")
    val conf = DomainClassifier.confusion(docs).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    val n = conf.map(_._3).sum
    val diag = conf.filter(c => c._1 == c._2).map(_._3).sum
    assert(n == 80L)
    assert(diag == n, s"accuracy ${diag.toDouble / n}: $conf")
  }

  test("teacher ties break to the lowest class; no-hit and null docs to class 0") {
    val docs = Seq(
      (1L, "row stream", "s"),          // tie c0 = c1 = 1 -> 0
      (2L, "stream customer", "s"),     // tie c1 = c2 -> 1
      (3L, "filler words only", "s"),   // no hits -> 0
      (4L, null.asInstanceOf[String], "s"), // null -> 0
      (5L, "key hash vector", "s")      // pure class 3
    ).toDF("doc_id", "text", "source")
    val y = DomainClassifier.featureFrame(docs).select(col("doc_id"), col("y"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(y == Map(1L -> 0, 2L -> 1, 3L -> 0, 4L -> 0, 5L -> 3))
  }

  test("zero-support heads are never predicted") {
    // corpus containing only classes 0 and 1: heads 2/3 have sy = 0 and
    // must be excluded from the argmax even when their (untrained,
    // prior-0) adjusted score would win
    val docs = (0L until 40L).map { i =>
      val k = (i % 2).toInt
      (i, DomainClassifier.Groups(k).mkString(" ") + s" filler$i", "s")
    }.toDF("doc_id", "text", "source")
    val conf = DomainClassifier.confusion(docs).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    assert(conf.forall(c => c._2 == 0 || c._2 == 1), conf.mkString(","))
    assert(conf.map(_._3).sum == 40L)
  }

  test("weights are order-invariant (exact sums)") {
    val docs = planted.toDF("doc_id", "text", "source")
    val a = DomainClassifier.fit(docs, iters = 3)
    val b = DomainClassifier.fit(
      docs.repartition(7, col("doc_id")).sortWithinPartitions(col("text")),
      iters = 3)
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
  }

  test("corpus run beats the majority baseline (4-class)") {
    val docs = Tables.documents(spark, sf)
    val conf = DomainClassifier.confusion(docs).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    val n = conf.map(_._3).sum
    val diag = conf.filter(c => c._1 == c._2).map(_._3).sum
    val majority = conf.groupBy(_._1).view.mapValues(_.map(_._3).sum)
      .values.max
    assert(diag.toDouble / n > majority.toDouble / n + 0.10,
      s"acc ${diag.toDouble / n} vs majority ${majority.toDouble / n}")
  }
}
