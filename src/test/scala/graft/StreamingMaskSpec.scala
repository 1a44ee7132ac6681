package graft

import graft.operators.SpanDedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

final case class MaskDoc(doc_id: Long, text: String)

/** The span-mask rewrite is a stateless per-row projection (the gate is
  * a pure (doc_id, pos) function), so the IDENTICAL operator code must
  * run under Structured Streaming and emit the same rows regardless of
  * how arrivals are batched. This spec streams
  * [[SpanDedup.spanMaskProjection]] itself — not a re-spelling — over
  * two arrival batches and compares with the batch operator.
  */
class StreamingMaskSpec extends SparkTestBase {
  import spark.implicits._

  test("streaming spanMaskProjection matches batch spanMaskApply exactly") {
    implicit val sqlCtx = spark.sqlContext
    val docs = (0L until 60L).map { i =>
      MaskDoc(i, (1 to (5 + (i % 37)).toInt).map(j => s"w${(i + j) % 11}")
        .mkString(" "))
    }
    val batch = SpanDedup.spanMaskApply(docs.toDF()).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap

    val mem = MemoryStream[MaskDoc]
    mem.addData(docs.take(25): _*)
    val q = SpanDedup.spanMaskProjection(mem.toDF())
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("mask_stream_out")
      .start()
    try {
      q.processAllAvailable()
      mem.addData(docs.drop(25): _*)
      q.processAllAvailable()
      val streamed = spark.table("mask_stream_out").collect()
        .map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
      assert(streamed.size == docs.size)
      assert(streamed == batch)
      // the rewrite actually masked something in this fixture
      assert(batch.values.exists(_._2 > 0L))
    } finally q.stop()
  }
}
