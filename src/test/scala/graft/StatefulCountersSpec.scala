package graft

import graft.streaming.StatefulCounters
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** transformWithState running counters: changelog semantics per batch and
  * cross-batch parity with the batch aggregate. transformWithState only
  * runs on the RocksDB provider (Spark enforces it) — the fixture pins
  * that wiring and restores the session conf after.
  */
class StatefulCountersSpec extends SparkTestBase {
  import spark.implicits._

  test("running counters: per-batch changelog; final state == batch groupBy") {
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val saved = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val mem = MemoryStream[(Long, String, Long)]
    val q = StatefulCounters.runningCounts(spark, mem.toDS())
      .writeStream.outputMode("update").format("memory")
      .queryName("tws_counts").start()
    try {
      mem.addData((1L, "click", 100L), (1L, "click", 50L), (2L, "view", 10L))
      q.processAllAvailable()
      val b1 = spark.table("tws_counts").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      // batch-local fold: ONE row per touched (user, type), already summed
      assert(b1.toSet == Set((1L, "click", 2L, 150L), (2L, "view", 1L, 10L)))

      mem.addData((1L, "click", 25L), (1L, "view", 7L))
      q.processAllAvailable()
      val all = spark.table("tws_counts").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      // batch 2 changelog: only user 1's touched types, with RUNNING totals
      val b2 = all.diff(b1)
      assert(b2.toSet == Set((1L, "click", 3L, 175L), (1L, "view", 1L, 7L)))

      mem.addData((2L, "view", 90L))
      q.processAllAvailable()
      // latest row per (user, type) == the batch aggregate of all input
      val latest = spark.table("tws_counts").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
        .zipWithIndex
        .groupBy { case ((u, t, _, _), _) => (u, t) }
        .map { case (_, rows) => rows.maxBy(_._2)._1 }
        .toSet
      assert(latest == Set(
        (1L, "click", 3L, 175L), (1L, "view", 1L, 7L), (2L, "view", 2L, 100L)))
    } finally {
      q.stop()
      saved match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }
}
