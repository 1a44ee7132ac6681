package graft

import graft.operators.{Layout, Sessionize}
import graft.streaming.StatefulSessionize
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class LayoutStatefulSpec extends SparkTestBase {
  import spark.implicits._

  test("bucketed tables join and aggregate with no exchange") {
    val ev = Tables.events(spark, sf).select("event_id", "ts", "user_id", "event_type", "value")
    val cust = Tables.customer(spark, sf)
      .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
    Layout.writeBucketed(ev, "ev_bucketed", "user_id", 8)
    Layout.writeBucketed(cust, "cust_bucketed", "user_id", 8)
    // Disable broadcast so the alternative to bucketing would be a shuffle
    // (with a broadcastable dim the planner rightly prefers broadcast and
    // skips the bucketed scan — also correct, but not what we're testing).
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Layout.bucketedJoin(spark, "ev_bucketed", "cust_bucketed", "user_id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join should not shuffle:\n$plan")
      assert(plan.contains("Bucketed: true"), plan)
      assert(joined.count() == 1000)
      // aggregation on the bucket key also avoids the shuffle
      val agg = spark.table("ev_bucketed").groupBy("user_id").agg(sum("value"))
      val aggPlan = agg.queryExecution.executedPlan.toString
      assert(!aggPlan.contains("Exchange hashpartitioning"), aggPlan)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("partitioned write gives partition pruning on read") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toFile.getAbsolutePath
    Layout.writePartitionedByDay(Tables.events(spark, sf), dir)
    val day = Layout.readDay(spark, dir, "2024-01-05")
    val scan = day.queryExecution.executedPlan.collectLeaves().map(_.toString).mkString
    assert(scan.contains("PartitionFilters") && scan.contains("event_date"), scan)
    val total = spark.read.parquet(dir).count()
    assert(day.count() > 0 && day.count() < total)
    // pruned scan reads only the one matching directory
    val prunedFiles = day.queryExecution.executedPlan.collectLeaves()
      .collect { case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.relation.location.listFiles(f.partitionFilters, f.dataFilters)
          .flatMap(_.files).size }.sum
    val dayDirs = new java.io.File(dir).listFiles().count(_.getName.startsWith("event_date="))
    assert(dayDirs == 30, s"expected 30 day dirs, got $dayDirs")
    val totalFiles = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("event_date="))
      .map(_.listFiles().count(_.getName.endsWith(".parquet"))).sum
    assert(prunedFiles > 0 && prunedFiles < totalFiles,
      s"pruned scan lists $prunedFiles of $totalFiles files")
  }

  test("zorderKey matches a reference bit interleave over the full 64x64 grid") {
    def ref(x: Long, y: Long, bits: Int): Long = {
      var z = 0L; var i = 0
      while (i < bits) {
        z |= ((x >> i) & 1L) << (2 * i)
        z |= ((y >> i) & 1L) << (2 * i + 1)
        i += 1
      }
      z
    }
    val rows = spark.range(4096).select(
        (col("id") % 64).as("x"), expr("id DIV 64").as("y"),
        Layout.zorderKey(col("id") % 64, expr("id DIV 64"), 6).as("z"))
      .collect()
    rows.foreach { r =>
      assert(r.getLong(2) == ref(r.getLong(0), r.getLong(1), 6),
        s"(${r.getLong(0)}, ${r.getLong(1)})")
    }
  }

  test("z-order layout prunes row groups on BOTH dimensions; 1-d sort on one") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    // two independent full-span dims (user_id spans only 0..14 at sf0.001)
    val ev = Tables.events(spark, sf).select(
      pmod(hash(col("event_id")), lit(1024)).cast("long").as("x"),
      (col("event_id") % 1024).as("y"))
    val zdir = java.nio.file.Files.createTempDirectory("graft_z").toFile.getAbsolutePath
    val ldir = java.nio.file.Files.createTempDirectory("graft_l").toFile.getAbsolutePath
    Layout.writeZOrdered(ev, zdir, "x", "y", bits = 10, numFiles = 16)
    ev.repartitionByRange(16, col("x")).sortWithinPartitions(col("x"))
      .write.mode("overwrite").parquet(ldir) // the 1-d baseline layout
    // decoded-row count = scan numOutputRows AFTER parquet row-group
    // min/max pruning (each file here is a single row group)
    def scanned(dir: String, cond: org.apache.spark.sql.Column): (Long, Long) = {
      val q = spark.read.parquet(dir).filter(cond)
      // run THIS QueryExecution (df.count() would build a new one and
      // leave these scan metrics untouched)
      val hits = q.queryExecution.toRdd.count()
      val decoded = q.queryExecution.executedPlan.collectLeaves().collect {
        case f: FileSourceScanExec => f.metrics("numOutputRows").value
      }.sum
      (hits, decoded)
    }
    val yBox = col("y").between(512, 575)
    val (zHits, zDecoded) = scanned(zdir, yBox)
    val (lHits, lDecoded) = scanned(ldir, yBox)
    assert(zHits == lHits && zHits > 0, "layouts must agree on the result")
    val total = spark.read.parquet(ldir).count()
    // y-filter: x-sorted layout has no y locality -> decodes everything;
    // z-order decodes only the tile band intersecting the y range
    assert(lDecoded == total, s"1-d layout should decode all $total, got $lDecoded")
    assert(zDecoded * 2 <= lDecoded,
      s"z-order should decode <= half the rows: $zDecoded vs $lDecoded")
    // x-filter still prunes fine on the z layout too (both-dims property)
    val (zx, zxDec) = scanned(zdir, col("x").between(32, 95))
    assert(zx > 0 && zxDec * 2 <= total,
      s"z-order x-filter should also prune: $zxDec of $total")
  }

  test("stateful sessionization matches the batch gap-sessionizer") {
    val ev = Tables.events(spark, sf)
    val typed = ev.select(col("user_id"), col("ts"), col("value"))
      .as[(Long, Timestamp, Double)]
    // batch mode: one "micro-batch" containing everything, then count the
    // still-open sessions from state as (last index) per user.
    val completed = StatefulSessionize.sessions(spark, typed).collect()
    val batchCounts = Sessionize.sessionStats(ev)
      .select("user_id", "session_count").as[(Long, Long)].collect().toMap
    // per user: completed sessions + the one still open == batch count
    val completedPerUser = completed.groupBy(_.user_id).view.mapValues(_.length.toLong).toMap
    batchCounts.foreach { case (u, n) =>
      assert(completedPerUser.getOrElse(u, 0L) == n - 1,
        s"user $u: completed=${completedPerUser.getOrElse(u, 0L)} batch=$n")
    }
  }

  test("stateful sessionization over a stream emits closed sessions incrementally") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Double)]
    val sessions = StatefulSessionize.sessions(spark, mem.toDS())
    val q = sessions.writeStream
      .outputMode("append")
      .format("memory")
      .queryName("stateful_sessions")
      .start()
    try {
      mem.addData((1L, Timestamp.valueOf("2024-01-01 10:00:00"), 1.0))
      mem.addData((1L, Timestamp.valueOf("2024-01-01 10:10:00"), 2.0))
      q.processAllAvailable()
      assert(spark.table("stateful_sessions").isEmpty) // session still open
      mem.addData((1L, Timestamp.valueOf("2024-01-01 12:00:00"), 5.0)) // gap > 30min
      q.processAllAvailable()
      val rows = spark.table("stateful_sessions").as[StatefulSessionize.CompletedSession].collect()
      assert(rows.length == 1)
      assert(rows.head.event_count == 2 && rows.head.value_sum == 3.0)
      assert(rows.head.session_end == Timestamp.valueOf("2024-01-01 10:10:00"))
    } finally q.stop()
  }
}
