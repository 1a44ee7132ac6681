package graft

import graft.operators.HourlyAggregation
import graft.queries.ReadQueries
import graft.sources.Sources
import org.apache.spark.sql.functions._

/** Format interop, SQL surface, and empty-input edge cases. */
class InteropEdgeSpec extends SparkTestBase {
  import spark.implicits._

  test("format interop: events survive parquet -> jsonl -> orc round trips") {
    val root = java.nio.file.Files.createTempDirectory("graft_fmt").toFile
    val ev = Tables.events(spark, sf)

    val jsonl = new java.io.File(root, "ev.jsonl").getAbsolutePath
    ev.write.json(jsonl)
    val fromJson = Sources.eventsFromJsonl(spark, jsonl)
    assert(fromJson.count() == 1000)
    // aggregation over the round-tripped frame matches the original
    val a = HourlyAggregation(ev).orderBy("window_start", "event_type").collect()
    val b = HourlyAggregation(fromJson).orderBy("window_start", "event_type").collect()
    assert(a.sameElements(b))

    val orc = new java.io.File(root, "ev.orc").getAbsolutePath
    ev.write.orc(orc)
    val fromOrc = Sources.eventsFromOrc(spark, orc)
    val c = HourlyAggregation(fromOrc).orderBy("window_start", "event_type").collect()
    assert(a.sameElements(c))
  }

  test("SQL surface: registered views + native functions answer spark.sql") {
    GraftSql.registerViews(spark, sf)
    val rows = spark.sql(
      "SELECT event_type, sum(event_count) AS n FROM hourly_aggregations GROUP BY 1")
      .collect()
    assert(rows.map(_.getAs[Long]("n")).sum == 1000L)
    val fp = spark.sql("SELECT rolling_hash(text) AS h FROM documents LIMIT 3").collect()
    assert(fp.forall(!_.isNullAt(0)))
    val sim = spark.sql(
      """SELECT cosine_sim(CAST(embedding AS ARRAY<DOUBLE>),
        |                  CAST(embedding AS ARRAY<DOUBLE>)) AS s
        |FROM embeddings LIMIT 3""".stripMargin).collect()
    assert(sim.forall(r => math.abs(r.getDouble(0) - 1.0) < 1e-12))
  }

  test("empty input: aggregations and read queries yield empty, not errors") {
    val empty = Tables.events(spark, sf).filter(lit(false))
    val agg = HourlyAggregation(empty)
    assert(agg.isEmpty)
    assert(ReadQueries.getStats(agg).isEmpty)
    assert(ReadQueries.getEventTypes(agg).isEmpty)
    assert(ReadQueries.getAggregations(agg).isEmpty)
    // memory status over empty state: one row of nulls/zero count
    val status = ReadQueries.memoryStatus(agg).collect()
    assert(status.length == 1)
    assert(status.head.getAs[Long]("active_window_count") == 0L)
  }
}
