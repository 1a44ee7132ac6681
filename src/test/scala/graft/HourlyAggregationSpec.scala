package graft

import graft.operators.HourlyAggregation
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class HourlyAggregationSpec extends SparkTestBase {
  import spark.implicits._

  test("events parquet (ns timestamps) loads with a usable timestamp column") {
    val ev = Tables.events(spark, sf)
    assert(ev.schema("ts").dataType.typeName.startsWith("timestamp"))
    assert(ev.count() == 1000)
    val hours = ev.select(date_trunc("hour", col("ts"))).distinct().count()
    assert(hours > 10)
  }

  test("flagship hourly aggregation: counts reconcile with raw events") {
    val ev = Tables.events(spark, sf)
    val agg = HourlyAggregation(ev)
    assert(agg.agg(sum("event_count")).as[Long].head == 1000L)
    // distinct users per window never exceed event count
    assert(agg.filter(col("unique_user_count") > col("event_count")).count() == 0)
    // window boundaries are exactly one hour apart and hour-aligned
    val misaligned = agg.filter(
      unix_timestamp(col("window_end")) - unix_timestamp(col("window_start")) =!= 3600 ||
      minute(col("window_start")) =!= 0 || second(col("window_start")) =!= 0)
    assert(misaligned.count() == 0)
  }

  test("hour-boundary event lands in its own hour; avg null on all-null group") {
    val df = Seq(
      (1L, Timestamp.valueOf("2024-01-01 10:00:00"), 1L, "click", Some(2.0)),
      (2L, Timestamp.valueOf("2024-01-01 10:59:59"), 2L, "click", None),
      (3L, Timestamp.valueOf("2024-01-01 11:00:00"), 1L, "view", None)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val agg = HourlyAggregation(df).orderBy("window_start", "event_type").collect()
    assert(agg.length == 2)
    val first = agg(0)
    assert(first.getAs[Timestamp]("window_start") == Timestamp.valueOf("2024-01-01 10:00:00"))
    assert(first.getAs[Long]("event_count") == 2L)
    assert(first.getAs[Long]("unique_user_count") == 2L)
    assert(first.getAs[Double]("total_value") == 2.0)
    // all-null value group: sum and avg are both NULL (SQL semantics,
    // matching the reference's avg-None-on-empty, aggregation.py:31-36)
    val second = agg(1)
    assert(second.isNullAt(second.fieldIndex("avg_value")))
    assert(second.isNullAt(second.fieldIndex("total_value")))
  }
}
