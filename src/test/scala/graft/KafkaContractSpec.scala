package graft

import graft.sources.Sources
import org.apache.spark.sql.functions._

/** Broker-free contract tests for the Kafka edge (S1 consume / G4
  * publish): the producer record shape, round-trip losslessness at
  * row level, the permissive-parse drop path over producer output, and
  * the partition-by-key affinity the keyed publish exists for. The
  * transport itself (connector jars, a live broker) stays compile-only
  * in this sandbox — these pin every contract the library controls.
  */
class KafkaContractSpec extends SparkTestBase {

  private lazy val events = Tables.events(spark, sf)

  test("producer records: (key string, value string), key = user_id") {
    val rec = Sources.toKafkaRecords(events)
    assert(rec.schema.map(f => (f.name, f.dataType.typeName)) ==
      Seq(("key", "string"), ("value", "string")))
    val bad = rec
      .select(col("key"),
        get_json_object(col("value"), "$.user_id").as("uid"))
      .filter(col("key") =!= col("uid"))
      .count()
    assert(bad == 0)
  }

  test("serialize -> parse is the identity on every row and column") {
    val back = Sources.parseJsonEvents(Sources.toKafkaRecords(events))
    assert(back.schema == events.select(back.columns.map(col).toIndexedSeq: _*).schema)
    // EXCEPT over both orientations = empty iff multisets are equal.
    assert(back.exceptAll(events).isEmpty && events.exceptAll(back).isEmpty)
  }

  test("permissive parse drops corrupt producer-stream records, keeps the rest") {
    val n = events.count()
    val corrupt = spark.range(7).select(
      lit("x").as("key"), lit("{\"event_id\":").as("value"))
    val mixed = Sources.toKafkaRecords(events).unionByName(corrupt)
    assert(Sources.parseJsonEvents(mixed).count() == n)
  }

  test("consumer stays lenient for external producers: fraction/offset optional") {
    import spark.implicits._
    // Python isoformat() omits the fraction when microsecond == 0 and may
    // or may not carry an offset — neither form is corrupt, and neither
    // may silently null the timestamp (pinning a custom timestampFormat
    // on from_json would disable the fallback parser and do exactly that).
    val raw = Seq(
      """{"event_id":1,"ts":"2024-01-01T10:00:00","user_id":5,"event_type":"click","value":1.5,"props":null}""",
      """{"event_id":2,"ts":"2024-01-01T10:00:00+00:00","user_id":6,"event_type":"view","value":null,"props":"{}"}""",
      """{"event_id":3,"ts":"2024-01-01T10:00:00.123456Z","user_id":7,"event_type":"view","value":2.0,"props":null}""")
      .toDF("value")
    val parsed = Sources.parseJsonEvents(raw).collect()
    assert(parsed.length == 3)
    assert(parsed.forall(_.getAs[java.sql.Timestamp]("ts") != null))
    val micros = parsed.find(_.getAs[Long]("event_id") == 3).get
      .getAs[java.sql.Timestamp]("ts")
    assert(micros.getNanos == 123456000, s"micros lost: $micros")
  }

  test("keyed repartition gives each user exactly one partition (broker affinity)") {
    val parts = Sources.toKafkaRecords(events)
      .repartition(8, col("key"))
      .select(col("key"), spark_partition_id().as("p"))
      .groupBy(col("key")).agg(countDistinct(col("p")).as("np"))
      .agg(max(col("np"))).head().getLong(0)
    assert(parts == 1L)
  }
}
