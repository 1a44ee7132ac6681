package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Source/sink wiring (SURVEY.md §2.1/§2.2 S1-S6, G4).
  *
  * The reference's consume loop (kafka_consumer.py:49-107) becomes a
  * declarative source; its manual offset commit coupled to DB flush
  * (S4, aggregation_service.py:157-158) is subsumed by Structured
  * Streaming checkpointing + the idempotent sink (graft.streaming).
  */
object Sources {

  /** Wire schema of the reference's UserActivityEvent
    * (utils/domain/events.py:41-52; FIXTURES.md §1).
    */
  val userActivityEventSchema: StructType = StructType(Seq(
    StructField("event_id", StringType, nullable = false),
    StructField("user_id", StringType, nullable = false),
    StructField("event_type", StringType, nullable = false),
    StructField("timestamp", StringType, nullable = false),
    StructField("session_id", StringType, nullable = false),
    StructField("page_url", StringType, nullable = true),
    StructField("duration_ms", LongType, nullable = true),
    StructField("metadata", MapType(StringType, StringType), nullable = true)))

  /** Harness `events` wire schema (TESTDATA.md), for JSON-line ingestion. */
  val harnessEventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType, nullable = false),
    StructField("ts", TimestampType, nullable = false),
    StructField("user_id", LongType, nullable = false),
    StructField("event_type", StringType, nullable = false),
    StructField("value", DoubleType, nullable = true),
    StructField("props", StringType, nullable = true)))

  /** S2+S3 — JSON deserialize with permissive bad-record handling: corrupt
    * payloads parse to null, are counted via an observable metric (the
    * reference's error counter, kafka_consumer.py:85-107), and dropped.
    */
  def parseJsonEvents(raw: DataFrame, schema: StructType = harnessEventSchema): DataFrame = {
    // PERMISSIVE from_json yields a struct of all-null fields (not a null
    // struct) on corrupt input — detect via a required field.
    val corrupt = col("e").isNull || col(s"e.${schema.head.name}").isNull
    raw
      .select(from_json(col("value").cast("string"), schema).as("e"))
      .observe("json_parse", count(when(corrupt, 1)).as("corrupt_records"))
      .filter(!corrupt)
      .select(col("e.*"))
  }

  /** S2/S3 CSV variant — `from_csv` deserialize with the same permissive
    * bad-record contract as [[parseJsonEvents]]: malformed lines parse to
    * a null required field, are counted via observe(), and dropped. CSV
    * is the other wire format a batch ingest edge actually sees; the
    * parse is a codegen'd expression, no RDD hop.
    */
  def parseCsvEvents(raw: DataFrame, schema: StructType): DataFrame = {
    val corrupt = col("e").isNull || col(s"e.${schema.head.name}").isNull
    raw
      .select(from_csv(col("value").cast("string"), schema,
        Map("mode" -> "PERMISSIVE")).as("e"))
      .observe("csv_parse", count(when(corrupt, 1)).as("corrupt_records"))
      .filter(!corrupt)
      .select(col("e.*"))
  }

  /** S1 — Kafka streaming source (earliest offsets, like the reference's
    * `auto.offset.reset=earliest`). Requires the spark-sql-kafka connector
    * on the cluster classpath (not present in this harness — wiring is
    * compile-checked only; the parse stage it feeds is tested via
    * [[parseJsonEvents]]).
    */
  def kafkaEventStream(spark: SparkSession, brokers: String, topic: String): DataFrame =
    parseJsonEvents(
      spark.readStream
        .format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topic)
        .option("startingOffsets", "earliest")
        .load())

  /** G4 — Kafka publish keyed by user_id (partition-by-user like
    * kafka_publisher.py:71-85). Same classpath caveat as the source.
    */
  def toKafkaSink(events: DataFrame, brokers: String, topic: String): Unit =
    events
      .selectExpr("CAST(user_id AS STRING) AS key", "to_json(struct(*)) AS value")
      .write
      .format("kafka")
      .option("kafka.bootstrap.servers", brokers)
      .option("topic", topic)
      .save()

  /** JSON-lines file source for the harness event schema (batch analogue of
    * the Kafka value stream — same schema, same permissive parse contract
    * via [[parseJsonEvents]] when wrapped).
    */
  def eventsFromJsonl(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(harnessEventSchema).json(path)

  /** ORC round-trip support: the engine is format-agnostic — any columnar
    * source with the events schema feeds the same operators.
    */
  def eventsFromOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** S6 — relational read of a served aggregate table over JDBC (the
    * reference's pooled Postgres reads, api/src/infrastructure/database.py).
    * Partitioned read so a large table scans in parallel.
    */
  def jdbcTable(
      spark: SparkSession, url: String, table: String,
      partitionColumn: String, lower: Long, upper: Long,
      numPartitions: Int = 8): DataFrame =
    spark.read
      .format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("partitionColumn", partitionColumn)
      .option("lowerBound", lower)
      .option("upperBound", upper)
      .option("numPartitions", numPartitions)
      .load()
}
