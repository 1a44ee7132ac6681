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

  /** ANSI SQL type for a Spark column — used to CAST the bind parameters
    * inside the generated MERGE (Derby rejects untyped ? in several MERGE
    * positions; the casts also pin the comparison types on any backend).
    */
  private def ansiType(dt: DataType): String = dt match {
    case LongType => "BIGINT"
    case IntegerType => "INTEGER"
    case ShortType => "SMALLINT"
    case DoubleType => "DOUBLE"
    case FloatType => "REAL"
    case BooleanType => "BOOLEAN"
    case TimestampType => "TIMESTAMP"
    case DateType => "DATE"
    case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
    case StringType => "VARCHAR(32672)"
    case other =>
      throw new IllegalArgumentException(s"upsertJdbc: unsupported type $other")
  }

  private def jdbcTypeCode(dt: DataType): Int = dt match {
    case LongType => java.sql.Types.BIGINT
    case IntegerType => java.sql.Types.INTEGER
    case ShortType => java.sql.Types.SMALLINT
    case DoubleType => java.sql.Types.DOUBLE
    case FloatType => java.sql.Types.REAL
    case BooleanType => java.sql.Types.BOOLEAN
    case TimestampType => java.sql.Types.TIMESTAMP
    case DateType => java.sql.Types.DATE
    case _: DecimalType => java.sql.Types.DECIMAL
    case _ => java.sql.Types.VARCHAR
  }

  /** Write-side SQL upsert over JDBC — the relational twin of the
    * reference's `INSERT ... ON CONFLICT (window_start, event_type)
    * DO UPDATE SET col = EXCLUDED.col`
    * (processor/src/infrastructure/queries/upsert_aggregation.sql:1-19),
    * spelled as ANSI `MERGE` so it runs on any standard backend (the
    * spec executes it against embedded Derby; on Postgres the same
    * statement works verbatim from PG 15, or swap the per-row SQL for
    * the native ON CONFLICT form — the plumbing is identical).
    *
    * Distributed shape: each DataFrame partition opens its own
    * connection and executes the parameterized one-row MERGE via JDBC
    * batching (`addBatch`/`executeBatch` every `batchSize` rows), with
    * ONE commit per partition — at 1000 executors this is the standard
    * fan-in write, bounded by the DB, not by Spark. The commit placement
    * reproduces the reference's S4 offset⇄flush coupling: under
    * foreachBatch the streaming checkpoint only advances after every
    * partition commits, and a replayed micro-batch re-MERGEs the same
    * keyed aggregates to the same final state (idempotent at-least-once;
    * replay spec in SourcesObsSpec).
    *
    * Caller contract: `df` is keyed-unique on `keyCols` (true of any
    * groupBy aggregate — the only caller shape), so MERGE order across
    * partitions cannot matter.
    */
  def upsertJdbc(
      df: DataFrame, url: String, table: String,
      keyCols: Seq[String], batchSize: Int = 500): Unit = {
    val schema = df.schema
    require(keyCols.nonEmpty && keyCols.forall(schema.fieldNames.contains),
      s"upsertJdbc: keyCols $keyCols must be columns of ${schema.fieldNames.toSeq}")
    val keys = schema.fields.filter(f => keyCols.contains(f.name)).toSeq
    val nonKeys = schema.fields.filterNot(f => keyCols.contains(f.name)).toSeq
    require(nonKeys.nonEmpty, "upsertJdbc: need at least one non-key column")
    val all = keys ++ nonKeys
    def cast(f: StructField) = s"CAST(? AS ${ansiType(f.dataType)})"
    // one-row MERGE against the standard 1-row dummy (present in Derby
    // and DB2; on engines without it, `(VALUES (1)) AS dual(x)` works)
    val sql =
      s"""MERGE INTO $table t USING SYSIBM.SYSDUMMY1
         |ON ${keys.map(f => s"t.${f.name} = ${cast(f)}").mkString(" AND ")}
         |WHEN MATCHED THEN UPDATE SET
         |  ${nonKeys.map(f => s"${f.name} = ${cast(f)}").mkString(", ")}
         |WHEN NOT MATCHED THEN INSERT (${all.map(_.name).mkString(", ")})
         |VALUES (${all.map(cast).mkString(", ")})""".stripMargin
    // parameter layout per row: keys (ON), nonKeys (UPDATE), all (INSERT)
    val paramFields = (keys ++ nonKeys ++ all).toArray
    val paramIdx = paramFields.map(f => schema.fieldIndex(f.name))
    val typeCodes = paramFields.map(f => jdbcTypeCode(f.dataType))
    df.foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
      if (rows.nonEmpty) {
        val conn = java.sql.DriverManager.getConnection(url)
        try {
          conn.setAutoCommit(false)
          val ps = conn.prepareStatement(sql)
          var pending = 0
          rows.foreach { row =>
            var i = 0
            while (i < paramIdx.length) {
              val v = row.get(paramIdx(i))
              if (v == null) ps.setNull(i + 1, typeCodes(i))
              else ps.setObject(i + 1, v)
              i += 1
            }
            ps.addBatch()
            pending += 1
            if (pending >= batchSize) { ps.executeBatch(); pending = 0 }
          }
          if (pending > 0) ps.executeBatch()
          ps.close()
          conn.commit() // the flush the checkpoint advance is coupled to
        } finally conn.close()
      }
    }
  }
}
