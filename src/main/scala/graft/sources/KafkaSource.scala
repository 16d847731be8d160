package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Topic-as-table over Kafka — the reference's Kafka connector surface
  * (presto-kafka/src/main/java/com/facebook/presto/kafka/KafkaRecordSet.java:
  * each message row carries the decoded payload columns plus the internal
  * columns `_partition_id`, `_partition_offset`, `_message`, `_key`,
  * `_timestamp` — KafkaInternalFieldDescription.java).
  *
  * Spark-first: the batch path is `spark.read.format("kafka")` with
  * `startingOffsets=earliest`/`endingOffsets=latest` (a BOUNDED scan — the
  * same topic-as-table semantics the reference's cursor gives a query), the
  * stream path is `spark.readStream` over the same options; both feed the
  * payload through [[RecordDecoder]], so decoding fuses into
  * WholeStageCodegen above the source scan. At 100 TB posture the Kafka
  * source parallelizes by topic partition (one Spark task per partition
  * range), which is exactly the reference's split model
  * (KafkaSplitManager.java: one split per partition segment).
  *
  * Gating: the broker list comes from `spark.graft.kafka.bootstrapServers`
  * — absent, the path fails fast with a clear message instead of a
  * ClassNotFound deep in DataSource resolution. THIS SANDBOX HAS NO BROKER
  * AND NO spark-sql-kafka JAR, so the live `.load()` path is untested here;
  * the decode plumbing below it (wire schema → typed columns, internal
  * column mapping) is spec-verified offline on the connector's documented
  * output schema (KafkaSourceSpec).
  */
object KafkaSource {
  val BROKERS_KEY = "spark.graft.kafka.bootstrapServers"

  /** The Kafka connector's fixed output schema (spark-sql-kafka docs) —
    * what `.load()` produces and what [[decode]] consumes. Synthesizable
    * in tests without a broker. */
  val wireSchema: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType)))

  private def brokers(spark: SparkSession): String =
    spark.conf.getOption(BROKERS_KEY).getOrElse(throw new IllegalStateException(
      s"Kafka source requires $BROKERS_KEY (no broker configured; " +
        "this environment has no live Kafka — the decode path is " +
        "spec-verified offline, see KafkaSourceSpec)"))

  private def reader(spark: SparkSession, topic: String) =
    spark.read.format("kafka")
      .option("kafka.bootstrap.servers", brokers(spark))
      .option("subscribe", topic)
      .option("startingOffsets", "earliest")
      .option("endingOffsets", "latest")

  /** Bounded topic-as-table read: full topic → decoded rows. */
  def table(spark: SparkSession, topic: String, schema: StructType,
      format: String = "json", csvDelimiter: String = ","): DataFrame =
    decode(reader(spark, topic).load(), schema, format, csvDelimiter)

  /** Unbounded (Structured Streaming) variant of [[table]]. */
  def stream(spark: SparkSession, topic: String, schema: StructType,
      format: String = "json", csvDelimiter: String = ","): DataFrame =
    decode(
      spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers(spark))
        .option("subscribe", topic)
        .option("startingOffsets", "earliest")
        .load(),
      schema, format, csvDelimiter)

  /** Wire rows → decoded payload columns + the reference's internal
    * columns. Pure projections — works identically on the live connector
    * output and on a synthesized wire-schema DataFrame (the spec path). */
  def decode(wire: DataFrame, schema: StructType, format: String = "json",
      csvDelimiter: String = ","): DataFrame = {
    val internalNames = Seq("_partition_id", "_partition_offset", "_message",
      "_key", "_timestamp")
    val shadowed = schema.fieldNames.toSet & internalNames.toSet
    require(shadowed.isEmpty,
      s"payload schema shadows Kafka internal column(s) ${shadowed.mkString(", ")} " +
        "(KafkaInternalFieldDescription names are reserved)")
    // Internal columns FIRST, from the wire columns — decoding afterwards
    // means a payload field that reuses a wire name (e.g. "value",
    // "timestamp") replaces the wire column without corrupting the
    // metadata, and survives the wire-column drop below.
    val withInternal = wire // KafkaInternalFieldDescription.java names
      .withColumn("_partition_id", col("partition"))
      .withColumn("_partition_offset", col("offset"))
      .withColumn("_message", col("value").cast("string"))
      .withColumn("_key", col("key").cast("string"))
      .withColumn("_timestamp", col("timestamp"))
    val decoded = format match {
      case "json" => RecordDecoder.json(withInternal, "value", schema)
      case "csv" => RecordDecoder.csv(withInternal, "value", schema, csvDelimiter)
      case "raw" => withInternal // raw layouts go through RecordDecoder.raw directly
      case other => throw new IllegalArgumentException(
        s"unknown decoder '$other' (json|csv|raw)")
    }
    // Drop only the wire columns the payload did NOT redefine.
    val keep = schema.fieldNames.toSet
    val wireLeftovers = wireSchema.fieldNames.filterNot(keep.contains)
    decoded.drop(wireLeftovers: _*)
  }
}
