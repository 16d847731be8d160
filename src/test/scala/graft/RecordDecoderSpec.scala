package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The presto-record-decoder surface: csv/json/raw payload decoders over a
  * Kafka-shaped frame (key/value/topic/partition/offset), round-tripped
  * against the rows the payloads were encoded from. */
class RecordDecoderSpec extends AnyFunSuite {
  import TestSession._
  import sources.RecordDecoder

  private val schema = StructType(Seq(
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType)))

  /** events rows wrapped as a Kafka-shaped topic frame with the payload
    * encoded by `enc`. */
  private def topicFrame(enc: org.apache.spark.sql.Column) =
    Tables.t(spark, sf, "events").limit(200)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      .select(col("event_id").cast("string").cast("binary").as("key"),
        enc.as("payload"),
        lit("events").as("topic"), spark_partition_id().as("partition"),
        col("event_id").as("offset"),
        col("user_id").as("orig_user"), col("event_type").as("orig_type"),
        col("value").as("orig_value"))

  test("json decoder recovers typed columns from the payload") {
    val df = topicFrame(to_json(struct(
      col("user_id"), col("event_type"), col("value"))))
    val decoded = RecordDecoder.json(df, "payload", schema)
    assert(decoded.filter(col("user_id") =!= col("orig_user") ||
      col("event_type") =!= col("orig_type") ||
      col("value") =!= col("orig_value")).count() == 0)
    assert(decoded.schema("user_id").dataType == LongType)
    // malformed payload → nulls, not failure (lenient reference mode)
    val bad = RecordDecoder.json(
      df.withColumn("payload", lit("{not json")), "payload", schema)
    assert(bad.filter(col("user_id").isNotNull).count() == 0)
  }

  test("csv decoder maps positional fields") {
    val df = topicFrame(concat_ws("|",
      col("user_id"), col("event_type"), col("value")))
    val decoded = RecordDecoder.csv(df, "payload", schema, delimiter = "|")
    assert(decoded.filter(col("user_id") =!= col("orig_user") ||
      col("event_type") =!= col("orig_type") ||
      col("value") =!= col("orig_value")).count() == 0)
  }

  test("raw decoder slices fixed-offset big-endian fields") {
    import graft.{functions => F}
    val enc = concat(F.to_big_endian_64(col("user_id")),
      F.to_big_endian_32(col("event_id").cast("int")))
    val df = topicFrame(enc)
    val decoded = RecordDecoder.raw(df, "payload",
      Seq(("raw_user", 0, 8), ("raw_event", 8, 4)))
    assert(decoded.filter(col("raw_user") =!= col("orig_user") ||
      col("raw_event") =!= col("offset").cast("int")).count() == 0)
    assert(decoded.schema("raw_user").dataType == LongType)
    assert(decoded.schema("raw_event").dataType == IntegerType)
  }
}
