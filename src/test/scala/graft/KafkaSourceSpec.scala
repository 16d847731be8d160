package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.sources.KafkaSource

/** Kafka topic-as-table wiring (SURVEY §2.1 — presto-kafka
  * KafkaRecordSet.java + KafkaInternalFieldDescription.java). No broker or
  * spark-sql-kafka jar exists in this container, so the LIVE `.load()`
  * path is untested here; these tests pin everything below it: the decode
  * plumbing over the connector's documented wire schema (synthesized
  * exactly — `KafkaSource.wireSchema`), the internal-column mapping, and
  * the fail-fast broker gate.
  */
class KafkaSourceSpec extends AnyFunSuite {
  import TestSession._

  private def wireDf(payloads: Seq[String]) = {
    val rows = payloads.zipWithIndex.map { case (v, i) =>
      Row("k" + i, v.getBytes("UTF-8"), "t", 0, i.toLong,
        java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 0)
    }
    // key arrives binary on the wire
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r =>
        Row(r.getString(0).getBytes("UTF-8"), r.get(1), r.get(2), r.get(3),
          r.get(4), r.get(5), r.get(6)))),
      KafkaSource.wireSchema)
  }

  test("json decode over the wire schema: typed columns + internal columns") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType)))
    val out = KafkaSource.decode(
      wireDf(Seq("""{"id":1,"name":"a"}""", """{"id":2,"name":"b"}""",
        "not-json")),
      schema, "json")
    assert(out.schema.fieldNames.toSet == Set("id", "name", "_partition_id",
      "_partition_offset", "_message", "_key", "_timestamp"))
    val rows = out.orderBy("_partition_offset").collect()
    assert(rows.map(r => Option(r.getAs[Any]("id"))).toSeq ==
      Seq(Some(1L), Some(2L), None)) // malformed row → nulls (lenient mode)
    assert(rows(0).getAs[String]("_key") == "k0")
    assert(rows(2).getAs[String]("_message") == "not-json")
    assert(rows.map(_.getAs[Long]("_partition_offset")).toSeq == Seq(0L, 1L, 2L))
  }

  test("csv decode positional mapping") {
    val schema = StructType(Seq(
      StructField("id", IntegerType), StructField("qty", DoubleType)))
    val out = KafkaSource.decode(wireDf(Seq("7,1.5", "8,2.25")), schema, "csv")
    val rows = out.orderBy("_partition_offset").collect()
    assert(rows.map(r => (r.getAs[Int]("id"), r.getAs[Double]("qty"))).toSeq ==
      Seq((7, 1.5), (8, 2.25)))
  }

  test("decode fuses into the scan-side projection (no shuffle, no UDF)") {
    val schema = StructType(Seq(StructField("id", LongType)))
    val out = KafkaSource.decode(wireDf(Seq("""{"id":1}""")), schema, "json")
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("table() without a broker conf fails fast with the gating message") {
    val ex = intercept[IllegalStateException] {
      KafkaSource.table(spark, "topic",
        StructType(Seq(StructField("id", LongType))))
    }
    assert(ex.getMessage.contains(KafkaSource.BROKERS_KEY))
  }

  test("payload fields that reuse wire-column names decode cleanly") {
    // A JSON payload with fields literally named "value" and "timestamp":
    // internal columns are computed from the wire BEFORE decoding, the
    // payload fields replace the wire columns in place, and nothing is
    // silently dropped or corrupted mid-decode.
    val schema = StructType(Seq(
      StructField("value", StringType), StructField("timestamp", LongType),
      StructField("id", LongType)))
    val out = KafkaSource.decode(
      wireDf(Seq("""{"value":"v0","timestamp":42,"id":1}""",
        """{"value":"v1","timestamp":43,"id":2}""")),
      schema, "json")
    assert(out.schema.fieldNames.toSet == Set("value", "timestamp", "id",
      "_partition_id", "_partition_offset", "_message", "_key", "_timestamp"))
    val rows = out.orderBy("_partition_offset").collect()
    assert(rows.map(_.getAs[String]("value")).toSeq == Seq("v0", "v1"))
    assert(rows.map(_.getAs[Long]("timestamp")).toSeq == Seq(42L, 43L))
    assert(rows.map(_.getAs[Long]("id")).toSeq == Seq(1L, 2L))
    // internal columns still carry the Kafka metadata, not payload data
    assert(rows(0).getAs[String]("_key") == "k0")
    assert(rows(0).getAs[java.sql.Timestamp]("_timestamp") ==
      java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))
    assert(rows(1).getAs[String]("_message").contains("\"v1\""))
  }

  test("payload schema shadowing an internal _-column is rejected") {
    val ex = intercept[IllegalArgumentException] {
      KafkaSource.decode(wireDf(Seq("{}")),
        StructType(Seq(StructField("_timestamp", LongType))), "json")
    }
    assert(ex.getMessage.contains("_timestamp"))
  }

  test("unknown decoder name is rejected") {
    val ex = intercept[IllegalArgumentException] {
      KafkaSource.decode(wireDf(Seq("x")), StructType(Nil), "avro")
    }
    assert(ex.getMessage.contains("avro"))
  }
}
