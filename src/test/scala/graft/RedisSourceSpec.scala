package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.sources.RedisSource

/** Redis topic-as-table wiring (SURVEY §2.1 — presto-redis
  * RedisRecordSet.java + RedisInternalFieldDescription.java). No Redis
  * server or client jar exists in this container, so the LIVE key-scan
  * path is gate-tested only; these tests pin everything below it: decode
  * over the connection-independent wire shape, the six internal columns,
  * and the reference's corruption semantics. */
class RedisSourceSpec extends AnyFunSuite {
  import TestSession._

  private def wireDf(rows: Seq[(String, String)]) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (k, v) => Row(k, v) }),
      RedisSource.wireSchema)

  test("json decode: typed payload columns + the six internal columns") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType)))
    val out = RedisSource.decode(
      wireDf(Seq(
        ("user:1", """{"id":1,"name":"a"}"""),
        ("user:2", """{"id":2,"name":"b"}"""))),
      schema, "json")
    assert(out.schema.fieldNames.toSet == Set("id", "name", "_key", "_value",
      "_key_length", "_value_length", "_key_corrupt", "_value_corrupt"))
    val rows = out.orderBy("_key").collect()
    assert(rows.map(_.getAs[Long]("id")).toSeq == Seq(1L, 2L))
    assert(rows.map(_.getAs[String]("name")).toSeq == Seq("a", "b"))
    assert(rows(0).getAs[String]("_key") == "user:1")
    assert(rows(0).getAs[Long]("_key_length") == 6L)
    assert(rows(0).getAs[Long]("_value_length") == 19L)
    assert(rows.forall(!_.getAs[Boolean]("_key_corrupt")))
    assert(rows.forall(!_.getAs[Boolean]("_value_corrupt")))
  }

  test("corrupt json payload: NULL payload columns, _value_corrupt=true") {
    val schema = StructType(Seq(StructField("id", LongType)))
    val out = RedisSource.decode(
      wireDf(Seq(("k1", """{"id":7}"""), ("k2", "not-json"))),
      schema, "json")
    val rows = out.orderBy("_key").collect()
    assert(Option(rows(0).getAs[Any]("id")) == Some(7L))
    assert(!rows(0).getAs[Boolean]("_value_corrupt"))
    assert(Option(rows(1).getAs[Any]("id")).isEmpty)
    assert(rows(1).getAs[Boolean]("_value_corrupt"))
    assert(rows(1).getAs[String]("_value") == "not-json")
  }

  test("csv decode maps positional fields") {
    val schema = StructType(Seq(
      StructField("id", IntegerType), StructField("qty", DoubleType)))
    val out = RedisSource.decode(wireDf(Seq(("a", "7,1.5"), ("b", "8,2.25"))),
      schema, "csv")
    val rows = out.orderBy("_key").collect()
    assert(rows.map(r => (r.getAs[Int]("id"), r.getAs[Double]("qty"))).toSeq ==
      Seq((7, 1.5), (8, 2.25)))
  }

  test("decode fuses into the scan-side projection (no shuffle)") {
    val schema = StructType(Seq(StructField("id", LongType)))
    val out = RedisSource.decode(wireDf(Seq(("k", """{"id":1}"""))), schema)
    assert(!out.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("live path fails fast with the gating message") {
    val ex = intercept[IllegalStateException] {
      RedisSource.table(spark, "user:*",
        StructType(Seq(StructField("id", LongType))))
    }
    assert(ex.getMessage.contains(RedisSource.HOST_KEY))
    assert(ex.getMessage.contains("decode"))
  }

  test("payload schema shadowing an internal _-column is rejected") {
    val ex = intercept[IllegalArgumentException] {
      RedisSource.decode(wireDf(Seq(("k", "{}"))),
        StructType(Seq(StructField("_value", StringType))))
    }
    assert(ex.getMessage.contains("_value"))
  }
}
