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

  test("RecordBatch v2 decoder conformance: spec-transcribed golden bytes") {
    import graft.sources.KafkaWire
    // bytes laid out FIELD BY FIELD per the public record-batch spec —
    // independent of encodeRecordBatch, so an encoder/decoder pair that
    // is wrong the same way cannot pass. One record: key "k", value
    // "v7", timestampDelta 5, offsetDelta 0, baseOffset 42.
    val rec = java.nio.ByteBuffer.allocate(64)
    rec.put(0.toByte) // record attributes
    rec.put(Array[Byte](0x0a)) // varint zigzag(5) = 10
    rec.put(Array[Byte](0x00)) // varint zigzag(0)
    rec.put(Array[Byte](0x02)) // keyLen zigzag(1) = 2
    rec.put('k'.toByte)
    rec.put(Array[Byte](0x04)) // valueLen zigzag(2) = 4
    rec.put("v7".getBytes("US-ASCII"))
    rec.put(Array[Byte](0x00)) // headers count 0
    rec.flip()
    val body = java.nio.ByteBuffer.allocate(128)
    body.putShort(0) // attributes
    body.putInt(0) // lastOffsetDelta
    body.putLong(1000L) // firstTimestamp
    body.putLong(1005L) // maxTimestamp
    body.putLong(-1L) // producerId
    body.putShort(-1) // producerEpoch
    body.putInt(-1) // baseSequence
    body.putInt(1) // numRecords
    body.put(Array[Byte]((rec.remaining() * 2).toByte)) // record length varint
    body.put(rec)
    body.flip()
    val bodyArr = new Array[Byte](body.remaining())
    body.get(bodyArr)
    val crc = new java.util.zip.CRC32C
    crc.update(bodyArr) // the JDK's CRC32C — independent of our code
    val batch = java.nio.ByteBuffer.allocate(61 + bodyArr.length)
    batch.putLong(42L) // baseOffset
    batch.putInt(4 + 1 + 4 + bodyArr.length) // batchLength
    batch.putInt(0) // partitionLeaderEpoch
    batch.put(2.toByte) // magic
    batch.putInt(crc.getValue.toInt)
    batch.put(bodyArr)
    val decoded = KafkaWire.decodeRecordBatches(
      java.util.Arrays.copyOf(batch.array(), batch.position()))
    assert(decoded.length == 1)
    assert(decoded.head.offset == 42L)
    assert(decoded.head.timestampMs == 1005L)
    assert(new String(decoded.head.key, "US-ASCII") == "k")
    assert(new String(decoded.head.value, "US-ASCII") == "v7")
    // a flipped CRC byte must be rejected
    val bad = java.util.Arrays.copyOf(batch.array(), batch.position())
    bad(17) = (bad(17) ^ 0x5a).toByte // crc field
    assertThrows[IllegalArgumentException](KafkaWire.decodeRecordBatches(bad))
  }

  test("encode/decode round trip incl. null keys and multi-record batches") {
    import graft.sources.KafkaWire
    val batch = KafkaWire.encodeRecordBatch(100L, 5000L, Seq(
      (null, """{"id":1}""".getBytes("UTF-8")),
      ("k1".getBytes("UTF-8"), """{"id":2}""".getBytes("UTF-8")),
      ("k2".getBytes("UTF-8"), null)))
    val out = KafkaWire.decodeRecordBatches(batch)
    assert(out.map(_.offset) == Seq(100L, 101L, 102L))
    assert(out.head.key == null && out(2).value == null)
    assert(new String(out(1).value, "UTF-8") == """{"id":2}""")
  }

  test("all four batch compression codecs round trip (gzip/snappy/lz4/zstd)") {
    import graft.sources.KafkaWire
    val payloads = (1 to 20).map(i =>
      (s"key$i".getBytes("UTF-8"),
        (s"""{"id":$i,"body":"""" + "x" * 100 + "\"}").getBytes("UTF-8")))
    for (codec <- 1 to 4) {
      val batch = KafkaWire.encodeRecordBatch(0L, 1000L, payloads, codec)
      val out = KafkaWire.decodeRecordBatches(batch)
      assert(out.length == 20, s"codec $codec")
      assert(out.map(_.offset) == (0L until 20L), s"codec $codec")
      assert(new String(out(7).value, "UTF-8").contains("\"id\":8"),
        s"codec $codec")
    }
  }

  /** Flip the control flag (attributes bit 5) on an encoded batch and
    * re-seal the CRC — the shape a transactional producer's commit/abort
    * marker has on the wire. */
  private def asControl(batch: Array[Byte]): Array[Byte] = {
    val out = java.util.Arrays.copyOf(batch, batch.length)
    // layout: baseOffset(8) batchLength(4) leaderEpoch(4) magic(1) crc(4)
    // attributes(2) ... — attributes short at 21, CRC over [21, end)
    out(22) = (out(22) | 0x20).toByte
    val crc = new java.util.zip.CRC32C
    crc.update(out, 21, out.length - 21)
    java.nio.ByteBuffer.wrap(out).putInt(17, crc.getValue.toInt)
    out
  }

  test("control batches (attributes bit 5) decode to zero user records") {
    import graft.sources.KafkaWire
    val data = KafkaWire.encodeRecordBatch(7L, 1000L,
      Seq(("k".getBytes("UTF-8"), "v".getBytes("UTF-8"))))
    val marker = asControl(KafkaWire.encodeRecordBatch(8L, 1001L,
      Seq((Array[Byte](0, 0, 0, 0), Array[Byte](0, 0, 0, 0, 0, 0)))))
    val decoded = KafkaWire.decodeRecordBatches(data ++ marker)
    assert(decoded.map(_.offset) == Seq(7L)) // marker skipped, not garbage
    // ...but the scan cursor still advances past the marker's offsets
    assert(KafkaWire.nextOffsetAfter(data ++ marker, 7L) == 9L)
  }

  test("tableDirect terminates on a log whose tail is a transaction marker " +
      "(zero user records below the end offset)") {
    import graft.sources.KafkaWire
    val payload = KafkaWire.encodeRecordBatch(0L, 1700000000000L, Seq(
      ("k".getBytes("UTF-8"), """{"id":1,"v":"a"}""".getBytes("UTF-8")),
      ("k".getBytes("UTF-8"), """{"id":2,"v":"b"}""".getBytes("UTF-8"))))
    val marker = asControl(KafkaWire.encodeRecordBatch(2L, 1700000000002L,
      Seq((Array[Byte](0, 0, 0, 0), Array[Byte](0, 0, 0, 0, 0, 0)))))
    val broker = new MiniKafka("txn", Map(0 -> Seq(payload, marker)))
    try {
      val schema = StructType(Seq(
        StructField("id", LongType), StructField("v", StringType)))
      // end offset is 3 (past the marker); the fetch loop must advance by
      // lastOffsetDelta — requiring decoded records here would stall/abort
      val rows = KafkaSource.tableDirect(spark, "localhost", broker.port,
        "txn", schema, "json").orderBy("id").collect()
      assert(rows.map(_.getAs[Long]("id")).toSeq == Seq(1L, 2L))
    } finally broker.close()
  }

  test("tableDirect: live wire-protocol read against an in-process broker, " +
      "one task per partition") {
    import graft.sources.KafkaWire
    def b(base: Long, vals: String*): Array[Byte] =
      KafkaWire.encodeRecordBatch(base, 1700000000000L + base,
        vals.map(v => (s"key$base".getBytes("UTF-8"), v.getBytes("UTF-8"))))
    val broker = new MiniKafka("events", Map(
      0 -> Seq(b(0, """{"id":1,"v":"a"}""", """{"id":2,"v":"b"}"""),
        b(2, """{"id":3,"v":"c"}""")),
      1 -> Seq(b(0, """{"id":10,"v":"x"}"""))))
    try {
      val schema = StructType(Seq(
        StructField("id", LongType), StructField("v", StringType)))
      val out = KafkaSource.tableDirect(spark, "localhost", broker.port,
        "events", schema, "json")
      val rows = out.orderBy("id").collect()
      assert(rows.map(_.getAs[Long]("id")).toSeq == Seq(1L, 2L, 3L, 10L))
      assert(rows.map(_.getAs[String]("v")).toSeq == Seq("a", "b", "c", "x"))
      assert(rows.map(r => (r.getAs[Int]("_partition_id"),
        r.getAs[Long]("_partition_offset"))).toSeq ==
        Seq((0, 0L), (0, 1L), (0, 2L), (1, 0L)))
      assert(rows.forall(_.getAs[java.sql.Timestamp]("_timestamp") != null))
    } finally broker.close()
  }
}

/** In-process broker speaking the public Kafka wire protocol — Metadata
  * v0, ListOffsets v1, Fetch v4 — over real RecordBatch v2 bytes, so
  * `KafkaSource.tableDirect` runs END-TO-END with no broker install and
  * no client jar. One thread per connection; ephemeral 127.0.0.1 port. */
final class MiniKafka(topic: String,
    data: Map[Int, Seq[Array[Byte]]]) extends AutoCloseable {
  import java.nio.ByteBuffer
  import graft.sources.KafkaWire._

  private val server = new java.net.ServerSocket(
    0, 16, java.net.InetAddress.getByName("127.0.0.1"))
  def port: Int = server.getLocalPort
  @volatile private var running = true
  private val acceptor = new Thread(() => {
    while (running) {
      try {
        val s = server.accept()
        val t = new Thread(() => serve(s))
        t.setDaemon(true)
        t.start()
      } catch { case _: Exception => }
    }
  })
  acceptor.setDaemon(true)
  acceptor.start()

  // Log end offset from the batch headers (lastOffsetDelta), like a real
  // broker — includes control/compacted offsets that decode to no user
  // records.
  private def endOffset(pid: Int): Long =
    nextOffsetAfter(data.getOrElse(pid, Nil).toArray.flatten, 0L)

  private def serve(sock: java.net.Socket): Unit = {
    try {
      val in = new java.io.DataInputStream(
        new java.io.BufferedInputStream(sock.getInputStream))
      val out = new java.io.DataOutputStream(
        new java.io.BufferedOutputStream(sock.getOutputStream))
      while (true) {
        val size = in.readInt()
        val req = new Array[Byte](size)
        in.readFully(req)
        val b = ByteBuffer.wrap(req)
        val apiKey = b.getShort
        b.getShort // apiVersion
        val correlation = b.getInt
        getString(b) // client_id
        val body = ByteBuffer.allocate(1 << 16)
        apiKey match {
          case 3 => // Metadata v0
            body.putInt(1) // brokers
            body.putInt(0)
            putString(body, "127.0.0.1")
            body.putInt(port)
            body.putInt(1) // topics
            body.putShort(0)
            putString(body, topic)
            body.putInt(data.size)
            data.keys.toSeq.sorted.foreach { pid =>
              body.putShort(0)
              body.putInt(pid)
              body.putInt(0) // leader
              body.putInt(1); body.putInt(0) // replicas
              body.putInt(1); body.putInt(0) // isr
            }
          case 2 => // ListOffsets v1
            b.getInt // replica_id
            b.getInt // topics = 1
            getString(b)
            b.getInt // partitions = 1
            val pid = b.getInt
            b.getLong // timestamp (-1)
            body.putInt(1)
            putString(body, topic)
            body.putInt(1)
            body.putInt(pid)
            body.putShort(0)
            body.putLong(-1L)
            body.putLong(endOffset(pid))
          case 1 => // Fetch v4
            b.getInt; b.getInt; b.getInt; b.getInt; b.get() // replica..isolation
            b.getInt // topics = 1
            getString(b)
            b.getInt // partitions = 1
            val pid = b.getInt
            b.getLong // fetch_offset (serve all; client filters)
            b.getInt // partition_max_bytes
            val set = data.getOrElse(pid, Nil).toArray.flatten
            body.putInt(0) // throttle
            body.putInt(1)
            putString(body, topic)
            body.putInt(1)
            body.putInt(pid)
            body.putShort(0)
            body.putLong(endOffset(pid)) // high watermark
            body.putLong(endOffset(pid)) // last stable offset
            body.putInt(0) // aborted transactions
            body.putInt(set.length)
            body.put(set)
          case other =>
            sys.error(s"MiniKafka: unsupported api key $other")
        }
        body.flip()
        out.writeInt(4 + body.remaining())
        out.writeInt(correlation)
        out.write(body.array(), 0, body.remaining())
        out.flush()
      }
    } catch { case _: Exception => } finally sock.close()
  }

  override def close(): Unit = { running = false; server.close() }
}
