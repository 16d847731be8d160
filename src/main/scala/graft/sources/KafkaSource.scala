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
  * Two live paths:
  *  - `table`/`stream` ride the spark-sql-kafka connector when a
  *    deployment ships it (gated on `spark.graft.kafka.bootstrapServers`
  *    with a clear fail-fast message — this sandbox has neither the jar
  *    nor a broker);
  *  - `tableDirect` needs NEITHER: it speaks the public Kafka wire
  *    protocol itself ([[KafkaWire]]/[[KafkaWireClient]] — Metadata v0,
  *    ListOffsets v1, Fetch v4, RecordBatch v2 with CRC32C
  *    verification), one task per partition. KafkaSourceSpec drives it
  *    end-to-end against an in-process wire-protocol broker and pins the
  *    batch decoder against a spec-transcribed golden byte vector.
  */
/** First-principles Kafka wire protocol (public Kafka protocol guide) —
  * enough to read a topic without the spark-sql-kafka connector or a
  * client jar: Metadata v0 (partition discovery), ListOffsets v1 (end
  * offsets), Fetch v4 (record sets), and the RecordBatch v2 on-disk/wire
  * format (varint-framed records, CRC32C over attributes..end). All four
  * compression codecs decode (gzip via the JDK; snappy/lz4/zstd via the
  * libraries Spark itself ships). */
object KafkaWire {
  import java.nio.ByteBuffer

  final case class WireRecord(offset: Long, timestampMs: Long,
      key: Array[Byte], value: Array[Byte])

  // ── varint/zigzag (protobuf encoding, as the Kafka record format uses) ──
  def writeVarLong(b: ByteBuffer, v0: Long): Unit = {
    var v = (v0 << 1) ^ (v0 >> 63) // zigzag
    while ((v & ~0x7fL) != 0) {
      b.put(((v & 0x7f) | 0x80).toByte)
      v >>>= 7
    }
    b.put(v.toByte)
  }
  def readVarLong(b: ByteBuffer): Long = {
    var v = 0L
    var shift = 0
    var cur = 0L
    do {
      cur = b.get() & 0xffL
      v |= (cur & 0x7f) << shift
      shift += 7
    } while ((cur & 0x80) != 0)
    (v >>> 1) ^ -(v & 1) // un-zigzag
  }

  /** Decode a Fetch record_set: zero or more RecordBatch v2 frames. */
  def decodeRecordBatches(bytes: Array[Byte]): Seq[WireRecord] = {
    val out = Seq.newBuilder[WireRecord]
    val b = ByteBuffer.wrap(bytes)
    while (b.remaining() >= 61) { // v2 batch header size
      val baseOffset = b.getLong
      val batchLength = b.getInt
      if (b.remaining() < batchLength) return out.result() // partial tail
      // corrupt/hostile length smaller than the mandatory v2 header
      // remainder would move the cursor BACKWARDS at b.position(batchEnd)
      // and loop forever on the same bytes — fail loudly instead
      require(batchLength >= 49,
        s"corrupt record batch: length $batchLength < v2 header size 49")
      val batchEnd = b.position() + batchLength
      b.getInt // partitionLeaderEpoch
      val magic = b.get()
      require(magic == 2, s"unsupported record batch magic $magic")
      val crcStored = b.getInt
      val crcStart = b.position()
      val crc = new java.util.zip.CRC32C
      crc.update(bytes, crcStart, batchEnd - crcStart)
      require(crc.getValue.toInt == crcStored,
        s"RecordBatch CRC32C mismatch at offset $baseOffset")
      val attributes = b.getShort
      b.getInt // lastOffsetDelta
      val firstTimestamp = b.getLong
      b.getLong // maxTimestamp
      b.getLong // producerId
      b.getShort // producerEpoch
      b.getInt // baseSequence
      val numRecords = b.getInt
      // Control batches (attributes bit 5) carry transaction commit/abort
      // markers, not user data — a real broker with transactional
      // producers interleaves them into the log; skip the whole batch.
      if ((attributes & 0x20) != 0) { b.position(batchEnd) }
      else {
      // the records section (after the count) is what the codec bits
      // compress (public record-batch spec); the header stays plain
      val recBytes = new Array[Byte](batchEnd - b.position())
      b.get(recBytes)
      val r = ByteBuffer.wrap(decompress(attributes & 0x7, recBytes))
      var i = 0
      while (i < numRecords) {
        val recLen = readVarLong(r).toInt
        val recEnd = r.position() + recLen
        r.get() // record attributes
        val tsDelta = readVarLong(r)
        val offDelta = readVarLong(r)
        def sized(): Array[Byte] = {
          val n = readVarLong(r).toInt
          if (n < 0) null
          else {
            val a = new Array[Byte](n)
            r.get(a)
            a
          }
        }
        val key = sized()
        val value = sized()
        r.position(recEnd) // skip headers
        out += WireRecord(baseOffset + offDelta, firstTimestamp + tsDelta,
          key, value)
        i += 1
      }
      b.position(batchEnd)
      }
    }
    out.result()
  }

  /** Exclusive next offset after the batches in a Fetch record_set —
    * baseOffset + lastOffsetDelta + 1 of the LAST complete batch, or
    * `from` when the set holds none. On compacted or transactional
    * topics this advances past gaps (compacted-away records, control
    * markers) that yield zero user records, where counting decoded
    * records would stall the scan. */
  def nextOffsetAfter(bytes: Array[Byte], from: Long): Long = {
    var next = from
    val b = ByteBuffer.wrap(bytes)
    while (b.remaining() >= 61) {
      val baseOffset = b.getLong
      val batchLength = b.getInt
      if (b.remaining() < batchLength) return next // partial tail
      if (batchLength < 49) return next // corrupt length: never step backwards
      val batchEnd = b.position() + batchLength
      b.getInt // partitionLeaderEpoch
      b.get() // magic
      b.getInt // crc
      b.getShort // attributes
      val lastOffsetDelta = b.getInt
      next = baseOffset + lastOffsetDelta + 1
      b.position(batchEnd)
    }
    next
  }

  /** Codec ids from the batch attributes' low bits (public protocol):
    * 0 none, 1 gzip, 2 snappy (xerial stream framing), 3 lz4 (frame
    * format), 4 zstd — all four libraries ship with Spark. */
  private def codecStream(codec: Int, in: java.io.InputStream): java.io.InputStream =
    codec match {
      case 1 => new java.util.zip.GZIPInputStream(in)
      case 2 => new org.xerial.snappy.SnappyInputStream(in)
      case 3 => new net.jpountz.lz4.LZ4FrameInputStream(in)
      case 4 => new com.github.luben.zstd.ZstdInputStream(in)
      case other => throw new IllegalArgumentException(
        s"unknown record batch compression codec $other")
    }

  private def decompress(codec: Int, bytes: Array[Byte]): Array[Byte] =
    if (codec == 0) bytes
    else {
      val in = codecStream(codec, new java.io.ByteArrayInputStream(bytes))
      val out = new java.io.ByteArrayOutputStream(bytes.length * 4)
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) {
        out.write(buf, 0, n)
        n = in.read(buf)
      }
      in.close()
      out.toByteArray
    }

  private def compress(codec: Int, bytes: Array[Byte]): Array[Byte] =
    if (codec == 0) bytes
    else {
      val bos = new java.io.ByteArrayOutputStream(bytes.length)
      val out: java.io.OutputStream = codec match {
        case 1 => new java.util.zip.GZIPOutputStream(bos)
        case 2 => new org.xerial.snappy.SnappyOutputStream(bos)
        case 3 => new net.jpountz.lz4.LZ4FrameOutputStream(bos)
        case 4 => new com.github.luben.zstd.ZstdOutputStream(bos)
        case other => throw new IllegalArgumentException(
          s"unknown record batch compression codec $other")
      }
      out.write(bytes)
      out.close()
      bos.toByteArray
    }

  /** Encode one RecordBatch v2 (the test broker's muxer and any
    * writer-side use); `codec` compresses the records section per the
    * public spec (header and CRC stay plain). */
  def encodeRecordBatch(baseOffset: Long, firstTimestampMs: Long,
      records: Seq[(Array[Byte], Array[Byte])], codec: Int = 0): Array[Byte] = {
    val recBuf = ByteBuffer.allocate(records.map {
      case (k, v) =>
        32 + (if (k == null) 0 else k.length) + (if (v == null) 0 else v.length)
    }.sum + 64)
    records.zipWithIndex.foreach { case ((k, v), i) =>
      val one = ByteBuffer.allocate(
        24 + (if (k == null) 0 else k.length) + (if (v == null) 0 else v.length))
      one.put(0.toByte) // record attributes
      writeVarLong(one, 0L) // timestampDelta
      writeVarLong(one, i.toLong) // offsetDelta
      def put(a: Array[Byte]): Unit =
        if (a == null) writeVarLong(one, -1L)
        else { writeVarLong(one, a.length.toLong); one.put(a) }
      put(k); put(v)
      writeVarLong(one, 0L) // headers
      one.flip()
      writeVarLong(recBuf, one.remaining().toLong)
      recBuf.put(one)
    }
    recBuf.flip()
    val recArr = new Array[Byte](recBuf.remaining())
    recBuf.get(recArr)
    val recOut = compress(codec, recArr)
    val body = ByteBuffer.allocate(49 + recOut.length) // attributes..records
    body.putShort(codec.toShort) // attributes: codec bits, create-time
    body.putInt(records.size - 1) // lastOffsetDelta
    body.putLong(firstTimestampMs)
    body.putLong(firstTimestampMs)
    body.putLong(-1L) // producerId
    body.putShort(-1) // producerEpoch
    body.putInt(-1) // baseSequence
    body.putInt(records.size)
    body.put(recOut)
    body.flip()
    val crc = new java.util.zip.CRC32C
    val bodyArr = new Array[Byte](body.remaining())
    body.get(bodyArr)
    crc.update(bodyArr)
    val batch = ByteBuffer.allocate(8 + 4 + 4 + 1 + 4 + bodyArr.length)
    batch.putLong(baseOffset)
    batch.putInt(4 + 1 + 4 + bodyArr.length) // batchLength: epoch..end
    batch.putInt(0) // partitionLeaderEpoch
    batch.put(2.toByte) // magic
    batch.putInt(crc.getValue.toInt)
    batch.put(bodyArr)
    batch.array()
  }

  // ── primitive writers/readers for the classic (non-compact) protocol ──
  def putString(b: ByteBuffer, s: String): Unit = {
    val a = s.getBytes("UTF-8")
    b.putShort(a.length.toShort)
    b.put(a)
  }
  def getString(b: ByteBuffer): String = {
    val n = b.getShort
    if (n < 0) null
    else {
      val a = new Array[Byte](n)
      b.get(a)
      new String(a, "UTF-8")
    }
  }
  def getBytes(b: ByteBuffer): Array[Byte] = {
    val n = b.getInt
    if (n < 0) null
    else {
      val a = new Array[Byte](n)
      b.get(a)
      a
    }
  }
}

/** One broker connection; synchronous request/reply with the classic
  * 4-byte-length framing and request header v1. */
final class KafkaWireClient(host: String, port: Int) extends AutoCloseable {
  import java.nio.ByteBuffer
  import KafkaWire._

  private val socket = new java.net.Socket(host, port)
  socket.setTcpNoDelay(true)
  private val out = new java.io.DataOutputStream(
    new java.io.BufferedOutputStream(socket.getOutputStream))
  private val in = new java.io.DataInputStream(
    new java.io.BufferedInputStream(socket.getInputStream))
  private var correlation = 0

  private def roundTrip(apiKey: Short, apiVersion: Short,
      body: ByteBuffer): ByteBuffer = {
    correlation += 1
    val header = ByteBuffer.allocate(16 + 32)
    header.putShort(apiKey)
    header.putShort(apiVersion)
    header.putInt(correlation)
    putString(header, "graft") // client_id
    header.flip()
    out.writeInt(header.remaining() + body.remaining())
    out.write(header.array(), 0, header.remaining())
    out.write(body.array(), body.position(), body.remaining())
    out.flush()
    val size = in.readInt()
    val resp = new Array[Byte](size)
    in.readFully(resp)
    val rb = ByteBuffer.wrap(resp)
    require(rb.getInt == correlation, "correlation id mismatch")
    rb
  }

  /** Metadata v0 → partition ids of `topic`. */
  def partitions(topic: String): Seq[Int] = {
    val body = ByteBuffer.allocate(8 + topic.length + 8)
    body.putInt(1)
    putString(body, topic)
    body.flip()
    val r = roundTrip(3, 0, body)
    val nBrokers = r.getInt
    (1 to nBrokers).foreach { _ => r.getInt; getString(r); r.getInt }
    val nTopics = r.getInt
    val ids = Seq.newBuilder[Int]
    (1 to nTopics).foreach { _ =>
      val err = r.getShort
      val name = getString(r)
      val nParts = r.getInt
      (1 to nParts).foreach { _ =>
        r.getShort // partition error
        val pid = r.getInt
        r.getInt // leader
        (1 to r.getInt).foreach(_ => r.getInt) // replicas
        (1 to r.getInt).foreach(_ => r.getInt) // isr
        if (err == 0 && name == topic) ids += pid
      }
    }
    ids.result()
  }

  /** ListOffsets v1, timestamp −1 (LATEST) → end offset. */
  def endOffset(topic: String, partition: Int): Long = {
    val body = ByteBuffer.allocate(32 + topic.length)
    body.putInt(-1) // replica_id
    body.putInt(1) // one topic
    putString(body, topic)
    body.putInt(1) // one partition
    body.putInt(partition)
    body.putLong(-1L) // LATEST
    body.flip()
    val r = roundTrip(2, 1, body)
    val nTopics = r.getInt
    var result = 0L
    (1 to nTopics).foreach { _ =>
      getString(r)
      (1 to r.getInt).foreach { _ =>
        r.getInt // partition
        val err = r.getShort
        require(err == 0, s"ListOffsets error $err")
        r.getLong // timestamp
        result = r.getLong
      }
    }
    result
  }

  /** Fetch v4 from `offset` → (records, highWatermark). */
  /** One Fetch round-trip. Returns (decoded user records at >= offset,
    * high watermark, next offset to fetch). The next offset comes from
    * the last complete batch's lastOffsetDelta, NOT from the decoded
    * records — on compacted or transactional topics a Fetch below the
    * end offset can legitimately decode zero user records (compacted-away
    * keys, control markers) and the scan must still advance. */
  def fetch(topic: String, partition: Int, offset: Long,
      maxBytes: Int = 1 << 20): (Seq[KafkaWire.WireRecord], Long, Long) = {
    val body = ByteBuffer.allocate(64 + topic.length)
    body.putInt(-1) // replica_id
    body.putInt(100) // max_wait_ms
    body.putInt(1) // min_bytes
    body.putInt(maxBytes)
    body.put(0.toByte) // isolation_level READ_UNCOMMITTED
    body.putInt(1)
    putString(body, topic)
    body.putInt(1)
    body.putInt(partition)
    body.putLong(offset)
    body.putInt(maxBytes)
    body.flip()
    val r = roundTrip(1, 4, body)
    r.getInt // throttle_time
    var records = Seq.empty[KafkaWire.WireRecord]
    var hw = 0L
    var next = offset
    (1 to r.getInt).foreach { _ =>
      getString(r)
      (1 to r.getInt).foreach { _ =>
        r.getInt // partition
        val err = r.getShort
        require(err == 0, s"Fetch error $err")
        hw = r.getLong
        r.getLong // last_stable_offset
        val nAborted = r.getInt
        (1 to math.max(0, nAborted)).foreach(_ => { r.getLong; r.getLong })
        val set = KafkaWire.getBytes(r)
        if (set != null) {
          records = KafkaWire.decodeRecordBatches(set)
            .filter(_.offset >= offset)
          next = math.max(next, KafkaWire.nextOffsetAfter(set, offset))
        }
      }
    }
    (records, hw, next)
  }

  override def close(): Unit = socket.close()
}

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

  /** Bounded topic-as-table read over the first-principles wire client
    * ([[KafkaWireClient]]) — no connector jar, no client library:
    * Metadata discovers partitions (one Spark task per partition, the
    * reference's split model — KafkaSplitManager.java), ListOffsets
    * bounds the scan, and each task Fetch-loops its own partition to the
    * end offset on its own connection. The values never funnel through
    * the driver. */
  def tableDirect(spark: SparkSession, host: String, port: Int,
      topic: String, schema: StructType, format: String = "json",
      csvDelimiter: String = ","): DataFrame = {
    val meta = {
      val c = new KafkaWireClient(host, port)
      try c.partitions(topic).map(p => (p, c.endOffset(topic, p)))
      finally c.close()
    }
    val rows = spark.sparkContext
      .parallelize(meta, math.max(1, meta.size))
      .flatMap { case (pid, end) =>
        val c = new KafkaWireClient(host, port)
        val buf = scala.collection.mutable.ArrayBuffer
          .empty[org.apache.spark.sql.Row]
        try {
          var off = 0L
          while (off < end) {
            val (recs, _, next) = c.fetch(topic, pid, off)
            recs.foreach { r =>
              buf += org.apache.spark.sql.Row(r.key, r.value, topic, pid,
                r.offset, new java.sql.Timestamp(r.timestampMs), 0)
            }
            // Advance by the batch header's lastOffsetDelta: a compacted
            // or transactional topic can return zero user records below
            // the end offset, and the scan must not stall there.
            require(next > off, s"Fetch did not advance at $off < $end")
            off = next
          }
        } finally c.close()
        buf
      }
    decode(spark.createDataFrame(rows, wireSchema), schema, format,
      csvDelimiter)
  }

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
