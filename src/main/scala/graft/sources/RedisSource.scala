package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Topic-as-table over Redis — the reference's Redis connector surface
  * (presto-redis/src/main/java/com/facebook/presto/redis/
  * RedisRecordSet.java + RedisRecordCursor.java: keys enumerate via SCAN
  * (or zset range splits, RedisSplitManager.java:73), values fetch via
  * GET/HGETALL, the payload decodes through the shared record-decoder
  * stack, and each row carries the internal columns `_key`, `_value`,
  * `_key_length`, `_value_length`, `_key_corrupt`, `_value_corrupt` —
  * RedisInternalFieldDescription.java:46-71).
  *
  * Spark-first: Spark ships no Redis source and this container has no
  * Redis client jar — and none is needed: RESP2 is a trivial
  * length-prefixed protocol, so the LIVE path speaks it directly over
  * `java.net.Socket` ([[RespClient]]): SCAN-page key enumeration on the
  * driver (metadata-scale), per-partition GET connections on the
  * executors (the data path). RedisSourceSpec drives it end-to-end
  * against an in-process RESP server (same wire bytes a real server
  * produces). [[decode]] turns the (key, value) wire rows — from the
  * live path, a deployment's snapshot loader, or a synthesized fixture —
  * into the reference's decoded-row shape: payload columns typed per the
  * table schema via [[RecordDecoder]] (json/csv/raw, the same decoders
  * the reference's RedisDecoderModule binds), plus the six internal
  * columns with the reference's corruption semantics (a json/csv payload
  * that fails to parse yields NULL payload columns and
  * `_value_corrupt=true` — RedisRecordCursor's lenient mode).
  *
  * Scale posture: decode is a pure projection (fuses into
  * WholeStageCodegen above whatever source produced the rows), and the
  * reference's split model (SCAN cursor ranges / zset chunks) maps to
  * source-side partitions — one Spark task per key range — so nothing
  * here ever funnels through the driver.
  */
object RedisSource {
  val HOST_KEY = "spark.graft.redis.host"

  /** The connection-independent wire shape: one row per Redis key. */
  val wireSchema: StructType = StructType(Seq(
    StructField("key", StringType),
    StructField("value", StringType)))

  // ── RESP (REdis Serialization Protocol) client, first principles —
  // no client jar exists here and none is needed: RESP2 is a trivial
  // length-prefixed text protocol. The reference talks to the server
  // through Jedis (RedisRecordCursor.java:46); the WIRE it produces is
  // exactly what this client speaks. ──

  sealed trait Resp
  case class RespStr(s: String) extends Resp          // +simple or $bulk
  case class RespErr(msg: String) extends Resp        // -error
  case class RespInt(v: Long) extends Resp            // :integer
  case class RespArr(items: Seq[Resp]) extends Resp   // *array
  case object RespNull extends Resp                   // $-1 / *-1

  /** One connection; synchronous request/reply (the Jedis usage shape). */
  final class RespClient(host: String, port: Int) extends AutoCloseable {
    private val socket = new java.net.Socket(host, port)
    socket.setTcpNoDelay(true)
    private val out = new java.io.BufferedOutputStream(socket.getOutputStream)
    private val in = new java.io.BufferedInputStream(socket.getInputStream)

    def command(args: String*): Resp = {
      val sb = new StringBuilder(s"*${args.length}\r\n")
      args.foreach { a =>
        val b = a.getBytes("UTF-8")
        sb.append('$').append(b.length).append("\r\n").append(a).append("\r\n")
      }
      out.write(sb.toString.getBytes("UTF-8"))
      out.flush()
      readReply()
    }

    private def readLine(): String = {
      val sb = new StringBuilder
      var c = in.read()
      while (c != '\r') {
        require(c >= 0, "RESP stream closed mid-line")
        sb.append(c.toChar)
        c = in.read()
      }
      require(in.read() == '\n', "RESP line missing LF")
      sb.toString
    }

    private def readReply(): Resp = (in.read(): @unchecked) match {
      case '+' => RespStr(readLine())
      case '-' => RespErr(readLine())
      case ':' => RespInt(readLine().toLong)
      case '$' =>
        val n = readLine().toInt
        if (n < 0) RespNull
        else {
          val b = new Array[Byte](n)
          var off = 0
          while (off < n) {
            val r = in.read(b, off, n - off)
            require(r >= 0, "RESP stream closed mid-bulk")
            off += r
          }
          require(in.read() == '\r' && in.read() == '\n', "bulk missing CRLF")
          RespStr(new String(b, "UTF-8"))
        }
      case '*' =>
        val n = readLine().toInt
        if (n < 0) RespNull else RespArr(Seq.fill(n)(readReply()))
    }

    override def close(): Unit = socket.close()
  }

  /** Live key-scan path (RedisRecordSet.java + RedisRecordCursor.java):
    * the driver enumerates matching keys with SCAN cursor pages
    * (metadata-scale — keys, never values), partitions the key list, and
    * each task opens its own connection to GET its keys — the values
    * (the data) never funnel through the driver. The reference runs the
    * whole SCAN+GET in ONE split (RedisSplitManager.java:73 single
    * split for non-zset tables); partitioning the fetched keys across
    * tasks strictly improves on that. */
  def table(spark: SparkSession, host: String, port: Int,
      keyPattern: String, schema: StructType, format: String = "json",
      csvDelimiter: String = ",", partitions: Int = 8): DataFrame = {
    import spark.implicits._
    val keys = scala.collection.mutable.ArrayBuffer.empty[String]
    val c = new RespClient(host, port)
    try {
      var cursor = "0"
      var first = true
      while (first || cursor != "0") {
        first = false
        c.command("SCAN", cursor, "MATCH", keyPattern, "COUNT", "512") match {
          case RespArr(Seq(RespStr(next), RespArr(page))) =>
            cursor = next
            page.foreach { case RespStr(k) => keys += k; case _ => }
          case other => sys.error(s"unexpected SCAN reply: $other")
        }
      }
    } finally c.close()
    val wire = spark.sparkContext
      .parallelize(keys.toSeq, math.max(1, math.min(partitions, keys.size)))
      .mapPartitions { it =>
        val cli = new RespClient(host, port)
        val rows = it.map { k =>
          cli.command("GET", k) match {
            case RespStr(v) => (k, v)
            case RespNull => (k, null: String) // expired between SCAN and GET
            case other => sys.error(s"unexpected GET reply: $other")
          }
        }.toVector // drain before closing the connection
        cli.close()
        rows.iterator
      }
      .toDF("key", "value")
    decode(wire, schema, format, csvDelimiter)
  }

  /** Wire rows → decoded payload columns + the reference's internal
    * columns. Pure projections — works identically on a live source's
    * output and on a synthesized wire-schema DataFrame (the spec path). */
  def decode(wire: DataFrame, schema: StructType, format: String = "json",
      csvDelimiter: String = ","): DataFrame = {
    val internalNames = Seq("_key", "_value", "_key_length", "_value_length",
      "_key_corrupt", "_value_corrupt")
    val shadowed = schema.fieldNames.toSet & internalNames.toSet
    require(shadowed.isEmpty,
      s"payload schema shadows Redis internal column(s) ${shadowed.mkString(", ")} " +
        "(RedisInternalFieldDescription names are reserved)")
    // internal columns FIRST, from the wire columns (same ordering rule
    // as KafkaSource.decode: a payload field reusing a wire name must not
    // corrupt the metadata)
    val withInternal = wire // RedisInternalFieldDescription.java names
      .withColumn("_key", col("key"))
      .withColumn("_value", col("value"))
      .withColumn("_key_length",
        length(col("key")).cast("long"))
      .withColumn("_value_length",
        coalesce(length(col("value")).cast("long"), lit(0L)))
      .withColumn("_key_corrupt", col("key").isNull)
      .withColumn("_value_corrupt", format match {
        // the reference flags a row corrupt when the decoder cannot
        // parse the payload (RedisRecordCursor lenient mode); from_json
        // is permissive (malformed → all-NULL struct, not NULL), so the
        // validity probe is get_json_object's whole-document path, which
        // is NULL exactly for unparseable payloads
        case "json" => col("value").isNotNull &&
          get_json_object(col("value"), "$").isNull
        case "csv" => col("value").isNull
        case _ => lit(false)
      })
    val decoded = format match {
      case "json" => RecordDecoder.json(withInternal, "value", schema)
      case "csv" => RecordDecoder.csv(withInternal, "value", schema, csvDelimiter)
      case "raw" => withInternal
      case other => throw new IllegalArgumentException(
        s"unknown decoder '$other' (json|csv|raw)")
    }
    val keep = schema.fieldNames.toSet
    val wireLeftovers = wireSchema.fieldNames.filterNot(keep.contains)
    decoded.drop(wireLeftovers: _*)
  }
}
