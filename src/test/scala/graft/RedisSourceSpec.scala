package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.sources.RedisSource

/** Redis topic-as-table (SURVEY §2.1 — presto-redis RedisRecordSet.java +
  * RedisInternalFieldDescription.java). The live path is driven
  * END-TO-END against [[MiniResp]], an in-process RESP2 socket server
  * producing the same wire bytes a redis-server does for SCAN/GET —
  * RespClient, cursor paging, per-partition GET connections, and decode
  * all run for real; the remaining tests pin the connection-independent
  * decode surface. */
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

  test("live path: SCAN + per-partition GET against a real RESP socket server") {
    // in-process RESP2 server — the same wire bytes a redis-server
    // produces for SCAN/GET, so RespClient and the full table() path run
    // END-TO-END with no client jar and no external broker
    val store = scala.collection.SortedMap(
      "user:1" -> """{"id":1,"name":"ada"}""",
      "user:2" -> """{"id":2,"name":"bob"}""",
      "user:3" -> """not-json""",
      "other:9" -> """{"id":9}""")
    val server = new MiniResp(store)
    try {
      val schema = StructType(Seq(
        StructField("id", LongType), StructField("name", StringType)))
      val out = RedisSource.table(spark, "localhost", server.port,
        "user:*", schema, "json", partitions = 2)
      val rows = out.orderBy("_key").collect()
      assert(rows.length == 3) // MATCH user:* excludes other:9
      assert(rows.map(_.getAs[String]("_key")).toSeq ==
        Seq("user:1", "user:2", "user:3"))
      assert(rows.map(r => Option(r.getAs[java.lang.Long]("id"))).toSeq ==
        Seq(Some(1L), Some(2L), None))
      assert(rows.map(_.getAs[Boolean]("_value_corrupt")).toSeq ==
        Seq(false, false, true))
      assert(server.connections.get() >= 2) // driver SCAN + executor GETs
    } finally server.close()
  }

  test("payload schema shadowing an internal _-column is rejected") {
    val ex = intercept[IllegalArgumentException] {
      RedisSource.decode(wireDf(Seq(("k", "{}"))),
        StructType(Seq(StructField("_value", StringType))))
    }
    assert(ex.getMessage.contains("_value"))
  }
}

/** Minimal in-process RESP2 server for the live-path test: SCAN with
  * MATCH glob and a genuine two-page cursor walk, GET, PING. One thread
  * per connection; binds an ephemeral 127.0.0.1 port. */
final class MiniResp(store: scala.collection.SortedMap[String, String])
    extends AutoCloseable {
  val connections = new java.util.concurrent.atomic.AtomicInteger(0)
  private val server = new java.net.ServerSocket(
    0, 16, java.net.InetAddress.getByName("127.0.0.1"))
  def port: Int = server.getLocalPort
  @volatile private var running = true
  private val acceptor = new Thread(() => {
    while (running) {
      try {
        val s = server.accept()
        connections.incrementAndGet()
        val t = new Thread(() => serve(s))
        t.setDaemon(true)
        t.start()
      } catch { case _: Exception => } // closed
    }
  })
  acceptor.setDaemon(true)
  acceptor.start()

  private def glob(p: String): java.util.regex.Pattern =
    java.util.regex.Pattern.compile(p.flatMap {
      case '*' => ".*"
      case '?' => "."
      case c if "\\.[]{}()+-^$|".contains(c) => "\\" + c
      case c => c.toString
    })

  private def serve(sock: java.net.Socket): Unit = {
    try {
      val in = new java.io.BufferedInputStream(sock.getInputStream)
      val out = new java.io.BufferedOutputStream(sock.getOutputStream)
      def line(): String = {
        val sb = new StringBuilder
        var c = in.read()
        while (c != '\r' && c >= 0) { sb.append(c.toChar); c = in.read() }
        in.read() // LF
        sb.toString
      }
      def bulk(s: String): String =
        if (s == null) "$-1\r\n"
        else s"$$${s.getBytes("UTF-8").length}\r\n$s\r\n"
      while (true) {
        val first = in.read()
        if (first < 0) return
        require(first == '*', s"expected array, got ${first.toChar}")
        val n = line().toInt
        val args = (1 to n).map { _ =>
          require(in.read() == '$', "expected bulk arg")
          val len = line().toInt
          val b = new Array[Byte](len)
          var o = 0
          while (o < len) o += math.max(0, in.read(b, o, len - o))
          in.read(); in.read() // CRLF
          new String(b, "UTF-8")
        }
        val reply = args.head.toUpperCase(java.util.Locale.ROOT) match {
          case "SCAN" =>
            val cursor = args(1)
            val pat = glob(args(args.indexOf("MATCH") + 1))
            val ks = store.keys.filter(k => pat.matcher(k).matches).toSeq
            // two-page cursor walk when more than one key matches
            val (page, next) =
              if (cursor == "0" && ks.length > 1) (ks.take(1), "17")
              else if (cursor == "17") (ks.drop(1), "0")
              else (ks, "0")
            s"*2\r\n${bulk(next)}*${page.length}\r\n" + page.map(bulk).mkString
          case "GET" => bulk(store.get(args(1)).orNull)
          case "PING" => "+PONG\r\n"
          case _ => "-ERR unknown command\r\n"
        }
        out.write(reply.getBytes("UTF-8"))
        out.flush()
      }
    } catch { case _: Exception => } finally sock.close()
  }

  override def close(): Unit = { running = false; server.close() }
}
