package graft

import org.scalatest.funsuite.AnyFunSuite

class WarcSpec extends AnyFunSuite {
  import sources.Warc

  private def rec(id: Int, body: String): Array[Byte] =
    Warc.encodeRecord(Seq(
      "WARC-Type" -> "response",
      "WARC-Record-ID" -> s"<urn:uuid:doc-$id>"),
      body.getBytes("UTF-8"))

  test("multi-record stream roundtrip preserves order, headers, bodies") {
    val bytes = rec(1, "hello") ++ rec(2, "") ++ rec(3, "wide \r\n\r\n body")
    val rs = Warc.parse(bytes)
    assert(rs.length == 3)
    assert(rs.map(_.headers("WARC-Record-ID")) ==
      Seq("<urn:uuid:doc-1>", "<urn:uuid:doc-2>", "<urn:uuid:doc-3>"))
    assert(new String(rs(0).body, "UTF-8") == "hello")
    assert(rs(1).body.isEmpty)
    // body containing the record separator bytes parses intact: record
    // boundaries come from Content-Length, never delimiter scanning
    assert(new String(rs(2).body, "UTF-8") == "wide \r\n\r\n body")
  }

  test("unknown headers are preserved; whitespace around values trimmed") {
    val bytes = Warc.encodeRecord(Seq(
      "WARC-Type" -> "response", "X-Custom-Header" -> "  padded  "),
      "b".getBytes)
    val r = Warc.parse(bytes).head
    assert(r.headers("X-Custom-Header") == "padded")
    assert(r.headers("Content-Length") == "1")
  }

  test("truncated body and missing separator are rejected") {
    val good = rec(1, "hello world")
    intercept[IllegalArgumentException] {
      Warc.parse(good.dropRight(6)) // cuts into body + separator
    }
    val noSep = good.dropRight(4) ++ "XXXX".getBytes
    intercept[IllegalArgumentException] { Warc.parse(noSep) }
  }

  test("content length is byte-exact for multi-byte UTF-8 bodies") {
    val body = "héllo — ünïcode"
    val r = Warc.parse(Warc.encodeRecord(Seq("WARC-Type" -> "response"),
      body.getBytes("UTF-8"))).head
    assert(r.headers("Content-Length").toInt == body.getBytes("UTF-8").length)
    assert(new String(r.body, "UTF-8") == body)
  }
}
