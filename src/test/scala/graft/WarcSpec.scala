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

  test("gzip members split at true boundaries with verified CRC and ISIZE") {
    val a = rec(1, "first record body")
    val b = rec(2, "second, longer record body with more bytes in it")
    val gz = Warc.gzipMember(a) ++ Warc.gzipMember(b)
    val ms = Warc.splitGzipMembers(gz)
    assert(ms.length == 2)
    assert(ms(0).offset == 0 && ms(1).offset == ms(0).compressedLen.toLong)
    assert(ms.forall(_.crcOk))
    assert(ms(0).isize == a.length && ms(1).isize == b.length)
    assert(ms(0).data.toSeq == a.toSeq && ms(1).data.toSeq == b.toSeq)
  }

  test("gzip splitter skips FNAME/FEXTRA optional fields and flags bad CRC") {
    // hand-build a member with FNAME + FEXTRA set (GZIPOutputStream never
    // writes them, so this exercises the header-flag paths for real)
    val payload = rec(9, "payload behind optional headers")
    val deflater = new java.util.zip.Deflater(-1, true)
    deflater.setInput(payload); deflater.finish()
    val dbuf = new Array[Byte](payload.length * 2 + 64)
    val dlen = deflater.deflate(dbuf); deflater.end()
    val crc = new java.util.zip.CRC32(); crc.update(payload)
    val bb = java.nio.ByteBuffer.allocate(10 + 2 + 3 + 5 + dlen + 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put(0x1f.toByte).put(0x8b.toByte).put(8.toByte)
      .put((4 | 8).toByte) // FLG: FEXTRA | FNAME
      .putInt(0).put(0.toByte).put(0xff.toByte) // mtime, XFL, OS
      .putShort(3.toShort).put(Array[Byte](1, 2, 3)) // FEXTRA: xlen + data
      .put("name".getBytes("US-ASCII")).put(0.toByte) // FNAME, NUL-terminated
      .put(dbuf, 0, dlen)
      .putInt(crc.getValue.toInt).putInt(payload.length)
    val ms = Warc.splitGzipMembers(bb.array())
    assert(ms.length == 1 && ms.head.crcOk && ms.head.data.toSeq == payload.toSeq)

    // corrupt one body byte inside the deflate stream's stored CRC: flip a
    // trailer CRC byte instead (deterministic) -> crcOk must go false
    val good = Warc.gzipMember(payload)
    val bad = good.clone()
    bad(bad.length - 6) = (bad(bad.length - 6) ^ 0x5a).toByte // CRC32 field
    assert(!Warc.splitGzipMembers(bad).head.crcOk)
  }

  test("content length is byte-exact for multi-byte UTF-8 bodies") {
    val body = "héllo — ünïcode"
    val r = Warc.parse(Warc.encodeRecord(Seq("WARC-Type" -> "response"),
      body.getBytes("UTF-8"))).head
    assert(r.headers("Content-Length").toInt == body.getBytes("UTF-8").length)
    assert(new String(r.body, "UTF-8") == body)
  }

  test("Warc.read ingests .warc and multi-member .warc.gz files from disk") {
    import TestSession.spark
    val dir = java.nio.file.Files.createTempDirectory("graft-warcfiles")
    // two plain .warc files and one multi-member .warc.gz
    java.nio.file.Files.write(dir.resolve("a.warc"),
      rec(1, "alpha") ++ rec(2, "beta"))
    java.nio.file.Files.write(dir.resolve("b.warc"), rec(3, "gamma"))
    java.nio.file.Files.write(dir.resolve("c.warc.gz"),
      Warc.gzipMember(rec(4, "delta")) ++ Warc.gzipMember(rec(5, "epsilon")))

    val rows = Warc.read(spark, dir.toString + "/*")
      .collect()
      .map(r => (r.getString(0).split('/').last, r.getInt(1),
        r.getMap[String, String](2)("WARC-Record-ID"),
        new String(r.getAs[Array[Byte]](3), "UTF-8")))
      .sortBy(_._3)
    assert(rows.length == 5)
    assert(rows.map(_._4).toSeq ==
      Seq("alpha", "beta", "gamma", "delta", "epsilon"))
    // record_index counts WITHIN each file, gz members split correctly
    assert(rows.collect { case (f, i, _, b) if f == "a.warc" => (i, b) }.toSeq
      == Seq((0, "alpha"), (1, "beta")))
    assert(rows.collect { case (f, i, _, b) if f == "c.warc.gz" => (i, b) }.toSeq
      == Seq((0, "delta"), (1, "epsilon")))
  }
}
