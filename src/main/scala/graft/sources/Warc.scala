package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** WARC (Web ARChive, ISO 28500) record mux/parse from first principles —
  * the Common Crawl container every web-scale training-data pipeline
  * ingests. A WARC file is a concatenation of records, each:
  *
  *   WARC/1.0\r\n  <headers: Name: value\r\n ...>  \r\n  <Content-Length
  *   body bytes>  \r\n\r\n
  *
  * Record boundaries are found by Content-Length arithmetic, NOT by
  * scanning for delimiters (bodies may contain anything) — the parser
  * walks the stream exactly as the spec requires, so a wrong length
  * computation or separator handling corrupts every subsequent record
  * and hash-fails the roundtrip oracle.
  *
  * Scale shape: real crawls arrive as many ~1 GB WARC files; the natural
  * Spark mapping is one file per task (binaryFile read → parse in
  * mapPartitions). The fixture query builds one file per shard with
  * `groupByKey(shard).mapGroups` — the same parse path, driver-free.
  */
object Warc {

  case class WarcRecord(headers: Map[String, String], body: Array[Byte])

  /** Serialize one record; Content-Length is appended automatically. */
  def encodeRecord(fields: Seq[(String, String)], body: Array[Byte]): Array[Byte] = {
    val sb = new StringBuilder("WARC/1.0\r\n")
    (fields :+ ("Content-Length" -> body.length.toString)).foreach {
      case (k, v) => sb.append(k).append(": ").append(v).append("\r\n")
    }
    sb.append("\r\n")
    sb.toString.getBytes("US-ASCII") ++ body ++ "\r\n\r\n".getBytes("US-ASCII")
  }

  /** Parse a WARC file: version line, header block to the blank line,
    * Content-Length body slice, record separator; repeat to EOF. Unknown
    * headers are preserved (a real parser must tolerate them). */
  def parse(bytes: Array[Byte]): Seq[WarcRecord] = {
    val out = Seq.newBuilder[WarcRecord]
    var pos = 0
    def line(): String = {
      val start = pos
      while (pos + 1 < bytes.length &&
        !(bytes(pos) == '\r' && bytes(pos + 1) == '\n')) pos += 1
      require(pos + 1 < bytes.length, "unterminated WARC header line")
      val s = new String(bytes, start, pos - start, "UTF-8")
      pos += 2
      s
    }
    while (pos < bytes.length) {
      val version = line()
      require(version.startsWith("WARC/"), s"bad WARC version line '$version'")
      var headers = Map.empty[String, String]
      var l = line()
      while (l.nonEmpty) {
        val i = l.indexOf(':')
        require(i > 0, s"bad WARC header '$l'")
        headers += (l.substring(0, i).trim -> l.substring(i + 1).trim)
        l = line()
      }
      val len = headers.getOrElse("Content-Length",
        sys.error("missing Content-Length")).toInt
      require(pos + len + 4 <= bytes.length, "truncated WARC body")
      val body = java.util.Arrays.copyOfRange(bytes, pos, pos + len)
      pos += len
      require(bytes(pos) == '\r' && bytes(pos + 1) == '\n' &&
        bytes(pos + 2) == '\r' && bytes(pos + 3) == '\n',
        s"missing record separator at $pos")
      pos += 4
      out += WarcRecord(headers, body)
    }
    out.result()
  }

  // --- .warc.gz: one gzip MEMBER per record, concatenated (RFC 1952
  // multi-member — the actual Common Crawl layout; per-record members
  // are what make crawl archives seekable via offset indexes). ---

  case class GzMember(offset: Long, compressedLen: Int, crcOk: Boolean,
      isize: Long, data: Array[Byte])

  /** Compress one record as a standalone gzip member. */
  def gzipMember(record: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(bos)
    g.write(record); g.close()
    bos.toByteArray
  }

  private def le32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)

  /** First-principles multi-member gzip splitter: parse each member's
    * RFC 1952 header (magic, CM=8, FLG with FEXTRA/FNAME/FCOMMENT/FHCRC
    * skipping), inflate the raw deflate stream tracking consumed bytes
    * (member boundaries are NOT findable by scanning — compressed bytes
    * can contain anything), then read and VERIFY the CRC32 + ISIZE
    * trailer. Returns per-member offsets — the seekability contract a
    * crawl-index consumer relies on. */
  def splitGzipMembers(bytes: Array[Byte]): Seq[GzMember] = {
    val out = Seq.newBuilder[GzMember]
    var pos = 0
    while (pos < bytes.length) {
      val start = pos
      require((bytes(pos) & 0xff) == 0x1f && (bytes(pos + 1) & 0xff) == 0x8b,
        s"bad gzip magic at $pos")
      require(bytes(pos + 2) == 8, "unsupported gzip compression method")
      val flg = bytes(pos + 3) & 0xff
      pos += 10
      if ((flg & 4) != 0) { // FEXTRA
        val xlen = (bytes(pos) & 0xff) | ((bytes(pos + 1) & 0xff) << 8)
        pos += 2 + xlen
      }
      if ((flg & 8) != 0) { while (bytes(pos) != 0) pos += 1; pos += 1 } // FNAME
      if ((flg & 16) != 0) { while (bytes(pos) != 0) pos += 1; pos += 1 } // FCOMMENT
      if ((flg & 2) != 0) pos += 2 // FHCRC
      val inf = new java.util.zip.Inflater(true) // raw deflate
      inf.setInput(bytes, pos, bytes.length - pos)
      val buf = new java.io.ByteArrayOutputStream()
      val tmp = new Array[Byte](8192)
      while (!inf.finished()) {
        val n = inf.inflate(tmp)
        if (n > 0) buf.write(tmp, 0, n)
        else if (inf.needsInput()) sys.error(s"truncated deflate stream at $pos")
      }
      pos += inf.getBytesRead.toInt
      inf.end()
      val data = buf.toByteArray
      require(pos + 8 <= bytes.length, "truncated gzip trailer")
      val crc = le32(bytes, pos)
      val isize = le32(bytes, pos + 4)
      pos += 8
      val c = new java.util.zip.CRC32()
      c.update(data)
      out += GzMember(start, pos - start, (c.getValue & 0xffffffffL) == crc,
        isize, data)
    }
    out.result()
  }

  /** Production entry point: read a directory/glob of .warc / .warc.gz
    * files into one record per row — `binaryFile` source (one whole file
    * per task, the natural unit for ~1 GB crawl shards), then the same
    * first-principles parser/splitter the oracles pin. At 100 TB this is
    * the Common Crawl ingest path: parallelism = number of files, no
    * shuffle, records stream straight into the text operators.
    *
    * Schema: (file, record_index, headers map<string,string>, body binary).
    */
  def read(spark: org.apache.spark.sql.SparkSession, glob: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(glob)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        val records =
          if (path.endsWith(".gz"))
            splitGzipMembers(bytes).iterator.flatMap { m =>
              require(m.crcOk, s"gzip CRC mismatch in $path at ${m.offset}")
              parse(m.data)
            }
          else parse(bytes).iterator
        records.zipWithIndex.map { case (r, i) => (path, i, r.headers, r.body) }
      }
      .toDF("file", "record_index", "headers", "body")
  }

  val queries: Map[String, Q] = Map(

    // The packaged file-based path (Warc.read): genuine multi-member
    // .warc.gz files are WRITTEN TO DISK (8 shard files — bounded fixture
    // synthesis; the distributed read below is the product), then read
    // back through binaryFile → splitter → parser, pinning the same
    // per-record facts as w01. A file-naming, glob, or per-file framing
    // bug fails the hash even though the in-memory paths (w01/w02) pass.
    "w04_warc_read" -> Q(
      (s, d) => {
        import s.implicits._
        val tmp = java.nio.file.Files.createTempDirectory("graft-warcread")
        Tables.t(s, d, "documents")
          .select(col("doc_id"), col("text"), col("source"))
          .as[(Long, String, String)]
          .groupByKey(_._1 % 8)
          .mapGroups { (shard, it) =>
            val bytes = it.toSeq.sortBy(_._1).toArray.flatMap {
              case (id, text, src) =>
                gzipMember(encodeRecord(Seq(
                  "WARC-Type" -> "response",
                  "WARC-Record-ID" -> s"<urn:uuid:doc-$id>",
                  "WARC-Date" -> f"2026-01-${1 + id % 28}%02dT00:00:00Z",
                  "WARC-Target-URI" -> s"https://example.com/$src/$id",
                  "Content-Type" -> "text/plain"),
                  text.getBytes("UTF-8")))
            }
            (shard.toInt, bytes)
          }
          .collect() // 8 shard files
          .foreach { case (shard, bytes) =>
            java.nio.file.Files.write(
              tmp.resolve(f"shard-$shard%02d.warc.gz"), bytes)
          }
        read(s, tmp.toString + "/*.warc.gz")
          .as[(String, Int, Map[String, String], Array[Byte])]
          .map { case (file, i, headers, body) =>
            val id = headers("WARC-Record-ID")
              .stripPrefix("<urn:uuid:doc-").stripSuffix(">").toLong
            val shard = "shard-(\\d+)".r.findFirstMatchIn(file)
              .map(_.group(1).toInt).getOrElse(-1)
            (id, shard, i, headers("Content-Length").toInt,
              body.map(b => (b & 0xff).toLong).sum,
              headers("WARC-Target-URI"), headers("WARC-Date"))
          }
          .toDF("doc_id", "shard", "rec_index", "content_length",
            "body_sum", "target_uri", "warc_date")
          .orderBy("doc_id")
      },
      Some("""
        WITH d AS (
          SELECT doc_id, text, source, CAST(doc_id % 8 AS INT) AS shard,
            octet_length(CAST(text AS BLOB)) AS clen
          FROM documents),
        r AS (
          SELECT *, CAST(row_number() OVER (
            PARTITION BY shard ORDER BY doc_id) - 1 AS INT) AS rec_index
          FROM d)
        SELECT doc_id, shard, rec_index,
          CAST(clen AS INT) AS content_length,
          CAST(list_sum(list_transform(range(0, clen), i ->
            ord(substr(text, CAST(i AS INT) + 1, 1)))) AS BIGINT) AS body_sum,
          'https://example.com/' || source || '/' || CAST(doc_id AS VARCHAR)
            AS target_uri,
          '2026-01-' || lpad(CAST(1 + doc_id % 28 AS VARCHAR), 2, '0') ||
            'T00:00:00Z' AS warc_date
        FROM r ORDER BY doc_id""")),

    // .warc.gz roundtrip: per-record gzip members concatenated per shard,
    // split back by REAL RFC 1952 framing (inflate-tracked member
    // boundaries, CRC32 verified, ISIZE read from the trailer), each
    // member's record parsed. The oracle reconstructs every record's
    // exact byte image in SQL and checks the gzip trailer ISIZE against
    // it — a framing bug, header-layout drift, or CRC mishandling fails
    // the hash. Compressed sizes are deflate-implementation-dependent
    // and deliberately NOT emitted.
    "w02_warc_gz" -> Q(
      (s, d) => {
        import s.implicits._
        Tables.t(s, d, "documents")
          .select(col("doc_id"), col("text"), col("source"))
          .as[(Long, String, String)]
          .groupByKey(_._1 % 8)
          .mapGroups { (shard, it) =>
            val bytes = it.toSeq.sortBy(_._1).toArray.flatMap {
              case (id, text, src) =>
                gzipMember(encodeRecord(Seq(
                  "WARC-Type" -> "response",
                  "WARC-Record-ID" -> s"<urn:uuid:doc-$id>",
                  "WARC-Date" -> f"2026-01-${1 + id % 28}%02dT00:00:00Z",
                  "WARC-Target-URI" -> s"https://example.com/$src/$id",
                  "Content-Type" -> "text/plain"),
                  text.getBytes("UTF-8")))
            }
            (shard.toInt, bytes)
          }
          .flatMap { case (shard, bytes) =>
            splitGzipMembers(bytes).zipWithIndex.map { case (m, i) =>
              val r = parse(m.data).head
              val id = r.headers("WARC-Record-ID")
                .stripPrefix("<urn:uuid:doc-").stripSuffix(">").toLong
              (id, shard, i, m.crcOk, m.isize,
                r.headers("Content-Length").toInt,
                r.body.map(b => (b & 0xff).toLong).sum)
            }
          }
          .toDF("doc_id", "shard", "member_index", "crc_ok", "isize",
            "content_length", "body_sum")
          .orderBy("doc_id")
      },
      Some("""
        WITH d AS (
          SELECT doc_id, text, source, CAST(doc_id % 8 AS INT) AS shard,
            octet_length(CAST(text AS BLOB)) AS clen
          FROM documents),
        r AS (
          SELECT *,
            CAST(row_number() OVER (
              PARTITION BY shard ORDER BY doc_id) - 1 AS INT) AS member_index,
            length(
              'WARC/1.0' || chr(13) || chr(10) ||
              'WARC-Type: response' || chr(13) || chr(10) ||
              'WARC-Record-ID: <urn:uuid:doc-' || CAST(doc_id AS VARCHAR) ||
              '>' || chr(13) || chr(10) ||
              'WARC-Date: 2026-01-' ||
              lpad(CAST(1 + doc_id % 28 AS VARCHAR), 2, '0') ||
              'T00:00:00Z' || chr(13) || chr(10) ||
              'WARC-Target-URI: https://example.com/' || source || '/' ||
              CAST(doc_id AS VARCHAR) || chr(13) || chr(10) ||
              'Content-Type: text/plain' || chr(13) || chr(10) ||
              'Content-Length: ' || CAST(clen AS VARCHAR) ||
              chr(13) || chr(10) || chr(13) || chr(10)
            ) + clen + 4 AS isize
          FROM d)
        SELECT doc_id, shard, member_index, TRUE AS crc_ok,
          CAST(isize AS BIGINT) AS isize,
          CAST(clen AS INT) AS content_length,
          CAST(list_sum(list_transform(range(0, clen), i ->
            ord(substr(text, CAST(i AS INT) + 1, 1)))) AS BIGINT) AS body_sum
        FROM r ORDER BY doc_id""")),

    // Crawl-index seek-read (the CDX contract): per shard, build the
    // .warc.gz, split members to get (offset, compressedLen) per record
    // — the index a crawl store persists — then for the selected subset
    // SEEK: slice exactly bytes[offset, offset+len) out of the file
    // image, run the member splitter on the ISOLATED slice and parse the
    // record it contains. Nothing about the slice can lean on stream
    // context, so a wrong offset or length fails loudly. Emitted facts
    // are oracle-replayable; offsets themselves are deflate-dependent
    // and stay internal (seek_ok pins that they were byte-exact).
    "w03_warc_seek" -> Q(
      (s, d) => {
        import s.implicits._
        Tables.t(s, d, "documents")
          .select(col("doc_id"), col("text"), col("source"))
          .as[(Long, String, String)]
          .groupByKey(_._1 % 8)
          .flatMapGroups { (shard, it) =>
            val bytes = it.toSeq.sortBy(_._1).toArray.flatMap {
              case (id, text, src) =>
                gzipMember(encodeRecord(Seq(
                  "WARC-Type" -> "response",
                  "WARC-Record-ID" -> s"<urn:uuid:doc-$id>",
                  "WARC-Target-URI" -> s"https://example.com/$src/$id"),
                  text.getBytes("UTF-8")))
            }
            splitGzipMembers(bytes).flatMap { m =>
              val r = parse(m.data).head
              val id = r.headers("WARC-Record-ID")
                .stripPrefix("<urn:uuid:doc-").stripSuffix(">").toLong
              if (id % 7 != 0) None // index everything; seek a subset
              else {
                val slice = java.util.Arrays.copyOfRange(bytes,
                  m.offset.toInt, m.offset.toInt + m.compressedLen)
                val again = splitGzipMembers(slice)
                val rr = parse(again.head.data).head
                val ok = again.length == 1 && again.head.crcOk &&
                  rr.headers == r.headers &&
                  java.util.Arrays.equals(again.head.data, m.data)
                Some((id, shard.toInt, ok,
                  rr.headers("Content-Length").toInt,
                  rr.body.map(b => (b & 0xff).toLong).sum,
                  rr.headers("WARC-Target-URI")))
              }
            }
          }
          .toDF("doc_id", "shard", "seek_ok", "content_length",
            "body_sum", "target_uri")
          .orderBy("doc_id")
      },
      Some("""
        SELECT doc_id, CAST(doc_id % 8 AS INT) AS shard, TRUE AS seek_ok,
          CAST(octet_length(CAST(text AS BLOB)) AS INT) AS content_length,
          CAST(list_sum(list_transform(
            range(0, octet_length(CAST(text AS BLOB))), i ->
            ord(substr(text, CAST(i AS INT) + 1, 1)))) AS BIGINT) AS body_sum,
          'https://example.com/' || source || '/' || CAST(doc_id AS VARCHAR)
            AS target_uri
        FROM documents WHERE doc_id % 7 = 0 ORDER BY doc_id""")),

    // WARC roundtrip: documents mux into one genuine multi-record WARC
    // file per shard (records in doc_id order with response headers:
    // record id, date, target URI), then the stream parser walks every
    // file back and the query emits per-record facts — record index
    // within the file (pins stream-walking order), Content-Length, body
    // byte sum, and the parsed header values, all replayed closed-form
    // by the oracle from the source rows. One mis-sliced body desyncs
    // the stream and fails every later record in the shard.
    "w01_warc_roundtrip" -> Q(
      (s, d) => {
        import s.implicits._
        Tables.t(s, d, "documents")
          .select(col("doc_id"), col("text"), col("source"))
          .as[(Long, String, String)]
          .groupByKey(_._1 % 8)
          .mapGroups { (shard, it) =>
            val bytes = it.toSeq.sortBy(_._1).toArray.flatMap {
              case (id, text, src) =>
                encodeRecord(Seq(
                  "WARC-Type" -> "response",
                  "WARC-Record-ID" -> s"<urn:uuid:doc-$id>",
                  "WARC-Date" -> f"2026-01-${1 + id % 28}%02dT00:00:00Z",
                  "WARC-Target-URI" -> s"https://example.com/$src/$id",
                  "Content-Type" -> "text/plain"),
                  text.getBytes("UTF-8"))
            }
            (shard.toInt, bytes)
          }
          .flatMap { case (shard, bytes) =>
            parse(bytes).zipWithIndex.map { case (r, i) =>
              val id = r.headers("WARC-Record-ID")
                .stripPrefix("<urn:uuid:doc-").stripSuffix(">").toLong
              (id, shard, i, r.headers("Content-Length").toInt,
                r.body.map(b => (b & 0xff).toLong).sum,
                r.headers("WARC-Target-URI"), r.headers("WARC-Date"))
            }
          }
          .toDF("doc_id", "shard", "rec_index", "content_length",
            "body_sum", "target_uri", "warc_date")
          .orderBy("doc_id")
      },
      Some("""
        WITH d AS (
          SELECT doc_id, text, source, CAST(doc_id % 8 AS INT) AS shard,
            octet_length(CAST(text AS BLOB)) AS clen
          FROM documents),
        r AS (
          SELECT *, CAST(row_number() OVER (
            PARTITION BY shard ORDER BY doc_id) - 1 AS INT) AS rec_index
          FROM d)
        SELECT doc_id, shard, rec_index,
          CAST(clen AS INT) AS content_length,
          CAST(list_sum(list_transform(range(0, clen), i ->
            ord(substr(text, CAST(i AS INT) + 1, 1)))) AS BIGINT) AS body_sum,
          'https://example.com/' || source || '/' || CAST(doc_id AS VARCHAR)
            AS target_uri,
          '2026-01-' || lpad(CAST(1 + doc_id % 28 AS VARCHAR), 2, '0') ||
            'T00:00:00Z' AS warc_date
        FROM r ORDER BY doc_id"""))
  )
}
