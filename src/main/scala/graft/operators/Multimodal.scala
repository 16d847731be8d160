package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Multimodal-column operators: image/audio/video as opaque `binary` columns
  * with a typed metadata struct, processed partition-wise.
  *
  * Decode: REAL for the library-free formats — binary PPM (P6) images and
  * PCM-16 mono WAV audio parse from first principles (`decodePpm`/
  * `decodeWavPcm16`, oracled end-to-end by m05) — and STUBBED for
  * png/jpeg/mp4 (this container has no compressed-image/video codecs):
  * `decodeStub` derives deterministic fake pixels from the payload bytes.
  * Everything around the stub — the schema, the binary column handling,
  * the mapPartitions batch shape (the Scala analogue of mapInPandas: one
  * iterator per partition, vectorizable batches), partitioning, and the
  * feature-vector output contract — is real and tested, so a compressed
  * codec drops into `decodeStub` without touching the pipeline.
  */
object Multimodal {

  case class MediaMeta(format: String, width: Int, height: Int, nFrames: Int)
  case class MediaRow(media_id: Long, payload: Array[Byte], meta: MediaMeta)
  case class MediaFeatures(media_id: Long, format: String,
      byteLen: Int, features: Array[Float])
  case class FrameRow(media_id: Long, frameIdx: Int, frame: Array[Byte])

  /** Deterministic fixture: documents' text bytes as media payloads with
    * metadata derived from doc_id (stable across engines and runs). */
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.t(spark, dir, "documents")
      .select(col("doc_id"), col("text"), col("n_chars"))
      .as[(Long, String, Long)]
      .map { case (id, text, n) =>
        val fmt = Seq("png", "jpeg", "wav", "mp4")((id % 4).toInt)
        MediaRow(id, text.getBytes("UTF-8"),
          MediaMeta(fmt, 16 + (id % 64).toInt, 16 + (id % 48).toInt,
            if (fmt == "mp4") 8 + (id % 8).toInt else 1))
      }
  }

  // --- REAL pure-JVM codecs (no external library needed): binary PPM
  // (P6) images and PCM-16 mono WAV audio. These two formats decode from
  // first principles, so the "no codec in this container" caveat does not
  // apply to them — m05 routes payloads through encode→DECODE and the
  // DuckDB oracle recomputes the expected pixel/sample sums closed-form
  // from the source text, so a misparsed header or byte order fails the
  // hash. png/jpeg/mp4 remain stubbed (those genuinely need codecs). ---

  /** Binary PPM (P6): `P6\n<w> <h>\n255\n` + w*h*3 RGB bytes. */
  def encodePpm(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == w * h * 3, s"rgb length ${rgb.length} != ${w * h * 3}")
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + rgb.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(rgb, 0, out, header.length, rgb.length)
    out
  }

  /** Parse a binary PPM (P6) payload → (width, height, rgb bytes).
    * Accepts arbitrary whitespace between header tokens and `#` comment
    * lines (the format's spec), requires maxval 255. */
  def decodePpm(payload: Array[Byte]): (Int, Int, Array[Byte]) = {
    var pos = 0
    def skipWs(): Unit = {
      var go = true
      while (go && pos < payload.length) {
        val c = payload(pos).toChar
        if (c.isWhitespace) pos += 1
        else if (c == '#') { while (pos < payload.length && payload(pos) != '\n') pos += 1 }
        else go = false
      }
    }
    def token(): String = {
      skipWs()
      val start = pos
      while (pos < payload.length && !payload(pos).toChar.isWhitespace) pos += 1
      new String(payload, start, pos - start, "US-ASCII")
    }
    require(token() == "P6", "not a binary PPM (P6) payload")
    val w = token().toInt
    val h = token().toInt
    require(token() == "255", "PPM maxval must be 255")
    pos += 1 // the single whitespace byte after maxval
    require(payload.length - pos >= w * h * 3,
      s"PPM payload truncated: need ${w * h * 3} bytes, have ${payload.length - pos}")
    (w, h, java.util.Arrays.copyOfRange(payload, pos, pos + w * h * 3))
  }

  /** Canonical 44-byte-header RIFF/WAVE, PCM 16-bit mono little-endian. */
  def encodeWavPcm16(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(sampleRate).putInt(sampleRate * 2)
      .putShort(2).putShort(16) // block align, bits
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  /** Parse RIFF/WAVE PCM-16 mono → (sampleRate, samples). Walks the chunk
    * list (fmt /data may be separated by LIST/fact chunks in the wild). */
  def decodeWavPcm16(payload: Array[Byte]): (Int, Array[Short]) = {
    val bb = java.nio.ByteBuffer.wrap(payload)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourcc(): String = {
      val b = new Array[Byte](4); bb.get(b); new String(b, "US-ASCII")
    }
    require(fourcc() == "RIFF", "not a RIFF payload")
    bb.getInt() // riff size
    require(fourcc() == "WAVE", "not a WAVE payload")
    var rate = -1
    var samples: Array[Short] = null
    while (bb.remaining() >= 8 && (rate < 0 || samples == null)) {
      val id = fourcc(); val size = bb.getInt()
      id match {
        case "fmt " =>
          val fmt = bb.getShort(); val ch = bb.getShort()
          require(fmt == 1 && ch == 1, "only PCM mono supported")
          rate = bb.getInt(); bb.getInt(); bb.getShort()
          require(bb.getShort() == 16, "only 16-bit PCM supported")
          bb.position(bb.position() + (size - 16))
        case "data" =>
          samples = new Array[Short](size / 2)
          var i = 0
          while (i < samples.length) { samples(i) = bb.getShort(); i += 1 }
        case _ => bb.position(bb.position() + size + (size & 1))
      }
    }
    require(rate > 0 && samples != null, "missing fmt /data chunk")
    (rate, samples)
  }

  /** STUB decode: deterministic fake "pixels" from payload bytes (??? in a
    * codec-equipped deployment: image decode to W*H channel array). */
  private def decodeStub(payload: Array[Byte], meta: MediaMeta): Array[Byte] = {
    val n = math.min(payload.length, meta.width * meta.height)
    val out = new Array[Byte](meta.width * meta.height)
    var i = 0
    while (i < out.length) {
      out(i) = if (i < n) payload(i) else (i % 251).toByte
      i += 1
    }
    out
  }

  /** Feature extraction: 16-bin byte histogram of decoded content,
    * L1-normalized → Array[Float] embedding column. Partition-wise batch
    * loop (mapPartitions) — the distributed shape; no driver collection. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val px = decodeStub(r.payload, r.meta)
        val hist = new Array[Float](16)
        var i = 0
        while (i < px.length) { hist((px(i) & 0xff) >> 4) += 1f; i += 1 }
        val total = px.length.toFloat.max(1f)
        MediaFeatures(r.media_id, r.meta.format, r.payload.length,
          hist.map(_ / total))
      }
    }
  }

  /** Frame sampling for video payloads: every `stride`-th fixed-size chunk
    * (??? in deployment: keyframe extraction). One row per sampled frame. */
  def sampleFrames(media: Dataset[MediaRow], stride: Int = 2): Dataset[FrameRow] = {
    import media.sparkSession.implicits._
    media.filter(_.meta.format == "mp4").flatMap { r =>
      val frameSize = math.max(1, r.payload.length / math.max(1, r.meta.nFrames))
      (0 until r.meta.nFrames by stride).map { f =>
        val start = f * frameSize
        val end = math.min(r.payload.length, start + frameSize)
        FrameRow(r.media_id, f,
          java.util.Arrays.copyOfRange(r.payload, math.min(start, end), end))
      }
    }
  }

  /** Resize: metadata transform + proportional payload truncation (???:
    * real resample). Pure-expression on the DataFrame side where possible. */
  def resize(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.map { r =>
      val scale = (w.toLong * h).toDouble / (r.meta.width.toLong * r.meta.height)
      val newLen = math.max(1, math.min(r.payload.length,
        math.round(r.payload.length * scale).toInt))
      MediaRow(r.media_id, java.util.Arrays.copyOfRange(r.payload, 0, newLen),
        r.meta.copy(width = w, height = h))
    }
  }

  val queries: Map[String, Q] = Map(

    // REAL decode path: text bytes → encodePpm/encodeWavPcm16 payloads →
    // decodePpm/decodeWavPcm16 → pixel/sample sums. The oracle recomputes
    // the sums closed-form from the SOURCE text (it never sees the binary),
    // so any header misparse, byte-order or padding mistake in the real
    // decoders hash-fails. png/jpeg/mp4 stay stubbed (m02); PPM/WAV need
    // no external codec.
    "m05_decode_real" -> Q(
      (s, d) => {
        import s.implicits._
        Tables.t(s, d, "documents")
          .select(col("doc_id"), col("text"))
          .where(length(col("text")) >= 8)
          .as[(Long, String)]
          .map { case (id, text) =>
            // index CODEPOINTS truncated to a byte — the same positions
            // character-based substr/ord sees, so every row participates
            // (the round-7 form indexed UTF-8 bytes and had to exclude
            // non-ASCII rows where the two indexings diverge)
            val cps = text.codePoints().toArray
            val n = cps.length
            val rgb = Array.tabulate(8 * 6 * 3)(i => (cps(i % n) & 0xff).toByte)
            val pcm = Array.tabulate(64)(i =>
              (((cps(i % n) & 0xff) - 100) * 256).toShort)
            val (w, h, px) = decodePpm(encodePpm(8, 6, rgb))
            val (rate, ss) = decodeWavPcm16(encodeWavPcm16(16000, pcm))
            (id, w, h, px.map(_ & 0xff).map(_.toLong).sum,
              rate, ss.length, ss.map(_.toLong).sum)
          }
          .toDF("media_id", "w", "h", "px_sum",
            "sample_rate", "n_samples", "sample_sum")
          .orderBy("media_id")
      },
      Some("""
        WITH d AS (
          SELECT doc_id, text, length(text) AS len
          FROM documents WHERE length(text) >= 8)
        SELECT doc_id AS media_id, CAST(8 AS INT) AS w, CAST(6 AS INT) AS h,
          CAST(list_sum(list_transform(range(0, 144), i ->
            ord(substr(text, CAST(i % len AS INT) + 1, 1)) % 256)) AS BIGINT) AS px_sum,
          CAST(16000 AS INT) AS sample_rate, CAST(64 AS INT) AS n_samples,
          -- (cp%256 - 100)*256 wrapped to signed 16-bit: the engine stores
          -- PCM as int16, so the oracle reproduces the wrap exactly
          CAST(list_sum(list_transform(range(0, 64), i ->
            ((ord(substr(text, CAST(i % len AS INT) + 1, 1)) % 256 - 100) * 256
              + 32768) % 65536 - 32768)) AS BIGINT) AS sample_sum
        FROM d ORDER BY media_id""")),

    // Metadata + payload stats — pure column expressions over the binary
    // column (no decode), oracle-checkable via octet_length.
    "m01_media_meta" -> Q(
      (s, d) => mediaTable(s, d).toDF()
        .select(col("media_id"), col("meta.format").as("format"),
          col("meta.width").as("w"), col("meta.height").as("h"),
          length(col("payload")).as("n_bytes"),
          substring(hex(col("payload")), 1, 8).as("magic"))
        .orderBy("media_id"),
      Some("""
        SELECT doc_id AS media_id,
          ['png', 'jpeg', 'wav', 'mp4'][CAST(doc_id % 4 AS INT) + 1] AS format,
          CAST(16 + doc_id % 64 AS INT) AS w,
          CAST(16 + doc_id % 48 AS INT) AS h,
          CAST(octet_length(CAST(text AS BLOB)) AS INT) AS n_bytes,
          upper(substr(hex(CAST(text AS BLOB)), 1, 8)) AS magic
        FROM documents ORDER BY media_id""")),

    // Decode → feature-extract pipeline (stubbed decode, real plumbing);
    // rows-only check + ScalaTest invariants (normalization, determinism).
    "m02_media_features" -> Q(
      (s, d) => {
        // histogram counts recovered from the L1-normalized features:
        // counts = f * n_pixels are exact integers (float32 error ≪ 0.5),
        // so the dump is integer-valued and the stub decode is replicated
        // closed-form by the oracle.
        val npx = (lit(16) + col("media_id") % 64) * (lit(16) + col("media_id") % 48)
        extractFeatures(mediaTable(s, d)).toDF()
          .select(col("media_id"), col("format"), col("byteLen"),
            array_join(transform(col("features"),
              f => round(f.cast("double") * npx).cast("int").cast("string")), ",")
              .as("hist"))
          .orderBy("media_id")
      },
      Some("""
        WITH m AS (
          SELECT doc_id AS media_id,
            ['png','jpeg','wav','mp4'][CAST(doc_id % 4 AS INT) + 1] AS format,
            CAST(octet_length(CAST(text AS BLOB)) AS INT) AS byteLen,
            CAST((16 + doc_id % 64) * (16 + doc_id % 48) AS INT) AS npx,
            text
          FROM documents),
        px AS (
          SELECT media_id, format, byteLen,
            list_transform(range(0, npx), i ->
              (CASE WHEN i < least(byteLen, npx)
                 THEN ord(substr(text, CAST(i AS INT) + 1, 1))
                 ELSE CAST(i % 251 AS INT) END) >> 4) AS bins
          FROM m)
        SELECT media_id, format, byteLen,
          array_to_string(list_transform(range(0, 16), b ->
            len(list_filter(bins, x -> x = b))), ',') AS hist
        FROM px ORDER BY media_id""")),

    // Resize: metadata transform + proportional payload truncation (the
    // decode-free stand-in keeps the plumbing honest); arithmetic replayed
    // closed-form by the oracle.
    "m04_resize" -> Q(
      (s, d) => resize(mediaTable(s, d), 32, 32).toDF()
        .select(col("media_id"), col("meta.width").as("w"),
          col("meta.height").as("h"),
          length(col("payload")).as("n_bytes"),
          substring(hex(col("payload")), 1, 8).as("magic"))
        .orderBy("media_id"),
      Some("""
        WITH m AS (
          SELECT doc_id AS media_id,
            CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS len,
            (16 + doc_id % 64) * (16 + doc_id % 48) AS opx,
            text
          FROM documents)
        SELECT media_id, CAST(32 AS INT) AS w, CAST(32 AS INT) AS h,
          CAST(greatest(1, least(len,
            CAST(round(len * 1024.0 / opx) AS BIGINT))) AS INT) AS n_bytes,
          upper(substr(hex(CAST(text AS BLOB)), 1, 8)) AS magic
        FROM m ORDER BY media_id""")),

    // Video frame sampling: per-video sampled-frame counts + byte volume.
    // The stub chunking is pure arithmetic over (payload length, n_frames),
    // so the oracle replicates it closed-form.
    "m03_frame_sample" -> Q(
      (s, d) => sampleFrames(mediaTable(s, d), stride = 2).toDF()
        .groupBy("media_id")
        .agg(count(lit(1)).as("n_frames_sampled"),
          sum(length(col("frame"))).cast("long").as("total_bytes"))
        .orderBy("media_id"),
      Some("""
        WITH v AS (
          SELECT doc_id AS media_id,
            CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS len,
            CAST(8 + doc_id % 8 AS BIGINT) AS nf
          FROM documents WHERE doc_id % 4 = 3),
        f AS (
          SELECT media_id, len, nf, greatest(1, len // nf) AS fs
          FROM v)
        SELECT media_id,
          CAST(len(range(0, nf, 2)) AS BIGINT) AS n_frames_sampled,
          CAST(list_sum(list_transform(range(0, nf, 2), fr ->
            greatest(0, least(len, fr * fs + fs) - least(fr * fs, len))))
            AS BIGINT) AS total_bytes
        FROM f ORDER BY media_id"""))
  )
}
