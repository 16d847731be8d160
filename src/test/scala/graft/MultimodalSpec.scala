package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  import TestSession._
  import operators.Multimodal

  test("media table is deterministic and schema-stable") {
    val a = Multimodal.mediaTable(spark, sf).collect().map(r => (r.media_id, r.meta))
    val b = Multimodal.mediaTable(spark, sf).collect().map(r => (r.media_id, r.meta))
    assert(a.sameElements(b))
  }

  test("feature vectors are 16-dim and L1-normalized") {
    val feats = Multimodal.extractFeatures(Multimodal.mediaTable(spark, sf)).collect()
    assert(feats.nonEmpty)
    assert(feats.forall(_.features.length == 16))
    assert(feats.forall(f => math.abs(f.features.map(_.toDouble).sum - 1.0) < 1e-3))
  }

  test("frame sampling respects stride and frame count") {
    val media = Multimodal.mediaTable(spark, sf)
    val frames = Multimodal.sampleFrames(media, stride = 2)
    val perMedia = frames.toDF().groupBy("media_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = media.collect().filter(_.meta.format == "mp4")
      .map(r => r.media_id -> ((r.meta.nFrames + 1) / 2).toLong).toMap
    assert(perMedia == expected)
  }

  test("resize rescales metadata and payload proportionally") {
    val media = Multimodal.mediaTable(spark, sf)
    val resized = Multimodal.resize(media, 8, 8).collect()
    assert(resized.forall(r => r.meta.width == 8 && r.meta.height == 8))
    assert(resized.forall(_.payload.length >= 1))
    // image rows really resampled: the payload decodes to the new dims
    resized.filter(_.meta.format == "png").take(5).foreach { r =>
      val (w, h, px) = Multimodal.decodeImageRgb(r.payload)
      assert(w == 8 && h == 8 && px.length == 8 * 8 * 3)
    }
  }

  test("PNG encode/decode round-trip is lossless") {
    val rgb = Array.tabulate(13 * 7 * 3)(i => ((i * 31 + 5) % 256).toByte)
    val png = Multimodal.encodeImage("png", 13, 7, rgb)
    assert(png.take(4).map(_ & 0xff).toSeq == Seq(0x89, 0x50, 0x4e, 0x47))
    val (w, h, out) = Multimodal.decodeImageRgb(png)
    assert(w == 13 && h == 7)
    assert(out.toSeq == rgb.toSeq)
  }

  test("JPEG decode is real: dims exact, pixels within a fidelity bound") {
    // smooth gradient — JPEG's quantization error stays small on it
    val w = 24; val h = 16
    val rgb = Array.tabulate(w * h * 3) { i =>
      val px = i / 3; ((px % w) * 8 + (px / w) * 4).toByte
    }
    val jpg = Multimodal.encodeImage("jpeg", w, h, rgb)
    assert(jpg.take(3).map(_ & 0xff).toSeq == Seq(0xff, 0xd8, 0xff))
    val (w2, h2, out) = Multimodal.decodeImageRgb(jpg)
    assert(w2 == w && h2 == h)
    val mae = rgb.zip(out).map { case (a, b) =>
      math.abs((a & 0xff) - (b & 0xff)) }.sum.toDouble / rgb.length
    assert(mae < 8.0, s"jpeg mean abs error $mae too high for a smooth gradient")
    // and NOT a stub: the decoded pixels correlate with the source
    assert(out.map(_ & 0xff).sum !=
      Multimodal.decodeImageRgb(Multimodal.encodeImage("jpeg", w, h,
        Array.fill(w * h * 3)(0.toByte)))._3.map(_ & 0xff).sum)
  }

  test("nearest-neighbor resample picks floor-indexed source pixels") {
    // 2x2 source with distinct per-pixel colors → 4x4: each source pixel
    // expands to a 2x2 block
    val src = Array[Byte](
      10, 11, 12, 20, 21, 22,
      30, 31, 32, 40, 41, 42)
    val out = Multimodal.resampleRgbNn(src, 2, 2, 4, 4)
    def px(x: Int, y: Int) = (0 until 3).map(c => out((y * 4 + x) * 3 + c))
    assert(px(0, 0) == Seq(10, 11, 12) && px(1, 1) == Seq(10, 11, 12))
    assert(px(2, 0) == Seq(20, 21, 22) && px(3, 1) == Seq(20, 21, 22))
    assert(px(0, 2) == Seq(30, 31, 32) && px(1, 3) == Seq(30, 31, 32))
    assert(px(2, 2) == Seq(40, 41, 42) && px(3, 3) == Seq(40, 41, 42))
  }

  test("media fixture payloads are genuine containers per format") {
    val rows = Multimodal.mediaTable(spark, sf).collect()
    def magic(p: Array[Byte], n: Int) = p.take(n).map(_ & 0xff).toSeq
    rows.foreach { r =>
      r.meta.format match {
        case "png" =>
          assert(magic(r.payload, 4) == Seq(0x89, 0x50, 0x4e, 0x47))
          val (w, h, _) = Multimodal.decodeImageRgb(r.payload)
          assert(w == r.meta.width && h == r.meta.height)
        case "jpeg" =>
          assert(magic(r.payload, 3) == Seq(0xff, 0xd8, 0xff))
          val (w, h, _) = Multimodal.decodeImageRgb(r.payload)
          assert(w == r.meta.width && h == r.meta.height)
        case "wav" =>
          val (rate, samples) = Multimodal.decodeWavPcm16(r.payload)
          assert(rate == 16000 && samples.length == 64)
        case "mp4" => // real ISO-BMFF: ftyp signature + demuxable boxes
          assert(new String(r.payload.slice(4, 8), "US-ASCII") == "ftyp")
          val i = Multimodal.decodeMp4(r.payload)
          assert(i.width == r.meta.width && i.height == r.meta.height)
          assert(i.sampleSizes.length == r.meta.nFrames)
          assert(i.sampleSizes.sum == i.mdat.length)
      }
    }
  }

  test("MP4 mux/demux round-trips every box fact") {
    val samples = Array(Array[Byte](1, 2, 3), Array[Byte](4), Array[Byte](5, 6))
    val deltas = Array(100, 100, 160)
    val bytes = Multimodal.encodeMp4(320, 240, 600, 1000, deltas, samples)
    val i = Multimodal.decodeMp4(bytes)
    assert(i.movieTimescale == 600 && i.mediaTimescale == 1000)
    assert(i.mediaDuration == 360 && i.movieDuration == 360L * 600 / 1000)
    assert(i.width == 320 && i.height == 240)
    assert(i.sampleSizes.toSeq == Seq(3, 1, 2))
    assert(i.sampleDeltas.toSeq == deltas.toSeq)
    assert(i.mdat.toSeq == samples.flatten.toSeq)
  }

  test("MP4 demux skips unknown boxes and handles version-1 headers") {
    val base = Multimodal.encodeMp4(64, 48, 600, 2000,
      Array(40, 40), Array(Array[Byte](7, 8), Array[Byte](9)))
    // splice an unknown top-level box ('free') between ftyp and moov
    val free = java.nio.ByteBuffer.allocate(12)
      .putInt(12).put("free".getBytes("US-ASCII")).putInt(0xdead).array()
    // fix up nothing else: top-level siblings are walked by size
    val spliced = base.take(20) ++ free ++ base.drop(20)
    val i = Multimodal.decodeMp4(spliced)
    assert(i.width == 64 && i.mediaTimescale == 2000)
    assert(i.mdat.toSeq == Seq[Byte](7, 8, 9))

    // hand-build a version-1 mvhd inside a minimal moov next to the v0
    // boxes the muxer wrote: verify the 64-bit duration branch
    val v1 = java.nio.ByteBuffer.allocate(8 + 4 + 8 + 8 + 4 + 8)
      .putInt(40).put("mvhd".getBytes("US-ASCII"))
      .putInt(0x01000000) // version 1
      .putLong(0).putLong(0) // ctime, mtime (64-bit)
      .putInt(90000) // timescale
      .putLong(1234567890123L) // duration (64-bit)
      .array()
    // replace base's mvhd (108 bytes at offset 20+8) with the v1 one and
    // shrink the moov size accordingly
    val moovOff = 20
    val moovSz = java.nio.ByteBuffer.wrap(base, moovOff, 4).getInt
    val rest = base.slice(moovOff + 8 + 108, moovOff + moovSz) // trak…
    val newMoov = java.nio.ByteBuffer.allocate(8)
      .putInt(8 + v1.length + rest.length).put("moov".getBytes("US-ASCII"))
      .array() ++ v1 ++ rest
    val rebuilt = base.take(20) ++ newMoov ++ base.drop(moovOff + moovSz)
    val j = Multimodal.decodeMp4(rebuilt)
    assert(j.movieTimescale == 90000 && j.movieDuration == 1234567890123L)
    assert(j.mdat.toSeq == Seq[Byte](7, 8, 9)) // mdat offset unchanged
  }

  test("MP4 resize re-muxes a valid container with new track dims") {
    val media = Multimodal.mediaTable(spark, sf)
    val resized = Multimodal.resize(media, 8, 8).collect()
    resized.filter(_.meta.format == "mp4").take(5).foreach { r =>
      val i = Multimodal.decodeMp4(r.payload)
      assert(i.width == 8 && i.height == 8)
      assert(i.sampleSizes.sum == i.mdat.length)
    }
  }

  test("tablesample fraction is within statistical bounds") {
    val n = Tables.t(spark, sf, "lineitem").count()
    val rows = SparkEntry.all("q85_tablesample").fn(spark, sf).collect()
    assert(rows.forall(_.getAs[Boolean]("fraction_ok")), rows.mkString(";"))
    assert(rows.map(_.getAs[Long]("n_total")).sum == n)
  }

  test("PPM roundtrip recovers dimensions and every pixel byte") {
    val rgb = Array.tabulate(5 * 4 * 3)(i => ((i * 37 + 11) % 256).toByte)
    val (w, h, px) = Multimodal.decodePpm(Multimodal.encodePpm(5, 4, rgb))
    assert(w == 5 && h == 4)
    assert(px.toSeq == rgb.toSeq)
  }

  test("PPM decode tolerates comment lines and extra whitespace") {
    val rgb = Array.fill(2 * 2 * 3)(42.toByte)
    val header = "P6\n# a comment line\n 2\t2 \n255\n".getBytes("US-ASCII")
    val payload = header ++ rgb
    val (w, h, px) = Multimodal.decodePpm(payload)
    assert(w == 2 && h == 2 && px.forall(_ == 42.toByte))
  }

  test("PPM decode rejects truncated pixel data") {
    val ok = Multimodal.encodePpm(3, 3, Array.fill(27)(1.toByte))
    intercept[IllegalArgumentException] {
      Multimodal.decodePpm(ok.dropRight(5))
    }
  }

  test("WAV PCM16 roundtrip recovers rate and signed samples") {
    val samples = Array.tabulate(100)(i => ((i - 50) * 300).toShort)
    val (rate, out) =
      Multimodal.decodeWavPcm16(Multimodal.encodeWavPcm16(22050, samples))
    assert(rate == 22050)
    assert(out.toSeq == samples.toSeq)
  }

  test("WAV decode walks past an interposed chunk before data") {
    val samples = Array[Short](1, -2, 3)
    val canonical = Multimodal.encodeWavPcm16(8000, samples)
    // splice a 6-byte junk chunk between fmt and data (odd size → pad byte)
    val fmtEnd = 12 + 8 + 16
    val junk = "jnk ".getBytes("US-ASCII") ++
      Array[Byte](5, 0, 0, 0, 9, 9, 9, 9, 9, 0)
    val spliced = canonical.take(fmtEnd) ++ junk ++ canonical.drop(fmtEnd)
    val (rate, out) = Multimodal.decodeWavPcm16(spliced)
    assert(rate == 8000 && out.toSeq == samples.toSeq)
  }
}
