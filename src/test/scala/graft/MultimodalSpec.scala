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
