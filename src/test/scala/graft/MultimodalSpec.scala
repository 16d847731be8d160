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
}
