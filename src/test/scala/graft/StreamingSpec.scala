package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** Streaming extension: drive the events fixture through readStream and
  * check the streaming results equal the batch equivalents. */
class StreamingSpec extends AnyFunSuite {
  import TestSession._
  import streaming.EventStream

  private lazy val eventsDir: String = {
    // stage the fixture as a clean micros-timestamp parquet dir (the raw
    // fixture is TIMESTAMP(NANOS), unreadable by the streaming source)
    val dir = java.nio.file.Files.createTempDirectory("events-stream").toString
    Tables.t(spark, sf, "events").coalesce(2).write.mode("overwrite").parquet(dir)
    dir
  }

  test("streaming tumbling counts equal batch counts") {
    val q = EventStream.runToMemory(
      EventStream.tumblingCounts(EventStream.read(spark, eventsDir)), "tumbling")
    try {
      val streaming = spark.table("tumbling")
        .select("w_start", "event_type", "n").orderBy("w_start", "event_type").collect()
      val batch = Tables.t(spark, sf, "events")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start").as("w_start"), col("event_type"), col("n"))
        .orderBy("w_start", "event_type").collect()
      assert(streaming.sameElements(batch))
    } finally q.stop()
  }

  test("streaming sliding counts equal batch sliding counts") {
    val q = EventStream.runToMemory(
      EventStream.slidingCounts(EventStream.read(spark, eventsDir)), "sliding")
    try {
      val streaming = spark.table("sliding")
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
      val batch = Tables.t(spark, sf, "events")
        .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start"), col("event_type"), col("n"))
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
      assert(streaming == batch)
      assert(streaming.nonEmpty)
    } finally q.stop()
  }

  test("session windows produce gap-bounded sessions") {
    val q = EventStream.runToMemory(
      EventStream.sessionCounts(EventStream.read(spark, eventsDir)), "sessions")
    try {
      val df = spark.table("sessions")
      assert(df.count() > 0)
      // every session spans >= 1 event and end >= start
      assert(df.filter(col("s_end") < col("s_start")).count() == 0)
      val totalEvents = df.agg(sum("n_events")).head.getLong(0)
      assert(totalEvents == Tables.t(spark, sf, "events").count())
    } finally q.stop()
  }

  test("streaming dedup drops in-watermark duplicate keys") {
    val q = EventStream.runToMemory(
      EventStream.dedupStream(EventStream.read(spark, eventsDir)), "dedup",
      org.apache.spark.sql.streaming.OutputMode.Append())
    try {
      val streamed = spark.table("dedup").count()
      val batchDistinct = Tables.t(spark, sf, "events")
        .dropDuplicates("user_id", "event_type", "value").count()
      val total = Tables.t(spark, sf, "events").count()
      // all events arrive within one batch => watermark never expires state,
      // so the streaming result equals a batch distinct
      assert(streamed == batchDistinct, s"$streamed vs $batchDistinct")
      assert(streamed <= total)
    } finally q.stop()
  }

  test("stream-stream interval join equals the batch join") {
    val src = EventStream.read(spark, eventsDir)
    val q = EventStream.runToMemory(
      EventStream.streamStreamJoin(
        src.filter(col("event_type") === "purchase"),
        src.filter(col("event_type") === "view")),
      "ssjoin", org.apache.spark.sql.streaming.OutputMode.Append())
    try {
      val streamed = spark.table("ssjoin").count()
      val ev = Tables.t(spark, sf, "events")
      val p = ev.filter(col("event_type") === "purchase").select(
        col("event_id").as("pid"), col("user_id").as("pu"), col("ts").as("pts"))
      val v = ev.filter(col("event_type") === "view").select(
        col("event_id").as("vid"), col("user_id").as("vu"), col("ts").as("vts"))
      val batch = p.join(v, col("pu") === col("vu") &&
        col("vts") >= col("pts") - expr("INTERVAL 1 HOUR") &&
        col("vts") <= col("pts")).count()
      assert(streamed == batch, s"$streamed vs $batch")
      assert(streamed > 0)
    } finally q.stop()
  }

  test("stateful running totals see every event exactly once") {
    val q = EventStream.runToMemory(
      EventStream.runningTotals(EventStream.read(spark, eventsDir)).toDF(),
      "running", OutputMode.Update())
    try {
      // final state per user: n sums to total event count
      val last = spark.table("running")
        .groupBy("user_id").agg(max("n").as("n"))
      val total = last.agg(sum("n")).head.getLong(0)
      assert(total == Tables.t(spark, sf, "events").count())
    } finally q.stop()
  }

  test("flatMapGroupsWithState alerts equal batch cumulative-sum crossings") {
    import org.apache.spark.sql.expressions.Window
    val threshold = 500.0
    val q = EventStream.runToMemory(
      EventStream.thresholdAlerts(EventStream.read(spark, eventsDir), threshold)
        .toDF(), "alerts", OutputMode.Append())
    try {
      val streaming = spark.table("alerts")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // batch replay: same fold order (ts, event_id) per user
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val batch = Tables.t(spark, sf, "events")
        .withColumn("cum", sum("value").over(w))
        .withColumn("prev", coalesce(lag("cum", 1).over(w), lit(0.0)))
        .filter(floor(col("cum") / threshold) > floor(col("prev") / threshold))
        .select("user_id", "event_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(streaming.nonEmpty && streaming == batch)
    } finally q.stop()
  }
}
