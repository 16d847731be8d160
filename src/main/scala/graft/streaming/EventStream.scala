package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

/** Structured Streaming extension (SURVEY §2.10: the reference has NO
  * streaming runtime — Kafka topics are bounded scans — so this module is
  * the beyond-parity extension, not reference parity).
  *
  * The batch operators in graft.operators.Events use the same `window()` /
  * sessionization semantics; these lift them onto readStream with
  * watermarks. Tested by streaming the events fixture through a file source
  * into a memory sink (see StreamingSpec).
  */
object EventStream {

  val eventSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("user_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("event_type", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("value", org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("props", org.apache.spark.sql.types.StringType)))

  /** File-based event stream (parquet dir; one file per micro-batch works
    * for tests — a Kafka source swaps in via format("kafka") unchanged). */
  def read(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(eventSchema).parquet(dir)

  /** Tumbling-window counts with late-data handling via watermark. */
  def tumblingCounts(events: DataFrame, window_ : String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("w_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Sliding (hopping) windows: each event lands in window/slide
    * overlapping windows; watermark bounds state as with tumbling. */
  def slidingCounts(events: DataFrame, window_ : String = "1 hour",
      slide: String = "30 minutes", watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_, slide), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("w_start"), col("event_type"), col("n"))

  /** Session windows via the built-in session_window (gap-based). */
  def sessionCounts(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("s_start"),
        col("session_window.end").as("s_end"), col("user_id"), col("n_events"))

  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double, props: String)
  case class UserRunning(user_id: Long, n: Long, total: Double)

  /** Custom state machine per key — running per-user aggregate via
    * mapGroupsWithState (the KeyValueGroupedDataset stateful path). */
  def runningTotals(events: DataFrame): Dataset[UserRunning] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.as[Event]
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserRunning, UserRunning](GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[Event], state: GroupState[UserRunning]) =>
          val prev = state.getOption.getOrElse(UserRunning(uid, 0L, 0.0))
          var n = prev.n
          var total = prev.total
          rows.foreach { e => n += 1; total += e.value }
          val next = UserRunning(uid, n, total)
          state.update(next)
          next
      }
  }

  case class Alert(user_id: Long, event_id: Long, cum_value: Double)

  /** flatMapGroupsWithState — the 0..n-outputs-per-group stateful path
    * (mapGroupsWithState emits exactly one): keep a per-user running sum of
    * `value` and emit an alert for EACH event that pushes the cumulative
    * total across a multiple of `threshold`. State per key is one double,
    * folded in (ts, event_id) order so replays are deterministic. */
  def thresholdAlerts(events: DataFrame, threshold: Double): Dataset[Alert] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Double, Alert](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[Event], state: GroupState[Double]) =>
          var total = state.getOption.getOrElse(0.0)
          val alerts = Seq.newBuilder[Alert]
          rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
            val before = math.floor(total / threshold)
            total += e.value
            if (math.floor(total / threshold) > before)
              alerts += Alert(uid, e.event_id, total)
          }
          state.update(total)
          alerts.result().iterator
      }
  }

  /** Streaming dedup — the training-pipeline shape on a live stream: keep
    * the first event per (user_id, event_type, value) key, with a watermark
    * bounding how long keys stay in state (without it, state grows without
    * bound at 100 TB/day event rates). */
  def dedupStream(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("user_id", "event_type", "value")

  /** Stream-stream interval join: purchases matched to the same user's
    * views within the preceding hour. Watermarks on BOTH sides bound the
    * join state (Spark evicts buffered rows once the other side's
    * watermark passes the interval) — without them state is unbounded. */
  def streamStreamJoin(purchases: DataFrame, views: DataFrame): DataFrame = {
    val p = purchases.withWatermark("ts", "2 hours").alias("p")
    val v = views.withWatermark("ts", "2 hours").alias("v")
    p.join(v, expr(
      """p.user_id = v.user_id AND
         v.ts BETWEEN p.ts - INTERVAL 1 HOUR AND p.ts"""))
      .select(col("p.event_id").as("purchase_id"),
        col("p.user_id").as("user_id"),
        col("v.event_id").as("view_id"), col("p.ts").as("purchase_ts"))
  }

  /** Run a streaming query into a named memory sink, synchronously
    * processing everything available (the test/demo driver). */
  def runToMemory(df: DataFrame, name: String,
      mode: OutputMode = OutputMode.Complete()): StreamingQuery = {
    val q = df.writeStream
      .outputMode(mode)
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q
  }
}
