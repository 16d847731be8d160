package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Event-stream processing as batch (the reference has no streaming runtime —
  * SURVEY §2.10: Kafka/Redis topics are bounded scans in Presto 0.206), plus
  * the Structured Streaming extension lives in graft.streaming.
  *
  * Tumbling windows use `window(ts, …)` — the same expression Structured
  * Streaming uses, so these plans lift to readStream unchanged.
  */
object Events {

  private def ev(s: SparkSession, d: String) = Tables.t(s, d, "events")

  val queries: Map[String, Q] = Map(

    // Tumbling 1-hour window aggregation per event type.
    "e01_tumbling_window" -> Q(
      (s, d) => ev(s, d)
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,4)")).cast("decimal(38,4)").as("sum_value"),
          countDistinct(col("user_id")).as("n_users"))
        .select(col("window.start").as("w_start"), col("event_type"),
          col("n"), col("sum_value"), col("n_users"))
        .orderBy("w_start", "event_type"),
      Some("""
        SELECT time_bucket(INTERVAL '1 hour', ts) AS w_start, event_type,
          count(*) AS n,
          CAST(sum(CAST(value AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS sum_value,
          count(DISTINCT user_id) AS n_users
        FROM events GROUP BY 1, 2 ORDER BY w_start, event_type""")),

    // Sliding windows: 2h window every 1h (each event lands in 2 windows).
    "e02_sliding_window" -> Q(
      (s, d) => ev(s, d)
        .groupBy(window(col("ts"), "2 hours", "1 hour"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start").as("w_start"), col("n"))
        .orderBy("w_start"),
      Some("""
        SELECT w_start, count(*) AS n FROM (
          SELECT time_bucket(INTERVAL '1 hour', ts) AS b, ts FROM events),
          LATERAL (VALUES (b), (b - INTERVAL '1 hour')) AS w(w_start)
        GROUP BY w_start ORDER BY w_start""")),

    // Sessionization: 30-minute inactivity gap starts a new session; emits
    // per-session stats. lag + conditional cumsum — one shuffle on user_id.
    "e03_sessionize" -> Q(
      (s, d) => {
        val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        val sessions = ev(s, d)
          .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
          .withColumn("new_sess",
            when(col("prev_ts").isNull ||
              unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > 1800, 1L)
              .otherwise(0L))
          .withColumn("sess_id", sum(col("new_sess")).over(
            byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        sessions.groupBy("user_id", "sess_id")
          .agg(count(lit(1)).as("n_events"),
            min(col("ts")).as("sess_start"),
            (unix_timestamp(max(col("ts"))) - unix_timestamp(min(col("ts"))))
              .as("duration_s"))
          .orderBy("user_id", "sess_id")
      },
      Some("""
        WITH marked AS (
          SELECT user_id, event_id, ts,
            CASE WHEN lag(ts) OVER w IS NULL
                 OR CAST(floor(epoch(ts)) AS BIGINT) -
                    CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT) > 1800
                 THEN 1 ELSE 0 END AS new_sess
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        sess AS (
          SELECT user_id, ts,
            CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess_id
          FROM marked)
        SELECT user_id, sess_id, count(*) AS n_events,
          min(ts) AS sess_start,
          CAST(floor(epoch(max(ts))) - floor(epoch(min(ts))) AS BIGINT) AS duration_s
        FROM sess GROUP BY user_id, sess_id ORDER BY user_id, sess_id""")),

    // Funnel / ordered-event analysis: first view→purchase per user.
    "e04_funnel" -> Q(
      (s, d) => {
        val firstOf = (et: String) => min(when(col("event_type") === et, col("ts")))
        ev(s, d).groupBy("user_id")
          .agg(firstOf("view").as("first_view"),
            firstOf("purchase").as("first_purchase"),
            count(lit(1)).as("n_events"))
          .withColumn("converted",
            col("first_view").isNotNull && col("first_purchase").isNotNull &&
              col("first_purchase") > col("first_view"))
          .orderBy("user_id")
      },
      Some("""
        SELECT user_id,
          min(CASE WHEN event_type = 'view' THEN ts END) AS first_view,
          min(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase,
          count(*) AS n_events,
          (min(CASE WHEN event_type = 'view' THEN ts END) IS NOT NULL AND
           min(CASE WHEN event_type = 'purchase' THEN ts END) IS NOT NULL AND
           min(CASE WHEN event_type = 'purchase' THEN ts END) >
             min(CASE WHEN event_type = 'view' THEN ts END)) AS converted
        FROM events GROUP BY user_id ORDER BY user_id""")),

    // Time-series gap filling: a dense per-user hourly spine (sequence +
    // explode — generated, never materialized on the driver) left-joined
    // with hourly aggregates, missing hours forward-filled by
    // last(ignoreNulls) over the time window. The sensor/event resampling
    // operator every telemetry pipeline runs; spine size = users × hours
    // regardless of event volume.
    "e08_gap_fill" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val all = ev(s, d)
        val e = all.filter(col("user_id") < 5)
        val b = all.agg(date_trunc("hour", min(col("ts"))).as("lo"),
          date_trunc("hour", max(col("ts"))).as("hi"))
        val spine = e.select(col("user_id")).distinct()
          .crossJoin(broadcast(b))
          .select(col("user_id"),
            explode(sequence(col("lo"), col("hi"),
              expr("INTERVAL 1 HOUR"))).as("h"))
        val hourly = e
          .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("h"))
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast("decimal(18,4)")).cast("decimal(38,4)").as("sv"))
        val w = Window.partitionBy("user_id").orderBy("h")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        spine.join(hourly, Seq("user_id", "h"), "left")
          .select(col("user_id"), col("h"),
            coalesce(col("n"), lit(0L)).cast("long").as("n"),
            last(col("sv"), ignoreNulls = true).over(w).as("filled"))
          .orderBy("user_id", "h")
      },
      Some("""
        WITH b AS (SELECT date_trunc('hour', min(ts)) AS lo,
                          date_trunc('hour', max(ts)) AS hi FROM events),
        u AS (SELECT DISTINCT user_id FROM events WHERE user_id < 5),
        spine AS (
          SELECT u.user_id, s.h
          FROM u, b, unnest(generate_series(b.lo, b.hi, INTERVAL '1 hour')) AS s(h)),
        hourly AS (
          SELECT user_id, date_trunc('hour', ts) AS h,
            CAST(count(*) AS BIGINT) AS n,
            CAST(sum(CAST(value AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS sv
          FROM events WHERE user_id < 5 GROUP BY 1, 2)
        SELECT s.user_id, s.h, coalesce(n, 0) AS n,
          last_value(sv IGNORE NULLS) OVER (PARTITION BY s.user_id ORDER BY s.h
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
        FROM spine s
        LEFT JOIN hourly ON s.user_id = hourly.user_id AND s.h = hourly.h
        ORDER BY s.user_id, s.h""")),

    // Retention cohorts — the classic product-analytics grid: users
    // bucketed by first-active day, counted distinct per (cohort, days
    // since first seen). Two shuffles at any scale: first-seen per user,
    // then the (cohort, day_n) count. Integer day arithmetic keeps the
    // grid hash-exact.
    "e07_retention_cohort" -> Q(
      (s, d) => {
        val days = ev(s, d)
          .select(col("user_id"), to_date(col("ts")).as("day"))
          .distinct()
        val first = days.groupBy("user_id")
          .agg(min(col("day")).as("cohort_day"))
        days.join(first, "user_id")
          .select(col("user_id"), col("cohort_day"),
            datediff(col("day"), col("cohort_day")).as("day_n"))
          .groupBy("cohort_day", "day_n")
          .agg(count(lit(1)).cast("long").as("n_active"))
          .orderBy("cohort_day", "day_n")
      },
      Some("""
        WITH days AS (
          SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        first AS (
          SELECT user_id, min(day) AS cohort_day FROM days GROUP BY user_id)
        SELECT cohort_day,
          CAST(date_diff('day', cohort_day, day) AS INT) AS day_n,
          CAST(count(*) AS BIGINT) AS n_active
        FROM days JOIN first USING (user_id)
        GROUP BY 1, 2 ORDER BY cohort_day, day_n""")),

    // AS-OF JOIN via the custom operator stack (graft.plans.AsOfJoin:
    // logical node → strategy → co-partitioned physical merge): each
    // purchase paired with the user's latest prior-or-equal view. Right
    // side deduped per (user, ts) so ties are deterministic; DuckDB's
    // native ASOF LEFT JOIN is the oracle.
    "e05_asof_join" -> Q(
      (s, d) => {
        val purchases = ev(s, d).filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts"))
        val views = ev(s, d).filter(col("event_type") === "view")
          .groupBy(col("user_id").as("v_user"), col("ts").as("v_ts"))
          .agg(min(col("event_id")).as("v_id"))
        graft.plans.AsOf.join(purchases, views,
            Seq("user_id" -> "v_user"), "ts", "v_ts")
          .select(col("event_id"), col("user_id"), col("v_id"), col("v_ts"))
          .orderBy("event_id")
      },
      Some("""
        WITH p AS (
          SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
        v AS (
          SELECT user_id AS v_user, ts AS v_ts, min(event_id) AS v_id
          FROM events WHERE event_type = 'view' GROUP BY user_id, ts)
        SELECT p.event_id, p.user_id, v.v_id, v.v_ts
        FROM p ASOF LEFT JOIN v
          ON p.user_id = v.v_user AND v.v_ts <= p.ts
        ORDER BY p.event_id"""))
  )
}
