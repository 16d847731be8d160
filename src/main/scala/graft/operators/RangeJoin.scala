package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Grid-bucketed interval join — the scale path for time-band/theta joins
  * (the class the reference probes with SortedPositionLinks inside its hash
  * join, SortedPositionLinks.java:39).
  *
  * A naive `p.ts BETWEEN i.start AND i.end` join is a nested-loop (O(n·m)
  * per key). Bucketing time into fixed grid cells turns it into an
  * EQUI-join: each interval explodes to the cells it covers, each point
  * maps to exactly one cell, the join runs hash-partitioned on
  * (key, cell), and the exact BETWEEN predicate remains as a residual.
  * A point meets an interval in exactly one cell (its own), so no dedup
  * is needed. Shuffle volume: points × 1 + intervals × cells-covered —
  * linear, AQE-skew-splittable, instead of a per-key cross product.
  */
object RangeJoin {

  /** Join `points` to `intervals` on equal `keys` and
    * pointTs ∈ [start, end]. `bucketSeconds` trades explode factor
    * (long intervals → more cells) against residual selectivity; pick it
    * near the typical interval length. */
  def intervalJoin(
      points: DataFrame, intervals: DataFrame,
      pointTs: String, start: String, end: String,
      keys: Seq[(String, String)], bucketSeconds: Long): DataFrame = {
    val cell: Column => Column = t => floor(unix_micros(t) / (bucketSeconds * 1000000L))
    val p = points.withColumn("__cell", cell(col(pointTs)))
    val i = intervals.withColumn("__cell",
      explode(sequence(cell(col(start)), cell(col(end)))))
    val keyCond = keys.map { case (pk, ik) => p(pk) === i(ik) }
      .foldLeft(p("__cell") === i("__cell"))(_ && _)
    p.join(i, keyCond &&
        p(pointTs) >= i(start) && p(pointTs) <= i(end))
      .drop("__cell")
  }

  private def ev(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.t(s, d, "events")

  val queries: Map[String, Q] = Map(

    // Views landing inside the hour before each purchase — identical
    // semantics to a BETWEEN theta join (the oracle), but planned as a
    // hash equi-join on (user, grid cell).
    "e06_interval_join" -> Q(
      (s, d) => {
        val views = ev(s, d).filter(col("event_type") === "view")
          .select(col("event_id").as("view_id"), col("user_id"), col("ts"))
        val purchases = ev(s, d).filter(col("event_type") === "purchase")
          .select(col("event_id").as("purchase_id"),
            col("user_id").as("p_user"),
            (col("ts") - expr("INTERVAL 1 HOUR")).as("w_start"),
            col("ts").as("w_end"))
        RangeJoin.intervalJoin(views, purchases,
            "ts", "w_start", "w_end",
            Seq("user_id" -> "p_user"), bucketSeconds = 3600)
          .select(col("purchase_id"), col("view_id"), col("user_id"))
          .orderBy("purchase_id", "view_id")
      },
      Some("""
        WITH v AS (
          SELECT event_id AS view_id, user_id, ts FROM events
          WHERE event_type = 'view'),
        p AS (
          SELECT event_id AS purchase_id, user_id AS p_user,
            ts - INTERVAL 1 HOUR AS w_start, ts AS w_end
          FROM events WHERE event_type = 'purchase')
        SELECT purchase_id, view_id, user_id
        FROM v JOIN p
          ON v.user_id = p.p_user AND v.ts >= p.w_start AND v.ts <= p.w_end
        ORDER BY purchase_id, view_id"""))
  )
}
