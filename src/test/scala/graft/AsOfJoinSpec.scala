package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The custom as-of-join operator (graft.plans.AsOfJoin): semantics vs a
  * composed window-function equivalent, null extension, and the physical
  * plan contract (AsOfJoinExec + co-partitioning exchanges). */
class AsOfJoinSpec extends AnyFunSuite {
  import TestSession._

  private lazy val purchases = Tables.t(spark, sf, "events")
    .filter(col("event_type") === "purchase")
    .select(col("event_id"), col("user_id"), col("ts"))
  private lazy val views = Tables.t(spark, sf, "events")
    .filter(col("event_type") === "view")
    .groupBy(col("user_id").as("v_user"), col("ts").as("v_ts"))
    .agg(min(col("event_id")).as("v_id"))

  test("as-of join equals the window-composed equivalent") {
    val asof = plans.AsOf.join(purchases, views,
        Seq("user_id" -> "v_user"), "ts", "v_ts")
      .select(col("event_id"), col("v_id"))
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap

    // reference: left join on key + time inequality, keep latest right
    val w = Window.partitionBy(col("event_id"))
      .orderBy(col("v_ts").desc, col("v_id"))
    val expected = purchases
      .join(views, col("user_id") === col("v_user") && col("v_ts") <= col("ts"),
        "left")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("event_id"), col("v_id"))
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap

    assert(asof.size == expected.size)
    assert(asof == expected)
    assert(asof.valuesIterator.exists(_ >= 0), "no matches at all — fixture too sparse?")
    assert(asof.valuesIterator.exists(_ == -1L) ==
      expected.valuesIterator.exists(_ == -1L))
  }

  test("physical plan uses AsOfJoinExec with co-partitioning exchanges") {
    val df = plans.AsOf.join(purchases, views,
      Seq("user_id" -> "v_user"), "ts", "v_ts")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan.take(600))
    assert("Exchange hashpartitioning".r.findAllIn(plan).size >= 2, plan.take(1200))
  }

  test("row count is exactly the left side (left semantics)") {
    val n = plans.AsOf.join(purchases, views,
      Seq("user_id" -> "v_user"), "ts", "v_ts").count()
    assert(n == purchases.count())
  }
}
