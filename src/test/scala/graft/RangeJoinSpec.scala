package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Grid-bucketed interval join: equals the naive theta join, and plans as
  * a hash equi-join (no nested-loop) — the property that makes it viable
  * at scale. */
class RangeJoinSpec extends AnyFunSuite {
  import TestSession._
  import operators.RangeJoin

  private lazy val views = Tables.t(spark, sf, "events")
    .filter(col("event_type") === "view")
    .select(col("event_id").as("view_id"), col("user_id"), col("ts"))
  private lazy val purchases = Tables.t(spark, sf, "events")
    .filter(col("event_type") === "purchase")
    .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
      (col("ts") - expr("INTERVAL 1 HOUR")).as("w_start"), col("ts").as("w_end"))

  test("bucketed interval join equals the naive theta join") {
    val bucketed = RangeJoin.intervalJoin(views, purchases,
        "ts", "w_start", "w_end", Seq("user_id" -> "p_user"), 3600)
      .select("purchase_id", "view_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = views.join(purchases,
        col("user_id") === col("p_user") &&
          col("ts") >= col("w_start") && col("ts") <= col("w_end"))
      .select("purchase_id", "view_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bucketed == naive)
    assert(bucketed.nonEmpty)
  }

  test("bucketed interval join plans as a hash join, not nested-loop") {
    val plan = RangeJoin.intervalJoin(views, purchases,
      "ts", "w_start", "w_end", Seq("user_id" -> "p_user"), 3600)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan.take(800))
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"),
      plan.take(800))
  }

  test("odd bucket sizes still cover boundary-straddling intervals") {
    // bucket much smaller and much larger than the interval length
    Seq(120L, 86400L).foreach { b =>
      val n = RangeJoin.intervalJoin(views, purchases,
        "ts", "w_start", "w_end", Seq("user_id" -> "p_user"), b).count()
      val expect = RangeJoin.intervalJoin(views, purchases,
        "ts", "w_start", "w_end", Seq("user_id" -> "p_user"), 3600).count()
      assert(n == expect, s"bucket=$b: $n vs $expect")
    }
  }
}
