package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed co-located join: same results as the shuffled join, with NO
  * shuffle exchange on the join path (the plan property that matters at
  * 100 TB). */
class BucketingSpec extends AnyFunSuite {
  import TestSession._
  import operators.Bucketing

  test("co-located bucketed join is shuffle-free below the aggregation") {
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      // force a non-broadcast join so the bucket path is what's planned
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      Bucketing.stageOrdersLineitem(spark, sf)
      val joined = spark.table("orders_b")
        .join(spark.table("lineitem_b"), col("o_orderkey") === col("l_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(500))
      assert(!plan.contains("Exchange"), "bucketed join must not shuffle:\n" +
        plan.linesIterator.filter(_.contains("Exchange")).mkString("\n"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }

  test("bucketed join result equals unbucketed join result") {
    Bucketing.stageOrdersLineitem(spark, sf)
    val bucketed = Bucketing.colocatedRevenue(spark).collect()
    val plain = SparkEntry.all("q20_join_inner").fn(spark, sf).collect()
    assert(bucketed.sameElements(plain))
  }
}
