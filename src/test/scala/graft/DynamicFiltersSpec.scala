package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.DynamicFilters

/** DynamicFilters.semiJoinPrune — semantics identical to an IN-subquery
  * semi join across all three tiers, and the plan shape each tier promises
  * (tier 1: scan-level filter, no fact shuffle below it; tier 2: broadcast
  * LEFT SEMI, no fact-side exchange). */
class DynamicFiltersSpec extends AnyFunSuite {
  import TestSession._

  private def li = Tables.t(spark, sf, "lineitem")
  private def dim = Tables.t(spark, sf, "part")
    .where("p_size = 15").select("p_partkey")

  private lazy val expected: Long =
    li.join(dim.withColumnRenamed("p_partkey", "l_partkey").distinct(),
      Seq("l_partkey"), "left_semi").count()

  test("tier 1 (IN-list): same rows as the semi join, filter in the scan") {
    val pruned = DynamicFilters.semiJoinPrune(li, "l_partkey", dim, "p_partkey")
    assert(pruned.count() == expected)
    val plan = pruned.queryExecution.executedPlan.toString
    // the key list lands as a Filter over the scan — no join, no exchange
    assert(!plan.contains("Exchange"), plan.take(500))
    assert(!plan.contains("Join"), plan.take(500))
  }

  test("tier 2 (broadcast semi): forced by a tiny IN cap") {
    val pruned = DynamicFilters.semiJoinPrune(
      li, "l_partkey", dim, "p_partkey", maxInKeys = 1)
    assert(pruned.count() == expected)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"),
      plan.take(800))
    // the FACT side never exchanges: the only shuffle allowed is none —
    // broadcast distributes the dim keys without repartitioning the fact
    assert(!plan.contains("ShuffleExchange") &&
      !plan.contains("Exchange hashpartitioning(l_partkey"), plan.take(800))
  }

  test("tier 3 (shuffled semi): forced by tiny caps, still exact") {
    val pruned = DynamicFilters.semiJoinPrune(
      li, "l_partkey", dim, "p_partkey", maxInKeys = 1, maxBroadcastKeys = 1)
    assert(pruned.count() == expected)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), plan.take(800))
  }

  test("NULL handling matches IN-subquery WHERE semantics") {
    import spark.implicits._
    val fact = Seq[(java.lang.Long, String)](
      (1L, "a"), (2L, "b"), (null, "c"), (4L, "d")).toDF("k", "v")
    val d = Seq[java.lang.Long](1L, null, 4L).toDF("dk")
    fact.createOrReplaceTempView("df_fact"); d.createOrReplaceTempView("df_dim")
    val viaIn = spark.sql(
      "SELECT v FROM df_fact WHERE k IN (SELECT dk FROM df_dim)")
      .collect().map(_.getString(0)).sorted.toSeq
    for (cap <- Seq(10, 1)) {
      val got = DynamicFilters.semiJoinPrune(fact, "k", d, "dk", maxInKeys = cap)
        .collect().map(_.getString(1)).sorted.toSeq
      assert(got == viaIn, s"cap=$cap: $got vs $viaIn")
    }
  }

  test("empty dim side yields empty result in every tier") {
    val none = dim.where("p_partkey < 0")
    for ((ik, bk) <- Seq((10, 10L), (0, 10L), (0, 0L))) {
      assert(DynamicFilters.semiJoinPrune(li, "l_partkey", none, "p_partkey",
        maxInKeys = ik, maxBroadcastKeys = bk).count() == 0)
    }
  }
}
