package graft

import org.scalatest.funsuite.AnyFunSuite

/** Memory/time contract of the dynamic-frame lowering
  * (PrestoSql.dynamicFrames).
  *
  * Per-row frame bounds lower to ONE unbounded collect_list per window plus
  * a per-row slice. The collected array is O(partition) heap — same
  * asymptotic bound as the reference's WindowOperator, whose PagesIndex
  * also materializes the full partition
  * (presto-main/src/main/java/com/facebook/presto/operator/WindowOperator.java).
  * TIME is worse than the reference: every WindowExec output row serializes
  * the full array into its UnsafeRow, so a single partition costs
  * O(rows²) bytes — measured (tools/DynFrameProbe): 10k rows 1.8 s,
  * 20k 5.8 s, 40k 22 s on local[8]. The practical per-PARTITION bound is
  * therefore ~10⁴–10⁵ rows; partition-parallel workloads (the normal case)
  * scale in the number of partitions. The designed scale path for larger
  * single partitions is the zero-copy group-join form (aggregate the
  * partition to one array row, join back, slice inside the join's codegen
  * stage) — not wired, documented here and in the lowering's scaladoc.
  *
  * The bound test pins the contract: a 20k-row SINGLE partition (the
  * pathological no-parallelism case) completes well inside the suite
  * budget with correct per-row results.
  */
class DynamicFramesSpec extends AnyFunSuite {
  import TestSession._

  test("20k-row single partition completes and matches a direct computation") {
    val n = 20000
    val e = Engine(spark)
    e.spark.range(n.toLong).selectExpr("id AS i", "id % 97 AS v")
      .createOrReplaceTempView("dynframe_big")
    // per-row bounds: mod(i,3) PRECEDING .. mod(i,5) FOLLOWING over one
    // global partition, ordered by i
    val rows = e.sql(
      """SELECT i, sum(v) OVER (ORDER BY i
        |  ROWS BETWEEN mod(i, 3) PRECEDING AND mod(i, 5) FOLLOWING) AS s
        |FROM dynframe_big""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(rows.size == n)
    // check a spread of rows (edges + interior stride) against the definition
    val v = (0 until n).map(i => (i % 97).toLong)
    for (i <- Seq(0, 1, 2, 500, n - 6, n - 1) ++ (10000 to 10100)) {
      val lo = math.max(0, i - (i % 3))
      val hi = math.min(n - 1, i + (i % 5))
      val expect = (lo to hi).map(v).sum
      assert(rows(i.toLong) == expect, s"row $i: got ${rows(i.toLong)}, want $expect")
    }
  }
}
