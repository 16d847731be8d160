package graft

import org.scalatest.funsuite.AnyFunSuite

/** Memory/time contract of the dynamic-frame lowering
  * (PrestoSql.dynamicFrames + plans.DynamicFrameJoin).
  *
  * Per-row frame bounds lower to ONE unbounded collect_list per window plus
  * a per-row frame fold. The collected array is O(partition) heap — same
  * asymptotic bound as the reference's WindowOperator, whose PagesIndex
  * also materializes the full partition
  * (presto-main/src/main/java/com/facebook/presto/operator/WindowOperator.java).
  * Two round-8 changes cut the single-partition TIME constant:
  *
  *   - plans.DynamicFrameJoin rewrites the Window into a grouped-aggregate
  *     branch (one sorted array per partition) joined back to the rows, so
  *     WindowExec no longer serializes the O(partition) array into every
  *     output UnsafeRow (that serialization alone was O(rows²) bytes:
  *     10k rows 1.8 s / 20k 5.8 s / 40k 22 s, tools/DynFrameProbe, r7).
  *   - the lowered body folds `sequence(s0, e0)` with `element_at` reads
  *     instead of `slice`, whose interpreted eval copies the whole
  *     partition array per row.
  *
  * and DynamicFrameJoin replaces the per-row fold itself for
  *   sum/avg/count over integral values with PREFIX-ARRAY reads (running
  *   sum/count computed once per partition, frame aggregate = two
  *   element_at reads) — removing the remaining per-row lambda, whose
  *   interpreted eval pays an O(array)-per-call tax when the partition
  *   array flows through it (measured: one plain element_at per row over
  *   a broadcast 160k array is 0.3 s, the same read inside transform()
  *   is 45 s).
  *
  * Measured end state (tools/DynFrameProbe, round 8): 20k 0.53 s /
  * 40k 0.53 s / 80k 0.60 s / 160k 0.79 s / 320k 0.87 s — near-linear;
  * the round-7 single-branch form was 40 s at 80k and 180 s at 160k.
  *
  * The bound tests pin the contract: a 100k-row SINGLE partition (the
  * pathological no-parallelism case) completes in seconds — a bound the
  * measured O(rows²) curve (≥45 s quadratic extrapolation) cannot meet —
  * with correct per-row results, on both the join path and (at 20k) the
  * single-branch WindowExec fallback (`spark.graft.dynamicFrameJoin=
  * false`).
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

  test("100k-row single partition stays sub-quadratic (prefix-array path)") {
    val n = 100000
    val e = Engine(spark)
    e.spark.range(n.toLong).selectExpr("id AS i", "id % 97 AS v")
      .createOrReplaceTempView("dynframe_100k")
    val t0 = System.nanoTime()
    val got = e.sql(
      """SELECT sum(s) AS t FROM (SELECT sum(v) OVER (ORDER BY i
        |  ROWS BETWEEN mod(i, 3) PRECEDING AND mod(i, 5) FOLLOWING) AS s
        |FROM dynframe_100k)""".stripMargin).collect()(0).getLong(0)
    val secs = (System.nanoTime() - t0) / 1e9
    // exact total from the definition
    val v = (0 until n).map(i => (i % 97).toLong)
    var expect = 0L
    for (i <- 0 until n) {
      val lo = math.max(0, i - (i % 3)); val hi = math.min(n - 1, i + (i % 5))
      expect += (lo to hi).map(v).sum
    }
    assert(got == expect)
    // measured 0.6 s on the prefix path; the r7 single-branch form needed
    // ~60 s here. 20 s is loose enough for a loaded CI box, far below
    // any quadratic regression.
    assert(secs < 20.0, f"100k single partition took $secs%.1f s")
  }

  test("nullable values: sum/avg/count prefix reads match the fallback") {
    val e = Engine(spark)
    // value column with nulls — exercises the count-guard in the prefix
    // difference (an all-null frame must yield NULL sum/avg, not 0)
    e.spark.range(3000L).selectExpr(
      "id % 5 AS g", "id AS i",
      "CASE WHEN id % 3 = 0 THEN NULL ELSE id % 41 END AS v")
      .createOrReplaceTempView("dynframe_nulls")
    val q =
      """SELECT g, i,
        |  sum(v) OVER (PARTITION BY g ORDER BY i
        |    ROWS BETWEEN mod(i, 4) PRECEDING AND mod(i, 2) FOLLOWING) AS s,
        |  avg(v) OVER (PARTITION BY g ORDER BY i
        |    ROWS BETWEEN mod(i, 4) PRECEDING AND mod(i, 2) FOLLOWING) AS a,
        |  count(v) OVER (PARTITION BY g ORDER BY i
        |    ROWS BETWEEN mod(i, 4) PRECEDING AND mod(i, 2) FOLLOWING) AS c,
        |  count(*) OVER (PARTITION BY g ORDER BY i
        |    ROWS BETWEEN mod(i, 4) PRECEDING AND mod(i, 2) FOLLOWING) AS cs
        |FROM dynframe_nulls""".stripMargin
    def run(): Map[(Long, Long), (Any, Any, Long, Long)] =
      e.sql(q).collect()
        .map(r => (r.getLong(0), r.getLong(1)) ->
          (r.get(2), r.get(3), r.getLong(4), r.getLong(5))).toMap
    val joined = run()
    spark.conf.set(plans.DynamicFrameJoin.KEY, "false")
    val fallback = try run() finally spark.conf.unset(plans.DynamicFrameJoin.KEY)
    assert(joined.size == fallback.size)
    for ((key, fb) <- fallback)
      assert(joined(key) == fb, s"row $key: join path ${joined(key)}, fallback $fb")
  }

  test("leading all-NULL prefix: single-aggregate sum takes the prefix path and stays correct") {
    val e = Engine(spark)
    // The round-8 bug: the running-sum prefix array is NULL over a leading
    // all-NULL run, so an unguarded P[e0]−P[s0−1] subtrahend poisoned any
    // frame whose start sits past the run. A SINGLE sum/avg aggregate is
    // the shape that engages the prefix-read replacement (the 4-aggregate
    // equivalence test above does not), and partition g=0 here starts with
    // rows 0,5,10,15 all NULL — frames beginning past them must still sum.
    e.spark.range(200L).selectExpr(
      "id % 4 AS g", "id AS i",
      "CASE WHEN id < 16 AND id % 4 = 0 THEN NULL " +
        "WHEN id % 7 = 0 THEN NULL ELSE id % 31 END AS v")
      .createOrReplaceTempView("dynframe_nullrun")
    def q(fn: String) =
      s"""SELECT g, i, $fn(v) OVER (PARTITION BY g ORDER BY i
         |  ROWS BETWEEN mod(i, 5) PRECEDING AND mod(i, 3) FOLLOWING) AS s
         |FROM dynframe_nullrun""".stripMargin
    for (fn <- Seq("sum", "avg")) {
      val df = e.sql(q(fn))
      // plan pin: the optimized plan took the prefix form — a group join
      // whose root projection does per-row element_at reads, with no
      // per-row lambda (ArrayTransform) left in it
      val opt = df.queryExecution.optimizedPlan
      import org.apache.spark.sql.catalyst.plans.logical.{Join, Project}
      import org.apache.spark.sql.catalyst.expressions.{ArrayTransform, ElementAt}
      assert(opt.exists(_.isInstanceOf[Join]), s"$fn: expected group-join form")
      val root = opt.collectFirst { case p: Project => p }.get
      assert(root.projectList.exists(_.exists(_.isInstanceOf[ElementAt])),
        s"$fn: root projection should read the prefix arrays")
      assert(!root.projectList.exists(_.exists(_.isInstanceOf[ArrayTransform])),
        s"$fn: per-row lambda survived — prefix replacement did not engage")
      def run(): Map[(Long, Long), Any] =
        df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.get(2)).toMap
      val joined = run()
      spark.conf.set(plans.DynamicFrameJoin.KEY, "false")
      val fallback =
        try e.sql(q(fn)).collect()
          .map(r => (r.getLong(0), r.getLong(1)) -> r.get(2)).toMap
        finally spark.conf.unset(plans.DynamicFrameJoin.KEY)
      assert(joined.size == fallback.size)
      for ((key, fb) <- fallback)
        assert(joined(key) == fb, s"$fn row $key: join ${joined(key)}, fallback $fb")
    }
  }

  test("advice repro: NULL then 5, 10 — frames past the NULL run keep their sums") {
    val e = Engine(spark)
    e.spark.sql(
      "SELECT * FROM VALUES (1L, CAST(NULL AS BIGINT)), (2L, 5L), (3L, 10L) t(i, v)")
      .createOrReplaceTempView("dynframe_advice")
    val got = e.sql(
      """SELECT i, sum(v) OVER (ORDER BY i
        |  ROWS BETWEEN mod(i, 2) PRECEDING AND 0 FOLLOWING) AS s
        |FROM dynframe_advice""".stripMargin)
      .collect().map(r => (r.getLong(0), r.get(1))).toMap
    // i=1: frame [1,1] all NULL → NULL; i=2: frame [2,2] → 5 (mod(2,2)=0);
    // i=3: frame [2,3] → 15 (mod(3,2)=1)
    assert(got(1L) == null, s"i=1: ${got(1L)}")
    assert(got(2L) == 5L, s"i=2: ${got(2L)}")
    assert(got(3L) == 15L, s"i=3: ${got(3L)}")
  }

  test("the lowered plan takes the group-join form (no per-row array window)") {
    val e = Engine(spark)
    e.spark.range(100L).selectExpr("id AS i", "id % 7 AS v")
      .createOrReplaceTempView("dynframe_pin")
    val df = e.sql(
      """SELECT i, sum(v) OVER (ORDER BY i
        |  ROWS BETWEEN mod(i, 3) PRECEDING AND 1 FOLLOWING) AS s
        |FROM dynframe_pin""".stripMargin)
    val opt = df.queryExecution.optimizedPlan
    import org.apache.spark.sql.catalyst.plans.logical.{Join, Window}
    assert(opt.exists(_.isInstanceOf[Join]), "expected the group-join rewrite")
    // no Window node computes a collect_list anymore
    val windowedCollect = opt.collect { case w: Window => w }.exists(
      _.windowExpressions.exists(_.exists {
        case a: org.apache.spark.sql.catalyst.expressions.aggregate.CollectList => true
        case _ => false
      }))
    assert(!windowedCollect, "collect_list must move off the Window node")
  }

  test("join path matches the WindowExec fallback: partitions, DESC keys, nulls, ties") {
    val e = Engine(spark)
    // grouped partitions, a DESC NULLS FIRST order key WITH nulls and ties,
    // per-row bounds on both ends — the comparator's hardest surface
    e.spark.range(4000L).selectExpr(
      "id % 7 AS g",
      "CASE WHEN id % 11 = 0 THEN NULL ELSE (id * 37) % 50 END AS k",
      "id % 13 AS v")
      .createOrReplaceTempView("dynframe_mix")
    val q =
      """SELECT g, k, v,
        |  sum(v) OVER (PARTITION BY g ORDER BY k DESC
        |    ROWS BETWEEN mod(v, 4) PRECEDING AND mod(v, 3) FOLLOWING) AS s,
        |  count(*) OVER (PARTITION BY g ORDER BY k DESC
        |    ROWS BETWEEN mod(v, 4) PRECEDING AND mod(v, 3) FOLLOWING) AS c
        |FROM dynframe_mix""".stripMargin
    // rows tying on the full (g, k, v) tuple are interchangeable under
    // any consistent total order, so compare result MULTISETS per tuple
    def run(): Map[(Long, Any, Long), Seq[(Long, Long)]] =
      e.sql(q).collect()
        .map(r => (r.getLong(0), r.get(1), r.getLong(2)) -> (r.getLong(3), r.getLong(4)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSeq.sorted).toMap
    val joined = run()
    spark.conf.set(plans.DynamicFrameJoin.KEY, "false")
    val fallback = try run() finally spark.conf.unset(plans.DynamicFrameJoin.KEY)
    assert(joined.size == fallback.size)
    for ((key, fb) <- fallback)
      assert(joined(key) == fb, s"row $key: join path ${joined(key)}, fallback $fb")
  }
}
