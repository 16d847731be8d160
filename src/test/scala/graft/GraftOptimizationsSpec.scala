package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.GraftOptimizations._

/** Engine-path dynamic filtering + scaled-long sums: the canonical SQL a
  * user submits (no hand-wiring) must get the pruned/lowered plan from the
  * session's optimizer rules, with results identical to the rules-off run.
  * Thresholds are lowered per test (the production defaults are sized for
  * ≥64 MB facts, which sf0.001 test fixtures never reach — the same guard
  * that keeps the probe tax out of small-scale plans). */
class GraftOptimizationsSpec extends AnyFunSuite {
  import TestSession._

  private def withConf[A](kvs: (String, String)*)(body: => A): A = {
    val olds = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private val IN_SEMI_SQL =
    """SELECT l_partkey, count(*) AS n FROM lineitem
      |WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size = 15)
      |GROUP BY l_partkey""".stripMargin

  private def baseline(sql: String): Seq[String] =
    withConf(ENABLED_KEY -> "false")(rows(spark.sql(sql)))

  Tables.registerAll(spark, sf)

  test("IN-subquery tier 1: canonical SQL plans an InSet scan, no semi join") {
    val expect = baseline(IN_SEMI_SQL)
    withConf(FACT_MIN_KEY -> "1", DIM_MAX_KEY -> (256L << 20).toString,
      RATIO_KEY -> "0") {
      val df = spark.sql(IN_SEMI_SQL)
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(!optimized.contains("Join"), optimized.take(800))
      assert(optimized.contains("IN (") || optimized.contains("INSET"),
        optimized.take(800))
      assert(rows(df) == expect)
    }
  }

  test("IN-subquery tier 2: key overflow + small dim => broadcast semi join") {
    val expect = baseline(IN_SEMI_SQL)
    withConf(FACT_MIN_KEY -> "1", DIM_MAX_KEY -> (256L << 20).toString,
      RATIO_KEY -> "0", MAX_IN_KEY -> "1",
      DIM_BCAST_KEY -> (256L << 20).toString) {
      val df = spark.sql(IN_SEMI_SQL)
      val phys = df.queryExecution.executedPlan.toString
      assert(phys.contains("BroadcastHashJoin") && phys.contains("LeftSemi"),
        phys.take(1200))
      assert(rows(df) == expect)
    }
  }

  test("IN-subquery tier 3: overflow + non-broadcastable dim => plan untouched") {
    val expect = baseline(IN_SEMI_SQL)
    withConf(FACT_MIN_KEY -> "1", DIM_MAX_KEY -> (256L << 20).toString,
      RATIO_KEY -> "0", MAX_IN_KEY -> "1", DIM_BCAST_KEY -> "0") {
      val df = spark.sql(IN_SEMI_SQL)
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(optimized.contains("Join LeftSemi"), optimized.take(800))
      assert(rows(df) == expect)
    }
  }

  test("IN-subquery NULL semantics survive every tier") {
    import spark.implicits._
    Seq[(java.lang.Long, String)]((1L, "a"), (2L, "b"), (null, "c"), (4L, "d"))
      .toDF("k", "v").createOrReplaceTempView("go_fact")
    Seq[java.lang.Long](1L, null, 4L).toDF("dk")
      .createOrReplaceTempView("go_dim")
    val sql = "SELECT v FROM go_fact WHERE k IN (SELECT dk FROM go_dim)"
    val expect = baseline(sql)
    assert(expect == Seq("[a]", "[d]"))
    for (cap <- Seq("10", "1")) {
      withConf(FACT_MIN_KEY -> "1", RATIO_KEY -> "0", MAX_IN_KEY -> cap,
        DIM_BCAST_KEY -> (256L << 20).toString) {
        assert(rows(spark.sql(sql)) == expect, s"maxInKeys=$cap")
      }
    }
  }

  test("tier 1 past maxPushdownKeys: InSet behind the NoPushdown barrier, no source filter") {
    val expect = baseline(IN_SEMI_SQL)
    withConf(FACT_MIN_KEY -> "1", DIM_MAX_KEY -> (256L << 20).toString,
      RATIO_KEY -> "0", MAX_PUSH_KEYS_KEY -> "1") {
      val df = spark.sql(IN_SEMI_SQL)
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(optimized.contains("nopushdown"), optimized.take(1000))
      assert(!optimized.contains("Join"), optimized.take(1000))
      // the barrier keeps the key set OUT of the parquet source predicate
      val phys = df.queryExecution.executedPlan.toString
      assert(!phys.contains("PushedFilters: [In("), phys.take(1500))
      assert(rows(df) == expect)
    }
  }

  /** Round-16: large integral InSet probes in PHYSICAL Filters swap to
    * the unboxed InLongSet (UnboxedInProbe). The LOGICAL plan must keep
    * InSet — constraint propagation copies the predicate onto every
    * equi-joined side, and only InSet's value-equal Set dedupes there
    * (the plan-time draft put 293 key-array copies into one task
    * binary). */
  test("large integral InSet probes run as the unboxed InLongSet in the " +
      "physical filter; logical plan keeps InSet; off-switch restores") {
    val expect = baseline(IN_SEMI_SQL)
    withConf(FACT_MIN_KEY -> "1", DIM_MAX_KEY -> (256L << 20).toString,
      RATIO_KEY -> "0", MAX_PUSH_KEYS_KEY -> "1",
      "spark.sql.optimizer.inSetSwitchThreshold" -> "1") {
      val df = spark.sql(IN_SEMI_SQL)
      assert(rows(df) == expect) // finalize the adaptive plan
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(!optimized.contains("INLONGSET"), optimized.take(1000))
      assert(optimized.contains("nopushdown"), optimized.take(1000))
      val phys = df.queryExecution.executedPlan.toString
      assert(phys.contains("INLONGSET"), phys.take(1500))
      withConf(LONG_SET_KEY -> "false") {
        val off = spark.sql(IN_SEMI_SQL)
        assert(rows(off) == expect)
        val offPhys = off.queryExecution.executedPlan.toString
        assert(!offPhys.contains("INLONGSET"), offPhys.take(1500))
      }
    }
  }

  test("LongSet: unboxed membership matches a reference set (zero, " +
      "negatives, absent probes, collisions)") {
    val rnd = new scala.util.Random(42)
    val keys = (Seq(0L, 1L, -1L, Long.MaxValue, Long.MinValue) ++
      Seq.fill(100000)(rnd.nextLong())).distinct
    val ref = keys.toSet
    val ls = graft.plans.LongSet(keys)
    keys.foreach(k => assert(ls.contains(k), s"member $k"))
    val absent = Seq.fill(100000)(rnd.nextLong()).filterNot(ref)
    absent.foreach(k => assert(!ls.contains(k), s"non-member $k"))
    // zero excluded when not a member
    val noZero = graft.plans.LongSet(Seq(5L, 7L))
    assert(!noZero.contains(0L) && noZero.contains(5L) && !noZero.contains(6L))
  }

  test("join variant: selectively-filtered dim prunes the fact scan") {
    val sql =
      """SELECT p_size, count(*) AS n FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |WHERE p_size = 15 GROUP BY p_size""".stripMargin
    val expect = baseline(sql)
    withConf(FACT_MIN_KEY -> "1", RATIO_KEY -> "0") {
      val df = spark.sql(sql)
      val optimized = df.queryExecution.optimizedPlan
      // the fact (lineitem) side carries an In/InSet filter on l_partkey
      val pruned = optimized.exists(p => p.expressions.exists(_.exists {
        case org.apache.spark.sql.catalyst.expressions.In(v, _) =>
          v.references.map(_.name).toSet == Set("l_partkey")
        case org.apache.spark.sql.catalyst.expressions.InSet(v, _) =>
          v.references.map(_.name).toSet == Set("l_partkey")
        case _ => false
      }))
      assert(pruned, optimized.toString.take(1200))
      assert(rows(df) == expect)
    }
  }

  test("join variant: key overflow + countable domain => broadcast semi on the fact") {
    val sql =
      """SELECT p_size, count(*) AS n FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |WHERE p_size = 15 GROUP BY p_size""".stripMargin
    val expect = baseline(sql)
    // MAX_IN forces the literal tier to overflow; the exact key-count
    // probe then admits the broadcast-semi tier
    withConf(FACT_MIN_KEY -> "1", RATIO_KEY -> "0", MAX_IN_KEY -> "1",
      MAX_BCAST_KEYS_KEY -> "1000000") {
      val df = spark.sql(sql)
      val phys = df.queryExecution.executedPlan.toString
      assert(phys.contains("LeftSemi"), phys.take(1500))
      assert(rows(df) == expect)
    }
  }

  test("join variant: join-shaped dim falls back to the key's branch") {
    // dim = part JOIN supplier-ish shape: the join node's multiplicative
    // stats would flunk every size guard, but the selective part branch
    // holds the key — the prune must still derive from that branch
    val sql =
      """SELECT count(*) AS n FROM lineitem
        |JOIN (SELECT p_partkey, s_suppkey FROM part
        |      JOIN supplier ON p_size % 10 = s_suppkey % 10
        |      WHERE p_size = 15) pd
        |  ON l_partkey = pd.p_partkey""".stripMargin
    val expect = baseline(sql)
    withConf(FACT_MIN_KEY -> "1", RATIO_KEY -> "0",
      // dimMax tiny so the full join-dim is never probeable; the branch
      // projection (one column of part) stays under it
      DIM_MAX_KEY -> "4096") {
      val df = spark.sql(sql)
      val optimized = df.queryExecution.optimizedPlan
      val pruned = optimized.exists(p => p.expressions.exists(_.exists {
        case org.apache.spark.sql.catalyst.expressions.In(v, _) =>
          v.references.map(_.name).toSet == Set("l_partkey")
        case org.apache.spark.sql.catalyst.expressions.InSet(v, _) =>
          v.references.map(_.name).toSet == Set("l_partkey")
        case _ => false
      }))
      assert(pruned, optimized.toString.take(1500))
      assert(rows(df) == expect)
    }
  }

  test("probe memo survives freshly-built DataFrames of the same query") {
    // The round-8 h02 soak regression: LogicalRelations from two separate
    // spark.read calls on the same path have no value equality, so a memo
    // keyed on the canonicalized dim plan missed on every fresh build of
    // the same query (n bench iterations = n planning-time probes). The
    // stable key (paths + schema + size) must hit across fresh relations.
    withConf(FACT_MIN_KEY -> "1", DIM_MAX_KEY -> (256L << 20).toString,
      RATIO_KEY -> "0") {
      def build(): DataFrame = {
        spark.read.parquet(s"$sf/lineitem.parquet")
          .createOrReplaceTempView("memo_li")
        spark.read.parquet(s"$sf/part.parquet")
          .createOrReplaceTempView("memo_pt")
        spark.sql(
          """SELECT l_partkey, count(*) AS n FROM memo_li
            |WHERE l_partkey IN (SELECT p_partkey FROM memo_pt WHERE p_size = 15)
            |GROUP BY l_partkey""".stripMargin)
      }
      val first = build()
      assert(!first.queryExecution.optimizedPlan.toString.contains("Join"),
        "tier-1 rewrite should fire")
      val missesAfterFirst = probeMisses.get()
      val second = build() // fresh relations, same paths
      assert(!second.queryExecution.optimizedPlan.toString.contains("Join"))
      assert(probeMisses.get() == missesAfterFirst,
        "a freshly-built DataFrame of the same query must hit the probe memo")
    }
  }

  test("join variant: unfiltered dim is left alone (no useless probe/prune)") {
    val sql =
      """SELECT count(*) AS n FROM lineitem
        |JOIN part ON l_partkey = p_partkey""".stripMargin
    withConf(FACT_MIN_KEY -> "1", RATIO_KEY -> "0") {
      val optimized = spark.sql(sql).queryExecution.optimizedPlan
      val pruned = optimized.exists(p => p.expressions.exists(_.exists {
        case _: org.apache.spark.sql.catalyst.expressions.In => true
        case _: org.apache.spark.sql.catalyst.expressions.InSet => true
        case _ => false
      }))
      assert(!pruned, optimized.toString.take(1200))
    }
  }

  test("empty dim key domain folds the fact side to empty, not an error") {
    val sql =
      """SELECT count(*) AS n FROM lineitem
        |WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size = -1)""".stripMargin
    withConf(FACT_MIN_KEY -> "1", RATIO_KEY -> "0") {
      assert(rows(spark.sql(sql)) == Seq("[0]"))
    }
  }

  test("scaled-long sum: money sums lower to long accumulation, same values") {
    val sql =
      """SELECT l_returnflag,
        |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |    (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
        |    AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS revenue,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS qty
        |FROM lineitem GROUP BY l_returnflag""".stripMargin
    val expect = withConf(SCALED_SUM_KEY -> "false")(rows(spark.sql(sql)))
    val df = spark.sql(sql)
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("MakeDecimal"), optimized.take(1200))
    // the revenue product lowered all the way to long arithmetic: no
    // UnscaledValue wrapper left over the product, just round(x*100)
    assert(optimized.contains("round"), optimized.take(1200))
    assert(rows(df) == expect)
    // schema identical to the decimal-accumulated form
    assert(withConf(SCALED_SUM_KEY -> "false")(
      spark.sql(sql).schema.toString) == df.schema.toString)
  }

  test("scaled-long sum: window sums lower too, same values") {
    val sql =
      """SELECT o_orderkey,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
        |    OVER (PARTITION BY o_custkey) AS DECIMAL(38,2)) AS cust_total
        |FROM orders""".stripMargin
    val expect = withConf(SCALED_SUM_KEY -> "false")(rows(spark.sql(sql)))
    val df = spark.sql(sql)
    assert(df.queryExecution.optimizedPlan.toString.contains("MakeDecimal"))
    assert(rows(df) == expect)
  }

  test("scaled-long sum: DISTINCT and FILTER variants stay exact") {
    val sql =
      """SELECT
        |  CAST(sum(DISTINCT CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS dq,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2)))
        |    FILTER (WHERE l_returnflag = 'R') AS DECIMAL(38,2)) AS rq
        |FROM lineitem""".stripMargin
    val expect = withConf(SCALED_SUM_KEY -> "false")(rows(spark.sql(sql)))
    assert(rows(spark.sql(sql)) == expect)
  }

  // ---- the canonical bench entries plan the pruned shapes (PLANS.md pins:
  // round 7 got these by hand-wiring; round 8 gets them from the rule on
  // the ordinary SQL path — thresholds lowered because sf0.001 facts are
  // below the production 64 MB floor) ----

  test("canonical h02 plans the tier-1 InSet scan: no semi join remains") {
    withConf(FACT_MIN_KEY -> "1", RATIO_KEY -> "0") {
      val df = SparkEntry.all("h02_min_cost_supplier").fn(spark, sf)
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(!optimized.contains("LeftSemi"), optimized.take(1500))
      // at sf0.001 the probed part domain may be EMPTY — the prune then
      // folds the whole query to an empty LocalRelation, the maximal form
      assert(optimized.contains("INSET") || optimized.contains("IN (") ||
        optimized.contains("LocalRelation <empty>"), optimized.take(1500))
      assert(df.count() ==
        withConf(ENABLED_KEY -> "false")(
          SparkEntry.all("h02_min_cost_supplier").fn(spark, sf).count()))
    }
  }

  test("canonical h09 plans the tier-1 InSet scan at this scale") {
    withConf(FACT_MIN_KEY -> "1", RATIO_KEY -> "0") {
      val df = SparkEntry.all("h09_product_profit").fn(spark, sf)
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(!optimized.contains("LeftSemi"), optimized.take(1500))
      assert(optimized.contains("INSET") || optimized.contains("IN ("),
        optimized.take(1500))
    }
  }

  test("canonical h05 derives the transitive region→supplier→lineitem prune") {
    withConf(FACT_MIN_KEY -> "1", RATIO_KEY -> "0") {
      val df = SparkEntry.all("h05_local_supplier").fn(spark, sf)
      val optimized = df.queryExecution.optimizedPlan
      // lineitem's scan side carries an In/InSet on l_suppkey, fed by the
      // region-restricted supplier domain (the EqualityInference analogue)
      val pruned = optimized.exists(p => p.expressions.exists(_.exists {
        case org.apache.spark.sql.catalyst.expressions.In(v, _) =>
          v.references.map(_.name).toSet == Set("l_suppkey")
        case org.apache.spark.sql.catalyst.expressions.InSet(v, _) =>
          v.references.map(_.name).toSet == Set("l_suppkey")
        case _ => false
      }))
      assert(pruned, optimized.toString.take(2000))
    }
  }

  test("Engine.sql gets the same pruned plan on the dialect path") {
    withConf(FACT_MIN_KEY -> "1", RATIO_KEY -> "0") {
      val engine = Engine(spark).loadCatalog(sf)
      engine.spark.conf.set(FACT_MIN_KEY, "1")
      engine.spark.conf.set(RATIO_KEY, "0")
      val df = engine.sql(
        """SELECT count(*) AS n FROM lineitem
          |WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size = 15)""".stripMargin)
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(!optimized.contains("Join"), optimized.take(1000))
      assert(rows(df) == baseline(
        """SELECT count(*) AS n FROM lineitem
          |WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size = 15)""".stripMargin))
    }
  }

  test("scaled-long sum: sums that may exceed 18 digits are not lowered") {
    // precision 19 input: out of the contract range, stays decimal
    val sql = "SELECT sum(CAST(l_quantity AS DECIMAL(19,2))) AS s FROM lineitem"
    val optimized = spark.sql(sql).queryExecution.optimizedPlan.toString
    assert(!optimized.contains("MakeDecimal"), optimized.take(800))
  }
}
