package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Subquery decorrelation surface.
  *
  * Reference: presto-main SubqueryPlanner.java:69 + ApplyNode.java:34 and the
  * Transform*Apply* rules (scalar / IN / EXISTS / quantified → joins),
  * EnforceSingleRowOperator.java:1. Spark: RewritePredicateSubquery /
  * RewriteCorrelatedScalarSubquery produce the same semi/anti/left-join
  * plans, so these are written in SQL — the declarative form IS the operator.
  */
object Subqueries {

  private def sql(text: String): (SparkSession, String) => org.apache.spark.sql.DataFrame =
    (s, d) => { Tables.registerAll(s, d); s.sql(text) }

  val queries: Map[String, Q] = Map(

    // Uncorrelated scalar subquery.
    "q55_scalar_subquery" -> Q(
      sql("""
        SELECT o_orderstatus, count(*) AS n
        FROM orders
        WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
        GROUP BY o_orderstatus ORDER BY o_orderstatus"""),
      Some("""
        SELECT o_orderstatus, count(*) AS n
        FROM orders
        WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
        GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // IN subquery → semi join.
    "q56_in_subquery" -> Q(
      sql("""
        SELECT l_returnflag, count(*) AS n
        FROM lineitem
        WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_totalprice > 300000)
        GROUP BY l_returnflag ORDER BY l_returnflag"""),
      Some("""
        SELECT l_returnflag, count(*) AS n
        FROM lineitem
        WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_totalprice > 300000)
        GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // NOT IN over a null-free subquery (null-aware anti join).
    "q57_not_in_subquery" -> Q(
      sql("""
        SELECT count(*) AS n
        FROM customer
        WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'P')"""),
      Some("""
        SELECT count(*) AS n
        FROM customer
        WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'P')""")),

    // Quantified comparison subqueries (Presto `> ALL` / `< ANY`,
    // TransformQuantifiedComparisonApplyToLateralJoin). Spark's parser has
    // no quantified syntax, so this runs the same decorrelation Presto's
    // rule produces: `x > ALL (S)` → `x > max(S)` (TRUE on empty S — hence
    // the -Infinity coalesce for childless groups), `x < ANY (S)` →
    // `x < max(S)`. The oracle uses DuckDB's NATIVE quantified syntax, so
    // the rewrite is checked against the real ALL/ANY semantics, not
    // against itself. (Null-free subqueries: fixture balances are non-null;
    // with NULLs, ALL/ANY go three-valued and the max-rewrite would need a
    // null-count guard.)
    "q62_quantified" -> Q(
      sql("""
        SELECT s_suppkey, s_name, round(s_acctbal, 2) AS acctbal
        FROM supplier
        WHERE s_acctbal > coalesce(
            (SELECT max(c_acctbal) FROM customer
             WHERE c_nationkey = s_nationkey AND c_mktsegment = 'BUILDING'),
            CAST('-Infinity' AS DOUBLE))
          AND s_acctbal < (SELECT max(c_acctbal * 2) FROM customer)
        ORDER BY s_suppkey"""),
      Some("""
        SELECT s_suppkey, s_name, round(s_acctbal, 2) AS acctbal
        FROM supplier
        WHERE s_acctbal > ALL (SELECT c_acctbal FROM customer
                               WHERE c_nationkey = s_nationkey
                                 AND c_mktsegment = 'BUILDING')
          AND s_acctbal < ANY (SELECT c_acctbal * 2 FROM customer)
        ORDER BY s_suppkey""")),

    // Correlated scalar subquery (TransformCorrelatedScalarAggregationToJoin).
    "q58_correlated_scalar" -> Q(
      sql("""
        SELECT c_nationkey, count(*) AS n_above_nation_avg
        FROM customer c
        WHERE c_acctbal > (SELECT avg(c2.c_acctbal) FROM customer c2
                           WHERE c2.c_nationkey = c.c_nationkey)
        GROUP BY c_nationkey ORDER BY c_nationkey"""),
      Some("""
        SELECT c_nationkey, count(*) AS n_above_nation_avg
        FROM customer c
        WHERE c_acctbal > (SELECT avg(c2.c_acctbal) FROM customer c2
                           WHERE c2.c_nationkey = c.c_nationkey)
        GROUP BY c_nationkey ORDER BY c_nationkey""")),

    // Correlated EXISTS with an extra predicate.
    "q59_correlated_exists" -> Q(
      sql("""
        SELECT c_mktsegment, count(*) AS n
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '2000-01-01')
        GROUP BY c_mktsegment ORDER BY c_mktsegment"""),
      Some("""
        SELECT c_mktsegment, count(*) AS n
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '2000-01-01')
        GROUP BY c_mktsegment ORDER BY c_mktsegment""")),

    // Subquery in FROM + LATERAL-style correlation via join on derived table.
    "q60_derived_table" -> Q(
      sql("""
        SELECT o.o_orderpriority, count(*) AS n_big
        FROM orders o
        JOIN (SELECT l_orderkey, sum(l_quantity) AS qty
              FROM lineitem GROUP BY l_orderkey) lq
          ON lq.l_orderkey = o.o_orderkey
        WHERE lq.qty > 100
        GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority"""),
      Some("""
        SELECT o.o_orderpriority, count(*) AS n_big
        FROM orders o
        JOIN (SELECT l_orderkey, sum(l_quantity) AS qty
              FROM lineitem GROUP BY l_orderkey) lq
          ON lq.l_orderkey = o.o_orderkey
        WHERE lq.qty > 100
        GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority""")),

    // CTE / WITH clause.
    "q61_cte" -> Q(
      sql("""
        WITH nation_cust AS (
          SELECT n_name, count(*) AS n_cust, CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS bal
          FROM customer JOIN nation ON c_nationkey = n_nationkey
          GROUP BY n_name)
        SELECT n_name, n_cust, bal FROM nation_cust
        WHERE n_cust > 2 ORDER BY n_name"""),
      Some("""
        WITH nation_cust AS (
          SELECT n_name, count(*) AS n_cust, CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS bal
          FROM customer JOIN nation ON c_nationkey = n_nationkey
          GROUP BY n_name)
        SELECT n_name, n_cust, bal FROM nation_cust
        WHERE n_cust > 2 ORDER BY n_name""")),

    // DynamicSemiJoinPrune under the driver oracle — one entry per tier.
    // The production fact-size floor (64 MB) is sized for soak scale, so
    // none of the sf0.01 fixtures would exercise the rewrite; each entry
    // lowers the thresholds ON AN ISOLATED CHILD SESSION (same extensions,
    // fresh runtime conf — nothing leaks into the rest of the driver run)
    // so tier 1 (probe → inline InSet, semi join eliminated), tier 2
    // (key overflow → broadcast-hinted semi join) and the inner-join
    // variant (fact scan pre-filtered by the dim key domain) each produce
    // a hash-checked row every round. Plan shapes are pinned in
    // GraftOptimizationsSpec; these rows pin the SEMANTICS against DuckDB,
    // which plans the same SQL with no such rewrite.
    "q64_dynfilter_tier1" -> Q(
      tuned(
        graft.plans.GraftOptimizations.FACT_MIN_KEY -> "1",
        graft.plans.GraftOptimizations.RATIO_KEY -> "0")("""
        SELECT l_returnflag, count(*) AS n,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS qty
        FROM lineitem
        WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size = 15)
        GROUP BY l_returnflag ORDER BY l_returnflag"""),
      Some("""
        SELECT l_returnflag, count(*) AS n,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS qty
        FROM lineitem
        WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size = 15)
        GROUP BY l_returnflag ORDER BY l_returnflag""")),

    "q64b_dynfilter_tier2" -> Q(
      tuned(
        graft.plans.GraftOptimizations.FACT_MIN_KEY -> "1",
        graft.plans.GraftOptimizations.RATIO_KEY -> "0",
        graft.plans.GraftOptimizations.MAX_IN_KEY -> "1")("""
        SELECT l_linestatus, count(*) AS n,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS rev
        FROM lineitem
        WHERE l_suppkey IN (SELECT s_suppkey FROM supplier WHERE s_acctbal > 0)
        GROUP BY l_linestatus ORDER BY l_linestatus"""),
      Some("""
        SELECT l_linestatus, count(*) AS n,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS rev
        FROM lineitem
        WHERE l_suppkey IN (SELECT s_suppkey FROM supplier WHERE s_acctbal > 0)
        GROUP BY l_linestatus ORDER BY l_linestatus""")),

    // tier 1 with the key set past maxPushdownKeys: the InSet evaluates
    // behind the NoPushdown barrier (scan-output filter, no source
    // predicate) — the round-9 path h02 takes at soak scale
    "q64d_dynfilter_nopush" -> Q(
      tuned(
        graft.plans.GraftOptimizations.FACT_MIN_KEY -> "1",
        graft.plans.GraftOptimizations.RATIO_KEY -> "0",
        graft.plans.GraftOptimizations.MAX_PUSH_KEYS_KEY -> "1")("""
        SELECT l_returnflag, count(*) AS n,
               CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS disc
        FROM lineitem
        WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size = 23)
        GROUP BY l_returnflag ORDER BY l_returnflag"""),
      Some("""
        SELECT l_returnflag, count(*) AS n,
               CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS disc
        FROM lineitem
        WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size = 23)
        GROUP BY l_returnflag ORDER BY l_returnflag""")),

    "q64c_dynfilter_join" -> Q(
      tuned(
        graft.plans.GraftOptimizations.FACT_MIN_KEY -> "1",
        graft.plans.GraftOptimizations.RATIO_KEY -> "0")("""
        SELECT p_brand, count(*) AS n,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS rev
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_size = 15
        GROUP BY p_brand ORDER BY p_brand"""),
      Some("""
        SELECT p_brand, count(*) AS n,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS rev
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_size = 15
        GROUP BY p_brand ORDER BY p_brand"""))
  )

  /** Like [[sql]], but on a fresh child session carrying the given runtime
    * conf — used to exercise scale-gated optimizer rules at fixture scale
    * without leaking the lowered thresholds into other queries. */
  private def tuned(confs: (String, String)*)(text: String)
      : (SparkSession, String) => org.apache.spark.sql.DataFrame = (s, d) => {
    val s2 = s.newSession()
    confs.foreach { case (k, v) => s2.conf.set(k, v) }
    Tables.registerAll(s2, d)
    s2.sql(text)
  }
}
