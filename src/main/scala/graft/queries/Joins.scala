package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Join surface.
  *
  * Reference: presto-main LookupJoinOperator.java:1 / HashBuilderOperator
  * .java:1 (partitioned + replicated hash joins), HashSemiJoinOperator.java:1
  * (semi), NestedLoopJoinOperator.java:1 (cross/theta), LookupOuterOperator
  * (right/full outer). Presto's REPLICATED distribution = Spark broadcast;
  * PARTITIONED = shuffled hash/sort-merge join.
  *
  * Scale notes: dimension tables (region/nation/supplier/customer-slice) are
  * broadcast explicitly — at 100 TB the fact-side stays shuffle-free for
  * those joins; fact⋈fact joins (orders⋈lineitem) shuffle on the join key,
  * which is the correct plan, and AQE handles skew at runtime.
  */
object Joins {
  private def t(s: SparkSession, d: String, n: String) = Tables.t(s, d, n)

  val queries: Map[String, Q] = Map(

    // Fact⋈fact equi-join → group agg (both sides large: shuffle on key).
    "q20_join_inner" -> Q(
      (s, d) => t(s, d, "orders")
        .join(t(s, d, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
          sum((col("l_extendedprice").cast("decimal(18,2)") *
            (lit(BigDecimal(1)).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
            .cast("decimal(18,4)")).cast("decimal(38,4)").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("o_orderpriority"),
      Some("""
        SELECT o_orderpriority,
          CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
            (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS revenue,
          count(*) AS n_items
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // Star-schema chain with broadcast dims (REPLICATED joins in Presto).
    "q21_join_star" -> Q(
      (s, d) => t(s, d, "customer")
        .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name")
        .agg(
          count(lit(1)).as("n_cust"),
          sum(col("c_acctbal").cast("decimal(18,2)")).cast("decimal(38,2)").as("sum_bal"))
        .orderBy("r_name"),
      Some("""
        SELECT r_name, count(*) AS n_cust,
          CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS sum_bal
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name ORDER BY r_name""")),

    // TPC-H Q3 shape: selective dim filter + two joins + agg + topN.
    // The revenue sum is written DECLARATIVELY in decimal; the engine's
    // ScaledLongSum rule (plans/GraftOptimizations.scala) lowers it to
    // long accumulation at plan time — round 7 hand-wrote exactly this
    // long arithmetic after MetricsPlan showed per-row BigDecimal was
    // 88 s cumulative of the sf30 profile (A/B 5.2 s → 4.3 s); round 8
    // moved the rewrite into the optimizer so every money sum gets it.
    // (Tested and rejected for THIS query: eager pre-join aggregation
    // 12.4 s — 43 M-group hash before the selective join; dynamic-filter
    // semi prune 7.5 s — 4.4 M-key domain, 10% selectivity, which the
    // engine rule's dim-size/ratio guards also correctly refuse.)
    "q22_tpch_q3" -> Q(
      (s, d) => t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
        .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"))
        .join(t(s, d, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .filter(col("o_orderdate") < lit("1998-03-15").cast("timestamp") &&
          col("l_shipdate") > lit("1996-03-15").cast("timestamp"))
        .groupBy("o_orderkey", "o_orderdate")
        .agg(sum((col("l_extendedprice").cast("decimal(18,2)") *
            (lit(BigDecimal(1)).cast("decimal(18,2)") -
              col("l_discount").cast("decimal(18,2)")))
            .cast("decimal(18,4)")).cast("decimal(38,4)").as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey"))
        .limit(10),
      Some("""
        SELECT o_orderkey, o_orderdate,
          CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
            (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS revenue
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-03-15'
          AND l_shipdate > TIMESTAMP '1996-03-15'
        GROUP BY o_orderkey, o_orderdate
        ORDER BY revenue DESC, o_orderkey LIMIT 10""")),

    // Left outer join, join-time extra predicate; count(col) counts matches.
    "q23_join_left" -> Q(
      (s, d) => t(s, d, "orders").as("o")
        .join(t(s, d, "lineitem").filter(col("l_quantity") > 45).as("l"),
          col("o_orderkey") === col("l_orderkey"), "left")
        .groupBy("o_orderstatus")
        .agg(
          count(lit(1)).as("n_rows"),
          count(col("l_orderkey")).as("n_matched"))
        .orderBy("o_orderstatus"),
      Some("""
        SELECT o_orderstatus, count(*) AS n_rows, count(l_orderkey) AS n_matched
        FROM orders LEFT JOIN (SELECT * FROM lineitem WHERE l_quantity > 45) l
          ON o_orderkey = l_orderkey
        GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // Semi join (HashSemiJoinOperator.java:1) — EXISTS.
    "q24_join_semi" -> Q(
      (s, d) => t(s, d, "customer")
        .join(t(s, d, "orders").filter(col("o_totalprice") > 200000),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"))
        .orderBy("c_mktsegment"),
      Some("""
        SELECT c_mktsegment, count(*) AS n
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000)
        GROUP BY c_mktsegment ORDER BY c_mktsegment""")),

    // Anti join — NOT EXISTS (filtered build side so some customers match).
    "q25_join_anti" -> Q(
      (s, d) => t(s, d, "customer")
        .join(t(s, d, "orders").filter(col("o_totalprice") > 400000),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"), countDistinct(col("c_nationkey")).as("n_nations"))
        .orderBy("c_mktsegment"),
      Some("""
        SELECT c_mktsegment, count(*) AS n, count(DISTINCT c_nationkey) AS n_nations
        FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
        GROUP BY c_mktsegment ORDER BY c_mktsegment""")),

    // Cross join (NestedLoopJoinOperator.java:1) — tiny×tiny, broadcast NLJ.
    "q26_join_cross" -> Q(
      (s, d) => t(s, d, "nation").crossJoin(broadcast(t(s, d, "region")))
        .groupBy("n_name")
        .agg(count(lit(1)).as("n"),
          sum(col("r_regionkey").cast("long")).cast("long").as("sum_rk"))
        .orderBy("n_name"),
      Some("""
        SELECT n_name, count(*) AS n, CAST(sum(r_regionkey) AS BIGINT) AS sum_rk
        FROM nation CROSS JOIN region
        GROUP BY n_name ORDER BY n_name""")),

    // Full outer join between two aggregated sides with disjoint key ranges.
    "q27_join_full" -> Q(
      (s, d) => {
        val hi = t(s, d, "orders").filter(col("o_totalprice") > 250000)
          .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_hi"))
        val lo = t(s, d, "orders").filter(col("o_totalprice") < 50000)
          .groupBy(col("o_custkey").as("lo_custkey")).agg(count(lit(1)).as("n_lo"))
        hi.join(lo, col("o_custkey") === col("lo_custkey"), "full")
          .select(
            coalesce(col("o_custkey"), col("lo_custkey")).as("custkey"),
            coalesce(col("n_hi"), lit(0L)).as("n_hi"),
            coalesce(col("n_lo"), lit(0L)).as("n_lo"))
          .orderBy("custkey")
      },
      Some("""
        SELECT coalesce(hi.o_custkey, lo.lo_custkey) AS custkey,
          coalesce(hi.n_hi, 0) AS n_hi, coalesce(lo.n_lo, 0) AS n_lo
        FROM (SELECT o_custkey, count(*) AS n_hi FROM orders
              WHERE o_totalprice > 250000 GROUP BY o_custkey) hi
        FULL OUTER JOIN (SELECT o_custkey AS lo_custkey, count(*) AS n_lo FROM orders
              WHERE o_totalprice < 50000 GROUP BY o_custkey) lo
          ON hi.o_custkey = lo.lo_custkey
        ORDER BY custkey""")),

    // Non-equi (theta) residual on an equi join: band join on time
    // (SortedPositionLinks.java:39 is Presto's optimized variant; Spark
    // evaluates the residual inside the hash join on the user_id key).
    "q28_join_band" -> Q(
      (s, d) => {
        val e1 = t(s, d, "events").select(
          col("user_id"), col("ts").as("ts1"), col("event_id").as("id1"))
        val e2 = t(s, d, "events").select(
          col("user_id").as("uid2"), col("ts").as("ts2"), col("event_id").as("id2"))
        e1.join(e2,
          col("user_id") === col("uid2") && col("id1") =!= col("id2") &&
            col("ts2") >= col("ts1") &&
            col("ts2") < col("ts1") + expr("INTERVAL 5 MINUTES"))
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_pairs"))
          .orderBy("user_id")
      },
      Some("""
        SELECT e1.user_id, count(*) AS n_pairs
        FROM events e1 JOIN events e2
          ON e1.user_id = e2.user_id AND e1.event_id <> e2.event_id
          AND e2.ts >= e1.ts AND e2.ts < e1.ts + INTERVAL 5 MINUTE
        GROUP BY e1.user_id ORDER BY e1.user_id""")),

    // Right outer join (LookupOuterOperator): unmatched build rows emitted.
    "q29_join_right" -> Q(
      (s, d) => t(s, d, "orders").filter(col("o_orderstatus") === "P")
        .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"), "right")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"), count(col("o_orderkey")).as("n_orders"))
        .orderBy("c_mktsegment"),
      Some("""
        SELECT c_mktsegment, count(*) AS n, count(o_orderkey) AS n_orders
        FROM (SELECT * FROM orders WHERE o_orderstatus = 'P') o
        RIGHT JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment ORDER BY c_mktsegment"""))
  )
}
