package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** TPC-H macro suite adapted to the fixture's column subset (FIXTURES.md:
  * no partsupp, no commitdate/receiptdate/shipmode — Q2/Q4/Q11/Q12/Q16/Q20/
  * Q21 unexpressible; Q1/Q3/Q6 live in Aggregates/Joins). Mirrors the
  * reference's benchmark workload (presto-benchto-benchmarks tpch.yaml).
  *
  * All revenue sums go through decimal (order-independent, oracle-exact);
  * join shapes: dims broadcast, fact⋈fact shuffled on the join key.
  */
object TpchMacro {

  private def sql(text: String): (SparkSession, String) => DataFrame =
    (s, d) => { Tables.registerAll(s, d); s.sql(text) }

  private val REV =
    """CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
      |  (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4)))
      |  AS DECIMAL(38,4))""".stripMargin

  val queries: Map[String, Q] = {
    def both(name: String, text: String): (String, Q) =
      name -> Q(sql(text), Some(text))

    Map(
      // Q5: local supplier volume (customer and supplier in same nation).
      both("h05_local_supplier", s"""
        SELECT n_name, $REV AS revenue
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1998-01-01'
        GROUP BY n_name ORDER BY revenue DESC, n_name"""),

      // Q7: volume shipping between two nations (supplier vs customer side).
      both("h07_volume_shipping", s"""
        SELECT supp_nation, cust_nation, l_year, CAST(sum(volume) AS DECIMAL(38,4)) AS revenue
        FROM (
          SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
            CAST(year(l_shipdate) AS INT) AS l_year,
            CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
              (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4)) AS volume
          FROM supplier
          JOIN lineitem ON s_suppkey = l_suppkey
          JOIN orders ON o_orderkey = l_orderkey
          JOIN customer ON c_custkey = o_custkey
          JOIN nation n1 ON s_nationkey = n1.n_nationkey
          JOIN nation n2 ON c_nationkey = n2.n_nationkey
          WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
              OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
            AND l_shipdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1996-12-31')
        GROUP BY supp_nation, cust_nation, l_year
        ORDER BY supp_nation, cust_nation, l_year"""),

      // Q8: national market share (two-level agg over a 7-table join).
      both("h08_market_share", """
        SELECT o_year,
          round(CAST(sum(CASE WHEN nation = 'NATION_5' THEN volume ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) /
                CAST(sum(volume) AS DOUBLE), 6) AS mkt_share
        FROM (
          SELECT CAST(year(o_orderdate) AS INT) AS o_year,
            CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
              (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4)) AS volume,
            n2.n_name AS nation
          FROM part
          JOIN lineitem ON p_partkey = l_partkey
          JOIN supplier ON s_suppkey = l_suppkey
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation n1 ON c_nationkey = n1.n_nationkey
          JOIN region ON n1.n_regionkey = r_regionkey
          JOIN nation n2 ON s_nationkey = n2.n_nationkey
          WHERE r_name = 'AMERICA' AND p_type = 'STANDARD'
            AND o_orderdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1997-12-31')
        GROUP BY o_year ORDER BY o_year"""),

      // Q17: small-quantity-order revenue (correlated avg subquery on the
      // same fact table — decorrelates to a join on partkey).
      both("h17_small_quantity", """
        SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0, 4) AS avg_yearly
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#11'
          AND l_quantity < (
            SELECT 0.5 * avg(l2.l_quantity) FROM lineitem l2
            WHERE l2.l_partkey = lineitem.l_partkey)"""),

      // Q10: returned item reporting (top customers by lost revenue).
      both("h10_returned_items", s"""
        SELECT c_custkey, c_name, $REV AS revenue, n_name,
          round(c_acctbal, 4) AS acctbal
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1996-10-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
        GROUP BY c_custkey, c_name, n_name, round(c_acctbal, 4)
        ORDER BY revenue DESC, c_custkey LIMIT 20"""),

      // Q14: promotion effect (lineitem ⋈ part, conditional revenue share).
      both("h14_promo_effect", """
        SELECT round(100.00 *
            CAST(sum(CASE WHEN p_type = 'PROMO'
              THEN CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
                (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))
              ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) /
            CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
              (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))) AS DOUBLE),
          6) AS promo_revenue_pct
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1996-09-01'
          AND l_shipdate < TIMESTAMP '1996-10-01'"""),

      // Q15: top supplier by revenue (view + max scalar subquery).
      both("h15_top_supplier", s"""
        WITH revenue0 AS (
          SELECT l_suppkey AS supplier_no, $REV AS total_revenue
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate < TIMESTAMP '1996-04-01'
          GROUP BY l_suppkey)
        SELECT s_suppkey, s_name, total_revenue
        FROM supplier JOIN revenue0 ON s_suppkey = supplier_no
        WHERE total_revenue = (SELECT max(total_revenue) FROM revenue0)
        ORDER BY s_suppkey"""),

      // Q18: large-volume customers (HAVING over join + semi join back).
      both("h18_large_volume", """
        SELECT c_name, c_custkey, o_orderkey, o_orderdate,
          round(o_totalprice, 4) AS totalprice,
          CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS sum_qty
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        WHERE o_orderkey IN (
          SELECT l_orderkey FROM lineitem
          GROUP BY l_orderkey HAVING sum(l_quantity) > 150)
        GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, round(o_totalprice, 4)
        ORDER BY totalprice DESC, o_orderkey LIMIT 100"""),

      // Q19: discounted revenue (disjunctive multi-range part⋈lineitem).
      both("h19_discounted_revenue", s"""
        SELECT $REV AS revenue
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE
          (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
            AND l_quantity >= 1 AND l_quantity <= 21)
          OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
            AND l_quantity >= 10 AND l_quantity <= 30)
          OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
            AND l_quantity >= 20 AND l_quantity <= 40)"""),

      // Q13-ish: customer order-count distribution (left join + double agg).
      both("h13_order_distribution", """
        SELECT c_count, count(*) AS custdist
        FROM (
          SELECT c_custkey, count(o_orderkey) AS c_count
          FROM customer LEFT JOIN orders ON c_custkey = o_custkey
            AND o_orderpriority <> '1-URGENT'
          GROUP BY c_custkey)
        GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC"""))
  }
}
