package graft

/** Verbatim (query, expected) pairs auto-harvested from presto-tests
  * AbstractTestAggregations / AbstractTestIndexedQueries /
  * AbstractTestDistributedQueries two-argument assertQuery calls (the
  * reference's H2-oracle protocol): both sides are the reference's exact
  * SQL run on the same tables, compared as canonical multisets (ordered
  * for assertQueryOrdered). Fixture-dependent expected literals,
  * statements needing tables created by earlier DDL in the same Java
  * method (covered by DistributedCorpusSpec sequences), and the
  * documented bare-CUBE-over-empty-input divergence are excluded by
  * triage. Regenerate with the harvest pipeline (PLANS.md).
  */
class RefTestsPairsSpec extends org.scalatest.funsuite.AnyFunSuite {
  import TestSession._

  private lazy val engine = graft.queries.RefCorpus.engine(spark, sf)

  private def rows(sql: String): Seq[String] =
    engine.sql(sql).collect().toSeq
      .map(r => r.toSeq.map(graft.tools.RefPairs.canon).mkString("(", ", ", ")"))

  private def ref(name: String, actual: String, expected: String): Unit =
    test(name) {
      assert(rows(actual).sorted == rows(expected).sorted, s"\nactual:   $actual")
    }

  private def refOrdered(name: String, actual: String, expected: String): Unit =
    test(name) {
      assert(rows(actual) == rows(expected), s"\nactual:   $actual")
    }

  ref("Aggregations L62",
    "SELECT COUNT(*) FROM orders WHERE NULLIF(orderstatus, 'F') IS NULL",
    "SELECT COUNT(*) FROM orders WHERE orderstatus = 'F' ")
  ref("Aggregations L70",
    "SELECT COUNT(*) FROM orders WHERE NULLIF(orderstatus, 'F') IS NOT NULL",
    "SELECT COUNT(*) FROM orders WHERE orderstatus <> 'F' ")
  ref("Aggregations L84",
    "SELECT COUNT(*) FROM orders WHERE COALESCE(NULLIF(orderstatus, 'F'), 'bar') = 'bar'",
    "SELECT COUNT(*) FROM orders WHERE orderstatus = 'F'")
  ref("Aggregations L134",
    "SELECT col[1], count FROM (SELECT ARRAY[custkey] col, COUNT(*) count FROM orders GROUP BY 1 ORDER BY 1)",
    "SELECT custkey, COUNT(*) FROM orders GROUP BY custkey ORDER BY custkey")
  ref("Aggregations L140",
    "SELECT col[1], count FROM (SELECT MAP(ARRAY[1], ARRAY[custkey]) col, COUNT(*) count FROM orders GROUP BY 1)",
    "SELECT custkey, COUNT(*) FROM orders GROUP BY custkey")
  ref("Aggregations L146",
    "SELECT MAP_KEYS(x)[1] FROM (VALUES MAP(ARRAY['a'], ARRAY[ARRAY[1]]), MAP(ARRAY['b'], ARRAY[ARRAY[2]])) t(x) GROUP BY x",
    "VALUES 'a', 'b'")
  ref("Aggregations L152",
    "SELECT col.col1, count FROM (SELECT CAST(row(custkey, custkey) AS row(col0 bigint, col1 bigint)) col, COUNT(*) count FROM orders GROUP BY 1)",
    "SELECT custkey, COUNT(*) FROM orders GROUP BY custkey")
  ref("Aggregations L189",
    "SELECT COUNT(DISTINCT custkey + 1) FROM orders",
    "SELECT COUNT(*) FROM (SELECT DISTINCT custkey + 1 FROM orders) t")
  ref("Aggregations L234",
    "SELECT count(DISTINCT a), max(b) FROM (VALUES (row(1, 2), 3)) t(a, b)",
    "VALUES (1, 3)")
  ref("Aggregations L265",
    "SELECT COUNT(DISTINCT custkey), SUM(DISTINCT custkey) FROM orders",
    "SELECT COUNT(*), SUM(custkey) FROM (SELECT DISTINCT custkey FROM orders) t")
  ref("Aggregations L289",
    "SELECT sum(x) FILTER (WHERE y > 4) FROM (VALUES (1, 3), (2, 4), (2, 4), (4, 5)) t (x, y)",
    "SELECT 4")
  ref("Aggregations L290",
    "SELECT sum(x) FILTER (WHERE x > 1), sum(y) FILTER (WHERE y > 4) FROM (VALUES (1, 3), (2, 4), (2, 4), (4, 5)) t (x, y)",
    "SELECT 8, 5")
  ref("Aggregations L291",
    "SELECT sum(x) FILTER (WHERE x > 1), sum(x) FROM (VALUES (1), (2), (2), (4)) t (x)",
    "SELECT 8, 9")
  ref("Aggregations L292",
    "SELECT count(*) FILTER (WHERE x > 1), sum(x) FROM (VALUES (1, 3), (2, 4), (2, 4), (4, 5)) t (x, y)",
    "SELECT 3, 9")
  ref("Aggregations L293",
    "SELECT count(*) FILTER (WHERE x > 1), count(DISTINCT y) FROM (VALUES (1, 10), (2, 10), (3, 10), (4, 20)) t (x, y)",
    "SELECT 3, 2")
  ref("Aggregations L295",
    "SELECT sum(b) FILTER (WHERE true) FROM (SELECT count(*) FILTER (WHERE true) AS b)",
    "SELECT 1")
  ref("Aggregations L300",
    "SELECT count(1) FILTER (WHERE orderstatus = 'O') FROM orders",
    "SELECT count(*) FROM orders WHERE orderstatus = 'O'")
  ref("Aggregations L303",
    "SELECT sum(x) FILTER (WHERE y > 5) FROM (VALUES (1, 3), (2, 4), (2, 4), (4, 5)) t (x, y)",
    "SELECT null")
  ref("Aggregations L304",
    "SELECT count(*) FILTER (WHERE x > 4), sum(x) FILTER (WHERE y > 5) FROM (VALUES (1, 3), (2, 4), (2, 4), (4, 5)) t (x, y)",
    "SELECT 0, null")
  refOrdered("Aggregations L333",
    "SELECT   value FROM (     SELECT         key     FROM         (VALUES 'match') AS a(key)         LEFT JOIN (SELECT * FROM (VALUES (0)) LIMIT 0) AS x(ignored)         ON TRUE     GROUP BY 1 ) a RIGHT JOIN (     VALUES     ('match', 'value'),     ('no-match', 'value') ) AS b(key, value) ON a.key = b.key GROUP BY 1 ",
    "VALUES 'value'")
  ref("Aggregations L410",
    "SELECT a, count(1) FROM (VALUES 1, 2, 3, 2) t(a) GROUP BY a HAVING count(1) > 1",
    "SELECT 2, 2")
  ref("Aggregations L458",
    "SELECT orderstatus, sum(totalprice) FROM orders GROUP BY 1",
    "SELECT orderstatus, sum(totalprice) FROM orders GROUP BY orderstatus")
  ref("Aggregations L470",
    "SELECT CASE WHEN orderstatus = 'O' THEN 'a' ELSE 'b' END, count(*) FROM orders GROUP BY 1",
    "SELECT CASE WHEN orderstatus = 'O' THEN 'a' ELSE 'b' END, count(*) FROM orders GROUP BY CASE WHEN orderstatus = 'O' THEN 'a' ELSE 'b' END")
  ref("Aggregations L487",
    "SELECT CASE WHEN orderstatus = 'O' THEN 'a' END, count(*) FROM orders GROUP BY 1",
    "SELECT CASE WHEN orderstatus = 'O' THEN 'a' END, count(*) FROM orders GROUP BY CASE WHEN orderstatus = 'O' THEN 'a' END")
  ref("Aggregations L503",
    "SELECT IF(orderkey between 1 and 5, 'orders', 'others'), sum(totalprice) FROM orders GROUP BY 1",
    "SELECT CASE WHEN orderkey BETWEEN 1 AND 5 THEN 'orders' ELSE 'others' END, sum(totalprice) FROM orders GROUP BY CASE WHEN orderkey BETWEEN 1 AND 5 THEN 'orders' ELSE 'others' END")
  ref("Aggregations L518",
    "SELECT CASE orderstatus WHEN 'O' THEN 'a' ELSE 'b' END, count(*) FROM orders GROUP BY 1",
    "SELECT CASE orderstatus WHEN 'O' THEN 'a' ELSE 'b' END, count(*) FROM orders GROUP BY CASE orderstatus WHEN 'O' THEN 'a' ELSE 'b' END")
  ref("Aggregations L577",
    "SELECT CAST(orderkey AS VARCHAR), count(*) FROM orders GROUP BY 1",
    "SELECT CAST(orderkey AS VARCHAR), count(*) FROM orders GROUP BY CAST(orderkey AS VARCHAR)")
  ref("Aggregations L591",
    "SELECT COALESCE(orderkey, custkey), count(*) FROM orders GROUP BY 1",
    "SELECT COALESCE(orderkey, custkey), count(*) FROM orders GROUP BY COALESCE(orderkey, custkey)")
  ref("Aggregations L608",
    "SELECT NULLIF(orderkey, custkey), count(*) FROM orders GROUP BY 1",
    "SELECT NULLIF(orderkey, custkey), count(*) FROM orders GROUP BY NULLIF(orderkey, custkey)")
  ref("Aggregations L625",
    "SELECT EXTRACT(YEAR FROM now()), count(*) FROM orders GROUP BY 1",
    "SELECT EXTRACT(YEAR FROM now()), count(*) FROM orders GROUP BY EXTRACT(YEAR FROM now())")
  ref("Aggregations L802",
    "SELECT orderstatus, COUNT(*) FROM orders GROUP BY orderstatus",
    "SELECT orderstatus, CAST(COUNT(*) AS INTEGER) FROM orders GROUP BY orderstatus")
  ref("Aggregations L816",
    "SELECT orderdate x, COUNT(*) FROM orders GROUP BY orderdate",
    "SELECT orderdate x, CAST(COUNT(*) AS INTEGER) FROM orders GROUP BY orderdate")
  ref("Aggregations L836",
    "SELECT SUM(CAST(quantity AS BIGINT)) FROM lineitem GROUP BY ()",
    "SELECT SUM(CAST(quantity AS BIGINT)) FROM lineitem")
  ref("Aggregations L849",
    "SELECT linenumber, SUM(CAST(quantity AS BIGINT)) FROM lineitem GROUP BY GROUPING SETS (linenumber)",
    "SELECT linenumber, SUM(CAST(quantity AS BIGINT)) FROM lineitem GROUP BY linenumber")
  ref("Aggregations L861",
    "SELECT linenumber, suppkey, SUM(CAST(quantity AS BIGINT)) FROM lineitem GROUP BY GROUPING SETS ((linenumber, suppkey), (suppkey))",
    "SELECT linenumber, suppkey, SUM(CAST(quantity AS BIGINT)) FROM lineitem GROUP BY linenumber, suppkey UNION SELECT NULL, suppkey, SUM(CAST(quantity AS BIGINT)) FROM lineitem GROUP BY suppkey")
  ref("Aggregations L869",
    "SELECT linenumber, suppkey, SUM(CAST(quantity AS BIGINT)) FROM lineitem WHERE quantity < 0 GROUP BY GROUPING SETS ((linenumber, suppkey), (suppkey))",
    "SELECT linenumber, suppkey, SUM(CAST(quantity AS BIGINT)) FROM lineitem WHERE quantity < 0 GROUP BY linenumber, suppkey UNION SELECT NULL, suppkey, SUM(CAST(quantity AS BIGINT)) FROM lineitem WHERE quantity < 0 GROUP BY suppkey")
  ref("Aggregations L888",
    "SELECT linenumber, suppkey, SUM(CAST(quantity AS BIGINT)) FROM lineitem WHERE quantity < 0 GROUP BY GROUPING SETS ((linenumber, suppkey), (suppkey), ())",
    "SELECT linenumber, suppkey, SUM(CAST(quantity AS BIGINT)) FROM lineitem WHERE quantity < 0 GROUP BY linenumber, suppkey UNION SELECT NULL, suppkey, SUM(CAST(quantity AS BIGINT)) FROM lineitem WHERE quantity < 0 GROUP BY suppkey UNION SELECT NULL, NULL, SUM(CAST(quantity AS BIGINT)) FROM lineitem WHERE quantity < 0")
  ref("Aggregations L911",
    "SELECT linenumber, suppkey, SUM(DISTINCT CAST(quantity AS BIGINT)) FROM lineitem GROUP BY GROUPING SETS ((linenumber, suppkey), (suppkey))",
    "SELECT linenumber, suppkey, SUM(DISTINCT CAST(quantity AS BIGINT)) FROM lineitem GROUP BY linenumber, suppkey UNION SELECT NULL, suppkey, SUM(DISTINCT CAST(quantity AS BIGINT)) FROM lineitem GROUP BY suppkey")
  ref("Aggregations L919",
    "SELECT linenumber, suppkey, SUM(DISTINCT CAST(quantity AS BIGINT)), COUNT(DISTINCT linestatus) FROM lineitem GROUP BY GROUPING SETS ((linenumber, suppkey), (suppkey))",
    "SELECT linenumber, suppkey, SUM(DISTINCT CAST(quantity AS BIGINT)), COUNT(DISTINCT linestatus) FROM lineitem GROUP BY linenumber, suppkey UNION SELECT NULL, suppkey, SUM(DISTINCT CAST(quantity AS BIGINT)), COUNT(DISTINCT linestatus) FROM lineitem GROUP BY suppkey")
  ref("Aggregations L927",
    "SELECT linenumber, suppkey, SUM(DISTINCT CAST(quantity AS BIGINT)), COUNT(DISTINCT linestatus) FROM lineitem WHERE quantity < 0 GROUP BY GROUPING SETS ((linenumber, suppkey), (suppkey))",
    "SELECT linenumber, suppkey, SUM(DISTINCT CAST(quantity AS BIGINT)), COUNT(DISTINCT linestatus) FROM lineitem WHERE quantity < 0 GROUP BY linenumber, suppkey UNION SELECT NULL, suppkey, SUM(DISTINCT CAST(quantity AS BIGINT)), COUNT(DISTINCT linestatus) FROM lineitem WHERE quantity < 0 GROUP BY suppkey")
  ref("Aggregations L945",
    "SELECT linenumber, suppkey, SUM(CAST(quantity AS BIGINT)) FROM lineitem GROUP BY GROUPING SETS ((linenumber, suppkey), ())",
    "SELECT linenumber, suppkey, SUM(CAST(quantity AS BIGINT)) FROM lineitem GROUP BY linenumber, suppkey UNION SELECT NULL, NULL, SUM(CAST(quantity AS BIGINT)) FROM lineitem")
  ref("Aggregations L953",
    "SELECT linenumber, suppkey, SUM(CAST(quantity AS BIGINT)) FROM lineitem GROUP BY GROUPING SETS ((), (linenumber, suppkey), (), (linenumber, suppkey))",
    "SELECT linenumber, suppkey, SUM(CAST(quantity AS BIGINT)) FROM lineitem GROUP BY linenumber, suppkey UNION ALL SELECT NULL, NULL, SUM(CAST(quantity AS BIGINT)) FROM lineitem UNION ALL SELECT linenumber, suppkey, SUM(CAST(quantity AS BIGINT)) FROM lineitem GROUP BY linenumber, suppkey UNION ALL SELECT NULL, NULL, SUM(CAST(quantity AS BIGINT)) FROM lineitem")
  ref("Aggregations L963",
    "SELECT linenumber, suppkey, SUM(CAST(quantity AS BIGINT)) FROM lineitem WHERE quantity < 0 GROUP BY GROUPING SETS ((), (linenumber, suppkey), (), (linenumber, suppkey))",
    "SELECT linenumber, suppkey, SUM(CAST(quantity AS BIGINT)) FROM lineitem WHERE quantity < 0 GROUP BY linenumber, suppkey UNION ALL SELECT NULL, NULL, SUM(CAST(quantity AS BIGINT)) FROM lineitem WHERE quantity < 0 UNION ALL SELECT linenumber, suppkey, SUM(CAST(quantity AS BIGINT)) FROM lineitem WHERE quantity < 0 GROUP BY linenumber, suppkey UNION ALL SELECT NULL, NULL, SUM(CAST(quantity AS BIGINT)) FROM lineitem WHERE quantity < 0")
  ref("Aggregations L990",
    "SELECT linenumber, suppkey, SUM(CAST(quantity AS BIGINT)) FROM lineitem GROUP BY DISTINCT GROUPING SETS ((), (linenumber, suppkey), (), (linenumber, suppkey))",
    "SELECT linenumber, suppkey, SUM(CAST(quantity AS BIGINT)) FROM lineitem GROUP BY linenumber, suppkey UNION ALL SELECT NULL, NULL, SUM(CAST(quantity AS BIGINT)) FROM lineitem")
  ref("Aggregations L998",
    "SELECT linenumber, suppkey, SUM(CAST(quantity AS BIGINT)) FROM lineitem GROUP BY GROUPING SETS ((), (linenumber), (linenumber, suppkey))",
    "SELECT linenumber, suppkey, SUM(CAST(quantity AS BIGINT)) FROM lineitem GROUP BY linenumber, suppkey UNION ALL SELECT linenumber, NULL, SUM(CAST(quantity AS BIGINT)) FROM lineitem GROUP BY linenumber UNION ALL SELECT NULL, NULL, SUM(CAST(quantity AS BIGINT)) FROM lineitem")
  ref("Aggregations L1007",
    "SELECT SUM(CAST(quantity AS BIGINT)) FROM lineitem GROUP BY GROUPING SETS (())",
    "SELECT SUM(CAST(quantity AS BIGINT)) FROM lineitem")
  ref("Aggregations L1014",
    "SELECT SUM(CAST(quantity AS BIGINT)) FROM lineitem GROUP BY GROUPING SETS ((), ())",
    "SELECT SUM(CAST(quantity AS BIGINT)) FROM lineitem UNION ALL SELECT SUM(CAST(quantity AS BIGINT)) FROM lineitem")
  ref("Aggregations L1022",
    "SELECT SUM(CAST(quantity AS BIGINT)) FROM lineitem WHERE quantity < 0 GROUP BY GROUPING SETS ((), ())",
    "SELECT SUM(CAST(quantity AS BIGINT)) FROM lineitem WHERE quantity < 0 UNION ALL SELECT SUM(CAST(quantity AS BIGINT)) FROM lineitem WHERE quantity < 0")
  ref("Aggregations L1030",
    "SELECT lna, lnb, SUM(quantity) FROM (SELECT linenumber lna, linenumber lnb, CAST(quantity AS BIGINT) quantity FROM lineitem) GROUP BY GROUPING SETS ((lna, lnb), (lna), (lnb), ())",
    "SELECT linenumber, linenumber, SUM(CAST(quantity AS BIGINT)) FROM lineitem GROUP BY linenumber UNION ALL SELECT linenumber, NULL, SUM(CAST(quantity AS BIGINT)) FROM lineitem GROUP BY linenumber UNION ALL SELECT NULL, linenumber, SUM(CAST(quantity AS BIGINT)) FROM lineitem GROUP BY linenumber UNION ALL SELECT NULL, NULL, SUM(CAST(quantity AS BIGINT)) FROM lineitem")
  ref("Aggregations L1042",
    "SELECT suppkey, month(shipdate), SUM(CAST(quantity AS BIGINT)) FROM lineitem GROUP BY month(shipdate), ROLLUP(suppkey)",
    "SELECT suppkey, month(shipdate), SUM(CAST(quantity AS BIGINT)) FROM lineitem GROUP BY month(shipdate), suppkey UNION ALL SELECT NULL, month(shipdate), SUM(CAST(quantity AS BIGINT)) FROM lineitem GROUP BY month(shipdate)")
  ref("Aggregations L1050",
    "SELECT suppkey, month(shipdate), SUM(CAST(quantity AS BIGINT)) FROM lineitem GROUP BY 2, ROLLUP(suppkey)",
    "SELECT suppkey, month(shipdate), SUM(CAST(quantity AS BIGINT)) FROM lineitem GROUP BY month(shipdate), suppkey UNION ALL SELECT NULL, month(shipdate), SUM(CAST(quantity AS BIGINT)) FROM lineitem GROUP BY month(shipdate)")
  ref("Aggregations L1058",
    "SELECT COUNT_IF(x IS NULL) FROM (SELECT x, y, COUNT(z) FROM (SELECT CAST(lineitem.orderkey AS BIGINT) x, lineitem.linestatus y, SUM(lineitem.quantity) z FROM lineitem JOIN orders ON lineitem.orderkey = orders.orderkey GROUP BY 1, 2) GROUP BY GROUPING SETS ((x, y), ()))",
    "SELECT 1")
  ref("Aggregations L1067",
    "SELECT * FROM (SELECT COALESCE(orderpriority, 'ALL'), COALESCE(shippriority, -1) sp FROM (SELECT orderpriority, shippriority, COUNT(1) FROM orders GROUP BY GROUPING SETS ((orderpriority), (shippriority)))) WHERE sp=-1",
    "SELECT orderpriority, -1 FROM orders GROUP BY orderpriority")
  ref("Aggregations L1076",
    "SELECT orderpriority, COUNT(orderpriority) FROM orders GROUP BY ROLLUP (orderpriority)",
    "SELECT orderpriority, COUNT(orderpriority) FROM orders GROUP BY orderpriority UNION SELECT NULL, COUNT(orderpriority) FROM orders")
  ref("Aggregations L1084",
    "SELECT linenumber, suppkey, SUM(suppkey), COUNT(linenumber), SUM(CAST(quantity AS BIGINT)) FROM lineitem GROUP BY GROUPING SETS ((linenumber, suppkey), ())",
    "SELECT linenumber, suppkey, SUM(suppkey), COUNT(linenumber), SUM(CAST(quantity AS BIGINT)) FROM lineitem GROUP BY linenumber, suppkey UNION SELECT NULL, NULL, SUM(suppkey), COUNT(linenumber), SUM(CAST(quantity AS BIGINT)) FROM lineitem")
  ref("Aggregations L1092",
    "SELECT linenumber, suppkey, COUNT(CAST(quantity AS BIGINT)), SUM(CAST(quantity AS BIGINT)) FROM lineitem GROUP BY GROUPING SETS ((linenumber, suppkey), ())",
    "SELECT linenumber, suppkey, COUNT(CAST(quantity AS BIGINT)), SUM(CAST(quantity AS BIGINT)) FROM lineitem GROUP BY linenumber, suppkey UNION SELECT NULL, NULL, COUNT(CAST(quantity AS BIGINT)), SUM(CAST(quantity AS BIGINT)) FROM lineitem")
  ref("Aggregations L1100",
    "SELECT linenumber, suppkey, COUNT(linenumber), SUM(CAST(quantity AS BIGINT)) FROM lineitem GROUP BY GROUPING SETS ((linenumber, suppkey), ())",
    "SELECT linenumber, suppkey, COUNT(linenumber), SUM(CAST(quantity AS BIGINT)) FROM lineitem GROUP BY linenumber, suppkey UNION SELECT NULL, NULL, COUNT(linenumber), SUM(CAST(quantity AS BIGINT)) FROM lineitem")
  ref("Aggregations L1108",
    "SELECT suppkey, COUNT(DISTINCT linenumber) FROM (SELECT * FROM lineitem WHERE linenumber%2 = 0 UNION ALL SELECT * FROM lineitem WHERE linenumber%2 = 1) GROUP BY GROUPING SETS ((suppkey), ())",
    "SELECT suppkey, COUNT(DISTINCT linenumber) FROM lineitem GROUP BY suppkey UNION ALL SELECT NULL, COUNT(DISTINCT linenumber) FROM lineitem")
  ref("Aggregations L1118",
    "SELECT linenumber, COUNT(DISTINCT linenumber) FROM (SELECT * FROM lineitem WHERE linenumber%2 = 0 UNION ALL SELECT * FROM lineitem WHERE linenumber%2 = 1) GROUP BY GROUPING SETS ((linenumber), ())",
    "SELECT DISTINCT linenumber, 1 FROM lineitem UNION ALL SELECT NULL, COUNT(DISTINCT linenumber) FROM lineitem")
  ref("Aggregations L1128",
    "SELECT linenumber, COUNT(DISTINCT linenumber), SUM(DISTINCT suppkey) FROM (SELECT * FROM lineitem WHERE linenumber%2 = 0 UNION ALL SELECT * FROM lineitem WHERE linenumber%2 = 1) GROUP BY GROUPING SETS ((linenumber), ())",
    "SELECT linenumber, 1, SUM(DISTINCT suppkey) FROM lineitem GROUP BY linenumber UNION ALL SELECT NULL, COUNT(DISTINCT linenumber), SUM(DISTINCT suppkey) FROM lineitem")
  ref("Aggregations L1138",
    "SELECT linenumber, suppkey, SUM(CAST(quantity AS BIGINT)) FROM lineitem GROUP BY ROLLUP (linenumber, suppkey)",
    "SELECT linenumber, suppkey, SUM(CAST(quantity AS BIGINT)) FROM lineitem GROUP BY linenumber, suppkey UNION ALL SELECT linenumber, NULL, SUM(CAST(quantity AS BIGINT)) FROM lineitem GROUP BY linenumber UNION ALL SELECT NULL, NULL, SUM(CAST(quantity AS BIGINT)) FROM lineitem")
  ref("Aggregations L1147",
    "SELECT linenumber, suppkey, SUM(CAST(quantity AS BIGINT)) FROM lineitem GROUP BY CUBE (linenumber, suppkey)",
    "SELECT linenumber, suppkey, SUM(CAST(quantity AS BIGINT)) FROM lineitem GROUP BY linenumber, suppkey UNION ALL SELECT linenumber, NULL, SUM(CAST(quantity AS BIGINT)) FROM lineitem GROUP BY linenumber UNION ALL SELECT NULL, suppkey, SUM(CAST(quantity AS BIGINT)) FROM lineitem GROUP BY suppkey UNION ALL SELECT NULL, NULL, SUM(CAST(quantity AS BIGINT)) FROM lineitem")
  ref("IndexedQueries L378",
    "select count(*) from (values (1), (cast(null as bigint))) x(orderkey) join orders using (orderkey)",
    "select count(*) from orders where orderkey = 1")
  ref("IndexedQueries L484",
    "SELECT * FROM (   SELECT *   FROM lineitem   WHERE partkey % 16 = 0) l JOIN (   SELECT *, COUNT(*) OVER (PARTITION BY orderkey)   FROM orders) o   ON l.orderkey = o.orderkey",
    "SELECT * FROM (   SELECT *   FROM lineitem   WHERE partkey % 16 = 0) l JOIN (   SELECT *, 1   FROM orders) o   ON l.orderkey = o.orderkey")
  ref("IndexedQueries L509",
    "SELECT * FROM (   SELECT *   FROM lineitem   WHERE partkey % 16 = 0) l JOIN (   SELECT *, COUNT(*) OVER (PARTITION BY orderkey), SUM(orderkey) OVER (PARTITION BY orderkey)   FROM orders) o   ON l.orderkey = o.orderkey",
    "SELECT * FROM (   SELECT *   FROM lineitem   WHERE partkey % 16 = 0) l JOIN (   SELECT *, 1, orderkey as o   FROM orders) o   ON l.orderkey = o.orderkey")
  ref("IndexedQueries L534",
    "SELECT * FROM (   SELECT *   FROM lineitem   WHERE partkey % 16 = 0) l JOIN (   SELECT *, COUNT(*) OVER (PARTITION BY orderkey, custkey)   FROM orders) o   ON l.orderkey = o.orderkey",
    "SELECT * FROM (   SELECT *   FROM lineitem   WHERE partkey % 16 = 0) l JOIN (   SELECT *, 1   FROM orders) o   ON l.orderkey = o.orderkey")
  ref("IndexedQueries L559",
    "SELECT * FROM (   SELECT *   FROM lineitem   WHERE partkey % 16 = 0) l JOIN (   SELECT *, row_number() OVER (PARTITION BY orderkey)   FROM orders) o   ON l.orderkey = o.orderkey",
    "SELECT * FROM (   SELECT *   FROM lineitem   WHERE partkey % 16 = 0) l JOIN (   SELECT *, 1   FROM orders) o   ON l.orderkey = o.orderkey")
  ref("IndexedQueries L584",
    "SELECT * FROM (   SELECT *   FROM lineitem   WHERE partkey % 16 = 0) l JOIN (   SELECT *, COUNT(*) OVER (PARTITION BY orderkey ORDER BY custkey)   FROM orders) o   ON l.orderkey = o.orderkey",
    "SELECT * FROM (   SELECT *   FROM lineitem   WHERE partkey % 16 = 0) l JOIN (   SELECT *, 1   FROM orders) o   ON l.orderkey = o.orderkey")
  ref("IndexedQueries L609",
    "SELECT l.orderkey, o.c FROM (   SELECT *   FROM lineitem   WHERE partkey % 16 = 0) l JOIN (   SELECT *, COUNT(*) OVER (PARTITION BY orderkey ROWS 1 PRECEDING) as c   FROM orders) o   ON l.orderkey = o.orderkey",
    "SELECT l.orderkey, o.c FROM (   SELECT *   FROM lineitem   WHERE partkey % 16 = 0) l JOIN (   SELECT *, 1 as c   FROM orders) o   ON l.orderkey = o.orderkey")
}
