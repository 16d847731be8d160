package graft

/** Bulk verbatim (query, expected) pairs auto-harvested from
  * presto-tests/.../AbstractTestQueries.java two-argument assertQuery /
  * assertQueryOrdered calls not already covered by RefCorpusSpec or the
  * driver corpus: BOTH sides are the reference's exact text, compared as
  * unordered canonical multisets through Engine.sql (the reference's own
  * H2-oracle protocol). Java line numbers in the test names.
  */
class RefCorpusPairsSpec extends org.scalatest.funsuite.AnyFunSuite {
  import TestSession._

  private lazy val engine = graft.queries.RefCorpus.engine(spark, sf)

  private def rows(sql: String): Seq[String] =
    engine.sql(sql).collect().toSeq
      .map(r => r.toSeq.map(graft.tools.RefPairs.canon).mkString("(", ", ", ")"))

  private def ref(name: String, actual: String, expected: String): Unit =
    test(name) {
      assert(rows(actual).sorted == rows(expected).sorted, s"\nactual:   $actual")
    }

  ref("pair L228",
    "SELECT apply(CAST(ROW(10) AS ROW(x INTEGER)), r -> r.x)",
    "VALUES 10")
  ref("pair L229",
    "SELECT apply(CAST(ROW(10) AS ROW(x INTEGER)), r -> r.x) FROM (VALUES 1) u(x)",
    "VALUES 10")
  ref("pair L230",
    "SELECT apply(CAST(ROW(10) AS ROW(x INTEGER)), r -> r.x) FROM (VALUES 1) r(x)",
    "VALUES 10")
  ref("pair L231",
    "SELECT apply(CAST(ROW(10) AS ROW(x INTEGER)), r -> apply(3, y -> y + r.x)) FROM (VALUES 1) u(x)",
    "VALUES 13")
  ref("pair L232",
    "SELECT apply(CAST(ROW(10) AS ROW(x INTEGER)), r -> apply(3, y -> y + r.x)) FROM (VALUES 1) r(x)",
    "VALUES 13")
  ref("pair L233",
    "SELECT apply(CAST(ROW(10) AS ROW(x INTEGER)), r -> apply(3, y -> y + r.x)) FROM (VALUES 'a') r(x)",
    "VALUES 13")
  ref("pair L234",
    "SELECT apply(CAST(ROW(10) AS ROW(x INTEGER)), z -> apply(3, y -> y + r.x)) FROM (VALUES 1) r(x)",
    "VALUES 4")
  ref("pair L254",
    "SELECT apply(CAST(ROW(1) AS ROW(someField BIGINT)), x -> x.someField) FROM (VALUES (1,2)) t(x,y) GROUP BY y",
    "SELECT 1")
  ref("pair L255",
    "SELECT apply(sum(x), x -> x * x) FROM (VALUES 1, 2, 3, 4, 5) t(x)",
    "SELECT 225")
  ref("pair L369",
    "SELECT a.col1[1].col0, SUM(a.col0), SUM(a.col1[1].col1), SUM(a.col1[2].col0), SUM(a.col2.col1) FROM (VALUES ROW(CAST(ROW(1.0, ARRAY[row(31, 4.5E0), row(12, 4.2E0)], row(3, 4.0E0)) AS ROW(col0 double, col1 array(row(col0 integer, col1 double)), col2 row(col0 integer, col1 double)))), ROW(CAST(ROW(3.1, ARRAY[row(41, 3.1E0), row(32, 4.2E0)], row(6, 6.0E0)) AS ROW(col0 double, col1 array(row(col0 integer, col1 double)), col2 row(col0 integer, col1 double)))), ROW(CAST(ROW(2.2, ARRAY[row(31, 4.2E0), row(22, 4.2E0)], row(5, 4.0E0)) AS ROW(col0 double, col1 array(row(col0 integer, col1 double)), col2 row(col0 integer, col1 double))))) t(a) GROUP BY a.col1[1].col0",
    "SELECT * FROM VALUES (31, 3.2, 8.7, 34, 8.0), (41, 3.1, 3.1, 32, 6.0)")
  ref("pair L377",
    "SELECT a.col1[1].col0, SUM(a.col0), SUM(a.col1[1].col1), SUM(a.col1[2].col0), SUM(a.col2.col1) FROM (VALUES ROW(CAST(ROW(2.2, ARRAY[row(31, 4.2E0), row(22, 4.2E0)], row(5, 4.0E0)) AS ROW(col0 double, col1 array(row(col0 integer, col1 double)), col2 row(col0 integer, col1 double)))), ROW(CAST(ROW(1.0, ARRAY[row(31, 4.5E0), row(12, 4.2E0)], row(3, 4.1E0)) AS ROW(col0 double, col1 array(row(col0 integer, col1 double)), col2 row(col0 integer, col1 double)))), ROW(CAST(ROW(3.1, ARRAY[row(41, 3.1E0), row(32, 4.2E0)], row(6, 6.0E0)) AS ROW(col0 double, col1 array(row(col0 integer, col1 double)), col2 row(col0 integer, col1 double)))), ROW(CAST(ROW(3.3, ARRAY[row(41, 3.1E0), row(32, 4.2E0)], row(6, 6.0E0)) AS ROW(col0 double, col1 array(row(col0 integer, col1 double)), col2 row(col0 integer, col1 double)))) ) t(a) GROUP BY a.col1[1]",
    "SELECT * FROM VALUES (31, 2.2, 4.2, 22, 4.0), (31, 1.0, 4.5, 12, 4.1), (41, 6.4, 6.2, 64, 12.0)")
  ref("pair L405",
    "SELECT a.col2.col0, a.col0, SUM(a.col2.col1) FROM (VALUES ROW(CAST(ROW(1.0, ARRAY[2, 13, 4], row(11, 4.1E0))   AS ROW(col0 double, col1 array(integer), col2 row(col0 integer, col1 double)))), ROW(CAST(ROW(2.0, ARRAY[2, 23, 4], row(11, 14.0E0))  AS ROW(col0 double, col1 array(integer), col2 row(col0 integer, col1 double)))), ROW(CAST(ROW(1.5, ARRAY[2, 13, 4], row(11, 4.1E0))   AS ROW(col0 double, col1 array(integer), col2 row(col0 integer, col1 double)))), ROW(CAST(ROW(1.5, ARRAY[2, 13, 4], row(11, 4.1E0))   AS ROW(col0 double, col1 array(integer), col2 row(col0 integer, col1 double)))), ROW(CAST(ROW(7.0, ARRAY[22, 33, 44], row(13, 5.0E0)) AS ROW(col0 double, col1 array(integer), col2 row(col0 integer, col1 double))))) t(a) WHERE a.col1[2] < 30 GROUP BY 1, 2 ORDER BY 1",
    "SELECT * FROM VALUES (11, 1.0, 4.1), (11, 1.5, 8.2), (11, 2.0, 14.0)")
  ref("pair L584",
    "SELECT a.custkey, t.e FROM (SELECT custkey, ARRAY[1, 2, 3] AS my_array FROM orders ORDER BY orderkey LIMIT 1) a CROSS JOIN UNNEST(my_array) t(e)",
    "SELECT * FROM (SELECT custkey FROM orders ORDER BY orderkey LIMIT 1) CROSS JOIN (VALUES (1), (2), (3))")
  ref("pair L589",
    "SELECT a.custkey, t.e FROM (SELECT custkey, ARRAY[1, 2, 3] AS my_array FROM orders ORDER BY orderkey LIMIT 1) a, UNNEST(my_array) t(e)",
    "SELECT * FROM (SELECT custkey FROM orders ORDER BY orderkey LIMIT 1) CROSS JOIN (VALUES (1), (2), (3))")
  ref("pair L611",
    "SELECT a.custkey, t.e, t.f FROM (SELECT custkey, ARRAY[10, 20, 30] AS my_array FROM orders ORDER BY orderkey LIMIT 1) a CROSS JOIN UNNEST(my_array) WITH ORDINALITY t(e, f)",
    "SELECT * FROM (SELECT custkey FROM orders ORDER BY orderkey LIMIT 1) CROSS JOIN (VALUES (10, 1), (20, 2), (30, 3))")
  ref("pair L616",
    "SELECT a.custkey, t.e, t.f FROM (SELECT custkey, ARRAY[10, 20, 30] AS my_array FROM orders ORDER BY orderkey LIMIT 1) a, UNNEST(my_array) WITH ORDINALITY t(e, f)",
    "SELECT * FROM (SELECT custkey FROM orders ORDER BY orderkey LIMIT 1) CROSS JOIN (VALUES (10, 1), (20, 2), (30, 3))")
  ref("pair L622",
    "SELECT * FROM orders, UNNEST(ARRAY[1])",
    "SELECT orders.*, 1 FROM orders")
  ref("pair L649",
    "SELECT clerk, cardinality(array_agg(orderkey)) FROM orders GROUP BY clerk",
    "SELECT clerk, count(*) FROM orders GROUP BY clerk")
  ref("pair L656",
    "SELECT JSON_FORMAT(CAST(ROW(1 + 2, CONCAT('a', 'b')) AS JSON))",
    "SELECT '[3,\"ab\"]'")
  ref("pair L657",
    "SELECT JSON_FORMAT(CAST(ROW(a + b) AS JSON)) FROM (VALUES (1, 2)) AS t(a, b)",
    "SELECT '[3]'")
  ref("pair L658",
    "SELECT JSON_FORMAT(CAST(ROW(1, ROW(9, a, ARRAY[], NULL), ROW(1, 2)) AS JSON)) FROM (VALUES ('a')) t(a)",
    "SELECT '[1,[9,\"a\",[],null],[1,2]]'")
  ref("pair L659",
    "SELECT JSON_FORMAT(CAST(ROW(ROW(ROW(ROW(ROW(a, b), c), d), e), f) AS JSON)) FROM (VALUES (ROW(0, 1), 2, '3', NULL, ARRAY[5], ARRAY[])) t(a, b, c, d, e, f)",
    "SELECT '[[[[[[0,1],2],\"3\"],null],[5]],[]]'")
  ref("pair L661",
    "SELECT JSON_FORMAT(CAST(ARRAY_AGG(ROW(a, b)) AS JSON)) FROM (VALUES (1, 2), (3, 4), (5, 6)) t(a, b)",
    "SELECT '[[1,2],[3,4],[5,6]]'")
  ref("pair L663",
    "SELECT JSON_FORMAT(CAST(ARRAY_AGG(ROW(c, d)) AS JSON)) FROM (VALUES (ARRAY[1, 3, 5], ARRAY[2, 4, 6])) AS t(a, b) CROSS JOIN UNNEST(a, b) AS u(c, d)",
    "SELECT '[[1,2],[3,4],[5,6]]'")
  ref("pair L665",
    "SELECT JSON_FORMAT(CAST(ROW(x, y, z) AS JSON)) FROM (VALUES ROW(1, NULL, '3')) t(x,y,z)",
    "SELECT '[1,null,\"3\"]'")
  ref("pair L666",
    "SELECT JSON_FORMAT(CAST(ROW(x, y, z) AS JSON)) FROM (VALUES ROW(1, CAST(NULL AS INTEGER), '3')) t(x,y,z)",
    "SELECT '[1,null,\"3\"]'")
  ref("pair L672",
    "SELECT m[max_key] FROM (SELECT map_agg(orderkey, orderkey) m, max(orderkey) max_key FROM orders)",
    "SELECT max(orderkey) FROM orders")
  ref("pair L675",
    "SELECT JSON_FORMAT(CAST(TRY(MAP(ARRAY[NULL], ARRAY[x])) AS JSON)) FROM (VALUES 1, 2) t(x)",
    "SELECT * FROM (VALUES NULL, NULL)")
  ref("pair L684",
    "VALUES (1.1, 2), (sin(3.3), 2+2) ORDER BY 1",
    "VALUES (sin(3.3), 2+2), (1.1, 2)")
  ref("pair L687",
    "SELECT 1.1 in (VALUES (1.1), (2.2))",
    "VALUES (TRUE)")
  ref("pair L893",
    "SELECT a, a* -1 AS a FROM (VALUES -1, 0, 2) t(a) ORDER BY t.a",
    "VALUES (-1, 1), (0, 0), (2, -2)")
  ref("pair L894",
    "SELECT a, a* -2 AS b FROM (VALUES -1, 0, 2) t(a) ORDER BY a + b",
    "VALUES (2, -4), (0, 0), (-1, 2)")
  ref("pair L895",
    "SELECT a AS b, a* -2 AS a FROM (VALUES -1, 0, 2) t(a) ORDER BY a + b",
    "VALUES (2, -4), (0, 0), (-1, 2)")
  ref("pair L896",
    "SELECT a* -2 AS a FROM (VALUES -1, 0, 2) t(a) ORDER BY a + t.a",
    "VALUES -4, 0, 2")
  ref("pair L897",
    "SELECT k, SUM(a) a, SUM(b) a FROM (VALUES (1, 2, 3)) t(k, a, b) GROUP BY k ORDER BY k",
    "VALUES (1, 2, 3)")
  ref("pair L901",
    "SELECT a + 1 AS b FROM (VALUES 1, 2) t(a) ORDER BY -1.0 * b",
    "VALUES 3, 2")
  ref("pair L902",
    "SELECT a AS b FROM (VALUES 1, 2) t(a) ORDER BY -1.0 * b",
    "VALUES 2, 1")
  ref("pair L903",
    "SELECT a AS a FROM (VALUES 1, 2) t(a) ORDER BY -1.0 * a",
    "VALUES 2, 1")
  ref("pair L907",
    "SELECT max(a+b), min(a+b) AS a FROM (values (1,2),(3,2),(1,5)) t(a,b) GROUP BY a ORDER BY max(t.a+t.b)",
    "VALUES (5, 5), (6, 3)")
  ref("pair L908",
    "SELECT max(a+b), min(a+b) AS a FROM (values (1,2),(3,2),(1,5)) t(a,b) GROUP BY a ORDER BY max(t.a+t.b)*-0.1",
    "VALUES (6, 3), (5, 5)")
  ref("pair L909",
    "SELECT max(a) FROM (values (1,2), (2,1)) t(a,b) GROUP BY b ORDER BY max(b*1.0)",
    "VALUES 2, 1")
  ref("pair L910",
    "SELECT max(a) AS b FROM (values (1,2), (2,1)) t(a,b) GROUP BY b ORDER BY b",
    "VALUES 1, 2")
  ref("pair L911",
    "SELECT max(a) FROM (values (1,2), (2,1)) t(a,b) GROUP BY b ORDER BY b*1.0",
    "VALUES 2, 1")
  ref("pair L912",
    "SELECT max(a)*100 AS c FROM (values (1,2), (2,1)) t(a,b) GROUP BY b ORDER BY max(b) + c",
    "VALUES 100, 200")
  ref("pair L913",
    "SELECT max(a) FROM (values (1,2), (2,1)) t(a,b) GROUP BY b ORDER BY b",
    "VALUES 2, 1")
  ref("pair L914",
    "SELECT max(a) FROM (values (1,2), (2,1)) t(a,b) GROUP BY t.b ORDER BY t.b*1.0",
    "VALUES 2, 1")
  ref("pair L915",
    "SELECT -(a+b) AS a, -(a+b) AS b, a+b FROM (values (41, 42), (-41, -42)) t(a,b) GROUP BY a+b ORDER BY a+b",
    "VALUES (-83, -83, 83), (83, 83, -83)")
  ref("pair L916",
    "SELECT c.a FROM (SELECT CAST(ROW(-a.a) AS ROW(a BIGINT)) a FROM (VALUES (2), (1)) a(a) GROUP BY a.a ORDER BY a.a) t(c)",
    "VALUES -2, -1")
  ref("pair L917",
    "SELECT -a AS a FROM (values (1,2),(3,2)) t(a,b) GROUP BY GROUPING SETS ((a), (a, b)) ORDER BY -a",
    "VALUES -1, -1, -3, -3")
  ref("pair L919",
    "SELECT max(a) FROM (values (1,2),(3,2)) t(a,b) ORDER BY max(-a)",
    "VALUES 3")
  ref("pair L921",
    "SELECT -a AS a, a AS b FROM (VALUES 1, 2) t(a) GROUP BY t.a ORDER BY a",
    "VALUES (-2, 2), (-1, 1)")
  ref("pair L922",
    "SELECT -a AS a, a AS b FROM (VALUES 1, 2) t(a) GROUP BY t.a ORDER BY t.a",
    "VALUES (-1, 1), (-2, 2)")
  ref("pair L923",
    "SELECT -a AS a, a AS b FROM (VALUES 1, 2) t(a) GROUP BY a ORDER BY t.a",
    "VALUES (-1, 1), (-2, 2)")
  ref("pair L924",
    "SELECT -a AS a, a AS b FROM (VALUES 1, 2) t(a) GROUP BY a ORDER BY t.a+2*a",
    "VALUES (-2, 2), (-1, 1)")
  ref("pair L925",
    "SELECT -a AS a, a AS b FROM (VALUES 1, 2) t(a) GROUP BY t.a ORDER BY t.a+2*a",
    "VALUES (-2, 2), (-1, 1)")
  ref("pair L928",
    "SELECT x AS y FROM (values (1,2), (2,3)) t(x, y) GROUP BY x ORDER BY apply(x, x -> -x) + 2*x",
    "VALUES 1, 2")
  ref("pair L929",
    "SELECT -y AS x FROM (values (1,2), (2,3)) t(x, y) GROUP BY y ORDER BY apply(x, x -> -x)",
    "VALUES -2, -3")
  ref("pair L930",
    "SELECT -y AS x FROM (values (1,2), (2,3)) t(x, y) GROUP BY y ORDER BY sum(apply(-y, x -> x * 1.0))",
    "VALUES -3, -2")
  ref("pair L933",
    "SELECT DISTINCT -a AS b FROM (VALUES 1, 2) t(a) ORDER BY b",
    "VALUES -2, -1")
  ref("pair L934",
    "SELECT DISTINCT -a AS b FROM (VALUES 1, 2) t(a) ORDER BY 1",
    "VALUES -2, -1")
  ref("pair L935",
    "SELECT DISTINCT max(a) AS b FROM (values (1,2), (2,1)) t(a,b) GROUP BY b ORDER BY b",
    "VALUES 1, 2")
  ref("pair L950",
    "SELECT x, sum(cast(x AS double)) FROM (VALUES '1.0') t(x) GROUP BY x ORDER BY sum(cast(t.x AS double))",
    "VALUES ('1.0', 1.0)")
  ref("pair L1049",
    "SELECT COUNT(42) FROM orders",
    "SELECT COUNT(*) FROM orders")
  ref("pair L1050",
    "SELECT COUNT(42 + 42) FROM orders",
    "SELECT COUNT(*) FROM orders")
  ref("pair L1051",
    "SELECT COUNT(null) FROM orders",
    "SELECT 0")
  ref("pair L1200",
    "SELECT regionkey, count(*) FROM (   SELECT regionkey FROM nation    UNION ALL    SELECT * FROM (VALUES 2, 100) t(regionkey)) GROUP BY ROLLUP (regionkey)",
    "SELECT * FROM (VALUES  (0, 5), (1, 5), (2, 6), (3, 5), (4, 5), (100, 1), (NULL, 27))")
  ref("pair L1223",
    "SELECT a, b, sum(c), grouping(a, b) FROM (VALUES ('h', 'j', 11), ('k', 'l', 7) ) AS t (a, b, c) GROUP BY GROUPING SETS ( (a), (b)) HAVING grouping(a, b) > 1 ",
    "VALUES (NULL, 'j', 11, 2), (NULL, 'l', 7, 2)")
  ref("pair L1233",
    "SELECT grouping(a) FROM (VALUES ('h', 'j', 11), ('k', 'l', 7)) AS t (a, b, c) GROUP BY GROUPING SETS (a,c), c*2",
    "VALUES (0), (1), (0), (1)")
  ref("pair L1384",
    "SELECT * FROM (VALUES 1, 2) INTERSECT SELECT * FROM (VALUES 1.0, 2)",
    "VALUES 1.0, 2.0")
  ref("pair L1504",
    "SELECT b FROM nation n, (VALUES (0, CAST(-1 AS BIGINT)), (0, NULL), (0, CAST(0 AS BIGINT))) t(a, b) WHERE n.regionkey - 100 < t.b AND n.nationkey = t.a",
    "VALUES -1, 0")
  ref("pair L1507",
    "SELECT b FROM nation n, (VALUES (0, NULL), (0, CAST(-1 AS BIGINT)), (0, CAST(0 AS BIGINT))) t(a, b) WHERE n.regionkey - 100 < t.b AND n.nationkey = t.a",
    "VALUES -1, 0")
  ref("pair L1510",
    "SELECT b FROM nation n, (VALUES (0, NULL), (0, NULL), (0, CAST(-1 AS BIGINT)), (0, NULL)) t(a, b) WHERE n.regionkey - 100 < t.b AND n.nationkey = t.a",
    "VALUES -1")
  ref("pair L1513",
    "SELECT b FROM nation n, (VALUES (0, NULL)) t(a, b) WHERE n.regionkey - 100 < t.b AND n.nationkey = t.a",
    "SELECT 1 WHERE FALSE")
  ref("pair L1517",
    "SELECT * FROM (VALUES (1,1),(2,1)) t1(a,b), (VALUES (1,1),(1,2),(2,1)) t2(x,y) WHERE a=x and b<=y",
    "VALUES (1,1,1,1), (1,1,1,2), (2,1,2,1)")
  ref("pair L1523",
    "SELECT * FROM (VALUES (1,1),(2,1)) t1(a,b), (VALUES (1,1),(1,2),(2,1)) t2(x,y) WHERE a=x and b<y",
    "VALUES (1,1,1,2)")
  ref("pair L1536",
    "SELECT b FROM nation n, (VALUES (0, CAST(-1 AS BIGINT)), (0, NULL), (0, CAST(0 AS BIGINT))) t(a, b) WHERE n.regionkey + 100 > t.b AND n.nationkey = t.a",
    "VALUES -1, 0")
  ref("pair L1539",
    "SELECT b FROM nation n, (VALUES (0, NULL), (0, CAST(-1 AS BIGINT)), (0, CAST(0 AS BIGINT))) t(a, b) WHERE n.regionkey + 100 > t.b AND n.nationkey = t.a",
    "VALUES -1, 0")
  ref("pair L1542",
    "SELECT b FROM nation n, (VALUES (0, NULL), (0, NULL), (0, CAST(-1 AS BIGINT)), (0, NULL)) t(a, b) WHERE n.regionkey + 100 > t.b AND n.nationkey = t.a",
    "VALUES -1")
  ref("pair L1545",
    "SELECT b FROM nation n, (VALUES (0, NULL)) t(a, b) WHERE n.regionkey + 100 > t.b AND n.nationkey = t.a",
    "SELECT 1 WHERE FALSE")
  ref("pair L1549",
    "SELECT * FROM (VALUES (1,1),(2,1)) t1(a,b), (VALUES (1,1),(1,2),(2,1)) t2(x,y) WHERE a=x and b>=y",
    "VALUES (1,1,1,1), (2,1,2,1)")
  ref("pair L1555",
    "SELECT * FROM (VALUES (1,1),(2,1)) t1(a,b), (VALUES (1,1),(1,2),(2,1)) t2(x,y) WHERE a=x and b>y",
    "SELECT 1 WHERE FALSE")
  ref("pair L1732",
    "SELECT COUNT(*) FROM lineitem JOIN orders USING (orderkey)",
    "SELECT COUNT(*) FROM lineitem JOIN orders ON lineitem.orderkey = orders.orderkey")
  ref("pair L1740",
    "SELECT * FROM (VALUES (1.0, 2.0)) x (a, b) JOIN (VALUES (1, 3)) y (a, b) ON x.a = y.a",
    "VALUES (1.0, 2.0, 1, 3)")
  ref("pair L1743",
    "SELECT * FROM (VALUES (1, 2)) x (a, b) JOIN (VALUES (SMALLINT '1', SMALLINT '3')) y (a, b) ON x.a = y.a",
    "VALUES (1, 2, 1, 3)")
  ref("pair L1822",
    "SELECT * FROM (SELECT orderkey, partkey FROM lineitem) a JOIN (SELECT orderkey, custkey FROM orders) b using (orderkey)",
    "SELECT a.orderkey, a.partkey, b.custkey FROM (SELECT orderkey, partkey FROM lineitem) a JOIN (SELECT orderkey, custkey FROM orders) b on a.orderkey = b.orderkey")
  ref("pair L2003",
    "SELECT * FROM (VALUES (1,1), (1,2)) t1(a,b) RIGHT OUTER JOIN (VALUES (1,1), (1,2)) t2(c,d) ON a=c AND b > d",
    "VALUES (1, 2, 1, 1), (NULL, NULL, 1, 2)")
  ref("pair L2006",
    "SELECT * FROM (VALUES (1,1), (1,2)) t1(a,b) RIGHT OUTER JOIN (VALUES (1,1), (1,2)) t2(c,d) ON a=c AND b < d",
    "VALUES (1, 1, 1, 2), (NULL, NULL, 1, 1)")
  ref("pair L2009",
    "SELECT * FROM (VALUES (1,1), (1,2)) t1(a,b) RIGHT OUTER JOIN (VALUES (1,1), (1,2)) t2(c,d) ON a=c AND b > 2",
    "VALUES (NULL, NULL, 1, 1), (NULL, NULL, 1, 2)")
  ref("pair L2012",
    "SELECT * FROM (VALUES (1,1), (1,2)) t1(a,b) RIGHT OUTER JOIN (VALUES (1,1), (1,2)) t2(c,d) ON a=c AND d > 2",
    "VALUES (NULL, NULL, 1, 1), (NULL, NULL, 1, 2)")
  ref("pair L2015",
    "SELECT * FROM (VALUES (1,1), (1,2)) t1(a,b) RIGHT OUTER JOIN (VALUES (1,1), (1,2)) t2(c,d) ON a=c AND b > 0",
    "VALUES (1, 1, 1, 1), (1, 1, 1, 2), (1, 2, 1, 1), (1, 2, 1, 2)")
  ref("pair L2018",
    "SELECT * FROM (VALUES (1,1), (1,2)) t1(a,b) RIGHT OUTER JOIN (VALUES (1,1), (1,2)) t2(c,d) ON a=c AND d > 0",
    "VALUES (1, 1, 1, 1), (1, 1, 1, 2), (1, 2, 1, 1), (1, 2, 1, 2)")
  ref("pair L2021",
    "SELECT * FROM (VALUES (1,1), (1,2)) t1(a,b) RIGHT OUTER JOIN (VALUES (1,1), (1,2)) t2(c,d) ON a=c AND c = d",
    "VALUES (1, 2, 1, 1), (1, 1, 1, 1), (NULL, NULL, 1, 2)")
  ref("pair L2024",
    "SELECT * FROM (VALUES (1,1), (1,2)) t1(a,b) RIGHT OUTER JOIN (VALUES (1,1), (1,2)) t2(c,d) ON a=c AND c < d",
    "VALUES (NULL, NULL, 1, 1), (1, 2, 1, 2), (1, 1, 1, 2)")
  ref("pair L2027",
    "SELECT * FROM (VALUES (1,1), (1,2)) t1(a,b) RIGHT OUTER JOIN (VALUES (1,1), (1,2)) t2(c,d) ON c = d",
    "VALUES (1, 1, 1, 1), (1, 2, 1, 1), (NULL, NULL, 1, 2)")
  ref("pair L2030",
    "SELECT * FROM (VALUES (1,1), (1,2)) t1(a,b) RIGHT OUTER JOIN (VALUES (1,1), (1,2)) t2(c,d) ON c < d",
    "VALUES (NULL, NULL, 1, 1), (1, 1, 1, 2), (1, 2, 1, 2)")
  ref("pair L2033",
    "SELECT * FROM (VALUES 1, 2) t1(a) RIGHT OUTER JOIN (VALUES 10, 11) t2(b) ON 1 = 1",
    "VALUES (1, 10), (1, 11), (2, 10), (2, 11)")
  ref("pair L2036",
    "SELECT * FROM (VALUES 1, 2) t1(a) RIGHT OUTER JOIN (VALUES 10, 11) t2(b) ON a > 1",
    "VALUES (2, 11), (2, 10)")
  ref("pair L2039",
    "SELECT * FROM (VALUES 1, 2) t1(a) RIGHT OUTER JOIN (VALUES 10, 11) t2(b) ON b > 10",
    "VALUES (NULL, 10), (1, 11), (2, 11)")
  ref("pair L2042",
    "SELECT * FROM (VALUES 1, 2) t1(a) RIGHT OUTER JOIN (VALUES 10, 11) t2(b) ON a > b",
    "VALUES (NULL, 10), (NULL, 11)")
  ref("pair L2045",
    "SELECT * FROM (VALUES 1, 2) t1(a) RIGHT OUTER JOIN (VALUES 10, 11) t2(b) ON a < b",
    "VALUES (1, 10), (1, 11), (2, 10), (2, 11)")
  ref("pair L2053",
    "SELECT b FROM (VALUES 1, 2) t1(a) RIGHT OUTER JOIN (VALUES 10, 11) t2(b) ON b > 10",
    "VALUES (10), (11), (11)")
  ref("pair L2056",
    "SELECT a FROM (VALUES 1, 2) t1(a) RIGHT OUTER JOIN (VALUES 10, 11) t2(b) ON a > 1",
    "VALUES (2), (2)")
  ref("pair L2059",
    "SELECT b FROM (VALUES 1, 2) t1(a) LEFT OUTER JOIN (VALUES 10, 11) t2(b) ON b > 10",
    "VALUES (11), (11)")
  ref("pair L2062",
    "SELECT a FROM (VALUES 1, 2) t1(a) LEFT OUTER JOIN (VALUES 10, 11) t2(b) ON a > 1",
    "VALUES (1), (2), (2)")
  ref("pair L2065",
    "SELECT a FROM (VALUES 1, 2) t1(a) JOIN (VALUES 10, 11) t2(b) ON a > 1",
    "VALUES (2), (2)")
  ref("pair L2068",
    "SELECT b FROM (VALUES 1, 2) t1(a) JOIN (VALUES 10, 11) t2(b) ON b > 10",
    "VALUES (11), (11)")
  ref("pair L2077",
    "SELECT * FROM (VALUES 0, 1) t1(a) JOIN (VALUES 10, 11) t2(b) ON TRUE",
    "VALUES (0, 10), (0, 11), (1, 10), (1, 11)")
  ref("pair L2079",
    "SELECT * FROM (SELECT 1 WHERE FALSE) t1(a) JOIN (VALUES 10, 11) t2(b) ON TRUE",
    "SELECT 1 WHERE FALSE")
  ref("pair L2081",
    "SELECT * FROM (VALUES 0, 1) t1(a) JOIN (SELECT 1 WHERE FALSE) t2(b) ON TRUE",
    "SELECT 1 WHERE FALSE")
  ref("pair L2083",
    "SELECT * FROM (SELECT 1 WHERE FALSE) t1(a) JOIN (SELECT 1 WHERE FALSE) t2(b) ON TRUE",
    "SELECT 1 WHERE FALSE")
  ref("pair L2087",
    "SELECT * FROM (VALUES 0, 1) t1(a) LEFT JOIN (VALUES 10, 11) t2(b) ON TRUE",
    "VALUES (0, 10), (0, 11), (1, 10), (1, 11)")
  ref("pair L2089",
    "SELECT * FROM (SELECT 1 WHERE FALSE) t1(a) LEFT JOIN (VALUES 10, 11) t2(b) ON TRUE",
    "SELECT 1 WHERE FALSE")
  ref("pair L2091",
    "SELECT * FROM (VALUES 0, 1) t1(a) LEFT JOIN (SELECT 1 WHERE FALSE) t2(b) ON TRUE",
    "VALUES (0, NULL), (1, NULL)")
  ref("pair L2093",
    "SELECT * FROM (SELECT 1 WHERE FALSE) t1(a) LEFT JOIN (SELECT 1 WHERE FALSE) t2(b) ON TRUE",
    "SELECT 1 WHERE FALSE")
  ref("pair L2097",
    "SELECT * FROM (VALUES 0, 1) t1(a) RIGHT JOIN (VALUES 10, 11) t2(b) ON TRUE",
    "VALUES (0, 10), (0, 11), (1, 10), (1, 11)")
  ref("pair L2099",
    "SELECT * FROM (SELECT 1 WHERE FALSE) t1(a) RIGHT JOIN (VALUES 10, 11) t2(b) ON TRUE",
    "VALUES (NULL, 10), (NULL, 11)")
  ref("pair L2101",
    "SELECT * FROM (VALUES 0, 1) t1(a) RIGHT JOIN (SELECT 1 WHERE FALSE) t2(b) ON TRUE",
    "SELECT 1 WHERE FALSE")
  ref("pair L2103",
    "SELECT * FROM (SELECT 1 WHERE FALSE) t1(a) RIGHT JOIN (SELECT 1 WHERE FALSE) t2(b) ON TRUE",
    "SELECT 1 WHERE FALSE")
  ref("pair L2107",
    "SELECT * FROM (VALUES 0, 1) t1(a) FULL JOIN (VALUES 10, 11) t2(b) ON TRUE",
    "VALUES (0, 10), (0, 11), (1, 10), (1, 11)")
  ref("pair L2109",
    "SELECT * FROM (SELECT 1 WHERE FALSE) t1(a) FULL JOIN (VALUES 10, 11) t2(b) ON TRUE",
    "VALUES (NULL, 10), (NULL, 11)")
  ref("pair L2111",
    "SELECT * FROM (VALUES 0, 1) t1(a) FULL JOIN (SELECT 1 WHERE FALSE) t2(b) ON TRUE",
    "VALUES (0, NULL), (1, NULL)")
  ref("pair L2113",
    "SELECT * FROM (SELECT 1 WHERE FALSE) t1(a) FULL JOIN (SELECT 1 WHERE FALSE) t2(b) ON TRUE",
    "SELECT 1 WHERE FALSE")
  ref("pair L2120",
    "SELECT COUNT(*) FROM lineitem FULL JOIN orders ON lineitem.orderkey = orders.orderkey AND lineitem.quantity > 5 WHERE lineitem.orderkey IS NULL OR orders.orderkey IS NULL",
    "SELECT COUNT(*) FROM (SELECT lineitem.orderkey AS o1, orders.orderkey AS o2 FROM lineitem LEFT OUTER JOIN orders ON lineitem.orderkey = orders.orderkey AND lineitem.quantity > 5     UNION ALL SELECT lineitem.orderkey AS o1, orders.orderkey AS o2 FROM lineitem RIGHT OUTER JOIN orders ON lineitem.orderkey = orders.orderkey AND lineitem.quantity > 5     WHERE lineitem.orderkey IS NULL)  WHERE o1 IS NULL OR o2 IS NULL")
  ref("pair L2128",
    "SELECT COUNT(*) FROM lineitem FULL OUTER JOIN orders ON lineitem.orderkey = orders.orderkey AND orders.custkey > 1000 WHERE lineitem.orderkey IS NULL OR orders.orderkey IS NULL",
    "SELECT COUNT(*) FROM (SELECT lineitem.orderkey AS o1, orders.orderkey AS o2 FROM lineitem LEFT OUTER JOIN orders ON lineitem.orderkey = orders.orderkey AND orders.custkey > 1000     UNION ALL SELECT lineitem.orderkey AS o1, orders.orderkey AS o2 FROM lineitem RIGHT OUTER JOIN orders ON lineitem.orderkey = orders.orderkey AND orders.custkey > 1000     WHERE lineitem.orderkey IS NULL)  WHERE o1 IS NULL OR o2 IS NULL")
  ref("pair L2136",
    "SELECT COUNT(*) FROM lineitem FULL OUTER JOIN orders ON lineitem.orderkey = orders.orderkey AND orders.custkey > lineitem.quantity WHERE lineitem.orderkey IS NULL OR orders.orderkey IS NULL",
    "SELECT COUNT(*) FROM (SELECT lineitem.orderkey AS o1, orders.orderkey AS o2 FROM lineitem LEFT OUTER JOIN orders ON lineitem.orderkey = orders.orderkey AND orders.custkey > lineitem.quantity     UNION ALL SELECT lineitem.orderkey AS o1, orders.orderkey AS o2 FROM lineitem RIGHT OUTER JOIN orders ON lineitem.orderkey = orders.orderkey AND orders.custkey > lineitem.quantity     WHERE lineitem.orderkey IS NULL)  WHERE o1 IS NULL OR o2 IS NULL")
  ref("pair L2144",
    "SELECT * FROM (VALUES (1,1), (1,2)) t1(a,b) FULL OUTER JOIN (VALUES (1,1), (1,2)) t2(c,d) ON a=c AND b > d",
    "VALUES (1, 2, 1, 1), (NULL, NULL, 1, 2), (1, 1, NULL, NULL)")
  ref("pair L2147",
    "SELECT * FROM (VALUES (1,1), (1,2)) t1(a,b) FULL OUTER JOIN (VALUES (1,1), (1,2)) t2(c,d) ON a=c AND b < d",
    "VALUES (1, 1, 1, 2), (NULL, NULL, 1, 1), (1, 2, NULL, NULL)")
  ref("pair L2150",
    "SELECT * FROM (VALUES (1,1), (1,2)) t1(a,b) FULL OUTER JOIN (VALUES (1,1), (1,2)) t2(c,d) ON a=c AND b > 2",
    "VALUES (NULL, NULL, 1, 1), (NULL, NULL, 1, 2), (1, 1, NULL, NULL), (1, 2, NULL, NULL)")
  ref("pair L2153",
    "SELECT * FROM (VALUES (1,1), (1,2)) t1(a,b) FULL OUTER JOIN (VALUES (1,1), (1,2)) t2(c,d) ON a=c AND d > 2",
    "VALUES (NULL, NULL, 1, 1), (NULL, NULL, 1, 2), (1, 1, NULL, NULL), (1, 2, NULL, NULL)")
  ref("pair L2156",
    "SELECT * FROM (VALUES (1,1), (1,2)) t1(a,b) FULL OUTER JOIN (VALUES (1,1), (1,2)) t2(c,d) ON a=c AND b > 0",
    "VALUES (1, 1, 1, 1), (1, 1, 1, 2), (1, 2, 1, 1), (1, 2, 1, 2)")
  ref("pair L2159",
    "SELECT * FROM (VALUES (1,1), (1,2)) t1(a,b) FULL OUTER JOIN (VALUES (1,1), (1,2)) t2(c,d) ON a=c AND d > 0",
    "VALUES (1, 1, 1, 1), (1, 1, 1, 2), (1, 2, 1, 1), (1, 2, 1, 2)")
  ref("pair L2162",
    "SELECT * FROM (VALUES 1, 2) t1(a) FULL OUTER JOIN (VALUES 10, 11) t2(b) ON a > 1",
    "VALUES (2, 11), (2, 10), (1, NULL)")
  ref("pair L2165",
    "SELECT * FROM (VALUES 1, 2) t1(a) FULL OUTER JOIN (VALUES 10, 11) t2(b) ON b > 10",
    "VALUES (NULL, 10), (1, 11), (2, 11)")
  ref("pair L2168",
    "SELECT * FROM (VALUES 1, 2) t1(a) FULL OUTER JOIN (VALUES 10, 11) t2(b) ON a > b",
    "VALUES (NULL, 10), (NULL, 11), (1, NULL), (2, NULL)")
  ref("pair L2171",
    "SELECT * FROM (VALUES 1, 2) t1(a) FULL OUTER JOIN (VALUES 10, 11) t2(b) ON a < b",
    "VALUES (1, 10), (1, 11), (2, 10), (2, 11)")
  ref("pair L2185",
    "SELECT COUNT(*) FROM lineitem JOIN (SELECT orderkey, orderdate shipdate FROM orders) T USING (orderkey, shipdate)",
    "SELECT COUNT(*) FROM lineitem JOIN orders ON lineitem.orderkey = orders.orderkey AND lineitem.shipdate = orders.orderdate")
  ref("pair L2193",
    "SELECT count(*) FROM ((SELECT * FROM orders) union all (SELECT * FROM orders)) JOIN orders USING (orderkey)",
    "SELECT 2 * count(*) FROM orders")
  ref("pair L2399",
    "SELECT count() FROM nation a INNER JOIN nation b ON a.name = (SELECT max(name) FROM nation) INNER JOIN nation c ON c.name = split_part(b.name,'<',2)",
    "SELECT 0")
  ref("pair L2435",
    "SELECT a IN (VALUES 2), a FROM (VALUES (2)) t(a)",
    "SELECT TRUE, 2")
  ref("pair L2443",
    "SELECT * FROM (     SELECT a, nullif(a, 1)     FROM (VALUES 1) w(a) ) t(a,b) JOIN (VALUES 1) u(x) ON t.a = u.x",
    "SELECT 1, NULL, 1")
  ref("pair L2452",
    "SELECT * FROM (     SELECT a, contains(array[2, null], a)     FROM (VALUES 1) w(a) ) t(a,b) JOIN (VALUES 1) u(x) ON t.a = u.x ",
    "SELECT 1, NULL, 1")
  ref("pair L2461",
    "SELECT * FROM (     SELECT a, array[null][a]     FROM (VALUES 1) w(a) ) t(a,b) JOIN (VALUES 1) u(x) ON t.a = u.x",
    "SELECT 1, NULL, 1")
  ref("pair L2470",
    "SELECT * FROM (     SELECT a, try(a / 0)     FROM (VALUES 1) w(a) ) t(a,b) JOIN (VALUES 1) u(x) ON t.a = u.x",
    "SELECT 1, NULL, 1")
  ref("pair L2513",
    "SELECT a, b FROM (VALUES (1), (2)) t (a) FULL OUTER JOIN (VALUES (1), (3)) u (b) ON a = b",
    "SELECT * FROM (VALUES (1, 1), (2, NULL), (NULL, 3))")
  ref("pair L2515",
    "SELECT COUNT(*) FROM lineitem FULL JOIN orders ON lineitem.orderkey = orders.orderkey",
    "SELECT COUNT(*) FROM (SELECT lineitem.orderkey, orders.orderkey AS o2 FROM lineitem LEFT OUTER JOIN orders ON lineitem.orderkey = orders.orderkey UNION ALL SELECT lineitem.orderkey, orders.orderkey AS o2 FROM lineitem RIGHT OUTER JOIN orders ON lineitem.orderkey = orders.orderkey WHERE lineitem.orderkey IS NULL)")
  ref("pair L2522",
    "SELECT COUNT(*) FROM lineitem FULL OUTER JOIN orders ON lineitem.orderkey = orders.orderkey",
    "SELECT COUNT(*) FROM (SELECT lineitem.orderkey, orders.orderkey AS o2 FROM lineitem LEFT OUTER JOIN orders ON lineitem.orderkey = orders.orderkey UNION ALL SELECT lineitem.orderkey, orders.orderkey AS o2 FROM lineitem RIGHT OUTER JOIN orders ON lineitem.orderkey = orders.orderkey WHERE lineitem.orderkey IS NULL)")
  ref("pair L2532",
    "SELECT COUNT(*) FROM lineitem FULL JOIN orders ON lineitem.orderkey = orders.custkey",
    "SELECT COUNT(*) FROM (SELECT lineitem.orderkey, orders.orderkey AS o2 FROM lineitem LEFT OUTER JOIN orders ON lineitem.orderkey = orders.custkey UNION ALL SELECT lineitem.orderkey, orders.orderkey AS o2 FROM lineitem RIGHT OUTER JOIN orders ON lineitem.orderkey = orders.custkey WHERE lineitem.orderkey IS NULL)")
  ref("pair L2544",
    "SELECT COUNT(*) FROM lineitem FULL JOIN orders ON lineitem.orderkey = orders.orderkey WHERE lineitem.orderkey IS NOT NULL",
    "SELECT COUNT(*) FROM lineitem LEFT OUTER JOIN orders ON lineitem.orderkey = orders.orderkey WHERE lineitem.orderkey IS NOT NULL")
  ref("pair L2549",
    "SELECT COUNT(*) FROM lineitem FULL JOIN orders ON lineitem.orderkey = orders.custkey WHERE lineitem.orderkey IS NOT NULL",
    "SELECT COUNT(*) FROM lineitem LEFT OUTER JOIN orders ON lineitem.orderkey = orders.custkey WHERE lineitem.orderkey IS NOT NULL")
  ref("pair L2556",
    "SELECT COUNT(*) FROM lineitem FULL JOIN orders ON lineitem.orderkey = orders.orderkey WHERE orders.orderkey IS NOT NULL",
    "SELECT COUNT(*) FROM lineitem RIGHT OUTER JOIN orders ON lineitem.orderkey = orders.orderkey  WHERE orders.orderkey IS NOT NULL")
  ref("pair L2561",
    "SELECT COUNT(*) FROM lineitem FULL JOIN orders ON lineitem.orderkey = orders.custkey WHERE orders.custkey IS NOT NULL",
    "SELECT COUNT(*) FROM lineitem RIGHT OUTER JOIN orders ON lineitem.orderkey = orders.custkey  WHERE orders.custkey IS NOT NULL")
  ref("pair L2622",
    "SELECT DISTINCT a.orderkey FROM (SELECT CASE WHEN orderkey > 2 THEN orderkey END orderkey FROM orders WHERE orderkey < 100) a FULL OUTER JOIN (SELECT * FROM orders WHERE orderkey < 100) b ON a.orderkey = b.orderkey",
    "SELECT DISTINCT orderkey FROM (SELECT a.orderkey FROM (SELECT CASE WHEN orderkey > 2 THEN orderkey END orderkey FROM orders WHERE orderkey < 100) a RIGHT OUTER JOIN (SELECT * FROM orders WHERE orderkey < 100) b ON a.orderkey = b.orderkey UNION ALL SELECT a.orderkey FROM(SELECT CASE WHEN orderkey > 2 THEN orderkey END orderkey FROM orders WHERE orderkey < 100) a LEFT OUTER JOIN (SELECT * FROM orders WHERE orderkey < 100) b ON a.orderkey = b.orderkey WHERE a.orderkey IS NULL)")
  ref("pair L2662",
    "SELECT x.val FROM (SELECT CAST(ROW(v) AS ROW(val integer)) FROM (VALUES 1, 2, 3) t(v)) ta (x) LEFT OUTER JOIN (SELECT CAST(ROW(v) AS ROW(val integer)) FROM (VALUES 1, 2, 3) t(v)) tb (y) ON x.val=y.val WHERE y.val=1",
    "SELECT 1")
  ref("pair L2900",
    "SELECT * FROM (VALUES 1, 2) a(id) FULL JOIN (VALUES 2, 3) b(id) ON (array_intersect(array[a.id], array[b.id]) = array[a.id])",
    "VALUES (1, null), (2, 2), (null, 3)")
  ref("pair L3028",
    "SELECT to_hex(checksum(0))",
    "SELECT '0000000000000000'")
  ref("pair L3034",
    "SELECT MAX_BY(orderkey, totalprice) FROM orders",
    "SELECT orderkey FROM orders ORDER BY totalprice DESC LIMIT 1")
  ref("pair L3040",
    "SELECT y FROM (SELECT MAX_BY(orderkey, totalprice, 2) mx FROM orders) CROSS JOIN UNNEST(mx) u(y)",
    "SELECT orderkey FROM orders ORDER BY totalprice DESC LIMIT 2")
  ref("pair L3047",
    "SELECT MIN_BY(orderkey, totalprice) FROM orders",
    "SELECT orderkey FROM orders ORDER BY totalprice ASC LIMIT 1")
  ref("pair L3048",
    "SELECT MIN_BY(a, ROW(b, c)) FROM (VALUES (1, 2, 3), (2, 2, 1)) AS t(a, b, c)",
    "SELECT 2")
  ref("pair L3054",
    "SELECT y FROM (SELECT MIN_BY(orderkey, totalprice, 2) mx FROM orders) CROSS JOIN UNNEST(mx) u(y)",
    "SELECT orderkey FROM orders ORDER BY totalprice ASC LIMIT 2")
  ref("pair L3272",
    "SELECT x, T.y, z + 1 FROM (SELECT custkey, orderstatus, totalprice FROM orders) T (x, y, z)",
    "SELECT custkey, orderstatus, totalprice + 1 FROM orders")
  ref("pair L4013",
    "SELECT try_cast('1' AS BIGINT)",
    "SELECT CAST('1' AS BIGINT)")
  ref("pair L4015",
    "SELECT try_cast(orderkey AS DOUBLE) FROM orders",
    "SELECT CAST(orderkey AS DOUBLE) FROM orders")
  ref("pair L4016",
    "SELECT try_cast(orderkey AS VARCHAR) FROM orders",
    "SELECT CAST(orderkey AS VARCHAR) FROM orders")
  ref("pair L4017",
    "SELECT try_cast(orderkey AS BOOLEAN) FROM orders",
    "SELECT CAST(orderkey AS BOOLEAN) FROM orders")
  ref("pair L4023",
    "SELECT try_cast(clerk AS VARCHAR) || try_cast(clerk AS VARCHAR) FROM orders",
    "SELECT clerk || clerk FROM orders")
  ref("pair L4053",
    "SELECT TRY(CAST('a' AS BIGINT))",
    "SELECT NULL")
  ref("pair L4092",
    "SELECT COUNT(*) FROM (SELECT * FROM lineitem) JOIN (SELECT * FROM orders) USING (orderkey)",
    "SELECT COUNT(*) FROM lineitem JOIN orders ON lineitem.orderkey = orders.orderkey")
  ref("pair L4100",
    "WITH a AS (SELECT * FROM orders) SELECT * FROM a",
    "SELECT * FROM orders")
  ref("pair L4115",
    "WITH a AS (SELECT * FROM orders) SELECT * FROM a x",
    "SELECT * FROM orders")
  ref("pair L4121",
    "WITH a AS (SELECT * FROM orders)SELECT * FROM (   SELECT * FROM a)",
    "SELECT * FROM orders")
  ref("pair L4132",
    "WITH a AS (SELECT orderkey n FROM orders) , b AS (SELECT n + 1 n FROM a) , c AS (SELECT n + 1 n FROM b) SELECT n + 1 FROM c",
    "SELECT orderkey + 3 FROM orders")
  ref("pair L4154",
    "WITH a AS (   WITH aa AS (SELECT 123 x FROM orders LIMIT 1)   SELECT x y FROM aa ), b AS (   WITH bb AS (     WITH bbb AS (SELECT y FROM a)     SELECT bbb.* FROM bbb   )   SELECT y z FROM bb ) SELECT * FROM (   WITH q AS (SELECT z w FROM b)   SELECT j.*, k.*   FROM a j   JOIN q k ON (j.y = k.w) ) t",
    "SELECT 123, 123 FROM orders LIMIT 1")
  ref("pair L4180",
    "WITH t (a, b, c) AS (SELECT 1, custkey x, orderkey FROM orders) SELECT c, b, a FROM t",
    "SELECT orderkey, custkey, 1 FROM orders")
  ref("pair L4228",
    " SELECT CASE x WHEN 1 THEN CAST(1 AS decimal(4,1)) WHEN 2 THEN CAST(1 AS decimal(4,2)) ELSE CAST(1 AS decimal(4,3)) END FROM (values 1) t(x)",
    "SELECT 1.000")
  ref("pair L4234",
    "SELECT sum(IF(orderstatus = 'F', totalprice, 0.0)) FROM orders",
    "SELECT sum(CASE WHEN orderstatus = 'F' THEN totalprice ELSE 0.0 END) FROM orders")
  ref("pair L4237",
    "SELECT sum(IF(orderstatus = 'Z', totalprice)) FROM orders",
    "SELECT sum(CASE WHEN orderstatus = 'Z' THEN totalprice END) FROM orders")
  ref("pair L4240",
    "SELECT sum(IF(orderstatus = 'F', NULL, totalprice)) FROM orders",
    "SELECT sum(CASE WHEN orderstatus = 'F' THEN NULL ELSE totalprice END) FROM orders")
  ref("pair L4243",
    "SELECT IF(orderstatus = 'Z', orderkey / 0, orderkey) FROM orders",
    "SELECT CASE WHEN orderstatus = 'Z' THEN orderkey / 0 ELSE orderkey END FROM orders")
  ref("pair L4246",
    "SELECT sum(IF(NULLIF(orderstatus, 'F') <> 'F', totalprice, 5.1)) FROM orders",
    "SELECT sum(CASE WHEN NULLIF(orderstatus, 'F') <> 'F' THEN totalprice ELSE 5.1 END) FROM orders")
  ref("pair L4258",
    "SELECT orderkey FROM orders WHERE orderkey IN (1.5, 2.3)",
    "SELECT orderkey FROM orders LIMIT 0")
  ref("pair L4267",
    "SELECT x FROM (values 1, 2, 3, 2147483648) t(x) WHERE x IN (1 + CAST(rand() < 0 AS bigint), 2 + CAST(rand() < 0 AS bigint), 2147483648)",
    "values 1, 2, 2147483648")
  ref("pair L4269",
    "SELECT x IN (0, 4294967297 + CAST(rand() < 0 AS bigint)) FROM (values 4294967296, 4294967297) t(x)",
    "values false, true")
  ref("pair L4304",
    "SELECT NULL IN (1, 2, 3)",
    "SELECT NULL")
  ref("pair L4311",
    "SELECT x IN (SELECT TRUE) FROM (SELECT * FROM (VALUES CAST(NULL AS BOOLEAN)) t(x) WHERE (x OR NULL) IS NULL)",
    "SELECT NULL")
  ref("pair L4312",
    "SELECT x IN (SELECT 1) FROM (SELECT * FROM (VALUES CAST(NULL AS INTEGER)) t(x) WHERE (x + 10 IS NULL) OR X = 2)",
    "SELECT NULL")
  ref("pair L4313",
    "SELECT x IN (SELECT 1 WHERE FALSE) FROM (SELECT * FROM (VALUES CAST(NULL AS INTEGER)) t(x) WHERE (x + 10 IS NULL) OR X = 2)",
    "SELECT FALSE")
  ref("pair L4326",
    "SELECT * FROM (SELECT orderkey, orderkey FROM orders)",
    "SELECT orderkey, orderkey FROM orders")
  ref("pair L4372",
    "SELECT a.Col0 FROM (VALUES row(cast(ROW(1,2) AS ROW(col0 integer, col1 integer)))) AS t (a)",
    "SELECT 1")
  ref("pair L4924",
    "SELECT linenumber, sum(TRY(100/(CAST (tax*10 AS BIGINT)))) FROM lineitem GROUP BY linenumber",
    "SELECT linenumber, sum(100/(CAST (tax*10 AS BIGINT))) FROM lineitem WHERE CAST(tax*10 AS BIGINT) <> 0 GROUP BY linenumber")
  ref("pair L4956",
    "SELECT JSON_FORMAT(TRY(JSON 'INVALID'))",
    "SELECT NULL")
  ref("pair L4957",
    "SELECT JSON_FORMAT(TRY (JSON_PARSE('INVALID')))",
    "SELECT NULL")
  ref("pair L4968",
    "SELECT COALESCE(TRY(CAST(CONCAT('a', CAST(123 AS VARCHAR)) AS BIGINT)), 0)",
    "SELECT 0L")
  ref("pair L4970",
    "SELECT JSON_FORMAT(TRY(JSON '[]')) || '123'",
    "SELECT '[]123'")
  ref("pair L4971",
    "SELECT JSON_FORMAT(TRY(JSON 'INVALID')) || '123'",
    "SELECT NULL")
  ref("pair L5077",
    "SELECT a[1] FROM (SELECT ARRAY[1] UNION ALL SELECT ARRAY[1]) t(a) LIMIT 1",
    "SELECT 1")
  ref("pair L5090",
    "SELECT * FROM (   SELECT regionkey FROM nation    UNION ALL    SELECT nationkey FROM nation) t(a) ORDER BY a LIMIT 1",
    "SELECT 0")
  ref("pair L5113",
    "SELECT regionkey, count(*) FROM (   SELECT regionkey FROM nation    UNION ALL    SELECT * FROM (VALUES 2, 100) t(regionkey)) GROUP BY regionkey",
    "SELECT * FROM (VALUES  (0, 5), (1, 5), (2, 6), (3, 5), (4, 5), (100, 1))")
  ref("pair L5206",
    "SELECT orderkey, 1 FROM orders UNION ALL SELECT orderkey, count(*) FROM orders GROUP BY 1",
    "SELECT orderkey, 1 FROM orders UNION ALL SELECT orderkey, count(*) FROM orders GROUP BY orderkey")
  ref("pair L5214",
    "SELECT orderkey, count(*) FROM orders GROUP BY 1 UNION ALL SELECT orderkey, 1 FROM orders",
    "SELECT orderkey, count(*) FROM orders GROUP BY orderkey UNION ALL SELECT orderkey, 1 FROM orders")
  ref("pair L5279",
    "VALUES 1 UNION ALL VALUES 1.0, 2",
    "SELECT * FROM (VALUES 1) UNION ALL SELECT * FROM (VALUES 1.0, 2)")
  ref("pair L5280",
    "(VALUES 1) UNION ALL (VALUES 1.0, 2)",
    "SELECT * FROM (VALUES 1) UNION ALL SELECT * FROM (VALUES 1.0, 2)")
  ref("pair L5285",
    "SELECT * FROM (VALUES 1) UNION SELECT * FROM (VALUES 1.0, 2)",
    "VALUES 1.0, 2.0")
  ref("pair L5312",
    "TABLE orders ORDER BY orderkey LIMIT 10",
    "SELECT * FROM orders ORDER BY orderkey LIMIT 10")
  ref("pair L5318",
    "(SELECT * FROM orders ORDER BY orderkey LIMIT 10) UNION ALL TABLE orders",
    "(SELECT * FROM orders ORDER BY orderkey LIMIT 10) UNION ALL SELECT * FROM orders")
  ref("pair L5324",
    "(TABLE orders) ORDER BY orderkey",
    "(SELECT * FROM orders) ORDER BY orderkey")
  ref("pair L5399",
    "SELECT a, b, c, d FROM (VALUES (1, 'a'), (2, 'b'), (3, 'c'), (4, 'd')) t1 (a, b) CROSS JOIN (VALUES (1, 1.1), (3, 3.3), (5, 5.5)) t2 (c, d) WHERE t1.a > t2.c",
    "SELECT * FROM (VALUES  (2, 'b', 1, 1.1), (3, 'c', 1, 1.1), (4, 'd', 1, 1.1), (4, 'd', 3, 3.3))")
  ref("pair L5423",
    "SELECT a, b FROM (VALUES ('AA'), ('BB'), (null)) t (a), (VALUES ('111'), (null), ('333')) u (b)",
    "SELECT * FROM (VALUES ('AA', '111'), ('AA', null), ('AA', '333'), ('BB', '111'), ('BB', null), ('BB', '333'), (null, '111'), (null, null), (null, '333'))")
  ref("pair L5509",
    "SELECT * FROM (VALUES (1,1), (2,2), (3, 3)) t(x, y) WHERE (x+y in (VALUES 4, 5)) AND (x*y in (VALUES 4, 5))",
    "VALUES (2,2)")
  ref("pair L5516",
    "SELECT 1.0 in (values (1), (2), (3))",
    "SELECT true")
  ref("pair L5520",
    "SELECT CAST(1 AS decimal(3,2)) IN (values (cast(1 AS decimal(3,1))), (cast (2 AS decimal(3,1))))",
    "SELECT true")
  ref("pair L5618",
    "WITH empty AS (SELECT 1 WHERE FALSE) SELECT x FROM (VALUES NULL) t(x) WHERE x NOT IN (SELECT * FROM empty)",
    "VALUES NULL")
  ref("pair L5801",
    "SELECT x IN (SELECT * FROM (VALUES 1)) FROM (VALUES 2) t(x) WHERE x IN (SELECT * FROM (VALUES 1))",
    "SELECT 1 WHERE false")
  ref("pair L5867",
    "SELECT DISTINCT COUNT(*) FROM (SELECT * FROM orders ORDER BY orderkey LIMIT 5) o1 FULL JOIN (SELECT * FROM orders ORDER BY orderkey LIMIT 10) o2 ON o1.orderkey BETWEEN (SELECT avg(orderkey) FROM orders) - 10 AND (SELECT avg(orderkey) FROM orders) + 10 GROUP BY o1.orderkey",
    "VALUES 1, 10")
  ref("pair L5925",
    "SELECT (NOT EXISTS(SELECT 1)) IN (true, false)",
    "SELECT true")
  ref("pair L5927",
    "SELECT (EXISTS(SELECT 1 WHERE false)) IN (true, false)",
    "SELECT true")
  ref("pair L5928",
    "SELECT (NOT EXISTS(SELECT 1 WHERE false)) IN (true, false)",
    "SELECT true")
  ref("pair L5931",
    "SELECT (NOT EXISTS(SELECT 1 WHERE false)) IN (false)",
    "SELECT false")
  ref("pair L6449",
    "SELECT EXISTS(SELECT 1 FROM (VALUES 1, 1, 1, 2, 2, 3, 4) i(a) WHERE i.a < o.a AND i.a < 4) FROM (VALUES 0, 3, 3, 5) o(a)",
    "VALUES false, true, true, true")
  ref("pair L6530",
    "SELECT   count(*) AS numwait FROM   nation l1 WHERE   EXISTS(     SELECT *     FROM       nation l2     WHERE       l2.nationkey = l1.nationkey   )   AND NOT EXISTS(     SELECT *     FROM       nation l3     WHERE       l3.nationkey= l1.nationkey   ) ",
    "VALUES 0")
  ref("pair L7427",
    "SELECT val FROM (SELECT DISTINCT vals FROM (values (array[2])) t(vals) WHERE false) tmp CROSS JOIN unnest(tmp.vals) tt(val)",
    "SELECT 1 WHERE 1=2")
  ref("pair L7476",
    "SELECT * FROM (  SELECT t2.x || t2.z cc FROM (    SELECT *    FROM (VALUES (CAST('a' AS VARCHAR), CAST('c' AS VARCHAR))) t(x, z)  ) t2  JOIN (    SELECT *    FROM (VALUES (CAST('a' AS VARCHAR), CAST('c' AS VARCHAR))) u(x, z)    WHERE z='c'  ) u2  ON t2.z = u2.z) tt WHERE cc = 'ac'",
    "SELECT 'ac'")
  ref("pair L7491",
    "SELECT * FROM (  SELECT greatest (t.x, t.z) cc FROM (    SELECT *    FROM (VALUES (VARCHAR 'a', VARCHAR 'c')) t(x, z)  ) t  JOIN (    SELECT *    FROM (VALUES (VARCHAR 'a', VARCHAR 'c')) u(x, z)    WHERE z='c'  ) u  ON t.z = u.z)WHERE cc = 'c'",
    "SELECT 'c'")
  ref("pair L7506",
    "SELECT cc[1], cc[2] FROM ( SELECT * FROM (  SELECT array[t.x, t.z] cc FROM (    SELECT *    FROM (VALUES (VARCHAR 'a', VARCHAR 'c')) t(x, z)  ) t  JOIN (    SELECT *    FROM (VALUES (VARCHAR 'a', VARCHAR 'c')) u(x, z)    WHERE z='c'  ) u  ON t.z = u.z) WHERE cc = array['a', 'c'])",
    "SELECT 'a', 'c'")
  ref("pair L7721",
    "SELECT CAST(1 AS decimal(3,2)) = ANY(SELECT CAST(1 AS decimal(3,1)))",
    "SELECT true")
  ref("pair L7907",
    "SELECT count(*) FROM nation WHERE (SELECT true FROM (SELECT 1) t(a) WHERE a = nationkey) OR TRUE",
    "SELECT 25")
  ref("pair L7910",
    "SELECT (SELECT true FROM (SELECT 1) t(a) WHERE a = nationkey) FROM nation WHERE (SELECT true FROM (SELECT 1) t(a) WHERE a = nationkey) OR TRUE ORDER BY nationkey LIMIT 2",
    "VALUES true, null")
  ref("pair L7939",
    "SELECT name FROM nation, LATERAL (SELECT 1 WHERE false)",
    "SELECT 1 WHERE false")
  ref("pair L7943",
    "SELECT name FROM nation, LATERAL (SELECT 1)",
    "SELECT name FROM nation")
  ref("pair L7947",
    "SELECT name FROM nation, LATERAL (SELECT 1 WHERE name = 'ola')",
    "SELECT 1 WHERE false")
  ref("pair L7951",
    "SELECT nationkey, a FROM nation, LATERAL (SELECT max(region.name) FROM region WHERE region.regionkey <= nation.regionkey) t(a) ORDER BY nationkey LIMIT 1",
    "VALUES (0, 'AFRICA')")
  ref("pair L7955",
    "SELECT nationkey, a FROM nation, LATERAL (SELECT region.name || '_' FROM region WHERE region.regionkey = nation.regionkey) t(a) ORDER BY nationkey LIMIT 1",
    "VALUES (0, 'AFRICA_')")
  ref("pair L7963",
    "SELECT * FROM region r, LATERAL (SELECT * FROM nation) n WHERE n.regionkey = r.regionkey",
    "SELECT * FROM region, nation WHERE nation.regionkey = region.regionkey")
  ref("pair L7966",
    "SELECT * FROM region, LATERAL (SELECT * FROM nation WHERE nation.regionkey = region.regionkey)",
    "SELECT * FROM region, nation WHERE nation.regionkey = region.regionkey")
  ref("pair L7979",
    "SELECT y FROM (VALUES array[2, 3]) a(x) CROSS JOIN LATERAL(SELECT x[1]) b(y)",
    "SELECT 2")
  ref("pair L7982",
    "SELECT * FROM (VALUES 2) a(x) CROSS JOIN LATERAL(SELECT x + 1)",
    "SELECT 2, 3")
  ref("pair L7985",
    "SELECT * FROM (VALUES 2) a(x) CROSS JOIN LATERAL(SELECT x)",
    "SELECT 2, 2")
  ref("pair L7988",
    "SELECT * FROM (VALUES 2) a(x) CROSS JOIN LATERAL(SELECT x, x + 1)",
    "SELECT 2, 2, 3")
  ref("pair L8010",
    "SELECT count(*) FROM (VALUES 2) t(a) GROUP BY a",
    "VALUES 1")
  ref("pair L8011",
    "SELECT a, count(*) FROM (VALUES 2) t(a) GROUP BY a",
    "VALUES (2, 1)")
  ref("pair L8012",
    "SELECT count(*) FROM (VALUES 2) t(a) GROUP BY a+1",
    "VALUES 1")
}
