package graft

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** Subquery shapes Presto plans from any expression context
  * (SubqueryPlanner.java:69 / PlanNodeDecorrelator.java) that Spark's
  * analyzer or optimizer refuses — closed by graft.Decorrelate. Statements
  * are the reference's exact SQL from AbstractTestQueries.java
  * (testCorrelatedExistsSubqueries* around :6363-6520, scalar subquery
  * sections :5876-6190, testQualifiedWildcardFromJoin :1828); expected
  * sides are the reference's own H2-oracle strings where literal, or an
  * equivalent statement where the reference self-checks against H2 at a
  * different fixture scale. */
class DecorrelateSpec extends AnyFunSuite {
  import TestSession._

  private lazy val engine = graft.queries.RefCorpus.engine(spark, sf)

  private def canon(v: Any): String = v match {
    case null => "null"
    case n @ (_: Byte | _: Short | _: Int | _: Long | _: Double) =>
      new java.math.BigDecimal(n.toString).stripTrailingZeros.toPlainString
    case d: java.math.BigDecimal => d.stripTrailingZeros.toPlainString
    case d: BigDecimal => d.bigDecimal.stripTrailingZeros.toPlainString
    case s: String => "'" + s + "'"
    case r: Row => r.toSeq.map(canon).mkString("row(", ", ", ")")
    case other => String.valueOf(other)
  }

  private def rows(sql: String): Seq[String] =
    engine.sql(sql).collect().toSeq.map(r => r.toSeq.map(canon).mkString("(", ", ", ")"))

  private def ref(name: String, actual: String, expected: String,
      ordered: Boolean = false): Unit = test(name) {
    val got = rows(actual)
    val want = rows(expected)
    if (ordered) assert(got == want, s"\nactual:   $actual")
    else assert(got.sorted == want.sorted, s"\nactual:   $actual")
  }

  // --- subquery expressions in ORDER BY (testScalarSubquery :5876,
  //     testExistsSubquery :5969, :6073, :6190, :6367, :6395, :6490) ---
  ref("order by uncorrelated exists",
    "SELECT orderkey, totalprice FROM orders ORDER BY EXISTS(SELECT 2)",
    "SELECT orderkey, totalprice FROM orders")
  ref("order by negated uncorrelated exists",
    "SELECT orderkey, totalprice FROM orders ORDER BY NOT(EXISTS(SELECT 2))",
    "SELECT orderkey, totalprice FROM orders")
  ref("order by correlated no-from scalar",
    "SELECT nationkey FROM nation n ORDER BY (SELECT 2 * n.nationkey)",
    "SELECT nationkey FROM nation ORDER BY nationkey", ordered = true)
  ref("order by correlated no-from count",
    "SELECT * FROM orders o ORDER BY (SELECT count(*) WHERE o.orderkey = 0)",
    "SELECT * FROM orders o")
  ref("order by pruned-correlation exists",
    "SELECT * FROM orders o ORDER BY EXISTS(SELECT o.orderkey)",
    "SELECT * FROM orders o")
  ref("order by no-from equality exists",
    "SELECT * FROM orders o ORDER BY EXISTS(SELECT 1 WHERE o.orderkey = 0)",
    "SELECT * FROM orders o")
  ref("order by real-from correlated exists",
    "SELECT orderkey FROM lineitem l ORDER BY EXISTS(SELECT 1 WHERE l.orderkey > 0 OR l.orderkey != 3)",
    "SELECT orderkey FROM lineitem")

  // --- EXISTS in an inner-join ON predicate referencing both sides
  //     (:6381, :6428, :6509 — the LEFT JOIN forms stay refused, matching
  //     the reference's "Correlated subquery in given context is not
  //     supported") ---
  ref("join on not-exists of projected comparison",
    "SELECT * FROM orders o JOIN (SELECT * FROM lineitem ORDER BY orderkey LIMIT 2) l " +
      "ON NOT EXISTS(SELECT o.orderkey = l.orderkey)",
    // EXISTS over a no-FROM one-row select is always true → empty join
    "SELECT o.*, l.* FROM orders o JOIN (SELECT * FROM lineitem ORDER BY orderkey LIMIT 2) l ON false")
  ref("join on no-from equality not-exists",
    "SELECT count(*) FROM (SELECT * FROM orders ORDER BY orderkey LIMIT 10) o1 " +
      "JOIN (SELECT * FROM orders ORDER BY orderkey LIMIT 5) o2 " +
      "ON NOT EXISTS(SELECT 1 WHERE o1.orderkey = o2.orderkey)",
    "SELECT count(*) FROM (SELECT * FROM orders ORDER BY orderkey LIMIT 10) o1 " +
      "JOIN (SELECT * FROM orders ORDER BY orderkey LIMIT 5) o2 " +
      "ON o1.orderkey <> o2.orderkey")
  ref("join on real-from correlated not-exists",
    "SELECT count(*) FROM (SELECT * FROM orders ORDER BY orderkey LIMIT 10) o1 " +
      "JOIN (SELECT * FROM orders ORDER BY orderkey LIMIT 5) o2 " +
      "ON NOT EXISTS(SELECT 1 FROM orders i WHERE o1.orderkey < o2.orderkey AND i.orderkey % 10000 = 0)",
    "SELECT count(*) FROM (SELECT * FROM orders ORDER BY orderkey LIMIT 10) o1 " +
      "JOIN (SELECT * FROM orders ORDER BY orderkey LIMIT 5) o2 " +
      "ON NOT (o1.orderkey < o2.orderkey AND EXISTS(SELECT 1 FROM orders i WHERE i.orderkey % 10000 = 0))")
  // The reference REFUSES left joins over these ("Correlated subquery in
  // given context is not supported") because its planner cannot decorrelate
  // an outer join predicate. The no-FROM form inlines to a plain predicate
  // here, so it RUNS with the semantics Presto would have if it could plan
  // it — a documented superset. The real-FROM form stays refused (matching
  // the reference).
  ref("left join on no-from exists runs (superset of the reference)",
    "SELECT count(*) FROM orders o1 LEFT JOIN orders o2 " +
      "ON NOT EXISTS(SELECT 1 WHERE o1.orderkey = o2.orderkey)",
    "SELECT count(*) FROM orders o1 LEFT JOIN orders o2 " +
      "ON o1.orderkey <> o2.orderkey")
  test("left join on real-from correlated exists still refused (reference also fails)") {
    intercept[Exception] {
      engine.sql("SELECT count(*) FROM orders o1 LEFT JOIN orders o2 " +
        "ON NOT EXISTS(SELECT 1 FROM orders i WHERE o1.orderkey < o2.orderkey)").collect()
    }
  }

  // --- correlation through a trivial subrelation (:6384, :6438, :6516) ---
  ref("subrelation over pruned-correlation exists",
    "SELECT count(*) FROM orders o WHERE (SELECT * FROM (SELECT EXISTS(SELECT o.orderkey)))",
    "SELECT count(*) FROM orders")
  ref("subrelation over no-from equality exists",
    "SELECT count(*) FROM orders o WHERE (SELECT * FROM (SELECT EXISTS(SELECT 1 WHERE o.orderkey = 0)))",
    "SELECT count(*) FROM orders o WHERE o.orderkey = 0")
  ref("subrelation over real-from correlated exists",
    "SELECT count(*) FROM orders o " +
      "WHERE (SELECT * FROM (SELECT EXISTS(SELECT 1 FROM orders i WHERE o.orderkey < i.orderkey AND i.orderkey % 1000 = 0)))",
    "SELECT count(*) FROM orders o " +
      "WHERE EXISTS(SELECT 1 FROM orders i WHERE o.orderkey < i.orderkey AND i.orderkey % 1000 = 0)")

  // --- no-FROM subqueries in other contexts (inline must preserve
  //     3-valued logic and per-row semantics) ---
  ref("exists over values with nulls in predicate path",
    "SELECT EXISTS(SELECT 1 WHERE a = 1) FROM (VALUES 1, 1, 2, 3) t(a)",
    "VALUES true, true, false, false")
  ref("exists no-from null-predicate is false not null",
    "SELECT EXISTS(SELECT 1 WHERE a > 1) FROM (VALUES 2, CAST(NULL AS INTEGER)) t(a)",
    "VALUES true, false")
  ref("group by key pruned exists",
    "SELECT max(o.totalprice), o.orderkey FROM orders o GROUP BY o.orderkey, EXISTS (SELECT o.orderkey)",
    "SELECT max(o.totalprice), o.orderkey FROM orders o GROUP BY o.orderkey")
  ref("exists with aggregate list stays true on empty where",
    "SELECT EXISTS(SELECT count(*) WHERE false)", "VALUES true")

  // --- qualified star over a USING join (testQualifiedWildcardFromJoin
  //     :1828 — using columns excluded; testWildcardFromJoin :1820 —
  //     unqualified star keeps them once) ---
  ref("qualified wildcard from using join",
    "SELECT a.*, b.* FROM (SELECT orderkey, partkey FROM lineitem) a " +
      "JOIN (SELECT orderkey, custkey FROM orders) b using (orderkey)",
    "SELECT a.partkey, b.custkey FROM (SELECT orderkey, partkey FROM lineitem) a " +
      "JOIN (SELECT orderkey, custkey FROM orders) b on a.orderkey = b.orderkey")
  ref("unqualified wildcard from using join",
    "SELECT * FROM (SELECT orderkey, partkey FROM lineitem) a " +
      "JOIN (SELECT orderkey, custkey FROM orders) b using (orderkey)",
    "SELECT a.orderkey, a.partkey, b.custkey FROM (SELECT orderkey, partkey FROM lineitem) a " +
      "JOIN (SELECT orderkey, custkey FROM orders) b on a.orderkey = b.orderkey")
  ref("qualified wildcard without using join unaffected",
    "SELECT a.* FROM (SELECT orderkey, partkey FROM lineitem) a JOIN " +
      "(SELECT orderkey, custkey FROM orders) b ON a.orderkey = b.orderkey WHERE a.orderkey = 7",
    "SELECT orderkey, partkey FROM lineitem WHERE orderkey = 7")

  // --- bare niladic specials (SqlBase.g4 #specialDateTimeFunction) ---
  test("bare localtime parses to a TIME value") {
    val df = engine.sql("SELECT localtime")
    assert(df.schema.fields.head.dataType.isInstanceOf[org.apache.spark.sql.types.TimeType])
    assert(df.collect().length == 1)
  }
  test("bare localtimestamp parses to a zoneless timestamp value") {
    val df = engine.sql("SELECT localtimestamp")
    // Spark's localtimestamp() is TIMESTAMP_NTZ — the zoneless wall-clock
    // reading, which under the engine's fixed UTC session matches Presto's
    // zoneless TIMESTAMP rendering
    assert(df.schema.fields.head.dataType ==
      org.apache.spark.sql.types.TimestampNTZType)
    assert(df.collect().length == 1)
  }

  // --- date_parse ISO-week tokens (TestDateTimeFunctionsBase:795:
  //     date_parse('1998 53', '%x %v') = 1998-12-28, the Monday of ISO
  //     week 53 of weekyear 1998) ---
  ref("date_parse weekyear+week", "SELECT date_parse('1998 53', '%x %v')",
    "SELECT TIMESTAMP '1998-12-28 00:00:00'")
  ref("date_parse weekyear+week of next january",
    "SELECT date_parse('2017 1', '%x %v')",
    "SELECT TIMESTAMP '2017-01-02 00:00:00'")
  ref("date_parse week only defaults to epoch weekyear",
    "SELECT date_parse('3', '%v')", "SELECT TIMESTAMP '1970-01-12 00:00:00'")
  ref("date_parse week tokens round-trip with date_format",
    "SELECT date_format(date_parse('2001 02', '%x %v'), '%x %v')",
    "SELECT '2001 02'")

  // --- subqueries as HOF arguments (SubqueryPlanner.java:69 plans
  //     subqueries from any expression context; the lambda-body ban is
  //     ExpressionAnalyzer.java:1044 — NON-lambda HOF arguments are legal
  //     Presto, refused by Spark's ResolveLambdaVariables, closed by
  //     Decorrelate.hoistHofSubqueries) ---
  ref("hof with subquery array argument",
    "SELECT cardinality(filter((SELECT array_agg(custkey) FROM customer), x -> x < 5))",
    "SELECT cardinality(filter(array_agg(custkey), x -> x < 5)) FROM customer")
  ref("hof subquery argument with outer-correlated lambda",
    "SELECT count(*) FROM orders WHERE cardinality(filter(" +
      "(SELECT array_agg(custkey) FROM customer WHERE custkey < 50), x -> x = custkey)) > 0",
    "SELECT count(*) FROM orders WHERE custkey < 50")
  ref("hof subquery argument under transform per outer row",
    "SELECT DISTINCT element_at(transform((SELECT array_agg(custkey ORDER BY custkey) " +
      "FROM customer WHERE custkey < 3), x -> x * 10), 1) FROM orders",
    "SELECT 0")
  test("subquery INSIDE the lambda body still refused (reference also refuses: ExpressionAnalyzer.java:1044)") {
    intercept[Exception] {
      engine.sql("SELECT transform(ARRAY[1,2], x -> x + " +
        "(SELECT max(custkey) FROM customer))").collect()
    }
  }
  // a nested HOF whose subquery argument sits inside an OUTER lambda body
  // hoists too and RUNS here (superset: the reference refuses any subquery
  // under a lambda; the hoisted helper is an ordinary outer reference, so
  // the semantics are well-defined)
  ref("nested hof subquery argument inside outer lambda runs (superset)",
    "SELECT transform(ARRAY[1,2], x -> cardinality(filter(" +
      "(SELECT array_agg(custkey) FROM customer WHERE custkey < 5), y -> y < x)))",
    "SELECT ARRAY[1, 2]")
}
