package graft

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** Ordering pins for the assertQueryOrdered statements mined into the
  * r239* one-arg-tail driver entries (AbstractTestQueries.java — the
  * reference compares these ROW-ORDERED against H2; the driver gate
  * hashes the value multiset, so the order property is pinned here).
  * Each case runs the verbatim statement and asserts the returned
  * sequence is sorted by the statement's own keys; where the sort key is
  * not in the output, a widened variant (key appended) is run and must
  * reproduce the original rows positionally. */
class OneArgTailSpec extends AnyFunSuite {
  import TestSession._

  private lazy val engine = graft.queries.RefCorpus.engine(spark, sf)

  /** (value extractor, descending, nullsFirst). Null keys compare per the
    * flag; non-null keys via natural ordering on the extracted value. */
  private type Key = (Row => Any, Boolean, Boolean)

  private def cmp(a: Any, b: Any): Int = (a, b) match {
    case (null, null) => 0
    case (x: Number, y: Number) =>
      java.lang.Double.compare(x.doubleValue, y.doubleValue)
    case (x: Comparable[_], y) =>
      x.asInstanceOf[Comparable[Any]].compareTo(y)
    case _ => a.toString.compareTo(b.toString)
  }

  private def ordered(name: String, sql: String, keys: Key*): Unit =
    test(name) {
      val rows = engine.sql(sql).collect().toSeq
      assert(rows.nonEmpty, sql)
      rows.sliding(2).filter(_.size == 2).foreach { case Seq(p, q) =>
        var decided = false
        keys.foreach { case (f, desc, nullsFirst) =>
          if (!decided) {
            val (a, b) = (f(p), f(q))
            val c =
              if (a == null && b == null) 0
              else if (a == null) { if (nullsFirst) -1 else 1 }
              else if (b == null) { if (nullsFirst) 1 else -1 }
              else if (desc) -cmp(a, b)
              else cmp(a, b)
            if (c < 0) decided = true
            else assert(c == 0, s"out of order: $p then $q\n$sql")
          }
        }
      }
    }

  /** Key is absent from the output: run the statement widened with the
    * key column; positional drop must reproduce the original sequence,
    * and the widened sequence must be sorted on the key. */
  private def orderedVia(name: String, sql: String, widened: String,
      keys: Key*): Unit = {
    ordered(name + " (widened key)", widened, keys: _*)
    test(name) {
      val got = engine.sql(sql).collect().toSeq.map(_.toSeq)
      val wide = engine.sql(widened).collect().toSeq.map(_.toSeq.dropRight(1))
      assert(got == wide, sql)
    }
  }

  private def col(i: Int): Row => Any = r => r.get(i)
  private def nullif3(i: Int): Row => Any =
    r => { val v = r.get(i); if (v != null && v.toString == "3") null else v }

  ordered("distinct custkey asc limit",
    "SELECT DISTINCT custkey FROM orders ORDER BY custkey LIMIT 10",
    (col(0), false, false))
  ordered("group-by order by sum desc limit",
    "SELECT custkey, SUM(totalprice) FROM orders GROUP BY custkey ORDER BY SUM(totalprice) DESC LIMIT 10",
    (col(1), true, false))
  ordered("orderstatus asc",
    "SELECT orderstatus FROM orders ORDER BY orderstatus",
    (col(0), false, false))
  ordered("custkey desc then orderstatus",
    "SELECT custkey, orderstatus FROM orders ORDER BY custkey DESC, orderstatus",
    (col(0), true, false), (col(1), false, false))
  ordered("nullif key asc nulls first",
    "SELECT orderkey, custkey, orderstatus FROM orders ORDER BY nullif(orderkey, 3) ASC NULLS FIRST, custkey ASC",
    (nullif3(0), false, true), (col(1), false, false))
  ordered("nullif key desc nulls last",
    "SELECT orderkey, custkey, orderstatus FROM orders ORDER BY nullif(orderkey, 3) DESC NULLS LAST, custkey ASC",
    (nullif3(0), true, false), (col(1), false, false))
  ordered("alias sort key",
    "SELECT orderstatus x FROM orders ORDER BY x ASC",
    (col(0), false, false))
  ordered("alias shadowing unselected column",
    "SELECT orderstatus orderdate FROM orders ORDER BY orderdate ASC",
    (col(0), false, false))
  ordered("ordinal sort 2,1",
    "SELECT orderstatus, orderdate FROM orders ORDER BY 2, 1",
    (col(1), false, false), (col(0), false, false))
  ordered("wildcard ordinal sort",
    "SELECT * FROM orders ORDER BY 1",
    (col(0), false, false))
  ordered("negated expression sort",
    "(SELECT orderkey, custkey FROM orders) ORDER BY orderkey * -1",
    (col(0), true, false))
  ordered("topn orderkey desc custkey asc",
    "SELECT orderkey, custkey, orderstatus FROM orders ORDER BY orderkey DESC, custkey ASC LIMIT 10",
    (col(0), true, false))
  ordered("topn custkey asc orderkey desc",
    "SELECT orderkey, custkey, orderstatus FROM orders ORDER BY custkey ASC, orderkey DESC LIMIT 10",
    (col(1), false, false), (col(0), true, false))
  ordered("topn nullif nulls first",
    "SELECT orderkey, custkey, orderstatus FROM orders ORDER BY nullif(orderkey, 3) ASC NULLS FIRST, custkey ASC LIMIT 10",
    (nullif3(0), false, true))
  ordered("chained unions with order",
    "SELECT orderkey FROM orders UNION (SELECT custkey FROM orders UNION SELECT linenumber FROM lineitem) UNION ALL SELECT orderkey FROM lineitem ORDER BY orderkey",
    (col(0), false, false))
  ordered("subquery union order limit",
    "SELECT * FROM (SELECT orderkey FROM orders UNION SELECT custkey FROM orders UNION SELECT orderkey FROM orders) ORDER BY orderkey LIMIT 1000",
    (col(0), false, false))
  ordered("order limit compaction",
    "SELECT * FROM (SELECT * FROM orders ORDER BY orderkey) LIMIT 10",
    (col(0), false, false))

  orderedVia("order by unselected orderkey desc limit",
    "SELECT custkey, orderstatus FROM orders ORDER BY orderkey DESC LIMIT 10",
    "SELECT custkey, orderstatus, orderkey FROM orders ORDER BY orderkey DESC LIMIT 10",
    (col(2), true, false))
  orderedVia("order by unselected orderkey desc full",
    "SELECT orderstatus FROM orders ORDER BY orderkey DESC",
    "SELECT orderstatus, orderkey FROM orders ORDER BY orderkey DESC",
    (col(1), true, false))
}
