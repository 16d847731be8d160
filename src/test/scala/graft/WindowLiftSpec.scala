package graft

import org.scalatest.funsuite.AnyFunSuite

/** PrestoSql.windowLift (round 11): grouping sets + window-in-select over
  * the disjoint-branch rewrite. Two proof obligations per shape:
  * (a) NON-empty input — the lifted union must equal Spark's native
  *     rollup+window evaluation of the same text (the branch is dead, so
  *     any divergence is a rewrite bug);
  * (b) EMPTY input — Presto/DuckDB semantics: one row per empty grouping
  *     set, window functions computed over those rows (hand-computed
  *     expectations; q46f/q46g carry the DuckDB-oracled versions). */
class WindowLiftSpec extends AnyFunSuite {
  import TestSession._

  private lazy val engine = {
    val e = Engine(spark)
    Tables.registerAll(e.spark, sf)
    e
  }

  private def viaEngine(sql: String) = engine.sql(sql).collect()
    .map(_.toString).sorted.toSeq

  private def native(sql: String) = {
    Tables.registerAll(spark, sf)
    spark.sql(sql).collect().map(_.toString).sorted.toSeq
  }

  private val nonEmptyShapes = Seq(
    // bare rollup, rank over aggregate
    """SELECT l_returnflag, count(*) AS n,
      |  rank() OVER (ORDER BY count(*) DESC, l_returnflag) AS r
      |FROM lineitem GROUP BY ROLLUP(l_returnflag)""".stripMargin,
    // cube, window partitioned by a grouping column
    """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS q,
      |  row_number() OVER (PARTITION BY l_returnflag
      |    ORDER BY sum(l_quantity) DESC, l_linestatus) AS rn
      |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)""".stripMargin,
    // scalar-wrapped aggregate inside the OVER spec + HAVING
    """SELECT l_returnflag, count(*) AS n,
      |  rank() OVER (ORDER BY round(sum(l_quantity), 2) DESC, l_returnflag) AS r
      |FROM lineitem GROUP BY ROLLUP(l_returnflag)
      |HAVING count(*) >= 0""".stripMargin,
    // window fn argument referencing an aggregate of a grouping column
    // (a RAW grouping-column arg under rollup is rejected by Spark's own
    // analyzer on the native plan — a resolution quirk shared by both
    // paths, so it differentials to the same error, not a lift gap)
    """SELECT l_returnflag, count(*) AS n,
      |  first_value(min(l_returnflag)) OVER (ORDER BY count(*) DESC,
      |    l_returnflag NULLS LAST) AS top_flag
      |FROM lineitem GROUP BY ROLLUP(l_returnflag)""".stripMargin,
    // explicit grouping sets including ()
    """SELECT l_returnflag, count(*) AS n,
      |  row_number() OVER (ORDER BY count(*) DESC,
      |    l_returnflag NULLS LAST) AS rn
      |FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), ())""".stripMargin,
    // FILTER-clause aggregate feeding the window
    """SELECT l_returnflag,
      |  count(*) FILTER (WHERE l_quantity > 25) AS big_n,
      |  rank() OVER (ORDER BY count(*) FILTER (WHERE l_quantity > 25) DESC,
      |    l_returnflag NULLS LAST) AS r
      |FROM lineitem GROUP BY ROLLUP(l_returnflag)""".stripMargin)

  test("non-empty input: lifted union equals native Spark evaluation") {
    nonEmptyShapes.foreach { q =>
      assert(viaEngine(q) == native(q), q)
    }
  }

  test("empty input, bare CUBE: one global row, window over it") {
    val rows = engine.sql(
      """SELECT l_returnflag AS rf, l_linestatus AS ls, count(*) AS n,
        |  rank() OVER (ORDER BY count(*)) AS r
        |FROM lineitem WHERE l_quantity < -5
        |GROUP BY CUBE(l_returnflag, l_linestatus)""".stripMargin).collect()
    assert(rows.length == 1)
    assert(rows(0).isNullAt(0) && rows(0).isNullAt(1))
    assert(rows(0).getLong(2) == 0L && rows(0).getInt(3) == 1)
  }

  test("empty input, duplicate empty sets: one row each, window spans both") {
    val rows = engine.sql(
      """SELECT l_returnflag AS rf, count(*) AS n,
        |  row_number() OVER (ORDER BY count(*)) AS rn
        |FROM lineitem WHERE l_quantity < -5
        |GROUP BY GROUPING SETS ((l_returnflag), (), ())""".stripMargin)
      .collect().sortBy(_.getInt(2))
    assert(rows.length == 2)
    assert(rows.forall(r => r.isNullAt(0) && r.getLong(1) == 0L))
    assert(rows.map(_.getInt(2)).toSeq == Seq(1, 2))
  }

  test("empty input, HAVING interacts with the probe correctly") {
    // HAVING true on the zero-row aggregate: row retained
    val kept = engine.sql(
      """SELECT l_returnflag AS rf, count(*) AS n,
        |  rank() OVER (ORDER BY count(*)) AS r
        |FROM lineitem WHERE l_quantity < -5
        |GROUP BY ROLLUP(l_returnflag) HAVING count(*) = 0""".stripMargin).collect()
    assert(kept.length == 1 && kept(0).getLong(1) == 0L)
    // HAVING false on it: nothing
    val dropped = engine.sql(
      """SELECT l_returnflag AS rf, count(*) AS n,
        |  rank() OVER (ORDER BY count(*)) AS r
        |FROM lineitem WHERE l_quantity < -5
        |GROUP BY ROLLUP(l_returnflag) HAVING count(*) > 0""".stripMargin).collect()
    assert(dropped.isEmpty)
  }

  test("empty input, grouping() in select and OVER: all-ones bitmask") {
    val rows = engine.sql(
      """SELECT CAST(grouping(l_returnflag) AS INT) AS g, count(*) AS n,
        |  rank() OVER (PARTITION BY grouping(l_returnflag)
        |    ORDER BY count(*)) AS r
        |FROM lineitem WHERE l_quantity < -5
        |GROUP BY ROLLUP(l_returnflag)""".stripMargin).collect()
    assert(rows.length == 1)
    assert(rows(0).getInt(0) == 1 && rows(0).getLong(1) == 0L &&
      rows(0).getInt(2) == 1)
  }

  test("non-empty input with window: branch stays dead (no extra rows)") {
    // 3 flags + the rollup total = exactly 4 rows, never 5
    val rows = engine.sql(
      """SELECT l_returnflag, count(*) AS n,
        |  rank() OVER (ORDER BY count(*) DESC) AS r
        |FROM lineitem GROUP BY ROLLUP(l_returnflag)""".stripMargin).collect()
    assert(rows.length == 4, rows.mkString(";"))
  }
}
