package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** CascadeGroupingSets: grouping sets with a covering set + decomposable
  * aggregates compute the finest level once and re-aggregate coarser
  * levels from it. Every positive test compares against the rule-off
  * (Expand) rows on the same data; the traps are empty input (Expand
  * emits nothing, a naive global re-agg emits a row) and data-NULL keys
  * (must stay distinct from rollup-NULLs via the level constant). */
class CascadeGroupingSetsSpec extends AnyFunSuite {
  import TestSession._
  import graft.plans.CascadeGroupingSets

  private def withOff[A](body: => A): A = {
    spark.conf.set(CascadeGroupingSets.KEY, "false")
    try body finally spark.conf.unset(CascadeGroupingSets.KEY)
  }

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def cascaded(df: DataFrame): Boolean = {
    val p = df.queryExecution.optimizedPlan.toString
    p.contains("Union") && !p.contains("Expand")
  }

  {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("csg").toString
    Seq[(String, String, java.lang.Long)](
      ("a", "x", 1L), ("a", "x", 2L), ("a", "y", 3L), ("b", "x", 4L),
      ("b", null, 5L), (null, "y", 6L), (null, null, null))
      .toDF("k1", "k2", "v").write.parquet(s"$dir/t")
    spark.read.parquet(s"$dir/t").createOrReplaceTempView("csg_t")
  }

  private val ROLLUP_SQL =
    """SELECT k1, k2, count(v) AS c, count(*) AS n, sum(v) AS s,
      |  min(v) AS mn, max(v) AS mx,
      |  grouping(k1) AS g1, grouping(k2) AS g2
      |FROM csg_t GROUP BY ROLLUP(k1, k2)""".stripMargin

  test("rollup cascades and matches Expand exactly (data-NULL keys included)") {
    val expect = withOff {
      val off = spark.sql(ROLLUP_SQL)
      assert(!cascaded(off))
      rows(off)
    }
    val df = spark.sql(ROLLUP_SQL)
    assert(cascaded(df), df.queryExecution.optimizedPlan.toString.take(1500))
    assert(rows(df) == expect)
  }

  test("cube cascades via its full set") {
    val q =
      """SELECT k1, k2, sum(v) AS s, count(*) AS n
        |FROM csg_t GROUP BY CUBE(k1, k2)""".stripMargin
    val expect = withOff(rows(spark.sql(q)))
    val df = spark.sql(q)
    assert(cascaded(df))
    assert(rows(df) == expect)
  }

  test("EMPTY input: zero rows, exactly as the Expand plan") {
    val q =
      """SELECT k1, count(*) AS n, sum(v) AS s
        |FROM csg_t WHERE v < -100 GROUP BY ROLLUP(k1)""".stripMargin
    val expect = withOff(rows(spark.sql(q)))
    assert(expect.isEmpty)
    val df = spark.sql(q)
    assert(cascaded(df))
    assert(rows(df) == expect)
  }

  test("aggregate over a grouping key: the analyzer's pass-through copy keeps it exact") {
    // count(k2)/sum over a key column aggregates the ORIGINAL values at
    // every level (SQL semantics; Spark passes a separate copy through
    // Expand) — the cascade must reproduce that, data-NULLs included
    val q =
      """SELECT k1, count(k2) AS c, grouping(k1) AS g1
        |FROM csg_t GROUP BY ROLLUP(k1, k2)""".stripMargin
    val expect = withOff(rows(spark.sql(q)))
    val df = spark.sql(q)
    assert(cascaded(df))
    assert(rows(df) == expect)
  }

  test("explicit grouping sets with the covering set spelled out") {
    val q =
      """SELECT k1, k2, sum(v) AS s
        |FROM csg_t GROUP BY GROUPING SETS ((k1, k2), (k2), ())""".stripMargin
    val expect = withOff(rows(spark.sql(q)))
    val df = spark.sql(q)
    assert(cascaded(df))
    assert(rows(df) == expect)
  }

  test("bails: no covering set, distinct agg, avg, agg over a key") {
    // no covering set
    assert(!cascaded(spark.sql(
      "SELECT k1, k2, sum(v) AS s FROM csg_t GROUP BY GROUPING SETS ((k1), (k2))")))
    // count(DISTINCT)
    assert(!cascaded(spark.sql(
      "SELECT k1, count(DISTINCT v) AS s FROM csg_t GROUP BY ROLLUP(k1, k2)")))
    // avg is not re-aggregable
    assert(!cascaded(spark.sql(
      "SELECT k1, avg(v) AS s FROM csg_t GROUP BY ROLLUP(k1, k2)")))
    // kill switch
    withOff {
      assert(!cascaded(spark.sql(ROLLUP_SQL)))
    }
  }
}
