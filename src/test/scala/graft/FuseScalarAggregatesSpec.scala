package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** FuseScalarAggregates: a condition-less join of single-row aggregates
  * over the same relation fuses into one scan with FILTER-clause
  * aggregates. Exact for every aggregate function; rows compared against
  * the rule-off plan. */
class FuseScalarAggregatesSpec extends AnyFunSuite {
  import TestSession._
  import graft.plans.FuseScalarAggregates

  private def withOff[A](body: => A): A = {
    spark.conf.set(FuseScalarAggregates.KEY, "false")
    try body finally spark.conf.unset(FuseScalarAggregates.KEY)
  }

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def scans(df: DataFrame): Int =
    df.queryExecution.optimizedPlan.collectWithSubqueries {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation => r
    }.length

  {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("fsa").toString
    Seq[(Int, java.lang.Long, String)](
      (1, 10L, "x"), (2, 20L, "y"), (3, null, "x"), (4, 40L, "z"),
      (5, 40L, "y"))
      .toDF("m", "v", "t").write.parquet(s"$dir/f")
    spark.read.parquet(s"$dir/f").createOrReplaceTempView("fsa_f")
  }

  test("bucketed scalar subqueries fuse to one scan; all agg kinds exact") {
    val q =
      """SELECT s1.c AS c1, s1.s AS s1v, s2.c AS c2, s2.d AS d2, s3.a AS a3
        |FROM (SELECT count(*) AS c, sum(v) AS s FROM fsa_f WHERE m <= 2) s1,
        |     (SELECT count(*) AS c, count(DISTINCT v) AS d FROM fsa_f WHERE m BETWEEN 3 AND 4) s2,
        |     (SELECT avg(v) AS a FROM fsa_f WHERE m >= 5) s3""".stripMargin
    val expect = withOff {
      val off = spark.sql(q)
      assert(scans(off) == 3)
      rows(off)
    }
    val df = spark.sql(q)
    assert(scans(df) == 1,
      df.queryExecution.optimizedPlan.toString.take(1500))
    assert(rows(df) == expect)
  }

  test("empty input still yields the single row (global-agg semantics)") {
    val q =
      """SELECT s1.c AS c1, s2.s AS s2v
        |FROM (SELECT count(*) AS c FROM fsa_f WHERE m > 100) s1,
        |     (SELECT sum(v) AS s FROM fsa_f WHERE m > 200) s2""".stripMargin
    val expect = withOff(rows(spark.sql(q)))
    val df = spark.sql(q)
    assert(scans(df) == 1)
    assert(rows(df) == expect)
    assert(expect == Seq("[0,null]"))
  }

  test("unfiltered branch joins the fusion; an aggregate with FILTER already set composes") {
    val q =
      """SELECT s1.c AS c1, s2.c AS c2
        |FROM (SELECT count(*) AS c FROM fsa_f) s1,
        |     (SELECT count(*) FILTER (WHERE v > 15) AS c FROM fsa_f WHERE m <= 4) s2""".stripMargin
    val expect = withOff(rows(spark.sql(q)))
    val df = spark.sql(q)
    assert(scans(df) == 1)
    assert(rows(df) == expect)
  }

  test("real cross joins (row-to-row) stay untouched") {
    val q = "SELECT a.t, b.t FROM fsa_f a CROSS JOIN fsa_f b WHERE a.m = 1"
    val df = spark.sql(q)
    assert(scans(df) == 2)
    assert(df.count() == 5)
  }

  test("mixed relations: only the same-relation group fuses") {
    import spark.implicits._
    val dir2 = java.nio.file.Files.createTempDirectory("fsa2").toString
    Seq((1, 2L)).toDF("m", "v").write.parquet(s"$dir2/o")
    spark.read.parquet(s"$dir2/o").createOrReplaceTempView("fsa_other")
    val q =
      """SELECT s1.c AS c1, s2.c AS c2, s3.c AS c3
        |FROM (SELECT count(*) AS c FROM fsa_f WHERE m <= 2) s1,
        |     (SELECT count(*) AS c FROM fsa_other) s2,
        |     (SELECT count(*) AS c FROM fsa_f WHERE m >= 3) s3""".stripMargin
    val expect = withOff(rows(spark.sql(q)))
    val df = spark.sql(q)
    assert(scans(df) == 2) // fsa_f fused, fsa_other separate
    assert(rows(df) == expect)
  }

  test("kill switch") {
    withOff {
      val q =
        """SELECT s1.c AS c1, s2.c AS c2
          |FROM (SELECT count(*) AS c FROM fsa_f WHERE m <= 2) s1,
          |     (SELECT count(*) AS c FROM fsa_f WHERE m >= 3) s2""".stripMargin
      assert(scans(spark.sql(q)) == 2)
    }
  }
}
