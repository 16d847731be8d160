package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** FuseUnionAggregates: a UNION ALL of structurally-identical aggregates
  * over the same relation (differing only in filter + constant channel
  * columns) fuses into one scan + Expand. Every test compares against the
  * rule-off rows on the same data. */
class UnionScanFusionSpec extends AnyFunSuite {
  import TestSession._
  import graft.plans.FuseUnionAggregates

  private def withConf[A](kvs: (String, String)*)(body: => A): A = {
    val olds = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def fused(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.toString.contains("_fuse_branch")

  private def relCount(df: DataFrame): Int =
    df.queryExecution.optimizedPlan.collectWithSubqueries {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation => r
    }.length

  {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("fuse-union").toString
    Seq[(Long, java.lang.Long, Int, String)](
      (1L, 10L, 1, "x"), (1L, 20L, 5, "y"), (2L, null, 3, "z"),
      (2L, 7L, 7, "x"), (3L, 40L, 9, "y"), (3L, 4L, 11, "w"))
      .toDF("k", "v", "m", "tag").write.parquet(s"$dir/f")
    spark.read.parquet(s"$dir/f").createOrReplaceTempView("fu_f")
  }

  private val CHANNELS =
    """SELECT k, sum(v) AS s, count(v) AS c, 'a' AS ch FROM fu_f WHERE m <= 4 GROUP BY k
      |UNION ALL
      |SELECT k, sum(v) AS s, count(v) AS c, 'b' AS ch FROM fu_f WHERE m BETWEEN 5 AND 8 GROUP BY k
      |UNION ALL
      |SELECT k, sum(v) AS s, count(v) AS c, 'c' AS ch FROM fu_f WHERE m >= 9 GROUP BY k""".stripMargin

  test("three-channel union fuses to one scan; rows exact (opt-in)") {
    val off = spark.sql(CHANNELS)
    assert(!fused(off) && relCount(off) == 3) // default posture: untouched
    val expect = rows(off)
    withConf(FuseUnionAggregates.KEY -> "true",
        FuseUnionAggregates.MIN_BYTES_KEY -> "0") {
      val df = spark.sql(CHANNELS)
      assert(fused(df), df.queryExecution.optimizedPlan.toString.take(1500))
      assert(relCount(df) == 1)
      assert(rows(df) == expect)
    }
  }

  test("overlapping predicates: a row in two channels contributes to both") {
    val overlap =
      """SELECT k, sum(v) AS s, 'lo' AS ch FROM fu_f WHERE m <= 7 GROUP BY k
        |UNION ALL
        |SELECT k, sum(v) AS s, 'hi' AS ch FROM fu_f WHERE m >= 5 GROUP BY k""".stripMargin
    val expect = rows(spark.sql(overlap))
    withConf(FuseUnionAggregates.KEY -> "true",
        FuseUnionAggregates.MIN_BYTES_KEY -> "0") {
      val df = spark.sql(overlap)
      assert(fused(df))
      assert(rows(df) == expect)
    }
  }

  test("unfiltered branch + distinct aggregate + global aggregate all fuse exactly") {
    val q =
      """SELECT count(DISTINCT k) AS s, 'all' AS ch FROM fu_f
        |UNION ALL
        |SELECT count(DISTINCT k) AS s, 'big' AS ch FROM fu_f WHERE v > 8""".stripMargin
    val expect = rows(spark.sql(q))
    withConf(FuseUnionAggregates.KEY -> "true",
        FuseUnionAggregates.MIN_BYTES_KEY -> "0") {
      val df = spark.sql(q)
      assert(fused(df))
      assert(rows(df) == expect)
    }
  }

  test("UNION DISTINCT above the fusion stays exact") {
    val q =
      """SELECT k, min(v) AS s FROM fu_f WHERE m <= 4 GROUP BY k
        |UNION
        |SELECT k, min(v) AS s FROM fu_f WHERE m >= 5 GROUP BY k""".stripMargin
    val expect = rows(spark.sql(q))
    withConf(FuseUnionAggregates.KEY -> "true",
        FuseUnionAggregates.MIN_BYTES_KEY -> "0") {
      val df = spark.sql(q)
      assert(fused(df))
      assert(rows(df) == expect)
    }
  }

  test("guards: different relations, different aggregates, non-constant mismatch => untouched") {
    spark.conf.set(FuseUnionAggregates.KEY, "true")
    spark.conf.set(FuseUnionAggregates.MIN_BYTES_KEY, "0")
    try {
    import spark.implicits._
    Seq((1L, 2L)).toDF("k", "v").createOrReplaceTempView("fu_other")
    val diffRel =
      """SELECT k, sum(v) AS s FROM fu_f WHERE m <= 4 GROUP BY k
        |UNION ALL SELECT k, sum(v) AS s FROM fu_other GROUP BY k""".stripMargin
    assert(!fused(spark.sql(diffRel)))
    val diffAgg =
      """SELECT k, sum(v) AS s FROM fu_f WHERE m <= 4 GROUP BY k
        |UNION ALL SELECT k, max(v) AS s FROM fu_f WHERE m >= 5 GROUP BY k""".stripMargin
    assert(!fused(spark.sql(diffAgg)))
    val nonConst =
      """SELECT k, sum(v) AS s, k+1 AS t FROM fu_f WHERE m <= 4 GROUP BY k
        |UNION ALL SELECT k, sum(v) AS s, k+2 AS t FROM fu_f WHERE m >= 5 GROUP BY k""".stripMargin
    assert(!fused(spark.sql(nonConst)))
    } finally {
      spark.conf.unset(FuseUnionAggregates.KEY)
      spark.conf.unset(FuseUnionAggregates.MIN_BYTES_KEY)
    }
  }

  test("bytes gate: tier on, small relation stays unfused; floor 0 fuses") {
    // a cluster sets fuseUnionScans=true globally; the per-plan bytes
    // floor (default 8 GB) keeps page-cache-sized facts on the n-scan
    // plan (the measured sf30 ds03 loss) and admits only I/O-bound facts
    val q =
      """SELECT k, sum(v) AS s FROM fu_f WHERE m <= 4 GROUP BY k
        |UNION ALL
        |SELECT k, sum(v) AS s FROM fu_f WHERE m >= 5 GROUP BY k""".stripMargin
    withConf(FuseUnionAggregates.KEY -> "true") { // default floor
      assert(!fused(spark.sql(q)))
    }
    withConf(FuseUnionAggregates.KEY -> "true",
        FuseUnionAggregates.MIN_BYTES_KEY -> "0") {
      assert(fused(spark.sql(q)))
    }
  }
}
