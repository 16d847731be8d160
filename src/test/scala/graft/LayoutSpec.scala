package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LayoutSpec extends AnyFunSuite {
  import TestSession._
  import operators.Layout

  test("zvalue interleaves bits (Morton order)") {
    import spark.implicits._
    val r = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L))
      .toDF("_r1", "_r2")
      .select(Layout.zvalue("_r1", "_r2").as("z"))
      .collect().map(_.getLong(0))
    // interleave(3=0b11, 5=0b101) = r1 bits at even, r2 at odd positions:
    // 0b100111 = 39
    assert(r.toSeq == Seq(0L, 1L, 2L, 39L))
  }

  /** files whose [min,max] box overlaps the predicate box — what parquet
    * min/max stats let the reader skip. */
  private def filesTouched(dir: String): Long = {
    spark.read.parquet(dir)
      .groupBy(input_file_name())
      .agg(min("l_partkey").as("p_lo"), max("l_partkey").as("p_hi"),
        min("l_suppkey").as("s_lo"), max("l_suppkey").as("s_hi"))
      .filter(col("p_hi") >= 100 && col("p_lo") <= 300 &&
        col("s_hi") >= 10 && col("s_lo") <= 30)
      .count()
  }

  private def write(df: DataFrame): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-layout").toString
    df.write.mode("overwrite").parquet(dir)
    dir
  }

  test("z-order layout lets a 2-d box predicate skip most files") {
    val li = Tables.t(spark, "/root/testdata/sf0.01", "lineitem")
      .select("l_orderkey", "l_partkey", "l_suppkey")
    val n = 16
    val zDir = write(Layout.zorderBy(li, "l_partkey", "l_suppkey", n))
    val hashDir = write(li.repartition(n))

    // layout must not lose or duplicate rows
    assert(spark.read.parquet(zDir).count() == li.count())

    val zTouched = filesTouched(zDir)
    val hashTouched = filesTouched(hashDir)
    // hash layout spreads every key range over all files; the z-order
    // curve confines the box to a fraction of them
    assert(hashTouched >= n - 2, s"hash layout touched $hashTouched")
    assert(zTouched * 2 <= hashTouched,
      s"z-order touched $zTouched vs hash $hashTouched")
  }
}
