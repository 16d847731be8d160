package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators for scan pruning at scale.
  *
  * Z-ORDER: interleave the bits of two columns' normalized ranks and
  * range-partition + sort by the resulting curve value before writing.
  * Every output file then covers a tight rectangle in BOTH dimensions, so
  * a predicate on EITHER column (or a box on both) skips most files via
  * parquet min/max stats — the multidimensional generalization of sorting
  * by one column (what table formats run as OPTIMIZE ZORDER BY). At 100 TB
  * this turns two-column point/range lookups from full scans into reads of
  * a handful of files.
  */
object Layout {

  private val Bits = 16

  /** Normalized 16-bit rank of `c` over [lo, hi]. */
  private def rank(c: Column, lo: Column, hi: Column): Column =
    when(hi === lo, lit(0L)).otherwise(
      ((c.cast("double") - lo) / (hi - lo) * ((1 << Bits) - 1)).cast("long"))

  /** 32-bit Morton (z-curve) interleave of two 16-bit rank COLUMNS (named
    * bound attributes — HOF lambdas re-evaluate non-attribute subtrees per
    * element). Bit i of r1 lands at position 2i, of r2 at 2i+1. */
  def zvalue(r1: String, r2: String): Column = expr(s"""
    aggregate(sequence(0, ${Bits - 1}), CAST(0 AS BIGINT),
      (acc, i) -> acc | shiftleft($r1 & shiftleft(CAST(1 AS BIGINT), i), i)
                      | shiftleft($r2 & shiftleft(CAST(1 AS BIGINT), i), i + 1))""")

  /** Z-order `df` by two numeric columns into `numFiles` range partitions,
    * each sorted by the curve value (write the result with one file per
    * partition). Two passes: a tiny min/max agg, then the layout shuffle. */
  def zorderBy(df: DataFrame, c1: String, c2: String,
      numFiles: Int): DataFrame = {
    val bounds = df.agg(
      min(col(c1)).cast("double").as("lo1"), max(col(c1)).cast("double").as("hi1"),
      min(col(c2)).cast("double").as("lo2"), max(col(c2)).cast("double").as("hi2"))
    val ranked = df.crossJoin(broadcast(bounds))
      .withColumn("_r1", rank(col(c1), col("lo1"), col("hi1")))
      .withColumn("_r2", rank(col(c2), col("lo2"), col("hi2")))
      .withColumn("_z", zvalue("_r1", "_r2"))
      .drop("lo1", "hi1", "lo2", "hi2", "_r1", "_r2")
    ranked.repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
  }
}
