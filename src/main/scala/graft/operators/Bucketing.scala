package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Bucketed (co-located) joins — the 100 TB fact⋈fact strategy.
  *
  * Presto 0.206 gets co-located execution from Hive bucketed tables
  * (presto-hive HiveBucketing; SURVEY §4 "Partitioning/shuffle"); Spark's
  * equivalent is `bucketBy` on write + bucket-aware scan: both sides
  * pre-hashed into the same bucket count on the join key means the join
  * runs with ZERO shuffle — each task reads matching bucket files from both
  * tables. At 100 TB this converts the dominant repeated cost (shuffling
  * the fact table for every join) into a one-time write-side cost.
  */
object Bucketing {

  /** Write a DataFrame as a bucketed+sorted managed table. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Stage orders+lineitem as co-bucketed tables (idempotent per session). */
  def stageOrdersLineitem(spark: SparkSession, dir: String,
      buckets: Int = 8): Unit = {
    if (!spark.catalog.tableExists("orders_b")) {
      writeBucketed(Tables.t(spark, dir, "orders"), "orders_b", "o_orderkey", buckets)
      writeBucketed(Tables.t(spark, dir, "lineitem"), "lineitem_b", "l_orderkey", buckets)
    }
  }

  /** The co-located join: revenue per order priority, joining on the bucket
    * key — plans with no Exchange on either side. */
  def colocatedRevenue(spark: SparkSession): DataFrame =
    spark.table("orders_b")
      .join(spark.table("lineitem_b"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderpriority")
      .agg(
        sum((col("l_extendedprice").cast("decimal(18,2)") *
          (lit(BigDecimal(1)).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
          .cast("decimal(18,4)")).cast("decimal(38,4)").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("o_orderpriority")
}
