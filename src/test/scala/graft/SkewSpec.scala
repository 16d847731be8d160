package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SkewSpec extends AnyFunSuite {
  import TestSession._
  import operators.Skew

  test("salted join equals plain join on skewed data") {
    import spark.implicits._
    // heavy skew: 90% of probe rows share key 1
    val probe = spark.range(0, 10000)
      .select(when(col("id") % 10 =!= 0, 1L).otherwise(col("id")).as("k"),
        col("id").as("payload"))
    val build = spark.range(0, 200).select(col("id").as("bk"),
      (col("id") * 2).as("bval"))

    val plain = probe.join(build, col("k") === col("bk"))
      .groupBy("k").agg(count(lit(1)).as("n"), sum("bval").as("s"))
      .orderBy("k").collect()
    val salted = Skew.saltedJoin(probe, build, "k", "bk", salt = 8)
      .groupBy("k").agg(count(lit(1)).as("n"), sum("bval").as("s"))
      .orderBy("k").collect()
    assert(salted.sameElements(plain))
  }

  test("AQE splits skewed join partitions at runtime") {
    import spark.implicits._
    val c = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.adaptive.forceOptimizeSkewedJoin")
      .map(k => k -> c.getOption(k))
    try {
      // thresholds low enough that the hot key's partition counts as skewed
      c.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
      c.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "20KB")
      c.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "20KB")
      c.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      c.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      // the post-join agg reuses the join's distribution, which normally
      // vetoes the split (it would add a re-shuffle); force = accept that
      // trade — the knob a skew-bound deployment flips
      c.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
      val probe = spark.range(0, 200000)
        .select(when(col("id") % 10 =!= 0, 1L).otherwise(col("id")).as("k"),
          col("id").as("payload"))
      val build = spark.range(0, 500).select(col("id").as("bk"))
      val j = probe.join(build, col("k") === col("bk")).groupBy("k").count()
      j.collect()
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), plan.take(1500))
    } finally saved.foreach {
      case (k, Some(v)) => c.set(k, v)
      case (k, None) => c.unset(k)
    }
  }

  test("salt distributes the hot key across tasks") {
    import spark.implicits._
    val probe = spark.range(0, 1000).select(lit(1L).as("k"), col("id").as("p"))
    val salted = probe.withColumn("_salt",
      pmod(xxhash64(col("k"), monotonically_increasing_id()), lit(8)))
    val nSalts = salted.select("_salt").distinct().count()
    assert(nSalts == 8, s"expected all 8 salt values, got $nSalts")
  }
}
