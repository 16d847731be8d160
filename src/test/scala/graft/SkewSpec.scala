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

  test("salt distributes the hot key across tasks") {
    import spark.implicits._
    val probe = spark.range(0, 1000).select(lit(1L).as("k"), col("id").as("p"))
    val salted = probe.withColumn("_salt",
      pmod(xxhash64(col("k"), monotonically_increasing_id()), lit(8)))
    val nSalts = salted.select("_salt").distinct().count()
    assert(nSalts == 8, s"expected all 8 salt values, got $nSalts")
  }
}
