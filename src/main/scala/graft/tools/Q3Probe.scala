package graft.tools
import graft.{GraftSession, Tables}
import graft.plans.DynamicFilters
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B probe for TPC-H Q3 formulations at a soak fixture (dev tool). */
object Q3Probe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/graft_sf30"
    val which = if (args.length > 1) args(1).split(",").toSet else Set.empty[String]
    val spark = GraftSession.local(32)
    def t(n: String) = Tables.t(spark, dir, n)
    def custF = t("customer").filter(col("c_mktsegment") === "BUILDING")
    def ordF = t("orders")
      .filter(col("o_orderdate") < lit("1998-03-15").cast("timestamp"))
    def liF = t("lineitem")
      .filter(col("l_shipdate") > lit("1996-03-15").cast("timestamp"))
    val revDec = sum((col("l_extendedprice").cast("decimal(18,2)") *
      (lit(BigDecimal(1)).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
      .cast("decimal(18,4)")).cast("decimal(38,4)").as("revenue")

    // (a) r06 shape: join all, then group
    def a: DataFrame = custF
      .join(ordF, col("c_custkey") === col("o_custkey"))
      .join(liF, col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderkey", "o_orderdate").agg(revDec)
      .orderBy(col("revenue").desc, col("o_orderkey")).limit(10)

    // (d) dynamic-filter pruned: orders pruned by BUILDING custkeys,
    // lineitem pruned by the pruned orders' orderkeys, then r06 joins+agg
    def pruned: (DataFrame, DataFrame) = {
      val ordP = DynamicFilters.semiJoinPrune(ordF, "o_custkey", custF, "c_custkey")
      val liP = DynamicFilters.semiJoinPrune(liF, "l_orderkey", ordP, "o_orderkey",
        maxBroadcastKeys = 8L * 1000 * 1000)
      (ordP, liP)
    }
    def d: DataFrame = {
      val (ordP, liP) = pruned
      custF.join(ordP, col("c_custkey") === col("o_custkey"))
        .join(liP, col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderkey", "o_orderdate").agg(revDec)
        .orderBy(col("revenue").desc, col("o_orderkey")).limit(10)
    }

    // (e) = (d) with LONG-scaled revenue agg (decimal only at the end)
    def e: DataFrame = {
      val (ordP, liP) = pruned
      custF.join(ordP, col("c_custkey") === col("o_custkey"))
        .join(liP, col("o_orderkey") === col("l_orderkey"))
        .withColumn("rev_scaled",
          round(col("l_extendedprice") * 100).cast("long") *
            (lit(100L) - round(col("l_discount") * 100).cast("long")))
        .groupBy("o_orderkey", "o_orderdate")
        .agg(sum(col("rev_scaled")).as("s"))
        .select(col("o_orderkey"), col("o_orderdate"),
          (col("s").cast("decimal(38,4)") / 10000).cast("decimal(38,4)").as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey")).limit(10)
    }

    // (c) r06 shape with LONG-scaled revenue sum, no pruning
    def c: DataFrame = custF
      .join(ordF, col("c_custkey") === col("o_custkey"))
      .join(liF, col("o_orderkey") === col("l_orderkey"))
      .withColumn("rev_scaled",
        round(col("l_extendedprice") * 100).cast("long") *
          (lit(100L) - round(col("l_discount") * 100).cast("long")))
      .groupBy("o_orderkey", "o_orderdate")
      .agg(sum(col("rev_scaled")).as("s"))
      .select(col("o_orderkey"), col("o_orderdate"),
        (col("s").cast("decimal(38,4)") / 10000).cast("decimal(38,4)").as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey")).limit(10)

    // (f) = (c) with the scaled revenue projected BELOW the join — the
    // lineitem shuffle carries (l_orderkey, rev_scaled) longs only
    def f: DataFrame = custF
      .join(ordF, col("c_custkey") === col("o_custkey"))
      .join(
        liF.select(col("l_orderkey"),
          (round(col("l_extendedprice") * 100).cast("long") *
            (lit(100L) - round(col("l_discount") * 100).cast("long")))
            .as("rev_scaled")),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderkey", "o_orderdate")
      .agg(sum(col("rev_scaled")).as("s"))
      .select(col("o_orderkey"), col("o_orderdate"),
        (col("s").cast("decimal(38,4)") / 10000).cast("decimal(38,4)").as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey")).limit(10)

    val variants = Seq(
      ("a_r06_join_group", () => a),
      ("c_long_scaled", () => c),
      ("d_dynfilter_dec", () => d),
      ("e_dynfilter_long", () => e),
      ("f_long_prejoin", () => f))
    for ((name, f) <- variants if which.isEmpty || which(name)) {
      f().count() // warm
      val times = Seq.fill(3) {
        val t0 = System.nanoTime(); f().collect(); (System.nanoTime() - t0) / 1e9
      }
      println(f"$name: best=${times.min}%.2f runs=${times.map(x => f"$x%.2f").mkString(",")}")
      f().collect().take(3).foreach(r => println("  " + r))
    }
    spark.stop()
  }
}
