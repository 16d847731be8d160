package graft.tools
import graft._

/** A/B the join order around Q18's filtered pre-aggregate (dev probe). */
object Q18Probe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/graft_sf30"
    val spark = GraftSession.local(32)
    Tables.registerAll(spark, dir)
    def time(sql: String): Double = {
      val df = spark.sql(sql)
      df.count() // warm
      val t0 = System.nanoTime(); df.count(); (System.nanoTime() - t0) / 1e9
    }
    val pre = """WITH pre AS (
      SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(18,2))) AS sq
      FROM lineitem GROUP BY l_orderkey
      HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 150)"""
    val tail = """GROUP BY c_name, c_custkey, o_orderkey, o_orderdate,
      round(o_totalprice, 4) ORDER BY totalprice DESC, o_orderkey LIMIT 100"""
    val sel = """SELECT c_name, c_custkey, o_orderkey, o_orderdate,
      round(o_totalprice, 4) AS totalprice,
      CAST(sum(sq) AS DECIMAL(38,2)) AS sum_qty"""
    val coFirst = s"""$pre $sel
      FROM customer JOIN orders ON c_custkey = o_custkey
      JOIN pre ON o_orderkey = l_orderkey $tail"""
    val preFirst = s"""$pre $sel
      FROM orders JOIN pre ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey $tail"""
    val h18 = """
      SELECT c_name, c_custkey, o_orderkey, o_orderdate,
        round(o_totalprice, 4) AS totalprice,
        CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS sum_qty
      FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON o_orderkey = l_orderkey
      WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey
        HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 150)
      GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, round(o_totalprice, 4)
      ORDER BY totalprice DESC, o_orderkey LIMIT 100"""
    for (_ <- 1 to 2)
      println(f"h18=${time(h18)}%.2f s  co_first=${time(coFirst)}%.2f s  " +
        f"pre_first=${time(preFirst)}%.2f s")
    // planning-only cost of the IN form (rule paths run at optimization)
    val t0 = System.nanoTime()
    spark.sql(h18).queryExecution.executedPlan
    println(f"h18 planning=${(System.nanoTime() - t0) / 1e9}%.2f s")
    def shj(sql: String): Unit = {
      val df = spark.sql(sql); df.count()
      println(df.queryExecution.executedPlan.toString.linesIterator
        .filter(l => l.contains("HashJoin") || l.contains("SortMerge"))
        .mkString("\n"))
    }
    println("-- h18 joins --"); shj(h18)
    println("-- pre_first joins --"); shj(preFirst)
    spark.stop()
  }
}
