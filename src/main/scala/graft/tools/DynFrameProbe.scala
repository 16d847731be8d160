package graft.tools
import graft.{Engine, GraftSession}

/** Measure the dynamic-frame lowering's single-partition cost curve
  * (dev tool — quantifies the O(partition^2) WindowExec serialization). */
object DynFrameProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8)
    val e = Engine(spark)
    for (n <- args.map(_.toInt)) {
      e.spark.range(n.toLong).selectExpr("id AS i", "id % 97 AS v")
        .createOrReplaceTempView("dynframe_big")
      val t0 = System.nanoTime()
      // aggregate over s so the window column cannot be pruned away
      val c = e.sql(
        """SELECT sum(s) FROM (SELECT i, sum(v) OVER (ORDER BY i
          |  ROWS BETWEEN mod(i, 3) PRECEDING AND mod(i, 5) FOLLOWING) AS s
          |FROM dynframe_big)""".stripMargin).collect()(0).getLong(0)
      println(f"n=$n sum=$c time=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
