package graft.tools
import graft._
object WlProbe2 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(4)
    val df = SparkEntry.all("q46f_rollup_empty_window").fn(spark, "/root/testdata/sf0.01")
    df.show(10, false)
    println("count=" + df.count())
    df.explain("formatted")
    spark.stop()
  }
}
