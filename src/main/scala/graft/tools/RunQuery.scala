package graft.tools
import graft._
/** Run one SparkEntry query against a sf dir and print the rows (debug aid). */
object RunQuery {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8)
    val df = SparkEntry.all(args(0)).fn(spark,
      if (args.length > 1) args(1) else "/root/testdata/sf0.01")
    if (args.length > 2)
      Verify.normalize(df).coalesce(1).write.mode("overwrite").parquet(args(2))
    else df.show(100, truncate = false)
    spark.stop()
  }
}
