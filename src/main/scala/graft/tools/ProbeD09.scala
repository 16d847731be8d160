package graft.tools
import graft._
/** Scratch: d09 cluster-resolution wall time at a fixture (2 runs). */
object ProbeD09 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    val dir = if (args.nonEmpty) args(0) else "/tmp/graft_sf1"
    for (_ <- 1 to 2) {
      val t0 = System.nanoTime()
      val n = SparkEntry.all("d09_dedup_clusters").fn(spark, dir).count()
      println(f"d09: ${(System.nanoTime()-t0)/1e9}%.3f s (n=$n)")
    }
    spark.stop()
  }
}
