package graft.tools
import graft._
/** Scratch: d04 (no prefilter) vs d11 (exact-dedup prefilter) at a fixture. */
object ProbeD11 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    val dir = if (args.nonEmpty) args(0) else "/tmp/graft_sf1"
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$label: ${(System.nanoTime()-t0)/1e9}%.3f s  (n=$n)")
    }
    for (_ <- 1 to 2) {
      time("d04") { SparkEntry.all("d04_minhash_lsh_pairs").fn(spark, dir).count() }
      time("d11") { SparkEntry.all("d11_lsh_after_exact").fn(spark, dir).count() }
    }
    spark.stop()
  }
}
