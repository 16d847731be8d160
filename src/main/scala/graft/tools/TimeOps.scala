package graft.tools
import graft._
object TimeOps {
  def main(a: Array[String]): Unit = {
    val s = GraftSession.local(32)
    val d = "/root/testdata/sf0.1"
    for (n <- Seq("d09_dedup_clusters", "s07_kmeans_ivf", "d10_url_canonical",
        "e07_retention_cohort", "e08_gap_fill", "p10_heavy_hitters", "t07_pii_scrub")) {
      val q = SparkEntry.all(n)
      q.fn(s, d).count() // prewarm
      val t0 = System.nanoTime()
      q.fn(s, d).count()
      println(f"$n%-22s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    s.stop()
  }
}
