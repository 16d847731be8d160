package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs the headline query set on SPARK_GRAFT_SF_DIR and
  * prints one JSON line (driver contract). Protocol mirrors the reference's
  * benchto setup (presto-benchto-benchmarks/.../tpch.yaml: prewarm + measured
  * runs): 1 prewarm + 3 measured, best-of reported per query (3 runs cuts
  * the JIT/GC run-to-run noise that made sub-second queries jump 3x).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      // engine rules (dynamic semi-join pruning, scaled-long sums) run on
      // the bench path exactly as on any user session — no hand-wiring
      .withExtensions(new GraftPlannerExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      // partitioned hash join + 4 MB local broadcast cutoff — see
      // GraftSession.local for the measured rationale of both
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.sql.shuffledHashJoinFactor", "1")
      .config("spark.sql.autoBroadcastJoinThreshold", "4m")
      .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
        "536870912")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    GraftSession.localExchangeConf(builder)
    // ad-hoc config sweeps: SPARK_GRAFT_CONF="k=v,k=v"
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(",").foreach { kv =>
      val Array(k, v) = kv.split("=", 2); builder.config(k, v)
    })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(fn: => Unit): Double = {
      val t0 = System.nanoTime(); fn; (System.nanoTime() - t0) / 1e9
    }

    val os = java.lang.management.ManagementFactory.getOperatingSystemMXBean
    val loadStart = os.getSystemLoadAverage
    val results = SparkEntry.benchNames.flatMap { name =>
      SparkEntry.all.get(name).map { q =>
        try {
          time(q.fn(spark, sfDir).count()) // prewarm (plans + file listing + JIT)
          val runs = Seq.fill(3)(time(q.fn(spark, sfDir).count()))
          name -> runs.min
        } catch { case _: Throwable => name -> -1.0 }
      }
    }
    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    // loadavg_start: the 1-min load BEFORE the suite ran (co-tenant noise
    // indicator — this box bursts to load-avg ~25; numbers recorded above
    // ~5 understate nothing on the Spark side but a reader should prefer a
    // quiet-window re-run). loadavg_end includes our own 32-thread burst.
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir","loadavg_start":$loadStart%.2f,"loadavg_end":${os.getSystemLoadAverage}%.2f,"ts":"${java.time.Instant.now}"}""")
    spark.stop()
  }
}
