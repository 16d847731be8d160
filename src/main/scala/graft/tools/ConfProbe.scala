package graft.tools

/** Dump session-conf values (dev tool): `runMain graft.tools.ConfProbe k1 k2…`
  * prints each key's effective value in a GraftSession — used to confirm
  * which Spark defaults (ANSI, runtime bloom filters, DPP) the engine
  * actually runs under before keying optimizations off them. */
object ConfProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(2)
    val keys =
      if (args.nonEmpty) args.toSeq
      else Seq(
        "spark.sql.ansi.enabled",
        "spark.sql.optimizer.runtime.bloomFilter.enabled",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
        "spark.sql.optimizer.runtime.bloomFilter.expectedNumItems",
        "spark.sql.optimizer.runtimeFilter.semiJoinReduction.enabled",
        "spark.sql.optimizer.dynamicPartitionPruning.enabled")
    keys.foreach { k =>
      println(k + " = " +
        scala.util.Try(spark.conf.get(k)).getOrElse("<undefined>"))
    }
    spark.stop()
  }
}
