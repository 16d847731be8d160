package graft.tools

import graft._
import org.apache.spark.sql.functions._

/** Round-16 h02 diagnostic: quantify parquet's FILTERED read path on a
  * partkey-sorted layout. `ScanProbe <parquetDir> <nKeys> [push]` times
  * `WHERE l_partkey IN (<nKeys> uniform keys)` + min/count directly over
  * the layout files. nKeys ≤ spark.sql.parquet.pushdown.inFilterThreshold
  * (10) translates to an or-of-eq chain (per-value page-index binary
  * search → real page skips); larger sets translate to the native parquet
  * In whose page evaluation is min/max-range only (zero skips on a
  * uniform key set). push=false disables translation entirely (plain full
  * scan + codegen filter) — the baseline. */
object ScanProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    val path = args(0)
    val nKeys = if (args.length > 1) args(1).toInt else 8
    // mode: "true" = spark pushdown on, "false" = off, "udp" = pushdown
    // off + graft SortedLongInPredicate relayed through relation options
    val mode = if (args.length > 2) args(2) else "true"
    spark.conf.set("spark.sql.parquet.filterPushdown",
      (mode == "true").toString)
    val base = spark.read.parquet(path)
    val maxKey = base.agg(max(col("l_partkey"))).head().getLong(0)
    val keys = (1 to nKeys).map(i =>
      (maxKey.toDouble * i / (nKeys + 1)).toLong)
    if (mode == "longset" || mode == "inset") {
      // isolate the per-row probe: same scan, filter expression flipped
      import org.apache.spark.sql.catalyst.expressions.InSet
      val attr = base.queryExecution.analyzed.output
        .find(_.name == "l_partkey").get
      val pred =
        if (mode == "longset")
          graft.plans.NoPushdown(graft.plans.InLongSet(attr, keys.toArray))
        else graft.plans.NoPushdown(InSet(attr, keys.map(_.asInstanceOf[Any]).toSet))
      for (r <- 1 to 3) {
        val t0 = System.nanoTime()
        val res = base.where(org.apache.spark.sql.GraftBridge.column(pred))
          .agg(min(col("l_extendedprice")), count(lit(1))).collect()
        println(f"mode=$mode keys=$nKeys run=$r " +
          f"${(System.nanoTime() - t0) / 1e9}%.2f s ${res.head}")
      }
      spark.stop(); return
    }
    val df =
      if (mode == "udp") {
        val pred = graft.sources.SortedInPredicate.forLongColumn(
          "l_partkey", keys.toArray)
        spark.read
          .option(graft.sources.SortedInPredicate.CONF_KEY,
            graft.sources.SortedInPredicate.toConfValue(pred))
          .parquet(path)
      } else base
    for (r <- 1 to 3) {
      val t0 = System.nanoTime()
      val q = df.where(col("l_partkey").isin(keys: _*))
        .agg(min(col("l_extendedprice")), count(lit(1)))
      val res = q.collect()
      val wall = (System.nanoTime() - t0) / 1e9
      def scansOf(p: org.apache.spark.sql.execution.SparkPlan)
          : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = {
        val here = p.collect {
          case s: org.apache.spark.sql.execution.FileSourceScanExec => s }
        val nested = p.collect {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            scansOf(a.executedPlan)
          case qs: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
            scansOf(qs.plan)
        }.flatten
        here ++ nested
      }
      val sm = scansOf(q.queryExecution.executedPlan).headOption.map(s =>
        s.metrics.collect { case (k, m)
            if Set("numOutputRows", "scanTime", "numFiles").contains(k) =>
          s"$k=${m.value}" }.mkString(" ")).getOrElse("?")
      println(f"mode=$mode keys=$nKeys run=$r $wall%.2f s ${res.head} [$sm]")
    }
    spark.stop()
  }
}
