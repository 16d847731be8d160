package graft

import org.scalatest.funsuite.AnyFunSuite

/** Resource-group surface (MAIN/execution/resourceGroups/
  * InternalResourceGroupManager.java — per-group queueing/concurrency,
  * selected per session): mapped to Spark's fair-scheduler pools. The
  * group name IS the pool name; `SET SESSION resource_group='g'` routes
  * every job this engine thread submits afterwards into pool g (weights/
  * minShare/FIFO come from spark.scheduler.allocation.file — cluster
  * config, not engine code). */
class ResourceGroupSpec extends AnyFunSuite {
  import TestSession._

  test("SET SESSION resource_group routes jobs to the named scheduler pool") {
    val e = Engine(spark)
    assert(e.spark.sparkContext.getLocalProperty("spark.scheduler.pool") == null)
    e.sql("SET SESSION resource_group = 'global.adhoc'")
    assert(e.spark.sparkContext.getLocalProperty("spark.scheduler.pool") ==
      "global.adhoc")
    // surfaced back through the session-property store
    assert(e.sessionProperty("resource_group").contains("global.adhoc"))
    // reset clears the pool (back to the default scheduler)
    e.sql("RESET SESSION resource_group")
    assert(e.spark.sparkContext.getLocalProperty("spark.scheduler.pool") == null)
  }

  test("empty group name clears the pool") {
    val e = Engine(spark)
    e.sql("SET SESSION resource_group = 'global.etl'")
    e.sql("SET SESSION resource_group = ''")
    assert(e.spark.sparkContext.getLocalProperty("spark.scheduler.pool") == null)
  }

  test("resource_group appears in SHOW SESSION") {
    val e = Engine(spark)
    e.sql("SET SESSION resource_group = 'global.bench'")
    val rows = e.sql("SHOW SESSION").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(rows.get("resource_group").contains("global.bench"))
    e.sql("RESET SESSION resource_group")
  }
}
