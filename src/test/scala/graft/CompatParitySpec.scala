package graft

import org.scalatest.funsuite.AnyFunSuite

/** The compat registry shadows ~150 builtin names (split, trim, substr,
  * min, max, log, …) on Engine sessions. Standard ANSI SQL must come out
  * IDENTICAL through the shadowed session and a vanilla session — a
  * shadowing shim that changes 1-arg max or 3-arg substring semantics
  * would silently corrupt every ordinary query an Engine user runs. */
class CompatParitySpec extends AnyFunSuite {
  import TestSession._

  // TpchMacro's both() registers the same text as query and oracle, so
  // these SQL strings are guaranteed Spark-parseable
  private val names = Seq("h05_local_supplier", "h13_order_distribution",
    "h14_promo_effect", "h22_global_sales", "q55_scalar_subquery")

  test("compat registry is transparent for standard SQL") {
    val engine = Engine.cached(spark, sf)
    names.foreach { n =>
      val text = SparkEntry.oracleSql(n)
      Tables.registerAll(spark, sf)
      val vanilla = spark.sql(text).collect().map(_.toString).toSeq
      val shadowed = engine.sql(text).collect().map(_.toString).toSeq
      assert(shadowed == vanilla, s"$n diverged under the compat registry")
    }
  }
}
