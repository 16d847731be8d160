package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plugin WINDOW functions (§2.11) — the reference's testCustomRank
  * (AbstractTestQueries.java:6955-6969) run verbatim: custom_rank is
  * installed through the WindowPlugins surface and must produce exactly
  * rank()'s output, the reference's own assertion. */
class WindowPluginSpec extends AnyFunSuite {
  import TestSession._

  test("custom_rank plugin runs the reference query verbatim and equals rank()") {
    val e = queries.RefCorpus.engine(spark, sf)
    val sql =
      """SELECT orderstatus, clerk, sales
        |, custom_rank() OVER (PARTITION BY orderstatus ORDER BY sales DESC) rnk
        |FROM (
        |  SELECT orderstatus, clerk, sum(totalprice) sales
        |  FROM orders
        |  GROUP BY orderstatus, clerk
        |)
        |ORDER BY orderstatus, clerk""".stripMargin
    val custom = e.sql(sql).collect().map(_.toSeq).toSeq
    val builtin = e.sql(sql.replace("custom_rank", "rank")).collect().map(_.toSeq).toSeq
    assert(custom.nonEmpty && custom == builtin)
  }

  test("registerWindowFunction installs a plugin on a plain Engine session") {
    val e = Engine(spark).loadCatalog(sf)
      .registerWindowFunction("my_rank",
        args => new functions.WindowPlugins.CustomRank())
    val out = e.sql(
      """SELECT o_orderstatus, my_rank() OVER (
        |  PARTITION BY o_orderstatus ORDER BY o_totalprice DESC) r
        |FROM orders ORDER BY o_orderstatus, r LIMIT 5""".stripMargin)
      .collect().map(_.getInt(1))
    assert(out.take(2).toSeq == Seq(1, 2))
  }
}
