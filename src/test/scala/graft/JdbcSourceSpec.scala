package graft

import org.scalatest.funsuite.AnyFunSuite

/** JDBC connector surface (SURVEY §2.1 — presto-base-jdbc
  * BaseJdbcClient.java: the reference reads/writes external RDBMS tables
  * through per-connector JDBC clients). Spark's `jdbc` format is the
  * equivalent connector; exercised end-to-end against the in-process Derby
  * engine the Spark distribution ships (no external DB in the container).
  * Covers: write (CREATE+INSERT through the connector), read-back, column
  * pruning + predicate pushdown into the JDBC source, and
  * `Engine.registerTable` exposure to SQL.
  */
class JdbcSourceSpec extends AnyFunSuite {
  import TestSession._

  private val url = "jdbc:derby:memory:graftjdbc;create=true"

  test("JDBC write + read-back roundtrip (Derby in-process)") {
    import spark.implicits._
    val df = Seq((1L, "ALGERIA", 0L), (2L, "BRAZIL", 1L), (3L, "CANADA", 1L))
      .toDF("nationkey", "name", "regionkey")
    df.write.mode("overwrite")
      .format("jdbc").option("url", url).option("dbtable", "nations")
      .save()
    val back = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "nations").load()
    assert(back.count() == 3)
    assert(back.schema.fieldNames.map(_.toLowerCase).toSet ==
      Set("nationkey", "name", "regionkey"))
    assert(back.filter($"regionkey" === 1).count() == 2)
  }

  test("JDBC predicate and projection push into the source") {
    val back = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "nations").load()
    val pruned = back.filter(back("regionkey") === 1).select("name")
    val plan = pruned.queryExecution.executedPlan.toString
    // Spark's JDBC scan reports pushed filters + the pruned column list
    assert(plan.contains("PushedFilters") && plan.contains("IsNotNull"),
      plan.take(600))
    assert(pruned.collect().map(_.getString(0)).sorted.toSeq ==
      Seq("BRAZIL", "CANADA"))
  }

  test("JDBC table through the Engine SQL surface") {
    val e = Engine(spark)
    e.spark.read.format("jdbc")
      .option("url", url).option("dbtable", "nations").load()
      .createOrReplaceTempView("jdbc_nations")
    val rows = e.sql(
      "SELECT name FROM jdbc_nations WHERE regionkey = 1 ORDER BY name")
      .collect().map(_.getString(0)).toSeq
    assert(rows == Seq("BRAZIL", "CANADA"))
  }
}
