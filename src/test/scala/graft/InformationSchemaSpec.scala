package graft

import org.scalatest.funsuite.AnyFunSuite

/** information_schema connector: the five metadata tables
  * (InformationSchemaMetadata.java:71-117) queryable with plain SQL
  * through Engine.sql, rendered the way the reference's page source
  * renders them (InformationSchemaPageSourceProvider.java:128-199). */
class InformationSchemaSpec extends AnyFunSuite {
  import TestSession._

  private def engine = Engine(spark).loadCatalog(sf)

  test("information_schema.tables lists the catalog; views win name collisions") {
    val e = engine
    val rows = e.sql(
      """SELECT table_schema, table_name, table_type
        |FROM information_schema.tables ORDER BY table_name""".stripMargin)
      .collect().map(r => (r.getString(1), r.getString(2))).toMap
    for (t <- Tables.all)
      assert(rows.get(t).contains("BASE TABLE"), s"$t missing/typed wrong: $rows")

    e.createView("nation_v", "SELECT n_name FROM nation")
    val after = e.sql(
      "SELECT table_type FROM information_schema.tables WHERE table_name = 'nation_v'")
      .collect().map(_.getString(0)).toSeq
    assert(after == Seq("VIEW"))
  }

  test("information_schema.columns: 1-based ordinals, Presto type names") {
    val e = engine
    val cols = e.sql(
      """SELECT column_name, ordinal_position, data_type, is_nullable
        |FROM information_schema.columns
        |WHERE table_name = 'nation' ORDER BY ordinal_position""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getString(3)))
    assert(cols.map(_._1).toSeq == Seq("n_nationkey", "n_name", "n_regionkey"))
    assert(cols.map(_._2).toSeq == Seq(1L, 2L, 3L))
    assert(cols.head._3 == "integer" && cols(1)._3 == "varchar")
    assert(cols.forall(_._4 == "YES"))
    // nested types render in Presto signature form
    val emb = e.sql(
      """SELECT data_type FROM information_schema.columns
        |WHERE table_name = 'embeddings' AND column_name = 'embedding'""".stripMargin)
      .head.getString(0)
    assert(emb == "array(real)" || emb == "array(double)", emb)
  }

  test("information_schema joins and aggregates like any table") {
    val e = engine
    val widest = e.sql(
      """SELECT t.table_name, count(*) AS n_cols
        |FROM information_schema.tables t
        |JOIN information_schema.columns c ON t.table_name = c.table_name
        |WHERE t.table_type = 'BASE TABLE'
        |GROUP BY t.table_name ORDER BY n_cols DESC, t.table_name LIMIT 1""".stripMargin)
      .head
    val expected = Tables.all
      .map(t => t -> Tables.t(spark, sf, t).schema.size)
      .sortBy(e => (-e._2, e._1)).head
    assert((widest.getString(0), widest.getLong(1).toInt) ==
      ((expected._1, expected._2)), s"widest=$widest expected=$expected")
  }

  test("information_schema.views carries the stored definition text") {
    val e = engine
    e.createView("orders_v", "SELECT o_orderkey FROM orders WHERE o_totalprice > 0")
    val defn = e.sql(
      "SELECT view_definition FROM information_schema.views WHERE table_name = 'orders_v'")
      .head.getString(0)
    assert(defn.contains("o_totalprice > 0"))
  }

  test("information_schema.schemata includes information_schema itself") {
    val names = engine.sql(
      "SELECT schema_name FROM information_schema.schemata")
      .collect().map(_.getString(0)).toSet
    assert(names.contains("information_schema") && names.contains("default"))
  }

  test("information_schema.table_privileges reflects GRANT/REVOKE") {
    val e = engine
    e.accessControl.grant(Seq("SELECT", "INSERT"), "orders", "alice",
      withGrantOption = true)
    e.accessControl.grant(Seq("SELECT"), "orders", "bob")
    val rows = e.sql(
      """SELECT grantee, privilege_type, is_grantable
        |FROM information_schema.table_privileges
        |WHERE table_name = 'orders' ORDER BY grantee, privilege_type""".stripMargin)
      .collect().map(r => (r.getString(0), r.getString(1), r.getBoolean(2))).toSeq
    assert(rows == Seq(("alice", "INSERT", true), ("alice", "SELECT", true),
      ("bob", "SELECT", false)))
    e.accessControl.revoke(Seq("SELECT"), "orders", "bob")
    val after = e.sql(
      "SELECT count(*) FROM information_schema.table_privileges WHERE grantee = 'bob'")
      .head.getLong(0)
    assert(after == 0L)
  }

  test("smoke-test statements verbatim (AbstractTestIntegrationSmokeTest)") {
    // testSelectInformationSchemaTables / testSelectInformationSchemaColumns
    // filtering legs: an unknown catalog filters to empty; GROUP BY over the
    // metadata works like any table
    val e = queries.RefCorpus.engine(spark, sf)
    assert(e.sql("SELECT table_name FROM information_schema.tables " +
      "WHERE table_catalog = 'something_else'").collect().isEmpty)
    assert(e.sql("SELECT table_name FROM information_schema.columns " +
      "WHERE table_name = 'orders' GROUP BY table_name")
      .collect().map(_.getString(0)).toSeq == Seq("orders"))
    assert(e.sql("SELECT column_name FROM information_schema.columns " +
      "WHERE table_catalog = 'something_else'").collect().isEmpty)
  }

  test("metadata tables list themselves under schema information_schema") {
    // InformationSchemaMetadata lists its own tables; columns too
    val selves = engine.sql(
      "SELECT table_name FROM information_schema.tables " +
        "WHERE table_schema = 'information_schema' ORDER BY table_name")
      .collect().map(_.getString(0)).toSeq
    assert(selves == Seq("columns", "schemata", "table_privileges", "tables", "views"))
    val cols = engine.sql(
      "SELECT column_name, data_type FROM information_schema.columns " +
        "WHERE table_schema = 'information_schema' AND table_name = 'tables' " +
        "ORDER BY ordinal_position").collect()
    assert(cols.map(_.getString(0)).toSeq ==
      Seq("table_catalog", "table_schema", "table_name", "table_type"))
    assert(cols.forall(_.getString(1) == "varchar"))
  }

  test("internal <t>_base helper views are hidden when <t> shadows them") {
    val e = engine
    e.spark.sql("SELECT 1 AS x").createOrReplaceTempView("shadow_t_base")
    e.spark.sql("SELECT x FROM shadow_t_base").createOrReplaceTempView("shadow_t")
    try {
      val names = e.sql(
        "SELECT table_name FROM information_schema.tables " +
          "WHERE table_name LIKE 'shadow_t%'").collect().map(_.getString(0)).toSeq
      assert(names == Seq("shadow_t"))
    } finally {
      e.spark.catalog.dropTempView("shadow_t")
      e.spark.catalog.dropTempView("shadow_t_base")
    }
  }

  test("literal containing the phrase is untouched by the repoint") {
    val out = engine.sql(
      "SELECT 'information_schema.tables' AS s, table_name " +
        "FROM information_schema.tables WHERE table_name = 'region'")
      .head
    assert(out.getString(0) == "information_schema.tables" &&
      out.getString(1) == "region")
  }
}
