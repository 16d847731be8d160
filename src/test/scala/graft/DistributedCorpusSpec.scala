package graft

import org.scalatest.funsuite.AnyFunSuite

/** The SEMANTIC statements of presto-tests/.../AbstractTestDistributedQueries
  * .java, run as sequences against the Engine surface (ctas / insertInto /
  * delete / views / column DDL are API calls; every SELECT body and
  * predicate is the reference's verbatim text). Cluster-mechanics tests
  * (session properties, query stats, resource groups, access-control
  * plumbing beyond graft.AccessControl) are out of scope — they test the
  * coordinator, which Spark replaces (SURVEY §3).
  */
class DistributedCorpusSpec extends AnyFunSuite {
  import TestSession._

  private def freshEngine() = {
    val e = Engine(spark).loadCatalog(sf)
    // Presto-named views like the RefCorpus engine uses, so the corpus
    // text runs unchanged (orderkey, custkey, ...)
    graft.queries.RefCorpus.viewCols.foreach { case (name, cols) =>
      Tables.t(e.spark, sf, name).createOrReplaceTempView(name + "_base")
      e.spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW $name AS SELECT " +
        cols.mkString(", ") + s" FROM ${name}_base")
    }
    e
  }

  private def tmp(name: String): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_dist").toFile
    dir.deleteOnExit()
    dir.getAbsolutePath + "/" + name
  }

  private def rows(e: Engine, q: String): Seq[Seq[Any]] =
    e.sql(q).collect().toSeq.map(_.toSeq)

  private def sameRows(e: Engine, actual: String, expected: String): Unit = {
    val a = rows(e, actual).map(_.map(String.valueOf)).sortBy(_.mkString("|"))
    val b = rows(e, expected).map(_.map(String.valueOf)).sortBy(_.mkString("|"))
    assert(a == b, s"\nactual:   $actual\nexpected: $expected")
  }

  // --- testCreateTableAsSelect (:175) — every CTAS shape ---
  test("CTAS shapes: projection, aggregation, join, limit, unicode, no-data, union-writer") {
    val e = freshEngine()
    val cases = Seq(
      ("test_select", "SELECT orderdate, orderkey, totalprice FROM orders",
        "SELECT count(*) FROM orders"),
      ("test_group", "SELECT orderstatus, sum(totalprice) x FROM orders GROUP BY orderstatus",
        "SELECT count(DISTINCT orderstatus) FROM orders"),
      ("test_join", "SELECT count(*) x FROM lineitem JOIN orders ON lineitem.orderkey = orders.orderkey",
        "SELECT 1"),
      ("test_limit", "SELECT orderkey FROM orders ORDER BY orderkey LIMIT 10",
        "SELECT 10"),
      ("test_unicode", "SELECT '☃' unicode", "SELECT 1"),
      // PushTableWriteThroughUnion shape: write through UNION ALL
      ("test_union_all",
        "SELECT orderdate, orderkey, totalprice FROM orders WHERE orderkey % 2 = 0 UNION ALL " +
          "SELECT orderdate, orderkey, totalprice FROM orders WHERE orderkey % 2 = 1",
        "SELECT count(*) FROM orders"))
    for ((name, query, countQ) <- cases) {
      e.ctas(name, query, tmp(name))
      val expectedCount = rows(e, countQ).head.head.toString.toLong
      assert(e.sql(s"SELECT count(*) FROM $name").head.getLong(0) == expectedCount,
        s"$name row count")
      if (name == "test_select" || name == "test_union_all")
        sameRows(e, s"SELECT * FROM $name",
          "SELECT orderdate, orderkey, totalprice FROM orders")
      e.dropTable(name)
    }
    // WITH NO DATA: schema only, zero rows (testCreateTableAsSelect + testInsert head)
    e.ctas("test_with_no_data",
      "SELECT orderdate, orderkey, totalprice FROM orders LIMIT 0",
      tmp("test_with_no_data"))
    assert(e.sql("SELECT count(*) FROM test_with_no_data").head.getLong(0) == 0)
    assert(e.spark.table("test_with_no_data").schema.fieldNames.toSeq ==
      Seq("orderdate", "orderkey", "totalprice"))
    e.dropTable("test_with_no_data")
  }

  // --- testSymbolAliasing (:847) ---
  test("symbol aliasing survives the writer") {
    val e = freshEngine()
    e.ctas("test_symbol_aliasing", "SELECT 1 foo_1, 2 foo_2_4", tmp("sym"))
    sameRows(e, "SELECT foo_1, foo_2_4 FROM test_symbol_aliasing", "SELECT 1, 2")
    e.dropTable("test_symbol_aliasing")
  }

  // --- testInsert (:426) — full-row, column-list, reordered, union ---
  test("INSERT: full rows, column lists with NULL padding, reordered columns, union source") {
    val e = freshEngine()
    val query = "SELECT orderdate, orderkey, totalprice FROM orders"
    e.ctas("test_insert", query + " LIMIT 0", tmp("ins")) // WITH NO DATA
    assert(e.sql("SELECT count(*) FROM test_insert").head.getLong(0) == 0)

    val n = e.insertInto("test_insert", query)
    assert(n == rows(e, "SELECT count(*) FROM orders").head.head.toString.toLong)
    sameRows(e, "SELECT * FROM test_insert", query)

    assert(e.insertInto("test_insert", Seq("orderkey"), "SELECT -1") == 1)
    assert(e.insertInto("test_insert", Seq("orderkey"), "SELECT null") == 1)
    assert(e.insertInto("test_insert", Seq("orderdate"), "SELECT DATE '2001-01-01'") == 1)
    assert(e.insertInto("test_insert", Seq("orderkey", "orderdate"),
      "SELECT -2, DATE '2001-01-02'") == 1)
    assert(e.insertInto("test_insert", Seq("orderdate", "orderkey"),
      "SELECT DATE '2001-01-03', -3") == 1)
    assert(e.insertInto("test_insert", Seq("totalprice"), "SELECT 1234") == 1)

    sameRows(e, "SELECT * FROM test_insert", query
      + " UNION ALL SELECT null, -1, null"
      + " UNION ALL SELECT null, null, null"
      + " UNION ALL SELECT DATE '2001-01-01', null, null"
      + " UNION ALL SELECT DATE '2001-01-02', -2, null"
      + " UNION ALL SELECT DATE '2001-01-03', -3, null"
      + " UNION ALL SELECT null, null, 1234")

    // UNION source with columns in the opposite order of the table schema
    val n2 = e.insertInto("test_insert", Seq("orderkey", "orderdate", "totalprice"),
      "SELECT orderkey, orderdate, totalprice FROM orders " +
        "UNION ALL SELECT orderkey, orderdate, totalprice FROM orders")
    assert(n2 == 2 * rows(e, "SELECT count(*) FROM orders").head.head.toString.toLong)
    e.dropTable("test_insert")
  }

  // --- testDelete (:475) — halves, successive parts, no-match, subquery ---
  test("DELETE: predicate halves, successive ranges, constant, no-match, contradiction, subquery") {
    val e = freshEngine()
    def recreate(): Unit = {
      if (e.sql("SHOW TABLES").collect().exists(_.getString(1) == "test_delete"))
        e.dropTable("test_delete")
      e.ctas("test_delete", "SELECT * FROM orders", tmp("del"))
    }
    def cnt(q: String): Long = rows(e, q).head.head.toString.toLong

    recreate()
    assert(e.delete("test_delete", "orderkey % 2 = 0") ==
      cnt("SELECT count(*) FROM orders WHERE orderkey % 2 = 0"))
    sameRows(e, "SELECT orderkey FROM test_delete",
      "SELECT orderkey FROM orders WHERE orderkey % 2 <> 0")
    assert(e.delete("test_delete", "true") ==
      cnt("SELECT count(*) FROM orders WHERE orderkey % 2 <> 0"))
    assert(cnt("SELECT count(*) FROM test_delete") == 0)

    recreate()
    assert(e.delete("test_delete", "custkey <= 100") ==
      cnt("SELECT count(*) FROM orders WHERE custkey <= 100"))
    assert(e.delete("test_delete", "custkey <= 300") ==
      cnt("SELECT count(*) FROM orders WHERE custkey > 100 AND custkey <= 300"))
    sameRows(e, "SELECT orderkey FROM test_delete",
      "SELECT orderkey FROM orders WHERE custkey > 300")

    recreate()
    assert(e.delete("test_delete", "orderstatus = 'O'") ==
      cnt("SELECT count(*) FROM orders WHERE orderstatus = 'O'"))
    sameRows(e, "SELECT orderkey FROM test_delete",
      "SELECT orderkey FROM orders WHERE orderstatus <> 'O'")

    recreate()
    assert(e.delete("test_delete", "rand() < 0") == 0)
    assert(e.delete("test_delete", "orderkey < 0") == 0)
    assert(e.delete("test_delete", "orderkey > 5 AND orderkey < 4") == 0)

    // delete using a subquery predicate (the reference's lineitem variant)
    assert(e.delete("test_delete",
      "orderkey IN (SELECT orderkey FROM orders WHERE orderstatus = 'F')") ==
      cnt("SELECT count(*) FROM orders WHERE orderstatus = 'F'"))
    sameRows(e, "SELECT orderkey FROM test_delete",
      "SELECT orderkey FROM orders WHERE orderstatus <> 'F'")
    e.dropTable("test_delete")
  }

  // --- testView (:609) ---
  test("views: create or replace, join a view with itself, CTE does not shadow the view body") {
    val e = freshEngine()
    val query = "SELECT orderkey, orderstatus, totalprice / 2 half FROM orders"
    e.createView("test_view", "SELECT 123 x")
    e.createView("test_view", query) // CREATE OR REPLACE
    sameRows(e, "SELECT * FROM test_view", query)
    sameRows(e,
      "SELECT * FROM test_view a JOIN test_view b on a.orderkey = b.orderkey",
      s"SELECT * FROM ($query) a JOIN ($query) b ON a.orderkey = b.orderkey")
    // a WITH alias shadowing the base table must NOT leak into the view
    sameRows(e,
      "WITH orders AS (SELECT * FROM orders LIMIT 0) SELECT * FROM test_view",
      query)
    e.dropView("test_view")
  }

  // --- testViewCaseSensitivity (:633) ---
  test("view case sensitivity") {
    val e = freshEngine()
    e.createView("test_view_uppercase", "SELECT X FROM (SELECT 123 X)")
    e.createView("test_view_mixedcase", "SELECT XyZ FROM (SELECT 456 XyZ)")
    sameRows(e, "SELECT * FROM test_view_uppercase", "SELECT 123")
    sameRows(e, "SELECT * FROM test_view_mixedcase", "SELECT 456")
    e.dropView("test_view_uppercase")
    e.dropView("test_view_mixedcase")
  }

  // --- testCompatibleTypeChangeForView / 2 (:644/:664) — late binding ---
  test("views re-bind against a replaced base table (compatible type change)") {
    val e = freshEngine()
    e.ctas("test_table_1", "SELECT 'abcdefg' a", tmp("t1"))
    e.createView("test_view_1", "SELECT a FROM test_table_1")
    assert(rows(e, "SELECT * FROM test_view_1") == Seq(Seq("abcdefg")))
    // replace the table with an implicitly-coercible version
    e.dropTable("test_table_1")
    e.ctas("test_table_1", "SELECT 'abc' a", tmp("t1b"))
    assert(rows(e, "SELECT * FROM test_view_1") == Seq(Seq("abc")))
    e.dropView("test_view_1"); e.dropTable("test_table_1")

    e.ctas("test_table_2", "SELECT CAST(1 AS BIGINT) v", tmp("t2"))
    e.createView("test_view_2", "SELECT * FROM test_table_2")
    assert(rows(e, "SELECT * FROM test_view_2") == Seq(Seq(1L)))
    e.dropTable("test_table_2")
    e.ctas("test_table_2", "SELECT CAST(1 AS INTEGER) v", tmp("t2b"))
    assert(rows(e, "SELECT * FROM test_view_2 WHERE v = 1") == Seq(Seq(1)))
    e.dropView("test_view_2"); e.dropTable("test_table_2")
  }

  // --- testRenameTable (:338) / testRenameColumn (:358) /
  //     testDropColumn (:375) / testAddColumn (:386) ---
  test("ALTER TABLE: rename table, rename column, drop column, add column") {
    val e = freshEngine()
    e.ctas("test_rename", "SELECT 123 x", tmp("ren"))
    e.renameTable("test_rename", "test_rename_new")
    assert(rows(e, "SELECT x FROM test_rename_new") == Seq(Seq(123)))
    intercept[Exception](e.sql("SELECT x FROM test_rename").collect())

    e.renameColumn("test_rename_new", "x", "y")
    assert(rows(e, "SELECT y FROM test_rename_new") == Seq(Seq(123)))

    e.addColumn("test_rename_new", "z", "DOUBLE")
    assert(rows(e, "SELECT y, z FROM test_rename_new") == Seq(Seq(123, null)))

    e.dropColumn("test_rename_new", "z")
    assert(e.spark.table("test_rename_new").schema.fieldNames.toSeq == Seq("y"))
    e.dropTable("test_rename_new")
  }

  // --- testLargeQuerySuccess (:823) ---
  test("500-conjunct query analyzes and runs") {
    val e = freshEngine()
    val q = "SELECT " + Seq.fill(500)("1 = 1").mkString(" AND ")
    assert(e.sql(q).head.getBoolean(0))
  }

  // --- testViewMetadata (:611) — the information_schema legs, verbatim ---
  test("view metadata through information_schema.tables/views") {
    val e = freshEngine()
    val query = "SELECT BIGINT '123' x, 'foo' y"
    e.createView("meta_test_view", query)

    val tables = rows(e,
      "SELECT table_name, table_type FROM information_schema.tables")
      .map(r => r.head.toString -> r(1).toString).toMap
    for (t <- Seq("customer", "lineitem", "nation", "orders", "part",
        "region", "supplier"))
      assert(tables.get(t).contains("BASE TABLE"), s"$t: ${tables.get(t)}")
    assert(tables.get("meta_test_view").contains("VIEW"))

    val views = rows(e,
      "SELECT table_name, view_definition FROM information_schema.views")
      .map(r => r.head.toString -> r(1).toString).toMap
    assert(views.get("meta_test_view").contains(query))
    e.dropView("meta_test_view")
  }

  // --- testTableSampleSystemBoundaryValues (:154) — verbatim ---
  test("TABLESAMPLE SYSTEM boundary values") {
    val e = freshEngine()
    val all = rows(e, "SELECT orderkey FROM orders").map(_.head).toSet
    val full = rows(e,
      "SELECT orderkey FROM orders TABLESAMPLE SYSTEM (100)").map(_.head)
    val empty = rows(e,
      "SELECT orderkey FROM orders TABLESAMPLE SYSTEM (0)")
    assert(full.toSet == all) // 100% sample contains every row
    assert(empty.isEmpty)
    // mid-range BERNOULLI sample stays within the population
    val half = rows(e,
      "SELECT orderkey FROM orders TABLESAMPLE BERNOULLI (50)").map(_.head)
    assert(half.forall(all.contains))
  }

  // --- testComplexCast (:139) — verbatim (CAST(interval AS VARCHAR) in
  //     Presto's "%d %02d:%02d:%02d.%03d" rendering) ---
  test("complex cast: interval day-to-second renders in Presto format") {
    val e = freshEngine()
    sameRows(e,
      "WITH t(a, b) AS (VALUES (1, INTERVAL '1' SECOND)) " +
        "SELECT count(DISTINCT a), CAST(max(b) AS VARCHAR) FROM t",
      "VALUES (CAST(1 AS BIGINT), '0 00:00:01.000')")
    // year-month leg (IntervalYearMonth.formatMonths "%d-%d")
    assert(rows(e,
      "SELECT CAST(INTERVAL '14' MONTH AS VARCHAR), " +
        "CAST(INTERVAL '-1' DAY AS VARCHAR)").head ==
      Seq("1-2", "-1 00:00:00.000"))
  }
}
