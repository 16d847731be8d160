package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, lit}
import org.scalatest.funsuite.AnyFunSuite

/** The typed Column API (graft.functions package object) and the
  * SparkSessionExtensions registration path. */
class ColumnApiSpec extends AnyFunSuite {
  import TestSession._
  import graft.{functions => F}

  test("column API cosine_similarity matches SQL result") {
    val df = Tables.t(spark, sf, "embeddings").limit(50)
    val viaCol = df.select(col("vec_id"),
      F.cosine_similarity(col("embedding"), col("embedding")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(viaCol.values.forall(v => math.abs(v - 1.0) < 1e-9))
  }

  test("column API cardinality + word_stem") {
    import spark.implicits._
    val r = Seq(("running", Seq(1, 2, 3))).toDF("w", "arr")
      .select(F.word_stem(col("w")), F.cardinality(col("arr")))
      .head
    assert(r.getString(0) == "run" && r.getInt(1) == 3)
  }

  test("column API aggregates: approx_set → merge_hll → cardinality") {
    val li = Tables.t(spark, sf, "lineitem")
    val sketches = li.groupBy("l_returnflag")
      .agg(F.approx_set(col("l_orderkey")).as("s"))
    val merged = sketches.agg(F.cardinality(F.merge_hll(col("s"))).as("n"))
      .head.getLong(0)
    val exact = li.select("l_orderkey").distinct().count()
    assert(math.abs(merged - exact).toDouble / exact < 0.05, s"$merged vs $exact")
  }

  test("column API max_by/min_by n and histogram") {
    val o = Tables.t(spark, sf, "orders")
    val top = o.agg(F.max_by(col("o_orderkey"), col("o_totalprice"), 5).as("t"))
      .head.getSeq[Long](0)
    val expect = o.orderBy(col("o_totalprice").desc).limit(5)
      .collect().map(_.getLong(0))
    assert(top.toSet == expect.toSet)
    val hist = o.agg(F.histogram(col("o_orderstatus"))).head
      .getMap[String, Long](0)
    assert(hist.values.sum == o.count())
  }

  test("column API geo functions") {
    import graft.{functions => F}
    val df = spark.range(1).select(
      F.st_astext(F.st_centroid(F.st_geometry_from_text(
        lit("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")))).as("c"),
      F.st_distance(F.st_point(lit(0.0), lit(0.0)),
        F.st_point(lit(3.0), lit(4.0))).as("d"),
      F.st_contains(F.st_geometry_from_text(
        lit("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")),
        F.st_point(lit(1.0), lit(1.0))).as("in"))
    val r = df.head
    assert(r.getString(0) == "POINT (2 2)" && r.getDouble(1) == 5.0 &&
      r.getBoolean(2))
  }

  test("catalog introspection: SHOW TABLES / DESCRIBE") {
    val e = Engine(spark).loadCatalog(sf)
    val tables = e.sql("SHOW TABLES").collect().map(_.getString(1)).toSet
    assert(Set("orders", "lineitem", "customer", "documents").subsetOf(tables))
    val cols = e.sql("DESCRIBE orders").collect().map(_.getString(0)).toSet
    assert(Set("o_orderkey", "o_custkey", "o_totalprice").subsetOf(cols))
  }

  test("metadata statements: SHOW COLUMNS/FUNCTIONS, SET SESSION, DESCRIBE OUTPUT") {
    val e = Engine(spark).loadCatalog(sf)
    // SHOW COLUMNS (PARSER/tree/ShowColumns.java)
    val cols = e.sql("SHOW COLUMNS IN lineitem").collect().map(_.getString(0)).toSet
    assert(Set("l_orderkey", "l_quantity", "l_shipdate").subsetOf(cols))
    // SHOW FUNCTIONS (ShowFunctions.java) — compat registrations included
    val fns = e.sql("SHOW FUNCTIONS").collect().map(_.getString(0)).toSet
    assert(Set("strpos", "word_stem", "approx_distinct").subsetOf(fns))
    // SET SESSION / RESET SESSION (SetSession.java / ResetSession.java)
    e.sql("SET spark.sql.autoBroadcastJoinThreshold=1234567")
    assert(e.spark.conf.get("spark.sql.autoBroadcastJoinThreshold") == "1234567")
    e.sql("RESET spark.sql.autoBroadcastJoinThreshold")
    assert(e.spark.conf.get("spark.sql.autoBroadcastJoinThreshold") != "1234567")
    // DESCRIBE OUTPUT <prepared> (DescribeOutput.java): analysis only
    e.prepare("po", "SELECT o_orderkey, round(o_totalprice, 2) AS p FROM orders")
    assert(e.describeOutput("po") ==
      Seq("o_orderkey" -> "BIGINT", "p" -> "DOUBLE"))
    // DESCRIBE INPUT <prepared> (DescribeInput.java): positional parameters
    e.prepare("pi", "SELECT count(*) FROM orders " +
      "WHERE o_totalprice > ? AND o_orderstatus = ?")
    assert(e.describeInput("pi") == Seq(1 -> "unknown", 2 -> "unknown"))
    assert(e.describeInput("po").isEmpty)
  }

  test("SHOW CREATE TABLE reconstructs DDL for path-backed tables") {
    val e = Engine(spark).loadCatalog(sf)
    val path = java.nio.file.Files.createTempDirectory("graft-sct").toString
    e.ctas("sct_probe", "SELECT o_orderkey, o_orderstatus FROM orders LIMIT 5", path)
    val ddl = e.showCreateTable("sct_probe")
    assert(ddl.contains("CREATE TABLE sct_probe"), ddl)
    assert(ddl.contains("o_orderkey BIGINT"), ddl)
    assert(ddl.contains("USING parquet") && ddl.contains(path), ddl)
    // plain catalog views still render their columns
    assert(e.showCreateTable("orders").contains("o_orderdate TIMESTAMP_NTZ"))
  }

  test("SHOW STATS surface: per-column stats + summary row count") {
    val e = Engine(spark).loadCatalog(sf)
    val stats = e.showStats("orders").collect()
      .map(r => Option(r.getString(0)) -> r).toMap
    val n = e.sql("SELECT count(*) FROM orders").head.getLong(0)
    // summary row carries the table row count
    assert(stats(None).getLong(4) == n)
    val key = stats(Some("o_orderkey"))
    assert(!key.isNullAt(2) && math.abs(key.getLong(2) - n).toDouble / n < 0.10,
      s"ndv=${key.get(2)} vs $n") // pk: ndv ≈ row count (HLL estimate)
    assert(key.getDouble(3) == 0.0) // no nulls
    assert(key.getString(5) == "0") // low_value
    val status = stats(Some("o_orderstatus"))
    assert(status.getLong(2) <= 5 && status.getLong(1) == n) // 1-char strings
    // SHOW STATS FOR (query): same pass over a derived result
    val qs = e.showStatsForQuery(
      "SELECT o_orderkey FROM orders WHERE o_orderkey <= 100").collect()
      .map(r => Option(r.getString(0)) -> r).toMap
    assert(qs(None).getLong(4) ==
      e.sql("SELECT count(*) FROM orders WHERE o_orderkey <= 100").head.getLong(0))
    assert(qs(Some("o_orderkey")).getString(6).toLong <= 100) // high_value
  }

  test("Engine explain + validate surface") {
    val e = Engine(spark).loadCatalog(sf)
    val txt = e.explain("SELECT count(*) FROM orders", "formatted")
    assert(txt.contains("HashAggregate") || txt.contains("Aggregate"))
    assert(e.validate("SELECT o_orderkey FROM orders"))
    intercept[Exception](e.validate("SELECT no_such_col FROM orders"))
    // validate must analyze WITHOUT executing: the view must not be created.
    assert(e.validate("CREATE TEMP VIEW graft_validate_probe AS SELECT 1 AS x"))
    assert(spark.catalog.tableExists("graft_validate_probe") == false)
    // EXPLAIN (FORMAT GRAPHVIZ): a DOT digraph with edges between operators
    val dot = e.explainGraphviz(
      "SELECT n_name, count(*) FROM nation JOIN region ON n_regionkey = r_regionkey GROUP BY n_name")
    assert(dot.startsWith("digraph logical_plan {"), dot.take(120))
    assert(dot.contains("Aggregate") && dot.contains("Join"), dot)
    assert(dot.contains("->"), dot)
    val analyzed = e.explainAnalyze(
      "SELECT o_orderstatus, count(*) FROM orders GROUP BY o_orderstatus")
    assert(analyzed.contains("Runtime metrics"), analyzed.take(300))
    assert(analyzed.contains("numOutputRows="), analyzed.take(2000))
    // Metrics must populate WITHOUT collecting the result to the driver:
    // a full-width unaggregated result (the 100 TB shape) still reports.
    val wide = e.explainAnalyze("SELECT * FROM orders CROSS JOIN nation")
    assert(wide.contains("Runtime metrics"), wide.take(300))
    assert(wide.contains("numOutputRows="), wide.take(2000))
  }

  test("Engine CTAS writes, commits, and registers the table") {
    val e = Engine(spark).loadCatalog(sf)
    val path = java.nio.file.Files.createTempDirectory("graft-ctas").toString
    e.ctas("big_orders", "SELECT * FROM orders WHERE o_totalprice > 200000", path)
    val n = e.sql("SELECT count(*) FROM big_orders").head.getLong(0)
    val expect = e.sql(
      "SELECT count(*) FROM orders WHERE o_totalprice > 200000").head.getLong(0)
    assert(n == expect && n > 0)
  }

  test("Engine PREPARE/EXECUTE binds positional parameters") {
    val e = Engine(spark).loadCatalog(sf)
    e.prepare("top_orders",
      "SELECT o_orderkey FROM orders WHERE o_totalprice > ? AND o_orderstatus = ? ORDER BY o_orderkey LIMIT 5")
    val rows = e.execute("top_orders", 100000.0, "F").collect()
    assert(rows.nonEmpty && rows.length <= 5)
    val expect = e.sql(
      "SELECT o_orderkey FROM orders WHERE o_totalprice > 100000.0 AND o_orderstatus = 'F' ORDER BY o_orderkey LIMIT 5").collect()
    assert(rows.map(_.getLong(0)).toSeq == expect.map(_.getLong(0)).toSeq)
    e.deallocate("top_orders")
    intercept[IllegalArgumentException](e.execute("top_orders", 1))
  }

  test("statement forms: PREPARE / EXECUTE USING / DEALLOCATE as SQL") {
    val e = Engine(spark).loadCatalog(sf)
    assert(e.sql("PREPARE sq FROM SELECT o_orderkey FROM orders " +
      "WHERE o_totalprice > ? AND o_orderstatus = ? ORDER BY o_orderkey LIMIT 5")
      .columns.head == "PREPARE")
    val rows = e.sql("EXECUTE sq USING 100000.0, 'F'").collect()
    val expect = e.sql("SELECT o_orderkey FROM orders WHERE o_totalprice > " +
      "100000.0 AND o_orderstatus = 'F' ORDER BY o_orderkey LIMIT 5").collect()
    assert(rows.map(_.getLong(0)).toSeq == expect.map(_.getLong(0)).toSeq)
    // a parameter list with a comma inside a string literal binds intact
    e.sql("PREPARE sq2 FROM SELECT ? AS a, ? AS b")
    val r2 = e.sql("EXECUTE sq2 USING 'x, y', 7").collect().head
    assert(r2.getString(0) == "x, y" && r2.getInt(1) == 7)
    e.sql("DEALLOCATE PREPARE sq")
    intercept[IllegalArgumentException](e.sql("EXECUTE sq USING 1"))
  }

  test("statement forms: SET / RESET / SHOW SESSION") {
    val e = Engine(spark).loadCatalog(sf)
    // seeded defaults visible (SystemSessionProperties subset)
    val before = e.sql("SHOW SESSION").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(before("optimize_hash_generation") == "true")
    e.sql("SET SESSION optimize_hash_generation = false")
    e.sql("SET SESSION custom_prop = 'abc'")
    val after = e.sql("SHOW SESSION").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(after("optimize_hash_generation") == "false")
    assert(after("custom_prop") == "abc")
    assert(e.sessionProperty("optimize_hash_generation").contains("false"))
    e.sql("RESET SESSION optimize_hash_generation")
    assert(e.sessionProperty("optimize_hash_generation").contains("true"))
  }

  test("statement forms: transactions and EXPLAIN options as SQL") {
    val e = Engine(spark).loadCatalog(sf)
    assert(e.sql("START TRANSACTION").columns.head == "START TRANSACTION")
    e.sql("ROLLBACK")
    e.sql("START TRANSACTION ISOLATION LEVEL READ COMMITTED")
    e.sql("COMMIT")
    intercept[IllegalArgumentException](e.sql("COMMIT WORK")) // no tx open
    val phys = e.sql("EXPLAIN (TYPE DISTRIBUTED) SELECT count(*) FROM orders")
      .collect().head.getString(0)
    assert(phys.contains("Physical Plan"))
    val dot = e.sql("EXPLAIN (FORMAT GRAPHVIZ) SELECT 1")
      .collect().head.getString(0)
    assert(dot.startsWith("digraph") && dot.contains("plannode_0"))
    val valid = e.sql("EXPLAIN (TYPE VALIDATE) SELECT o_orderkey FROM orders")
    assert(valid.columns.head == "Valid" && valid.collect().head.getBoolean(0))
    // EXPLAIN over the PRESTO dialect goes through the engine pipeline
    val pl = e.sql("EXPLAIN (TYPE LOGICAL) SELECT ARRAY[1,2][1]")
      .collect().head.getString(0)
    assert(pl.contains("Logical Plan") || pl.contains("logical"))
    val an = e.sql("EXPLAIN ANALYZE SELECT count(*) FROM orders")
      .collect().head.getString(0)
    assert(an.contains("AdaptiveSparkPlan") || an.contains("HashAggregate"))
  }

  test("statement forms: SHOW STATS / GRANTS / CREATE TABLE / DESCRIBE INPUT·OUTPUT as SQL") {
    val e = Engine(spark).loadCatalog(sf)
    val stats = e.sql("SHOW STATS FOR orders").collect()
    // one row per column plus the summary row (null column_name)
    assert(stats.map(_.getString(0)).contains("o_orderkey"))
    assert(stats.count(_.isNullAt(0)) == 1)
    val statsQ = e.sql("SHOW STATS FOR (SELECT o_orderkey FROM orders)").collect()
    assert(statsQ.length == 2) // one column + summary row
    assert(e.sql("SHOW GRANTS").collect().isEmpty) // allow-all default
    val ddl = e.sql("SHOW CREATE TABLE orders").collect().head.getString(0)
    assert(ddl.startsWith("CREATE TABLE orders"))
    e.sql("PREPARE din FROM SELECT o_orderkey FROM orders WHERE o_custkey < ? AND o_orderstatus = ?")
    val in = e.sql("DESCRIBE INPUT din").collect()
    assert(in.length == 2 && in.head.getInt(0) == 1)
    val out = e.sql("DESCRIBE OUTPUT din").collect()
    assert(out.length == 1 && out.head.getString(0) == "o_orderkey")
  }

  // AbstractTestQueries testExplainDdl (:4514) — EXPLAIN of a DDL or
  // lifecycle statement returns the statement text (CREATE TABLE/VIEW
  // shorten to the object name); testExplainExecute(:4543)/WithUsing/
  // SetSessionWithUsing — EXPLAIN EXECUTE explains the BOUND statement.
  test("EXPLAIN DDL/lifecycle echoes statement text; EXPLAIN EXECUTE binds") {
    val e = Engine(spark).loadCatalog(sf)
    def plan(q: String): String = e.sql(q).collect().head.getString(0)
    assert(plan("EXPLAIN CREATE TABLE foo (pk bigint)") == "CREATE TABLE foo")
    assert(plan("EXPLAIN CREATE VIEW foo AS SELECT * FROM orders") == "CREATE VIEW foo")
    assert(plan("EXPLAIN DROP TABLE orders") == "DROP TABLE orders")
    assert(plan("EXPLAIN ALTER TABLE orders RENAME TO new_name") ==
      "ALTER TABLE orders RENAME TO new_name")
    assert(plan("EXPLAIN SET SESSION foo = 'bar'") == "SET SESSION foo = 'bar'")
    assert(plan("EXPLAIN PREPARE my_query FROM SELECT * FROM orders") ==
      "PREPARE my_query")
    assert(plan("EXPLAIN DEALLOCATE PREPARE my_query") ==
      "DEALLOCATE PREPARE my_query")
    assert(plan("EXPLAIN RESET SESSION foo") == "RESET SESSION foo")
    assert(plan("EXPLAIN START TRANSACTION") == "START TRANSACTION")
    assert(plan("EXPLAIN COMMIT") == "COMMIT")
    assert(plan("EXPLAIN ROLLBACK") == "ROLLBACK")
    // EXPLAIN (TYPE LOGICAL) EXECUTE explains the bound statement
    e.sql("PREPARE my_query FROM SELECT o_orderkey FROM orders WHERE o_orderkey < ?")
    val bound = plan("EXPLAIN (TYPE LOGICAL) EXECUTE my_query USING 7")
    assert(bound.contains("o_orderkey") && !bound.contains("?"), bound.take(200))
    // a prepared LIFECYCLE statement explains to its bound text
    e.sql("PREPARE set_q FROM SET SESSION foo = ?")
    assert(plan("EXPLAIN (TYPE LOGICAL) EXECUTE set_q USING 7") ==
      "SET SESSION foo = 7")
  }

  // AbstractTestQueries testExecute / testExecuteUsing family (:7530-:7560)
  // — the reference's own prepared statements, VERBATIM.
  test("EXECUTE corpus: literal, parameters in agg/join/filter/having, subquery parameter") {
    val e = Engine(spark).loadCatalog(sf)
    def run(q: String, params: Any*): Seq[Seq[Any]] = {
      e.prepare("my_query", q)
      try e.execute("my_query", params: _*).collect().toSeq.map(_.toSeq)
      finally e.deallocate("my_query")
    }
    // testExecute
    assert(run("SELECT 123, 'abc'") == Seq(Seq(123, "abc")))
    // testExecuteUsing — ? in count(), join bound, filter, having
    assert(run(
      "SELECT a + 1, count(?) FROM (VALUES 1, 2, 3, 2) t1(a) JOIN (VALUES 1, 2, 3, 4) t2(b) ON b < ? WHERE a < ? GROUP BY a + 1 HAVING count(1) > ?",
      1, 5, 4, 0).map(_.map(String.valueOf)).sortBy(_.head) ==
      Seq(Seq("2", "4"), Seq("3", "8"), Seq("4", "4")))
    // testExecuteUsingComplexJoinCriteria
    assert(run("SELECT * FROM (VALUES 1) t(a) JOIN (VALUES 2) u(a) ON t.a + u.a < ?", 5)
      == Seq(Seq(1, 2)))
    // testExecuteUsingWithSubquery — parameter probed through IN
    val sub = run("SELECT ? in (SELECT o_orderkey FROM orders)", 10)
    assert(sub == Seq(Seq(true)))
  }

  test("Engine INSERT INTO appends and re-registers") {
    val e = Engine(spark).loadCatalog(sf)
    val path = java.nio.file.Files.createTempDirectory("graft-ins").toString
    e.ctas("ins_orders", "SELECT * FROM orders WHERE o_orderkey <= 100", path)
    val before = e.sql("SELECT count(*) FROM ins_orders").head.getLong(0)
    val n = e.insertInto("ins_orders",
      "SELECT * FROM orders WHERE o_orderkey > 100 AND o_orderkey <= 200")
    assert(n > 0)
    val after = e.sql("SELECT count(*) FROM ins_orders").head.getLong(0)
    assert(after == before + n)
    intercept[IllegalArgumentException](e.insertInto("orders", "SELECT 1"))
  }

  test("Engine DELETE rewrites the table copy-on-write") {
    val e = Engine(spark).loadCatalog(sf)
    val path = java.nio.file.Files.createTempDirectory("graft-del").toString
    e.ctas("del_orders", "SELECT * FROM orders", path)
    val total = e.sql("SELECT count(*) FROM del_orders").head.getLong(0)
    val toDelete = e.sql(
      "SELECT count(*) FROM del_orders WHERE o_orderstatus = 'F'").head.getLong(0)
    val deleted = e.delete("del_orders", "o_orderstatus = 'F'")
    assert(deleted == toDelete && deleted > 0)
    val remaining = e.sql("SELECT count(*) FROM del_orders").head.getLong(0)
    assert(remaining == total - deleted)
    assert(e.sql(
      "SELECT count(*) FROM del_orders WHERE o_orderstatus = 'F'").head.getLong(0) == 0)
    // the rewrite committed to the original path (re-read from disk)
    val reread = spark.read.parquet(path).count()
    assert(reread == remaining)
    intercept[IllegalArgumentException](e.delete("orders", "true"))
  }

  test("Engine transactions: staged writes apply at COMMIT, vanish on ROLLBACK") {
    val e = Engine(spark).loadCatalog(sf)
    val path = java.nio.file.Files.createTempDirectory("graft-tx").toString
    e.ctas("tx_orders", "SELECT * FROM orders WHERE o_orderkey <= 100", path)
    val base = e.sql("SELECT count(*) FROM tx_orders").head.getLong(0)

    // ROLLBACK discards the staged insert
    e.startTransaction()
    val n1 = e.insertInto("tx_orders",
      "SELECT * FROM orders WHERE o_orderkey > 100 AND o_orderkey <= 150")
    assert(n1 > 0)
    // snapshot visibility: the table is unchanged until commit
    assert(e.sql("SELECT count(*) FROM tx_orders").head.getLong(0) == base)
    e.rollback()
    assert(e.sql("SELECT count(*) FROM tx_orders").head.getLong(0) == base)

    // COMMIT applies insert + delete on different tables in order
    val path2 = java.nio.file.Files.createTempDirectory("graft-tx2").toString
    e.ctas("tx_cust", "SELECT * FROM customer", path2)
    val custBase = e.sql("SELECT count(*) FROM tx_cust").head.getLong(0)
    e.startTransaction()
    val n2 = e.insertInto("tx_orders",
      "SELECT * FROM orders WHERE o_orderkey > 100 AND o_orderkey <= 150")
    val d2 = e.delete("tx_cust", "c_custkey <= 10")
    assert(d2 > 0)
    assert(e.sql("SELECT count(*) FROM tx_orders").head.getLong(0) == base)
    assert(e.sql("SELECT count(*) FROM tx_cust").head.getLong(0) == custBase)
    // one write statement per table per transaction (the reference's
    // hive-connector restriction)
    intercept[IllegalArgumentException](e.delete("tx_orders", "o_orderkey = 1"))
    e.commit()
    assert(e.sql("SELECT count(*) FROM tx_orders").head.getLong(0) == base + n2)
    assert(e.sql("SELECT count(*) FROM tx_cust").head.getLong(0) == custBase - d2)
    // transaction state machine
    intercept[IllegalArgumentException](e.commit())
    intercept[IllegalArgumentException](e.rollback())
  }

  test("Engine SHOW PARTITIONS lists the hive-layout partition tree") {
    val e = Engine(spark).loadCatalog(sf)
    val dir = java.nio.file.Files.createTempDirectory("graft-showpart").toString
    Tables.t(spark, sf, "lineitem")
      .write.mode("overwrite").partitionBy("l_returnflag", "l_linestatus")
      .parquet(dir)
    e.registerTable("li_part", dir)
    val parts = e.showPartitions("li_part").collect()
    assert(parts.nonEmpty)
    assert(e.showPartitions("li_part").columns.toSeq ==
      Seq("l_returnflag", "l_linestatus"))
    // the directory listing matches the data's distinct partition values
    val expect = Tables.t(spark, sf, "lineitem")
      .select("l_returnflag", "l_linestatus").distinct().collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(parts.map(r => (r.getString(0), r.getString(1))).toSet == expect)
    // unpartitioned table → error
    val flat = java.nio.file.Files.createTempDirectory("graft-flat").toString
    e.ctas("flat_nation", "SELECT * FROM nation", flat)
    intercept[IllegalArgumentException](e.showPartitions("flat_nation"))
  }

  test("Engine GRANT/REVOKE/SHOW GRANTS with analysis-time enforcement") {
    val e = Engine(spark).loadCatalog(sf)
    // allow-all default: no identity, no enforcement
    assert(e.sql("SELECT count(*) FROM nation").head.getLong(0) == 25)
    e.accessControl.setIdentity("alice")
    e.accessControl.setEnforcing(true)
    // alice has no grants → denied, including tables inside subqueries
    intercept[SecurityException](e.sql("SELECT count(*) FROM nation"))
    intercept[SecurityException](e.sql(
      "SELECT 1 WHERE EXISTS (SELECT 1 FROM nation)"))
    e.grant(Seq("SELECT"), "nation", "alice")
    assert(e.sql("SELECT count(*) FROM nation").head.getLong(0) == 25)
    // a join still requires grants on BOTH tables
    intercept[SecurityException](e.sql(
      "SELECT count(*) FROM nation JOIN region ON n_regionkey = r_regionkey"))
    e.grant(Seq("ALL"), "region", "alice")
    assert(e.sql(
      "SELECT count(*) FROM nation JOIN region ON n_regionkey = r_regionkey")
      .head.getLong(0) == 25)
    // SHOW GRANTS reflects grant + revoke
    val g = e.showGrants(grantee = Some("alice")).collect()
    assert(g.map(r => (r.getString(1), r.getString(2))).toSet.contains(
      ("nation", "SELECT")))
    assert(g.count(_.getString(1) == "region") == 4) // ALL = 4 privileges
    e.revoke(Seq("SELECT"), "nation", "alice")
    intercept[SecurityException](e.sql("SELECT count(*) FROM nation"))
    // write privileges gate the DML entry points too
    val path = java.nio.file.Files.createTempDirectory("graft-acl").toString
    e.accessControl.setEnforcing(false)
    e.ctas("acl_t", "SELECT * FROM region", path)
    e.accessControl.setEnforcing(true)
    e.grant(Seq("SELECT"), "acl_t", "alice")
    intercept[SecurityException](e.insertInto("acl_t", "SELECT * FROM region"))
    intercept[SecurityException](e.delete("acl_t", "r_regionkey = 0"))
    e.grant(Seq("INSERT", "DELETE"), "acl_t", "alice")
    assert(e.insertInto("acl_t", "SELECT * FROM region") == 5)
    assert(e.delete("acl_t", "r_regionkey = 0") == 2)
    e.accessControl.setEnforcing(false)
    assert(e.sql("SELECT count(*) FROM nation").head.getLong(0) == 25)
  }

  test("column API: set digest, ML, text primitives, geo topology") {
    import org.apache.spark.sql.functions.{col, lit}
    import graft.{functions => F}
    val cust = Tables.t(spark, sf, "customer")
    // set digest round trip through the typed API
    val d = cust.agg(F.make_set_digest(col("c_custkey")).as("d"))
    val card = d.select(F.cardinality(col("d"))).head.getLong(0)
    assert(card == cust.select("c_custkey").distinct().count())
    assert(d.select(F.jaccard_index(col("d"), col("d"))).head.getDouble(0) == 1.0)
    // Gram-sketch regression recovers y = 2x + 1
    val pts = spark.range(0, 100).selectExpr("CAST(id AS DOUBLE) AS x",
      "2.0 * id + 1.0 AS y")
    val model = pts.agg(F.learn_regressor(col("y"), F.features(col("x"))).as("m"))
    val pred = model.select(F.regress(F.features(lit(7.0)), col("m")))
      .head.getDouble(0)
    assert(math.abs(pred - 15.0) < 1e-6)
    // text primitives
    val t = spark.sql("SELECT '  A  b\tC ' AS s")
    assert(t.select(F.normalize_ws(col("s"))).head.getString(0) == "a b c")
    assert(t.select(F.normalized_tokens(col("s"))).head.getSeq[String](0) ==
      Seq("a", "b", "c"))
    assert(t.select(F.word_shingles(F.normalized_tokens(col("s")), 2))
      .head.getSeq[String](0) == Seq("a b", "b c"))
    // geo topology through the typed API
    val sq = "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))"
    val g = spark.sql(s"SELECT 1 AS i")
    assert(g.select(F.st_touches(
      F.st_geometry_from_text(lit(sq)),
      F.st_geometry_from_text(lit("POLYGON ((2 0, 4 0, 4 2, 2 2, 2 0))"))))
      .head.getBoolean(0))
    assert(g.select(F.st_astext(F.st_convex_hull(
      F.st_geometry_from_text(lit("LINESTRING (0 0, 1 3, 2 0)")))))
      .head.getString(0) == "POLYGON ((0 0, 2 0, 1 3, 0 0))")
  }

  test("Engine catalog DDL runs natively: schema, table, view, ALTER, USE") {
    val e = Engine(spark).loadCatalog(sf)
    e.sql("CREATE SCHEMA IF NOT EXISTS graft_ddl")
    assert(e.sql("SHOW SCHEMAS").collect().map(_.getString(0))
      .contains("graft_ddl"))
    e.sql("USE graft_ddl")
    e.sql("CREATE TABLE ddl_t (a BIGINT, b STRING) USING parquet")
    e.sql("INSERT INTO ddl_t VALUES (1, 'x'), (2, 'y')")
    assert(e.sql("SELECT count(*) FROM ddl_t").head.getLong(0) == 2)
    e.sql("ALTER TABLE ddl_t ADD COLUMNS (c DOUBLE)")
    assert(e.sql("DESCRIBE ddl_t").collect().map(_.getString(0))
      .contains("c"))
    e.sql("ALTER TABLE ddl_t RENAME TO ddl_t2")
    assert(e.sql("SELECT count(*) FROM ddl_t2").head.getLong(0) == 2)
    e.sql("CREATE VIEW ddl_v AS SELECT a FROM ddl_t2 WHERE a > 1")
    assert(e.sql("SELECT count(*) FROM ddl_v").head.getLong(0) == 1)
    assert(e.sql("SHOW CREATE TABLE ddl_v").head.getString(0)
      .contains("CREATE VIEW"))
    e.sql("DROP VIEW ddl_v")
    e.sql("DROP TABLE ddl_t2")
    e.sql("USE default")
    e.sql("DROP SCHEMA graft_ddl")
    assert(!e.sql("SHOW SCHEMAS").collect().map(_.getString(0))
      .contains("graft_ddl"))
  }

  test("Engine CALL dispatches registered procedures") {
    val e = Engine(spark).loadCatalog(sf)
    // built-in: system.refresh_table
    e.call("system.refresh_table", "nation")
    // user-registered procedure receives its arguments
    var got: Seq[Any] = Nil
    e.registerProcedure("system.test_proc", args => got = args)
    e.call("SYSTEM.TEST_PROC", "a", 42) // case-insensitive dispatch
    assert(got == Seq("a", 42))
    intercept[IllegalArgumentException](e.call("no.such.proc"))
  }

  test("GraftExtensions injects functions into a fresh session") {
    val active = SparkSession.getActiveSession
    val default = SparkSession.getDefaultSession
    try {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      val s2 = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      val v = s2.sql("SELECT strpos('hello world', 'world')").head.getInt(0)
      assert(v == 7)
      val ws = s2.sql("SELECT word_stem('tables')").head.getString(0)
      assert(ws == "tabl") // snowball porter2
    } finally {
      active.foreach(SparkSession.setActiveSession)
      default.foreach(SparkSession.setDefaultSession)
    }
  }

  // The reference rewrites SHOW STATS / SHOW PARTITIONS / SHOW CREATE into
  // queries (ShowQueriesRewrite/ShowStatsRewrite), so they pass
  // checkCanSelectFromColumns in Analyzer.java — metadata-and-data
  // statements are NOT an access-control bypass.
  test("statement forms respect access control when enforcing") {
    val e = Engine(spark).loadCatalog(sf)
    e.accessControl.setIdentity("mallory")
    e.accessControl.setEnforcing(true)
    try {
      intercept[SecurityException](e.sql("SHOW STATS FOR orders"))
      intercept[SecurityException](e.sql("SHOW STATS FOR (SELECT * FROM orders)"))
      intercept[SecurityException](e.sql("SHOW PARTITIONS FROM orders"))
      intercept[SecurityException](e.sql("SHOW CREATE TABLE orders"))
      e.grant(Seq("SELECT"), "orders", "mallory")
      assert(e.sql("SHOW STATS FOR orders").count() > 0)
      assert(e.sql("SHOW CREATE TABLE orders").head.getString(0)
        .contains("CREATE TABLE"))
    } finally e.accessControl.setEnforcing(false)
  }

  test("EXECUTE raises on parameter-count mismatch in BOTH directions") {
    val e = Engine(spark).loadCatalog(sf)
    e.sql("PREPARE pc FROM SELECT count(*) AS n FROM orders WHERE o_orderkey < ?")
    // too few (existing behavior) and too many (Execute.java raises on both)
    intercept[IllegalArgumentException](e.sql("EXECUTE pc"))
    intercept[IllegalArgumentException](e.sql("EXECUTE pc USING 10, 20"))
    assert(e.sql("EXECUTE pc USING 10").head.getLong(0) > 0)
  }

  // SqlBase.g4:71 SHOW CREATE VIEW, :76 SHOW CATALOGS, :98 SET PATH.
  test("statement forms: SHOW CREATE VIEW / SHOW CATALOGS / SET PATH") {
    val e = Engine(spark).loadCatalog(sf)
    e.createView("scv_v", "SELECT n_name FROM nation WHERE n_regionkey = 1")
    val ddl = e.sql("SHOW CREATE VIEW scv_v")
    assert(ddl.columns.toSeq == Seq("Create View"))
    assert(ddl.head.getString(0).startsWith("CREATE VIEW scv_v AS"))
    assert(ddl.head.getString(0).contains("n_regionkey = 1"))
    // reference distinction: a table is "a table, not a view"; unknown
    // names "do not exist" (ShowQueriesRewrite visitShowCreate)
    val exT = intercept[IllegalArgumentException](e.sql("SHOW CREATE VIEW nation"))
    assert(exT.getMessage.contains("is a table, not a view"))
    val exM = intercept[IllegalArgumentException](e.sql("SHOW CREATE VIEW nope_v"))
    assert(exM.getMessage.contains("does not exist"))
    val cats = e.sql("SHOW CATALOGS")
    assert(cats.columns.toSeq == Seq("Catalog"))
    assert(cats.collect().map(_.getString(0)).contains("spark_catalog"))
    assert(e.sql("SHOW CATALOGS LIKE 'spark%'").count() == 1)
    assert(e.sql("SHOW CATALOGS LIKE 'zzz%'").count() == 0)
    assert(e.sql("SET PATH a.b, c.d").columns.head == "SET PATH")
    assert(e.currentPath.contains("a.b, c.d"))
  }
}
