package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.lit
import graft.{Engine, Q, Tables}

/** The reference's OWN test-query corpus, run VERBATIM.
  *
  * presto-tests/src/main/java/com/facebook/presto/tests/AbstractTestQueries
  * .java is the reference's end-to-end correctness suite (503 tests, each
  * cross-checked against H2 by its own harness). This module runs a curated
  * slice of that corpus — the statements whose grammar Spark parses — with
  * the EXACT original SQL text, against views exposing Presto's
  * tpch-connector column names (unprefixed: orderkey, custkey, …;
  * TpchMetadata.java getColumnHandles lowercases the standard TPC-H names).
  *
  * The fixture parquet is a slimmed TPC-H: columns the fixtures lack
  * (clerk, comment, shipmode, …) are synthesized deterministically from key
  * columns. Every synthesized expression is written in the COMMON dialect
  * subset of Spark SQL and DuckDB, and the same text builds both the Spark
  * view and the DuckDB oracle prelude — so the two engines see identical
  * tables by construction.
  *
  * The corpus text runs untouched on the Spark side (that is the point);
  * output columns are renamed AFTER execution (`toDF`) so the driver's
  * name-sorted hash compare has stable labels, and the oracle mirrors the
  * names/types with explicit casts (DuckDB sums BIGINT into HUGEINT, which
  * pandas renders differently — the cast is representation, not value).
  */
object RefCorpus {

  /** Per-table view columns, Presto names ← fixture names. Shared verbatim
    * between Spark (`CREATE TEMP VIEW`) and DuckDB (oracle WITH-prelude):
    * every expression must stay inside both dialects (STRING / lpad / || /
    * CASE / date+int all are). */
  val viewCols: Map[String, Seq[String]] = Map(
    "orders" -> Seq(
      "o_orderkey AS orderkey",
      "o_custkey AS custkey",
      "o_orderstatus AS orderstatus",
      "o_totalprice AS totalprice",
      "CAST(o_orderdate AS DATE) AS orderdate",
      "o_orderpriority AS orderpriority",
      "'Clerk#' || lpad(CAST(o_custkey % 100 AS STRING), 9, '0') AS clerk",
      "CAST(0 AS INT) AS shippriority",
      "lower(o_orderpriority) AS comment"),
    "lineitem" -> Seq(
      "l_orderkey AS orderkey",
      "l_partkey AS partkey",
      "l_suppkey AS suppkey",
      "l_linenumber AS linenumber",
      "l_quantity AS quantity",
      "l_extendedprice AS extendedprice",
      "l_discount AS discount",
      "l_tax AS tax",
      "l_returnflag AS returnflag",
      "l_linestatus AS linestatus",
      "CAST(l_shipdate AS DATE) AS shipdate",
      "CAST(l_shipdate AS DATE) + CAST(l_orderkey % 30 - 15 AS INT) AS commitdate",
      "CAST(l_shipdate AS DATE) + CAST(l_suppkey % 10 AS INT) AS receiptdate",
      "CASE CAST((l_orderkey + l_linenumber) % 7 AS INT) WHEN 0 THEN 'AIR' WHEN 1 THEN 'FOB' WHEN 2 THEN 'MAIL' WHEN 3 THEN 'RAIL' WHEN 4 THEN 'SHIP' WHEN 5 THEN 'TRUCK' ELSE 'REG AIR' END AS shipmode",
      "CASE CAST(l_suppkey % 4 AS INT) WHEN 0 THEN 'DELIVER IN PERSON' WHEN 1 THEN 'COLLECT COD' WHEN 2 THEN 'NONE' ELSE 'TAKE BACK RETURN' END AS shipinstruct",
      "lower(l_returnflag) || '-' || lower(l_linestatus) AS comment"),
    "customer" -> Seq(
      "c_custkey AS custkey",
      "c_name AS name",
      "c_nationkey AS nationkey",
      "c_acctbal AS acctbal",
      "c_mktsegment AS mktsegment",
      "'addr-' || CAST(c_custkey AS STRING) AS address",
      "'11-' || lpad(CAST(c_custkey % 10000 AS STRING), 4, '0') AS phone",
      "lower(c_mktsegment) AS comment"),
    "nation" -> Seq(
      "n_nationkey AS nationkey",
      "n_name AS name",
      "n_regionkey AS regionkey",
      "lower(n_name) AS comment"),
    "region" -> Seq(
      "r_regionkey AS regionkey",
      "r_name AS name",
      "lower(r_name) AS comment"),
    "part" -> Seq(
      "p_partkey AS partkey",
      "p_name AS name",
      "p_brand AS brand",
      "p_type AS type",
      "p_size AS size",
      "p_retailprice AS retailprice",
      "'Manufacturer#' || CAST(p_partkey % 5 + 1 AS STRING) AS mfgr",
      "CASE CAST(p_partkey % 4 AS INT) WHEN 0 THEN 'SM CASE' WHEN 1 THEN 'MED BOX' WHEN 2 THEN 'LG JAR' ELSE 'JUMBO PKG' END AS container",
      "lower(p_brand) AS comment"),
    "supplier" -> Seq(
      "s_suppkey AS suppkey",
      "s_name AS name",
      "s_nationkey AS nationkey",
      "s_acctbal AS acctbal",
      "'addr-' || CAST(s_suppkey AS STRING) AS address",
      "'22-' || lpad(CAST(s_suppkey % 10000 AS STRING), 4, '0') AS phone",
      "lower(s_name) AS comment"))

  /** Raw hive-style catalog: the product-tests sql-tests cases declared
    * over hive tables use the ORIGINAL TPC-H column names (n_nationkey,
    * l_quantity, …) — presto-product-tests/.../testcases (per-category
    * .sql files with `tables: nation, …` headers). Columns the fixture parquet lacks are
    * synthesized with the same shared-dialect expressions as viewCols,
    * under their raw names. */
  val rawViewCols: Map[String, Seq[String]] = Map(
    "orders" -> Seq(
      "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "CAST(o_orderdate AS DATE) AS o_orderdate", "o_orderpriority",
      "'Clerk#' || lpad(CAST(o_custkey % 100 AS STRING), 9, '0') AS o_clerk",
      "CAST(0 AS INT) AS o_shippriority",
      "lower(o_orderpriority) AS o_comment"),
    "lineitem" -> Seq(
      "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
      "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
      "l_linestatus", "CAST(l_shipdate AS DATE) AS l_shipdate",
      "CAST(l_shipdate AS DATE) + CAST(l_orderkey % 30 - 15 AS INT) AS l_commitdate",
      "CAST(l_shipdate AS DATE) + CAST(l_suppkey % 10 AS INT) AS l_receiptdate",
      "CASE CAST((l_orderkey + l_linenumber) % 7 AS INT) WHEN 0 THEN 'AIR' WHEN 1 THEN 'FOB' WHEN 2 THEN 'MAIL' WHEN 3 THEN 'RAIL' WHEN 4 THEN 'SHIP' WHEN 5 THEN 'TRUCK' ELSE 'REG AIR' END AS l_shipmode",
      "CASE CAST(l_suppkey % 4 AS INT) WHEN 0 THEN 'DELIVER IN PERSON' WHEN 1 THEN 'COLLECT COD' WHEN 2 THEN 'NONE' ELSE 'TAKE BACK RETURN' END AS l_shipinstruct",
      "lower(l_returnflag) || '-' || lower(l_linestatus) AS l_comment"),
    "customer" -> Seq(
      "c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment",
      "'addr-' || CAST(c_custkey AS STRING) AS c_address",
      "'11-' || lpad(CAST(c_custkey % 10000 AS STRING), 4, '0') AS c_phone",
      "lower(c_mktsegment) AS c_comment"),
    "nation" -> Seq(
      "n_nationkey", "n_name", "n_regionkey", "lower(n_name) AS n_comment"),
    "region" -> Seq(
      "r_regionkey", "r_name", "lower(r_name) AS r_comment"),
    "part" -> Seq(
      "p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice",
      "'Manufacturer#' || CAST(p_partkey % 5 + 1 AS STRING) AS p_mfgr",
      "CASE CAST(p_partkey % 4 AS INT) WHEN 0 THEN 'SM CASE' WHEN 1 THEN 'MED BOX' WHEN 2 THEN 'LG JAR' ELSE 'JUMBO PKG' END AS p_container",
      "lower(p_brand) AS p_comment"),
    "supplier" -> Seq(
      "s_suppkey", "s_name", "s_nationkey", "s_acctbal",
      "'addr-' || CAST(s_suppkey AS STRING) AS s_address",
      "'22-' || lpad(CAST(s_suppkey % 10000 AS STRING), 4, '0') AS s_phone",
      "lower(s_name) AS s_comment"))

  /** Synthesized partsupp (the fixture set has no partsupp parquet): the
    * standard TPC-H shape — 4 suppliers per part, deterministic availqty /
    * supplycost from the keys. `tbl` resolves a base-table reference per
    * side (Spark temp view `part_base` vs DuckDB parquet table `part`).
    * The supplier stride 7919 (prime) lands 4 DISTINCT ps_suppkey values
    * for every power-of-ten supplier count. Division-free on purpose:
    * `/` on integers is double division in DuckDB. */
  private def partsuppBody(tbl: String => String): String =
    "SELECT p_partkey AS ps_partkey, " +
      s"CAST((p_partkey + k.i * 7919) % (SELECT count(*) FROM ${tbl("supplier")}) AS BIGINT) AS ps_suppkey, " +
      "CAST((p_partkey * 7 + k.i * 11) % 9999 + 1 AS INT) AS ps_availqty, " +
      "CAST((p_partkey * 13 + k.i * 17) % 100000 AS DOUBLE) / 100 AS ps_supplycost, " +
      "lower(p_brand) || '-' || CAST(k.i AS STRING) AS ps_comment " +
      s"FROM ${tbl("part")} CROSS JOIN (VALUES (0), (1), (2), (3)) AS k(i)"

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), Engine]()

  /** Engine whose catalog is the Presto-named views (isolated session — the
    * unprefixed names must not collide with the fixture views other query
    * modules register). */
  def engine(parent: SparkSession, dir: String): Engine =
    cache.computeIfAbsent((parent, dir), { _ =>
      val e = Engine(parent)
      viewCols.foreach { case (name, cols) =>
        Tables.t(e.spark, dir, name).createOrReplaceTempView(name + "_base")
        e.spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW $name AS SELECT " +
          cols.mkString(", ") + s" FROM ${name}_base")
      }
      // The reference wires test PLUGIN functions into its runner
      // (CustomAdd.java scalar, CustomSum.java aggregate, CustomRank.java
      // window — the §2.11 UDF surface); scalars/aggregates go through
      // Spark's udf registry, the window plugin through
      // WindowPlugins.register (RankLike expression under a SQL name).
      graft.functions.WindowPlugins.registerDefaults(e.spark)
      e.spark.udf.register("custom_add", (a: Long, b: Long) => a + b)
      e.spark.udf.register("custom_sum",
        org.apache.spark.sql.functions.udaf(
          new org.apache.spark.sql.expressions.Aggregator[Long, Long, Long] {
            def zero: Long = 0L
            def reduce(b: Long, a: Long): Long = b + a
            def merge(b1: Long, b2: Long): Long = b1 + b2
            def finish(r: Long): Long = r
            def bufferEncoder = org.apache.spark.sql.Encoders.scalaLong
            def outputEncoder = org.apache.spark.sql.Encoders.scalaLong
          }))
      e
    })

  private val rawCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), Engine]()

  /** Engine whose catalog is the raw hive-named views (+ synthesized
    * partsupp), isolated from the Presto-named engine. */
  def rawEngine(parent: SparkSession, dir: String): Engine =
    rawCache.computeIfAbsent((parent, dir), { _ =>
      val e = Engine(parent)
      rawViewCols.foreach { case (name, cols) =>
        Tables.t(e.spark, dir, name).createOrReplaceTempView(name + "_base")
        e.spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW $name AS SELECT " +
          cols.mkString(", ") + s" FROM ${name}_base")
      }
      e.spark.sql("CREATE OR REPLACE TEMPORARY VIEW partsupp AS " +
        partsuppBody(_ + "_base"))
      e
    })

  private val tableNames = viewCols.keys.mkString("|")
  private val rawTableNames = (rawViewCols.keys ++ Seq("partsupp")).mkString("|")

  /** DuckDB mirror of a verbatim corpus statement: prefix the view
    * definitions as CTEs under ref_* names (a CTE cannot shadow the base
    * table it reads from) and repoint the corpus text's table references.
    * Matching runs on the literal MASK, so a table-name word inside a
    * string literal (`LIKE '%orders%'`) or quoted identifier is left
    * untouched in the rewritten body. */
  def oracleize(sql: String): String = oracleizeWith(sql, raw = false)

  def oracleizeRaw(sql: String): String = oracleizeWith(sql, raw = true)

  private def oracleizeWith(sql: String, raw: Boolean): String = {
    val mask = graft.PrestoSql.maskLiterals(sql)
    // case-insensitive: Presto identifiers fold (SELECT ORDERKEY FROM
    // ORDERS is the lowercase table); DuckDB folds too, so ref_ORDERS
    // resolves to the ref_orders CTE
    val pat = s"(?i)\\b(${if (raw) rawTableNames else tableNames})\\b".r
    val matches = pat.findAllMatchIn(mask).toSeq
    if (matches.isEmpty) return sql
    val referenced = matches.map(_.group(1).toLowerCase(java.util.Locale.ROOT)).distinct
    val prelude = referenced.map { t =>
      val body =
        if (t == "partsupp") partsuppBody(identity)
        else s"SELECT ${(if (raw) rawViewCols else viewCols)(t).mkString(", ")} FROM $t"
      s"ref_$t AS ($body)"
    }.mkString(", ")
    val body = {
      val sb = new StringBuilder
      var last = 0
      matches.foreach { mm =>
        sb.append(sql.substring(last, mm.start)).append("ref_")
          .append(sql.substring(mm.start, mm.end))
        last = mm.end
      }
      sb.append(sql.substring(last)).toString
    }
    // a body that opens its own WITH merges into the prelude's CTE list
    if (body.trim.toUpperCase.startsWith("WITH"))
      s"WITH $prelude, ${body.trim.drop(4).trim}"
    else s"WITH $prelude $body"
  }

  /** One verbatim statement; `oracleCols` are DuckDB select-exprs over the
    * positionally-aliased subquery t(c1..cN) producing the same
    * names/representations as the renamed Spark result. */
  private def one(sql: String, cols: Seq[String], oracleCols: Seq[String],
      oracleSql: String = null): Q =
    Q((s, d) => engine(s, d).sql(sql).toDF(cols: _*),
      Some(s"SELECT ${oracleCols.mkString(", ")} FROM " +
        s"(${oracleize(Option(oracleSql).getOrElse(sql))}) " +
        s"t(${(1 to cols.length).map("c" + _).mkString(", ")})"))

  /** As `one`, but the result is gated on a SUBSET of its columns (`keep`).
    * Used when a verbatim `ORDER BY k LIMIT n` has TIES at the cut: the
    * multiset of sort-key column values in the top-n is deterministic, but
    * which tied ROW is taken differs per engine — so only the sort-key
    * columns are hash-compared (the full statement still executes). */
  private def oneProj(sql: String, cols: Seq[String], keep: Seq[String],
      oracleCols: Seq[String], oracleSql: String = null): Q =
    Q((s, d) => engine(s, d).sql(sql).toDF(cols: _*)
        .select(keep.head, keep.tail: _*),
      Some(s"SELECT ${oracleCols.mkString(", ")} FROM " +
        s"(${oracleize(Option(oracleSql).getOrElse(sql))}) " +
        s"t(${(1 to cols.length).map("c" + _).mkString(", ")})"))

  /** A batch of verbatim statements with an identical output schema,
    * unioned under a case tag. The tag column is attached OUTSIDE the SQL
    * text on the Spark side, so the statements stay untouched. A case may
    * carry an oracle override (third element) when the verbatim text needs
    * a DuckDB spelling (e.g. rand() → a constant with the same value). */
  private def batchCols(cols: Seq[String], oracleCols: Seq[String],
      cases: Seq[Product], sparkCast: Map[String, String] = Map.empty,
      raw: Boolean = false): Q = {
    val cs = cases.map {
      case (tag: String, sql: String) => (tag, sql, sql)
      case (tag: String, sql: String, oracle: String) => (tag, sql, oracle)
    }
    Q((s, d) => cs.map { case (tag, sql, _) =>
        val eng = if (raw) rawEngine(s, d) else engine(s, d)
        val base = eng.sql(sql).toDF(cols: _*)
        val cast = sparkCast.foldLeft(base) { case (df, (c, t)) =>
          df.withColumn(c, df.col(c).cast(t)) }
        cast.withColumn("tag", lit(tag))
      }.reduce(_ unionAll _),
      Some(cs.map { case (tag, _, oracle) =>
        s"SELECT ${oracleCols.mkString(", ")}, '$tag' AS tag FROM " +
          s"(${oracleizeWith(oracle, raw)}) t(${(1 to cols.length).map("c" + _).mkString(", ")})"
      }.mkString(" UNION ALL ")))
  }

  /** Single-column BIGINT batch (the corpus's COUNT(*)/SUM shapes). */
  private def batch(cases: Seq[Product]): Q =
    batchCols(Seq("n"), Seq("CAST(c1 AS BIGINT) AS n"), cases)

  val queries: Map[String, Q] = Map(

    // AbstractTestQueries.java:763 testComplexQuery — agg + HAVING +
    // row_number + ORDER BY DESC + LIMIT in one statement.
    "r01_ref_complex" -> one(
      "SELECT sum(orderkey), row_number() OVER (ORDER BY orderkey) FROM orders WHERE orderkey <= 10 GROUP BY orderkey HAVING sum(orderkey) >= 3 ORDER BY orderkey DESC LIMIT 3",
      Seq("sum_okey", "rn"),
      Seq("CAST(c1 AS BIGINT) AS sum_okey", "CAST(c2 AS BIGINT) AS rn")),

    // AbstractTestQueries.java:1845 testNonEqualityJoin — equi-join with
    // every flavor of non-equi / NOT / LIKE / NULL residual condition.
    "r02_ref_nonequality_join" -> batch(Seq(
      "n01" -> "SELECT COUNT(*) FROM lineitem JOIN orders ON lineitem.orderkey = orders.orderkey AND lineitem.quantity + length(orders.comment) > 7",
      "n02" -> "SELECT COUNT(*) FROM lineitem JOIN orders ON lineitem.orderkey = orders.orderkey AND NOT lineitem.quantity > 2",
      "n03" -> "SELECT COUNT(*) FROM lineitem JOIN orders ON NOT NOT lineitem.orderkey = orders.orderkey AND NOT NOT lineitem.quantity > 2",
      "n04" -> "SELECT COUNT(*) FROM lineitem JOIN orders ON lineitem.orderkey = orders.orderkey AND NOT NOT NOT lineitem.quantity > 2",
      "n05" -> "SELECT COUNT(*) FROM lineitem JOIN orders ON lineitem.orderkey = orders.orderkey AND lineitem.quantity <= 2",
      "n06" -> "SELECT COUNT(*) FROM lineitem JOIN orders ON lineitem.orderkey = orders.orderkey AND lineitem.quantity != 2",
      "n07" -> "SELECT COUNT(*) FROM lineitem JOIN orders ON lineitem.orderkey = orders.orderkey AND lineitem.shipdate > orders.orderdate",
      "n08" -> "SELECT COUNT(*) FROM lineitem JOIN orders ON lineitem.orderkey = orders.orderkey AND orders.comment LIKE '%forges%'",
      "n09" -> "SELECT COUNT(*) FROM lineitem JOIN orders ON lineitem.orderkey = orders.orderkey AND orders.comment LIKE lineitem.comment",
      "n10" -> "SELECT COUNT(*) FROM lineitem JOIN orders ON lineitem.orderkey = orders.orderkey AND NOT (orders.comment LIKE lineitem.comment)",
      "n11" -> "SELECT COUNT(*) FROM lineitem JOIN orders ON lineitem.orderkey = orders.orderkey AND NULL")),

    // AbstractTestQueries.java:1878 testNonEqualityLeftJoin — left joins
    // whose residual rejects matches, probed through IS NULL.
    "r03_ref_left_join" -> batch(Seq(
      "l01" -> "SELECT COUNT(*) FROM lineitem LEFT OUTER JOIN orders ON lineitem.orderkey = orders.orderkey AND orders.custkey > 1000 WHERE orders.orderkey IS NULL",
      "l02" -> "SELECT COUNT(*) FROM lineitem LEFT OUTER JOIN orders ON lineitem.orderkey = orders.orderkey AND orders.custkey > 1000.0 WHERE orders.orderkey IS NULL",
      "l03" -> "SELECT COUNT(*) FROM lineitem LEFT OUTER JOIN orders ON lineitem.orderkey = orders.orderkey AND orders.custkey > orders.totalprice WHERE orders.orderkey IS NULL",
      "l04" -> "SELECT COUNT(*) FROM lineitem LEFT OUTER JOIN orders ON lineitem.orderkey = orders.orderkey AND orders.custkey > lineitem.quantity WHERE orders.orderkey IS NULL",
      "l05" -> "SELECT COUNT(*) FROM lineitem LEFT OUTER JOIN orders ON lineitem.orderkey = orders.orderkey AND lineitem.quantity > 5 WHERE orders.orderkey IS NULL")),

    // AbstractTestQueries.java:3222 testHaving2 (exact integer aggregate).
    "r04_ref_having" -> one(
      "SELECT custkey, sum(orderkey) FROM orders GROUP BY custkey HAVING sum(orderkey) > 400000",
      Seq("custkey", "sum_okey"),
      Seq("c1 AS custkey", "CAST(c2 AS BIGINT) AS sum_okey")),

    // AbstractTestQueries.java:820 testDistinctHaving — COUNT(DISTINCT) in
    // both the projection and the HAVING predicate.
    "r05_ref_distinct_having" -> one(
      "SELECT COUNT(DISTINCT clerk) AS count FROM orders GROUP BY orderdate HAVING COUNT(DISTINCT clerk) > 1",
      Seq("count"),
      Seq("CAST(c1 AS BIGINT) AS count")),

    // AbstractTestQueries.java:798 testDistinctJoin — DISTINCT aggregate
    // over a join, grouped by the probe side.
    "r06_ref_distinct_join" -> one(
      "SELECT COUNT(DISTINCT CAST(b.quantity AS BIGINT)), a.orderstatus FROM orders a JOIN lineitem b ON a.orderkey = b.orderkey GROUP BY a.orderstatus",
      Seq("cnt", "orderstatus"),
      Seq("CAST(c1 AS BIGINT) AS cnt", "c2 AS orderstatus")),

    // AbstractTestQueries.java:786 testJoinWithMultiFieldGroupBy.
    "r07_ref_join_multifield" -> one(
      "SELECT orderstatus FROM lineitem JOIN (SELECT DISTINCT orderkey, orderstatus FROM orders) T on lineitem.orderkey = T.orderkey",
      Seq("orderstatus"),
      Seq("c1 AS orderstatus")),

    // AbstractTestQueries.java:777 testWhereNull — a filter stack that
    // leaves TRUE-with-null-flag on the stack (empty result by semantics).
    "r08_ref_where_null" -> one(
      "SELECT custkey FROM orders WHERE custkey = custkey AND CAST(nullif(custkey, custkey) AS boolean) AND CAST(nullif(custkey, custkey) AS boolean)",
      Seq("custkey"),
      Seq("c1 AS custkey")),

    // AbstractTestQueries.java:1185 testRollupOverUnion (integer sums).
    "r09_ref_rollup_union" -> one(
      "SELECT orderstatus, sum(orderkey)\nFROM (SELECT orderkey, orderstatus\n      FROM orders\n      UNION ALL\n      SELECT orderkey, orderstatus\n      FROM orders) x\nGROUP BY ROLLUP (orderstatus)",
      Seq("orderstatus", "sum_okey"),
      Seq("c1 AS orderstatus", "CAST(c2 AS BIGINT) AS sum_okey")),

    // AbstractTestQueries.java:4255 testIn — IN-list over table data,
    // including a non-foldable element (rand()<0 keeps it non-constant).
    "r10_ref_in" -> Q(
      (s, d) => Seq(
        "i1" -> "SELECT orderkey FROM orders WHERE orderkey IN (1, 2, 3)",
        "i2" -> "SELECT orderkey FROM orders WHERE totalprice IN (1, 2, 3)",
        "i3" -> "SELECT orderkey FROM orders WHERE orderkey IN (1 + CAST(rand() < 0 AS bigint), 2 + CAST(rand() < 0 AS bigint), 4)")
        .map { case (tag, sql) =>
          engine(s, d).sql(sql).toDF("orderkey").withColumn("tag", lit(tag)) }
        .reduce(_ unionAll _),
      Some(Seq(
        ("i1", "SELECT orderkey FROM orders WHERE orderkey IN (1, 2, 3)"),
        ("i2", "SELECT orderkey FROM orders WHERE totalprice IN (1, 2, 3)"),
        ("i3", "SELECT orderkey FROM orders WHERE orderkey IN (1, 2, 4)"))
        .map { case (tag, sql) =>
          s"SELECT c1 AS orderkey, '$tag' AS tag FROM (${oracleize(sql)}) t(c1)" }
        .mkString(" UNION ALL "))),

    // AbstractTestQueries.java:3242 testJoinWithGroupByAsProbe.
    "r11_ref_groupby_probe" -> one(
      "SELECT   b.orderkey,   b.custkey,   a.custkey FROM (   SELECT custkey  FROM orders   GROUP BY custkey) a JOIN orders b   ON a.custkey = b.custkey ",
      Seq("orderkey", "custkey_b", "custkey_a"),
      Seq("c1 AS orderkey", "c2 AS custkey_b", "c3 AS custkey_a")),

    // AbstractTestQueries.java:873-885 testOrderByLimit /
    // testOrderByExpressionWithLimit (orderkey DESC is a total order).
    "r12_ref_orderby_limit" -> one(
      "SELECT custkey, orderstatus FROM orders ORDER BY orderkey + 1 DESC LIMIT 10",
      Seq("custkey", "orderstatus"),
      Seq("c1 AS custkey", "c2 AS orderstatus")),

    // AbstractTestQueries.java:1349 testIntersect.
    "r13_ref_intersect" -> batch(Seq(
      "i1" -> "SELECT regionkey FROM nation WHERE nationkey < 7 INTERSECT SELECT regionkey FROM nation WHERE nationkey > 21",
      "i2" -> "SELECT regionkey FROM nation WHERE nationkey < 7 INTERSECT DISTINCT SELECT regionkey FROM nation WHERE nationkey > 21",
      "i3" -> "WITH wnation AS (SELECT nationkey, regionkey FROM nation) SELECT regionkey FROM wnation WHERE nationkey < 7 INTERSECT SELECT regionkey FROM wnation WHERE nationkey > 21",
      "i4" -> "SELECT num FROM (SELECT 1 AS num FROM nation WHERE nationkey=10 INTERSECT SELECT 1 FROM nation WHERE nationkey=20) T",
      "i5" -> "SELECT regionkey FROM (SELECT regionkey FROM nation WHERE nationkey < 7 INTERSECT SELECT regionkey FROM nation WHERE nationkey > 21) UNION SELECT 4",
      "i6" -> "SELECT regionkey FROM (SELECT regionkey FROM nation WHERE nationkey < 7 UNION SELECT regionkey FROM nation WHERE nationkey > 21) INTERSECT SELECT 1",
      "i7" -> "SELECT regionkey FROM (SELECT regionkey FROM nation WHERE nationkey < 7 INTERSECT SELECT regionkey FROM nation WHERE nationkey > 21) UNION ALL SELECT 3",
      "i8" -> "SELECT 100 INTERSECT (SELECT regionkey FROM nation WHERE nationkey <10)")),

    // AbstractTestQueries.java:1412 testExcept.
    "r14_ref_except" -> batch(Seq(
      "e1" -> "SELECT regionkey FROM nation WHERE nationkey < 7 EXCEPT SELECT regionkey FROM nation WHERE nationkey > 21",
      "e2" -> "SELECT regionkey FROM nation WHERE nationkey < 7 EXCEPT DISTINCT SELECT regionkey FROM nation WHERE nationkey > 21",
      "e3" -> "WITH wnation AS (SELECT nationkey, regionkey FROM nation) SELECT regionkey FROM wnation WHERE nationkey < 7 EXCEPT SELECT regionkey FROM wnation WHERE nationkey > 21",
      "e4" -> "SELECT num FROM (SELECT 1 AS num FROM nation WHERE nationkey=10 EXCEPT SELECT 2 FROM nation WHERE nationkey=20) T",
      "e5" -> "SELECT regionkey FROM (SELECT regionkey FROM nation WHERE nationkey < 7 EXCEPT SELECT regionkey FROM nation WHERE nationkey > 21) UNION SELECT 3",
      "e6" -> "SELECT regionkey FROM (SELECT regionkey FROM nation WHERE nationkey < 7 UNION SELECT regionkey FROM nation WHERE nationkey > 21) EXCEPT SELECT 1",
      ("e7", "(SELECT * FROM (VALUES 1) EXCEPT SELECT * FROM (VALUES 0)) EXCEPT (SELECT * FROM (VALUES 1) EXCEPT SELECT * FROM (VALUES 1))",
        // DuckDB's VALUES rows need parentheses
        "(SELECT * FROM (VALUES (1)) EXCEPT SELECT * FROM (VALUES (0))) EXCEPT (SELECT * FROM (VALUES (1)) EXCEPT SELECT * FROM (VALUES (1)))"),
      "e8" -> "SELECT 0 EXCEPT (SELECT regionkey FROM nation WHERE nationkey <10)")),

    // AbstractTestQueries.java:1395/1458 testIntersectWithAggregation /
    // testExceptWithAggregation (single-column aggregate shapes).
    "r15_ref_setop_agg" -> batch(Seq(
      "a1" -> "SELECT COUNT(*) FROM nation INTERSECT SELECT COUNT(regionkey) FROM nation HAVING SUM(regionkey) IS NOT NULL",
      "a2" -> "SELECT COUNT(*) * 2 FROM nation INTERSECT (SELECT SUM(nationkey) FROM nation GROUP BY regionkey ORDER BY 1 LIMIT 2)",
      "a3" -> "SELECT COUNT(a) FROM (SELECT nationkey AS a FROM (SELECT nationkey FROM nation INTERSECT SELECT regionkey FROM nation) n1 INTERSECT SELECT regionkey FROM nation) n2",
      "a4" -> "SELECT COUNT(*) FROM (SELECT nationkey FROM nation INTERSECT SELECT 2) n1 INTERSECT SELECT regionkey FROM nation",
      "a5" -> "SELECT COUNT(*) FROM nation EXCEPT SELECT COUNT(regionkey) FROM nation WHERE regionkey < 3 HAVING SUM(regionkey) IS NOT NULL",
      "a6" -> "(SELECT SUM(nationkey) FROM nation GROUP BY regionkey ORDER BY 1 LIMIT 2) EXCEPT SELECT COUNT(*) * 2 FROM nation",
      "a7" -> "SELECT COUNT(a) FROM (SELECT nationkey AS a FROM (SELECT nationkey FROM nation EXCEPT SELECT regionkey FROM nation) n1 EXCEPT SELECT regionkey FROM nation) n2",
      "a8" -> "SELECT COUNT(*) FROM (SELECT nationkey FROM nation EXCEPT SELECT 10) n1 EXCEPT SELECT regionkey FROM nation")),

    // AbstractTestQueries.java:636 testArrays — ARRAY constructors +
    // Presto's 1-based subscript over table data (DuckDB subscripts are
    // 1-based natively, so the verbatim text is its own oracle; cardinality
    // and rand() take DuckDB spellings).
    "r16_ref_arrays" -> batchCols(Seq("v"), Seq("CAST(c1 AS BIGINT) AS v"), Seq(
      ("a1", "SELECT a[1] FROM (SELECT ARRAY[orderkey] AS a FROM orders ORDER BY orderkey) t"),
      ("a2", "SELECT a[1 + CAST(round(rand()) AS BIGINT)] FROM (SELECT ARRAY[orderkey, orderkey] AS a FROM orders ORDER BY orderkey) t",
             "SELECT a[1] FROM (SELECT ARRAY[orderkey, orderkey] AS a FROM orders ORDER BY orderkey) t"),
      ("a3", "SELECT a[1] + 1 FROM (SELECT ARRAY[orderkey] AS a FROM orders ORDER BY orderkey) t"),
      ("a4", "SELECT a[1] FROM (SELECT ARRAY[orderkey + 1] AS a FROM orders ORDER BY orderkey) t"),
      ("a5", "SELECT a[1][1] FROM (SELECT ARRAY[ARRAY[orderkey + 1]] AS a FROM orders ORDER BY orderkey) t"),
      ("a6", "SELECT CARDINALITY(a) FROM (SELECT ARRAY[orderkey, orderkey + 1] AS a FROM orders ORDER BY orderkey) t",
             "SELECT len(a) FROM (SELECT ARRAY[orderkey, orderkey + 1] AS a FROM orders ORDER BY orderkey) t"))),

    // AbstractTestQueries.java:5050-5224 testUnion family (single-column).
    "r17_ref_union" -> batch(Seq(
      "u1" -> "SELECT orderkey FROM orders UNION SELECT custkey FROM orders",
      "u2" -> "SELECT 123 UNION DISTINCT SELECT 123 UNION ALL SELECT 123",
      "u3" -> "SELECT orderkey FROM orders UNION DISTINCT SELECT custkey FROM orders",
      "u4" -> "SELECT orderkey FROM orders UNION ALL SELECT custkey FROM orders",
      "u5" -> "SELECT orderkey FROM orders UNION ALL SELECT 123 UNION ALL (SELECT custkey FROM orders GROUP BY custkey)",
      "u6" -> "SELECT count(*) FROM (SELECT 1 FROM nation GROUP BY regionkey UNION ALL SELECT 1 FROM (   SELECT 1 FROM nation    UNION ALL    SELECT 1 FROM nation))",
      "u7" -> "SELECT count(*) FROM (SELECT 1 FROM (   SELECT 1 FROM nation    UNION ALL    SELECT 1 FROM nation)UNION ALL SELECT 1 FROM nation GROUP BY regionkey)")),

    // AbstractTestQueries.java:5238 testUnionWithJoinOnNonTranslateableSymbols
    // (join keys computed from a union's output; VARCHAR cast shim).
    "r18_ref_union_join" -> one(
      "SELECT *\nFROM (SELECT orderdate ds, orderkey\n      FROM orders\n      UNION ALL\n      SELECT shipdate ds, orderkey\n      FROM lineitem) a\nJOIN orders o\nON (substr(cast(a.ds AS VARCHAR), 6, 2) = substr(cast(o.orderdate AS VARCHAR), 6, 2) AND a.orderkey = o.orderkey)",
      Seq("ds", "okey", "orderkey", "custkey", "orderstatus", "totalprice",
        "orderdate", "orderpriority", "clerk", "shippriority", "comment"),
      Seq("c1 AS ds", "c2 AS okey", "c3 AS orderkey", "c4 AS custkey",
        "c5 AS orderstatus", "c6 AS totalprice", "c7 AS orderdate",
        "c8 AS orderpriority", "c9 AS clerk", "c10 AS shippriority",
        "c11 AS comment")),

    // AbstractTestQueries.java:3443 testRowNumberSpecialFilters — impossible
    // row_number predicates must plan and return empty.
    "r19_ref_rownumber_empty" -> batchCols(
      Seq("a", "rn"), Seq("c1 AS a", "CAST(c2 AS BIGINT) AS rn"), Seq(
      "f1" -> "SELECT * FROM (   SELECT a, row_number() OVER (PARTITION BY a ORDER BY a) rn\n   FROM (VALUES (1), (1), (1), (2), (2), (3)) t (a)) t WHERE rn = -1",
      "f2" -> "SELECT * FROM (   SELECT a, row_number() OVER (PARTITION BY a ORDER BY a) rn\n   FROM (VALUES (1), (1), (1), (2), (2), (3)) t (a)) t WHERE rn <= -1",
      "f3" -> "SELECT * FROM (   SELECT a, row_number() OVER (PARTITION BY a ORDER BY a) rn\n   FROM (VALUES (1), (1), (1), (2), (2), (3)) t (a)) t WHERE rn = 0",
      "f4" -> "SELECT * FROM (   SELECT a, row_number() OVER (PARTITION BY a) rn\n   FROM (VALUES (1), (1), (1), (2), (2), (3)) t (a)) t WHERE rn = -1",
      "f5" -> "SELECT * FROM (   SELECT a, row_number() OVER (PARTITION BY a) rn\n   FROM (VALUES (1), (1), (1), (2), (2), (3)) t (a)) t WHERE rn <= -1",
      "f6" -> "SELECT * FROM (   SELECT a, row_number() OVER (PARTITION BY a) rn\n   FROM (VALUES (1), (1), (1), (2), (2), (3)) t (a)) t WHERE rn = 0")),

    // AbstractTestQueries.java:5031 testUnionWithProjectionPushDown.
    "r20_ref_union_pushdown" -> one(
      "SELECT key + 5, status FROM (SELECT orderkey key, orderstatus status FROM orders UNION ALL SELECT orderkey key, linestatus status FROM lineitem)",
      Seq("key5", "status"),
      Seq("CAST(c1 AS BIGINT) AS key5", "c2 AS status"),
      // `key` is reserved in DuckDB — the oracle aliases it k
      oracleSql = "SELECT k + 5, status FROM (SELECT orderkey k, orderstatus status FROM orders UNION ALL SELECT orderkey k, linestatus status FROM lineitem)"),

    // AbstractTestAggregations.java:36-130 — the count-under-predicate
    // family (NULLIF/COALESCE/AND/OR/NOT/inline-view/nested shapes).
    "r21_ref_agg_counts" -> batch(Seq(
      "c01" -> "SELECT COUNT(true) FROM orders",
      "c02" -> "SELECT COUNT(*) FROM lineitem WHERE tax < discount",
      "c03" -> "SELECT COUNT(*) FROM lineitem WHERE NOT tax < discount",
      "c04" -> "SELECT COUNT(*) FROM lineitem WHERE NULL",
      "c05" -> "SELECT COUNT(*) FROM orders WHERE NULLIF(orderstatus, 'F') IS NULL",
      "c06" -> "SELECT COUNT(*) FROM orders WHERE NULLIF(orderstatus, 'F') IS NOT NULL",
      "c07" -> "SELECT COUNT(*) FROM orders WHERE NULLIF(orderstatus, 'F') = orderstatus ",
      "c08" -> "SELECT COUNT(*) FROM orders WHERE COALESCE(NULLIF(orderstatus, 'F'), 'bar') = 'bar'",
      "c09" -> "SELECT COUNT(*) FROM lineitem WHERE tax < discount AND tax > 0.01 AND discount < 0.05",
      "c10" -> "SELECT COUNT(*) FROM lineitem WHERE tax < 0.01 OR discount > 0.05",
      "c11" -> "SELECT COUNT(*) FROM (SELECT orderkey FROM lineitem) x",
      "c12" -> "SELECT COUNT(*) FROM (SELECT orderkey, COUNT(*) FROM lineitem GROUP BY orderkey) x",
      "c13" -> "SELECT COUNT(DISTINCT custkey + 1) FROM orders",
      "c14" -> "SELECT COUNT(DISTINCT clerk) FROM orders WHERE LENGTH(clerk) > 5",
      "c15" -> "SELECT count(1) FILTER (WHERE orderstatus = 'O') FROM orders")),

    // AbstractTestAggregations.java:200/217 — the single-distinct and
    // extract-distinct optimizer shapes (MarkDistinct in the reference).
    "r22_ref_distinct_opt" -> one(
      "SELECT custkey, orderstatus, COUNT(DISTINCT orderkey), SUM(DISTINCT orderkey) FROM orders GROUP BY custkey, orderstatus",
      Seq("custkey", "orderstatus", "cnt_d", "sum_d"),
      Seq("c1 AS custkey", "c2 AS orderstatus", "CAST(c3 AS BIGINT) AS cnt_d",
        "CAST(c4 AS BIGINT) AS sum_d")),
    "r23_ref_extract_distinct" -> one(
      "SELECT max(orderstatus), COUNT(orderkey), sum(DISTINCT orderkey) FROM orders",
      Seq("max_st", "cnt", "sum_d"),
      Seq("c1 AS max_st", "CAST(c2 AS BIGINT) AS cnt", "CAST(c3 AS BIGINT) AS sum_d")),

    // AbstractTestQueries.java:455 testRowFieldAccessorInJoin — a row-typed
    // VALUES side joined to a table (the oracle unwraps the struct: same
    // rows, plain columns).
    "r24_ref_row_join" -> one(
      "SELECT t.a.col1, custkey, orderkey FROM (VALUES ROW(CAST(ROW(1, 11) AS ROW(col0 integer, col1 integer))), ROW(CAST(ROW(2, 22) AS ROW(col0 integer, col1 integer))), ROW(CAST(ROW(3, 33) AS ROW(col0 integer, col1 integer)))) t(a) INNER JOIN orders ON t.a.col0 = orders.orderkey",
      Seq("col1", "custkey", "orderkey"),
      Seq("c1 AS col1", "c2 AS custkey", "c3 AS orderkey"),
      oracleSql = "SELECT v.col1, custkey, orderkey FROM (VALUES (1, 11), (2, 22), (3, 33)) v(col0, col1) INNER JOIN orders ON v.col0 = orders.orderkey"),

    // AbstractTestQueries.java:5498 testSemiJoin /
    // :5901 testExistsSubquery / :5808 testScalarSubquery — the
    // uncorrelated-subquery count shapes.
    "r25_ref_subquery_counts" -> batch(Seq(
      "s01" -> "SELECT COUNT(*) FROM lineitem WHERE EXISTS(SELECT max(orderkey) FROM orders)",
      "s02" -> "SELECT COUNT(*) FROM lineitem WHERE NOT EXISTS(SELECT max(orderkey) FROM orders)",
      "s03" -> "SELECT COUNT(*) FROM lineitem WHERE NOT EXISTS(SELECT orderkey FROM orders WHERE false)",
      "s04" -> "SELECT COUNT(*) FROM lineitem WHERE EXISTS(SELECT orderkey FROM orders WHERE false)",
      "s05" -> "SELECT COUNT(*) FROM lineitem WHERE (SELECT min(orderkey) FROM orders)<(SELECT max(orderkey) FROM orders)",
      "s06" -> "SELECT COUNT(*) FROM lineitem WHERE (EXISTS(SELECT min(orderkey) FROM orders))=(NOT EXISTS(SELECT orderkey FROM orders WHERE false))",
      "s07" -> "SELECT DISTINCT orderkey FROM lineitem WHERE EXISTS(SELECT avg(orderkey) FROM orders)",
      "s08" -> "SELECT DISTINCT orderkey FROM lineitem WHERE orderkey BETWEEN   (SELECT avg(orderkey) FROM orders) - 10    AND   (SELECT avg(orderkey) FROM orders) + 10")),

    // AbstractTestQueries.java:5498 testSemiJoin — HAVING with an IN
    // subquery over the grouped aggregate.
    "r26_ref_semijoin_having" -> one(
      "SELECT linenumber, min(orderkey) FROM lineitem GROUP BY linenumber HAVING min(orderkey) IN (SELECT orderkey FROM orders WHERE orderkey > 1)",
      Seq("linenumber", "min_okey"),
      Seq("c1 AS linenumber", "CAST(c2 AS BIGINT) AS min_okey")),

    // AbstractTestQueries.java:5498 testSemiJoin — IN-subquery predicates in
    // projection, join condition, WHERE and ORDER BY of one statement.
    "r27_ref_in_everywhere" -> one(
      "SELECT orderkey\n  IN (\n    SELECT orderkey\n    FROM lineitem\n    WHERE partkey % 4 = 0),\n  SUM(\n    CASE\n      WHEN orderkey\n        IN (\n          SELECT orderkey\n          FROM lineitem\n          WHERE suppkey % 4 = 0)\n      THEN 1\n      ELSE 0\n      END)\nFROM orders\nGROUP BY orderkey\n  IN (\n    SELECT orderkey\n    FROM lineitem\n    WHERE partkey % 4 = 0)\nHAVING SUM(\n  CASE\n    WHEN orderkey\n      IN (\n        SELECT orderkey\n        FROM lineitem\n        WHERE suppkey % 4 = 0)\n      THEN 1\n      ELSE 0\n      END) > 1",
      Seq("in_p", "sum_s"),
      Seq("c1 AS in_p", "CAST(c2 AS BIGINT) AS sum_s")),

    // AbstractTestQueries.java:4921 testTry — TRY over invalid casts and
    // function arguments on table data (oracle = the reference's own
    // H2-equivalent spellings).
    "r29_ref_try" -> one(
      "SELECT TRY(CAST(IF(round(totalprice) % 2 = 0, CAST(totalprice AS VARCHAR), '^&$' || CAST(totalprice AS VARCHAR)) AS DOUBLE)) FROM orders",
      Seq("v"), Seq("c1 AS v"),
      oracleSql = "SELECT CASE WHEN round(totalprice) % 2 = 0 THEN totalprice ELSE null END FROM orders"),
    "r30_ref_try_counts" -> batchCols(Seq("n"), Seq("CAST(c1 AS BIGINT) AS n"), Seq(
      ("y1", "SELECT COUNT(TRY(to_base(100, CAST(round(totalprice/100) AS BIGINT)))) FROM orders",
             "SELECT SUM(CASE WHEN CAST(round(totalprice/100) AS BIGINT) BETWEEN 2 AND 36 THEN 1 ELSE 0 END) FROM orders"),
      ("y2", "SELECT COUNT(CAST(orderkey AS VARCHAR) || TRY(to_base(100, CAST(round(totalprice/100) AS BIGINT)))) FROM orders",
             "SELECT SUM(CASE WHEN CAST(round(totalprice/100) AS BIGINT) BETWEEN 2 AND 36 THEN 1 ELSE 0 END) FROM orders"))),

    // AbstractTestQueries.java:4130/4141 testWithChaining / testWithSelfJoin.
    "r31_ref_with" -> batch(Seq(
      "w1" -> "WITH a AS (SELECT orderkey n FROM orders)\n, b AS (SELECT n + 1 n FROM a)\n, c AS (SELECT n + 1 n FROM b)\nSELECT n + 1 FROM c",
      "w2" -> "WITH x AS (SELECT DISTINCT orderkey FROM orders ORDER BY orderkey LIMIT 10)\nSELECT count(*) FROM x a JOIN x b USING (orderkey)")),

    // AbstractTestQueries.java:3941 testValueWindowFunctions (first_value /
    // nth_value with an explicit frame; DuckDB runs the verbatim text).
    "r32_ref_value_windows" -> one(
      "SELECT * FROM (   SELECT orderkey, orderstatus     , first_value(orderkey + 1000) OVER (PARTITION BY orderstatus ORDER BY orderkey) fvalue     , nth_value(orderkey + 1000, 2) OVER (PARTITION BY orderstatus ORDER BY orderkey         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) nvalue     FROM (SELECT * FROM orders ORDER BY orderkey LIMIT 10) x   ) x ORDER BY orderkey LIMIT 5",
      Seq("orderkey", "orderstatus", "fvalue", "nvalue"),
      Seq("c1 AS orderkey", "c2 AS orderstatus", "CAST(c3 AS BIGINT) AS fvalue",
        "CAST(c4 AS BIGINT) AS nvalue")),

    // AbstractTestQueries.java:4005 testCast over table data (Presto's
    // rounding double->integral cast is the semantic under test; DuckDB
    // rounds the same way).
    "r33_ref_casts" -> batchCols(Seq("v"), Seq("CAST(c1 AS DOUBLE) AS v"), Seq(
      // DuckDB CAST banker-rounds halves; Presto's double->integral cast is
      // Math.round = floor(x + 0.5), which the oracle replays explicitly.
      ("k1", "SELECT CAST(totalprice AS BIGINT) FROM orders",
             "SELECT floor(totalprice + 0.5) FROM orders"),
      "k2" -> "SELECT CAST(orderkey AS DOUBLE) FROM orders",
      ("k4", "SELECT try_cast(totalprice AS BIGINT) FROM orders",
             "SELECT floor(totalprice + 0.5) FROM orders"),
      "k5" -> "SELECT try_cast(clerk AS BIGINT) FROM orders",
      "k7" -> "SELECT try_cast(try_cast(orderkey AS VARCHAR) AS BIGINT) FROM orders",
      "k8" -> "SELECT coalesce(try_cast(clerk AS BIGINT), 456) FROM orders"),
      sparkCast = Map("v" -> "double")),
    "r34_ref_casts_varchar" -> batchCols(Seq("v"), Seq("c1 AS v"), Seq(
      "k3" -> "SELECT CAST(orderkey AS VARCHAR) FROM orders",
      "k6" -> "SELECT try_cast(orderkey * orderkey AS VARCHAR) FROM orders")),

    // AbstractTestQueries.java:6068/6103 correlated scalar subqueries
    // (DuckDB decorrelates the same shapes, so the verbatim text is its own
    // oracle).
    "r35_ref_correlated" -> batchCols(Seq("v"), Seq("CAST(c1 AS STRING) AS v"), Seq(
      "x1" -> "SELECT (SELECT n.nationkey) FROM nation n",
      "x2" -> "SELECT (SELECT 2 * n.nationkey) FROM nation n",
      "x3" -> "SELECT nationkey FROM nation n WHERE 2 = (SELECT 2 * n.nationkey)",
      "x4" -> "SELECT 1 FROM nation n WHERE 2 * nationkey - 1  = (SELECT * FROM (SELECT n.nationkey))",
      "x5" -> "SELECT name FROM nation n WHERE 'AFRICA' = (SELECT name FROM region WHERE regionkey = n.regionkey)",
      "x6" -> "SELECT nationkey FROM nation n WHERE (SELECT regionkey * 2 FROM (SELECT regionkey FROM region r WHERE n.regionkey = r.regionkey)) > 6 ORDER BY 1 LIMIT 3",
      ("x7", "SELECT (SELECT name FROM nation WHERE nationkey = a) FROM (VALUES 1, 1, 2, 3) t(a)",
             "SELECT (SELECT name FROM nation WHERE nationkey = a) FROM (VALUES (1), (1), (2), (3)) t(a)"),
      ("x8", "SELECT (SELECT name FROM nation WHERE nationkey = a) FROM (VALUES 31) t(a)",
             "SELECT (SELECT name FROM nation WHERE nationkey = a) FROM (VALUES (31)) t(a)"),
      ("x9", "SELECT (SELECT r.name FROM nation n, region r WHERE r.regionkey = n.regionkey AND n.nationkey = a) FROM (VALUES 1) t(a)",
             "SELECT (SELECT r.name FROM nation n, region r WHERE r.regionkey = n.regionkey AND n.nationkey = a) FROM (VALUES (1)) t(a)"),
      "xa" -> "SELECT (SELECT 2 WHERE o.orderkey = 1) FROM orders o ORDER BY orderkey LIMIT 5"),
      sparkCast = Map("v" -> "string")),

    // AbstractTestQueries.java:6553-6700 the predicate-pushdown family —
    // outer joins narrowed by WHERE, pushdown through unions/limits.
    "r36_ref_pushdown" -> batch(Seq(
      "p1" -> "SELECT COUNT(*)\nFROM lineitem \nJOIN (\n  SELECT * FROM orders\n) orders \nON lineitem.orderkey = orders.orderkey \nWHERE orders.orderkey % 4 = 0\n  AND lineitem.suppkey > orders.orderkey",
      "p2" -> "SELECT COUNT(*)\nFROM lineitem \nLEFT JOIN (\n  SELECT * FROM orders WHERE orders.orderkey % 2 = 0\n) orders \nON lineitem.orderkey = orders.orderkey \nWHERE orders.orderkey % 4 = 0\n  AND (lineitem.suppkey % 2 = orders.orderkey % 2 OR orders.custkey IS NULL)",
      "p3" -> "SELECT COUNT(*)\nFROM lineitem \nLEFT JOIN (\n  SELECT * FROM orders WHERE orders.orderkey % 2 = 0\n) orders \nON lineitem.orderkey = orders.orderkey \nWHERE lineitem.orderkey % 4 = 0\n  AND (lineitem.suppkey % 2 = orders.orderkey % 2 OR orders.orderkey IS NULL)",
      "p4" -> "SELECT COUNT(*)\nFROM lineitem \nLEFT JOIN (\n  SELECT * FROM orders WHERE orders.orderkey % 2 = 0\n) orders \nON lineitem.orderkey = orders.orderkey \nWHERE orders.orderkey = orders.orderkey\n  AND lineitem.orderkey % 4 = 0\n  AND (lineitem.suppkey % 2 = orders.orderkey % 2 OR orders.orderkey IS NULL)",
      "p5" -> "SELECT count(*)\nFROM orders a\nLEFT OUTER JOIN orders b\n  ON a.clerk = b.clerk\nWHERE a.orderpriority='5-LOW'\n  AND b.orderpriority='1-URGENT'\n  AND b.clerk is null\n  AND a.orderkey % 4 = 0\n",
      "p6" -> "SELECT COUNT(*)\nFROM (\n  SELECT * FROM orders WHERE orders.orderkey % 2 = 0\n) orders\nRIGHT JOIN lineitem\nON lineitem.orderkey = orders.orderkey \nWHERE orders.orderkey % 4 = 0\n  AND (lineitem.suppkey % 2 = orders.orderkey % 2 OR orders.custkey IS NULL)")),
    "r37_ref_pushdown_union" -> one(
      "SELECT *\nFROM (\n  SELECT orderkey+1 AS a FROM orders WHERE orderstatus = 'F' UNION ALL \n  SELECT orderkey FROM orders WHERE orderkey % 2 = 0 UNION ALL \n  (SELECT orderkey+custkey FROM orders ORDER BY orderkey LIMIT 10)\n) \nWHERE a < 20 OR a > 100 \nORDER BY a",
      Seq("a"), Seq("CAST(c1 AS BIGINT) AS a")),

    // AbstractTestQueries.java:6320-6446 correlated IN / EXISTS predicates.
    "r38_ref_correlated_exists" -> batch(Seq(
      "e1" -> "SELECT count(*) FROM orders o WHERE EXISTS(SELECT o.orderkey)",
      "e2" -> "SELECT count(*) FROM customer WHERE NOT EXISTS(SELECT * FROM orders WHERE orders.custkey=customer.custkey)",
      "e3" -> "SELECT count(*) FROM orders o WHERE EXISTS (SELECT avg(l.orderkey) FROM lineitem l WHERE o.orderkey = l.orderkey)",
      "e4" -> "SELECT count(*) FROM orders o WHERE EXISTS (SELECT avg(l.orderkey) FROM lineitem l WHERE o.orderkey = l.orderkey GROUP BY l.linenumber)",
      "e5" -> "SELECT count(*) FROM orders o WHERE EXISTS(SELECT 1 WHERE o.orderkey = 0)",
      "e6" -> "SELECT orderkey FROM orders o WHERE clerk IN (SELECT clerk FROM orders s WHERE s.custkey = o.custkey AND s.orderkey < o.orderkey)")),
    "r39_ref_correlated_in_proj" -> one(
      "SELECT orderkey, clerk IN (SELECT clerk FROM orders s WHERE s.custkey = o.custkey AND s.orderkey < o.orderkey) FROM orders o",
      Seq("orderkey", "has_prior"),
      Seq("c1 AS orderkey", "c2 AS has_prior")),

    // AbstractTestQueries.java:5639-5792 semi-join null handling — an
    // uncorrelated IN-subquery projected as a value keeps three-valued
    // logic through unions/aggregations on the build side.
    "r40_ref_semijoin_nulls" -> batchCols(Seq("v"), Seq("CAST(c1 AS STRING) AS v"), Seq(
      "s1" -> "SELECT orderkey\n  IN (\n    SELECT CASE WHEN orderkey % 3 = 0 THEN NULL ELSE orderkey END\n    FROM lineitem)\nFROM orders",
      "s2" -> "SELECT orderkey\n  IN (\n    SELECT orderkey\n    FROM lineitem)\nFROM (\n  SELECT CASE WHEN orderkey % 3 = 0 THEN NULL ELSE orderkey END AS orderkey\n  FROM orders)",
      "s3" -> "SELECT orderkey\n  IN (\n    SELECT CASE WHEN orderkey % 3 = 0 THEN NULL ELSE orderkey END\n    FROM lineitem)\nFROM (\n  SELECT CASE WHEN orderkey % 4 = 0 THEN NULL ELSE orderkey END AS orderkey\n  FROM orders)",
      "s4" -> "SELECT orderkey\n  IN (\n    SELECT CASE WHEN orderkey % 500 = 0 THEN NULL ELSE orderkey END\n    FROM orders\n    WHERE orderkey % 200 = 0\n    UNION ALL\n    SELECT CASE WHEN orderkey % 600 = 0 THEN NULL ELSE orderkey END\n    FROM orders\n    WHERE orderkey % 300 = 0\n  )\nFROM (\n  SELECT orderkey\n  FROM lineitem\n  WHERE orderkey % 100 = 0)",
      "s5" -> "SELECT orderkey\n  IN (\n    SELECT CASE WHEN orderkey % 10 = 0 THEN NULL ELSE orderkey END\n    FROM lineitem\n    WHERE orderkey % 2 = 0\n    GROUP BY orderkey\n  )\nFROM (\n  SELECT orderkey\n  FROM orders\n  WHERE orderkey % 3 = 0)",
      "s6" -> "SELECT orderkey\n  IN (\n    SELECT orderkey\n    FROM (\n      SELECT CASE WHEN orderkey % 500 = 0 THEN NULL ELSE orderkey END AS orderkey\n      FROM orders\n      WHERE orderkey % 200 = 0\n      UNION ALL\n      SELECT CASE WHEN orderkey % 600 = 0 THEN NULL ELSE orderkey END AS orderkey\n      FROM orders\n      WHERE orderkey % 300 = 0\n    )\n    GROUP BY orderkey\n  )\nFROM (\n  SELECT orderkey\n  FROM lineitem\n  WHERE orderkey % 100 = 0)",
      ("s7", "WITH empty AS (SELECT 1 WHERE FALSE) SELECT 3 FROM (VALUES 1) WHERE NULL IN (SELECT * FROM empty)",
        "WITH empty AS (SELECT 1 WHERE FALSE) SELECT 3 FROM (VALUES (1)) WHERE NULL IN (SELECT * FROM empty)")),
      sparkCast = Map("v" -> "string")),

    // AbstractTestQueries.java:5670 testSemiJoinWithGroupBy — the same and
    // different IN-subqueries across projection, GROUP BY and HAVING.
    "r41_ref_semijoin_groupby" -> batchCols(
      Seq("linenumber", "min_okey", "flag"),
      Seq("c1 AS linenumber", "CAST(c2 AS BIGINT) AS min_okey", "c3 AS flag"), Seq(
      // (an uncorrelated IN-subquery is CONSTANT per query, so grouping by
      // it is a no-op — the DuckDB oracle drops it from GROUP BY, which
      // that binder cannot hold a subquery in)
      "g1" -> "SELECT linenumber, min(orderkey), 6 IN (SELECT orderkey FROM orders WHERE orderkey < 7)FROM lineitem GROUP BY linenumber",
      ("g2", "SELECT linenumber, min(orderkey), 6 IN (SELECT orderkey FROM orders WHERE orderkey < 7)FROM lineitem GROUP BY linenumber, 6 IN (SELECT orderkey FROM orders WHERE orderkey < 7)",
             "SELECT linenumber, min(orderkey), 6 IN (SELECT orderkey FROM orders WHERE orderkey < 7)FROM lineitem GROUP BY linenumber"),
      ("g5", "SELECT linenumber, min(orderkey), 6 IN (SELECT orderkey FROM orders WHERE orderkey < 7)FROM lineitem GROUP BY linenumber, 6 IN (SELECT orderkey FROM orders WHERE orderkey < 7)HAVING 6 IN (SELECT orderkey FROM orders WHERE orderkey < 7)",
             "SELECT linenumber, min(orderkey), 6 IN (SELECT orderkey FROM orders WHERE orderkey < 7)FROM lineitem GROUP BY linenumber HAVING 6 IN (SELECT orderkey FROM orders WHERE orderkey < 7)"),
      ("g6", "SELECT linenumber, min(orderkey), 6 IN (SELECT max(orderkey) FROM orders WHERE orderkey < 7)FROM lineitem GROUP BY linenumber, 6 IN (SELECT sum(orderkey) FROM orders WHERE orderkey < 5)",
             "SELECT linenumber, min(orderkey), 6 IN (SELECT max(orderkey) FROM orders WHERE orderkey < 7)FROM lineitem GROUP BY linenumber"),
      ("g8", "SELECT linenumber, min(orderkey), 6 IN (SELECT orderkey FROM orders WHERE orderkey < 7)FROM lineitem GROUP BY linenumber, 6 IN (SELECT orderkey FROM orders WHERE orderkey < 5)HAVING 6 IN (SELECT orderkey FROM orders WHERE orderkey > 3)",
             "SELECT linenumber, min(orderkey), 6 IN (SELECT orderkey FROM orders WHERE orderkey < 7)FROM lineitem GROUP BY linenumber HAVING 6 IN (SELECT orderkey FROM orders WHERE orderkey > 3)"))),
    "r42_ref_semijoin_having" -> batchCols(
      Seq("linenumber", "min_okey"),
      Seq("c1 AS linenumber", "CAST(c2 AS BIGINT) AS min_okey"), Seq(
      ("g3", "SELECT linenumber, min(orderkey) FROM lineitem GROUP BY linenumber, 6 IN (SELECT orderkey FROM orders WHERE orderkey < 7)",
             "SELECT linenumber, min(orderkey) FROM lineitem GROUP BY linenumber"),
      "g4" -> "SELECT linenumber, min(orderkey) FROM lineitem GROUP BY linenumber HAVING 6 IN (SELECT orderkey FROM orders WHERE orderkey < 7)",
      ("g7", "SELECT linenumber, min(orderkey) FROM lineitem GROUP BY linenumber, 6 IN (SELECT orderkey FROM orders WHERE orderkey < 7)HAVING 6 IN (SELECT orderkey FROM orders WHERE orderkey > 3)",
             "SELECT linenumber, min(orderkey) FROM lineitem GROUP BY linenumber HAVING 6 IN (SELECT orderkey FROM orders WHERE orderkey > 3)"),
      // AbstractTestQueries.java:6026 testExistsSubqueryWithGroupBy HAVING
      "g9" -> "SELECT linenumber, min(orderkey) FROM lineitem GROUP BY linenumber HAVING EXISTS(SELECT orderkey FROM orders WHERE orderkey < 7)")),

    // AbstractTestQueries.java:5974/6026 scalar-subquery and EXISTS with
    // GROUP BY (constant subqueries in grouping keys dropped in the DuckDB
    // oracle, as in r41).
    "r43_ref_scalar_groupby" -> batchCols(
      Seq("linenumber", "agg_okey", "scalar"),
      Seq("c1 AS linenumber", "CAST(c2 AS BIGINT) AS agg_okey",
        "CAST(c3 AS BIGINT) AS scalar"), Seq(
      "q1" -> "SELECT linenumber, min(orderkey), (SELECT max(orderkey) FROM orders WHERE orderkey < 7)FROM lineitem GROUP BY linenumber",
      ("q2", "SELECT linenumber, min(orderkey), (SELECT max(orderkey) FROM orders WHERE orderkey < 7)FROM lineitem GROUP BY linenumber, (SELECT max(orderkey) FROM orders WHERE orderkey < 7)",
             "SELECT linenumber, min(orderkey), (SELECT max(orderkey) FROM orders WHERE orderkey < 7)FROM lineitem GROUP BY linenumber"),
      ("q3", "SELECT linenumber, min(orderkey), (SELECT max(orderkey) FROM orders WHERE orderkey < 7)FROM lineitem GROUP BY linenumber, (SELECT max(orderkey) FROM orders WHERE orderkey < 7)HAVING min(orderkey) < (SELECT max(orderkey) FROM orders WHERE orderkey < 7)",
             "SELECT linenumber, min(orderkey), (SELECT max(orderkey) FROM orders WHERE orderkey < 7)FROM lineitem GROUP BY linenumber HAVING min(orderkey) < (SELECT max(orderkey) FROM orders WHERE orderkey < 7)"),
      ("q4", "SELECT linenumber, min(orderkey), (SELECT max(orderkey) FROM orders WHERE orderkey < 7)FROM lineitem GROUP BY linenumber, (SELECT sum(orderkey) FROM orders WHERE orderkey < 7)",
             "SELECT linenumber, min(orderkey), (SELECT max(orderkey) FROM orders WHERE orderkey < 7)FROM lineitem GROUP BY linenumber"),
      "q5" -> "SELECT linenumber, max(orderkey), (SELECT min(orderkey) FROM orders WHERE orderkey < 5)FROM lineitem GROUP BY linenumber HAVING sum(orderkey) > (SELECT min(orderkey) FROM orders WHERE orderkey < 7)")),
    "r44_ref_exists_groupby" -> batchCols(
      Seq("linenumber", "agg_okey", "flag"),
      Seq("c1 AS linenumber", "CAST(c2 AS BIGINT) AS agg_okey", "c3 AS flag"), Seq(
      "x1" -> "SELECT linenumber, min(orderkey), EXISTS(SELECT orderkey FROM orders WHERE orderkey < 7)FROM lineitem GROUP BY linenumber",
      ("x2", "SELECT linenumber, min(orderkey), EXISTS(SELECT orderkey FROM orders WHERE orderkey < 7)FROM lineitem GROUP BY linenumber, EXISTS(SELECT orderkey FROM orders WHERE orderkey < 7)",
             "SELECT linenumber, min(orderkey), EXISTS(SELECT orderkey FROM orders WHERE orderkey < 7)FROM lineitem GROUP BY linenumber"),
      ("x4", "SELECT linenumber, min(orderkey), EXISTS(SELECT orderkey FROM orders WHERE orderkey < 17)FROM lineitem GROUP BY linenumber, EXISTS(SELECT orderkey FROM orders WHERE orderkey < 17)HAVING EXISTS(SELECT orderkey FROM orders WHERE orderkey < 27)",
             "SELECT linenumber, min(orderkey), EXISTS(SELECT orderkey FROM orders WHERE orderkey < 17)FROM lineitem GROUP BY linenumber HAVING EXISTS(SELECT orderkey FROM orders WHERE orderkey < 27)"),
      "x5" -> "SELECT linenumber, max(orderkey), EXISTS(SELECT orderkey FROM orders WHERE orderkey < 5)FROM lineitem GROUP BY linenumber HAVING EXISTS(SELECT orderkey FROM orders WHERE orderkey < 7)")),

    // AbstractTestQueries.java:6016 testOutputInEnforceSingleRow.
    "r45_ref_single_row" -> batch(Seq(
      "o1" -> "SELECT count(*) FROM (SELECT (SELECT 1))",
      "o2" -> "SELECT * FROM (SELECT (SELECT 1))")),

    // AbstractTestQueries.java:6234 correlated scalar subqueries with scalar
    // aggregation — non-equality correlation under avg(), consecutive
    // correlated aggregates.
    // (the corpus's ORDER BY / join-condition positions for correlated
    // scalar aggregates are Spark-unsupported — documented divergence)
    "r46_ref_correlated_agg" -> batch(Seq(
      "a1" -> "SELECT count(*) FROM orders o WHERE (SELECT avg(i.orderkey) FROM orders i WHERE o.orderkey < i.orderkey AND i.orderkey % 10000 = 0) > 100")),
    "r47_ref_consecutive_correlated" -> one(
      "SELECT (SELECT avg(regionkey)  FROM nation n2 WHERE n2.nationkey = n1.nationkey),(SELECT avg(regionkey)+1  FROM nation n3  WHERE n3.nationkey = n1.nationkey)FROM nation n1",
      Seq("avg1", "avg2"),
      Seq("c1 AS avg1", "c2 AS avg2")),

    // AbstractTestQueries.java:3169 testDependentWindows — two adjacent
    // window nodes, the second over the first's output.
    "r48_ref_dependent_windows" -> one(
      "WITH t1 AS (SELECT extendedprice FROM lineitem ORDER BY orderkey, partkey LIMIT 2),t2 AS (SELECT extendedprice, sum(extendedprice) OVER() AS x FROM t1),t3 AS (SELECT max(x) OVER() FROM t2) SELECT * FROM t3",
      Seq("v"), Seq("c1 AS v")),

    // AbstractTestAggregations.java:315-500 — repeated group keys, BETWEEN
    // group expressions, aggregation below outer joins over set ops.
    "r49_ref_agg_shapes" -> batch(Seq(
      "h1" -> "SELECT sum(custkey) FROM orders GROUP BY orderstatus, orderstatus",
      "h2" -> "SELECT count(*) FROM (SELECT orderstatus a, orderstatus b FROM orders) GROUP BY a, b",
      "h3" -> "SELECT CAST(orderkey BETWEEN 1 AND 100 AS BIGINT) FROM orders GROUP BY orderkey",
      "h4" -> "SELECT CAST(50 BETWEEN orderkey AND 100 AS BIGINT) FROM orders GROUP BY orderkey",
      "h5" -> "SELECT CAST(50 BETWEEN 1 AND orderkey AS BIGINT) FROM orders GROUP BY orderkey",
      "h6" -> "SELECT max(nationkey) FROM (SELECT regionkey FROM region EXCEPT SELECT regionkey FROM region WHERE regionkey < 4) AS r1 LEFT JOIN nation ON r1.regionkey = nation.regionkey GROUP BY r1.regionkey",
      ("h7", "SELECT max(nationkey) FROM (VALUES CAST (1 AS BIGINT)) v1(col1) LEFT JOIN nation ON v1.col1 = nation.regionkey GROUP BY v1.col1",
             "SELECT max(nationkey) FROM (VALUES (CAST (1 AS BIGINT))) v1(col1) LEFT JOIN nation ON v1.col1 = nation.regionkey GROUP BY v1.col1"))),
    "r50_ref_agg_outer_join" -> one(
      "SELECT max(name), min(name), count(nationkey) + 1, count(nationkey) FROM (SELECT DISTINCT regionkey FROM region) AS r1 LEFT JOIN nation ON r1.regionkey = nation.regionkey GROUP BY r1.regionkey HAVING sum(nationkey) < 20",
      Seq("max_n", "min_n", "cnt1", "cnt"),
      Seq("c1 AS max_n", "c2 AS min_n", "CAST(c3 AS BIGINT) AS cnt1", "CAST(c4 AS BIGINT) AS cnt")),
    "r51_ref_nested_agg" -> one(
      "SELECT sum(custkey), max(orderstatus), min(c) FROM (SELECT orderstatus, custkey, COUNT(*) c FROM orders GROUP BY orderstatus, custkey) T",
      Seq("sum_ck", "max_st", "min_c"),
      Seq("CAST(c1 AS BIGINT) AS sum_ck", "c2 AS max_st", "CAST(c3 AS BIGINT) AS min_c")),
    "r52_ref_correlated_avg_filter" -> one(
      "SELECT * FROM nation n1 WHERE (n1.nationkey > ( SELECT avg(nationkey) FROM nation n2 WHERE n1.regionkey=n2.regionkey))",
      Seq("nationkey", "name", "regionkey", "comment"),
      Seq("c1 AS nationkey", "c2 AS name", "c3 AS regionkey", "c4 AS comment")),

    // AbstractTestQueries.java:1624-1844 simple-join family — constant
    // equalities, coercion joins, double-clause overlaps, self joins.
    "r53_ref_join_family" -> batch(Seq(
      "j01" -> "SELECT COUNT(*) FROM lineitem JOIN orders ON lineitem.orderkey = orders.orderkey",
      "j02" -> "SELECT COUNT(*) FROM lineitem JOIN orders ON lineitem.orderkey = 2",
      "j03" -> "SELECT COUNT(*) FROM lineitem JOIN orders ON orders.orderkey = 2",
      "j04" -> "SELECT COUNT(*) FROM lineitem JOIN orders ON lineitem.orderkey = orders.orderkey AND orders.orderkey = 2",
      "j05" -> "SELECT COUNT(*) FROM lineitem JOIN orders ON lineitem.orderkey = orders.orderkey AND lineitem.orderkey = 2",
      "j06" -> "SELECT COUNT(*) FROM lineitem JOIN orders ON lineitem.orderkey = orders.orderkey AND lineitem.orderkey = orders.custkey",
      "j07" -> "SELECT COUNT(*) FROM lineitem JOIN orders ON lineitem.orderkey = orders.orderkey AND orders.orderkey = lineitem.partkey",
      "j08" -> "SELECT COUNT(*) FROM lineitem JOIN orders ON lineitem.orderkey = orders.orderkey AND 123 = 123",
      "j09" -> "SELECT SUM(custkey) FROM lineitem JOIN orders ON lineitem.orderkey = CAST(orders.orderkey AS BIGINT)",
      "j10" -> "SELECT COUNT(*) FROM nation a JOIN nation b on not ((a.nationkey + b.nationkey) <> b.nationkey)",
      "j11" -> "SELECT COUNT(*) FROM nation a JOIN nation b on not (a.nationkey <> b.nationkey)",
      "j12" -> "SELECT COUNT(*) FROM orders a JOIN orders b on a.orderkey = b.orderkey")),

    // AbstractTestQueries.java:2481-2511 filtered joins + predicate motion.
    "r54_ref_filtered_joins" -> batchCols(
      Seq("custkey", "linestatus", "tax", "totalprice", "orderstatus"),
      Seq("c1 AS custkey", "c2 AS linestatus", "c3 AS tax", "c4 AS totalprice",
        "c5 AS orderstatus"), Seq(
      "f1" -> "SELECT custkey, linestatus, tax, totalprice, orderstatus FROM (SELECT * FROM lineitem WHERE orderkey % 2 = 0) a JOIN orders ON a.orderkey = orders.orderkey",
      "f2" -> "SELECT custkey, linestatus, tax, totalprice, orderstatus FROM lineitem JOIN (SELECT *  FROM orders WHERE orderkey % 2 = 0) a ON lineitem.orderkey = a.orderkey")),
    "r55_ref_join_move_around" -> batch(Seq(
      "m1" -> "SELECT COUNT(*) FROM lineitem JOIN orders ON orders.custkey = 1 AND lineitem.orderkey = 1",
      "m2" -> "SELECT COUNT(*)\nFROM (SELECT * FROM lineitem WHERE orderkey % 16 = 0 AND partkey % 2 = 0) lineitem\nJOIN (SELECT * FROM orders WHERE orderkey % 16 = 0 AND custkey % 2 = 0) orders\nON lineitem.orderkey % 8 = orders.orderkey % 8 AND lineitem.linenumber % 2 = 0\nWHERE orders.custkey % 8 < 7 AND orders.custkey % 8 = lineitem.orderkey % 8 AND lineitem.suppkey % 7 > orders.custkey % 7")),

    // AbstractTestQueries.java:5304 testTableQuery — the TABLE statement.
    "r56_ref_table" -> one(
      "TABLE orders",
      Seq("orderkey", "custkey", "orderstatus", "totalprice", "orderdate",
        "orderpriority", "clerk", "shippriority", "comment"),
      Seq("c1 AS orderkey", "c2 AS custkey", "c3 AS orderstatus",
        "c4 AS totalprice", "c5 AS orderdate", "c6 AS orderpriority",
        "c7 AS clerk", "c8 AS shippriority", "c9 AS comment"),
      oracleSql = "SELECT * FROM orders"),

    // AbstractTestQueries.java:972-996 / 4352-4400 LIMIT 0/ALL,
    // case-insensitive references, parenthesized query bodies.
    "r57_ref_limits_case" -> batchCols(
      Seq("custkey", "totalprice"),
      Seq("c1 AS custkey", "c2 AS totalprice"), Seq(
      "l1" -> "SELECT custkey, totalprice FROM orders LIMIT 0",
      "l2" -> "SELECT custkey, totalprice FROM orders LIMIT ALL",
      "l3" -> "SELECT custkey, totalprice FROM orders ORDER BY orderkey LIMIT 0",
      "l4" -> "SELECT custkey, totalprice FROM orders ORDER BY orderkey LIMIT ALL")),
    "r58_ref_case_insensitive" -> batchCols(Seq("v"), Seq("CAST(c1 AS BIGINT) AS v"), Seq(
      "c1" -> "SELECT orderkey X FROM orders ORDER BY x",
      "c2" -> "SELECT x FROM (SELECT orderkey X FROM orders)"),
      sparkCast = Map("v" -> "bigint")),
    "r59_ref_subquery_body" -> one(
      "(SELECT orderkey, custkey FROM orders ORDER BY custkey) ORDER BY orderkey",
      Seq("orderkey", "custkey"),
      Seq("c1 AS orderkey", "c2 AS custkey"),
      // DuckDB rejects the double-ORDER BY body form; the inner ordering is
      // superseded by the outer one anyway
      oracleSql = "(SELECT orderkey, custkey FROM orders) ORDER BY orderkey"),

    // AbstractTestAggregations.java:464-646 — GROUP BY over CASE/CAST/
    // COALESCE/NULLIF expressions, whole-expression and operand forms.
    "r60_ref_groupby_case" -> batchCols(
      Seq("k", "cnt"), Seq("c1 AS k", "CAST(c2 AS BIGINT) AS cnt"), Seq(
      "c01" -> "SELECT CASE WHEN orderstatus = 'O' THEN 'a' ELSE 'b' END, count(*)\nFROM orders\nGROUP BY CASE WHEN orderstatus = 'O' THEN 'a' ELSE 'b' END",
      "c02" -> "SELECT CASE WHEN orderstatus = 'O' THEN 'a' END, count(*)\nFROM orders\nGROUP BY CASE WHEN orderstatus = 'O' THEN 'a' END",
      "c03" -> "SELECT CASE WHEN true THEN orderstatus END, count(*)\nFROM orders\nGROUP BY orderstatus",
      "c04" -> "SELECT CASE orderstatus WHEN 'O' THEN 'a' ELSE 'b' END, count(*)\nFROM orders\nGROUP BY CASE orderstatus WHEN 'O' THEN 'a' ELSE 'b' END",
      "c05" -> "SELECT CASE orderstatus WHEN 'O' THEN 'a' ELSE 'b' END, count(*)\nFROM orders\nGROUP BY orderstatus",
      "c06" -> "SELECT CASE 'O' WHEN orderstatus THEN 'a' ELSE 'b' END, count(*)\nFROM orders\nGROUP BY orderstatus",
      "c07" -> "SELECT CASE 1 WHEN 1 THEN orderstatus ELSE 'x' END, count(*)\nFROM orders\nGROUP BY orderstatus",
      "c08" -> "SELECT CASE 1 WHEN 1 THEN 'x' ELSE orderstatus END, count(*)\nFROM orders\nGROUP BY orderstatus",
      "c09" -> "SELECT CASE orderstatus WHEN 'O' THEN 'a' END, count(*)\nFROM orders\nGROUP BY CASE orderstatus WHEN 'O' THEN 'a' END",
      "c10" -> "SELECT CASE 'O' WHEN orderstatus THEN 'a' END, count(*)\nFROM orders\nGROUP BY orderstatus",
      "c11" -> "SELECT CASE 1 WHEN 1 THEN orderstatus END, count(*)\nFROM orders\nGROUP BY orderstatus",
      "c12" -> "SELECT CAST(orderkey AS VARCHAR), count(*) FROM orders GROUP BY CAST(orderkey AS VARCHAR)",
      "c13" -> "SELECT CAST(orderkey AS VARCHAR), count(*) FROM orders GROUP BY orderkey")),
    "r61_ref_groupby_nullfns" -> batchCols(
      Seq("k", "cnt"), Seq("CAST(c1 AS BIGINT) AS k", "CAST(c2 AS BIGINT) AS cnt"), Seq(
      "n1" -> "SELECT COALESCE(orderkey, custkey), count(*) FROM orders GROUP BY COALESCE(orderkey, custkey)",
      "n2" -> "SELECT COALESCE(orderkey, 1), count(*) FROM orders GROUP BY orderkey",
      "n3" -> "SELECT COALESCE(1, orderkey), count(*) FROM orders GROUP BY orderkey",
      "n4" -> "SELECT NULLIF(orderkey, custkey), count(*) FROM orders GROUP BY NULLIF(orderkey, custkey)",
      "n5" -> "SELECT NULLIF(orderkey, 1), count(*) FROM orders GROUP BY orderkey",
      "n6" -> "SELECT NULLIF(1, orderkey), count(*) FROM orders GROUP BY orderkey")),
    "r62_ref_15way_groupby" -> one(
      "SELECT     orderkey + 1, orderkey + 2, orderkey + 3, orderkey + 4, orderkey + 5,     orderkey + 6, orderkey + 7, orderkey + 8, orderkey + 9, orderkey + 10,     count(*) FROM orders GROUP BY     orderkey + 1, orderkey + 2, orderkey + 3, orderkey + 4, orderkey + 5,     orderkey + 6, orderkey + 7, orderkey + 8, orderkey + 9, orderkey + 10",
      (1 to 10).map("k" + _) :+ "cnt",
      (1 to 10).map(i => s"c$i AS k$i") :+ "CAST(c11 AS BIGINT) AS cnt"),

    // AbstractTestAggregations.java:847-1000 GROUPING SETS family — the
    // reference's own H2-equivalent UNION spellings serve as oracles.
    "r63_ref_grouping_sets" -> batchCols(
      Seq("linenumber", "suppkey", "s"),
      Seq("c1 AS linenumber", "c2 AS suppkey", "CAST(c3 AS BIGINT) AS s"), Seq(
      ("s1", "SELECT linenumber, suppkey, SUM(CAST(quantity AS BIGINT)) FROM lineitem GROUP BY GROUPING SETS ((linenumber, suppkey), (suppkey))",
             "SELECT linenumber, suppkey, SUM(CAST(quantity AS BIGINT)) FROM lineitem GROUP BY linenumber, suppkey UNION SELECT NULL, suppkey, SUM(CAST(quantity AS BIGINT)) FROM lineitem GROUP BY suppkey"),
      ("s2", "SELECT linenumber, suppkey, SUM(CAST(quantity AS BIGINT)) FROM lineitem WHERE quantity < 0 GROUP BY GROUPING SETS ((linenumber, suppkey), (suppkey))",
             "SELECT linenumber, suppkey, SUM(CAST(quantity AS BIGINT)) FROM lineitem WHERE quantity < 0 GROUP BY linenumber, suppkey UNION SELECT NULL, suppkey, SUM(CAST(quantity AS BIGINT)) FROM lineitem WHERE quantity < 0 GROUP BY suppkey"),
      ("s3", "SELECT linenumber, suppkey, SUM(DISTINCT CAST(quantity AS BIGINT)) FROM lineitem GROUP BY GROUPING SETS ((linenumber, suppkey), (suppkey))",
             "SELECT linenumber, suppkey, SUM(DISTINCT CAST(quantity AS BIGINT)) FROM lineitem GROUP BY linenumber, suppkey UNION SELECT NULL, suppkey, SUM(DISTINCT CAST(quantity AS BIGINT)) FROM lineitem GROUP BY suppkey"),
      ("s4", "SELECT linenumber, suppkey, SUM(CAST(quantity AS BIGINT)) FROM lineitem GROUP BY GROUPING SETS ((linenumber, suppkey), ())",
             "SELECT linenumber, suppkey, SUM(CAST(quantity AS BIGINT)) FROM lineitem GROUP BY linenumber, suppkey UNION SELECT NULL, NULL, SUM(CAST(quantity AS BIGINT)) FROM lineitem"),
      ("s5", "SELECT linenumber, suppkey, SUM(CAST(quantity AS BIGINT)) FROM lineitem GROUP BY GROUPING SETS ((), (linenumber, suppkey), (), (linenumber, suppkey))",
             "SELECT linenumber, suppkey, SUM(CAST(quantity AS BIGINT)) FROM lineitem GROUP BY linenumber, suppkey UNION ALL SELECT NULL, NULL, SUM(CAST(quantity AS BIGINT)) FROM lineitem UNION ALL SELECT linenumber, suppkey, SUM(CAST(quantity AS BIGINT)) FROM lineitem GROUP BY linenumber, suppkey UNION ALL SELECT NULL, NULL, SUM(CAST(quantity AS BIGINT)) FROM lineitem"),
      ("s6", "SELECT linenumber, suppkey, SUM(CAST(quantity AS BIGINT)) FROM lineitem GROUP BY GROUPING SETS ((), (linenumber), (linenumber, suppkey))",
             "SELECT linenumber, suppkey, SUM(CAST(quantity AS BIGINT)) FROM lineitem GROUP BY linenumber, suppkey UNION ALL SELECT linenumber, NULL, SUM(CAST(quantity AS BIGINT)) FROM lineitem GROUP BY linenumber UNION ALL SELECT NULL, NULL, SUM(CAST(quantity AS BIGINT)) FROM lineitem"))),

    // AbstractTestQueries join sections (:2497-:2872) — inner/left/right
    // joins with constant equalities, filtered build sides, double-filter
    // combinations, IS NOT NULL post-filters. All COUNT(*) shapes, VERBATIM.
    "r86_ref_join_counts" -> batch(Seq(
      "j01" -> "SELECT COUNT(*) FROM lineitem JOIN orders ON orders.custkey = 1 AND lineitem.orderkey = 1",
      "j02" -> "SELECT COUNT(*) FROM (SELECT * FROM lineitem WHERE orderkey % 16 = 0 AND partkey % 2 = 0) lineitem JOIN (SELECT * FROM orders WHERE orderkey % 16 = 0 AND custkey % 2 = 0) orders ON lineitem.orderkey % 8 = orders.orderkey % 8 AND lineitem.linenumber % 2 = 0 WHERE orders.custkey % 8 < 7 AND orders.custkey % 8 = lineitem.orderkey % 8 AND lineitem.suppkey % 7 > orders.custkey % 7",
      "j03" -> "SELECT COUNT(*) FROM lineitem LEFT JOIN orders ON lineitem.orderkey = orders.orderkey",
      "j04" -> "SELECT COUNT(*) FROM lineitem LEFT OUTER JOIN orders ON lineitem.orderkey = orders.orderkey",
      "j05" -> "SELECT COUNT(*) FROM lineitem LEFT JOIN orders ON lineitem.orderkey = orders.orderkey WHERE orders.orderkey IS NOT NULL",
      "j06" -> "SELECT COUNT(*) FROM (SELECT * FROM lineitem WHERE orderkey % 1024 = 0) lineitem LEFT JOIN orders ON lineitem.orderkey = 1024",
      "j07" -> "SELECT COUNT(*) FROM (SELECT * FROM lineitem WHERE orderkey % 1024 = 0) lineitem LEFT JOIN orders ON orders.orderkey = 1024",
      "j08" -> "SELECT COUNT(*) FROM lineitem LEFT JOIN orders ON lineitem.orderkey = orders.orderkey AND orders.orderkey = 2",
      "j09" -> "SELECT COUNT(*) FROM lineitem LEFT JOIN orders ON lineitem.orderkey = orders.orderkey AND lineitem.orderkey = 2",
      "j10" -> "SELECT COUNT(*) FROM (SELECT * FROM lineitem WHERE orderkey % 1024 = 0) lineitem LEFT JOIN (SELECT * FROM orders WHERE orderkey % 1024 = 0) orders ON orders.orderkey = 1024",
      "j11" -> "SELECT COUNT(*) FROM (SELECT * FROM lineitem WHERE orderkey % 1024 = 0) lineitem LEFT JOIN (SELECT * FROM orders WHERE orderkey % 1024 = 0) orders ON lineitem.orderkey = 1024",
      "j12" -> "SELECT COUNT(*) FROM lineitem LEFT JOIN orders ON lineitem.orderkey = orders.orderkey AND lineitem.orderkey = orders.custkey",
      "j13" -> "SELECT COUNT(*) FROM lineitem LEFT JOIN orders ON lineitem.orderkey = orders.orderkey AND orders.orderkey = lineitem.partkey",
      "j14" -> "SELECT COUNT(*) FROM (SELECT * FROM lineitem WHERE orderkey % 16 = 0 AND partkey % 2 = 0) lineitem LEFT JOIN (SELECT * FROM orders WHERE orderkey % 16 = 0 AND custkey % 2 = 0) orders ON lineitem.orderkey % 8 = orders.orderkey % 8 WHERE (orders.custkey % 8 < 7 OR orders.custkey % 8 IS NULL) AND orders.custkey % 8 = lineitem.orderkey % 8",
      "j15" -> "SELECT COUNT(*) FROM (SELECT * FROM lineitem WHERE orderkey % 4 = 0 AND suppkey % 2 = partkey % 2 AND linenumber % 3 = orderkey % 3) lineitem LEFT JOIN (SELECT * FROM orders WHERE orderkey % 4 = 0) orders ON lineitem.linenumber % 3 = orders.orderkey % 4 AND lineitem.orderkey % 3 = orders.custkey % 3 WHERE lineitem.suppkey % 2 = lineitem.linenumber % 3",
      "j16" -> "SELECT COUNT(*) FROM lineitem RIGHT JOIN orders ON lineitem.orderkey = orders.orderkey",
      "j17" -> "SELECT COUNT(*) FROM lineitem RIGHT OUTER JOIN orders ON lineitem.orderkey = orders.orderkey",
      "j18" -> "SELECT COUNT(*) FROM lineitem RIGHT JOIN orders ON lineitem.orderkey = orders.custkey",
      "j19" -> "SELECT COUNT(*) FROM lineitem RIGHT OUTER JOIN orders ON lineitem.orderkey = orders.custkey",
      "j20" -> "SELECT COUNT(*) FROM lineitem RIGHT JOIN orders ON lineitem.orderkey = orders.orderkey WHERE lineitem.orderkey IS NOT NULL",
      "j21" -> "SELECT COUNT(*) FROM lineitem RIGHT JOIN orders ON lineitem.orderkey = orders.custkey WHERE lineitem.orderkey IS NOT NULL",
      "j22" -> "SELECT COUNT(*) FROM (SELECT * FROM lineitem WHERE orderkey % 1024 = 0) lineitem RIGHT JOIN orders ON lineitem.orderkey = 1024",
      "j23" -> "SELECT COUNT(*) FROM (SELECT * FROM lineitem WHERE orderkey % 1024 = 0) lineitem RIGHT JOIN orders ON orders.orderkey = 1024",
      "j24" -> "SELECT COUNT(*) FROM (SELECT * FROM lineitem WHERE orderkey % 1024 = 0) lineitem RIGHT JOIN (SELECT * FROM orders WHERE orderkey % 1024 = 0) orders ON orders.orderkey = 1024",
      "j25" -> "SELECT COUNT(*) FROM (SELECT * FROM lineitem WHERE orderkey % 1024 = 0) lineitem RIGHT JOIN (SELECT * FROM orders WHERE orderkey % 1024 = 0) orders ON lineitem.orderkey = 1024",
      "j26" -> "SELECT COUNT(*) FROM lineitem RIGHT JOIN orders ON lineitem.orderkey = orders.orderkey AND orders.orderkey = 2",
      "j27" -> "SELECT COUNT(*) FROM lineitem RIGHT JOIN orders ON lineitem.orderkey = orders.orderkey AND lineitem.orderkey = 2",
      "j28" -> "SELECT COUNT(*) FROM lineitem RIGHT JOIN orders ON lineitem.orderkey = orders.orderkey AND lineitem.orderkey = orders.custkey",
      "j29" -> "SELECT COUNT(*) FROM lineitem RIGHT JOIN orders ON lineitem.orderkey = orders.orderkey AND orders.orderkey = lineitem.partkey",
      "j30" -> "SELECT COUNT(*) FROM (SELECT * FROM orders WHERE orderkey % 16 = 0 AND custkey % 2 = 0) orders RIGHT JOIN (SELECT * FROM lineitem WHERE orderkey % 16 = 0 AND partkey % 2 = 0) lineitem ON lineitem.orderkey % 8 = orders.orderkey % 8 WHERE (orders.custkey % 8 < 7 OR orders.custkey % 8 IS NULL) AND orders.custkey % 8 = lineitem.orderkey % 8",
      "j31" -> "SELECT COUNT(*) FROM (SELECT * FROM orders WHERE orderkey % 4 = 0) orders RIGHT JOIN (SELECT * FROM lineitem WHERE orderkey % 4 = 0 AND suppkey % 2 = partkey % 2 AND linenumber % 3 = orderkey % 3) lineitem ON lineitem.linenumber % 3 = orders.orderkey % 4 AND lineitem.orderkey % 3 = orders.custkey % 3 WHERE lineitem.suppkey % 2 = lineitem.linenumber % 3")),

    // AbstractTestQueries semi-join sections (:5602-:5714) — IN-subquery
    // PROJECTED as a value (three-valued logic: NULL probe / NULL-bearing
    // build side, the projectedIn rewrite), also in GROUP BY keys and
    // HAVING. VERBATIM; DuckDB cannot hold a subquery in GROUP BY, so the
    // oracles drop the constant (uncorrelated) IN term from the grouping —
    // a per-query constant cannot split groups.
    // (nullable booleans dump as None-vs-nan across pandas paths — both
    // sides go through INT, which lands on float64/nan uniformly)
    "r87_ref_semijoin_projected" -> batchCols(
      Seq("v"), Seq("CAST(c1 AS INT) AS v"), sparkCast = Map("v" -> "int"), cases = Seq(
      "s01" -> "SELECT orderkey   IN (     SELECT CASE WHEN orderkey % 3 = 0 THEN NULL ELSE orderkey END     FROM lineitem) FROM orders",
      "s02" -> "SELECT orderkey   IN (     SELECT orderkey     FROM lineitem) FROM (   SELECT CASE WHEN orderkey % 3 = 0 THEN NULL ELSE orderkey END AS orderkey   FROM orders)",
      "s03" -> "SELECT orderkey   IN (     SELECT CASE WHEN orderkey % 3 = 0 THEN NULL ELSE orderkey END     FROM lineitem) FROM (   SELECT CASE WHEN orderkey % 4 = 0 THEN NULL ELSE orderkey END AS orderkey   FROM orders)",
      "s04" -> "SELECT orderkey   IN (     SELECT CASE WHEN orderkey % 500 = 0 THEN NULL ELSE orderkey END     FROM orders     WHERE orderkey % 200 = 0     UNION ALL     SELECT CASE WHEN orderkey % 600 = 0 THEN NULL ELSE orderkey END     FROM orders     WHERE orderkey % 300 = 0   ) FROM (   SELECT orderkey   FROM lineitem   WHERE orderkey % 100 = 0)")),
    "r88_ref_semijoin_grouped" -> batchCols(
      Seq("linenumber", "mn", "b"),
      Seq("c1 AS linenumber", "CAST(c2 AS BIGINT) AS mn", "c3 AS b"), Seq(
      ("g01", "SELECT linenumber, min(orderkey), 6 IN (SELECT orderkey FROM orders WHERE orderkey < 7)FROM lineitem GROUP BY linenumber"),
      ("g02", "SELECT linenumber, min(orderkey), 6 IN (SELECT orderkey FROM orders WHERE orderkey < 7)FROM lineitem GROUP BY linenumber, 6 IN (SELECT orderkey FROM orders WHERE orderkey < 7)",
              "SELECT linenumber, min(orderkey), 6 IN (SELECT orderkey FROM orders WHERE orderkey < 7)FROM lineitem GROUP BY linenumber"),
      ("g03", "SELECT linenumber, min(orderkey), 6 IN (SELECT orderkey FROM orders WHERE orderkey < 7)FROM lineitem GROUP BY linenumber, 6 IN (SELECT orderkey FROM orders WHERE orderkey < 7)HAVING 6 IN (SELECT orderkey FROM orders WHERE orderkey < 7)",
              "SELECT linenumber, min(orderkey), 6 IN (SELECT orderkey FROM orders WHERE orderkey < 7)FROM lineitem GROUP BY linenumber HAVING 6 IN (SELECT orderkey FROM orders WHERE orderkey < 7)"),
      ("g04", "SELECT linenumber, min(orderkey), 6 IN (SELECT max(orderkey) FROM orders WHERE orderkey < 7)FROM lineitem GROUP BY linenumber, 6 IN (SELECT sum(orderkey) FROM orders WHERE orderkey < 5)",
              "SELECT linenumber, min(orderkey), 6 IN (SELECT max(orderkey) FROM orders WHERE orderkey < 7)FROM lineitem GROUP BY linenumber"),
      ("g05", "SELECT linenumber, min(orderkey), 6 IN (SELECT orderkey FROM orders WHERE orderkey < 7)FROM lineitem GROUP BY linenumber, 6 IN (SELECT orderkey FROM orders WHERE orderkey < 5)HAVING 6 IN (SELECT orderkey FROM orders WHERE orderkey > 3)",
              "SELECT linenumber, min(orderkey), 6 IN (SELECT orderkey FROM orders WHERE orderkey < 7)FROM lineitem GROUP BY linenumber HAVING 6 IN (SELECT orderkey FROM orders WHERE orderkey > 3)"))),
    "r89_ref_semijoin_having" -> batchCols(
      Seq("linenumber", "mn"),
      Seq("c1 AS linenumber", "CAST(c2 AS BIGINT) AS mn"), Seq(
      ("h01", "SELECT linenumber, min(orderkey) FROM lineitem GROUP BY linenumber, 6 IN (SELECT orderkey FROM orders WHERE orderkey < 7)",
              "SELECT linenumber, min(orderkey) FROM lineitem GROUP BY linenumber"),
      ("h02", "SELECT linenumber, min(orderkey) FROM lineitem GROUP BY linenumber HAVING 6 IN (SELECT orderkey FROM orders WHERE orderkey < 7)"),
      ("h03", "SELECT linenumber, min(orderkey) FROM lineitem GROUP BY linenumber, 6 IN (SELECT orderkey FROM orders WHERE orderkey < 7)HAVING 6 IN (SELECT orderkey FROM orders WHERE orderkey > 3)",
              "SELECT linenumber, min(orderkey) FROM lineitem GROUP BY linenumber HAVING 6 IN (SELECT orderkey FROM orders WHERE orderkey > 3)"))),

    // join row-level shapes (:2484-:2882): subquery-filtered probe/build
    // sides, outer joins over CASE-nulled keys (null keys never match).
    "r90_ref_join_rows" -> batchCols(
      Seq("custkey", "linestatus", "tax", "totalprice", "orderstatus"),
      Seq("c1 AS custkey", "c2 AS linestatus", "CAST(c3 AS DOUBLE) AS tax",
        "CAST(c4 AS DOUBLE) AS totalprice", "c5 AS orderstatus"), Seq(
      "r01" -> "SELECT custkey, linestatus, tax, totalprice, orderstatus FROM (SELECT * FROM lineitem WHERE orderkey % 2 = 0) a JOIN orders ON a.orderkey = orders.orderkey",
      "r02" -> "SELECT custkey, linestatus, tax, totalprice, orderstatus FROM lineitem JOIN (SELECT *  FROM orders WHERE orderkey % 2 = 0) a ON lineitem.orderkey = a.orderkey")),
    "r91_ref_join_nullkeys" -> batchCols(
      Seq("a", "b"), Seq("c1 AS a", "c2 AS b"), Seq(
      "n01" -> "SELECT * FROM (   SELECT CASE WHEN orderkey % 3 = 0 THEN NULL ELSE orderkey END AS orderkey   FROM lineitem   WHERE partkey % 512 = 0 ) AS lineitem  LEFT JOIN (   SELECT CASE WHEN orderkey % 2 = 0 THEN NULL ELSE orderkey END AS orderkey   FROM orders   WHERE custkey % 512 = 0 ) AS orders ON lineitem.orderkey = orders.orderkey",
      "n02" -> "SELECT lineitem.orderkey, orders.orderkey FROM (   SELECT CASE WHEN orderkey % 3 = 0 THEN NULL ELSE orderkey END AS orderkey   FROM lineitem   WHERE partkey % 512 = 0 ) AS lineitem  RIGHT JOIN (   SELECT CASE WHEN orderkey % 2 = 0 THEN NULL ELSE orderkey END AS orderkey   FROM orders   WHERE custkey % 512 = 0 ) AS orders ON lineitem.orderkey = orders.orderkey")),
    "r92_ref_join_distinct_case" -> batch(Seq(
      "d01" -> "SELECT DISTINCT a.orderkey FROM (SELECT CASE WHEN orderkey > 10 THEN orderkey END orderkey FROM orders WHERE orderkey < 100) a RIGHT OUTER JOIN (SELECT * FROM orders WHERE orderkey < 100) b ON a.orderkey = b.orderkey")),

    // AbstractTestQueries variance/stddev sections (:1112-:1169) — the
    // SAMP/POP family over full data and the n=2 / n=1 / n=0 edge rows
    // (n=1 sample variance and n=0 are NULL). Small-n cases are exact;
    // values go through DECIMAL(38,3) on both sides (summation-order float
    // noise is far below 1e-3 here).
    "r93_ref_variance_edges" -> batchCols(
      Seq("v"), Seq("CAST(CAST(c1 AS DECIMAL(38,3)) AS DOUBLE) AS v"),
      sparkCast = Map("v" -> "decimal(38,3)"), cases = Seq(
      "v01" -> "SELECT VAR_SAMP(custkey) FROM (SELECT custkey FROM orders ORDER BY custkey LIMIT 2) T",
      "v02" -> "SELECT VAR_SAMP(custkey) FROM (SELECT custkey FROM orders ORDER BY custkey LIMIT 1) T",
      "v03" -> "SELECT VAR_SAMP(custkey) FROM (SELECT custkey FROM orders LIMIT 0) T",
      "v04" -> "SELECT VAR_SAMP(totalprice) FROM (SELECT totalprice FROM orders ORDER BY totalprice LIMIT 2) T",
      "v05" -> "SELECT VAR_SAMP(totalprice) FROM (SELECT totalprice FROM orders ORDER BY totalprice LIMIT 1) T",
      "v06" -> "SELECT VAR_SAMP(totalprice) FROM (SELECT totalprice FROM orders LIMIT 0) T",
      "v07" -> "SELECT VAR_POP(custkey) FROM (SELECT custkey FROM orders ORDER BY custkey LIMIT 2) T",
      "v08" -> "SELECT VAR_POP(custkey) FROM (SELECT custkey FROM orders ORDER BY custkey LIMIT 1) T",
      "v09" -> "SELECT VAR_POP(custkey) FROM (SELECT custkey FROM orders LIMIT 0) T",
      "v10" -> "SELECT VAR_POP(totalprice) FROM (SELECT totalprice FROM orders ORDER BY totalprice LIMIT 2) T",
      "v11" -> "SELECT VAR_POP(totalprice) FROM (SELECT totalprice FROM orders ORDER BY totalprice LIMIT 1) T",
      "v12" -> "SELECT VAR_POP(totalprice) FROM (SELECT totalprice FROM orders LIMIT 0) T",
      "v13" -> "SELECT STDDEV_SAMP(custkey) FROM (SELECT custkey FROM orders ORDER BY custkey LIMIT 2) T",
      "v14" -> "SELECT STDDEV_SAMP(custkey) FROM (SELECT custkey FROM orders ORDER BY custkey LIMIT 1) T",
      "v15" -> "SELECT STDDEV_SAMP(custkey) FROM (SELECT custkey FROM orders LIMIT 0) T",
      "v16" -> "SELECT STDDEV_SAMP(totalprice) FROM (SELECT totalprice FROM orders ORDER BY totalprice LIMIT 2) T",
      "v17" -> "SELECT STDDEV_POP(custkey) FROM (SELECT custkey FROM orders ORDER BY custkey LIMIT 2) T",
      "v18" -> "SELECT STDDEV_POP(totalprice) FROM (SELECT totalprice FROM orders ORDER BY totalprice LIMIT 2) T")),

    // Full-table integer variance (custkey is small-integer-valued, so the
    // whole computation stays far inside double exactness — gate at the
    // integer level).
    "r94_ref_variance_full" -> batchCols(
      Seq("v"), Seq("CAST(CAST(c1 AS DECIMAL(38,0)) AS DOUBLE) AS v"),
      sparkCast = Map("v" -> "decimal(38,0)"), cases = Seq(
      "f1" -> "SELECT VAR_SAMP(custkey) FROM orders",
      "f2" -> "SELECT VAR_POP(custkey) FROM orders",
      "f3" -> "SELECT STDDEV_SAMP(custkey) FROM orders",
      "f4" -> "SELECT STDDEV_POP(custkey) FROM orders")),

    // Misc single-column statements across the corpus: unary negation,
    // DISTINCT, scoped references, case-insensitive aliases, empty-result
    // filters over aggregate subqueries (WHERE 0=1 / WHERE null).
    "r95_ref_misc_scalars" -> batch(Seq(
      "m1" -> "SELECT -custkey FROM orders",
      "m2" -> "SELECT DISTINCT custkey FROM orders",
      "m3" -> "SELECT COUNT(DISTINCT custkey) FROM (   SELECT x.custkey   FROM orders x   WHERE custkey < 100 ) t",
      "m4" -> "SELECT COUNT(*) FROM (SELECT DISTINCT orderstatus, custkey FROM orders LIMIT 10)",
      "m5" -> "SELECT x FROM (SELECT orderkey X FROM orders)",
      "m6" -> "SELECT * FROM (SELECT count(*) FROM orders) WHERE 0=1",
      "m7" -> "SELECT * FROM (SELECT count(*) FROM orders) WHERE null",
      "m8" -> "SELECT T.* FROM (SELECT orderkey + custkey FROM orders) T",
      "m9" -> "SELECT COUNT(*) FROM orders t JOIN (SELECT * FROM orders LIMIT 1) t2 ON sin(t2.custkey) = 0")),

    // Two-bigint-column shapes: parenthesized relation, nested aggregation
    // arithmetic, mixed int/decimal comparison pushdown.
    "r96_ref_misc_pairs" -> batchCols(
      Seq("a", "b"), Seq("c1 AS a", "CAST(c2 AS BIGINT) AS b"), Seq(
      "p1" -> "(SELECT orderkey, custkey FROM orders)",
      "p2" -> "SELECT custkey, orders2 FROM (   SELECT x.custkey, SUM(x.orders) + 1 orders2    FROM (       SELECT x.custkey, COUNT(x.orderkey) orders       FROM orders x       WHERE x.custkey < 100       GROUP BY x.custkey    ) x    GROUP BY x.custkey) ORDER BY custkey",
      "p3" -> "SELECT orders.custkey, orders.orderkey FROM orders WHERE orders.custkey > orders.orderkey AND orders.custkey < 200.3")),

    // Deeper projected-IN shapes (:5734-:5772): grouped build side, UNION
    // build side, nested-CASE null keys — three-valued results via INT.
    "r97_ref_semijoin_deep" -> batchCols(
      Seq("v"), Seq("CAST(c1 AS INT) AS v"), sparkCast = Map("v" -> "int"),
      cases = Seq(
      "d1" -> "SELECT orderkey   IN (     SELECT CASE WHEN orderkey % 10 = 0 THEN NULL ELSE orderkey END     FROM lineitem     WHERE orderkey % 2 = 0     GROUP BY orderkey   ) FROM orders",
      "d2" -> "SELECT orderkey   IN (     SELECT CASE WHEN orderkey % 500 = 0 THEN NULL ELSE orderkey END     FROM lineitem     WHERE orderkey % 250 = 0     UNION ALL     SELECT CASE WHEN orderkey % 300 = 0 THEN NULL ELSE orderkey END     FROM lineitem     WHERE orderkey % 200 = 0   ) FROM orders",
      "d3" -> "SELECT orderkey   IN (     SELECT orderkey     FROM (       SELECT CASE WHEN orderkey % 500 = 0 THEN NULL ELSE orderkey END AS orderkey       FROM orders       WHERE orderkey % 100 = 0     )   ) FROM orders")),

    // testDistinctLimit / star expansion / union-compare rows (:844-:7521).
    "r98_ref_distinct_limit" -> batchCols(
      Seq("orderstatus", "custkey"),
      Seq("c1 AS orderstatus", "c2 AS custkey"), Seq(
      "l1" -> "SELECT DISTINCT orderstatus, custkey FROM (SELECT orderstatus, custkey FROM orders ORDER BY orderkey LIMIT 10) LIMIT 10")),
    "r99_ref_union_compare" -> batchCols(
      Seq("v"), Seq("CAST(c1 AS INT) AS v"), sparkCast = Map("v" -> "int"),
      cases = Seq(
      "u1" -> "SELECT c = 'x'FROM (    SELECT 'x' AS c    UNION ALL    SELECT 'yy' AS c)")),

    // Sweep of the remaining single-bigint-column verbatim statements across
    // AbstractTestQueries (COUNT variants incl. NULLIF/typed-NULL args,
    // residual-heavy join conditions, CASE join keys, negated equi-joins,
    // varchar-cast join keys, correlated zero-FROM scalar counts, EXISTS
    // with disjunctive correlation, UNION count shapes, case-insensitive
    // identifier resolution, deterministic counts over rand()-ordered
    // subqueries).
    "r100_ref_bigint_sweep" -> batch(Seq(
      "b01" -> "SELECT COUNT(orderkey) FROM orders",
      "b02" -> "SELECT COUNT(orderstatus) FROM orders",
      "b03" -> "SELECT COUNT(orderdate) FROM orders",
      "b04" -> "SELECT COUNT(1) FROM orders",
      "b05" -> "SELECT COUNT(NULLIF(orderstatus, 'F')) FROM orders",
      "b06" -> "SELECT COUNT(CAST(NULL AS BIGINT)) FROM orders",
      "b07" -> "SELECT orderkey FROM lineitem WHERE tax < discount",
      "b08" -> "SELECT count(*) FROM lineitem l JOIN nation n ON l.suppkey % 5 = n.nationkey % 5 AND l.partkey % 3 < n.regionkey AND l.partkey % 3 + 1 < n.regionkey AND l.partkey % 3 + 2 < n.regionkey",
      "b09" -> "SELECT count(*) FROM lineitem l JOIN nation n ON l.suppkey % 5 = n.nationkey % 5 AND l.partkey % 3 + 2 < n.regionkey AND l.partkey % 3 + 1 < n.regionkey AND l.partkey % 3 < n.regionkey",
      "b10" -> "SELECT count(*) FROM lineitem l JOIN nation n ON l.suppkey % 5 = n.nationkey % 5 AND l.partkey % 3 > n.regionkey AND l.partkey % 3 + 1 > n.regionkey AND l.partkey % 3 + 2 > n.regionkey",
      "b11" -> "SELECT count(*) FROM lineitem l JOIN nation n ON l.suppkey % 5 = n.nationkey % 5 AND l.partkey % 3 + 2 > n.regionkey AND l.partkey % 3 + 1 > n.regionkey AND l.partkey % 3 > n.regionkey",
      "b12" -> "SELECT COUNT(*) FROM (SELECT orderkey FROM lineitem WHERE orderkey < 1000) a JOIN (SELECT orderkey FROM orders WHERE orderkey < 2000) b ON NOT (a.orderkey <= b.orderkey)",
      "b13" -> "SELECT COUNT(*) FROM orders JOIN lineitem ON CAST(orders.orderkey AS VARCHAR) = CAST(lineitem.orderkey AS VARCHAR) WHERE orders.orderkey = 1 AND lineitem.orderkey = 2 ",
      "b14" -> "SELECT COUNT(*) FROM lineitem JOIN orders ON orders.orderkey = lineitem.orderkey",
      "b15" -> "SELECT SUM(custkey) FROM lineitem JOIN orders ON lineitem.orderkey = CASE WHEN orders.custkey = 1 and orders.orderstatus = 'F' THEN orders.orderkey ELSE NULL END",
      "b16" -> "SELECT COUNT(*) FROM nation a JOIN nation b on not (a.nationkey = b.nationkey)",
      "b17" -> "SELECT COUNT(*) FROM nation a JOIN nation b on not (not CAST(a.nationkey AS boolean))",
      "b18" -> "SELECT COUNT(*) FROM nation a JOIN nation b on not not not (a.nationkey = b.nationkey)",
      "b19" -> "SELECT x + y FROM (   SELECT orderdate, COUNT(*) x FROM orders GROUP BY orderdate) a JOIN (   SELECT orderdate, COUNT(*) y FROM orders GROUP BY orderdate) b ON a.orderdate = b.orderdate",
      "b20" -> "SELECT COUNT(*) FROM       (SELECT * FROM lineitem ORDER BY orderkey,linenumber LIMIT 5) l          LEFT OUTER JOIN       (SELECT * FROM orders ORDER BY orderkey LIMIT 5) o          ON       o.custkey != 1000 WHERE o.orderkey IS NULL",
      "b21" -> "SELECT COUNT(*) FROM       (SELECT * FROM lineitem ORDER BY orderkey,linenumber LIMIT 5) l          RIGHT OUTER JOIN       (SELECT * FROM orders ORDER BY orderkey LIMIT 5) o          ON       l.quantity != 5 WHERE l.orderkey IS NULL",
      "b22" -> "SELECT sum(orderkey) FROM orders HAVING sum(orderkey) > 400000",
      "b23" -> "SELECT orderkey FROM (SELECT orderkey FROM orders)",
      "b24" -> "SELECT a FROM (SELECT orderkey a FROM orders)",
      "b25" -> "SELECT orderkey FROM orders WHERE orderkey IN (1, 2E0, 3)",
      "b26" -> "SELECT * FROM (SELECT orderkey X FROM orders)",
      "b27" -> "SELECT ORDERKEY FROM ORDERS",
      "b28" -> "SELECT OrDeRkEy FROM OrDeRs",
      "b29" -> "SELECT count(clerk) FROM (SELECT clerk FROM orders WHERE orderkey=0  UNION ALL SELECT clerk FROM orders WHERE orderkey<>0) GROUP BY clerk",
      ("b30", "SELECT COUNT(*) FROM (SELECT * FROM orders ORDER BY rand() LIMIT 5) a CROSS JOIN (SELECT * FROM lineitem ORDER BY rand() LIMIT 5) b",
              "SELECT COUNT(*) FROM (SELECT * FROM orders ORDER BY random() LIMIT 5) a CROSS JOIN (SELECT * FROM lineitem ORDER BY random() LIMIT 5) b"),
      "b31" -> "SELECT o.custkey FROM orders o INNER JOIN lineitem l ON o.custkey = l.linenumber WHERE o.custkey IN (5) AND l.orderkey IN (7522)",
      "b32" -> "SELECT COUNT(*) FROM orders o INNER JOIN lineitem l ON o.custkey = l.linenumber WHERE o.custkey IN (5) AND l.orderkey IN (7522)",
      "b33" -> "SELECT COUNT(*) FROM (   SELECT orderkey   IN (     SELECT orderkey     FROM lineitem     WHERE orderkey % 2 = 0)   FROM orders   LIMIT 10)",
      "b34" -> "SELECT (SELECT count(*) WHERE o.orderkey = 1) FROM orders o",
      "b35" -> "SELECT count(*) FROM orders o WHERE 1 = (SELECT count(*) WHERE o.orderkey = 0)",
      "b36" -> "SELECT count(*) FROM nation n WHERE (SELECT count(*) FROM region r WHERE n.regionkey = r.regionkey) > 1",
      "b37" -> "SELECT count(*) FROM lineitem l WHERE EXISTS(SELECT 1 WHERE l.orderkey > 0 OR l.orderkey != 3)",
      "b38" -> "SELECT * FROM (   SELECT orderkey+1 AS a FROM orders WHERE orderstatus = 'F' UNION ALL    SELECT orderkey FROM orders WHERE orderkey % 2 = 0 UNION ALL    (SELECT orderkey+custkey FROM orders ORDER BY orderkey LIMIT 10) )  WHERE a < 20 OR a > 100  ORDER BY a",
      "b39" -> "SELECT COUNT(*) FROM lineitem  JOIN (   SELECT * FROM orders ) orders  ON lineitem.orderkey = orders.orderkey  WHERE orders.orderkey % 4 = 0   AND lineitem.suppkey > orders.orderkey",
      "b40" -> "SELECT COUNT(*) FROM lineitem  LEFT JOIN (   SELECT * FROM orders WHERE orders.orderkey % 2 = 0 ) orders  ON lineitem.orderkey = orders.orderkey  WHERE orders.orderkey % 4 = 0   AND (lineitem.suppkey % 2 = orders.orderkey % 2 OR orders.custkey IS NULL)",
      "b41" -> "SELECT COUNT(*) FROM lineitem  LEFT JOIN (   SELECT * FROM orders WHERE orders.orderkey % 2 = 0 ) orders  ON lineitem.orderkey = orders.orderkey  WHERE lineitem.orderkey % 4 = 0   AND (lineitem.suppkey % 2 = orders.orderkey % 2 OR orders.orderkey IS NULL)",
      "b42" -> "SELECT COUNT(*) FROM lineitem  LEFT JOIN (   SELECT * FROM orders WHERE orders.orderkey % 2 = 0 ) orders  ON lineitem.orderkey = orders.orderkey  WHERE orders.orderkey = orders.orderkey   AND lineitem.orderkey % 4 = 0   AND (lineitem.suppkey % 2 = orders.orderkey % 2 OR orders.orderkey IS NULL)",
      "b43" -> "SELECT count(*) FROM orders a LEFT OUTER JOIN orders b   ON a.clerk = b.clerk WHERE a.orderpriority='5-LOW'   AND b.orderpriority='1-URGENT'   AND b.clerk is null   AND a.orderkey % 4 = 0 ",
      "b44" -> "SELECT COUNT(*) FROM (   SELECT * FROM orders WHERE orders.orderkey % 2 = 0 ) orders RIGHT JOIN lineitem ON lineitem.orderkey = orders.orderkey  WHERE orders.orderkey % 4 = 0   AND (lineitem.suppkey % 2 = orders.orderkey % 2 OR orders.custkey IS NULL)",
      "b45" -> "SELECT COUNT(*) FROM (   SELECT * FROM orders WHERE orders.orderkey % 2 = 0 ) orders  RIGHT JOIN lineitem ON lineitem.orderkey = orders.orderkey  WHERE lineitem.orderkey % 4 = 0   AND (lineitem.suppkey % 2 = orders.orderkey % 2 OR orders.orderkey IS NULL)",
      "b46" -> "SELECT COUNT(*) FROM (   SELECT * FROM orders WHERE orders.orderkey % 2 = 0 ) orders  RIGHT JOIN lineitem ON lineitem.orderkey = orders.orderkey  WHERE orders.orderkey = orders.orderkey   AND lineitem.orderkey % 4 = 0   AND (lineitem.suppkey % 2 = orders.orderkey % 2 OR orders.orderkey IS NULL)",
      ("b47", "SELECT COUNT(*) WHERE rand() >= 0",
              "SELECT COUNT(*) WHERE random() >= 0"),
      "b48" -> "SELECT COUNT(*) FROM (SELECT * FROM orders WHERE custkey % 2 = 0 AND orderkey % 3 = 0) WHERE orderkey   IN (     SELECT CASE WHEN orderkey % 7 = 0 THEN NULL ELSE orderkey END     FROM lineitem     WHERE partkey % 2 = 0)   AND     orderkey % 2 = 0",
      "b49" -> "SELECT COUNT(*) FROM (   SELECT orderkey AS x, orderkey AS y   FROM orders   WHERE orderkey % 3 = 0   UNION ALL   SELECT orderkey AS x, orderkey AS y   FROM orders   WHERE orderkey % 2 = 0 ) a JOIN (   SELECT orderkey AS x, orderkey AS y   FROM orders ) b ON a.x = b.x",
      "b50" -> "SELECT COUNT(*) FROM (SELECT SUM(orderkey) FROM orders)")),

    // Two-bigint-column sweep: duplicate projections, INTERSECT/EXCEPT
    // aggregates, inline-view renames, cross joins with empty sides,
    // correlated BETWEEN bounds in join conditions, scalar-subquery
    // projections.
    "r101_ref_bigint_pairs" -> batchCols(
      Seq("a", "b"),
      Seq("CAST(c1 AS BIGINT) AS a", "CAST(c2 AS BIGINT) AS b"), Seq(
      "p01" -> "SELECT SUM(orderkey), SUM(orderkey) FROM orders",
      "p02" -> "SELECT orderkey a, orderkey b FROM orders WHERE orderstatus = 'F'",
      "p03" -> "SELECT SUM(nationkey), COUNT(name) FROM (SELECT nationkey,name FROM nation INTERSECT SELECT regionkey, name FROM nation) n",
      "p04" -> "SELECT SUM(nationkey), COUNT(name) FROM (SELECT nationkey, name FROM nation WHERE nationkey < 6 EXCEPT SELECT regionkey, name FROM nation) n",
      "p05" -> "SELECT orderkey, custkey FROM (SELECT orderkey, custkey FROM orders) U",
      "p06" -> "SELECT x, y FROM (SELECT orderkey x, custkey y FROM orders) U",
      "p07" -> "SELECT x + 1, y FROM (SELECT orderkey * 10 x, custkey y FROM orders) u",
      "p08" -> "SELECT * FROM    (SELECT orderkey + 1 orderkey FROM (SELECT * FROM orders ORDER BY orderkey LIMIT 100)) o  JOIN    (SELECT orderkey + 1 orderkey FROM (SELECT * FROM orders ORDER BY orderkey LIMIT 100)) o1  ON (o.orderkey = o1.orderkey)",
      "p09" -> "SELECT count(orderkey), sum(sc) FROM (    SELECT sum(custkey) sc, orderkey FROM (        SELECT custkey,orderkey, orderkey+1 FROM orders WHERE orderkey=0        UNION ALL         SELECT custkey,orderkey,orderkey+1 FROM orders WHERE orderkey<>0)     GROUP BY orderkey)",
      "p10" -> "SELECT a.custkey, b.orderkey FROM (SELECT * FROM orders ORDER BY orderkey LIMIT 5) a CROSS JOIN (SELECT * FROM lineitem ORDER BY orderkey LIMIT 5) b",
      "p11" -> "SELECT a.custkey, b.orderkey FROM (SELECT * FROM orders WHERE orderkey < 0) a CROSS JOIN (SELECT * FROM lineitem WHERE orderkey < 100) b",
      "p12" -> "SELECT a.custkey, b.orderkey FROM (SELECT * FROM orders WHERE orderkey < 100) a CROSS JOIN (SELECT * FROM lineitem WHERE orderkey < 0) b",
      "p13" -> "SELECT o1.orderkey, COUNT(*) FROM orders o1 INNER JOIN (SELECT * FROM orders ORDER BY orderkey LIMIT 10) o2 ON o1.orderkey BETWEEN (SELECT avg(orderkey) FROM orders) - 10 AND (SELECT avg(orderkey) FROM orders) + 10 GROUP BY o1.orderkey",
      "p16" -> "SELECT custkey, (SELECT DISTINCT custkey FROM orders ORDER BY custkey LIMIT 1) FROM orders")),

    // Boolean-column sweep: coercion-in-join-condition, projected EXISTS
    // (correlated and constant), nested IN chains, boolean casts.
    "r102_ref_boolean_sweep" -> batchCols(
      Seq("v"), Seq("c1 AS v"), Seq(
      ("x01", "VALUES true, 1.0 in (1, 2, 3)",
              "VALUES (true), (1.0 in (1, 2, 3))"),
      "x02" -> "SELECT count(*) > 0 FROM nation JOIN region ON (cast(1.2 AS real) = CAST(1.2 AS decimal(2,1)))",
      "x03" -> "SELECT count(*) > 0 FROM nation JOIN region ON CAST((CASE WHEN (TRUE IS NOT NULL) THEN '1.2' ELSE '1.2' END) AS real) = CAST(1.2 AS decimal(2,1))",
      "x04" -> "SELECT CAST(orderkey AS BOOLEAN) FROM orders",
      "x05" -> "SELECT 10 in (SELECT orderkey FROM orders)",
      "x06" -> "SELECT ((SELECT 1) IN (SELECT 1)) IN (SELECT TRUE)",
      "x07" -> "SELECT EXISTS(SELECT o.orderkey) FROM orders o",
      "x08" -> "SELECT EXISTS(SELECT 1 WHERE o.orderkey = 1) FROM orders o",
      "x09" -> "SELECT EXISTS(SELECT null WHERE o.orderkey = 1) FROM orders o",
      "x10" -> "SELECT EXISTS(SELECT 1 WHERE l.orderkey > 0 OR l.orderkey != 3) FROM lineitem l LIMIT 1",
      "x11" -> "SELECT 1.0 = ANY(SELECT 1) WHERE 1 = ANY(SELECT 1)",
      "x12" -> "SELECT CAST(1 AS decimal(3,2)) <> ALL(SELECT CAST(1 AS decimal(3,1)))")),

    // Full-table moments over DECIMAL totalprice + LIMIT-0 NULLs and a
    // correlated scalar-aggregate HAVING probe; values gated through
    // DECIMAL well above both engines' summation noise.
    "r103_ref_double_aggs" -> batchCols(
      Seq("v"), Seq("CAST(CAST(c1 AS DECIMAL(38,0)) AS DOUBLE) AS v"),
      sparkCast = Map("v" -> "decimal(38,0)"), cases = Seq(
      "a1" -> "SELECT AVG(totalprice) FROM orders",
      "a2" -> "SELECT VAR_SAMP(totalprice) FROM orders",
      "a3" -> "SELECT VAR_POP(totalprice) FROM orders",
      "a4" -> "SELECT STDDEV_SAMP(totalprice) FROM orders",
      "a5" -> "SELECT STDDEV_POP(totalprice) FROM orders",
      "a6" -> "SELECT STDDEV_SAMP(totalprice) FROM (SELECT totalprice FROM orders LIMIT 0) T",
      "a7" -> "SELECT STDDEV_POP(custkey) FROM (SELECT custkey FROM orders LIMIT 0) T",
      "a8" -> "SELECT STDDEV_POP(totalprice) FROM (SELECT totalprice FROM orders LIMIT 0) T")),

    // Correlated EXISTS / zero-FROM scalar subqueries in HAVING and GROUP
    // BY (:6208-:6500). DuckDB cannot hold a subquery in GROUP BY — the
    // EXISTS term there is a function of the other group key, so the
    // oracle drops it without changing groups.
    "r104_ref_having_exists" -> batchCols(
      Seq("mx", "orderkey"),
      Seq("CAST(c1 AS DOUBLE) AS mx", "c2 AS orderkey"), Seq(
      ("e1", "SELECT max(o.totalprice), o.orderkey FROM orders o GROUP BY o.orderkey HAVING 1 = (SELECT count(*) WHERE o.orderkey = 0)"),
      ("e2", "SELECT max(o.totalprice), o.orderkey FROM orders o GROUP BY o.orderkey HAVING EXISTS (SELECT o.orderkey)"),
      ("e3", "SELECT max(o.totalprice), o.orderkey FROM orders o GROUP BY o.orderkey, EXISTS (SELECT o.orderkey)",
             "SELECT max(o.totalprice), o.orderkey FROM orders o GROUP BY o.orderkey"),
      ("e4", "SELECT max(o.totalprice), o.orderkey FROM orders o GROUP BY o.orderkey HAVING EXISTS (SELECT 1 WHERE o.orderkey = 0)"),
      ("e5", "SELECT max(o.totalprice), o.orderkey FROM orders o GROUP BY o.orderkey, EXISTS (SELECT 1 WHERE o.orderkey = 0)",
             "SELECT max(o.totalprice), o.orderkey FROM orders o GROUP BY o.orderkey"),
      ("e6", "SELECT max(l.quantity), l.orderkey FROM lineitem l GROUP BY l.orderkey HAVING EXISTS (SELECT 1 WHERE l.orderkey > 0 OR l.orderkey != 3)"),
      ("e7", "SELECT max(l.quantity), l.orderkey FROM lineitem l GROUP BY l.orderkey, EXISTS (SELECT 1 WHERE l.orderkey > 0 OR l.orderkey != 3)",
             "SELECT max(l.quantity), l.orderkey FROM lineitem l GROUP BY l.orderkey"))),

    // Join residuals comparing strings/lengths across sides (:1501-:1547)
    // and COALESCE-of-outer-join arithmetic / values-cross-join shapes.
    "r105_ref_int_pairs" -> batchCols(
      Seq("a", "b"), Seq("CAST(c1 AS INT) AS a", "CAST(c2 AS INT) AS b"), Seq(
      "i1" -> "SELECT n.nationkey, r.regionkey FROM region r JOIN nation n ON n.regionkey = r.regionkey AND n.name < r.name",
      "i2" -> "SELECT n.nationkey, r.regionkey FROM nation n JOIN region r ON n.regionkey = r.regionkey AND length(n.name) < length(substr(r.name, 5))",
      "i3" -> "SELECT n.nationkey, r.regionkey FROM region r JOIN nation n ON n.regionkey = r.regionkey AND n.name > r.name AND r.regionkey = 0",
      "i4" -> "SELECT n.nationkey, r.regionkey FROM nation n JOIN region r ON n.regionkey = r.regionkey AND length(n.name) > length(substr(r.name, 5))",
      "i5" -> "SELECT a, b FROM (VALUES (1, 1)) CROSS JOIN (SELECT 0 AS a, 0 AS b UNION ALL SELECT 1, 1) t")),

    // Set-operation chains and cross-join aliasing returning single ints.
    "r106_ref_int_singles" -> batchCols(
      Seq("v"), Seq("CAST(c1 AS INT) AS v"), sparkCast = Map("v" -> "int"),
      cases = Seq(
      ("s1", "(SELECT * FROM (VALUES 1) EXCEPT SELECT * FROM (VALUES 0))EXCEPT (SELECT * FROM (VALUES 1) EXCEPT SELECT * FROM (VALUES 1))",
             "(SELECT * FROM (VALUES (1)) EXCEPT SELECT * FROM (VALUES (0)))EXCEPT (SELECT * FROM (VALUES (1)) EXCEPT SELECT * FROM (VALUES (1)))"),
      "s2" -> "SELECT row_number() OVER () FROM lineitem JOIN orders ON lineitem.orderkey = orders.orderkey WHERE orders.orderkey = 10000 LIMIT 20",
      "s3" -> "SELECT t.c FROM (SELECT 1) CROSS JOIN (SELECT 0 AS c UNION ALL SELECT 1) t")),

    // VALUES / set-op numeric coercion to decimal (:695-:5283); DuckDB
    // needs parens per VALUES row.
    "r107_ref_values_coercion" -> batchCols(
      Seq("v"), Seq("CAST(CAST(c1 AS DECIMAL(11,1)) AS DOUBLE) AS v"),
      sparkCast = Map("v" -> "double"), cases = Seq(
      ("c1", "VALUES 1, 2.2, 3, 4.4", "VALUES (1), (2.2), (3), (4.4)"),
      ("c2", "SELECT * FROM (VALUES 1, 2) EXCEPT SELECT * FROM (VALUES 3.0, 2)",
             "SELECT * FROM (VALUES (1), (2)) EXCEPT SELECT * FROM (VALUES (3.0), (2))"),
      ("c3", "SELECT * FROM (VALUES 1) UNION ALL SELECT * FROM (VALUES 1.0, 2)",
             "SELECT * FROM (VALUES (1)) UNION ALL SELECT * FROM (VALUES (1.0), (2))"))),

    // DISTINCT pairs and CASE-without-ELSE projections (:794-:4214).
    "r108_ref_distinct_pairs" -> batchCols(
      Seq("k", "s"), Seq("c1 AS k", "c2 AS s"), Seq(
      "d1" -> "SELECT DISTINCT custkey, orderstatus FROM orders",
      "d2" -> "SELECT orderkey, CASE orderstatus WHEN 'O' THEN 'a' END FROM orders")),

    // NULL-typed (unknown) columns through set operations (:1388-:5055) —
    // Presto's UnknownType columns; dumped via INT (parquet cannot store
    // a void column).
    "r109_ref_unknown_type" -> batchCols(
      Seq("a", "b"), Seq("CAST(c1 AS INT) AS a", "CAST(c2 AS INT) AS b"),
      sparkCast = Map("a" -> "int", "b" -> "int"), cases = Seq(
      "u1" -> "SELECT NULL, NULL INTERSECT SELECT NULL, NULL FROM nation",
      "u2" -> "SELECT NULL, NULL EXCEPT SELECT NULL, NULL FROM nation",
      "u3" -> "SELECT NULL, NULL UNION ALL SELECT NULL, NULL FROM nation")),

    // Star-expansion forms (:1087-:1099): aliased-relation star and
    // qualified star (totalprice goes through DOUBLE on both sides).
    "r110_ref_star_forms" -> batchCols(
      Seq("orderkey", "custkey", "orderstatus", "totalprice", "orderdate", "orderpriority", "clerk", "shippriority", "comment"),
      Seq("c1 AS orderkey",
        "c2 AS custkey",
        "c3 AS orderstatus",
        "CAST(c4 AS DOUBLE) AS totalprice",
        "c5 AS orderdate",
        "c6 AS orderpriority",
        "c7 AS clerk",
        "c8 AS shippriority",
        "c9 AS comment"),
      sparkCast = Map("totalprice" -> "double"), cases = Seq(
      "t1" -> "SELECT T.* FROM orders T",
      "t2" -> "SELECT orders.* FROM orders")),

    // Outer joins against an (almost-surely) empty rand()-filtered side and
    // a provably-empty IS NULL side (:1982-:3263): the reference's
    // empty-build/empty-probe page tests.
    "r111_ref_star_joins" -> batchCols(
      Seq("a_orderkey", "a_custkey", "a_orderstatus", "a_totalprice", "a_orderdate", "a_orderpriority", "a_clerk", "a_shippriority", "a_comment", "b_orderkey", "b_custkey", "b_orderstatus", "b_totalprice", "b_orderdate", "b_orderpriority", "b_clerk", "b_shippriority", "b_comment"),
      Seq("c1 AS a_orderkey",
        "c2 AS a_custkey",
        "c3 AS a_orderstatus",
        "CAST(c4 AS DOUBLE) AS a_totalprice",
        "CAST(c5 AS VARCHAR) AS a_orderdate",
        "c6 AS a_orderpriority",
        "c7 AS a_clerk",
        "c8 AS a_shippriority",
        "c9 AS a_comment",
        "c10 AS b_orderkey",
        "c11 AS b_custkey",
        "c12 AS b_orderstatus",
        "CAST(c13 AS DOUBLE) AS b_totalprice",
        "CAST(c14 AS VARCHAR) AS b_orderdate",
        "c15 AS b_orderpriority",
        "c16 AS b_clerk",
        "c17 AS b_shippriority",
        "c18 AS b_comment"),
      sparkCast = Map("a_totalprice" -> "double", "b_totalprice" -> "double",
        "a_orderdate" -> "string", "b_orderdate" -> "string"),
      cases = Seq(
      ("e1", "SELECT * FROM orders b RIGHT JOIN (SELECT * FROM orders WHERE orderkey = rand()) a ON a.orderkey = b.orderkey",
             "SELECT * FROM orders b RIGHT JOIN (SELECT * FROM orders WHERE orderkey = random()) a ON a.orderkey = b.orderkey"),
      ("e2", "SELECT * FROM orders b LEFT JOIN (SELECT * FROM orders WHERE orderkey = rand()) a ON a.orderkey > b.orderkey",
             "SELECT * FROM orders b LEFT JOIN (SELECT * FROM orders WHERE orderkey = random()) a ON a.orderkey > b.orderkey"),
      ("e3", "SELECT * FROM orders b LEFT JOIN (SELECT * FROM orders WHERE orderkey = rand()) a ON 1 = 1",
             "SELECT * FROM orders b LEFT JOIN (SELECT * FROM orders WHERE orderkey = random()) a ON 1 = 1"),
      ("e4", "SELECT * FROM orders b LEFT JOIN (SELECT * FROM orders WHERE orderkey = rand()) a ON b.orderkey > 1",
             "SELECT * FROM orders b LEFT JOIN (SELECT * FROM orders WHERE orderkey = random()) a ON b.orderkey > 1"),
      ("e5", "SELECT * FROM orders b LEFT JOIN (SELECT * FROM orders WHERE orderkey = rand()) a ON b.orderkey > b.totalprice",
             "SELECT * FROM orders b LEFT JOIN (SELECT * FROM orders WHERE orderkey = random()) a ON b.orderkey > b.totalprice"),
      ("e6", "SELECT * FROM orders a    JOIN (SELECT * FROM orders WHERE orderkey IS NULL) b    ON a.orderkey = b.orderkey"))),

    // UNION/UNION ALL mixing order and ship dates (:5121-:5261), grouped counts.
    "r112_ref_union_dates" -> batchCols(
      Seq("ds", "n"),
      Seq("c1 AS ds",
        "CAST(c2 AS BIGINT) AS n"),
      Seq(
      "u1" -> "SELECT ds, count(*) FROM (   SELECT orderdate ds, orderkey FROM orders    UNION ALL    SELECT shipdate ds, orderkey FROM lineitem) a GROUP BY ds",
      "u2" -> "SELECT ds, count(*) FROM (   SELECT orderdate ds, orderkey FROM orders    UNION    SELECT shipdate ds, orderkey FROM lineitem) a GROUP BY ds",
      "u3" -> "SELECT ds, count(DISTINCT orderkey) FROM (   SELECT orderdate ds, orderkey FROM orders    UNION    SELECT shipdate ds, orderkey FROM lineitem) a GROUP BY ds")),

    // Row-level UNION ALL of dates (:5259-:5261).
    "r113_ref_union_date_rows" -> batchCols(
      Seq("k", "d"),
      Seq("c1 AS k",
        "c2 AS d"),
      Seq(
      "u1" -> "SELECT orderkey, orderdate FROM orders WHERE custkey < 1000 UNION ALL SELECT orderkey, shipdate FROM lineitem WHERE linenumber < 2000",
      "u2" -> "SELECT orderkey, orderdate FROM orders UNION ALL SELECT orderkey, shipdate FROM lineitem WHERE linenumber < 2000",
      "u3" -> "SELECT orderkey, orderdate FROM orders WHERE custkey < 1000 UNION ALL SELECT orderkey, shipdate FROM lineitem")),

    // testHaving/testHaving3 (:3218-:3232): HAVING on a group key, aggregate arithmetic.
    "r114_ref_having_family" -> batchCols(
      Seq("k", "v"),
      Seq("CAST(c1 AS VARCHAR) AS k",
        "CAST(c2 AS DOUBLE) AS v"),
      sparkCast = Map("k" -> "string", "v" -> "double"), cases = Seq(
      "h1" -> "SELECT orderstatus, sum(totalprice) FROM orders GROUP BY orderstatus HAVING orderstatus = 'O'",
      "h2" -> "SELECT custkey, sum(totalprice) * 2 FROM orders GROUP BY custkey",
      "h3" -> "SELECT custkey, avg(totalprice + 5) FROM orders GROUP BY custkey",
      "h4" -> "SELECT custkey, sum(totalprice) * 2 FROM orders GROUP BY custkey HAVING avg(totalprice + 5) > 10")),

    // NULLIF aggregates per group (:713).
    "r115_ref_nullif_aggs" -> batchCols(
      Seq("custkey", "mx", "mn"),
      Seq("c1 AS custkey", "c2 AS mx", "c3 AS mn"), Seq(
      "m1" -> "SELECT custkey, MAX(NULLIF(orderstatus, 'O')), MIN(NULLIF(orderstatus, 'O')) FROM orders GROUP BY custkey")),
    // Filtered-ON outer-join aggregate (:1181).
    "r115b_ref_outer_agg" -> batchCols(
      Seq("clerk", "avgp", "cnt"),
      Seq("c1 AS clerk", "CAST(c2 AS DOUBLE) AS avgp", "CAST(c3 AS BIGINT) AS cnt"),
      sparkCast = Map("avgp" -> "double"), cases = Seq(
      "m2" -> "SELECT o.clerk, avg(o.shippriority), COUNT(l.linenumber) FROM orders o LEFT OUTER JOIN lineitem l ON o.orderkey=l.orderkey AND o.shippriority=1 GROUP BY o.clerk")),
    // DISTINCT self-join on two string keys (:1702) + string UNION (:5056).
    "r115c_ref_string_pairs" -> batchCols(
      Seq("a", "b"), Seq("c1 AS a", "c2 AS b"), Seq(
      "m3" -> "SELECT   a.orderstatus   , a.clerk FROM (   SELECT DISTINCT orderstatus, clerk FROM orders ) a INNER JOIN (   SELECT DISTINCT orderstatus, clerk FROM orders ) b ON   a.orderstatus = b.orderstatus   and a.clerk = b.clerk where a.orderstatus = 'F' ",
      "m4" -> "SELECT 'x', 'y' UNION ALL SELECT name, name FROM nation")),
    // Constant-subquery ORDER BY (:5876) — no real ordering implied.
    "r115d_ref_orderby_const_subquery" -> batchCols(
      Seq("orderkey", "totalprice"),
      Seq("c1 AS orderkey", "CAST(c2 AS DOUBLE) AS totalprice"),
      sparkCast = Map("totalprice" -> "double"), cases = Seq(
      "m5" -> "SELECT orderkey, totalprice FROM orders ORDER BY (SELECT 2)")),

    // Scalar-subquery comparisons and projected IN pairs (:5523-:7713).
    "r116_ref_scalar_subquery_cmp" -> batchCols(
      Seq("a", "b"),
      Seq("CAST(c1 AS INT) AS a",
        "CAST(c2 AS INT) AS b"),
      sparkCast = Map("a" -> "int", "b" -> "int"), cases = Seq(
      "c1" -> "SELECT 1 IN (SELECT 1), 2 IN (SELECT 1) WHERE 1 IN (SELECT 1)",
      "c2" -> "SELECT 1.0 = (SELECT 1) AND 1 = (SELECT 1), 2.0 = (SELECT 1) WHERE 1.0 = (SELECT 1) AND 1 = (SELECT 1)",
      "c4" -> "SELECT 1.0 = ANY(SELECT 1), 2 = ANY(SELECT 1) WHERE 1 = ANY(SELECT 1)")),

    // Correlated EXISTS projected next to aggregates (:6370-:6493).
    "r117_ref_exists_projected" -> batchCols(
      Seq("mx", "k", "e"),
      Seq("CAST(c1 AS DOUBLE) AS mx",
        "c2 AS k",
        "CAST(c3 AS INT) AS e"),
      sparkCast = Map("mx" -> "double", "e" -> "int"), cases = Seq(
      "e1" -> "SELECT max(o.totalprice), o.orderkey, EXISTS(SELECT o.orderkey) FROM orders o GROUP BY o.orderkey",
      "e2" -> "SELECT max(o.totalprice), o.orderkey, EXISTS(SELECT 1 WHERE o.orderkey = 0) FROM orders o GROUP BY o.orderkey",
      "e3" -> "SELECT max(l.quantity), l.orderkey, EXISTS(SELECT 1 WHERE l.orderkey > 0 OR l.orderkey != 3) FROM lineitem l GROUP BY l.orderkey")),

    // Constant scalar-subquery / EXISTS GROUP BY keys (:5985-:6037; DuckDB oracle drops the constant key).
    "r118_ref_groupby_subquery_keys" -> batchCols(
      Seq("linenumber", "mn"),
      Seq("c1 AS linenumber",
        "CAST(c2 AS BIGINT) AS mn"),
      Seq(
      ("k1", "SELECT linenumber, min(orderkey) FROM lineitem GROUP BY linenumber, (SELECT max(orderkey) FROM orders WHERE orderkey < 7)",
              "SELECT linenumber, min(orderkey) FROM lineitem GROUP BY linenumber"),
      ("k2", "SELECT linenumber, min(orderkey) FROM lineitem GROUP BY linenumber, EXISTS(SELECT orderkey FROM orders WHERE orderkey < 7)",
              "SELECT linenumber, min(orderkey) FROM lineitem GROUP BY linenumber"))),

    // VALUES rows with expressions and row coercion (:683-:696; DuckDB needs parens per row).
    "r119_ref_values_rows" -> batchCols(
      Seq("a", "b"),
      Seq("CAST(c1 AS DOUBLE) AS a",
        "CAST(c2 AS DOUBLE) AS b"),
      sparkCast = Map("a" -> "double", "b" -> "double"), cases = Seq(
      ("v1", "SELECT * FROM (VALUES (1.1, 2), (sin(3.3), 2+2))",
              "SELECT * FROM (VALUES (1.1, 2), (sin(3.3), 2+2))"),
      ("v2", "VALUES (1, 2), (3.3, 4.4)",
              "VALUES (1, 2), (3.3, 4.4)"))),

    // Small UNION coercion rows (:5267-:5287) and single-string scalars
    // (:4060, :5294).
    "r120_ref_union_coercion_rows" -> batchCols(
      Seq("a", "b"),
      Seq("CAST(c1 AS VARCHAR) AS a", "CAST(c2 AS VARCHAR) AS b"),
      sparkCast = Map("a" -> "string", "b" -> "string"), cases = Seq(
      "n1" -> "SELECT 123, 'foo' UNION ALL SELECT 999, 'bar'",
      "n2" -> "SELECT 0, 0 UNION ALL SELECT 1.0, 0",
      ("n3", "SELECT * FROM (VALUES (2, 2)) UNION SELECT * FROM (VALUES (1, 1.0))",
             "SELECT * FROM (VALUES (2, 2)) UNION SELECT * FROM (VALUES (1, 1.0))"),
      ("n4", "SELECT * FROM (VALUES (NULL, NULL)) UNION SELECT * FROM (VALUES (1, 1.0))",
             "SELECT * FROM (VALUES (NULL, NULL)) UNION SELECT * FROM (VALUES (1, 1.0))"))),
    "r120b_ref_string_scalars" -> batchCols(
      Seq("v"), Seq("c1 AS v"), Seq(
      "s1" -> "SELECT '12' || '34'",
      "s2" -> "SELECT a FROM (  (SELECT orderstatus AS a FROM orders LIMIT 1) UNION ALL   SELECT 'aaaa' AS a) WHERE  a = 'aaa'")),

    // Aggregates over INTERSECT/EXCEPT with constant SUM (:1401-:1464).
    "r121_ref_set_op_agg_trios" -> batchCols(
      Seq("n", "s", "k"),
      Seq("CAST(c1 AS BIGINT) AS n",
        "CAST(c2 AS BIGINT) AS s",
        "c3 AS k"),
      Seq(
      "t1" -> "SELECT COUNT(*), SUM(2), regionkey FROM (SELECT nationkey, regionkey FROM nation INTERSECT SELECT regionkey, regionkey FROM nation) n GROUP BY regionkey",
      "t2" -> "SELECT COUNT(*), SUM(2), regionkey FROM (SELECT nationkey, regionkey FROM nation EXCEPT SELECT regionkey, regionkey FROM nation) n GROUP BY regionkey HAVING regionkey < 3")),

    // Mixed-width equi+residual joins projecting both sides (:1502-:1534,
    // :5039) and an IN-filtered join pair (:5442).
    "r122_ref_join_quads" -> batchCols(
      Seq("a", "b", "c", "d"),
      Seq("CAST(c1 AS BIGINT) AS a", "CAST(c2 AS BIGINT) AS b",
        "CAST(c3 AS BIGINT) AS c", "CAST(c4 AS BIGINT) AS d"), Seq(
      "q1" -> "SELECT l.suppkey, n.nationkey, l.partkey, n.regionkey FROM nation n JOIN lineitem l ON l.suppkey = n.nationkey AND l.partkey < n.regionkey",
      "q2" -> "SELECT l.suppkey, n.nationkey, l.partkey, n.regionkey FROM nation n JOIN lineitem l ON l.suppkey = n.nationkey AND l.partkey > n.regionkey",
      "q3" -> "SELECT * FROM   (SELECT orderkey, abs(orderkey) a FROM orders) t JOIN   (SELECT orderkey, abs(orderkey) a FROM orders) u ON   t.orderkey = u.orderkey")),
    "r122b_ref_join_in_pair" -> batchCols(
      Seq("orderkey", "linenumber"),
      Seq("c1 AS orderkey", "CAST(c2 AS INT) AS linenumber"), Seq(
      "q4" -> "SELECT l.orderkey, l.linenumber FROM orders o INNER JOIN lineitem l ON o.custkey = l.linenumber WHERE o.custkey IN (5) AND l.orderkey IN (7522)")),

    // Reserved-ish words as aliases (:6935) — TIME/TIMESTAMP/DATE/INTERVAL resolve as column names (DuckDB needs quoting).
    "r123_ref_reserved_aliases" -> batchCols(
      Seq("t1", "t2", "t3", "t4"),
      Seq("CAST(c1 AS INT) AS t1",
        "CAST(c2 AS INT) AS t2",
        "CAST(c3 AS INT) AS t3",
        "CAST(c4 AS INT) AS t4"),
      Seq(
      ("r1", "SELECT TIME, TIMESTAMP, DATE, INTERVAL FROM (SELECT 1 TIME, 2 TIMESTAMP, 3 DATE, 4 INTERVAL)",
              "SELECT \"TIME\", \"TIMESTAMP\", \"DATE\", \"INTERVAL\" FROM (SELECT 1 \"TIME\", 2 \"TIMESTAMP\", 3 \"DATE\", 4 \"INTERVAL\")"))),

    // Lineitem star filtered by scalar subqueries (:5814-:5825): max(orderkey) probe, empty-result scalar, IS [NOT] NULL over an empty scalar.
    "r124_ref_lineitem_star_filters" -> batchCols(
      Seq("orderkey", "partkey", "suppkey", "linenumber", "quantity", "extendedprice", "discount", "tax", "returnflag", "linestatus", "shipdate", "commitdate", "receiptdate", "shipmode", "shipinstruct", "comment"),
      Seq("c1 AS orderkey",
        "c2 AS partkey",
        "c3 AS suppkey",
        "c4 AS linenumber",
        "CAST(c5 AS DOUBLE) AS quantity",
        "CAST(c6 AS DOUBLE) AS extendedprice",
        "CAST(c7 AS DOUBLE) AS discount",
        "CAST(c8 AS DOUBLE) AS tax",
        "c9 AS returnflag",
        "c10 AS linestatus",
        "c11 AS shipdate",
        "c12 AS commitdate",
        "c13 AS receiptdate",
        "c14 AS shipmode",
        "c15 AS shipinstruct",
        "c16 AS comment"),
      sparkCast = Map("quantity" -> "double", "extendedprice" -> "double", "discount" -> "double", "tax" -> "double"), cases = Seq(
      "f1" -> "SELECT * FROM lineitem WHERE orderkey =  (SELECT max(orderkey) FROM orders)",
      "f2" -> "SELECT * FROM lineitem WHERE orderkey =  (SELECT orderkey FROM orders WHERE 0=1)",
      "f3" -> "SELECT * FROM lineitem WHERE  (SELECT orderkey FROM orders WHERE 0=1) is null",
      "f4" -> "SELECT * FROM lineitem WHERE  (SELECT orderkey FROM orders WHERE 0=1) is not null")),

    // Lineitem-orders star joins against an (almost-surely) empty rand()-filtered orders side (:1971-:1975) and the parenthesized-join form (:1676).
    "r125_ref_lineitem_orders_star" -> batchCols(
      Seq("a_orderkey", "a_partkey", "a_suppkey", "a_linenumber", "a_quantity", "a_extendedprice", "a_discount", "a_tax", "a_returnflag", "a_linestatus", "a_shipdate", "a_commitdate", "a_receiptdate", "a_shipmode", "a_shipinstruct", "a_comment", "b_orderkey", "b_custkey", "b_orderstatus", "b_totalprice", "b_orderdate", "b_orderpriority", "b_clerk", "b_shippriority", "b_comment"),
      Seq("c1 AS a_orderkey",
        "c2 AS a_partkey",
        "c3 AS a_suppkey",
        "c4 AS a_linenumber",
        "CAST(c5 AS DOUBLE) AS a_quantity",
        "CAST(c6 AS DOUBLE) AS a_extendedprice",
        "CAST(c7 AS DOUBLE) AS a_discount",
        "CAST(c8 AS DOUBLE) AS a_tax",
        "c9 AS a_returnflag",
        "c10 AS a_linestatus",
        "CAST(c11 AS VARCHAR) AS a_shipdate",
        "CAST(c12 AS VARCHAR) AS a_commitdate",
        "CAST(c13 AS VARCHAR) AS a_receiptdate",
        "c14 AS a_shipmode",
        "c15 AS a_shipinstruct",
        "c16 AS a_comment",
        "c17 AS b_orderkey",
        "c18 AS b_custkey",
        "c19 AS b_orderstatus",
        "CAST(c20 AS DOUBLE) AS b_totalprice",
        "CAST(c21 AS VARCHAR) AS b_orderdate",
        "c22 AS b_orderpriority",
        "c23 AS b_clerk",
        "c24 AS b_shippriority",
        "c25 AS b_comment"),
      sparkCast = Map("a_quantity" -> "double", "a_extendedprice" -> "double", "a_discount" -> "double", "a_tax" -> "double", "b_totalprice" -> "double", "b_orderdate" -> "string"), cases = Seq(
      ("e1", "SELECT * FROM lineitem a LEFT JOIN (SELECT * FROM orders WHERE orderkey = rand()) b ON a.orderkey = b.orderkey",
              "SELECT * FROM lineitem a LEFT JOIN (SELECT * FROM orders WHERE orderkey = random()) b ON a.orderkey = b.orderkey"),
      ("e2", "SELECT * FROM lineitem a LEFT JOIN (SELECT * FROM orders WHERE orderkey = rand()) b ON a.orderkey > b.orderkey",
              "SELECT * FROM lineitem a LEFT JOIN (SELECT * FROM orders WHERE orderkey = random()) b ON a.orderkey > b.orderkey"),
      ("e3", "SELECT * FROM lineitem a LEFT JOIN (SELECT * FROM orders WHERE orderkey = rand()) b ON 1 = 1",
              "SELECT * FROM lineitem a LEFT JOIN (SELECT * FROM orders WHERE orderkey = random()) b ON 1 = 1"),
      ("e4", "SELECT * FROM lineitem a LEFT JOIN (SELECT * FROM orders WHERE orderkey = rand()) b ON b.orderkey > 1",
              "SELECT * FROM lineitem a LEFT JOIN (SELECT * FROM orders WHERE orderkey = random()) b ON b.orderkey > 1"),
      ("e5", "SELECT * FROM lineitem a LEFT JOIN (SELECT * FROM orders WHERE orderkey = rand()) b ON b.orderkey > b.totalprice",
              "SELECT * FROM lineitem a LEFT JOIN (SELECT * FROM orders WHERE orderkey = random()) b ON b.orderkey > b.totalprice"),
      "e6" -> "SELECT * FROM (lineitem JOIN orders ON lineitem.orderkey = orders.orderkey) x")),

    // Orders-pair cross joins over deterministic LIMIT subqueries and the LIMIT-5 self equi-join (:5430-:5491).
    "r126_ref_orders_star_pairs" -> batchCols(
      Seq("a_orderkey", "a_custkey", "a_orderstatus", "a_totalprice", "a_orderdate", "a_orderpriority", "a_clerk", "a_shippriority", "a_comment", "b_orderkey", "b_custkey", "b_orderstatus", "b_totalprice", "b_orderdate", "b_orderpriority", "b_clerk", "b_shippriority", "b_comment"),
      Seq("c1 AS a_orderkey",
        "c2 AS a_custkey",
        "c3 AS a_orderstatus",
        "CAST(c4 AS DOUBLE) AS a_totalprice",
        "c5 AS a_orderdate",
        "c6 AS a_orderpriority",
        "c7 AS a_clerk",
        "c8 AS a_shippriority",
        "c9 AS a_comment",
        "c10 AS b_orderkey",
        "c11 AS b_custkey",
        "c12 AS b_orderstatus",
        "CAST(c13 AS DOUBLE) AS b_totalprice",
        "c14 AS b_orderdate",
        "c15 AS b_orderpriority",
        "c16 AS b_clerk",
        "c17 AS b_shippriority",
        "c18 AS b_comment"),
      sparkCast = Map("a_totalprice" -> "double", "b_totalprice" -> "double"), cases = Seq(
      "c1" -> "SELECT * FROM (SELECT * FROM orders ORDER BY orderkey LIMIT 3) a, (SELECT * FROM orders ORDER BY orderkey LIMIT 4) b",
      "c2" -> "SELECT * FROM (SELECT * FROM orders ORDER BY orderkey LIMIT 5) a, (SELECT * FROM orders ORDER BY orderkey LIMIT 2) b",
      "c4" -> "SELECT * FROM (SELECT * FROM orders ORDER BY orderkey LIMIT 5) a    JOIN (SELECT * FROM orders ORDER BY orderkey LIMIT 5) b    ON 123 = 123")),

    // COALESCE-doubling over an ORDER BY subquery (:3006), correlated
    // scalar aggregates with HAVING vs an outer value (:6146) and paired
    // per-row correlated averages (:6303).
    "r127_ref_correlated_scalars" -> batchCols(
      Seq("a", "b"),
      Seq("CAST(c1 AS DOUBLE) AS a", "CAST(c2 AS DOUBLE) AS b"),
      sparkCast = Map("a" -> "double", "b" -> "double"), cases = Seq(
      "c1" -> "SELECT nationkey, arbitrary_column + arbitrary_column FROM (    SELECT nationkey, COALESCE(arbitrary_column, 0) arbitrary_column    FROM (       SELECT nationkey, 1 arbitrary_column       FROM nation       ORDER BY 1 ASC))",
      "c3" -> "SELECT(SELECT avg(regionkey) FROM nation n2  WHERE n2.nationkey = n1.nationkey),(SELECT avg(regionkey)+1  FROM nation n3  WHERE n3.nationkey = n1.nationkey)FROM nation n1")),

    // Correlated scalar aggregate with HAVING vs an outer value (:6146).
    "r127b_ref_correlated_having" -> batchCols(
      Seq("v"), Seq("CAST(c1 AS DOUBLE) AS v"),
      sparkCast = Map("v" -> "double"), cases = Seq(
      ("h1", "SELECT (SELECT avg(totalprice) FROM orders GROUP BY custkey, orderdate HAVING avg(totalprice) < a) FROM (VALUES 900) t(a)",
             "SELECT (SELECT avg(totalprice) FROM orders GROUP BY custkey, orderdate HAVING avg(totalprice) < a) FROM (VALUES (900)) t(a)"))),

    // min/max over an all-NULL (unknown-typed) column per group (:188) —
    // the void columns dump via INT.
    "r128_ref_null_minmax" -> batchCols(
      Seq("clerk", "mn", "mx", "mnn", "mxn"),
      Seq("c1 AS clerk", "CAST(c2 AS DOUBLE) AS mn", "CAST(c3 AS DOUBLE) AS mx",
        "CAST(c4 AS INT) AS mnn", "CAST(c5 AS INT) AS mxn"),
      sparkCast = Map("mn" -> "double", "mx" -> "double",
        "mnn" -> "int", "mxn" -> "int"), cases = Seq(
      "g1" -> "SELECT clerk, min(totalprice), max(totalprice), min(nullvalue), max(nullvalue) FROM (SELECT clerk, totalprice, null AS nullvalue FROM orders) GROUP BY clerk")),

    // Transitive-equality join propagation over modulo splits (:6683) and
    // the grouped join-aggregate shape (:6704).
    "r129_ref_transitive_join" -> batchCols(
      Seq("k1", "k1a", "k1b", "k1c", "k2", "k2a", "k2b"),
      Seq("c1 AS k1", "c2 AS k1a", "c3 AS k1b", "c4 AS k1c",
        "c5 AS k2", "c6 AS k2a", "c7 AS k2b"), Seq(
      "t1" -> "SELECT * FROM (   SELECT custkey custkey1, custkey%4 custkey1a, custkey%8 custkey1b, custkey%16 custkey1c   FROM orders ) orders1  JOIN (   SELECT custkey custkey2, custkey%4 custkey2a, custkey%8 custkey2b   FROM orders ) orders2 ON orders1.custkey1 = orders2.custkey2 WHERE custkey2a = custkey2b   AND custkey1 = custkey1a   AND custkey2 = custkey2a   AND custkey1a = custkey1c   AND custkey1b = custkey1c   AND custkey1b % 2 = 0")),
    "r130_ref_grouped_join_agg" -> batchCols(
      Seq("custkey1", "orderstatus1", "totalprice", "maxcustkey"),
      Seq("c1 AS custkey1", "c2 AS orderstatus1",
        "CAST(c3 AS BIGINT) AS totalprice", "c4 AS maxcustkey"), Seq(
      ("t2", "SELECT * FROM (   SELECT custkey1, orderstatus1, SUM(totalprice1) totalprice, MAX(custkey2) maxcustkey   FROM (     SELECT *     FROM (       SELECT custkey custkey1, orderstatus orderstatus1, CAST(totalprice AS BIGINT) totalprice1, orderkey orderkey1       FROM orders     ) orders1      JOIN (       SELECT custkey custkey2, orderstatus orderstatus2, CAST(totalprice AS BIGINT) totalprice2, orderkey orderkey2       FROM orders     ) orders2 ON orders1.orderkey1 = orders2.orderkey2   )    GROUP BY custkey1, orderstatus1 ) WHERE custkey1 = maxcustkey AND maxcustkey % 2 = 0  AND orderstatus1 = 'F' AND totalprice > 10000 ORDER BY custkey1, orderstatus1, totalprice, maxcustkey",
             "SELECT * FROM (   SELECT custkey1, orderstatus1, SUM(totalprice1) totalprice, MAX(custkey2) maxcustkey   FROM (     SELECT *     FROM (       SELECT custkey custkey1, orderstatus orderstatus1, CAST(floor(totalprice + 0.5) AS BIGINT) totalprice1, orderkey orderkey1       FROM orders     ) orders1      JOIN (       SELECT custkey custkey2, orderstatus orderstatus2, CAST(floor(totalprice + 0.5) AS BIGINT) totalprice2, orderkey orderkey2       FROM orders     ) orders2 ON orders1.orderkey1 = orders2.orderkey2   )    GROUP BY custkey1, orderstatus1 ) WHERE custkey1 = maxcustkey AND maxcustkey % 2 = 0  AND orderstatus1 = 'F' AND totalprice > 10000 ORDER BY custkey1, orderstatus1, totalprice, maxcustkey"))),

    // Projected IN reused as GROUP BY key + HAVING on a conditional sum
    // over another IN (:5554) — oracle drops the IN GROUP BY term DuckDB
    // cannot hold (it is NOT constant, so the oracle groups by the
    // expression via a subquery instead).
    "r131_ref_semijoin_group_reuse" -> batchCols(
      Seq("b", "s"),
      Seq("CAST(c1 AS INT) AS b", "CAST(c2 AS BIGINT) AS s"),
      sparkCast = Map("b" -> "int"), cases = Seq(
      ("g1", "SELECT orderkey   IN (     SELECT orderkey     FROM lineitem     WHERE partkey % 4 = 0),   SUM(     CASE       WHEN orderkey         IN (           SELECT orderkey           FROM lineitem           WHERE suppkey % 4 = 0)       THEN 1       ELSE 0       END) FROM orders GROUP BY orderkey   IN (     SELECT orderkey     FROM lineitem     WHERE partkey % 4 = 0) HAVING SUM(   CASE     WHEN orderkey       IN (         SELECT orderkey         FROM lineitem         WHERE suppkey % 4 = 0)       THEN 1       ELSE 0       END) > 1",
             "SELECT ink, SUM(CASE WHEN orderkey IN (SELECT orderkey FROM lineitem WHERE suppkey % 4 = 0) THEN 1 ELSE 0 END) FROM (SELECT orderkey, orderkey IN (SELECT orderkey FROM lineitem WHERE partkey % 4 = 0) AS ink FROM orders) GROUP BY ink HAVING SUM(CASE WHEN orderkey IN (SELECT orderkey FROM lineitem WHERE suppkey % 4 = 0) THEN 1 ELSE 0 END) > 1"))),

    // AbstractTestAggregations single-value statements: filtered COUNT, SUM-DISTINCT over an aggregate subquery, constant-NULL grouping keys, GROUP BY over a projected subquery.
    "r132_ref_agg_singles" -> batchCols(
      Seq("n"),
      Seq("CAST(c1 AS BIGINT) AS n"),
      Seq(
      "a1" -> "SELECT COUNT(*) FROM orders WHERE orderstatus = 'F'",
      "a2" -> "SELECT SUM(DISTINCT x) FROM (SELECT custkey, COUNT(DISTINCT orderstatus) x FROM orders GROUP BY custkey) t",
      "a3" -> "SELECT count(*) FROM (   SELECT CAST(null AS VARCHAR) constant, orderdate   FROM orders ) a group by constant, orderdate ",
      "a4" -> "SELECT * FROM (SELECT orderkey FROM orders) t GROUP BY orderkey")),

    // Re-aggregation over aggregates, CASE grouping keys with NULL/0 collisions, DISTINCT counts over empty inputs, mixed DISTINCT+non-DISTINCT, duplicated maxes.
    "r133_ref_agg_pairs" -> batchCols(
      Seq("a", "b"),
      Seq("CAST(c1 AS BIGINT) AS a",
        "CAST(c2 AS BIGINT) AS b"),
      Seq(
      "p1" -> "SELECT custkey, sum(t) FROM (SELECT custkey, count(*) t FROM orders GROUP BY custkey) GROUP BY custkey",
      "p2" -> "SELECT key, COUNT(*) FROM (SELECT CASE   WHEN orderkey % 3 = 0 THEN NULL   WHEN orderkey % 5 = 0 THEN 0   ELSE orderkey   END AS key FROM lineitem) GROUP BY key",
      "p3" -> "SELECT lines, COUNT(*) FROM (SELECT orderkey, COUNT(*) lines FROM lineitem GROUP BY orderkey) U GROUP BY lines",
      "p4" -> "SELECT COUNT(DISTINCT linenumber), COUNT(*) from lineitem where linenumber < 0",
      "p5" -> "SELECT custkey, COUNT(DISTINCT orderstatus) FROM (   SELECT orders.custkey AS custkey, orders.orderstatus AS orderstatus    FROM lineitem JOIN orders ON lineitem.orderkey = orders.orderkey AND orders.orderkey = lineitem.partkey    GROUP BY orders.custkey, orders.orderstatus) GROUP BY custkey",
      "p6" -> "SELECT COUNT(tan(shippriority)), sum(DISTINCT orderkey) FROM orders",
      "p7" -> "SELECT COUNT(DISTINCT orderstatus), SUM(DISTINCT custkey) FROM orders",
      "p8" -> "SELECT max(a), max(b) FROM (SELECT custkey a, custkey b FROM orders) x",
      "p9" -> "SELECT suppkey, SUM(CAST(quantity AS BIGINT)) FROM lineitem GROUP BY suppkey")),

    // Multiple DISTINCT aggregates per group (MarkDistinct shapes).
    "r134_ref_agg_trios" -> batchCols(
      Seq("a", "b", "c"),
      Seq("CAST(c1 AS BIGINT) AS a",
        "CAST(c2 AS BIGINT) AS b",
        "CAST(c3 AS BIGINT) AS c"),
      Seq(
      "t1" -> "SELECT custkey, COUNT(DISTINCT orderkey), COUNT(DISTINCT orderstatus) FROM orders GROUP BY custkey",
      "t2" -> "SELECT partkey, COUNT(DISTINCT shipdate), SUM(linenumber) FROM lineitem GROUP BY partkey")),

    // Aggregations mixing group keys, DISTINCT sums and string maxes.
    "r135_ref_agg_mixed" -> batchCols(
      Seq("a", "b", "c"),
      Seq("CAST(c1 AS VARCHAR) AS a",
        "CAST(c2 AS VARCHAR) AS b",
        "CAST(c3 AS VARCHAR) AS c"),
      sparkCast = Map("a" -> "string", "b" -> "string", "c" -> "string"), cases = Seq(
      "m1" -> "SELECT custkey, orderstatus, COUNT(DISTINCT orderkey) FROM orders GROUP BY custkey, orderstatus",
      "m2" -> "SELECT max(orderstatus), COUNT(DISTINCT orderkey), sum(DISTINCT orderkey) FROM orders",
      "m3" -> "SELECT max(orderstatus), COUNT(DISTINCT shippriority), sum(DISTINCT orderkey) FROM orders",
      "m4" -> "SELECT shippriority, MAX(orderstatus), SUM(DISTINCT shippriority) FROM orders GROUP BY shippriority",
      "m5" -> "SELECT shippriority, COUNT(shippriority), SUM(DISTINCT orderkey) FROM orders GROUP BY shippriority",
      "m6" -> "SELECT shippriority, COUNT(shippriority), SUM(DISTINCT shippriority) FROM orders GROUP BY shippriority",
      "m7" -> "SELECT custkey, orderstatus, MAX(orderkey) FROM orders WHERE orderkey = 1 GROUP BY custkey, orderstatus",
      "m8" -> "SELECT custkey, orderstatus, COUNT(*) FROM orders GROUP BY custkey, orderstatus")),

    // Four-column aggregation shapes (negated counts, per-clerk DISTINCT sums).
    "r136_ref_agg_quads" -> batchCols(
      Seq("a", "b", "c", "d"),
      Seq("CAST(c1 AS VARCHAR) AS a",
        "CAST(c2 AS VARCHAR) AS b",
        "CAST(c3 AS VARCHAR) AS c",
        "CAST(c4 AS VARCHAR) AS d"),
      sparkCast = Map("a" -> "string", "b" -> "string", "c" -> "string", "d" -> "string"), cases = Seq(
      "q1" -> "SELECT custkey, orderstatus, avg(shippriority), SUM(DISTINCT orderkey) FROM orders GROUP BY custkey, orderstatus",
      "q2" -> "SELECT clerk, shippriority, MAX(orderstatus), SUM(DISTINCT shippriority) FROM orders GROUP BY clerk, shippriority",
      "q3" -> "SELECT clerk, shippriority, COUNT(shippriority), SUM(DISTINCT orderkey) FROM orders GROUP BY clerk, shippriority",
      "q4" -> "SELECT clerk, shippriority, COUNT(shippriority), SUM(DISTINCT shippriority) FROM orders GROUP BY clerk, shippriority",
      "q5" -> "SELECT orderstatus, a, custkey, b FROM (SELECT custkey, orderstatus, -COUNT(*) a, MAX(orderkey) b FROM orders WHERE orderkey = 1 GROUP BY custkey, orderstatus) T")),

    // Re-grouping by (orderdate, count) trio.
    "r137_ref_agg_dates" -> batchCols(
      Seq("orderdate", "c", "n"),
      Seq("c1 AS orderdate",
        "CAST(c2 AS BIGINT) AS c",
        "CAST(c3 AS BIGINT) AS n"),
      Seq(
      "d1" -> "SELECT orderdate, c, count(*) FROM (SELECT orderdate, count(*) c FROM orders GROUP BY orderdate) GROUP BY orderdate, c")),

    // Ordered DISTINCT count per orderdate (:196).
    "r137b_ref_agg_ordered_distinct" -> batchCols(
      Seq("count", "orderdate"),
      Seq("CAST(c1 AS BIGINT) AS count",
        "c2 AS orderdate"),
      Seq(
      "d2" -> "SELECT COUNT(DISTINCT clerk) AS count, orderdate FROM orders GROUP BY orderdate ORDER BY count, orderdate")),

    // Double-sum arithmetic identities (:310-:311).
    "r138_ref_agg_double_arith" -> batchCols(
      Seq("v"),
      Seq("CAST(CAST(c1 AS DECIMAL(38,0)) AS DOUBLE) AS v"),
      sparkCast = Map("v" -> "decimal(38,0)"), cases = Seq(
      "x1" -> "SELECT sum(totalprice * 2) - sum(totalprice) FROM orders",
      "x2" -> "SELECT sum(totalprice * 2) + sum(totalprice * 2) FROM orders")),

    // BETWEEN as a grouping key (:443).
    "r138b_ref_groupby_between" -> batchCols(
      Seq("v"),
      Seq("c1 AS v"),
      Seq(
      "x1" -> "SELECT orderkey BETWEEN 1 AND 100 FROM orders GROUP BY orderkey BETWEEN 1 AND 100 ")),

    // DISTINCT over INTERSECT joined to nation (:376).
    "r138c_ref_setop_join_distinct" -> batchCols(
      Seq("v"),
      Seq("CAST(c1 AS INT) AS v"),
      Seq(
      "x1" -> "SELECT DISTINCT r1.regionkey FROM (SELECT regionkey FROM region INTERSECT SELECT regionkey FROM region WHERE regionkey < 4) AS r1 LEFT JOIN nation ON r1.regionkey = nation.regionkey")),

    // SUM of a typed NULL per group (:122).
    "r138d_ref_null_sum_group" -> batchCols(
      Seq("k", "s"),
      Seq("c1 AS k",
        "CAST(c2 AS BIGINT) AS s"),
      sparkCast = Map("s" -> "bigint"), cases = Seq(
      "x1" -> "SELECT orderstatus, sum(CAST(NULL AS BIGINT)) FROM orders GROUP BY orderstatus")),

    // Aggregate over a subquery mixing avg and SUM DISTINCT (:223).
    "r138e_ref_agg_over_distinct_avg" -> batchCols(
      Seq("s", "mx", "sa"),
      Seq("CAST(c1 AS BIGINT) AS s",
        "CAST(c2 AS BIGINT) AS mx",
        "CAST(CAST(c3 AS DECIMAL(38,6)) AS DOUBLE) AS sa"),
      sparkCast = Map("sa" -> "decimal(38,6)"), cases = Seq(
      "x1" -> "SELECT s, MAX(custkey), SUM(a) FROM (    SELECT custkey, avg(shippriority) AS a, SUM(DISTINCT orderkey) AS s FROM orders GROUP BY custkey, orderstatus) GROUP BY s")),

    // Decimal literal divided by COUNT(*) (:323-:324) — decimal division result gated at 10 fractional digits (result scales differ per engine).
    "r138f_ref_decimal_over_count" -> batchCols(
      Seq("v"),
      Seq("CAST(CAST(c1 AS DECIMAL(30,10)) AS DOUBLE) AS v"),
      sparkCast = Map("v" -> "decimal(30,10)"), cases = Seq(
      "x1" -> "SELECT 1.0 / COUNT(*) FROM orders")),

    // now()-derived constant grouping keys (:623-:630; both engines evaluate at run time — same year).
    "r138g_ref_now_grouping" -> batchCols(
      Seq("y", "n"),
      Seq("CAST(c1 AS INT) AS y",
        "CAST(c2 AS BIGINT) AS n"),
      sparkCast = Map("y" -> "int"), cases = Seq(
      "x1" -> "SELECT EXTRACT(YEAR FROM now()), count(*) FROM orders GROUP BY EXTRACT(YEAR FROM now())",
      "x2" -> "SELECT EXTRACT(YEAR FROM now()), count(*) FROM orders GROUP BY now()")),

    // AbstractTestIndexedQueries + smoke-test single-value statements — the index-join probe shapes run through broadcast/hash joins.
    "r139_ref_index_counts" -> batchCols(
      Seq("n"),
      Seq("CAST(c1 AS DOUBLE) AS n"),
      sparkCast = Map("n" -> "double"), cases = Seq(
      "c01" -> "SELECT COUNT(*) FROM lineitem JOIN orders ON lineitem.orderkey = orders.orderkey AND orders.custkey = 1",
      "c02" -> "SELECT COUNT(*) FROM orders o RIGHT JOIN (   SELECT *   FROM lineitem   WHERE partkey % 8 = 0) l   ON o.orderkey = l.orderkey",
      "c03" -> "SELECT COUNT(*) FROM (   SELECT *   FROM lineitem   WHERE partkey % 8 = 0) l RIGHT JOIN orders o   ON l.orderkey = o.orderkey",
      "c04" -> "SELECT COUNT(*) FROM lineitem LEFT OUTER JOIN orders ON lineitem.orderkey = orders.orderkey AND lineitem.quantity > 5 WHERE orders.orderkey IS NULL",
      "c05" -> "SELECT COUNT(*) FROM orders RIGHT OUTER JOIN lineitem ON lineitem.orderkey = orders.orderkey AND lineitem.quantity > 5 WHERE orders.orderkey IS NULL",
      "c06" -> "SELECT COUNT(*) FROM lineitem JOIN orders ON lineitem.orderkey = orders.orderkey AND lineitem.quantity + length(orders.comment) > 7",
      "c07" -> "SELECT SUM(orderkey) FROM ORDERS",
      "c08" -> "SELECT COUNT(*) FROM ORDERS")),

    // Index-join probe stars: filtered lineitem joined to full orders, both sides projected.
    "r140_ref_index_star25" -> batchCols(
      Seq("a_orderkey", "a_partkey", "a_suppkey", "a_linenumber", "a_quantity", "a_extendedprice", "a_discount", "a_tax", "a_returnflag", "a_linestatus", "a_shipdate", "a_commitdate", "a_receiptdate", "a_shipmode", "a_shipinstruct", "a_comment", "b_orderkey", "b_custkey", "b_orderstatus", "b_totalprice", "b_orderdate", "b_orderpriority", "b_clerk", "b_shippriority", "b_comment"),
      Seq("c1 AS a_orderkey",
        "c2 AS a_partkey",
        "c3 AS a_suppkey",
        "c4 AS a_linenumber",
        "CAST(c5 AS DOUBLE) AS a_quantity",
        "CAST(c6 AS DOUBLE) AS a_extendedprice",
        "CAST(c7 AS DOUBLE) AS a_discount",
        "CAST(c8 AS DOUBLE) AS a_tax",
        "c9 AS a_returnflag",
        "c10 AS a_linestatus",
        "CAST(c11 AS VARCHAR) AS a_shipdate",
        "CAST(c12 AS VARCHAR) AS a_commitdate",
        "CAST(c13 AS VARCHAR) AS a_receiptdate",
        "c14 AS a_shipmode",
        "c15 AS a_shipinstruct",
        "c16 AS a_comment",
        "c17 AS b_orderkey",
        "c18 AS b_custkey",
        "c19 AS b_orderstatus",
        "CAST(c20 AS DOUBLE) AS b_totalprice",
        "CAST(c21 AS VARCHAR) AS b_orderdate",
        "c22 AS b_orderpriority",
        "c23 AS b_clerk",
        "c24 AS b_shippriority",
        "c25 AS b_comment"),
      sparkCast = Map("a_shipdate" -> "string", "a_commitdate" -> "string",
        "a_receiptdate" -> "string", "b_orderdate" -> "string", "a_quantity" -> "double", "a_extendedprice" -> "double", "a_discount" -> "double", "a_tax" -> "double", "b_totalprice" -> "double"), cases = Seq(
      "c01" -> "SELECT * FROM (   SELECT *   FROM lineitem   WHERE partkey % 8 = 0) l JOIN orders o   ON l.orderkey = o.orderkey",
      "c02" -> "SELECT * FROM (   SELECT *   FROM lineitem   WHERE partkey % 8 = 0) l LEFT JOIN orders o   ON l.orderkey = o.orderkey",
      "c03" -> "SELECT * FROM (   SELECT *   FROM lineitem   WHERE partkey % 8 = 0) l JOIN orders o   ON l.orderkey % 1024 = o.orderkey AND l.partkey % 1024 = o.orderkey",
      "c04" -> "SELECT * FROM (   SELECT *   FROM lineitem   WHERE partkey % 8 = 0) l LEFT JOIN orders o   ON l.orderkey % 1024 = o.orderkey AND l.partkey % 1024 = o.orderkey",
      "c05" -> "SELECT * FROM (   SELECT *   FROM lineitem   WHERE partkey % 8 = 0) l JOIN orders o   ON l.orderkey = o.orderkey AND l.orderkey = o.custkey",
      "c06" -> "SELECT * FROM (   SELECT *   FROM lineitem   WHERE partkey % 8 = 0) l LEFT JOIN orders o   ON l.orderkey = o.orderkey AND l.orderkey = o.custkey",
      "c07" -> "SELECT * FROM (   SELECT *   FROM lineitem   WHERE partkey % 8 = 0) l JOIN orders o   ON l.orderkey = o.orderkey AND l.orderkey = o.orderkey")),

    // Smoke-test orders star probes (point/IN/null-mix predicates).
    "r141_ref_index_star9" -> batchCols(
      Seq("orderkey", "custkey", "orderstatus", "totalprice", "orderdate", "orderpriority", "clerk", "shippriority", "comment"),
      Seq("c1 AS orderkey",
        "c2 AS custkey",
        "c3 AS orderstatus",
        "CAST(c4 AS DOUBLE) AS totalprice",
        "c5 AS orderdate",
        "c6 AS orderpriority",
        "c7 AS clerk",
        "c8 AS shippriority",
        "c9 AS comment"),
      sparkCast = Map("totalprice" -> "double"), cases = Seq(
      "c01" -> "SELECT * FROM ORDERS WHERE orderkey = 10",
      "c02" -> "SELECT * FROM ORDERS WHERE orderkey IN (10, 11, 20, 21)",
      "c03" -> "SELECT * FROM ORDERS WHERE orderkey = 10 OR orderkey IS NULL",
      "c04" -> "SELECT * FROM ORDERS WHERE orderkey BETWEEN 10 AND 50 or orderkey BETWEEN 100 AND 150",
      "c05" -> "SELECT * FROM ORDERS WHERE orderkey BETWEEN 10 AND 50",
      "c06" -> "SELECT * FROM ORDERS")),

    // Probe-key + orders star (CASE-nulled and projected keys).
    "r142_ref_index_key_star" -> batchCols(
      Seq("k1", "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority", "o_clerk", "o_shippriority", "o_comment"),
      Seq("c1 AS k1",
        "c2 AS o_orderkey",
        "c3 AS o_custkey",
        "c4 AS o_orderstatus",
        "CAST(c5 AS DOUBLE) AS o_totalprice",
        "c6 AS o_orderdate",
        "c7 AS o_orderpriority",
        "c8 AS o_clerk",
        "c9 AS o_shippriority",
        "c10 AS o_comment"),
      sparkCast = Map("o_totalprice" -> "double"), cases = Seq(
      "c01" -> "SELECT * FROM (   SELECT CASE WHEN suppkey % 2 = 0 THEN orderkey ELSE NULL END AS orderkey   FROM lineitem   WHERE partkey % 8 = 0) l JOIN orders o   ON l.orderkey = o.orderkey",
      "c02" -> "SELECT * FROM (   SELECT orderkey   FROM lineitem   WHERE partkey % 8 = 0) l JOIN orders o   ON l.orderkey = o.orderkey WHERE o.orderstatus = 'F'",
      "c03" -> "SELECT * FROM (   SELECT orderkey   FROM lineitem   WHERE partkey % 8 = 0) l JOIN orders o   ON l.orderkey = o.orderkey WHERE o.orderstatus = 'F'   AND o.custkey % 2 = 0")),

    // Two probe columns + orders star (CASE orderstatus keys).
    "r143_ref_index_twokey_star" -> batchCols(
      Seq("k1", "k2", "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority", "o_clerk", "o_shippriority", "o_comment"),
      Seq("c1 AS k1",
        "c2 AS k2",
        "c3 AS o_orderkey",
        "c4 AS o_custkey",
        "c5 AS o_orderstatus",
        "CAST(c6 AS DOUBLE) AS o_totalprice",
        "c7 AS o_orderdate",
        "c8 AS o_orderpriority",
        "c9 AS o_clerk",
        "c10 AS o_shippriority",
        "c11 AS o_comment"),
      sparkCast = Map("o_totalprice" -> "double"), cases = Seq(
      "c01" -> "SELECT * FROM (   SELECT orderkey, CASE WHEN suppkey % 2 = 0 THEN 'F' ELSE 'O' END AS orderstatus   FROM lineitem   WHERE partkey % 8 = 0) l JOIN orders o   ON l.orderkey = o.orderkey AND l.orderstatus = o.orderstatus",
      "c02" -> "SELECT * FROM (   SELECT orderkey, CASE WHEN suppkey % 2 = 0 THEN 'F' ELSE 'O' END AS orderstatus   FROM lineitem   WHERE partkey % 8 = 0) l JOIN orders o   ON l.orderstatus = o.orderstatus AND l.orderkey = o.orderkey")),

    // Lineitem star joined to two-column probe sides.
    "r144_ref_index_lineitem_pairs" -> batchCols(
      Seq("a_orderkey", "a_partkey", "a_suppkey", "a_linenumber", "a_quantity", "a_extendedprice", "a_discount", "a_tax", "a_returnflag", "a_linestatus", "a_shipdate", "a_commitdate", "a_receiptdate", "a_shipmode", "a_shipinstruct", "a_comment", "b_k1", "b_k2"),
      Seq("c1 AS a_orderkey",
        "c2 AS a_partkey",
        "c3 AS a_suppkey",
        "c4 AS a_linenumber",
        "CAST(c5 AS DOUBLE) AS a_quantity",
        "CAST(c6 AS DOUBLE) AS a_extendedprice",
        "CAST(c7 AS DOUBLE) AS a_discount",
        "CAST(c8 AS DOUBLE) AS a_tax",
        "c9 AS a_returnflag",
        "c10 AS a_linestatus",
        "CAST(c11 AS VARCHAR) AS a_shipdate",
        "CAST(c12 AS VARCHAR) AS a_commitdate",
        "CAST(c13 AS VARCHAR) AS a_receiptdate",
        "c14 AS a_shipmode",
        "c15 AS a_shipinstruct",
        "c16 AS a_comment",
        "c17 AS b_k1",
        "c18 AS b_k2"),
      sparkCast = Map("a_quantity" -> "double", "a_extendedprice" -> "double", "a_discount" -> "double", "a_tax" -> "double"), cases = Seq(
      "c01" -> "SELECT * FROM (   SELECT *   FROM lineitem   WHERE partkey % 8 = 0) l JOIN (   SELECT orderkey, COUNT(*)   FROM orders   WHERE custkey % 8 = 0   GROUP BY orderkey   ORDER BY orderkey) o   ON l.orderkey = o.orderkey",
      "c02" -> "SELECT * FROM (   SELECT *   FROM lineitem   WHERE partkey % 8 = 0) x JOIN (   SELECT o1.orderkey as orderkey, o2.custkey as custkey   FROM orders o1   JOIN orders o2     ON o1.orderkey = o2.orderkey) y   ON x.orderkey = y.orderkey ",
      "c03" -> "SELECT * FROM (   SELECT *   FROM lineitem   WHERE partkey % 8 = 0) x JOIN (   SELECT l.orderkey as orderkey, o.custkey as custkey   FROM lineitem l   JOIN orders o     ON l.orderkey = o.orderkey) y   ON x.orderkey = y.orderkey ")),

    // Four-bigint index-join projections.
    "r145_ref_index_quads" -> batchCols(
      Seq("a", "b", "c", "d"),
      Seq("CAST(c1 AS DOUBLE) AS a",
        "CAST(c2 AS DOUBLE) AS b",
        "CAST(c3 AS DOUBLE) AS c",
        "CAST(c4 AS DOUBLE) AS d"),
      sparkCast = Map("a" -> "double", "b" -> "double", "c" -> "double",
        "d" -> "double"), cases = Seq(
      "c01" -> "SELECT * FROM (   SELECT orderkey % 64 AS a, suppkey % 2 AS b   FROM lineitem   WHERE partkey % 8 = 0) l JOIN (   SELECT orderkey AS a, SUM(LENGTH(comment)) % 2 AS b   FROM orders   GROUP BY orderkey) o   ON l.a = o.a AND l.b = o.b",
      "c02" -> "SELECT * FROM (   SELECT orderkey % 64 AS a, (suppkey % 2) + 1 AS b   FROM lineitem   WHERE partkey % 8 = 0) l JOIN (   SELECT orderkey AS a, SUM(LENGTH(comment)) % 2 AS b   FROM orders   GROUP BY orderkey) o   ON l.a = o.a AND l.b = o.b")),

    // Correlated-INEQUALITY subqueries (:6263-:6488): EXISTS and scalar
    // averages correlated through `o.orderkey < i.orderkey` — the
    // decorrelation shapes Spark plans as ranged joins. At the fixture's
    // orderkey range the %10000 build sides are empty, so oracles use the
    // %1000/%100 spellings verbatim where given and the same text
    // elsewhere (DuckDB runs inequality correlation natively). The EXISTS
    // GROUP BY key again drops for DuckDB (orderkey-determined).
    "r146_ref_correlated_inequality" -> batchCols(
      Seq("a", "b"),
      Seq("CAST(c1 AS VARCHAR) AS a", "CAST(c2 AS VARCHAR) AS b"),
      sparkCast = Map("a" -> "string", "b" -> "string"), cases = Seq(
      ("i1", "SELECT count(*), 0 FROM orders o WHERE EXISTS(SELECT 1 FROM orders i WHERE o.orderkey < i.orderkey AND i.orderkey % 1000 = 0)"),
      ("i2", "SELECT max(o.orderdate), o.orderkey FROM orders o GROUP BY o.orderkey HAVING 40000 < (SELECT avg(i.orderkey) FROM orders i WHERE o.orderkey < i.orderkey AND i.orderkey % 10000 = 0)ORDER BY o.orderkey LIMIT 1"),
      ("i3", "SELECT max(o.orderdate), o.orderkey FROM orders o GROUP BY o.orderkey HAVING EXISTS(SELECT 1 FROM orders i WHERE o.orderkey < i.orderkey AND i.orderkey % 1000 = 0)ORDER BY o.orderkey LIMIT 1"),
      ("i4", "SELECT max(o.orderdate), o.orderkey FROM orders o GROUP BY o.orderkey, EXISTS(SELECT 1 FROM orders i WHERE o.orderkey < i.orderkey AND i.orderkey % 1000 = 0)ORDER BY o.orderkey LIMIT 1",
             "SELECT max(o.orderdate), o.orderkey FROM orders o GROUP BY o.orderkey ORDER BY o.orderkey LIMIT 1"))),

    // Date-arithmetic join residuals (:1591-:1597 — INTERVAL addition and
    // quoted-unit DATE_ADD in ON clauses) and the reference's test PLUGIN
    // functions (CustomAdd/CustomSum wired through the UDF surface;
    // oracles use the reference's own arithmetic equivalents).
    "r147_ref_date_residual_joins" -> batchCols(
      Seq("orderkey", "orderdate", "shipdate"),
      Seq("c1 AS orderkey", "c2 AS orderdate", "c3 AS shipdate"), Seq(
      "d1" -> "SELECT o.orderkey, o.orderdate, l.shipdate FROM orders o JOIN lineitem l ON l.orderkey = o.orderkey AND l.shipdate < o.orderdate + INTERVAL '10' DAY",
      ("d2", "SELECT o.orderkey, o.orderdate, l.shipdate FROM lineitem l JOIN orders o ON l.orderkey = o.orderkey AND l.shipdate < DATE_ADD('DAY', 10, o.orderdate)",
             "SELECT o.orderkey, o.orderdate, l.shipdate FROM lineitem l JOIN orders o ON l.orderkey = o.orderkey AND l.shipdate < o.orderdate + INTERVAL '10' DAY"),
      "d3" -> "SELECT o.orderkey, o.orderdate, l.shipdate FROM orders o JOIN lineitem l ON o.orderkey=l.orderkey AND o.orderdate + INTERVAL '2' DAY <= l.shipdate AND l.shipdate < o.orderdate + INTERVAL '7' DAY")),
    "r148_ref_full_join_const" -> batch(Seq(
      "f1" -> "SELECT COUNT(*) FROM lineitem FULL JOIN orders ON lineitem.orderkey = orders.orderkey AND orders.orderkey = 2",
      "f2" -> "SELECT COUNT(*) FROM lineitem FULL JOIN orders ON lineitem.orderkey = orders.orderkey AND lineitem.orderkey = 2")),
    "r149_ref_custom_sum" -> batchCols(
      Seq("orderstatus", "s"),
      Seq("c1 AS orderstatus", "CAST(c2 AS BIGINT) AS s"), Seq(
      ("c1", "SELECT orderstatus, custom_sum(orderkey) FROM orders GROUP BY orderstatus",
             "SELECT orderstatus, sum(orderkey) FROM orders GROUP BY orderstatus"))),
    "r149b_ref_custom_add" -> batch(Seq(
      ("c1", "SELECT custom_add(orderkey, custkey) FROM orders",
             "SELECT orderkey + custkey FROM orders"))),

    // Chained correlated LATERAL derived tables (:7959-:7970) — each
    // LATERAL references columns introduced by the previous one.
    "r150_ref_lateral_chain" -> batchCols(
      Seq("a", "b", "c", "d"),
      Seq("CAST(c1 AS VARCHAR) AS a", "CAST(c2 AS VARCHAR) AS b",
        "CAST(c3 AS VARCHAR) AS c", "CAST(c4 AS VARCHAR) AS d"),
      sparkCast = Map("a" -> "string", "b" -> "string", "c" -> "string",
        "d" -> "string"), cases = Seq(
      "l1" -> "SELECT nationkey, a, b, name FROM nation, LATERAL (SELECT nationkey + 2 AS a), LATERAL (SELECT a * -1 AS b) ORDER BY b LIMIT 1")),
    "r150b_ref_lateral_chain_prices" -> batchCols(
      Seq("quantity", "extendedprice", "avg_price", "low", "high"),
      Seq("CAST(c1 AS DOUBLE) AS quantity", "CAST(c2 AS DOUBLE) AS extendedprice",
        "CAST(CAST(c3 AS DECIMAL(38,6)) AS DOUBLE) AS avg_price",
        "CAST(CAST(c4 AS DECIMAL(38,6)) AS DOUBLE) AS low",
        "CAST(CAST(c5 AS DECIMAL(38,6)) AS DOUBLE) AS high"),
      sparkCast = Map("quantity" -> "double", "extendedprice" -> "double",
        "avg_price" -> "decimal(38,6)", "low" -> "decimal(38,6)",
        "high" -> "decimal(38,6)"), cases = Seq(
      "l2" -> "SELECT quantity, extendedprice, avg_price, low, high FROM lineitem, LATERAL (SELECT extendedprice / quantity AS avg_price) average_price, LATERAL (SELECT avg_price * 0.9 AS low) lower_bound, LATERAL (SELECT avg_price * 1.1 AS high) upper_bound ORDER BY extendedprice, quantity LIMIT 1")),

    // AbstractTestQueries.java:3961 testWindowFrames — per-row ROWS frame
    // bounds (Presto's FrameInfo takes a bound CHANNEL). Verbatim text;
    // PrestoSql.dynamicFrames lowers it to a slice of the collected
    // partition. DuckDB can't express per-row bounds either, so the oracle
    // replays the frame as a correlated row_number-range subquery (`//`
    // for Presto truncating integer division).
    "r151_ref_dynamic_frames" -> one(
      "SELECT * FROM (  SELECT orderkey, orderstatus, sum(orderkey + 1000) OVER (PARTITION BY orderstatus ORDER BY orderkey ROWS BETWEEN mod(custkey, 2) PRECEDING AND custkey / 500 FOLLOWING) FROM (SELECT * FROM orders ORDER BY orderkey LIMIT 10) x ) x ORDER BY orderkey LIMIT 5",
      Seq("orderkey", "orderstatus", "s"),
      Seq("CAST(c1 AS BIGINT) AS orderkey", "c2 AS orderstatus",
        "CAST(c3 AS BIGINT) AS s"),
      oracleSql = "WITH x AS (SELECT * FROM orders ORDER BY orderkey LIMIT 10), " +
        "num AS (SELECT orderkey, orderstatus, custkey, row_number() OVER (PARTITION BY orderstatus ORDER BY orderkey) AS r FROM x) " +
        "SELECT a.orderkey, a.orderstatus, (SELECT sum(b.orderkey + 1000) FROM num b WHERE b.orderstatus = a.orderstatus AND b.r BETWEEN a.r - (a.custkey % 2) AND a.r + a.custkey // 500) " +
        "FROM num a ORDER BY a.orderkey LIMIT 5"),

    // presto-main scalar-semantics sweep (round 5): unicode chr/codepoint,
    // interleaving replace, beyond-head substr, codepoint split_part,
    // signed to_base/from_base, null-propagating is_nan, unary greatest,
    // Presto typeof spellings, first-occurrence url parameter, json null
    // element, canonical json_parse, CHAR(n) padding, null-poisoned
    // array_min, IEEE 0/0, LIKE without a default escape, map equality.
    // Expected values are the reference's own assertFunction literals
    // (TestStringFunctions/TestMathFunctions/TestJsonFunctions/...);
    // the DuckDB oracle replays them as literals.
    "r152_ref_scalar_semantics" -> one(
      "SELECT chr(9731) AS c_chr, codepoint(chr(128077)) AS c_cp, " +
        "replace('abc', '', 'xx') AS c_rep, " +
        "substr('Quadratically', -50) AS c_sub, " +
        "split_part('abc', '', 4) AS c_sp, " +
        "to_base(-2147483647, 16) AS c_tb, " +
        "from_base('-7fffffff', 16) AS c_fb, " +
        "CAST(is_nan(CAST(NULL AS DOUBLE)) AS INTEGER) AS c_nan, " +
        "greatest(-1) AS c_gr, typeof(123) AS c_ty, " +
        "url_extract_parameter('http://example.com/p.php?k1=v1&k3&k4', 'k3') AS c_url, " +
        "json_array_get('[\"jhfa\", null]', 1) AS c_jag, " +
        "json_parse(' { \"b\" : 2 , \"a\" : 1 } ') AS c_jp, " +
        "length(CAST('hello' AS CHAR(20))) AS c_chlen, " +
        "date_format(TIMESTAMP '2001-01-09 13:04:05', '%x %v') AS c_wk, " +
        "array_min(ARRAY[NULL, 2, 3]) AS c_amin, " +
        "CAST(is_nan(0.0E0 / 0.0E0) AS INTEGER) AS c_ieee, " +
        "CAST(('_monkey_' LIKE '\\_monkey\\_') AS INTEGER) AS c_like, " +
        "CAST((MAP(ARRAY[1, 3], ARRAY[2, 4]) = MAP(ARRAY[3, 1], ARRAY[4, 2])) AS INTEGER) AS c_meq",
      Seq("c_chr", "c_cp", "c_rep", "c_sub", "c_sp", "c_tb", "c_fb",
        "c_nan", "c_gr", "c_ty", "c_url", "c_jag", "c_jp", "c_chlen",
        "c_wk", "c_amin", "c_ieee", "c_like", "c_meq"),
      Seq("c1 AS c_chr", "CAST(c2 AS INTEGER) AS c_cp", "c3 AS c_rep",
        "c4 AS c_sub", "c5 AS c_sp", "c6 AS c_tb",
        "CAST(c7 AS BIGINT) AS c_fb", "CAST(c8 AS INTEGER) AS c_nan",
        "CAST(c9 AS INTEGER) AS c_gr", "c10 AS c_ty", "c11 AS c_url",
        "c12 AS c_jag", "c13 AS c_jp", "CAST(c14 AS INTEGER) AS c_chlen",
        "c15 AS c_wk", "CAST(c16 AS INTEGER) AS c_amin",
        "CAST(c17 AS INTEGER) AS c_ieee", "CAST(c18 AS INTEGER) AS c_like",
        "CAST(c19 AS INTEGER) AS c_meq"),
      oracleSql = "SELECT chr(9731), 128077, 'xxaxxbxxcxx', '', " +
        "CAST(NULL AS VARCHAR), '-7fffffff', -2147483647, " +
        "CAST(NULL AS INTEGER), -1, 'integer', '', CAST(NULL AS VARCHAR), " +
        "'{\"a\":1,\"b\":2}', 20, '2001 02', CAST(NULL AS INTEGER), 1, 0, 1"),

    // AbstractTestAggregations.java :466-:566 CASE-expression GROUP BY
    // suite — verbatim single-arg assertQuery statements (H2 self-oracle
    // protocol; DuckDB replays the same text).
    "r153_ref_case_group_by" -> batchCols(
      Seq("k", "n"),
      Seq("c1 AS k", "CAST(c2 AS BIGINT) AS n"),
      Seq(
        ("a466", "SELECT CASE WHEN orderstatus = 'O' THEN 'a' ELSE 'b' END, count(*) FROM orders GROUP BY CASE WHEN orderstatus = 'O' THEN 'a' ELSE 'b' END"),
        ("a483", "SELECT CASE WHEN orderstatus = 'O' THEN 'a' END, count(*) FROM orders GROUP BY CASE WHEN orderstatus = 'O' THEN 'a' END"),
        ("a495", "SELECT CASE WHEN true THEN orderstatus END, count(*) FROM orders GROUP BY orderstatus"),
        ("a514", "SELECT CASE orderstatus WHEN 'O' THEN 'a' ELSE 'b' END, count(*) FROM orders GROUP BY CASE orderstatus WHEN 'O' THEN 'a' ELSE 'b' END"),
        ("a527", "SELECT CASE orderstatus WHEN 'O' THEN 'a' ELSE 'b' END, count(*) FROM orders GROUP BY orderstatus"),
        ("a532", "SELECT CASE 'O' WHEN orderstatus THEN 'a' ELSE 'b' END, count(*) FROM orders GROUP BY orderstatus"),
        ("a537", "SELECT CASE 1 WHEN 1 THEN orderstatus ELSE 'x' END, count(*) FROM orders GROUP BY orderstatus"),
        ("a542", "SELECT CASE 1 WHEN 1 THEN 'x' ELSE orderstatus END, count(*) FROM orders GROUP BY orderstatus"),
        ("a551", "SELECT CASE orderstatus WHEN 'O' THEN 'a' END, count(*) FROM orders GROUP BY CASE orderstatus WHEN 'O' THEN 'a' END"),
        ("a556", "SELECT CASE orderstatus WHEN 'O' THEN 'a' END, count(*) FROM orders GROUP BY orderstatus"),
        ("a561", "SELECT CASE 'O' WHEN orderstatus THEN 'a' END, count(*) FROM orders GROUP BY orderstatus"),
        ("a566", "SELECT CASE 1 WHEN 1 THEN orderstatus END, count(*) FROM orders GROUP BY orderstatus"))),

    // AbstractTestAggregations.java :170/:204 — derived-key grouping with
    // NULL/0 key collisions; DISTINCT count over a join.
    "r154_ref_agg_group_misc" -> batchCols(
      Seq("a", "b"),
      Seq("CAST(c1 AS BIGINT) AS a", "CAST(c2 AS BIGINT) AS b"),
      Seq(
        ("a170", "SELECT key, COUNT(*) FROM (SELECT CASE WHEN orderkey % 3 = 0 THEN NULL WHEN orderkey % 5 = 0 THEN 0 ELSE orderkey END AS key FROM lineitem) GROUP BY key"),
        ("a204", "SELECT custkey, COUNT(DISTINCT orderstatus) FROM ( SELECT orders.custkey AS custkey, orders.orderstatus AS orderstatus FROM lineitem JOIN orders ON lineitem.orderkey = orders.orderkey AND orders.orderkey = lineitem.partkey GROUP BY orders.custkey, orders.orderstatus) GROUP BY custkey"))),

    // AbstractTestAggregations.java :158 GROUP BY returning only the key;
    // :636 group-by-a-constant-column count (both sides cast to VARCHAR —
    // one batch schema).
    "r155_ref_agg_group_keys" -> batchCols(
      Seq("v"),
      Seq("CAST(c1 AS VARCHAR) AS v"),
      Seq(
        ("a158", "SELECT orderstatus FROM orders GROUP BY orderstatus"),
        ("a636", "SELECT count(*) FROM ( SELECT CAST(null AS VARCHAR) constant, orderdate FROM orders ) a group by constant, orderdate")),
      sparkCast = Map("v" -> "string")),

    // AbstractTestAggregations.java :223 re-aggregation of per-group
    // aggregates (MAX/SUM over an avg/sum-distinct subquery).
    "r156_ref_agg_reagg" -> one(
      "SELECT s, MAX(custkey), SUM(a) FROM ( SELECT custkey, avg(shippriority) AS a, SUM(DISTINCT orderkey) AS s FROM orders GROUP BY custkey, orderstatus) GROUP BY s",
      Seq("s", "mx", "sa"),
      Seq("CAST(c1 AS BIGINT) AS s", "CAST(c2 AS BIGINT) AS mx",
        "CAST(c3 AS DOUBLE) AS sa")),

    // AbstractTestAggregations.java :649 wide projection + count.
    "r157_ref_agg_wide" -> one(
      "SELECT orderkey + 1, orderkey + 2, orderkey + 3, orderkey + 4, orderkey + 5, orderkey + 6, orderkey + 7, orderkey + 8, orderkey + 9, orderkey + 10, count(*) FROM orders GROUP BY orderkey + 1, orderkey + 2, orderkey + 3, orderkey + 4, orderkey + 5, orderkey + 6, orderkey + 7, orderkey + 8, orderkey + 9, orderkey + 10",
      (1 to 11).map("w" + _),
      (1 to 11).map(i => s"CAST(c$i AS BIGINT) AS w$i")),

    // AbstractTestQueries.java single-arg assertQuery sweep (lines 527,1838,1880,1992,5145,5193,5626,5843,6555,6569,6583,6597)
    "r158_ref_atq_sweep" -> batchCols(
      Seq("k1"),
      Seq("CAST(c1 AS BIGINT) AS k1"),
      Seq(
        ("L527", "SELECT COUNT(DISTINCT custkey) FROM ( SELECT x.custkey FROM orders x WHERE custkey < 100 ) t"),
        ("L1838", "SELECT x + y FROM ( SELECT orderdate, COUNT(*) x FROM orders GROUP BY orderdate) a JOIN ( SELECT orderdate, COUNT(*) y FROM orders GROUP BY orderdate) b ON a.orderdate = b.orderdate"),
        ("L1880", "SELECT COUNT(*) FROM (SELECT * FROM lineitem ORDER BY orderkey,linenumber LIMIT 5) l LEFT OUTER JOIN (SELECT * FROM orders ORDER BY orderkey LIMIT 5) o ON o.custkey != 1000 WHERE o.orderkey IS NULL"),
        ("L1992", "SELECT COUNT(*) FROM (SELECT * FROM lineitem ORDER BY orderkey,linenumber LIMIT 5) l RIGHT OUTER JOIN (SELECT * FROM orders ORDER BY orderkey LIMIT 5) o ON l.quantity != 5 WHERE l.orderkey IS NULL"),
        ("L5145", "SELECT count(clerk) FROM (SELECT clerk FROM orders WHERE orderkey=0 UNION ALL SELECT clerk FROM orders WHERE orderkey<>0) GROUP BY clerk"),
        ("L5193", "SELECT count(*) FROM (SELECT 1 FROM ( SELECT 1 FROM nation UNION ALL SELECT 1 FROM nation)UNION ALL SELECT 1 FROM nation GROUP BY regionkey)"),
        ("L5626", "SELECT COUNT(*) FROM ( SELECT orderkey IN ( SELECT orderkey FROM lineitem WHERE orderkey % 2 = 0) FROM orders LIMIT 10)"),
        ("L5843", "SELECT DISTINCT orderkey FROM lineitem WHERE orderkey BETWEEN (SELECT avg(orderkey) FROM orders) - 10 AND (SELECT avg(orderkey) FROM orders) + 10"),
        ("L6555", "SELECT * FROM ( SELECT orderkey+1 AS a FROM orders WHERE orderstatus = 'F' UNION ALL SELECT orderkey FROM orders WHERE orderkey % 2 = 0 UNION ALL (SELECT orderkey+custkey FROM orders ORDER BY orderkey LIMIT 10) ) WHERE a < 20 OR a > 100 ORDER BY a"),
        ("L6569", "SELECT COUNT(*) FROM lineitem JOIN ( SELECT * FROM orders ) orders ON lineitem.orderkey = orders.orderkey WHERE orders.orderkey % 4 = 0 AND lineitem.suppkey > orders.orderkey"),
        ("L6583", "SELECT COUNT(*) FROM lineitem LEFT JOIN ( SELECT * FROM orders WHERE orders.orderkey % 2 = 0 ) orders ON lineitem.orderkey = orders.orderkey WHERE orders.orderkey % 4 = 0 AND (lineitem.suppkey % 2 = orders.orderkey % 2 OR orders.custkey IS NULL)"),
        ("L6597", "SELECT COUNT(*) FROM lineitem LEFT JOIN ( SELECT * FROM orders WHERE orders.orderkey % 2 = 0 ) orders ON lineitem.orderkey = orders.orderkey WHERE lineitem.orderkey % 4 = 0 AND (lineitem.suppkey % 2 = orders.orderkey % 2 OR orders.orderkey IS NULL)")),
      sparkCast = Map("k1" -> "bigint")),

    // AbstractTestQueries.java single-arg assertQuery sweep (lines 6611,6626,6640,6654,6668,6812)
    "r159_ref_atq_sweep" -> batchCols(
      Seq("k1"),
      Seq("CAST(c1 AS BIGINT) AS k1"),
      Seq(
        ("L6611", "SELECT COUNT(*) FROM lineitem LEFT JOIN ( SELECT * FROM orders WHERE orders.orderkey % 2 = 0 ) orders ON lineitem.orderkey = orders.orderkey WHERE orders.orderkey = orders.orderkey AND lineitem.orderkey % 4 = 0 AND (lineitem.suppkey % 2 = orders.orderkey % 2 OR orders.orderkey IS NULL)"),
        ("L6626", "SELECT count(*) FROM orders a LEFT OUTER JOIN orders b ON a.clerk = b.clerk WHERE a.orderpriority='5-LOW' AND b.orderpriority='1-URGENT' AND b.clerk is null AND a.orderkey % 4 = 0"),
        ("L6640", "SELECT COUNT(*) FROM ( SELECT * FROM orders WHERE orders.orderkey % 2 = 0 ) orders RIGHT JOIN lineitem ON lineitem.orderkey = orders.orderkey WHERE orders.orderkey % 4 = 0 AND (lineitem.suppkey % 2 = orders.orderkey % 2 OR orders.custkey IS NULL)"),
        ("L6654", "SELECT COUNT(*) FROM ( SELECT * FROM orders WHERE orders.orderkey % 2 = 0 ) orders RIGHT JOIN lineitem ON lineitem.orderkey = orders.orderkey WHERE lineitem.orderkey % 4 = 0 AND (lineitem.suppkey % 2 = orders.orderkey % 2 OR orders.orderkey IS NULL)"),
        ("L6668", "SELECT COUNT(*) FROM ( SELECT * FROM orders WHERE orders.orderkey % 2 = 0 ) orders RIGHT JOIN lineitem ON lineitem.orderkey = orders.orderkey WHERE orders.orderkey = orders.orderkey AND lineitem.orderkey % 4 = 0 AND (lineitem.suppkey % 2 = orders.orderkey % 2 OR orders.orderkey IS NULL)"),
        ("L6812", "SELECT COUNT(*) FROM ( SELECT orderkey AS x, orderkey AS y FROM orders WHERE orderkey % 3 = 0 UNION ALL SELECT orderkey AS x, orderkey AS y FROM orders WHERE orderkey % 2 = 0 ) a JOIN ( SELECT orderkey AS x, orderkey AS y FROM orders ) b ON a.x = b.x")),
      sparkCast = Map("k1" -> "bigint")),

    // AbstractTestQueries.java single-arg assertQuery sweep (lines 5645,5651,5659,5714,5734,5751,5772,5831,7521,7710,7717,7719)
    "r160_ref_atq_sweep" -> batchCols(
      Seq("k1"),
      Seq("CAST(c1 AS INT) AS k1"),
      Seq(
        ("L5645", "SELECT orderkey IN ( SELECT CASE WHEN orderkey % 3 = 0 THEN NULL ELSE orderkey END FROM lineitem) FROM orders"),
        ("L5651", "SELECT orderkey IN ( SELECT orderkey FROM lineitem) FROM ( SELECT CASE WHEN orderkey % 3 = 0 THEN NULL ELSE orderkey END AS orderkey FROM orders)"),
        ("L5659", "SELECT orderkey IN ( SELECT CASE WHEN orderkey % 3 = 0 THEN NULL ELSE orderkey END FROM lineitem) FROM ( SELECT CASE WHEN orderkey % 4 = 0 THEN NULL ELSE orderkey END AS orderkey FROM orders)"),
        ("L5714", "SELECT orderkey IN ( SELECT CASE WHEN orderkey % 500 = 0 THEN NULL ELSE orderkey END FROM orders WHERE orderkey % 200 = 0 UNION ALL SELECT CASE WHEN orderkey % 600 = 0 THEN NULL ELSE orderkey END FROM orders WHERE orderkey % 300 = 0 ) FROM ( SELECT orderkey FROM lineitem WHERE orderkey % 100 = 0)"),
        ("L5734", "SELECT orderkey IN ( SELECT CASE WHEN orderkey % 10 = 0 THEN NULL ELSE orderkey END FROM lineitem WHERE orderkey % 2 = 0 GROUP BY orderkey ) FROM ( SELECT orderkey FROM orders WHERE orderkey % 3 = 0)"),
        ("L5751", "SELECT orderkey IN ( SELECT CASE WHEN orderkey % 500 = 0 THEN NULL ELSE orderkey END FROM lineitem WHERE orderkey % 250 = 0 UNION ALL SELECT CASE WHEN orderkey % 300 = 0 THEN NULL ELSE orderkey END FROM lineitem WHERE orderkey % 200 = 0 GROUP BY orderkey ) FROM ( SELECT orderkey FROM orders WHERE orderkey % 100 = 0)"),
        ("L5772", "SELECT orderkey IN ( SELECT orderkey FROM ( SELECT CASE WHEN orderkey % 500 = 0 THEN NULL ELSE orderkey END AS orderkey FROM orders WHERE orderkey % 200 = 0 UNION ALL SELECT CASE WHEN orderkey % 600 = 0 THEN NULL ELSE orderkey END AS orderkey FROM orders WHERE orderkey % 300 = 0 ) GROUP BY orderkey ) FROM ( SELECT orderkey FROM lineitem WHERE orderkey % 100 = 0)"),
        ("L5831", "SELECT (SELECT 1) IN ( 2, 3)"),
        ("L7521", "SELECT c = 'x'FROM ( SELECT 'x' AS c UNION ALL SELECT 'yy' AS c)"),
        ("L7710", "SELECT 1.0 = ALL(SELECT 1) WHERE 1 = ALL(SELECT 1)"),
        ("L7717", "SELECT CAST(1 AS decimal(3,2)) < ANY(SELECT CAST(1 AS decimal(3,1)))"),
        ("L7719", "SELECT CAST(1 AS decimal(3,2)) <= ANY(SELECT CAST(1 AS decimal(3,1)))")),
      sparkCast = Map("k1" -> "int")),

    // AbstractTestQueries.java single-arg assertQuery sweep (lines 509,2207,2764,2882,5022,5151,5862)
    "r161_ref_atq_sweep" -> batchCols(
      Seq("k1", "k2"),
      Seq("CAST(c1 AS BIGINT) AS k1",
        "CAST(c2 AS BIGINT) AS k2"),
      Seq(
        ("L509", "SELECT custkey, orders2 FROM ( SELECT x.custkey, SUM(x.orders) + 1 orders2 FROM ( SELECT x.custkey, COUNT(x.orderkey) orders FROM orders x WHERE x.custkey < 100 GROUP BY x.custkey ) x GROUP BY x.custkey) ORDER BY custkey"),
        ("L2207", "SELECT * FROM ( SELECT CASE WHEN orderkey % 3 = 0 THEN NULL ELSE orderkey END AS orderkey FROM lineitem WHERE partkey % 512 = 0 ) AS lineitem JOIN ( SELECT CASE WHEN orderkey % 2 = 0 THEN NULL ELSE orderkey END AS orderkey FROM orders WHERE custkey % 512 = 0 ) AS orders ON lineitem.orderkey = orders.orderkey"),
        ("L2764", "SELECT * FROM ( SELECT CASE WHEN orderkey % 3 = 0 THEN NULL ELSE orderkey END AS orderkey FROM lineitem WHERE partkey % 512 = 0 ) AS lineitem LEFT JOIN ( SELECT CASE WHEN orderkey % 2 = 0 THEN NULL ELSE orderkey END AS orderkey FROM orders WHERE custkey % 512 = 0 ) AS orders ON lineitem.orderkey = orders.orderkey"),
        ("L2882", "SELECT lineitem.orderkey, orders.orderkey FROM ( SELECT CASE WHEN orderkey % 3 = 0 THEN NULL ELSE orderkey END AS orderkey FROM lineitem WHERE partkey % 512 = 0 ) AS lineitem RIGHT JOIN ( SELECT CASE WHEN orderkey % 2 = 0 THEN NULL ELSE orderkey END AS orderkey FROM orders WHERE custkey % 512 = 0 ) AS orders ON lineitem.orderkey = orders.orderkey"),
        ("L5022", "SELECT * FROM (SELECT orderkey + 1 orderkey FROM (SELECT * FROM orders ORDER BY orderkey LIMIT 100)) o JOIN (SELECT orderkey + 1 orderkey FROM (SELECT * FROM orders ORDER BY orderkey LIMIT 100)) o1 ON (o.orderkey = o1.orderkey)"),
        ("L5151", "SELECT count(orderkey), sum(sc) FROM ( SELECT sum(custkey) sc, orderkey FROM ( SELECT custkey,orderkey, orderkey+1 FROM orders WHERE orderkey=0 UNION ALL SELECT custkey,orderkey,orderkey+1 FROM orders WHERE orderkey<>0) GROUP BY orderkey)"),
        ("L5862", "SELECT o1.orderkey, COUNT(*) FROM orders o1 RIGHT JOIN (SELECT * FROM orders ORDER BY orderkey LIMIT 10) o2 ON o1.orderkey BETWEEN (SELECT avg(orderkey) FROM orders) - 10 AND (SELECT avg(orderkey) FROM orders) + 10 GROUP BY o1.orderkey")),
      sparkCast = Map("k1" -> "bigint", "k2" -> "bigint")),

    // AbstractTestQueries.java single-arg assertQuery sweep (lines 5814,5818,5822,5825)
    "r162_ref_atq_sweep" -> batchCols(
      Seq("k1", "k2", "k3", "k4", "k5", "k6", "k7", "k8", "k9", "k10", "k11", "k12", "k13", "k14", "k15", "k16"),
      Seq("CAST(c1 AS BIGINT) AS k1",
        "CAST(c2 AS BIGINT) AS k2",
        "CAST(c3 AS BIGINT) AS k3",
        "CAST(c4 AS BIGINT) AS k4",
        "CAST(c5 AS DOUBLE) AS k5",
        "CAST(c6 AS DOUBLE) AS k6",
        "CAST(c7 AS DOUBLE) AS k7",
        "CAST(c8 AS DOUBLE) AS k8",
        "c9 AS k9",
        "c10 AS k10",
        "CAST(c11 AS VARCHAR) AS k11",
        "CAST(c12 AS VARCHAR) AS k12",
        "CAST(c13 AS VARCHAR) AS k13",
        "c14 AS k14",
        "c15 AS k15",
        "c16 AS k16"),
      Seq(
        ("L5814", "SELECT * FROM lineitem WHERE orderkey = (SELECT max(orderkey) FROM orders)"),
        ("L5818", "SELECT * FROM lineitem WHERE orderkey = (SELECT orderkey FROM orders WHERE 0=1)"),
        ("L5822", "SELECT * FROM lineitem WHERE (SELECT orderkey FROM orders WHERE 0=1) is null"),
        ("L5825", "SELECT * FROM lineitem WHERE (SELECT orderkey FROM orders WHERE 0=1) is not null")),
      sparkCast = Map("k1" -> "bigint", "k2" -> "bigint", "k3" -> "bigint", "k4" -> "bigint", "k11" -> "string", "k12" -> "string", "k13" -> "string")),

    // AbstractTestQueries.java single-arg assertQuery sweep (lines 5121,5127,5133)
    "r163_ref_atq_sweep" -> batchCols(
      Seq("k1", "k2"),
      Seq("CAST(c1 AS VARCHAR) AS k1",
        "CAST(c2 AS BIGINT) AS k2"),
      Seq(
        ("L5121", "SELECT ds, count(*) FROM ( SELECT orderdate ds, orderkey FROM orders UNION ALL SELECT shipdate ds, orderkey FROM lineitem) a GROUP BY ds"),
        ("L5127", "SELECT ds, count(*) FROM ( SELECT orderdate ds, orderkey FROM orders UNION SELECT shipdate ds, orderkey FROM lineitem) a GROUP BY ds"),
        ("L5133", "SELECT ds, count(DISTINCT orderkey) FROM ( SELECT orderdate ds, orderkey FROM orders UNION SELECT shipdate ds, orderkey FROM lineitem) a GROUP BY ds")),
      sparkCast = Map("k1" -> "string", "k2" -> "bigint")),

    // AbstractTestQueries.java single-arg assertQuery sweep (lines 4366,5273)
    "r164_ref_atq_sweep" -> batchCols(
      Seq("k1", "k2", "k3", "k4", "k5", "k6", "k7", "k8", "k9"),
      Seq("CAST(c1 AS BIGINT) AS k1",
        "CAST(c2 AS BIGINT) AS k2",
        "c3 AS k3",
        "CAST(c4 AS DOUBLE) AS k4",
        "CAST(c5 AS VARCHAR) AS k5",
        "c6 AS k6",
        "c7 AS k7",
        "CAST(c8 AS BIGINT) AS k8",
        "c9 AS k9"),
      Seq(
        ("L4366", "SELECT A.* FROM orders a"),
        ("L5273", "SELECT * FROM orders UNION ALL SELECT * FROM orders")),
      sparkCast = Map("k1" -> "bigint", "k2" -> "bigint", "k5" -> "string", "k8" -> "bigint")),

    // AbstractTestQueries.java single-arg assertQuery sweep (lines 3263,5491)
    "r165_ref_atq_sweep" -> batchCols(
      Seq("k1", "k2", "k3", "k4", "k5", "k6", "k7", "k8", "k9", "k10", "k11", "k12", "k13", "k14", "k15", "k16", "k17", "k18"),
      Seq("CAST(c1 AS BIGINT) AS k1",
        "CAST(c2 AS BIGINT) AS k2",
        "c3 AS k3",
        "CAST(c4 AS DOUBLE) AS k4",
        "CAST(c5 AS VARCHAR) AS k5",
        "c6 AS k6",
        "c7 AS k7",
        "CAST(c8 AS BIGINT) AS k8",
        "c9 AS k9",
        "CAST(c10 AS BIGINT) AS k10",
        "CAST(c11 AS BIGINT) AS k11",
        "c12 AS k12",
        "CAST(c13 AS DOUBLE) AS k13",
        "CAST(c14 AS VARCHAR) AS k14",
        "c15 AS k15",
        "c16 AS k16",
        "CAST(c17 AS BIGINT) AS k17",
        "c18 AS k18"),
      Seq(
        ("L3263", "SELECT * FROM orders a JOIN (SELECT * FROM orders WHERE orderkey IS NULL) b ON a.orderkey = b.orderkey"),
        ("L5491", "SELECT * FROM (SELECT * FROM orders ORDER BY orderkey LIMIT 5) a JOIN (SELECT * FROM orders ORDER BY orderkey LIMIT 5) b ON 123 = 123")),
      sparkCast = Map("k1" -> "bigint", "k2" -> "bigint", "k5" -> "string", "k8" -> "bigint", "k10" -> "bigint", "k11" -> "bigint", "k14" -> "string", "k17" -> "bigint")),

    // AbstractTestQueries.java single-arg assertQuery sweep (lines 5102,5240)
    "r166_ref_atq_sweep" -> batchCols(
      Seq("k1", "k2", "k3", "k4", "k5", "k6", "k7", "k8", "k9", "k10", "k11"),
      Seq("CAST(c1 AS VARCHAR) AS k1",
        "CAST(c2 AS BIGINT) AS k2",
        "CAST(c3 AS BIGINT) AS k3",
        "CAST(c4 AS BIGINT) AS k4",
        "c5 AS k5",
        "CAST(c6 AS DOUBLE) AS k6",
        "CAST(c7 AS VARCHAR) AS k7",
        "c8 AS k8",
        "c9 AS k9",
        "CAST(c10 AS BIGINT) AS k10",
        "c11 AS k11"),
      Seq(
        ("L5102", "SELECT * FROM ( SELECT orderdate ds, orderkey FROM orders UNION ALL SELECT shipdate ds, orderkey FROM lineitem) a JOIN orders o ON (a.orderkey = o.orderkey)"),
        ("L5240", "SELECT * FROM (SELECT orderdate ds, orderkey FROM orders UNION ALL SELECT shipdate ds, orderkey FROM lineitem) a JOIN orders o ON (substr(cast(a.ds AS VARCHAR), 6, 2) = substr(cast(o.orderdate AS VARCHAR), 6, 2) AND a.orderkey = o.orderkey)")),
      sparkCast = Map("k1" -> "string", "k2" -> "bigint", "k3" -> "bigint", "k4" -> "bigint", "k7" -> "string", "k10" -> "bigint")),

    // AbstractTestQueries.java single-arg assertQuery sweep (lines 6295,6303)
    "r167_ref_atq_sweep" -> batchCols(
      Seq("k1", "k2"),
      Seq("CAST(c1 AS DOUBLE) AS k1",
        "CAST(c2 AS DOUBLE) AS k2"),
      Seq(
        ("L6295", "SELECT (SELECT avg(regionkey) FROM nation n2 WHERE n2.nationkey = n1.nationkey),(SELECT avg(regionkey) FROM nation n3 WHERE n3.nationkey = n1.nationkey)FROM nation n1"),
        ("L6303", "SELECT(SELECT avg(regionkey) FROM nation n2 WHERE n2.nationkey = n1.nationkey),(SELECT avg(regionkey)+1 FROM nation n3 WHERE n3.nationkey = n1.nationkey)FROM nation n1"))),

    // AbstractTestQueries.java single-arg assertQuery sweep (lines 3247)
    "r168_ref_atq_sweep" -> batchCols(
      Seq("k1", "k2", "k3"),
      Seq("CAST(c1 AS BIGINT) AS k1",
        "CAST(c2 AS BIGINT) AS k2",
        "CAST(c3 AS BIGINT) AS k3"),
      Seq(
        ("L3247", "SELECT b.orderkey, b.custkey, a.custkey FROM ( SELECT custkey FROM orders GROUP BY custkey) a JOIN orders b ON a.custkey = b.custkey")),
      sparkCast = Map("k1" -> "bigint", "k2" -> "bigint", "k3" -> "bigint")),

    // AbstractTestQueries.java single-arg assertQuery sweep (lines 5039)
    "r169_ref_atq_sweep" -> batchCols(
      Seq("k1", "k2", "k3", "k4"),
      Seq("CAST(c1 AS BIGINT) AS k1",
        "CAST(c2 AS BIGINT) AS k2",
        "CAST(c3 AS BIGINT) AS k3",
        "CAST(c4 AS BIGINT) AS k4"),
      Seq(
        ("L5039", "SELECT * FROM (SELECT orderkey, abs(orderkey) a FROM orders) t JOIN (SELECT orderkey, abs(orderkey) a FROM orders) u ON t.orderkey = u.orderkey")),
      sparkCast = Map("k1" -> "bigint", "k2" -> "bigint", "k3" -> "bigint", "k4" -> "bigint")),

    // AbstractTestQueries.java single-arg assertQuery sweep (lines 6683)
    "r170_ref_atq_sweep" -> batchCols(
      Seq("k1", "k2", "k3", "k4", "k5", "k6", "k7"),
      Seq("CAST(c1 AS BIGINT) AS k1",
        "CAST(c2 AS BIGINT) AS k2",
        "CAST(c3 AS BIGINT) AS k3",
        "CAST(c4 AS BIGINT) AS k4",
        "CAST(c5 AS BIGINT) AS k5",
        "CAST(c6 AS BIGINT) AS k6",
        "CAST(c7 AS BIGINT) AS k7"),
      Seq(
        ("L6683", "SELECT * FROM ( SELECT custkey custkey1, custkey%4 custkey1a, custkey%8 custkey1b, custkey%16 custkey1c FROM orders ) orders1 JOIN ( SELECT custkey custkey2, custkey%4 custkey2a, custkey%8 custkey2b FROM orders ) orders2 ON orders1.custkey1 = orders2.custkey2 WHERE custkey2a = custkey2b AND custkey1 = custkey1a AND custkey2 = custkey2a AND custkey1a = custkey1c AND custkey1b = custkey1c AND custkey1b % 2 = 0")),
      sparkCast = Map("k1" -> "bigint", "k2" -> "bigint", "k3" -> "bigint", "k4" -> "bigint", "k5" -> "bigint", "k6" -> "bigint", "k7" -> "bigint")),

    // AbstractTestQueries.java single-arg assertQuery sweep (lines 5226)
    "r171_ref_atq_sweep" -> batchCols(
      Seq("k1", "k2", "k3", "k4", "k5", "k6", "k7", "k8", "k9", "k10", "k11"),
      Seq("CAST(c1 AS BIGINT) AS k1",
        "CAST(c2 AS BIGINT) AS k2",
        "CAST(c3 AS BIGINT) AS k3",
        "CAST(c4 AS BIGINT) AS k4",
        "c5 AS k5",
        "CAST(c6 AS DOUBLE) AS k6",
        "CAST(c7 AS VARCHAR) AS k7",
        "c8 AS k8",
        "c9 AS k9",
        "CAST(c10 AS BIGINT) AS k10",
        "c11 AS k11"),
      Seq(
        ("L5226", "SELECT * FROM ( SELECT orderkey, count(*) FROM ( SELECT orderdate ds, orderkey FROM orders UNION ALL SELECT shipdate ds, orderkey FROM lineitem) a GROUP BY orderkey) t JOIN orders o ON (o.orderkey = t.orderkey)")),
      sparkCast = Map("k1" -> "bigint", "k2" -> "bigint", "k3" -> "bigint", "k4" -> "bigint", "k7" -> "string", "k10" -> "bigint")),

    // AbstractTestQueries.java single-arg assertQuery sweep (lines 1081)
    "r172_ref_atq_sweep" -> batchCols(
      Seq("k1", "k2", "k3", "k4", "k5", "k6", "k7", "k8", "k9", "k10", "k11", "k12", "k13", "k14", "k15", "k16", "k17", "k18", "k19"),
      Seq("CAST(c1 AS BIGINT) AS k1",
        "CAST(c2 AS BIGINT) AS k2",
        "c3 AS k3",
        "CAST(c4 AS DOUBLE) AS k4",
        "CAST(c5 AS VARCHAR) AS k5",
        "c6 AS k6",
        "c7 AS k7",
        "CAST(c8 AS BIGINT) AS k8",
        "c9 AS k9",
        "CAST(c10 AS BIGINT) AS k10",
        "CAST(c11 AS BIGINT) AS k11",
        "c12 AS k12",
        "CAST(c13 AS DOUBLE) AS k13",
        "CAST(c14 AS VARCHAR) AS k14",
        "c15 AS k15",
        "c16 AS k16",
        "CAST(c17 AS BIGINT) AS k17",
        "c18 AS k18",
        "CAST(c19 AS BIGINT) AS k19"),
      Seq(
        ("L1081", "SELECT *, orders.*, orderkey FROM orders")),
      sparkCast = Map("k1" -> "bigint", "k2" -> "bigint", "k5" -> "string", "k8" -> "bigint", "k10" -> "bigint", "k11" -> "bigint", "k14" -> "string", "k17" -> "bigint", "k19" -> "bigint")),

    // AbstractTestQueries.java single-arg assertQuery sweep (lines 5602)
    "r173_ref_atq_sweep" -> batchCols(
      Seq("k1", "k2", "k3", "k4", "k5", "k6", "k7", "k8", "k9", "k10"),
      Seq("CAST(c1 AS BIGINT) AS k1",
        "CAST(c2 AS BIGINT) AS k2",
        "c3 AS k3",
        "CAST(c4 AS DOUBLE) AS k4",
        "CAST(c5 AS VARCHAR) AS k5",
        "c6 AS k6",
        "c7 AS k7",
        "CAST(c8 AS BIGINT) AS k8",
        "c9 AS k9",
        "CAST(c10 AS INT) AS k10"),
      Seq(
        ("L5602", "SELECT *, orderkey NOT IN ( SELECT orderkey FROM lineitem WHERE orderkey % 3 = 0) FROM orders")),
      sparkCast = Map("k1" -> "bigint", "k2" -> "bigint", "k5" -> "string", "k8" -> "bigint", "k10" -> "int")),

    // AbstractTestQueries.java single-arg assertQuery sweep (lines 1075)
    "r174_ref_atq_sweep" -> batchCols(
      Seq("k1", "k2", "k3", "k4", "k5", "k6", "k7", "k8", "k9", "k10", "k11", "k12", "k13", "k14", "k15", "k16", "k17", "k18", "k19"),
      Seq("CAST(c1 AS BIGINT) AS k1",
        "CAST(c2 AS BIGINT) AS k2",
        "c3 AS k3",
        "CAST(c4 AS DOUBLE) AS k4",
        "CAST(c5 AS VARCHAR) AS k5",
        "c6 AS k6",
        "c7 AS k7",
        "CAST(c8 AS BIGINT) AS k8",
        "c9 AS k9",
        "CAST(c10 AS BIGINT) AS k10",
        "CAST(c11 AS BIGINT) AS k11",
        "CAST(c12 AS BIGINT) AS k12",
        "c13 AS k13",
        "CAST(c14 AS DOUBLE) AS k14",
        "CAST(c15 AS VARCHAR) AS k15",
        "c16 AS k16",
        "c17 AS k17",
        "CAST(c18 AS BIGINT) AS k18",
        "c19 AS k19"),
      Seq(
        ("L1075", "SELECT *, 123, * FROM orders")),
      sparkCast = Map("k1" -> "bigint", "k2" -> "bigint", "k5" -> "string", "k8" -> "bigint", "k10" -> "bigint", "k11" -> "bigint", "k12" -> "bigint", "k15" -> "string", "k18" -> "bigint")),

    // AbstractTestQueries.java single-arg assertQuery sweep (lines 849)
    // LIMIT 2 over 3 DISTINCT statuses without ORDER BY: which rows survive
    // is engine-arbitrary, so only the deterministic custkey column is gated
    // (the statement still executes verbatim).
    "r175_ref_atq_sweep" -> oneProj(
      "SELECT DISTINCT custkey, orderstatus FROM orders WHERE custkey = 1268 LIMIT 2",
      Seq("k1", "k2"), Seq("k1"),
      Seq("CAST(c1 AS BIGINT) AS k1")),

    // AbstractTestQueries.java single-arg assertQuery sweep (lines 5554)
    "r176_ref_atq_sweep" -> batchCols(
      Seq("k1", "k2"),
      Seq("CAST(c1 AS INT) AS k1",
        "CAST(c2 AS BIGINT) AS k2"),
      Seq(
        ("L5554", "SELECT orderkey IN ( SELECT orderkey FROM lineitem WHERE partkey % 4 = 0), SUM( CASE WHEN orderkey IN ( SELECT orderkey FROM lineitem WHERE suppkey % 4 = 0) THEN 1 ELSE 0 END) FROM orders GROUP BY orderkey IN ( SELECT orderkey FROM lineitem WHERE partkey % 4 = 0) HAVING SUM( CASE WHEN orderkey IN ( SELECT orderkey FROM lineitem WHERE suppkey % 4 = 0) THEN 1 ELSE 0 END) > 1")),
      sparkCast = Map("k1" -> "int", "k2" -> "bigint")),

    // AbstractTestQueries.java single-arg assertQuery sweep (lines 7709)
    "r177_ref_atq_sweep" -> batchCols(
      Seq("k1", "k2"),
      Seq("CAST(c1 AS INT) AS k1",
        "CAST(c2 AS INT) AS k2"),
      Seq(
        ("L7709", "SELECT 1.0 <= ANY(SELECT 1), 1 <= ANY(SELECT 1) WHERE 1 <= ANY(SELECT 1)")),
      sparkCast = Map("k1" -> "int", "k2" -> "int")),

    // AbstractTestQueries.java single-arg assertQuery sweep (lines 5893)
    "r178_ref_atq_sweep" -> batchCols(
      Seq("k1", "k2", "k3"),
      Seq("CAST(c1 AS INT) AS k1",
        "CAST(c2 AS INT) AS k2",
        "CAST(c3 AS INT) AS k3"),
      Seq(
        ("L5893", "SELECT 1.0 = (SELECT 1), 2.0 = (SELECT 1), CAST(2.0 AS REAL) = (SELECT 1) WHERE 1.0 = (SELECT 1)")),
      sparkCast = Map("k1" -> "int", "k2" -> "int", "k3" -> "int")),

    // AbstractTestQueries.java single-arg assertQuery sweep (lines 1012)
    "r179_ref_atq_sweep" -> batchCols(
      Seq("k1", "k2", "k3"),
      Seq("CAST(c1 AS VARCHAR) AS k1",
        "CAST(c2 AS VARCHAR) AS k2",
        "CAST(c3 AS BIGINT) AS k3"),
      Seq(
        ("L1012", "SELECT orderdate, orderdate, orderkey FROM orders")),
      sparkCast = Map("k1" -> "string", "k2" -> "string", "k3" -> "bigint")),

    // AbstractTestQueries.java single-arg assertQuery sweep (lines 5282)
    "r180_ref_atq_sweep" -> batchCols(
      Seq("k1", "k2", "k3", "k4"),
      Seq("CAST(c1 AS DECIMAL(11,1)) AS k1",
        "CAST(c2 AS DECIMAL(11,1)) AS k2",
        "CAST(c3 AS BIGINT) AS k3",
        "CAST(c4 AS BIGINT) AS k4"),
      Seq(
        ("L5282", "SELECT 0, 0, 0, 0 UNION ALL SELECT 0.0, 0.0, 0, 0")),
      sparkCast = Map("k3" -> "bigint", "k4" -> "bigint")),

    // AbstractTestQueries.java single-arg assertQuery sweep (lines 683)
    "r181_ref_atq_sweep" -> batchCols(
      Seq("k1", "k2", "k3"),
      Seq("CAST(c1 AS DOUBLE) AS k1",
        "CAST(c2 AS BIGINT) AS k2",
        "c3 AS k3"),
      Seq(
        ("L683", "VALUES (1.1, 2, 'foo'), (sin(3.3), 2+2, 'bar')")),
      sparkCast = Map("k2" -> "bigint")),

    // AbstractTestQueries.java single-arg assertQuery sweep (lines 3006)
    "r182_ref_atq_sweep" -> batchCols(
      Seq("k1", "k2"),
      Seq("CAST(c1 AS BIGINT) AS k1",
        "CAST(c2 AS BIGINT) AS k2"),
      Seq(
        ("L3006", "SELECT nationkey, arbitrary_column + arbitrary_column FROM ( SELECT nationkey, COALESCE(arbitrary_column, 0) arbitrary_column FROM ( SELECT nationkey, 1 arbitrary_column FROM nation ORDER BY 1 ASC))")),
      sparkCast = Map("k1" -> "bigint", "k2" -> "bigint")),

    // AbstractTestQueries.java single-arg assertQuery sweep (lines 5591)
    "r183_ref_atq_sweep" -> batchCols(
      Seq("k1", "k2", "k3"),
      Seq("CAST(c1 AS BIGINT) AS k1",
        "CAST(c2 AS BIGINT) AS k2",
        "CAST(c3 AS BIGINT) AS k3"),
      Seq(
        ("L5591", "SELECT x, y, COUNT(*) FROM (SELECT orderkey, 0 AS x FROM orders) a JOIN (SELECT orderkey, 1 AS y FROM orders) b ON a.orderkey = b.orderkey GROUP BY 1, 2")),
      sparkCast = Map("k1" -> "bigint", "k2" -> "bigint", "k3" -> "bigint")),

    // AbstractTestQueries.java single-arg assertQuery sweep (lines 5294)
    "r184_ref_atq_sweep" -> batchCols(
      Seq("k1"),
      Seq("c1 AS k1"),
      Seq(
        ("L5294", "SELECT a FROM ( (SELECT orderstatus AS a FROM orders LIMIT 1) UNION ALL SELECT 'aaaa' AS a) WHERE a = 'aaa'"))),

    // AbstractTestQueries.java single-arg assertQuery sweep (lines 5139)
    "r185_ref_atq_sweep" -> batchCols(
      Seq("k1", "k2"),
      Seq("c1 AS k1",
        "CAST(c2 AS BIGINT) AS k2"),
      Seq(
        ("L5139", "SELECT clerk, count(DISTINCT orderstatus) FROM (SELECT * FROM orders WHERE orderkey=0 UNION ALL SELECT * FROM orders WHERE orderkey<>0) GROUP BY clerk")),
      sparkCast = Map("k2" -> "bigint")),

    // AbstractTestQueries.java single-arg assertQuery sweep (lines 5410)
    "r186_ref_atq_sweep" -> batchCols(
      Seq("k1", "k2", "k3", "k4", "k5", "k6", "k7", "k8", "k9"),
      Seq("c1 AS k1",
        "CAST(c2 AS BIGINT) AS k2",
        "CAST(c3 AS DECIMAL(3,1)) AS k3",
        "CAST(c4 AS INT) AS k4",
        "CAST(c5 AS BIGINT) AS k5",
        "CAST(c6 AS DECIMAL(5,1)) AS k6",
        "CAST(c7 AS INT) AS k7",
        "c8 AS k8",
        "CAST(c9 AS BIGINT) AS k9"),
      Seq(
        ("L5410", "SELECT * FROM (SELECT 'AAA' a1, 11 b1, 33.3 c1, true AS d1, 21 e1) x CROSS JOIN (SELECT 4444.4 a2, false AS b2, 'BBB' c2, 22 d2) y")),
      sparkCast = Map("k2" -> "bigint", "k4" -> "int", "k5" -> "bigint", "k7" -> "int", "k9" -> "bigint")),

    // AbstractTestQueries.java single-arg assertQuery sweep (lines 1702)
    "r187_ref_atq_sweep" -> batchCols(
      Seq("k1", "k2"),
      Seq("c1 AS k1",
        "c2 AS k2"),
      Seq(
        ("L1702", "SELECT a.orderstatus , a.clerk FROM ( SELECT DISTINCT orderstatus, clerk FROM orders ) a INNER JOIN ( SELECT DISTINCT orderstatus, clerk FROM orders ) b ON a.orderstatus = b.orderstatus and a.clerk = b.clerk where a.orderstatus = 'F'"))),

    // AbstractTestQueries.java single-arg assertQuery sweep (lines 5054)
    "r188_ref_atq_sweep" -> batchCols(
      Seq("k1"),
      Seq("CAST(c1 AS VARCHAR) AS k1"),
      Seq(
        ("L5054", "SELECT NULL UNION SELECT NULL")),
      sparkCast = Map("k1" -> "string")),

    // AbstractTestQueries.java single-arg assertQuery sweep (lines 5288)
    "r189_ref_atq_sweep" -> batchCols(
      Seq("k1", "k2"),
      Seq("CAST(c1 AS VARCHAR) AS k1",
        "CAST(c2 AS DECIMAL(2,1)) AS k2"),
      Seq(
        ("L5288", "SELECT * FROM (VALUES (NULL, NULL)) UNION ALL SELECT * FROM (VALUES (NULL, 1.0))")),
      sparkCast = Map("k1" -> "string")),

    // AbstractTestQueries.java:5589 testJoinConstantPropagation.
    "r28_ref_join_const_prop" -> one(
      "SELECT x, y, COUNT(*)\nFROM (SELECT orderkey, 0 AS x FROM orders) a \nJOIN (SELECT orderkey, 1 AS y FROM orders) b \nON a.orderkey = b.orderkey\nGROUP BY 1, 2",
      Seq("x", "y", "cnt"),
      Seq("CAST(c1 AS INT) AS x", "CAST(c2 AS INT) AS y", "CAST(c3 AS BIGINT) AS cnt")),

    // Presto `/` between integral types TRUNCATES (BigintOperators.divide is
    // a plain Java long division: 7/2=3, -7/2=-3) while Spark AND DuckDB
    // widen `/` to double — the DuckDB oracle is blind to the divergence
    // unless it replays the truncation with its dedicated `//` operator.
    // Verbatim text: AbstractTestQueries.java:1366 testIntersect.
    "r64_ref_int_division" -> one(
      "SELECT nationkey, nationkey / 2 FROM (SELECT nationkey FROM nation WHERE nationkey < 10 INTERSECT SELECT nationkey FROM nation WHERE nationkey > 4) T WHERE nationkey % 2 = 0",
      Seq("nationkey", "half"),
      Seq("c1 AS nationkey", "CAST(c2 AS BIGINT) AS half"),
      oracleSql = "SELECT nationkey, nationkey // 2 FROM (SELECT nationkey FROM nation WHERE nationkey < 10 INTERSECT SELECT nationkey FROM nation WHERE nationkey > 4) T WHERE nationkey % 2 = 0"),

    // Integer-division + rounding-cast semantics over table data: negative
    // operands truncate toward zero; chained division stays integral;
    // aggregates see the truncated values; CAST(double AS integral) rounds
    // halves AWAY from zero (DuckDB banker-rounds doubles, so the oracle
    // replays Presto's rule with a sign-aware floor/ceil). The user-cast
    // `CAST(x AS DOUBLE) / 2` double-division path is pinned in
    // RefCorpusSpec (its result is double-typed, not bigint).
    "r65_ref_division_rounding" -> batch(Seq(
      ("d1", "SELECT orderkey / 2 FROM orders WHERE orderkey = 7",
             "SELECT orderkey // 2 FROM orders WHERE orderkey = 7"),
      ("d2", "SELECT (0 - orderkey) / 2 FROM orders WHERE orderkey = 7",
             "SELECT (0 - orderkey) // 2 FROM orders WHERE orderkey = 7"),
      ("d3", "SELECT orderkey / 2 / 2 FROM orders WHERE orderkey = 7",
             "SELECT orderkey // 2 // 2 FROM orders WHERE orderkey = 7"),
      ("d4", "SELECT CAST(CAST(orderkey AS DOUBLE) / 2 AS BIGINT) FROM orders WHERE orderkey = 7",
             "SELECT CAST(floor(CAST(orderkey AS DOUBLE) / 2 + 0.5) AS BIGINT) FROM orders WHERE orderkey = 7"),
      ("d5", "SELECT CAST(0.5 - CAST(orderkey AS DOUBLE) AS BIGINT) FROM orders WHERE orderkey = 3",
             "SELECT CAST(ceil(0.5 - CAST(orderkey AS DOUBLE) - 0.5) AS BIGINT) FROM orders WHERE orderkey = 3"),
      ("d6", "SELECT sum(orderkey / 2) FROM orders WHERE orderkey IN (1, 2, 3)",
             "SELECT sum(orderkey // 2) FROM orders WHERE orderkey IN (1, 2, 3)"),
      ("d7", "SELECT orderkey FROM orders WHERE orderkey / 2 = 3",
             "SELECT orderkey FROM orders WHERE orderkey // 2 = 3"))),

    // --- AbstractTestQueries window suite (:3059-3146 and the surrounding
    // window sections), VERBATIM. Reference expected-literals are keyed to
    // real TPC-H data, so the DuckDB oracle regrades each statement on the
    // fixture; statements whose ORDER BY ... LIMIT cuts across ties gate
    // only the sort-key columns (oneProj — tie rows differ per engine).

    // :3067 testWindowsSameOrdering — two windows, same partitioning,
    // different order columns (ORDER BY 1 LIMIT 10 ties → gate col 1).
    "r67_ref_win_same_ordering" -> oneProj(
      "SELECT sum(quantity) OVER(PARTITION BY suppkey ORDER BY orderkey),min(tax) OVER(PARTITION BY suppkey ORDER BY shipdate)FROM lineitem ORDER BY 1 LIMIT 10",
      Seq("s", "m"), Seq("s"), Seq("CAST(c1 AS DOUBLE) AS s")),

    // :3093 testWindowsPrefixPartitioning — second window partitions on a
    // prefix of the first's keys (full output = sort key → full gate).
    "r68_ref_win_prefix_partitioning" -> one(
      "SELECT max(tax) OVER(PARTITION BY suppkey, tax ORDER BY receiptdate),sum(quantity) OVER(PARTITION BY suppkey ORDER BY orderkey)FROM lineitem ORDER BY 2, 1 LIMIT 10",
      Seq("mx", "s"),
      Seq("CAST(c1 AS DOUBLE) AS mx", "CAST(c2 AS DOUBLE) AS s")),

    // :3119 testWindowsDifferentPartitions — three windows, three distinct
    // partitionings (gate the two sort-key cols; col 3 rides tie choice).
    "r69_ref_win_different_partitions" -> oneProj(
      "SELECT sum(quantity) OVER(PARTITION BY suppkey ORDER BY orderkey),count(discount) OVER(PARTITION BY partkey ORDER BY receiptdate),min(tax) OVER(PARTITION BY suppkey, tax ORDER BY receiptdate)FROM lineitem ORDER BY 1, 2 LIMIT 10",
      Seq("s", "c", "m"), Seq("s", "c"),
      Seq("CAST(c1 AS DOUBLE) AS s", "CAST(c2 AS BIGINT) AS c")),

    // :3146 testWindowsConstantExpression (sum + lag over part). The lag
    // orders by the fixture's non-unique `name` — which peer lag() sees is
    // engine-dependent, so only the sum column (RANGE frame, peer-stable)
    // is gated.
    "r70_ref_win_constant_expr" -> oneProj(
      "SELECT sum(size) OVER(PARTITION BY type ORDER BY brand),lag(partkey, 1) OVER(PARTITION BY type ORDER BY name)FROM part ORDER BY 1, 2 LIMIT 10",
      Seq("ssum", "lg"), Seq("ssum"),
      Seq("CAST(c1 AS BIGINT) AS ssum")),

    // :3186 testWindowFunctionWithoutParameters — Presto's zero-argument
    // count() (the countStar front-end rule); DuckDB spells count(*).
    "r71_ref_win_count_noargs" -> one(
      "SELECT count() over(partition by custkey) FROM orders WHERE custkey < 3 ORDER BY custkey",
      Seq("cnt"), Seq("CAST(c1 AS BIGINT) AS cnt"),
      oracleSql = "SELECT count(*) over(partition by custkey) FROM orders WHERE custkey < 3 ORDER BY custkey"),

    // :3285 testWindowFunctionsExpressions — window results composed in
    // scalar arithmetic (rn·rn + 100).
    "r72_ref_win_expressions" -> one(
      "SELECT orderkey, orderstatus , row_number() OVER (ORDER BY orderkey * 2) *   row_number() OVER (ORDER BY orderkey DESC) + 100 FROM (SELECT * FROM orders ORDER BY orderkey LIMIT 10) x ORDER BY orderkey LIMIT 5",
      Seq("orderkey", "orderstatus", "v"),
      Seq("c1 AS orderkey", "c2 AS orderstatus", "CAST(c3 AS BIGINT) AS v")),

    // :3302 testWindowFunctionsFromAggregate — rank over an aggregate
    // subquery, filtered to top-2 per group.
    "r73_ref_win_from_aggregate" -> one(
      "SELECT * FROM (  SELECT orderstatus, clerk, sales  , rank() OVER (PARTITION BY x.orderstatus ORDER BY sales DESC) rnk  FROM (    SELECT orderstatus, clerk, sum(totalprice) sales    FROM orders    GROUP BY orderstatus, clerk   ) x ) x WHERE rnk <= 2 ORDER BY orderstatus, rnk",
      Seq("orderstatus", "clerk", "sales", "rnk"),
      Seq("c1 AS orderstatus", "c2 AS clerk", "CAST(c3 AS DOUBLE) AS sales",
        "CAST(c4 AS BIGINT) AS rnk")),

    // :3330 testOrderByWindowFunction — ORDER BY the window result itself.
    "r74_ref_win_orderby_window" -> one(
      "SELECT orderkey, row_number() OVER (ORDER BY orderkey) FROM (SELECT * FROM orders ORDER BY orderkey LIMIT 10) ORDER BY 2 DESC LIMIT 5",
      Seq("orderkey", "rn"),
      Seq("c1 AS orderkey", "CAST(c2 AS BIGINT) AS rn")),

    // :3345 testSameWindowFunctionsTwoCoerces — the same unordered window
    // function referenced twice under different coercions.
    "r75_ref_win_two_coerces" -> one(
      "SELECT 12.0E0 * row_number() OVER ()/row_number() OVER(), row_number() OVER() FROM (SELECT * FROM orders ORDER BY orderkey LIMIT 10) ORDER BY 2 DESC LIMIT 5",
      Seq("v", "rn"),
      Seq("CAST(c1 AS DOUBLE) AS v", "CAST(c2 AS BIGINT) AS rn")),

    // :3659 testWindowPropertyDerivation — four windows over a window
    // subquery, each a different partitioning/ordering refinement.
    "r76_ref_win_property_derivation" -> one(
      "SELECT orderstatus, orderkey, SUM(s) OVER (PARTITION BY orderstatus), SUM(s) OVER (PARTITION BY orderstatus, orderkey), SUM(s) OVER (PARTITION BY orderstatus ORDER BY orderkey), SUM(s) OVER (ORDER BY orderstatus, orderkey) FROM (    SELECT orderkey, orderstatus, SUM(orderkey) OVER (ORDER BY orderstatus, orderkey) s    FROM (        SELECT * FROM orders ORDER BY orderkey LIMIT 10    ) )",
      Seq("orderstatus", "orderkey", "s1", "s2", "s3", "s4"),
      Seq("c1 AS orderstatus", "c2 AS orderkey", "CAST(c3 AS BIGINT) AS s1",
        "CAST(c4 AS BIGINT) AS s2", "CAST(c5 AS BIGINT) AS s3",
        "CAST(c6 AS BIGINT) AS s4")),

    // :3687/:3713 testTopNUnpartitionedWindow / testTopNPartitionedWindow —
    // the rn <= k filter shapes (WindowGroupLimit plans pinned in PlanSpec).
    "r77_ref_win_topn" -> batchCols(
      Seq("rn", "orderkey", "orderstatus"),
      Seq("CAST(c1 AS BIGINT) AS rn", "c2 AS orderkey", "c3 AS orderstatus"), Seq(
      "t1" -> "SELECT * FROM (   SELECT row_number() OVER (ORDER BY orderkey) rn, orderkey, orderstatus   FROM orders ) WHERE rn <= 5",
      "t2" -> "SELECT * FROM (    SELECT row_number() OVER (PARTITION BY orderstatus ORDER BY orderkey) rn, orderkey, orderstatus    FROM orders ) WHERE rn <= 2")),

    // :3828-3902 pre-partitioned / pre-sorted window family (the physical-
    // property derivation statements; correctness is the same COUNT frame).
    "r78_ref_win_presorted" -> batchCols(
      Seq("orderkey", "cnt"),
      Seq("c1 AS orderkey", "CAST(c2 AS BIGINT) AS cnt"), Seq(
      "p1" -> "SELECT orderkey, COUNT(*) OVER (PARTITION BY orderkey, custkey) FROM (SELECT * FROM orders ORDER BY orderkey LIMIT 10) ORDER BY orderkey LIMIT 5",
      "p2" -> "SELECT orderkey, COUNT(*) OVER (PARTITION BY orderkey) FROM (SELECT * FROM orders ORDER BY orderkey LIMIT 10) ORDER BY orderkey LIMIT 5",
      "p3" -> "SELECT orderkey, COUNT(*) OVER (ORDER BY orderkey, custkey) FROM (SELECT * FROM orders ORDER BY orderkey LIMIT 10) ORDER BY orderkey LIMIT 5",
      "p4" -> "SELECT orderkey, COUNT(*) OVER (ORDER BY orderkey) FROM (SELECT * FROM orders ORDER BY orderkey LIMIT 10) ORDER BY orderkey LIMIT 5")),

    // :3876/:3890 fully-partitioned + sorted window functions.
    "r79_ref_win_fully_partitioned" -> one(
      "SELECT orderkey, custkey, orderPriority, COUNT(*) OVER (PARTITION BY orderkey ORDER BY custkey, orderPriority) FROM (SELECT * FROM orders ORDER BY orderkey, custkey LIMIT 10) ORDER BY orderkey LIMIT 5",
      Seq("orderkey", "custkey", "orderpriority", "cnt"),
      Seq("c1 AS orderkey", "c2 AS custkey", "c3 AS orderpriority",
        "CAST(c4 AS BIGINT) AS cnt")),
    "r80_ref_win_fully_sorted" -> one(
      "SELECT orderkey, custkey, COUNT(*) OVER (PARTITION BY orderkey ORDER BY custkey) FROM (SELECT * FROM orders ORDER BY orderkey, custkey LIMIT 10) ORDER BY orderkey LIMIT 5",
      Seq("orderkey", "custkey", "cnt"),
      Seq("c1 AS orderkey", "c2 AS custkey", "CAST(c3 AS BIGINT) AS cnt")),

    // :3904 testOrderByWindowFunctionWithNulls — NULLS FIRST / NULLS LAST /
    // bare (Presto defaults to NULLS LAST) inside a window ORDER BY.
    "r81_ref_win_null_ordering" -> batchCols(
      Seq("orderkey", "rn"),
      Seq("c1 AS orderkey", "CAST(c2 AS BIGINT) AS rn"), Seq(
      "n1" -> "SELECT orderkey, row_number() OVER (ORDER BY nullif(orderkey, 3) NULLS FIRST) FROM (SELECT * FROM orders ORDER BY orderkey LIMIT 10) ORDER BY 2 ASC LIMIT 5",
      "n2" -> "SELECT orderkey, row_number() OVER (ORDER BY nullif(orderkey, 3) NULLS LAST) FROM (SELECT * FROM orders ORDER BY orderkey LIMIT 10) ORDER BY 2 DESC LIMIT 5",
      "n3" -> "SELECT orderkey, row_number() OVER (ORDER BY nullif(orderkey, 3)) FROM (SELECT * FROM orders ORDER BY orderkey LIMIT 10) ORDER BY 2 DESC LIMIT 5")),

    // :3941 testValueWindowFunctions — first_value + nth_value with an
    // explicit full frame.
    "r82_ref_win_value_fns" -> one(
      "SELECT * FROM (   SELECT orderkey, orderstatus     , first_value(orderkey + 1000) OVER (PARTITION BY orderstatus ORDER BY orderkey) fvalue     , nth_value(orderkey + 1000, 2) OVER (PARTITION BY orderstatus ORDER BY orderkey         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) nvalue     FROM (SELECT * FROM orders ORDER BY orderkey LIMIT 10) x   ) x ORDER BY orderkey LIMIT 5",
      Seq("orderkey", "orderstatus", "fvalue", "nvalue"),
      Seq("c1 AS orderkey", "c2 AS orderstatus", "CAST(c3 AS BIGINT) AS fvalue",
        "CAST(c4 AS BIGINT) AS nvalue")),

    // :829 testDistinctWindow — RANK over a COUNT(DISTINCT) aggregate.
    "r83_ref_win_distinct_agg" -> one(
      "SELECT RANK() OVER (PARTITION BY orderdate ORDER BY COUNT(DISTINCT clerk)) rnk FROM orders GROUP BY orderdate, custkey ORDER BY rnk LIMIT 1",
      Seq("rnk"), Seq("CAST(c1 AS BIGINT) AS rnk")),

    // :1265 testGroupingInWindowFunction — grouping() inside a window
    // PARTITION BY over ROLLUP output. DuckDB rejects grouping() inside a
    // window spec, so the oracle hoists g into a subquery first (same rows).
    "r84_ref_win_grouping" -> one(
      "SELECT orderkey, custkey, sum(totalprice), grouping(orderkey)+grouping(custkey) AS g,        rank() OVER (PARTITION BY grouping(orderkey)+grouping(custkey),        CASE WHEN grouping(orderkey) = 0 THEN custkey END ORDER BY orderkey ASC) AS r FROM orders GROUP BY ROLLUP (orderkey, custkey) ORDER BY orderkey, custkey LIMIT 10",
      Seq("orderkey", "custkey", "tp", "g", "r"),
      Seq("c1 AS orderkey", "c2 AS custkey", "CAST(c3 AS DOUBLE) AS tp",
        "CAST(c4 AS BIGINT) AS g", "CAST(c5 AS BIGINT) AS r"),
      oracleSql = "SELECT orderkey, custkey, tp, g, rank() OVER (PARTITION BY g, cs ORDER BY orderkey ASC) AS r FROM (SELECT orderkey, custkey, sum(totalprice) AS tp, grouping(orderkey)+grouping(custkey) AS g, CASE WHEN grouping(orderkey) = 0 THEN custkey END AS cs FROM orders GROUP BY ROLLUP (orderkey, custkey)) ORDER BY orderkey, custkey LIMIT 10"),

    // AbstractTestQueries testQuantifiedComparison — the full ALL/ANY/SOME
    // operator family over nation/region, VERBATIM (inequality forms lower
    // to the aggregate-bound CASE expansion in PrestoSql.quantifiedCmp;
    // DuckDB runs the quantified grammar natively, so the oracle is the
    // same text).
    "r85_ref_quantified_comparison" -> batchCols(
      Seq("nationkey", "name", "regionkey"),
      Seq("c1 AS nationkey", "c2 AS name", "c3 AS regionkey"), Seq(
      "q01" -> "SELECT nationkey, name, regionkey FROM nation WHERE regionkey = ALL (SELECT regionkey FROM region WHERE name IN ('ASIA', 'EUROPE'))",
      "q02" -> "SELECT nationkey, name, regionkey FROM nation WHERE regionkey <> ANY (SELECT regionkey FROM region WHERE name IN ('ASIA', 'EUROPE'))",
      "q03" -> "SELECT nationkey, name, regionkey FROM nation WHERE regionkey <> ALL (SELECT regionkey FROM region WHERE name IN ('ASIA', 'EUROPE'))",
      "q04" -> "SELECT nationkey, name, regionkey FROM nation WHERE regionkey = ALL (SELECT regionkey FROM region WHERE name IN ('ASIA'))",
      "q05" -> "SELECT nationkey, name, regionkey FROM nation WHERE regionkey <> ALL (SELECT regionkey FROM region WHERE name IN ('ASIA'))",
      "q06" -> "SELECT nationkey, name, regionkey FROM nation WHERE regionkey = ANY (SELECT regionkey FROM region WHERE name IN ('EUROPE'))",
      "q07" -> "SELECT nationkey, name, regionkey FROM nation WHERE regionkey <> ANY (SELECT regionkey FROM region WHERE name IN ('EUROPE'))",
      "q08" -> "SELECT nationkey, name, regionkey FROM nation WHERE regionkey < SOME (SELECT regionkey FROM region WHERE name IN ('ASIA', 'EUROPE'))",
      "q09" -> "SELECT nationkey, name, regionkey FROM nation WHERE regionkey <= ANY (SELECT regionkey FROM region WHERE name IN ('ASIA', 'EUROPE'))",
      "q10" -> "SELECT nationkey, name, regionkey FROM nation WHERE regionkey > ANY (SELECT regionkey FROM region WHERE name IN ('ASIA', 'EUROPE'))",
      "q11" -> "SELECT nationkey, name, regionkey FROM nation WHERE regionkey >= SOME (SELECT regionkey FROM region WHERE name IN ('ASIA', 'EUROPE'))",
      "q12" -> "SELECT nationkey, name, regionkey FROM nation WHERE regionkey < ALL (SELECT regionkey FROM region WHERE name IN ('ASIA', 'EUROPE'))",
      "q13" -> "SELECT nationkey, name, regionkey FROM nation WHERE regionkey <= ALL (SELECT regionkey FROM region WHERE name IN ('ASIA', 'EUROPE'))",
      "q14" -> "SELECT nationkey, name, regionkey FROM nation WHERE regionkey > ALL (SELECT regionkey FROM region WHERE name IN ('ASIA', 'EUROPE'))",
      "q15" -> "SELECT nationkey, name, regionkey FROM nation WHERE regionkey >= ALL (SELECT regionkey FROM region WHERE name IN ('ASIA', 'EUROPE'))")),

    // AbstractTestAggregations.java:1190 testOrderedAggregations, VERBATIM:
    // array_agg(x ORDER BY y) + FILTER + GROUPING SETS in one statement
    // (ordered aggregates lower to array_sort-after-collect in PrestoSql).
    // presto-product-tests sql-tests/testcases (verbatim; tag = testcase file)
    "r190_pt_corpus" -> batchCols(
      Seq("k1"),
      Seq("CAST(c1 AS BIGINT) AS k1"),
      Seq(
        ("order_by/orderByAscNullsDefault", "select * from (select cast(null as bigint) union all select 1) T order by 1 asc"),
        ("order_by/orderByAscNullsFirst", "select * from (select cast(null as bigint) union all select 1) T order by 1 asc nulls first"),
        ("order_by/orderByAscNullsLast", "select * from (select cast(null as bigint) union all select 1) T order by 1 asc nulls last"),
        ("order_by/orderByDefaultNullsDefault", "select * from (select cast(null as bigint) union all select 1) T order by 1"),
        ("order_by/orderByDefaultNullsFirst", "select * from (select cast(null as bigint) union all select 1) T order by 1 nulls first"),
        ("order_by/orderByDefaultNullsLast", "select * from (select cast(null as bigint) union all select 1) T order by 1 nulls last"),
        ("order_by/orderByDescNullsFirst", "select * from (select cast(null as bigint) union all select 1) T order by 1 desc nulls first"),
        ("order_by/orderByDescNullsLast", "select * from (select cast(null as bigint) union all select 1) T order by 1 desc nulls last"),
        ("group-by/runHavingWithoutGroupBy", "SELECT COUNT(*) FROM nation HAVING COUNT(*) > 20"),
        ("limit/useRestrictiveLimitFromSubq", "SELECT COUNT(*) FROM (SELECT * FROM nation LIMIT 2) AS foo LIMIT 5")),
      sparkCast = Map("k1" -> "bigint")),

    // presto-product-tests sql-tests/testcases (verbatim; tag = testcase file)
    "r191_pt_corpus" -> batchCols(
      Seq("k1"),
      Seq("CAST(c1 AS BIGINT) AS k1"),
      Seq(
        ("limit/withLimitZero", "SELECT COUNT(*) FROM (SELECT * FROM nation LIMIT 0) foo"),
        ("limit/withSubq", "SELECT COUNT(*) FROM (SELECT * FROM nation LIMIT 10) t1"),
        ("with_clause/withExprAccessingAnotherAndAlsoFromParents", "WITH w1 AS (select * from nation), w2 AS (select * from w1) select count(*) from w1, w2"),
        ("with_clause/withSimpleExprInNestedFromClause", "WITH nested AS (SELECT * FROM nation) SELECT count(*) FROM (select * FROM nested) as a")),
      sparkCast = Map("k1" -> "bigint")),

    // presto-product-tests sql-tests/testcases (verbatim; tag = testcase file)
    "r192_pt_corpus" -> batchCols(
      Seq("k1", "k2"),
      Seq("CAST(c1 AS BIGINT) AS k1",
        "CAST(c2 AS BIGINT) AS k2"),
      Seq(
        ("window_functions/rangeCurrent", "SELECT nationkey, min(nationkey) OVER (PARTITION BY regionkey ORDER BY comment RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS min FROM nation"),
        ("window_functions/rangeUnbounded", "SELECT nationkey, min(nationkey) OVER (PARTITION BY regionkey ORDER BY comment RANGE BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS min FROM nation"),
        ("window_functions/rowsBounded", "SELECT nationkey, min(nationkey) OVER (PARTITION BY regionkey ORDER BY nationkey ROWS BETWEEN 2 PRECEDING AND 1 FOLLOWING) AS min FROM nation"),
        ("window_functions/rowsUnbounded", "SELECT nationkey, min(nationkey) OVER (PARTITION BY regionkey ORDER BY comment ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS min FROM nation"),
        ("order_by/orderByOrdinals", "select regionkey, nationkey from nation order by 1, 2"),
        ("select_no_from/withGroupOrderHaving", "SELECT MIN(10), 3 as col1 GROUP BY 2 HAVING 6 > 5 ORDER BY 1")),
      sparkCast = Map("k1" -> "bigint", "k2" -> "bigint")),

    // presto-product-tests sql-tests/testcases (verbatim; tag = testcase file)
    "r193_pt_corpus" -> batchCols(
      Seq("k1", "k2", "k3", "k4"),
      Seq("CAST(c1 AS BIGINT) AS k1",
        "CAST(c2 AS BIGINT) AS k2",
        "CAST(c3 AS DOUBLE) AS k3",
        "CAST(c4 AS DOUBLE) AS k4"),
      Seq(
        ("window_functions/rowsFrame2F3F", "select orderkey, suppkey, quantity, round(sum(quantity) over (partition by suppkey order by orderkey rows between 2 following and 3 following), 5) total_quantity from lineitem where partkey = 272"),
        ("window_functions/rowsFrame2FUBF", "select orderkey, suppkey, quantity, round(sum(quantity) over (partition by suppkey order by orderkey rows between 2 following and unbounded following), 5) total_quantity from lineitem where partkey = 272"),
        ("window_functions/rowsFrame3P2P", "select orderkey, suppkey, quantity, round(sum(quantity) over (partition by suppkey order by orderkey rows between 3 preceding and 2 preceding), 5) total_quantity from lineitem where partkey = 272"),
        ("window_functions/rowsFrameUBP2P", "select orderkey, suppkey, quantity, round(sum(quantity) over (partition by suppkey order by orderkey rows between unbounded preceding and 2 preceding), 5) total_quantity from lineitem where partkey = 272"),
        ("window_functions/rowsUBPImplicitCR", "select orderkey, suppkey, quantity, round(sum(quantity) over (partition by suppkey order by orderkey rows unbounded preceding), 5) total_quantity from lineitem where partkey = 272")),
      sparkCast = Map("k1" -> "bigint", "k2" -> "bigint", "k3" -> "double", "k4" -> "double")),

    // presto-product-tests sql-tests/testcases (verbatim; tag = testcase file)
    "r194_pt_corpus" -> batchCols(
      Seq("k1"),
      Seq("CAST(c1 AS BIGINT) AS k1"),
      Seq(
        ("group-by/runConstantGroupBy", "select 2 from nation group by 1"),
        ("select_no_from/withUnionAll", "SELECT 1 UNION ALL SELECT 2 UNION ALL SELECT 4*5 UNION ALL SELECT -5"),
        ("select_no_from/withWhereClause", "SELECT 1 WHERE TRUE AND 2=2"),
        ("horology_functions/extractAccessible", "SELECT extract(day from TIMESTAMP '2001-08-22 03:04:05.321')"),
        // DuckDB map[key] yields a LIST — the oracle unwraps it
        ("map_functions/mapRetrieveOperatorWorks", "select MAP(ARRAY ['ala', 'kot'], ARRAY[3, 4]) ['kot']",
          "select (MAP(ARRAY ['ala', 'kot'], ARRAY[3, 4]) ['kot'])[1]")),
      sparkCast = Map("k1" -> "bigint")),

    // presto-product-tests sql-tests/testcases (verbatim; tag = testcase
    // file). The companion testcases windowSpecificationAAcpA/ABcpA are NOT
    // gated: their lag() runs over `ORDER BY orderkey` with TIED keys inside
    // a partition, so which neighbor lag sees is engine-arbitrary (the
    // LIMIT-over-ties rule).
    "r195_pt_corpus" -> batchCols(
      Seq("k1", "k2", "k3", "k4", "k5", "k6"),
      Seq("CAST(c1 AS BIGINT) AS k1",
        "CAST(c2 AS BIGINT) AS k2",
        "CAST(c3 AS BIGINT) AS k3",
        "CAST(c4 AS DOUBLE) AS k4",
        "CAST(c5 AS DOUBLE) AS k5",
        "CAST(c6 AS DOUBLE) AS k6"),
      Seq(
                ("window_functions/windowSpecificationABA", "select suppkey, orderkey, partkey, round(sum(quantity) over (partition by suppkey order by orderkey rows between unbounded preceding and current row), 3) sum_quantity_A, round(sum(quantity) over (partition by orderkey order by shipdate rows between UNBOUNDED preceding and CURRENT ROW), 3) sum_quantity_B, round(sum(discount) over (partition by suppkey order by orderkey rows between unbounded preceding and current row), 3) sum_discount_A from lineitem where (partkey = 272 or partkey = 273) and suppkey > 50"),
                ("window_functions/windowSpecificationBcpAA", "select suppkey, orderkey, partkey, nth_value(quantity, 4) over (partition by partkey order by orderkey rows between UNBOUNDED preceding and CURRENT ROW) nth_value_quantity_B, round(sum(quantity) over (partition by suppkey order by orderkey rows between unbounded preceding and current row), 3) sum_quantity_A, round(sum(discount) over (partition by suppkey order by orderkey rows between unbounded preceding and current row), 3) sum_discount_A from lineitem where (partkey = 272 or partkey = 273) and suppkey > 50")),
      sparkCast = Map("k1" -> "bigint", "k2" -> "bigint", "k3" -> "bigint", "k4" -> "double", "k5" -> "double", "k6" -> "double")),

    // presto-product-tests sql-tests/testcases (verbatim; tag = testcase file)
    "r196_pt_corpus" -> batchCols(
      Seq("k1", "k2", "k3", "k4", "k5", "k6", "k7", "k8"),
      Seq("CAST(c1 AS BIGINT) AS k1",
        "CAST(c2 AS BIGINT) AS k2",
        "CAST(c3 AS DOUBLE) AS k3",
        "CAST(c4 AS DOUBLE) AS k4",
        "CAST(c5 AS DOUBLE) AS k5",
        "CAST(c6 AS DOUBLE) AS k6",
        "CAST(c7 AS DOUBLE) AS k7",
        "CAST(c8 AS DOUBLE) AS k8"),
      Seq(
        ("window_functions/rowsDisjointWindows", "select orderkey, suppkey, quantity, round(sum(quantity) over (partition by suppkey order by orderkey rows between unbounded preceding and 1 preceding), 5) total_quantity, extendedprice, round(sum(extendedprice) over (partition by suppkey order by orderkey rows between current row and 1 following), 5) total_extendedprice, discount, round(avg(discount) over (partition by suppkey order by orderkey rows between 3 following and unbounded following), 5) avg_discount from lineitem where partkey = 272"),
        ("window_functions/rowsIdenticalWindows", "select orderkey, suppkey, quantity, round(sum(quantity) over (partition by suppkey order by orderkey rows between unbounded preceding and current row), 5) total_quantity, extendedprice, round(sum(extendedprice) over (partition by suppkey order by orderkey rows between unbounded preceding and current row), 5) total_extendedprice, discount, round(avg(discount) over (partition by suppkey order by orderkey rows between unbounded preceding and current row), 5) avg_discount from lineitem where partkey = 272"),
        ("window_functions/rowsIntersectingWindows", "select orderkey, suppkey, quantity, round(sum(quantity) over (partition by suppkey order by orderkey rows between 3 preceding and 1 following), 5) total_quantity, extendedprice, round(sum(extendedprice) over (partition by suppkey order by orderkey rows between 1 preceding and 2 following), 5) total_extendedprice, discount, round(avg(discount) over (partition by suppkey order by orderkey rows between current row and unbounded following), 5) avg_discount from lineitem where partkey = 272")),
      sparkCast = Map("k1" -> "bigint", "k2" -> "bigint", "k3" -> "double", "k4" -> "double", "k5" -> "double", "k6" -> "double", "k7" -> "double", "k8" -> "double")),

    // presto-product-tests sql-tests/testcases (verbatim; tag = testcase file)
    "r197_pt_corpus" -> batchCols(
      Seq("k1", "k2", "k3"),
      Seq("CAST(c1 AS BIGINT) AS k1",
        "CAST(c2 AS BIGINT) AS k2",
        "CAST(c3 AS VARCHAR) AS k3"),
      Seq(
        ("order_by/orderByAggregate", "select regionkey as nationkey, nationkey as regionkey, name from nation where nationkey < 20 order by nationkey desc, regionkey asc"),
        ("order_by/orderByAliasSameAsColumn", "select regionkey as nationkey, nationkey as regionkey, name from nation where nationkey < 20 order by nationkey desc, regionkey asc"),
        ("order_by/runOrderByWithFromSubq", "select nationkey, regionkey, name from (select regionkey, nationkey, name from nation where nationkey < 20 order by 2 desc limit 5) t order by 2, 1 asc")),
      sparkCast = Map("k1" -> "bigint", "k2" -> "bigint")),

    // presto-product-tests sql-tests/testcases (verbatim; tag = testcase file)
    "r198_pt_corpus" -> batchCols(
      Seq("k1"),
      Seq("CAST(c1 AS VARCHAR) AS k1"),
      Seq(
        ("order_by/orderByDistinctColumnDesc", "select distinct brand from part where partkey < 15 order by 1 desc"),
        ("string_functions/likeOperatorWorks", "select name from nation where name like '%AN'"),
        ("convertion_functions/castAccessible", "SELECT CAST(10 as VARCHAR)"))),

    // presto-product-tests sql-tests/testcases (verbatim; tag = testcase file)
    "r199_pt_corpus" -> batchCols(
      Seq("k1", "k2", "k3", "k4", "k5", "k6"),
      Seq("CAST(c1 AS BIGINT) AS k1",
        "CAST(c2 AS BIGINT) AS k2",
        "CAST(c3 AS DOUBLE) AS k3",
        "CAST(c4 AS DOUBLE) AS k4",
        "CAST(c5 AS DOUBLE) AS k5",
        "CAST(c6 AS DOUBLE) AS k6"),
      Seq(
        ("window_functions/rowsDifferentOrders", "select orderkey, suppkey, extendedprice, round(sum(extendedprice) over (partition by suppkey order by orderkey desc rows between unbounded preceding and current row), 5) total_extendedprice, discount, round(avg(discount) over (partition by suppkey order by orderkey asc rows between unbounded preceding and current row), 5) avg_discount from lineitem where partkey = 272"),
        ("window_functions/rowsRangeLeadLag", "select orderkey, suppkey, discount, lead(discount) over (partition by suppkey order by orderkey desc) next_discount, extendedprice, lag(extendedprice) over (partition by discount order by extendedprice range current row) previous_extendedprice from lineitem where partkey = 272")),
      sparkCast = Map("k1" -> "bigint", "k2" -> "bigint", "k3" -> "double", "k4" -> "double", "k5" -> "double", "k6" -> "double")),

    // presto-product-tests sql-tests/testcases (verbatim; tag = testcase file)
    "r200_pt_corpus" -> batchCols(
      Seq("k1", "k2", "k3", "k4"),
      Seq("CAST(c1 AS BIGINT) AS k1",
        "CAST(c2 AS VARCHAR) AS k2",
        "CAST(c3 AS BIGINT) AS k3",
        "CAST(c4 AS VARCHAR) AS k4"),
      Seq(
        ("union/unionAllSameTable", "SELECT * FROM nation UNION ALL SELECT * FROM nation"),
        ("union/unionDistinctSameTable", "SELECT * FROM nation UNION DISTINCT SELECT * FROM nation")),
      sparkCast = Map("k1" -> "bigint", "k3" -> "bigint")),

    // presto-product-tests sql-tests/testcases (verbatim; tag = testcase file)
    "r201_pt_corpus" -> batchCols(
      Seq("k1", "k2", "k3", "k4"),
      Seq("CAST(c1 AS BIGINT) AS k1",
        "CAST(c2 AS BIGINT) AS k2",
        "CAST(c3 AS DOUBLE) AS k3",
        "CAST(c4 AS BIGINT) AS k4"),
      Seq(
        ("window_functions/noOrderAllRowsPeers", "select orderkey, suppkey, discount, rank() over (partition by suppkey) from lineitem where partkey = 272")),
      sparkCast = Map("k1" -> "bigint", "k2" -> "bigint", "k3" -> "double", "k4" -> "bigint")),

    // presto-product-tests sql-tests/testcases (verbatim; tag = testcase file)
    "r202_pt_corpus" -> batchCols(
      Seq("k1", "k2", "k3", "k4", "k5"),
      Seq("CAST(c1 AS BIGINT) AS k1",
        "CAST(c2 AS DOUBLE) AS k2",
        "CAST(c3 AS DOUBLE) AS k3",
        "CAST(c4 AS DOUBLE) AS k4",
        "CAST(c5 AS DOUBLE) AS k5"),
      Seq(
        ("window_functions/rangeNoPartition", "select orderkey, discount, extendedprice, min(extendedprice) over (order by discount range current row) min_extendedprice, max(extendedprice) over (order by discount range current row) max_extendedprice from lineitem where partkey = 272")),
      sparkCast = Map("k1" -> "bigint", "k2" -> "double", "k3" -> "double", "k4" -> "double", "k5" -> "double")),

    // presto-product-tests sql-tests/testcases (verbatim; tag = testcase file)
    "r203_pt_corpus" -> batchCols(
      Seq("k1", "k2", "k3", "k4"),
      Seq("CAST(c1 AS BIGINT) AS k1",
        "CAST(c2 AS DOUBLE) AS k2",
        "CAST(c3 AS BIGINT) AS k3",
        "CAST(c4 AS BIGINT) AS k4"),
      Seq(
        ("window_functions/rankFunctionsImplicitExplicitFrame", "select orderkey, discount, dense_rank() over (order by discount), rank() over (order by discount range between unbounded preceding and current row) from lineitem where partkey = 272")),
      sparkCast = Map("k1" -> "bigint", "k2" -> "double", "k3" -> "bigint", "k4" -> "bigint")),

    // presto-product-tests sql-tests/testcases (verbatim; tag = testcase file)
    "r204_pt_corpus" -> batchCols(
      Seq("k1", "k2", "k3", "k4", "k5"),
      Seq("CAST(c1 AS BIGINT) AS k1",
        "CAST(c2 AS BIGINT) AS k2",
        "CAST(c3 AS DOUBLE) AS k3",
        "CAST(c4 AS DOUBLE) AS k4",
        "CAST(c5 AS DOUBLE) AS k5"),
      Seq(
        ("window_functions/rowsFirstLast", "select orderkey, suppkey, extendedprice, first_value(extendedprice) over (partition by suppkey order by extendedprice desc rows between unbounded preceding and unbounded following), last_value(extendedprice) over (partition by suppkey order by extendedprice desc rows between unbounded preceding and unbounded following) from lineitem where partkey = 272")),
      sparkCast = Map("k1" -> "bigint", "k2" -> "bigint", "k3" -> "double", "k4" -> "double", "k5" -> "double")),

    // presto-product-tests sql-tests/testcases (verbatim; tag = testcase file)
    "r205_pt_corpus" -> batchCols(
      Seq("k1", "k2", "k3", "k4", "k5", "k6"),
      Seq("CAST(c1 AS BIGINT) AS k1",
        "CAST(c2 AS BIGINT) AS k2",
        "CAST(c3 AS BIGINT) AS k3",
        "CAST(c4 AS DOUBLE) AS k4",
        "CAST(c5 AS DOUBLE) AS k5",
        "CAST(c6 AS BIGINT) AS k6"),
      Seq(
        ("window_functions/windowSpecificationAABcp", "select suppkey, orderkey, partkey, round(sum(quantity) over (partition by suppkey order by orderkey rows between unbounded preceding and current row), 3) sum_quantity_A, round(sum(discount) over (partition by suppkey order by orderkey rows between unbounded preceding and current row), 3) sum_discount_A, ntile(4) over (partition by partkey order by orderkey rows between UNBOUNDED preceding and CURRENT ROW) ntile_quantity_B from lineitem where (partkey = 272 or partkey = 273) and suppkey > 50")),
      sparkCast = Map("k1" -> "bigint", "k2" -> "bigint", "k3" -> "bigint", "k4" -> "double", "k5" -> "double", "k6" -> "bigint")),

    // presto-product-tests sql-tests/testcases (verbatim; tag = testcase file)
    "r206_pt_corpus" -> batchCols(
      Seq("k1", "k2"),
      Seq("CAST(c1 AS DOUBLE) AS k1",
        "CAST(c2 AS BIGINT) AS k2"),
      Seq(
        ("order_by/orderByExpression", "select totalprice*1.0625, custkey from orders order by 1 limit 20")),
      sparkCast = Map("k1" -> "double", "k2" -> "bigint")),

    // presto-product-tests sql-tests/testcases (verbatim; tag = testcase file)
    "r207_pt_corpus" -> batchCols(
      Seq("k1", "k2", "k3"),
      Seq("CAST(c1 AS VARCHAR) AS k1",
        "CAST(c2 AS VARCHAR) AS k2",
        "CAST(c3 AS BIGINT) AS k3"),
      Seq(
        ("order_by/orderByMixOfColumnsAscDesc", "select orderdate, orderpriority, custkey from orders order by 1 desc, 2, 3 desc limit 20")),
      sparkCast = Map("k1" -> "string", "k3" -> "bigint")),

    // presto-product-tests sql-tests/testcases (verbatim; tag = testcase file)
    "r208_pt_corpus" -> batchCols(
      Seq("k1", "k2"),
      Seq("CAST(c1 AS DOUBLE) AS k1",
        "CAST(c2 AS VARCHAR) AS k2"),
      Seq(
        ("order_by/orderByNonProjectedAggregate", "select avg(retailprice), mfgr from part group by 2 order by count(*) limit 20")),
      sparkCast = Map("k1" -> "double")),

    // presto-product-tests sql-tests/testcases (verbatim; tag = testcase file)
    "r209_pt_corpus" -> batchCols(
      Seq("k1", "k2"),
      Seq("CAST(c1 AS BIGINT) AS k1",
        "CAST(c2 AS VARCHAR) AS k2"),
      Seq(
        ("order_by/orderByNonProjectedColumns", "select nationkey, name from nation order by regionkey, nationkey")),
      sparkCast = Map("k1" -> "bigint")),

    // presto-product-tests sql-tests/testcases (verbatim; tag = testcase file)
    "r210_pt_corpus" -> batchCols(
      Seq("k1", "k2"),
      Seq("CAST(c1 AS BIGINT) AS k1",
        "CAST(c2 AS VARCHAR) AS k2"),
      Seq(
        ("order_by/orderByNonProjectedExpression", "select custkey, orderstatus from orders order by totalprice*1.0625 limit 20")),
      sparkCast = Map("k1" -> "bigint")),

    // presto-product-tests sql-tests/testcases (verbatim; tag = testcase file)
    "r211_pt_corpus" -> batchCols(
      Seq("k1", "k2", "k3"),
      Seq("CAST(c1 AS BIGINT) AS k1",
        "CAST(c2 AS BIGINT) AS k2",
        "CAST(c3 AS DOUBLE) AS k3"),
      Seq(
        ("select_no_from/projectAggFuncs", "SELECT COUNT(10), MAX(50), MIN(90.0)")),
      sparkCast = Map("k1" -> "bigint", "k2" -> "bigint", "k3" -> "double")),

    // presto-product-tests sql-tests/testcases (verbatim; tag = testcase file)
    "r212_pt_corpus" -> batchCols(
      Seq("k1", "k2", "k3", "k4", "k5", "k6", "k7"),
      Seq("CAST(c1 AS BIGINT) AS k1",
        "CAST(c2 AS DOUBLE) AS k2",
        "CAST(c3 AS DOUBLE) AS k3",
        "CAST(c4 AS VARCHAR) AS k4",
        "CAST(c5 AS VARCHAR) AS k5",
        "CAST(c6 AS INT) AS k6",
        "CAST(c7 AS INT) AS k7"),
      Seq(
        ("select_no_from/projectConstants", "SELECT 1, 1.1, 100*5.1, 'a', 'dummy values', TRUE, FALSE")),
      sparkCast = Map("k1" -> "bigint", "k2" -> "double", "k3" -> "double", "k6" -> "int", "k7" -> "int")),

    // presto-product-tests sql-tests/testcases (verbatim; tag = testcase file)
    "r213_pt_corpus" -> batchCols(
      Seq("k1", "k2", "k3", "k4"),
      Seq("CAST(c1 AS DOUBLE) AS k1",
        "CAST(c2 AS DOUBLE) AS k2",
        "CAST(c3 AS INT) AS k3",
        "CAST(c4 AS INT) AS k4"),
      Seq(
        ("select_no_from/projectFunctions", "SELECT abs(-10.0E0), log2(4), TRUE AND FALSE, TRUE OR FALSE")),
      sparkCast = Map("k1" -> "double", "k2" -> "double", "k3" -> "int", "k4" -> "int")),

    // presto-product-tests sql-tests/testcases (verbatim; tag = testcase file)
    "r214_pt_corpus" -> batchCols(
      Seq("k1", "k2"),
      Seq("CAST(c1 AS BIGINT) AS k1",
        "CAST(c2 AS BIGINT) AS k2"),
      Seq(
        ("select_no_from/withWhereFalse", "SELECT COUNT(*), 1 WHERE FALSE")),
      sparkCast = Map("k1" -> "bigint", "k2" -> "bigint")),

    // presto-product-tests sql-tests/testcases (verbatim; tag = testcase file)
    "r215_pt_corpus" -> batchCols(
      Seq("k1", "k2", "k3", "k4", "k5"),
      Seq("CAST(c1 AS BIGINT) AS k1",
        "CAST(c2 AS BIGINT) AS k2",
        "CAST(c3 AS BIGINT) AS k3",
        "CAST(c4 AS BIGINT) AS k4",
        "CAST(c5 AS BIGINT) AS k5"),
      Seq(
        ("math_functions/checkMathOperatorsAccessible", "select 2+2, 5-2, 3*3, 8/2, 8%3")),
      sparkCast = Map("k1" -> "bigint", "k2" -> "bigint", "k3" -> "bigint", "k4" -> "bigint", "k5" -> "bigint")),

    // presto-product-tests sql-tests/testcases (verbatim; tag = testcase file)
    "r216_pt_corpus" -> batchCols(
      Seq("k1", "k2"),
      Seq("CAST(c1 AS VARCHAR) AS k1",
        "CAST(c2 AS BIGINT) AS k2"),
      Seq(
        ("convertion_functions/tryCastAccessible", "SELECT TRY_CAST(10 as VARCHAR), TRY_CAST('ala' as BIGINT)")),
      sparkCast = Map("k2" -> "bigint")),

    // presto-product-tests sql-tests/testcases, hive raw-named tables (verbatim)
    "r217_pt_raw" -> batchCols(
      Seq("k1", "k2"),
      Seq("CAST(c1 AS VARCHAR) AS k1",
        "CAST(c2 AS VARCHAR) AS k2"),
      Seq(
        ("join/cross_join", "select n_name, r_name from nation cross join region"),
        ("join/explicit_inner_join_select_columns", "select n_name, r_name from nation join region on nation.n_regionkey = region.r_regionkey"),
        ("join/explicit_inner_join_select_where", "select n_name, r_name from nation join region on nation.n_regionkey = region.r_regionkey where n_name > 'E'"),
        ("join/implicit_inner_join_table_alias", "select n.n_name, r.r_name from nation n, region r where n.n_regionkey = r.r_regionkey"),
        ("join/implicit_less_then", "SELECT n_name, r_name FROM nation, region WHERE r_regionkey > n_nationkey"),
        ("join/implicit_not_equal", "SELECT n_name, r_name FROM nation, region WHERE r_regionkey != n_nationkey"),
        ("join/left_join_on_multiple_predicates", "select n_name, p_name from nation left outer join part on n_regionkey = p_partkey and n_name = p_name"),
        ("join/left_join_where_constant", "SELECT n_name, r_name FROM nation LEFT JOIN region ON n_nationkey = r_regionkey WHERE r_name > 'G'"),
        ("join/left_outer_join", "select n_name, r_name from nation left outer join region on n_nationkey = r_regionkey"),
        ("join/right_outer_join", "select n_name, r_name from region right outer join nation on n_nationkey = r_regionkey")),
      raw = true),

    // presto-product-tests sql-tests/testcases, hive raw-named tables (verbatim)
    "r218_pt_raw" -> batchCols(
      Seq("k1", "k2"),
      Seq("CAST(c1 AS VARCHAR) AS k1",
        "CAST(c2 AS VARCHAR) AS k2"),
      Seq(
        ("with_clause/withExprRepeated", "WITH wnation AS (SELECT n_name, n_nationkey, n_regionkey FROM nation) SELECT n1.n_name, n2.n_name FROM wnation n1 JOIN wnation n2 ON n1.n_nationkey=n2.n_regionkey")),
      raw = true),

    // presto-product-tests sql-tests/testcases, hive raw-named tables (verbatim)
    "r219_pt_raw" -> batchCols(
      Seq("k1"),
      Seq("CAST(c1 AS BIGINT) AS k1"),
      Seq(
        ("join/explicit_inner_join_select_count", "select count(*) from nation join region on nation.n_regionkey = region.r_regionkey"),
        ("group-by/runHavingOnEmptyResult", "SELECT COUNT(n_regionkey) FROM nation WHERE 1=2 HAVING SUM(n_regionkey) IS NULL"),
        ("limit/withJoinInSubq", "SELECT COUNT(*) FROM (SELECT * FROM nation n1 JOIN nation n2 ON n1.n_regionkey = n2.n_regionkey LIMIT 5) foo"),
        ("union/unionMoreThanTwoTables", "SELECT count(*) FROM nation UNION ALL SELECT sum(n_nationkey) FROM nation GROUP BY n_regionkey UNION ALL SELECT n_regionkey FROM nation"),
        ("union/unionOrderBy", "SELECT count(*) FROM nation UNION ALL SELECT sum(n_nationkey) FROM nation GROUP BY n_regionkey UNION ALL SELECT n_regionkey FROM nation ORDER BY 1 DESC"),
        ("union/unionWithAggregation", "SELECT count(*) FROM nation UNION ALL SELECT sum(n_nationkey) FROM nation GROUP BY n_regionkey"),
        ("limit/withGroupByInSubq", "SELECT COUNT(*) FROM ( SELECT ps_suppkey, COUNT(*) FROM partsupp GROUP BY ps_suppkey LIMIT 20) t1")),
      sparkCast = Map("k1" -> "bigint"),
      raw = true),

    // presto-product-tests sql-tests/testcases, hive raw-named tables (verbatim)
    "r220_pt_raw" -> batchCols(
      Seq("k1", "k2", "k3"),
      Seq("CAST(c1 AS BIGINT) AS k1",
        "CAST(c2 AS VARCHAR) AS k2",
        "CAST(c3 AS VARCHAR) AS k3"),
      Seq(
        ("join/implicit_explicit_inner", "SELECT p_partkey, n_name, r_name FROM nation, region JOIN part ON r_regionkey = p_partkey WHERE n_nationkey = r_regionkey"),
        ("join/implicit_explicit_left", "SELECT p_partkey, n_name, r_name FROM nation, region LEFT OUTER JOIN part ON r_regionkey = p_partkey WHERE n_nationkey = r_regionkey"),
        ("join/inner_join_right_outer_join", "SELECT p_partkey, n_name, r_name FROM part INNER JOIN nation ON n_regionkey = p_partkey RIGHT JOIN region ON n_nationkey = r_regionkey"),
        ("join/left_outer_join_inner_join", "SELECT p_partkey, n_name, r_name FROM nation LEFT JOIN region ON n_nationkey = r_regionkey INNER JOIN part ON n_regionkey = p_partkey"),
        ("join/right_join_left_join", "SELECT p_partkey, n_name, r_name FROM part RIGHT OUTER JOIN nation ON n_regionkey = p_partkey LEFT OUTER JOIN region ON n_nationkey = r_regionkey"),
        ("join/right_join_left_join_inner_join_parentheses", "SELECT p_partkey, n2.n_name, r_name FROM ( ( part RIGHT OUTER JOIN nation n1 ON n1.n_regionkey = p_partkey ) LEFT OUTER JOIN region ON n1.n_nationkey = r_regionkey ) INNER JOIN nation n2 ON n2.n_nationkey = r_regionkey"),
        ("join/right_join_left_join_parentheses", "SELECT p_partkey, n_name, r_name FROM (part RIGHT OUTER JOIN nation ON n_regionkey = p_partkey) LEFT OUTER JOIN region ON n_nationkey = r_regionkey")),
      sparkCast = Map("k1" -> "bigint"),
      raw = true),

    // presto-product-tests sql-tests/testcases, hive raw-named tables (verbatim)
    "r221_pt_raw" -> batchCols(
      Seq("k1"),
      Seq("CAST(c1 AS VARCHAR) AS k1"),
      Seq(
        ("join/left_join_where_is_not_null", "SELECT n_name FROM nation LEFT JOIN region ON n_nationkey = r_regionkey WHERE r_name is not null"),
        ("join/left_join_where_is_null", "SELECT n_name FROM nation LEFT JOIN region ON n_nationkey = r_regionkey WHERE r_name is null"),
        ("join/sub_select_in", "select n_name from nation where n_nationkey in (select r_regionkey from region)"),
        ("distinct/withNoDuplicates", "SELECT DISTINCT r_name FROM region"),
        ("with_clause/withExprWithNoReferenceInParent", "WITH ct AS (SELECT * FROM region) SELECT n_name FROM nation where n_nationkey = 0")),
      raw = true),

    // presto-product-tests sql-tests/testcases, hive raw-named tables (verbatim)
    "r222_pt_raw" -> batchCols(
      Seq("k1"),
      Seq("CAST(c1 AS BIGINT) AS k1"),
      Seq(
        ("group-by/runHavingOutsideSubq", "SELECT n_regionkey FROM (SELECT n_regionkey, COUNT(*) cnt FROM nation GROUP BY n_regionkey) t GROUP BY n_regionkey HAVING n_regionkey < 3 AND COUNT(cnt) > 0"),
        ("limit/predicateNotProjected", "SELECT n_nationkey FROM nation WHERE n_name < 'INDIA' ORDER BY n_nationkey LIMIT 3"),
        ("limit/withSimpleLimit", "SELECT n_nationkey from nation ORDER BY n_nationkey DESC LIMIT 5"),
        ("distinct/withDuplicates", "SELECT DISTINCT n_regionkey FROM nation"),
        ("distinct/withOrderBy", "SELECT DISTINCT n_regionkey FROM nation ORDER BY n_regionkey")),
      sparkCast = Map("k1" -> "bigint"),
      raw = true),

    // presto-product-tests sql-tests/testcases, hive raw-named tables (verbatim)
    "r223_pt_raw" -> batchCols(
      Seq("k1", "k2"),
      Seq("CAST(c1 AS BIGINT) AS k1",
        "CAST(c2 AS BIGINT) AS k2"),
      Seq(
        ("group-by/runAggregatesGroupByOridnalAndHaving", "select n_regionkey, count(*) from nation group by 1 having sum(n_regionkey) > 5 and sum(n_regionkey) < 20"),
        ("group-by/runCountNull", "SELECT n_regionkey, COUNT(null) FROM nation WHERE n_nationkey > 5 GROUP BY n_regionkey"),
        ("distinct/withGroupBy", "SELECT DISTINCT n_regionkey, COUNT(*) FROM nation WHERE n_nationkey > 0 GROUP BY n_regionkey"),
        ("distinct/withGroupByDistinctAgg", "SELECT n_regionkey, COUNT(DISTINCT n_name) FROM nation GROUP BY n_regionkey HAVING n_regionkey < 4")),
      sparkCast = Map("k1" -> "bigint", "k2" -> "bigint"),
      raw = true),

    // presto-product-tests sql-tests/testcases, hive raw-named tables (verbatim)
    "r224_pt_raw" -> batchCols(
      Seq("k1", "k2"),
      Seq("CAST(c1 AS BIGINT) AS k1",
        "CAST(c2 AS BIGINT) AS k2"),
      Seq(
        ("group-by/runAggregatesWithGroupByWithFalseWherePredicate", "select count(*), sum(n_nationkey) from nation where 1=2 group by n_regionkey"),
        ("group-by/runAggregatesWithoutGroupByButWithPredicates", "select count(*), sum(n_nationkey) from nation where 1=2"),
        ("distinct/repeatedDistinctAgg", "SELECT COUNT(DISTINCT n_regionkey), COUNT(DISTINCT n_regionkey) FROM nation"),
        ("distinct/withCount", "SELECT COUNT(DISTINCT n_regionkey), COUNT(*) FROM nation")),
      sparkCast = Map("k1" -> "bigint", "k2" -> "bigint"),
      raw = true),

    // presto-product-tests sql-tests/testcases, hive raw-named tables (verbatim)
    "r225_pt_raw" -> batchCols(
      Seq("k1", "k2"),
      Seq("CAST(c1 AS BIGINT) AS k1",
        "CAST(c2 AS BIGINT) AS k2"),
      Seq(
        ("limit/withGroupBy", "SELECT COUNT(*), n_regionkey FROM nation GROUP BY n_regionkey ORDER BY n_regionkey DESC LIMIT 2"),
        ("limit/withGroupByAndOrderByInSubq", "SELECT foo.c, foo.n_regionkey FROM (SELECT n_regionkey, COUNT(*) AS c FROM nation GROUP BY n_regionkey ORDER BY n_regionkey LIMIT 2) foo"),
        ("with_clause/withExprUsingAnotherWithExpr", "WITH w1 AS (select min(n_nationkey) as x , max(n_regionkey) as y from nation), w2 AS (select x, y from w1) select count(*) count, n_regionkey from nation group by n_regionkey union all select * from w2 order by n_regionkey, count")),
      sparkCast = Map("k1" -> "bigint", "k2" -> "bigint"),
      raw = true),

    // presto-product-tests sql-tests/testcases, hive raw-named tables (verbatim)
    "r226_pt_raw" -> batchCols(
      Seq("k1", "k2"),
      Seq("CAST(c1 AS BIGINT) AS k1",
        "CAST(c2 AS VARCHAR) AS k2"),
      Seq(
        ("join/explicit_inner_implicit_same_tables", "SELECT p_partkey, n_name FROM nation INNER JOIN part ON n_nationkey = p_partkey WHERE n_name < p_name"),
        ("join/explicit_left_implicit_same_tables", "SELECT p_partkey, n_name FROM nation LEFT JOIN part ON n_nationkey = p_partkey WHERE n_name < p_name")),
      sparkCast = Map("k1" -> "bigint"),
      raw = true),

    // presto-product-tests sql-tests/testcases, hive raw-named tables (verbatim)
    "r227_pt_raw" -> batchCols(
      Seq("k1", "k2", "k3"),
      Seq("CAST(c1 AS BIGINT) AS k1",
        "CAST(c2 AS BIGINT) AS k2",
        "CAST(c3 AS BIGINT) AS k3"),
      Seq(
        ("group-by/runAggregatesWithGroupByOrdinal", "select n_regionkey, count(*), sum(n_nationkey) from nation group by 1"),
        ("group-by/runAggregatesWithWherePredicatesAndGroupByOrdinal", "select n_regionkey, count(*), sum(n_regionkey) from nation where n_regionkey > 2 group by 1")),
      sparkCast = Map("k1" -> "bigint", "k2" -> "bigint", "k3" -> "bigint"),
      raw = true),

    // presto-product-tests sql-tests/testcases, hive raw-named tables (verbatim)
    "r228_pt_raw" -> batchCols(
      Seq("k1", "k2", "k3", "k4", "k5", "k6", "k7"),
      Seq("CAST(c1 AS BIGINT) AS k1",
        "CAST(c2 AS VARCHAR) AS k2",
        "CAST(c3 AS BIGINT) AS k3",
        "CAST(c4 AS VARCHAR) AS k4",
        "CAST(c5 AS BIGINT) AS k5",
        "CAST(c6 AS VARCHAR) AS k6",
        "CAST(c7 AS VARCHAR) AS k7"),
      Seq(
        ("join/explicit_inner_join_select_star", "select * from nation join region on nation.n_regionkey = region.r_regionkey")),
      sparkCast = Map("k1" -> "bigint", "k3" -> "bigint", "k5" -> "bigint"),
      raw = true),

    // presto-product-tests sql-tests/testcases, hive raw-named tables (verbatim)
    "r229_pt_raw" -> batchCols(
      Seq("k1", "k2", "k3", "k4", "k5"),
      Seq("CAST(c1 AS BIGINT) AS k1",
        "CAST(c2 AS BIGINT) AS k2",
        "CAST(c3 AS BIGINT) AS k3",
        "CAST(c4 AS BIGINT) AS k4",
        "CAST(c5 AS BIGINT) AS k5"),
      Seq(
        ("group-by/runAggrWithoutGroupBy", "select count(*), count(n_regionkey), min(n_regionkey), max(n_regionkey), sum(n_regionkey) from nation")),
      sparkCast = Map("k1" -> "bigint", "k2" -> "bigint", "k3" -> "bigint", "k4" -> "bigint", "k5" -> "bigint"),
      raw = true),

    // presto-product-tests sql-tests/testcases, hive raw-named tables (verbatim)
    "r230_pt_raw" -> batchCols(
      Seq("k1", "k2"),
      Seq("CAST(c1 AS VARCHAR) AS k1",
        "CAST(c2 AS BIGINT) AS k2"),
      Seq(
        ("group-by/runHavingWithMultipleAggs", "SELECT p_type, COUNT(*) FROM part GROUP BY p_type HAVING COUNT(*) > 20 and AVG(p_retailprice) > 1000")),
      sparkCast = Map("k2" -> "bigint"),
      raw = true),

    // presto-product-tests sql-tests/testcases, hive raw-named tables (verbatim)
    "r231_pt_raw" -> batchCols(
      Seq("k1", "k2", "k3"),
      Seq("CAST(c1 AS BIGINT) AS k1",
        "CAST(c2 AS BIGINT) AS k2",
        "CAST(c3 AS BIGINT) AS k3"),
      Seq(
        ("group-by/runMultipleGroupBy", "SELECT COUNT(*), n_regionkey, n_nationkey FROM nation WHERE n_regionkey < 2 GROUP BY n_nationkey, n_regionkey ORDER BY n_regionkey, n_nationkey DESC")),
      sparkCast = Map("k1" -> "bigint", "k2" -> "bigint", "k3" -> "bigint"),
      raw = true),

    // presto-product-tests sql-tests/testcases, hive raw-named tables (verbatim)
    "r232_pt_raw" -> batchCols(
      Seq("k1", "k2", "k3"),
      Seq("CAST(c1 AS BIGINT) AS k1",
        "CAST(c2 AS BIGINT) AS k2",
        "CAST(c3 AS BIGINT) AS k3"),
      Seq(
        ("distinct/multipleDistinctAgg", "SELECT COUNT(DISTINCT n_regionkey), COUNT(DISTINCT n_name), MIN(DISTINCT n_nationkey) FROM nation")),
      sparkCast = Map("k1" -> "bigint", "k2" -> "bigint", "k3" -> "bigint"),
      raw = true),

    // presto-product-tests sql-tests/testcases, hive raw-named tables (verbatim)
    "r233_pt_raw" -> batchCols(
      Seq("k1", "k2"),
      Seq("CAST(c1 AS BIGINT) AS k1",
        "CAST(c2 AS BIGINT) AS k2"),
      Seq(
        ("with_clause/multipleWithExprsReferencedFromParent", "WITH wnation AS (SELECT n_nationkey, n_regionkey FROM nation), wregion AS (SELECT r_regionkey, r_name FROM region) select n.n_nationkey, r.r_regionkey from wnation n join wregion r on n.n_regionkey = r.r_regionkey where r.r_name = 'AFRICA'")),
      sparkCast = Map("k1" -> "bigint", "k2" -> "bigint"),
      raw = true),

    // presto-product-tests sql-tests/testcases, hive raw-named tables (verbatim)
    "r234_pt_raw" -> batchCols(
      Seq("k1", "k2"),
      Seq("CAST(c1 AS BIGINT) AS k1",
        "CAST(c2 AS VARCHAR) AS k2"),
      Seq(
        ("with_clause/withExprReferencedInWhereClause", "WITH wregion AS (select min(n_regionkey) from nation where n_name >= 'N') select r_regionkey, r_name from region where r_regionkey IN (SELECT * FROM wregion)")),
      sparkCast = Map("k1" -> "bigint"),
      raw = true),

    // presto-product-tests sql-tests/testcases, hive raw-named tables (verbatim)
    "r235_pt_raw" -> batchCols(
      Seq("k1", "k2", "k3"),
      Seq("CAST(c1 AS BIGINT) AS k1",
        "CAST(c2 AS BIGINT) AS k2",
        "CAST(c3 AS VARCHAR) AS k3"),
      Seq(
        ("with_clause/withExprUsingOrderbyLimit", "WITH ordered AS (select n_nationkey a, n_regionkey b, n_name c from nation order by 1,2 limit 10) select * from ordered order by 1,2 limit 5")),
      sparkCast = Map("k1" -> "bigint", "k2" -> "bigint"),
      raw = true),

    // AbstractTestQueries.java :6363-:6516 — subquery shapes Presto plans
    // from any expression context (SubqueryPlanner/PlanNodeDecorrelator)
    // that Spark refuses without graft.Decorrelate: correlation through a
    // trivial subrelation, EXISTS in an inner-join ON predicate
    // referencing both sides, and the ORDER BY hoist. DuckDB shares
    // Spark's refusals, so each oracle is the decorrelated equivalent —
    // checking the REWRITE's semantics, not echoing it.
    "r236_ref_decorrelate" -> batch(Seq(
      ("d6438", "SELECT count(*) FROM orders o WHERE (SELECT * FROM (SELECT EXISTS(SELECT 1 WHERE o.orderkey = 0)))",
                "SELECT count(*) FROM orders o WHERE o.orderkey = 0"),
      ("d6384", "SELECT count(*) FROM orders o WHERE (SELECT * FROM (SELECT EXISTS(SELECT o.orderkey)))",
                "SELECT count(*) FROM orders"),
      ("d6516", "SELECT count(*) FROM orders o WHERE (SELECT * FROM (SELECT EXISTS(SELECT 1 FROM orders i WHERE o.orderkey < i.orderkey AND i.orderkey % 1000 = 0)))",
                "SELECT count(*) FROM orders o WHERE EXISTS(SELECT 1 FROM orders i WHERE o.orderkey < i.orderkey AND i.orderkey % 1000 = 0)"),
      ("d6428", "SELECT count(*) FROM (SELECT * FROM orders ORDER BY orderkey LIMIT 10) o1 JOIN (SELECT * FROM orders ORDER BY orderkey LIMIT 5) o2 ON NOT EXISTS(SELECT 1 WHERE o1.orderkey = o2.orderkey)",
                "SELECT count(*) FROM (SELECT * FROM orders ORDER BY orderkey LIMIT 10) o1 JOIN (SELECT * FROM orders ORDER BY orderkey LIMIT 5) o2 ON o1.orderkey <> o2.orderkey"),
      ("d6509", "SELECT count(*) FROM (SELECT * FROM orders ORDER BY orderkey LIMIT 10) o1 JOIN (SELECT * FROM orders ORDER BY orderkey LIMIT 5) o2 ON NOT EXISTS(SELECT 1 FROM orders i WHERE o1.orderkey < o2.orderkey AND i.orderkey % 10000 = 0)",
                "SELECT count(*) FROM (SELECT * FROM orders ORDER BY orderkey LIMIT 10) o1 JOIN (SELECT * FROM orders ORDER BY orderkey LIMIT 5) o2 ON NOT (o1.orderkey < o2.orderkey AND EXISTS(SELECT 1 FROM orders i WHERE i.orderkey % 10000 = 0))"),
      ("d6073", "SELECT count(*) FROM (SELECT nationkey FROM nation n ORDER BY (SELECT 2 * n.nationkey) LIMIT 5) t",
                "SELECT count(*) FROM (SELECT nationkey FROM nation ORDER BY nationkey LIMIT 5) t"))),

    // AbstractTestQueries.java :1828 testQualifiedWildcardFromJoin — the
    // reference's own expected side: qualified star over a USING join
    // EXCLUDES the using columns (DuckDB, like Spark, includes them — the
    // oracle spells out Presto's expansion).
    "r237_ref_using_star" -> batchCols(
      Seq("partkey", "custkey"),
      Seq("CAST(c1 AS BIGINT) AS partkey", "CAST(c2 AS BIGINT) AS custkey"),
      Seq(
        ("q1828", "SELECT a.*, b.* FROM (SELECT orderkey, partkey FROM lineitem) a JOIN (SELECT orderkey, custkey FROM orders) b using (orderkey)",
                  "SELECT a.partkey, b.custkey FROM (SELECT orderkey, partkey FROM lineitem) a JOIN (SELECT orderkey, custkey FROM orders) b on a.orderkey = b.orderkey"))),

    // Subquery expressions as NON-lambda arguments of a higher-order
    // function: Presto plans them via ApplyNode from any expression
    // context (SubqueryPlanner.java:69; the ExpressionAnalyzer.java:1044
    // ban covers only subqueries INSIDE the lambda body), Spark's
    // ResolveLambdaVariables refuses subqueries anywhere under a HOF —
    // closed by Decorrelate.hoistHofSubqueries (hidden-projection hoist).
    // DuckDB shares Presto's acceptance through its list lambdas, so the
    // oracle replays the same shape in DuckDB spelling.
    "r240_ref_hof_subquery" -> batch(Seq(
      ("h01", "SELECT cardinality(filter((SELECT array_agg(custkey) FROM customer), x -> x < 5))",
              "SELECT len(list_filter((SELECT list(custkey) FROM customer), x -> x < 5))"),
      ("h02", "SELECT CAST(sum(cardinality(filter((SELECT array_agg(custkey) FROM customer WHERE custkey < 100), x -> x <= orderkey % 100))) AS BIGINT) FROM orders",
              "SELECT CAST(sum(len(list_filter((SELECT list(custkey) FROM customer WHERE custkey < 100), x -> x <= orderkey % 100))) AS BIGINT) FROM orders"),
      ("h03", "SELECT count(*) FROM orders WHERE cardinality(filter((SELECT array_agg(custkey) FROM customer WHERE custkey < 50), x -> x = custkey)) > 0",
              "SELECT count(*) FROM orders WHERE len(list_filter((SELECT list(custkey) FROM customer WHERE custkey < 50), x -> x = custkey)) > 0"),
      ("h04", "SELECT element_at(transform((SELECT array_agg(custkey ORDER BY custkey) FROM customer WHERE custkey < 3), x -> x * 10), 1)",
              "SELECT (list_transform((SELECT list(custkey ORDER BY custkey) FROM customer WHERE custkey < 3), x -> x * 10))[1]"))),

    // TestDateTimeFunctionsBase:795 parse-side ISO-week tokens; values are
    // the reference's own expected timestamps (as dates — midnight).
    "r238_ref_week_parse" -> one(
      "SELECT CAST(CAST(date_parse('1998 53', '%x %v') AS DATE) AS VARCHAR) AS d1, " +
        "CAST(CAST(date_parse('2017 1', '%x %v') AS DATE) AS VARCHAR) AS d2, " +
        "date_format(date_parse('2001 02', '%x %v'), '%x %v') AS d3",
      Seq("d1", "d2", "d3"),
      Seq("c1 AS d1", "c2 AS d2", "c3 AS d3"),
      oracleSql = "SELECT '1998-12-28', '2017-01-02', '2001 02'"),

    // The one-arg assertQuery/assertQueryOrdered TAIL of
    // AbstractTestQueries.java — the reference statements not already
    // embedded elsewhere in this corpus, auto-grouped by output schema
    // (each case tag is the reference test method + harvest index). The
    // reference protocol runs the same text against H2; here the DuckDB
    // oracle replays it (overrides only where DuckDB diverges from
    // Presto: `/` on integers is truncating in Presto, float in DuckDB;
    // DuckDB cannot put a scalar subquery in an outer-join condition).
    // Row ORDER of the assertQueryOrdered statements is pinned by
    // OneArgTailSpec; the driver gate hashes the value multiset.
    "r239a_ref_onearg_tail" -> batchCols(
      Seq("d01"),
      Seq("CAST(c1 AS BIGINT) AS d01"),
      Seq(
        ("testDistinctWithOrderBy_0", "SELECT DISTINCT custkey FROM orders ORDER BY custkey LIMIT 10"),
        ("testJoinWithRangePredicatesinJoinClause_8", "SELECT COUNT(*) FROM (SELECT * FROM lineitem WHERE orderkey % 16 = 0 AND partkey % 2 = 0) lineitem JOIN (SELECT * FROM orders WHERE orderkey % 16 = 0 AND custkey % 2 = 0) orders ON lineitem.orderkey % 8 = orders.orderkey % 8 AND lineitem.linenumber % 2 = 0 AND orders.custkey % 8 < 7 AND lineitem.suppkey % 10 < orders.custkey % 7 AND lineitem.suppkey % 7 > orders.custkey % 7"),
        ("testJoinWithRangePredicatesinJoinClause_9", "SELECT COUNT(*) FROM (SELECT * FROM lineitem WHERE orderkey % 16 = 0 AND partkey % 2 = 0) lineitem JOIN (SELECT * FROM orders WHERE orderkey % 16 = 0 AND custkey % 2 = 0) orders ON lineitem.orderkey % 8 = orders.orderkey % 8 AND lineitem.linenumber % 2 = 0 AND orders.custkey % 8 < lineitem.linenumber % 2 AND lineitem.suppkey % 10 < orders.custkey % 7 AND lineitem.suppkey % 7 > orders.custkey % 7"),
        ("testNonEqualityJoin_10", "SELECT COUNT(*) FROM lineitem JOIN orders ON lineitem.orderkey = orders.orderkey AND lineitem.quantity > 2"),
        ("testNonEqualityJoin_11", "SELECT COUNT(*) FROM lineitem JOIN orders ON lineitem.orderkey = orders.orderkey AND orders.orderdate < lineitem.shipdate"),
        ("testNonEqualityJoin_12", "SELECT COUNT(*) FROM lineitem JOIN orders ON lineitem.orderkey = orders.orderkey AND lineitem.comment LIKE '%forges%'"),
        ("testNonEqualityJoin_13", "SELECT COUNT(*) FROM lineitem JOIN orders ON lineitem.orderkey = orders.orderkey AND lineitem.comment LIKE orders.comment"),
        ("testNonEqualityJoin_14", "SELECT COUNT(*) FROM lineitem JOIN orders ON lineitem.orderkey = orders.orderkey AND orders.comment NOT LIKE '%forges%'"),
        ("testNonEqualityJoin_15", "SELECT COUNT(*) FROM lineitem JOIN orders ON lineitem.orderkey = orders.orderkey AND orders.comment NOT LIKE lineitem.comment"),
        ("testNonEqualityJoin_16", "SELECT COUNT(*) FROM lineitem JOIN orders ON lineitem.orderkey = orders.orderkey AND NOT (orders.comment LIKE '%forges%')"),
        ("testNonEqualityRightJoin_17", "SELECT COUNT(*) FROM lineitem RIGHT OUTER JOIN orders ON lineitem.orderkey = orders.orderkey AND lineitem.quantity > 5 WHERE lineitem.orderkey IS NULL"),
        ("testNonEqualityRightJoin_18", "SELECT COUNT(*) FROM lineitem RIGHT OUTER JOIN orders ON lineitem.orderkey = orders.orderkey AND lineitem.quantity > 5.0 WHERE lineitem.orderkey IS NULL"),
        ("testNonEqualityRightJoin_19", "SELECT COUNT(*) FROM lineitem RIGHT OUTER JOIN orders ON lineitem.orderkey = orders.orderkey AND lineitem.quantity > lineitem.suppkey WHERE lineitem.orderkey IS NULL"),
        ("testNonEqualityRightJoin_20", "SELECT COUNT(*) FROM lineitem RIGHT OUTER JOIN orders ON lineitem.orderkey = orders.orderkey AND lineitem.quantity*1000 > orders.totalprice WHERE lineitem.orderkey IS NULL"),
        ("testNonEqualityRightJoin_21", "SELECT COUNT(*) FROM lineitem RIGHT OUTER JOIN orders ON lineitem.orderkey = orders.orderkey AND orders.totalprice > 1000 WHERE lineitem.orderkey IS NULL"),
        ("testChainedUnionsWithOrder_48", "SELECT orderkey FROM orders UNION (SELECT custkey FROM orders UNION SELECT linenumber FROM lineitem) UNION ALL SELECT orderkey FROM lineitem ORDER BY orderkey"),
        ("testSubqueryUnion_49", "SELECT * FROM (SELECT orderkey FROM orders UNION SELECT custkey FROM orders UNION SELECT orderkey FROM orders) ORDER BY orderkey LIMIT 1000"),
        ("testCorrelatedScalarSubqueriesWithScalarAggregationAndEqualityPredicatesInWhere_64", "SELECT count(*) FROM (SELECT * FROM orders ORDER BY orderkey LIMIT 10) o1 JOIN (SELECT * FROM orders ORDER BY orderkey LIMIT 5) o2 ON NOT 1 = (SELECT count(*) WHERE o1.orderkey = o2.orderkey)"),
        ("testCorrelatedScalarSubqueriesWithScalarAggregation_65", "SELECT count(*) FROM (SELECT * FROM orders ORDER BY orderkey LIMIT 10) o1 JOIN (SELECT * FROM orders ORDER BY orderkey LIMIT 5) o2 ON NOT 1 = (SELECT avg(i.orderkey) FROM orders i WHERE o1.orderkey < o2.orderkey AND i.orderkey % 10000 = 0)")),
      sparkCast = Map("d01" -> "bigint")),
    "r239b_ref_onearg_tail" -> batchCols(
      Seq("d01", "d02", "d03"),
      Seq("CAST(c1 AS BIGINT) AS d01", "CAST(c2 AS BIGINT) AS d02", "c3 AS d03"),
      Seq(
        ("testOrderByWithNulls_25", "SELECT orderkey, custkey, orderstatus FROM orders ORDER BY nullif(orderkey, 3) ASC NULLS FIRST, custkey ASC"),
        ("testOrderByWithNulls_26", "SELECT orderkey, custkey, orderstatus FROM orders ORDER BY nullif(orderkey, 3) DESC NULLS FIRST, custkey ASC"),
        ("testOrderByWithNulls_27", "SELECT orderkey, custkey, orderstatus FROM orders ORDER BY nullif(orderkey, 3) DESC NULLS LAST, custkey ASC"),
        ("testTopNByMultipleFields_36", "SELECT orderkey, custkey, orderstatus FROM orders ORDER BY orderkey ASC, custkey ASC LIMIT 10"),
        ("testTopNByMultipleFields_37", "SELECT orderkey, custkey, orderstatus FROM orders ORDER BY orderkey ASC, custkey DESC LIMIT 10"),
        ("testTopNByMultipleFields_38", "SELECT orderkey, custkey, orderstatus FROM orders ORDER BY orderkey DESC, custkey ASC LIMIT 10"),
        ("testTopNByMultipleFields_39", "SELECT orderkey, custkey, orderstatus FROM orders ORDER BY orderkey DESC, custkey DESC LIMIT 10"),
        ("testTopNByMultipleFields_40", "SELECT orderkey, custkey, orderstatus FROM orders ORDER BY custkey ASC, orderkey ASC LIMIT 10"),
        ("testTopNByMultipleFields_41", "SELECT orderkey, custkey, orderstatus FROM orders ORDER BY custkey ASC, orderkey DESC LIMIT 10"),
        ("testTopNByMultipleFields_42", "SELECT orderkey, custkey, orderstatus FROM orders ORDER BY custkey DESC, orderkey ASC LIMIT 10"),
        ("testTopNByMultipleFields_43", "SELECT orderkey, custkey, orderstatus FROM orders ORDER BY custkey DESC, orderkey DESC LIMIT 10"),
        ("testTopNByMultipleFields_44", "SELECT orderkey, custkey, orderstatus FROM orders ORDER BY nullif(orderkey, 3) ASC NULLS FIRST, custkey ASC LIMIT 10"),
        ("testTopNByMultipleFields_45", "SELECT orderkey, custkey, orderstatus FROM orders ORDER BY nullif(orderkey, 3) DESC NULLS FIRST, custkey ASC LIMIT 10"),
        ("testTopNByMultipleFields_46", "SELECT orderkey, custkey, orderstatus FROM orders ORDER BY nullif(orderkey, 3) ASC NULLS LAST LIMIT 10"),
        ("testTopNByMultipleFields_47", "SELECT orderkey, custkey, orderstatus FROM orders ORDER BY nullif(orderkey, 3) DESC NULLS LAST, custkey ASC LIMIT 10")),
      sparkCast = Map("d01" -> "bigint", "d02" -> "bigint", "d03" -> "string")),
    "r239c_ref_onearg_tail" -> batchCols(
      Seq("d01"),
      Seq("CAST(c1 AS DOUBLE) AS d01"),
      Seq(
        ("testStdDev_3", "SELECT STDDEV_SAMP(totalprice) FROM (SELECT totalprice FROM orders ORDER BY totalprice LIMIT 1) T"),
        ("testStdDevPop_4", "SELECT STDDEV_POP(custkey) FROM (SELECT custkey FROM orders ORDER BY custkey LIMIT 1) T"),
        ("testStdDevPop_5", "SELECT STDDEV_POP(totalprice) FROM (SELECT totalprice FROM orders ORDER BY totalprice LIMIT 1) T"),
        // Presto lowercases quoted identifiers ("ORDERS" is the orders
        // table); oracleize cannot map a quoted spelling, so the oracle
        // spells the lowercased form
        ("testQuotedIdentifiers_32", "SELECT \"TOTALPRICE\" \"my price\" FROM \"ORDERS\"",
          "SELECT totalprice AS \"my price\" FROM orders")),
      sparkCast = Map("d01" -> "double")),
    "r239d_ref_onearg_tail" -> batchCols(
      Seq("d01"),
      Seq("c1 AS d01"),
      Seq(
        ("testOrderBy_22", "SELECT orderstatus FROM orders ORDER BY orderstatus"),
        ("testOrderBy2_23", "SELECT orderstatus FROM orders ORDER BY orderkey DESC"),
        ("testOrderByAlias_28", "SELECT orderstatus x FROM orders ORDER BY x ASC"),
        ("testOrderByAliasWithSameNameAsUnselectedColumn_29", "SELECT orderstatus orderdate FROM orders ORDER BY orderdate ASC")),
      sparkCast = Map("d01" -> "string")),
    "r239e_ref_onearg_tail" -> batchCols(
      Seq("d01", "d02"),
      Seq("CAST(c1 AS BIGINT) AS d01", "CAST(c2 AS BIGINT) AS d02"),
      Seq(
        ("testSubqueryBodyOrderLimit_33", "(SELECT orderkey AS a, custkey AS b FROM orders) ORDER BY a LIMIT 1"),
        ("testSubqueryBodyProjectedOrderby_34", "(SELECT orderkey, custkey FROM orders) ORDER BY orderkey * -1"),
        ("testScalarSubquery_53", "SELECT o1.orderkey, COUNT(*) FROM (SELECT * FROM orders ORDER BY orderkey LIMIT 5) o1 LEFT JOIN (SELECT * FROM orders ORDER BY orderkey LIMIT 10) o2 ON o1.orderkey BETWEEN (SELECT avg(orderkey) FROM orders) - 10 AND (SELECT avg(orderkey) FROM orders) + 10 GROUP BY o1.orderkey",
          "WITH bnd AS (SELECT avg(orderkey) AS a FROM orders) SELECT o1.orderkey, COUNT(*) FROM (SELECT * FROM orders ORDER BY orderkey LIMIT 5) o1 CROSS JOIN bnd LEFT JOIN (SELECT * FROM orders ORDER BY orderkey LIMIT 10) o2 ON o1.orderkey BETWEEN bnd.a - 10 AND bnd.a + 10 GROUP BY o1.orderkey")),
      sparkCast = Map("d01" -> "bigint", "d02" -> "bigint")),
    "r239f_ref_onearg_tail" -> batchCols(
      Seq("d01", "d02", "d03", "d04", "d05", "d06", "d07", "d08", "d09"),
      Seq("CAST(c1 AS BIGINT) AS d01", "CAST(c2 AS BIGINT) AS d02", "c3 AS d03", "CAST(c4 AS DOUBLE) AS d04", "CAST(c5 AS VARCHAR) AS d05", "c6 AS d06", "c7 AS d07", "CAST(c8 AS BIGINT) AS d08", "c9 AS d09"),
      Seq(
        ("testOrderByOrdinalWithWildcard_31", "SELECT * FROM orders ORDER BY 1"),
        ("testOrderLimitCompaction_50", "SELECT * FROM (SELECT * FROM orders ORDER BY orderkey) LIMIT 10")),
      sparkCast = Map("d01" -> "bigint", "d02" -> "bigint", "d03" -> "string", "d04" -> "double", "d05" -> "string", "d06" -> "string", "d07" -> "string", "d08" -> "bigint", "d09" -> "string")),
    "r239g_ref_onearg_tail" -> batchCols(
      Seq("d01", "d02"),
      Seq("CAST(c1 AS BIGINT) AS d01", "c2 AS d02"),
      Seq(
        ("testOrderByLimit_1", "SELECT custkey, orderstatus FROM orders ORDER BY orderkey DESC LIMIT 10"),
        ("testOrderByMultipleFields_24", "SELECT custkey, orderstatus FROM orders ORDER BY custkey DESC, orderstatus")),
      sparkCast = Map("d01" -> "bigint", "d02" -> "string")),
    "r239h_ref_onearg_tail" -> batchCols(
      Seq("d01", "d02"),
      Seq("CAST(c1 AS DOUBLE) AS d01", "CAST(c2 AS BIGINT) AS d02"),
      Seq(
        ("testCorrelatedScalarSubqueries_59", "SELECT max(l.quantity), 2 * l.orderkey FROM lineitem l GROUP BY l.orderkey, (SELECT l.orderkey)"),
        ("testCorrelatedScalarSubqueriesWithScalarAggregationAndEqualityPredicatesInWhere_63", "SELECT max(o.totalprice), o.orderkey FROM orders o GROUP BY o.orderkey, (SELECT count(*) WHERE o.orderkey = 0)")),
      sparkCast = Map("d01" -> "double", "d02" -> "bigint")),
    "r239i_ref_onearg_tail" -> batchCols(
      Seq("d01", "d02", "d03"),
      Seq("CAST(c1 AS BIGINT) AS d01", "CAST(c2 AS BIGINT) AS d02", "CAST(c3 AS INTEGER) AS d03"),
      Seq(
        ("testExistsSubqueryWithGroupBy_56", "SELECT linenumber, min(orderkey), EXISTS(SELECT orderkey FROM orders WHERE orderkey < 7)FROM lineitem GROUP BY linenumber, EXISTS(SELECT orderkey FROM orders WHERE orderkey < 7)HAVING EXISTS(SELECT orderkey FROM orders WHERE orderkey < 7)"),
        ("testExistsSubqueryWithGroupBy_57", "SELECT linenumber, min(orderkey), EXISTS(SELECT orderkey FROM orders WHERE orderkey < 7)FROM lineitem GROUP BY linenumber, EXISTS(SELECT orderkey FROM orders WHERE orderkey < 17)")),
      sparkCast = Map("d01" -> "bigint", "d02" -> "bigint", "d03" -> "int")),
    "r239j_ref_onearg_tail" -> batchCols(
      Seq("d01", "d02", "d03", "d04", "d05", "d06", "d07", "d08", "d09", "d10", "d11", "d12", "d13", "d14", "d15", "d16", "d17", "d18", "d19", "d20", "d21", "d22", "d23", "d24", "d25"),
      Seq("CAST(c1 AS BIGINT) AS d01", "CAST(c2 AS BIGINT) AS d02", "c3 AS d03", "CAST(c4 AS DOUBLE) AS d04", "CAST(c5 AS VARCHAR) AS d05", "c6 AS d06", "c7 AS d07", "CAST(c8 AS BIGINT) AS d08", "c9 AS d09", "CAST(c10 AS BIGINT) AS d10", "CAST(c11 AS BIGINT) AS d11", "CAST(c12 AS BIGINT) AS d12", "CAST(c13 AS BIGINT) AS d13", "CAST(c14 AS DOUBLE) AS d14", "CAST(c15 AS DOUBLE) AS d15", "CAST(c16 AS DOUBLE) AS d16", "CAST(c17 AS DOUBLE) AS d17", "c18 AS d18", "c19 AS d19", "CAST(c20 AS VARCHAR) AS d20", "CAST(c21 AS VARCHAR) AS d21", "CAST(c22 AS VARCHAR) AS d22", "c23 AS d23", "c24 AS d24", "c25 AS d25"),
      Seq(
        ("testCorrelatedExistsSubqueriesWithPrunedCorrelationSymbols_66", "SELECT * FROM orders o JOIN (SELECT * FROM lineitem ORDER BY orderkey LIMIT 2) l ON NOT EXISTS(SELECT o.orderkey = l.orderkey)")),
      sparkCast = Map("d01" -> "bigint", "d02" -> "bigint", "d03" -> "string", "d04" -> "double", "d05" -> "string", "d06" -> "string", "d07" -> "string", "d08" -> "bigint", "d09" -> "string", "d10" -> "bigint", "d11" -> "bigint", "d12" -> "bigint", "d13" -> "bigint", "d14" -> "double", "d15" -> "double", "d16" -> "double", "d17" -> "double", "d18" -> "string", "d19" -> "string", "d20" -> "string", "d21" -> "string", "d22" -> "string", "d23" -> "string", "d24" -> "string", "d25" -> "string")),
    "r239k_ref_onearg_tail" -> batchCols(
      Seq("d01", "d02", "d03", "d04", "d05", "d06", "d07", "d08", "d09", "d10", "d11", "d12", "d13", "d14", "d15", "d16", "d17", "d18", "d19", "d20", "d21", "d22", "d23", "d24", "d25", "d26", "d27"),
      Seq("CAST(c1 AS BIGINT) AS d01", "CAST(c2 AS BIGINT) AS d02", "c3 AS d03", "CAST(c4 AS DOUBLE) AS d04", "CAST(c5 AS VARCHAR) AS d05", "c6 AS d06", "c7 AS d07", "CAST(c8 AS BIGINT) AS d08", "c9 AS d09", "CAST(c10 AS BIGINT) AS d10", "CAST(c11 AS BIGINT) AS d11", "c12 AS d12", "CAST(c13 AS DOUBLE) AS d13", "CAST(c14 AS VARCHAR) AS d14", "c15 AS d15", "c16 AS d16", "CAST(c17 AS BIGINT) AS d17", "c18 AS d18", "CAST(c19 AS BIGINT) AS d19", "CAST(c20 AS BIGINT) AS d20", "c21 AS d21", "CAST(c22 AS DOUBLE) AS d22", "CAST(c23 AS VARCHAR) AS d23", "c24 AS d24", "c25 AS d25", "CAST(c26 AS BIGINT) AS d26", "c27 AS d27"),
      Seq(
        ("testImplicitCrossJoin_51", "SELECT * FROM (SELECT * FROM orders ORDER BY orderkey LIMIT 5) a, (SELECT * FROM orders ORDER BY orderkey LIMIT 5) b, (SELECT * FROM orders ORDER BY orderkey LIMIT 5) c")),
      sparkCast = Map("d01" -> "bigint", "d02" -> "bigint", "d03" -> "string", "d04" -> "double", "d05" -> "string", "d06" -> "string", "d07" -> "string", "d08" -> "bigint", "d09" -> "string", "d10" -> "bigint", "d11" -> "bigint", "d12" -> "string", "d13" -> "double", "d14" -> "string", "d15" -> "string", "d16" -> "string", "d17" -> "bigint", "d18" -> "string", "d19" -> "bigint", "d20" -> "bigint", "d21" -> "string", "d22" -> "double", "d23" -> "string", "d24" -> "string", "d25" -> "string", "d26" -> "bigint", "d27" -> "string")),
    "r239l_ref_onearg_tail" -> batchCols(
      Seq("d01", "d02", "d03", "d04", "d05", "d06", "d07", "d08", "d09", "d10", "d11", "d12", "d13", "d14", "d15", "d16", "d17", "d18", "d19"),
      Seq("CAST(c1 AS BIGINT) AS d01", "CAST(c2 AS BIGINT) AS d02", "c3 AS d03", "CAST(c4 AS DOUBLE) AS d04", "CAST(c5 AS VARCHAR) AS d05", "c6 AS d06", "c7 AS d07", "CAST(c8 AS BIGINT) AS d08", "c9 AS d09", "CAST(c10 AS BIGINT) AS d10", "CAST(c11 AS BIGINT) AS d11", "c12 AS d12", "CAST(c13 AS DOUBLE) AS d13", "CAST(c14 AS VARCHAR) AS d14", "c15 AS d15", "c16 AS d16", "CAST(c17 AS BIGINT) AS d17", "c18 AS d18", "CAST(c19 AS INTEGER) AS d19"),
      Seq(
        ("testSemiJoin_52", "SELECT *, o2.custkey   IN (     SELECT orderkey     FROM lineitem     WHERE orderkey % 5 = 0) FROM (SELECT * FROM orders WHERE custkey % 256 = 0) o1 JOIN (SELECT * FROM orders WHERE custkey % 256 = 0) o2   ON (o1.orderkey IN (SELECT orderkey FROM lineitem WHERE orderkey % 4 = 0)) = (o2.orderkey IN (SELECT orderkey FROM lineitem WHERE orderkey % 4 = 0)) WHERE o1.orderkey   IN (     SELECT orderkey     FROM lineitem     WHERE orderkey % 4 = 0) ORDER BY o1.orderkey   IN (     SELECT orderkey     FROM lineitem     WHERE orderkey % 7 = 0)")),
      sparkCast = Map("d01" -> "bigint", "d02" -> "bigint", "d03" -> "string", "d04" -> "double", "d05" -> "string", "d06" -> "string", "d07" -> "string", "d08" -> "bigint", "d09" -> "string", "d10" -> "bigint", "d11" -> "bigint", "d12" -> "string", "d13" -> "double", "d14" -> "string", "d15" -> "string", "d16" -> "string", "d17" -> "bigint", "d18" -> "string", "d19" -> "int")),
    "r239m_ref_onearg_tail" -> batchCols(
      Seq("d01", "d02"),
      Seq("CAST(c1 AS BIGINT) AS d01", "CAST(c2 AS DOUBLE) AS d02"),
      Seq(
        ("testGroupByOrderByLimit_2", "SELECT custkey, SUM(totalprice) FROM orders GROUP BY custkey ORDER BY SUM(totalprice) DESC LIMIT 10")),
      sparkCast = Map("d01" -> "bigint", "d02" -> "double")),
    "r239n_ref_onearg_tail" -> batchCols(
      Seq("d01", "d02", "d03"),
      Seq("CAST(c1 AS DOUBLE) AS d01", "CAST(c2 AS BIGINT) AS d02", "CAST(c3 AS BIGINT) AS d03"),
      Seq(
        ("testCorrelatedScalarSubqueriesWithScalarAggregationAndEqualityPredicatesInWhere_62", "SELECT max(o.totalprice), o.orderkey, (SELECT count(*) WHERE o.orderkey = 0) FROM orders o GROUP BY o.orderkey")),
      sparkCast = Map("d01" -> "double", "d02" -> "bigint", "d03" -> "bigint")),
    "r239o_ref_onearg_tail" -> batchCols(
      Seq("d01"),
      Seq("CAST(c1 AS BIGINT) AS d01"),
      Seq(
        ("testExcept_7", "SELECT regionkey FROM (SELECT regionkey FROM nation WHERE nationkey < 7 EXCEPT SELECT regionkey FROM nation WHERE nationkey > 21) UNION ALL SELECT 4")),
      sparkCast = Map("d01" -> "bigint")),
    "r239p_ref_onearg_tail" -> batchCols(
      Seq("d01", "d02"),
      Seq("CAST(c1 AS BIGINT) AS d01", "CAST(c2 AS BIGINT) AS d02"),
      Seq(
        ("testScalarSubqueryWithGroupBy_54", "SELECT linenumber, min(orderkey) FROM lineitem GROUP BY linenumber HAVING min(orderkey) < (SELECT avg(orderkey) FROM orders WHERE orderkey < 7)")),
      sparkCast = Map("d01" -> "bigint", "d02" -> "bigint")),
    "r239q_ref_onearg_tail" -> batchCols(
      Seq("d01", "d02", "d03"),
      Seq("CAST(c1 AS BIGINT) AS d01", "CAST(c2 AS BIGINT) AS d02", "CAST(c3 AS BIGINT) AS d03"),
      Seq(
        ("testScalarSubqueryWithGroupBy_55", "SELECT linenumber, min(orderkey), (SELECT max(orderkey) FROM orders WHERE orderkey < 7)FROM lineitem GROUP BY linenumber, (SELECT count(orderkey) FROM orders WHERE orderkey < 7)HAVING min(orderkey) < (SELECT sum(orderkey) FROM orders WHERE orderkey < 7)")),
      sparkCast = Map("d01" -> "bigint", "d02" -> "bigint", "d03" -> "bigint")),
    "r239r_ref_onearg_tail" -> batchCols(
      Seq("d01", "d02"),
      Seq("CAST(c1 AS BIGINT) AS d01", "CAST(c2 AS BIGINT) AS d02"),
      Seq(
        ("testExcept_6", "SELECT nationkey, nationkey / 2 FROM (SELECT nationkey FROM nation WHERE nationkey < 10 EXCEPT SELECT nationkey FROM nation WHERE nationkey > 4) T WHERE nationkey % 2 = 0",
          "SELECT nationkey, nationkey // 2 FROM (SELECT nationkey FROM nation WHERE nationkey < 10 EXCEPT SELECT nationkey FROM nation WHERE nationkey > 4) T WHERE nationkey % 2 = 0")),
      sparkCast = Map("d01" -> "bigint", "d02" -> "bigint")),
    "r239s_ref_onearg_tail" -> batchCols(
      Seq("d01", "d02", "d03"),
      Seq("CAST(c1 AS BIGINT) AS d01", "CAST(c2 AS BIGINT) AS d02", "CAST(c3 AS BIGINT) AS d03"),
      Seq(
        ("testCorrelatedScalarSubqueries_58", "SELECT max(n.regionkey), 2 * n.nationkey, (SELECT n.nationkey) FROM nation n GROUP BY n.nationkey")),
      sparkCast = Map("d01" -> "bigint", "d02" -> "bigint", "d03" -> "bigint")),
    "r239t_ref_onearg_tail" -> batchCols(
      Seq("d01", "d02", "d03"),
      Seq("CAST(c1 AS BIGINT) AS d01", "c2 AS d02", "CAST(c3 AS BIGINT) AS d03"),
      Seq(
        ("testQuantifiedComparison_67", "SELECT nationkey, name, regionkey FROM nation WHERE regionkey = ANY (SELECT regionkey FROM region WHERE name IN ('ASIA', 'EUROPE'))")),
      sparkCast = Map("d01" -> "bigint", "d02" -> "string", "d03" -> "bigint")),
    "r239u_ref_onearg_tail" -> batchCols(
      Seq("d01", "d02", "d03", "d04"),
      Seq("CAST(c1 AS BIGINT) AS d01", "c2 AS d02", "CAST(c3 AS BIGINT) AS d03", "c4 AS d04"),
      Seq(
        ("testCorrelatedScalarSubqueries_61", "SELECT * FROM nation n WHERE 2 = (SELECT (SELECT 2 * n.nationkey))")),
      sparkCast = Map("d01" -> "bigint", "d02" -> "string", "d03" -> "bigint", "d04" -> "string")),
    "r239v_ref_onearg_tail" -> batchCols(
      Seq("d01", "d02", "d03", "d04", "d05", "d06", "d07", "d08"),
      Seq("CAST(c1 AS BIGINT) AS d01", "c2 AS d02", "CAST(c3 AS BIGINT) AS d03", "c4 AS d04", "CAST(c5 AS BIGINT) AS d05", "c6 AS d06", "CAST(c7 AS BIGINT) AS d07", "c8 AS d08"),
      Seq(
        ("testCorrelatedScalarSubqueries_60", "SELECT * FROM nation n1 JOIN nation n2 ON n1.nationkey = (SELECT n2.nationkey)")),
      sparkCast = Map("d01" -> "bigint", "d02" -> "string", "d03" -> "bigint", "d04" -> "string", "d05" -> "bigint", "d06" -> "string", "d07" -> "bigint", "d08" -> "string")),
    "r239w_ref_onearg_tail" -> batchCols(
      Seq("d01", "d02"),
      Seq("c1 AS d01", "CAST(c2 AS BIGINT) AS d02"),
      Seq(
        ("testSelectColumnOfNulls_35", "SELECT CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT) FROM orders ORDER BY 1")),
      sparkCast = Map("d01" -> "string", "d02" -> "bigint")),
    "r239x_ref_onearg_tail" -> batchCols(
      Seq("d01", "d02"),
      Seq("c1 AS d01", "CAST(c2 AS VARCHAR) AS d02"),
      Seq(
        ("testOrderByOrdinal_30", "SELECT orderstatus, orderdate FROM orders ORDER BY 2, 1")),
      sparkCast = Map("d01" -> "string", "d02" -> "string")),

    // DuckDB supports the ordered-aggregate grammar natively, so the oracle
    // is the same text; the array column is joined to a scalar string on
    // both sides (the driver's row-sort cannot hash array cells).
    "r66_ref_ordered_agg" -> {
      val verbatim = "SELECT orderpriority, custkey, array_agg(orderstatus ORDER BY orderstatus) FILTER (WHERE custkey > 500)" +
        "FROM orders " +
        "WHERE orderkey IN (1, 2, 3, 4, 5) " +
        "GROUP BY GROUPING SETS ((), (orderpriority), (orderpriority, custkey))"
      Q(
        (s, d) => {
          val df = engine(s, d).sql(verbatim)
            .toDF("orderpriority", "custkey", "statuses")
          df.withColumn("statuses",
            org.apache.spark.sql.functions.array_join(df.col("statuses"), ","))
        },
        Some("SELECT c1 AS orderpriority, c2 AS custkey, " +
          "array_to_string(c3, ',') AS statuses " +
          s"FROM (${oracleize(verbatim)}) t(c1, c2, c3)"))
    })
}
