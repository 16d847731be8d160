package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Remaining SURVEY §2 inventory rows: sampling (SampleNode.java:40),
  * lateral correlation (LateralJoinNode.java:37), AssignUniqueIdOperator
  * .java:1, table writes/sinks (TableWriterOperator.java:1 → DataFrameWriter
  * over parquet/orc/csv/json), value-window IGNORE NULLS variants
  * (NthValueFunction.java, FirstValueFunction.java), EXCEPT/INTERSECT ALL,
  * width_bucket, null-ordering.
  */
object Coverage {
  private def t(s: SparkSession, d: String, n: String) = Tables.t(s, d, n)

  private def sql(text: String): (SparkSession, String) => DataFrame =
    (s, d) => { Tables.registerAll(s, d); s.sql(text) }

  val queries: Map[String, Q] = Map(

    // TABLESAMPLE BERNOULLI (SampleNode.java:40-41): seeded sample —
    // deterministic per seed+partitioning but engine-specific, so the oracle
    // pins the group population (hash-compared) plus a Bernoulli(0.1)
    // concentration bound on the sampled fraction (±5 abs pct, far beyond
    // any plausible deviation at sf0.01's group sizes).
    "q85_tablesample" -> Q(
      (s, d) => {
        val sampled = t(s, d, "lineitem")
          .sample(withReplacement = false, 0.1, seed = 42)
          .groupBy("l_returnflag").agg(count(lit(1)).as("n_sampled"))
        val totals = t(s, d, "lineitem")
          .groupBy("l_returnflag").agg(count(lit(1)).as("n_total"))
        totals.join(sampled, "l_returnflag")
          .select(col("l_returnflag"), col("n_total"),
            (col("n_sampled") >= col("n_total") * 0.05 &&
              col("n_sampled") <= col("n_total") * 0.15).as("fraction_ok"))
          .orderBy("l_returnflag")
      },
      Some("""
        SELECT l_returnflag, count(*) AS n_total, true AS fraction_ok
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // LATERAL correlated derived table (LateralJoinNode.java:37).
    "q86_lateral" -> Q(
      sql("""
        SELECT o.o_orderkey, o.o_totalprice, l.n_items, l.max_qty
        FROM orders o,
        LATERAL (SELECT count(*) AS n_items, max(l_quantity) AS max_qty
                 FROM lineitem WHERE l_orderkey = o.o_orderkey) l
        WHERE o.o_orderkey <= 1000 AND l.n_items > 0
        ORDER BY o.o_orderkey"""),
      Some("""
        SELECT o.o_orderkey, o.o_totalprice, l.n_items, l.max_qty
        FROM orders o,
        LATERAL (SELECT count(*) AS n_items, max(l_quantity) AS max_qty
                 FROM lineitem WHERE l_orderkey = o.o_orderkey) l
        WHERE o.o_orderkey <= 1000 AND l.n_items > 0
        ORDER BY o.o_orderkey""")),

    // AssignUniqueIdOperator.java:1 → monotonically_increasing_id; ids are
    // engine-internal, so the checked surface is uniqueness + count.
    "q87_unique_id" -> Q(
      (s, d) => t(s, d, "orders")
        .withColumn("uid", monotonically_increasing_id())
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(col("uid")).as("n_ids"),
          (count(lit(1)) === countDistinct(col("uid"))).as("ids_unique")),
      Some("""
        SELECT count(*) AS n_rows, count(*) AS n_ids, true AS ids_unique
        FROM orders""")),

    // Sink coverage (TableWriterOperator.java:1, HivePageSink.java:59):
    // write a projection to parquet/orc/csv/json, read each back, aggregate.
    "q88_write_roundtrip" -> Q(
      (s, d) => {
        val base = t(s, d, "lineitem").filter(col("l_orderkey") <= 1000)
          .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
        val schema = base.schema
        val tmp = java.nio.file.Files.createTempDirectory("graft-sinks").toString
        val perFmt = Seq("parquet", "orc", "csv", "json").map { fmt =>
          val path = s"$tmp/$fmt"
          base.write.mode("overwrite").format(fmt).save(path)
          val back = s.read.format(fmt).schema(schema).load(path)
          back.agg(
            lit(fmt).as("fmt"),
            count(lit(1)).as("n"),
            sum(col("l_quantity").cast("decimal(18,2)")).cast("decimal(38,2)").as("sum_qty"))
        }
        perFmt.reduce(_ union _).orderBy("fmt")
      },
      Some("""
        WITH base AS (
          SELECT CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS sq,
                 count(*) AS n
          FROM lineitem WHERE l_orderkey <= 1000)
        SELECT fmt, n, sq AS sum_qty
        FROM base, (VALUES ('csv'), ('json'), ('orc'), ('parquet')) f(fmt)
        ORDER BY fmt""")),

    // Value window functions with IGNORE NULLS (FirstValueFunction.java:25,
    // NthValueFunction.java, LagFunction.java:29 ignoreNulls variants).
    "q89_win_ignore_nulls" -> Q(
      (s, d) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        t(s, d, "events")
          .withColumn("v", when(col("event_type") =!= "click", col("event_type")))
          .select(
            col("user_id"), col("event_id"),
            first(col("v"), ignoreNulls = true).over(w).as("first_nonclick"),
            last(col("v"), ignoreNulls = true).over(wFull).as("last_nonclick"),
            nth_value(col("v"), 2, ignoreNulls = true).over(wFull).as("second_nonclick"),
            lag(col("v"), 1, null, ignoreNulls = true).over(w).as("prev_nonclick"))
          .orderBy("user_id", "event_id")
      },
      Some("""
        WITH e AS (
          SELECT user_id, event_id, ts,
            CASE WHEN event_type <> 'click' THEN event_type END AS v
          FROM events)
        SELECT user_id, event_id,
          first_value(v IGNORE NULLS) OVER w AS first_nonclick,
          last_value(v IGNORE NULLS) OVER wf AS last_nonclick,
          nth_value(v, 2 IGNORE NULLS) OVER wf AS second_nonclick,
          lag(v IGNORE NULLS) OVER w AS prev_nonclick
        FROM e
        WINDOW
          w AS (PARTITION BY user_id ORDER BY ts, event_id),
          wf AS (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        ORDER BY user_id, event_id""")),

    // EXCEPT ALL / INTERSECT ALL (bag semantics).
    "q90_setops_all" -> Q(
      sql("""
        SELECT 'except_all' AS op, count(*) AS n FROM (
          SELECT l_orderkey FROM lineitem WHERE l_quantity > 10
          EXCEPT ALL
          SELECT l_orderkey FROM lineitem WHERE l_quantity > 40)
        UNION ALL
        SELECT 'intersect_all', count(*) FROM (
          SELECT l_orderkey FROM lineitem WHERE l_quantity > 10
          INTERSECT ALL
          SELECT l_orderkey FROM lineitem WHERE l_quantity > 40)
        ORDER BY op"""),
      Some("""
        SELECT 'except_all' AS op, count(*) AS n FROM (
          SELECT l_orderkey FROM lineitem WHERE l_quantity > 10
          EXCEPT ALL
          SELECT l_orderkey FROM lineitem WHERE l_quantity > 40)
        UNION ALL
        SELECT 'intersect_all', count(*) FROM (
          SELECT l_orderkey FROM lineitem WHERE l_quantity > 10
          INTERSECT ALL
          SELECT l_orderkey FROM lineitem WHERE l_quantity > 40)
        ORDER BY op""")),

    // width_bucket (MathFunctions.java) + interval arithmetic; DuckDB 1.0
    // lacks width_bucket → manual formula mirror.
    "q91_width_bucket" -> Q(
      (s, d) => t(s, d, "orders")
        .select(col("o_orderkey"),
          expr("width_bucket(o_totalprice, 0.0, 500000.0, 10)").as("bucket"),
          (col("o_orderdate") + expr("INTERVAL 90 DAYS")).as("due_date"),
          (col("o_orderdate") - expr("INTERVAL 1 HOUR")).as("hour_before"))
        .orderBy("o_orderkey"),
      Some("""
        SELECT o_orderkey,
          CAST(CASE WHEN o_totalprice < 0 THEN 0
                    WHEN o_totalprice >= 500000.0 THEN 11
                    ELSE 1 + floor(o_totalprice / 50000.0) END AS BIGINT) AS bucket,
          o_orderdate + INTERVAL 90 DAY AS due_date,
          o_orderdate - INTERVAL 1 HOUR AS hour_before
        FROM orders ORDER BY o_orderkey""")),

    // Edge semantics (AbstractTestQueries-style corner cases): empty-input
    // aggregates, WHERE FALSE, HAVING without GROUP BY, LIMIT 0 feeding a
    // count, CASE without ELSE, COUNT(col) null-skipping, ordinal ORDER BY.
    "q93_edge_semantics" -> Q(
      sql("""
        SELECT 'empty_agg' AS label,
          (SELECT count(*) FROM orders WHERE 1 = 0) AS a,
          (SELECT CAST(sum(o_totalprice) IS NULL AS INT) FROM orders WHERE 1 = 0) AS b
        UNION ALL
        SELECT 'having_no_groupby',
          (SELECT count(*) FROM (SELECT sum(o_totalprice) AS s FROM orders HAVING sum(o_totalprice) > 0)),
          (SELECT count(*) FROM (SELECT sum(o_totalprice) AS s FROM orders HAVING sum(o_totalprice) < 0))
        UNION ALL
        SELECT 'limit_zero',
          (SELECT count(*) FROM (SELECT * FROM orders LIMIT 0)),
          0
        UNION ALL
        SELECT 'count_null_skip',
          (SELECT count(nullif(o_orderstatus, 'O')) FROM orders),
          (SELECT count(*) FROM orders WHERE o_orderstatus <> 'O')
        UNION ALL
        SELECT 'case_no_else',
          (SELECT count(*) FROM orders
           WHERE (CASE WHEN o_totalprice < 0 THEN 1 END) IS NULL),
          (SELECT count(*) FROM orders)
        ORDER BY 1"""),
      Some("""
        SELECT 'empty_agg' AS label,
          (SELECT count(*) FROM orders WHERE 1 = 0) AS a,
          (SELECT CAST(sum(o_totalprice) IS NULL AS INT) FROM orders WHERE 1 = 0) AS b
        UNION ALL
        SELECT 'having_no_groupby',
          (SELECT count(*) FROM (SELECT sum(o_totalprice) AS s FROM orders HAVING sum(o_totalprice) > 0)),
          (SELECT count(*) FROM (SELECT sum(o_totalprice) AS s FROM orders HAVING sum(o_totalprice) < 0))
        UNION ALL
        SELECT 'limit_zero',
          (SELECT count(*) FROM (SELECT * FROM orders LIMIT 0)),
          0
        UNION ALL
        SELECT 'count_null_skip',
          (SELECT count(nullif(o_orderstatus, 'O')) FROM orders),
          (SELECT count(*) FROM orders WHERE o_orderstatus <> 'O')
        UNION ALL
        SELECT 'case_no_else',
          (SELECT count(*) FROM orders
           WHERE (CASE WHEN o_totalprice < 0 THEN 1 END) IS NULL),
          (SELECT count(*) FROM orders)
        ORDER BY 1""")),

    // Year-month interval arithmetic + months_between.
    "q94_interval_ym" -> Q(
      sql("""
        SELECT o_orderkey,
          CAST(o_orderdate + INTERVAL '1' YEAR AS DATE) AS plus_y,
          CAST(o_orderdate + INTERVAL '18' MONTH AS DATE) AS plus_18m,
          CAST(o_orderdate - INTERVAL '1' MONTH AS DATE) AS minus_m
        FROM orders WHERE o_orderkey <= 1000 ORDER BY o_orderkey"""),
      Some("""
        SELECT o_orderkey,
          CAST(o_orderdate + INTERVAL 1 YEAR AS DATE) AS plus_y,
          CAST(o_orderdate + INTERVAL 18 MONTH AS DATE) AS plus_18m,
          CAST(o_orderdate - INTERVAL 1 MONTH AS DATE) AS minus_m
        FROM orders WHERE o_orderkey <= 1000 ORDER BY o_orderkey""")),

    // LIKE with wildcards and ESCAPE; IS [NOT] DISTINCT FROM (null-safe
    // comparison, Presto OperatorType IS_DISTINCT_FROM).
    "q95_like_distinct" -> Q(
      sql("""
        SELECT doc_id,
          lang LIKE '_s' AS like_us,
          source LIKE 'src1%' AS like_pfx,
          'a_b' LIKE 'a!_b' ESCAPE '!' AS like_esc,
          nullif(lang, 'en') IS DISTINCT FROM nullif(lang, 'fr') AS dist,
          nullif(lang, 'en') IS NOT DISTINCT FROM nullif(lang, 'en') AS same
        FROM documents ORDER BY doc_id"""),
      Some("""
        SELECT doc_id,
          lang LIKE '_s' AS like_us,
          source LIKE 'src1%' AS like_pfx,
          'a_b' LIKE 'a!_b' ESCAPE '!' AS like_esc,
          nullif(lang, 'en') IS DISTINCT FROM nullif(lang, 'fr') AS dist,
          nullif(lang, 'en') IS NOT DISTINCT FROM nullif(lang, 'en') AS same
        FROM documents ORDER BY doc_id""")),

    // Decimal cast/arithmetic semantics: scale changes, exact compare.
    "q96_decimal_casts" -> Q(
      sql("""
        SELECT l_orderkey, l_linenumber,
          CAST(l_extendedprice AS DECIMAL(18,2)) AS p2,
          CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS DECIMAL(18,4)) AS p4,
          CAST(CAST(l_quantity AS DECIMAL(10,2)) + CAST(l_tax AS DECIMAL(10,2)) AS DECIMAL(18,2)) AS qsum,
          CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS BIGINT) AS trunc_int
        FROM lineitem WHERE l_orderkey <= 500
        ORDER BY l_orderkey, l_linenumber"""),
      Some("""
        SELECT l_orderkey, l_linenumber,
          CAST(l_extendedprice AS DECIMAL(18,2)) AS p2,
          CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS DECIMAL(18,4)) AS p4,
          CAST(CAST(l_quantity AS DECIMAL(10,2)) + CAST(l_tax AS DECIMAL(10,2)) AS DECIMAL(18,2)) AS qsum,
          -- DuckDB decimal→int ROUNDS; Spark truncates → trunc() first
          CAST(trunc(CAST(l_extendedprice AS DECIMAL(18,2))) AS BIGINT) AS trunc_int
        FROM lineitem WHERE l_orderkey <= 500
        ORDER BY l_orderkey, l_linenumber""")),

    // Row/struct construction, field access, comparison (SURVEY §2.9 row:
    // RowEqualOperator.java, PARSER/tree/Row.java → struct()).
    "q97_row_struct" -> Q(
      sql("""
        SELECT o_orderkey,
          struct(o_orderstatus, o_totalprice).o_orderstatus AS f1,
          round(named_struct('p', o_totalprice, 's', o_orderstatus).p, 4) AS f2,
          named_struct('a', o_orderstatus) = named_struct('a', 'O') AS eq_o,
          array_contains(array(named_struct('k', 1), named_struct('k', 2)),
            named_struct('k', 2)) AS has_row
        FROM orders WHERE o_orderkey <= 1000 ORDER BY o_orderkey"""),
      Some("""
        SELECT o_orderkey,
          ({'o_orderstatus': o_orderstatus, 'o_totalprice': o_totalprice}).o_orderstatus AS f1,
          round(({'p': o_totalprice, 's': o_orderstatus}).p, 4) AS f2,
          ({'a': o_orderstatus}) = ({'a': 'O'}) AS eq_o,
          list_contains([{'k': 1}, {'k': 2}], {'k': 2}) AS has_row
        FROM orders WHERE o_orderkey <= 1000 ORDER BY o_orderkey""")),

    // Null ordering: NULLS FIRST/LAST, asc/desc combinations.
    "q92_null_ordering" -> Q(
      (s, d) => t(s, d, "orders")
        .withColumn("maybe", when(col("o_orderstatus") === "P", col("o_totalprice")))
        .filter(col("o_orderkey") <= 500)
        .select(col("o_orderkey"), round(col("maybe"), 4).as("maybe"))
        .orderBy(col("maybe").desc_nulls_last, col("o_orderkey")),
      Some("""
        SELECT o_orderkey,
          round(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END, 4) AS maybe
        FROM orders WHERE o_orderkey <= 500
        ORDER BY maybe DESC NULLS LAST, o_orderkey""")),

    // Named WINDOW clause with two distinct windows in one SELECT (the
    // grammar's windowDefinition; WindowOperator planned twice with
    // different partitionings — two exchanges, no cross-contamination).
    "q99_named_windows" -> {
      val text = """
        SELECT o_orderkey, o_custkey,
          CAST(rank() OVER w1 AS INT) AS rnk,
          CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER w2
            AS DECIMAL(38,2)) AS run_sum
        FROM orders WHERE o_orderkey <= 2000
        WINDOW
          w1 AS (PARTITION BY o_orderstatus
                 ORDER BY o_totalprice DESC, o_orderkey),
          w2 AS (PARTITION BY o_custkey ORDER BY o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        ORDER BY o_orderkey"""
      Q(sql(text), Some(text))
    }
  )
}
