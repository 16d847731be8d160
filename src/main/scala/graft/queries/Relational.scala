package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.{Engine, Q, Tables}

/** Sorts/limits, set operations, grouping sets, distinct, sampling, unnest.
  *
  * Reference: presto-main OrderByOperator.java:1, TopNOperator.java:1,
  * LimitOperator.java:1, DistinctLimitOperator.java:1, GroupIdOperator
  * .java:32 (GROUPING SETS/CUBE/ROLLUP), UnnestOperator.java:33,
  * plan nodes UnionNode/IntersectNode/ExceptNode (rewritten by
  * ImplementIntersectAndExceptAsUnion.java:103 — Spark uses semi/anti join
  * rewrites for the same semantics), SampleNode.java:40 (TABLESAMPLE).
  */
object Relational {
  private def t(s: SparkSession, d: String, n: String) = Tables.t(s, d, n)

  val queries: Map[String, Q] = Map(

    // Global sort + limit → TakeOrderedAndProject (TopNOperator.java:1):
    // no full sort materialization, each partition keeps k rows then merges.
    "q40_topn" -> Q(
      (s, d) => t(s, d, "orders")
        .select(col("o_orderkey"), col("o_custkey"), round(col("o_totalprice"), 4).as("price"))
        .orderBy(col("price").desc, col("o_orderkey"))
        .limit(100),
      Some("""
        SELECT o_orderkey, o_custkey, round(o_totalprice, 4) AS price
        FROM orders ORDER BY price DESC, o_orderkey LIMIT 100""")),

    // Multi-column full sort (OrderByOperator.java:1; distributed ORDER BY =
    // range partitioning + per-partition sort, MergeOperator.java:45).
    "q41_sort_multi" -> Q(
      (s, d) => t(s, d, "lineitem")
        .select(col("l_returnflag"), col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
        .orderBy(col("l_returnflag").desc, col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
        .limit(500),
      Some("""
        SELECT l_returnflag, l_shipdate, l_orderkey, l_linenumber
        FROM lineitem
        ORDER BY l_returnflag DESC, l_shipdate, l_orderkey, l_linenumber LIMIT 500""")),

    // DISTINCT + limit short-circuit (DistinctLimitOperator.java:1).
    "q42_distinct" -> Q(
      (s, d) => t(s, d, "lineitem")
        .select("l_returnflag", "l_linestatus").distinct()
        .orderBy("l_returnflag", "l_linestatus"),
      Some("""
        SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        ORDER BY l_returnflag, l_linestatus""")),

    // UNION ALL → grouped count (UnionNode concat).
    "q43_union_all" -> Q(
      (s, d) => {
        val a = t(s, d, "orders").filter(col("o_orderstatus") === "F")
          .select(col("o_custkey").as("custkey"))
        val b = t(s, d, "orders").filter(col("o_totalprice") > 200000)
          .select(col("o_custkey").as("custkey"))
        a.union(b).groupBy("custkey").agg(count(lit(1)).as("n"))
          .orderBy("custkey").limit(200)
      },
      Some("""
        SELECT custkey, count(*) AS n FROM (
          SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
          UNION ALL
          SELECT o_custkey FROM orders WHERE o_totalprice > 200000)
        GROUP BY custkey ORDER BY custkey LIMIT 200""")),

    // INTERSECT (distinct semantics) — Spark rewrites to left-semi + distinct.
    "q44_intersect" -> Q(
      (s, d) => t(s, d, "orders").filter(col("o_orderstatus") === "F")
        .select(col("o_custkey"))
        .intersect(t(s, d, "orders").filter(col("o_orderstatus") === "O")
          .select(col("o_custkey")))
        .orderBy("o_custkey"),
      Some("""
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        INTERSECT
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        ORDER BY o_custkey""")),

    // EXCEPT (distinct semantics) — Spark rewrites to left-anti + distinct.
    "q45_except" -> Q(
      (s, d) => t(s, d, "customer").select(col("c_custkey").as("k"))
        .except(t(s, d, "orders").filter(col("o_totalprice") > 300000)
          .select(col("o_custkey").as("k")))
        .orderBy("k"),
      Some("""
        SELECT c_custkey AS k FROM customer
        EXCEPT
        SELECT o_custkey FROM orders WHERE o_totalprice > 300000
        ORDER BY k""")),

    // ROLLUP (GroupIdOperator.java:32; Spark Expand). grouping() flags cast
    // to INT on both sides (Spark returns tinyint, DuckDB bigint).
    "q46_rollup" -> Q(
      (s, d) => t(s, d, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("decimal(38,2)").as("sum_qty"),
          grouping(col("l_returnflag")).cast("int").as("g_rf"),
          grouping(col("l_linestatus")).cast("int").as("g_ls"))
        .orderBy(col("g_rf"), col("g_ls"), col("l_returnflag"), col("l_linestatus")),
      Some("""
        SELECT l_returnflag, l_linestatus, count(*) AS n,
          CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS sum_qty,
          CAST(grouping(l_returnflag) AS INT) AS g_rf,
          CAST(grouping(l_linestatus) AS INT) AS g_ls
        FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        ORDER BY g_rf, g_ls, l_returnflag NULLS LAST, l_linestatus NULLS LAST""")),

    // Bare ROLLUP over EMPTY input emits ONE global row (Presto
    // QueryPlanner treats the () set as a global aggregation; DuckDB
    // agrees) — the PrestoSql zero-scan guarded-branch rewrite, driven
    // through the Engine dialect path and hash-checked every round.
    "q46b_rollup_empty" -> Q(
      (s, d) => {
        val e = Engine(s)
        Tables.registerAll(e.spark, d) // Engine runs on an isolated session
        e.sql("""
          SELECT count(*) AS n,
            CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS qty
          FROM lineitem WHERE l_quantity < -1
          GROUP BY ROLLUP(l_returnflag)""")
      },
      Some("""
        SELECT count(*) AS n,
          CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS qty
        FROM lineitem WHERE l_quantity < -1
        GROUP BY ROLLUP(l_returnflag)""")),

    // Bare ROLLUP + grouping() in the select list over EMPTY input: the
    // global row carries grouping()=1 (all arguments grouped away). The
    // union branch substitutes the all-ones bitmask textually (round-10
    // close of the COVERAGE.md branch-bail residue).
    "q46c_rollup_empty_grouping" -> Q(
      (s, d) => {
        val e = Engine(s)
        Tables.registerAll(e.spark, d)
        e.sql("""
          SELECT count(*) AS n, CAST(grouping(l_returnflag) AS INT) AS g_rf,
            CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS qty
          FROM lineitem WHERE l_quantity < -1
          GROUP BY ROLLUP(l_returnflag)""")
      },
      Some("""
        SELECT count(*) AS n, CAST(grouping(l_returnflag) AS INT) AS g_rf,
          CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS qty
        FROM lineitem WHERE l_quantity < -1
        GROUP BY ROLLUP(l_returnflag)""")),

    // Same shape on NON-empty input with an OR-form HAVING whose first
    // disjunct holds on the zero-row aggregate (count(*)=0): the guarded
    // branch must stay dead — pins the round-10 parenthesization fix
    // (unparenthesized 'a OR b AND probe' re-bound as 'a OR (b AND probe)'
    // and emitted a spurious global row).
    "q46e_rollup_having_or" -> Q(
      (s, d) => {
        val e = Engine(s)
        Tables.registerAll(e.spark, d)
        e.sql("""
          SELECT l_returnflag, count(*) AS n,
            CAST(grouping(l_returnflag) AS INT) AS g_rf
          FROM lineitem WHERE l_quantity < 10
          GROUP BY ROLLUP(l_returnflag)
          HAVING count(*) = 0 OR count(*) > 10
          ORDER BY g_rf, l_returnflag""")
      },
      Some("""
        SELECT l_returnflag, count(*) AS n,
          CAST(grouping(l_returnflag) AS INT) AS g_rf
        FROM lineitem WHERE l_quantity < 10
        GROUP BY ROLLUP(l_returnflag)
        HAVING count(*) = 0 OR count(*) > 10
        ORDER BY g_rf, l_returnflag NULLS LAST""")),

    // Bare ROLLUP + WINDOW FUNCTION in the select list over EMPTY input —
    // the round-11 close of the last COVERAGE §2.4 residue: the
    // probe-guarded branch and the native main are disjoint, so the
    // window rides each side separately (branch computes it over the
    // wrapped one-row global aggregate; grouping cols become typed-NULL
    // inner columns, aggregate calls become inner columns). Expect ONE
    // row: (NULL, NULL, 1).
    "q46f_rollup_empty_window" -> Q(
      (s, d) => {
        val e = Engine(s)
        Tables.registerAll(e.spark, d)
        e.sql("""
          SELECT l_returnflag AS rf,
            CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS qty,
            CAST(rank() OVER (ORDER BY sum(l_quantity) DESC) AS INT) AS rnk
          FROM lineitem WHERE l_quantity < -1
          GROUP BY ROLLUP(l_returnflag)""")
      },
      Some("""
        SELECT l_returnflag AS rf,
          CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS qty,
          CAST(rank() OVER (ORDER BY sum(l_quantity) DESC) AS INT) AS rnk
        FROM lineitem WHERE l_quantity < -1
        GROUP BY ROLLUP(l_returnflag)""")),

    // Same lift on NON-empty input: the branch must stay dead and the
    // native plan computes the window over the rollup rows — grouping()
    // in the OVER clause included (constant-substituted in the branch).
    "q46g_rollup_window" -> Q(
      (s, d) => {
        val e = Engine(s)
        Tables.registerAll(e.spark, d)
        e.sql("""
          SELECT l_returnflag AS rf,
            CAST(grouping(l_returnflag) AS INT) AS g_rf, count(*) AS n,
            CAST(rank() OVER (PARTITION BY grouping(l_returnflag)
              ORDER BY count(*) DESC, l_returnflag) AS INT) AS rnk
          FROM lineitem
          GROUP BY ROLLUP(l_returnflag)
          ORDER BY g_rf, rnk""")
      },
      Some("""
        SELECT l_returnflag AS rf,
          CAST(grouping(l_returnflag) AS INT) AS g_rf, count(*) AS n,
          CAST(rank() OVER (PARTITION BY grouping(l_returnflag)
            ORDER BY count(*) DESC, l_returnflag) AS INT) AS rnk
        FROM lineitem
        GROUP BY ROLLUP(l_returnflag)
        ORDER BY g_rf, rnk""")),

    // CUBE over two dims.
    "q47_cube" -> Q(
      (s, d) => t(s, d, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          grouping(col("o_orderstatus")).cast("int").as("g_s"),
          grouping(col("o_orderpriority")).cast("int").as("g_p"))
        .orderBy(col("g_s"), col("g_p"), col("o_orderstatus"), col("o_orderpriority")),
      Some("""
        SELECT o_orderstatus, o_orderpriority, count(*) AS n,
          CAST(grouping(o_orderstatus) AS INT) AS g_s,
          CAST(grouping(o_orderpriority) AS INT) AS g_p
        FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        ORDER BY g_s, g_p, o_orderstatus NULLS LAST, o_orderpriority NULLS LAST""")),

    // Explicit GROUPING SETS (StatementAnalyzer.java:1540-1562 semantics).
    "q48_grouping_sets" -> Q(
      (s, d) => {
        graft.Tables.registerAll(s, d)
        s.sql("""
          SELECT l_returnflag, l_linestatus, count(*) AS n,
            CAST(grouping(l_returnflag) AS INT) AS g_rf,
            CAST(grouping(l_linestatus) AS INT) AS g_ls
          FROM lineitem
          GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
          ORDER BY g_rf, g_ls, l_returnflag NULLS LAST, l_linestatus NULLS LAST""")
      },
      Some("""
        SELECT l_returnflag, l_linestatus, count(*) AS n,
          CAST(grouping(l_returnflag) AS INT) AS g_rf,
          CAST(grouping(l_linestatus) AS INT) AS g_ls
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
        ORDER BY g_rf, g_ls, l_returnflag NULLS LAST, l_linestatus NULLS LAST""")),

    // UNNEST (UnnestOperator.java:33) → explode; word histogram over docs.
    "q49_unnest" -> Q(
      (s, d) => t(s, d, "documents")
        .select(explode(split(col("text"), " ")).as("word"))
        .filter(col("word") =!= "")
        .groupBy("word").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("word"))
        .limit(100),
      Some("""
        SELECT word, count(*) AS n FROM (
          SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        WHERE word <> ''
        GROUP BY word ORDER BY n DESC, word LIMIT 100""")),

    // UNNEST WITH ORDINALITY (UnnestOperator.java:45) → posexplode.
    // DuckDB 1.0 lacks WITH ORDINALITY → generate_subscripts mirror.
    "q50_unnest_ordinality" -> Q(
      (s, d) => t(s, d, "embeddings").filter(col("vec_id") < 10)
        .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "val")))
        .filter(col("pos") < 8)
        .select(col("vec_id"), (col("pos") + 1).as("ord"),
          round(col("val").cast("double"), 6).as("v"))
        .orderBy("vec_id", "ord"),
      Some("""
        SELECT vec_id, ord, v FROM (
          SELECT vec_id,
            CAST(generate_subscripts(embedding, 1) AS INT) AS ord,
            round(CAST(unnest(embedding) AS DOUBLE), 6) AS v
          FROM embeddings WHERE vec_id < 10)
        WHERE ord <= 8
        ORDER BY vec_id, ord""")),

    // VALUES / inline literal relation (ValuesOperator.java:1 →
    // LocalRelation; constant-folded at plan time).
    "q51_values" -> Q(
      (s, d) => {
        import s.implicits._
        Seq((1, "a"), (2, "b"), (3, "c")).toDF("id", "tag")
          .withColumn("id2", col("id") * 2)
          .orderBy("id")
      },
      Some("""
        SELECT id, tag, id * 2 AS id2
        FROM (VALUES (1, 'a'), (2, 'b'), (3, 'c')) t(id, tag)
        ORDER BY id""")),

    // Multi-argument zipped UNNEST (UnnestOperator.java:33 zips its
    // arguments): arrays_zip + posexplode = UNNEST(a, b) WITH ORDINALITY.
    "q98_unnest_zip" -> Q(
      (s, d) => t(s, d, "lineitem").filter(col("l_orderkey") <= 200)
        .select(col("l_orderkey"), col("l_linenumber"),
          sequence(lit(1), col("l_linenumber")).as("a"),
          transform(sequence(lit(1), col("l_linenumber")), x => x * x).as("b"))
        .select(col("l_orderkey"), col("l_linenumber"),
          posexplode(arrays_zip(col("a"), col("b"))).as(Seq("pos", "z")))
        .select(col("l_orderkey"), col("l_linenumber"),
          (col("pos") + 1).as("ord"), col("z.a").as("x"), col("z.b").as("y"))
        .orderBy("l_orderkey", "l_linenumber", "ord"),
      Some("""
        SELECT l_orderkey, l_linenumber,
          CAST(generate_subscripts(a, 1) AS INT) AS ord,
          CAST(unnest(a) AS INT) AS x,
          CAST(unnest(b) AS INT) AS y
        FROM (
          SELECT l_orderkey, l_linenumber,
            range(1, l_linenumber + 1) AS a,
            list_transform(range(1, l_linenumber + 1), x -> x * x) AS b
          FROM lineitem WHERE l_orderkey <= 200)
        ORDER BY l_orderkey, l_linenumber, ord"""))
  )
}
