package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.{Q, Tables}

/** TPC-DS-shape suite — the reference's second benchmark surface
  * (presto-benchto-benchmarks/src/main/resources/sql/presto/tpcds/
  * …: q27/q47/q33/q11/q36 shapes), adapted to the fixture's star schema.
  * These exercise plan shapes the TPC-H headliners don't: ROLLUP above a
  * multi-dim star join, moving-window aggregates over a pre-aggregate,
  * multi-channel self-unions re-aggregated, year-over-year self-joins of
  * one aggregate, and ranks partitioned by grouping level.
  *
  * Every query is ONE SQL text run verbatim on both engines (Spark via
  * registerAll views, DuckDB as the oracle): money math through exact
  * DECIMAL casts, float averages rounded, rank orders fully tie-broken —
  * the determinism rules the rest of the corpus follows.
  *
  * Scale posture: ds01/ds05 are one fact scan + Expand (×3 grouping sets);
  * ds02/ds04 aggregate the fact once and window/self-join the SMALL
  * pre-aggregate (months / customer-years — never the fact); ds03's three
  * channel branches each scan-prune on the month predicate and union
  * BEFORE the dim join, so part is joined once. All dims broadcast.
  */
object TpcDsShapes {

  private def sql(text: String): (SparkSession, String) => DataFrame =
    (s, d) => { Tables.registerAll(s, d); s.sql(text) }

  private def entry(text: String): Q = Q(sql(text), Some(text))

  // DS q27 shape: star join (fact + 3 dims) under ROLLUP with grouping flags.
  private val DS01 = """
    SELECT n_name, p_brand,
      CAST(grouping(n_name) AS INT) AS g_n,
      CAST(grouping(p_brand) AS INT) AS g_b,
      count(*) AS n,
      round(avg(l_quantity), 4) AS avg_qty,
      CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS sum_price
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN part ON l_partkey = p_partkey
    WHERE p_size <= 10
    GROUP BY ROLLUP(n_name, p_brand)"""

  // DS q47 shape: monthly revenue pre-aggregate, then a 3-month moving sum
  // and a rank per flag — window over the SMALL aggregate, never the fact.
  private val DS02 = """
    WITH monthly AS (
      SELECT l_returnflag AS flag,
        CAST(year(l_shipdate) AS INT) AS yr,
        CAST(month(l_shipdate) AS INT) AS mon,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS rev
      FROM lineitem GROUP BY 1, 2, 3)
    SELECT flag, yr, mon, rev,
      CAST(sum(rev) OVER (PARTITION BY flag ORDER BY yr, mon
        ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DECIMAL(38,2)) AS mov3,
      CAST(rank() OVER (PARTITION BY flag ORDER BY rev DESC, yr, mon) AS INT) AS rnk
    FROM monthly"""

  // DS q33/q71 shape: three "channel" aggregates of the fact unioned, then
  // re-aggregated per brand — the union happens on the pre-aggregates.
  private val DS03 = """
    WITH c1 AS (
      SELECT l_partkey AS pk,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS rev,
        'q1' AS channel
      FROM lineitem WHERE month(l_shipdate) <= 4 GROUP BY 1),
    c2 AS (
      SELECT l_partkey AS pk,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS rev,
        'q2' AS channel
      FROM lineitem WHERE month(l_shipdate) BETWEEN 5 AND 8 GROUP BY 1),
    c3 AS (
      SELECT l_partkey AS pk,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS rev,
        'q3' AS channel
      FROM lineitem WHERE month(l_shipdate) >= 9 GROUP BY 1)
    SELECT p_brand, channel,
      CAST(sum(rev) AS DECIMAL(38,2)) AS rev, count(*) AS parts
    FROM (SELECT * FROM c1 UNION ALL SELECT * FROM c2 UNION ALL SELECT * FROM c3) u
    JOIN part ON pk = p_partkey
    GROUP BY 1, 2"""

  // DS q11/q4 shape: per-customer yearly totals, consecutive years
  // self-joined, growth ratio filtered — the self-join is on the
  // pre-aggregate (customer×year), not the fact.
  private val DS04 = """
    WITH yearly AS (
      SELECT o_custkey AS ck, CAST(year(o_orderdate) AS INT) AS yr,
        CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS total
      FROM orders GROUP BY 1, 2)
    SELECT y1.ck AS custkey, y1.yr AS yr1, y1.total AS t1, y2.total AS t2,
      round(CAST(y2.total AS DOUBLE) / CAST(y1.total AS DOUBLE), 6) AS growth
    FROM yearly y1 JOIN yearly y2 ON y1.ck = y2.ck AND y2.yr = y1.yr + 1
    WHERE y2.total > y1.total"""

  // DS q36 shape: GROUPING SETS with count(DISTINCT), then rank
  // partitioned by grouping level over the aggregate.
  private val DS05 = """
    WITH g AS (
      SELECT l_returnflag AS rf, l_linestatus AS ls,
        CAST(grouping(l_returnflag) AS INT) AS g_rf,
        CAST(grouping(l_linestatus) AS INT) AS g_ls,
        count(DISTINCT l_partkey) AS parts,
        CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS qty
      FROM lineitem
      GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ()))
    SELECT rf, ls, g_rf, g_ls, parts, qty,
      CAST(rank() OVER (PARTITION BY g_rf, g_ls
        ORDER BY qty DESC, rf NULLS LAST, ls NULLS LAST) AS INT) AS rnk
    FROM g"""

  // DS q88 shape: independent time-bucket counts, each its own scalar
  // subquery, cross-joined into one row (eight fact scans by
  // construction — the reference's benchto runs it exactly so).
  private val DS06 = """
    SELECT s1.c AS h1, s2.c AS h2, s3.c AS h3, s4.c AS h4,
           s5.c AS h5, s6.c AS h6, s7.c AS h7, s8.c AS h8
    FROM
      (SELECT count(*) AS c FROM lineitem WHERE month(l_shipdate) = 1 AND l_quantity < 30) s1,
      (SELECT count(*) AS c FROM lineitem WHERE month(l_shipdate) = 2 AND l_quantity < 30) s2,
      (SELECT count(*) AS c FROM lineitem WHERE month(l_shipdate) = 3 AND l_quantity < 30) s3,
      (SELECT count(*) AS c FROM lineitem WHERE month(l_shipdate) = 4 AND l_quantity < 30) s4,
      (SELECT count(*) AS c FROM lineitem WHERE month(l_shipdate) = 5 AND l_quantity < 30) s5,
      (SELECT count(*) AS c FROM lineitem WHERE month(l_shipdate) = 6 AND l_quantity < 30) s6,
      (SELECT count(*) AS c FROM lineitem WHERE month(l_shipdate) = 7 AND l_quantity < 30) s7,
      (SELECT count(*) AS c FROM lineitem WHERE month(l_shipdate) = 8 AND l_quantity < 30) s8"""

  // DS q67 shape: three-level ROLLUP then top-3 per returnflag by rank
  // over the aggregate (window above grouping sets, filtered).
  private val DS07 = """
    WITH agg AS (
      SELECT l_returnflag AS rf, l_linestatus AS ls,
        CAST(year(l_shipdate) AS INT) AS yr,
        CAST(grouping(l_returnflag) AS INT) AS g_rf,
        CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS qty
      FROM lineitem
      GROUP BY ROLLUP(l_returnflag, l_linestatus, CAST(year(l_shipdate) AS INT))
    )
    SELECT rf, ls, yr, g_rf, qty, rnk FROM (
      SELECT rf, ls, yr, g_rf, qty,
        CAST(rank() OVER (PARTITION BY rf, g_rf
          ORDER BY qty DESC, ls NULLS LAST, yr NULLS LAST) AS INT) AS rnk
      FROM agg) t
    WHERE rnk <= 3"""

  val queries: Map[String, Q] = Map(
    "ds01_star_rollup" -> entry(DS01),
    "ds02_moving_rank" -> entry(DS02),
    "ds03_channel_union" -> entry(DS03),
    "ds04_yoy_growth" -> entry(DS04),
    "ds05_gsets_rank" -> entry(DS05),
    "ds06_bucket_counts" -> entry(DS06),
    "ds07_rollup_topk" -> entry(DS07))
}
