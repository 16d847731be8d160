package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Aggregation surface.
  *
  * Reference semantics: presto-main HashAggregationOperator.java:1 (grouped),
  * AggregationOperator.java:1 (global), MarkDistinctOperator.java:1 (mixed
  * DISTINCT), aggregate function library under
  * presto-main/src/main/java/com/facebook/presto/operator/aggregation/.
  * Spark: groupBy/agg → partial+final HashAggregateExec with map-side combine,
  * so each of these runs one shuffle keyed on the group-by columns — the shape
  * that scales linearly with input on a 1000-executor cluster.
  */
object Aggregates {
  private def li(s: SparkSession, d: String) = Tables.t(s, d, "lineitem")
  private def ord(s: SparkSession, d: String) = Tables.t(s, d, "orders")

  val queries: Map[String, Q] = Map(

    // FILTER clause on aggregates (the reference desugars it to masks —
    // ImplementFilteredAggregations.java; Spark plans it natively,
    // including on a DISTINCT aggregate). Same SQL runs on both engines.
    "q63_filtered_agg" -> Q(
      (s, d) => {
        Tables.registerAll(s, d)
        s.sql("""
          SELECT l_returnflag,
            count(*) FILTER (WHERE l_quantity > 25) AS n_big,
            CAST(sum(CAST(l_quantity AS DECIMAL(18,2)))
              FILTER (WHERE l_discount > 0.05) AS DECIMAL(38,2)) AS qty_disc,
            CAST(count(DISTINCT l_suppkey)
              FILTER (WHERE l_shipdate >= TIMESTAMP '1996-06-01') AS BIGINT) AS n_supp
          FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")
      },
      Some("""
        SELECT l_returnflag,
          count(*) FILTER (WHERE l_quantity > 25) AS n_big,
          CAST(sum(CAST(l_quantity AS DECIMAL(18,2)))
            FILTER (WHERE l_discount > 0.05) AS DECIMAL(38,2)) AS qty_disc,
          CAST(count(DISTINCT l_suppkey)
            FILTER (WHERE l_shipdate >= TIMESTAMP '1996-06-01') AS BIGINT) AS n_supp
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // TPC-H Q1: the canonical scan→filter→groupBy-agg pipeline.
    // Money sums in decimal → order-independent, deterministic at any SF.
    "q01_tpch_q1" -> Q(
      (s, d) => {
        val l = li(s, d)
        l.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            sum(col("l_quantity").cast("decimal(18,2)")).cast("decimal(38,2)").as("sum_qty"),
            sum(col("l_extendedprice").cast("decimal(18,2)")).cast("decimal(38,2)").as("sum_base_price"),
            sum((col("l_extendedprice").cast("decimal(18,2)") *
              (lit(BigDecimal(1)).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
              .cast("decimal(18,4)")).cast("decimal(38,4)").as("sum_disc_price"),
            round(avg("l_quantity"), 4).as("avg_qty"),
            round(avg("l_extendedprice"), 4).as("avg_price"),
            round(avg("l_discount"), 4).as("avg_disc"),
            count(lit(1)).as("count_order"))
          .orderBy("l_returnflag", "l_linestatus")
      },
      Some("""
        SELECT l_returnflag, l_linestatus,
          CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS sum_qty,
          CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS sum_base_price,
          CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
            (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS sum_disc_price,
          round(avg(l_quantity), 4) AS avg_qty,
          round(avg(l_extendedprice), 4) AS avg_price,
          round(avg(l_discount), 4) AS avg_disc,
          count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus""")),

    // TPC-H Q6: selective filter → global agg; filter must push to parquet.
    "q02_tpch_q6" -> Q(
      (s, d) => li(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_discount").between(0.03, 0.07) && col("l_quantity") < 24)
        .agg(
          sum((col("l_extendedprice").cast("decimal(18,2)") *
            col("l_discount").cast("decimal(18,2)")).cast("decimal(18,4)"))
            .cast("decimal(38,4)").as("revenue"),
          count(lit(1)).as("n")),
      Some("""
        SELECT
          CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
            CAST(l_discount AS DECIMAL(18,2)) AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS revenue,
          count(*) AS n
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
          AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24""")),

    // Global agg, several functions at once (AggregationOperator.java:1).
    "q03_agg_global" -> Q(
      (s, d) => li(s, d).agg(
        count(lit(1)).as("n_rows"),
        countDistinct(col("l_suppkey")).as("n_supp"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("decimal(38,2)").as("sum_qty"),
        min(col("l_shipdate")).as("min_ship"),
        max(col("l_shipdate")).as("max_ship"),
        round(avg("l_extendedprice"), 4).as("avg_price")),
      Some("""
        SELECT count(*) AS n_rows,
          count(DISTINCT l_suppkey) AS n_supp,
          CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS sum_qty,
          min(l_shipdate) AS min_ship, max(l_shipdate) AS max_ship,
          round(avg(l_extendedprice), 4) AS avg_price
        FROM lineitem""")),

    // Mixed DISTINCT + plain aggregates (MarkDistinctOperator.java:1 —
    // Spark's RewriteDistinctAggregates Expand covers it).
    "q04_agg_distinct" -> Q(
      (s, d) => li(s, d)
        .groupBy("l_returnflag")
        .agg(
          countDistinct(col("l_partkey")).as("nd_part"),
          countDistinct(col("l_suppkey")).as("nd_supp"),
          sum_distinct(col("l_quantity").cast("decimal(18,2)")).cast("decimal(38,2)").as("sumd_qty"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag"),
      Some("""
        SELECT l_returnflag,
          count(DISTINCT l_partkey) AS nd_part,
          count(DISTINCT l_suppkey) AS nd_supp,
          CAST(sum(DISTINCT CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS sumd_qty,
          count(*) AS n
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // Statistics family (VarianceAggregation.java, CentralMomentsAggregation
    // .java, DoubleCorrelationAggregation.java, DoubleCovarianceAggregation
    // .java). Small-magnitude inputs keep double noise below the rounding.
    "q05_agg_stats" -> Q(
      (s, d) => li(s, d)
        .groupBy("l_returnflag")
        .agg(
          round(stddev_samp(col("l_quantity")), 6).as("sd_qty"),
          round(stddev_pop(col("l_quantity")), 6).as("sdp_qty"),
          round(var_samp(col("l_quantity")), 6).as("var_qty"),
          round(var_pop(col("l_quantity")), 6).as("varp_qty"),
          round(corr(col("l_quantity"), col("l_discount")), 6).as("corr_qd"),
          round(covar_samp(col("l_quantity"), col("l_discount")), 6).as("cov_qd"),
          round(covar_pop(col("l_quantity"), col("l_discount")), 6).as("covp_qd"))
        .orderBy("l_returnflag"),
      Some("""
        SELECT l_returnflag,
          round(stddev_samp(l_quantity), 6) AS sd_qty,
          round(stddev_pop(l_quantity), 6) AS sdp_qty,
          round(var_samp(l_quantity), 6) AS var_qty,
          round(var_pop(l_quantity), 6) AS varp_qty,
          round(corr(l_quantity, l_discount), 6) AS corr_qd,
          round(covar_samp(l_quantity, l_discount), 6) AS cov_qd,
          round(covar_pop(l_quantity, l_discount), 6) AS covp_qd
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // min_by/max_by (minmaxby/AbstractMinMaxBy.java) + min/max on several
    // orderable types (AbstractMinMaxAggregationFunction.java).
    "q06_agg_minmax_by" -> Q(
      (s, d) => ord(s, d)
        .groupBy("o_orderstatus")
        .agg(
          max_by(col("o_orderkey"), col("o_totalprice")).as("key_of_max_price"),
          min_by(col("o_orderkey"), col("o_totalprice")).as("key_of_min_price"),
          max(col("o_orderdate")).as("max_date"),
          min(col("o_orderpriority")).as("min_prio"),
          round(max(col("o_totalprice")), 4).as("max_price"))
        .orderBy("o_orderstatus"),
      Some("""
        SELECT o_orderstatus,
          max_by(o_orderkey, o_totalprice) AS key_of_max_price,
          min_by(o_orderkey, o_totalprice) AS key_of_min_price,
          max(o_orderdate) AS max_date,
          min(o_orderpriority) AS min_prio,
          round(max(o_totalprice), 4) AS max_price
        FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // Boolean/conditional aggregates: count_if, bool_and/bool_or
    // (CountIfAggregation.java, BooleanAndAggregation.java).
    "q07_agg_bool" -> Q(
      (s, d) => li(s, d)
        .groupBy("l_linestatus")
        .agg(
          count_if(col("l_discount") > 0.05).cast("long").as("n_disc"),
          bool_and(col("l_quantity") > 0).as("all_pos"),
          bool_or(col("l_tax") > 0.07).as("any_hi_tax"),
          sum(when(col("l_quantity") > 25, 1).otherwise(0)).cast("long").as("n_hi_qty"))
        .orderBy("l_linestatus"),
      Some("""
        SELECT l_linestatus,
          CAST(count_if(l_discount > 0.05) AS BIGINT) AS n_disc,
          bool_and(l_quantity > 0) AS all_pos,
          bool_or(l_tax > 0.07) AS any_hi_tax,
          CAST(sum(CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END) AS BIGINT) AS n_hi_qty
        FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""")),

    // Exact percentiles (linear interpolation — matches DuckDB quantile_cont).
    // Presto's approx_percentile analogue is benchmarked separately (sketches
    // are estimate-compared, not hash-compared).
    "q08_agg_percentile" -> Q(
      (s, d) => li(s, d)
        .groupBy("l_returnflag")
        .agg(
          round(expr("percentile(l_extendedprice, 0.5)"), 4).as("p50"),
          round(expr("percentile(l_extendedprice, 0.9)"), 4).as("p90"),
          round(expr("percentile(l_quantity, 0.25)"), 4).as("q25"))
        .orderBy("l_returnflag"),
      Some("""
        SELECT l_returnflag,
          round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
          round(quantile_cont(l_extendedprice, 0.9), 4) AS p90,
          round(quantile_cont(l_quantity, 0.25), 4) AS q25
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // collect_set sorted — array_agg/set semantics (arrayagg/
    // ArrayAggregationFunction.java:49) made deterministic via sort.
    "q09_agg_collect" -> Q(
      (s, d) => ord(s, d)
        .groupBy("o_orderstatus")
        .agg(
          // joined to a scalar string: the driver's row-sort cannot handle
          // array cells (pandas lexsort → unhashable ndarray)
          array_join(sort_array(collect_set(col("o_orderpriority"))), ",").as("prios"),
          countDistinct(col("o_orderpriority")).cast("long").as("n_prios"))
        .orderBy("o_orderstatus"),
      Some("""
        SELECT o_orderstatus,
          array_to_string(list_sort(list(DISTINCT o_orderpriority)), ',') AS prios,
          CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS n_prios
        FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // Sketch aggregates (ApproximateCountDistinctAggregation.java:51 — HLL).
    // Estimates are algorithm-specific, so the oracle pins the EXACT
    // companions plus error-bound booleans: the exact values hash-compare,
    // and the sketch estimates are asserted within their documented bounds
    // (HLL++ rsd default 5%; approx_percentile between p25 and p75).
    "q10_agg_approx" -> Q(
      (s, d) => li(s, d)
        .groupBy("l_returnflag")
        .agg(
          countDistinct(col("l_partkey")).cast("long").as("exact_parts"),
          approx_count_distinct(col("l_partkey")).as("ap"),
          expr("percentile_approx(l_extendedprice, 0.5, 1000)").as("p50"),
          expr("percentile(l_extendedprice, 0.25)").as("p25"),
          expr("percentile(l_extendedprice, 0.75)").as("p75"))
        .select(col("l_returnflag"), col("exact_parts"),
          (col("ap") >= col("exact_parts") * 0.85 &&
            col("ap") <= col("exact_parts") * 1.15).as("approx_parts_ok"),
          (col("p50") >= col("p25") && col("p50") <= col("p75")).as("approx_p50_ok"))
        .orderBy("l_returnflag"),
      Some("""
        SELECT l_returnflag,
          CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
          true AS approx_parts_ok,
          true AS approx_p50_ok
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // Order-independent checksum over a column (ChecksumAggregationFunction
    // .java:46 — xor of hashes; here sum of md5-derived residues so DuckDB
    // can mirror it exactly).
    "q11_agg_checksum" -> Q(
      (s, d) => Tables.t(s, d, "documents")
        .agg(
          sum(
            (conv(substring(md5(col("text")), 17, 16), 16, 10).cast("decimal(38,0)") %
              lit(1000000007L)).cast("long")).cast("long").as("checksum"),
          count(lit(1)).as("n")),
      Some("""
        SELECT CAST(sum(CAST(('0x' || substr(md5(text),17,16))::UBIGINT % 1000000007 AS BIGINT)) AS BIGINT) AS checksum,
          count(*) AS n
        FROM documents"""))
  )
}
