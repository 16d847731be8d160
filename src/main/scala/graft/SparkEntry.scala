package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the operator inventory (one entry per implemented operator
  * family from SURVEY.md §2); `oracleSql` holds the DuckDB-equivalent SQL for
  * every hash-checkable query (estimate-based sketches are rows-only).
  */
object SparkEntry {

  private val modules: Seq[Map[String, Q]] = Seq(
    _root_.graft.queries.Aggregates.queries,
    _root_.graft.queries.Joins.queries,
    _root_.graft.queries.Windows.queries,
    _root_.graft.queries.Relational.queries,
    _root_.graft.queries.Subqueries.queries,
    _root_.graft.queries.Scalars.queries,
    _root_.graft.queries.PrestoCompat.queries,
    _root_.graft.queries.Coverage.queries,
    _root_.graft.queries.TpchMacro.queries,
    _root_.graft.queries.TpcDsShapes.queries,
    _root_.graft.queries.Geo.queries,
    _root_.graft.queries.RefCorpus.queries,
    _root_.graft.operators.Dedup.queries,
    _root_.graft.operators.TextAnalysis.queries,
    _root_.graft.operators.Similarity.queries,
    _root_.graft.operators.Multimodal.queries,
    _root_.graft.operators.Events.queries,
    _root_.graft.operators.RangeJoin.queries,
    _root_.graft.operators.Bpe.queries,
    _root_.graft.operators.Retrieval.queries,
    _root_.graft.sources.Warc.queries)

  val all: Map[String, Q] = {
    val merged = modules.reduce(_ ++ _)
    // a duplicate key across modules would silently drop a query
    val total = modules.map(_.size).sum
    require(merged.size == total,
      s"duplicate query names across modules: ${total - merged.size} lost")
    merged
  }

  /** Headline benchmark set: one representative per operator family. */
  val benchNames: Seq[String] = Seq(
    "q01_tpch_q1", "q02_tpch_q6", "q20_join_inner", "q22_tpch_q3",
    "h05_local_supplier", "h10_returned_items", "h14_promo_effect",
    "h18_large_volume",
    "q24_join_semi", "q30_win_rank", "q34_win_topk", "q40_topn",
    "q46_rollup", "q49_unnest", "q55_scalar_subquery",
    "d01_dedup_exact", "d04_minhash_lsh_pairs", "d11_lsh_after_exact",
    "d12_decontaminate", "t02_quality_score", "t09_sequence_pack",
    "s01_cosine_topk", "p07_cosine_native", "e03_sessionize",
    "e01_tumbling_window", "q72_datetime_fns",
    "h02_min_cost_supplier", "h09_product_profit", "h21_waiting_supplier",
    "g02_spatial_join", "d05_simhash", "s05_ann_ivf", "e05_asof_join",
    "e06_interval_join",
    "ds01_star_rollup", "ds02_moving_rank", "ds03_channel_union",
    "ds04_yoy_growth", "ds05_gsets_rank", "ds06_bucket_counts",
    "ds07_rollup_topk",
    "ds08_channel_fanout", "ds11_intersect_customers", "ds14_basket_overlap",
    // round 14: the reorder-rule spelling + three of the 12 new DS shapes
    "h10_returned_items_orig",
    "ds26_rollup_hierarchy_rank", "ds27_cte_of_cte_growth",
    "ds29_except_distinct",
    // round 15: three of the 15 new DS shapes (channel-profit rollup,
    // latency-bucket pivot, full-outer period compare)
    "ds46_channel_profit_rollup", "ds52_latency_buckets",
    "ds58_fullouter_periods",
    // round 16: three of the 15 new DS shapes (interval latency buckets,
    // NOT-EXISTS clean orders + count distinct, cumulative window race)
    "ds62_latency_by_priority", "ds71_clean_order_suppliers",
    "ds72_cumulative_race")

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    all("q01_tpch_q1").fn(spark, "/root/testdata/sf0.001")

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map { case (k, q) => k -> q.fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.collect { case (k, Q(_, Some(sql))) => k -> sql.stripMargin.trim }
}
