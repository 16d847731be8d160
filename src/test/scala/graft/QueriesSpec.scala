package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session for all suites (one JVM-wide SparkSession, local[4]). */
object TestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      // planner surface (strategies + optimizer rules) exactly as
      // GraftSession.local sessions get it; Presto function NAMES stay
      // isolated in Engine sessions (they shadow Spark builtins)
      .withExtensions(new GraftPlannerExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
      .config("javax.jdo.option.ConnectionURL",
        s"jdbc:derby:;databaseName=${java.nio.file.Files.createTempDirectory("graft-metastore")}/metastore_db;create=true")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf = "/root/testdata/sf0.001"
}

/** Smoke: every inventory query plans and executes on sf0.001, and no
  * plan regresses to a quadratic join shape. */
class QueriesSpec extends AnyFunSuite {
  import TestSession._

  /** Entries whose plans legitimately contain a BroadcastNestedLoopJoin:
    * the broadcast side is CONSTANT-bounded (a k-row query-vector panel,
    * centroid/LUT table, hourly spine, one-row scalar-subquery result) or
    * the entry deliberately exercises the cross-join operator (q26) /
    * non-equi spatial broadcast (g02); the r*-corpus rows are reference
    * test SQL whose uncorrelated scalar subqueries Spark plans as one-row
    * BNLJ. Anything NOT listed that plans a BNLJ — or ANY entry that
    * plans a CartesianProduct — is a scale regression and fails here
    * (graft.tools.PlanLint reproduces this sweep standalone). */
  private val bnljAllowed = Set(
    // ds06 = DS q88 shape: eight SINGLE-ROW scalar subqueries cross-joined
    "ds06_bucket_counts",
    // s10 = BM25: the 1-row (N, avgdl) corpus stats broadcast-crossed in
    "s10_bm25",
    "e08_gap_fill", "g02_spatial_join", "p07_cosine_native", "p13_setdigest",
    "q26_join_cross", "r100_ref_bigint_sweep", "r101_ref_bigint_pairs",
    "r102_ref_boolean_sweep", "r105_ref_int_pairs", "r106_ref_int_singles",
    "r109_ref_unknown_type", "r111_ref_star_joins",
    "r116_ref_scalar_subquery_cmp", "r125_ref_lineitem_orders_star",
    "r126_ref_orders_star_pairs", "r127b_ref_correlated_having",
    "r13_ref_intersect", "r146_ref_correlated_inequality", "r14_ref_except",
    "r158_ref_atq_sweep", "r15_ref_setop_agg", "r161_ref_atq_sweep",
    "r165_ref_atq_sweep", "r186_ref_atq_sweep", "r191_pt_corpus",
    "r217_pt_raw", "r219_pt_raw", "r236_ref_decorrelate",
    // t11 = the LM's single-row vocab-size scalar cross-joined onto the
    // (tiny, broadcast) model table
    "t11_lm_perplexity",
    "r239a_ref_onearg_tail", "r239e_ref_onearg_tail", "r239k_ref_onearg_tail",
    "r239l_ref_onearg_tail", "r35_ref_correlated", "r41_ref_semijoin_groupby",
    "r42_ref_semijoin_having", "r46_ref_correlated_agg", "r53_ref_join_family",
    "r55_ref_join_move_around", "r86_ref_join_counts",
    "r88_ref_semijoin_grouped", "r89_ref_semijoin_having",
    "r95_ref_misc_scalars", "s01_cosine_topk", "s02_cosine_pairs",
    "s05_ann_ivf", "s06_quantized_ann", "s07_kmeans_ivf", "s08_mips",
    "s09_ann_batch",
    // one-row bottleneck-scale aggregate cross-joined back onto the
    // 5-row class-rate relation (TextAnalysis.mixtureResample)
    "t10_mixture_resample")

  SparkEntry.all.foreach { case (name, q) =>
    test(s"$name executes") {
      val df = q.fn(spark, sf)
      assert(df.columns.nonEmpty)
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"$name plans a CartesianProduct — quadratic at scale")
      if (!bnljAllowed(name))
        assert(!plan.contains("BroadcastNestedLoopJoin"),
          s"$name plans a BroadcastNestedLoopJoin not in the constant-side " +
            "allowlist — check the join shape, then allowlist if intended")
      assert(df.count() >= 0)
    }
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key exists in queries") {
    val qs = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs))
  }
}
