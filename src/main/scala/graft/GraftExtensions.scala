package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Planner-only extensions: custom strategies + the graft optimizer rules,
  * with NO function-name overrides. Safe on ANY session — including ones
  * running plain Spark DataFrame code, because several Presto names (`map`,
  * `split`, `max_by`, …) deliberately differ from the Spark builtins and
  * Spark 4's `functions.*` API resolves BY NAME through the session
  * registry (the `Engine` scaladoc's isolation rationale). Use this for
  * sessions that mix dialects; `GraftExtensions` for a cluster serving the
  * Presto dialect everywhere. */
class GraftPlannerExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // custom whole-operator plans (SURVEY §2.11 route c)
    ext.injectPlannerStrategy(_ => plans.AsOfJoinStrategy)
    // engine-level dynamic filtering + short-decimal long accumulation —
    // every query planned in the session gets them (graft.plans
    // .GraftOptimizations; the reference does this class of work in its
    // optimizer: PickTableLayout/TupleDomain narrowing, PredicatePushDown
    // equality inference, DecimalSumAggregation long state)
    ext.injectOptimizerRule(session => new plans.DynamicSemiJoinPrune(session))
    ext.injectOptimizerRule(_ => plans.ScaledLongSum)
    // full-partition window arrays (the dynamic-frame lowering) evaluate
    // on a shared per-partition array joined back to the rows — O(n·frame)
    // instead of WindowExec's O(n²) array-per-row serialization
    ext.injectOptimizerRule(session => new plans.DynamicFrameJoin(session))
    // Q18-class eager aggregation: push the outer aggregate below the
    // join when the IN-subquery already computes the same (child, key)
    // aggregate — the pre-agg dedupes via ReusedExchange
    ext.injectOptimizerRule(session => new plans.EagerAggregationReuse(session))
    // multi-channel UNION ALL of same-relation aggregates (TPC-DS
    // q33/q71 shape) fuses to ONE scan + Expand — n fact reads become 1
    ext.injectOptimizerRule(session => new plans.FuseUnionAggregates(session))
    // condition-less joins of single-row aggregates over one relation
    // (TPC-DS q88 shape) fuse into ONE scan with FILTER-clause aggregates
    ext.injectOptimizerRule(session => new plans.FuseScalarAggregates(session))
    // grouping sets with a covering set + decomposable aggregates compute
    // the finest level once and re-aggregate coarser levels from it,
    // replacing the ×|sets| Expand row blowup
    ext.injectOptimizerRule(session => new plans.CascadeGroupingSets(session))
    // layout-aware inner-join reordering: when a persisted co-bucketed
    // layout serves some join edge exchange-free but the textual order
    // executes a different join first, rebuild the chain layout-edge-first
    // (the reference's join-graph reorder, done for the layout-driven
    // case). Registered LAST: it must see the shape AFTER the structural
    // rewrites above (EagerAggregationReuse in particular — reordering
    // first was measured to break its h18 pattern match)
    ext.injectOptimizerRule(session => new plans.LayoutJoinReorder(session))
    // per-query layout selection over MULTIPLE persisted layouts of one
    // table (spark.graft.bucketedDir=dirA,dirB): swap a scan to the
    // sibling layout whose bucket key matches the join keys when that
    // makes the join co-located — the reference's PickTableLayout
    ext.injectOptimizerRule(session => new plans.PickTableLayout(session))
    // an adjacent partial+final aggregate pair (child already partitioned
    // on the group keys) collapses to one complete-mode pass — runs as an
    // AQE stage-prep rule so it sees the post-replanning physical plan
    ext.injectQueryStagePrepRule(session =>
      new plans.CollapseSingleStageAggregate(session))
    // a window whose partition keys prefix the grouping keys of the
    // aggregate below it shares ONE sort with that aggregate (streaming
    // sort-aggregate, no hash table) — the reference's
    // StreamingAggregationOperator placement; runs after the collapse
    // rule so it sees the single-stage Complete shape
    ext.injectQueryStagePrepRule(session =>
      new plans.SortSharedAggregate(session))
    // a hash aggregate whose child already delivers the grouping keys as
    // a sorted prefix (graft bucketed sorted layouts) becomes a CODEGEN'd
    // streaming aggregate — no hash table, no sort; the reference's
    // StreamingAggregationOperator as AccumulatorCompiler compiles it
    ext.injectQueryStagePrepRule(session =>
      new plans.StreamingSortedAggregate(session))
    // large integral InSet probes in physical Filters swap to the unboxed
    // LongSet probe — physical-only so constraint propagation can never
    // multiply the key array into the task binary (round-16 h02 path)
    ext.injectQueryStagePrepRule(session =>
      new plans.UnboxedInProbe(session))
  }
}

/** Cluster-deployable registration: `--conf spark.sql.extensions=
  * graft.GraftExtensions` installs the FULL Presto compatibility surface —
  * the dialect function registry on top of everything in
  * [[GraftPlannerExtensions]] — into every session on the cluster: the
  * production path for a Presto-dialect deployment (the per-session
  * `Engine` constructor covers embedded/mixed use, where the compat names
  * must not shadow Spark builtins for DataFrame-API code). Equivalent role
  * to the reference's Plugin.getFunctions (SPI/Plugin.java:53).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    functions.PrestoFunctions.registry.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions.PrestoFunctions", name),
        (args: Seq[Expression]) => builder(args)))
    }
    new GraftPlannerExtensions()(ext)
  }
}
