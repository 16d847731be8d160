package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.aggregate.{Complete, Final, Partial}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.aggregate.{BaseAggregateExec, HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}

/** Collapse an ADJACENT partial+final aggregate pair into one
  * complete-mode aggregate.
  *
  * Spark always plans a group-by as partial→(exchange)→final; when the
  * child's partitioning already satisfies the grouping (a join that
  * shuffled on the same keys, a bucketed scan), EnsureRequirements drops
  * the exchange and both aggregates run back-to-back in ONE stage. The
  * partial pass then buys nothing — there is no shuffle after it to
  * shrink — and costs a full extra hash-table pass over the stage's rows.
  * Measured at the sf30 soak on h21 (group by (l_orderkey, l_suppkey)
  * directly over the orderkey-partitioned join, 59.5 M rows → 59.4 M
  * groups): 89 s + 110 s cumulative aggTime for the pair, the single
  * largest CPU sink in the query; h18 and q22 share the shape. The
  * reference plans single-step aggregation in exactly this situation —
  * AddExchanges only splits an aggregation when a remote exchange has to
  * sit between the steps (presto-main/sql/planner/optimizations/
  * AddExchanges.java, PushPartialAggregationThroughExchange.java) — and
  * at cluster scale the same holds: the pair is only ever adjacent when
  * the data is already co-partitioned, so the collapse never ADDS a
  * shuffle anywhere.
  *
  * Fires only on a physically adjacent pair of the same aggregate
  * flavor whose modes are uniformly Partial below Final, matching
  * result/grouping attribute lists pairwise (the AggUtils construction),
  * batch-only. Mode flip Final→Complete reads the original input columns
  * (the function's own children) instead of merge buffers, so the
  * partial's child slots in directly; grouping falls back to the
  * partial's named expressions (same exprIds, so downstream references
  * hold). Registered as an AQE query-stage-prep rule: it runs on every
  * re-optimized plan, AFTER AQE's join replanning decides the real
  * partitioning. `spark.graft.singleStageAgg=false` disables. */
class CollapseSingleStageAggregate(spark: SparkSession)
    extends Rule[SparkPlan] {

  private def enabled: Boolean =
    spark.conf.getOption(CollapseSingleStageAggregate.KEY).forall(_.toBoolean)

  /** The AggUtils-built pair shape: final directly above partial, same
    * grouping attrs, same aggregate result attrs, no distinct path
    * (those use PartialMerge modes and never match). */
  private def isPair(fin: BaseAggregateExec, part: BaseAggregateExec): Boolean =
    !fin.isStreaming && !part.isStreaming &&
      fin.aggregateExpressions.nonEmpty &&
      fin.aggregateExpressions.forall(_.mode == Final) &&
      part.aggregateExpressions.forall(_.mode == Partial) &&
      fin.aggregateExpressions.map(_.resultAttribute) ==
        part.aggregateExpressions.map(_.resultAttribute) &&
      fin.groupingExpressions == part.groupingExpressions.map(_.toAttribute)

  override def apply(plan: SparkPlan): SparkPlan = {
    if (!enabled) return plan
    plan.transformUp {
      case fin: HashAggregateExec if fin.child.isInstanceOf[HashAggregateExec] &&
          isPair(fin, fin.child.asInstanceOf[HashAggregateExec]) =>
        val part = fin.child.asInstanceOf[HashAggregateExec]
        fin.copy(
          groupingExpressions = part.groupingExpressions,
          aggregateExpressions =
            part.aggregateExpressions.map(_.copy(mode = Complete)),
          initialInputBufferOffset = 0,
          child = part.child)
      case fin: ObjectHashAggregateExec
          if fin.child.isInstanceOf[ObjectHashAggregateExec] &&
            isPair(fin, fin.child.asInstanceOf[ObjectHashAggregateExec]) =>
        val part = fin.child.asInstanceOf[ObjectHashAggregateExec]
        fin.copy(
          groupingExpressions = part.groupingExpressions,
          aggregateExpressions =
            part.aggregateExpressions.map(_.copy(mode = Complete)),
          initialInputBufferOffset = 0,
          child = part.child)
      case fin: SortAggregateExec if fin.child.isInstanceOf[SortAggregateExec] &&
          isPair(fin, fin.child.asInstanceOf[SortAggregateExec]) =>
        val part = fin.child.asInstanceOf[SortAggregateExec]
        fin.copy(
          groupingExpressions = part.groupingExpressions,
          aggregateExpressions =
            part.aggregateExpressions.map(_.copy(mode = Complete)),
          initialInputBufferOffset = 0,
          child = part.child)
    }
  }
}

object CollapseSingleStageAggregate {
  val KEY = "spark.graft.singleStageAgg"
}
