package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DecimalType

/** Eager aggregation through a join, gated on a TWIN aggregate.
  *
  * Shape (TPC-H Q18 / the h18 soak headliner):
  *
  *   Aggregate G ⊇ {b.k}, aggs over A-columns only
  *   +- Join Inner (a.k = b.k)
  *      :- A                        (the big fact, e.g. lineitem)
  *      +- B                        (whose filter contains
  *                                   `b.k IN (SELECT a.k FROM A
  *                                    GROUP BY a.k HAVING agg > c)`)
  *
  * Because the outer grouping contains the join key, every output group
  * lives inside ONE key equivalence class, so the aggregate can be
  * evaluated BELOW the join — grouped by a.k over A alone — and the outer
  * aggregate re-aggregates the per-key results (sum→sum, count→sum,
  * min→min, max→max; B-side duplication multiplies both sides of the
  * identity equally, so the rewrite is exact with NO uniqueness
  * assumption on b.k — the classical eager/lazy aggregation
  * transformation, Yan & Larson VLDB'94; the reference implements it as
  * PushPartialAggregationThroughJoin —
  * MAIN/sql/planner/iterative/rule/PushPartialAggregationThroughJoin.java).
  *
  * Measured at the sf30 soak on h18: the un-pushed plan shuffles raw
  * lineitem a SECOND time (4.1 GB write + a 13 GB-peak sort) and runs the
  * outer aggregate over the 58 M joined rows (166 s cumulative); pushed,
  * the pre-aggregate is the SAME (child, key) aggregate the IN-subquery
  * already computes, so its partial pass + exchange dedupe via AQE's
  * ReusedExchange and the join/outer-agg shrink to the 8.8 M surviving
  * groups.
  *
  * That sharing is also the GATE: this rule fires only when a semantically
  * matching aggregate over the same child and key already exists in one of
  * the plan's subqueries ("twin"). An unshared eager push can easily LOSE
  * — a pre-agg with no row reduction is a wasted hash pass (the same
  * lesson as CollapseSingleStageAggregate's partial pair) — and deciding
  * that without the twin needs cardinality stats Spark doesn't keep.
  * `spark.graft.eagerAgg=false` disables.
  *
  * Exactness conditions enforced below:
  *   - inner equi-join; one A↔B key pair; G contains a key-equivalent;
  *   - A-side columns referenced anywhere outside the agg functions are
  *     limited to a.k (so the pre-agg's grouping output suffices);
  *   - agg functions are non-distinct, unfiltered Sum/Min/Max/Count over
  *     deterministic A-only inputs;
  *   - re-aggregation casts back to the original result type (a sum of
  *     sums widens the declared decimal precision; values are unchanged
  *     for anything the original would not already have overflowed).
  */
class EagerAggregationReuse(spark: SparkSession) extends Rule[LogicalPlan] {

  private def enabled: Boolean =
    spark.conf.getOption(EagerAggregationReuse.KEY).forall(_.toBoolean)

  /** Key positions make attributes comparable across plan copies: the
    * canonicalized child + the attribute's ordinal in its output. */
  private def keyPos(child: LogicalPlan, key: Attribute): Int =
    child.output.indexWhere(_.exprId == key.exprId)

  /** Single-key aggregates available in the plan's subqueries, as
    * (canonicalized child, key ordinal). */
  private def twinKeys(plan: LogicalPlan): Set[(LogicalPlan, Int)] = {
    val out = scala.collection.mutable.Set.empty[(LogicalPlan, Int)]
    plan.subqueriesAll.foreach(_.foreach {
      case Aggregate(Seq(k: Attribute), _, ch, _) =>
        val pos = keyPos(ch, k)
        if (pos >= 0) out += ((ch.canonicalized, pos))
      case _ =>
    })
    out.toSet
  }

  private def reAgg(fn: AggregateFunction, pre: Attribute): Option[AggregateFunction] =
    fn match {
      case _: Sum => Some(Sum(pre))
      case _: Count => Some(Sum(pre))
      case _: Min => Some(Min(pre))
      case _: Max => Some(Max(pre))
      case _ => None
    }

  private def supported(fn: AggregateFunction): Boolean = fn match {
    case _: Sum | _: Min | _: Max | _: Count => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    // cheap applicability: an aggregate over an inner join AND a subquery
    // anywhere — otherwise skip the twin collection walk entirely
    val shape = plan.exists {
      case Aggregate(_, _, _: Join, _) => true
      case Aggregate(_, _, Project(_, _: Join), _) => true
      case _ => false
    }
    if (!shape || plan.subqueriesAll.isEmpty) return plan
    val twins = twinKeys(plan)
    if (twins.isEmpty) return plan

    plan.transformDown {
      case agg @ Aggregate(groupExprs, aggExprs, aggChild, _)
          if agg.resolved && aggExprs.forall(_.deterministic) =>
        // allow one aliasing Project between Aggregate and Join
        val (join, substitute) = aggChild match {
          case j: Join => (Some(j), identity[Expression] _)
          case p @ Project(pl, j: Join) if pl.forall(_.deterministic) =>
            val aliasMap = pl.collect { case a: Alias => a.toAttribute -> a.child }.toMap
            (Some(j),
              (e: Expression) => e.transformUp {
                case at: Attribute => aliasMap.getOrElse(at, at)
              })
          case _ => (None, identity[Expression] _)
        }
        join match {
          case Some(j @ Join(left, right, Inner, Some(cond), hint)) =>
            rewrite(agg, groupExprs.map(substitute), aggExprs, substitute,
              j, left, right, cond, hint, twins).getOrElse(agg)
          case _ => agg
        }
    }
  }

  /** Try both orientations; None leaves the aggregate untouched. */
  private def rewrite(agg: Aggregate, groupS: Seq[Expression],
      aggExprs: Seq[NamedExpression], substitute: Expression => Expression,
      j: Join, left: LogicalPlan, right: LogicalPlan, cond: Expression,
      hint: JoinHint, twins: Set[(LogicalPlan, Int)]): Option[Aggregate] = {

    val conjuncts = {
      def split(e: Expression): Seq[Expression] = e match {
        case And(l, r) => split(l) ++ split(r)
        case other => Seq(other)
      }
      split(cond)
    }

    def attempt(a: LogicalPlan, b: LogicalPlan, aIsLeft: Boolean): Option[Aggregate] = {
      // exactly one equi pair between A and B; everything else must not
      // touch A
      val pairs = conjuncts.collect {
        case EqualTo(x: AttributeReference, y: AttributeReference)
            if a.outputSet.contains(x) && b.outputSet.contains(y) => (x, y)
        case EqualTo(y: AttributeReference, x: AttributeReference)
            if a.outputSet.contains(x) && b.outputSet.contains(y) => (x, y)
      }
      if (pairs.length != 1) return None
      val (aK, bK) = pairs.head
      val others = conjuncts.filterNot {
        case EqualTo(x, y) =>
          (x.semanticEquals(aK) && y.semanticEquals(bK)) ||
            (x.semanticEquals(bK) && y.semanticEquals(aK))
        case _ => false
      }
      if (others.exists(_.references.exists(a.outputSet.contains))) return None
      // outer grouping must pin the join key (either side of the
      // equivalence class)
      if (!groupS.exists(g => g.semanticEquals(aK) || g.semanticEquals(bK)))
        return None
      // the twin gate: the same (child, key) aggregate exists in a subquery
      val pos = a.output.indexWhere(_.exprId == aK.exprId)
      if (pos < 0 || !twins.contains((a.canonicalized, pos))) return None
      // A must not already be the pre-aggregate (idempotency)
      a match {
        case Aggregate(Seq(k: Attribute), _, _, _) if k.semanticEquals(aK) =>
          return None
        case _ =>
      }

      // collect the aggregate calls; all must be A-only and supported
      val calls = aggExprs.flatMap(_.collect { case ae: AggregateExpression => ae })
      if (calls.isEmpty) return None
      if (!calls.forall(ae => !ae.isDistinct && ae.filter.isEmpty &&
        supported(ae.aggregateFunction) &&
        ae.references.nonEmpty && ae.references.forall(a.outputSet.contains) &&
        ae.deterministic)) return None
      // A-side columns outside the agg calls must be limited to the key
      val outsideRefs = (groupS ++ aggExprs.map(ne =>
        substitute(ne).transformUp {
          case ae: AggregateExpression => Literal(null, ae.dataType)
        })).flatMap(_.references).filter(a.outputSet.contains).toSet
      if (!outsideRefs.subsetOf(Set[Attribute](aK))) return None

      // pre-aggregate over A, grouped by the key; one column per call
      val preAliases = calls.map(ae => Alias(ae, "__eager_pre")())
      val pre = Aggregate(Seq(aK), aK +: preAliases, a)
      val preByCall: Map[AggregateExpression, Attribute] =
        calls.zip(preAliases.map(_.toAttribute)).toMap

      // outer expressions: each call re-aggregates its pre column, cast
      // back to the original result type
      val newAggExprs = aggExprs.map { ne =>
        substitute(ne).transformUp {
          case ae: AggregateExpression =>
            val preAttr = preByCall(ae)
            val fn = reAgg(ae.aggregateFunction, preAttr).get
            val re = AggregateExpression(fn, Complete, isDistinct = false)
            if (re.dataType == ae.dataType) re
            else Cast(re, ae.dataType)
        } match {
          case a2: Alias => Alias(a2.child, a2.name)(exprId = a2.exprId,
            qualifier = a2.qualifier)
          case at: Attribute => at
          case other => Alias(other, ne.name)(exprId = ne.exprId)
        }
      }
      val newCond = (EqualTo(aK, bK) +: others).reduce(And)
      val newJoin =
        if (aIsLeft) Join(pre, b, Inner, Some(newCond), hint)
        else Join(b, pre, Inner, Some(newCond), hint)
      Some(Aggregate(groupS,
        newAggExprs.map(_.asInstanceOf[NamedExpression]), newJoin))
    }

    attempt(left, right, aIsLeft = true)
      .orElse(attempt(right, left, aIsLeft = false))
  }
}

object EagerAggregationReuse {
  val KEY = "spark.graft.eagerAgg"
}
