package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, CollectList, Complete}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.types._

/** Zero-copy evaluation for full-partition window arrays — the scale path
  * for per-row dynamic frame bounds (PrestoSql.dynamicFrames; reference:
  * WindowOperator/FrameInfo take a bound CHANNEL —
  * MAIN/operator/WindowOperator.java, MAIN/operator/window/FrameInfo.java).
  *
  * The dynamic-frame lowering emits `collect_list(struct(v)) OVER
  * (partition order ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED
  * FOLLOWING)` plus a `row_number()` over the same window, then slices the
  * array per row. Semantically right, but `WindowExec` serializes that
  * O(partition)-sized array into EVERY output UnsafeRow: a single
  * partition costs O(rows²) bytes (measured, tools/DynFrameProbe: 10k rows
  * 1.8 s / 20k 5.8 s / 40k 22 s) — against the reference's O(rows·frame)
  * PagesIndex, whose per-row frames READ the shared partition index
  * without copying it.
  *
  * This rule restores the shared-index shape with stock operators: the
  * partition array is built ONCE per partition on a grouped-aggregate
  * branch and joined back, so probe rows reference the build side's array
  * through the join (an `UnsafeArrayData` pointer into the build buffer —
  * zero copy until the final `slice`, which materializes only the frame):
  *
  *   Window [collect_list@UNB..UNB AS a, row_number() AS r] part order
  *   ⇒
  *   Project [child.*, r, a := __arr]                 (exprIds preserved)
  *   +- Join Inner (part <=> __gk…)                   (null-safe: a NULL
  *   :                                                 partition key is one
  *   :                                                 window partition)
  *   :- Window [row_number() AS r] part (order ++ payload tiebreaks)
  *   :  +- child
  *   +- Project [__gk…, __arr := transform(sorted, x -> x.payload)]
  *      +- Aggregate part [__gk…, sorted := array_sort(collect_list(
  *             struct(orderKeys…, payloads…)), cmp)]
  *         +- child
  *
  * Row/array alignment: the join's array is sorted by a comparator that
  * reproduces the window's ORDER BY exactly (per-key direction and null
  * ordering, Spark's NaN-ordering comparison semantics), then by the
  * payload values ascending as a tiebreak; the probe `row_number()` gets
  * the SAME tiebreak appended. Rows tying on the full (keys, payload)
  * tuple are interchangeable, so slice positions are consistent with one
  * total order of the partition — the same guarantee a single WindowExec
  * sort gives (and all either engine promises under ties). `rank`-family
  * functions in the same window are NOT re-ordered (their peer groups
  * would change): they keep a separate Window over the original order.
  *
  * Fires only when it is exact: every order key and payload orderable and
  * non-nullable payloads (`collect_list` drops nulls; the lowering's
  * struct wrapper guarantees none), deterministic child (it is evaluated
  * twice), batch plans only. `spark.graft.dynamicFrameJoin=false` restores
  * the single-branch WindowExec form. */
class DynamicFrameJoin(spark: SparkSession) extends Rule[LogicalPlan] {

  private def enabled: Boolean =
    spark.conf.getOption(DynamicFrameJoin.KEY).forall(_.toBoolean)

  /** Alias of collect_list over an UNBOUNDED..UNBOUNDED rows frame. */
  private object UnbCollect {
    def unapply(ne: NamedExpression): Option[(Alias, Expression)] = ne match {
      case a @ Alias(WindowExpression(ae: AggregateExpression,
          WindowSpecDefinition(_, _, SpecifiedWindowFrame(
            RowFrame, UnboundedPreceding, UnboundedFollowing))), _)
          if !ae.isDistinct && ae.filter.isEmpty =>
        ae.aggregateFunction match {
          case c: CollectList => Some((a, c.child))
          case _ => None
        }
      case _ => None
    }
  }

  private def isRowNumber(ne: NamedExpression): Boolean = ne match {
    case Alias(WindowExpression(_: RowNumber, _), _) => true
    case _ => false
  }

  private def orderable(e: Expression): Boolean =
    TypeUtils.checkForOrderingExpr(e.dataType, "dfj").isSuccess

  /** -1/0/1 comparator over one struct field honoring the sort direction
    * and null ordering (EqualNullSafe/LessThan carry Spark's NaN-safe
    * comparison, matching SortOrder's TypeUtils ordering). */
  private def fieldCmp(l: Expression, r: Expression,
      asc: Boolean, nullsFirst: Boolean): Expression = {
    val (lt, gt) = (Literal(if (asc) -1 else 1), Literal(if (asc) 1 else -1))
    val (nf, nl) = (Literal(if (nullsFirst) -1 else 1),
      Literal(if (nullsFirst) 1 else -1))
    If(EqualNullSafe(l, r), Literal(0),
      If(IsNull(l), nf, If(IsNull(r), nl, If(LessThan(l, r), lt, gt))))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transformDown {
      case w @ Window(wexprs, part, order, child, hint)
          if order.nonEmpty && !w.isStreaming &&
            wexprs.exists(UnbCollect.unapply(_).isDefined) &&
            order.forall(o => orderable(o.child)) &&
            wexprs.collect { case UnbCollect(_, p) => p }
              .forall(p => orderable(p) && !p.nullable) &&
            !child.exists(p => p.expressions.exists(!_.deterministic)) =>
        val payloads = wexprs.collect { case UnbCollect(a, p) => (a, p) }
        val collectIds = payloads.map(_._1.exprId).toSet
        val rest = wexprs.filterNot(ne => collectIds.contains(ne.exprId))
        val keys = order.map(_.child)

        // ---- build branch: one sorted partition array per group
        val structType = StructType(
          keys.zipWithIndex.map { case (k, i) =>
            StructField(s"k$i", k.dataType, k.nullable) } ++
          payloads.zipWithIndex.map { case ((_, p), i) =>
            StructField(s"p$i", p.dataType, nullable = false) })
        val struct = CreateNamedStruct(
          keys.zipWithIndex.flatMap { case (k, i) =>
            Seq(Literal(s"k$i"), k) } ++
          payloads.zipWithIndex.flatMap { case ((_, p), i) =>
            Seq(Literal(s"p$i"), p) })
        val lv = NamedLambdaVariable("l", structType, nullable = false)
        val rv = NamedLambdaVariable("r", structType, nullable = false)
        // window keys with their declared direction/null order, then the
        // payloads ascending — the probe row_number appends the same
        val cmps = order.zipWithIndex.map { case (o, i) =>
          fieldCmp(GetStructField(lv, i, Some(s"k$i")),
            GetStructField(rv, i, Some(s"k$i")),
            o.direction == Ascending,
            o.nullOrdering == NullsFirst)
        } ++ payloads.indices.map { i =>
          val at = keys.size + i
          fieldCmp(GetStructField(lv, at, Some(s"p$i")),
            GetStructField(rv, at, Some(s"p$i")), asc = true, nullsFirst = true)
        }
        val cmp = cmps.init.foldRight(cmps.last) { (c, tail) =>
          If(EqualTo(c, Literal(0)), tail, c)
        }
        val sorted = ArraySort(
          AggregateExpression(CollectList(struct), Complete, isDistinct = false),
          LambdaFunction(cmp, Seq(lv, rv)))
        val gks = part.zipWithIndex.map { case (e, i) =>
          Alias(e, s"__dfj_gk$i")() }
        val sortedAlias = Alias(sorted, "__dfj_sorted")()
        val agg = Aggregate(part, gks :+ sortedAlias, child)
        val arrAliases = payloads.zipWithIndex.map { case ((a, p), i) =>
          val x = NamedLambdaVariable("x", structType, nullable = false)
          Alias(ArrayTransform(sortedAlias.toAttribute,
            LambdaFunction(GetStructField(x, keys.size + i, Some(s"p$i")),
              Seq(x))), s"__dfj_arr$i")()
        }
        val build = Project(gks.map(_.toAttribute) ++ arrAliases, agg)

        // ---- probe branch: row_number aligned to the array's tiebreak
        // order; other window functions keep the original order untouched
        val (rowNums, others) = rest.partition(isRowNumber)
        val extOrder = order ++ payloads.map { case (_, p) =>
          SortOrder(p, Ascending) }
        val probe1 =
          if (rowNums.isEmpty) child
          else Window(rowNums, part, extOrder, child, hint)
        val probe =
          if (others.isEmpty) probe1
          else Window(others, part, order, probe1, hint)

        val cond = part.zip(gks)
          .map { case (e, gk) => EqualNullSafe(e, gk.toAttribute) }
          .reduceOption[Expression](And)
        // no PARTITION BY ⇒ the build side is ONE row (holding the whole
        // partition array) and the join is a nested loop: pin the build
        // side by hint so the planner never broadcasts the n-row probe
        val hintedJoin =
          if (part.isEmpty) JoinHint(None, Some(HintInfo(Some(BROADCAST))))
          else JoinHint.NONE
        val joined = Join(probe, build, Inner, cond, hintedJoin)

        val outExprs: Seq[NamedExpression] = w.output.map { attr =>
          payloads.indexWhere(_._1.exprId == attr.exprId) match {
            case -1 => attr
            case i =>
              Alias(arrAliases(i).toAttribute, attr.name)(exprId = attr.exprId)
          }
        }
        Project(outExprs, joined)
    }
  }
}

object DynamicFrameJoin {
  val KEY = "spark.graft.dynamicFrameJoin"
}
