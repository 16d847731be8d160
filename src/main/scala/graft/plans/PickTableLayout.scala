package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import graft.operators.Bucketing

/** Per-query table-layout selection over multiple persisted bucketed
  * layouts — the Spark analogue of the reference's
  * MAIN/sql/planner/iterative/rule/PickTableLayout.java over the SPI's
  * per-table ConnectorTableLayout list.
  *
  * A deployment can persist a table in SEVERAL bucketed orders (round-13
  * measured: the custkey layout of orders/customer wins the TPC-H Q3 shape
  * by −33% but loses orderkey-keyed queries ~+25% — per-WORKLOAD layout
  * choice). With `spark.graft.bucketedDir=dirA,dirB` the first directory
  * serves by default and every sibling layout is registered alongside
  * (operators/Bucketing.redirect). This rule then swaps a scan per query:
  * when a join's equi-keys on a relation match a SIBLING layout's bucket
  * key — and the swap makes the join CO-LOCATED (both sides bucketed on
  * the join keys with equal bucket counts) — the relation is replaced by
  * that sibling. One session serves q3 from the custkey layout and
  * h18/h21 from the orderkey layout with no conf flip.
  *
  * The decision key is the relation's FIRST join (the deepest join where
  * the relation is still a bare Filter/Project unit): that is the join
  * whose exchange the layout can remove. A relation consumed by an
  * AGGREGATE while still a bare unit (the derived-partsupp shape of
  * TPC-H Q2/Q9: `GROUP BY l_partkey, l_suppkey` directly over lineitem)
  * picks by GROUPING keys instead — a sibling layout bucketed on a
  * subset of the grouping keys makes the aggregation (and any window
  * partitioned on those keys above it) exchange-free, which is the same
  * decision the reference's rule makes from the aggregation's preferred
  * partitioning. Swapped relations keep their original output attribute
  * ids via an aliasing Project, so the rest of the plan is untouched;
  * sibling layouts are fingerprint-validated at registration
  * (operators/Bucketing.redirect row counts), so a stale layout can
  * never be swapped in. Disable with `spark.graft.layoutPick=false`.
  */
class PickTableLayout(spark: SparkSession)
    extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan]
    with PredicateHelper {

  private def enabled: Boolean =
    spark.conf.getOption(PickTableLayout.KEY).forall(_.toBoolean)

  /** Strip a unit (Filter/Project chain) to its leaf relation. A
    * LeftSemi/LeftAnti join only FILTERS its left relation (the
    * IN/EXISTS-subquery rewrite), so the unit continues through it. */
  @annotation.tailrec
  private def leafOf(p: LogicalPlan): Option[LogicalRelation] = p match {
    case f: Filter => leafOf(f.child)
    case pr: Project => leafOf(pr.child)
    case j: Join if j.joinType == org.apache.spark.sql.catalyst.plans.LeftSemi ||
        j.joinType == org.apache.spark.sql.catalyst.plans.LeftAnti =>
      leafOf(j.left)
    case lr: LogicalRelation => Some(lr)
    case _ => None
  }

  /** Resolve `a` (an output attribute of the unit) down to the LEAF
    * attribute it denotes, following pure renames/alias projections (the
    * aliasing Project a previous swap inserted included). */
  private def leafAttr(unit: LogicalPlan, a: Attribute): Option[Attribute] =
    unit match {
      case f: Filter => leafAttr(f.child, a)
      case j: Join if j.joinType == org.apache.spark.sql.catalyst.plans.LeftSemi ||
          j.joinType == org.apache.spark.sql.catalyst.plans.LeftAnti =>
        leafAttr(j.left, a)
      case pr: Project =>
        pr.projectList.collectFirst {
          case al @ Alias(child: Attribute, _) if al.exprId == a.exprId => child
          case at: Attribute if at.exprId == a.exprId => at
        } match {
          case Some(next) => leafAttr(pr.child, next)
          case None => None
        }
      case lr: LogicalRelation =>
        if (lr.outputSet.contains(a)) Some(a) else None
      case _ => None
    }

  private def locationOf(lr: LogicalRelation): Option[String] =
    lr.relation match {
      case fs: HadoopFsRelation =>
        fs.location.rootPaths.headOption.map(p =>
          java.nio.file.Paths.get(p.toUri.getPath).toAbsolutePath.toString)
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    val siblings = Bucketing.alternateLayouts(spark)
    if (siblings.isEmpty) return plan
    if (!plan.exists(p => p.isInstanceOf[Join] || p.isInstanceOf[Aggregate]))
      return plan

    /** The layout currently serving a leaf, among its registered siblings. */
    def currentInfo(lr: LogicalRelation): Option[Bucketing.LayoutInfo] =
      locationOf(lr).flatMap(loc =>
        siblings.get(loc).flatMap(_.find(_.location == loc)))

    plan.transformUp {
      // Aggregation directly over a bare unit: pick the layout whose
      // bucket keys are a subset of the grouping keys (hash(bucketKeys)
      // satisfies ClusteredDistribution(groupingKeys)) — the aggregation
      // plans with no exchange, and single-phase aggregation collapses.
      case a: Aggregate if leafOf(a.child).isDefined =>
        val lr = leafOf(a.child).get
        currentInfo(lr) match {
          case Some(cur) =>
            val groupNames = a.groupingExpressions.flatMap {
              case attr: Attribute => leafAttr(a.child, attr).map(_.name)
              case _ => None
            }.toSet
            if (groupNames.isEmpty || cur.keys.forall(groupNames.contains)) a
            else siblings(cur.location)
              .find(s => (s ne cur) && s.keys.forall(groupNames.contains))
              .map(pick => a.copy(child = swap(a.child, lr, pick)))
              .getOrElse(a)
          case None => a
        }
      case j @ Join(left, right, _, Some(cond), _) =>
        val pairs = splitConjunctivePredicates(cond).collect {
          case EqualTo(a: AttributeReference, b: AttributeReference) => (a, b)
        }
        if (pairs.isEmpty) j
        else {
          // per side: (leaf, current layout info, join-key leaf column names)
          def sideView(side: LogicalPlan, mine: Seq[Attribute])
              : Option[(LogicalRelation, Bucketing.LayoutInfo, Set[String])] =
            leafOf(side).flatMap { lr =>
              currentInfo(lr).map { info =>
                val keyNames = mine.flatMap(a =>
                  leafAttr(side, a).map(_.name)).toSet
                (lr, info, keyNames)
              }
            }
          val lAttrs = pairs.map(_._1) ++ pairs.map(_._2)
          val lSide = sideView(left,
            lAttrs.filter(a => left.outputSet.contains(a)))
          val rSide = sideView(right,
            lAttrs.filter(a => right.outputSet.contains(a)))
          (lSide, rSide) match {
            case (Some((lLeaf, lCur, lKeys)), Some((rLeaf, rCur, rKeys))) =>
              // best layout per side: prefer the CURRENT one when its key
              // already matches the join keys
              def pick(cur: Bucketing.LayoutInfo, keys: Set[String])
                  : Option[Bucketing.LayoutInfo] =
                if (cur.keys.forall(keys.contains)) Some(cur)
                else siblings(cur.location)
                  .find(s => s.keys.forall(keys.contains))
              (pick(lCur, lKeys), pick(rCur, rKeys)) match {
                case (Some(lPick), Some(rPick))
                    if lPick.buckets == rPick.buckets &&
                      ((lPick ne lCur) || (rPick ne rCur)) =>
                  // co-located after the swap(s): rewrite the side(s)
                  val newL =
                    if (lPick eq lCur) left else swap(left, lLeaf, lPick)
                  val newR =
                    if (rPick eq rCur) right else swap(right, rLeaf, rPick)
                  j.copy(left = newL, right = newR)
                case _ => j
              }
            case _ => j
          }
        }
    }
  }

  /** Replace `leaf` inside `side` with the sibling layout's relation,
    * aliasing its columns back to the original attribute ids so every
    * reference above stays valid. */
  private def swap(side: LogicalPlan, leaf: LogicalRelation,
      target: Bucketing.LayoutInfo): LogicalPlan = {
    val altRel = spark.table(target.table).queryExecution.analyzed
      .collectFirst { case lr: LogicalRelation => lr }
      .getOrElse(return side)
    val byName = altRel.output.map(a => a.name -> a).toMap
    if (!leaf.output.forall(o => byName.contains(o.name))) return side
    val proj = leaf.output.map(o =>
      Alias(byName(o.name), o.name)(exprId = o.exprId))
    side.transformUp {
      case p if p eq leaf => Project(proj, altRel)
    }
  }
}

object PickTableLayout {
  val KEY = "spark.graft.layoutPick"
}
